from pde_inverse_tpu.models.mlp import PotentialMLP
from pde_inverse_tpu.models.parametric import QuadraticFormModel, GMMMeansModel
from pde_inverse_tpu.models.factory import get_model
