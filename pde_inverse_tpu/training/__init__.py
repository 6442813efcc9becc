from pde_inverse_tpu.training.optimizers import get_optimizer
from pde_inverse_tpu.training.trainer import Trainer
