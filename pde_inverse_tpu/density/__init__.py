from pde_inverse_tpu.density.flows import (
    MaskedNormalizingFlow,
    TimeConditionedLogDensity,
    build_realnvp,
)
from pde_inverse_tpu.density.estimation import estimate_log_density
