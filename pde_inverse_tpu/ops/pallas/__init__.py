from pde_inverse_tpu.ops.pallas.langevin_kernel import (
    langevin_pallas,
    pallas_supported_potential,
)
