"""Explicit string -> class registries.

Parity: /root/reference/registry.py — with the `return NotImplementedError`
bug (registry.py:26) fixed to raise a proper KeyError.
"""

from __future__ import annotations

from pde_inverse_tpu.config import Config
from pde_inverse_tpu.problems import (
    FokkerPlanck,
    KineticFokkerPlanckGMM,
    KineticFokkerPlanckOU,
    KineticMcKeanVlasovQuadratic,
)

PDE_INSTANCES = {
    ("Fokker-Planck", "Quadratic"): FokkerPlanck,
    ("Kinetic-Fokker-Planck", "Quadratic"): KineticFokkerPlanckOU,
    ("Kinetic-Fokker-Planck", "GMM"): KineticFokkerPlanckGMM,
    ("Kinetic-McKean-Vlasov", "Quadratic"): KineticMcKeanVlasovQuadratic,
}


def get_pde_instance(cfg: Config):
    key = (cfg.pde_instance.name, cfg.pde_instance.potential)
    if key not in PDE_INSTANCES:
        raise KeyError(
            f"no PDE instance for name={key[0]!r} potential={key[1]!r}; "
            f"available: {sorted(PDE_INSTANCES)}"
        )
    return PDE_INSTANCES[key]


def get_method(cfg: Config):
    from pde_inverse_tpu.methods import ConsistencyBased
    from pde_inverse_tpu.methods_pinn import PINN, PINNKinetic

    # The reference declares a PINN solver config but implements no code
    # for it (configurations/solver/PINN.yaml, registry.py:29-32 raises);
    # here it is functional for the overdamped AND kinetic FP instances.
    if cfg.solver.name == "PINN" and cfg.pde_instance.name.startswith("Kinetic"):
        return PINNKinetic
    methods = {"ConsistencyBased": ConsistencyBased, "PINN": PINN}
    if cfg.solver.name not in methods:
        raise KeyError(
            f"unknown solver {cfg.solver.name!r}; available: {sorted(methods)}"
        )
    return methods[cfg.solver.name]
