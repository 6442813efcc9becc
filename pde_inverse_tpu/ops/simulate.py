"""Simulator dispatch: Pallas kernel on TPU, XLA scan elsewhere.

The Pallas kernel (ops/pallas/langevin_kernel.py) keeps particle blocks
VMEM-resident for all steps; the scan fallback (ops/langevin.py) runs
anywhere (CPU tests, interpret mode) and accepts arbitrary potentials and
traced parameters.  RNG streams differ between the two — both are gated
distributionally against the exact OU law (tests/test_langevin.py,
tests/test_pallas.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pde_inverse_tpu.ops.langevin import simulate_kinetic_langevin
from pde_inverse_tpu.ops.pallas.langevin_kernel import (
    langevin_pallas,
    pallas_supported_potential,
)
from pde_inverse_tpu.potentials import Potential


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def simulate(
    key: jax.Array,
    z0: jnp.ndarray,
    n_steps: int,
    dt,
    potential: Potential,
    gamma: float,
    return_trajectory: bool = True,
    use_pallas: Optional[bool] = None,
    integrator: str = "euler",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """(final [n, 2d], trajectory [n, n_steps, 2d] | None, taus | None).

    integrator: "euler" (reference parity) or "baoab" (O(dt^2) weak error
    at the same one-force-eval-per-step cost)."""
    if use_pallas is None:
        use_pallas = _on_tpu() and pallas_supported_potential(potential)
    if use_pallas:
        seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
        return langevin_pallas(
            seed,
            z0,
            n_steps,
            float(dt),
            potential,
            gamma,
            return_trajectory=return_trajectory,
            integrator=integrator,
        )
    return simulate_kinetic_langevin(
        key,
        z0,
        n_steps,
        dt,
        potential.gradient,
        gamma,
        return_trajectory=return_trajectory,
        integrator=integrator,
    )
