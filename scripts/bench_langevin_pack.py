"""A/B the sublane-packed Langevin kernel (ROOFLINE §2 lever) on-chip.

Production geometry: GMM k=3, BAOAB, 400 steps.  Prints particle-steps/s
for pack=1 vs pack=8//d at d=2 and d=4, no-trajectory and trajectory.

Usage: python scripts/bench_langevin_pack.py [n_particles]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pde_inverse_tpu.ops.pallas.langevin_kernel import langevin_pallas
from pde_inverse_tpu.potentials import GMMPotential
from pde_inverse_tpu.utils.cache import enable_compilation_cache


def rate(fn, n, n_steps, iters=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return n * n_steps / dt, 1e3 * dt


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    n_steps, dt, gamma = 400, 0.01, 1.0
    for d in (2, 4):
        mus = jnp.eye(3, d) * 2.0
        pot = GMMPotential.create(mus, jnp.ones([]))
        z0 = jax.random.normal(jax.random.PRNGKey(0), (n, 2 * d))
        for traj in (False, True):
            base = None
            for pack in (1, 8 // d):
                f = jax.jit(
                    lambda pack=pack, traj=traj: langevin_pallas(
                        jnp.int32(3), z0, n_steps, dt, pot, gamma,
                        return_trajectory=traj, integrator="baoab", pack=pack,
                    )[0]
                )
                r, ms = rate(f, n, n_steps)
                tag = f"d={d} traj={int(traj)} pack={pack}"
                speed = "" if base is None else f"  ({r / base:.2f}x)"
                print(f"{tag:26s}: {r / 1e9:6.2f}G particle-steps/s ({ms:7.1f} ms){speed}")
                if base is None:
                    base = r


if __name__ == "__main__":
    main()
