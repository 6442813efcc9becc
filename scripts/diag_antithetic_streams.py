"""Localize the on-chip antithetic +/- PRNG-stream discrepancy.

First on-chip run of the pair-mean gate measured a 1.4e-3 deviation
(quadratic force, 30 steps) where the XLA-scan simulator and the
interpret-mode kernel both give <1e-5 — i.e. the noise_scale=+1 and -1
compiled programs do not consume bit-identical PRNG streams, or negate
them inexactly.  This extracts the RAW noise increments: with gamma=0 and
a force-free potential, the Euler momentum update is

    p_{k+1} = p_k + sqrt(2 dt) * noise_k

so successive trajectory momentum differences recover noise_k exactly.
Prints, per step: max |xi_plus + xi_minus| (should be 0.0 — negation is
exact in f32) and max |xi_plus| for scale.  A nonzero sum at step k
localizes which draw diverges; a PATTERN (e.g. all steps) implicates
program-level stream divergence (e.g. scheduler reordering of the two
independent Box-Muller bit draws).

Usage: python scripts/diag_antithetic_streams.py [n_steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pde_inverse_tpu.ops.pallas.langevin_kernel import langevin_pallas
from pde_inverse_tpu.potentials import QuadraticPotential


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    d, n, dt = 2, 256, 0.05
    # F=0 via inv_cov=0 built directly: create() inverts the covariance,
    # so a zero matrix there yields a NaN force (inv(0)), not a free one.
    pot = QuadraticPotential(mu=jnp.zeros(d), inv_cov=jnp.zeros((d, d)))
    z0 = jax.random.normal(jax.random.PRNGKey(3), (n, 2 * d))
    seed = jnp.int32(1234)

    tr = {}
    for s in (1.0, -1.0):
        _, traj, _ = langevin_pallas(
            seed, z0, n_steps, dt, pot, 0.0,  # gamma=0
            return_trajectory=True, random_phase=False, noise_scale=s,
        )
        p = np.asarray(traj)[:, :, d:]  # [n, n_steps, d] momenta
        # noise_k = (p_{k+1} - p_k) / sqrt(2 dt); grid steps all use dt
        tr[s] = (p[:, 1:] - p[:, :-1]) / np.sqrt(2.0 * dt)

    s_plus, s_minus = tr[1.0], tr[-1.0]
    # The extraction itself rounds: xi is recovered from f32 momentum
    # PARTIAL SUMS p_k = p_0 +/- sqrt(2dt) * sum xi, so each recovered
    # draw carries ~2 ulp(|p|)/sqrt(2dt) of arithmetic noise even when the
    # kernel's negation is bit-exact (sign-flip of the same stream).
    # First on-chip run at HEAD measured 1.5e-6 against this bound of
    # ~3e-6 — ulp-quantized and growing with |p| exactly as rounding does.
    p_mag = max(np.abs(tr[1.0]).max(), 1.0) * np.sqrt(2.0 * dt) * (
        np.arange(1, s_plus.shape[1] + 1)[None, :, None] ** 0.5
    ).max() + np.abs(z0[:, d:]).max()
    bound = 4.0 * np.finfo(np.float32).eps * p_mag / np.sqrt(2.0 * dt)
    for k in range(s_plus.shape[1]):
        ssum = np.abs(s_plus[:, k] + s_minus[:, k]).max()
        smag = np.abs(s_plus[:, k]).max()
        print(f"step {k:3d}: max|xi+ + xi-| = {ssum:.3e}   max|xi+| = {smag:.3e}")
    total = np.abs(s_plus + s_minus).max()
    verdict = (
        "EXACT negation"
        if total == 0.0
        else (
            f"consistent with bit-exact negation (within extraction "
            f"rounding bound {bound:.1e})"
            if total <= bound
            else "STREAMS DIFFER"
        )
    )
    print(f"OVERALL max|xi+ + xi-| = {total:.3e} ({verdict})")


if __name__ == "__main__":
    main()
