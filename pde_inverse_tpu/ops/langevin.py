"""Euler-Maruyama underdamped (kinetic) Langevin simulator.

Reference semantics (``/root/reference/utils/sampling_utils.py:6-52``):
    p <- p - dt * grad_U(q) + sqrt(2 dt) * xi - gamma * p * dt
    q <- q + dt * p_new
with a per-particle random initial phase tau0 ~ U[0, dt) so every time stamp
in [0, T] is reachable, a trajectory of n_steps states at times
tau0 + k * dt, and a final partial step of (dt - tau0) landing exactly at
T = n_steps * dt.

TPU-first layout: the reference vmaps a per-particle ``lax.scan`` over
scalar states; here the scan carries the whole particle batch ``[n, d]`` so
each step is a handful of fused [n, d] VPU ops and one batched noise draw —
no per-particle program.  A Pallas kernel for the trajectory-free variant
lives in ``pde_inverse_tpu.ops.pallas.langevin_kernel``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def kinetic_langevin_step(
    q: jnp.ndarray,
    p: jnp.ndarray,
    noise: jnp.ndarray,
    dt: jnp.ndarray,
    grad_potential: Callable[[jnp.ndarray], jnp.ndarray],
    gamma: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One EM step; dt may be scalar or per-particle [n] (broadcast).

    noise: standard normal, same shape as p.
    """
    dt_col = jnp.asarray(dt)[..., None] if jnp.ndim(dt) == 1 else dt
    sqrt_2dt = jnp.sqrt(2.0 * dt_col)
    p_new = p - dt_col * grad_potential(q) + sqrt_2dt * noise - gamma * p * dt_col
    q_new = q + dt_col * p_new
    return q_new, p_new


def simulate_kinetic_langevin(
    key: jax.Array,
    z0: jnp.ndarray,
    n_steps: int,
    dt: jnp.ndarray,
    grad_potential: Callable[[jnp.ndarray], jnp.ndarray],
    gamma: float,
    return_trajectory: bool = True,
    random_phase: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Simulate the kinetic Langevin SDE from z0 = [q0 | p0], [n, 2d].

    Returns (final_state [n, 2d], trajectory [n, n_steps, 2d] or None,
    taus [n, n_steps] or None).  trajectory[i, k] is the state of particle i
    at time taus[i, k] = tau0_i + k * dt; final_state is at exactly
    n_steps * dt.  grad_potential maps [n, d] -> [n, d].
    """
    n = z0.shape[0]
    d = z0.shape[-1] // 2
    q0, p0 = z0[:, :d], z0[:, d:]

    key_phase, key_steps = jax.random.split(key)
    if random_phase:
        tau0 = jax.random.uniform(key_phase, (n,), dtype=z0.dtype) * dt
    else:
        tau0 = jnp.zeros((n,), dtype=z0.dtype)

    step_keys = jax.random.split(key_steps, n_steps + 1)

    def noise(k):
        return jax.random.normal(k, (n, d), dtype=z0.dtype)

    # Phase step of length tau0 (per particle) lands on the first grid time.
    q, p = kinetic_langevin_step(q0, p0, noise(step_keys[0]), tau0, grad_potential, gamma)

    def body(carry, k):
        q, p = carry
        q, p = kinetic_langevin_step(q, p, noise(k), dt, grad_potential, gamma)
        out = jnp.concatenate([q, p], axis=-1) if return_trajectory else None
        return (q, p), out

    (q_mid, p_mid), tail = jax.lax.scan(body, (q, p), step_keys[1:n_steps])

    # Closing partial step of (dt - tau0) completes exactly n_steps * dt.
    q_fin, p_fin = kinetic_langevin_step(
        q_mid, p_mid, noise(step_keys[n_steps]), dt - tau0, grad_potential, gamma
    )
    final_state = jnp.concatenate([q_fin, p_fin], axis=-1)

    if not return_trajectory:
        return final_state, None, None

    first = jnp.concatenate([q, p], axis=-1)[None]  # [1, n, 2d]
    trajectory = jnp.concatenate([first, tail], axis=0)  # [n_steps, n, 2d]
    trajectory = jnp.swapaxes(trajectory, 0, 1)  # [n, n_steps, 2d]
    taus = tau0[:, None] + jnp.arange(n_steps, dtype=z0.dtype)[None, :] * dt
    return final_state, trajectory, taus
