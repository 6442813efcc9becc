"""Pallas TPU kernel for the Euler-Maruyama kinetic Langevin simulator.

Why a kernel (SURVEY.md §7, BASELINE.json north star): the XLA-scan
simulator round-trips the whole particle state through HBM every step and —
on the tunneled backend — compiles pathologically slowly for long scans.
This kernel keeps a block of particles (q, p) resident in VMEM for ALL
n_steps, generates its Gaussian noise on-core with the TPU PRNG
(Box-Muller over `pltpu.prng_random_bits`), and either discards or writes
the trajectory block incrementally.  HBM traffic drops from
O(n_steps * state) to O(state) (+ trajectory output if requested).

Layout: particles live on the LANE axis — state blocks are [d, B] with
B a multiple of 128 — so every elementwise op and the k-component GMM
gradient reduction are lane-aligned VPU ops (the natural [n, d] layout puts
d = 2..8 on lanes and wastes 94% of each register).

Semantics match ops.langevin.simulate_kinetic_langevin (reference
utils/sampling_utils.py:6-52): per-particle random phase tau0 ~ U[0, dt),
trajectory states at tau0 + k dt for k < n_steps, closing partial step to
exactly n_steps * dt.  The PRNG stream differs from jax.random (tested
distributionally against the exact OU law).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pde_inverse_tpu.potentials import GMMPotential, Potential, QuadraticPotential

_TWO_PI = 6.283185307179586
_INV_2_24 = 1.0 / (1 << 24)

DEFAULT_BLOCK = 512


def pallas_supported_potential(potential: Potential) -> bool:
    return isinstance(potential, (GMMPotential, QuadraticPotential))


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 uniform in (0, 1]: top 24 bits scaled, never 0.
    (Mosaic lacks a uint32->f32 cast; go through int32, which is exact for
    24-bit values.)"""
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * _INV_2_24
    return jnp.maximum(u, _INV_2_24)


def _normal(shape) -> jnp.ndarray:
    """Standard normals via Box-Muller from the core PRNG."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = _uniform_from_bits(b1)
    u2 = _uniform_from_bits(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _grad_fn_lane_layout(potential: Potential):
    """(param_arrays, grad) where grad(q [d,B], *param_refs) -> [d,B].

    Pallas forbids captured array constants, so the (small) potential
    parameters ride along as replicated VMEM inputs."""
    if isinstance(potential, QuadraticPotential):
        params = [potential.inv_cov, potential.mu[:, None]]

        def grad(q, inv_cov_ref, mu_ref):  # [d, B]
            return jnp.dot(
                inv_cov_ref[:, :],
                q - mu_ref[:, :],
                preferred_element_type=jnp.float32,
            )

        return params, grad
    if isinstance(potential, GMMPotential):
        k = potential.mus.shape[0]
        inv_s2 = 1.0 / float(potential.sigma) ** 2
        params = [potential.mus.T]  # [d, k]

        def grad(q, mus_ref):  # [d, B]
            mus = mus_ref[:, :]
            # static unroll over the k components; all ops are [B]-lane 2-D
            energies = []
            diffs = []
            for i in range(k):
                diff = q - mus[:, i : i + 1]  # [d, B]
                diffs.append(diff)
                energies.append(-0.5 * inv_s2 * jnp.sum(diff * diff, axis=0))
            e = jnp.stack(energies)  # [k, B]
            m = jnp.max(e, axis=0)
            w = jnp.exp(e - m)  # [k, B]
            z = jnp.sum(w, axis=0)  # [B]
            acc = w[0] * diffs[0]
            for i in range(1, k):
                acc = acc + w[i] * diffs[i]
            return acc * (inv_s2 / z)

        return params, grad
    raise NotImplementedError(
        f"no Pallas lane-layout gradient for {type(potential).__name__}; "
        "use the XLA-scan simulator"
    )


def _kernel(
    seed_ref,
    z0_ref,
    *rest,
    grad_fn_raw,
    n_steps: int,
    dt: float,
    gamma: float,
    d: int,
    with_trajectory: bool,
    random_phase: bool,
    noise_scale: float,
    integrator: str,
    pack: int = 1,
):
    """pack > 1: the grid cell's z block holds `pack` independent
    particle sub-blocks side by side on the lane axis, and the update
    runs on sublane-packed [pack*d, B] tiles (see `_pack_rows`): a
    [4, B] f32 op occupies the same issue slots as an [8, B] op at half
    the work, so packing doubles elementwise/PRNG work per slot for
    d=4 (×4 for d=2).  Only the per-sub-block GMM energy/softmax
    reductions split back to [d, B] slices (ROOFLINE §2)."""
    *param_refs, final_ref, traj_ref, tau_ref = rest
    grad_fn = lambda q: grad_fn_raw(q, *param_refs)

    # one independent stream per particle block
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    if pack > 1:
        Bc = z0_ref.shape[1]
        B = Bc // pack
        sub = lambda t, j: t[:, j * B : (j + 1) * B]
        q = jnp.concatenate(
            [sub(z0_ref[:d, :], j) for j in range(pack)], axis=0
        )
        p = jnp.concatenate(
            [sub(z0_ref[d:, :], j) for j in range(pack)], axis=0
        )
        grad_unpacked = grad_fn
        grad_fn = lambda qp: jnp.concatenate(
            [grad_unpacked(qp[j * d : (j + 1) * d, :]) for j in range(pack)],
            axis=0,
        )
    else:
        q = z0_ref[:d, :]
        p = z0_ref[d:, :]
        B = q.shape[1]

    rows = pack * d
    cell_w = pack * B
    if random_phase:
        bits = pltpu.bitcast(pltpu.prng_random_bits((1, cell_w)), jnp.uint32)
        tau_cell = _uniform_from_bits(bits) * dt  # (0, dt]; matches U[0,dt) a.s.
    else:
        tau_cell = jnp.zeros((1, cell_w), jnp.float32)
    tau_ref[:, :] = tau_cell
    if pack > 1:
        # [rows, B]: sub-block j's tau broadcast over its d rows
        tau0 = jnp.concatenate(
            [
                jnp.broadcast_to(tau_cell[:, j * B : (j + 1) * B], (d, B))
                for j in range(pack)
            ],
            axis=0,
        )
    else:
        tau0 = tau_cell

    def draw(shape):
        return noise_scale * _normal(shape) if noise_scale else jnp.zeros(shape)

    def em_step(q, p, g, step_dt):
        # step_dt: scalar or [rows, B]/[1, B] (broadcasts); g unused
        noise = draw((rows, B))
        p_new = (
            p
            - step_dt * grad_fn(q)
            + jnp.sqrt(2.0 * step_dt) * noise
            - gamma * p * step_dt
        )
        q_new = q + step_dt * p_new
        return q_new, p_new, g

    def baoab(q, p, g, step_dt):
        # BAOAB splitting, O(dt^2) weak error; g carries grad U from the
        # previous step's closing half-kick (one force eval per step, like
        # EM).  See ops.langevin.baoab_step for the derivation.
        half = 0.5 * step_dt
        p = p - half * g
        q = q + half * p
        if gamma > 0.0:
            c1 = jnp.exp(-gamma * step_dt)
            c2 = jnp.sqrt((1.0 - c1 * c1) / gamma)
        else:
            c1, c2 = 1.0, jnp.sqrt(2.0 * step_dt)
        p = c1 * p + c2 * draw((rows, B))
        q = q + half * p
        g = grad_fn(q)
        p = p - half * g
        return q, p, g

    step = baoab if integrator == "baoab" else em_step
    g = grad_fn(q) if integrator == "baoab" else jnp.zeros((rows, B), q.dtype)

    def write_traj(i, q, p):
        if pack > 1:
            for j in range(pack):
                sl = slice(j * B, (j + 1) * B)
                traj_ref[i, :d, sl] = q[j * d : (j + 1) * d, :]
                traj_ref[i, d:, sl] = p[j * d : (j + 1) * d, :]
        else:
            traj_ref[i, :d, :] = q
            traj_ref[i, d:, :] = p

    # phase step onto the first grid time tau0
    q, p, g = step(q, p, g, tau0)

    if with_trajectory:
        write_traj(0, q, p)

    def body(i, carry):
        q, p, g = carry
        q, p, g = step(q, p, g, dt)
        if with_trajectory:
            write_traj(i, q, p)
        return q, p, g

    q, p, g = jax.lax.fori_loop(1, n_steps, body, (q, p, g))

    # closing partial step lands exactly on n_steps * dt
    q, p, _ = step(q, p, g, dt - tau0)
    if pack > 1:
        for j in range(pack):
            sl = slice(j * B, (j + 1) * B)
            final_ref[:d, sl] = q[j * d : (j + 1) * d, :]
            final_ref[d:, sl] = p[j * d : (j + 1) * d, :]
    else:
        final_ref[:d, :] = q
        final_ref[d:, :] = p


def langevin_pallas(
    seed: jax.Array,
    z0: jnp.ndarray,
    n_steps: int,
    dt: float,
    potential: Potential,
    gamma: float,
    return_trajectory: bool = False,
    random_phase: bool = True,
    noise_scale: float = 1.0,
    block: int = DEFAULT_BLOCK,
    interpret=False,
    integrator: str = "euler",
    pack: int = 1,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Drop-in analogue of ops.langevin.simulate_kinetic_langevin with a
    Pallas core.  z0: [n, 2d]; seed: int32 scalar (one PRNG stream per
    particle block).  Returns (final [n, 2d], trajectory [n, n_steps, 2d]
    or None, taus [n, n_steps] or None).

    pack > 1 runs `pack` independent `block`-particle sub-blocks per grid
    cell on sublane-packed [pack*d, block] tiles (ROOFLINE §2: the kernel
    is issue-throughput-bound and d<8 tiles underfill sublanes, so
    packing raises work per issue slot ~pack-fold on the elementwise/PRNG
    portion).  Sensible values: 8 // d.  The PRNG stream mapping differs
    from pack=1 (same distribution; per-seed draws are not comparable
    across pack settings)."""
    n, two_d = z0.shape
    d = two_d // 2
    dt = float(dt)
    pack = max(1, int(pack))
    if interpret is True:
        # plain interpret mode lacks the TPU PRNG primitives; use the TPU
        # interpreter (works on CPU — the test-suite path)
        interpret = pltpu.InterpretParams()

    cell = pack * block
    if return_trajectory:
        # keep the per-cell trajectory buffer within ~8 MB of VMEM
        budget = 8 * 1024 * 1024 // (n_steps * two_d * 4)
        cell = max(128, min(cell, (budget // 128) * 128))
        block = max(128 // pack, cell // pack)
        cell = pack * block
    # (measured on v5e: block 512 vs 8192 is within 10% for the
    # no-trajectory path — the sequential grid is not the bottleneck —
    # so one default block serves both paths)

    # lane layout + pad the particle axis to a cell multiple
    n_pad = -(-n // cell) * cell
    zT = jnp.zeros((two_d, n_pad), z0.dtype).at[:, :n].set(z0.T)

    param_arrays, grad_fn = _grad_fn_lane_layout(potential)
    kernel = functools.partial(
        _kernel,
        grad_fn_raw=grad_fn,
        n_steps=n_steps,
        dt=dt,
        gamma=gamma,
        d=d,
        with_trajectory=return_trajectory,
        random_phase=random_phase,
        noise_scale=noise_scale,
        integrator=integrator,
        pack=pack,
    )

    grid = (n_pad // cell,)
    traj_shape = (
        jax.ShapeDtypeStruct((n_steps, two_d, n_pad), z0.dtype)
        if return_trajectory
        else jax.ShapeDtypeStruct((1, two_d, cell), z0.dtype)  # dummy
    )
    out_shape = (
        jax.ShapeDtypeStruct((two_d, n_pad), z0.dtype),  # final
        traj_shape,
        jax.ShapeDtypeStruct((1, n_pad), z0.dtype),  # tau0
    )
    traj_spec = (
        pl.BlockSpec(
            (n_steps, two_d, cell),
            lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
        if return_trajectory
        else pl.BlockSpec(
            (1, two_d, cell), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
    )

    param_specs = [
        pl.BlockSpec(
            tuple(a.shape), lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
        )
        for a in param_arrays
    ]
    final_T, traj, tau0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((two_d, cell), lambda i: (0, i), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=(
            pl.BlockSpec((two_d, cell), lambda i: (0, i), memory_space=pltpu.VMEM),
            traj_spec,
            pl.BlockSpec((1, cell), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        zT,
        *[jnp.asarray(a, z0.dtype) for a in param_arrays],
    )

    final = final_T.T[:n]
    if not return_trajectory:
        return final, None, None
    trajectory = jnp.transpose(traj, (2, 0, 1))[:n]  # [n, n_steps, 2d]
    taus = tau0[0, :n][:, None] + jnp.arange(n_steps, dtype=z0.dtype)[None, :] * dt
    return final, trajectory, taus
