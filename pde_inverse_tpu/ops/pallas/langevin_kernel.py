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
    ns_ref,
    z0_ref,
    *rest,
    grad_fn_raw,
    n_steps: int,
    dt: float,
    gamma: float,
    d: int,
    with_trajectory: bool,
    random_phase: bool,
    integrator: str,
):
    *param_refs, final_ref, traj_ref, tau_ref = rest
    grad_fn = lambda q: grad_fn_raw(q, *param_refs)

    # one independent stream per particle block
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    q = z0_ref[:d, :]
    p = z0_ref[d:, :]
    B = q.shape[1]

    if random_phase:
        bits = pltpu.bitcast(pltpu.prng_random_bits((1, B)), jnp.uint32)
        tau0 = _uniform_from_bits(bits) * dt  # (0, dt]; matches U[0,dt) a.s.
    else:
        tau0 = jnp.zeros((1, B), jnp.float32)
    tau_ref[:, :] = tau0

    # noise_scale is a RUNTIME scalar (SMEM), not a compile-time constant:
    # all scales (+1/-1 antithetic pair, 0 noiseless) share ONE compiled
    # program, so the per-step PRNG draws are bit-identical across scales
    # by construction — separate +-1 compilations left the pairing to the
    # Mosaic scheduler (first on-chip antithetic gate measured a ~1e-4
    # stream-level +/- divergence), and negation by a scalar multiply is
    # exact in f32.  Also halves the antithetic path's kernel compiles.
    def draw(shape):
        return ns_ref[0] * _normal(shape)

    def em_step(q, p, g, step_dt):
        # step_dt: scalar or [1, B] (broadcasts over the d axis); g unused
        noise = draw((d, B))
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
        p = c1 * p + c2 * draw((d, B))
        q = q + half * p
        g = grad_fn(q)
        p = p - half * g
        return q, p, g

    step = baoab if integrator == "baoab" else em_step
    g = grad_fn(q) if integrator == "baoab" else jnp.zeros((d, B), q.dtype)

    # phase step onto the first grid time tau0
    q, p, g = step(q, p, g, tau0)

    if with_trajectory:
        traj_ref[0, :d, :] = q
        traj_ref[0, d:, :] = p

    def body(i, carry):
        q, p, g = carry
        q, p, g = step(q, p, g, dt)
        if with_trajectory:
            traj_ref[i, :d, :] = q
            traj_ref[i, d:, :] = p
        return q, p, g

    q, p, g = jax.lax.fori_loop(1, n_steps, body, (q, p, g))

    # closing partial step lands exactly on n_steps * dt
    q, p, _ = step(q, p, g, dt - tau0)
    final_ref[:d, :] = q
    final_ref[d:, :] = p


def _grad_fn_packed(potential: Potential, pack: int, d: int):
    """Packed-layout analogue of `_grad_fn_lane_layout`: grad over
    [pack*d, B] tiles holding `pack` independent sub-blocks stacked on
    sublanes.  Per-sub-block reductions/broadcasts run as matmuls with a
    0/1 selector S [pack*d, pack] (built in-kernel from iota) — no
    sublane slicing or concatenation, which Mosaic rejects for operands
    at mismatched offsets ("offset mismatch on non-concat dimension",
    first packed on-chip exercise)."""
    rows = pack * d

    def selector():
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, pack), 0) // d
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, pack), 1)
        return (r == c).astype(jnp.float32)

    if isinstance(potential, QuadraticPotential):
        bd = jnp.kron(jnp.eye(pack), potential.inv_cov)  # [rows, rows]
        mu_p = jnp.tile(potential.mu[:, None], (pack, 1))  # [rows, 1]
        params = [bd, mu_p]

        def grad(qp, bd_ref, mu_ref):  # [rows, B]
            return jnp.dot(
                bd_ref[:, :], qp - mu_ref[:, :],
                preferred_element_type=jnp.float32,
            )

        return params, grad

    if isinstance(potential, GMMPotential):
        k = potential.mus.shape[0]
        inv_s2 = 1.0 / float(potential.sigma) ** 2
        params = [jnp.tile(potential.mus.T, (pack, 1))]  # [rows, k]

        def grad(qp, mus_ref):  # [rows, B]
            S = selector()
            mus = mus_ref[:, :]
            diffs = []
            es = []
            for i in range(k):
                diff = qp - mus[:, i : i + 1]  # [rows, B] packed
                diffs.append(diff)
                # per-sub-block energy: S^T @ (diff*diff) -> [pack, B]
                sq = jax.lax.dot_general(
                    S, diff * diff, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                es.append(-0.5 * inv_s2 * sq)
            m = es[0]
            for i in range(1, k):
                m = jnp.maximum(m, es[i])
            ws = [jnp.exp(e - m) for e in es]  # [pack, B] each
            z = ws[0]
            for i in range(1, k):
                z = z + ws[i]
            bcast = lambda w: jnp.dot(  # [rows, pack] @ [pack, B]
                S, w, preferred_element_type=jnp.float32
            )
            acc = bcast(ws[0]) * diffs[0]
            for i in range(1, k):
                acc = acc + bcast(ws[i]) * diffs[i]
            return acc * (inv_s2 / bcast(z))

        return params, grad
    raise NotImplementedError(
        f"no packed-layout gradient for {type(potential).__name__}"
    )


def _kernel_packed(
    seed_ref,
    ns_ref,
    q0_ref,
    p0_ref,
    *rest,
    grad_fn_raw,
    n_steps: int,
    dt: float,
    gamma: float,
    d: int,
    pack: int,
    with_trajectory: bool,
    random_phase: bool,
    integrator: str,
):
    """Sublane-packed variant: q0/p0 arrive PRE-PACKED as [pack*d, B]
    tiles (`pack` independent B-particle sub-blocks stacked on sublanes —
    the layout transform runs outside in XLA).  Every update op covers
    pack sub-blocks per issue slot (ROOFLINE §2: the kernel is
    issue-throughput-bound and [d<8, B] tiles underfill sublanes).
    Outputs are packed too: final q/p [pack*d, B], tau [pack, B],
    trajectory [n_steps, 2*pack*d, B]."""
    *param_refs, finalq_ref, finalp_ref, traj_ref, tau_ref = rest
    grad_fn = lambda q: grad_fn_raw(q, *param_refs)
    rows = pack * d

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    q = q0_ref[...]
    p = p0_ref[...]
    B = q.shape[1]

    r_ = jax.lax.broadcasted_iota(jnp.int32, (rows, pack), 0) // d
    c_ = jax.lax.broadcasted_iota(jnp.int32, (rows, pack), 1)
    S = (r_ == c_).astype(jnp.float32)  # [rows, pack] selector

    if random_phase:
        bits = pltpu.bitcast(pltpu.prng_random_bits((pack, B)), jnp.uint32)
        tau_p = _uniform_from_bits(bits) * dt
    else:
        tau_p = jnp.zeros((pack, B), jnp.float32)
    tau_ref[...] = tau_p
    # per-sub-block tau broadcast over its d rows: S @ tau_p
    tau0 = jnp.dot(S, tau_p, preferred_element_type=jnp.float32)

    # runtime SMEM scalar — same one-program-for-all-scales rationale as
    # the unpacked kernel's draw()
    def draw(shape):
        return ns_ref[0] * _normal(shape)

    def em_step(q, p, g, step_dt):
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

    q, p, g = step(q, p, g, tau0)

    if with_trajectory:
        traj_ref[0, :rows, :] = q
        traj_ref[0, rows:, :] = p

    def body(i, carry):
        q, p, g = carry
        q, p, g = step(q, p, g, dt)
        if with_trajectory:
            traj_ref[i, :rows, :] = q
            traj_ref[i, rows:, :] = p
        return q, p, g

    q, p, g = jax.lax.fori_loop(1, n_steps, body, (q, p, g))

    q, p, _ = step(q, p, g, dt - tau0)
    finalq_ref[...] = q
    finalp_ref[...] = p


def _pack_lanes(a: jnp.ndarray, pack: int, block: int) -> jnp.ndarray:
    """[d, n_pad] -> packed [pack*d, n_pad//pack]: grid cell i's lanes
    [i*B:(i+1)*B] of sub-block j are the original lanes
    [(i*pack+j)*B : (i*pack+j+1)*B]."""
    d, n_pad = a.shape
    cells = n_pad // (pack * block)
    return (
        a.reshape(d, cells, pack, block)
        .transpose(2, 0, 1, 3)
        .reshape(pack * d, cells * block)
    )


def _unpack_lanes(a: jnp.ndarray, pack: int, block: int, d: int) -> jnp.ndarray:
    """Inverse of `_pack_lanes`: [pack*d, n'] -> [d, n'*pack]."""
    n_prime = a.shape[-1]
    cells = n_prime // block
    return (
        a.reshape(pack, d, cells, block)
        .transpose(1, 2, 0, 3)
        .reshape(d, pack * n_prime)
    )


def _langevin_pallas_packed(
    seed,
    zT: jnp.ndarray,
    n_steps: int,
    dt: float,
    potential: Potential,
    gamma: float,
    return_trajectory: bool,
    random_phase: bool,
    noise_scale: float,
    block: int,
    pack: int,
    interpret,
    integrator: str,
):
    """Packed-path driver: packs lanes outside, runs `_kernel_packed`,
    unpacks.  zT: [2d, n_pad] with n_pad a multiple of pack*block.
    Returns (final_T [2d, n_pad], traj [n_steps, 2d, n_pad] | None,
    tau0 [1, n_pad])."""
    two_d, n_pad = zT.shape
    d = two_d // 2
    rows = pack * d
    n_prime = n_pad // pack

    qP = _pack_lanes(zT[:d], pack, block)
    pP = _pack_lanes(zT[d:], pack, block)

    param_arrays, grad_fn = _grad_fn_packed(potential, pack, d)
    kernel = functools.partial(
        _kernel_packed,
        grad_fn_raw=grad_fn,
        n_steps=n_steps,
        dt=dt,
        gamma=gamma,
        d=d,
        pack=pack,
        with_trajectory=return_trajectory,
        random_phase=random_phase,
        integrator=integrator,
    )

    grid = (n_prime // block,)
    traj_shape = (
        jax.ShapeDtypeStruct((n_steps, 2 * rows, n_prime), zT.dtype)
        if return_trajectory
        else jax.ShapeDtypeStruct((1, 2 * rows, block), zT.dtype)  # dummy
    )
    traj_spec = (
        pl.BlockSpec(
            (n_steps, 2 * rows, block),
            lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
        if return_trajectory
        else pl.BlockSpec(
            (1, 2 * rows, block), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
    )
    param_specs = [
        pl.BlockSpec(
            tuple(a.shape), lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
        )
        for a in param_arrays
    ]
    finq, finp, traj, tauP = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            *param_specs,
        ],
        out_specs=(
            pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            traj_spec,
            pl.BlockSpec((pack, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, n_prime), zT.dtype),
            jax.ShapeDtypeStruct((rows, n_prime), zT.dtype),
            traj_shape,
            jax.ShapeDtypeStruct((pack, n_prime), jnp.float32),
        ),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(noise_scale, jnp.float32).reshape(1),
        qP,
        pP,
        *[jnp.asarray(a, zT.dtype) for a in param_arrays],
    )

    final_T = jnp.concatenate(
        [_unpack_lanes(finq, pack, block, d), _unpack_lanes(finp, pack, block, d)],
        axis=0,
    )
    tau0 = _unpack_lanes(tauP, pack, block, 1)
    trajectory = None
    if return_trajectory:
        uq = jax.vmap(lambda t: _unpack_lanes(t, pack, block, d))(
            traj[:, :rows]
        )
        up = jax.vmap(lambda t: _unpack_lanes(t, pack, block, d))(
            traj[:, rows:]
        )
        trajectory = jnp.concatenate([uq, up], axis=1)  # [n_steps, 2d, n_pad]
    return final_T, trajectory, tau0


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
    if pack > 1 and interpret is False:
        # The pack>1 sub-block mode mis-lowers on the real chip: its
        # in-kernel iota-selector matmuls (the same construct class that
        # silently miscompiled in the round-5 pairwise fix2 kernels)
        # produce NaN final states, caught by the on-chip OU moment gate
        # (tests/test_pallas.py::TestPackedLangevin, round-5 run).  The
        # mode stays available in interpret mode (semantics gated) but is
        # rejected on hardware until the backend lowering is fixed.
        raise ValueError(
            "langevin_pallas pack>1 is rejected on hardware: the packed "
            "sub-block kernel miscompiles (NaN states; failed OU moment "
            "gate). Use pack=1, or interpret mode for semantics tests."
        )
    if interpret is True:
        # plain interpret mode lacks the TPU PRNG primitives; use the TPU
        # interpreter (works on CPU — the test-suite path)
        interpret = pltpu.InterpretParams()

    cell = pack * block
    if return_trajectory:
        # keep the per-cell trajectory buffer within ~8 MB of VMEM
        budget = 8 * 1024 * 1024 // (n_steps * two_d * 4)
        cell = max(128, min(cell, (budget // 128) * 128))
        if pack > 1:
            # the packed sub-block width is a LANE block dim — it must be
            # a multiple of 128 itself (on-chip lesson: cell=1280/pack=4
            # gave a 320-lane block, rejected by Mosaic)
            block = max(128, (cell // pack) // 128 * 128)
        else:
            block = cell // pack
        cell = pack * block
    # (measured on v5e: block 512 vs 8192 is within 10% for the
    # no-trajectory path — the sequential grid is not the bottleneck —
    # so one default block serves both paths)

    # lane layout + pad the particle axis to a cell multiple
    n_pad = -(-n // cell) * cell
    zT = jnp.zeros((two_d, n_pad), z0.dtype).at[:, :n].set(z0.T)

    if pack > 1:
        final_T, traj3, tau2 = _langevin_pallas_packed(
            seed, zT, n_steps, dt, potential, gamma,
            return_trajectory=return_trajectory,
            random_phase=random_phase, noise_scale=noise_scale,
            block=cell // pack, pack=pack, interpret=interpret,
            integrator=integrator,
        )
        final = final_T.T[:n]
        if not return_trajectory:
            return final, None, None
        trajectory = jnp.transpose(traj3, (2, 0, 1))[:n]
        taus = tau2[0, :n][:, None] + jnp.arange(
            n_steps, dtype=z0.dtype
        )[None, :] * dt
        return final, trajectory, taus

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
        integrator=integrator,
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
        jnp.asarray(noise_scale, jnp.float32).reshape(1),
        zT,
        *[jnp.asarray(a, z0.dtype) for a in param_arrays],
    )

    final = final_T.T[:n]
    if not return_trajectory:
        return final, None, None
    trajectory = jnp.transpose(traj, (2, 0, 1))[:n]  # [n, n_steps, 2d]
    taus = tau0[0, :n][:, None] + jnp.arange(n_steps, dtype=z0.dtype)[None, :] * dt
    return final, trajectory, taus
