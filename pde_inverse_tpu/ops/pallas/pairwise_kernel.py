"""Pallas TPU kernel for the blockwise pairwise mean-field reduction.

The jnp blockwise formulation (losses/pairwise_blockwise.py) already gives
the pairwise MLP reduction MXU shape, but XLA stages each [rows, w] layer
intermediate through HBM between matmuls, capping throughput at the
bandwidth roofline (~w/8 flops/byte).  This kernel fuses the WHOLE tile
chain — first-layer outer difference, second-order forward propagation,
squared-feature head, and the backward sweep to the first-layer cotangent —
into one VMEM-resident program per (stamp, point-block, ref-block) grid
cell, so each pair tile touches HBM exactly once for its inputs and the
accumulators.  This is SURVEY §7's Pallas candidate #2 ("blockwise KMV
pairwise reduction"); the reference triple-vmaps the full [m, n, t, d]
tensor (kinetic_mckean_vlasov.py:22-48).

Scope: plain PotentialMLP stacks (no Fourier front end — that path keeps
the jnp formulation; the quadratic head is exact sufficient statistics
outside either kernel).  Gradients w.r.t. parameters come from a
``jax.custom_vjp`` in pairwise_blockwise.py whose backward runs the jnp
path's VJP, so the kernel itself only ever runs the forward reduction.

Accumulation layout: outputs {value [nt, n], hess [nt, n],
s_dz0 [nt, n, w0]} revisit the same (stamp, point) block across the
ref-block grid axis (innermost), initialized at j == 0 — the standard
Pallas reduction pattern.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# activation -> (act, act', act'') on a traced array, hand-fused (the jnp
# path derives these with jvp; inside the kernel we keep them explicit)
def _tanh_d012(z):
    a = jnp.tanh(z)
    d1 = 1.0 - a * a
    return a, d1, -2.0 * a * d1


def _silu_d012(z):
    s = jax.nn.sigmoid(z)
    ds = s * (1.0 - s)
    return z * s, s + z * ds, 2.0 * ds + z * ds * (1.0 - 2.0 * s)


def _softplus_d012(z):
    s = jax.nn.sigmoid(z)
    return jax.nn.softplus(z), s, s * (1.0 - s)


_ACT_D012 = {"tanh": _tanh_d012, "silu": _silu_d012, "softplus": _softplus_d012}


# activation -> (act, act', act'', act''') — the backward kernel needs the
# third derivative (it backprops through a second-order forward stream)
def _tanh_d0123(z):
    a = jnp.tanh(z)
    d1 = 1.0 - a * a
    d2 = -2.0 * a * d1
    d3 = d1 * (4.0 * a * a - 2.0 * d1)
    return a, d1, d2, d3


def _silu_d0123(z):
    s = jax.nn.sigmoid(z)
    s1 = s * (1.0 - s)
    s2 = s1 * (1.0 - 2.0 * s)
    s3 = s2 * (1.0 - 2.0 * s) - 2.0 * s1 * s1
    return z * s, s + z * s1, 2.0 * s1 + z * s2, 3.0 * s2 + z * s3


def _softplus_d0123(z):
    s = jax.nn.sigmoid(z)
    s1 = s * (1.0 - s)
    return jax.nn.softplus(z), s, s1, s1 * (1.0 - 2.0 * s)


_ACT_D0123 = {
    "tanh": _tanh_d0123,
    "silu": _silu_d0123,
    "softplus": _softplus_d0123,
}


def supported_activation(name: str) -> bool:
    return name in _ACT_D012


def _dot(a, b):
    """[..., k] @ [k, w] with f32 accumulation on the MXU."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_t(a, b):
    """[..., w] @ [k, w]^T with f32 accumulation on the MXU."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pair_rows(axb, arb, avb, compute_dtype):
    """First-layer outer difference + velocity tangent as flat pair rows:
    axb/avb [bi, w0], arb [bj, w0] -> (z, dz) [bj*bi, w0].  Row r = q*bj...
    rows are ordered ref-major: r = p*bi + q pairs ref p with point q.

    The [bj, bi, w0] -> [bj*bi, w0] reshapes run in f32 with the cast to
    ``compute_dtype`` AFTER: Mosaic rejects the reshape on 16-bit packed
    layouts ("infer-vector-layout: unsupported shape cast", first bf16
    on-chip exercise)."""
    f = jnp.float32
    bj, bi = arb.shape[0], axb.shape[0]
    w0 = axb.shape[1]
    z = (
        (axb.astype(f)[None, :, :] - arb.astype(f)[:, None, :])
        .reshape(bj * bi, w0)
        .astype(compute_dtype)
    )
    dz = (
        jnp.broadcast_to(avb.astype(f)[None, :, :], (bj, bi, w0))
        .reshape(bj * bi, w0)
        .astype(compute_dtype)
    )
    return z, dz


def _kernel(n_mid: int, act_name: str, compute_dtype, *refs):
    """Forward kernel body.  refs layout:
    [ax, av, ar, mask, W_1, b_1, ..., W_L, b_L, out_val, out_hess, out_dz0]
    with ax/av [1, bi, w0]; ar [1, bj, w0]; mask [bj, 1] column; weights
    full.  All pair math runs on flat [bj*bi, w] rows (plain 2-D MXU
    matmuls).  Grid is (i, t, j); out_val/out_hess blocks span the FULL
    stamp axis ([nt, bi] — Mosaic requires the second-to-last block dim
    divisible by 8 or equal to the array dim, so a [1, bi] row block is
    rejected) and each (t, j) cell accumulates into row t via a
    sublane-iota select.
    """
    act = _ACT_D012[act_name]
    ax_ref, av_ref, ar_ref, mask_ref = refs[:4]
    w_refs = refs[4 : 4 + 2 * n_mid]
    val_ref, hess_ref, dz0_ref = refs[4 + 2 * n_mid :]
    t = pl.program_id(1)
    j = pl.program_id(2)
    cd = lambda t_: t_.astype(compute_dtype)

    axb = ax_ref[0]  # [bi, w0]
    avb = av_ref[0]
    arb = ar_ref[0]  # [bj, w0]
    mk = mask_ref[...]  # [bj, 1] f32 column (2-D: Mosaic-canonical layout)
    bi, w0 = axb.shape
    bj = arb.shape[0]

    z, dz = _pair_rows(axb, arb, avb, compute_dtype)
    d2z = None  # exactly zero at the first layer (linear in y)

    preacts = []
    for k in range(n_mid):
        W = cd(w_refs[2 * k][...])
        b = cd(w_refs[2 * k + 1][...])
        preacts.append(z)
        a, d1, d2 = act(z)
        h, dh = a, d1 * dz
        d2h = d2 * dz * dz if d2z is None else d2 * dz * dz + d1 * d2z
        z = (_dot(h, W) + b).astype(compute_dtype)
        dz = _dot(dh, W).astype(compute_dtype)
        d2z = _dot(d2h, W).astype(compute_dtype)

    # squared-feature head (f32 reductions, kept 2-D [bj, bi] — minor-axis
    # sums on the 3-D view avoid 1-D intermediates)
    zf = z.astype(jnp.float32).reshape(bj, bi, -1)
    dzf = dz.astype(jnp.float32).reshape(bj, bi, -1)
    d2zf = (
        jnp.zeros_like(zf) if d2z is None else d2z.astype(jnp.float32).reshape(bj, bi, -1)
    )
    f2d = jnp.sum(zf * zf, axis=-1)  # [bj, bi]
    d2f2d = 2.0 * jnp.sum(dzf * dzf + zf * d2zf, axis=-1)

    # backward sweep to the first-layer cotangent
    delta = (2.0 * zf.reshape(bj * bi, -1)).astype(compute_dtype)
    for k in reversed(range(n_mid)):
        W = cd(w_refs[2 * k][...])
        _, d1, _ = act(preacts[k])
        delta = (_dot_t(delta, W) * d1).astype(compute_dtype)

    # masked sums over the ref axis of the tile (mask stays a [bj, 1]
    # column: minor-dim broadcast, the canonical TPU pattern)
    mk2 = jnp.broadcast_to(mk, (bj, bi))
    val_row = jnp.sum(mk2 * f2d, axis=0, keepdims=True)  # [1, bi]
    hess_row = jnp.sum(mk2 * d2f2d, axis=0, keepdims=True)
    dz0_c = jnp.sum(
        delta.astype(jnp.float32).reshape(bj, bi, w0) * mk[:, :, None], axis=0
    )  # [bi, w0]

    # row-t select on the full-stamp [nt, bi] output block
    nt_b = val_ref.shape[0]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (nt_b, bi), 0) == t
    ).astype(jnp.float32)

    @pl.when((t == 0) & (j == 0))
    def _():
        val_ref[...] = sel * val_row
        hess_ref[...] = sel * hess_row

    @pl.when((t > 0) | (j > 0))
    def _():
        val_ref[...] += sel * val_row
        hess_ref[...] += sel * hess_row

    @pl.when(j == 0)
    def _():
        dz0_ref[0] = dz0_c

    @pl.when(j > 0)
    def _():
        dz0_ref[0] += dz0_c


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Test hook: force interpreter mode globally (CPU equality gates).
_INTERPRET = False


def mlp_pairwise_sums(
    mids: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    act_name: str,
    ax: jnp.ndarray,
    av: jnp.ndarray,
    ar: jnp.ndarray,
    mask: jnp.ndarray,
    compute_dtype=jnp.float32,
    block_i: int = 128,
    block_j: int = 8,
    interpret: bool = False,
):
    """Masked pairwise sums over the per-stamp ref axis.

    Default tile R = block_i*block_j = 1024 pair rows — the forward
    holds 3 streams + per-layer preacts live; sized with ~3x headroom
    against the v5e 16 MB scoped-VMEM limit (see the backward's
    docstring for the measured per-row cost that blew it at R=2048).

    mids: [(W_k [w_{k-1}, w_k], b_k)] hidden + feature layers (everything
    AFTER the first linear stage, whose per-point projections are
    precomputed); ax, av: [nt, n, w0] first-layer projections of
    points/velocities (ax includes the bias); ar: [nt, m, w0] ref
    projections; mask: [m] validity (f32/bool).

    Returns {"value" [nt, n], "hess" [nt, n], "s_dz0" [nt, n, w0]}:
        value[t, i]  = sum_j mask_j * Phi(y_ijt)
        hess[t, i]   = sum_j mask_j * v_i^T Hess Phi(y_ijt) v_i
        s_dz0[t, i]  = sum_j mask_j * dPhi/dz0(y_ijt)   (first-layer
                       cotangent; project with W0y^T/B^T outside)
    """
    nt, n, w0 = ax.shape
    m = ar.shape[1]
    n_mid = len(mids)

    bi = min(block_i, _round_up(n, 8))
    bj = min(block_j, m)
    n_pad = _round_up(n, bi)
    m_pad = _round_up(m, bj)
    mask = mask.astype(jnp.float32)
    if n_pad != n:
        ax = jnp.pad(ax, ((0, 0), (0, n_pad - n), (0, 0)))
        av = jnp.pad(av, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        ar = jnp.pad(ar, ((0, 0), (0, m_pad - m), (0, 0)))
        mask = jnp.pad(mask, (0, m_pad - m))
    mask2 = mask[:, None]  # [m_pad, 1] column

    # grid: i outermost so the full-stamp [nt, bi] val/hess blocks are
    # revisited contiguously across the whole (t, j) sweep of each i
    grid = (n_pad // bi, nt, m_pad // bj)

    in_specs = [
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),
        pl.BlockSpec((1, bj, w0), lambda i, t, j: (t, j, 0)),
        pl.BlockSpec((bj, 1), lambda i, t, j: (j, 0)),
    ]
    args = [ax, av, ar, mask2]
    for W, b in mids:
        in_specs.append(pl.BlockSpec(W.shape, lambda i, t, j: (0, 0)))
        args.append(W)
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i, t, j: (0, 0)))
        args.append(b.reshape(1, -1))

    out_shape = [
        jax.ShapeDtypeStruct((nt, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((nt, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((nt, n_pad, w0), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((nt, bi), lambda i, t, j: (0, i)),
        pl.BlockSpec((nt, bi), lambda i, t, j: (0, i)),
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),
    ]

    flops_tile = 2 * bi * bj * sum(
        3 * W.shape[0] * W.shape[1] + 2 * W.shape[0] * W.shape[1]
        for W, _ in mids
    )
    val, hess, s_dz0 = pl.pallas_call(
        functools.partial(_kernel, n_mid, act_name, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * grid[0] * grid[1] * grid[2],
            bytes_accessed=(ax.size + av.size + ar.size) * 4,
            transcendentals=bi * bj * sum(W.shape[1] for W, _ in mids),
        ),
        # same scoped-VMEM headroom as the backward (see mlp_pairwise_sums_bwd)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret or _INTERPRET,
    )(*args)
    return {
        "value": val[:, :n],
        "hess": hess[:, :n],
        "s_dz0": s_dz0[:, :n],
    }


def _bwd_kernel(n_mid: int, act_name: str, compute_dtype, *refs):
    """Backward kernel body.

    The VJP of the masked pairwise sums w.r.t. (mid-layer weights, ax, av,
    ar) given upstream cotangents (g_val, g_hess, g_dz0).  Key identity:
    the cotangent of the summed first-layer cotangent acts as ONE MORE
    first-order tangent direction r0 = g_dz0[i] at the z0 level, so the
    whole backward is a 4-stream forward propagation (z, p=d_v z,
    q=d_v^2 z, r=d_g z) of the per-pair scalar

        S = mask_j * (g_val[i] * Phi + g_hess[i] * d2f_v + df_r)

    followed by one reverse sweep that accumulates weight gradients in
    revisited constant-index output blocks across the whole grid.

    refs layout: [ax, av, ar, mask, gval, ghess, gdz0,
                  W_1, b_1, ..., W_L, b_L,
                  out_Wbar_1, out_bbar_1, ..., out_ax_bar, out_av_bar,
                  out_ar_bar_partial]
    """
    act3 = _ACT_D0123[act_name]
    ax_ref, av_ref, ar_ref, mask_ref, gval_ref, ghess_ref, gdz0_ref = refs[:7]
    w_refs = refs[7 : 7 + 2 * n_mid]
    grad_refs = refs[7 + 2 * n_mid : 7 + 4 * n_mid]
    axbar_ref, avbar_ref, arbar_ref = refs[7 + 4 * n_mid :]
    i = pl.program_id(0)
    t = pl.program_id(1)
    j = pl.program_id(2)
    first_cell = (i == 0) & (t == 0) & (j == 0)
    cd = lambda a: a.astype(compute_dtype)

    axb = ax_ref[0]
    avb = av_ref[0]
    arb = ar_ref[0]
    mk = mask_ref[...]  # [bj, 1] column
    bi, w0 = axb.shape
    bj = arb.shape[0]
    R = bj * bi
    # g_val/g_hess ride in as full-stamp [nt, bi] blocks (a [1, bi] row
    # block violates Mosaic's second-to-last-dim rule); select row t with
    # a sublane-iota mask + sum — canonical 2-D ops, no transposes
    nt_b = gval_ref.shape[0]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (nt_b, bi), 0) == t
    ).astype(jnp.float32)
    gv = jnp.sum(sel * gval_ref[...], axis=0, keepdims=True)  # [1, bi]
    gh = jnp.sum(sel * ghess_ref[...], axis=0, keepdims=True)  # [1, bi]
    gr = gdz0_ref[0]  # [bi, w0]

    # 4 forward streams on flat pair rows
    z, p = _pair_rows(axb, arb, avb, compute_dtype)
    q = None  # exactly zero at z0
    # f32 reshape + late cast: 16-bit reshapes are unsupported (see
    # _pair_rows)
    r = (
        jnp.broadcast_to(gr.astype(jnp.float32)[None, :, :], (bj, bi, w0))
        .reshape(R, w0)
        .astype(compute_dtype)
    )

    saved = []
    for k in range(n_mid):
        W = cd(w_refs[2 * k][...])
        b = cd(w_refs[2 * k + 1][...])
        saved.append((z, p, q, r))
        a0, a1, a2, _ = act3(z)
        h = a0
        hp = a1 * p
        hq = a2 * p * p if q is None else a2 * p * p + a1 * q
        hr = a1 * r
        z = (_dot(h, W) + b).astype(compute_dtype)
        p = _dot(hp, W).astype(compute_dtype)
        q = _dot(hq, W).astype(compute_dtype)
        r = _dot(hr, W).astype(compute_dtype)

    # head cotangents of S: per-row (mask, g_val, g_hess) scalars applied
    # on the 3-D [bj, bi, w] view via size-1-axis broadcasts (no [R, 1]
    # column reshapes of lane-major tiles)
    w_last = z.shape[-1]
    z3 = z.astype(jnp.float32).reshape(bj, bi, w_last)
    p3 = p.astype(jnp.float32).reshape(bj, bi, w_last)
    q3 = q.astype(jnp.float32).reshape(bj, bi, w_last)
    r3 = r.astype(jnp.float32).reshape(bj, bi, w_last)
    mk3 = mk[:, :, None]  # [bj, 1, 1]
    gv3 = gv[:, :, None] * mk3  # [bj, bi, 1]
    gh3 = gh[:, :, None] * mk3
    zbar = (2.0 * gv3 * z3 + 2.0 * gh3 * q3 + 2.0 * mk3 * r3).reshape(R, w_last)
    pbar = (4.0 * gh3 * p3).reshape(R, w_last)
    qbar = (2.0 * gh3 * z3).reshape(R, w_last)
    rbar = (2.0 * mk3 * z3).reshape(R, w_last)

    # reverse sweep with in-kernel weight-gradient accumulation
    zbar = zbar.astype(compute_dtype)
    pbar = pbar.astype(compute_dtype)
    qbar = qbar.astype(compute_dtype)
    rbar = rbar.astype(compute_dtype)
    for k in reversed(range(n_mid)):
        W = cd(w_refs[2 * k][...])
        zk, pk, qk, rk = saved[k]
        a0, a1, a2, a3 = act3(zk)
        h = a0
        hp = a1 * pk
        hq = a2 * pk * pk if qk is None else a2 * pk * pk + a1 * qk
        hr = a1 * rk

        def wcon(lhs, rhs):  # [R, win]^T @ [R, wout] -> [win, wout], f32
            return jax.lax.dot_general(
                lhs, rhs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        wbar = (
            wcon(h, zbar) + wcon(hp, pbar) + wcon(hq, qbar) + wcon(hr, rbar)
        )
        bbar = jnp.sum(zbar.astype(jnp.float32), axis=0, keepdims=True)

        @pl.when(first_cell)
        def _(k=k, wbar=wbar, bbar=bbar):
            grad_refs[2 * k][...] = wbar
            grad_refs[2 * k + 1][...] = bbar

        @pl.when(jnp.logical_not(first_cell))
        def _(k=k, wbar=wbar, bbar=bbar):
            grad_refs[2 * k][...] += wbar
            grad_refs[2 * k + 1][...] += bbar

        hbar = _dot_t(zbar, W)
        hpbar = _dot_t(pbar, W)
        hqbar = _dot_t(qbar, W)
        hrbar = _dot_t(rbar, W)
        zbar_new = hbar * a1 + hpbar * (a2 * pk) + hrbar * (a2 * rk)
        zbar_new = zbar_new + hqbar * (
            a3 * pk * pk if qk is None else a3 * pk * pk + a2 * qk
        )
        pbar = (hpbar * a1 + hqbar * (2.0 * a2 * pk)).astype(compute_dtype)
        qbar = (hqbar * a1).astype(compute_dtype)
        rbar = (hrbar * a1).astype(compute_dtype)
        zbar = zbar_new.astype(compute_dtype)

    # z0-level cotangents -> ax/av accumulators and the ar partial
    z0bar = zbar.astype(jnp.float32).reshape(bj, bi, w0)
    p0bar = pbar.astype(jnp.float32).reshape(bj, bi, w0)
    ax_c = jnp.sum(z0bar, axis=0)  # [bi, w0]
    av_c = jnp.sum(p0bar, axis=0)
    ar_c = -jnp.sum(z0bar, axis=1)  # [bj, w0]

    @pl.when(j == 0)
    def _():
        axbar_ref[0] = ax_c
        avbar_ref[0] = av_c

    @pl.when(j > 0)
    def _():
        axbar_ref[0] += ax_c
        avbar_ref[0] += av_c

    arbar_ref[0, 0] = ar_c  # (i, t, j) cell written exactly once


def mlp_pairwise_sums_bwd(
    mids: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    act_name: str,
    ax: jnp.ndarray,
    av: jnp.ndarray,
    ar: jnp.ndarray,
    mask: jnp.ndarray,
    g_val: jnp.ndarray,
    g_hess: jnp.ndarray,
    g_dz0: jnp.ndarray,
    compute_dtype=jnp.float32,
    block_i: int = 128,
    block_j: int = 8,
    interpret: bool = False,
):
    """VJP of ``mlp_pairwise_sums`` w.r.t. (mids, ax, av, ar).

    g_val/g_hess: [nt, n]; g_dz0: [nt, n, w0] upstream cotangents.
    Returns (mids_bar [(Wbar, bbar)...], ax_bar [nt, n, w0], av_bar,
    ar_bar [nt, m, w0]).

    Default tile is R = block_i*block_j = 1024 pair rows — the legal
    floor AND the VMEM ceiling at once: the backward holds 4 forward
    streams + per-layer saves + 4 cotangent streams live, measured
    ~10.8 KB of scoped VMEM per pair row at w=32/n_mid=2 on v5e (R=2048
    allocated 21.66 MB against the 16 MB scoped-vmem limit, first
    on-chip exercise).  block_j must be a multiple of 8 (second-to-last
    dim of the `ar` input blocks) and block_i a multiple of 128 (last
    dim of the [nt, bi] g_val/g_hess blocks), so R cannot go below 1024
    without a layout change; if 1024 still trips the limit the next
    lever is recomputing the forward streams in the reverse sweep
    instead of saving them.
    """
    nt, n, w0 = ax.shape
    m = ar.shape[1]
    n_mid = len(mids)

    bi = min(block_i, _round_up(n, 8))
    bj = min(block_j, m)
    n_pad = _round_up(n, bi)
    m_pad = _round_up(m, bj)
    mask = mask.astype(jnp.float32)
    if n_pad != n:
        padn = ((0, 0), (0, n_pad - n))
        ax = jnp.pad(ax, padn + ((0, 0),))
        av = jnp.pad(av, padn + ((0, 0),))
        g_val = jnp.pad(g_val, padn)
        g_hess = jnp.pad(g_hess, padn)
        g_dz0 = jnp.pad(g_dz0, padn + ((0, 0),))
    if m_pad != m:
        ar = jnp.pad(ar, ((0, 0), (0, m_pad - m), (0, 0)))
        mask = jnp.pad(mask, (0, m_pad - m))
    mask2 = mask[:, None]  # [m_pad, 1] column
    n_blk_i = n_pad // bi

    grid = (n_blk_i, nt, m_pad // bj)
    in_specs = [
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),  # ax
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),  # av
        pl.BlockSpec((1, bj, w0), lambda i, t, j: (t, j, 0)),  # ar
        pl.BlockSpec((bj, 1), lambda i, t, j: (j, 0)),  # mask
        pl.BlockSpec((nt, bi), lambda i, t, j: (0, i)),  # g_val (full stamps)
        pl.BlockSpec((nt, bi), lambda i, t, j: (0, i)),  # g_hess
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),  # g_dz0
    ]
    args = [ax, av, ar, mask2, g_val, g_hess, g_dz0]
    for W, b in mids:
        in_specs.append(pl.BlockSpec(W.shape, lambda i, t, j: (0, 0)))
        args.append(W)
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i, t, j: (0, 0)))
        args.append(b.reshape(1, -1))

    out_shape = []
    out_specs = []
    for W, b in mids:  # weight grads: constant-index accumulators
        out_shape.append(jax.ShapeDtypeStruct(W.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(W.shape, lambda i, t, j: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
        out_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i, t, j: (0, 0)))
    out_shape.append(jax.ShapeDtypeStruct((nt, n_pad, w0), jnp.float32))
    out_specs.append(pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)))
    out_shape.append(jax.ShapeDtypeStruct((nt, n_pad, w0), jnp.float32))
    out_specs.append(pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)))
    # ar partials: one extra point-block axis, each (i, t, j) cell written
    # exactly once (the j-fastest grid order cannot revisit (t, j) blocks
    # consecutively across i)
    out_shape.append(
        jax.ShapeDtypeStruct((n_blk_i, nt, m_pad, w0), jnp.float32)
    )
    out_specs.append(
        pl.BlockSpec((1, 1, bj, w0), lambda i, t, j: (i, t, j, 0))
    )

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_mid, act_name, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # Raise the scoped-VMEM budget from the 16 MB default: XLA promotes
        # the [n_blk_i, nt, m_pad, w0] ar partial into VMEM when it fits
        # the chip (observed at the 7x2000 production geometry: a 17.9 MB
        # S(1) output + ~23 MB of kernel stack = 40.7 MB > 16 MB OOM,
        # r3G mlp15k).  v5e has 128 MB of physical VMEM; 100 MB leaves
        # headroom for Mosaic's own scratch.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret or _INTERPRET,
    )(*args)

    mids_bar = [
        (outs[2 * k], outs[2 * k + 1].reshape(-1)) for k in range(n_mid)
    ]
    ax_bar = outs[2 * n_mid][:, :n]
    av_bar = outs[2 * n_mid + 1][:, :n]
    ar_bar = jnp.sum(outs[2 * n_mid + 2], axis=0)[:, :m]
    return mids_bar, ax_bar, av_bar, ar_bar
