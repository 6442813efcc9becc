"""Lane-packed Pallas TPU kernels for the blockwise pairwise KMV reduction.

Second-generation kernels behind ``losses/pairwise_blockwise.py`` (the v1
kernels live in pairwise_kernel.py and remain the fallback).  Two exact
restructurings close the measured fwd<->bwd work-ratio gap (docs/ROOFLINE.md
S4: the v1 backward issues ~24 underfilled MXU dots/pair-row at the
production hidden width w=32, 4x below the 128-wide systolic array):

1. **Squared-feature head collapse.**  With the feature layer (W_F [w, F],
   b_F [F]) and head Phi = |act(z) W_F + b_F|^2, the width-F stream never
   needs to exist:

       Phi(g) = g.(M g) + u.g + c,   M = W_F W_F^T  [w, w],
                                     u = 2 W_F b_F  [w],  c = |b_F|^2,

   so the kernel's widest matmul drops from [R, w]x[w, F=128] (x4 streams)
   to one packed [R, Pw]x[Pw, Pw] dot.  M/u/c are built OUTSIDE the
   custom-vjp boundary with plain jnp (differentiable), so the W_F/b_F
   cotangent chain through M is autodiff — the kernels only ever see
   (mids[:-1], M, u); the constant-per-pair c term is added outside as
   ``c * sum(mask)``.

2. **Stream lane-packing with block-diagonal weights.**  All propagation
   streams multiply the SAME layer weights, so P streams of width w pack
   along the lane axis into one [R, P*w] array and each layer becomes ONE
   dot against blkdiag_P(W) [P*w, P*w].  At the production w=32, P=4 the
   packed dot exactly fills the 128-wide MXU: 1 issue/row where v1 paid 4.
   (For w > 32 the packed dot tiles and the gain vanishes — the wrapper
   auto-selects these kernels only when every kernel width is <= 32.)

Forward packs P=3 streams (z, d_v z, d_v^2 z); backward packs P=4
(z, p=d_v z, q=d_v^2 z, r=d_g z) exactly as v1's 4-stream formulation
(pairwise_kernel.mlp_pairwise_sums_bwd) — the algebra per stream is
identical, only the layout changes.  Accumulator layouts (sel-iota row
select on full-stamp [nt, bi] blocks, j==0-initialized revisited blocks,
once-written ar partials) are v1's, proven on this backend.

Parity anchor: the reference triple-vmaps the full [m, n, t, d] pairwise
tensor (kinetic_mckean_vlasov.py:22-48); no analogue of either
restructuring exists there.  Equality with the jnp blockwise path is gated
by tests/test_pallas_packed.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pde_inverse_tpu.ops.pallas.pairwise_kernel import (
    _ACT_D012,
    _ACT_D0123,
    _dot,
    _dot_t,
    _pair_rows,
    _round_up,
)

# Test hook: force interpreter mode globally (CPU equality gates).
_INTERPRET = False

_VMEM_BUDGET = 100 * 1024 * 1024  # see pairwise_kernel.mlp_pairwise_sums_bwd


def packed_supported(mids, act_name: str) -> bool:
    """True iff the packed kernels are the PROFITABLE choice: every width
    the kernel touches fits 4 packed streams in the 128-lane registers
    (w <= 32).  Correctness holds for any width; beyond 32 lanes the packed
    dot tiles and v1's per-stream dots are no slower."""
    if act_name not in _ACT_D0123:
        return False
    widths = [W.shape[0] for W, _ in mids] + [mids[-1][0].shape[0]]
    return max(widths) <= 32


def _blkdiag(W, p: int):
    """blkdiag_p(W): [p*win, p*wout] with W on the diagonal blocks."""
    win, wout = W.shape
    out = jnp.zeros((p * win, p * wout), W.dtype)
    for s in range(p):
        out = out.at[s * win : (s + 1) * win, s * wout : (s + 1) * wout].set(W)
    return out


def _pack_bias(b, p: int):
    """[1, p*w] bias with b in slot 0 (tangent streams are bias-free)."""
    return jnp.concatenate([b, jnp.zeros(((p - 1) * b.shape[0],), b.dtype)])[
        None, :
    ]


def _slices(a, w: int, p: int):
    return tuple(a[:, s * w : (s + 1) * w] for s in range(p))


def _fwd_kernel(n_m: int, w_last: int, act_name: str, compute_dtype, *refs):
    """Packed forward body.  refs layout:
    [ax, av, ar, mask, Wblk_1, bblk_1, ..., Wblk_nm, bblk_nm, Mblk, u,
     out_val, out_hess, out_dz0]
    with ax/av [1, bi, w0]; ar [1, bj, w0]; mask [bj, 1]; Wblk_k the P=3
    block-diagonal mid weights; Mblk = blkdiag_3(M); u [1, w_last].
    Grid (i, t, j) and output accumulation exactly as
    pairwise_kernel._kernel."""
    act = _ACT_D012[act_name]
    ax_ref, av_ref, ar_ref, mask_ref = refs[:4]
    w_refs = refs[4 : 4 + 2 * n_m]
    mblk_ref, u_ref = refs[4 + 2 * n_m : 6 + 2 * n_m]
    val_ref, hess_ref, dz0_ref = refs[6 + 2 * n_m :]
    t = pl.program_id(1)
    j = pl.program_id(2)
    cd = lambda a: a.astype(compute_dtype)
    P = 3

    axb = ax_ref[0]  # [bi, w0]
    avb = av_ref[0]
    arb = ar_ref[0]  # [bj, w0]
    mk = mask_ref[...]  # [bj, 1]
    bi, w0 = axb.shape
    bj = arb.shape[0]
    R = bj * bi

    z, dz = _pair_rows(axb, arb, avb, compute_dtype)
    zp = jnp.concatenate([z, dz, jnp.zeros_like(z)], axis=1)  # [R, 3*w0]

    a1_saved = []
    w = w0
    for k in range(n_m):
        Wb = cd(w_refs[2 * k][...])
        bb = cd(w_refs[2 * k + 1][...])
        zk, pk, qk = _slices(zp, w, P)
        a0, a1, a2 = act(zk)
        a1_saved.append(a1)
        h = jnp.concatenate([a0, a1 * pk, a2 * pk * pk + a1 * qk], axis=1)
        zp = (_dot(h, Wb) + bb).astype(compute_dtype)
        w = Wb.shape[1] // P

    # head: g = act(z_final); Phi = g.(M g) + u.g  (+c outside)
    zk, pk, qk = _slices(zp, w_last, P)
    a0, a1, a2 = act(zk)
    g, gp = a0, a1 * pk
    gq = a2 * pk * pk + a1 * qk
    g3 = jnp.concatenate([g, gp, gq], axis=1)
    mg3 = _dot(g3, cd(mblk_ref[...])).astype(jnp.float32)
    Mg, Mgp, Mgq = _slices(mg3, w_last, P)
    u = u_ref[...].astype(jnp.float32)  # [1, w_last]
    gf, gpf, gqf = (
        g.astype(jnp.float32),
        gp.astype(jnp.float32),
        gq.astype(jnp.float32),
    )
    # per-pair scalars, kept 2-D [bj, bi] via the 3-D view reduction
    phi = jnp.sum((gf * Mg + gf * u).reshape(bj, bi, w_last), axis=-1)
    d2phi = jnp.sum(
        (2.0 * gpf * Mgp + 2.0 * gqf * Mg + gqf * u).reshape(bj, bi, w_last),
        axis=-1,
    )

    # reverse sweep to the first-layer cotangent (single stream, width w)
    delta = ((2.0 * Mg + u) * a1.astype(jnp.float32)).astype(compute_dtype)
    for k in reversed(range(n_m)):
        Wb = cd(w_refs[2 * k][...])
        w_in = Wb.shape[0] // P
        w_out = Wb.shape[1] // P
        W = Wb[:w_in, :w_out]  # slot-0 diagonal block = the raw weights
        delta = (_dot_t(delta, W) * a1_saved[k]).astype(compute_dtype)

    mk2 = jnp.broadcast_to(mk, (bj, bi))
    val_row = jnp.sum(mk2 * phi, axis=0, keepdims=True)  # [1, bi]
    hess_row = jnp.sum(mk2 * d2phi, axis=0, keepdims=True)
    dz0_c = jnp.sum(
        delta.astype(jnp.float32).reshape(bj, bi, w0) * mk[:, :, None], axis=0
    )  # [bi, w0]

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


def mlp_pairwise_sums_packed(
    mids_m: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    M: jnp.ndarray,
    u: jnp.ndarray,
    act_name: str,
    ax: jnp.ndarray,
    av: jnp.ndarray,
    ar: jnp.ndarray,
    mask: jnp.ndarray,
    compute_dtype=jnp.float32,
    block_i: int = 128,
    block_j: int = 16,
    interpret: bool = False,
):
    """Masked pairwise sums with the collapsed quadratic head.

    mids_m: hidden layers BEFORE the feature layer (possibly empty);
    M [w, w] = W_F W_F^T, u [w] = 2 W_F b_F of the collapsed head; ax/av/ar
    [nt, ., w0] first-layer projections and mask [m] exactly as
    pairwise_kernel.mlp_pairwise_sums.  Returns {"value" [nt, n],
    "hess" [nt, n], "s_dz0" [nt, n, w0]} — value EXCLUDES the per-pair
    constant c = |b_F|^2 (add ``c * sum(mask)`` outside)."""
    nt, n, w0 = ax.shape
    m = ar.shape[1]
    n_m = len(mids_m)
    P = 3

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
    mask2 = mask[:, None]

    grid = (n_pad // bi, nt, m_pad // bj)
    in_specs = [
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),
        pl.BlockSpec((1, bj, w0), lambda i, t, j: (t, j, 0)),
        pl.BlockSpec((bj, 1), lambda i, t, j: (j, 0)),
    ]
    args = [ax, av, ar, mask2]
    for W, b in mids_m:
        Wb, bb = _blkdiag(W, P), _pack_bias(b, P)
        in_specs.append(pl.BlockSpec(Wb.shape, lambda i, t, j: (0, 0)))
        args.append(Wb)
        in_specs.append(pl.BlockSpec(bb.shape, lambda i, t, j: (0, 0)))
        args.append(bb)
    Mb = _blkdiag(M, P)
    in_specs.append(pl.BlockSpec(Mb.shape, lambda i, t, j: (0, 0)))
    args.append(Mb)
    u2 = u.reshape(1, -1)
    in_specs.append(pl.BlockSpec(u2.shape, lambda i, t, j: (0, 0)))
    args.append(u2)
    w_last = M.shape[0]

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

    flops_tile = 2 * bi * bj * (
        sum(P * W.shape[0] * P * W.shape[1] for W, _ in mids_m)
        + P * w_last * P * w_last
        + sum(W.shape[0] * W.shape[1] for W, _ in mids_m)
    )
    val, hess, s_dz0 = pl.pallas_call(
        functools.partial(_fwd_kernel, n_m, w_last, act_name, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * grid[0] * grid[1] * grid[2],
            bytes_accessed=(ax.size + av.size + ar.size) * 4,
            transcendentals=bi * bj
            * (sum(W.shape[0] for W, _ in mids_m) + w_last),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret or _INTERPRET,
    )(*args)
    return {
        "value": val[:, :n],
        "hess": hess[:, :n],
        "s_dz0": s_dz0[:, :n],
    }


def _bwd_kernel(n_m: int, w_last: int, act_name: str, compute_dtype, *refs):
    """Packed backward body — v1's 4-stream formulation
    (pairwise_kernel._bwd_kernel) on packed [R, 4w] lanes with the collapsed
    head.  refs layout:
    [ax, av, ar, mask, gval, ghess, gdz0,
     Wblk_1, bblk_1, ..., Wblk_nm, bblk_nm, Mblk, u,
     out_Wbarblk_1, out_bbarblk_1, ..., out_Mbar2, out_ubar,
     out_ax_bar, out_av_bar, out_ar_bar_partial]
    where out_Mbar2 is the packed [2w, 2w] contraction whose (0,0)/(1,1)
    diagonal blocks sum to Mbar (extracted by the wrapper)."""
    act3 = _ACT_D0123[act_name]
    ax_ref, av_ref, ar_ref, mask_ref, gval_ref, ghess_ref, gdz0_ref = refs[:7]
    w_refs = refs[7 : 7 + 2 * n_m]
    mblk_ref, u_ref = refs[7 + 2 * n_m : 9 + 2 * n_m]
    grad_refs = refs[9 + 2 * n_m : 9 + 4 * n_m]
    mbar_ref, ubar_ref = refs[9 + 4 * n_m : 11 + 4 * n_m]
    axbar_ref, avbar_ref, arbar_ref = refs[11 + 4 * n_m :]
    i = pl.program_id(0)
    t = pl.program_id(1)
    j = pl.program_id(2)
    first_cell = (i == 0) & (t == 0) & (j == 0)
    cd = lambda a: a.astype(compute_dtype)
    P = 4

    axb = ax_ref[0]
    avb = av_ref[0]
    arb = ar_ref[0]
    mk = mask_ref[...]  # [bj, 1]
    bi, w0 = axb.shape
    bj = arb.shape[0]
    R = bj * bi
    nt_b = gval_ref.shape[0]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (nt_b, bi), 0) == t
    ).astype(jnp.float32)
    gv = jnp.sum(sel * gval_ref[...], axis=0, keepdims=True)  # [1, bi]
    gh = jnp.sum(sel * ghess_ref[...], axis=0, keepdims=True)
    gr = gdz0_ref[0]  # [bi, w0]

    z, p = _pair_rows(axb, arb, avb, compute_dtype)
    r = (
        jnp.broadcast_to(gr.astype(jnp.float32)[None, :, :], (bj, bi, w0))
        .reshape(R, w0)
        .astype(compute_dtype)
    )
    zp = jnp.concatenate([z, p, jnp.zeros_like(z), r], axis=1)  # [R, 4*w0]

    saved = []
    w = w0
    for k in range(n_m):
        Wb = cd(w_refs[2 * k][...])
        bb = cd(w_refs[2 * k + 1][...])
        saved.append(zp)
        zk, pk, qk, rk = _slices(zp, w, P)
        a0, a1, a2, _ = act3(zk)
        h = jnp.concatenate(
            [a0, a1 * pk, a2 * pk * pk + a1 * qk, a1 * rk], axis=1
        )
        zp = (_dot(h, Wb) + bb).astype(compute_dtype)
        w = Wb.shape[1] // P

    # g-level streams and the packed M dot
    zk, pk, qk, rk = _slices(zp, w_last, P)
    a0, a1, a2, a3 = act3(zk)
    g, gp = a0, a1 * pk
    gq = a2 * pk * pk + a1 * qk
    gs = a1 * rk  # r-direction tangent of g
    g4 = jnp.concatenate([g, gp, gq, gs], axis=1)
    mg4 = _dot(g4, cd(mblk_ref[...])).astype(jnp.float32)
    Mg, Mgp, Mgq, Mgr = _slices(mg4, w_last, P)
    u = u_ref[...].astype(jnp.float32)

    # per-row lambda weights on the 3-D view (no [R, 1] column reshapes)
    mk3 = mk[:, :, None]  # [bj, 1, 1]
    gv3 = gv[:, :, None] * mk3  # [bj, bi, 1]
    gh3 = gh[:, :, None] * mk3
    mkb = jnp.broadcast_to(mk3, (bj, bi, 1))

    def wrow(t_, coef):  # coef [bj, bi, 1] applied to [R, w_last] f32
        return (t_.reshape(bj, bi, w_last) * coef).reshape(R, w_last)

    gf = g.astype(jnp.float32)
    gpf = gp.astype(jnp.float32)
    gqf = gq.astype(jnp.float32)
    gsf = gs.astype(jnp.float32)
    two_mg_u = 2.0 * Mg + u

    # head cotangents at the g level (see module docstring math):
    #   S = mk*(gv*Phi + gh*d2Phi + dPhi_r),  Phi = g.Mg + u.g,
    #   d2Phi = 2 gp.Mgp + 2 gq.Mg + u.gq,    dPhi_r = (2Mg+u).gs
    gbar = wrow(two_mg_u, gv3) + wrow(2.0 * Mgq, gh3) + wrow(2.0 * Mgr, mkb)
    gpbar = wrow(4.0 * Mgp, gh3)
    gqbar = wrow(two_mg_u, gh3)
    gsbar = wrow(two_mg_u, mkb)

    # Mbar/ubar accumulators: Mbar = L1^T g + L2^T gp with
    #   L1 = mk*gv*g + 2*mk*gh*gq + 2*mk*gs,  L2 = 2*mk*gh*gp
    L1 = wrow(gf, gv3) + wrow(2.0 * gqf, gh3) + wrow(2.0 * gsf, mkb)
    L2 = wrow(2.0 * gpf, gh3)
    Lpack = jnp.concatenate([L1, L2], axis=1).astype(compute_dtype)
    Gpack = jnp.concatenate([gf, gpf], axis=1).astype(compute_dtype)
    mbar2 = jax.lax.dot_general(
        Lpack, Gpack, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [2w, 2w]
    ubar_row = wrow(gf, gv3) + wrow(gqf, gh3) + wrow(gsf, mkb)
    ubar_c = jnp.sum(ubar_row, axis=0, keepdims=True)  # [1, w_last]

    @pl.when(first_cell)
    def _():
        mbar_ref[...] = mbar2
        ubar_ref[...] = ubar_c

    @pl.when(jnp.logical_not(first_cell))
    def _():
        mbar_ref[...] += mbar2
        ubar_ref[...] += ubar_c

    # g-level cotangents -> z_final-preact-level packed cotangents
    zbar = (
        gbar * a1
        + gpbar * (a2 * pk)
        + gqbar * (a3 * pk * pk + a2 * qk)
        + gsbar * (a2 * rk)
    )
    pbar = gpbar * a1 + gqbar * (2.0 * a2 * pk)
    qbar = gqbar * a1
    rbar = gsbar * a1
    zb4 = jnp.concatenate([zbar, pbar, qbar, rbar], axis=1).astype(
        compute_dtype
    )

    # reverse sweep with packed weight-gradient accumulation
    for k in reversed(range(n_m)):
        Wb = cd(w_refs[2 * k][...])
        w_in = Wb.shape[0] // P
        zpk = saved[k]
        zk, pk, qk, rk = _slices(zpk, w_in, P)
        a0, a1, a2, a3 = act3(zk)
        h = jnp.concatenate(
            [a0, a1 * pk, a2 * pk * pk + a1 * qk, a1 * rk], axis=1
        )
        wbar = jax.lax.dot_general(
            h, zb4, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # packed [4*w_in, 4*w_out]
        bbar = jnp.sum(zb4.astype(jnp.float32), axis=0, keepdims=True)

        @pl.when(first_cell)
        def _(k=k, wbar=wbar, bbar=bbar):
            grad_refs[2 * k][...] = wbar
            grad_refs[2 * k + 1][...] = bbar

        @pl.when(jnp.logical_not(first_cell))
        def _(k=k, wbar=wbar, bbar=bbar):
            grad_refs[2 * k][...] += wbar
            grad_refs[2 * k + 1][...] += bbar

        hb4 = _dot_t(zb4, Wb).astype(jnp.float32)
        hbar, hpbar, hqbar, hrbar = _slices(hb4, w_in, P)
        zbar = (
            hbar * a1
            + hpbar * (a2 * pk)
            + hqbar * (a3 * pk * pk + a2 * qk)
            + hrbar * (a2 * rk)
        )
        pbar = hpbar * a1 + hqbar * (2.0 * a2 * pk)
        qbar = hqbar * a1
        rbar = hrbar * a1
        zb4 = jnp.concatenate([zbar, pbar, qbar, rbar], axis=1).astype(
            compute_dtype
        )

    # z0-level cotangents -> ax/av accumulators and the ar partial
    zbar0, pbar0, _, _ = _slices(zb4.astype(jnp.float32), w0, P)
    z0bar = zbar0.reshape(bj, bi, w0)
    p0bar = pbar0.reshape(bj, bi, w0)
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

    arbar_ref[0, 0] = ar_c


def mlp_pairwise_sums_packed_bwd(
    mids_m: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    M: jnp.ndarray,
    u: jnp.ndarray,
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
    block_j: int = 16,
    interpret: bool = False,
):
    """VJP of ``mlp_pairwise_sums_packed`` w.r.t. (mids_m, M, u, ax, av, ar).

    Returns (mids_m_bar, M_bar [w, w], u_bar [w], ax_bar, av_bar, ar_bar).
    M enters the pair scalar only through symmetric contractions, and the
    kernel's cotangent algebra assumes M = M^T (true bitwise for
    M = W_F W_F^T); the returned M_bar is the VJP of that symmetric
    composition."""
    nt, n, w0 = ax.shape
    m = ar.shape[1]
    n_m = len(mids_m)
    P = 4
    w_last = M.shape[0]

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
    mask2 = mask[:, None]
    n_blk_i = n_pad // bi

    grid = (n_blk_i, nt, m_pad // bj)
    in_specs = [
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),  # ax
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),  # av
        pl.BlockSpec((1, bj, w0), lambda i, t, j: (t, j, 0)),  # ar
        pl.BlockSpec((bj, 1), lambda i, t, j: (j, 0)),  # mask
        pl.BlockSpec((nt, bi), lambda i, t, j: (0, i)),  # g_val
        pl.BlockSpec((nt, bi), lambda i, t, j: (0, i)),  # g_hess
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),  # g_dz0
    ]
    args = [ax, av, ar, mask2, g_val, g_hess, g_dz0]
    for W, b in mids_m:
        Wb, bb = _blkdiag(W, P), _pack_bias(b, P)
        in_specs.append(pl.BlockSpec(Wb.shape, lambda i, t, j: (0, 0)))
        args.append(Wb)
        in_specs.append(pl.BlockSpec(bb.shape, lambda i, t, j: (0, 0)))
        args.append(bb)
    Mb = _blkdiag(M, P)
    in_specs.append(pl.BlockSpec(Mb.shape, lambda i, t, j: (0, 0)))
    args.append(Mb)
    u2 = u.reshape(1, -1)
    in_specs.append(pl.BlockSpec(u2.shape, lambda i, t, j: (0, 0)))
    args.append(u2)

    out_shape = []
    out_specs = []
    for W, b in mids_m:  # PACKED weight grads: constant-index accumulators
        wsh = (P * W.shape[0], P * W.shape[1])
        out_shape.append(jax.ShapeDtypeStruct(wsh, jnp.float32))
        out_specs.append(pl.BlockSpec(wsh, lambda i, t, j: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((1, P * b.shape[0]), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, P * b.shape[0]), lambda i, t, j: (0, 0))
        )
    out_shape.append(jax.ShapeDtypeStruct((2 * w_last, 2 * w_last), jnp.float32))
    out_specs.append(
        pl.BlockSpec((2 * w_last, 2 * w_last), lambda i, t, j: (0, 0))
    )
    out_shape.append(jax.ShapeDtypeStruct((1, w_last), jnp.float32))
    out_specs.append(pl.BlockSpec((1, w_last), lambda i, t, j: (0, 0)))
    out_shape.append(jax.ShapeDtypeStruct((nt, n_pad, w0), jnp.float32))
    out_specs.append(pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)))
    out_shape.append(jax.ShapeDtypeStruct((nt, n_pad, w0), jnp.float32))
    out_specs.append(pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)))
    out_shape.append(
        jax.ShapeDtypeStruct((n_blk_i, nt, m_pad, w0), jnp.float32)
    )
    out_specs.append(
        pl.BlockSpec((1, 1, bj, w0), lambda i, t, j: (i, t, j, 0))
    )

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_m, w_last, act_name, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret or _INTERPRET,
    )(*args)

    # unpack: sum the P diagonal blocks of each packed weight grad
    mids_m_bar = []
    for k, (W, b) in enumerate(mids_m):
        wp = outs[2 * k]
        win, wout = W.shape
        wbar = sum(
            wp[s * win : (s + 1) * win, s * wout : (s + 1) * wout]
            for s in range(P)
        )
        bbar = outs[2 * k + 1][0, : b.shape[0]]  # slot 0 carries the bias
        mids_m_bar.append((wbar, bbar))
    mbar2 = outs[2 * n_m]
    M_bar = (
        mbar2[:w_last, :w_last] + mbar2[w_last:, w_last:]
    )  # L1^T g + L2^T gp diagonal blocks
    u_bar = outs[2 * n_m + 1].reshape(-1)
    ax_bar = outs[2 * n_m + 2][:, :n]
    av_bar = outs[2 * n_m + 3][:, :n]
    ar_bar = jnp.sum(outs[2 * n_m + 4], axis=0)[:, :m]
    return mids_m_bar, M_bar, u_bar, ax_bar, av_bar, ar_bar
