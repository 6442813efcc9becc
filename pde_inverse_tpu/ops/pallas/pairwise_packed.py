"""Lane-packed Pallas TPU kernels for the blockwise pairwise KMV reduction.

Second-generation kernels behind ``losses/pairwise_blockwise.py`` (the v1
kernels live in pairwise_kernel.py and remain the fallback).  Two exact
restructurings attack the measured cost structure of the v1 kernels at the
production hidden width w=20 (docs/ROOFLINE.md S4): every elementwise op
and matmul there runs on [R, 20] arrays that fill 20 of the 128 VPU lanes
and underfill the MXU's K/N dimensions ~6x.

1. **Squared-feature head collapse.**  With the feature layer (W_F [w, F],
   b_F [F]) and head Phi = |act(z) W_F + b_F|^2, the width-F stream never
   needs to exist:

       Phi(g) = g.(M g) + u.g + c,   M = W_F W_F^T  [w, w],
                                     u = 2 W_F b_F  [w],  c = |b_F|^2,

   so the widest layer (x4 streams of [R, w]x[w, 128]) leaves the kernel
   entirely.  M/u/c are built OUTSIDE the custom-vjp boundary with plain
   jnp (differentiable), so the W_F/b_F cotangent chain through M is
   autodiff; the constant-per-pair c is added outside as ``c * sum(mask)``.

2. **Ref-axis lane packing.**  Each grid cell loads P*bj ref rows and
   folds them into P lane slots of bj rows: every stream array becomes
   [R, P*w] where slot s holds the SAME stream against ref sub-block s.
   Because slots differ only in DATA (not math), the whole layer loop —
   activations, derivative combos, stream algebra — runs uniformly on
   full-width registers with NO per-slot slicing; weights enter as
   blkdiag_P(W) so each dot covers P pairs per row.  Pack/unpack is
   confined to cell boundaries (one lane-concat of the ref block at entry,
   slot-fold sums at exit).  At w=20, P=6 fills 120/128 lanes — ~6x fewer
   VPU cycles per pair and P pairs per MXU row-issue.

   (The first v2 iteration packed the four propagation STREAMS instead:
   each layer then needs per-slot coefficient products, and the
   lane-slices/concats at unaligned w=20 offsets relayout-bound the kernel
   to 2.1x SLOWER than v1 on-chip — 102.6 vs 48.7 ms/grad at 7x512x512.
   Slot contents must be math-uniform for lane packing to win; see git
   history for the stream-packed variant.)

Stream algebra per slot is EXACTLY v1's (pairwise_kernel._kernel /
._bwd_kernel): forward propagates (z, d_v z, d_v^2 z), backward runs the
4-stream formulation (z, p, q, r=d_g z).  Accumulator layouts (sel-iota row
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
    _round_up,
)

# HIGHEST-precision MXU dots (packed-local; v1 keeps its defaults).
# At TPU default precision f32 dot inputs are truncated to one bf16
# pass; the collapsed head Phi = g.Mg + u.g computes a sum of squares
# through SIGNED products, so bf16 truncation that is benign in v1's
# |f|^2 feature form amplifies here — measured 1.7e-2 worst-leaf grad
# error at 7x512x512, scale-INdependent (cmp512_fix4b / cmp64 logs),
# against v1's 1.5e-3 with the identical algebra exact in interpret
# mode.  HIGHEST restores f32-equivalent accumulation.
_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    """[..., k] @ [k, w], f32 accumulation, default (bf16-pass) inputs."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_t(a, b):
    """[..., w] @ [k, w]^T, f32 accumulation, default (bf16-pass) inputs."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_hi(a, b):
    """Head dots only: full-f32 passes.  The collapsed head g.Mg sums
    SIGNED products of what is algebraically a sum of squares, so bf16
    input truncation there amplifies through the cotangent chains into
    the bias grads (measured 1.7e-2 worst-leaf at 7x512x512 with all
    dots at default precision; weight leaves stay <5e-3)."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )

# Test hook: force interpreter mode globally (CPU equality gates).
_INTERPRET = False

_VMEM_BUDGET = 100 * 1024 * 1024  # see pairwise_kernel.mlp_pairwise_sums_bwd


def _widths(mids_m, M, w0: int):
    ws = [w0] + [W.shape[1] for W, _ in mids_m] + [M.shape[0]]
    return ws


def _pack_factor(mids_m, M, w0: int, bj: int) -> int:
    """Ref slots per grid cell: as many as fit the 128-lane registers at
    the widest stream, reduced until P*bj rows satisfy Mosaic's
    second-to-last block-dim rule (divisible by 8)."""
    p = max(1, 128 // max(_widths(mids_m, M, w0)))
    while p > 1 and (p * bj) % 8 != 0:
        p -= 1
    return p


def packed_supported(mids, act_name: str) -> bool:
    """True iff the packed kernels are the PROFITABLE choice: every width
    the kernel touches fits >= 2 ref slots in the 128-lane registers
    (w <= 32 after the head collapse removes the feature layer)."""
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


def _tile_lanes(a, p: int):
    """[..., w] -> [..., p*w]: the same values in every slot."""
    return jnp.concatenate([a] * p, axis=-1)


def _fold_slots(a, w: int, p: int):
    """[..., p*w] -> [..., w]: sum over slots."""
    out = a[..., :w]
    for s in range(1, p):
        out = out + a[..., s * w : (s + 1) * w]
    return out


def _diag_blocks_sum(Wp, win: int, wout: int, p: int):
    out = Wp[:win, :wout]
    for s in range(1, p):
        out = out + Wp[s * win : (s + 1) * win, s * wout : (s + 1) * wout]
    return out


# ---- Slot movement policy ---------------------------------------------------
# ALL slot packing/unpacking happens in the XLA wrappers (reshape +
# transpose on host-visible arrays), NEVER inside kernel bodies.  Two
# rounds of on-chip failures force this:
#   * Mosaic REJECTS the natural in-kernel forms — strided-slice concats
#     ("result/input offset mismatch on non-concat dimension") and
#     reductions against [bj, 1, p*w] broadcast masks ("invalid relayout:
#     non-singleton logical dimension is replicated");
#   * the iota-selection-matmul rewrite COMPILED but produced wrong
#     gradients on hardware (cmp512 r5: rel 5.6e-1 on-chip vs 4.6e-6 in
#     interpret mode at the identical geometry) — a silent lowering
#     miscompare this module cannot carry.
# The kernels therefore consume PRE-PACKED blocks (ax/av lane-tiled xP,
# ar slot-packed [bj, p*w0], masks pre-expanded per width) and emit the
# ar gradient in the same packed layout; every op inside the kernels is
# a form already proven on this backend by pairwise_kernel.py (3-D
# reshapes of [R, w] to [bj, bi, w], size-1-axis broadcasts, axis-0/1/-1
# sums, contract-dim-0/1 dot_generals, identical-input lane concats and
# static lane slices).


def _pack_ref_rows(a, p: int, bj: int):
    """[nt, nbj*p*bj, w] -> [nt, nbj, bj, p*w]: cell rows s*bj+jj land in
    slot s of lane group s*w..(s+1)*w (XLA-side; matches the kernels'
    ref-major pair-row order)."""
    nt, m_pad, w = a.shape
    nbj = m_pad // (p * bj)
    return (
        a.reshape(nt, nbj, p, bj, w)
        .transpose(0, 1, 3, 2, 4)
        .reshape(nt, nbj, bj, p * w)
    )


def _unpack_ref_rows(a, p: int, bj: int, w: int):
    """Inverse of _pack_ref_rows: [nt, nbj, bj, p*w] -> [nt, nbj*p*bj, w]."""
    nt, nbj = a.shape[:2]
    return (
        a.reshape(nt, nbj, bj, p, w)
        .transpose(0, 1, 3, 2, 4)
        .reshape(nt, nbj * p * bj, w)
    )


def _pack_mask(mask, p: int, bj: int, w: int):
    """[m_pad] validity -> [nbj, bj, p*w] lane-expanded slot mask."""
    nbj = mask.shape[0] // (p * bj)
    mk = mask.reshape(nbj, p, bj).transpose(0, 2, 1)  # [nbj, bj, p]
    return jnp.broadcast_to(
        mk[:, :, :, None], (nbj, bj, p, w)
    ).reshape(nbj, bj, p * w)


def _fwd_kernel(
    n_m: int, w_last: int, w0: int, p: int, act_name: str, compute_dtype, *refs
):
    """Packed forward body.  refs layout:
    [axt, avt, arp, maskl, mask0, Wblk_1, bpk_1, ..., Wblk_nm, bpk_nm,
     Mblk, upk, out_val, out_hess, out_dz0]
    with axt/avt [1, bi, p*w0] lane-tiled, arp [1, 1, bj, p*w0]
    slot-packed, maskl/mask0 [1, bj, p*w] lane-expanded masks — every
    slot move pre-computed by the wrapper (module policy note).  Grid
    (i, t, j) and output accumulation exactly as
    pairwise_kernel._kernel."""
    act = _ACT_D012[act_name]
    ax_ref, av_ref, ar_ref, maskl_ref, mask0_ref = refs[:5]
    w_refs = refs[5 : 5 + 2 * n_m]
    mblk_ref, u_ref = refs[5 + 2 * n_m : 7 + 2 * n_m]
    val_ref, hess_ref, dz0_ref = refs[7 + 2 * n_m :]
    t = pl.program_id(1)
    j = pl.program_id(2)
    cd = lambda a: a.astype(compute_dtype)
    f32 = jnp.float32

    axt = ax_ref[0]  # [bi, p*w0] lane-tiled
    avt = av_ref[0]
    arp = ar_ref[0, 0]  # [bj, p*w0] slot-packed
    maskl = maskl_ref[0]  # [bj, p*w_last]
    mask0 = mask0_ref[0]  # [bj, p*w0]
    bi = axt.shape[0]
    bj = arp.shape[0]
    R = bj * bi
    pw0 = p * w0

    # first-layer pair rows: the v1-proven broadcast-subtract-reshape
    # (pairwise_kernel._pair_rows) on pre-packed lanes
    z = (
        (axt.astype(f32)[None, :, :] - arp.astype(f32)[:, None, :])
        .reshape(R, pw0)
        .astype(compute_dtype)
    )
    dz = (
        jnp.broadcast_to(avt.astype(f32)[None, :, :], (bj, bi, pw0))
        .reshape(R, pw0)
        .astype(compute_dtype)
    )
    d2z = None  # exactly zero at the first layer (linear in y)

    # hidden stack — v1's per-stream algebra on full-width packed lanes
    a1_saved = []
    for k in range(n_m):
        W = cd(w_refs[2 * k][...])
        b = cd(w_refs[2 * k + 1][...])
        a, d1, d2 = act(z)
        a1_saved.append(d1)
        h, dh = a, d1 * dz
        d2h = d2 * dz * dz if d2z is None else d2 * dz * dz + d1 * d2z
        z = (_dot(h, W) + b).astype(compute_dtype)
        dz = _dot(dh, W).astype(compute_dtype)
        d2z = _dot(d2h, W).astype(compute_dtype)

    # collapsed head: g = act(z); Phi = g.(M g) + u.g  (+c outside)
    a, d1, d2 = act(z)
    g, gp = a, d1 * dz
    gq = d2 * dz * dz if d2z is None else d2 * dz * dz + d1 * d2z
    Mg = _dot_hi(g, cd(mblk_ref[...])).astype(jnp.float32)
    Mgp = _dot_hi(gp, cd(mblk_ref[...])).astype(jnp.float32)
    u = u_ref[...].astype(jnp.float32)  # [1, p*w_last]
    gf = g.astype(jnp.float32)
    gpf = gp.astype(jnp.float32)
    gqf = gq.astype(jnp.float32)
    phi_l = gf * Mg + gf * u  # [R, p*w_last]
    d2phi_l = 2.0 * gpf * Mgp + 2.0 * gqf * Mg + gqf * u

    # Masked reductions in v1's proven forms: the pre-expanded slot mask
    # broadcasts [bj, p*w] -> [bj, bi, p*w] -> reshape to pair rows (the
    # same middle-axis broadcast+reshape as the dz build), the multiply
    # stays 2-D, and the sums run lane-axis then sublane-axis.
    wl = p * w_last
    mask2d = jnp.broadcast_to(
        maskl.astype(f32)[:, None, :], (bj, bi, wl)
    ).reshape(R, wl)

    # Mosaic CANNOT relayout the [bj, bi] result of an axis=-1 reduce of
    # the [bj, bi, wl] view at bj=16 ("Invalid relayout ...
    # vector<16x128xf32>", bisect_packed_mosaic.py: fwd fails at bj=16
    # AND 8, bwd — which has no such reduce — passes; v1's f2d only
    # survives because its consumer keeps the replicated layout).  Stay
    # fully 2-D instead: lane-sum to a [R, 1] column (standard layout),
    # then contract the R axis against an iota-built query-selection
    # matrix on the MXU — one [1, R] x [R, bi] issue per output row.
    lane_val = jnp.sum(phi_l * mask2d, axis=1, keepdims=True)  # [R, 1]
    lane_hess = jnp.sum(d2phi_l * mask2d, axis=1, keepdims=True)
    qsel = (
        jax.lax.broadcasted_iota(jnp.int32, (R, bi), 0) % bi
        == jax.lax.broadcasted_iota(jnp.int32, (R, bi), 1)
    ).astype(jnp.float32)  # pair row r -> query point r % bi
    ct0 = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    val_row = ct0(lane_val, qsel)  # [1, bi]
    hess_row = ct0(lane_hess, qsel)

    # reverse sweep to the first-layer cotangent (packed single stream)
    delta = ((2.0 * Mg + u) * d1.astype(jnp.float32)).astype(compute_dtype)
    for k in reversed(range(n_m)):
        W = cd(w_refs[2 * k][...])
        delta = (_dot_t(delta, W) * a1_saved[k]).astype(compute_dtype)

    mask2d0 = jnp.broadcast_to(
        mask0.astype(f32)[:, None, :], (bj, bi, pw0)
    ).reshape(R, pw0)
    dz0_f = _fold_slots(delta.astype(f32) * mask2d0, w0, p)  # [R, w0]
    dz0_c = jnp.sum(dz0_f.reshape(bj, bi, w0), axis=0)  # [bi, w0]

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
    pairwise_kernel.mlp_pairwise_sums.  Each grid cell covers
    block_i x (P * block_j) pairs per stamp with P ref slots in the lane
    axis.  Returns {"value" [nt, n], "hess" [nt, n], "s_dz0" [nt, n, w0]}
    — value EXCLUDES the per-pair constant c = |b_F|^2 (add
    ``c * sum(mask)`` outside)."""
    nt, n, w0 = ax.shape
    m = ar.shape[1]
    n_m = len(mids_m)
    w_last = M.shape[0]

    bi = min(block_i, _round_up(n, 8))
    bj = block_j
    p = _pack_factor(mids_m, M, w0, bj)
    cell_m = p * bj
    n_pad = _round_up(n, bi)
    m_pad = _round_up(m, cell_m)
    mask = mask.astype(jnp.float32)
    if n_pad != n:
        ax = jnp.pad(ax, ((0, 0), (0, n_pad - n), (0, 0)))
        av = jnp.pad(av, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        ar = jnp.pad(ar, ((0, 0), (0, m_pad - m), (0, 0)))
        mask = jnp.pad(mask, (0, m_pad - m))

    # all slot packing happens HERE, in XLA (module policy note)
    axt = jnp.tile(ax, (1, 1, p))  # [nt, n_pad, p*w0] lane-tiled
    avt = jnp.tile(av, (1, 1, p))
    arp = _pack_ref_rows(ar, p, bj)  # [nt, nbj, bj, p*w0]
    maskl = _pack_mask(mask, p, bj, w_last)  # [nbj, bj, p*w_last]
    mask0 = _pack_mask(mask, p, bj, w0)  # [nbj, bj, p*w0]

    grid = (n_pad // bi, nt, m_pad // cell_m)
    in_specs = [
        pl.BlockSpec((1, bi, p * w0), lambda i, t, j: (t, i, 0)),
        pl.BlockSpec((1, bi, p * w0), lambda i, t, j: (t, i, 0)),
        pl.BlockSpec((1, 1, bj, p * w0), lambda i, t, j: (t, j, 0, 0)),
        pl.BlockSpec((1, bj, p * w_last), lambda i, t, j: (j, 0, 0)),
        pl.BlockSpec((1, bj, p * w0), lambda i, t, j: (j, 0, 0)),
    ]
    args = [axt, avt, arp, maskl, mask0]
    for W, b in mids_m:
        Wb = _blkdiag(W, p)
        bb = _tile_lanes(b, p)[None, :]
        in_specs.append(pl.BlockSpec(Wb.shape, lambda i, t, j: (0, 0)))
        args.append(Wb)
        in_specs.append(pl.BlockSpec(bb.shape, lambda i, t, j: (0, 0)))
        args.append(bb)
    Mb = _blkdiag(M, p)
    in_specs.append(pl.BlockSpec(Mb.shape, lambda i, t, j: (0, 0)))
    args.append(Mb)
    upk = _tile_lanes(u, p)[None, :]
    in_specs.append(pl.BlockSpec(upk.shape, lambda i, t, j: (0, 0)))
    args.append(upk)

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

    flops_tile = 2 * bi * bj * p * (
        sum(3 * W.shape[0] * W.shape[1] + W.shape[0] * W.shape[1]
            for W, _ in mids_m)
        + 2 * w_last * w_last
    )
    val, hess, s_dz0 = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_m, w_last, w0, p, act_name, compute_dtype
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * grid[0] * grid[1] * grid[2],
            bytes_accessed=(ax.size + av.size + ar.size) * 4,
            transcendentals=bi * bj * p
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


def _bwd_kernel(
    n_m: int, w_last: int, w0: int, p: int, act_name: str, compute_dtype, *refs
):
    """Packed backward body — v1's 4-stream formulation
    (pairwise_kernel._bwd_kernel) on ref-slot-packed lanes with the
    collapsed head.  refs layout:
    [ax, av, ar, mask, gval, ghess, gdz0,
     Wblk_1, bpk_1, ..., Wblk_nm, bpk_nm, Mblk, upk,
     out_Wbarblk_1, out_bbarpk_1, ..., out_Mbarblk, out_ubarpk,
     out_ax_bar, out_av_bar, out_ar_bar_partial]
    Weight/M/u grads accumulate PACKED (slot-diagonal blocks / lane tiles);
    the wrapper folds slots."""
    act3 = _ACT_D0123[act_name]
    ax_ref, av_ref, ar_ref, maskl_ref, gval_ref, ghess_ref, gdz0_ref = refs[:7]
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
    f32 = jnp.float32

    axt = ax_ref[0]  # [bi, p*w0] lane-tiled
    avt = av_ref[0]
    arp = ar_ref[0, 0]  # [bj, p*w0] slot-packed
    maskl = maskl_ref[0]  # [bj, p*w_last]
    bi = axt.shape[0]
    bj = arp.shape[0]
    R = bj * bi
    pw0 = p * w0
    nt_b = gval_ref.shape[0]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (nt_b, bi), 0) == t
    ).astype(jnp.float32)
    gv = jnp.sum(sel * gval_ref[...], axis=0, keepdims=True)  # [1, bi]
    gh = jnp.sum(sel * ghess_ref[...], axis=0, keepdims=True)
    grt = gdz0_ref[0]  # [bi, p*w0] lane-tiled

    # first-layer pair rows, v1's broadcast-subtract-reshape forms
    z = (
        (axt.astype(f32)[None, :, :] - arp.astype(f32)[:, None, :])
        .reshape(R, pw0)
        .astype(compute_dtype)
    )
    ps = (
        jnp.broadcast_to(avt.astype(f32)[None, :, :], (bj, bi, pw0))
        .reshape(R, pw0)
        .astype(compute_dtype)
    )
    q = None  # exactly zero at z0
    r = (
        jnp.broadcast_to(grt.astype(f32)[None, :, :], (bj, bi, pw0))
        .reshape(R, pw0)
        .astype(compute_dtype)
    )

    saved = []
    for k in range(n_m):
        W = cd(w_refs[2 * k][...])
        b = cd(w_refs[2 * k + 1][...])
        saved.append((z, ps, q, r))
        a0, a1, a2, _ = act3(z)
        h = a0
        hp = a1 * ps
        hq = a2 * ps * ps if q is None else a2 * ps * ps + a1 * q
        hr = a1 * r
        z = (_dot(h, W) + b).astype(compute_dtype)
        ps = _dot(hp, W).astype(compute_dtype)
        q = _dot(hq, W).astype(compute_dtype)
        r = _dot(hr, W).astype(compute_dtype)

    # collapsed-head streams + packed M dots
    a0, a1, a2, a3 = act3(z)
    g = a0
    gp = a1 * ps
    gq = a2 * ps * ps if q is None else a2 * ps * ps + a1 * q
    gs = a1 * r
    Mb = cd(mblk_ref[...])
    Mg = _dot_hi(g, Mb).astype(jnp.float32)
    Mgp = _dot_hi(gp, Mb).astype(jnp.float32)
    Mgq = _dot_hi(gq, Mb).astype(jnp.float32)
    Mgr = _dot_hi(gs, Mb).astype(jnp.float32)
    u = u_ref[...].astype(jnp.float32)
    two_mg_u = 2.0 * Mg + u

    # Per-row (g_val/g_hess) and per-(row, slot) mask weights in v1's
    # proven forms: the pre-expanded slot mask broadcasts through the
    # middle axis (same as the ps/r builds) and multiplies in 2-D; the
    # per-query coefficients apply on the 3-D view via [1, bi, 1]
    # size-1-axis broadcasts (pairwise_kernel._bwd_kernel's gv3 pattern).
    wl = p * w_last
    mask2d = jnp.broadcast_to(
        maskl.astype(f32)[:, None, :], (bj, bi, wl)
    ).reshape(R, wl)

    def wrow(t_, coef=None):  # t_ [R, wl] f32; coef [1, bi] or None
        w = t_ * mask2d
        if coef is None:
            return w
        return (w.reshape(bj, bi, wl) * coef[:, :, None]).reshape(R, wl)

    gf = g.astype(jnp.float32)
    gpf = gp.astype(jnp.float32)
    gqf = gq.astype(jnp.float32)
    gsf = gs.astype(jnp.float32)

    # head cotangents at the g level (module docstring math):
    #   S = mk*(gv*Phi + gh*d2Phi + dPhi_r),  Phi = g.Mg + u.g,
    #   d2Phi = 2 gp.Mgp + 2 gq.Mg + u.gq,    dPhi_r = (2Mg+u).gs
    gbar = wrow(two_mg_u, gv) + wrow(2.0 * Mgq, gh) + wrow(2.0 * Mgr)
    gpbar = wrow(4.0 * Mgp, gh)
    gqbar = wrow(two_mg_u, gh)
    gsbar = wrow(two_mg_u)

    # Mbar = L1^T g + L2^T gp (slot-diagonal blocks; wrapper folds slots)
    L1 = wrow(gf, gv) + wrow(2.0 * gqf, gh) + wrow(2.0 * gsf)
    L2 = wrow(2.0 * gpf, gh)
    mbar_c = jax.lax.dot_general(
        L1.astype(compute_dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        L2.astype(compute_dtype), gp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [p*w, p*w]
    ubar_c = jnp.sum(
        wrow(gf, gv) + wrow(gqf, gh) + wrow(gsf),
        axis=0,
        keepdims=True,
    )  # [1, p*w]

    @pl.when(first_cell)
    def _():
        mbar_ref[...] = mbar_c
        ubar_ref[...] = ubar_c

    @pl.when(jnp.logical_not(first_cell))
    def _():
        mbar_ref[...] += mbar_c
        ubar_ref[...] += ubar_c

    # g-level cotangents -> z_final-preact-level packed cotangents
    zbar = (
        gbar * a1
        + gpbar * (a2 * ps)
        + gqbar * (a3 * ps * ps if q is None else a3 * ps * ps + a2 * q)
        + gsbar * (a2 * r)
    )
    pbar = gpbar * a1 + gqbar * (2.0 * a2 * ps)
    qbar = gqbar * a1
    rbar = gsbar * a1
    zbar = zbar.astype(compute_dtype)
    pbar = pbar.astype(compute_dtype)
    qbar = qbar.astype(compute_dtype)
    rbar = rbar.astype(compute_dtype)

    # reverse sweep with packed weight-gradient accumulation
    for k in reversed(range(n_m)):
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

    # z0-level cotangents -> ax/av accumulators and the ar partial, in
    # v1's proven reductions (axis-0 and axis-1 sums on the [bj, bi, .]
    # views; slot folds as static lane slices); the ar gradient leaves the
    # kernel PACKED [bj, p*w0] — the wrapper unpacks in XLA.
    z0bar = zbar.astype(jnp.float32)  # [R, p*w0]
    p0bar = pbar.astype(jnp.float32)
    z0f = _fold_slots(z0bar, w0, p).reshape(bj, bi, w0)
    p0f = _fold_slots(p0bar, w0, p).reshape(bj, bi, w0)
    ax_c = jnp.sum(z0f, axis=0)  # [bi, w0]
    av_c = jnp.sum(p0f, axis=0)
    ar_c = -jnp.sum(z0bar.reshape(bj, bi, pw0), axis=1)  # [bj, p*w0]

    @pl.when(j == 0)
    def _():
        axbar_ref[0] = ax_c
        avbar_ref[0] = av_c

    @pl.when(j > 0)
    def _():
        axbar_ref[0] += ax_c
        avbar_ref[0] += av_c

    arbar_ref[0, 0, 0] = ar_c  # (i, t, j) cell written exactly once


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
    w_last = M.shape[0]

    bi = min(block_i, _round_up(n, 8))
    bj = block_j
    p = _pack_factor(mids_m, M, w0, bj)
    cell_m = p * bj
    n_pad = _round_up(n, bi)
    m_pad = _round_up(m, cell_m)
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
    n_blk_i = n_pad // bi

    # all slot packing happens HERE, in XLA (module policy note)
    axt = jnp.tile(ax, (1, 1, p))  # [nt, n_pad, p*w0] lane-tiled
    avt = jnp.tile(av, (1, 1, p))
    grt = jnp.tile(g_dz0, (1, 1, p))
    arp = _pack_ref_rows(ar, p, bj)  # [nt, nbj, bj, p*w0]
    maskl = _pack_mask(mask, p, bj, w_last)  # [nbj, bj, p*w_last]

    grid = (n_blk_i, nt, m_pad // cell_m)
    in_specs = [
        pl.BlockSpec((1, bi, p * w0), lambda i, t, j: (t, i, 0)),  # axt
        pl.BlockSpec((1, bi, p * w0), lambda i, t, j: (t, i, 0)),  # avt
        pl.BlockSpec((1, 1, bj, p * w0), lambda i, t, j: (t, j, 0, 0)),  # arp
        pl.BlockSpec((1, bj, p * w_last), lambda i, t, j: (j, 0, 0)),  # maskl
        pl.BlockSpec((nt, bi), lambda i, t, j: (0, i)),  # g_val (full stamps)
        pl.BlockSpec((nt, bi), lambda i, t, j: (0, i)),  # g_hess
        pl.BlockSpec((1, bi, p * w0), lambda i, t, j: (t, i, 0)),  # grt
    ]
    args = [axt, avt, arp, maskl, g_val, g_hess, grt]
    for W, b in mids_m:
        Wb = _blkdiag(W, p)
        bb = _tile_lanes(b, p)[None, :]
        in_specs.append(pl.BlockSpec(Wb.shape, lambda i, t, j: (0, 0)))
        args.append(Wb)
        in_specs.append(pl.BlockSpec(bb.shape, lambda i, t, j: (0, 0)))
        args.append(bb)
    Mb = _blkdiag(M, p)
    in_specs.append(pl.BlockSpec(Mb.shape, lambda i, t, j: (0, 0)))
    args.append(Mb)
    upk = _tile_lanes(u, p)[None, :]
    in_specs.append(pl.BlockSpec(upk.shape, lambda i, t, j: (0, 0)))
    args.append(upk)

    out_shape = []
    out_specs = []
    for W, b in mids_m:  # PACKED weight grads: constant-index accumulators
        wsh = (p * W.shape[0], p * W.shape[1])
        out_shape.append(jax.ShapeDtypeStruct(wsh, jnp.float32))
        out_specs.append(pl.BlockSpec(wsh, lambda i, t, j: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((1, p * b.shape[0]), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, p * b.shape[0]), lambda i, t, j: (0, 0))
        )
    out_shape.append(
        jax.ShapeDtypeStruct((p * w_last, p * w_last), jnp.float32)
    )
    out_specs.append(
        pl.BlockSpec((p * w_last, p * w_last), lambda i, t, j: (0, 0))
    )
    out_shape.append(jax.ShapeDtypeStruct((1, p * w_last), jnp.float32))
    out_specs.append(pl.BlockSpec((1, p * w_last), lambda i, t, j: (0, 0)))
    out_shape.append(jax.ShapeDtypeStruct((nt, n_pad, w0), jnp.float32))
    out_specs.append(pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)))
    out_shape.append(jax.ShapeDtypeStruct((nt, n_pad, w0), jnp.float32))
    out_specs.append(pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)))
    nbj = m_pad // cell_m
    out_shape.append(
        jax.ShapeDtypeStruct((n_blk_i, nt, nbj, bj, p * w0), jnp.float32)
    )
    out_specs.append(
        pl.BlockSpec(
            (1, 1, 1, bj, p * w0), lambda i, t, j: (i, t, j, 0, 0)
        )
    )

    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, n_m, w_last, w0, p, act_name, compute_dtype
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret or _INTERPRET,
    )(*args)

    # fold the slot-diagonal packed accumulators back to model shapes
    mids_m_bar = []
    for k, (W, b) in enumerate(mids_m):
        wbar = _diag_blocks_sum(outs[2 * k], W.shape[0], W.shape[1], p)
        bbar = _fold_slots(outs[2 * k + 1], b.shape[0], p).reshape(-1)
        mids_m_bar.append((wbar, bbar))
    M_bar = _diag_blocks_sum(outs[2 * n_m], w_last, w_last, p)
    u_bar = _fold_slots(outs[2 * n_m + 1], w_last, p).reshape(-1)
    ax_bar = outs[2 * n_m + 2][:, :n]
    av_bar = outs[2 * n_m + 3][:, :n]
    # ar grads leave the kernel packed [n_blk_i, nt, nbj, bj, p*w0]:
    # sum the i-partials, then unpack slots in XLA
    ar_bar = _unpack_ref_rows(
        jnp.sum(outs[2 * n_m + 4], axis=0), p, bj, w0
    )[:, :m]
    return mids_m_bar, M_bar, u_bar, ax_bar, av_bar, ar_bar
