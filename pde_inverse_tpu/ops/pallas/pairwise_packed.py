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
    _dot,
    _dot_t,
    _round_up,
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


# ---- Mosaic-safe in-kernel slot movement -----------------------------------
# Mosaic rejects two natural forms of slot packing inside kernels:
#   * concats whose inputs are strided sub-slices of one vector (both the
#     lane-axis concat of sublane slices in _slot_pack_refs/_slot_mask and
#     the sublane-axis concat of unaligned lane slices in the old ar-grad
#     unpack) — "result/input offset mismatch on non-concat dimension";
#   * reductions over 3-D views against broadcast coefficients — "invalid
#     relayout: non-singleton logical dimension is replicated".
# The helpers below express every slot move as iota-built 0/1 selection
# matrices consumed by plain 2-D dot_generals (MXU row-issues on tiny
# matrices, once per grid cell).  The XLA-side wrappers keep using the
# concat helpers above — only kernel bodies route through these.


def _ct0(a, b):
    """Contract axis 0: a [k, i], b [k, j] -> [i, j] (f32 accumulate)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _ct1(a, b):
    """Contract last axes: a [i, k], b [j, k] -> [i, j] (f32 accumulate)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dotf(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _rowsel_mat(s: int, bj: int, p: int):
    """[bj, p*bj] with R[j, r] = 1 iff r == s*bj + j."""
    j_ = jax.lax.broadcasted_iota(jnp.int32, (bj, p * bj), 0)
    r_ = jax.lax.broadcasted_iota(jnp.int32, (bj, p * bj), 1)
    return (r_ == s * bj + j_).astype(jnp.float32)


def _lanesel_mat(s: int, w: int, p: int):
    """[w, p*w] with C[c, l] = 1 iff l == s*w + c."""
    c_ = jax.lax.broadcasted_iota(jnp.int32, (w, p * w), 0)
    l_ = jax.lax.broadcasted_iota(jnp.int32, (w, p * w), 1)
    return (l_ == s * w + c_).astype(jnp.float32)


def _tile_mat(w: int, p: int):
    """[w, p*w] with T[c, l] = 1 iff l % w == c; a @ T tiles lanes."""
    c_ = jax.lax.broadcasted_iota(jnp.int32, (w, p * w), 0)
    l_ = jax.lax.broadcasted_iota(jnp.int32, (w, p * w), 1)
    return (l_ % w == c_).astype(jnp.float32)


def _fold_mat(w: int, p: int):
    """[p*w, w] with F[l, c] = 1 iff l % w == c; a @ F sums slots."""
    l_ = jax.lax.broadcasted_iota(jnp.int32, (p * w, w), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (p * w, w), 1)
    return (l_ % w == c_).astype(jnp.float32)


def _pack_rows_to_lanes(a, w: int, bj: int, p: int):
    """[p*bj, w] -> [bj, p*w], slot s = rows s*bj.. -> lanes s*w.. (f32)."""
    a = a.astype(jnp.float32)
    out = None
    for s in range(p):
        term = _dotf(_dotf(_rowsel_mat(s, bj, p), a), _lanesel_mat(s, w, p))
        out = term if out is None else out + term
    return out


def _unpack_lanes_to_rows(a, w: int, bj: int, p: int):
    """[bj, p*w] -> [p*bj, w], inverse of _pack_rows_to_lanes (f32)."""
    a = a.astype(jnp.float32)
    out = None
    for s in range(p):
        term = _ct1(_ct0(_rowsel_mat(s, bj, p), a), _lanesel_mat(s, w, p))
        out = term if out is None else out + term
    return out


def _slot_mask_mm(mk, w: int, bj: int, p: int):
    """Mosaic-safe _slot_mask: [p*bj, 1] -> [bj, p*w]."""
    return _pack_rows_to_lanes(jnp.broadcast_to(mk, (mk.shape[0], w)), w, bj, p)


def _row_maps(R: int, bi: int, bj: int):
    """erow [R, bj] (pair row -> ref row) and qsel [R, bi] (pair row ->
    query point) selection matrices for ref-major rows r = pj*bi + q."""
    erow = (
        jax.lax.broadcasted_iota(jnp.int32, (R, bj), 0) // bi
        == jax.lax.broadcasted_iota(jnp.int32, (R, bj), 1)
    ).astype(jnp.float32)
    qsel = (
        jax.lax.broadcasted_iota(jnp.int32, (R, bi), 0) % bi
        == jax.lax.broadcasted_iota(jnp.int32, (R, bi), 1)
    ).astype(jnp.float32)
    return erow, qsel


def _pair_rows_packed_mm(axb, arb, avb, w0, bj, p, erow, qsel, compute_dtype):
    """Packed first-layer pair rows via selection matmuls (Mosaic-safe):
    z[r, s*w0:(s+1)*w0] = ax_q - ar_{s,pj} for ref-major row r = pj*bi + q,
    dz the lane-tiled av rows."""
    f = jnp.float32
    tm = _tile_mat(w0, p)
    axt = _dotf(axb.astype(f), tm)  # [bi, p*w0]
    avt = _dotf(avb.astype(f), tm)
    arp = _pack_rows_to_lanes(arb, w0, bj, p)  # [bj, p*w0]
    z = (_dotf(qsel, axt) - _dotf(erow, arp)).astype(compute_dtype)
    dz = _dotf(qsel, avt).astype(compute_dtype)
    return z, dz


def _fwd_kernel(
    n_m: int, w_last: int, w0: int, p: int, act_name: str, compute_dtype, *refs
):
    """Packed forward body.  refs layout:
    [ax, av, ar, mask, Wblk_1, bpk_1, ..., Wblk_nm, bpk_nm, Mblk, upk,
     out_val, out_hess, out_dz0]
    with ax/av [1, bi, w0]; ar [1, p*bj, w0]; mask [p*bj, 1]; Wblk_k the
    blkdiag_p mid weights, bpk/upk lane-tiled.  Grid (i, t, j) and output
    accumulation exactly as pairwise_kernel._kernel."""
    act = _ACT_D012[act_name]
    ax_ref, av_ref, ar_ref, mask_ref = refs[:4]
    w_refs = refs[4 : 4 + 2 * n_m]
    mblk_ref, u_ref = refs[4 + 2 * n_m : 6 + 2 * n_m]
    val_ref, hess_ref, dz0_ref = refs[6 + 2 * n_m :]
    t = pl.program_id(1)
    j = pl.program_id(2)
    cd = lambda a: a.astype(compute_dtype)

    axb = ax_ref[0]  # [bi, w0]
    avb = av_ref[0]
    arb = ar_ref[0]  # [p*bj, w0]
    mk = mask_ref[...]  # [p*bj, 1]
    bi = axb.shape[0]
    bj = arb.shape[0] // p
    R = bj * bi

    erow, qsel = _row_maps(R, bi, bj)
    z, dz = _pair_rows_packed_mm(
        axb, arb, avb, w0, bj, p, erow, qsel, compute_dtype
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
    Mg = _dot(g, cd(mblk_ref[...])).astype(jnp.float32)
    Mgp = _dot(gp, cd(mblk_ref[...])).astype(jnp.float32)
    u = u_ref[...].astype(jnp.float32)  # [1, p*w_last]
    gf = g.astype(jnp.float32)
    gpf = gp.astype(jnp.float32)
    gqf = gq.astype(jnp.float32)
    phi_l = gf * Mg + gf * u  # [R, p*w_last]
    d2phi_l = 2.0 * gpf * Mgp + 2.0 * gqf * Mg + gqf * u

    # Masked reductions, all 2-D (see the Mosaic-safe helper block for the
    # two rejected natural forms).  The slot mask enters as selection
    # matmuls and the strided row-group sums run as dot_general
    # contractions over the R axis.
    f32 = jnp.float32
    mask2d = _dotf(erow, _slot_mask_mm(mk, w_last, bj, p))  # [R, p*w]
    lane_val = jnp.sum(phi_l * mask2d, axis=1, keepdims=True)  # [R, 1]
    lane_hess = jnp.sum(d2phi_l * mask2d, axis=1, keepdims=True)
    val_row = _ct0(lane_val, qsel)  # [1, bi]
    hess_row = _ct0(lane_hess, qsel)

    # reverse sweep to the first-layer cotangent (packed single stream)
    delta = ((2.0 * Mg + u) * d1.astype(jnp.float32)).astype(compute_dtype)
    for k in reversed(range(n_m)):
        W = cd(w_refs[2 * k][...])
        delta = (_dot_t(delta, W) * a1_saved[k]).astype(compute_dtype)

    mask2d0 = _dotf(erow, _slot_mask_mm(mk, w0, bj, p))  # [R, p*w0]
    dz0_f = _dotf(delta.astype(f32) * mask2d0, _fold_mat(w0, p))  # [R, w0]
    dz0_c = _ct0(qsel, dz0_f)  # [bi, w0]

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
    mask2 = mask[:, None]

    grid = (n_pad // bi, nt, m_pad // cell_m)
    in_specs = [
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),
        pl.BlockSpec((1, cell_m, w0), lambda i, t, j: (t, j, 0)),
        pl.BlockSpec((cell_m, 1), lambda i, t, j: (j, 0)),
    ]
    args = [ax, av, ar, mask2]
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

    axb = ax_ref[0]
    avb = av_ref[0]
    arb = ar_ref[0]  # [p*bj, w0]
    mk = mask_ref[...]  # [p*bj, 1]
    bi = axb.shape[0]
    bj = arb.shape[0] // p
    R = bj * bi
    nt_b = gval_ref.shape[0]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (nt_b, bi), 0) == t
    ).astype(jnp.float32)
    gv = jnp.sum(sel * gval_ref[...], axis=0, keepdims=True)  # [1, bi]
    gh = jnp.sum(sel * ghess_ref[...], axis=0, keepdims=True)
    gr = gdz0_ref[0]  # [bi, w0]

    erow, qsel = _row_maps(R, bi, bj)
    z, ps = _pair_rows_packed_mm(
        axb, arb, avb, w0, bj, p, erow, qsel, compute_dtype
    )
    q = None  # exactly zero at z0
    grt = _dotf(gr.astype(jnp.float32), _tile_mat(w0, p))  # [bi, p*w0]
    r = _dotf(qsel, grt).astype(compute_dtype)  # [R, p*w0]

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
    Mg = _dot(g, Mb).astype(jnp.float32)
    Mgp = _dot(gp, Mb).astype(jnp.float32)
    Mgq = _dot(gq, Mb).astype(jnp.float32)
    Mgr = _dot(gs, Mb).astype(jnp.float32)
    u = u_ref[...].astype(jnp.float32)
    two_mg_u = 2.0 * Mg + u

    # Per-row (g_val/g_hess) and per-(row, slot) mask weights, all 2-D
    # (see the Mosaic-safe helper block): the slot mask enters via
    # selection matmuls and the per-query coefficients as native [R, 1]
    # columns from a qsel contraction (no lane-major column reshapes).
    f32 = jnp.float32
    wl = p * w_last
    mask2d = _dotf(erow, _slot_mask_mm(mk, w_last, bj, p))  # [R, wl]
    gv_r = _ct1(qsel, gv)  # [R, 1]
    gh_r = _ct1(qsel, gh)

    def wrow(t_, coef_r=None):  # [R, wl] * [R, 1] * mask, f32
        w = t_ * mask2d
        return w if coef_r is None else w * coef_r

    gf = g.astype(jnp.float32)
    gpf = gp.astype(jnp.float32)
    gqf = gq.astype(jnp.float32)
    gsf = gs.astype(jnp.float32)

    # head cotangents at the g level (module docstring math):
    #   S = mk*(gv*Phi + gh*d2Phi + dPhi_r),  Phi = g.Mg + u.g,
    #   d2Phi = 2 gp.Mgp + 2 gq.Mg + u.gq,    dPhi_r = (2Mg+u).gs
    gbar = wrow(two_mg_u, gv_r) + wrow(2.0 * Mgq, gh_r) + wrow(2.0 * Mgr)
    gpbar = wrow(4.0 * Mgp, gh_r)
    gqbar = wrow(two_mg_u, gh_r)
    gsbar = wrow(two_mg_u)

    # Mbar = L1^T g + L2^T gp (slot-diagonal blocks; wrapper folds slots)
    L1 = wrow(gf, gv_r) + wrow(2.0 * gqf, gh_r) + wrow(2.0 * gsf)
    L2 = wrow(2.0 * gpf, gh_r)
    mbar_c = jax.lax.dot_general(
        L1.astype(compute_dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        L2.astype(compute_dtype), gp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [p*w, p*w]
    ubar_c = jnp.sum(
        wrow(gf, gv_r) + wrow(gqf, gh_r) + wrow(gsf),
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

    # z0-level cotangents -> ax/av accumulators and the ar partial, all as
    # qsel/erow contractions + selection-matmul slot moves (Mosaic-safe).
    z0bar = zbar.astype(jnp.float32)  # [R, p*w0]
    p0bar = pbar.astype(jnp.float32)
    fm0 = _fold_mat(w0, p)
    ax_c = _ct0(qsel, _dotf(z0bar, fm0))  # [bi, w0]
    av_c = _ct0(qsel, _dotf(p0bar, fm0))
    # ar grads per (slot, row): un-pack lanes back to [p*bj, w0] rows
    zsum = _ct0(erow, z0bar)  # [bj, p*w0]
    ar_c = -_unpack_lanes_to_rows(zsum, w0, bj, p)  # [p*bj, w0]

    @pl.when(j == 0)
    def _():
        axbar_ref[0] = ax_c
        avbar_ref[0] = av_c

    @pl.when(j > 0)
    def _():
        axbar_ref[0] += ax_c
        avbar_ref[0] += av_c

    arbar_ref[0, 0] = ar_c  # (i, t, j) cell written exactly once


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
    mask2 = mask[:, None]
    n_blk_i = n_pad // bi

    grid = (n_blk_i, nt, m_pad // cell_m)
    in_specs = [
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),  # ax
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),  # av
        pl.BlockSpec((1, cell_m, w0), lambda i, t, j: (t, j, 0)),  # ar
        pl.BlockSpec((cell_m, 1), lambda i, t, j: (j, 0)),  # mask
        pl.BlockSpec((nt, bi), lambda i, t, j: (0, i)),  # g_val (full stamps)
        pl.BlockSpec((nt, bi), lambda i, t, j: (0, i)),  # g_hess
        pl.BlockSpec((1, bi, w0), lambda i, t, j: (t, i, 0)),  # g_dz0
    ]
    args = [ax, av, ar, mask2, g_val, g_hess, g_dz0]
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
    out_shape.append(
        jax.ShapeDtypeStruct((n_blk_i, nt, m_pad, w0), jnp.float32)
    )
    out_specs.append(
        pl.BlockSpec((1, 1, cell_m, w0), lambda i, t, j: (i, t, j, 0))
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
    ar_bar = jnp.sum(outs[2 * n_m + 4], axis=0)[:, :m]
    return mids_m_bar, M_bar, u_bar, ax_bar, av_bar, ar_bar
