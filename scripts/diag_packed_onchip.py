"""On-chip diagnostics for the packed pairwise kernels' Mosaic-safe slot
moves (ops/pallas/pairwise_packed.py).

The interpret-mode equality gates pass but the real-chip grad mismatched
jnp by 5.6e-1 after the selection-matmul rewrite (r5 cmp512) — a Mosaic
lowering discrepancy in one of the in-kernel constructs.  This script
compiles a ladder of tiny single-cell kernels, each exercising ONE
construct, and compares against numpy computed on host:

  1. erow/qsel iota maps (// and % on broadcasted_iota)
  2. _tile_mat / _fold_mat / _rowsel_mat / _lanesel_mat raw matrices
  3. _pack_rows_to_lanes / _unpack_lanes_to_rows round trip
  4. _slot_mask_mm
  5. pair-row build (z, dz)
  6. full fwd kernel single cell vs interpret
  7. full bwd kernel single cell vs interpret

Run on the chip: python scripts/diag_packed_onchip.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from pde_inverse_tpu.ops.pallas import pairwise_packed as pp
from pde_inverse_tpu.utils.cache import enable_compilation_cache

BJ, BI, W0, P = 8, 16, 20, 6
R = BJ * BI


def run_kernel(body, out_shapes, *args, interpret=False):
    # Every kernel gets a live dummy input folded into its first output:
    # zero-input (pure-constant) pallas programs hang the tunneled
    # backend's remote execute (observed twice, r5 diag).
    def wrapped(d_ref, *refs):
        body(*refs)
        out0 = refs[len(args)]
        out0[...] += jnp.full(out0.shape, d_ref[0, 0], jnp.float32)

    f = pl.pallas_call(
        wrapped,
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32) for s in out_shapes],
        interpret=interpret,
    )
    dummy = jnp.zeros((8, 128), jnp.float32)
    return [np.asarray(o) for o in f(dummy, *args)]


def check(name, got, want, tol=1e-5):
    got, want = np.asarray(got), np.asarray(want)
    err = float(np.max(np.abs(got - want))) if got.size else 0.0
    rel = err / max(1e-12, float(np.max(np.abs(want))) or 1.0)
    status = "OK " if rel < tol else "BAD"
    print(f"[{status}] {name}: max abs {err:.3e} rel {rel:.3e}")
    return rel < tol


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())
    ok = True

    # ---- 1: iota row maps
    def k_rowmaps(o1, o2):
        erow, qsel = pp._row_maps(R, BI, BJ)
        o1[...] = erow
        o2[...] = qsel

    erow_t, qsel_t = run_kernel(k_rowmaps, [(R, BJ), (R, BI)])
    r_ = np.arange(R)
    erow_n = (r_[:, None] // BI == np.arange(BJ)[None, :]).astype(np.float32)
    qsel_n = (r_[:, None] % BI == np.arange(BI)[None, :]).astype(np.float32)
    ok &= check("erow", erow_t, erow_n)
    ok &= check("qsel", qsel_t, qsel_n)

    # ---- 2: selection matrices
    def k_mats(o1, o2, o3, o4):
        o1[...] = pp._tile_mat(W0, P)
        o2[...] = pp._fold_mat(W0, P)
        o3[...] = pp._rowsel_mat(2, BJ, P)
        o4[...] = pp._lanesel_mat(3, W0, P)

    tile_t, fold_t, rsel_t, lsel_t = run_kernel(
        k_mats, [(W0, P * W0), (P * W0, W0), (BJ, P * BJ), (W0, P * W0)]
    )
    l_ = np.arange(P * W0)
    tile_n = (l_[None, :] % W0 == np.arange(W0)[:, None]).astype(np.float32)
    fold_n = tile_n.T
    rsel_n = (
        np.arange(P * BJ)[None, :] == 2 * BJ + np.arange(BJ)[:, None]
    ).astype(np.float32)
    lsel_n = (l_[None, :] == 3 * W0 + np.arange(W0)[:, None]).astype(np.float32)
    ok &= check("tile_mat", tile_t, tile_n)
    ok &= check("fold_mat", fold_t, fold_n)
    ok &= check("rowsel_mat(2)", rsel_t, rsel_n)
    ok &= check("lanesel_mat(3)", lsel_t, lsel_n)

    # ---- 3: pack / unpack round trip
    a = np.random.RandomState(0).randn(P * BJ, W0).astype(np.float32)

    def k_pack(a_ref, o1, o2):
        packed = pp._pack_rows_to_lanes(a_ref[...], W0, BJ, P)
        o1[...] = packed
        o2[...] = pp._unpack_lanes_to_rows(packed, W0, BJ, P)

    packed_t, round_t = run_kernel(
        k_pack, [(BJ, P * W0), (P * BJ, W0)], jnp.asarray(a)
    )
    packed_n = np.concatenate(
        [a[s * BJ : (s + 1) * BJ] for s in range(P)], axis=1
    )
    ok &= check("pack_rows_to_lanes", packed_t, packed_n)
    ok &= check("unpack round trip", round_t, a)

    # ---- 4: slot mask
    mk = (np.random.RandomState(1).rand(P * BJ, 1) > 0.3).astype(np.float32)

    def k_mask(m_ref, o1):
        o1[...] = pp._slot_mask_mm(m_ref[...], W0, BJ, P)

    mask_t = run_kernel(k_mask, [(BJ, P * W0)], jnp.asarray(mk))[0]
    mask_n = np.concatenate(
        [np.broadcast_to(mk[s * BJ : (s + 1) * BJ], (BJ, W0)) for s in range(P)],
        axis=1,
    )
    ok &= check("slot_mask_mm", mask_t, mask_n)

    # ---- 5: pair rows
    ax = np.random.RandomState(2).randn(BI, W0).astype(np.float32)
    av = np.random.RandomState(3).randn(BI, W0).astype(np.float32)
    ar = np.random.RandomState(4).randn(P * BJ, W0).astype(np.float32)

    def k_pair(ax_ref, av_ref, ar_ref, o1, o2):
        erow, qsel = pp._row_maps(R, BI, BJ)
        z, dz = pp._pair_rows_packed_mm(
            ax_ref[...], ar_ref[...], av_ref[...], W0, BJ, P, erow, qsel,
            jnp.float32,
        )
        o1[...] = z
        o2[...] = dz

    z_t, dz_t = run_kernel(
        k_pair,
        [(R, P * W0), (R, P * W0)],
        jnp.asarray(ax), jnp.asarray(av), jnp.asarray(ar),
    )
    arp_n = np.concatenate([ar[s * BJ : (s + 1) * BJ] for s in range(P)], 1)
    z_n = (
        np.tile(ax, (1, P))[None, :, :] - arp_n[:, None, :]
    ).reshape(R, P * W0)
    dz_n = np.broadcast_to(np.tile(av, (1, P))[None], (BJ, BI, P * W0)).reshape(
        R, P * W0
    )
    ok &= check("pair rows z", z_t, z_n)
    ok &= check("pair rows dz", dz_t, dz_n)

    # ---- 6/7: full fwd + bwd single grid cell vs interpret mode
    rs = np.random.RandomState(5)
    nt, n, m = 2, BI, P * BJ
    mids = [
        (
            jnp.asarray(rs.randn(W0, W0).astype(np.float32) / np.sqrt(W0)),
            jnp.asarray(rs.randn(W0).astype(np.float32) * 0.1),
        )
        for _ in range(2)
    ]
    WF = rs.randn(W0, 24).astype(np.float32) / np.sqrt(W0)
    M = jnp.asarray(WF @ WF.T)
    u = jnp.asarray(rs.randn(W0).astype(np.float32) * 0.1)
    axs = jnp.asarray(rs.randn(nt, n, W0).astype(np.float32))
    avs = jnp.asarray(rs.randn(nt, n, W0).astype(np.float32))
    ars = jnp.asarray(rs.randn(nt, m, W0).astype(np.float32))
    mask = jnp.asarray((rs.rand(m) > 0.2).astype(np.float32))

    def fwd(interpret):
        return pp.mlp_pairwise_sums_packed(
            mids, M, u, "gelu", axs, avs, ars, mask,
            block_i=BI, block_j=BJ, interpret=interpret,
        )

    f_tpu = jax.tree.map(np.asarray, fwd(False))
    f_int = jax.tree.map(np.asarray, fwd(True))
    for key in f_int:
        ok &= check(f"fwd[{key}] tpu vs interpret", f_tpu[key], f_int[key], 1e-4)

    gv = jnp.asarray(rs.randn(nt, n).astype(np.float32))
    gh = jnp.asarray(rs.randn(nt, n).astype(np.float32))
    gd = jnp.asarray(rs.randn(nt, n, W0).astype(np.float32))

    def bwd(interpret):
        return pp.mlp_pairwise_sums_packed_bwd(
            mids, M, u, "gelu", axs, avs, ars, mask, gv, gh, gd,
            block_i=BI, block_j=BJ, interpret=interpret,
        )

    b_tpu = jax.tree.map(np.asarray, bwd(False))
    b_int = jax.tree.map(np.asarray, bwd(True))
    flat_t, _ = jax.tree.flatten(b_tpu)
    flat_i, _ = jax.tree.flatten(b_int)
    for idx, (gt, gi) in enumerate(zip(flat_t, flat_i)):
        ok &= check(f"bwd[{idx}] tpu vs interpret", gt, gi, 1e-4)

    print("DIAG", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
