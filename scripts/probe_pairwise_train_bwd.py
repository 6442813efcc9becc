"""Compile/run probe: jax.grad through the Pallas pairwise path at the
production non-parametric KMV geometry (7x2000, hidden 20x8, feature 128).

This is the program that OOMed scoped VMEM on-chip in r3G (40.66 MB > 16 MB:
XLA promoted the backward kernel's [n_blk_i, nt, m_pad, w0] ar partial into
VMEM) before mlp_pairwise_sums_bwd raised its vmem_limit_bytes budget.  Run
on the chip; exits 0 iff the grad step compiles, runs, and matches the jnp
blockwise path.

usage: python scripts/probe_pairwise_train_bwd.py [nt n m hidden layers feat]
       python scripts/probe_pairwise_train_bwd.py --sweep-blocks [nt n m ...]
           times jax.grad through the Pallas path for a grid of kernel
           tile shapes (block_i x block_j) — the VERDICT #4b tuning
           surface now that the scoped-VMEM budget is 100 MB.
       ... --packed      adds the lane-packed v2 kernels
           (ops/pallas/pairwise_packed.py) to the comparison / makes the
           tile sweep run the packed path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pde_inverse_tpu.losses import pairwise_blockwise as bw
from pde_inverse_tpu.models.mlp import PotentialMLP
from pde_inverse_tpu.utils.cache import enable_compilation_cache


def main(argv):
    sweep = "--sweep-blocks" in argv
    packed = "--packed" in argv
    argv = [a for a in argv if a not in ("--sweep-blocks", "--packed")]
    nt, n, m, hidden, layers, feat = (
        [int(a) for a in argv] + [7, 2000, 2000, 20, 8, 128][len(argv):]
    )
    d = 2
    enable_compilation_cache()
    net = PotentialMLP(hidden_dims=[hidden] * layers, feature_dim=feat)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros(d))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (n, nt, d))
    v = jax.random.normal(k2, (n, nt, d))
    refs = jax.random.normal(k3, (m, nt, d))

    def loss(p, mode, blocks=(128, 8)):
        s = bw.mlp_pairwise_stats(
            net, p, x, v, refs, pallas_mode=mode, pallas_blocks=blocks
        )
        return (
            jnp.mean(s["value"]) + jnp.mean(s["hess"]) + jnp.mean(s["nabla"] ** 2)
        )

    if sweep:
        ref = None
        sweep_mode = "packed" if packed else "on"
        for blocks in [(128, 8), (128, 16), (128, 32), (256, 8), (256, 16),
                       (384, 8), (512, 8), (256, 32)]:
            g = jax.jit(jax.grad(lambda p: loss(p, sweep_mode, blocks)))
            try:
                t0 = time.perf_counter()
                out = g(params)
                jax.block_until_ready(out)
                t_c = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(5):
                    out = g(params)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / 5
            except Exception as e:
                print(f"blocks={blocks}: FAILED {type(e).__name__}: {str(e)[:120]}")
                continue
            if ref is None:
                ref = jax.tree_util.tree_map(np.asarray, out)
                note = "(reference)"
            else:
                w = max(
                    float(np.max(np.abs(np.asarray(a) - b)))
                    / max(float(np.max(np.abs(b))), 1e-30)
                    for a, b in zip(
                        jax.tree_util.tree_leaves(out),
                        jax.tree_util.tree_leaves(ref),
                    )
                )
                note = f"rel-vs-(128,8)={w:.2e}"
            print(
                f"blocks={blocks}: first={t_c:6.1f}s "
                f"steady={dt * 1e3:8.1f} ms/grad {note}"
            )
        return 0

    def loss_chunked(p, rows):
        s = bw.mlp_pairwise_stats(
            net, p, x, v, refs, rows_per_chunk=rows, pallas_mode="off"
        )
        return (
            jnp.mean(s["value"]) + jnp.mean(s["hess"]) + jnp.mean(s["nabla"] ** 2)
        )

    results = {}
    modes = ("packed", "on", "off") if packed else ("on", "off")
    for mode in modes:
        blocks = (128, 16) if mode == "packed" else (128, 8)
        g = jax.jit(jax.grad(lambda p: loss(p, mode, blocks)))
        t0 = time.perf_counter()
        out = g(params)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = g(params)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        results[mode] = out
        print(
            f"mode={mode:3s} first={t_compile:7.1f}s steady={dt * 1e3:8.1f} ms/grad"
        )

    def per_leaf_rel(ta, tb):
        out = []
        la = jax.tree_util.tree_flatten_with_path(ta)[0]
        lb = jax.tree_util.tree_leaves(tb)
        for (path, a), b in zip(la, lb):
            denom = max(float(jnp.max(jnp.abs(b))), 1e-30)
            out.append(
                (float(jnp.max(jnp.abs(a - b))) / denom,
                 jax.tree_util.keystr(path))
            )
        return out

    def worst_rel(ta, tb, label=None):
        leaves = per_leaf_rel(ta, tb)
        if label is not None:
            for r, name in sorted(leaves, reverse=True)[:4]:
                print(f"    [{label}] {r:.3e}  {name}")
        return max(r for r, _ in leaves)

    # f32 accumulation-order noise floor: the SAME jnp formulation summed
    # in a different chunk order (8x smaller ref chunks) — any pallas-vs-
    # jnp gap within a few x of this floor is numerics, not a kernel bug
    g_alt = jax.jit(jax.grad(lambda p: loss_chunked(p, bw._ROWS_PER_CHUNK // 8)))
    alt = g_alt(params)
    jax.block_until_ready(alt)
    floor = worst_rel(alt, results["off"])
    gap = worst_rel(results["on"], results["off"])
    print(f"max grad rel-err pallas vs jnp: {gap:.3e}")
    print(f"jnp chunk-order noise floor:    {floor:.3e}")
    # v1 gate note: the chunk-reordered floor UNDERESTIMATES the reorder
    # noise of a tile-level kernel reduction — measured v1 sits at
    # 1.46e-3 at 7x512x512 where the jnp floor reads 2.3e-5.  5e-3
    # separates accumulation-order noise from real lowering bugs (the r5
    # selection-matmul miscompare measured 5.6e-1).
    thr = max(64.0 * floor, 5e-3)
    ok = gap < thr
    if packed:
        gap_pk = worst_rel(results["packed"], results["off"], label="packed")
        print(f"max grad rel-err packed vs jnp: {gap_pk:.3e}")
        # The packed gate CANNOT hold packed to agreement with the
        # on-chip jnp path: ALL default-precision TPU f32 dots run bf16
        # passes, and "on"/"off" share nearly the same noise REALIZATION
        # (agree to 1.5e-3) while BOTH sit ~1e-2 (weight leaves) to
        # ~2e-1 (cancellation-dominated bias leaves) from a CPU true-f32
        # gradient (scripts/probe_packed_truth.py, artifacts/r5C).  The
        # packed kernels draw an independent realization of the same
        # noise, so the honest gate is per-leaf vs an on-chip
        # HIGHEST-precision truth: packed's error must not exceed
        # max(1.5 x v1's error, 5e-3) on any leaf.
        with jax.default_matmul_precision("highest"):
            g_true = jax.jit(jax.grad(lambda p: loss(p, "off")))(params)
            jax.block_until_ready(g_true)
        leaves_pk = per_leaf_rel(results["packed"], g_true)
        leaves_on = per_leaf_rel(results["on"], g_true)
        worst_ratio, worst_name = 0.0, ""
        for (e_pk, name), (e_on, _) in zip(leaves_pk, leaves_on):
            ratio = e_pk / max(1.5 * e_on, 5e-3)
            if ratio > worst_ratio:
                worst_ratio, worst_name = ratio, name
        for (e_pk, name), (e_on, _) in sorted(
            zip(leaves_pk, leaves_on), reverse=True
        )[:4]:
            print(f"    [vs-truth] packed={e_pk:.3e} v1={e_on:.3e}  {name}")
        print(
            "packed-vs-truth worst leaf ratio"
            f" (packed / max(1.5*v1, 5e-3)): {worst_ratio:.2f}"
            f" at {worst_name}"
        )
        ok = ok and worst_ratio < 1.0
    print("PROBE", "OK" if ok else "MISMATCH", f"(thr {thr:.1e})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
