"""Compile-bisect for the packed pairwise kernels on the real chip.

The fix3 rewrite (a1bdae8: all slot packing in the XLA wrappers) still
fails Mosaic with "Invalid relayout ... vector<16x128xf32>" at the cmp512
geometry with blocks (128, 16).  v1 (pairwise_kernel.py) uses the same 3-D
view reductions but historically ran at block_j=8 (one native 8x128 tile)
before the (128, 16) tile-sweep default; this script separates:
  * which kernel fails (fwd-only vs bwd via the custom-vjp backward),
  * whether block_j=8 avoids the relayout.

Runs tiny geometry (nt=2, n=128, m=2*cell) so each compile is seconds.
Usage: python scripts/bisect_packed_mosaic.py
"""
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pde_inverse_tpu.ops.pallas import pairwise_packed as pk  # noqa: E402
from pde_inverse_tpu.utils.cache import enable_compilation_cache  # noqa: E402


def build(nt, n, m, w0=20, w=20, layers=7):
    # w0=20 matches the production path (first-layer projection applied
    # OUTSIDE the kernel: ax/av/ar are [.., w0] with w0 = first hidden
    # width), so every in-kernel minor dim (p*w0=120, p*w=120) is
    # cmp512-faithful.  The original toy used w0=2 (12-lane minors).
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4 + 2 * layers)
    ax = jax.random.normal(ks[0], (nt, n, w0))
    av = jax.random.normal(ks[1], (nt, n, w0))
    ar = jax.random.normal(ks[2], (nt, m, w0))
    mask = (jnp.arange(m) < m - 3).astype(jnp.float32)
    mids = []
    win = w0
    for i in range(layers):
        W = jax.random.normal(ks[3 + 2 * i], (win, w)) * 0.3
        b = jax.random.normal(ks[4 + 2 * i], (w,)) * 0.1
        mids.append((W, b))
        win = w
    WF = jax.random.normal(ks[3 + 2 * layers], (w, 128)) * 0.2
    bF = jnp.zeros(128)
    M = WF @ WF.T
    u = 2.0 * WF @ bF
    return mids, M, u, ax, av, ar, mask


def try_one(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"[PASS] {name}")
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:220]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False


def main():
    enable_compilation_cache()
    for bj in (16, 8):
        p = 6  # pack factor at w=20
        cell = p * bj
        nt, n, m = 2, 128, 2 * cell
        mids, M, u, ax, av, ar, mask = build(nt, n, m)
        kw = dict(block_i=128, block_j=bj)

        def fwd():
            return pk.mlp_pairwise_sums_packed(
                mids, M, u, "tanh", ax, av, ar, mask, **kw
            )

        ok_f = try_one(f"fwd bj={bj}", jax.jit(fwd))

        g_val = jnp.ones((nt, n))
        g_hess = jnp.ones((nt, n))
        g_dz0 = jnp.ones((nt, n, ax.shape[-1]))

        def bwd():
            return pk.mlp_pairwise_sums_packed_bwd(
                mids, M, u, "tanh", ax, av, ar, mask,
                g_val, g_hess, g_dz0, **kw
            )

        ok_b = try_one(f"bwd bj={bj}", jax.jit(bwd))
        print(f"== bj={bj}: fwd={'OK' if ok_f else 'FAIL'} "
              f"bwd={'OK' if ok_b else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
