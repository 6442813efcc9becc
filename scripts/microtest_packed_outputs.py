"""Per-output Mosaic-vs-interpret comparison for the packed kernels.

Runs the fwd and bwd packed wrappers twice on identical inputs — once
Mosaic-compiled, once interpret=True (plain XLA ops, f32-accurate) — and
prints the worst relative error PER OUTPUT.  Fixed random cotangents for
bwd, so this isolates kernel lowering from the custom-vjp/autodiff
plumbing that the cmp512 probe exercises.

Geometry defaults to the cmp64 probe (2x64x64, production 20x8 arch,
p=6) where the black-box probe measured ~5e-3..9e-3 errors.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from pde_inverse_tpu.ops.pallas import pairwise_packed as pk  # noqa: E402
from scripts.bisect_packed_mosaic import build  # noqa: E402
from pde_inverse_tpu.utils.cache import enable_compilation_cache  # noqa: E402


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)


def main():
    enable_compilation_cache()
    nt, n, m = 2, 64, 96  # one j-cell at bj=16, p=6
    mids, M, u, ax, av, ar, mask = build(nt, n, m)
    kw = dict(block_i=128, block_j=16)

    f_hw = jax.jit(lambda: pk.mlp_pairwise_sums_packed(
        mids, M, u, "tanh", ax, av, ar, mask, **kw))()
    f_it = jax.jit(lambda: pk.mlp_pairwise_sums_packed(
        mids, M, u, "tanh", ax, av, ar, mask, interpret=True, **kw))()
    for k in ("value", "hess", "s_dz0"):
        print(f"fwd  {k:6s} rel={rel(f_hw[k], f_it[k]):.3e}")

    kg = jax.random.split(jax.random.PRNGKey(9), 3)
    g_val = jax.random.normal(kg[0], (nt, n))
    g_hess = jax.random.normal(kg[1], (nt, n))
    g_dz0 = jax.random.normal(kg[2], (nt, n, ax.shape[-1]))

    b_hw = jax.jit(lambda: pk.mlp_pairwise_sums_packed_bwd(
        mids, M, u, "tanh", ax, av, ar, mask, g_val, g_hess, g_dz0, **kw))()
    b_it = jax.jit(lambda: pk.mlp_pairwise_sums_packed_bwd(
        mids, M, u, "tanh", ax, av, ar, mask, g_val, g_hess, g_dz0,
        interpret=True, **kw))()
    mids_hw, M_hw, u_hw, ax_hw, av_hw, ar_hw = b_hw
    mids_it, M_it, u_it, ax_it, av_it, ar_it = b_it
    for i, ((Wh, bh), (Wi, bi)) in enumerate(zip(mids_hw, mids_it)):
        print(f"bwd  W{i} rel={rel(Wh, Wi):.3e}   b{i} rel={rel(bh, bi):.3e}")
    print(f"bwd  Mbar rel={rel(M_hw, M_it):.3e}")
    print(f"bwd  ubar rel={rel(u_hw, u_it):.3e}")
    print(f"bwd  axbar rel={rel(ax_hw, ax_it):.3e}")
    print(f"bwd  avbar rel={rel(av_hw, av_it):.3e}")
    print(f"bwd  arbar rel={rel(ar_hw, ar_it):.3e}")


if __name__ == "__main__":
    main()
