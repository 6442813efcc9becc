"""Micro-test 2: are Mosaic's [R,120]x[120,120] blkdiag dots accurate at
each precision, in both contraction directions?

microtest_sublane_reduce.py showed default(bf16) dots destroy
cancellation-heavy sums while ones-row HIGHEST dots are f32-accurate —
yet the all-HIGHEST packed kernel (cmp512_fix5) measured 6x WORSE than
all-default.  Suspect: HIGHEST lowering of the layer-loop dot shapes.
Tests x@W ("fwd") and x@W^T ("bwd") at default/HIGHEST for the packed
blkdiag [120,120] and the v1 [20,20] control, vs float64 numpy.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, ".")
from pde_inverse_tpu.utils.cache import enable_compilation_cache  # noqa: E402


def make_kernel(mode, prec):
    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...]
        W = w_ref[...]
        dims = (((1,), (0,)), ((), ())) if mode == "fwd" else (
            ((1,), (1,)), ((), ()))
        o_ref[...] = jax.lax.dot_general(
            x, W, dims, preferred_element_type=jnp.float32, precision=prec
        )

    return kernel


def run(mode, prec, x, W):
    return np.asarray(
        pl.pallas_call(
            make_kernel(mode, prec),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], W.shape[0]),
                                           jnp.float32),
        )(x, W)
    )


def blkdiag(Ws):
    p = len(Ws)
    w = Ws[0].shape[0]
    out = np.zeros((p * w, p * w), np.float32)
    for s, Wl in enumerate(Ws):
        out[s * w:(s + 1) * w, s * w:(s + 1) * w] = Wl
    return out


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for R, w, p in [(2048, 20, 6), (2048, 20, 1)]:
        x = rng.standard_normal((R, p * w)).astype(np.float32)
        Ws = [rng.standard_normal((w, w)).astype(np.float32) * 0.3
              for _ in range(p)]
        W = blkdiag(Ws)
        for mode in ("fwd", "bwd"):
            Wd = W.astype(np.float64)
            ref = (x.astype(np.float64) @ (Wd if mode == "fwd" else Wd.T))
            for prec in (None, jax.lax.Precision.HIGHEST):
                tag = "hi " if prec else "def"
                try:
                    got = run(mode, prec, jnp.asarray(x), jnp.asarray(W))
                except Exception as e:
                    print(f"[{R}x{p * w} {mode}] {tag} FAILED: {str(e)[:100]}")
                    continue
                rel = np.abs(got - ref).max() / np.abs(ref).max()
                print(f"[{R}x{p * w} {mode}] {tag} rel={rel:.3e}")


if __name__ == "__main__":
    main()
