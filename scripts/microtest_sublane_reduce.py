"""Micro-test: is Mosaic's axis-0 (sublane) reduction of a [2048, 120]
f32 array numerically wrong on this backend?

The packed pairwise bwd kernel's bias/u gradients are axis-0 sums of
[R=2048, p*w=120] cotangent arrays and are the ONLY wrong leaves in the
cmp512 probe (weights <5e-3, biases ~1.8e-2, scale-independent,
insensitive to dot precision).  This isolates the reduction: in-kernel
(a) jnp.sum(axis=0, keepdims), (b) ones-row dot at default precision,
(c) ones-row dot at HIGHEST — each vs a float64 numpy reference, on a
cancellation-heavy input (zero-mean columns + small signal, the shape of
a cotangent sum).  Control: same at minor dim 20 (v1's proven shape).
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from pde_inverse_tpu.utils.cache import enable_compilation_cache  # noqa: E402


def make_kernel(mode):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        if mode == "sum":
            o_ref[...] = jnp.sum(x, axis=0, keepdims=True)
        else:
            R = x.shape[0]
            ones = jnp.ones((1, R), jnp.float32)
            prec = (
                jax.lax.Precision.HIGHEST if mode == "dot_hi" else None
            )
            o_ref[...] = jax.lax.dot_general(
                ones, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

    return kernel


def run(mode, x):
    R, w = x.shape
    out = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((1, w), jnp.float32),
    )(x)
    return np.asarray(out)[0]


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    for R, w in [(2048, 120), (2048, 20), (1024, 120)]:
        y = jax.random.normal(key, (R, w), jnp.float32)
        y = y - jnp.mean(y, axis=0, keepdims=True)  # cancellation-heavy
        sig = 1e-3 * jax.random.normal(jax.random.PRNGKey(1), (R, w))
        x = np.asarray(y + sig, np.float32)
        ref = x.astype(np.float64).sum(axis=0)
        scale = np.abs(x).sum(axis=0).max()  # cancellation denominator
        for mode in ("sum", "dot", "dot_hi"):
            try:
                got = run(mode, jnp.asarray(x))
            except Exception as e:
                print(f"[{R}x{w}] {mode:7s} FAILED: {str(e)[:120]}")
                continue
            abs_err = np.abs(got - ref).max()
            rel_vs_leafmax = abs_err / np.abs(ref).max()
            print(
                f"[{R}x{w}] {mode:7s} abs={abs_err:.3e} "
                f"rel(leafmax)={rel_vs_leafmax:.3e} "
                f"rel(cancel-scale)={abs_err / scale:.3e}"
            )


if __name__ == "__main__":
    main()
