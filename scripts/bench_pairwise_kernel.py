"""Microbenchmark: Pallas pairwise tile kernel vs the XLA blockwise path.

Forward-only reduction throughput on the KMV probe geometry (per-stamp
pair grid), reported as pair-layer-FLOPs/s and wall ms per reduction.
Run on the TPU chip (one process owns the tunnel — don't run concurrently
with training).

usage: python scripts/bench_pairwise_kernel.py [nt n m hidden feat reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pde_inverse_tpu.losses import pairwise_blockwise as bw
from pde_inverse_tpu.models.mlp import PotentialMLP
from pde_inverse_tpu.ops.pallas import pairwise_kernel as pk
from pde_inverse_tpu.utils.cache import enable_compilation_cache


def main(argv):
    nt, n, m, hidden, feat, reps = (
        [int(a) for a in argv] + [7, 5000, 5000, 32, 32, 20][len(argv):]
    )
    d = 2
    enable_compilation_cache()
    net = PotentialMLP(hidden_dims=[hidden, hidden], feature_dim=feat)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros(d))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (n, nt, d))
    v = jax.random.normal(k2, (n, nt, d))
    refs = jax.random.normal(k3, (m, nt, d))
    valid = jnp.ones((m,), jnp.float32)

    pairs = nt * n * m
    layers, _, _, _, _ = bw._mlp_structure(net, params)
    mids = layers[1:]
    # forward+2nd-order-tangents (3 streams) + backward sweep (2 matmuls
    # worth) per mid layer, 2*K*W flops per matmul row
    flops_pair = sum(5 * 2 * W.shape[0] * W.shape[1] for W, _ in mids)
    total_flops = pairs * flops_pair

    def run(mode):
        stats = bw.mlp_pairwise_stats(
            net, params, x, v, refs, pallas_mode=mode
        )
        return stats["value"].sum() + stats["hess"].sum() + stats["nabla"].sum()

    for mode in ("off", "on"):
        f = jax.jit(lambda: run(mode))
        f().block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f()
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(
            f"mode={'pallas' if mode == 'on' else 'xla-blockwise'} "
            f"geometry={nt}x{n}x{m} hidden={hidden} feat={feat} "
            f"ms={dt * 1e3:.2f} pair_layer_TFLOPs={total_flops / dt / 1e12:.2f}"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
