"""Ground-truth referee for the packed-kernel grad mismatch.

cmp512 compares packed/on(v1) against the on-chip jnp blockwise path —
but ALL TPU f32 dots at default precision run bf16 passes, so the
reference carries its own precision systematics.  This probe compares
every mode against a CPU float32 off-path gradient (true f32 FMA dots):

  --dump-chip  : (on TPU)   grads for packed/on/off -> npz
  --cpu-ref    : (on CPU)   off-path grad           -> npz
  --compare    : load both, print per-leaf error of each mode vs CPU

Run --dump-chip under the ambient axon env and --cpu-ref with
PYTHONPATH="" JAX_PLATFORMS=cpu.  Geometry/arch/seeds identical to
probe_pairwise_train_bwd.py (7x512x512, 20x8 + feat 128).
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pde_inverse_tpu.losses import pairwise_blockwise as bw  # noqa: E402
from pde_inverse_tpu.models.mlp import PotentialMLP  # noqa: E402
from pde_inverse_tpu.utils.cache import enable_compilation_cache  # noqa: E402

NT, N, M = 7, 512, 512


def build():
    d = 2
    net = PotentialMLP(hidden_dims=[20] * 8, feature_dim=128)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros(d))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (N, NT, d))
    v = jax.random.normal(k2, (N, NT, d))
    refs = jax.random.normal(k3, (M, NT, d))
    return net, params, x, v, refs


def loss(net, p, x, v, refs, mode, blocks):
    s = bw.mlp_pairwise_stats(
        net, p, x, v, refs, pallas_mode=mode, pallas_blocks=blocks
    )
    return jnp.mean(s["value"]) + jnp.mean(s["hess"]) + jnp.mean(s["nabla"] ** 2)


def flat(tree):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(a) for path, a in leaves}


def main(argv):
    enable_compilation_cache()
    net, params, x, v, refs = build()
    if "--dump-chip" in argv:
        out = {}
        for mode, blocks in (("packed", (128, 16)), ("on", (128, 8)),
                             ("off", (128, 8))):
            g = jax.jit(jax.grad(
                lambda p: loss(net, p, x, v, refs, mode, blocks)))(params)
            jax.block_until_ready(g)
            for k, a in flat(g).items():
                out[f"{mode}::{k}"] = a
        np.savez("/root/runs/r5C/packed_truth_chip.npz", **out)
        print("chip dump done")
    elif "--cpu-ref" in argv:
        g = jax.jit(jax.grad(
            lambda p: loss(net, p, x, v, refs, "off", (128, 8))))(params)
        jax.block_until_ready(g)
        np.savez("/root/runs/r5C/packed_truth_cpu.npz", **flat(g))
        print("cpu ref done")
    else:
        chip = np.load("/root/runs/r5C/packed_truth_chip.npz")
        cpu = np.load("/root/runs/r5C/packed_truth_cpu.npz")
        for mode in ("packed", "on", "off"):
            worst = []
            for k in cpu.files:
                ref = cpu[k]
                got = chip[f"{mode}::{k}"]
                r = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
                worst.append((r, k))
            worst.sort(reverse=True)
            print(f"mode={mode:6s} worst-vs-CPUf32: " +
                  "  ".join(f"{r:.3e} {k}" for r, k in worst[:3]))


if __name__ == "__main__":
    main(sys.argv[1:])
