"""Split the online-SDE non-parametric KGMM step cost: simulation vs loss.

Times (a) the full value_and_grad step (sample + loss + grad), (b) the SDE
sampling alone, and (c) the loss+grad on pre-sampled data, at the
KGMM-nonparametric-online preset geometry. Decides whether trajectory
reuse across steps (resampling every K steps) is worth its complexity:
if (b) is a small share of (a), it is not.

Usage: python scripts/profile_np_step.py [overrides...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pde_inverse_tpu.config import preset
from pde_inverse_tpu.methods import ConsistencyBased
from pde_inverse_tpu.problems import KineticFokkerPlanckGMM
from pde_inverse_tpu.utils.cache import enable_compilation_cache


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(overrides):
    enable_compilation_cache()
    cfg = preset("KGMM-nonparametric-online", list(overrides))
    rng = jax.random.split(jax.random.PRNGKey(cfg.seed), 4)[0]
    inst = KineticFokkerPlanckGMM(cfg, rng)
    method = ConsistencyBased(pde_instance=inst, cfg=cfg, rng=rng)
    net, params = method.create_model_fn()
    key = jax.random.PRNGKey(7)

    full = jax.jit(lambda p, k: method.value_and_grad_fn(net.apply, p, k))
    sample = jax.jit(lambda k: method.sample_data(k))

    data = sample(key)

    mod = method._loss_module()

    def loss_only(p, d, k):
        return mod.value_and_grad_fn(
            forward_fn=net.apply,
            params=p,
            data=d,
            rng=k,
            pde_instance=method.pde_instance,
            mesh_spec=None,
        )

    loss_jit = jax.jit(loss_only)

    t_full = bench(full, params, key)
    t_sample = bench(sample, key)
    t_loss = bench(loss_jit, params, data, key)
    print(
        f"full step : {1e3 * t_full:8.2f} ms\n"
        f"sampling  : {1e3 * t_sample:8.2f} ms ({100 * t_sample / t_full:.0f}%)\n"
        f"loss+grad : {1e3 * t_loss:8.2f} ms ({100 * t_loss / t_full:.0f}%)"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
