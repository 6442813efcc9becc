"""Decompose the online-SDE non-parametric KGMM step cost.

Times, at the KGMM-nonparametric-online preset geometry:

  (a) the full value_and_grad step (sample + loss + grad) under the
      config's ``solver.train.kfp_fused`` mode,
  (b) the SDE sampling alone,
  (c) loss+grad on pre-sampled data — fused per config AND forced off,
  (d) the {grad V, v^T Hess V v} provider alone on the path batch:
      forward value and value_and_grad, fused vs autodiff,

so the binding resource of the production step is measured, not modeled
(round-3 lesson: XLA cost-model bytes overcount by ~10x under fusion —
docs/ROOFLINE.md §3).  With ``--trace=DIR`` it additionally writes a
profiler trace of 3 full steps to DIR for perfetto/xprof.

Usage: python scripts/profile_np_step.py [--trace=DIR] [overrides...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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


def main(argv):
    trace_dir = None
    overrides = []
    for a in argv:
        if a.startswith("--trace="):
            trace_dir = a.split("=", 1)[1]
        else:
            overrides.append(a)

    enable_compilation_cache()
    cfg = preset("KGMM-nonparametric-online", overrides)
    rng = jax.random.split(jax.random.PRNGKey(cfg.seed), 4)[0]
    inst = KineticFokkerPlanckGMM(cfg, rng)
    method = ConsistencyBased(pde_instance=inst, cfg=cfg, rng=rng)
    net, params = method.create_model_fn()
    key = jax.random.PRNGKey(7)

    full = jax.jit(lambda p, k: method.value_and_grad_fn(net.apply, p, k))
    sample = jax.jit(lambda k: method.sample_data(k))
    data = sample(key)
    n_0T = data["0T"].shape[0]
    print(
        f"geometry: 0T={data['0T'].shape} initial={data['initial'].shape} "
        f"terminal={data['terminal'].shape} kfp_fused={cfg.solver.train.kfp_fused}"
    )

    mod = method._loss_module()

    def loss_only(fused_mode):
        def f(p, d, k):
            return mod.value_and_grad_fn(
                forward_fn=net.apply,
                params=p,
                data=d,
                rng=k,
                pde_instance=method.pde_instance,
                mesh_spec=None,
                fused_module=method._model,
                fused_mode=fused_mode,
            )

        return jax.jit(f)

    # --- provider-level: the {nabla, quad} pass on the path batch alone ---
    from pde_inverse_tpu.losses import fused_pointwise as fp
    from pde_inverse_tpu.ops import autodiff as ad

    x_0T, v_0T = jnp.split(data["0T"], 2, axis=-1)
    model = method._model

    def provider_fused(p):
        nabla, quad = fp.grad_and_quadform(model, p, x_0T, v_0T, mode="on")
        return jnp.mean(jnp.sum(nabla**2, -1)) + jnp.mean(quad)

    def provider_auto(p):
        V = lambda x: net.apply(p, x)[0]
        nabla, quad = ad.batched_grad_and_hvp_quadform(V, x_0T, v_0T)
        return jnp.mean(jnp.sum(nabla**2, -1)) + jnp.mean(quad)

    rows = []

    def add(label, fn, *args):
        try:
            t = bench(fn, *args)
        except Exception as e:  # Mosaic rejection etc. — keep profiling
            print(f"{label:26s}: FAILED ({type(e).__name__}: {e})")
            return
        rows.append((label, t))
        print(f"{label:26s}: {1e3 * t:8.2f} ms")

    # Sampling decomposition (round 4): the 58.5 ms "sampling" share was
    # measured as one block; split it so the boundary levers
    # (boundary_reservoir / smaller terminal batches) target the right
    # piece.  path = trajectory sim; initial = exact mixture draws (gather-
    # heavy on TPU); terminal = full-horizon SDE sim of batch*30 particles.
    sample_path = jax.jit(lambda k: method.sample_path(k))
    sample_bdry = jax.jit(lambda k: method.sample_boundary(k))

    tr = cfg.solver.train

    def initial_only(k):
        return inst.distribution_initial.sample(
            tr.batch_size_0T * inst.multiple_init, k
        )

    def terminal_only(k):
        initial, terminal = inst.sample_boundary_only(k, tr.batch_size_0T)
        return terminal

    # Full step with the boundary passed as an argument (what a
    # boundary_reservoir run executes every step).
    res = sample_bdry(key)
    full_res = jax.jit(
        lambda p, k, b: method.value_and_grad_fn(net.apply, p, k, boundary=b)
    )

    add("full step (cfg fused)", full, params, key)
    add("sampling only", sample, key)
    add("sampling: path only", sample_path, key)
    add("sampling: boundary only", sample_bdry, key)
    add("sampling: initial draws", jax.jit(initial_only), key)
    add("sampling: terminal sim", jax.jit(terminal_only), key)
    add("full step (boundary arg)", full_res, params, key, res)
    add("loss+grad fused=cfg", loss_only(cfg.solver.train.kfp_fused), params, data, key)
    add("loss+grad fused=off", loss_only("off"), params, data, key)
    add("provider fwd fused", jax.jit(provider_fused), params)
    add("provider fwd autodiff", jax.jit(provider_auto), params)
    add("provider vg fused", jax.jit(jax.grad(provider_fused)), params)
    add("provider vg autodiff", jax.jit(jax.grad(provider_auto)), params)

    if rows:
        t_full = dict(rows).get("full step (cfg fused)")
        if t_full:
            for label, t in rows[1:]:
                print(f"  {label:24s} = {100 * t / t_full:5.1f}% of full step")

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = full(params, key)
            jax.block_until_ready(out)
        print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
