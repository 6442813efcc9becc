"""Headline benchmark: residual-loss training-step throughput at 1M particles.

Measures the flagship kinetic-OU consistency objective (the reference's
scripts/run_KOU.sh scaled to a 1M-point path batch, per BASELINE.json's
north star) as FULL optimizer steps per second per chip, and compares
against a reference-faithful baseline implemented in the same process:

* baseline ("reference semantics"): one jit-dispatched value_and_grad per
  Python-loop step, moment oracle integrated with ``odeint`` inside the
  traced sampler (kinetic_fokker_planck_example_OU.py:73-93), a separate
  jitted optimizer step, and a host sync + NaN assert + metric fetch every
  step (core/trainer.py:85-113);
* ours: the fused lax.scan chunk (sampling via the matrix-exponential
  oracle, loss, grad, Adam update, all in one XLA program, one host sync
  per chunk).

Prints ONE JSON line:
  {"metric": ..., "value": steps/s, "unit": "steps/s", "vs_baseline": ratio}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


N_TIME = 100
PER_TIME = 10_000  # 1M path points
BOUNDARY = 2_500
DIM = 4


def _cfg(per_time: int = PER_TIME):
    from pde_inverse_tpu.config import Config, apply_overrides

    return apply_overrides(
        Config(),
        [
            "pde_instance.name=Kinetic-Fokker-Planck",
            "pde_instance.domain_dim=%d" % DIM,
            "pde_instance.total_evolving_time=2",
            "solver.train.sample_mode=grid_time",
            f"solver.train.n_time_stamps={N_TIME}",
            f"solver.train.sample_per_time={per_time}",
            f"solver.train.batch_size_init={BOUNDARY}",
            f"solver.train.batch_size_terminal={BOUNDARY}",
            "train.optimizer.learning_rate.initial=1e-2",
            "train.optimizer.learning_rate.scheduling=cosine",
        ],
    )


def _build(per_time: int = PER_TIME):
    from pde_inverse_tpu.methods import ConsistencyBased
    from pde_inverse_tpu.problems import KineticFokkerPlanckOU
    from pde_inverse_tpu.training.optimizers import get_optimizer

    cfg = _cfg(per_time)
    rng = jax.random.PRNGKey(0)
    inst = KineticFokkerPlanckOU(cfg, rng)
    method = ConsistencyBased(pde_instance=inst, cfg=cfg, rng=rng)
    net, params = method.create_model_fn()
    opt = get_optimizer(cfg.train.optimizer)
    return cfg, inst, method, net, params, opt


def _program_cost(jitted, *args) -> dict:
    """{"flops", "transcendentals", "bytes_accessed"} of one execution of
    the compiled program, from XLA's own cost model (zeros if the backend
    doesn't expose it).  Pallas kernels are custom-calls the XLA cost
    model cannot see inside, so programs containing them (the np SDE
    sampler) are UNDERCOUNTED here — docs/ROOFLINE.md carries the
    analytic per-particle-step op counts for the kernel interior."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        return {
            "flops": float(cost.get("flops", 0.0) or 0.0),
            "transcendentals": float(cost.get("transcendentals", 0.0) or 0.0),
            "bytes_accessed": float(cost.get("bytes accessed", 0.0) or 0.0),
        }
    except Exception:
        return {"flops": 0.0, "transcendentals": 0.0, "bytes_accessed": 0.0}


def _program_flops(jitted, *args) -> float:
    return _program_cost(jitted, *args)["flops"]


def bench_ours(
    method, net, params, opt, n_steps=200, chunk=50, windows=1, boundary=None
):
    """Fused scan-chunk trainer: (steps/sec, FLOPs per step[, per-window
    rates]).

    windows > 1 repeats the measurement in the same process and reports
    the MEDIAN rate plus the per-window list: per-dispatch latency on the
    tunneled chip varies 1-35 ms between sessions (CLAUDE.md), and a
    single window makes the headline ratio look noisier than the chip is
    (round-2 VERDICT weak #7)."""

    def one_step(carry, rng, boundary=None):
        params, opt_state = carry
        kwargs = {} if boundary is None else {"boundary": boundary}
        out = method.value_and_grad_fn(net.apply, params, rng, **kwargs)
        updates, opt_state = opt.update(out["grad"], opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), out["loss"]

    @jax.jit
    def run_chunk(carry, rngs, boundary=None):
        # boundary (solver.train.boundary_reservoir): pre-sampled boundary
        # batch as a jit ARGUMENT, reused by every step — mirrors
        # training/trainer.py's reservoir plumbing
        step = lambda c, r: one_step(c, r, boundary)
        return jax.lax.scan(step, carry, rngs)

    carry = (params, opt.init(params))
    rngs = jax.random.split(jax.random.PRNGKey(1), chunk)
    cost = _program_cost(run_chunk, carry, rngs, boundary)
    flops_per_step = cost["flops"] / chunk
    bench_ours.last_cost_per_step = {k: v / chunk for k, v in cost.items()}
    carry, losses = run_chunk(carry, rngs, boundary)  # compile + warmup
    jax.block_until_ready(losses)

    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        done = 0
        while done < n_steps:
            carry, losses = run_chunk(carry, rngs, boundary)
            jax.block_until_ready(losses)
            assert np.isfinite(np.asarray(losses)).all()
            done += chunk
        rates.append(done / (time.perf_counter() - t0))
    rate = float(np.median(rates))
    if windows == 1:
        return rate, flops_per_step
    return rate, flops_per_step, [round(r, 2) for r in rates]


def bench_reference_semantics(inst, net, params, opt, n_steps=10):
    """Reference-faithful step: odeint oracle inside the traced sampler,
    one dispatch + host sync per step."""
    from jax.experimental.ode import odeint

    cfg_tr = inst.cfg.solver.train
    c = inst.configuration
    T = float(inst.total_evolving_time)
    gamma = inst.gamma_friction

    def odeint_moments(ts):
        # moment ODE integrated from 0 along the sorted grid, as the
        # reference does per step (…OU.py:73-93 via get_mean_cov)
        state0 = {"m": c["m_0"], "P": c["P_0"]}

        def ode(s, t):
            return {
                "m": c["F"] @ s["m"],
                "P": c["F"] @ s["P"] + s["P"] @ c["F"].T + c["L"],
            }

        full = odeint(ode, state0, jnp.concatenate([jnp.zeros([1]), ts]))
        return full["m"][1:], full["P"][1:]

    def sample_data(rng):
        rng_i, rng_t, rng_0T, rng_shift, rng_x = jax.random.split(rng, 5)
        n_time, per_time = cfg_tr.n_time_stamps, cfg_tr.sample_per_time
        shift = jax.random.uniform(rng_shift, (n_time,)) * (T / n_time)
        ts = jnp.linspace(0.0, T, n_time + 1)[:-1] + shift
        means, covs = odeint_moments(ts)
        # reference samples with an SVD sqrt per Gaussian
        def sqrtm(P):
            U, S, _ = jnp.linalg.svd(P)
            return U @ jnp.diag(jnp.sqrt(S)) @ U.T

        halves = jax.vmap(sqrtm)(covs)
        eps = jax.random.normal(rng_x, (per_time, n_time, 2 * DIM))
        z = jnp.einsum("tij,ntj->nti", halves, eps) + means
        return {
            "initial": inst.distribution_initial.sample(
                cfg_tr.batch_size_init, rng_i
            ),
            "terminal": inst.distribution_terminal.sample(
                cfg_tr.batch_size_terminal, rng_t
            ),
            "0T": z.reshape(-1, 2 * DIM),
        }

    from pde_inverse_tpu.losses import kinetic_fokker_planck as kfp_loss

    @jax.jit
    def value_and_grad(params, rng):
        data = sample_data(rng)
        return kfp_loss.value_and_grad_fn(net.apply, params, data, rng, inst)

    @jax.jit
    def step(params, opt_state, grad):
        updates, opt_state = opt.update(grad, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    opt_state = opt.init(params)
    rngs = jax.random.split(jax.random.PRNGKey(1), n_steps + 1)

    # warmup/compile
    out = value_and_grad(params, rngs[0])
    params_w, opt_state_w = step(params, opt_state, out["grad"])
    jax.block_until_ready(params_w)

    t0 = time.perf_counter()
    p, s = params, opt_state
    for i in range(n_steps):
        out = value_and_grad(p, rngs[i + 1])
        p, s = step(p, s, out["grad"])
        # reference host-syncs every step: NaN assert + metric dict fetch
        out.pop("grad")
        host = jax.tree_util.tree_map(np.asarray, out)
        assert np.isfinite(host["loss"])
    jax.block_until_ready(p)
    dt = time.perf_counter() - t0
    return n_steps / dt


# Peak dense compute of one TPU v5e chip (bf16 MXU). The loss path runs in
# f32, so this is the CONSERVATIVE denominator: f32 MXU peak is half of it,
# meaning true utilization is up to 2x the reported MFU.
_PEAK_FLOPS_V5E_BF16 = 197e12
# HBM bandwidth of one v5e chip. For bandwidth-bound programs (elementwise
# sampling / weak-form reductions), bytes/s vs this peak — not MFU — is the
# utilization axis that reflects how close the program is to its roofline
# (docs/ROOFLINE.md).
_PEAK_HBM_BYTES_V5E = 819e9


def bench_np_step(
    n_steps=60, chunk=20, windows=3, kfp_fused="auto", reservoir=False
):
    """Compute-bound production row: the online KGMM NON-PARAMETRIC step at
    the Run-E recipe geometry (400-step BAOAB SDE sampling through the
    Pallas Langevin kernel + Fourier-MLP weak-form loss on a 10k-trajectory
    batch).  This is the step that dominates real training wall-clock; the
    flagship KOU row above is an 18-MFLOP dispatch-bound program whose MFU
    measures the tunnel, not the chip (round-2 VERDICT missing #3).
    Returns (median steps/s, per-window list, flops/step, mfu)."""
    from pde_inverse_tpu.config import preset
    from pde_inverse_tpu.methods import ConsistencyBased
    from pde_inverse_tpu.problems import KineticFokkerPlanckGMM
    from pde_inverse_tpu.training.optimizers import get_optimizer

    cfg = preset(
        "KGMM-nonparametric-online",
        [
            "neural_network.quadratic_head=True",
            "solver.train.batch_size_0T=10000",
            "pde_instance.n_steps=400",
            "train.optimizer.weight_decay=0.0",
            f"solver.train.kfp_fused={kfp_fused}",
        ],
    )
    rng = jax.random.PRNGKey(0)
    inst = KineticFokkerPlanckGMM(cfg, jax.random.split(rng, 4)[0])
    method = ConsistencyBased(pde_instance=inst, cfg=cfg, rng=rng)
    net, params = method.create_model_fn()
    opt = get_optimizer(cfg.train.optimizer)
    # reservoir: the boundary batch pre-sampled once and fed per step as a
    # jit argument (solver.train.boundary_reservoir) — the step then has
    # no terminal SDE simulation in it
    boundary = (
        jax.jit(lambda k: method.sample_boundary(k))(jax.random.PRNGKey(40321))
        if reservoir
        else None
    )
    rate, flops_per_step, rates = bench_ours(
        method, net, params, opt, n_steps=n_steps, chunk=chunk,
        windows=windows, boundary=boundary,
    )
    mfu = (
        float(f"{flops_per_step * rate / _PEAK_FLOPS_V5E_BF16:.3g}")
        if flops_per_step
        else None
    )
    return rate, rates, flops_per_step, mfu, bench_ours.last_cost_per_step


def bench_fk_step(n_steps=60, chunk=20, windows=3, collapse=True):
    """Non-parametric KMV interaction-kernel row: the Fourier-kernel
    hypothesis (preset KMV-nonparametric-fourier, trainable K=512 at
    7x2000) through its exact O((n+m)K) mean-field collapse
    (losses/fourier_meanfield.py) vs the same model driven through the
    generic O(n^2) pairwise reduction (collapse=False) — the measured
    price of a pairwise grid the TPU-native design eliminates."""
    from pde_inverse_tpu.config import preset
    from pde_inverse_tpu.methods import ConsistencyBased
    from pde_inverse_tpu.problems import KineticMcKeanVlasovQuadratic
    from pde_inverse_tpu.training.optimizers import get_optimizer

    cfg = preset(
        "KMV-nonparametric-fourier",
        []
        if collapse
        else [
            "solver.train.kmv_blockwise=False",
            # the element budget counts PAIRS; the K=512 featurization
            # multiplies each pair's live footprint, so the generic-path
            # comparison needs a much smaller pair budget to fit memory
            "solver.train.kmv_element_budget=200000",
        ],
    )
    rng = jax.random.PRNGKey(0)
    inst = KineticMcKeanVlasovQuadratic(cfg, jax.random.split(rng, 4)[0])
    method = ConsistencyBased(pde_instance=inst, cfg=cfg, rng=rng)
    net, params = method.create_model_fn()
    opt = get_optimizer(cfg.train.optimizer)
    out = bench_ours(
        method, net, params, opt, n_steps=n_steps, chunk=chunk, windows=windows
    )
    # bench_ours returns (rate, flops) for windows==1, + per-window list otherwise
    rate, flops_per_step = out[0], out[1]
    rates = out[2] if len(out) > 2 else [round(rate, 2)]
    return rate, rates, flops_per_step


def bench_mlp_pairwise_step(n_steps=12, chunk=4, windows=3, pallas="auto"):
    """Non-parametric MLP KMV row: the production-architecture MLP
    hypothesis (hidden 20x8, feature 128) at the 7x2000 pair grid through
    the Pallas blockwise pairwise kernels (fwd + full-kernel bwd,
    ops/pallas/pairwise_kernel.py).  This is the one hypothesis class that
    cannot collapse its mean-field expectations, i.e. the true O(n*m)
    path; the reference triple-vmaps the full [m, n, t, d] tensor for it
    (kinetic_mckean_vlasov.py:22-48).  chunk stays <= 5: larger trainer
    scan chunks over this path crash the tunneled worker (CLAUDE.md)."""
    from pde_inverse_tpu.config import preset
    from pde_inverse_tpu.methods import ConsistencyBased
    from pde_inverse_tpu.problems import KineticMcKeanVlasovQuadratic
    from pde_inverse_tpu.training.optimizers import get_optimizer

    cfg = preset(
        "KMV-nonparametric-fourier",
        [
            "neural_network.model=mlp",
            "neural_network.fourier_features=0",
            "neural_network.fourier_trainable=False",
            "solver.train.kmv_field_reg=0.0",
            # the MLP cell's stabilizer (README): silences the
            # unstabilized-np warning and matches the production recipe
            "train.optimizer.weight_decay=1e-1",
            f"solver.train.kmv_pallas={pallas}",
            f"train.steps_per_chunk={chunk}",
        ],
    )
    rng = jax.random.PRNGKey(0)
    inst = KineticMcKeanVlasovQuadratic(cfg, jax.random.split(rng, 4)[0])
    method = ConsistencyBased(pde_instance=inst, cfg=cfg, rng=rng)
    net, params = method.create_model_fn()
    opt = get_optimizer(cfg.train.optimizer)
    out = bench_ours(
        method, net, params, opt, n_steps=n_steps, chunk=chunk, windows=windows
    )
    rate, flops_per_step = out[0], out[1]
    rates = out[2] if len(out) > 2 else [round(rate, 2)]
    return rate, rates, flops_per_step


def main():
    from pde_inverse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # TPU-hardware PRNG: bit generation is ~100x faster than threefry for
    # the 1M-point batches sampled every step. The default-impl switch
    # applies to BOTH sides of the comparison (if anything it favors the
    # baseline, whose per-step cost is dominated by odeint + dispatch).
    jax.config.update("jax_default_prng_impl", "rbg")
    cfg, inst, method, net, params, opt = _build()
    ours, flops_per_step, windows = bench_ours(
        method, net, params, opt, windows=3
    )
    ref = bench_reference_semantics(inst, net, params, opt)
    # float(f"{..:.3g}"): the KOU parametric step is a tiny-matmul,
    # dispatch/bandwidth-bound program, so its MFU is legitimately ~1e-5;
    # fixed 4-decimal rounding displayed it as a meaningless 0.0.
    mfu = (
        float(f"{flops_per_step * ours / _PEAK_FLOPS_V5E_BF16:.3g}")
        if flops_per_step
        else None
    )
    result = {
        "metric": "KOU consistency train-step throughput @1M path points",
        "value": round(ours, 3),
        "unit": "steps/s",
        "vs_baseline": round(ours / ref, 2),
        # absolute per-step wall times of both sides (VERDICT r1 weak #7:
        # keep the ratio honest by reporting what it is a ratio *of*)
        "ms_per_step_ours": round(1e3 / ours, 3),
        "ms_per_step_reference_semantics": round(1e3 / ref, 3),
        # model FLOPs utilization vs the bf16 MXU peak (f32 pipeline, so
        # this understates true utilization by up to 2x)
        "mfu": mfu,
        "flops_per_step": flops_per_step or None,
        "peak_flops_assumed": _PEAK_FLOPS_V5E_BF16,
        # per-window rates: tunnel-dispatch variance context for `value`
        "steps_per_sec_windows": windows,
    }

    # compute-bound production row: non-parametric KGMM online step.
    # Never let the extra rows break the driver's single-line contract.
    try:
        # default engages the fused pointwise Pallas provider
        # (solver.train.kfp_fused=auto on TPU); if its first on-chip
        # exercise fails, fall back to the autodiff path so the row still
        # reports the production step.
        # Boundary reservoir is the production default (VERDICT #3 lever):
        # the 800-step on-chip A/B (artifacts/r4A/np_res_{off,on}.log)
        # measured 5.73 vs 3.94 cumulative steps/s with recovery metrics
        # comparable (initial 7.7e-2 vs 8.7e-2, terminal 9.3e-2 vs
        # 8.0e-2); --np-no-reservoir measures the per-step-refresh step.
        np_res = "--np-no-reservoir" not in sys.argv
        try:
            np_rate, np_windows, np_flops, np_mfu, np_cost = bench_np_step(
                reservoir=np_res
            )
            fused_note = "auto"
        except Exception as e:
            np_rate, np_windows, np_flops, np_mfu, np_cost = bench_np_step(
                kfp_fused="off", reservoir=np_res
            )
            fused_note = f"off ({type(e).__name__} under auto)"
        # Both boundary configurations, so the headline row never shows
        # only the known-biased cell (r4 full-horizon verdict: reservoir
        # holds 6.1 steps/s but degrades recovery 1.06e-2 -> 1.94e-2;
        # VERDICT r4 weak #2): the reservoir rate is the throughput cell,
        # the exact-refresh rate the recovery-grade cell.
        np_exact_rate = None
        if np_res:
            try:
                np_exact_rate, _, _, _, _ = bench_np_step(reservoir=False)
            except Exception:  # pragma: no cover
                pass
        result["np"] = {
            "metric": "KGMM non-parametric online step (Run-E geometry)",
            "kfp_fused": fused_note,
            "boundary_reservoir": bool(np_res),
            "steps_per_sec_exact_refresh": (
                round(np_exact_rate, 3) if np_exact_rate else None
            ),
            "steps_per_sec": round(np_rate, 3),
            "steps_per_sec_windows": np_windows,
            "ms_per_step": round(1e3 / np_rate, 2),
            "flops_per_step": np_flops or None,
            "mfu": np_mfu,
            # XLA-visible traffic/op mix (Pallas kernel interior excluded —
            # see docs/ROOFLINE.md for its analytic counts):
            "transcendentals_per_step": np_cost["transcendentals"] or None,
            "bytes_accessed_per_step": np_cost["bytes_accessed"] or None,
            "hbm_bw_util": (
                float(
                    f"{np_cost['bytes_accessed'] * np_rate / _PEAK_HBM_BYTES_V5E:.3g}"
                )
                if np_cost["bytes_accessed"]
                else None
            ),
        }
    except Exception as e:  # pragma: no cover
        result["np"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # non-parametric KMV row: the Fourier-kernel mean-field collapse
    # (production trainable-frequency recipe).  The generic-pairwise
    # comparison on the same hypothesis is available via
    # `python bench.py --fk-pairwise` only: autodiff through the K-wide
    # featurization on pair grids compiles for minutes, which would blow
    # the driver's bench budget for a number that never changes.
    try:
        fk_rate, fk_windows, _ = bench_fk_step()
        result["fk"] = {
            "metric": "KMV non-parametric fourier-kernel step (7x2000, K=512)",
            "steps_per_sec": round(fk_rate, 3),
            "steps_per_sec_windows": fk_windows,
            "ms_per_step": round(1e3 / fk_rate, 2),
        }
        if "--fk-pairwise" in sys.argv:
            pw_rate, _, _ = bench_fk_step(
                n_steps=4, chunk=2, windows=1, collapse=False
            )
            result["fk"]["pairwise_steps_per_sec"] = round(pw_rate, 4)
            result["fk"]["collapse_speedup"] = round(fk_rate / pw_rate, 1)
    except Exception as e:  # pragma: no cover
        result["fk"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # non-parametric MLP KMV row: the genuine O(n*m) pairwise training
    # step through the Pallas fwd+bwd tile kernels at the production
    # 7x2000 geometry.  `--mlp-jnp` adds the XLA-blockwise comparison
    # (measured 2.8x slower grad on-chip) — opt-in, its compile+run cost
    # never changes the verdict.
    try:
        # `--mlp-packed` routes the row through the ref-slot lane-packed v2
        # kernels (ops/pallas/pairwise_packed.py) instead of the v1 default
        mp_pallas = "packed" if "--mlp-packed" in sys.argv else "auto"
        mp_rate, mp_windows, _ = bench_mlp_pairwise_step(pallas=mp_pallas)
        result["mlp_pairwise"] = {
            "metric": "KMV non-parametric MLP pairwise step (7x2000, Pallas fwd+bwd)",
            "steps_per_sec": round(mp_rate, 3),
            "steps_per_sec_windows": mp_windows,
            "ms_per_step": round(1e3 / mp_rate, 2),
            "pallas_mode": mp_pallas,
        }
        if "--mlp-jnp" in sys.argv:
            jr, _, _ = bench_mlp_pairwise_step(
                n_steps=6, chunk=2, windows=1, pallas="off"
            )
            result["mlp_pairwise"]["jnp_steps_per_sec"] = round(jr, 4)
            result["mlp_pairwise"]["pallas_speedup"] = round(mp_rate / jr, 2)
    except Exception as e:  # pragma: no cover
        result["mlp_pairwise"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # saturation probe: the large-batch end of the --scaling sweep (the
    # knee context for the headline row without the full sweep's runtime)
    try:
        _, _, m_sat, n_sat, p_sat, o_sat = _build(40_000)
        sat_rate, _ = bench_ours(
            m_sat, n_sat, p_sat, o_sat, n_steps=50, chunk=25
        )
        result["saturation"] = {
            "path_points": 40_000 * N_TIME,
            "steps_per_sec": round(sat_rate, 2),
            "points_per_sec_M": round(sat_rate * 40_000 * N_TIME / 1e6, 1),
        }
    except Exception as e:  # pragma: no cover
        result["saturation"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(result))


def scaling():
    """Batch-size scaling sweep of the fused step (one JSON line per size,
    human/diagnostic mode — the driver contract is the bare `python
    bench.py` single line).  Exposes the compute- vs dispatch-bound
    transition: below the knee, steps/s is flat (per-chunk dispatch +
    fixed program overhead dominate); above it, points/s is flat (the chip
    is saturated)."""
    from pde_inverse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    for per_time in (1_250, 2_500, 5_000, 10_000, 20_000, 40_000):
        cfg, inst, method, net, params, opt = _build(per_time)
        steps, _ = bench_ours(method, net, params, opt, n_steps=100, chunk=50)
        n_points = per_time * N_TIME
        print(
            json.dumps(
                {
                    "path_points": n_points,
                    "steps_per_sec": round(steps, 2),
                    "ms_per_step": round(1e3 / steps, 3),
                    "points_per_sec": round(steps * n_points / 1e6, 1),
                    "unit_points_per_sec": "M/s",
                }
            )
        )


def _backend_reachable(probes: int = 3, probe_timeout_s: int = 240) -> bool:
    """Bounded device-availability check, run in a SUBPROCESS because a
    wedged tunnel can block ``jax.devices()`` in-process indefinitely
    (observed multi-hour axon outages; CLAUDE.md operational log).  On a
    local backend (cpu/tpu) the first probe returns immediately."""
    import subprocess

    for i in range(probes):
        try:
            ok = (
                subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    timeout=probe_timeout_s,
                    capture_output=True,
                ).returncode
                == 0
            )
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return True
        if i + 1 < probes:
            time.sleep(60)
    return False


if __name__ == "__main__":
    if not _backend_reachable():
        # Emit the driver-contract line rather than hanging the round:
        # value 0 + error note is an honest "chip unreachable" record.
        print(
            json.dumps(
                {
                    "metric": "KOU consistency train-step throughput @1M path points",
                    "value": 0.0,
                    "unit": "steps/s",
                    "vs_baseline": 0.0,
                    "error": "TPU backend unreachable (tunnel down) after bounded probes",
                }
            )
        )
        sys.exit(0)
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
