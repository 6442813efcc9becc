"""Post-hoc analysis of a non-parametric KGMM checkpoint: where does the
remaining gradient error live?

The weak-form consistency loss only constrains grad V where the path
measure rho_t has mass; the headline test metric draws from the BROAD
initial law N(0, 4I).  This script loads the latest Orbax checkpoint of a
non-parametric run, evaluates the gradient rel-L2 on (a) the initial law,
(b) fresh path samples, and (c) initial samples binned by distance to the
path support — evidence for whether the accuracy floor is estimator noise
or data coverage.

Usage: python scripts/analyze_np.py /tmp/np_ckpt_v4 [batch_size_0T=...]

Ensembling (round 3): pass a comma-separated list of checkpoint dirs
(`/tmp/a,/tmp/b,/tmp/c`) — runs differing only in train.data_seed share the
problem instance but carry independent estimator noise, so the AVERAGED
gradient field (mean over members of grad V_k) is evaluated; same-seed
error fields correlate ~0.5, predicting a ~30-40% error reduction.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pde_inverse_tpu.config import preset
from pde_inverse_tpu.methods import ConsistencyBased
from pde_inverse_tpu.ops import autodiff as ad
from pde_inverse_tpu.problems import KineticFokkerPlanckGMM
from pde_inverse_tpu.utils.cache import enable_compilation_cache


def _load_checkpoint_params(ckpt_dir: str, use_ema_state: bool):
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mgr.latest_step()
    # Template-free restore: the trainer checkpoints {params, opt_state,
    # ema_state}; we only need params (already EMA'd past the switch step),
    # and a strict template would have to mirror the optimizer pytree.
    restored = mgr.restore(step)
    # --ema: evaluate the decoupled Polyak average saved in ema_state
    # (trainer ema_mode=track) instead of the live params.  Before the
    # switch step the EMA state is still its all-zeros init — evaluating
    # it would silently score a zero network.
    if use_ema_state:
        if int(restored["ema_state"]["count"]) == 0:
            raise SystemExit(
                "--ema requested but the checkpoint's EMA never engaged "
                "(count=0): evaluate without --ema or use a later checkpoint"
            )
        source = restored["ema_state"]["ema"]
    else:
        source = restored["params"]
    print(f"restored step {step} from {ckpt_dir} (ema={use_ema_state})")
    return jax.tree_util.tree_map(jnp.asarray, source)


def main(ckpt_dirs: str, overrides):
    enable_compilation_cache()
    use_ema_state = "--ema" in overrides
    overrides = [o for o in overrides if o != "--ema"]
    cfg = preset(
        "KGMM",
        [
            "estimation_mode=non-parametric",
            "neural_network.hidden_dim=64",
            "neural_network.layers=2",
            "neural_network.feature_dim=256",
            "neural_network.fourier_features=64",
            "neural_network.fourier_scale=1.0",
            "pde_instance.n_steps=200",
            "pde_instance.integrator=baoab",
        ]
        + list(overrides),
    )
    rng_problem = jax.random.split(jax.random.PRNGKey(cfg.seed), 4)[0]
    inst = KineticFokkerPlanckGMM(cfg, rng_problem)
    method = ConsistencyBased(pde_instance=inst, cfg=cfg, rng=rng_problem)
    net, _ = method.create_model_fn()

    dirs = [d for d in ckpt_dirs.split(",") if d]
    members = [_load_checkpoint_params(d, use_ema_state) for d in dirs]
    if len(members) > 1:
        print(f"ensemble of {len(members)} members: averaged gradient field")

    V_true = inst.V_true_fn

    @jax.jit
    def fields(x):
        """(ensemble-averaged predicted gradient, true gradient) at x —
        computed once and reused by every metric below (the rescale block
        previously re-ran the 50k-point sweep unjitted, ADVICE round 2)."""
        preds = [
            ad.batched_grad(lambda xi: net.apply(p, xi)[0], x) for p in members
        ]
        pred = sum(preds) / len(preds)
        return pred, ad.batched_grad(V_true, x)

    key = jax.random.PRNGKey(123)
    k_init, k_path = jax.random.split(key)

    # (a) initial law
    z0 = inst.distribution_initial.sample(50_000, k_init)
    x0 = z0[:, : inst.dim]
    pred0, true0 = fields(x0)
    num0 = jnp.sum((pred0 - true0) ** 2, -1)
    den0 = jnp.mean(jnp.sum(true0**2, -1))
    if len(members) > 1:
        for d, p in zip(dirs, members):
            mp = jax.jit(
                lambda x, p: ad.batched_grad(lambda xi: net.apply(p, xi)[0], x)
            )(x0, p)
            r = float(jnp.sqrt(jnp.mean(jnp.sum((mp - true0) ** 2, -1)) / den0))
            print(f"  member {d}: initial-law rel-L2 {r:.4e}")
    print(f"initial-law rel-L2: {float(jnp.sqrt(jnp.mean(num0) / den0)):.4e}")

    # Scale-vs-distortion split: the best single scalar c for c*grad V_theta.
    # c far from 1 with a large error drop = coherent field shrinkage
    # (e.g. weight-decay pull); c ~ 1 with no drop = distributed distortion
    # (e.g. drift along the weak-form loss's near-null directions).
    c = float(jnp.sum(pred0 * true0) / jnp.sum(pred0 * pred0))
    resc = float(
        jnp.sqrt(jnp.mean(jnp.sum((c * pred0 - true0) ** 2, -1)) / den0)
    )
    print(f"best scalar rescale c={c:.4f}; rescaled initial-law rel-L2: {resc:.4e}")

    # (b) path law (fresh simulation, 2000 trajectories)
    _, _, path = jax.jit(lambda k: inst.sample_ground_truth(k, 2000))(k_path)
    xp = path[:, : inst.dim]
    predp, truep = fields(xp)
    nump = jnp.sum((predp - truep) ** 2, -1)
    denp = jnp.mean(jnp.sum(truep**2, -1))
    print(f"path-law    rel-L2: {float(jnp.sqrt(jnp.mean(nump) / denp)):.4e}")

    # (c) initial samples binned by distance to the path support.
    # Subsample the support set and chunk the test axis so the pairwise
    # distance block stays ~160 MB instead of the full n x m matrix.
    support = xp[
        jax.random.permutation(jax.random.PRNGKey(7), xp.shape[0])[:20_000]
    ]

    @jax.jit
    def min_dist(x, p):
        p2 = jnp.sum(p * p, -1)[None]

        def chunk_min(xc):
            x2 = jnp.sum(xc * xc, -1, keepdims=True)
            d2 = x2 + p2 - 2.0 * (xc @ p.T)
            return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))

        return jax.lax.map(chunk_min, x.reshape(-1, 2048, x.shape[-1])).reshape(-1)

    n_keep = (x0.shape[0] // 2048) * 2048
    x0, num0 = x0[:n_keep], num0[:n_keep]
    dist = np.asarray(min_dist(x0, support))
    num0 = np.asarray(num0)
    den0 = float(den0)
    qs = np.quantile(dist, [0.0, 0.5, 0.9, 0.99, 1.0])
    print(f"distance-to-path-support quantiles (0/50/90/99/100%): {np.round(qs, 3)}")
    for lo, hi, label in [
        (0.0, qs[1], "nearest 50%"),
        (qs[1], qs[2], "50-90%"),
        (qs[2], qs[3], "90-99%"),
        (qs[3], np.inf, "farthest 1%"),
    ]:
        m = (dist >= lo) & (dist < hi)
        if m.sum():
            r = float(np.sqrt(num0[m].mean() / den0))
            print(
                f"  initial-law rel-L2, {label:12s} (d in [{lo:.2f},"
                f" {min(hi, dist.max()):.2f})): {r:.4e}  [{m.sum()} pts]"
            )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
