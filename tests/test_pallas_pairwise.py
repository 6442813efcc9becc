"""Equality gates for the Pallas blockwise pairwise KMV kernel.

Interpret-mode (CPU) checks against the jnp blockwise tile machinery; the
kernel computes masked per-stamp ref sums of {Phi, v^T Hess Phi v, first-
layer cotangent} for plain MLP stacks.  (No PRNG inside, so interpret mode
is exact — unlike the Langevin kernel's distributional TPU gates.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_inverse_tpu.losses import pairwise_blockwise as bw
from pde_inverse_tpu.models.mlp import PotentialMLP
from pde_inverse_tpu.ops.pallas import pairwise_kernel as pk


def _setup(rng, n=13, m=11, nt=3, d=2, hidden=(16, 16), feat=8, act="tanh"):
    net = PotentialMLP(hidden_dims=list(hidden), feature_dim=feat, activation=act)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros(d))
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (n, nt, d))
    v = jax.random.normal(k2, (n, nt, d))
    refs = jax.random.normal(k3, (m, nt, d))
    return net, params, x, v, refs


def _kernel_inputs(net, params, x, v, refs):
    layers, B, quad, act, dtype = bw._mlp_structure(net, params)
    (W0, b0), mids = layers[0], layers[1:]
    d = x.shape[-1]
    W0y = W0[:d]
    # [nt, n, w0] layouts
    ax = jnp.einsum("ntd,dw->tnw", x, W0y) + b0
    av = jnp.einsum("ntd,dw->tnw", v, W0y)
    ar = jnp.einsum("mtd,dw->tmw", refs, W0y)
    return mids, ax, av, ar


def _jnp_reference(net, params, x, v, refs, mask):
    """Masked per-stamp sums via the jnp tile machinery (single chunk)."""
    layers, B, quad, act, dtype = bw._mlp_structure(net, params)
    (W0, b0) = layers[0]
    d = x.shape[-1]
    W0y = W0[:d]
    ax = x @ W0y + b0  # [n, nt, w0]
    av = v @ W0y
    ar = refs @ W0y  # [m, nt, w0]
    out = bw._tile_stats(
        layers, act, dtype, ax, ar, av, None, None, None, mask
    )
    # _tile_stats returns FLAT scan-carry-safe sums ([n*nt], [n*nt, w]);
    # unflatten, then transpose to the kernel's [nt, n, .] layout
    n, nt = x.shape[0], x.shape[1]
    out = {k: v.reshape((n, nt) + v.shape[1:]) for k, v in out.items()}
    return {
        "value": out["value"].T,
        "hess": out["hess"].T,
        "s_dz0": jnp.swapaxes(out["s_dz0"], 0, 1),
    }


class TestPairwiseKernel:
    @pytest.mark.parametrize("act", ["tanh", "silu"])
    def test_matches_jnp_tiles(self, act):
        rng = jax.random.PRNGKey(3)
        net, params, x, v, refs = _setup(rng, act=act)
        mids, ax, av, ar = _kernel_inputs(net, params, x, v, refs)
        mask = jnp.ones((refs.shape[0],))
        out = pk.mlp_pairwise_sums(
            mids, act, ax, av, ar, mask, block_i=8, block_j=4, interpret=True
        )
        ref = _jnp_reference(net, params, x, v, refs, mask)
        for k in ("value", "hess", "s_dz0"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), rtol=2e-4, atol=1e-4,
                err_msg=k,
            )

    def test_mask_and_padding(self):
        """Ragged n/m vs block sizes + a partial validity mask."""
        rng = jax.random.PRNGKey(5)
        net, params, x, v, refs = _setup(rng, n=10, m=7)
        mids, ax, av, ar = _kernel_inputs(net, params, x, v, refs)
        mask = jnp.asarray([1, 1, 0, 1, 0, 1, 1], jnp.float32)
        out = pk.mlp_pairwise_sums(
            mids, "tanh", ax, av, ar, mask, block_i=8, block_j=4,
            interpret=True,
        )
        ref = _jnp_reference(net, params, x, v, refs, mask)
        for k in ("value", "hess", "s_dz0"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), rtol=2e-4, atol=1e-4,
                err_msg=k,
            )

    @pytest.mark.parametrize("mode", ["on", "fwd"])
    def test_loss_and_grad_through_custom_vjp(self, monkeypatch, mode):
        """The full KMV loss with pallas_mode='on' (interpret) must match
        the pure-jnp blockwise path — values AND parameter gradients (the
        backward runs the jnp VJP by construction, but the forward values
        feed the nonlinear loss terms)."""
        from pde_inverse_tpu.config import Config, apply_overrides
        from pde_inverse_tpu.losses import kinetic_mckean_vlasov as kmv_loss
        from pde_inverse_tpu.problems import KineticMcKeanVlasovQuadratic

        monkeypatch.setattr(pk, "_INTERPRET", True)
        cfg = apply_overrides(
            Config(),
            [
                "pde_instance.name=Kinetic-McKean-Vlasov",
                "pde_instance.domain_dim=2",
                "pde_instance.total_evolving_time=1",
            ],
        )
        rng = jax.random.PRNGKey(11)
        inst = KineticMcKeanVlasovQuadratic(cfg, rng)
        net = PotentialMLP(
            hidden_dims=[16, 16], feature_dim=8, quadratic_head=True
        )
        params = net.init(jax.random.PRNGKey(0), jnp.zeros(2))
        n, nt = 12, 2
        data = {
            "0T": inst.sample_ground_truth(rng, (nt, n)),
            "tau_0T": inst.get_time_sample_ground_truth(rng, (nt, n)),
        }
        out_jnp = kmv_loss.value_and_grad_fn(
            net.apply, params, data, rng, inst, blockwise_module=net,
            pallas_mode="off",
        )
        out_pl = kmv_loss.value_and_grad_fn(
            net.apply, params, data, rng, inst, blockwise_module=net,
            pallas_mode=mode,
        )
        np.testing.assert_allclose(
            float(out_pl["loss"]), float(out_jnp["loss"]), rtol=2e-4
        )
        np.testing.assert_allclose(
            float(out_pl["loss ground truth"]),
            float(out_jnp["loss ground truth"]),
            rtol=2e-4,
            atol=1e-6,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(out_pl["grad"]),
            jax.tree_util.tree_leaves(out_jnp["grad"]),
        ):
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)

    def test_pallas_path_on_2d_mesh(self, monkeypatch):
        """Kernel + custom_vjp inside the (data, ref) shard_map must equal
        the local pure-jnp path (stats and loss grads reduce over the ref
        axis with psum around the kernel calls)."""
        from pde_inverse_tpu.config import BackendConfig
        from pde_inverse_tpu.parallel.mesh import build_mesh

        monkeypatch.setattr(pk, "_INTERPRET", True)
        rng = jax.random.PRNGKey(19)
        net, params, x, v, refs = _setup(rng, n=16, m=16)
        spec = build_mesh(BackendConfig(data_axis_size=2, ref_axis_size=4))
        local = bw.mlp_pairwise_stats(net, params, x, v, refs, pallas_mode="off")
        sharded = bw.mlp_pairwise_stats(
            net, params, x, v, refs, pallas_mode="on", mesh_spec=spec
        )
        for k in ("nabla", "hess", "value"):
            np.testing.assert_allclose(
                np.asarray(sharded[k]), np.asarray(local[k]), rtol=1e-4,
                atol=1e-5, err_msg=k,
            )

    @pytest.mark.parametrize("act", ["tanh", "silu"])
    def test_backward_kernel_matches_jnp_vjp(self, act):
        """mlp_pairwise_sums_bwd must equal jax.vjp of the jnp tile math
        w.r.t. (mid-layer weights, ax, av, ar) for random upstream
        cotangents — including mask + ragged-block padding."""
        from pde_inverse_tpu.models.mlp import _ACTIVATIONS

        rng = jax.random.PRNGKey(13)
        net, params, x, v, refs = _setup(rng, n=10, m=7, act=act)
        mids, ax, av, ar = _kernel_inputs(net, params, x, v, refs)
        mask = jnp.asarray([1, 1, 0, 1, 1, 0, 1], jnp.float32)
        act_fn = _ACTIVATIONS[act]
        w0 = ax.shape[-1]
        dummy0 = (jnp.zeros((2, w0)), jnp.zeros((w0,)))

        def f(mids_, ax_, av_, ar_):
            out = bw._tile_stats(
                [dummy0] + list(mids_),
                act_fn,
                jnp.float32,
                jnp.swapaxes(ax_, 0, 1),
                jnp.swapaxes(ar_, 0, 1),
                jnp.swapaxes(av_, 0, 1),
                None,
                None,
                None,
                mask,
            )
            n_, nt_ = ax_.shape[1], ax_.shape[0]  # ax_ is [nt, n, w0]
            out = {
                k: w.reshape((n_, nt_) + w.shape[1:]) for k, w in out.items()
            }
            return {
                "value": out["value"].T,
                "hess": out["hess"].T,
                "s_dz0": jnp.swapaxes(out["s_dz0"], 0, 1),
            }

        out, vjp = jax.vjp(f, mids, ax, av, ar)
        kg = jax.random.split(jax.random.PRNGKey(17), 3)
        g = {
            "value": jax.random.normal(kg[0], out["value"].shape),
            "hess": jax.random.normal(kg[1], out["hess"].shape),
            "s_dz0": jax.random.normal(kg[2], out["s_dz0"].shape),
        }
        want_mids, want_ax, want_av, want_ar = vjp(g)
        got_mids, got_ax, got_av, got_ar = pk.mlp_pairwise_sums_bwd(
            mids, act, ax, av, ar, mask,
            g["value"], g["hess"], g["s_dz0"],
            block_i=8, block_j=4, interpret=True,
        )
        for (gw, gb), (ww, wb) in zip(got_mids, want_mids):
            np.testing.assert_allclose(gw, ww, rtol=3e-4, atol=3e-4)
            np.testing.assert_allclose(gb, wb, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(got_ax, want_ax, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(got_av, want_av, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(got_ar, want_ar, rtol=3e-4, atol=3e-4)

    def test_single_hidden_layer(self):
        rng = jax.random.PRNGKey(7)
        net, params, x, v, refs = _setup(rng, hidden=(8,), feat=8)
        mids, ax, av, ar = _kernel_inputs(net, params, x, v, refs)
        mask = jnp.ones((refs.shape[0],))
        out = pk.mlp_pairwise_sums(
            mids, "tanh", ax, av, ar, mask, block_i=8, block_j=8,
            interpret=True,
        )
        ref = _jnp_reference(net, params, x, v, refs, mask)
        for k in ("value", "hess", "s_dz0"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), rtol=2e-4, atol=1e-4,
                err_msg=k,
            )


class TestBlockPlumbing:
    def test_pallas_blocks_kwarg_reaches_both_kernels(self, monkeypatch):
        """solver.train.kmv_pallas_block_{i,j} -> pallas_blocks must reach
        the forward AND backward kernels, and a non-default tile must give
        the same loss/grad (tile shape is a schedule, not semantics)."""
        from pde_inverse_tpu.config import Config, apply_overrides
        from pde_inverse_tpu.losses import kinetic_mckean_vlasov as kmv_loss
        from pde_inverse_tpu.problems import KineticMcKeanVlasovQuadratic

        monkeypatch.setattr(pk, "_INTERPRET", True)
        seen = {}
        orig_fwd, orig_bwd = pk.mlp_pairwise_sums, pk.mlp_pairwise_sums_bwd

        def spy_fwd(*a, **k):
            seen["fwd"] = (k.get("block_i"), k.get("block_j"))
            return orig_fwd(*a, **k)

        def spy_bwd(*a, **k):
            seen["bwd"] = (k.get("block_i"), k.get("block_j"))
            return orig_bwd(*a, **k)

        monkeypatch.setattr(pk, "mlp_pairwise_sums", spy_fwd)
        monkeypatch.setattr(pk, "mlp_pairwise_sums_bwd", spy_bwd)

        cfg = apply_overrides(
            Config(),
            [
                "pde_instance.name=Kinetic-McKean-Vlasov",
                "pde_instance.domain_dim=2",
                "pde_instance.total_evolving_time=1",
            ],
        )
        rng = jax.random.PRNGKey(11)
        inst = KineticMcKeanVlasovQuadratic(cfg, rng)
        net = PotentialMLP(
            hidden_dims=[16, 16], feature_dim=8, quadratic_head=True
        )
        params = net.init(jax.random.PRNGKey(0), jnp.zeros(2))
        n, nt = 12, 2
        data = {
            "0T": inst.sample_ground_truth(rng, (nt, n)),
            "tau_0T": inst.get_time_sample_ground_truth(rng, (nt, n)),
        }

        def run(blocks):
            return kmv_loss.value_and_grad_fn(
                net.apply, params, data, rng, inst, blockwise_module=net,
                pallas_mode="on", pallas_blocks=blocks,
            )

        out_default = run((128, 8))
        assert seen["fwd"] == (128, 8) and seen["bwd"] == (128, 8)
        out_big = run((256, 16))
        assert seen["fwd"] == (256, 16) and seen["bwd"] == (256, 16)
        np.testing.assert_allclose(
            float(out_big["loss"]), float(out_default["loss"]), rtol=2e-4
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(out_big["grad"]),
            jax.tree_util.tree_leaves(out_default["grad"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
            )
