"""Equality gates for the fused per-point {grad V, v^T Hess V v} provider.

The fused pointwise path (losses/fused_pointwise.py +
ops/pallas/pointwise_kernel.py) must reproduce the generic autodiff
formulation (`ops/autodiff.batched_grad_and_hvp_quadform`) — outputs AND
parameter gradients — for every PotentialMLP configuration, every provider
mode (xla streams / forward kernel / both kernels, interpret mode on CPU),
ragged batch sizes that don't divide the tile, and under data-axis
shard_map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_inverse_tpu.config import BackendConfig, Config, apply_overrides
from pde_inverse_tpu.losses import fused_pointwise as fp
from pde_inverse_tpu.losses import kinetic_fokker_planck as kfp_loss
from pde_inverse_tpu.models.mlp import PotentialMLP
from pde_inverse_tpu.ops import autodiff as ad
from pde_inverse_tpu.ops.pallas import pointwise_kernel as pk
from pde_inverse_tpu.parallel.mesh import build_mesh
from pde_inverse_tpu.problems import KineticFokkerPlanckOU


@pytest.fixture
def rng():
    return jax.random.PRNGKey(3)


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


MLP_VARIANTS = {
    "plain": {},
    "fourier": {"fourier_features": 6, "fourier_scale": 0.7},
    "quad_head": {"quadratic_head": True},
    "fourier+quad": {"fourier_features": 4, "quadratic_head": True},
    "silu": {"activation": "silu"},
}


def _net_params(dim=2, **mlp_kwargs):
    net = PotentialMLP(hidden_dims=[16, 16], feature_dim=8, **mlp_kwargs)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros(dim))
    return net, params


def _xv(rng, n=37, dim=2):
    kx, kv = jax.random.split(rng)
    return (
        jax.random.normal(kx, (n, dim)),
        jax.random.normal(kv, (n, dim)),
    )


def _autodiff(net, params, x, v):
    V = lambda xi: net.apply(params, xi)[0]
    return ad.batched_grad_and_hvp_quadform(V, x, v)


class TestProvider:
    @pytest.mark.parametrize("variant", sorted(MLP_VARIANTS))
    def test_xla_streams_match_autodiff(self, rng, variant):
        net, params = _net_params(**MLP_VARIANTS[variant])
        x, v = _xv(rng)
        nab_ref, quad_ref = _autodiff(net, params, x, v)
        nab, quad = fp.grad_and_quadform(net, params, x, v, mode="xla")
        np.testing.assert_allclose(nab, nab_ref, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(quad, quad_ref, rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("variant", ["plain", "fourier+quad", "silu"])
    def test_kernel_forward_matches_autodiff(self, rng, interp, variant):
        net, params = _net_params(**MLP_VARIANTS[variant])
        x, v = _xv(rng)
        nab_ref, quad_ref = _autodiff(net, params, x, v)
        nab, quad = fp.grad_and_quadform(net, params, x, v, mode="on")
        np.testing.assert_allclose(nab, nab_ref, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(quad, quad_ref, rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("n", [512, 511, 513, 1])
    def test_kernel_padding_ragged_batches(self, rng, interp, n):
        """Block padding must not leak into outputs for any n vs the
        512-row default tile."""
        net, params = _net_params(**MLP_VARIANTS["fourier"])
        x, v = _xv(rng, n=n)
        nab_ref, quad_ref = _autodiff(net, params, x, v)
        nab, quad = fp.grad_and_quadform(net, params, x, v, mode="fwd")
        np.testing.assert_allclose(nab, nab_ref, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(quad, quad_ref, rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("variant", sorted(MLP_VARIANTS))
    @pytest.mark.parametrize("mode", ["xla", "fwd", "on"])
    def test_param_grads_match_autodiff(self, rng, interp, variant, mode):
        """Gradient of a loss-shaped composite (all three consumers of the
        provider outputs) w.r.t. params, provider vs pure autodiff."""
        net, params = _net_params(**MLP_VARIANTS[variant])
        x, v = _xv(rng, n=29)

        def composite(nab, quad):
            return (
                jnp.mean(jnp.sum(nab**2, -1))
                - 2.0 * jnp.mean(quad)
                + 0.5 * jnp.mean(jnp.sum(nab * v, -1))
            )

        def loss_ref(p):
            return composite(*_autodiff(net, p, x, v))

        def loss_fused(p):
            return composite(*fp.grad_and_quadform(net, p, x, v, mode=mode))

        val_ref, g_ref = jax.value_and_grad(loss_ref)(params)
        val, g = jax.value_and_grad(loss_fused)(params)
        np.testing.assert_allclose(val, val_ref, rtol=1e-5, atol=1e-7)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat = dict(jax.tree_util.tree_leaves_with_path(g))
        for path, leaf_ref in flat_ref:
            np.testing.assert_allclose(
                flat[path],
                leaf_ref,
                rtol=3e-4,
                atol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )


class TestKFPLossIntegration:
    def _setup(self, rng, **mlp_kwargs):
        cfg = apply_overrides(
            Config(),
            [
                "pde_instance.name=Kinetic-Fokker-Planck",
                "pde_instance.domain_dim=2",
                "pde_instance.total_evolving_time=2",
            ],
        )
        inst = KineticFokkerPlanckOU(cfg, rng)
        net, params = _net_params(**mlp_kwargs)
        keys = jax.random.split(rng, 3)
        data = {
            "initial": inst.distribution_initial.sample(32, keys[0]),
            "terminal": inst.distribution_terminal.sample(32, keys[1]),
            "0T": inst.sample_ground_truth(keys[2], (3, 24)),
        }
        return inst, net, params, data

    @pytest.mark.parametrize("mode", ["xla", "on"])
    def test_loss_and_grad_match_autodiff_path(self, rng, interp, mode):
        inst, net, params, data = self._setup(
            rng, fourier_features=6, quadratic_head=True
        )
        out_ref = kfp_loss.value_and_grad_fn(net.apply, params, data, rng, inst)
        out = kfp_loss.value_and_grad_fn(
            net.apply,
            params,
            data,
            rng,
            inst,
            fused_module=net,
            fused_mode=mode,
        )
        np.testing.assert_allclose(
            out["loss"], out_ref["loss"], rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            out["loss ground truth"],
            out_ref["loss ground truth"],
            rtol=1e-5,
            atol=1e-7,
        )
        for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(out["grad"]),
            jax.tree_util.tree_leaves_with_path(out_ref["grad"]),
        ):
            assert p1 == p2
            np.testing.assert_allclose(
                l1, l2, rtol=3e-4, atol=1e-5, err_msg=jax.tree_util.keystr(p1)
            )

    def test_auto_mode_is_inert_on_cpu(self, rng):
        """fused_mode='auto' off-TPU must leave the loss on the autodiff
        path bit-for-bit (CLI default safety)."""
        inst, net, params, data = self._setup(rng, fourier_features=4)
        out_ref = kfp_loss.value_and_grad_fn(net.apply, params, data, rng, inst)
        out = kfp_loss.value_and_grad_fn(
            net.apply,
            params,
            data,
            rng,
            inst,
            fused_module=net,
            fused_mode="auto",
        )
        assert float(out["loss"]) == float(out_ref["loss"])
        for l1, l2 in zip(
            jax.tree_util.tree_leaves(out["grad"]),
            jax.tree_util.tree_leaves(out_ref["grad"]),
        ):
            np.testing.assert_array_equal(l1, l2)


class TestShardMap:
    def test_data_sharded_matches_local(self, rng, interp):
        """Provider under a data-axis shard_map (kernel in interpret mode)
        equals the unsharded evaluation, values and param grads."""
        net, params = _net_params(**MLP_VARIANTS["fourier+quad"])
        x, v = _xv(rng, n=32)
        spec = build_mesh(BackendConfig(data_axis_size=4, ref_axis_size=2))

        def loss(p, mesh_spec):
            nab, quad = fp.grad_and_quadform(
                net, p, x, v, mode="on", mesh_spec=mesh_spec
            )
            return jnp.mean(jnp.sum(nab**2, -1)) - 2.0 * jnp.mean(quad)

        val_ref, g_ref = jax.value_and_grad(lambda p: loss(p, None))(params)
        val, g = jax.value_and_grad(lambda p: loss(p, spec))(params)
        np.testing.assert_allclose(val, val_ref, rtol=1e-5, atol=1e-7)
        for l1, l2 in zip(
            jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_ref)
        ):
            np.testing.assert_allclose(l1, l2, rtol=3e-4, atol=1e-5)
