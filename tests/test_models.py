"""Hypothesis-network unit tests (PotentialMLP / ResNetPotential / factory).

Parity target: V_hypothesis (reference core/model.py:32-62) — scalar,
nonnegative potential; plus rebuild-only capabilities: configurable feature
width, ResNet variant (the reference raises, core/model.py:116-118),
bfloat16 hidden path, and the random-Fourier front end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_inverse_tpu.config import Config, apply_overrides
from pde_inverse_tpu.models.factory import get_model
from pde_inverse_tpu.models.mlp import PotentialMLP, ResNetPotential


class TestPotentialMLP:
    def _apply(self, net, d=3, n=17):
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
        params = net.init(jax.random.PRNGKey(1), x[0])
        return params, net.apply(params, x), x

    def test_scalar_nonnegative_batched(self):
        net = PotentialMLP(hidden_dims=(8, 8), feature_dim=16)
        _, v, _ = self._apply(net)
        assert v.shape == (17,)
        assert (np.asarray(v) >= 0).all()

    def test_single_point_shape(self):
        net = PotentialMLP(hidden_dims=(8,), feature_dim=16)
        params = net.init(jax.random.PRNGKey(1), jnp.zeros(3))
        out = net.apply(params, jnp.ones(3))
        assert out.shape == (1,)

    def test_fourier_front_end(self):
        net = PotentialMLP(
            hidden_dims=(8, 8), feature_dim=16, fourier_features=12, fourier_scale=0.7
        )
        params, v, x = self._apply(net)
        assert v.shape == (17,)
        assert params["params"]["fourier_B"].shape == (3, 12)
        # gradient field exists and is finite
        g = jax.vmap(jax.grad(lambda xi: net.apply(params, xi)[0]))(x)
        assert np.isfinite(np.asarray(g)).all()
        # B initialization spread follows fourier_scale
        B = np.asarray(params["params"]["fourier_B"])
        assert 0.3 < B.std() < 1.2

    def test_quadratic_head_far_field(self):
        """With the quadratic skip term the gradient grows linearly far
        from the origin instead of saturating to zero (the bounded-feature
        head alone vanishes there)."""
        net_plain = PotentialMLP(hidden_dims=(8,), feature_dim=8)
        net_quad = PotentialMLP(hidden_dims=(8,), feature_dim=8, quadratic_head=True)
        x_far = 50.0 * jnp.ones((4, 3))
        for net, expect_flat in [(net_plain, True), (net_quad, False)]:
            params = net.init(jax.random.PRNGKey(1), x_far[0])
            g = jax.vmap(jax.grad(lambda xi: net.apply(params, xi)[0]))(x_far)
            gnorm = float(jnp.linalg.norm(g[0]))
            if expect_flat:
                assert gnorm < 1.0, gnorm  # tanh features saturate
            else:
                assert gnorm > 1.0, gnorm  # quadratic term keeps growing

    def test_bfloat16_hidden_path(self):
        net = PotentialMLP(hidden_dims=(8, 8), feature_dim=16, dtype=jnp.bfloat16)
        params, v, _ = self._apply(net)
        assert v.dtype == jnp.float32  # output reduction stays f32
        # params stay f32 for optimizer precision
        for leaf in jax.tree_util.tree_leaves(params):
            assert leaf.dtype == jnp.float32


class TestResNetPotential:
    def test_scalar_nonnegative(self):
        net = ResNetPotential(hidden_dim=8, n_blocks=2, feature_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (9, 4))
        params = net.init(jax.random.PRNGKey(1), x[0])
        v = net.apply(params, x)
        assert v.shape == (9,)
        assert (np.asarray(v) >= 0).all()


class TestFactory:
    def test_nonparametric_fourier_dispatch(self):
        cfg = apply_overrides(
            Config(),
            [
                "estimation_mode=non-parametric",
                "neural_network.fourier_features=32",
                "neural_network.fourier_scale=1.5",
            ],
        )
        net = get_model(cfg)
        assert isinstance(net, PotentialMLP)
        assert net.fourier_features == 32
        assert net.fourier_scale == 1.5

    def test_resnet_dispatch(self):
        cfg = apply_overrides(
            Config(),
            ["estimation_mode=non-parametric", "neural_network.n_resblocks=3"],
        )
        net = get_model(cfg)
        assert isinstance(net, ResNetPotential)
        assert net.n_blocks == 3

    def test_bilinear_debug_dispatch_and_exact_quadratic(self):
        """bilinear-debug (reference core/model.py:63-96) can represent an
        exact quadratic form: with W set to Q and c=0, V(x) == x.Qx."""
        from pde_inverse_tpu.models.mlp import BilinearDebugPotential

        cfg = apply_overrides(
            Config(),
            ["estimation_mode=non-parametric", "neural_network.model=bilinear-debug"],
        )
        net = get_model(cfg)
        assert isinstance(net, BilinearDebugPotential)
        d, n = 3, 11
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
        params = net.init(jax.random.PRNGKey(1), x[0])
        assert net.apply(params, x).shape == (n,)
        assert net.apply(params, x[0]).shape == (1,)
        Q = jnp.array([[2.0, 0.5, 0.0], [0.5, 1.0, 0.0], [0.0, 0.0, 3.0]])
        params = jax.tree_util.tree_map(lambda _: None, params)  # guard reuse
        params = {
            "params": {"Dense_0": {"kernel": Q, "bias": jnp.zeros(d)}}
        }
        v = net.apply(params, x)
        np.testing.assert_allclose(v, jnp.einsum("ni,ij,nj->n", x, Q, x), rtol=1e-6)

    def test_unknown_mode_raises(self):
        cfg = apply_overrides(Config(), ["estimation_mode=banana"])
        with pytest.raises(ValueError, match="estimation_mode"):
            get_model(cfg)
