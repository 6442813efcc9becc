"""Non-parametric potential hypothesis network.

Parity target: ``V_hypothesis`` (reference core/model.py:32-62) — a tanh MLP
with Kaiming init whose output is a guaranteed-nonnegative scalar
sum-of-squares of the last feature layer.  Reference quirks fixed by design:
the hardcoded width-40 feature layer is configurable (default 128, one TPU
lane tile), and there is no stray dependency on a fixed 4-dim problem
configuration (core/model.py:49).

The hidden path optionally runs in bfloat16 (MXU-native) with float32
parameters and a float32 output reduction.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "celu": jax.nn.celu,
    "elu": jax.nn.elu,
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
}


class PotentialMLP(nn.Module):
    """V(x) = sum_i h(x)_i^2 with h an MLP — smooth, >= 0, scalar."""

    hidden_dims: Sequence[int]
    feature_dim: int = 128
    activation: str = "tanh"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _ACTIVATIONS[self.activation]
        h = x.astype(self.dtype)
        for width in self.hidden_dims:
            h = nn.Dense(
                width,
                kernel_init=nn.initializers.kaiming_normal(),
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(h)
            h = act(h)
        h = nn.Dense(
            self.feature_dim,
            kernel_init=nn.initializers.kaiming_normal(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(h)
        h = h.astype(jnp.float32)
        value = jnp.sum(h * h, axis=-1)
        return value[None] if x.ndim == 1 else value


class ResNetPotential(nn.Module):
    """Residual-block variant (the reference declares a ResNet config but
    raises NotImplementedError, core/model.py:116-118 — implemented here)."""

    hidden_dim: int
    n_blocks: int
    feature_dim: int = 128
    activation: str = "tanh"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _ACTIVATIONS[self.activation]
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(
            x.astype(self.dtype)
        )
        for _ in range(self.n_blocks):
            r = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(
                act(h)
            )
            r = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(
                act(r)
            )
            h = h + r
        h = nn.Dense(self.feature_dim, dtype=self.dtype, param_dtype=jnp.float32)(
            act(h)
        )
        h = h.astype(jnp.float32)
        value = jnp.sum(h * h, axis=-1)
        return value[None] if x.ndim == 1 else value
