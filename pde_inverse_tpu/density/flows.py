"""Time-conditioned RealNVP normalizing flow for log-density estimation.

Capability parity with /root/reference/core/normalizing_flow.py
(SinusoidalEmbedding / TimeEmbedding / CouplingLayer / MNF / RealNVP), with
TPU-friendly structure:

* the whole coupling stack evaluates on a BATCH [n, d] natively (the
  reference is written per-point and double-vmapped from the trainer,
  core/log_density_estimation.py:48-53) so each coupling layer is one fused
  matmul over the batch;
* coupling layers carry an identity-at-t=0 parameterization: with
  soft_init == 0 the scale/translate are multiplied by t ("hard"), otherwise
  a learned per-dim scaling factor bounds the scale through tanh (parity:
  normalizing_flow.py:115-163).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


_ACTS = {
    "relu": nn.relu,
    "tanh": nn.tanh,
    "celu": nn.celu,
    "gelu": nn.gelu,
    "elu": nn.elu,
    "silu": nn.silu,
    "softplus": nn.softplus,
    # reference ActivationFactory parity (core/normalizing_flow.py:85-93):
    # flax has no prelu module; the reference's torch.nn.PReLU default is a
    # leaky relu with a fixed 0.25 negative slope (the learnable scalar stays
    # at its init under the reference's usage).
    "prelu": lambda x: nn.leaky_relu(x, negative_slope=0.25),
}


class SinusoidalEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        # t: scalar -> [dim]
        half = self.dim // 2
        freq = jnp.exp(-math.log(10_000.0) / (half - 1) * jnp.arange(half))
        ang = t * freq
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimeEmbedding(nn.Module):
    dim: int
    mul: int = 1
    act: str = "celu"

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        width = self.dim * self.mul
        h = SinusoidalEmbedding(self.dim)(t)
        h = nn.Dense(width)(h)
        h = _ACTS[self.act](h)
        return nn.Dense(width)(h)


class ConditionerMLP(nn.Module):
    """The small scale/translate net (parity: BasicMLP 8-16-16,
    normalizing_flow.py:97-112)."""

    out_dim: int
    act: str
    widths: Sequence[int] = (8, 16, 16)

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        for w in self.widths:
            h = _ACTS[self.act](nn.Dense(w)(h))
        return nn.Dense(self.out_dim)(h)


class CouplingLayer(nn.Module):
    mask: np.ndarray  # 1 = coordinate kept (conditions the others)
    soft_init: float
    ignore_time: bool
    act: str
    time_emb: Optional[Any]

    @nn.compact
    def __call__(self, t: jnp.ndarray, x: jnp.ndarray, reverse: bool):
        """x: [..., d]; t scalar. Returns (y [..., d], ldj [...])."""
        d = self.mask.shape[0]
        mask = jnp.asarray(self.mask, x.dtype)
        scaling_factor = self.param(
            "scaling_factor", nn.initializers.zeros, (d,)
        )

        h = x * mask
        if not self.ignore_time:
            if self.time_emb is not None:
                emb = self.time_emb(t)
                emb = jnp.broadcast_to(emb, x.shape[:-1] + emb.shape[-1:])
            else:
                emb = jnp.broadcast_to(t[None], x.shape[:-1] + (1,))
            h = jnp.concatenate([h, emb], axis=-1)

        scale = ConditionerMLP(out_dim=d, act=self.act)(h)
        translate = ConditionerMLP(out_dim=d, act=self.act)(h)

        if not self.ignore_time and self.soft_init == 0.0:
            # hard identity at t=0
            scale = t * scale
            translate = t * translate

        sf = jnp.exp(scaling_factor)
        scale = jnp.tanh(scale / sf) * sf
        scale = scale * (1.0 - mask)
        translate = translate * (1.0 - mask)

        if reverse:
            y = (x + translate) * jnp.exp(scale)
            ldj = jnp.sum(scale, axis=-1)
        else:
            y = x * jnp.exp(-scale) - translate
            ldj = -jnp.sum(scale, axis=-1)
        return y, ldj


def make_masks(dim: int, couple_mul: int, mask_type: str) -> np.ndarray:
    """Coupling masks: 'loop' drops one coordinate per layer; 'random' draws
    non-degenerate, non-repeating Bernoulli masks (parity:
    normalizing_flow.py:178-197)."""
    if mask_type == "loop":
        n_layers = dim * couple_mul
        masks = np.ones((n_layers, dim))
        for i in range(n_layers):
            masks[i, i % dim] = 0.0
        return masks
    if mask_type == "random":
        rng = np.random.RandomState(seed=888)
        masks, prev = [], np.zeros(dim, dtype=int)
        while len(masks) < couple_mul:
            m = rng.binomial(1, p=0.5, size=[dim])
            if m.sum() in (0, dim) or (m == prev).all():
                continue
            prev = m
            masks.append(m.astype(np.float64))
        return np.stack(masks)
    raise ValueError(f"unknown mask_type {mask_type!r}")


class MaskedNormalizingFlow(nn.Module):
    """Stack of coupling layers mapping samples at time t back to t=0
    (reverse=True) or pushing base samples forward (reverse=False)."""

    dim: int
    couple_mul: int = 4
    mask_type: str = "loop"
    soft_init: float = 1.0
    ignore_time: bool = False
    activation: str = "celu"
    embed_time_dim: int = 10

    def setup(self):
        time_emb = (
            TimeEmbedding(self.embed_time_dim) if self.embed_time_dim > 0 else None
        )
        masks = make_masks(self.dim, self.couple_mul, self.mask_type)
        self.layers = [
            CouplingLayer(
                mask=masks[i],
                soft_init=self.soft_init,
                ignore_time=self.ignore_time,
                act=self.activation,
                time_emb=time_emb,
            )
            for i in range(masks.shape[0])
        ]

    def __call__(self, t: jnp.ndarray, x: jnp.ndarray, reverse: bool = False):
        layers = list(reversed(self.layers)) if reverse else list(self.layers)
        ldj = jnp.zeros(x.shape[:-1], x.dtype)
        for layer in layers:
            x, step_ldj = layer(t, x, reverse)
            ldj = ldj + step_ldj
        return x, ldj


class TimeConditionedLogDensity(nn.Module):
    """log rho_t(x) = log p_0(T^{-1}_t x) + log|det J| (parity: RealNVP,
    normalizing_flow.py:223-229). Batched: t scalar, x [..., d]."""

    flow: MaskedNormalizingFlow
    log_prob_0: Callable[[jnp.ndarray], jnp.ndarray]

    def __call__(self, t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        x0, ldj = self.flow(t, x, reverse=True)
        return self.log_prob_0(x0) + ldj


def build_realnvp(
    log_prob_0: Callable,
    dim: int,
    embed_time_dim: int = 10,
    couple_mul: int = 4,
    mask_type: str = "loop",
    activation: str = "celu",
    soft_init: float = 1.0,
) -> TimeConditionedLogDensity:
    """(Parity: create_normalizing_flow_fn, log_density_estimation.py:103-114.)"""
    flow = MaskedNormalizingFlow(
        dim=dim,
        couple_mul=couple_mul,
        mask_type=mask_type,
        soft_init=soft_init,
        ignore_time=False,
        activation=activation,
        embed_time_dim=embed_time_dim,
    )
    return TimeConditionedLogDensity(flow=flow, log_prob_0=log_prob_0)
