"""Pallas TPU kernel for the blockwise pairwise mean-field reduction.

The jnp blockwise formulation (losses/pairwise_blockwise.py) already gives
the pairwise MLP reduction MXU shape, but XLA stages each [rows, w] layer
intermediate through HBM between matmuls, capping throughput at the
bandwidth roofline (~w/8 flops/byte).  This kernel fuses the WHOLE tile
chain — first-layer outer difference, second-order forward propagation,
squared-feature head, and the backward sweep to the first-layer cotangent —
into one VMEM-resident program per (stamp, point-block, ref-block) grid
cell, so each pair tile touches HBM exactly once for its inputs and the
accumulators.  This is SURVEY §7's Pallas candidate #2 ("blockwise KMV
pairwise reduction"); the reference triple-vmaps the full [m, n, t, d]
tensor (kinetic_mckean_vlasov.py:22-48).

Scope: plain PotentialMLP stacks (no Fourier front end — that path keeps
the jnp formulation; the quadratic head is exact sufficient statistics
outside either kernel).  Gradients w.r.t. parameters come from a
``jax.custom_vjp`` in pairwise_blockwise.py whose backward runs the jnp
path's VJP, so the kernel itself only ever runs the forward reduction.

Accumulation layout: outputs {value [nt, n], hess [nt, n],
s_dz0 [nt, n, w0]} revisit the same (stamp, point) block across the
ref-block grid axis (innermost), initialized at j == 0 — the standard
Pallas reduction pattern.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# activation -> (act, act', act'') on a traced array, hand-fused (the jnp
# path derives these with jvp; inside the kernel we keep them explicit)
def _tanh_d012(z):
    a = jnp.tanh(z)
    d1 = 1.0 - a * a
    return a, d1, -2.0 * a * d1


def _silu_d012(z):
    s = jax.nn.sigmoid(z)
    ds = s * (1.0 - s)
    return z * s, s + z * ds, 2.0 * ds + z * ds * (1.0 - 2.0 * s)


def _softplus_d012(z):
    s = jax.nn.sigmoid(z)
    return jax.nn.softplus(z), s, s * (1.0 - s)


_ACT_D012 = {"tanh": _tanh_d012, "silu": _silu_d012, "softplus": _softplus_d012}


def supported_activation(name: str) -> bool:
    return name in _ACT_D012


def _dot(a, b):
    """[..., k] @ [k, w] with f32 accumulation on the MXU."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_t(a, b):
    """[..., w] @ [k, w]^T with f32 accumulation on the MXU."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(n_mid: int, act_name: str, compute_dtype, *refs):
    """Kernel body.  refs layout:
    [ax, av, ar, mask, W_1, b_1, ..., W_L, b_L, out_val, out_hess, out_dz0]
    with ax/av [1, bi, w0]; ar [1, bj, w0]; mask [1, bj]; weights full.
    """
    act = _ACT_D012[act_name]
    ax_ref, av_ref, ar_ref, mask_ref = refs[:4]
    w_refs = refs[4 : 4 + 2 * n_mid]
    val_ref, hess_ref, dz0_ref = refs[4 + 2 * n_mid :]
    j = pl.program_id(2)
    cd = lambda t: t.astype(compute_dtype)

    axb = ax_ref[0]  # [bi, w0]
    avb = av_ref[0]
    arb = ar_ref[0]  # [bj, w0]
    mk = mask_ref[0]  # [bj] f32
    bi, w0 = axb.shape
    bj = arb.shape[0]

    # first-layer outer difference + tangent streams, [bj, bi, w0]
    z = cd(axb)[None, :, :] - cd(arb)[:, None, :]
    dz = jnp.broadcast_to(cd(avb)[None, :, :], (bj, bi, w0))
    d2z = None  # exactly zero at the first layer (linear in y)

    preacts = []
    for k in range(n_mid):
        W = cd(w_refs[2 * k][...])
        b = cd(w_refs[2 * k + 1][...])
        preacts.append(z)
        a, d1, d2 = act(z)
        h, dh = a, d1 * dz
        d2h = d2 * dz * dz if d2z is None else d2 * dz * dz + d1 * d2z
        z = (_dot(h, W) + b).astype(compute_dtype)
        dz = _dot(dh, W).astype(compute_dtype)
        d2z = _dot(d2h, W).astype(compute_dtype)

    # squared-feature head (f32 reductions)
    zf = z.astype(jnp.float32)
    dzf = dz.astype(jnp.float32)
    d2zf = (jnp.zeros_like(zf) if d2z is None else d2z).astype(jnp.float32)
    f = jnp.sum(zf * zf, axis=-1)  # [bj, bi]
    d2f = 2.0 * jnp.sum(dzf * dzf + zf * d2zf, axis=-1)

    # backward sweep to the first-layer cotangent
    delta = (2.0 * zf).astype(compute_dtype)
    for k in reversed(range(n_mid)):
        W = cd(w_refs[2 * k][...])
        _, d1, _ = act(preacts[k])
        delta = (_dot_t(delta, W) * d1).astype(compute_dtype)

    # masked sums over the ref-block axis
    val_c = jnp.sum(mk[:, None] * f, axis=0)  # [bi]
    hess_c = jnp.sum(mk[:, None] * d2f, axis=0)
    dz0_c = jnp.sum(
        mk[:, None, None] * delta.astype(jnp.float32), axis=0
    )  # [bi, w0]

    @pl.when(j == 0)
    def _():
        val_ref[0] = val_c
        hess_ref[0] = hess_c
        dz0_ref[0] = dz0_c

    @pl.when(j > 0)
    def _():
        val_ref[0] += val_c
        hess_ref[0] += hess_c
        dz0_ref[0] += dz0_c


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Test hook: force interpreter mode globally (CPU equality gates).
_INTERPRET = False


def mlp_pairwise_sums(
    mids: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    act_name: str,
    ax: jnp.ndarray,
    av: jnp.ndarray,
    ar: jnp.ndarray,
    mask: jnp.ndarray,
    compute_dtype=jnp.float32,
    block_i: int = 256,
    block_j: int = 8,
    interpret: bool = False,
):
    """Masked pairwise sums over the per-stamp ref axis.

    mids: [(W_k [w_{k-1}, w_k], b_k)] hidden + feature layers (everything
    AFTER the first linear stage, whose per-point projections are
    precomputed); ax, av: [nt, n, w0] first-layer projections of
    points/velocities (ax includes the bias); ar: [nt, m, w0] ref
    projections; mask: [m] validity (f32/bool).

    Returns {"value" [nt, n], "hess" [nt, n], "s_dz0" [nt, n, w0]}:
        value[t, i]  = sum_j mask_j * Phi(y_ijt)
        hess[t, i]   = sum_j mask_j * v_i^T Hess Phi(y_ijt) v_i
        s_dz0[t, i]  = sum_j mask_j * dPhi/dz0(y_ijt)   (first-layer
                       cotangent; project with W0y^T/B^T outside)
    """
    nt, n, w0 = ax.shape
    m = ar.shape[1]
    n_mid = len(mids)

    bi = min(block_i, _round_up(n, 8))
    bj = min(block_j, m)
    n_pad = _round_up(n, bi)
    m_pad = _round_up(m, bj)
    mask = mask.astype(jnp.float32)
    if n_pad != n:
        ax = jnp.pad(ax, ((0, 0), (0, n_pad - n), (0, 0)))
        av = jnp.pad(av, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        ar = jnp.pad(ar, ((0, 0), (0, m_pad - m), (0, 0)))
        mask = jnp.pad(mask, (0, m_pad - m))
    mask2 = mask[None, :]  # [1, m_pad]

    grid = (nt, n_pad // bi, m_pad // bj)

    in_specs = [
        pl.BlockSpec((1, bi, w0), lambda t, i, j: (t, i, 0)),
        pl.BlockSpec((1, bi, w0), lambda t, i, j: (t, i, 0)),
        pl.BlockSpec((1, bj, w0), lambda t, i, j: (t, j, 0)),
        pl.BlockSpec((1, bj), lambda t, i, j: (0, j)),
    ]
    args = [ax, av, ar, mask2]
    for W, b in mids:
        in_specs.append(pl.BlockSpec(W.shape, lambda t, i, j: (0, 0)))
        args.append(W)
        in_specs.append(pl.BlockSpec((b.shape[0],), lambda t, i, j: (0,)))
        args.append(b)

    out_shape = [
        jax.ShapeDtypeStruct((nt, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((nt, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((nt, n_pad, w0), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, bi), lambda t, i, j: (t, i)),
        pl.BlockSpec((1, bi), lambda t, i, j: (t, i)),
        pl.BlockSpec((1, bi, w0), lambda t, i, j: (t, i, 0)),
    ]

    flops_tile = 2 * bi * bj * sum(
        3 * W.shape[0] * W.shape[1] + 2 * W.shape[0] * W.shape[1]
        for W, _ in mids
    )
    val, hess, s_dz0 = pl.pallas_call(
        functools.partial(_kernel, n_mid, act_name, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * grid[0] * grid[1] * grid[2],
            bytes_accessed=(ax.size + av.size + ar.size) * 4,
            transcendentals=bi * bj * sum(W.shape[1] for W, _ in mids),
        ),
        interpret=interpret or _INTERPRET,
    )(*args)
    return {
        "value": val[:, :n],
        "hess": hess[:, :n],
        "s_dz0": s_dz0[:, :n],
    }
