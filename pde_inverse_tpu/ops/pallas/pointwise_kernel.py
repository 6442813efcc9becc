"""Pallas TPU kernel for the fused per-point {grad, Hessian-quadform} pass.

The kinetic weak-form loss (losses/kinetic_fokker_planck.py) needs, at every
path sample x with velocity v:

    nabla V(x)            (for  E||grad V||^2,  E[grad V . v],  the gap)
    v^T Hess V(x) v       (for  E[v^T Hess V v])

plus the parameter gradient of their batch means.  The XLA formulation
(`ops/autodiff.batched_grad_and_hvp_quadform` + `jax.grad`) stages every
layer intermediate of the forward-over-reverse sweep through HBM — at the
production np geometry (2M path states, 64->64->256 tanh stack) that is
~1.7e11 bytes/step, which IS the step time at the 819 GB/s HBM roof
(docs/ROOFLINE.md §3).  This kernel keeps the whole per-tile stream chain in
VMEM: HBM traffic drops to the first-layer stream inputs and the two
per-point outputs, moving the step off the bandwidth roof.

Division of labour (mirrors ops/pallas/pairwise_kernel.py): the first
linear stage — including the Fourier feature front end — is evaluated
OUTSIDE as per-point stream projections (z1, d_v z1, d_v^2 z1) at the
first-layer preactivation level, and the kernel propagates second-order
forward streams through the remaining stack (`mids`), returning the
Hessian quadform and the first-layer cotangent delta = dV/dz1; the caller
projects delta back through the (Fourier-) Jacobian to get nabla V.  The
quadratic skip head is exact closed form outside.

The backward kernel reuses the pairwise identity: the upstream cotangent of
delta acts as one more first-order tangent direction r0 = g_delta at the z1
level, so the whole VJP is a 4-stream forward pass + one reverse sweep with
in-kernel weight-gradient accumulation.

Reference analogue: none — the reference evaluates grad and Hessian
quadforms with separate nested autodiff calls per term
(/root/reference/methods/consistency_instances/kinetic_fokker_planck.py:24-58).
Equality with the autodiff path is gated by tests/test_fused_pointwise.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pde_inverse_tpu.ops.pallas.pairwise_kernel import (
    _ACT_D012,
    _ACT_D0123,
    _dot,
    _dot_t,
    _round_up,
    supported_activation,
)

__all__ = [
    "supported_activation",
    "mlp_grad_quad",
    "mlp_grad_quad_bwd",
]


# Test hook: force interpreter mode globally (CPU equality gates).
_INTERPRET = False


def _fwd_kernel(n_mid: int, act_name: str, compute_dtype, *refs):
    """refs layout: [z1, dz1, d2z1, W_1, b_1, ..., W_L, b_L,
    out_quad, out_delta] with z1/dz1/d2z1 blocks [bi, w0]; weights full;
    out_quad [1, bi]; out_delta [bi, w0].  Grid is 1-D over point blocks —
    every output block is written exactly once (no revisits)."""
    act = _ACT_D012[act_name]
    z1_ref, dz1_ref, d2z1_ref = refs[:3]
    w_refs = refs[3 : 3 + 2 * n_mid]
    quad_ref, delta_ref = refs[3 + 2 * n_mid :]
    cd = lambda t: t.astype(compute_dtype)

    z = cd(z1_ref[...])
    dz = cd(dz1_ref[...])
    d2z = cd(d2z1_ref[...])
    bi = z.shape[0]

    preacts = []
    for k in range(n_mid):
        W = cd(w_refs[2 * k][...])
        b = cd(w_refs[2 * k + 1][...])  # [1, w] broadcast row
        preacts.append(z)
        a, d1, d2 = act(z)
        h, dh = a, d1 * dz
        d2h = d2 * dz * dz + d1 * d2z
        z = (_dot(h, W) + b).astype(compute_dtype)
        dz = _dot(dh, W).astype(compute_dtype)
        d2z = _dot(d2h, W).astype(compute_dtype)

    # squared-feature head: V = sum z_L^2, so
    # v^T Hess V v = 2 sum(dz_L^2 + z_L * d2z_L)   (f32 reduction)
    zf = z.astype(jnp.float32)
    dzf = dz.astype(jnp.float32)
    d2zf = d2z.astype(jnp.float32)
    quad = 2.0 * jnp.sum(dzf * dzf + zf * d2zf, axis=-1)  # [bi]

    # reverse sweep to delta = dV/dz1 (first-layer preact cotangent)
    delta = (2.0 * zf).astype(compute_dtype)
    for k in reversed(range(n_mid)):
        W = cd(w_refs[2 * k][...])
        _, d1, _ = act(preacts[k])
        delta = (_dot_t(delta, W) * d1).astype(compute_dtype)

    quad_ref[0] = quad
    delta_ref[...] = delta.astype(jnp.float32)


def mlp_grad_quad(
    mids: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    act_name: str,
    z1: jnp.ndarray,
    dz1: jnp.ndarray,
    d2z1: jnp.ndarray,
    compute_dtype=jnp.float32,
    block_i: int = 512,
    interpret: bool = False,
):
    """Fused per-point streams through the post-first-layer MLP stack.

    mids: [(W_k [w_{k-1}, w_k], b_k [w_k])] — hidden + feature layers after
    the first linear stage; z1/dz1/d2z1: [n, w0] first-layer preactivation
    and its 1st/2nd directional tangents along the per-point velocity
    (Fourier front end folded in by the caller).

    Returns {"quad" [n], "delta" [n, w0]} with
        quad[i]  = v_i^T Hess V(x_i) v_i      (squared-feature head only)
        delta[i] = dV/dz1(x_i)                (project with W0^T outside)
    """
    n, w0 = z1.shape
    n_mid = len(mids)
    bi = min(block_i, _round_up(n, 8))
    n_pad = _round_up(n, bi)
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        z1 = jnp.pad(z1, pad)
        dz1 = jnp.pad(dz1, pad)
        d2z1 = jnp.pad(d2z1, pad)

    grid = (n_pad // bi,)
    in_specs = [
        pl.BlockSpec((bi, w0), lambda i: (i, 0)),
        pl.BlockSpec((bi, w0), lambda i: (i, 0)),
        pl.BlockSpec((bi, w0), lambda i: (i, 0)),
    ]
    args = [z1, dz1, d2z1]
    for W, b in mids:
        in_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0)))
        args.append(W)
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0)))
        args.append(b.reshape(1, -1))

    out_shape = [
        jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, w0), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, bi), lambda i: (0, i)),
        pl.BlockSpec((bi, w0), lambda i: (i, 0)),
    ]

    flops_tile = 2 * bi * sum(
        6 * W.shape[0] * W.shape[1] + 2 * W.shape[0] * W.shape[1]
        for W, _ in mids
    )
    quad, delta = pl.pallas_call(
        functools.partial(_fwd_kernel, n_mid, act_name, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * grid[0],
            bytes_accessed=(z1.size * 3 + n_pad * (w0 + 1)) * 4,
            transcendentals=bi * grid[0] * sum(W.shape[1] for W, _ in mids),
        ),
        interpret=interpret or _INTERPRET,
    )(*args)
    return {"quad": quad[0, :n], "delta": delta[:n]}


def _bwd_kernel(n_mid: int, act_name: str, compute_dtype, *refs):
    """VJP of the fused streams w.r.t. (mids, z1, dz1, d2z1) given upstream
    cotangents (g_quad, g_delta).  Per-point scalar

        S = g_quad * (v^T Hess V v) + <g_delta, dV/dz1>

    via 4 forward streams (z, p = d_v z, q = d_v^2 z, r = d_g z with
    r0 = g_delta) and one reverse sweep accumulating weight gradients in
    grid-constant output blocks (init at the first grid cell).

    refs layout: [z1, dz1, d2z1, gquad, gdelta, W_1, b_1, ..., W_L, b_L,
                  out_Wbar_1, out_bbar_1, ..., out_z1bar, out_dz1bar,
                  out_d2z1bar]
    """
    act3 = _ACT_D0123[act_name]
    z1_ref, dz1_ref, d2z1_ref, gquad_ref, gdelta_ref = refs[:5]
    w_refs = refs[5 : 5 + 2 * n_mid]
    grad_refs = refs[5 + 2 * n_mid : 5 + 4 * n_mid]
    z1bar_ref, dz1bar_ref, d2z1bar_ref = refs[5 + 4 * n_mid :]
    i = pl.program_id(0)
    cd = lambda a: a.astype(compute_dtype)

    z = cd(z1_ref[...])
    p = cd(dz1_ref[...])
    q = cd(d2z1_ref[...])
    r = cd(gdelta_ref[...])
    gq = gquad_ref[...]  # [bi, 1] column — minor-dim broadcast below
    bi = z.shape[0]

    saved = []
    for k in range(n_mid):
        W = cd(w_refs[2 * k][...])
        b = cd(w_refs[2 * k + 1][...])
        saved.append((z, p, q, r))
        a0, a1, a2, _ = act3(z)
        h = a0
        hp = a1 * p
        hq = a2 * p * p + a1 * q
        hr = a1 * r
        z = (_dot(h, W) + b).astype(compute_dtype)
        p = _dot(hp, W).astype(compute_dtype)
        q = _dot(hq, W).astype(compute_dtype)
        r = _dot(hr, W).astype(compute_dtype)

    # head cotangents of S = gq * 2 sum(p_L^2 + z_L q_L) + <2 z_L, r_L>
    zf = z.astype(jnp.float32)
    pf = p.astype(jnp.float32)
    qf = q.astype(jnp.float32)
    rf = r.astype(jnp.float32)
    zbar = 2.0 * gq * qf + 2.0 * rf
    pbar = 4.0 * gq * pf
    qbar = 2.0 * gq * zf
    rbar = 2.0 * zf

    zbar = zbar.astype(compute_dtype)
    pbar = pbar.astype(compute_dtype)
    qbar = qbar.astype(compute_dtype)
    rbar = rbar.astype(compute_dtype)
    for k in reversed(range(n_mid)):
        W = cd(w_refs[2 * k][...])
        zk, pk, qk, rk = saved[k]
        a0, a1, a2, a3 = act3(zk)
        h = a0
        hp = a1 * pk
        hq = a2 * pk * pk + a1 * qk
        hr = a1 * rk

        def wcon(lhs, rhs):  # [bi, win]^T @ [bi, wout] -> [win, wout], f32
            return jax.lax.dot_general(
                lhs, rhs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        wbar = (
            wcon(h, zbar) + wcon(hp, pbar) + wcon(hq, qbar) + wcon(hr, rbar)
        )
        bbar = jnp.sum(zbar.astype(jnp.float32), axis=0, keepdims=True)

        @pl.when(i == 0)
        def _(k=k, wbar=wbar, bbar=bbar):
            grad_refs[2 * k][...] = wbar
            grad_refs[2 * k + 1][...] = bbar

        @pl.when(i > 0)
        def _(k=k, wbar=wbar, bbar=bbar):
            grad_refs[2 * k][...] += wbar
            grad_refs[2 * k + 1][...] += bbar

        hbar = _dot_t(zbar, W)
        hpbar = _dot_t(pbar, W)
        hqbar = _dot_t(qbar, W)
        hrbar = _dot_t(rbar, W)
        zbar_new = (
            hbar * a1
            + hpbar * (a2 * pk)
            + hrbar * (a2 * rk)
            + hqbar * (a3 * pk * pk + a2 * qk)
        )
        pbar = (hpbar * a1 + hqbar * (2.0 * a2 * pk)).astype(compute_dtype)
        qbar = (hqbar * a1).astype(compute_dtype)
        rbar = (hrbar * a1).astype(compute_dtype)
        zbar = zbar_new.astype(compute_dtype)

    z1bar_ref[...] = zbar.astype(jnp.float32)
    dz1bar_ref[...] = pbar.astype(jnp.float32)
    d2z1bar_ref[...] = qbar.astype(jnp.float32)


def mlp_grad_quad_bwd(
    mids: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    act_name: str,
    z1: jnp.ndarray,
    dz1: jnp.ndarray,
    d2z1: jnp.ndarray,
    g_quad: jnp.ndarray,
    g_delta: jnp.ndarray,
    compute_dtype=jnp.float32,
    block_i: int = 512,
    interpret: bool = False,
):
    """VJP of ``mlp_grad_quad`` w.r.t. (mids, z1, dz1, d2z1).

    g_quad: [n]; g_delta: [n, w0].  Returns (mids_bar [(Wbar, bbar)...],
    z1_bar [n, w0], dz1_bar, d2z1_bar)."""
    n, w0 = z1.shape
    n_mid = len(mids)
    bi = min(block_i, _round_up(n, 8))
    n_pad = _round_up(n, bi)
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        z1 = jnp.pad(z1, pad)
        dz1 = jnp.pad(dz1, pad)
        d2z1 = jnp.pad(d2z1, pad)
        g_delta = jnp.pad(g_delta, pad)
        g_quad = jnp.pad(g_quad, (0, n_pad - n))
    gq2 = g_quad[:, None]  # [n_pad, 1] column

    grid = (n_pad // bi,)
    in_specs = [
        pl.BlockSpec((bi, w0), lambda i: (i, 0)),  # z1
        pl.BlockSpec((bi, w0), lambda i: (i, 0)),  # dz1
        pl.BlockSpec((bi, w0), lambda i: (i, 0)),  # d2z1
        pl.BlockSpec((bi, 1), lambda i: (i, 0)),  # g_quad
        pl.BlockSpec((bi, w0), lambda i: (i, 0)),  # g_delta
    ]
    args = [z1, dz1, d2z1, gq2, g_delta]
    for W, b in mids:
        in_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0)))
        args.append(W)
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0)))
        args.append(b.reshape(1, -1))

    out_shape = []
    out_specs = []
    for W, b in mids:  # weight grads: grid-constant accumulators
        out_shape.append(jax.ShapeDtypeStruct(W.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
        out_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0)))
    for _ in range(3):  # z1/dz1/d2z1 cotangents
        out_shape.append(jax.ShapeDtypeStruct((n_pad, w0), jnp.float32))
        out_specs.append(pl.BlockSpec((bi, w0), lambda i: (i, 0)))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_mid, act_name, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret or _INTERPRET,
    )(*args)

    mids_bar = [
        (outs[2 * k], outs[2 * k + 1].reshape(-1)) for k in range(n_mid)
    ]
    z1_bar = outs[2 * n_mid][:n]
    dz1_bar = outs[2 * n_mid + 1][:n]
    d2z1_bar = outs[2 * n_mid + 2][:n]
    return mids_bar, z1_bar, dz1_bar, d2z1_bar
