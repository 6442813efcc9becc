"""Fused per-point {grad V, v^T Hess V v} provider for weak-form losses.

`grad_and_quadform(module, params, x, v)` returns exactly what the kinetic
Fokker-Planck loss consumes per path sample —

    nabla[i] = grad V(x_i)          [n, d]
    quad[i]  = v_i^T Hess V(x_i) v_i  [n]

— differentiable w.r.t. ``params``, with the layer-stack propagation fused
into one VMEM-resident Pallas pass (ops/pallas/pointwise_kernel.py) instead
of XLA staging every intermediate of the forward-over-reverse sweep through
HBM.  The production np step is HBM-bandwidth-bound on exactly that staging
(docs/ROOFLINE.md §3), so this is a direct step-time lever.

Decomposition (mirrors losses/pairwise_blockwise.py):

* the first linear stage — plain rows W0y plus the Fourier rows W0c/W0s on
  [cos(xB), sin(xB)] — is evaluated outside as per-point streams
  (z1, d_v z1, d_v^2 z1) at the first-layer preactivation;
* the kernel propagates second-order streams through the remaining stack
  and returns {quad, delta = dV/dz1};
* nabla is recovered outside via the front-end Jacobian:
  nabla = delta @ W0y^T + [(delta @ W0c^T)(-sin p) + (delta @ W0s^T)(cos p)] @ B^T;
* the PSD-quadratic skip head is exact closed form outside.

Gradients w.r.t. the first-layer/Fourier/head parameters flow through the
outside jnp expressions; gradients w.r.t. the mid-stack weights come from
the backward kernel via ``jax.custom_vjp`` (the delta cotangent enters as
one more tangent direction).  Equality with the autodiff path
(`ops/autodiff.batched_grad_and_hvp_quadform`) is gated by
tests/test_fused_pointwise.py.

Reference analogue: none — the reference pays separate nested autodiff
calls per loss term (…/kinetic_fokker_planck.py:24-58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pde_inverse_tpu.losses.pairwise_blockwise import (
    _act_d012,
    _mlp_structure,
    _on_tpu,
)


def active(mode: str) -> bool:
    """Whether the fused provider should replace the autodiff path for the
    given config mode: 'auto' engages only on TPU (keeping CPU tests on the
    battle-tested autodiff formulation bit-for-bit), explicit modes always
    engage."""
    return mode in ("on", "fwd", "xla") or (mode == "auto" and _on_tpu())


def supported(module) -> bool:
    """PotentialMLP stacks (any Fourier front end / quadratic head) with an
    activation the kernel's hand-fused derivative tables cover."""
    from pde_inverse_tpu.models.mlp import PotentialMLP
    from pde_inverse_tpu.ops.pallas import pointwise_kernel as pk

    return isinstance(module, PotentialMLP) and pk.supported_activation(
        module.activation
    )


def _streams(module, params, x, v):
    """First-layer preactivation streams (z1, d_v z1, d_v^2 z1) plus the
    projection context for recovering nabla from delta."""
    layers, B, quad_head, act, dtype = _mlp_structure(module, params)
    (W0, b0), mids = layers[0], layers[1:]
    d = x.shape[-1]
    cd = lambda a: a.astype(dtype)
    W0y = cd(W0[:d])
    xc, vc = cd(x), cd(v)
    z1 = xc @ W0y + cd(b0)
    dz1 = vc @ W0y
    d2z1 = jnp.zeros_like(z1)
    trig = None
    if B is not None:
        nf = B.shape[1]
        W0c, W0s = cd(W0[d : d + nf]), cd(W0[d + nf :])
        Bc = cd(B)
        p = xc @ Bc
        dp = vc @ Bc
        cosp, sinp = jnp.cos(p), jnp.sin(p)
        dp2 = dp * dp
        z1 = z1 + cosp @ W0c + sinp @ W0s
        dz1 = dz1 + (-sinp * dp) @ W0c + (cosp * dp) @ W0s
        d2z1 = d2z1 + (-cosp * dp2) @ W0c + (-sinp * dp2) @ W0s
        trig = (cosp, sinp, W0c, W0s, Bc)
    return mids, act, dtype, z1, dz1, d2z1, trig, quad_head, W0y


def _sums_jnp(mids, act, dtype, z1, dz1, d2z1):
    """jnp mirror of the kernel math: second-order stream propagation +
    reverse sweep to delta.  Used as the 'xla' mode, the 'fwd'-mode VJP,
    and the equality-test reference."""
    cd = lambda a: a.astype(dtype)
    z, dz, d2z = cd(z1), cd(dz1), cd(d2z1)
    preacts = []
    for W, b in mids:
        preacts.append(z)
        a, da, d2a = _act_d012(act, z)
        h, dh = a, da * dz
        d2h = d2a * dz * dz + da * d2z
        W = cd(W)
        z = h @ W + cd(b)
        dz = dh @ W
        d2z = d2h @ W
    zf = z.astype(jnp.float32)
    quad = 2.0 * jnp.sum(
        dz.astype(jnp.float32) ** 2 + zf * d2z.astype(jnp.float32), axis=-1
    )
    delta = (2.0 * zf).astype(dtype)
    for (W, b), zk in zip(reversed(mids), reversed(preacts)):
        _, da, _ = _act_d012(act, zk)
        delta = (delta @ cd(W).T) * da
    return {"quad": quad, "delta": delta.astype(jnp.float32)}


def _sums_pallas(module, mids, dtype, z1, dz1, d2z1, mode):
    """Kernel-backed sums behind a custom_vjp: forward = fused tile kernel;
    backward = the 4-stream backward kernel ('on'/'auto') or jax.vjp of the
    jnp mirror ('fwd')."""
    from pde_inverse_tpu.ops.pallas import pointwise_kernel as pk

    act_name = module.activation

    def impl(mids_l, z1_l, dz1_l, d2z1_l):
        return pk.mlp_grad_quad(
            mids_l,
            act_name,
            z1_l.astype(dtype),
            dz1_l.astype(dtype),
            d2z1_l.astype(dtype),
            compute_dtype=dtype,
        )

    f = jax.custom_vjp(impl)

    def _fwd(mids_l, z1_l, dz1_l, d2z1_l):
        primals = (mids_l, z1_l, dz1_l, d2z1_l)
        return impl(*primals), primals

    def _bwd_kernel(primals, g):
        mids_l, z1_l, dz1_l, d2z1_l = primals
        mids_bar, z1_bar, dz1_bar, d2z1_bar = pk.mlp_grad_quad_bwd(
            mids_l,
            act_name,
            z1_l.astype(dtype),
            dz1_l.astype(dtype),
            d2z1_l.astype(dtype),
            g["quad"],
            g["delta"],
            compute_dtype=dtype,
        )
        return mids_bar, z1_bar, dz1_bar, d2z1_bar

    def _bwd_jnp(primals, g):
        from pde_inverse_tpu.models.mlp import _ACTIVATIONS

        act = _ACTIVATIONS[act_name]
        _, vjp = jax.vjp(
            lambda m, a, b, c: _sums_jnp(m, act, dtype, a, b, c), *primals
        )
        return vjp(g)

    f.defvjp(_fwd, _bwd_jnp if mode == "fwd" else _bwd_kernel)
    return f(mids, z1, dz1, d2z1)


def grad_and_quadform(
    module,
    params,
    x: jnp.ndarray,
    v: jnp.ndarray,
    mode: str = "auto",
    mesh_spec=None,
):
    """(nabla V [n, d], v^T Hess V v [n]) for a PotentialMLP, fused.

    mode: 'auto' (Pallas kernels on TPU, jnp streams elsewhere), 'on'
    (force both kernels), 'fwd' (forward kernel, jnp-mirror VJP), 'xla'
    (jnp stream formulation, no Pallas).  Callers gate 'off' themselves by
    not calling this provider.
    """
    mids, act, dtype, z1, dz1, d2z1, trig, quad_head, W0y = _streams(
        module, params, x, v
    )
    use_pallas = mode in ("on", "fwd") or (mode == "auto" and _on_tpu())

    def sums_fn(mids_l, z1_l, dz1_l, d2z1_l):
        if use_pallas:
            return _sums_pallas(
                module, mids_l, dtype, z1_l, dz1_l, d2z1_l, mode
            )
        return _sums_jnp(mids_l, act, dtype, z1_l, dz1_l, d2z1_l)

    n = z1.shape[0]
    if (
        mesh_spec is not None
        and mesh_spec.n_data > 1
        and n % mesh_spec.n_data == 0
    ):
        from jax.sharding import PartitionSpec as P

        sums = jax.shard_map(
            sums_fn,
            mesh=mesh_spec.mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )(mids, z1, dz1, d2z1)
    else:
        sums = sums_fn(mids, z1, dz1, d2z1)

    delta = sums["delta"].astype(jnp.float32)  # [n, w0]
    nabla = delta @ W0y.astype(jnp.float32).T
    if trig is not None:
        cosp, sinp, W0c, W0s, Bc = trig
        dproj = (delta @ W0c.astype(jnp.float32).T) * (-sinp) + (
            delta @ W0s.astype(jnp.float32).T
        ) * cosp
        nabla = nabla + dproj.astype(jnp.float32) @ Bc.astype(jnp.float32).T
    quad = sums["quad"]
    if quad_head is not None:
        A = quad_head[0].astype(jnp.float32)
        b = quad_head[1].astype(jnp.float32)
        xf = x.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        nabla = nabla + (xf @ A.T) @ A + b
        Av = vf @ A.T
        quad = quad + jnp.sum(Av * Av, axis=-1)
    return nabla, quad
