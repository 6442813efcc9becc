"""Equality gates for the lane-packed (v2) Pallas pairwise KMV kernels.

Interpret-mode (CPU) checks of ops/pallas/pairwise_packed.py against
(a) the jnp blockwise tile machinery, (b) an independent jnp
re-implementation of the collapsed-head composition for the backward VJP,
and (c) the full KMV loss + 2-D mesh plumbing through
``pallas_mode="packed"``.  No PRNG inside the kernels, so interpret mode is
exact (same caveat split as tests/test_pallas_pairwise.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_inverse_tpu.losses import pairwise_blockwise as bw
from pde_inverse_tpu.models.mlp import PotentialMLP, _ACTIVATIONS
from pde_inverse_tpu.ops.pallas import pairwise_packed as pp

from tests.test_pallas_pairwise import _setup, _kernel_inputs, _jnp_reference


@pytest.fixture(autouse=True)
def _true_f32_matmuls():
    """Pin every default-precision dot to full-f32 passes for these gates.

    On the TPU backend (the on-chip gate run, PDE_INVERSE_TPU_TEST_TPU=1)
    default-precision f32 dots run single bf16 passes, and the packed
    path intentionally differs from the jnp reference in WHERE precision
    is raised (its head dots are HIGHEST; M = W_F W_F^T is built at
    HIGHEST) — so at default precision the two sides carry ~1e-3-class
    INDEPENDENT bf16 noise and the tight equality tolerances here fail
    on chip while passing on CPU (round-5 gate run; see
    scripts/probe_packed_truth.py for the noise measurement).  Under
    "highest" both sides are f32-accurate on every backend and the
    tolerances test ALGEBRA, which is what these gates are for."""
    with jax.default_matmul_precision("highest"):
        yield


def _collapse(mids):
    """(mids_m, M, u, c) of the squared-feature head collapse."""
    mids_m, (WF, bF) = list(mids[:-1]), mids[-1]
    return mids_m, WF @ WF.T, 2.0 * (WF @ bF), bF @ bF


class TestPackedForward:
    @pytest.mark.parametrize("act", ["tanh", "silu"])
    @pytest.mark.parametrize("hidden", [(16,), (16, 16), (8, 8, 8)])
    def test_matches_jnp_tiles(self, act, hidden):
        rng = jax.random.PRNGKey(3)
        net, params, x, v, refs = _setup(rng, act=act, hidden=hidden)
        mids, ax, av, ar = _kernel_inputs(net, params, x, v, refs)
        mids_m, M, u, c = _collapse(mids)
        mask = jnp.ones((refs.shape[0],))
        out = pp.mlp_pairwise_sums_packed(
            mids_m, M, u, act, ax, av, ar, mask,
            block_i=8, block_j=4, interpret=True,
        )
        ref = _jnp_reference(net, params, x, v, refs, mask)
        got_value = out["value"] + c * jnp.sum(mask)
        np.testing.assert_allclose(
            np.asarray(got_value), np.asarray(ref["value"]),
            rtol=2e-4, atol=1e-4,
        )
        for k in ("hess", "s_dz0"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), rtol=2e-4, atol=1e-4,
                err_msg=k,
            )

    def test_mask_and_padding(self):
        rng = jax.random.PRNGKey(5)
        net, params, x, v, refs = _setup(rng, n=10, m=7)
        mids, ax, av, ar = _kernel_inputs(net, params, x, v, refs)
        mids_m, M, u, c = _collapse(mids)
        mask = jnp.asarray([1, 1, 0, 1, 0, 1, 1], jnp.float32)
        out = pp.mlp_pairwise_sums_packed(
            mids_m, M, u, "tanh", ax, av, ar, mask,
            block_i=8, block_j=4, interpret=True,
        )
        ref = _jnp_reference(net, params, x, v, refs, mask)
        np.testing.assert_allclose(
            np.asarray(out["value"] + c * jnp.sum(mask)),
            np.asarray(ref["value"]), rtol=2e-4, atol=1e-4,
        )
        for k in ("hess", "s_dz0"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), rtol=2e-4, atol=1e-4,
                err_msg=k,
            )


def _jnp_packed_composition(act_fn, mids_m, M, u, ax, av, ar, mask):
    """Independent jnp reference of EXACTLY the packed kernels' composition:
    sums over masked pairs of {Phi, v^T Hess Phi v, dPhi/dz0} with the
    collapsed head Phi = g.(M g) + u.g (no c term)."""
    nt, n, w0 = ax.shape
    m = ar.shape[1]
    # [nt, m, n, w0] pair streams, flattened
    z = (ax[:, None, :, :] - ar[:, :, None, :]).reshape(-1, w0)
    dz = jnp.broadcast_to(av[:, None, :, :], (nt, m, n, w0)).reshape(-1, w0)
    d2z = jnp.zeros_like(z)
    preacts = []
    for W, b in mids_m:
        preacts.append(z)
        a, da, d2a = bw._act_d012(act_fn, z)
        h, dh = a, da * dz
        d2h = d2a * dz * dz + da * d2z
        z, dz, d2z = h @ W + b, dh @ W, d2h @ W
    a, da, d2a = bw._act_d012(act_fn, z)
    g, dg = a, da * dz
    d2g = d2a * dz * dz + da * d2z
    Mg = g @ M
    phi = jnp.sum(g * Mg + g * u, axis=-1)
    d2phi = jnp.sum(2.0 * dg * (dg @ M) + 2.0 * d2g * Mg + d2g * u, axis=-1)
    delta = (2.0 * Mg + u) * da  # head-level act' gate
    for (W, b), zk in zip(reversed(mids_m), reversed(preacts)):
        _, da_k, _ = bw._act_d012(act_fn, zk)
        delta = (delta @ W.T) * da_k
    # mask-weighted sums over the ref axis
    wm = jnp.broadcast_to(
        mask[None, :, None], (nt, m, n)
    ).reshape(-1)
    value = jnp.sum((wm * phi).reshape(nt, m, n), axis=1)
    hess = jnp.sum((wm * d2phi).reshape(nt, m, n), axis=1)
    s_dz0 = jnp.sum(
        (wm[:, None] * delta).reshape(nt, m, n, w0), axis=1
    )
    return {"value": value, "hess": hess, "s_dz0": s_dz0}


class TestPackedBackward:
    @pytest.mark.parametrize("act", ["tanh", "silu"])
    @pytest.mark.parametrize("hidden", [(16,), (16, 16), (8, 8, 8)])
    def test_backward_matches_jnp_vjp(self, act, hidden):
        """mlp_pairwise_sums_packed_bwd must equal jax.vjp of the
        independent jnp composition w.r.t. (mids_m, M, u, ax, av, ar) —
        including the collapsed-head M/u cotangents, mask, and ragged
        padding.  The delta through the head-level activation is part of
        the composition, so the third-derivative combos are exercised."""
        rng = jax.random.PRNGKey(13)
        net, params, x, v, refs = _setup(rng, n=10, m=7, act=act, hidden=hidden)
        mids, ax, av, ar = _kernel_inputs(net, params, x, v, refs)
        mids_m, M, u, _ = _collapse(mids)
        # symmetrize exactly (the kernel assumes M == M.T, true for W W^T)
        M = 0.5 * (M + M.T)
        mask = jnp.asarray([1, 1, 0, 1, 1, 0, 1], jnp.float32)
        act_fn = _ACTIVATIONS[act]

        def f(mids_m_, M_, u_, ax_, av_, ar_):
            return _jnp_packed_composition(
                act_fn, mids_m_, M_, u_, ax_, av_, ar_, mask
            )

        out, vjp = jax.vjp(f, mids_m, M, u, ax, av, ar)
        kg = jax.random.split(jax.random.PRNGKey(17), 3)
        g = {
            "value": jax.random.normal(kg[0], out["value"].shape),
            "hess": jax.random.normal(kg[1], out["hess"].shape),
            "s_dz0": jax.random.normal(kg[2], out["s_dz0"].shape),
        }
        want_mids, want_M, want_u, want_ax, want_av, want_ar = vjp(g)
        got_mids, got_M, got_u, got_ax, got_av, got_ar = (
            pp.mlp_pairwise_sums_packed_bwd(
                mids_m, M, u, act, ax, av, ar, mask,
                g["value"], g["hess"], g["s_dz0"],
                block_i=8, block_j=4, interpret=True,
            )
        )
        # the jnp vjp of the non-symmetric-general composition returns
        # d/dM of a.(M b) = a x b; the kernel's algebra uses M == M.T and
        # returns the symmetric-composition cotangent — both give the same
        # W_F/b_F grads through M = W W^T, and agree after symmetrization
        np.testing.assert_allclose(
            np.asarray(got_M + got_M.T),
            np.asarray(want_M + want_M.T),
            rtol=3e-4, atol=3e-4,
        )
        np.testing.assert_allclose(got_u, want_u, rtol=3e-4, atol=3e-4)
        for (gw, gb), (ww, wb) in zip(got_mids, want_mids):
            np.testing.assert_allclose(gw, ww, rtol=3e-4, atol=3e-4)
            np.testing.assert_allclose(gb, wb, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(got_ax, want_ax, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(got_av, want_av, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(got_ar, want_ar, rtol=3e-4, atol=3e-4)


class TestPackedWrapper:
    def test_stats_and_param_grads_match_off(self):
        """mlp_pairwise_stats(pallas_mode='packed') must match the pure-jnp
        path in values AND parameter gradients (full chain incl. the
        differentiable M/u/c construction and first-layer projections)."""
        pp_interp = pytest.MonkeyPatch()
        pp_interp.setattr(pp, "_INTERPRET", True)
        try:
            rng = jax.random.PRNGKey(7)
            net, params, x, v, refs = _setup(rng, n=12, m=9, hidden=(16, 16))
            off = bw.mlp_pairwise_stats(net, params, x, v, refs, pallas_mode="off")
            packed = bw.mlp_pairwise_stats(
                net, params, x, v, refs, pallas_mode="packed"
            )
            for k in ("nabla", "hess", "value"):
                np.testing.assert_allclose(
                    np.asarray(packed[k]), np.asarray(off[k]),
                    rtol=2e-4, atol=1e-5, err_msg=k,
                )

            def scal(mode):
                def fn(p):
                    s = bw.mlp_pairwise_stats(
                        net, p, x, v, refs, pallas_mode=mode
                    )
                    return (
                        jnp.sum(jnp.sin(s["value"]))
                        + jnp.sum(s["nabla"] ** 2)
                        + jnp.sum(jnp.cos(s["hess"]))
                    )

                return jax.grad(fn)(params)

            g_off = scal("off")
            g_packed = scal("packed")
            for a, b in zip(
                jax.tree_util.tree_leaves(g_packed),
                jax.tree_util.tree_leaves(g_off),
            ):
                # rtol matches the v1 custom-vjp gate: the collapsed head
                # reassociates the feature contraction (M = W_F W_F^T), so
                # f32 sums differ at the accumulation-noise floor
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5
                )
        finally:
            pp_interp.undo()

    def test_full_kmv_loss_packed(self, monkeypatch):
        """Full KMV loss with pallas_mode='packed' (interpret) vs 'off' —
        values and parameter gradients, with the quadratic head active
        (exact statistics outside the kernel, unchanged)."""
        from pde_inverse_tpu.config import Config, apply_overrides
        from pde_inverse_tpu.losses import kinetic_mckean_vlasov as kmv_loss
        from pde_inverse_tpu.problems import KineticMcKeanVlasovQuadratic

        monkeypatch.setattr(pp, "_INTERPRET", True)
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
        out_pk = kmv_loss.value_and_grad_fn(
            net.apply, params, data, rng, inst, blockwise_module=net,
            pallas_mode="packed",
        )
        np.testing.assert_allclose(
            float(out_pk["loss"]), float(out_jnp["loss"]), rtol=2e-4
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(out_pk["grad"]),
            jax.tree_util.tree_leaves(out_jnp["grad"]),
        ):
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)

    @pytest.mark.skipif(
        len(jax.devices()) < 8,
        reason="needs the 8-virtual-device CPU mesh (conftest); the "
        "on-chip gate run has 1 device",
    )
    def test_packed_on_2d_mesh(self, monkeypatch):
        """Packed kernels + custom_vjp inside the (data, ref) shard_map."""
        from pde_inverse_tpu.config import BackendConfig
        from pde_inverse_tpu.parallel.mesh import build_mesh

        monkeypatch.setattr(pp, "_INTERPRET", True)
        rng = jax.random.PRNGKey(19)
        net, params, x, v, refs = _setup(rng, n=16, m=16)
        spec = build_mesh(BackendConfig(data_axis_size=2, ref_axis_size=4))
        local = bw.mlp_pairwise_stats(net, params, x, v, refs, pallas_mode="off")
        sharded = bw.mlp_pairwise_stats(
            net, params, x, v, refs, pallas_mode="packed", mesh_spec=spec
        )
        for k in ("nabla", "hess", "value"):
            np.testing.assert_allclose(
                np.asarray(sharded[k]), np.asarray(local[k]), rtol=1e-4,
                atol=1e-5, err_msg=k,
            )

    def test_packed_ok_gate(self):
        rng = jax.random.PRNGKey(3)
        net, params, *_ = _setup(rng, hidden=(16, 16))
        layers, *_ = bw._mlp_structure(net, params)
        assert bw.packed_ok(net, layers[1:])
        wide, wparams, *_ = _setup(rng, hidden=(64, 64))
        wlayers, *_ = bw._mlp_structure(wide, wparams)
        assert not bw.packed_ok(wide, wlayers[1:])


class TestSlotPackHelpers:
    """XLA-side slot movement (module policy: kernels never move slots).

    _pack_ref_rows must agree with the kernels' ref-major pair-row order
    (cell rows s*bj+jj -> lane group s), _unpack_ref_rows must invert it,
    and _pack_mask must expand the per-row validity bit to every lane of
    its slot."""

    def test_pack_unpack_roundtrip(self):
        rng = np.random.RandomState(0)
        p, bj, w, nt, nbj = 3, 4, 5, 2, 2
        a = jnp.asarray(rng.randn(nt, nbj * p * bj, w).astype(np.float32))
        packed = pp._pack_ref_rows(a, p, bj)
        assert packed.shape == (nt, nbj, bj, p * w)
        # slot s, row jj of cell c == original row c*(p*bj) + s*bj + jj
        for s in range(p):
            np.testing.assert_array_equal(
                np.asarray(packed[:, :, :, s * w : (s + 1) * w]),
                np.asarray(
                    a.reshape(nt, nbj, p, bj, w)[:, :, s]
                ),
            )
        back = pp._unpack_ref_rows(packed, p, bj, w)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(a))

    def test_pack_mask_lane_expansion(self):
        rng = np.random.RandomState(1)
        p, bj, w, nbj = 3, 4, 5, 2
        mask = jnp.asarray(
            (rng.rand(nbj * p * bj) > 0.4).astype(np.float32)
        )
        mp = pp._pack_mask(mask, p, bj, w)
        assert mp.shape == (nbj, bj, p * w)
        m3 = np.asarray(mask).reshape(nbj, p, bj)
        for s in range(p):
            want = np.broadcast_to(m3[:, s][:, :, None], (nbj, bj, w))
            np.testing.assert_array_equal(
                np.asarray(mp[:, :, s * w : (s + 1) * w]), want
            )
