"""Data iterator helpers.

Parity: /root/reference/utils/data_utils.py (infinite jitted generator
zipping time and space samples — declared but unused there; functional
here) and utils/logging_utils.py (CSV/JSON savers — covered by
training.metrics writers plus save_config below).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import jax
import jax.numpy as jnp


def infinite_batches(
    rng: jax.Array,
    distribution_time,
    distribution_space,
    batch_size: int,
) -> Iterator[dict]:
    """Infinite stream of {"time": [n], "space": [n, d]} batches, one jitted
    sampler reused across iterations."""

    @jax.jit
    def sample(key):
        kt, kx = jax.random.split(key)
        return {
            "time": distribution_time.sample(batch_size, kt),
            "space": distribution_space.sample(batch_size, kx),
        }

    while True:
        rng, key = jax.random.split(rng)
        yield sample(key)


def save_config(cfg, run_dir: str, filename: str = "config.json") -> str:
    """Persist the resolved config next to the metrics (reference
    logging_utils.save_config, with the dataclass serialized)."""
    from pde_inverse_tpu.config import to_dict

    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, filename)
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2)
    return path
