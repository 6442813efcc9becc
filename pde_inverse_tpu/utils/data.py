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


def save_array_store(path: str, arrays: dict) -> str:
    """Persist a dict of arrays as one raw little-endian .bin file per key
    plus a JSON manifest.

    Scale-robust replacement for whole-array ``np.savez`` (which a round-1
    review flagged: npz decompresses every array into anonymous host memory
    on load, so a >2 GB store OOMs the host).  Raw files re-open as
    ``np.memmap`` views whose pages are file-backed and evictable; the
    device transfer streams from the mapping without a full host copy.
    """
    import numpy as np

    os.makedirs(path, exist_ok=True)
    manifest = {}
    for key, value in arrays.items():
        arr = np.asarray(value)
        fname = f"{key}.bin"
        manifest[key] = {"shape": list(arr.shape), "dtype": str(arr.dtype)}
        # write through a memmap so the host never holds a second copy
        out = np.memmap(
            os.path.join(path, fname), dtype=arr.dtype, mode="w+", shape=arr.shape
        )
        out[...] = arr
        out.flush()
        del out
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return path


class ArrayStoreWriter:
    """Incremental writer for a ``save_array_store``-format directory.

    ``create(key, shape, dtype)`` returns a writable ``np.memmap`` to fill
    in shards; ``finalize()`` writes the manifest.  Lets dataset generation
    stream device-shard-sized pieces straight to disk, so stores far larger
    than host RAM or device HBM can be produced.
    """

    def __init__(self, path: str):
        import numpy as np

        self._np = np
        self.path = path
        self.manifest = {}
        os.makedirs(path, exist_ok=True)

    def create(self, key: str, shape, dtype):
        arr = self._np.memmap(
            os.path.join(self.path, f"{key}.bin"),
            dtype=self._np.dtype(dtype),
            mode="w+",
            shape=tuple(shape),
        )
        self.manifest[key] = {
            "shape": list(shape),
            "dtype": str(self._np.dtype(dtype)),
        }
        return arr

    def finalize(self) -> str:
        with open(os.path.join(self.path, "manifest.json"), "w") as f:
            json.dump(self.manifest, f, indent=2)
        return self.path


def load_array_store(path: str) -> dict:
    """Load a ``save_array_store`` directory as read-only ``np.memmap``
    views keyed like the original dict.  Host RSS stays bounded by the
    page cache regardless of store size."""
    import numpy as np

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    return {
        key: np.memmap(
            os.path.join(path, f"{key}.bin"),
            dtype=np.dtype(spec["dtype"]),
            mode="r",
            shape=tuple(spec["shape"]),
        )
        for key, spec in manifest.items()
    }


def save_config(cfg, run_dir: str, filename: str = "config.json") -> str:
    """Persist the resolved config next to the metrics (reference
    logging_utils.save_config, with the dataclass serialized)."""
    from pde_inverse_tpu.config import to_dict

    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, filename)
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2)
    return path
