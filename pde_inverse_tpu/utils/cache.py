"""Persistent XLA compilation cache.

On the tunneled TPU backend, first-compile of scan-heavy programs (the
Langevin simulator, fused train chunks) can take minutes; the persistent
cache cuts repeat runs ~5x (measured).  Called by every entry point
(main / bench / __graft_entry__); opt out with PDE_INVERSE_TPU_NO_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("PDE_INVERSE_TPU_NO_CACHE") == "1":
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "PDE_INVERSE_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "pde_inverse_tpu_xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
