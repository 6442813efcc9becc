"""Importing the package must never initialize a JAX backend.

Round-1 regression: a module-level ``jnp.log(2.0 * jnp.pi)`` in
``ops/gaussian.py`` initialized the backend at import time, which locked
in the wrong platform before ``dryrun_multichip`` could select CPU (the
driver's multichip contract failed on exactly this). This test imports
every package module in a clean subprocess and asserts no backend exists
afterwards, so the failure mode cannot silently return.
"""

import os
import pkgutil
import subprocess
import sys

import pde_inverse_tpu

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import sys
mods = sys.argv[1:]
for m in mods:
    __import__(m)
import jax._src.xla_bridge as xb
# _backends is populated lazily on first backend use; imports alone must
# not have touched it.
assert not xb._backends, f"importing {mods} initialized backends: {list(xb._backends)}"
print("clean")
"""


def _all_modules():
    names = ["pde_inverse_tpu"]
    for info in pkgutil.walk_packages(
        pde_inverse_tpu.__path__, prefix="pde_inverse_tpu."
    ):
        names.append(info.name)
    return names


def test_package_import_initializes_no_backend():
    mods = _all_modules()
    # main imports argparse-side CLI glue; include it too — it must stay
    # import-clean for the driver entry points.
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO
    out = subprocess.run(
        [sys.executable, "-c", _PROBE] + mods,
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "clean" in out.stdout
