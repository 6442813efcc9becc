"""Test harness: force an 8-device virtual CPU platform before JAX loads.

This is the standard trick for exercising TPU sharding logic without
hardware (SURVEY.md §4): every sharding test sees 8 devices in a mesh.
"""

import os

# Force CPU even if the ambient environment pins a TPU platform
# (JAX_PLATFORMS=axon): unit tests must run on the virtual 8-device CPU mesh.
# Exception: PDE_INVERSE_TPU_TEST_TPU=1 keeps the real chip so the
# TPU-gated kernel tests can run.
_USE_TPU = os.environ.get("PDE_INVERSE_TPU_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Belt and braces: installed pytest plugins may import jax before this
# conftest runs, making the env vars above too late — the config update
# still wins as long as no backend has been initialized yet.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

if not _USE_TPU:
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU platform, got "
        f"{jax.devices()[0].platform}"
    )
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


# --- smoke / full tiers ------------------------------------------------------
# The full suite is ~30 min on the 1-core TPU-VM host (round-3 VERDICT #6),
# which erodes keep-green discipline.  tests/slow_tests.txt lists every test
# measured >= 6 s (regenerate from a `pytest --durations=0` log:
#   grep -E "^[0-9.]+s call" LOG | awk '{gsub("s","",$1); if ($1+0>=6) print $3}' | sort
# ); they get a `slow` marker here, so
#   pytest -m "not slow"   — smoke tier, ~5 min
#   pytest                 — full tier, unchanged
# Tests not in the list (including new ones) default to the smoke tier —
# additions are smoke until a durations run says otherwise.

def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: measured >= 6 s on the 1-core host (tests/slow_tests.txt)"
    )


def _slow_ids():
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(path) as f:
            return {line.strip() for line in f if line.strip()}
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    slow = _slow_ids()
    if not slow:
        return
    mark = pytest.mark.slow
    for item in items:
        # nodeid is tests/<file>::<class>::<test>; the list stores the same
        if item.nodeid in slow:
            item.add_marker(mark)
