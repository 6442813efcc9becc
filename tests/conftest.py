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
