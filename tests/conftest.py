"""Test configuration: force a virtual 8-device CPU mesh so multi-chip
sharding is exercised without TPU hardware (standard JAX fake-mesh trick)."""

import os

# Must be set before jax import anywhere in the test process.  Force CPU even
# if the ambient environment selects a TPU platform: the suite relies on the
# virtual multi-device CPU mesh and on full-precision CPU matmuls.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402

# pytest's import graph pulls in jax before this conftest runs, so the env
# var alone is too late — override the live config as well (safe while no
# backend has been initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _clean_config():
    """Each test starts with a clean binding store."""
    from greedy_multimodal_learning_tpu import config as cfg

    cfg.clear_config()
    yield
    cfg.clear_config()
