"""Test configuration: force an 8-device virtual CPU backend.

Set env vars *before* any jax import so tests exercise sharding/mesh code
paths without TPU hardware (the standard JAX fake-backend pattern).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism and speed for tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize (this machine's TPU tunnel) calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
# overriding JAX_PLATFORMS from the environment — force CPU back so the
# tests really run on the 8-device virtual CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
