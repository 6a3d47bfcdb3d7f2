"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding logic is exercised on a
virtual host-platform mesh (SURVEY.md section 4: "multi-device without a
cluster": jax CPU backend with --xla_force_host_platform_device_count=8).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
