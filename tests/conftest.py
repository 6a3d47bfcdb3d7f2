"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding logic is exercised on a
virtual host-platform mesh (SURVEY.md section 4: "multi-device without a
cluster": jax CPU backend with --xla_force_host_platform_device_count=8).
"""

import os

# The environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel with remote
# compilation) and sitecustomize.py imports jax at interpreter boot, so the
# env var alone is read too early to override -- jax.config.update is the
# authoritative switch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache keeps repeated test runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/epik_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
