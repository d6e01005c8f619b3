"""Test environment: run everything on a virtual 8-device CPU mesh.

Must set XLA flags BEFORE jax is imported anywhere (SURVEY.md §4.4):
every mesh/sharding/collective test exercises real SPMD partitioning on
8 fake CPU devices, so pod runs are config-only changes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Per-primitive compiles are slow on this host; the persistent cache makes
# repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# The sandbox's TPU-tunnel plugin (axon) force-sets jax_platforms to
# "axon,cpu" from sitecustomize at interpreter startup, which routes
# every eager op through a remote TCP round-trip (~seconds/op). Tests
# run on the local 8-virtual-device CPU backend, so re-pin the config
# here — conftest runs before any backend is instantiated.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
