"""Test configuration: force an 8-device virtual CPU platform.

Must run before the first ``import jax`` anywhere in the test session so the
XLA flags take effect. All sharding tests use this virtual mesh; TPU runs are
exercised by ``bench.py`` / ``__graft_entry__.py`` instead.
"""

import os

# NOTE: hard assignment, not setdefault — the environment ships a
# sitecustomize (PYTHONPATH=/root/.axon_site) that pre-sets
# JAX_PLATFORMS=axon at interpreter startup; tests must run on the
# virtual CPU mesh, never on the shared single-TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache cuts repeat test-suite wall time drastically
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
