"""Test configuration: force an 8-device virtual CPU platform.

Must run before the first ``import jax`` anywhere in the test session so the
XLA flags take effect. All sharding tests use this virtual mesh; TPU runs are
exercised by ``bench.py`` / ``__graft_entry__.py`` instead.
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
    return np.random.default_rng(0)
