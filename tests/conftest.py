"""Test configuration: force an 8-device virtual CPU platform.

The environment ships an axon sitecustomize (PYTHONPATH=/root/.axon_site)
that imports JAX and initializes its backend at interpreter startup — before
any conftest runs — pinning the process to the single shared TPU tunnel and
locking the CPU client to one device. Tests must run on an 8-device virtual
CPU mesh, so we clear the already-initialized backends and repoint the
platform config before any test module imports JAX.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
# persistent compilation cache cuts repeat test-suite wall time drastically.
# The path is machine-fingerprinted: sessions migrate between heterogeneous
# nodes here, and XLA:CPU AOT entries from a different node can SIGILL
# (round 5: a 2-process train step crashed mid-collective on a stale entry;
# see seld_tpu/utils/cache.py).
import hashlib as _hashlib

_flags = b""
try:
    with open("/proc/cpuinfo", "rb") as _f:
        for _line in _f:
            if _line.startswith(b"flags"):
                _flags = _line.strip()
                break
except OSError:
    pass
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    f"/tmp/jax_test_cache_{_hashlib.md5(_flags).hexdigest()[:8]}",
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

from jax._src import xla_bridge as _xb  # noqa: E402

_xb._clear_backends()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
