"""Machine-fingerprinted persistent-compile-cache paths.

XLA:CPU AOT cache entries are stamped with the *compiling* machine's CPU
features; loading them on a host with different features is only a warning
("could lead to execution errors such as SIGILL") — and in this
environment sessions DO migrate between heterogeneous nodes. Round 5
measured the failure mode: a 2-process CPU train step crashed mid-collective
after loading an entry compiled on an AMX-capable node (the surviving
worker's coordination barrier then timed out), and a fresh cache fixed it.
Suffixing the cache path with a hash of /proc/cpuinfo's feature flags gives
every distinct machine type its own cache.
"""

from __future__ import annotations

import hashlib


def machine_cache_dir(base: str) -> str:
    """``base`` suffixed with an 8-hex hash of this host's CPU feature set
    (stable across runs on the same machine type; distinct across nodes)."""
    flags = b""
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags"):
                    flags = line.strip()
                    break
    except OSError:
        pass
    return f"{base}_{hashlib.md5(flags).hexdigest()[:8]}"
