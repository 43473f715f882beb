"""Machine-fingerprinted persistent-compile-cache paths.

XLA:CPU AOT cache entries are stamped with the *compiling* machine's CPU
features; loading them on a host with different features is only a warning
("could lead to execution errors such as SIGILL") — and in this
environment sessions DO migrate between heterogeneous nodes. Suffixing the
cache path with a hash of /proc/cpuinfo's feature flags gives every
distinct machine type its own cache, removing that risk class.

(Historical note: round 5 initially attributed a 2-process CPU train-step
crash to such a stale entry; the actual cause was gloo's hard ~30 s
context key-exchange window vs. multi-minute compile skew — see
``seld_tpu.parallel.multihost.barrier``. The loader warnings themselves
are benign: XLA's own ``prefer-no-scatter/gather`` tuning attrs trip the
feature comparison on every cached CPU AOT load.)
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
