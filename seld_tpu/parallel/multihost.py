"""Multihost execution scaffolding.

The reference is strictly single-process/single-GPU (SURVEY.md §2.7: no
NCCL/MPI/torch.distributed anywhere); its named TPU-native equivalent is
``jax.distributed.initialize`` + XLA collectives over ICI/DCN with
deterministic per-host data sharding replacing the torch DataLoader. This
module provides that scaffolding:

- :func:`initialize` — process-group bring-up (env- or argument-driven).
- :func:`shard_for_host` — the per-host slice spec of a global batch.
- :func:`global_batch` — host-local numpy -> one global jax.Array over the
  mesh's 'data' axis (``jax.make_array_from_process_local_data``).

Per-host *data* sharding lives in the loaders themselves:
``BatchIterator``/``PakBatchIterator`` accept ``num_shards``/``shard_id`` and
yield each global batch's host-local rows, deterministically (the shuffle
order depends only on ``seed + epoch``, identical on every host).

Verified by a real 2-process CPU integration test
(tests/test_multihost.py) that brings up jax.distributed, builds a global
mesh spanning both processes, and checks a cross-host psum and loader
coverage/disjointness.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Bring up the JAX process group; returns True if multihost is active.

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) so a launcher can configure
    hosts purely through the environment; with no configuration at all this
    is a single-process no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    barrier("seld_tpu_init")
    return True


def barrier(name: str, timeout_s: int = 600) -> None:
    """Rendezvous all processes on the coordination-service barrier.

    Unlike ``multihost_utils.sync_global_devices`` (a GLOO allgather on CPU
    backends), this is a pure coordination-service RPC with a configurable
    timeout. Gloo's context bring-up has a HARD ~30 s key-exchange window,
    so any first collective must be reached by all processes within 30 s of
    each other — on loaded hosts (or with multi-minute cold compiles) that
    window is easily blown (observed: "Gloo context initialization failed:
    DEADLINE_EXCEEDED ... 30s", round 5). Call this before the first
    collective and after local compiles so every gloo handshake happens
    with seconds of skew."""
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is not None and jax.process_count() > 1:
        client.wait_at_barrier(name, timeout_in_ms=timeout_s * 1000)


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) of this host."""
    return jax.process_index(), jax.process_count()


def shard_for_host(
    global_batch_size: int,
    num_hosts: Optional[int] = None,
    host_id: Optional[int] = None,
) -> Tuple[int, int, int]:
    """(local_batch_size, row_start, row_stop) of this host's contiguous slice.

    The global batch is split into ``num_hosts`` equal contiguous blocks in
    host-id order — matching the row order ``global_batch`` assembles and the
    'data'-axis device order of :func:`seld_tpu.parallel.mesh.make_mesh`.
    """
    if num_hosts is None:
        num_hosts = jax.process_count()
    if host_id is None:
        host_id = jax.process_index()
    if global_batch_size % num_hosts:
        raise ValueError(f"global batch {global_batch_size} not divisible by {num_hosts} hosts")
    local = global_batch_size // num_hosts
    return local, host_id * local, (host_id + 1) * local


def local_rows(global_arr) -> np.ndarray:
    """This host's rows of a batch-sharded global array, in batch order.

    The 'data' axis of :func:`seld_tpu.parallel.mesh.make_mesh` follows
    ``jax.devices()`` order (process-major), so a host's addressable shards
    are a contiguous row block; sorting by row start restores their order.
    """
    shards = sorted(
        global_arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def allgather_rows(local_np: np.ndarray) -> np.ndarray:
    """Concatenate per-host row blocks across all processes (process order).

    Inverse of the loaders' contiguous per-host sharding: every host gets the
    full global batch back (used by the metric pass, which runs identically
    on every host).
    """
    if jax.process_count() == 1:
        return np.asarray(local_np)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(local_np), tiled=True))


def global_batch(mesh: Mesh, *local_arrays):
    """Host-local numpy rows -> global jax.Array sharded over mesh axis 'data'.

    Every host passes its own rows (``shard_for_host`` slice / a sharded
    loader's batch); the result behaves like the full global batch inside
    jit. Single-process meshes take the plain device_put path.

    Remainder batches whose GLOBAL row count does not divide the 'data' axis
    cannot be batch-sharded; they are allgathered and REPLICATED instead
    (every device computes the full batch — redundant but correct, and still
    a valid global array for SPMD).
    """
    n_global = local_arrays[0].shape[0] * jax.process_count()
    if n_global % mesh.shape["data"]:
        rep = NamedSharding(mesh, P())
        full = [allgather_rows(np.asarray(a)) for a in local_arrays]
        if jax.process_count() == 1:
            out = tuple(jax.device_put(a, rep) for a in full)
        else:
            out = tuple(
                jax.make_array_from_process_local_data(rep, a) for a in full
            )
        return out if len(out) > 1 else out[0]
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        out = tuple(jax.device_put(np.asarray(a), sharding) for a in local_arrays)
    else:
        out = tuple(
            jax.make_array_from_process_local_data(sharding, np.asarray(a))
            for a in local_arrays
        )
    return out if len(out) > 1 else out[0]
