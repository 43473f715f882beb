"""Mesh construction and sharding rules.

The reference has no distributed execution at all (SURVEY.md §2.7 — only a
vestigial DataParallel unwrap in its checkpoint code). Here data parallelism
and tensor parallelism are first-class: a 2-D ``('data', 'model')`` mesh,
batches sharded over ``data``, and weight output-feature dims sharded over
``model``. Collectives (grad psum, activation all-gathers) are inserted by
the XLA SPMD partitioner from the input shardings — "computation follows
data" — so the train step itself stays a plain jit'd function and the
collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, n_model: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'model') mesh. n_data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data == -1:
        assert n_total % n_model == 0, (n_total, n_model)
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (n_data, n_model, n_total)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, *arrays):
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def param_partition_spec(leaf, n_model: int) -> P:
    """Tensor-parallel rule: shard the output-feature (last) axis over 'model'.

    Applies to >=2-D weights whose last dim divides the model-axis size;
    biases and small/indivisible tensors replicate. For the Hamilton
    component stacks (n, *k, cin, cout) this splits each component's output
    block — the natural 4/8-way-compatible split, since every output block
    row of the assembled weight reads the same component shard.
    """
    if n_model > 1 and getattr(leaf, "ndim", 0) >= 2 and leaf.shape[-1] % n_model == 0:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def shard_variables(mesh: Mesh, variables, n_model: Optional[int] = None):
    """Place a variables pytree on the mesh (weights tp-sharded, rest replicated)."""
    n_model = n_model if n_model is not None else mesh.shape["model"]

    def place(leaf):
        spec = param_partition_spec(leaf, n_model)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, variables)
