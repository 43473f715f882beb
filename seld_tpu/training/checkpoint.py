"""Checkpoint save/load with full RNG capture and four-role policy support.

TPU-native equivalent of the reference's checkpoint subsystem
(train.py:26-81): the payload carries model params + batch stats + optimizer
state + the training-loop ``state`` dict + RNG state (numpy Generator state
and the JAX PRNG key — replacing the reference's numpy/torch/cuda RNG tuple)
+ the LR-schedule state. Stored as a pickle of a device_get'd pytree —
deterministic, host-portable, resumable on any topology (arrays are
re-sharded on load by the caller's device_put).

The four checkpoint roles (latest / best-val / best-val-backup /
best-on-test, reference train.py:577-616,658-669) and periodic archival
copies are orchestrated by the trainer; this module provides the primitives.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from seld_tpu.training.schedule import StepLRState

FORMAT_VERSION = 1


def save_checkpoint(
    path: str,
    train_state,
    loop_state: Dict[str, Any],
    sched: Optional[StepLRState] = None,
    np_rng: Optional[np.random.Generator] = None,
) -> None:
    """Atomically write a checkpoint (tmp file + rename, crash-safe)."""
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "format_version": FORMAT_VERSION,
        "train_state": jax.device_get(train_state),
        "loop_state": dict(loop_state),
        "sched": dataclasses.asdict(sched) if sched is not None else None,
        "np_rng_state": np_rng.bit_generator.state if np_rng is not None else None,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(
    path: str,
    np_rng: Optional[np.random.Generator] = None,
) -> Tuple[Any, Dict[str, Any], Optional[StepLRState]]:
    """Load a checkpoint; restores ``np_rng`` in place when provided.

    Returns (train_state, loop_state, sched). The train_state arrays come
    back as host numpy; callers re-place them on devices (device_put or the
    next jit call).
    """
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint format: {payload.get('format_version')}")
    sched = StepLRState(**payload["sched"]) if payload["sched"] is not None else None
    if np_rng is not None and payload["np_rng_state"] is not None:
        np_rng.bit_generator.state = payload["np_rng_state"]
    return payload["train_state"], payload["loop_state"], sched


def variable_shape_mismatches(expected, loaded, max_items: int = 8) -> list:
    """Human-readable differences between two variable pytrees.

    ``expected`` comes from ``jax.eval_shape`` of the model's init under the
    current config; ``loaded`` from a checkpoint. Returns [] when compatible;
    otherwise a list of 'missing/unexpected/shape' description strings
    (capped at ``max_items``) for a friendly config-vs-checkpoint error
    instead of an opaque tree/shape failure.
    """

    def flat(tree):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            out[key] = tuple(getattr(leaf, "shape", ()))
        return out

    e, g = flat(expected), flat(loaded)
    diffs = []
    for key in sorted(set(e) | set(g)):
        if key not in g:
            diffs.append(f"missing in checkpoint: {key} {e[key]}")
        elif key not in e:
            diffs.append(f"unexpected in checkpoint: {key} {g[key]}")
        elif e[key] != g[key]:
            diffs.append(f"shape mismatch: {key} config {e[key]} != checkpoint {g[key]}")
    if len(diffs) > max_items:
        diffs = diffs[:max_items] + [f"... and {len(diffs) - max_items} more"]
    return diffs


def archive_checkpoints(model_dir: str, epoch: int, files: Dict[str, str]) -> str:
    """Copy the given role->filename checkpoints into an epoch-stamped archive
    directory (reference train.py:676-688)."""
    archive_dir = os.path.join(model_dir, f"checkpoint_epoch_{epoch}")
    os.makedirs(archive_dir, exist_ok=True)
    for tag, src in files.items():
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(archive_dir, f"{tag}_epoch_{epoch}"))
    return archive_dir
