"""Model introspection: per-layer parameter table + model-name breakdown.

``model_summary`` is the framework's analogue of the reference's
``torchinfo.summary`` call (reference train.py:483): a per-module table of
parameter shapes and counts from the flax variables tree, grouped at the
module level (the tree path minus the leaf array name).

``describe_model_name`` mirrors ``print_model_name``
(reference model.py:519-546): it splits the synthesized model name
(models/seld.py:28-55 pins the same name synthesis) into its encoded fields
and labels each one.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import numpy as np


def summarize_params(params: Any) -> Tuple[List[Tuple[str, str, int]], int]:
    """(rows, total): one row per parameter leaf — (path, shape, count)."""
    rows = []
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        rows.append((name, "x".join(map(str, leaf.shape)) or "scalar", n))
        total += n
    return rows, total


def model_summary(params: Any, depth: int = 2) -> str:
    """Formatted per-module parameter table.

    ``depth`` controls grouping: rows aggregate over tree paths truncated to
    that many components (depth=2 groups e.g. ``seld_block/cnn_0``); the
    full leaf table is depth >= the tree depth.
    """
    rows, total = summarize_params(params)
    groups: dict = {}
    order: List[str] = []
    for name, shape, n in rows:
        key = "/".join(name.split("/")[:depth])
        if key not in groups:
            groups[key] = [0, 0]
            order.append(key)
        groups[key][0] += n
        groups[key][1] += 1
    width = max((len(k) for k in order), default=10)
    lines = [f"{'module':<{width}}  {'params':>12}  tensors"]
    lines.append("-" * (width + 24))
    for key in order:
        n, cnt = groups[key]
        lines.append(f"{key:<{width}}  {n:>12,}  {cnt}")
    lines.append("-" * (width + 24))
    lines.append(f"{'TOTAL':<{width}}  {total:>12,}  {len(rows)}")
    return "\n".join(lines)


# model-name fields in synthesis order (models/seld.py:28-55; the reference
# assembles the same underscore-joined name in model.py:295-339 and labels
# the parts in print_model_name, model.py:519-546)
_NAME_FIELDS = (
    ("architecture", "model family"),
    ("structure", "structure / domain"),
    ("batch_norm", "batch-norm type"),
    ("receptive_field", "receptive field"),
    ("n_resblocks", "ResBlocks"),
)


def describe_model_name(model_name: str) -> List[str]:
    """Label the fields encoded in a synthesized model name.

    The name is underscore-joined (e.g. ``QSELD-TCN-PHI-S1_BN_RF287_10RB``);
    unknown extra parts are passed through labeled 'extra', matching the
    reference's fallback branch (model.py:545-546).
    """
    parts = model_name.split("_")
    out = []
    for part in parts:
        if part.startswith(("QSELD", "DualQSELD", "SELD", "2Parallel")):
            out.append(f"model family: {part}")
        elif part in {"BN", "noBN", "BNonCNN", "BNonTCN"} or part.startswith("BN_on"):
            out.append(f"batch-norm type: {part}")
        elif part.startswith("RF"):
            out.append(f"receptive field: {part[2:]}")
        elif part.endswith("RB"):
            out.append(f"ResBlocks: {part[:-2]}")
        elif part.startswith("poolt"):
            out.append(f"time pooling: {part[5:]}")
        else:
            out.append(f"extra: {part}")
    return out
