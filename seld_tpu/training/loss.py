"""SELD loss: weighted BCE (SED) + MSE (DOA).

Matches reference ``seld_loss`` (train.py:186-204): the joint target's first
``classes*overlaps`` columns are SED, the rest DOA; loss =
BCE(sed, t_sed) * sed_weight + MSE(doa, t_doa) * doa_weight, both mean-reduced
(the reference's flatten + mean is the same mean over all elements). BCE log
terms are clamped at -100 like torch.nn.BCELoss.
"""

from __future__ import annotations

import jax.numpy as jnp


def bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary cross entropy on probabilities, torch.nn.BCELoss semantics."""
    log_p = jnp.maximum(jnp.log(pred), -100.0)
    log_1mp = jnp.maximum(jnp.log1p(-pred), -100.0)
    return -jnp.mean(target * log_p + (1.0 - target) * log_1mp)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def seld_loss(
    sed: jnp.ndarray,
    doa: jnp.ndarray,
    target: jnp.ndarray,
    output_classes: int = 14,
    class_overlaps: int = 3,
    sed_weight: float = 1.0,
    doa_weight: float = 5.0,
) -> jnp.ndarray:
    n_sed = int(output_classes * class_overlaps)
    target_sed = target[..., :n_sed]
    target_doa = target[..., n_sed:]
    return bce_loss(sed, target_sed) * sed_weight + mse_loss(doa, target_doa) * doa_weight
