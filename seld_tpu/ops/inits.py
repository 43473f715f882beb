"""Quaternion weight initialization schemes with explicit PRNG keys.

Functional equivalents of the reference init schemes
(``quaternion/quaternion_ops.py:509-645`` and
``dual_quaternion/dual_quaternion_ops.py:416-552``), re-expressed with JAX
PRNG keys instead of global numpy state. Statistical behavior matches; exact
bit streams do not (the reference itself is not reproducible: its
``quaternion_init`` hard-seeds part of its randomness at
``quaternion_ops.py:611`` while drawing the rest from global state —
SURVEY.md §4 mandates weight-import parity testing rather than init parity).

All functions return a stacked component array of shape ``(4, *shape)`` where
``shape`` is ``(*kernel, cin, cout)`` for conv or ``(cin, cout)`` for linear,
with per-component fan computed exactly like the reference
(fan_in/out = features x receptive_field).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _fans(shape: Sequence[int]) -> Tuple[int, int]:
    """(fan_in, fan_out) per the reference convention: per-component feature
    counts times the kernel receptive field."""
    if len(shape) == 2:
        cin, cout = shape
        rf = 1
    else:
        cin, cout = shape[-2], shape[-1]
        rf = int(np.prod(shape[:-2]))
    return cin * rf, cout * rf


def _scale(criterion: str, fan_in: int, fan_out: int) -> float:
    if criterion == "glorot":
        return 1.0 / math.sqrt(2 * (fan_in + fan_out))
    if criterion == "he":
        return 1.0 / math.sqrt(2 * fan_in)
    raise ValueError(f"Invalid criterion: {criterion}")


def _unit_imag(key, shape) -> jnp.ndarray:
    """Unit-norm purely-imaginary 3-vectors, one per weight element: (3, *shape)."""
    v = jax.random.normal(key, (3, *shape))
    norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True)) + 1e-4
    return v / norm


def quaternion_init(
    key,
    shape: Sequence[int],
    criterion: str = "glorot",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Polar quaternion init (Parcollet scheme, reference quaternion_ops.py:596-645):
    modulus ~ U(-s, s), phase ~ U(-pi, pi), axis = random unit imaginary vector."""
    fan_in, fan_out = _fans(shape)
    s = _scale(criterion, fan_in, fan_out)
    k_v, k_mod, k_phase = jax.random.split(key, 3)
    v = _unit_imag(k_v, tuple(shape))
    modulus = jax.random.uniform(k_mod, tuple(shape), minval=-s, maxval=s)
    phase = jax.random.uniform(k_phase, tuple(shape), minval=-math.pi, maxval=math.pi)
    w_r = modulus * jnp.cos(phase)
    sin_p = jnp.sin(phase)
    return jnp.stack(
        [w_r, modulus * v[0] * sin_p, modulus * v[1] * sin_p, modulus * v[2] * sin_p]
    ).astype(dtype)


def dq_quaternion_init(
    key,
    shape: Sequence[int],
    criterion: str = "glorot",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """DQ variant (reference dual_quaternion_ops.py:500-552): chi(4)-distributed
    modulus (scale s) instead of uniform. Returns ONE quaternion's 4 components;
    callers draw twice (primary + dual), mirroring affect_init's two draws."""
    fan_in, fan_out = _fans(shape)
    s = _scale(criterion, fan_in, fan_out)
    k_v, k_mod, k_phase = jax.random.split(key, 3)
    v = _unit_imag(k_v, tuple(shape))
    # chi(4) = sqrt(chi2(4)); chi2(4) = 2 * Gamma(shape=2, scale=1)
    g = jax.random.gamma(k_mod, 2.0, tuple(shape))
    modulus = s * jnp.sqrt(2.0 * g)
    phase = jax.random.uniform(k_phase, tuple(shape), minval=-math.pi, maxval=math.pi)
    w_r = modulus * jnp.cos(phase)
    sin_p = jnp.sin(phase)
    return jnp.stack(
        [w_r, modulus * v[0] * sin_p, modulus * v[1] * sin_p, modulus * v[2] * sin_p]
    ).astype(dtype)


def unitary_init(key, shape: Sequence[int], criterion: str = "he", dtype=jnp.float32) -> jnp.ndarray:
    """Unit quaternions from normalized 4-vectors (reference quaternion_ops.py:509-551)."""
    v = jax.random.normal(key, (4, *shape))
    norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True)) + 1e-4
    return (v / norm).astype(dtype)


def random_init(key, shape: Sequence[int], criterion: str = "glorot", dtype=jnp.float32) -> jnp.ndarray:
    """Scaled uniform components (reference quaternion_ops.py:554-593)."""
    fan_in, fan_out = _fans(shape)
    s = _scale(criterion, fan_in, fan_out)
    v = jax.random.uniform(key, (4, *shape), minval=0.0, maxval=1.0)
    return (v * s).astype(dtype)


_WINIT = {
    "quaternion": quaternion_init,
    "unitary": unitary_init,
    "random": random_init,
}


def component_init(
    key,
    shape: Sequence[int],
    n_components: int = 4,
    weight_init: str = "quaternion",
    criterion: str = "glorot",
    dq_chi: Optional[bool] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Initialize a stacked component weight of shape (n_components, *shape).

    n_components=4 -> quaternion layer; 8 -> dual-quaternion layer (two
    independent quaternion draws, chi(4) modulus like the reference DQ init
    unless ``dq_chi=False``).
    """
    if n_components == 4:
        fn = _WINIT[weight_init]
        return fn(key, shape, criterion=criterion, dtype=dtype)
    if n_components == 8:
        k1, k2 = jax.random.split(key)
        use_chi = True if dq_chi is None else dq_chi
        if weight_init == "quaternion" and use_chi:
            a = dq_quaternion_init(k1, shape, criterion=criterion, dtype=dtype)
            b = dq_quaternion_init(k2, shape, criterion=criterion, dtype=dtype)
        else:
            fn = _WINIT[weight_init]
            a = fn(k1, shape, criterion=criterion, dtype=dtype)
            b = fn(k2, shape, criterion=criterion, dtype=dtype)
        return jnp.concatenate([a, b], axis=0)
    raise ValueError(f"n_components must be 4 or 8, got {n_components}")
