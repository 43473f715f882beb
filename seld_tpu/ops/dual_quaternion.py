"""Dual-quaternion convolution / linear ops (XLA path).

Functional equivalents of reference
``dual_quaternion/dual_quaternion_ops.py:111-203`` in channel-last layouts.
Component weights are stacked on a leading axis of size 8
(r, i, j, k, r2, i2, j2, k2) with per-component shapes
``(*k, Cin//8, Cout//8)`` (conv) or ``(Cin//8, Cout//8)`` (linear).

The dual-number structure gives 8x parameter sharing: the assembled real
weight is [[Q, 0], [Q_e, Q]] over (primary, dual) channel halves. See
``seld_tpu.ops.hamilton`` for the (reproduced) reference quirk that the DQ
linear uses the transposed Hamilton table relative to the DQ conv.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from seld_tpu.ops.hamilton import assemble_dq_conv_kernel, assemble_dq_linear_kernel
from seld_tpu.ops.quaternion import IntOrTuple, conv_nd


def dual_quaternion_conv(
    x: jnp.ndarray,
    comps: jnp.ndarray,
    bias=None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """DQ conv: comps (8, *k, Cin//8, Cout//8), x (..., Cin) channel-last."""
    return conv_nd(x, assemble_dq_conv_kernel(comps), bias, stride, padding, dilation, groups)


def dual_quaternion_linear(x: jnp.ndarray, comps: jnp.ndarray, bias=None) -> jnp.ndarray:
    """DQ linear: comps (8, Cin//8, Cout//8), x (..., Cin).

    Uses the reference's transposed-table convention
    (dual_quaternion_ops.py:170-188) for output parity.
    """
    w = assemble_dq_linear_kernel(comps)
    precision = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jnp.dot(x, w, preferred_element_type=x.dtype, precision=precision)
    if bias is not None:
        out = out + bias
    return out
