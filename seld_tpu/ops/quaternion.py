"""Quaternion convolution / linear ops (XLA path).

Functional equivalents of reference ``quaternion/quaternion_ops.py:125-388``
in TPU-friendly channel-last layouts:

- conv inputs: 1d ``(B, T, C)``, 2d ``(B, H, W, C)``; kernels ``(*k, Cin, Cout)``
- linear inputs: ``(..., Cin)``; weights ``(Cin, Cout)``

Component weights are stored stacked on a leading axis of size 4 with
per-component shapes ``(*k, Cin//4, Cout//4)`` (conv) or ``(Cin//4, Cout//4)``
(linear). The effective weight is assembled once per call (cheap, O(params))
and fed to one ``lax.conv_general_dilated`` / ``jnp.dot`` so the FLOPs land
on the MXU. Gradients flow through the assembly, which yields exactly the
structured component gradients the reference hand-writes in its custom
autograd Function (``quaternion_ops.py:392-464``).
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax

from seld_tpu.ops.hamilton import assemble_q_kernel

IntOrTuple = Union[int, Sequence[int]]

_CONV_DIMS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


def _norm_tuple(v: IntOrTuple, n: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    t = tuple(v)
    assert len(t) == n
    return t


def conv_nd(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    """Real channel-last N-D convolution with torch-style symmetric padding.

    ``precision`` defaults to HIGHEST for float32 inputs (the TPU MXU would
    otherwise truncate operands to bfloat16, breaking the <=1e-5 parity
    target vs the CPU reference); bf16 inputs keep the fast default.
    """
    n = x.ndim - 2
    strides = _norm_tuple(stride, n)
    pads = [(p, p) for p in _norm_tuple(padding, n)]
    dils = _norm_tuple(dilation, n)
    if precision is None and x.dtype == jnp.float32:
        precision = lax.Precision.HIGHEST
    # NOTE (anti-result, tools/ab_bench.py on v5e): rewriting 1-D stride-1
    # convs as k shifted matmuls is ~10% SLOWER end-to-end than
    # conv_general_dilated at the flagship TCN shapes — the dilation-offset
    # time slices are sublane-misaligned and force relayout copies that cost
    # more than the conv's MXU inefficiency. Keep the plain XLA conv.
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=pads,
        rhs_dilation=dils,
        dimension_numbers=_CONV_DIMS[n],
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        out = out + bias
    return out


def quaternion_conv(
    x: jnp.ndarray,
    comps: jnp.ndarray,
    bias=None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Quaternion conv: comps (4, *k, Cin//4, Cout//4), x (..., Cin) channel-last.

    Matches reference ``quaternion_conv`` (quaternion_ops.py:125-147) with
    channels reordered to (r..., i..., j..., k...) quarters of the last axis.
    """
    return conv_nd(x, assemble_q_kernel(comps), bias, stride, padding, dilation, groups)


def quaternion_transpose_conv(
    x: jnp.ndarray,
    comps: jnp.ndarray,
    bias=None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    output_padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
) -> jnp.ndarray:
    """Quaternion transposed conv (reference quaternion_ops.py:149-172).

    Implemented as the gradient-style transposed convolution: input dilation
    by ``stride`` with torch-compatible padding
    ``dilation*(k-1) - padding`` and ``output_padding`` extra rows at the end.
    """
    n = x.ndim - 2
    # comps layout (4, *k, Cin//4, Cout//4). The reference's transposed-conv
    # weight (in, out, *k) is built row-major over the INPUT blocks with the
    # standard table, i.e. entry [i][o] = T[i][o] — the transposed orientation
    # of our right-matmul assembly — so assemble with transpose=True.
    from seld_tpu.ops.hamilton import Q_TABLE, _block_rows

    kernel = _block_rows(comps, Q_TABLE, transpose=True)  # (*k, Cin, Cout)
    strides = _norm_tuple(stride, n)
    pads = _norm_tuple(padding, n)
    opads = _norm_tuple(output_padding, n)
    dils = _norm_tuple(dilation, n)
    ks = kernel.shape[:n]
    pad_cfg = [
        (dils[i] * (ks[i] - 1) - pads[i], dils[i] * (ks[i] - 1) - pads[i] + opads[i])
        for i in range(n)
    ]
    # flip spatial dims to express transpose-conv as a forward conv
    kernel = jnp.flip(kernel, axis=tuple(range(n)))
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,) * n,
        padding=pad_cfg,
        lhs_dilation=strides,
        rhs_dilation=dils,
        dimension_numbers=_CONV_DIMS[n],
        precision=lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    )
    if bias is not None:
        out = out + bias
    return out


def quaternion_linear(x: jnp.ndarray, comps: jnp.ndarray, bias=None) -> jnp.ndarray:
    """Quaternion linear: comps (4, Cin//4, Cout//4), x (..., Cin).

    Same Hamilton convention as the conv (reference quaternion_ops.py:299-327).
    """
    w = assemble_q_kernel(comps)
    precision = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jnp.dot(x, w, preferred_element_type=x.dtype, precision=precision)
    if bias is not None:
        out = out + bias
    return out


def quaternion_rotation_kernel(
    comps: jnp.ndarray,
    quaternion_format: bool = False,
    conv_orientation: bool = False,
) -> jnp.ndarray:
    """Rotation-reparameterized kernel R such that R@x ~ W*x*W† (reference
    quaternion_ops.py:174-233 / 330-388). Components (4, ..., cin, cout).

    Returns the assembled real kernel in (in, out) orientation: shape
    (..., 3*cin, 3*cout) or (..., 4*cin, 4*cout) when ``quaternion_format``.

    The reference's *conv* rotation kernel (quaternion_ops.py:174-233, torch
    weight layout (out, in, k)) is the transpose of its *linear* one
    (quaternion_ops.py:330-388, layout (in, out)) — the off-diagonal ±
    pairings swap. ``conv_orientation`` selects the conv table; the default
    matches the linear / transposed-conv one.
    """
    r, i, j, k = comps[0], comps[1], comps[2], comps[3]
    norm_factor = 2.0 * jnp.sqrt(r * r + i * i + j * j + k * k)
    sq_i = norm_factor * i * i
    sq_j = norm_factor * j * j
    sq_k = norm_factor * k * k
    ri, rj, rk = norm_factor * r * i, norm_factor * r * j, norm_factor * r * k
    ij, ik, jk = norm_factor * i * j, norm_factor * i * k, norm_factor * j * k
    # reference builds rows via cat(dim=0)=in axis, cols via cat(dim=1)=out axis
    rows = [
        [1.0 - (sq_j + sq_k), ij + rk, ik - rj],
        [ij - rk, 1.0 - (sq_i + sq_k), jk + ri],
        [ik + rj, jk - ri, 1.0 - (sq_i + sq_j)],
    ]
    if conv_orientation:
        rows = [[rows[b][a] for b in range(3)] for a in range(3)]
    if quaternion_format:
        zero = jnp.zeros_like(r)
        rows = [[zero, zero, zero, zero]] + [[zero] + row for row in rows]
        # reference places the zero row first along out axis and zero col first along in axis
    blocks = [jnp.concatenate(row, axis=-1) for row in rows]
    return jnp.concatenate(blocks, axis=-2)


def quaternion_conv_rotation(
    x: jnp.ndarray,
    comps: jnp.ndarray,
    bias=None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    groups: int = 1,
    quaternion_format: bool = False,
) -> jnp.ndarray:
    """Rotation-parameterized quaternion conv (reference quaternion_ops.py:174-233).

    comps (4, *k, Cin', Cout'); input channels must be 3*Cin' (or 4*Cin' when
    ``quaternion_format``, whose first channel block is annihilated — the
    reference zero-blocks row/col 0).
    """
    kernel = quaternion_rotation_kernel(comps, quaternion_format, conv_orientation=True)
    return conv_nd(x, kernel, bias, stride, padding, dilation, groups)


def quaternion_linear_rotation(
    x: jnp.ndarray, comps: jnp.ndarray, bias=None, quaternion_format: bool = False
) -> jnp.ndarray:
    """Rotation-parameterized quaternion linear (reference quaternion_ops.py:330-388)."""
    w = quaternion_rotation_kernel(comps, quaternion_format)
    precision = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jnp.dot(x, w, preferred_element_type=x.dtype, precision=precision)
    if bias is not None:
        out = out + bias
    return out


def quaternion_transpose_conv_rotation(
    x: jnp.ndarray,
    comps: jnp.ndarray,
    bias=None,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    output_padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    quaternion_format: bool = False,
) -> jnp.ndarray:
    """Rotation-parameterized transposed conv (reference quaternion_ops.py:237-295).

    torch's conv_transpose weight layout is (in, out, *k), so the rotation
    table keeps the linear orientation; the transpose-conv plumbing matches
    ``quaternion_transpose_conv``.
    """
    n = x.ndim - 2
    kernel = quaternion_rotation_kernel(comps, quaternion_format)  # (*k, IN, OUT)
    strides = _norm_tuple(stride, n)
    pads = _norm_tuple(padding, n)
    opads = _norm_tuple(output_padding, n)
    dils = _norm_tuple(dilation, n)
    ks = kernel.shape[:n]
    pad_cfg = [
        (dils[i] * (ks[i] - 1) - pads[i], dils[i] * (ks[i] - 1) - pads[i] + opads[i])
        for i in range(n)
    ]
    kernel = jnp.flip(kernel, axis=tuple(range(n)))
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,) * n,
        padding=pad_cfg,
        lhs_dilation=strides,
        rhs_dilation=dils,
        dimension_numbers=_CONV_DIMS[n],
        precision=lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    )
    if bias is not None:
        out = out + bias
    return out
