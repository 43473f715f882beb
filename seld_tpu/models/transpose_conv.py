"""Transposed-convolution layer modules (API completeness).

The reference defines ``QuaternionTransposeConv``
(quaternion/quaternion_layers.py:19-98) but the SELD model never uses it
(SURVEY.md §2.2); this module completes the layer-level API on top of
``seld_tpu.ops.quaternion.quaternion_transpose_conv``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from seld_tpu.ops.inits import component_init
from seld_tpu.ops.quaternion import quaternion_transpose_conv

IntOrTuple = Union[int, Sequence[int]]


def _ntuple(v, n):
    return (v,) * n if isinstance(v, int) else tuple(v)


class HamiltonTransposeConv(nn.Module):
    """Quaternion transposed convolution (channel-last, torch-style args).

    Parameters mirror HamiltonConv: ``w`` (4, *k, Cin//4, Cout//4), ``b``
    (Cout,). Only the quaternion (4-component) domain is provided, matching
    the reference's API surface.
    """

    features: int
    kernel_size: IntOrTuple
    ndim: int = 1
    stride: IntOrTuple = 1
    padding: IntOrTuple = 0
    output_padding: IntOrTuple = 0
    dilation: IntOrTuple = 1
    use_bias: bool = True
    weight_init: str = "quaternion"
    init_criterion: str = "glorot"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        if cin % 4 or self.features % 4:
            raise ValueError(f"channels ({cin}->{self.features}) must divide 4")
        k = _ntuple(self.kernel_size, self.ndim)
        w = self.param(
            "w",
            lambda key: component_init(
                key,
                (*k, cin // 4, self.features // 4),
                n_components=4,
                weight_init=self.weight_init,
                criterion=self.init_criterion,
            ),
        )
        b = self.param("b", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        dtype = self.dtype or x.dtype
        return quaternion_transpose_conv(
            x.astype(dtype),
            w.astype(dtype),
            None if b is None else b.astype(dtype),
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
            dilation=self.dilation,
        )
