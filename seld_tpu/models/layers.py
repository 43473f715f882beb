"""Flax layer modules: quaternion / dual-quaternion conv & linear, helpers.

Equivalents of the reference's nn.Module layer wrappers
(``quaternion/quaternion_layers.py:100-286`` and
``dual_quaternion/dual_quaternion_layers.py:49-206``) as flax.linen modules
holding the stacked component weights. All activations are channel-last:
1d convs take (B, T, C), 2d convs take (B, H, W, C).

Parameters:
- ``w``: (n_components, *kernel, Cin//n, Cout//n) — stacked Hamilton
  components (contiguous for the Pallas kernels).
- ``b``: (Cout,), zero-init like the reference layers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from seld_tpu.ops.dual_quaternion import dual_quaternion_conv, dual_quaternion_linear
from seld_tpu.ops.inits import component_init
from seld_tpu.ops.quaternion import conv_nd, quaternion_conv, quaternion_linear

IntOrTuple = Union[int, Sequence[int]]


def _ntuple(v, n):
    return (v,) * n if isinstance(v, int) else tuple(v)


class HamiltonConv(nn.Module):
    """Quaternion (n_components=4) or dual-quaternion (8) convolution.

    ``impl='pallas'`` routes pointwise (k=1, stride 1) convolutions through
    the fused Pallas Hamilton matmul (seld_tpu.ops.pallas.qmatmul); spatial
    convolutions always use the XLA path.
    """

    features: int
    kernel_size: IntOrTuple
    ndim: int = 1
    n_components: int = 4
    stride: IntOrTuple = 1
    padding: IntOrTuple = 0
    dilation: IntOrTuple = 1
    use_bias: bool = True
    weight_init: str = "quaternion"
    init_criterion: str = "glorot"
    impl: str = "xla"
    dtype: Optional[jnp.dtype] = None
    rotation: bool = False
    quaternion_format: bool = False

    @nn.compact
    def __call__(self, x, return_dense_kernel: bool = False):
        """``return_dense_kernel=True`` creates the parameters as usual but
        returns the assembled dense (*k, Cin, Cout) kernel (in ``dtype``)
        instead of convolving — the fused train-mode front-end
        (models/blocks.py) consumes the dense kernel directly; gradients
        flow back through the Hamilton assembly."""
        cin = x.shape[-1]
        n = self.n_components
        if self.rotation:
            assert not return_dense_kernel, "rotation convs have no dense form"
            return self._rotation_call(x, cin)
        if cin % n or self.features % n:
            raise ValueError(
                f"channels ({cin}->{self.features}) must divide n_components={n}"
            )
        k = _ntuple(self.kernel_size, self.ndim)
        w = self.param(
            "w",
            lambda key: component_init(
                key,
                (*k, cin // n, self.features // n),
                n_components=n,
                weight_init=self.weight_init,
                criterion=self.init_criterion,
            ),
        )
        b = self.param("b", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        dtype = self.dtype or x.dtype
        xd = x.astype(dtype)
        wd = w.astype(dtype)
        bd = None if b is None else b.astype(dtype)
        if return_dense_kernel:
            assert bd is None, "dense-kernel mode is for the bias-free front-end"
            from seld_tpu.ops.hamilton import (
                assemble_dq_conv_kernel, assemble_q_kernel,
            )

            assemble = assemble_q_kernel if n == 4 else assemble_dq_conv_kernel
            return assemble(wd)
        pointwise = all(kk == 1 for kk in k) and _ntuple(self.stride, self.ndim) == (1,) * self.ndim
        if self.impl == "pallas" and pointwise:
            from seld_tpu.ops.pallas.qmatmul import pallas_dq_linear, pallas_q_linear

            w_mat = wd.reshape(n, cin // n, self.features // n)
            if n == 4:
                return pallas_q_linear(xd, w_mat, bd)
            return pallas_dq_linear(xd, w_mat, bd, conv_table=True)
        if self.impl == "int8" and pointwise:
            from seld_tpu.ops.hamilton import assemble_dq_conv_kernel, assemble_q_kernel
            from seld_tpu.ops.pallas.quant import int8_matmul, quantize_weight_per_channel

            assemble = assemble_q_kernel if n == 4 else assemble_dq_conv_kernel
            w_full = assemble(
                w.reshape(n, cin // n, self.features // n).astype(jnp.float32)
            )
            wq, ws = quantize_weight_per_channel(w_full)
            return int8_matmul(xd, wq, ws, bd)
        fn = quaternion_conv if n == 4 else dual_quaternion_conv
        return fn(
            xd, wd, bd,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
        )

    def _rotation_call(self, x, cin: int):
        """W*x*W† rotation path (reference quaternion_layers.py:151-157).

        Input/output channels are 3 (or 4 with ``quaternion_format``) times
        the per-component width; the reference sizes its bias at the nominal
        ``out_channels`` which breaks broadcasting in the 3x case — we size
        it at the actual output width instead.
        """
        if self.n_components != 4:
            raise ValueError("rotation is defined for quaternion (4-component) layers only")
        from seld_tpu.ops.quaternion import quaternion_conv_rotation

        blocks = 4 if self.quaternion_format else 3
        if cin % blocks or self.features % 4:
            raise ValueError(f"rotation channels ({cin}->{self.features}) need /{blocks} and /4")
        k = _ntuple(self.kernel_size, self.ndim)
        w = self.param(
            "w",
            lambda key: component_init(
                key,
                (*k, cin // blocks, self.features // 4),
                n_components=4,
                weight_init=self.weight_init,
                criterion=self.init_criterion,
            ),
        )
        out_feats = blocks * (self.features // 4)
        b = self.param("b", nn.initializers.zeros, (out_feats,)) if self.use_bias else None
        dtype = self.dtype or x.dtype
        return quaternion_conv_rotation(
            x.astype(dtype),
            w.astype(dtype),
            None if b is None else b.astype(dtype),
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            quaternion_format=self.quaternion_format,
        )


class HamiltonLinear(nn.Module):
    """Quaternion (4) or dual-quaternion (8) linear layer.

    ``impl='pallas'`` uses the fused Pallas Hamilton matmul."""

    features: int
    n_components: int = 4
    use_bias: bool = True
    weight_init: str = "quaternion"
    init_criterion: str = "glorot"
    impl: str = "xla"
    dtype: Optional[jnp.dtype] = None
    rotation: bool = False
    quaternion_format: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        n = self.n_components
        if self.rotation:
            return self._rotation_call(x, cin)
        if cin % n or self.features % n:
            raise ValueError(
                f"features ({cin}->{self.features}) must divide n_components={n}"
            )
        w = self.param(
            "w",
            lambda key: component_init(
                key,
                (cin // n, self.features // n),
                n_components=n,
                weight_init=self.weight_init,
                criterion=self.init_criterion,
            ),
        )
        b = self.param("b", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        dtype = self.dtype or x.dtype
        xd = x.astype(dtype)
        wd = w.astype(dtype)
        bd = None if b is None else b.astype(dtype)
        if self.impl == "pallas":
            from seld_tpu.ops.pallas.qmatmul import pallas_dq_linear, pallas_q_linear

            if n == 4:
                return pallas_q_linear(xd, wd, bd)
            return pallas_dq_linear(xd, wd, bd, conv_table=False)
        if self.impl == "int8":
            from seld_tpu.ops.hamilton import assemble_dq_linear_kernel, assemble_q_kernel
            from seld_tpu.ops.pallas.quant import int8_matmul, quantize_weight_per_channel

            assemble = assemble_q_kernel if n == 4 else assemble_dq_linear_kernel
            wq, ws = quantize_weight_per_channel(assemble(w.astype(jnp.float32)))
            return int8_matmul(xd, wq, ws, bd)
        fn = quaternion_linear if n == 4 else dual_quaternion_linear
        return fn(xd, wd, bd)

    def _rotation_call(self, x, cin: int):
        """Rotation-parameterized linear (reference quaternion_layers.py:212-214)."""
        if self.n_components != 4:
            raise ValueError("rotation is defined for quaternion (4-component) layers only")
        from seld_tpu.ops.quaternion import quaternion_linear_rotation

        blocks = 4 if self.quaternion_format else 3
        if cin % blocks or self.features % 4:
            raise ValueError(f"rotation features ({cin}->{self.features}) need /{blocks} and /4")
        w = self.param(
            "w",
            lambda key: component_init(
                key,
                (cin // blocks, self.features // 4),
                n_components=4,
                weight_init=self.weight_init,
                criterion=self.init_criterion,
            ),
        )
        out_feats = blocks * (self.features // 4)
        b = self.param("b", nn.initializers.zeros, (out_feats,)) if self.use_bias else None
        dtype = self.dtype or x.dtype
        return quaternion_linear_rotation(
            x.astype(dtype),
            w.astype(dtype),
            None if b is None else b.astype(dtype),
            quaternion_format=self.quaternion_format,
        )


class RealConv(nn.Module):
    """Plain real conv in the same channel-last interface (torch-style padding)."""

    features: int
    kernel_size: IntOrTuple
    ndim: int = 1
    stride: IntOrTuple = 1
    padding: IntOrTuple = 0
    dilation: IntOrTuple = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, return_dense_kernel: bool = False):
        k = _ntuple(self.kernel_size, self.ndim)
        cin = x.shape[-1]
        w = self.param(
            "w", nn.initializers.he_uniform(in_axis=-2, out_axis=-1), (*k, cin, self.features)
        )
        b = self.param("b", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        dtype = self.dtype or x.dtype
        if return_dense_kernel:
            assert b is None, "dense-kernel mode is for the bias-free front-end"
            return w.astype(dtype)
        return conv_nd(
            x.astype(dtype),
            w.astype(dtype),
            None if b is None else b.astype(dtype),
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
        )


def make_conv(
    domain: str,
    features: int,
    kernel_size: IntOrTuple,
    ndim: int,
    *,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    dilation: IntOrTuple = 1,
    use_bias: bool = True,
    impl: str = "xla",
    name: Optional[str] = None,
) -> nn.Module:
    """Domain-dispatched conv, mirroring the reference's selection
    (reference model.py:66-86: exact strings 'Q' and 'DQ'; anything else real)."""
    if domain == "Q":
        return HamiltonConv(
            features, kernel_size, ndim=ndim, n_components=4, stride=stride,
            padding=padding, dilation=dilation, use_bias=use_bias, impl=impl, name=name,
        )
    if domain == "DQ":
        return HamiltonConv(
            features, kernel_size, ndim=ndim, n_components=8, stride=stride,
            padding=padding, dilation=dilation, use_bias=use_bias, impl=impl, name=name,
        )
    return RealConv(
        features, kernel_size, ndim=ndim, stride=stride, padding=padding,
        dilation=dilation, use_bias=use_bias, name=name,
    )


def make_linear(
    domain: str, features: int, use_bias: bool = True, impl: str = "xla", name=None
) -> nn.Module:
    """Domain-dispatched linear, mirroring reference model.py:432-440."""
    if domain == "Q":
        return HamiltonLinear(features, n_components=4, use_bias=use_bias, impl=impl, name=name)
    if domain == "DQ":
        return HamiltonLinear(features, n_components=8, use_bias=use_bias, impl=impl, name=name)
    return nn.Dense(features, use_bias=use_bias, name=name)


def max_pool_time(x: jnp.ndarray, pool: int) -> jnp.ndarray:
    """MaxPool1d over the time axis of (B, T, C); floor division like torch.

    Backward NOTE (BENCH.md): reduce_window's select-and-scatter gradient is
    the most compile-memory-efficient formulation measured — BOTH a
    reshape+max variant AND an equality-mask custom VJP made the flagship
    train step compile-OOM at batches reduce_window handles. Keep
    reduce_window.
    """
    if pool == 1:
        return x
    return nn.max_pool(x, window_shape=(pool,), strides=(pool,), padding="VALID")


def max_pool_2d(x: jnp.ndarray, pool: Tuple[int, int]) -> jnp.ndarray:
    """MaxPool2d over (B, F, T, C); floor division like torch (see
    :func:`max_pool_time` NOTE on the backward formulation)."""
    if pool[0] == 1 and pool[1] == 1:
        return x
    pf, pt = int(pool[0]), int(pool[1])
    return nn.max_pool(x, window_shape=(pf, pt), strides=(pf, pt), padding="VALID")


class SpatialDropout1D(nn.Module):
    """Channel-wise dropout on (B, T, C) — torch nn.Dropout1d semantics
    (reference model.py:97,127-128): the whole channel is dropped across time."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0:
            return x
        return nn.Dropout(rate=self.rate, broadcast_dims=(1,))(x, deterministic=deterministic)


class BatchNorm(nn.BatchNorm):
    """BatchNorm over the last axis with torch-compatible hyperparameters
    (torch momentum 0.1 == flax retention 0.9, eps 1e-5). Parameters live
    directly under this module's name (flat, for torch checkpoint import).

    The running-variance update is torch.nn.BatchNorm's UNBIASED one
    (var * n/(n-1), torch _BatchNorm.forward) — flax's stock update uses the
    biased batch variance, a systematic n = B*T ~ 0.8%-scale skew on the
    TCN running stats that the round-4 training-equivalence A/B exposed as
    divergent post-training EVAL metrics (tools/train_equivalence.py: the
    1e-13-perturbed torch control reproduced torch's metric row exactly
    while the biased-update model did not). Normalization itself uses the
    biased batch variance in train mode, same as torch."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average=None, *, mask=None):
        from flax.linen import module as _module
        from flax.linen.normalization import (
            _canonicalize_axes,
            _compute_stats,
            _normalize,
        )

        use_running_average = _module.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), feature_shape
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), feature_shape
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = _compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=True,
            )
            if not self.is_initializing():
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                correction = n / max(n - 1, 1)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var * correction
                )
        return _normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            True,
        )


class DepthwiseSeparableConv(nn.Module):
    """Depthwise conv (groups=Cin) -> pointwise 1x1 -> BN -> ReLU, channel-last.

    TPU-native equivalent of the reference's DepthwiseSeparableConv1D/2D
    (reference dual_quaternion/dual_quaternion_layers.py:19-47 — defined but
    never wired into the SELD model there; provided here for API
    completeness). ndim=1 takes (B, T, C); ndim=2 takes (B, H, W, C).
    """

    features: int
    kernel_size: IntOrTuple
    ndim: int = 1
    stride: IntOrTuple = 1
    padding: IntOrTuple = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        k = _ntuple(self.kernel_size, self.ndim)
        dtype = self.dtype or x.dtype
        # depthwise: feature_group_count=Cin, kernel (*k, 1, Cin)
        dw = self.param(
            "dw", nn.initializers.he_uniform(in_axis=-2, out_axis=-1), (*k, 1, cin)
        )
        dwb = self.param("dw_b", nn.initializers.zeros, (cin,))
        h = conv_nd(
            x.astype(dtype), dw.astype(dtype), dwb.astype(dtype),
            stride=self.stride, padding=self.padding, groups=cin,
        )
        pw = self.param(
            "pw", nn.initializers.he_uniform(in_axis=-2, out_axis=-1),
            (*(1,) * self.ndim, cin, self.features),
        )
        pwb = self.param("pw_b", nn.initializers.zeros, (self.features,))
        h = conv_nd(h, pw.astype(dtype), pwb.astype(dtype))
        h = BatchNorm(use_running_average=not train, dtype=dtype)(h)
        return nn.relu(h)


class SEBlock(nn.Module):
    """Squeeze-and-Excitation over channels of (B, ..., C).

    The reference README claims an SE module but ships none (SURVEY.md
    preamble); this is the opt-in implementation (off by default for parity).
    """

    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        s = jnp.mean(x, axis=axes)
        s = nn.Dense(max(c // self.reduction, 1))(s)
        s = nn.relu(s)
        s = nn.Dense(c)(s)
        s = nn.sigmoid(s)
        # keep the input dtype (the squeeze Denses promote to f32): a bf16
        # stage output must stay bf16 or every downstream conv re-converts
        return x * s.reshape(s.shape[0], *([1] * len(axes)), c).astype(x.dtype)
