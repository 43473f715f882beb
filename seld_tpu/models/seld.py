"""The SELD model: single/dual trunk + SED/DOA heads.

Flax re-design of the reference ``SELD_Model`` (reference model.py:324-546):
accepts inputs in the reference layout (B, C, F, T) and returns
``(sed (B, T_out, classes*overlaps), doa (B, T_out, classes*overlaps*3))``.
Supports domain in {R, Q, DQ}, a separately-typed classifier head
(``domain_classifier``), 2-parallel trunks on channel halves or
mic-wise mag/phase regrouping (``parallel_magphase``), model-name synthesis
and receptive-field computation.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from seld_tpu.models.blocks import ConvTCBlock, receptive_field
from seld_tpu.models.layers import make_linear

_Q_NAMES = {"q", "Q", "quaternion", "Quaternion"}
_DQ_NAMES = {"dq", "dQ", "DQ", "dual_quaternion", "Dual_Quaternion"}
_PARALLEL_2 = {"2Parallel", "2BParallel", "2ParallelBranches", "2PB"}
_OFF = {"False", "false", "None", "none"}


def synthesize_model_name(
    domain: str,
    dilation_mode: str,
    D: Sequence,
    parallel_ConvTC_block: str,
    batch_norm: str,
    pool_time: str,
    rf: int,
    n_resblocks: int,
    extra_name: str = "",
) -> str:
    """Model-name synthesis matching reference model.py:347-372 (the name keys
    the results-directory layout, so it must match exactly)."""
    name = "Q" if domain in _Q_NAMES else ("DualQ" if domain in _DQ_NAMES else "")
    name += "SELD-TCN"
    if dilation_mode == "fibonacci":
        name += "-PHI"
    name += "-"
    if len(D) > 1 and D[0] < D[1]:
        name += "I"
    name += f"S{len(D)}"
    if parallel_ConvTC_block not in _OFF:
        name += "_" + parallel_ConvTC_block
    name += "_" + batch_norm
    if pool_time == "CNN":
        name += "_pooltCNN"
    name += f"_RF{rf}_{n_resblocks}RB"
    return name + extra_name


class SELDModel(nn.Module):
    """SELD-TCN with R/Q/DQ weight domains (flagship model)."""

    time_dim: int = 4800
    freq_dim: int = 256
    input_channels: int = 4
    output_classes: int = 14
    domain: str = "DQ"
    domain_classifier: str = "same"
    cnn_filters: Sequence[int] = (64, 64, 64)
    kernel_size_cnn_blocks: int = 3
    pool_size: Sequence[Sequence[int]] = ((8, 2), (8, 2), (2, 2))
    pool_time: str = "TCN"
    D: Sequence = (10,)
    dilation_mode: str = "fibonacci"
    G: int = 128
    U: int = 128
    kernel_size_dilated_conv: int = 3
    spatial_dropout_rate: float = 0.5
    V: Sequence[int] = (128, 128)
    V_kernel_size: int = 3
    fc_layers: Sequence[int] = (128,)
    fc_activations: str = "Linear"
    fc_dropout: str = "all"
    dropout_perc: float = 0.3
    class_overlaps: float = 3.0
    use_bias_conv: bool = False
    use_bias_linear: bool = True
    batch_norm: str = "BN"
    parallel_ConvTC_block: str = "False"
    parallel_magphase: bool = False
    use_se_block: bool = False
    attention_impl: str = "auto"
    qconv_impl: str = "xla"
    compute_dtype: str = "float32"
    remat: Any = False  # False | True | 'frontend' (one remat region over the CNN stages)
    frontend_bands: int = 0
    frontend_impl: str = "auto"  # train-mode stage-1 kernel (blocks.ConvTCBlock)

    @property
    def classifier_domain(self) -> str:
        return self.domain if self.domain_classifier == "same" else self.domain_classifier

    def receptive_field(self):
        return receptive_field(self.D, self.kernel_size_dilated_conv, self.dilation_mode)

    @property
    def model_name(self) -> str:
        rf, n_rb = self.receptive_field()
        return synthesize_model_name(
            self.domain, self.dilation_mode, self.D, self.parallel_ConvTC_block,
            self.batch_norm, self.pool_time, rf, n_rb,
        )

    def _trunk(self, name: str, input_channels: int) -> ConvTCBlock:
        return ConvTCBlock(
            domain=self.domain, cnn_filters=self.cnn_filters,
            kernel_size_cnn_blocks=self.kernel_size_cnn_blocks,
            pool_size=self.pool_size, pool_time=self.pool_time, D=self.D,
            dilation_mode=self.dilation_mode, G=self.G, U=self.U,
            kernel_size_dilated_conv=self.kernel_size_dilated_conv,
            spatial_dropout_rate=self.spatial_dropout_rate, V=self.V,
            V_kernel_size=self.V_kernel_size, dropout_perc=self.dropout_perc,
            use_bias=self.use_bias_conv, batch_norm=self.batch_norm,
            use_se_block=self.use_se_block, attention_impl=self.attention_impl,
            qconv_impl=self.qconv_impl, dtype=self.compute_dtype,
            remat=self.remat, frontend_bands=self.frontend_bands,
            frontend_impl=self.frontend_impl, name=name,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        # accept the reference layout (B, C, F, T); go channel-last internally
        x = jnp.transpose(x, (0, 2, 3, 1))  # (B, F, T, C)
        if self.parallel_ConvTC_block in _PARALLEL_2:
            if self.parallel_magphase:
                # mic-A mag+phase = channels [0:4]+[8:12]; mic-B = [4:8]+[12:]
                x_a = jnp.concatenate([x[..., 0:4], x[..., 8:12]], axis=-1)
                x_b = jnp.concatenate([x[..., 4:8], x[..., 12:]], axis=-1)
            else:
                half = self.input_channels // 2
                x_a, x_b = x[..., :half], x[..., half:]
            branch_a = self._trunk("branch_A", x_a.shape[-1])(x_a, train=train)
            branch_b = self._trunk("branch_B", x_b.shape[-1])(x_b, train=train)
            h = jnp.concatenate([branch_a, branch_b], axis=-1)
        else:
            h = self._trunk("seld_block", self.input_channels)(x, train=train)

        sed_out = int(self.output_classes * self.class_overlaps)
        doa_out = sed_out * 3
        cdom = self.classifier_domain

        def head(h, out_size, prefix):
            y = h
            for li, width in enumerate(self.fc_layers):
                y = make_linear(
                    cdom, width, self.use_bias_linear,
                    impl=self.qconv_impl, name=f"{prefix}_fc{li}",
                )(y)
                if self.fc_activations in {"relu", "ReLU", "RELU"}:
                    y = nn.relu(y)
                if self.fc_dropout in {"all", "ALL", "True"}:
                    y = nn.Dropout(self.dropout_perc)(y, deterministic=not train)
            if self.fc_dropout in {"last", "Last", "LAST"}:
                y = nn.Dropout(self.dropout_perc)(y, deterministic=not train)
            return nn.Dense(out_size, use_bias=self.use_bias_linear, name=f"{prefix}_out")(y)

        # promote (not cast) to >=f32: bf16 logits upcast for the activations,
        # f64 stays f64 (the PARITY_F64 pin — a hard f32 cast rounds the
        # large random-weight logits by ~2e-5, tools/parity_flagship.py)
        def _pf32(y):
            return y.astype(jnp.promote_types(y.dtype, jnp.float32))

        sed = nn.sigmoid(_pf32(head(h, sed_out, "sed")))
        doa = jnp.tanh(_pf32(head(h, doa_out, "doa")))
        return sed, doa
