"""Model zoo: SELD-TCN in real / quaternion / dual-quaternion domains."""

from seld_tpu.models.attention import MultiHeadAttention  # noqa: F401
from seld_tpu.models.blocks import (  # noqa: F401
    ConvTCBlock,
    ResBlock,
    TCBlock,
    dilation_schedule,
    receptive_field,
)
from seld_tpu.models.layers import (  # noqa: F401
    BatchNorm,
    HamiltonConv,
    HamiltonLinear,
    RealConv,
    SEBlock,
    SpatialDropout1D,
    make_conv,
    make_linear,
)
from seld_tpu.models.seld import SELDModel, synthesize_model_name  # noqa: F401

from seld_tpu.config import resolve_use_remat as _resolve_use_remat


def model_from_config(cfg) -> SELDModel:
    """Build a SELDModel from a SELDConfig (mirrors reference train.py:450-458)."""
    return SELDModel(
        time_dim=cfg.time_dim,
        freq_dim=cfg.freq_dim,
        input_channels=cfg.input_channels,
        output_classes=cfg.output_classes,
        domain=cfg.domain,
        domain_classifier=cfg.domain_classifier,
        cnn_filters=tuple(cfg.cnn_filters),
        kernel_size_cnn_blocks=cfg.kernel_size_cnn_blocks,
        pool_size=tuple(tuple(p) for p in cfg.pool_size),
        pool_time=cfg.pool_time,
        D=tuple(cfg.D),
        dilation_mode=cfg.dilation_mode,
        G=cfg.G,
        U=cfg.U,
        kernel_size_dilated_conv=cfg.kernel_size_dilated_conv,
        spatial_dropout_rate=cfg.spatial_dropout_rate,
        V=tuple(cfg.V),
        V_kernel_size=cfg.V_kernel_size,
        fc_layers=tuple(cfg.fc_layers),
        fc_activations=cfg.fc_activations,
        fc_dropout=cfg.fc_dropout,
        dropout_perc=cfg.dropout_perc,
        class_overlaps=cfg.class_overlaps,
        use_bias_conv=cfg.use_bias_conv,
        use_bias_linear=cfg.use_bias_linear,
        batch_norm=cfg.batch_norm,
        parallel_ConvTC_block=cfg.parallel_ConvTC_block,
        parallel_magphase=cfg.parallel_magphase,
        use_se_block=cfg.use_se_block,
        attention_impl=cfg.attention_impl,
        # 'auto' maps to the XLA path: the fused Hamilton matmul and the
        # int8 PTQ path are opt-in until they beat XLA on the flagship
        # (measured in BENCH.md; tools/profile_stages.py section 'qmm')
        qconv_impl=cfg.qconv_impl if cfg.qconv_impl in {"pallas", "int8"} else "xla",
        compute_dtype=cfg.compute_dtype,
        remat=_resolve_use_remat(cfg),
        frontend_bands=cfg.frontend_bands,
        frontend_impl=cfg.frontend_impl,
    )
