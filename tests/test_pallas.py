"""Pallas kernel parity tests (interpret mode on the CPU mesh): the fused
Hamilton matmul and flash attention must match their XLA reference paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from seld_tpu.ops import dual_quaternion_linear, quaternion_linear
from seld_tpu.ops.dual_quaternion import dual_quaternion_conv
from seld_tpu.ops.pallas.attention import flash_attention
from seld_tpu.ops.pallas.qmatmul import pallas_dq_linear, pallas_q_linear


@pytest.mark.parametrize("m,cin,cout", [(16, 8, 8), (40, 16, 24)])
def test_pallas_q_linear_matches_xla(rng, m, cin, cout):
    x = jnp.asarray(rng.standard_normal((m, cin)).astype(np.float32))
    comps = jnp.asarray(rng.standard_normal((4, cin // 4, cout // 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    ref = quaternion_linear(x, comps, b)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_q_linear(x, comps, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_q_linear_3d_input(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    comps = jnp.asarray(rng.standard_normal((4, 2, 4)).astype(np.float32))
    ref = quaternion_linear(x, comps, None)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_q_linear(x, comps, None)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_dq_linear_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((24, 16)).astype(np.float32))
    comps = jnp.asarray(rng.standard_normal((8, 2, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(24).astype(np.float32))
    ref = dual_quaternion_linear(x, comps, b)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_dq_linear(x, comps, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_dq_conv_table_matches_1x1_conv(rng):
    """conv_table=True must equal a 1x1 DQ convolution on (B, T, C)."""
    x = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    comps3 = jnp.asarray(rng.standard_normal((8, 1, 2, 2)).astype(np.float32))  # (8,k,cin,cout)
    ref = dual_quaternion_conv(x, comps3, None)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_dq_linear(x, comps3[:, 0], None, conv_table=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_q_linear_grads_match_xla(rng):
    x = jnp.asarray(rng.standard_normal((12, 8)).astype(np.float32))
    comps = jnp.asarray(rng.standard_normal((4, 2, 2)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))

    def loss_ref(x, c, b):
        return jnp.sum(quaternion_linear(x, c, b) ** 2)

    def loss_pal(x, c, b):
        return jnp.sum(pallas_q_linear(x, c, b) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, comps, b)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(x, comps, b)
    for a, bb in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=1e-4, rtol=1e-5)


def test_pallas_dq_linear_grads_match_xla(rng):
    x = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    comps = jnp.asarray(rng.standard_normal((8, 2, 2)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))

    def loss_ref(x, c, b):
        return jnp.sum(dual_quaternion_linear(x, c, b) ** 2)

    def loss_pal(x, c, b):
        return jnp.sum(pallas_dq_linear(x, c, b) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, comps, b)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(x, comps, b)
    for a, bb in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=1e-4, rtol=1e-5)


def _full_attention(q, k, v, scale):
    energy = jnp.einsum("nqhd,nkhd->nhqk", q, k)
    attn = jax.nn.softmax(energy * scale, axis=3)
    return jnp.einsum("nhql,nlhd->nqhd", attn, v)


@pytest.mark.parametrize("t,d", [(64, 16), (96, 48)])
def test_flash_attention_matches_full(rng, t, d):
    b, h = 2, 2
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    ref = _full_attention(q, k, v, scale)
    got = flash_attention(q, k, v, scale, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_attention_ragged_t_fallback(rng):
    """T with no aligned divisor falls back to the exact chunked path."""
    b, t, h, d = 1, 50, 2, 16
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    ref = _full_attention(q, k, v, scale)
    got = flash_attention(q, k, v, scale, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_model_matches_xla_model(rng):
    """Full tiny Q model with qconv_impl='pallas' must match the XLA model."""
    import dataclasses

    from seld_tpu.models import SELDModel

    kw = dict(
        time_dim=16, freq_dim=16, input_channels=8, output_classes=14,
        domain="Q", cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
    )
    m_xla = SELDModel(qconv_impl="xla", **kw)
    m_pal = SELDModel(qconv_impl="pallas", **kw)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)).astype(np.float32))
    variables = m_xla.init(jax.random.PRNGKey(0), x, train=False)
    ref = m_xla.apply(variables, x, train=False)
    with pltpu.force_tpu_interpret_mode():
        got = m_pal.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip():
    # the driver exercises this exact artifact every round (MULTICHIP_r*.json)
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_flagship_shaped():
    """Full flagship-width f64 train-parity on the mesh (VERDICT r4 #1: the
    driver-visible dryrun runs a slimmed config to fit the driver budget;
    the flagship-shaped check lives here in the slow tier)."""
    import __graft_entry__ as ge
    from seld_tpu.parallel.mesh import make_mesh
    from jax._src.config import enable_x64

    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    with enable_x64(True):
        ge._dryrun_train_parity(8, 4, 2, mesh, flagship=True)


@pytest.mark.parametrize("pf,cin,cout", [(2, 8, 16), (4, 16, 16)])
def test_conv2d_bn_relu_fpool_matches_xla(rng, pf, cin, cout):
    from seld_tpu.ops.pallas.conv2d_pool import conv2d_bn_relu_fpool
    from seld_tpu.ops.quaternion import conv_nd
    from seld_tpu.models.layers import max_pool_2d

    b, f, t = 2, 8, 32
    x = jnp.asarray(rng.standard_normal((b, f, t, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

    ref = conv_nd(x, w, None, padding=1)
    ref = jnp.maximum(ref * scale + bias, 0.0)
    ref = max_pool_2d(ref, (pf, 1))
    got = conv2d_bn_relu_fpool(x, w, scale, bias, pool_f=pf, block_t=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("filters", [(8, 8, 8), (16, 16, 16)])
def test_fused_infer_matches_model(rng, filters):
    """fused_infer (Pallas frontend + direct heads) must match model.apply.

    filters=8 keeps every stage on the smallcin Pallas kernel; filters=16
    routes stages 2-3 through the wide-stage XLA branch."""
    from seld_tpu.models import SELDModel
    from seld_tpu.models.fused_infer import fused_infer

    model = SELDModel(
        time_dim=32, freq_dim=32, input_channels=8, output_classes=14,
        domain="DQ", cnn_filters=filters, pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed_ref, doa_ref = model.apply(variables, x, train=False)
    sed, doa = fused_infer(model, variables, x, interpret=True)
    np.testing.assert_allclose(np.asarray(sed), np.asarray(sed_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(doa), np.asarray(doa_ref), atol=1e-4)


def test_fused_infer_microbatched_identical(rng):
    """microbatch=M scans featurize+frontend over M microbatches; outputs
    must match the unscanned path to fusion noise (eval-mode stages are
    batch-independent; XLA's batch-shape-dependent fusion moves FMA
    contraction by ~1 ulp — BENCH.md round 5 b128 memory knob)."""
    from seld_tpu.models import SELDModel
    from seld_tpu.models.fused_infer import fused_infer

    model = SELDModel(
        time_dim=32, freq_dim=32, input_channels=8, output_classes=14,
        domain="DQ", cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
    )
    x = jnp.asarray(rng.standard_normal((4, 8, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed_ref, doa_ref = fused_infer(model, variables, x, interpret=True)
    # featurize runs inside the scan: use a nontrivial elementwise stand-in
    sed, doa = fused_infer(
        model, variables, 2.0 * x, interpret=True, microbatch=2,
        featurize=lambda a: 0.5 * a,
    )
    np.testing.assert_allclose(np.asarray(sed), np.asarray(sed_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(doa), np.asarray(doa_ref), atol=1e-6)


@pytest.mark.parametrize(
    "magphase,cin", [(False, 8), (True, 16)],
    ids=["2Parallel", "magphase"],
)
def test_fused_infer_parallel_matches_model(rng, magphase, cin):
    """fused_infer on the 2Parallel / parallel_magphase branch topologies
    (reference model.py:405-426,462-471) must match model.apply — each trunk
    runs the per-stage fused dispatch from its branch_A/branch_B subtree."""
    from seld_tpu.models import SELDModel
    from seld_tpu.models.fused_infer import fused_infer

    model = SELDModel(
        time_dim=32, freq_dim=32, input_channels=cin, output_classes=14,
        domain="Q", cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
        parallel_ConvTC_block="2Parallel", parallel_magphase=magphase,
    )
    x = jnp.asarray(rng.standard_normal((2, cin, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed_ref, doa_ref = model.apply(variables, x, train=False)
    sed, doa = fused_infer(model, variables, x, interpret=True)
    np.testing.assert_allclose(np.asarray(sed), np.asarray(sed_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(doa), np.asarray(doa_ref), atol=1e-4)
    # BCTF layout path on the parallel topology too
    sed2, doa2 = fused_infer(
        model, variables, jnp.transpose(x, (0, 1, 3, 2)),
        interpret=True, input_layout="BCTF",
    )
    np.testing.assert_allclose(np.asarray(sed2), np.asarray(sed_ref), atol=1e-4)


@pytest.mark.parametrize("t,d", [(64, 16), (96, 48)])
def test_flash_attention_grads_match_full(rng, t, d):
    """Pallas flash-attention backward (custom VJP) vs XLA full attention."""
    b, h = 2, 2
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    # non-uniform cotangent so dq/dk/dv are all exercised
    w = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_full_attention(q, k, v, scale) * w)

    def loss_pal(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, scale, block_q=32, block_k=32, interpret=True) * w
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip("qkv", g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), atol=5e-4, rtol=1e-4,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize("pf,cin,cout", [(2, 8, 16), (4, 4, 8)])
def test_conv2d_im2col_fpool_matches_xla(rng, pf, cin, cout):
    from seld_tpu.ops.pallas.conv2d_pool import conv2d_im2col_bn_relu_fpool
    from seld_tpu.ops.quaternion import conv_nd
    from seld_tpu.models.layers import max_pool_2d

    b, f, t = 2, 8, 32
    x = jnp.asarray(rng.standard_normal((b, f, t, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

    ref = conv_nd(x, w, None, padding=1)
    ref = jnp.maximum(ref * scale + bias, 0.0)
    ref = max_pool_2d(ref, (pf, 1))
    got = conv2d_im2col_bn_relu_fpool(x, w, scale, bias, pool_f=pf, block_t=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_int8_matmul_close_to_f32(rng):
    """int8 PTQ Hamilton matmul: quantized output within PTQ tolerance of
    f32, exact when inputs/weights are exactly representable."""
    from seld_tpu.ops.hamilton import assemble_dq_linear_kernel
    from seld_tpu.ops.pallas.quant import int8_matmul, quantize_hamilton

    comps = jnp.asarray(rng.standard_normal((8, 6, 4)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((40, 48)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    w_q, w_s = quantize_hamilton(comps, assemble_dq_linear_kernel)
    ref = dual_quaternion_linear(x, comps, b)
    got = int8_matmul(x, w_q, w_s, b, interpret=True)
    # dynamic int8 on both sides: ~1% relative of the magnitude scale
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    assert err < 0.05 * float(np.max(np.abs(np.asarray(ref)))), err


def test_quantize_weight_roundtrip_bound(rng):
    """Per-channel symmetric int8: dequant error bounded by scale/2 per entry."""
    from seld_tpu.ops.pallas.quant import quantize_weight_per_channel

    w = jnp.asarray(rng.standard_normal((32, 24)).astype(np.float32)) * 3
    w_q, w_s = quantize_weight_per_channel(w)
    assert w_q.dtype == jnp.int8
    err = np.abs(np.asarray(w_q, np.float32) * np.asarray(w_s) - np.asarray(w))
    np.testing.assert_array_less(err, np.broadcast_to(np.asarray(w_s) / 2 + 1e-7, err.shape))


def test_int8_model_close_to_f32(rng):
    """Tiny DQ model with qconv_impl='int8' (PTQ pointwise/linear) tracks f32."""
    from seld_tpu.models import SELDModel

    kw = dict(
        time_dim=16, freq_dim=16, input_channels=8, output_classes=14,
        domain="DQ", cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
    )
    m_f32 = SELDModel(qconv_impl="xla", **kw)
    m_int8 = SELDModel(qconv_impl="int8", **kw)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)).astype(np.float32))
    variables = m_f32.init(jax.random.PRNGKey(0), x, train=False)
    ref = m_f32.apply(variables, x, train=False)
    with pltpu.force_tpu_interpret_mode():
        got = m_int8.apply(variables, x, train=False)
    # PTQ tolerance: sed is sigmoid-bounded, doa tanh-bounded
    assert float(jnp.max(jnp.abs(got[0] - ref[0]))) < 0.08
    assert float(jnp.max(jnp.abs(got[1] - ref[1]))) < 0.15


@pytest.mark.parametrize("pack", ["wide", "thin"])
@pytest.mark.parametrize("pf,cin,cout,t", [(2, 8, 16, 32), (4, 4, 8, 32), (8, 8, 24, 100)])
def test_conv2d_smallcin_fpool_matches_xla(rng, pf, cin, cout, t, pack):
    """Channel-on-sublane small-Cin fused kernel (wide AND thin pack) vs the
    XLA conv oracle, including a non-128-aligned time length (T padding
    path) and a cin=4 case (2Parallel trunk width)."""
    from seld_tpu.ops.pallas.conv2d_pool import (
        conv2d_smallcin_bn_relu_fpool, conv2d_smallcin_thin_bn_relu_fpool,
    )
    from seld_tpu.ops.quaternion import conv_nd
    from seld_tpu.models.layers import max_pool_2d

    b, f = 2, 8
    x = jnp.asarray(rng.standard_normal((b, f, t, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

    ref = conv_nd(x, w, None, padding=1)
    ref = jnp.maximum(ref * scale + bias, 0.0)
    ref = max_pool_2d(ref, (pf, 1))
    kern = (
        conv2d_smallcin_thin_bn_relu_fpool if pack == "thin"
        else conv2d_smallcin_bn_relu_fpool
    )
    got = kern(x, w, scale, bias, pool_f=pf, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_fused_infer_bctf_layout_matches(rng):
    """fused_infer(input_layout='BCTF') on transposed feats == default path
    (the conv-STFT serving handoff)."""
    from seld_tpu.models import SELDModel
    from seld_tpu.models.fused_infer import fused_infer

    model = SELDModel(
        time_dim=32, freq_dim=32, input_channels=8, output_classes=14,
        domain="DQ", cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = fused_infer(model, variables, x, interpret=True)
    got = fused_infer(
        model, variables, jnp.transpose(x, (0, 1, 3, 2)),
        interpret=True, input_layout="BCTF",
    )
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-5)


def test_flash_attention_large_blocks(rng):
    """Default (large) flash blocks vs exact full attention, including the
    block-1200-style divisor path (T=240, block=120 in interpret mode)."""
    from seld_tpu.models.attention import _attend_full
    from seld_tpu.ops.pallas.attention import flash_attention

    b, t, h, d = 2, 240, 4, 48
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    ref = _attend_full(q, k, v, 0.144, None)
    got = flash_attention(q, k, v, 0.144, block_q=120, block_k=120, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_infer_thin_smallcin_matches_model(rng):
    """smallcin_impl='thin' (the thin-pack kernel: no dx duplication,
    in-kernel lane-halo assembly — ops/pallas/conv2d_pool.py) must match
    model.apply like the wide pack does."""
    from seld_tpu.models import SELDModel
    from seld_tpu.models.fused_infer import fused_infer

    filters = (8, 16, 16)
    model = SELDModel(
        time_dim=32, freq_dim=32, input_channels=8, output_classes=14,
        domain="DQ", cnn_filters=filters, pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed_ref, doa_ref = model.apply(variables, x, train=False)
    sed, doa = fused_infer(model, variables, x, interpret=True, smallcin_impl="thin")
    np.testing.assert_allclose(np.asarray(sed), np.asarray(sed_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(doa), np.asarray(doa_ref), atol=1e-4)


@pytest.mark.parametrize("pf,c,cout,t", [(2, 16, 16, 40), (4, 8, 24, 96)])
def test_conv2d_widecin_ct_matches_xla(rng, pf, c, cout, t):
    """Wide-Cin channel-on-sublane stage kernel (conv+BN affine+ReLU+fpool in
    the CT layout) vs the XLA composition. Reference stage semantics:
    model.py:261-287."""
    from seld_tpu.ops.pallas.conv2d_pool import conv2d_widecin_ct_bn_relu_fpool

    b, f = 2, 8
    x = jnp.asarray(rng.standard_normal((b, f, t, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, c, cout)).astype(np.float32) * 0.2)
    scale = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jnp.maximum(y * scale + bias, 0.0)
    want = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, pf, 1, 1), (1, pf, 1, 1), "VALID"
    )

    # CT input with lane padding beyond t (zeros, per the layout contract)
    h_ct = jnp.pad(jnp.transpose(x, (0, 1, 3, 2)), ((0, 0), (0, 0), (0, 0), (0, 24)))
    out_ct = conv2d_widecin_ct_bn_relu_fpool(
        h_ct, t, w, scale, bias, pool_f=pf, interpret=True
    )
    got = jnp.transpose(out_ct[..., :t], (0, 1, 3, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    # padded columns must be exact zeros (downstream CT stages rely on it)
    assert not np.any(np.asarray(out_ct[..., t:]))


def test_smallcin_ct_chain_matches_ftc(rng):
    """smallcin(out_layout='CT') -> widecin stage == smallcin(FTC) -> XLA
    stage: the serving CT chain is layout plumbing only."""
    from seld_tpu.ops.pallas.conv2d_pool import (
        conv2d_smallcin_bn_relu_fpool,
        conv2d_widecin_ct_bn_relu_fpool,
    )

    b, f, t, cin, c1, c2, pf = 2, 16, 72, 8, 16, 24, 2
    x = jnp.asarray(rng.standard_normal((b, f, t, cin)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, cin, c1)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c1, c2)).astype(np.float32) * 0.2)
    s1 = jnp.asarray(rng.standard_normal(c1).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(c1).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(c2).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(c2).astype(np.float32))

    h1 = conv2d_smallcin_bn_relu_fpool(x, w1, s1, b1, pool_f=pf, interpret=True)
    y = jax.lax.conv_general_dilated(
        h1, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jnp.maximum(y * s2 + b2, 0.0)
    want = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, pf, 1, 1), (1, pf, 1, 1), "VALID"
    )

    h1_ct = conv2d_smallcin_bn_relu_fpool(
        x, w1, s1, b1, pool_f=pf, interpret=True, out_layout="CT"
    )
    out_ct = conv2d_widecin_ct_bn_relu_fpool(
        h1_ct, t, w2, s2, b2, pool_f=pf, interpret=True
    )
    got = jnp.transpose(out_ct[..., :t], (0, 1, 3, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_smallcin_cth_halo_chain_matches_ftc(rng):
    """thin smallcin(out_layout='CTH') -> widecin(pre_halo=True) == the
    plain FTC -> XLA composition: the halo'd handoff (no XLA pad between CNN
    stages, BENCH.md round-3 trace) is layout plumbing only. Also pins the
    CTH buffer contract: zero borders, CT_HALO-lane halos."""
    from seld_tpu.ops.pallas.conv2d_pool import (
        CT_HALO,
        conv2d_smallcin_thin_bn_relu_fpool,
        conv2d_widecin_ct_bn_relu_fpool,
    )

    b, f, t, cin, c1, c2, pf = 2, 16, 72, 8, 16, 24, 2
    x = jnp.asarray(rng.standard_normal((b, f, t, cin)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, cin, c1)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c1, c2)).astype(np.float32) * 0.2)
    s1 = jnp.asarray(rng.standard_normal(c1).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(c1).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(c2).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(c2).astype(np.float32))

    h1 = conv2d_smallcin_thin_bn_relu_fpool(x, w1, s1, b1, pool_f=pf, interpret=True)
    y = jax.lax.conv_general_dilated(
        h1, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jnp.maximum(y * s2 + b2, 0.0)
    want = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, pf, 1, 1), (1, pf, 1, 1), "VALID"
    )

    h1_cth = conv2d_smallcin_thin_bn_relu_fpool(
        x, w1, s1, b1, pool_f=pf, interpret=True, out_layout="CTH"
    )
    tpad_h = -(-t // CT_HALO) * CT_HALO
    assert h1_cth.shape == (b, f // pf + 2, c1, 2 * CT_HALO + tpad_h)
    # borders are exact zeros (they are the consumer's conv zero-padding)
    assert not np.any(np.asarray(h1_cth[:, 0]))
    assert not np.any(np.asarray(h1_cth[:, -1]))
    assert not np.any(np.asarray(h1_cth[..., :CT_HALO]))
    assert not np.any(np.asarray(h1_cth[..., CT_HALO + t :]))
    out_ct = conv2d_widecin_ct_bn_relu_fpool(
        h1_cth, t, w2, s2, b2, pool_f=pf, interpret=True,
        block_t=CT_HALO, pre_halo=True,
    )
    got = jnp.transpose(out_ct[..., :t], (0, 1, 3, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_infer_bf16_ct_chain_matches_apply(rng):
    """The bf16 serving path routes wide CNN stages through the CT-layout
    widecin kernel (no channel-last relayout between stages) — outputs must
    track model.apply at bf16 tolerance."""
    from seld_tpu.models import SELDModel
    from seld_tpu.models.fused_infer import fused_infer
    import dataclasses

    model = SELDModel(
        time_dim=32, freq_dim=32, input_channels=8, output_classes=14,
        domain="DQ", cnn_filters=(16, 16, 16), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
        compute_dtype="bfloat16",
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed_ref, doa_ref = model.apply(variables, x, train=False)
    sed, doa = fused_infer(model, variables, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(sed, np.float32), np.asarray(sed_ref, np.float32), atol=0.04
    )
    np.testing.assert_allclose(
        np.asarray(doa, np.float32), np.asarray(doa_ref, np.float32), atol=0.04
    )


@pytest.mark.parametrize("filters", [(8, 8, 8), (16, 16, 16)])
def test_fused_infer_se_block_matches_model(rng, filters):
    """SE configs ride the fused path too (round-4): the per-stage SE
    epilogue (_apply_se) on the FTC / XLA-wide layouts must match
    model.apply with use_se_block=True."""
    from seld_tpu.models import SELDModel
    from seld_tpu.models.fused_infer import fused_infer

    model = SELDModel(
        time_dim=32, freq_dim=32, input_channels=8, output_classes=14,
        domain="DQ", cnn_filters=filters, pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
        use_se_block=True,
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed_ref, doa_ref = model.apply(variables, x, train=False)
    sed, doa = fused_infer(model, variables, x, interpret=True)
    np.testing.assert_allclose(np.asarray(sed), np.asarray(sed_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(doa), np.asarray(doa_ref), atol=1e-4)


def test_fused_infer_se_block_bf16_ct_chain(rng):
    """SE epilogue applied directly on the CT/CTH chain buffers (scaling is
    per-(batch, channel), so the halo'd handoff stays consistent) must track
    model.apply at bf16 tolerance."""
    from seld_tpu.models import SELDModel
    from seld_tpu.models.fused_infer import fused_infer

    model = SELDModel(
        time_dim=32, freq_dim=32, input_channels=8, output_classes=14,
        domain="DQ", cnn_filters=(16, 16, 16), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
        compute_dtype="bfloat16", use_se_block=True,
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sed_ref, doa_ref = model.apply(variables, x, train=False)
    sed, doa = fused_infer(model, variables, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(sed, np.float32), np.asarray(sed_ref, np.float32), atol=0.04
    )
    np.testing.assert_allclose(
        np.asarray(doa, np.float32), np.asarray(doa_ref, np.float32), atol=0.04
    )
