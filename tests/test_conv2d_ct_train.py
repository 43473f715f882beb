"""Parity tests for the fused train-mode WIDE-channel CT stage
(ops/pallas/conv2d_ct_train.py) against the plain XLA composition
(ConvTCBlock._cnn_stage semantics, reference model.py:261-287), including
the input gradient dh — stage 2/3 must propagate to stage 1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seld_tpu.ops.pallas.conv2d_ct_train import (
    conv2d_widecin_ct_bn_relu_fpool_train,
)


def _oracle(x, w, gamma, beta, pool_f, eps=1e-5):
    """x channel-last (B, F, T, C)."""
    z = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    mean = jnp.mean(z, axis=(0, 1, 2))
    var = jnp.mean(z * z, axis=(0, 1, 2)) - mean * mean
    y = (z - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    y = jnp.maximum(y, 0.0)
    out = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, pool_f, 1, 1), (1, pool_f, 1, 1), "VALID"
    )
    return out, mean, var


def _ct(x):  # (B, F, T, C) -> (B, F, C, T)
    return jnp.transpose(x, (0, 1, 3, 2))


@pytest.fixture(params=[(2, 16, 250, 16, 24, 8), (2, 4, 130, 16, 16, 2)],
                ids=["stage2ish", "stage3ish"])
def case(request):
    b, f, t, c, cout, pf = request.param
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((b, f, t, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, c, cout)).astype(np.float32) * 0.2)
    gamma = jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.5 + 1.0)
    beta = jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.2)
    return x, w, gamma, beta, pf, t


def test_forward_matches_oracle(case):
    x, w, gamma, beta, pf, t = case
    want, wmean, wvar = _oracle(x, w, gamma, beta, pf)
    got, mean, var = conv2d_widecin_ct_bn_relu_fpool_train(
        _ct(x), t, w, gamma, beta, pf, 1e-5, interpret=True
    )
    got_tc = jnp.transpose(got, (0, 1, 3, 2))[:, :, :t]
    np.testing.assert_allclose(np.asarray(mean), np.asarray(wmean), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(wvar), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_tc), np.asarray(want), atol=2e-4)
    # CT contract: columns >= t are zero
    assert np.all(np.asarray(got)[..., t:] == 0.0)


def test_grads_match_oracle_including_dh(case):
    x, w, gamma, beta, pf, t = case
    rng = np.random.default_rng(7)
    out_shape = _oracle(x, w, gamma, beta, pf)[0].shape
    probe = jnp.asarray(rng.standard_normal(out_shape).astype(np.float32))

    def loss_ref(x_, w_, g_, b_):
        return jnp.sum(_oracle(x_, w_, g_, b_, pf)[0] * probe)

    def loss_ct(x_, w_, g_, b_):
        out = conv2d_widecin_ct_bn_relu_fpool_train(
            _ct(x_), t, w_, g_, b_, pf, 1e-5, interpret=True
        )[0]
        return jnp.sum(jnp.transpose(out, (0, 1, 3, 2))[:, :, :t] * probe)

    g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(x, w, gamma, beta)
    g_ct = jax.grad(loss_ct, (0, 1, 2, 3))(x, w, gamma, beta)
    for name, a, b_ in zip(("dh", "dw", "dgamma", "dbeta"), g_ct, g_ref):
        a, b_ = np.asarray(a), np.asarray(b_)
        scale = max(np.abs(b_).max(), 1e-6)
        np.testing.assert_allclose(a, b_, atol=3e-4 * scale, err_msg=name)


def test_bf16_forward_close(case):
    x, w, gamma, beta, pf, t = case
    want, _, _ = _oracle(x, w, gamma, beta, pf)
    got, _, _ = conv2d_widecin_ct_bn_relu_fpool_train(
        _ct(x).astype(jnp.bfloat16), t, w.astype(jnp.bfloat16), gamma, beta,
        pf, 1e-5, interpret=True,
    )
    got_tc = jnp.transpose(got, (0, 1, 3, 2))[:, :, :t]
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(
        np.asarray(got_tc, np.float32), np.asarray(want), atol=3e-2 * scale
    )


@pytest.mark.slow
def test_model_ct_chain_matches_xla_frontend():
    """Full-model train steps with frontend_impl='pallas-ct-interpret'
    (stage 1 fused CT + widecin CT stages 2/3) must match the XLA frontend:
    losses and gradients over two steps (dropout off for exactness)."""
    from seld_tpu.config import SELDConfig
    from seld_tpu.models import model_from_config
    from seld_tpu.training import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 64)).astype(np.float32))
    y = jnp.asarray(
        (rng.uniform(size=(2, 8, 168)) < 0.1).astype(np.float32)
    )
    losses = {}
    for impl in ("xla", "pallas-ct-interpret"):
        cfg = SELDConfig(
            domain="Q", domain_classifier="Q", input_channels=8, freq_dim=32,
            time_dim=64, cnn_filters=[16, 16, 16],
            pool_size=[[4, 2], [2, 2], [2, 2]], pool_time="TCN", D=[2],
            G=16, U=16, V=[16, 16], fc_layers=[16], batch_size=2, lr=1e-3,
            attention_impl="full", use_bias_conv=False,
            dropout_perc=0.0, spatial_dropout_rate=0.0,
            frontend_impl=impl, use_remat=False,
        )
        model = model_from_config(cfg)
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x)
        step = make_train_step(model, tx, cfg)
        state, l1 = step(state, x, y)
        state, l2 = step(state, x, y)
        losses[impl] = (float(l1), float(l2))
    np.testing.assert_allclose(
        losses["pallas-ct-interpret"], losses["xla"], rtol=5e-5
    )
