"""Parity tests for the fused train-mode conv+BN+ReLU+fpool op
(ops/pallas/conv2d_train.py) against the plain XLA composition it replaces
(the direct ConvTCBlock._cnn_stage semantics, reference model.py:261-287)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seld_tpu.ops.pallas.conv2d_train import conv2d_smallcin_bn_relu_fpool_train


def _oracle(x, w, gamma, beta, pool_f, eps=1e-5):
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


@pytest.fixture
def case():
    rng = np.random.default_rng(42)
    b, f, t, cin, cout, pf = 2, 32, 250, 8, 48, 8
    x = jnp.asarray(rng.standard_normal((b, f, t, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.2)
    gamma = jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.5 + 1.0)
    beta = jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.2)
    return x, w, gamma, beta, pf


@pytest.mark.parametrize("pack", ["wide", "thin"])
def test_forward_matches_oracle(case, pack):
    x, w, gamma, beta, pf = case
    want, wmean, wvar = _oracle(x, w, gamma, beta, pf)
    got, mean, var = conv2d_smallcin_bn_relu_fpool_train(
        x, w, gamma, beta, pf, 1e-5, True, jax.lax.Precision.HIGHEST, pack=pack
    )
    np.testing.assert_allclose(np.asarray(mean), np.asarray(wmean), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(wvar), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize("pack", ["wide", "thin"])
def test_grads_match_oracle(case, pack):
    x, w, gamma, beta, pf = case
    rng = np.random.default_rng(7)

    def make_loss(fn):
        def loss(w_, gamma_, beta_):
            out = fn(w_, gamma_, beta_)
            return jnp.sum(out * probe)
        return loss

    out_shape = _oracle(x, w, gamma, beta, pf)[0].shape
    probe = jnp.asarray(rng.standard_normal(out_shape).astype(np.float32))

    g_ref = jax.grad(
        make_loss(lambda w_, g_, b_: _oracle(x, w_, g_, b_, pf)[0]), (0, 1, 2)
    )(w, gamma, beta)
    g_fused = jax.grad(
        make_loss(
            lambda w_, g_, b_: conv2d_smallcin_bn_relu_fpool_train(
                x, w_, g_, b_, pf, 1e-5, True, jax.lax.Precision.HIGHEST,
                pack=pack,
            )[0]
        ),
        (0, 1, 2),
    )(w, gamma, beta)
    for name, a, b_ in zip(("dw", "dgamma", "dbeta"), g_fused, g_ref):
        a, b_ = np.asarray(a), np.asarray(b_)
        scale = max(np.abs(b_).max(), 1e-6)
        np.testing.assert_allclose(a, b_, atol=3e-4 * scale, err_msg=name)


def test_mean_var_cotangents_ignored(case):
    """Running-stat consumers stop-gradient mean/var; the VJP must tolerate
    (ignore) nonzero cotangents on them without corrupting dw."""
    x, w, gamma, beta, pf = case

    def loss(w_):
        out, mean, var = conv2d_smallcin_bn_relu_fpool_train(
            x, w_, gamma, beta, pf, 1e-5, True, jax.lax.Precision.HIGHEST
        )
        return jnp.sum(out) + 0.0 * (jnp.sum(mean) + jnp.sum(var))

    g = jax.grad(loss)(w)
    assert np.all(np.isfinite(np.asarray(g)))


def test_bf16_forward_close(case):
    x, w, gamma, beta, pf = case
    want, _, _ = _oracle(x, w, gamma, beta, pf)
    got, _, _ = conv2d_smallcin_bn_relu_fpool_train(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), gamma, beta,
        pf, 1e-5, True, None,
    )
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=3e-2 * scale
    )
