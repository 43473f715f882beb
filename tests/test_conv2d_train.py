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


@pytest.mark.parametrize("pack", ["wide", "thin"])
def test_bf16_grads_small_gamma(case, pack):
    """ADVICE r4 (medium + low): in bf16, xhat recovered from the bf16-rounded
    pooled output amplifies rounding by ~|beta/gamma| for small-gamma channels
    — dgamma/dbeta now come from the dw kernel's exact routed-f32
    accumulators, so they must match the f32 path tightly even with tiny (or
    exactly zero) gamma and large beta; dW's residual recovery error enters
    only through the scale-suppressed c1/c2 corrections."""
    x, w, _, _, pf = case
    rng = np.random.default_rng(11)
    cout = w.shape[-1]
    gamma = np.abs(rng.standard_normal(cout)).astype(np.float32) * 0.5 + 0.5
    gamma[:8] = [0.0, 0.01, 0.01, 0.02, 0.05, 0.05, 0.1, 0.1]  # stress channels
    beta = rng.standard_normal(cout).astype(np.float32) * 0.2
    beta[:8] = 2.0  # large |beta/gamma| amplification factor
    gamma, beta = jnp.asarray(gamma), jnp.asarray(beta)

    # bf16-representable inputs/probe: both paths then recompute the conv on
    # identical values (bf16 products are exact in f32), isolating the
    # output-recovery error as the ONLY bf16-vs-f32 difference
    x16 = x.astype(jnp.bfloat16)
    w16 = w.astype(jnp.bfloat16)
    xr, wr = x16.astype(jnp.float32), w16.astype(jnp.float32)
    out_shape = _oracle(xr, wr, gamma, beta, pf)[0].shape
    probe = jnp.asarray(
        rng.standard_normal(out_shape).astype(np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)

    def make_loss(x_, precision):
        def loss(w_, g_, b_):
            out = conv2d_smallcin_bn_relu_fpool_train(
                x_, w_, g_, b_, pf, 1e-5, True, precision, pack=pack
            )[0]
            return jnp.sum(out.astype(jnp.float32) * probe)
        return loss

    g32 = jax.grad(make_loss(xr, jax.lax.Precision.HIGHEST), (0, 1, 2))(
        wr, gamma, beta
    )
    g16 = jax.grad(make_loss(x16, None), (0, 1, 2))(w16, gamma, beta)
    dw32, dgamma32, dbeta32 = [np.asarray(t, np.float32) for t in g32]
    dw16, dgamma16, dbeta16 = [np.asarray(t, np.float32) for t in g16]

    # exact in-kernel accumulators: tight everywhere, incl. the gamma==0 and
    # gamma=0.01/beta=2 channels that the old output-recovery corrupted
    np.testing.assert_allclose(
        dgamma16, dgamma32, atol=2e-4 * max(np.abs(dgamma32).max(), 1.0)
    )
    np.testing.assert_allclose(
        dbeta16, dbeta32, atol=2e-4 * max(np.abs(dbeta32).max(), 1.0)
    )
    # gamma==0 channel keeps its true (generically nonzero) dgamma
    assert np.isfinite(dgamma16[0]) and abs(dgamma16[0] - dgamma32[0]) < 1e-3
    assert abs(dgamma32[0]) > 1e-3, "degenerate test: true dgamma ~ 0"
    # dW: recovery error only via c1/c2 (scale-suppressed)
    np.testing.assert_allclose(
        dw16, dw32, atol=2e-2 * max(np.abs(dw32).max(), 1.0)
    )

    # and against the autodiff oracle on the same f32 values
    go = jax.grad(
        lambda w_, g_, b_: jnp.sum(_oracle(xr, w_, g_, b_, pf)[0] * probe),
        (0, 1, 2),
    )(wr, gamma, beta)
    np.testing.assert_allclose(
        dgamma32, np.asarray(go[1]),
        atol=3e-4 * max(np.abs(np.asarray(go[1])).max(), 1.0),
    )


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
