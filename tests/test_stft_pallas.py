"""Parity tests for the fused Pallas STFT-magnitude kernel.

Oracle: scipy.signal.stft via the features.py fft path (itself pinned to
scipy in tests/test_features.py), i.e. the reference featurizer semantics
(reference utility_functions.py:129-155)."""

import numpy as np
import pytest

import jax.numpy as jnp

from seld_tpu.data.features import spectrum_fast
from seld_tpu.ops.pallas.stft import stft_mag_pallas, stft_mag_supported


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.mark.parametrize(
    "n,nperseg,noverlap",
    [
        (32000, 512, 112),   # canonical L3DAS21 hop 400
        (32000 * 3, 512, 112),
        (12345, 512, 112),   # tail-pad path
        (8000, 256, 56),     # hop 200 -> 16 frames/group
        (16000, 512, 128),   # hop 384 -> lane-aligned, fpg=2... exercises gcd
    ],
)
def test_stft_mag_matches_scipy_path(rng, n, nperseg, noverlap):
    if not stft_mag_supported(nperseg, noverlap):
        pytest.skip("shape outside kernel support envelope")
    x = rng.standard_normal((2, n)).astype(np.float32)
    ref = spectrum_fast(
        jnp.asarray(x), nperseg=nperseg, noverlap=noverlap,
        output_phase=False, method="fft", return_layout="CTF",
    )  # (C, T, F)
    out = stft_mag_pallas(
        jnp.asarray(x), nperseg=nperseg, noverlap=noverlap,
        out_dtype=jnp.float32, interpret=True,
    )
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_stft_mag_batched_layout(rng):
    """(B, C, n) input -> (B, C, T, F), matching spectrum_fast CTF."""
    x = rng.standard_normal((2, 3, 24000)).astype(np.float32)
    ref = spectrum_fast(
        jnp.asarray(x), nperseg=512, noverlap=112,
        output_phase=False, method="fft", return_layout="CTF",
    )
    out = stft_mag_pallas(jnp.asarray(x), out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_stft_mag_bf16_close(rng):
    """bf16 table/audio mode (the serving arithmetic) stays within bf16
    tolerance of the f32 oracle."""
    x = rng.standard_normal((1, 32000)).astype(np.float32)
    ref = np.asarray(
        spectrum_fast(
            jnp.asarray(x), nperseg=512, noverlap=112,
            output_phase=False, method="fft", return_layout="CTF",
        )
    )
    out = np.asarray(
        stft_mag_pallas(jnp.asarray(x), out_dtype=jnp.bfloat16, interpret=True)
    ).astype(np.float32)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=2e-2 * scale)


def test_stft_mag_ft_layout_matches_tf(rng):
    """out_layout='FT' must be exactly the TF output transposed (the
    in-kernel tile transpose feeding the serving packer's (B, F, C, T)
    handoff)."""
    x = jnp.asarray(rng.standard_normal((3, 32000)).astype(np.float32))
    tf = stft_mag_pallas(x, out_dtype=jnp.float32, interpret=True)
    ft = stft_mag_pallas(x, out_dtype=jnp.float32, interpret=True, out_layout="FT")
    assert ft.shape == (3, tf.shape[2], tf.shape[1])
    np.testing.assert_array_equal(
        np.asarray(ft), np.asarray(jnp.swapaxes(tf, 1, 2))
    )


@pytest.mark.parametrize(
    "n,nperseg,noverlap",
    [
        (32000, 512, 112),    # canonical L3DAS21 hop 400, group 3200
        (32000 * 3, 512, 112),
        (16128, 512, 128),    # hop 384 lane-aligned -> fpg=1 (boundary
                              # frame reaches back AND stays in-group)
    ],
)
def test_stft_mag_grouped_matches_flat(rng, n, nperseg, noverlap):
    """grouped_input=True (pre-grouped (.., G, group) audio, boundary shift
    folded into the DFT tables — no full-tensor pad/relayout) must match
    the flat path within f32 summation-order tolerance, and scipy."""
    from seld_tpu.ops.pallas.stft import (
        stft_group_size,
        stft_grouped_supported,
    )

    if not stft_grouped_supported(nperseg, noverlap):
        pytest.skip("shape outside grouped-mode envelope")
    group = stft_group_size(nperseg, noverlap)
    assert n % group == 0, (n, group)
    x = rng.standard_normal((2, n)).astype(np.float32)
    flat = stft_mag_pallas(
        jnp.asarray(x), nperseg=nperseg, noverlap=noverlap,
        out_dtype=jnp.float32, interpret=True,
    )
    grouped = stft_mag_pallas(
        jnp.asarray(x).reshape(2, n // group, group),
        nperseg=nperseg, noverlap=noverlap,
        out_dtype=jnp.float32, interpret=True, grouped_input=True,
    )
    assert grouped.shape == flat.shape
    np.testing.assert_allclose(
        np.asarray(grouped), np.asarray(flat), atol=1e-5
    )
    ref = spectrum_fast(
        jnp.asarray(x), nperseg=nperseg, noverlap=noverlap,
        output_phase=False, method="fft", return_layout="CTF",
    )
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(ref), atol=2e-4)


def test_stft_mag_grouped_ft_layout(rng):
    """grouped_input composes with out_layout='FT' (the serving handoff)."""
    x = jnp.asarray(rng.standard_normal((2, 2, 32000)).astype(np.float32))
    tf = stft_mag_pallas(
        x.reshape(2, 2, 10, 3200), out_dtype=jnp.float32, interpret=True,
        grouped_input=True,
    )
    ft = stft_mag_pallas(
        x.reshape(2, 2, 10, 3200), out_dtype=jnp.float32, interpret=True,
        grouped_input=True, out_layout="FT",
    )
    np.testing.assert_array_equal(
        np.asarray(ft), np.asarray(jnp.swapaxes(tf, 2, 3))
    )


def test_fused_infer_bcft_smallcin_pretranspose(rng):
    """The BCFT smallcin entry (transpose (0,2,1,3) + pre_transposed packer)
    must match the reference-layout apply path bit-for-bit with the BCTF
    entry (tests/test_pallas.py pins BCFT vs model.apply already; this pins
    BCFT == BCTF on identical features)."""
    import jax

    from seld_tpu.models.fused_infer import fused_infer
    from seld_tpu.models.seld import SELDModel

    model = SELDModel(
        time_dim=32, freq_dim=32, input_channels=8, output_classes=14,
        domain="Q", cnn_filters=(8, 8, 8), pool_size=((2, 2), (2, 2), (2, 2)),
        pool_time="TCN", D=(2,), G=8, U=8, V=(16, 16), fc_layers=(16,),
        use_bias_conv=False, batch_norm="BN", attention_impl="full",
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    a = fused_infer(model, variables, x, interpret=True, input_layout="BCFT")
    b = fused_infer(
        model, variables, jnp.transpose(x, (0, 1, 3, 2)), interpret=True,
        input_layout="BCTF",
    )
    for u, v in zip(a, b):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-6)
