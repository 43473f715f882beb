"""STFT featurizer parity vs scipy.signal.stft (the reference's backend)."""

import numpy as np
import pytest
import scipy.signal

from seld_tpu.data.features import spectrum_fast, spectrum_fast_batch


def _reference_spectrum(x, nperseg, noverlap, cut_dc=True, output_phase=True, cut_last=True):
    """Oracle mirroring reference utility_functions.py:129-155 via scipy."""
    _, _, seg = scipy.signal.stft(x, window="hamming", nperseg=nperseg, noverlap=noverlap)
    out = np.abs(seg)
    if output_phase:
        out = np.concatenate([out, np.angle(seg)], axis=-3)
    if cut_dc:
        out = out[:, 1:, :]
    if cut_last:
        out = out[:, :, :-1]
    return out


@pytest.mark.parametrize("nperseg,noverlap", [(512, 112), (512, 128), (256, 64)])
@pytest.mark.parametrize("output_phase", [False, True])
def test_spectrum_fast_matches_scipy(rng, nperseg, noverlap, output_phase):
    x = rng.standard_normal((4, 32000)).astype(np.float32)
    ref = _reference_spectrum(x, nperseg, noverlap, output_phase=output_phase)
    got = np.asarray(spectrum_fast(x, nperseg=nperseg, noverlap=noverlap, output_phase=output_phase))
    assert got.shape == ref.shape
    if output_phase:
        n_mag = got.shape[0] // 2
        np.testing.assert_allclose(got[:n_mag], ref[:n_mag], atol=2e-6, rtol=1e-5)
        # phase can differ by 2π conventions only where magnitude ~ 0
        mag = ref[:n_mag]
        mask = mag > 1e-6
        pd = np.abs(got[n_mag:] - ref[n_mag:])[mask]
        assert np.percentile(pd, 99.9) < 1e-3
    else:
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


def test_canonical_60s_shape(rng):
    """60 s @ 32 kHz with nperseg=512 noverlap=112 -> (C, 256, 4800) like the
    reference smoke test (reference model.py:548-563)."""
    x = rng.standard_normal((8, 32000 * 60)).astype(np.float32)
    out = spectrum_fast(x, nperseg=512, noverlap=112, output_phase=False)
    assert out.shape == (8, 256, 4800)


def test_batch_featurizer(rng):
    x = rng.standard_normal((2, 4, 16000)).astype(np.float32)
    out = spectrum_fast_batch(x, nperseg=256, noverlap=64, output_phase=True)
    single = spectrum_fast(x[0], nperseg=256, noverlap=64, output_phase=True)
    assert out.shape[0] == 2
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), atol=1e-6)


def test_matmul_dft_matches_fft(rng):
    from seld_tpu.data.features import spectrum_fast

    x = rng.standard_normal((4, 16000)).astype(np.float32)
    f = np.asarray(spectrum_fast(x, nperseg=512, noverlap=112, output_phase=True, method="fft"))
    m = np.asarray(spectrum_fast(x, nperseg=512, noverlap=112, output_phase=True, method="matmul"))
    n_mag = f.shape[0] // 2
    np.testing.assert_allclose(m[:n_mag], f[:n_mag], atol=2e-5)
    mask = f[:n_mag] > 1e-5
    assert np.percentile(np.abs(m[n_mag:] - f[n_mag:])[mask], 99) < 1e-2


def test_conv_stft_matches_fft(rng):
    """method='conv' (one strided XLA conv, the TPU serving path) vs rFFT,
    plus the CTF return layout."""
    x = rng.standard_normal((4, 16000)).astype(np.float32)
    f = np.asarray(spectrum_fast(x, nperseg=512, noverlap=112, output_phase=True, method="fft"))
    c = np.asarray(spectrum_fast(x, nperseg=512, noverlap=112, output_phase=True, method="conv"))
    n_mag = f.shape[0] // 2
    np.testing.assert_allclose(c[:n_mag], f[:n_mag], atol=2e-5)
    mask = f[:n_mag] > 1e-5
    assert np.percentile(np.abs(c[n_mag:] - f[n_mag:])[mask], 99) < 1e-2

    ctf = np.asarray(
        spectrum_fast(
            x, nperseg=512, noverlap=112, output_phase=True, method="conv",
            return_layout="CTF",
        )
    )
    np.testing.assert_allclose(np.swapaxes(ctf, -1, -2), c, atol=1e-6)


def test_conv_stft_no_last_frame_cut(rng):
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    a = np.asarray(spectrum_fast(x, nperseg=256, noverlap=64, output_phase=False,
                                 method="conv", cut_last_timeframe=False))
    b = np.asarray(spectrum_fast(x, nperseg=256, noverlap=64, output_phase=False,
                                 method="fft", cut_last_timeframe=False))
    np.testing.assert_allclose(a, b, atol=2e-5)
