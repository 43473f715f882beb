"""Task-1 (speech enhancement) metric properties: STOI monotonicity, WER
exactness, combined-metric contract (reference metrics.py:30-104)."""

import numpy as np
import pytest

from seld_tpu.metrics.task1 import (
    compute_se_metrics,
    stoi,
    task1_metric,
    wer,
    word_error_rate,
)


def _speechlike(rng, n=32000, sr=16000):
    """Modulated multi-tone burst: enough band energy for the VAD/bands."""
    t = np.arange(n) / sr
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    x = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6)) for f in (220, 440, 880, 1760))
    return (env * x + 0.05 * rng.standard_normal(n)).astype(np.float64)


def test_stoi_identity_is_high(rng):
    x = _speechlike(rng)
    s = stoi(x, x, 16000)
    assert s > 0.99


def test_stoi_monotonic_in_snr(rng):
    x = _speechlike(rng)
    noise = rng.standard_normal(len(x))
    scores = [stoi(x, x + g * noise, 16000) for g in (0.1, 1.0, 4.0)]
    assert scores[0] > scores[1] > scores[2]
    assert scores[2] < 0.6


def test_stoi_matches_pystoi_when_available(rng):
    """Oracle pin vs pystoi (the reference's STOI dependency, metrics.py:9).

    pystoi is not shipped in this image, so this is skip-gated; when present
    it bounds the absolute deviation of our from-scratch Taal-2010
    implementation (ADVICE r2: band-edge assignment / OLA silent-frame
    details can shift absolute scores)."""
    pystoi = pytest.importorskip("pystoi")
    x = _speechlike(rng)
    noise = rng.standard_normal(len(x))
    for g in (0.0, 0.3, 1.0, 3.0):
        y = x + g * noise
        ours = stoi(x, y, 16000)
        theirs = pystoi.stoi(x, y, 16000, extended=False)
        assert abs(ours - theirs) < 0.05, (g, ours, theirs)


def test_word_error_rate_exact():
    assert word_error_rate("a b c", "a b c") == 0.0
    assert word_error_rate("a b c", "a x c") == pytest.approx(1 / 3)
    assert word_error_rate("a b c", "a c") == pytest.approx(1 / 3)      # deletion
    assert word_error_rate("a b c", "a b x c") == pytest.approx(1 / 3)  # insertion
    with pytest.raises(ValueError):
        word_error_rate("", "something")


def test_wer_none_without_transcriber(rng):
    x = _speechlike(rng)
    assert wer(x, x) is None
    m, w, s = task1_metric(x, x)
    assert m is None and w is None and s is None


def test_task1_metric_with_fake_transcriber(rng):
    """Injected ASR: clean != denoised transcript -> WER > 0; metric formula
    (STOI + (1-WER))/2 like reference metrics.py:59-73."""
    x = _speechlike(rng)
    y = x + 0.5 * rng.standard_normal(len(x))

    def fake_asr(audio):
        # degrade transcript with the audio: noisy audio loses a word
        return "the quick brown fox" if np.std(audio) < np.std(x) * 1.05 else "the quick brown"

    m, w, s = task1_metric(x, y, sr=16000, transcribe_fn=fake_asr)
    assert w == pytest.approx(0.25)
    assert 0.0 <= s <= 1.0
    assert m == pytest.approx((s + 0.75) / 2)


def test_compute_se_metrics_folder(tmp_path, rng):
    import scipy.io.wavfile as wavfile

    pred, truth = tmp_path / "pred", tmp_path / "truth"
    pred.mkdir(), truth.mkdir()
    for i in range(2):
        x = _speechlike(rng)
        wavfile.write(truth / f"{i}.wav", 16000, x.astype(np.float32))
        wavfile.write(pred / f"{i}.wav", 16000, (x + 0.1 * rng.standard_normal(len(x))).astype(np.float32))

    avg = compute_se_metrics(str(pred), str(truth), transcribe_fn=lambda a: "hello world")
    assert 0.0 <= avg <= 1.0
