"""On-device STFT featurization.

TPU-native equivalent of the reference featurizer ``spectrum_fast``
(reference ``utility_functions.py:129-155``), which wraps
``scipy.signal.stft(window='hamming', nperseg, noverlap)``, takes the
magnitude, optionally concatenates phase along the channel axis, cuts the DC
bin and cuts the last time frame.

This implementation reproduces scipy's semantics exactly (verified to float32
tolerance in ``tests/test_features.py``):

- periodic Hamming window (``scipy.signal.get_window`` uses ``sym=False``),
- ``boundary='zeros'``: the signal is extended by ``nperseg // 2`` zeros on
  both ends,
- ``padded=True``: zero-pad the end so a whole number of hops fits,
- one-sided rFFT scaled by ``1 / window.sum()``.

Runs fully inside jit so featurize+infer fuses into one XLA program
(the ≥10× audio-hours/sec target in BASELINE.md measures this fused path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hamming_periodic(nperseg: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hamming window, identical to scipy.signal.get_window('hamming', n)."""
    n = np.arange(nperseg)
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / nperseg)
    return jnp.asarray(w, dtype=dtype)


def stft_frames(x: jnp.ndarray, nperseg: int, noverlap: int) -> jnp.ndarray:
    """Frame a signal like scipy's stft with boundary='zeros', padded=True.

    x: (..., n_samples) -> (..., n_frames, nperseg)
    """
    hop = nperseg - noverlap
    half = nperseg // 2
    pad_cfg = [(0, 0)] * (x.ndim - 1)
    x = jnp.pad(x, pad_cfg + [(half, half)])
    n = x.shape[-1]
    # zero-pad tail so (n - nperseg) is a whole number of hops
    rem = (-(n - nperseg)) % hop
    if rem:
        x = jnp.pad(x, pad_cfg + [(0, rem)])
        n += rem
    n_frames = (n - nperseg) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(nperseg)[None, :]
    return x[..., idx]


@functools.partial(
    jax.jit,
    static_argnames=("nperseg", "noverlap", "cut_dc", "output_phase", "cut_last_timeframe"),
)
def spectrum_fast(
    x: jnp.ndarray,
    nperseg: int = 512,
    noverlap: int = 128,
    cut_dc: bool = True,
    output_phase: bool = True,
    cut_last_timeframe: bool = True,
) -> jnp.ndarray:
    """Multichannel STFT magnitude (+ optional phase) features.

    x: (channels, n_samples) float array.
    Returns (channels[*2 if phase], freq_bins, time_frames), matching the
    reference layout (mag channels first, then phase channels).
    """
    x = jnp.asarray(x, jnp.float32)
    win = hamming_periodic(nperseg)
    frames = stft_frames(x, nperseg, noverlap) * win
    spec = jnp.fft.rfft(frames, axis=-1) / win.sum()
    # scipy layout is (channels, freq, time)
    spec = jnp.swapaxes(spec, -1, -2)
    out = jnp.abs(spec)
    if output_phase:
        phase = jnp.angle(spec)
        out = jnp.concatenate([out, phase], axis=-3)
    if cut_dc:
        out = out[..., 1:, :]
    if cut_last_timeframe:
        out = out[..., :, :-1]
    return out


def spectrum_fast_batch(x: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Batched featurizer: (batch, channels, n_samples) -> (batch, C', F, T)."""
    return jax.vmap(lambda s: spectrum_fast(s, **kwargs))(x)
