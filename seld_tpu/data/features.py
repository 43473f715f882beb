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

    When ``nperseg <= 2*hop`` (all reference configurations: hop 400 or 384
    for nperseg 512), framing is a reshape + slice + concat — frame i is
    hop-block i plus the head of hop-block i+1 — which lowers to cheap
    layout ops on TPU. The general case falls back to a gather, which is
    an order of magnitude slower on the VPU.
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
    if nperseg <= 2 * hop:
        total = (n_frames + 1) * hop
        xb = jnp.pad(x, pad_cfg + [(0, total - n)])
        blocks = xb.reshape(*x.shape[:-1], n_frames + 1, hop)
        return jnp.concatenate(
            [blocks[..., :-1, :], blocks[..., 1:, : nperseg - hop]], axis=-1
        )
    idx = np.arange(n_frames)[:, None] * hop + np.arange(nperseg)[None, :]
    return x[..., idx]


@functools.lru_cache(maxsize=8)
def _dft_matrices(nperseg: int, skip_dc: bool = False) -> tuple:
    """Windowed, normalized real-DFT matrices: frames @ C -> Re, frames @ S -> -Im.

    Folding the Hamming window and the scipy 1/win.sum() normalization into
    the matrices makes the whole STFT two MXU matmuls — on TPU this beats the
    VPU-based FFT by a wide margin at nperseg=512. With ``skip_dc`` the DC
    column is omitted, leaving nperseg//2 output bins (a lane-aligned 256 for
    the canonical nperseg=512) — the DC bin is discarded downstream anyway.
    """
    win = np.asarray(0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(nperseg) / nperseg))
    n_bins = nperseg // 2 + 1
    t = np.arange(nperseg)[:, None]
    k = np.arange(int(skip_dc), n_bins)[None, :]
    angle = 2.0 * np.pi * t * k / nperseg
    scale = win[:, None] / win.sum()
    cos_m = (np.cos(angle) * scale).astype(np.float32)
    sin_m = (np.sin(angle) * scale).astype(np.float32)
    # return numpy (not jnp): this function is lru_cached and may be called
    # under trace — caching a traced array would leak the tracer
    return cos_m, sin_m


@functools.partial(
    jax.jit,
    static_argnames=(
        "nperseg", "noverlap", "cut_dc", "output_phase", "cut_last_timeframe",
        "method", "return_layout",
    ),
)
def spectrum_fast(
    x: jnp.ndarray,
    nperseg: int = 512,
    noverlap: int = 128,
    cut_dc: bool = True,
    output_phase: bool = True,
    cut_last_timeframe: bool = True,
    method: str = "auto",
    return_layout: str = "CFT",
) -> jnp.ndarray:
    """Multichannel STFT magnitude (+ optional phase) features.

    x: (channels, n_samples) float array.
    Returns (channels[*2 if phase], freq_bins, time_frames), matching the
    reference layout (mag channels first, then phase channels).

    method: 'fft' uses jnp.fft.rfft; 'matmul' computes the windowed real DFT
    as two MXU matmuls; 'conv' expresses the whole STFT as ONE strided XLA
    convolution (512 taps, stride=hop, 2*F output channels with window +
    normalization folded into the filter) — the fastest TPU path measured
    (b16 net ~17 ms vs ~38 ms matmul, BENCH.md) because XLA's conv handles
    the hop-strided framing without the misaligned-reshape relayouts;
    'auto' picks conv on TPU and fft on CPU.

    return_layout: 'CFT' (reference layout, default) or 'CTF' — the natural
    output order of the conv/matmul paths; serving uses CTF to feed the
    fused frontend without a (C, F, T) round-trip transpose.
    """
    assert return_layout in {"CFT", "CTF"}, return_layout
    x = jnp.asarray(x, jnp.float32)
    if method == "auto":
        method = "conv" if jax.default_backend() != "cpu" else "fft"
    hop = nperseg - noverlap
    if method == "conv":
        # reference scipy semantics (utility_functions.py:129-155): zero
        # boundary of nperseg//2 both ends, zero-pad tail to whole hops
        from jax import lax

        half = nperseg // 2
        pad_cfg = [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x, pad_cfg + [(half, half)])
        n = xp.shape[-1]
        rem = (-(n - nperseg)) % hop
        if rem:
            xp = jnp.pad(xp, pad_cfg + [(0, rem)])
        cos_m, sin_m = _dft_matrices(nperseg, skip_dc=cut_dc)
        n_bins = cos_m.shape[1]
        mk = jnp.asarray(
            np.concatenate([cos_m, sin_m], axis=1).reshape(nperseg, 1, 2 * n_bins)
        )
        lead = x.shape[:-1]
        y = lax.conv_general_dilated(
            xp.reshape(int(np.prod(lead)) or 1, -1, 1),
            mk,
            window_strides=(hop,),
            padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if cut_last_timeframe:
            y = y[:, :-1]
        y = y.reshape(*lead, *y.shape[1:])  # (..., T, 2F)
        re, im = y[..., :n_bins], -y[..., n_bins:]
    elif method == "matmul" and nperseg <= 2 * hop:
        # Never materialize the frames tensor (it's ~2.6x the audio and the
        # strided copy ran at ~56 GB/s effective — the round-1 STFT's entire
        # cost, BENCH.md). Frame i is hop-block i plus the head of block i+1,
        # so frames @ M == blocks[:-1] @ M[:hop] + blocks[1:, :tail] @ M[hop:]
        # over the zero-cost reshape view `blocks`; the slices fuse into the
        # matmul reads. cos|sin are one concatenated RHS -> a single pass.
        half = nperseg // 2
        pad_cfg = [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x, pad_cfg + [(half, half)])
        n = xp.shape[-1]
        rem = (-(n - nperseg)) % hop
        n_frames = (n + rem - nperseg) // hop + 1
        total = (n_frames + 1) * hop
        xp = jnp.pad(xp, pad_cfg + [(0, total - n)])
        blocks = xp.reshape(*x.shape[:-1], n_frames + 1, hop)
        keep = n_frames - 1 if cut_last_timeframe else n_frames
        tail = nperseg - hop
        cos_m, sin_m = _dft_matrices(nperseg, skip_dc=cut_dc)
        m = jnp.asarray(np.concatenate([cos_m, sin_m], axis=1))  # (nperseg, 2F)
        y = jnp.dot(
            blocks[..., :keep, :], m[:hop], preferred_element_type=jnp.float32
        ) + jnp.dot(
            blocks[..., 1 : keep + 1, :tail], m[hop:], preferred_element_type=jnp.float32
        )
        n_bins = y.shape[-1] // 2
        re, im = y[..., :n_bins], -y[..., n_bins:]
    else:
        frames = stft_frames(x, nperseg, noverlap)
        if cut_last_timeframe:
            frames = frames[..., :-1, :]  # skip computing the dropped frame
        if method == "matmul":
            # fold the DC cut into the DFT matrix: 256 output lanes not 257
            cos_m, sin_m = _dft_matrices(nperseg, skip_dc=cut_dc)
            re = jnp.dot(frames, cos_m, preferred_element_type=jnp.float32)
            im = -jnp.dot(frames, sin_m, preferred_element_type=jnp.float32)
        else:
            win = hamming_periodic(nperseg)
            spec = jnp.fft.rfft(frames * win, axis=-1) / win.sum()
            if cut_dc:
                spec = spec[..., 1:]
            re, im = jnp.real(spec), jnp.imag(spec)
    if return_layout == "CFT":
        # scipy layout is (channels, freq, time)
        re = jnp.swapaxes(re, -1, -2)
        im = jnp.swapaxes(im, -1, -2)
    out = jnp.sqrt(re * re + im * im)
    if output_phase:
        phase = jnp.arctan2(im, re)
        out = jnp.concatenate([out, phase], axis=-3)
    return out


def spectrum_fast_batch(x: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Batched featurizer: (batch, channels, n_samples) -> (batch, C', F, T)."""
    return jax.vmap(lambda s: spectrum_fast(s, **kwargs))(x)
