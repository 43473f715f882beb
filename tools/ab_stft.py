#!/usr/bin/env python
"""Interleaved A/B: Pallas fused STFT-magnitude kernel vs the strided-conv
STFT, standalone and inside the full fused serving pipeline.

Round-3 motivation (BENCH.md trace tables): the conv formulation pays
~19 ms/b16 of which ~11 ms is pure layout work around the 7.7 ms conv.
The Pallas kernel (ops/pallas/stft.py) reads the audio in natural layout,
runs frames-on-sublanes MXU matmuls, and fuses |.| + the bf16 cast.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.data.features import spectrum_fast
from seld_tpu.ops.pallas.stft import stft_mag_pallas


def main():
    batch = int(os.environ.get("AB_BATCH", "32"))
    reps = int(os.environ.get("AB_REPS", "7"))
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    import dataclasses

    from __graft_entry__ import _flagship_model
    from seld_tpu.models.fused_infer import fused_infer

    audio = jnp.asarray(rng.standard_normal((batch, 8, 1920000)).astype(np.float32))
    model = dataclasses.replace(_flagship_model(4800), compute_dtype="bfloat16")
    variables = jax.jit(lambda k, inp: model.init(k, inp, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 256, 4800), jnp.float32)
    )

    peek = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[:8])

    def stft_conv(a):
        return jax.vmap(
            lambda s: spectrum_fast(
                s, nperseg=512, noverlap=112, output_phase=False,
                method="conv", return_layout="CTF",
            )
        )(a)

    stft_conv_j = jax.jit(stft_conv)
    stft_pal_j = jax.jit(
        lambda a: stft_mag_pallas(a, nperseg=512, noverlap=112, out_dtype=jnp.bfloat16)
    )
    pipe_conv_j = jax.jit(
        lambda v, a: fused_infer(model, v, stft_conv(a), input_layout="BCTF")
    )
    pipe_pal_j = jax.jit(
        lambda v, a: fused_infer(
            model, v,
            stft_mag_pallas(a, nperseg=512, noverlap=112, out_dtype=jnp.bfloat16),
            input_layout="BCTF",
        )
    )
    stft_ft_j = jax.jit(
        lambda a: stft_mag_pallas(
            a, nperseg=512, noverlap=112, out_dtype=jnp.bfloat16, out_layout="FT"
        )
    )
    pipe_ft_j = jax.jit(
        lambda v, a: fused_infer(
            model, v,
            stft_mag_pallas(
                a, nperseg=512, noverlap=112, out_dtype=jnp.bfloat16,
                out_layout="FT",
            ),
            input_layout="BCFT",
        )
    )
    pipe_thin_j = jax.jit(
        lambda v, a: fused_infer(
            model, v,
            stft_mag_pallas(a, nperseg=512, noverlap=112, out_dtype=jnp.bfloat16),
            input_layout="BCTF", smallcin_impl="thin",
        )
    )
    pipe_thin_ft_j = jax.jit(
        lambda v, a: fused_infer(
            model, v,
            stft_mag_pallas(
                a, nperseg=512, noverlap=112, out_dtype=jnp.bfloat16,
                out_layout="FT",
            ),
            input_layout="BCFT", smallcin_impl="thin",
        )
    )

    from seld_tpu.ops.pallas.stft import stft_group_size

    grp = stft_group_size(512, 112)
    audio_g = audio.reshape(batch, 8, 1920000 // grp, grp)
    stft_grouped_j = jax.jit(
        lambda a: stft_mag_pallas(
            a, nperseg=512, noverlap=112, out_dtype=jnp.bfloat16,
            grouped_input=True,
        )
    )
    pipe_grouped_j = jax.jit(
        lambda v, a: fused_infer(
            model, v,
            stft_mag_pallas(
                a, nperseg=512, noverlap=112, out_dtype=jnp.bfloat16,
                grouped_input=True,
            ),
            input_layout="BCTF", smallcin_impl="thin",
        )
    )

    fns = {
        "noop": lambda: jnp.float32(0.0) * 1.0,
        "stft-conv": lambda: stft_conv_j(audio),
        "stft-pallas": lambda: stft_pal_j(audio),
        "stft-ft": lambda: stft_ft_j(audio),
        "stft-grouped": lambda: stft_grouped_j(audio_g),
        "pipe-conv": lambda: pipe_conv_j(variables, audio),
        "pipe-pallas": lambda: pipe_pal_j(variables, audio),
        "pipe-ft": lambda: pipe_ft_j(variables, audio),
        "pipe-thin": lambda: pipe_thin_j(variables, audio),
        "pipe-thin-ft": lambda: pipe_thin_ft_j(variables, audio),
        "pipe-grouped": lambda: pipe_grouped_j(variables, audio_g),
    }
    keys = os.environ.get("AB_KEYS")
    if keys:
        keep = {"noop", *keys.split(",")}
        fns = {k: v for k, v in fns.items() if k in keep}
    for name, fn in fns.items():
        t0 = time.time()
        np.asarray(peek(fn()))
        print(f"compiled {name:12s} in {time.time()-t0:6.1f} s", flush=True)

    if keys:
        # AB_KEYS run: skip the cross-pipeline parity block (it would
        # compile the unfiltered b2 variants)
        times = {k: [] for k in fns}
        for _ in range(reps):
            for name, fn in fns.items():
                t0 = time.time()
                np.asarray(peek(fn()))
                times[name].append(time.time() - t0)
        base = np.median(times["noop"]) if "noop" in times else 0.0
        for name, ts in times.items():
            med = np.median(ts)
            print(f"{name:14s} median {med*1000:8.1f} ms  (net {1000*(med-base):8.1f} ms)", flush=True)
        return

    # output parity of the full pipelines (bf16-vs-f32-feats tolerance)
    a, b = pipe_conv_j(variables, audio[:2]), pipe_pal_j(variables, audio[:2])
    c = pipe_ft_j(variables, audio[:2])
    th = pipe_thin_j(variables, audio[:2])
    for x, y, z, u in zip(*(jax.tree_util.tree_leaves(o) for o in (a, b, c, th))):
        d = np.abs(np.asarray(x[:2], np.float32) - np.asarray(y[:2], np.float32))
        dz = np.abs(np.asarray(y[:2], np.float32) - np.asarray(z[:2], np.float32))
        du = np.abs(np.asarray(y[:2], np.float32) - np.asarray(u[:2], np.float32))
        print(f"pipe max|d|={d.max():.3e}  ft-vs-tf={dz.max():.3e}  thin-vs-wide={du.max():.3e}", flush=True)

    times = {k: [] for k in fns}
    for _ in range(reps):
        for name, fn in fns.items():
            t0 = time.time()
            np.asarray(peek(fn()))
            times[name].append(time.time() - t0)
    print(f"\n=== medians over {reps} interleaved reps (batch={batch}) ===")
    for name, ts in times.items():
        print(
            f"{name:12s} {np.median(ts)*1000:8.1f} ms   "
            f"(min {min(ts)*1000:6.1f}, max {max(ts)*1000:6.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
