#!/usr/bin/env python
"""Interleaved A/B serving benchmark on the real TPU.

The axon tunnel adds run-to-run jitter of up to ~25% BETWEEN processes
(BENCH.md), which round 2 learned the hard way: sequential bench runs of
different code read as regressions that were really noise. This tool times
all variants round-robin INSIDE one process, so every variant sees the same
tunnel/host conditions, and reports per-variant medians.

Round-2 verdicts recorded in BENCH.md (2026-08-16, b16 bf16, ~29 ms
dispatch floor):
  - STFT offset-slice tail dot 67.8 ms vs clean-reshape + zero-padded tail
    matrix (1.56x FLOPs) 85.6 ms -> the offset-slice version stays.
  - bf16 DFT operands 84.4 vs 85.6 ms f32 -> wash; STFT stays f32.
  - conv1d-as-k-shifted-matmuls: apply 126.5 vs 115.6, fused 102.9 vs
    91.1 ms -> ~10% regression (misaligned dilation-offset slices); removed.
  - fused_infer 91.1 ms vs model.apply 115.6 ms -> fused is the serving
    default.
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


def main():
    batch = int(os.environ.get("AB_BATCH", "16"))
    reps = int(os.environ.get("AB_REPS", "7"))
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    import dataclasses

    from __graft_entry__ import _flagship_model
    from seld_tpu.models.fused_infer import fused_infer

    audio = jnp.asarray(rng.standard_normal((batch, 8, 1920000)).astype(np.float32))
    model = dataclasses.replace(_flagship_model(4800), compute_dtype="bfloat16")
    feats = jnp.asarray(
        rng.standard_normal((batch, 8, 256, 4800)).astype(np.float32)
    )
    variables = jax.jit(lambda k, inp: model.init(k, inp, train=False))(
        jax.random.PRNGKey(0), feats[:1]
    )

    peek = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[:8])

    stft_j = jax.jit(
        lambda a: jax.vmap(
            lambda s: spectrum_fast(s, nperseg=512, noverlap=112, output_phase=False)
        )(a)
    )
    apply_j = jax.jit(lambda v, x: model.apply(v, x, train=False))
    fused_j = jax.jit(lambda v, x: fused_infer(model, v, x))

    pipe1_j = jax.jit(
        lambda v, a: fused_infer(
            model,
            v,
            jax.vmap(
                lambda s: spectrum_fast(
                    s, nperseg=512, noverlap=112, output_phase=False
                )
            )(a),
        )
    )

    fns = {
        "noop": lambda: jnp.float32(0.0) * 1.0,
        "stft": lambda: stft_j(audio),
        "apply": lambda: apply_j(variables, feats),
        "fused": lambda: fused_j(variables, feats),
        "pipe-1jit": lambda: pipe1_j(variables, audio),
        "pipe-2disp": lambda: fused_j(variables, stft_j(audio)),
    }
    for name, fn in fns.items():
        t0 = time.time()
        np.asarray(peek(fn()))
        print(f"compiled {name:8s} in {time.time()-t0:6.1f} s", flush=True)

    times = {k: [] for k in fns}
    for _ in range(reps):
        for name, fn in fns.items():
            t0 = time.time()
            np.asarray(peek(fn()))
            times[name].append(time.time() - t0)
    print(f"\n=== medians over {reps} interleaved reps (batch={batch}) ===")
    for name, ts in times.items():
        print(
            f"{name:8s} {np.median(ts)*1000:8.1f} ms   "
            f"(min {min(ts)*1000:6.1f}, max {max(ts)*1000:6.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
