#!/usr/bin/env python
"""Flagship training-step throughput on the real TPU.

Measures the fused fwd+bwd+Adam step (training/steps.py, remat on) at the
requested (dtype, batch) points and prints ms/step + clips/sec. Results are
recorded in BENCH.md's training table. OOMs are reported per-point, not
fatal.

Usage: TB_POINTS="float32:4,float32:8,bfloat16:8" python tools/train_bench.py
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


def run_point(dtype: str, batch: int, iters: int = 5):
    import dataclasses

    from __graft_entry__ import _flagship_model
    from seld_tpu.config import SELDConfig
    from seld_tpu.training.steps import create_train_state, make_train_step

    model = dataclasses.replace(
        _flagship_model(4800),
        compute_dtype=dtype,
        attention_impl=os.environ.get("TB_ATTN", "auto"),
        frontend_bands=int(os.environ.get("TB_BANDS", "0")),
        frontend_impl=os.environ.get("TB_FRONTEND", "auto"),
        # 'auto' = dtype-resolved like config.resolve_use_remat: off for
        # bf16 (measured best), on for f32. 'frontend' = one remat region
        # over the CNN stages (the b64 unlock).
        remat=(
            (dtype == "float32")
            if os.environ.get("TB_REMAT", "auto") == "auto"
            else (
                "frontend"
                if os.environ.get("TB_REMAT") == "frontend"
                else os.environ.get("TB_REMAT") == "1"
            )
        ),
    )
    cfg = SELDConfig(
        output_classes=14, class_overlaps=3, lr=1e-4,
        input_channels=8, compute_dtype=dtype,
        grad_accum_steps=int(os.environ.get("TB_ACCUM", "1")),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 8, 256, 4800)).astype(np.float32))
    y = jnp.asarray(
        rng.standard_normal((batch, 600, 42 + 126)).astype(np.float32)
    )
    t0 = time.time()
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x[:1])
    step = make_train_step(model, tx, cfg)
    state, loss0 = step(state, x, y)
    np.asarray(loss0)
    print(f"  compile+first step: {time.time()-t0:.0f} s", flush=True)
    times, losses = [], []
    for _ in range(iters):
        t0 = time.time()
        state, loss = step(state, x, y)
        losses.append(float(np.asarray(loss)))
        times.append(time.time() - t0)
    ms = float(np.median(times)) * 1000.0
    print(
        f"  {dtype} b{batch}: {ms:.0f} ms/step, {batch/(ms/1000):.1f} clips/s, "
        f"loss {losses[0]:.3f} -> {losses[-1]:.3f}",
        flush=True,
    )


def main():
    points = os.environ.get("TB_POINTS", "float32:4,float32:8,bfloat16:8")
    print(f"devices: {jax.devices()}", flush=True)
    for p in points.split(","):
        dtype, b = p.split(":")
        print(f"point {dtype} batch={b}", flush=True)
        try:
            run_point(dtype, int(b))
        except Exception as e:
            print(f"  FAILED: {str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
