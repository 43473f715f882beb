#!/usr/bin/env python
"""Interleaved A/B: dw-kernel cotangent ingestion, CT relayout vs FTC direct.

The round-5 b32 trace put the stage-1 cotangent relayout at 26.4 ms/step
(fusion.50 + pad.18) feeding the dw kernel's channel-on-sublane layout.
`SELD_TRAIN_COT=ftc` instead reads the op's own FTC cotangent and transposes
(tt, cout) tiles in-kernel (chip-validated by check_pallas_compile under the
env). The env is read at TRACE time, so both variants build in ONE process
(same tunnel conditions — the only trustworthy comparison, CLAUDE.md).

Usage: AB_BATCH=32 python tools/ab_train_cot.py
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


def build(batch):
    import dataclasses

    from __graft_entry__ import _flagship_model
    from seld_tpu.config import SELDConfig
    from seld_tpu.training.steps import create_train_state, make_train_step

    model = dataclasses.replace(
        _flagship_model(4800), compute_dtype="bfloat16", remat=False
    )
    cfg = SELDConfig(
        output_classes=14, class_overlaps=3, lr=1e-4, input_channels=8,
        compute_dtype="bfloat16", use_remat=False,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 8, 256, 4800)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((batch, 600, 168)).astype(np.float32))
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x[:1])
    step = make_train_step(model, tx, cfg)
    return step, state, x, y


def main():
    batch = int(os.environ.get("AB_BATCH", "32"))
    reps = int(os.environ.get("AB_REPS", "7"))
    print(f"devices: {jax.devices()}", flush=True)
    step, state0, x, y = build(batch)

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    variants = {}
    for name in ("ct", "ftc"):
        os.environ["SELD_TRAIN_COT"] = name
        # a fresh jit wrapper per env value: the custom-VJP reads the env at
        # trace time, and a separate wrapper guarantees a separate trace
        variants[name] = jax.jit(lambda s, xx, yy: step(s, xx, yy))
        st, loss = variants[name](copy(state0), x, y)
        print(f"{name}: compiled; loss {float(loss):.4f}", flush=True)

    times = {k: [] for k in variants}
    losses = {}
    for _ in range(reps):
        for name, fn in variants.items():
            st = copy(state0)
            t0 = time.time()
            st, loss = fn(st, x, y)
            losses[name] = float(loss)  # device-to-host sync
            times[name].append(time.time() - t0)
    assert abs(losses["ct"] - losses["ftc"]) < 1e-2, losses
    for name, ts in times.items():
        print(
            f"{name}: median {np.median(ts)*1e3:.1f} ms "
            f"({batch/np.median(ts):.1f} clips/s)  "
            f"all {[f'{v*1e3:.0f}' for v in ts]}"
        )


if __name__ == "__main__":
    main()
