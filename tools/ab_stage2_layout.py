#!/usr/bin/env python
"""Interleaved A/B: stage-2 TRAIN composition, channel-last vs CT layout.

The round-4 b32 training trace (BENCH.md) attributes ~41 ms/step to the
stage-1 kernel's boundary relayouts (fusion.37: CT -> channel-last output
transpose + slice + dropout, 20.7 ms; fusion.42: the cotangent relayout
back, 20.6 ms) and ~27.6 ms to stage-2's own channel-last <-> conv-layout
copies. If the stage-2 XLA stage can run DIRECTLY on the stage-1 kernel's
native (B, F', C, T) channel-on-sublane tensor — lax.conv_general_dilated
accepts arbitrary dimension_numbers ("NHCW") — all three orbits shrink:
stage-1 emits out_layout='CT' (already supported by the train op), the
boundary transposes disappear, and the final TCN flatten is channel-major
from CT for free.

This tool measures whether XLA's TPU conv emitter actually tolerates the
NHCW layout (it may canonicalize via the very transposes we want to kill)
at the exact stage-2 train shapes: fwd conv + batch-stats BN + ReLU +
freq-pool, then grads wrt (w, x). Variant A includes the boundary
transposes a CT-producing stage 1 forces on the channel-last formulation;
variant B consumes CT natively.

Usage: AB_BATCH=32 python tools/ab_stage2_layout.py
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


def _bn_relu(y, gamma, beta, axes, cax, eps=1e-5):
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=axes, keepdims=True)
    var = jnp.maximum(jnp.mean(yf * yf, axis=axes, keepdims=True) - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    shape = [1] * y.ndim
    shape[cax] = y.shape[cax]
    scale = (gamma.reshape(shape) * inv).astype(y.dtype)
    bias = (beta.reshape(shape) - mean * gamma.reshape(shape) * inv).astype(y.dtype)
    return jnp.maximum(y * scale + bias, 0.0)


def main():
    batch = int(os.environ.get("AB_BATCH", "32"))
    reps = int(os.environ.get("AB_REPS", "7"))
    f = int(os.environ.get("AB_F", "32"))
    c = int(os.environ.get("AB_C", "192"))
    t = int(os.environ.get("AB_T", "4800"))
    tpad = int(os.environ.get("AB_TPAD", str(t + 64)))
    pf = 8
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    # stage-1 train kernel's native output: (B, F', Cout, tpad), cols >= t zero
    x_ct = jnp.asarray(
        rng.standard_normal((batch, f, c, tpad)).astype(np.float32)
    ).astype(jnp.bfloat16)
    x_ct = x_ct * (jnp.arange(tpad) < t).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.05).astype(
        jnp.bfloat16
    )
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)

    def pool_f_axis1(y, pf):
        # freq maxpool via reduce_window on axis 1 (both variants identical)
        dims = [1] * y.ndim
        dims[1] = pf
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, tuple(dims), tuple(dims), "VALID",
        )

    def variant_a(w, x_ct):
        # current formulation: CT -> channel-last boundary transpose (the
        # fusion.37 analog), NHWC conv, pool, and the loss pulls the x
        # cotangent back through the transpose (fusion.42 analog)
        x = jnp.transpose(x_ct[..., :t], (0, 1, 3, 2))  # (B, F, T, C)
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = _bn_relu(y, gamma, beta, axes=(0, 1, 2), cax=3)
        y = pool_f_axis1(y, pf)
        return jnp.sum(y.astype(jnp.float32))

    def variant_b(w, x_ct):
        # CT-native: conv runs with NHCW dimension numbers, no boundary
        # transposes anywhere; padded time columns are zero == the conv's
        # own zero padding, so convolve the tpad width and slice after
        y = jax.lax.conv_general_dilated(
            x_ct, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHCW", "HWIO", "NHCW"),
        )[..., :t]
        y = _bn_relu(y, gamma, beta, axes=(0, 1, 3), cax=2)
        y = pool_f_axis1(y, pf)
        return jnp.sum(y.astype(jnp.float32))

    grads = {
        "A_channel_last": jax.jit(jax.grad(variant_a, argnums=(0, 1))),
        "B_ct_nhcw": jax.jit(jax.grad(variant_b, argnums=(0, 1))),
    }
    peek = jax.jit(lambda g: g[0].astype(jnp.float32).ravel()[:8])

    outs = {}
    for name, fn in grads.items():
        g = fn(w, x_ct)
        outs[name] = np.asarray(peek(g))
        print(f"{name}: compiled; dW peek {outs[name][:4]}", flush=True)
    np.testing.assert_allclose(
        outs["A_channel_last"], outs["B_ct_nhcw"], rtol=2e-2, atol=1e-2
    )

    times = {k: [] for k in grads}
    for _ in range(reps):
        for name, fn in grads.items():
            t0 = time.time()
            g = fn(w, x_ct)
            np.asarray(peek(g))
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name}: median {np.median(ts)*1e3:.1f} ms  all {[f'{x*1e3:.0f}' for x in ts]}")


if __name__ == "__main__":
    main()
