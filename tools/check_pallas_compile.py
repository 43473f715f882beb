#!/usr/bin/env python
"""AOT-compile every Pallas kernel at flagship shapes on the real TPU.

Interpret-mode tests (the CPU suite) do NOT catch Mosaic lowering
constraints — 8-aligned sublane slices, 128-multiple lanes, layout pins
(CLAUDE.md) — only a real TPU compile does. This script lowers + compiles
each kernel entry point at the shapes serving/training actually uses,
WITHOUT executing (AOT), so it's fast and safe to run alongside nothing
else touching the chip.

Part of the verify recipe (.claude/skills/verify/SKILL.md). Exit code 0 =
all kernels lower; nonzero prints the failing kernel + Mosaic error.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("CHECK_BATCH", "16"))
FAILS = []


def check(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"OK    {name}", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"FAIL  {name}: {msg}", flush=True)
        FAILS.append(name)


def shaped(shape, dtype=jnp.bfloat16):
    return jax.ShapeDtypeStruct(shape, dtype)


def exec_smallcin_vs_xla():
    """Execute-and-compare: the real-TPU smallcin path (_smallcin_kernel_win,
    Element-indexed F-windows) is a DIFFERENT kernel + packing than the
    interpret path the CPU tests pin (ADVICE r2) — run it on the chip at a
    small shape against the XLA conv oracle so window-indexing bugs can't
    ship silently into serving."""
    from seld_tpu.ops.pallas.conv2d_pool import conv2d_smallcin_bn_relu_fpool

    rng = np.random.default_rng(0)
    b, f, t, cin, cout, pf = 2, 32, 640, 8, 32, 8
    x = jnp.asarray(rng.standard_normal((b, f, t, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal(cout).astype(np.float32))

    def oracle(x, w, s, bb):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jnp.maximum(y * s + bb, 0.0)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, pf, 1, 1), (1, pf, 1, 1), "VALID"
        )

    try:
        got = np.asarray(
            jax.jit(
                lambda *a: conv2d_smallcin_bn_relu_fpool(*a, pool_f=pf)
            )(x, w, s, bb)
        )
        want = np.asarray(jax.jit(oracle)(x, w, s, bb))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
        print("OK    smallcin Element-window kernel EXECUTES == XLA oracle", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"FAIL  smallcin execute-and-compare: {msg}", flush=True)
        FAILS.append("smallcin exec-compare")


def main():
    print(f"devices: {jax.devices()}", flush=True)

    from seld_tpu.ops.pallas.attention import flash_attention
    from seld_tpu.ops.pallas.conv2d_pool import (
        conv2d_bn_relu_fpool,
        conv2d_smallcin_bn_relu_fpool,
    )
    from seld_tpu.ops.pallas.qmatmul import pallas_dq_linear, pallas_q_linear
    from seld_tpu.ops.pallas.quant import int8_matmul

    # flagship front-end stage 1: (B, 256, 4800, 8) x (3,3,8,192), pool 8
    check(
        "conv2d_smallcin_bn_relu_fpool (stage1 bf16)",
        lambda x, w, s, b: conv2d_smallcin_bn_relu_fpool(x, w, s, b, pool_f=8),
        shaped((B, 256, 4800, 8)), shaped((3, 3, 8, 192)),
        shaped((192,), jnp.float32), shaped((192,), jnp.float32),
    )
    # wide-channel windows kernel: stage 2 shape
    check(
        "conv2d_bn_relu_fpool (stage2 bf16)",
        lambda x, w, s, b: conv2d_bn_relu_fpool(x, w, s, b, pool_f=8),
        shaped((4, 32, 4800, 192)), shaped((3, 3, 192, 192)),
        shaped((192,), jnp.bfloat16), shaped((192,), jnp.bfloat16),
    )
    # flash attention fwd+bwd at the TCN's T=2400, H=8, D=48
    check(
        "flash_attention fwd (T=2400 bf16)",
        lambda q, k, v: flash_attention(q, k, v, scale=1.0 / np.sqrt(48.0)),
        shaped((B, 2400, 8, 48)), shaped((B, 2400, 8, 48)), shaped((B, 2400, 8, 48)),
    )
    check(
        "flash_attention grad (T=2400 bf16)",
        lambda q, k, v: jax.grad(
            lambda q, k, v: flash_attention(q, k, v, scale=1.0 / np.sqrt(48.0))
            .astype(jnp.float32)
            .sum()
        )(q, k, v),
        shaped((4, 2400, 8, 48)), shaped((4, 2400, 8, 48)), shaped((4, 2400, 8, 48)),
    )
    # Hamilton matmuls at the TCN pointwise width (384 = 8 * 48 DQ)
    check(
        "pallas_q_linear (384x384 f32)",
        lambda x, w: pallas_q_linear(x, w),
        shaped((B * 2400, 384), jnp.float32), shaped((4, 96, 96), jnp.float32),
    )
    check(
        "pallas_dq_linear (384x384 f32)",
        lambda x, w: pallas_dq_linear(x, w),
        shaped((B * 2400, 384), jnp.float32), shaped((8, 48, 48), jnp.float32),
    )
    check(
        "int8_matmul (384x384)",
        lambda x, q, s: int8_matmul(x, q, s, None),
        shaped((B * 2400, 384), jnp.bfloat16),
        shaped((384, 384), jnp.int8), shaped((384,), jnp.float32),
    )

    exec_smallcin_vs_xla()

    if FAILS:
        print(f"\n{len(FAILS)} kernel(s) FAILED to lower: {FAILS}")
        sys.exit(1)
    print("\nall Pallas kernels lower on this TPU")


if __name__ == "__main__":
    main()
