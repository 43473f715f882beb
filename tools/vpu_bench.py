#!/usr/bin/env python
"""VPU transcendental-throughput microbenchmark on the real TPU.

Calibrates elems/sec for tanh / sigmoid / exp / the gate tanh(f)*sigmoid(g)
composite, plus a pure-copy baseline, at serving-like tensor sizes. This
pins whether the TCN's measured ~30 ms of elementwise time (BENCH.md
round-3 notes) is VPU-ALU-bound (fix = fewer/cheaper transcendentals or
MXU overlap) or memory-bound (fix = fusion/layout).

Each op runs in an in-jit x8 repeat loop with a dependency chain (output
feeds next input through a cheap re-scale that prevents hoisting), timed
with a device-to-host peek read; reports ns/elem and effective G-elems/s.
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

REPS = 8


def timed(name, fn, *args, n_elems):
    jfn = jax.jit(fn)
    out = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
    times = []
    for _ in range(5):
        t0 = time.time()
        out = jfn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
        times.append(time.time() - t0)
    dt = float(np.median(times))
    per = dt / REPS
    print(
        f"{name:26s} {per*1000:8.2f} ms/pass  "
        f"{n_elems/per/1e9:8.2f} Gelem/s  ({per/n_elems*1e9:6.3f} ns/elem)",
        flush=True,
    )
    return per


def loop(op):
    def fn(x):
        def body(i, x):
            # rescale keeps values in a sane range and defeats hoisting
            return op(x) * 0.99 + 0.001
        return jax.lax.fori_loop(0, REPS, body, x)
    return fn


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    # serving-like: (16, 4800, 384) bf16 = 29.5M elems, 56 MB
    shape = (16, 4800, 384)
    n = int(np.prod(shape))
    xb = jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16)
    xf = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    for dt, x in (("bf16", xb), ("f32", xf)):
        print(f"--- dtype {dt} ---")
        timed(f"copy*1.01 ({dt})", loop(lambda x: x * 1.01), x, n_elems=n)
        timed(f"tanh ({dt})", loop(jnp.tanh), x, n_elems=n)
        timed(f"sigmoid ({dt})", loop(jax.nn.sigmoid), x, n_elems=n)
        timed(f"exp ({dt})", loop(jnp.exp), x, n_elems=n)
        timed(
            f"gate tanh*sig ({dt})",
            loop(lambda x: jnp.tanh(x) * jax.nn.sigmoid(x)),
            x, n_elems=n,
        )
        timed(
            f"gate exp-form ({dt})",
            loop(
                lambda x: (1.0 - 2.0 / (1.0 + jnp.exp(2.0 * x)))
                * (1.0 / (1.0 + jnp.exp(-x)))
            ),
            x, n_elems=n,
        )

    # does the tanh hide behind a matmul? conv-sized dot with tanh epilogue
    w = jnp.asarray(rng.standard_normal((384, 768)).astype(np.float32)).astype(jnp.bfloat16)
    x2 = xb.reshape(-1, 384)

    def mm(x):
        def body(i, x):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return y[:, :384].astype(jnp.bfloat16) * 0.01
        return jax.lax.fori_loop(0, REPS, body, x)

    def mm_tanh(x):
        def body(i, x):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            y = jnp.tanh(y[:, :384]) * jax.nn.sigmoid(y[:, 384:])
            return y.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, REPS, body, x)

    print("--- matmul overlap (76800x384 @ 384x768 bf16) ---")
    timed("dot alone", mm, x2, n_elems=n)
    timed("dot + gate epilogue", mm_tanh, x2, n_elems=n)


if __name__ == "__main__":
    main()
