#!/usr/bin/env python
"""Per-op TPU profile of the serving pipeline stages (flagship, b16 bf16).

Times each piece with a device-to-host read per iteration (the only
trustworthy timing through the axon tunnel) and subtracts nothing: the ~27 ms
dispatch round-trip is visible in the no-op row. Run alone (ONE TPU process).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seld_tpu.data.features import spectrum_fast, stft_frames, _dft_matrices
from seld_tpu.ops.dual_quaternion import dual_quaternion_conv
from seld_tpu.models.layers import max_pool_2d, max_pool_time


def bench(name, fn, *args, iters=5, keep=False):
    # D2H-sync each iteration with a TINY read (the tunnel moves ~10 MB/s —
    # reading a full activation would swamp the timing). The read is a
    # separate dispatch over the already-materialized program output, so the
    # measured work is NOT sliced away by XLA; it adds one extra ~27 ms
    # round-trip, visible in the noop row (which pays the same two dispatches).
    fn_j = jax.jit(fn)
    peek = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[:8])
    try:
        out = fn_j(*args)
        np.asarray(peek(out))  # warmup
    except Exception as e:  # keep profiling the remaining rows (e.g. OOM)
        msg = str(e).splitlines()[0][:120]
        print(f"{name:38s}   FAILED: {msg}", flush=True)
        return None
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn_j(*args)
        np.asarray(peek(out))
        times.append(time.time() - t0)
    print(f"{name:38s} {np.median(times)*1000:8.1f} ms", flush=True)
    # free device buffers unless the caller reuses them — holding every row's
    # output OOMs the chip (the unpooled conv outputs are 7.5 GB each)
    if keep:
        return out
    del out
    return None


def main():
    B = int(os.environ.get("PROF_BATCH", "16"))
    sections = os.environ.get("PROF_SECTIONS", "stft,cnn,tcn").split(",")
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  batch={B}")

    # dispatch baseline (two dispatches, like every row below)
    tiny = jnp.zeros((8, 128), jnp.float32)
    bench("noop (dispatch baseline x2)", lambda t: t + 1.0, tiny)

    # ---- STFT pieces ----
    if "stft" in sections:
        _stft_section(B, rng)
    if "cnn" in sections:
        _cnn_section(B, rng)
    if "tcn" in sections:
        _tcn_section(B, rng)
    if "fused" in sections:
        _fused_section(B, rng)
    if "qmm" in sections:
        _qmm_section(B, rng)
    if "v3" in sections:
        _v3_section(B, rng)


def _stft_section(B, rng):
    audio = jnp.asarray(rng.standard_normal((B, 8, 32000 * 60)).astype(np.float32))
    bench("stft: framing only", lambda a: stft_frames(a, 512, 112)[..., :-1, :], audio)
    frames = jax.jit(lambda a: stft_frames(a, 512, 112)[..., :-1, :])(audio)
    frames = jax.block_until_ready(frames)
    cos_m, sin_m = _dft_matrices(512, skip_dc=True)
    cos_j, sin_j = jnp.asarray(cos_m), jnp.asarray(sin_m)

    def dft_only(fr, c, s):
        re = jnp.dot(fr, c, preferred_element_type=jnp.float32)
        im = -jnp.dot(fr, s, preferred_element_type=jnp.float32)
        return re, im

    re, im = bench("stft: DFT matmuls only", dft_only, frames, cos_j, sin_j, keep=True)

    def mag_t(re, im):
        re = jnp.swapaxes(re, -1, -2)
        im = jnp.swapaxes(im, -1, -2)
        return jnp.sqrt(re * re + im * im)

    bench("stft: transpose+magnitude", mag_t, re, im)

    def mag_then_t(re, im):
        m = jnp.sqrt(re * re + im * im)
        return jnp.swapaxes(m, -1, -2)

    bench("stft: magnitude-then-transpose", mag_then_t, re, im)

    bench(
        "stft: full spectrum_fast",
        lambda a: jax.vmap(
            lambda s: spectrum_fast(s, nperseg=512, noverlap=112, output_phase=False)
        )(a),
        audio,
    )

    # no-transpose variant: magnitude in (T, F) layout
    def stft_tf(a):
        fr = stft_frames(a, 512, 112)[..., :-1, :]
        re = jnp.dot(fr, cos_j, preferred_element_type=jnp.float32)
        im = jnp.dot(fr, sin_j, preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im)  # (B, C, T, F)

    bench("stft: full, (T,F) layout out", stft_tf, audio)

    # bf16 magnitude output
    def stft_tf_bf16(a):
        fr = stft_frames(a, 512, 112)[..., :-1, :]
        re = jnp.dot(fr, cos_j.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        im = jnp.dot(fr, sin_j.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im).astype(jnp.bfloat16)

    bench("stft: (T,F) bf16 dft+mag", stft_tf_bf16, audio)


def _cnn_section(B, rng):
    def dqconv_stage(pool):
        def fn(x, w):
            y = dual_quaternion_conv(x, w, None, stride=1, padding=1)
            y = jnp.maximum(y, 0)
            return max_pool_2d(y, pool)
        return fn

    x1 = jnp.asarray(rng.standard_normal((B, 256, 4800, 8)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((8, 3, 3, 1, 24)).astype(np.float32)).astype(jnp.bfloat16)
    bench("cnn1: DQconv 8->192 (256,4800)+pool", dqconv_stage((8, 1)), x1, w1)

    x2 = jnp.asarray(rng.standard_normal((B, 32, 4800, 192)).astype(np.float32)).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((8, 3, 3, 24, 24)).astype(np.float32)).astype(jnp.bfloat16)
    bench("cnn2: DQconv 192->192 (32,4800)+pool", dqconv_stage((8, 1)), x2, w2)

    x3 = jnp.asarray(rng.standard_normal((B, 4, 4800, 192)).astype(np.float32)).astype(jnp.bfloat16)
    bench("cnn3: DQconv 192->192 (4,4800)+pool", dqconv_stage((2, 1)), x3, w2)

    # conv-only versions (no relu/pool) to isolate
    bench(
        "cnn1 conv only (b4)",
        lambda x, w: dual_quaternion_conv(x, w, None, stride=1, padding=1),
        x1[:4], w1,
    )
    bench(
        "cnn2 conv only (b4)",
        lambda x, w: dual_quaternion_conv(x, w, None, stride=1, padding=1),
        x2[:4], w2,
    )


def _tcn_section(B, rng):
    xt = jnp.asarray(rng.standard_normal((B, 4800, 384)).astype(np.float32)).astype(jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((8, 3, 48, 48)).astype(np.float32)).astype(jnp.bfloat16)
    wp = jnp.asarray(rng.standard_normal((8, 1, 48, 48)).astype(np.float32)).astype(jnp.bfloat16)

    def resblock_convs(x, wf, wg, ws, wr):
        f = dual_quaternion_conv(x, wf, None, padding=55, dilation=55)
        g = dual_quaternion_conv(x, wg, None, padding=55, dilation=55)
        y = jnp.tanh(f) * jax.nn.sigmoid(g)
        skip = dual_quaternion_conv(y, ws, None)
        res = dual_quaternion_conv(y, wr, None)
        return x + res, skip

    bench("tcn: 1 resblock convs (dil 55)", resblock_convs, xt, wt, wt, wp, wp)
    bench(
        "tcn: pointwise 1x1 384->384",
        lambda x, w: dual_quaternion_conv(x, w, None),
        xt, wp,
    )
    bench(
        "tcn: dilated conv only (dil 55)",
        lambda x, w: dual_quaternion_conv(x, w, None, padding=55, dilation=55),
        xt, wt,
    )


def _fused_section(B, rng):
    """Round-2 candidates vs their XLA baselines at flagship shapes."""
    from seld_tpu.ops.hamilton import assemble_dq_conv_kernel
    from seld_tpu.ops.pallas.conv2d_pool import (
        conv2d_bn_relu_fpool,
        conv2d_im2col_bn_relu_fpool,
    )

    def stage(kernel_fn, pool_f):
        def fn(x, w, s, b):
            return kernel_fn(x, w, s, b, pool_f=pool_f)
        return fn

    # stage 1: cin=8 -> 192
    x1 = jnp.asarray(rng.standard_normal((B, 256, 4800, 8)).astype(np.float32)).astype(jnp.bfloat16)
    w1c = jnp.asarray(rng.standard_normal((8, 3, 3, 1, 24)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jax.jit(assemble_dq_conv_kernel)(w1c)
    s1 = jnp.asarray(rng.standard_normal(192).astype(np.float32)).astype(jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(192).astype(np.float32)).astype(jnp.bfloat16)
    bench("fused1: im2col kernel (K=72)", stage(conv2d_im2col_bn_relu_fpool, 8), x1, w1, s1, b1)
    # at b16 the materialized patches OOM (Pallas default layout pads 72->128
    # lanes; the slice temps pad 8->128 = 16x) — measure the per-clip rate at b4
    x1s = x1[:4]
    bench("fused1: im2col kernel (K=72) b4", stage(conv2d_im2col_bn_relu_fpool, 8), x1s, w1, s1, b1)
    bench("fused1: windows kernel b4", stage(conv2d_bn_relu_fpool, 8), x1s, w1, s1, b1)
    bench("fused1: windows kernel (K=8/tap)", stage(conv2d_bn_relu_fpool, 8), x1, w1, s1, b1)

    # stage 2: cin=192 windows kernel
    x2 = jnp.asarray(rng.standard_normal((B, 32, 4800, 192)).astype(np.float32)).astype(jnp.bfloat16)
    w2c = jnp.asarray(rng.standard_normal((8, 3, 3, 24, 24)).astype(np.float32)).astype(jnp.bfloat16)
    w2 = jax.jit(assemble_dq_conv_kernel)(w2c)
    bench("fused2: windows kernel (K=192/tap)", stage(conv2d_bn_relu_fpool, 8), x2, w2, s1, b1)

    x3 = jnp.asarray(rng.standard_normal((B, 4, 4800, 192)).astype(np.float32)).astype(jnp.bfloat16)
    bench("fused3: windows kernel (K=192/tap)", stage(conv2d_bn_relu_fpool, 2), x3, w2, s1, b1)

    # new block-matmul STFT
    from seld_tpu.data.features import spectrum_fast

    audio = jnp.asarray(rng.standard_normal((B, 8, 32000 * 60)).astype(np.float32))
    bench(
        "stft v2: block-matmul spectrum_fast",
        lambda a: jax.vmap(
            lambda s: spectrum_fast(s, nperseg=512, noverlap=112, output_phase=False)
        )(a),
        audio,
    )


def _qmm_section(B, rng):
    """Hamilton 1x1-conv matmul: Pallas fused vs XLA assemble+dot, flagship shapes."""
    from seld_tpu.ops.pallas.qmatmul import pallas_dq_linear, pallas_q_linear
    from seld_tpu.ops.quaternion import quaternion_linear
    from seld_tpu.ops.dual_quaternion import dual_quaternion_linear

    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        xt = jnp.asarray(rng.standard_normal((B * 4800, 384)).astype(np.float32)).astype(dtype)
        w8 = jnp.asarray(rng.standard_normal((8, 48, 48)).astype(np.float32)).astype(dtype)
        w4 = jnp.asarray(rng.standard_normal((4, 96, 96)).astype(np.float32)).astype(dtype)
        bench(f"qmm {tag}: XLA DQ 384x384", lambda x, w: dual_quaternion_linear(x, w, None), xt, w8)
        bench(f"qmm {tag}: Pallas DQ 384x384", lambda x, w: pallas_dq_linear(x, w, None, conv_table=True), xt, w8)
        bench(f"qmm {tag}: XLA Q 384x384", lambda x, w: quaternion_linear(x, w, None), xt, w4)
        bench(f"qmm {tag}: Pallas Q 384x384", lambda x, w: pallas_q_linear(x, w, None), xt, w4)

    # int8 PTQ path (serving): dynamic act quant + int8 MXU dot
    from seld_tpu.ops.hamilton import assemble_dq_conv_kernel
    from seld_tpu.ops.pallas.quant import int8_matmul, quantize_weight_per_channel

    xt = jnp.asarray(rng.standard_normal((B * 4800, 384)).astype(np.float32)).astype(jnp.bfloat16)
    w8 = jnp.asarray(rng.standard_normal((8, 48, 48)).astype(np.float32))
    wq, ws = jax.jit(lambda w: quantize_weight_per_channel(assemble_dq_conv_kernel(w)))(w8)
    bench("qmm int8: PTQ DQ 384x384", lambda x, q, s: int8_matmul(x, q, s, None), xt, wq, ws)


def _v3_section(B, rng):
    """Round-2b: smallcin stage-1 kernel + hybrid fused_infer vs model.apply."""
    import dataclasses

    from seld_tpu.ops.hamilton import assemble_dq_conv_kernel
    from seld_tpu.ops.pallas.conv2d_pool import conv2d_smallcin_bn_relu_fpool

    x1 = jnp.asarray(rng.standard_normal((B, 256, 4800, 8)).astype(np.float32)).astype(jnp.bfloat16)
    w1c = jnp.asarray(rng.standard_normal((8, 3, 3, 1, 24)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jax.jit(assemble_dq_conv_kernel)(w1c)
    s1 = jnp.asarray(rng.standard_normal(192).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(192).astype(np.float32))
    bench(
        "v3 stage1: smallcin kernel (K=96)",
        lambda x, w, s, b: conv2d_smallcin_bn_relu_fpool(x, w, s, b, pool_f=8),
        x1, w1, s1, b1,
    )
    del x1, w1

    from __graft_entry__ import _flagship_model
    from seld_tpu.models.fused_infer import fused_infer

    model = dataclasses.replace(_flagship_model(4800), compute_dtype="bfloat16")
    x = jnp.asarray(rng.standard_normal((B, 8, 256, 4800)).astype(np.float32))
    variables = jax.jit(lambda k, inp: model.init(k, inp, train=False))(
        jax.random.PRNGKey(0), x[:1]
    )
    bench("v3 model.apply (bf16)", lambda v, xx: model.apply(v, xx, train=False), variables, x)
    bench("v3 fused_infer (bf16)", lambda v, xx: fused_infer(model, v, xx), variables, x)


if __name__ == "__main__":
    main()
