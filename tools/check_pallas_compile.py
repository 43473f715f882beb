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


def exec_smallcin_thin_vs_xla():
    """Execute-and-compare the THIN-pack smallcin kernel (in-kernel dx-tap
    assembly from a 128-lane halo — misaligned value slices + sublane
    concat, the Mosaic ops interpret mode never lowers) vs the XLA oracle,
    and time it against the wide pack at the flagship serving shape."""
    from seld_tpu.ops.pallas.conv2d_pool import (
        conv2d_smallcin_bn_relu_fpool, conv2d_smallcin_thin_bn_relu_fpool,
    )

    rng = np.random.default_rng(0)
    b, f, t, cin, cout, pf = 2, 32, 640, 8, 32, 8
    x = jnp.asarray(rng.standard_normal((b, f, t, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    try:
        got = np.asarray(
            jax.jit(
                lambda *a: conv2d_smallcin_thin_bn_relu_fpool(*a, pool_f=pf)
            )(x, w, s, bb)
        )
        want = np.asarray(
            jax.jit(
                lambda *a: conv2d_smallcin_bn_relu_fpool(*a, pool_f=pf)
            )(x, w, s, bb)
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
        print("OK    smallcin THIN kernel EXECUTES == wide kernel", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"FAIL  smallcin-thin execute-and-compare: {msg}", flush=True)
        FAILS.append("smallcin-thin exec-compare")


def exec_widecin_ct_vs_xla():
    """Execute-and-compare the CT-layout wide stage kernel on the chip (the
    real-TPU path uses Element windows + pltpu.roll tap assembly the
    interpret tests never lower) vs the XLA conv oracle."""
    from seld_tpu.ops.pallas.conv2d_pool import conv2d_widecin_ct_bn_relu_fpool

    rng = np.random.default_rng(5)
    b, f, t, c, cout, pf = 2, 32, 640, 24, 32, 8
    x = jnp.asarray(rng.standard_normal((b, f, t, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, c, cout)).astype(np.float32) * 0.1)
    s = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
    try:
        h_ct = jnp.pad(
            jnp.transpose(x, (0, 1, 3, 2)), ((0, 0), (0, 0), (0, 0), (0, 128))
        )
        got_ct = jax.jit(
            lambda h, w, s, bb: conv2d_widecin_ct_bn_relu_fpool(
                h, t, w, s, bb, pool_f=pf
            )
        )(h_ct, w, s, bb)
        got = np.asarray(jnp.transpose(got_ct[..., :t], (0, 1, 3, 2)))

        def oracle(x, w, s, bb):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = jnp.maximum(y * s + bb, 0.0)
            return jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max, (1, pf, 1, 1), (1, pf, 1, 1), "VALID"
            )

        want = np.asarray(jax.jit(oracle)(x, w, s, bb))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
        assert not np.any(np.asarray(got_ct[..., t:])), "tpad columns not zero"
        print("OK    widecin CT kernel EXECUTES == XLA oracle", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200] or str(e).splitlines()[1][:200]
        print(f"FAIL  widecin-ct execute-and-compare: {msg}", flush=True)
        FAILS.append("widecin-ct exec-compare")


def exec_cth_chain_vs_ct():
    """Execute-and-compare the halo'd CTH handoff on the chip: thin
    smallcin(out_layout='CTH') -> widecin(pre_halo=True) must match the
    pad-based CT chain bit-for-bit. The compiled CTH path (extended grid,
    pl.when border zeroing, offset Element windows) never runs under the
    interpreter — only a chip execution validates it."""
    from seld_tpu.ops.pallas.conv2d_pool import (
        CT_HALO,
        conv2d_smallcin_thin_bn_relu_fpool,
        conv2d_widecin_ct_bn_relu_fpool,
    )

    rng = np.random.default_rng(11)
    b, f, t, cin, c1, c2, pf = 2, 32, 640, 8, 32, 32, 8
    x = jnp.asarray(rng.standard_normal((b, f, t, cin)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, cin, c1)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c1, c2)).astype(np.float32) * 0.1)
    s1 = jnp.asarray(rng.standard_normal(c1).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(c1).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal(c2).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(c2).astype(np.float32))
    try:
        @jax.jit
        def chain_cth(x, w1, s1, b1, w2, s2, b2):
            h = conv2d_smallcin_thin_bn_relu_fpool(
                x, w1, s1, b1, pool_f=pf, out_layout="CTH"
            )
            return h, conv2d_widecin_ct_bn_relu_fpool(
                h, t, w2, s2, b2, pool_f=4, block_t=CT_HALO, pre_halo=True
            )

        @jax.jit
        def chain_ct(x, w1, s1, b1, w2, s2, b2):
            h = conv2d_smallcin_thin_bn_relu_fpool(
                x, w1, s1, b1, pool_f=pf, out_layout="CT"
            )
            return conv2d_widecin_ct_bn_relu_fpool(
                h, t, w2, s2, b2, pool_f=4, block_t=CT_HALO
            )

        h_cth, got = chain_cth(x, w1, s1, b1, w2, s2, b2)
        want = np.asarray(chain_ct(x, w1, s1, b1, w2, s2, b2))
        h_cth = np.asarray(h_cth)
        tpad_h = -(-t // CT_HALO) * CT_HALO
        assert h_cth.shape == (b, f // pf + 2, c1, 2 * CT_HALO + tpad_h), h_cth.shape
        assert not h_cth[:, 0].any() and not h_cth[:, -1].any(), "F borders"
        assert not h_cth[..., :CT_HALO].any(), "lane halo"
        assert not h_cth[..., CT_HALO + t :].any(), "tail zeros"
        np.testing.assert_array_equal(np.asarray(got), want)
        print("OK    CTH halo chain EXECUTES == pad-based CT chain", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"FAIL  CTH-chain execute-and-compare: {msg}", flush=True)
        FAILS.append("cth-chain exec-compare")


def probe_misaligned_slice_dot():
    """PROBE (not a gate): can a Mosaic dot consume a lane-MISALIGNED value
    slice directly? The widecin kernel currently pays an f32 pltpu.roll
    round-trip per dx tap because tpu.concatenate rejects mismatched lane
    offsets — but widecin feeds each tap to its OWN dot (no concat), so if
    dots accept offset-127/1 slices the rolls can go."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, w_ref, o_ref):
        acc = None
        for dx in range(3):
            tap = x_ref[0][:, 127 + dx : 127 + dx + 256]  # lane offsets 127/0/1
            d = jax.lax.dot_general(
                w_ref[dx], tap, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        o_ref[0] = acc.astype(o_ref.dtype)

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 16, 512)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 16, 32)).astype(np.float32)).astype(jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kern,
            grid=(2,),
            in_specs=[
                pl.BlockSpec((1, 16, 512), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 16, 32), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 32, 256), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, 32, 256), jnp.bfloat16),
        )(x, w)
        xf = np.asarray(x, np.float32)
        wf = np.asarray(w, np.float32)
        want = sum(
            np.einsum("kc,bkt->bct", wf[dx], xf[:, :, 127 + dx : 127 + dx + 256])
            for dx in range(3)
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), want, atol=0.1, rtol=0.05
        )
        print("PROBE misaligned-slice dot: LOWERS and matches (rolls removable)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"PROBE misaligned-slice dot: NO ({msg})", flush=True)


def exec_train_stage_vs_xla():
    """Execute-and-compare the fused TRAIN-mode stage-1 op (fwd + custom-VJP
    grads) on the chip against the XLA composition — the real-TPU path uses
    the Element-window kernels the interpret tests never lower."""
    from seld_tpu.ops.pallas.conv2d_train import conv2d_smallcin_bn_relu_fpool_train

    rng = np.random.default_rng(3)
    b, f, t, cin, cout, pf = 2, 32, 640, 8, 32, 8
    x = jnp.asarray(rng.standard_normal((b, f, t, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(cout).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(cout).astype(np.float32))

    def oracle(x, w, gamma, beta):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y - mean), axis=(0, 1, 2))
        yn = (y - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        out = jax.lax.reduce_window(
            jnp.maximum(yn, 0.0), -jnp.inf, jax.lax.max,
            (1, pf, 1, 1), (1, pf, 1, 1), "VALID",
        )
        return out, mean, var

    def loss(op):
        def f(w, gamma, beta):
            out, mean, var = op(x, w, gamma, beta)
            return jnp.sum(out * jnp.cos(out)), (out, mean, var)
        return f

    (lo, (oo, mo, vo)), go = jax.jit(
        jax.value_and_grad(loss(oracle), argnums=(0, 1, 2), has_aux=True)
    )(w, gamma, beta)
    for pack in ("wide", "thin"):
        try:
            fused = lambda x, w, g, bb: conv2d_smallcin_bn_relu_fpool_train(
                x, w, g, bb, pool_f=pf, pack=pack
            )
            (lf, (of, mf, vf)), gf = jax.jit(
                jax.value_and_grad(loss(fused), argnums=(0, 1, 2), has_aux=True)
            )(w, gamma, beta)
            np.testing.assert_allclose(np.asarray(of), np.asarray(oo), atol=2e-4, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(mf), np.asarray(mo), atol=2e-4, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(vf), np.asarray(vo), atol=2e-4, rtol=1e-4)
            for a, b_ in zip(gf, go):
                # grads accumulate over b*f*t elements — tolerance scales with
                # the array's magnitude (f32 accumulation-order noise; measured
                # rel err ~4e-5 on chip)
                scale = float(np.abs(np.asarray(b_)).max()) or 1.0
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), atol=2e-4 * scale
                )
            print(f"OK    train-stage [{pack}] fwd+VJP EXECUTES == XLA oracle", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f"FAIL  train-stage [{pack}] execute-and-compare: {msg}", flush=True)
            FAILS.append(f"train-stage-{pack} exec-compare")


def exec_ct_train_stage_vs_xla():
    """Execute-and-compare the train-mode WIDE-channel CT stage
    (conv2d_ct_train.py) — compiled Element-window kernels incl. the
    3-group dx pass — against the channel-last XLA composition."""
    from seld_tpu.ops.pallas.conv2d_ct_train import (
        conv2d_widecin_ct_bn_relu_fpool_train,
    )

    rng = np.random.default_rng(5)
    b, f, t, c, cout, pf = 2, 16, 640, 16, 32, 8
    # bf16 inputs: the CT train chain's support envelope is bf16-only
    # (Mosaic lowers f32 dots bf16-truncated — BENCH.md round-3
    # merged-backward anti-result; at f32 this check's dw error is ~4e-2
    # relative by truncation alone, which is the path's documented
    # limitation, not a kernel bug). The oracle runs f32-HIGHEST on the
    # same bf16-rounded inputs. Round 5: this check caught a REAL
    # compiled-only dx-mask bug (dh rel ~0.5 at any dtype) the
    # single-tile interpret tests cannot see.
    x = jnp.asarray(rng.standard_normal((b, f, t, c)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, c, cout)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(cout).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(cout).astype(np.float32))

    def oracle(x, w, gamma, beta):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y - mean), axis=(0, 1, 2))
        yn = (y - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        return jax.lax.reduce_window(
            jnp.maximum(yn, 0.0), -jnp.inf, jax.lax.max,
            (1, pf, 1, 1), (1, pf, 1, 1), "VALID",
        )

    def fused(x, w, gamma, beta):
        out = conv2d_widecin_ct_bn_relu_fpool_train(
            jnp.transpose(x, (0, 1, 3, 2)), t, w, gamma, beta, pf
        )[0]
        return jnp.transpose(out, (0, 1, 3, 2))[:, :, :t]

    def loss(op):
        def fn(x, w, gamma, beta):
            out = op(x, w, gamma, beta)
            return jnp.sum(out * jnp.cos(out)), out
        return fn

    try:
        (lo, oo), go = jax.jit(
            jax.value_and_grad(loss(oracle), argnums=(0, 1, 2, 3), has_aux=True)
        )(x, w, gamma, beta)
        (lf, of), gf = jax.jit(
            jax.value_and_grad(loss(fused), argnums=(0, 1, 2, 3), has_aux=True)
        )(x, w, gamma, beta)
        # bf16 tolerances (chip-measured post-dx-fix: out rel 2.9e-3, grad
        # rels <= 7.3e-3 — the broken dx mask showed as dh rel ~0.5 here)
        sc_o = float(np.abs(np.asarray(oo, np.float32)).max()) or 1.0
        np.testing.assert_allclose(
            np.asarray(of, np.float32), np.asarray(oo, np.float32),
            atol=1e-2 * sc_o,
        )
        for name, a, b_ in zip(("dh", "dw", "dgamma", "dbeta"), gf, go):
            scale = float(np.abs(np.asarray(b_, np.float32)).max()) or 1.0
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                atol=3e-2 * scale, err_msg=name,
            )
        print("OK    CT train-stage fwd+VJP (incl dh) EXECUTES == XLA oracle (bf16)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"FAIL  CT train-stage execute-and-compare: {msg}", flush=True)
        FAILS.append("ct-train-stage exec-compare")


def exec_stft_vs_fft():
    """Execute-and-compare the fused STFT-magnitude kernel on the chip
    against the fft-path oracle — the real-TPU path uses Element-indexed
    overlapping group tiles the interpret tests never lower."""
    from seld_tpu.data.features import spectrum_fast
    from seld_tpu.ops.pallas.stft import stft_mag_pallas

    rng = np.random.default_rng(7)
    # 600 groups at n=1_920_000 would execute the multi-tile grid; use a
    # smaller-but-still-tiled n: 125 groups -> grid (rows, 2) with gt=120...
    # keep g_pad % gt exercising both the tiled path and the tail group.
    x = jnp.asarray(rng.standard_normal((3, 480_000)).astype(np.float32))
    try:
        want = np.asarray(
            spectrum_fast(
                x, nperseg=512, noverlap=112, output_phase=False,
                method="fft", return_layout="CTF",
            )
        )
        got = np.asarray(
            stft_mag_pallas(x, out_dtype=jnp.bfloat16, block_groups=120)
        ).astype(np.float32)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=2e-2 * scale)
        print("OK    stft_mag_pallas Element-tile kernel EXECUTES == fft oracle", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"FAIL  stft execute-and-compare: {msg}", flush=True)
        FAILS.append("stft exec-compare")


def exec_stft_grouped_vs_flat():
    """Execute-and-compare the GROUPED-input STFT mode on the chip against
    the flat path: same Element-tiled grid, but the boundary-shifted tables
    split frame 0's dot across two rows — only a chip execution covers the
    compiled tiled path (interpret runs single-tile)."""
    from seld_tpu.ops.pallas.stft import stft_group_size, stft_mag_pallas

    rng = np.random.default_rng(9)
    group = stft_group_size(512, 112)
    n = 150 * group  # tiled: gt=120 -> grid (rows, 2) with tail padding
    x = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    try:
        want = np.asarray(
            stft_mag_pallas(x, out_dtype=jnp.bfloat16, block_groups=120)
        ).astype(np.float32)
        got = np.asarray(
            stft_mag_pallas(
                x.reshape(3, n // group, group), out_dtype=jnp.bfloat16,
                block_groups=120, grouped_input=True,
            )
        ).astype(np.float32)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=1e-2 * scale)
        print("OK    stft grouped-input mode EXECUTES == flat path", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"FAIL  stft grouped execute-and-compare: {msg}", flush=True)
        FAILS.append("stft-grouped exec-compare")

    # PADLESS tiled variant (gt | G): max(gi*gt-8,0) Element index map,
    # pl.when boundary branch with a rolled+masked tail dot, f32 in-block
    # cast, NO XLA pad. Only a chip run covers the tiled branches
    # (interpret is single-tile).
    n = 240 * group  # gt=120 -> grid (rows, 2), 240 % 120 == 0 -> padless
    x = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    try:
        want = np.asarray(
            stft_mag_pallas(x, out_dtype=jnp.bfloat16, block_groups=120)
        ).astype(np.float32)
        got = np.asarray(
            stft_mag_pallas(
                x.reshape(3, n // group, group), out_dtype=jnp.bfloat16,
                block_groups=120, grouped_input=True,
            )
        ).astype(np.float32)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, atol=1e-2 * scale)
        print("OK    stft grouped PADLESS tiled mode EXECUTES == flat path",
              flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"FAIL  stft grouped padless execute-and-compare: {msg}",
              flush=True)
        FAILS.append("stft-grouped-padless exec-compare")


def main():
    print(f"devices: {jax.devices()}", flush=True)

    from seld_tpu.ops.pallas.attention import flash_attention
    from seld_tpu.ops.pallas.stft import stft_mag_pallas
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
    # CT-layout wide stage kernel: flagship stage 2 (consumes stage 1's
    # native channel-on-sublane output, tpad from the thin smallcin pack)
    from seld_tpu.ops.pallas.conv2d_pool import conv2d_widecin_ct_bn_relu_fpool

    check(
        "conv2d_widecin_ct_bn_relu_fpool (stage2 CT bf16)",
        lambda h, w, s, b: conv2d_widecin_ct_bn_relu_fpool(
            h, 4800, w, s, b, pool_f=8
        ),
        shaped((4, 32, 192, 4864)), shaped((3, 3, 192, 192)),
        shaped((192,), jnp.float32), shaped((192,), jnp.float32),
    )
    # halo'd CTH chain at flagship shapes: thin stage-1 emitting the halo'd
    # buffer + widecin consuming it (pre_halo) — no XLA pad between stages
    from seld_tpu.ops.pallas.conv2d_pool import (
        CT_HALO,
        conv2d_smallcin_thin_bn_relu_fpool,
    )

    check(
        "conv2d_smallcin_thin CTH out (stage1 bf16)",
        lambda x, w, s, b: conv2d_smallcin_thin_bn_relu_fpool(
            x, w, s, b, pool_f=8, out_layout="CTH"
        ),
        shaped((B, 256, 4800, 8)), shaped((3, 3, 8, 192)),
        shaped((192,), jnp.float32), shaped((192,), jnp.float32),
    )
    check(
        "conv2d_widecin_ct pre_halo (stage2 CTH bf16)",
        lambda h, w, s, b: conv2d_widecin_ct_bn_relu_fpool(
            h, 4800, w, s, b, pool_f=8, block_t=CT_HALO, pre_halo=True
        ),
        shaped((4, 34, 192, 2 * CT_HALO + 4992)), shaped((3, 3, 192, 192)),
        shaped((192,), jnp.float32), shaped((192,), jnp.float32),
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

    # fused STFT-magnitude kernel at the flagship serving shape:
    # B=16 clips x 8 ch of 60 s @ 32 kHz -> (128, 4800, 256) bf16
    check(
        "stft_mag_pallas (flagship bf16)",
        lambda x: stft_mag_pallas(x, out_dtype=jnp.bfloat16),
        shaped((B, 8, 1_920_000), jnp.float32),
    )

    # fused TRAIN-mode stage 1 (fwd + custom VJP) at the flagship train shape
    from seld_tpu.ops.pallas.conv2d_train import conv2d_smallcin_bn_relu_fpool_train

    tb = int(os.environ.get("CHECK_TRAIN_BATCH", "8"))
    check(
        "conv2d train-stage fwd (flagship b8 bf16)",
        lambda x, w, g, bb: conv2d_smallcin_bn_relu_fpool_train(
            x, w, g, bb, pool_f=8
        )[0],
        shaped((tb, 256, 4800, 8)), shaped((3, 3, 8, 192)),
        shaped((192,), jnp.float32), shaped((192,), jnp.float32),
    )
    check(
        "conv2d train-stage grad (flagship b8 bf16)",
        lambda x, w, g, bb: jax.grad(
            lambda w, g, bb: conv2d_smallcin_bn_relu_fpool_train(
                x, w, g, bb, pool_f=8
            )[0].astype(jnp.float32).sum(),
            argnums=(0, 1, 2),
        )(w, g, bb),
        shaped((tb, 256, 4800, 8)), shaped((3, 3, 8, 192)),
        shaped((192,), jnp.float32), shaped((192,), jnp.float32),
    )

    exec_smallcin_vs_xla()
    exec_smallcin_thin_vs_xla()
    exec_widecin_ct_vs_xla()
    exec_cth_chain_vs_ct()
    probe_misaligned_slice_dot()
    exec_train_stage_vs_xla()
    exec_ct_train_stage_vs_xla()
    exec_stft_vs_fft()
    exec_stft_grouped_vs_flat()

    if FAILS:
        print(f"\n{len(FAILS)} kernel(s) FAILED to lower: {FAILS}")
        sys.exit(1)
    print("\nall Pallas kernels lower on this TPU")


if __name__ == "__main__":
    main()
