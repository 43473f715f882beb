#!/usr/bin/env python
"""End-to-end benchmark: fused featurize+infer throughput on the flagship model.

Measures audio-hours/sec/chip for 8-channel SELD inference (the BASELINE.md
north star): raw 60 s 8-ch 32 kHz audio -> on-device STFT (spectrum_fast) ->
DualQSELD-TCN forward, all inside ONE jit-compiled XLA program, on the real
TPU chip.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the PyTorch-reference-equivalent pipeline
(scipy STFT + eval-mode DQ SELD_Model forward) measured on this host's CPU —
the reference is a single-device research repo with no published numbers
(BASELINE.md), so its own runnable configuration is the baseline. Re-measure
with ``python bench.py --measure-ref``.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: repeat bench runs skip the multi-minute
# flagship compile on this 1-core host
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# Reference baseline measured on this host 2026-08-16 via measure_reference()
# (tests/torch_seld.py flagship DQ mirror + scipy STFT, eval mode, torch CPU):
# featurize 11.0 s + forward ~39 s = ~50 s per 60 s 8-ch clip. CAVEAT: this
# container exposes ONE CPU core (1 torch thread); on a multicore host the
# reference would be proportionally faster. Re-measure with --measure-ref.
REF_AUDIO_HOURS_PER_SEC = 0.000333


def measure_reference():
    import scipy.signal
    import torch

    sys.path.insert(0, "tests")
    sys.path.insert(0, ".")
    from tests.torch_seld import SELDModelT

    dil = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55]
    tm = SELDModelT(
        freq=256, cin=8, domain="DQ", domain_classifier="DQ",
        filters=[192, 192, 192], pool=[[8, 2], [8, 2], [2, 2]], G=384, U=384,
        V=[384, 384], vk=3, dilations=dil, fc_layers=[384],
        bias_conv=False, bias_linear=True, bn="BN",
    )
    tm.eval()
    audio = np.random.default_rng(0).standard_normal((8, 32000 * 60)).astype(np.float32)
    t0 = time.time()
    _, _, seg = scipy.signal.stft(audio, window="hamming", nperseg=512, noverlap=112)
    feats = np.abs(seg)[:, 1:, :-1]
    t_feat = time.time() - t0
    x = torch.tensor(feats[None]).float()
    with torch.no_grad():
        tm(x)  # warmup
        times = []
        for _ in range(3):
            t0 = time.time()
            tm(x)
            times.append(time.time() - t0)
    total = float(np.mean(times)) + t_feat
    return (60.0 / 3600.0) / total


def measure_tpu(batch: int, iters: int, dtype: str, impl: str, dp: int = 1,
                smallcin: str = "thin", donate: str = "auto",
                timing: str = "sync", microbatch: int = 1,
                audio_dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from seld_tpu.data.features import spectrum_fast
    from seld_tpu.models.fused_infer import fused_infer
    from __graft_entry__ import _flagship_model

    import dataclasses

    model = _flagship_model(time_dim=4800)
    if dtype == "bfloat16":
        model = dataclasses.replace(model, compute_dtype="bfloat16")
    if impl == "int8":
        # dynamic-activation int8 PTQ on the Hamilton 1x1 convs/linears
        # (ops/pallas/quant.py); frontend/STFT stay bf16
        model = dataclasses.replace(model, qconv_impl="int8")
    sr, secs = 32000, 60
    audio_shape = (batch, 8, sr * secs)
    if impl == "fused":
        # pre-group the audio for the STFT kernel's grouped-input mode — a
        # free host-side reshape that replaces the in-jit full-tensor
        # front-pad + 2D->3D relayout (2 x 5.57 GB f32 at b96, the serving
        # memory ceiling; BENCH.md round 3)
        from seld_tpu.ops.pallas.stft import stft_group_size

        group = stft_group_size(512, 112)
        audio_shape = (batch, 8, (sr * secs) // group, group)
    # donation is a MEMORY knob, not a speed knob: measured at b96 the
    # donated program on a fresh synced buffer per iter runs 392 ms vs the
    # steady-state 339 ms (BENCH.md round 4), and the b128 unlock it aimed at
    # still OOMs on the structural stage-1 CTH buffers. 'auto' therefore
    # resolves OFF; --donate on remains the production-shaped mode.
    do_donate = donate == "on"
    assert not (do_donate and dp > 1), "--donate on requires --dp 1"
    # donated mode has its own timed loop (fresh synced buffer per iter) and
    # returns before the timing-mode branch — a silent --timing pipelined
    # there would measure something else than it claims (ADVICE r4)
    assert not (do_donate and timing == "pipelined"), (
        "--donate on measures per-batch sync latency; --timing pipelined is "
        "unavailable in donated mode"
    )
    # bf16 audio ingest (serving memory/bandwidth knob): the padless STFT
    # kernel's FIRST op on the audio block is a cast to the bf16 compute
    # dtype (ops/pallas/stft.py:144-146), so pre-casting on the host is
    # BIT-IDENTICAL for the bf16 pipeline while halving both the held-audio
    # HBM footprint (7.86 -> 3.93 GB at b128, the b128 ceiling's other half)
    # and the STFT pass's HBM read.
    np_audio_dtype = np.float32
    if audio_dtype == "bfloat16":
        assert dtype == "bfloat16" and impl == "fused", (
            "--audio-dtype bfloat16 is bit-identical only on the bf16 fused "
            "path (the f32 parity path computes the STFT in f32)"
        )
        import ml_dtypes

        np_audio_dtype = ml_dtypes.bfloat16
    if do_donate:
        audio = None  # donated mode materializes audio on-device per iter
    else:
        audio = jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((batch, 8, sr * secs))
            .astype(np.float32)
            .reshape(audio_shape)
            .astype(np_audio_dtype)
        )
    # init at batch 1: parameter shapes are batch-independent, and a
    # batch-sized zeros here would pin e.g. 3.77 GB at b96 for the whole
    # run (it was the margin between fitting and runtime-OOM at b96).
    # Init traces with pure-XLA impls: the Pallas kernels are param-free
    # (identical variables) and their Mosaic tilings reject batch 1.
    init_model = dataclasses.replace(
        model, attention_impl="full", frontend_impl="xla"
    )
    x0 = jnp.zeros((1, 8, 256, 4800), jnp.float32)
    variables = jax.jit(lambda k, inp: init_model.init(k, inp, train=False))(
        jax.random.PRNGKey(0), x0
    )
    del x0
    precision = "highest" if dtype == "float32" else "default"
    # serving (bf16) runs the hybrid fused path (Pallas smallcin frontend +
    # XLA wide stages, models/fused_infer.py); parity mode (f32) keeps the
    # scipy-parity STFT + model.apply at precision 'highest'. Both measured
    # in BENCH.md. A forced --impl fused at f32 keeps f32 STFT features
    # (CLAUDE.md precision policy; the Pallas STFT emits the requested
    # dtype).

    def pipeline_fn(variables, audio):
        with jax.default_matmul_precision(precision):
            if impl == "fused":
                # fused Pallas STFT-magnitude kernel emits bf16 (B, C, T, F)
                # directly — no conv layout copies, |.|+cast fused
                # (ops/pallas/stft.py; A/B vs conv-STFT: 180.8 -> 158.7 ms
                # at b32, BENCH.md round 3)
                from seld_tpu.ops.pallas.stft import stft_mag_pallas

                sdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
                featurize = lambda a: stft_mag_pallas(
                    a, nperseg=512, noverlap=112, out_dtype=sdt,
                    grouped_input=a.ndim == 4,
                )
                # microbatch > 1: STFT + CNN frontend scan over microbatches
                # (caps the structural stage-1 buffers — the b128 ceiling,
                # BENCH.md round 4); TCN + heads stay full-batch
                return fused_infer(
                    model, variables, audio, input_layout="BCTF",
                    smallcin_impl=smallcin, microbatch=microbatch,
                    featurize=featurize,
                )
            feats = jax.vmap(
                lambda a: spectrum_fast(a, nperseg=512, noverlap=112, output_phase=False)
            )(audio)
            return model.apply(variables, feats, train=False)

    if dp > 1:
        # multi-chip dp serving: shard the batch over the 'data' mesh axis,
        # replicate params; XLA SPMD partitions the whole fused pipeline
        # (validated on the virtual CPU mesh by tests/test_sharding.py)
        from seld_tpu.parallel.mesh import make_mesh, shard_batch, shard_variables

        mesh = make_mesh(n_data=dp)
        variables = shard_variables(mesh, variables)
        audio = shard_batch(mesh, audio)

    # Input donation (BENCH.md round 4): production serving consumes a fresh
    # audio buffer per batch, so the pipeline may reuse the 60 MB/clip f32
    # input's memory for its own temporaries. Measured: it DOES free the
    # held audio from the b128 allocation dump, but b128 still OOMs on the
    # structural stage-1 CTH buffers, and the donated program itself is not
    # faster — donation is a memory/production-realism knob only.
    if do_donate:
        pipeline = jax.jit(pipeline_fn, donate_argnums=(1,))
        shape = audio_shape

        fdt = jnp.bfloat16 if audio_dtype == "bfloat16" else jnp.float32

        @jax.jit
        def fill(i):
            t = jax.lax.broadcasted_iota(jnp.float32, shape, len(shape) - 1)
            a = jnp.mod(t * 0.137 + i.astype(jnp.float32) * 0.61, 2.0) - 1.0
            return a.astype(fdt)

        tiny = jax.jit(lambda a: a.ravel()[:64])
        idx = jnp.arange(iters + 2)
        peek = jax.jit(lambda o: o[0].ravel()[:64])
        out = pipeline(variables, fill(idx[0]))  # compile + warmup
        np.asarray(peek(out))
        # each iteration runs on a FRESH synced buffer (donation invalidates
        # the previous one); only the pipeline call + peek is timed — the
        # identical discipline as the non-donated rows, so numbers compare
        times = []
        for k in range(iters):
            a = fill(idx[k + 1])
            np.asarray(tiny(a))  # materialize + sync OUTSIDE the timed span
            t0 = time.time()
            out = pipeline(variables, a)
            np.asarray(peek(out))
            times.append(time.time() - t0)
        dt = float(np.median(times))
        print("donated-input mode (fresh synced buffer per iter)", file=sys.stderr)
        audio_hours = batch * secs / 3600.0
        return audio_hours / dt, dt

    pipeline = jax.jit(pipeline_fn)
    peek = jax.jit(lambda o: o[0].ravel()[:64])
    out = pipeline(variables, audio)  # compile + warmup
    np.asarray(peek(out))
    # time with a host read every iteration: through the axon tunnel,
    # block_until_ready alone can return before remote execution completes,
    # so only D2H-synced timings are trustworthy. The read is a TINY slice
    # dispatched over the materialized output — the tunnel moves ~20 MB/s,
    # so reading the full sed tensor (1.6 MB at b16) would add ~80 ms of
    # pure transfer that production serving never pays.
    if timing == "pipelined":
        # steady-state THROUGHPUT: keep the device queue non-empty by
        # dispatching every iteration before the single D2H sync. XLA
        # executes enqueued programs in order, so the final peek
        # transitively waits on all prior batches — the timing still ends
        # on a device-to-host read (the only trustworthy sync through the
        # axon tunnel, CLAUDE.md), but the per-call host+tunnel dispatch
        # round-trip (~27 ms here; ~0 for a co-located production host)
        # overlaps device compute instead of serializing with it. Per-batch
        # LATENCY is the --timing sync number.
        # keep only the most recent output: enqueue order guarantees the
        # final peek transitively syncs all prior dispatches, and holding
        # every iteration's buffers alive adds avoidable HBM pressure at the
        # b96 memory ceiling (ADVICE r4)
        t0 = time.time()
        for _ in range(iters):
            out = pipeline(variables, audio)
        np.asarray(peek(out))
        dt = (time.time() - t0) / iters
    else:
        times = []
        for _ in range(iters):
            t0 = time.time()
            out = pipeline(variables, audio)
            np.asarray(peek(out))
            times.append(time.time() - t0)
        dt = float(np.median(times))
    audio_hours = batch * secs / 3600.0
    return audio_hours / dt, dt


def main():
    ap = argparse.ArgumentParser()
    # defaults = the serving configuration. batch 128, 2-microbatch scan
    # frontend, bf16 audio ingest: best measured throughput on one v5e
    # (5.156 audio-h/s, round 5). The round-4 b128 ceiling was structural
    # (stage-1 CTH buffers + 7.86 GB held f32 audio); the scan caps the
    # frontend buffers at one microbatch and the bf16 ingest — bit-identical,
    # the STFT kernel's first op is that cast — halves the held audio.
    # Parity mode: --dtype float32 --batch 4. BENCH.md has the batch sweep.
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument(
        "--impl", type=str, default=None, choices=["fused", "apply", "int8"],
        help="serving path: fused (Pallas+XLA hybrid, default for bf16), "
        "plain model.apply (default for f32 parity mode), or int8 "
        "(model.apply with dynamic-act int8 PTQ Hamilton matmuls)",
    )
    ap.add_argument(
        "--smallcin", type=str, default="thin", choices=["wide", "thin"],
        help="smallcin stage-1 kernel for the fused path (thin: no dx "
        "duplication, in-kernel tap assembly — BENCH.md round 3)",
    )
    ap.add_argument(
        "--dp", type=int, default=1,
        help="data-parallel serving: shard the batch over a dp-way 'data' "
        "mesh (requires dp visible devices)",
    )
    ap.add_argument(
        "--donate", type=str, default="auto", choices=["auto", "on", "off"],
        help="donate the audio input buffer to the pipeline (production-"
        "shaped mode: a fresh synced buffer per call; a memory knob, not a "
        "speed knob — 'auto' resolves off, see BENCH.md round 4)",
    )
    ap.add_argument(
        "--microbatch", type=int, default=None,
        help="scan the STFT + CNN frontend over this many microbatches "
        "inside the fused pipeline (memory knob for b128+; outputs "
        "identical — BENCH.md round 5). Default: 2 for batch >= 128 on the "
        "fused bf16 path, else 1",
    )
    ap.add_argument(
        "--audio-dtype", type=str, default=None,
        choices=["float32", "bfloat16"],
        help="on-device audio buffer dtype for the fused bf16 path. The "
        "padless STFT kernel casts audio to bf16 before any arithmetic, so "
        "bfloat16 ingest is bit-identical while halving the held-audio HBM "
        "footprint and the STFT's HBM read (BENCH.md round 5)",
    )
    ap.add_argument(
        "--timing", type=str, default="sync", choices=["sync", "pipelined"],
        help="sync: D2H read every batch (per-batch latency; pays the "
        "~27 ms tunnel dispatch round-trip each call). pipelined: dispatch "
        "all iters, one final D2H sync (steady-state throughput — what a "
        "co-located serving host sees)",
    )
    ap.add_argument("--measure-ref", action="store_true")
    args = ap.parse_args()
    if args.impl is None:
        args.impl = "fused" if args.dtype == "bfloat16" else "apply"
    fused_bf16 = args.impl == "fused" and args.dtype == "bfloat16"
    if args.microbatch is None:
        args.microbatch = 2 if (fused_bf16 and args.batch >= 128) else 1
    if args.audio_dtype is None:
        args.audio_dtype = (
            "bfloat16" if fused_bf16 else "float32"
        )

    ref = REF_AUDIO_HOURS_PER_SEC
    if args.measure_ref:
        ref = measure_reference()
        print(f"reference audio_hours/sec (torch CPU): {ref:.6f}", file=sys.stderr)

    value, dt = measure_tpu(
        args.batch, args.iters, args.dtype, args.impl, args.dp, args.smallcin,
        args.donate, args.timing, args.microbatch, args.audio_dtype,
    )
    print(
        f"batch={args.batch} dtype={args.dtype} impl={args.impl}: {dt*1000:.1f} ms per batch "
        f"({value:.3f} audio-hours/sec)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "audio_hours_per_sec_per_chip_8ch_seld_infer",
                "value": round(value, 4),
                "unit": "audio_hours/sec",
                "vs_baseline": round(value / ref, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
