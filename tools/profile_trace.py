#!/usr/bin/env python
"""Capture a REAL jax.profiler trace of the serving pipeline / train step on
the TPU and print a per-op time table.

Round-2 attribution relied on an in-jit repeat-loop harness
(tools/profile_stages.py) that needed tanh-perturbation tricks to defeat XLA
hoisting — fragile. This tool captures an actual device trace (the SURVEY §5
tracing obligation; the reference only has wall-clock timing,
reference train.py:550,562-563) and aggregates XLA-op durations from the
chrome-trace JSON that jax.profiler emits, no tensorboard needed.

Usage:
  PT_MODE=serving PT_BATCH=16 python tools/profile_trace.py
  PT_MODE=train   PT_BATCH=8  python tools/profile_trace.py

Output: top-K ops by total device time + a fusion-category rollup, and the
raw trace dir path (TensorBoard-loadable) for deeper inspection.
"""

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_serving(batch: int, dtype: str = "bfloat16"):
    import dataclasses

    from __graft_entry__ import _flagship_model
    from seld_tpu.data.features import spectrum_fast
    from seld_tpu.models.fused_infer import fused_infer

    model = dataclasses.replace(_flagship_model(4800), compute_dtype=dtype)
    rng = np.random.default_rng(0)
    from seld_tpu.ops.pallas.stft import stft_group_size

    grp = stft_group_size(512, 112)
    audio = (
        rng.standard_normal((batch, 8, 32000 * 60)).astype(np.float32)
        .reshape(batch, 8, (32000 * 60) // grp, grp)
    )
    if os.environ.get("PT_AUDIO_DTYPE", "float32") == "bfloat16":
        # bit-identical bf16 ingest (bench.py --audio-dtype, BENCH.md round 5)
        import ml_dtypes

        audio = audio.astype(ml_dtypes.bfloat16)
    audio = jnp.asarray(audio)
    # init at batch 1 with pure-XLA impls (param-free Pallas kernels reject
    # batch 1; a batch-sized zeros would pin GBs for the whole trace)
    init_model = dataclasses.replace(
        model, attention_impl="full", frontend_impl="xla"
    )
    x0 = jnp.zeros((1, 8, 256, 4800), jnp.float32)
    variables = jax.jit(lambda k, inp: init_model.init(k, inp, train=False))(
        jax.random.PRNGKey(0), x0
    )
    del x0

    layout = os.environ.get("PT_LAYOUT", "TF")  # TF (serving default) | FT
    microbatch = int(os.environ.get("PT_MICROBATCH", "1"))

    @jax.jit
    def pipeline(variables, audio):
        from seld_tpu.ops.pallas.stft import stft_mag_pallas

        if layout == "FT":
            feats = stft_mag_pallas(
                audio, nperseg=512, noverlap=112, out_dtype=jnp.bfloat16,
                out_layout="FT", grouped_input=True,
            )
            return fused_infer(model, variables, feats, input_layout="BCFT")
        # mirror bench.py's pipeline_fn exactly (featurize inside fused_infer
        # so the microbatch scan covers the STFT too, and the persistent
        # compile cache shared with bench runs can hit)
        featurize = lambda a: stft_mag_pallas(
            a, nperseg=512, noverlap=112, out_dtype=jnp.bfloat16,
            grouped_input=a.ndim == 4,
        )
        return fused_infer(
            model, variables, audio, input_layout="BCTF",
            smallcin_impl="thin", microbatch=microbatch, featurize=featurize,
        )

    return lambda: pipeline(variables, audio)


def build_train(batch: int, dtype: str = "bfloat16"):
    import dataclasses

    from __graft_entry__ import _flagship_model
    from seld_tpu.config import SELDConfig
    from seld_tpu.training.steps import create_train_state, make_train_step

    # remat: 'auto' = dtype-resolved like config.resolve_use_remat (off for
    # bf16 — the measured-best training point; on for f32)
    remat_env = os.environ.get("PT_REMAT", "auto")
    remat = (dtype == "float32") if remat_env == "auto" else remat_env == "1"
    model = dataclasses.replace(
        _flagship_model(4800), compute_dtype=dtype, remat=remat,
        frontend_impl=os.environ.get("TB_FRONTEND", "auto"),
        attention_impl=os.environ.get("TB_ATTN", "auto"),
    )
    cfg = SELDConfig(
        output_classes=14, class_overlaps=3, lr=1e-4,
        input_channels=8, compute_dtype=dtype, use_remat=remat,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 8, 256, 4800)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((batch, 600, 168)).astype(np.float32))
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x[:1])
    step = make_train_step(model, tx, cfg)
    holder = {"state": state}

    def run():
        holder["state"], loss = step(holder["state"], x, y)
        return loss

    return run


_CAT_RULES = [
    ("attention/flash", r"flash|attention"),
    ("pallas smallcin", r"smallcin"),
    ("conv", r"convolution|conv_general"),
    ("matmul", r"dot|%fusion.*gemm"),
    ("tanh/sigmoid/exp", r"tanh|logistic|sigmoid|exponential"),
    ("reduce/pool", r"reduce"),
    ("copy/transpose", r"copy|transpose|bitcast|reshape"),
    ("all-reduce/coll", r"all-reduce|all-gather|collective"),
]


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in _CAT_RULES:
        if re.search(pat, low):
            return cat
    return "other"


def parse_traces(log_dir: str, n_iters: int):
    files = glob.glob(
        os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True
    ) + glob.glob(os.path.join(log_dir, "**", "*.trace.json"), recursive=True)
    if len(files) > 1:
        # jax.profiler writes one timestamped subdir per capture; a reused
        # log_dir accumulates them and merging runs double-counts ops (and
        # mixes old program versions into the table) — parse only the newest
        files = [max(files, key=os.path.getmtime)]
        print(f"(multiple captures under {log_dir}; parsing newest only)")
    if not files:
        print(f"NO trace json found under {log_dir}; contents:")
        for p in glob.glob(os.path.join(log_dir, "**", "*"), recursive=True):
            print("  ", p)
        return
    events = []
    for fp in files:
        op = gzip.open if fp.endswith(".gz") else open
        with op(fp, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))

    # map pid -> process name (jax labels device pids e.g. '/device:TPU:0')
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in pid_names.items() if "tpu" in n.lower() or "device" in n.lower()
    }

    per_op = defaultdict(float)
    per_pid = defaultdict(float)
    op_meta = {}
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pid = ev.get("pid")
        if device_pids and pid not in device_pids:
            continue
        per_op[ev["name"]] += ev["dur"] / 1000.0  # us -> ms
        per_pid[pid_names.get(pid, str(pid))] += ev["dur"] / 1000.0
        args = ev.get("args") or {}
        if ev["name"] not in op_meta and ("long_name" in args or "hlo_category" in args):
            op_meta[ev["name"]] = (
                args.get("hlo_category", ""),
                args.get("long_name", "")[:150],
            )

    print(f"\n=== device streams (total ms over {n_iters} iters) ===")
    for name, ms in sorted(per_pid.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:10.2f} ms  {name}")

    print(f"\n=== top 45 ops by total device time (/{n_iters} = per-iter ms) ===")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:45]
    for name, ms in rows:
        cat, long = op_meta.get(name, ("", ""))
        print(f"  {ms/n_iters:9.3f} ms/iter  {name[:60]:60s} [{cat}] {long}")

    cats = defaultdict(float)
    for name, ms in per_op.items():
        cats[categorize(name)] += ms
    print(f"\n=== category rollup (per-iter ms) ===")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {ms/n_iters:9.3f} ms/iter  {cat}")


def main():
    mode = os.environ.get("PT_MODE", "serving")
    batch = int(os.environ.get("PT_BATCH", "16" if mode == "serving" else "8"))
    n_iters = int(os.environ.get("PT_ITERS", "3"))
    log_dir = os.environ.get("PT_DIR", f"/tmp/jax_trace_{mode}_b{batch}")
    print(f"devices: {jax.devices()}  mode={mode} batch={batch}", flush=True)

    run = (build_serving if mode == "serving" else build_train)(batch)
    t0 = time.time()
    out = run()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:8]
    print(f"compiled + warm in {time.time()-t0:.0f} s", flush=True)

    jax.profiler.start_trace(log_dir)
    try:
        for _ in range(n_iters):
            out = run()
        # sync INSIDE the trace window so device completion is captured
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:8]
    finally:
        jax.profiler.stop_trace()
    print(f"trace written to {log_dir}", flush=True)
    parse_traces(log_dir, n_iters)


if __name__ == "__main__":
    main()
