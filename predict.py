#!/usr/bin/env python
"""Inference CLI: raw multichannel audio -> L3DAS21 Task-2 submission CSVs.

The reference repo has no standalone inference entry point (inference only
happens inside its test loop, reference train.py:84-166); this CLI completes
that surface: it runs the fused featurize+infer pipeline on TPU and decodes
(sed, doa) into `[frame, class, x, y, z]` submission rows.

Usage:
    python predict.py --TextArgs=config/DQSELD-TCN-S1-PHI_8ch.txt \
        --checkpoint RESULTS_Original/.../checkpoint_best_model \
        --inputs clip1.npy clip2.wav --out-dir submissions/

Inputs: .npy arrays (channels, samples) or .wav files at the configured
sample rate. Outputs one CSV per clip.
"""

import argparse
import os
import sys


def load_audio(path: str, sr: int):
    import numpy as np

    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".wav"):
        import scipy.io.wavfile as wavfile

        file_sr, data = wavfile.read(path)
        if file_sr != sr:
            raise ValueError(f"{path}: sample rate {file_sr} != configured {sr}")
        if data.ndim == 1:
            data = data[:, None]
        # PCM integer WAVs must be rescaled to +-1.0 BEFORE the float cast
        # (checking after astype always sees kind=='f' — round-4 bug: int16
        # clips entered the model at +-32k scale)
        if data.dtype.kind == "i":
            scale = float(np.iinfo(data.dtype).max) + 1.0
            data = data.astype("float32") / scale
        return data.T.astype("float32")
    raise ValueError(f"unsupported audio format: {path}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--TextArgs", type=str, default=None)
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="seld_tpu checkpoint file (default: fresh init, for smoke tests)")
    ap.add_argument("--inputs", nargs="+", required=True)
    ap.add_argument("--out-dir", type=str, default="submissions")
    ap.add_argument(
        "--impl", type=str, default="auto", choices=["auto", "fused", "apply"],
        help="serving path: auto picks the Pallas-fused pipeline on TPU for "
        "single-trunk bf16 BN configs, model.apply otherwise",
    )
    args, extra = ap.parse_known_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from seld_tpu.config import load_config, tokens_to_config
    from seld_tpu.data.features import spectrum_fast
    from seld_tpu.metrics import gen_submission_list_task2
    from seld_tpu.models import model_from_config
    from seld_tpu.training.checkpoint import load_checkpoint

    cfg = load_config(args.TextArgs)
    if extra:
        cfg = tokens_to_config(extra, base=cfg)
    model = model_from_config(cfg)

    nperseg, noverlap = 512, 112  # canonical L3DAS21 featurization (SURVEY §2.3)

    # serving path: the Pallas-fused pipeline (BENCH.md) on TPU for BN
    # configs in bf16 — single-trunk AND 2Parallel/magphase (each branch runs
    # the per-stage fused dispatch); everything else (CPU, parity-f32,
    # partial-BN) uses model.apply; SE configs ride the fused path too
    use_fused = (
        args.impl == "fused"
        or (
            args.impl == "auto"
            and jax.default_backend() not in {"cpu"}
            and cfg.compute_dtype == "bfloat16"
            and cfg.batch_norm == "BN"
            and cfg.pool_time == "TCN"
        )
    )
    if use_fused:
        from seld_tpu.models.fused_infer import fused_infer

    @jax.jit
    def pipeline(variables, audio):
        with jax.default_matmul_precision(
            "highest" if cfg.compute_dtype == "float32" else "default"
        ):
            if use_fused:
                from seld_tpu.ops.pallas.stft import (
                    stft_mag_pallas, stft_mag_supported,
                )

                # f32 (parity) configs must keep f32 features — a bf16
                # STFT output would silently break model.apply parity
                # (CLAUDE.md precision policy)
                sdt = (
                    jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                    else jnp.float32
                )
                if not cfg.phase and stft_mag_supported(nperseg, noverlap, sdt):
                    # magnitude-only configs: fused Pallas STFT kernel
                    # (ops/pallas/stft.py, BENCH.md round 3); phase configs
                    # keep the strided-conv formulation
                    feats = stft_mag_pallas(
                        audio, nperseg=nperseg, noverlap=noverlap,
                        out_dtype=sdt,
                    )
                else:
                    feats = spectrum_fast(
                        audio, nperseg=nperseg, noverlap=noverlap,
                        output_phase=cfg.phase, method="conv", return_layout="CTF",
                    )
                return fused_infer(model, variables, feats[None], input_layout="BCTF")
            feats = spectrum_fast(
                audio, nperseg=nperseg, noverlap=noverlap, output_phase=cfg.phase
            )
            return model.apply(variables, feats[None], train=False)

    os.makedirs(args.out_dir, exist_ok=True)
    variables = None
    for path in args.inputs:
        audio = jnp.asarray(load_audio(path, cfg.sr), jnp.float32)
        if variables is None:
            feats_shape = jax.eval_shape(
                lambda a: spectrum_fast(
                    a, nperseg=nperseg, noverlap=noverlap, output_phase=cfg.phase
                ),
                audio,
            ).shape
            if args.checkpoint:
                tstate, _, _ = load_checkpoint(args.checkpoint)
                variables = {"params": tstate.params}
                if tstate.batch_stats:
                    variables["batch_stats"] = tstate.batch_stats
                # validate checkpoint-vs-config compatibility up front: a
                # mismatched config otherwise fails later with an opaque
                # tree/shape error inside model.apply
                from seld_tpu.training.checkpoint import variable_shape_mismatches

                expected = jax.eval_shape(
                    lambda k: model.init(k, jnp.zeros((1, *feats_shape), jnp.float32), train=False),
                    jax.random.PRNGKey(0),
                )
                diffs = variable_shape_mismatches(
                    expected, {k: v for k, v in variables.items() if k in expected}
                )
                if diffs:
                    raise SystemExit(
                        f"checkpoint {args.checkpoint!r} does not match the model built "
                        f"from config {args.TextArgs!r}:\n  " + "\n  ".join(diffs)
                    )
            else:
                variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
                    jax.random.PRNGKey(0), jnp.zeros((1, *feats_shape), jnp.float32)
                )
                print("WARNING: no --checkpoint given; using random init", file=sys.stderr)
        sed, doa = pipeline(variables, audio)
        events, _ = gen_submission_list_task2(
            np.asarray(sed[0]), np.asarray(doa[0]),
            max_loc_value=cfg.max_loc_value, num_classes=cfg.output_classes,
            max_overlaps=int(cfg.class_overlaps),
        )
        out_csv = os.path.join(
            args.out_dir, os.path.splitext(os.path.basename(path))[0] + ".csv"
        )
        pd.DataFrame(events).to_csv(out_csv, index=None, header=None)
        print(f"{path} -> {out_csv} ({len(events)} events)")


if __name__ == "__main__":
    main(sys.argv[1:])
