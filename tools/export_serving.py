#!/usr/bin/env python
"""Export the serving pipeline as a serialized StableHLO artifact.

Production deployment story: ``jax.export`` serializes the jit-compiled
featurize+infer pipeline (with weights baked in as constants or passed as
inputs — here passed as inputs, so one artifact serves any checkpoint of
the same config) to a self-contained bytes blob. A serving host
deserializes and calls it without the model-building Python (flax, the
config system) on its path — only jax + the artifact.

Usage:
    python tools/export_serving.py --TextArgs=config/....txt \
        --batch 32 --out serving.stablehlo [--impl apply|fused]
    # later / elsewhere:
    python tools/export_serving.py --load serving.stablehlo --selftest

The exported calling convention is (variables, audio (B, C, samples) f32)
-> (sed, doa). Platform is recorded in the artifact (TPU exports only run
on TPU; use --platform cpu for a CPU artifact).
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipeline(cfg, model, impl: str):
    import jax
    import jax.numpy as jnp

    from seld_tpu.data.features import spectrum_fast

    precision = "highest" if cfg.compute_dtype == "float32" else "default"

    if impl == "fused":
        from seld_tpu.models.fused_infer import fused_infer

        from seld_tpu.ops.pallas.stft import stft_mag_pallas, stft_mag_supported

        # f32 exports keep f32 features (CLAUDE.md precision policy)
        sdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        def pipeline(variables, audio):
            with jax.default_matmul_precision(precision):
                if not cfg.phase and stft_mag_supported(512, 112, sdt):
                    feats = stft_mag_pallas(
                        audio, nperseg=512, noverlap=112, out_dtype=sdt
                    )
                else:
                    feats = jax.vmap(
                        lambda a: spectrum_fast(
                            a, nperseg=512, noverlap=112, output_phase=cfg.phase,
                            method="conv", return_layout="CTF",
                        )
                    )(audio)
                return fused_infer(model, variables, feats, input_layout="BCTF")
    else:
        def pipeline(variables, audio):
            with jax.default_matmul_precision(precision):
                feats = jax.vmap(
                    lambda a: spectrum_fast(
                        a, nperseg=512, noverlap=112, output_phase=cfg.phase
                    )
                )(audio)
                return model.apply(variables, feats, train=False)

    return pipeline


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--TextArgs", type=str, default=None)
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--impl", type=str, default="auto", choices=["auto", "fused", "apply"])
    ap.add_argument("--out", type=str, default="serving.stablehlo")
    ap.add_argument("--load", type=str, default=None,
                    help="deserialize an artifact instead of exporting")
    ap.add_argument("--selftest", action="store_true",
                    help="after load/export, run the artifact on zeros")
    args, extra = ap.parse_known_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    if args.load:
        with open(args.load, "rb") as f:
            exp = jexport.deserialize(f.read())
        print(f"loaded {args.load}: in_avals={len(exp.in_avals)} "
              f"platforms={exp.platforms}")
        if args.selftest:
            zeros = [jnp.zeros(a.shape, a.dtype) for a in exp.in_avals]
            out = jax.jit(exp.call)(*zeros)
            print("selftest ok:", [o.shape for o in jax.tree_util.tree_leaves(out)])
        return

    from seld_tpu.config import load_config, tokens_to_config
    from seld_tpu.models import model_from_config
    from seld_tpu.training.checkpoint import load_checkpoint

    cfg = load_config(args.TextArgs)
    if extra:
        cfg = tokens_to_config(extra, base=cfg)
    model = model_from_config(cfg)
    impl = args.impl
    if impl == "auto":
        fused_ok = (
            jax.default_backend() != "cpu"
            and cfg.compute_dtype == "bfloat16"
            and cfg.parallel_ConvTC_block in {"False", "false", "None", "none"}
            and cfg.batch_norm == "BN"
            and cfg.pool_time == "TCN"
        )
        impl = "fused" if fused_ok else "apply"

    audio_shape = (args.batch, cfg.input_channels // (2 if cfg.phase else 1),
                   cfg.sr * args.seconds)
    x0 = jnp.zeros(audio_shape, jnp.float32)
    if args.checkpoint:
        tstate, _, _ = load_checkpoint(args.checkpoint)
        variables = {"params": tstate.params}
        if tstate.batch_stats:
            variables["batch_stats"] = tstate.batch_stats
    else:
        print("WARNING: no --checkpoint; exporting with random-init variable "
              "shapes (artifact accepts any same-shaped variables)", file=sys.stderr)
        feats0 = jnp.zeros(
            (1, cfg.input_channels, cfg.freq_dim, cfg.time_dim), jnp.float32
        )
        variables = jax.jit(lambda k, i: model.init(k, i, train=False))(
            jax.random.PRNGKey(0), feats0
        )

    pipeline = build_pipeline(cfg, model, impl)
    exp = jexport.export(jax.jit(pipeline))(variables, x0)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported impl={impl} platforms={exp.platforms} "
          f"audio={audio_shape} -> {args.out} ({len(blob)/1e6:.1f} MB)")
    if args.selftest:
        out = jax.jit(exp.call)(variables, x0)
        print("selftest ok:", [o.shape for o in jax.tree_util.tree_leaves(out)])


if __name__ == "__main__":
    main()
