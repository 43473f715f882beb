#!/usr/bin/env python
"""Count the flagship model's useful FLOPs (forward serving pipeline and
fwd+bwd+Adam train step) via XLA's lowered cost analysis on CPU, for the
MFU numbers quoted in BENCH.md.

Uses the pure-XLA implementations (full attention, XLA frontend, remat off)
so every matmul/conv is visible to the analyzer — the Pallas kernels compute
the same math (their in-kernel pool-row recomputes are deliberately NOT
counted: MFU is quoted on useful FLOPs).

Run: JAX_PLATFORMS=cpu python tools/flops_count.py  (env FC_BATCH, default 1)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._clear_backends()
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from __graft_entry__ import _flagship_model
    from seld_tpu.config import SELDConfig
    from seld_tpu.data.features import spectrum_fast
    from seld_tpu.training.steps import create_train_state, make_train_step

    batch = int(os.environ.get("FC_BATCH", "1"))
    model = dataclasses.replace(
        _flagship_model(4800), attention_impl="full", frontend_impl="xla",
        remat=False,
    )
    x0 = jnp.zeros((1, 8, 256, 4800), jnp.float32)
    variables = jax.jit(lambda k, a: model.init(k, a, train=False))(
        jax.random.PRNGKey(0), x0
    )

    def pipeline(variables, audio):
        feats = jax.vmap(
            lambda a: spectrum_fast(a, nperseg=512, noverlap=112, output_phase=False)
        )(audio)
        return model.apply(variables, feats, train=False)

    audio = jnp.zeros((batch, 8, 32000 * 60), jnp.float32)
    fl = jax.jit(pipeline).lower(variables, audio).cost_analysis()
    serve_flops = float(fl["flops"])
    print(f"serving pipeline (STFT + forward), batch {batch}: "
          f"{serve_flops/1e9:.2f} GFLOP = {serve_flops/batch/1e9:.2f} GFLOP/clip")

    feats = jnp.zeros((batch, 8, 256, 4800), jnp.float32)
    ff = jax.jit(lambda v, a: model.apply(v, a, train=False)).lower(
        variables, feats
    ).cost_analysis()
    fwd_flops = float(ff["flops"])
    print(f"model forward only, batch {batch}: {fwd_flops/batch/1e9:.2f} GFLOP/clip")

    cfg = SELDConfig(
        output_classes=14, class_overlaps=3, lr=1e-4, input_channels=8,
        compute_dtype="float32", use_remat=False,
    )
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), x0)
    step = make_train_step(model, tx, cfg)
    y = jnp.zeros((batch, 600, 168), jnp.float32)
    tf = step.lower(state, feats, y).cost_analysis()  # step is already jitted
    train_flops = float(tf["flops"])
    print(f"train step (fwd+bwd+Adam), batch {batch}: "
          f"{train_flops/batch/1e9:.2f} GFLOP/clip")

    peak = 197e12  # v5e bf16 peak FLOP/s
    print("\nMFU table (v5e bf16 peak 197 TFLOP/s):")
    for name, ms, b, fl_clip in [
        ("serving b96 (339 ms)", 339.0, 96, serve_flops / batch),
        ("training b32 (515 ms)", 515.0, 32, train_flops / batch),
    ]:
        tput = b / (ms / 1e3)
        print(f"  {name}: {fl_clip*tput/1e12:.1f} TFLOP/s = "
              f"{100*fl_clip*tput/peak:.1f}% MFU")


if __name__ == "__main__":
    main()
