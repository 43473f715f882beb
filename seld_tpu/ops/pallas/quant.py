"""int8 post-training-quantization kernels for serving.

PTQ path for the Hamilton matmuls (the TCN's 1x1 convs and the FC heads are
plain Hamilton matmuls at (B*T, 384) x (384, 384) flagship shapes): weights
are quantized offline per output channel (symmetric int8), activations are
quantized dynamically per row-tile inside the kernel, and the MXU runs
int8 x int8 -> int32 at twice the bf16 peak. Dequantization fuses into the
epilogue: out = acc * (x_scale * w_scale[col]) + bias.

The reference has no quantization story (single-GPU f32 research code,
SURVEY.md §6); this is a serving-only extension — training and the parity
path stay f32/bf16.

Sign handling: the Hamilton block weight is built from ±component values, so
the int8 quantization commutes with assembly (|±w| = |w|); per-OUTPUT-block
scales stay valid because every output block column reads one component
column set. We quantize the ASSEMBLED (Cin, Cout) weight per out-channel,
which is exact for the block structure and keeps the kernel a plain matmul.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight_per_channel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8: w (Cin, Cout) -> (int8 (Cin, Cout),
    f32 scale (Cout,)); w ~= int8 * scale."""
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_matmul_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, *, out_dtype):
    x = x_ref[...].astype(jnp.float32)  # (TM, Cin)
    # dynamic per-row activation quantization (symmetric int8)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    xs = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    out = acc * xs * ws_ref[...] + b_ref[...]
    o_ref[...] = out.astype(out_dtype)


def int8_matmul(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_m: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (..., Cin) @ dequant(w_q, w_scale) + bias, int8 MXU path.

    Activations are quantized per row inside the kernel (dynamic PTQ);
    output dtype follows x.
    """
    lead = x.shape[:-1]
    cin = x.shape[-1]
    cout = w_q.shape[-1]
    x2 = x.reshape(-1, cin)
    m = x2.shape[0]
    tm = min(block_m, ((m + 7) // 8) * 8)
    pad_m = ((m + tm - 1) // tm) * tm
    if pad_m != m:
        x2 = jnp.pad(x2, ((0, pad_m - m), (0, 0)))
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, out_dtype=x.dtype),
        grid=(pad_m // tm,),
        in_specs=[
            pl.BlockSpec((tm, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pad_m, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * pad_m * cin * cout,
            bytes_accessed=pad_m * cin * x.dtype.itemsize + cin * cout + pad_m * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, w_q, w_scale.astype(jnp.float32).reshape(1, cout), bias.astype(jnp.float32).reshape(1, cout))
    out = out[:m] if pad_m != m else out
    return out.reshape(*lead, cout)


def quantize_hamilton(comps: jnp.ndarray, assemble_fn) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize a stacked Hamilton component weight for int8 serving.

    comps (n, Cin//n, Cout//n) -> (int8 assembled (Cin, Cout), f32 scales
    (Cout,)) using the given assembly (q / dq-conv / dq-linear orientation).
    Offline (once per checkpoint), so assembling the full block here is fine.
    """
    return quantize_weight_per_channel(assemble_fn(comps).astype(jnp.float32))
