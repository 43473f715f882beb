"""Fused conv2d(3x3) + affine(BN) + ReLU + frequency-maxpool Pallas kernel.

The CNN front-end's dominant cost is HBM traffic: each conv block writes a
full-resolution activation like (B, 256, 4800, C) — 4.7 GB at B=16 bf16 —
then BatchNorm/ReLU/MaxPool stream it back (reference structure
model.py:261-287). This kernel never materializes it: each grid program
computes the conv for one (pool-window x time-tile) patch in VMEM, applies
the folded BN affine + ReLU, max-reduces over the pool window, and writes
only the pooled output — an ``pf``-fold reduction in activation traffic.

Scope: stride 1, 3x3 kernel, zero padding 1, pooling (pf, 1) over the
frequency axis (the reference's pool_time='TCN' configuration). Inference
path (BN running stats folded into scale/bias); training uses the XLA path.

Layout: x (B, F, T, Cin) pre-padded by the wrapper to (B, F+2, T+2, Cin);
w (3, 3, Cin, Cout); out (B, F//pf, T, Cout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, s_ref, b_ref, o_ref, x_s, sem, *, pf, tt, cin, cout):
    b = pl.program_id(0)
    fo = pl.program_id(1)
    ti = pl.program_id(2)

    # halo copy: rows fo*pf .. fo*pf+pf+1, cols ti*tt .. ti*tt+tt+7 of padded
    # x (the time window is tt+8, not tt+2: Mosaic requires 8-aligned DMA
    # slice shapes along the sublane dimension)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(fo * pf, pf + 2), pl.ds(ti * tt, tt + 8), :],
        x_s,
        sem,
    )
    dma.start()
    dma.wait()

    scale = s_ref[...]
    bias = b_ref[...]

    # per-tap matmul accumulation (Mosaic cannot lower an im2col concat of
    # non-lane-aligned slices); each tap is a (tt, cin) @ (cin, cout) MXU dot
    out = jnp.full((tt, cout), -jnp.inf, dtype=jnp.float32)
    for r in range(pf):
        acc = jnp.zeros((tt, cout), dtype=jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + jnp.dot(
                    x_s[r + dy, dx : dx + tt, :],
                    w_ref[dy, dx],
                    preferred_element_type=jnp.float32,
                )
        y = jnp.maximum(acc * scale + bias, 0.0)
        out = jnp.maximum(out, y)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def conv2d_bn_relu_fpool(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    pool_f: int,
    block_t: int = 600,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, F, T, Cin), w (3, 3, Cin, Cout) -> (B, F//pf, T, Cout).

    Computes maxpool_f(relu(conv2d(x, w, pad=1) * scale + bias)). ``scale``/
    ``bias`` are the folded BatchNorm affine (gamma/sqrt(var+eps),
    beta - mean*that); pass ones/zeros for a plain conv+relu+pool.
    """
    b, f, t, cin = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, cin), w.shape
    assert f % pool_f == 0, (f, pool_f)
    tt = min(block_t, t)
    while t % tt:
        tt //= 2
    assert t % tt == 0 and tt % 8 == 0, (t, tt)

    # time padded (1, 7): 1 for the conv halo plus 6 slack so the 8-aligned
    # tt+8 DMA windows stay in bounds on the last tile
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
    grid = (b, f // pool_f, t // tt)
    out = pl.pallas_call(
        functools.partial(_kernel, pf=pool_f, tt=tt, cin=cin, cout=cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # padded x stays in HBM
            pl.BlockSpec((3, 3, cin, cout), lambda b, fo, ti: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tt, cout), lambda b, fo, ti: (b, fo, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, f // pool_f, t, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((pool_f + 2, tt + 8, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f * t * 9 * cin * cout,
            bytes_accessed=(b * f * t * cin + b * (f // pool_f) * t * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w, scale.reshape(1, cout), bias.reshape(1, cout))
    return out
