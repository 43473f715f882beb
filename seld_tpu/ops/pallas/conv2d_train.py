"""Fused TRAIN-mode conv2d(3x3) + BatchNorm + ReLU + freq-maxpool for the
CNN front-end's small-Cin first stage, with a hand-derived custom VJP.

Round-3 motivation (BENCH.md real-TPU train trace, b8 bf16): ~150 ms of the
270 ms flagship train step is the un-pooled stage-1 activation — the XLA
conv runs at 22.7 TFLOP/s (tiny K=8), then ~56 ms of layout copies, ~28 ms
of BatchNorm elementwise, ~20 ms of BN stat reductions, and a 12 ms
select-and-scatter pool backward all stream the (B, 256, 4800, 192) tensor
through HBM repeatedly. The serving smallcin kernel already eliminates this
for inference (ops/pallas/conv2d_pool.py); this module is its training
counterpart: the full-resolution activation is NEVER materialized in either
the forward or the backward pass — it is recomputed tile-by-tile in VMEM
(the conv is MXU-cheap: ~34 GFLOP/pass at b8, ~6 recomputed passes total).

Structure (all passes reuse the serving packer's channel-on-sublane p0
layout, packed ONCE and saved as the sole large residual):

  forward:
    pass F1  _stats_kernel     conv -> per-channel sum / sum-of-squares
                               (grid-accumulated (cout, 1) outputs)
    [XLA]                      mean/var, BN affine scale/bias (tiny)
    pass F2  serving kernel    conv + affine + ReLU + freq-pool -> out

  backward (stage 1's input is the data — no dx needed, so the VJP is
  only dW, dgamma, dbeta):
    pass B1  _sel_stats_kernel pooled-output stats S_g = sum(g_pre) and
                               S_gx = sum(g_pre * xhat) WITHOUT any conv
                               recompute: g_pre is nonzero only at the
                               maxpool-selected row, and there (when
                               out > 0) the selected pre-activation EQUALS
                               the saved pooled output, so acc_sel =
                               (out - bias)/scale recovers xhat_sel from
                               the forward output alone (round-4 attack:
                               this deleted the former _bwd_stats_kernel
                               pass — one full conv recompute + routing +
                               pack re-read — per step; round 5 moves the
                               reduction itself from a 27.4 ms XLA
                               convert_reduce into a Pallas pass over the
                               raw CT (out, cotangent) pair, ~6.7 ms)
    pass B2  _bwd_dw_kernel    recompute conv once, apply the batch-stats
                               BN backward g_z = scale*(g_pre - S_g/N -
                               xhat*S_gx/N), accumulate
                               dWk += g_z @ stack^T per pool row; also emits
                               EXACT S_g/S_gx accumulators from the routed
                               f32 rows — dgamma/dbeta come from these, so
                               the bf16 output-recovery error above touches
                               only the scale-suppressed c1/c2 corrections
                               (ADVICE r4: |beta/gamma| amplification)

Reference semantics reproduced: the stage composition at
/root/reference/model.py:261-287 (Conv -> BatchNorm2d -> ReLU -> MaxPool2d)
with torch/flax batch statistics (biased variance, mean-of-squares form) and
reduce_window's first-match maxpool tie-routing (window order = increasing
frequency row). The forward and backward conv recomputations are bitwise
identical (same ops, same order), so the equality-based first-match
selection is exact. Note the S_g/S_gx recovery needs only the SELECTED
value (== the pooled output), never which row was selected — ties resolve
identically by construction.

Gradient accumulation across the sequential TPU grid uses constant-index
output blocks (zero-initialized at the first grid step) — the revisited
block lives in VMEM for the whole grid and is written back once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seld_tpu.ops.pallas.conv2d_pool import (
    _smallcin_kernel,
    _smallcin_kernel_win,
    _smallcin_thin_kernel,
    smallcin_bands_spec,
    smallcin_bands_stack,
    smallcin_meta,
    smallcin_pack,
    smallcin_thin_bands_spec,
    smallcin_thin_meta,
    smallcin_thin_pack,
    smallcin_thin_stack,
    smallcin_thin_unpack_dw,
    smallcin_thin_window_spec,
    smallcin_unpack_dw,
    smallcin_window_spec,
)

# backward tiles hold several live (cout, tt) f32 temporaries (running max,
# taken mask, acc, routed grad) — use a narrower time block than serving's
# forward so they fit in the 16 MB scoped-VMEM stack (1280 measured 17.6 MB
# at cout=192; 1024 = 16.08 MB, 896 = 17.4 MB for the dw pass — the
# unrolled pf-row loops keep several iterations' temps live. 640 fits with
# margin and keeps tpad=5120 at t=4800, same as 1024 — zero extra padding).
# f32 inputs double the p0/cotangent block bytes (the dw pass measured
# 20.67 MB at tt=640 f32) — shrink to 384 (12.4 MB extrapolated).
def _bwd_block_t(x_dtype: str) -> int:
    return 640 if x_dtype == "bfloat16" else 384


def _row_stack(p_ref, r, kg, stacked, thin, tt, dtype):
    """The (K, tt) operand for pool row ``r`` — wide: contiguous reshape of
    the pre-duplicated kg rows; thin: in-kernel dx-tap assembly from the
    128-lane halo (smallcin_thin_stack)."""
    block = p_ref[0, 0, r : r + 3] if stacked else p_ref[0, r : r + 3]
    if thin:
        return smallcin_thin_stack(block, tt, dtype)
    return block.reshape(3 * kg, -1)


def _conv_row(p_ref, w_ref, r, kg, stacked, precision, thin=False, tt=None):
    """Recompute the conv output for pool row ``r``: (cout, tt) f32."""
    stack = _row_stack(p_ref, r, kg, stacked, thin, tt, w_ref.dtype)
    return jax.lax.dot_general(
        w_ref[...], stack, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _first_step():
    return (
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    )


def _valid_mask(tt: int, t: int):
    """(1, tt) mask of time columns < t — the pack's tpad columns include one
    column of dx-tap leakage at index t (sh[0] holds x[t-1] there), which
    must not enter the stats sums."""
    col0 = pl.program_id(2) * tt
    idx = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, tt), 1)
    return idx < t


def _stats_kernel(p_ref, w_ref, s1_ref, s2_ref, *, pf, kg, tt, t, stacked,
                  precision, thin=False):
    @pl.when(_first_step())
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    mask = _valid_mask(tt, t)
    s1 = jnp.zeros_like(s1_ref)
    s2 = jnp.zeros_like(s2_ref)
    for r in range(pf):
        acc = _conv_row(p_ref, w_ref, r, kg, stacked, precision, thin, tt)
        acc = jnp.where(mask, acc, 0.0)
        s1 = s1 + jnp.sum(acc, axis=1, keepdims=True)
        s2 = s2 + jnp.sum(acc * acc, axis=1, keepdims=True)
    s1_ref[...] = s1_ref[...] + s1
    s2_ref[...] = s2_ref[...] + s2


def _routed_rows(p_ref, w_ref, g, s_ref, b_ref, *, pf, kg, stacked, precision,
                 thin=False, tt=None):
    """Yield (r, g_pre_r, acc_r): the pooled cotangent routed through the
    maxpool's first-match argmax and the ReLU mask.

    The conv is computed ONCE per pool row and all pf (cout, tt) f32 rows
    stay live in VMEM (3.9 MB at pf=8, cout=192, tt=640) — the previous
    two-loop form recomputed every conv a second time for the routing pass,
    and the b32 trace (BENCH.md round 4) put the two backward passes at
    37.8 + 44.4 ms/step, dominated by exactly those K-dot recomputes.

    Selection is a strict-> running argmax (round 5): ties keep the EARLIER
    row, which is exactly reduce_window's first-match routing, and the
    second loop's per-row work drops from recompute+equality+taken-chain to
    one integer compare (the b32 trace put the dw pass at 54.5 ms, roughly
    half of it VPU routing arithmetic)."""
    scale = s_ref[...]
    bias = b_ref[...]
    accs = [
        _conv_row(p_ref, w_ref, r, kg, stacked, precision, thin, tt)
        for r in range(pf)
    ]
    m = ridx = None
    for r, acc in enumerate(accs):
        y = jnp.maximum(acc * scale + bias, 0.0)
        if m is None:
            m, ridx = y, jnp.zeros(y.shape, jnp.int32)
        else:
            better = y > m
            m = jnp.where(better, y, m)
            ridx = jnp.where(better, r, ridx)
    # on the selected row y == m, and its ReLU gate (pre > 0) is m > 0
    pos = m > 0.0
    for r, acc in enumerate(accs):
        g_pre = jnp.where((ridx == r) & pos, g, 0.0)
        yield r, g_pre, acc


def _bwd_dw_kernel(
    p_ref, w_ref, s_ref, b_ref, mu_ref, iv_ref, g_ref, c1_ref, c2_ref, dw_ref,
    sg_ref, sgx_ref, *, pf, kg, tt, t, stacked, precision, thin=False,
):
    @pl.when(_first_step())
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        sg_ref[...] = jnp.zeros_like(sg_ref)
        sgx_ref[...] = jnp.zeros_like(sgx_ref)

    # the BN-backward correction terms (-c1 - xhat*c2) are nonzero even where
    # the cotangent is zero — mask padded time columns (they are excluded
    # from the batch stats, and the pack's column t carries a dx-tap leak).
    # The mask also zeroes the cotangent itself: the FTC cotangent arrives
    # UNPADDED (round 5 deleted the 1.97 GB XLA pad — the grid's last time
    # tile reads past the array's t columns, garbage until masked here).
    mask = _valid_mask(tt, t)
    g = jnp.where(mask, g_ref[0, 0].astype(jnp.float32), 0.0)
    scale = s_ref[...]
    mu = mu_ref[...]
    iv = iv_ref[...]
    # g_z = scale*(g_pre - c1 - xhat*c2) with xhat = (acc-mu)*iv, refactored
    # to two fused multiply-adds on per-channel columns (round-5 VPU slim):
    # g_z = g_pre*scale - acc*A - B, A = iv*scale*c2, B = scale*c1 - mu*A
    a_col = iv * scale * c2_ref[...]
    b_col = scale * c1_ref[...] - mu * a_col
    dw = jnp.zeros_like(dw_ref)
    sg = jnp.zeros_like(sg_ref)
    sga = jnp.zeros_like(sgx_ref)
    for r, g_pre, acc in _routed_rows(
        p_ref, w_ref, g, s_ref, b_ref, pf=pf, kg=kg, stacked=stacked,
        precision=precision, thin=thin, tt=tt,
    ):
        # EXACT S_g / S_gx from the routed f32 rows (ADVICE r4): xhat comes
        # from the f32 conv recompute, so dgamma/dbeta are exact in any
        # dtype (and a gamma==0 channel keeps its true nonzero dgamma).
        # S_gx = sum(g_pre*xhat) = iv*(sum(g_pre*acc) - mu*sum(g_pre)) —
        # accumulate sum(g_pre*acc) and derive, skipping the xhat tile.
        # g_pre is zero on padded columns (zero cotangent), no mask needed.
        sg = sg + jnp.sum(g_pre, axis=1, keepdims=True)
        sga = sga + jnp.sum(g_pre * acc, axis=1, keepdims=True)
        g_z = jnp.where(mask, g_pre * scale - acc * a_col - b_col, 0.0)
        stack = _row_stack(p_ref, r, kg, stacked, thin, tt, w_ref.dtype)
        dw = dw + jax.lax.dot_general(
            g_z.astype(stack.dtype) if stack.dtype == jnp.bfloat16 else g_z,
            stack, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
    dw_ref[...] = dw_ref[...] + dw
    sg_ref[...] = sg_ref[...] + sg
    sgx_ref[...] = sgx_ref[...] + iv * (sga - mu * sg)


def _sel_stats_kernel(o_ref, g_ref, p_ref, q_ref, sg_ref, sgx_ref, *, tt, t):
    """Per-channel S_g / S_gx of the pooled-output recovery, tiled over the
    F2 kernel's RAW channel-on-sublane layout (B, F', Cout, tpad).

    gsel = g where out > 0 (the maxpool-selected row's pre-activation equals
    the pooled output wherever it is positive; zero-output positions carry
    zero ReLU gradient; padded time columns carry zero cotangent).
    xhat_sel = out*p - q with p = inv/scale and q = (bias/scale + mean)*inv
    precomputed per channel in XLA. Replaces the round-4 XLA convert_reduce
    recovery (27.4 ms at b32 — 3.77 GB at 138 GB/s). Reading the raw CT
    output + the CT-relayouted cotangent is load-bearing: both already
    exist as default-layout buffers in the step (the dw kernel reads the
    same gt; XLA's own recovery read the same raw out), so no layout pins
    change — the round-5 FTC-operand variant pinned the op OUTPUT's layout
    and disrupted global layout assignment (+70 ms of relayouts and
    duplicated dropout fusions, BENCH.md)."""

    @pl.when(_first_step())
    def _init():
        sg_ref[...] = jnp.zeros_like(sg_ref)
        sgx_ref[...] = jnp.zeros_like(sgx_ref)

    o = o_ref[0, 0].astype(jnp.float32)  # (Cout, tt)
    # the cotangent arrives UNPADDED in the FTC mode (round 5): columns
    # >= t are an out-of-bounds garbage read on the last tile — mask them
    # (this also keeps garbage raw-out columns from selecting anything)
    col0 = pl.program_id(2) * tt
    valid = (col0 + jax.lax.broadcasted_iota(jnp.int32, (1, tt), 1)) < t
    g = jnp.where(valid, g_ref[0, 0].astype(jnp.float32), 0.0)
    gsel = jnp.where(o > 0.0, g, 0.0)
    xhat = o * p_ref[...] - q_ref[...]
    sg_ref[...] = sg_ref[...] + jnp.sum(gsel, axis=1, keepdims=True)
    sgx_ref[...] = sgx_ref[...] + jnp.sum(gsel * xhat, axis=1, keepdims=True)


def _sel_stats_ct(out_ct, gt, t, scale, bias, mean, inv, interpret, x_dtype):
    """(sg, sgx) columns (C, 1) f32 via the Pallas reduction kernel over the
    (B, F', Cout, tpad) pair; None if the envelope does not hold (caller
    falls back to the XLA recovery)."""
    b, fo, c, tpad = out_ct.shape
    if interpret:
        tt = tpad
    else:
        cap = 2560 if x_dtype == "bfloat16" else 1280
        tt = 0
        for cand in range(cap, 127, -128):
            if tpad % cand == 0:
                tt = cand
                break
        if tt == 0 or c % 8 != 0:
            return None
    safe = jnp.where(scale == 0.0, 1.0, scale)
    # scale == 0 (gamma exactly 0): acc is unrecoverable from the output;
    # zero that channel's xhat term — harmless, the g_z correction it feeds
    # is multiplied by scale == 0 (dgamma/dbeta come from the dw kernel's
    # exact accumulators)
    p = jnp.where(scale == 0.0, 0.0, inv / safe).astype(jnp.float32)
    q = jnp.where(scale == 0.0, 0.0, (bias / safe + mean) * inv).astype(
        jnp.float32
    )
    col = lambda: pl.BlockSpec(
        (c, 1), lambda bb, ff, ti: (0, 0), memory_space=pltpu.VMEM
    )
    io_spec = pl.BlockSpec(
        (1, 1, c, tt), lambda bb, ff, ti: (bb, ff, 0, ti),
        memory_space=pltpu.VMEM,
    )
    sg, sgx = pl.pallas_call(
        functools.partial(_sel_stats_kernel, tt=tt, t=t),
        grid=(b, fo, tpad // tt),
        in_specs=[io_spec, io_spec, col(), col()],
        out_specs=[col(), col()],
        out_shape=[
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=7 * b * fo * tpad * c,
            bytes_accessed=2 * b * fo * tpad * c * out_ct.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(out_ct, gt, p.reshape(c, 1), q.reshape(c, 1))
    return sg, sgx


def _col_spec(cout):
    return pl.BlockSpec((cout, 1), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM)


def _grid_and_specs(meta, pf, tt, interpret, thin=False):
    b, f, t, cin, cout, kg, tpad, _tt = meta
    grid = (b, f // pf, tpad // tt)
    if thin:
        p_spec = (
            smallcin_thin_bands_spec(pf, tpad) if interpret
            else smallcin_thin_window_spec(pf, tt)
        )
        kdim = 72
    else:
        p_spec = (
            smallcin_bands_spec(pf, kg, tt) if interpret
            else smallcin_window_spec(pf, kg, tt)
        )
        kdim = 3 * kg
    w_spec = pl.BlockSpec(
        (cout, kdim), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM
    )
    return grid, p_spec, w_spec


def _fwd_impl(p0, pin, wk, gamma, beta, meta, pf, eps, interpret, precision,
              thin=False, mask_t=None):
    b, f, t, cin, cout, kg, tpad, tt = meta
    kd = 72 if thin else 3 * kg       # dot K per pool row (cost model)
    rows = 8 if thin else kg          # packed sublane rows read per F row
    grid, p_spec, w_spec = _grid_and_specs(meta, pf, tt, interpret, thin)

    s1, s2 = pl.pallas_call(
        functools.partial(
            _stats_kernel, pf=pf, kg=kg, tt=tt, t=t, stacked=interpret,
            precision=precision, thin=thin,
        ),
        grid=grid,
        in_specs=[p_spec, w_spec],
        out_specs=[_col_spec(cout), _col_spec(cout)],
        out_shape=[
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
            jax.ShapeDtypeStruct((cout, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f * tpad * kd * cout,
            bytes_accessed=b * f * tpad * rows * p0.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pin, wk)

    n = b * f * t
    mean = s1[:, 0] / n
    # biased variance via mean-of-squares (flax _compute_stats formula)
    var = jnp.maximum(s2[:, 0] / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    scale = gamma.astype(jnp.float32) * inv
    bias = beta.astype(jnp.float32) - mean * scale

    # pass F2: the serving kernel body with the batch-stats affine
    if thin:
        kern = functools.partial(
            _smallcin_thin_kernel, pf=pf, tt=tt, stacked=interpret,
            mask_t=mask_t,
        )
    else:
        kern = functools.partial(
            _smallcin_kernel if interpret else _smallcin_kernel_win,
            pf=pf, kg=kg, mask_t=mask_t, tt=tt,
        )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[p_spec, w_spec, _col_spec(cout), _col_spec(cout)],
        out_specs=pl.BlockSpec(
            (1, 1, cout, tt), lambda b, fo, ti: (b, fo, 0, ti),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, f // pf, cout, tpad), p0.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f * tpad * kd * cout,
            bytes_accessed=(b * f * tpad * rows + b * (f // pf) * tpad * cout)
            * p0.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pin, wk, scale.reshape(cout, 1), bias.reshape(cout, 1))
    return out, mean, var, scale, bias, inv


def conv2d_smallcin_bn_relu_fpool_train(
    x, w, gamma, beta, pool_f, eps=1e-5, interpret=False, precision=None,
    pack="wide", out_layout="FTC",
):
    """Fused train-mode stage: x (B, F, T, Cin), w (3, 3, Cin, Cout) dense
    kernel, gamma/beta (Cout,) BN parameters.

    Returns (out, mean, var): out (B, F//pool_f, T, Cout) =
    maxpool_f(relu(bn_batchstats(conv(x, w)))); mean/var are the biased
    batch statistics for the caller's running-average update (stop-gradient
    them there — their cotangents are ignored by the VJP).

    The VJP covers (w, gamma, beta); dx is returned as zeros (stage 1's
    input is the data pipeline — jax DCEs the unused zero graph).

    ``pack='thin'`` (cin <= 8 only) uses the thin pack: 1/4 the packed
    bytes across ALL five kernel passes, dx taps assembled in-kernel.

    ``out_layout='CT'`` keeps the kernel's native channel-on-sublane
    (B, F//pf, Cout, tpad) output with columns >= t zeroed in-kernel — a
    valid input for the train-mode CT wide stages (conv2d_ct_train.py);
    the cotangent must then arrive in the same layout.
    """
    op = _get_op(
        tuple(x.shape), jnp.dtype(x.dtype).name, w.shape[-1],
        pool_f, float(eps), bool(interpret), precision, pack, out_layout,
    )
    return op(x, w, gamma, beta)


@functools.lru_cache(maxsize=64)
def _get_op(x_shape, x_dtype, cout, pool_f, eps, interpret, precision,
            pack="wide", out_layout="FTC"):
    """Build the custom-VJP op for one static configuration. Static metadata
    lives in this closure — custom_vjp residuals may only carry arrays."""
    b, f, t, cin = x_shape
    thin = pack == "thin"
    if thin:
        assert cin <= 8, f"thin pack needs cin <= 8, got {cin}"
        tpad, tt = smallcin_thin_meta(t, force_tt=_bwd_block_t(x_dtype))
        if interpret:
            tt = tpad  # single lane tile; Blocked specs can't overlap
        meta = (b, f, t, cin, cout, None, tpad, tt)
        kg = None
    else:
        meta = smallcin_meta(b, f, t, cin, cout, force_tt=_bwd_block_t(x_dtype))
        _, _, _, _, _, kg, tpad, tt = meta
    pf = pool_f
    assert f % pf == 0, (f, pf)

    def fwd_impl(x, w, gamma, beta):
        if thin:
            p0, wk, _meta_p = smallcin_thin_pack(
                x, w, force_tt=_bwd_block_t(x_dtype)
            )
        else:
            p0, wk, meta_p = smallcin_pack(x, w, force_tt=_bwd_block_t(x_dtype))
            assert meta_p == meta, (meta_p, meta)
        pin = smallcin_bands_stack(p0, pf) if interpret else p0
        out_ct, mean, var, scale, bias, inv = _fwd_impl(
            p0, pin, wk, gamma, beta, meta, pf, eps, interpret, precision,
            thin=thin, mask_t=t if out_layout == "CT" else None,
        )
        if out_layout == "CT":
            out = out_ct  # (B, F//pf, Cout, tpad), cols >= t zeroed in-kernel
        else:
            out = jnp.transpose(out_ct[..., :t], (0, 1, 3, 2))  # (B, F//pf, T, Cout)
        # residuals carry the RAW (B, F//pf, Cout, tpad) kernel output, not
        # the transposed view: the backward's S_g/S_gx pass reads it in its
        # native default layout (no layout pin on the op's OUTPUT — the
        # round-5 FTC-operand attempt cost +70 ms of relayouts, BENCH.md).
        # Same liveness as round 4: XLA's own recovery fusion also read the
        # raw kernel output at backward time (b32 trace, fusion.20 inputs).
        return (out, mean, var), (p0, wk, mean, inv, scale, bias, out_ct)

    @jax.custom_vjp
    def op(x, w, gamma, beta):
        outs, _ = fwd_impl(x, w, gamma, beta)
        return outs

    def vjp_bwd(res, cts):
        g_out, _g_mean, _g_var = cts  # mean/var feed running stats only
        p0, wk, mean, inv, scale, bias, out_ct = res
        grid, p_spec, w_spec = _grid_and_specs(meta, pf, tt, interpret, thin)
        pin = smallcin_bands_stack(p0, pf) if interpret else p0

        # cotangent into the kernel's (B, F//pf, cout, tpad) layout; padded
        # time columns carry zero cotangent -> no contribution to the sums.
        # (Feeding the dw kernel the FTC cotangent directly with an
        # in-kernel tile transpose is a measured anti-result: +146 ms at
        # b32, BENCH.md round 5.)
        if out_layout == "CT":
            gt = g_out  # already kernel-layout; CT consumers zero cols >= t
        else:
            # UNPADDED (B, F//pf, cout, t): the consuming kernels mask
            # columns >= t in-block, so the last time tile's out-of-bounds
            # read is harmless — the former XLA pad materialized a separate
            # 1.97 GB buffer (pad.18, 5.9 ms at b32; BENCH.md round 5).
            # Interpret mode keeps the pad (its whole-row blocks must be
            # in-bounds).
            gt = jnp.transpose(g_out, (0, 1, 3, 2))
            if interpret:
                gt = jnp.pad(gt, ((0, 0), (0, 0), (0, 0), (0, tpad - t)))
        g_spec = pl.BlockSpec(
            (1, 1, cout, tt), lambda b, fo, ti: (b, fo, 0, ti),
            memory_space=pltpu.VMEM,
        )

        # S_g / S_gx from the pooled forward output (no conv recompute, no
        # routing, no pack re-read): g_pre is nonzero only at the
        # maxpool-selected row AND where its pre-activation is positive —
        # there y = pre = out, so acc_sel = (out - bias) / scale and
        # xhat_sel = (acc_sel - mean) * inv. Where out == 0 the selected
        # row's ReLU gradient is zero (strict `pre > 0`), and padded time
        # columns carry zero cotangent, so both are masked. This is NOT
        # the forbidden merged-backward decomposition (BENCH.md round 3): no
        # dot is split — B2 still subtracts inside the kernel before its dW
        # dot. These recovered sums feed ONLY the c1/c2 corrections; the
        # returned dgamma/dbeta come from the dw kernel's exact routed-f32
        # accumulators (ADVICE r4). scale == 0 (gamma exactly 0) makes acc
        # unrecoverable; the guard zeroes that channel's c2 — harmless, since
        # g_z multiplies the correction by scale == 0. Both passes (pallas
        # kernel or XLA fallback) read (out_ct, gt) — the raw CT pair that
        # already exists in the step's dataflow.
        pallas_stats = _sel_stats_ct(
            out_ct, gt, t, scale, bias, mean, inv, interpret, x_dtype
        )
        if pallas_stats is not None:
            sg, sgx = pallas_stats
        else:
            colb = lambda v: v.astype(jnp.float32).reshape(1, 1, cout, 1)
            of = out_ct.astype(jnp.float32)
            safe_scale = jnp.where(scale == 0.0, 1.0, scale)
            xhat_sel = ((of - colb(bias)) / colb(safe_scale) - colb(mean)) * colb(inv)
            xhat_sel = jnp.where(colb(scale) == 0.0, 0.0, xhat_sel)
            gsel = jnp.where(of > 0.0, gt.astype(jnp.float32), 0.0)
            sg = jnp.sum(gsel, axis=(0, 1, 3)).reshape(cout, 1)
            sgx = jnp.sum(gsel * xhat_sel, axis=(0, 1, 3)).reshape(cout, 1)

        col = lambda v: v.astype(jnp.float32).reshape(cout, 1)
        common = (wk, col(scale), col(bias), col(mean), col(inv))
        common_specs = [
            w_spec, _col_spec(cout), _col_spec(cout), _col_spec(cout),
            _col_spec(cout),
        ]

        n = b * f * t
        kdim = 72 if thin else 3 * kg
        dwk, sg_k, sgx_k = pl.pallas_call(
            functools.partial(
                _bwd_dw_kernel, pf=pf, kg=kg, tt=tt, t=t, stacked=interpret,
                precision=precision, thin=thin,
            ),
            grid=grid,
            in_specs=[p_spec, *common_specs, g_spec, _col_spec(cout), _col_spec(cout)],
            out_specs=[
                pl.BlockSpec(
                    (cout, kdim), lambda b, fo, ti: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                _col_spec(cout),
                _col_spec(cout),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((cout, kdim), jnp.float32),
                jax.ShapeDtypeStruct((cout, 1), jnp.float32),
                jax.ShapeDtypeStruct((cout, 1), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=6 * b * f * tpad * (72 if thin else 3 * kg) * cout,
                bytes_accessed=b * f * tpad * (8 if thin else kg)
                * p0.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(pin, *common, gt, sg / n, sgx / n)

        dw = (
            smallcin_thin_unpack_dw(dwk, cin) if thin
            else smallcin_unpack_dw(dwk, cin)
        ).astype(wk.dtype)
        # dgamma/dbeta from the kernel's exact routed-f32 accumulators (the
        # XLA-recovered sg/sgx above serve only the c1/c2 corrections, whose
        # residual error is suppressed by the scale multiplication in g_z —
        # and vanishes entirely for gamma == 0 channels)
        dgamma = sgx_k[:, 0]
        dbeta = sg_k[:, 0]
        dx = jnp.zeros(x_shape, x_dtype)  # input needs no grad (data); DCE'd
        return dx, dw, dgamma, dbeta

    op.defvjp(fwd_impl, vjp_bwd)
    return op
