"""Fused conv2d(3x3) + affine(BN) + ReLU + frequency-maxpool Pallas kernel.

The CNN front-end's dominant cost is HBM traffic: each conv block writes a
full-resolution activation like (B, 256, 4800, C) — 4.7 GB at B=16 bf16 —
then BatchNorm/ReLU/MaxPool stream it back (reference structure
model.py:261-287). This kernel never materializes it: each grid program
computes the conv for one (pool-window x time-tile) patch in VMEM, applies
the folded BN affine + ReLU, max-reduces over the pool window, and writes
only the pooled output — a ``pf``-fold reduction in activation traffic.

Halo handling: Mosaic restricts manual DMA slices to 128-multiple lane dims
(empirically probed), which the small channel counts here (8/192) violate.
Instead the wrapper pre-packs overlapping windows ONCE in XLA — rows grouped
into (pf+2)-tall pool bands and time into (tt+8)-wide tiles (~1.27x the
input bytes) — so the kernel uses plain pipelined BlockSpecs (automatic
double buffering, no manual DMA).

Scope: stride 1, 3x3 kernel, zero padding 1, pooling (pf, 1) over the
frequency axis (the reference's pool_time='TCN' configuration). Inference
path (BN running stats folded into scale/bias); training uses the XLA path.

Three kernels, chosen by channel width:

- ``conv2d_smallcin_bn_relu_fpool`` — the small-Cin winner (stage 1,
  Cin=8): channel-on-sublane / time-on-lane packing. XLA pre-applies the 3
  time shifts as 16/32-padded sublane groups per frequency-band row, so
  each grid cell is ONE (Cout, 3*kg) @ (3*kg, tt) MXU dot per pool row
  (K=96 for Cin=8 vs the XLA conv's K=8, which ran at ~14 TFLOP/s) with
  the BN/ReLU/freq-pool epilogue fused — the 7.5 GB unpooled activation is
  never materialized. Lanes stay the (long) time axis throughout, so
  nothing pads 8 -> 128.
- ``conv2d_im2col_bn_relu_fpool`` — K-packed channel-last im2col. CAVEAT:
  Pallas pins default layouts, so the (B, F, T, 9*Cin) patches pad
  72 -> 128 lanes and the slice temps pad 16x; at the flagship b16 this
  OOMs the chip. Superseded by the smallcin kernel; kept for mid-sized
  Cin where 9*Cin is lane-aligned-ish and shapes are small.
- ``conv2d_bn_relu_fpool`` — halo-windowed per-tap dots, for wide channels
  (K=Cin per tap, e.g. 192) where packed copies would dwarf the input
  bytes but per-tap dots already feed the MXU well.

The serving integration point is models/fused_infer.py, which picks
per-stage: smallcin when 3*Cin <= 32, windows otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, pf, tt, cout):
    scale = s_ref[...]
    bias = b_ref[...]
    x = x_ref[0, 0, :, 0]  # (pf+2, tt+8, cin)

    # per-tap matmul accumulation; each tap is a (tt, cin) @ (cin, cout) MXU dot
    out = jnp.full((tt, cout), -jnp.inf, dtype=jnp.float32)
    for r in range(pf):
        acc = jnp.zeros((tt, cout), dtype=jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + jnp.dot(
                    x[r + dy, dx : dx + tt, :],
                    w_ref[dy, dx],
                    preferred_element_type=jnp.float32,
                )
        y = jnp.maximum(acc * scale + bias, 0.0)
        out = jnp.maximum(out, y)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pack_windows(x: jnp.ndarray, pf: int, tt: int) -> jnp.ndarray:
    """(B, F, T, C) -> (B, F//pf, pf+2, T//tt, tt+8, C) overlapping windows
    of the zero-padded input (conv halo 1 each side; time windows padded to
    tt+8 for sublane alignment)."""
    b, f, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
    rows = jnp.stack([xp[:, i * pf : i * pf + pf + 2] for i in range(f // pf)], axis=1)
    # rows: (B, F//pf, pf+2, T+8, C)
    tiles = jnp.stack(
        [rows[..., j * tt : j * tt + tt + 8, :] for j in range(t // tt)], axis=3
    )
    return tiles  # (B, F//pf, pf+2, T//tt, tt+8, C)


def _im2col_kernel(p_ref, w_ref, s_ref, b_ref, o_ref, *, pf, tt, cout):
    p = p_ref[0]  # (pf, tt, K)
    k = p.shape[-1]
    y = jnp.dot(
        p.reshape(pf * tt, k), w_ref[...], preferred_element_type=jnp.float32
    )
    y = jnp.maximum(y.reshape(pf, tt, cout) * s_ref[...] + b_ref[...], 0.0)
    o_ref[0, 0] = jnp.max(y, axis=0).astype(o_ref.dtype)


def conv2d_im2col_bn_relu_fpool(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    pool_f: int,
    block_t: int = 600,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, F, T, Cin), w (3, 3, Cin, Cout) -> (B, F//pf, T, Cout).

    Same contract as :func:`conv2d_bn_relu_fpool`, via K-packed im2col:
    patches[b, f, t, (dy*3+dx)*cin + c] = xpad[b, f+dy, t+dx, c], so each
    grid cell is a single MXU dot. Patches are 9x the input bytes — use for
    small Cin only (fused_infer gates on 9*Cin <= 256).
    """
    b, f, t, cin = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, cin), w.shape
    assert f % pool_f == 0, (f, pool_f)
    # largest 8-aligned divisor of t within the block budget (halving-only
    # search can skip valid divisors, e.g. t=1000 has 8|40|200 but no
    # power-of-two path from 600)
    tt = max(
        (c for c in range(8, min(block_t, t) + 1, 8) if t % c == 0), default=None
    )
    assert tt is not None, f"no 8-aligned time-block divisor for t={t}"


    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [
            xp[:, dy : dy + f, dx : dx + t, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )  # (B, F, T, 9*cin) — matches w.reshape(9*cin, cout) tap order
    k = 9 * cin
    pf = pool_f
    grid = (b, f // pf, t // tt)
    return pl.pallas_call(
        functools.partial(_im2col_kernel, pf=pf, tt=tt, cout=cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, pf, tt, k),
                lambda b, fo, ti: (b, fo, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k, cout), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tt, cout), lambda b, fo, ti: (b, fo, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, f // pf, t, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f * t * k * cout,
            bytes_accessed=(b * f * t * k + b * (f // pf) * t * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(patches, w.reshape(k, cout), scale.reshape(1, cout), bias.reshape(1, cout))


# Lane-tile constant of the halo'd CT chain (``out_layout='CTH'``): producers
# emit (B, F//pf + 2, C, CT_HALO + tpad + CT_HALO) with the conv's F halo rows
# and a CT_HALO-lane zero halo each side, so the consuming widecin stage reads
# its (tt+256)-lane windows straight out of the producer's output — no XLA
# pad copy between CNN stages (12.6 + 2.0 ms and a duplicate ~6 GB buffer at
# b64/b96, BENCH.md round-3 trace). 384 = the widecin block width: the halo
# doubles as one border block of the producer's extended grid.
CT_HALO = 384


def _zero_pad_cols(out, mask_t, tt, tile_off=0):
    """Zero output columns >= mask_t (the grid's lane-tile offset rides
    program_id(2); ``tile_off`` shifts it for halo'd output grids whose
    first data tile is program 1). The packed tpad region would otherwise
    hold relu(bias) != 0 — consumers reading the raw channel-on-sublane
    output (``out_layout='CT'``/``'CTH'``) rely on those columns being
    exact conv zero-pad."""
    if mask_t is None:
        return out
    col0 = (pl.program_id(2) - tile_off) * tt
    idx = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, out.shape[-1]), 1)
    return jnp.where(idx < mask_t, out, 0.0)


def _halo_border():
    """Border predicate of a CTH-extended (b, nf+2, nt+2) grid: the first/
    last F row blocks and first/last lane tiles are the halo — written as
    zeros (they are the next stage's conv zero-padding)."""
    fo, ti = pl.program_id(1), pl.program_id(2)
    return (
        (fo == 0) | (fo == pl.num_programs(1) - 1)
        | (ti == 0) | (ti == pl.num_programs(2) - 1)
    )


def _halo_pad_ct(out_ct, t, f_rows):
    """XLA emulation of the CTH layout from a plain CT output — the
    interpret-mode path (Element-indexed halo grids don't interpret) and the
    contract documentation in one place: (B, F', C, tpad_i) ->
    (B, F'+2, C, CT_HALO + tpad_h + CT_HALO), tpad_h = ceil(t/CT_HALO)*CT_HALO.
    Columns >= t of ``out_ct`` must already be zero (the kernels' mask_t)."""
    del f_rows
    tpad_h = -(-t // CT_HALO) * CT_HALO
    tpad_i = out_ct.shape[-1]
    if tpad_i > tpad_h:
        out_ct = out_ct[..., :tpad_h]  # cols >= t are zero by contract
    return jnp.pad(
        out_ct,
        (
            (0, 0), (1, 1), (0, 0),
            (CT_HALO, CT_HALO + max(0, tpad_h - tpad_i)),
        ),
    )


def _smallcin_kernel(p_ref, w_ref, s_ref, b_ref, o_ref, *, pf, kg,
                     mask_t=None, tt=None):
    out = None
    for r in range(pf):
        # rows r..r+2 of the band are the dy taps; each is kg sublanes of
        # (dx, c)-grouped, zero-padded channels. 3*kg contiguous rows
        # reshape to the K axis with no relayout (kg is a sublane-tile
        # multiple for both f32 and bf16).
        stack = p_ref[0, 0, r : r + 3].reshape(3 * kg, -1)
        acc = jax.lax.dot_general(
            w_ref[...], stack, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cout, tt)
        y = jnp.maximum(acc * s_ref[...] + b_ref[...], 0.0)
        out = y if out is None else jnp.maximum(out, y)
    o_ref[0, 0] = _zero_pad_cols(out, mask_t, tt).astype(o_ref.dtype)


def _smallcin_kernel_win(p_ref, w_ref, s_ref, b_ref, o_ref, *, pf, kg,
                         mask_t=None, tt=None):
    """Like :func:`_smallcin_kernel`, but the F-window block is 4-D
    (1, pf+2, kg, tt) — read directly from the halo'd (B, F+2, kg, T)
    tensor via an Element-indexed overlapping window (no bands stack)."""
    out = None
    for r in range(pf):
        stack = p_ref[0, r : r + 3].reshape(3 * kg, -1)
        acc = jax.lax.dot_general(
            w_ref[...], stack, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(acc * s_ref[...] + b_ref[...], 0.0)
        out = y if out is None else jnp.maximum(out, y)
    o_ref[0, 0] = _zero_pad_cols(out, mask_t, tt).astype(o_ref.dtype)


def smallcin_meta(
    b: int, f: int, t: int, cin: int, cout: int,
    block_t: int = 2560, force_tt: int | None = None,
):
    """Static tiling metadata shared by :func:`smallcin_pack` and the train
    op's custom-VJP closure (which must derive it from shapes alone)."""
    assert 3 * cin <= 32, f"smallcin kernel needs 3*cin <= 32, got cin={cin}"
    kg = 16 if 3 * cin <= 16 else 32  # sublane-tile-aligned (dx, c) group
    if force_tt is not None:
        # caller-chosen tile (multiple of 128); tpad rounds UP to it so the
        # grid always divides — a few extra zero columns of conv work
        assert force_tt % 128 == 0, force_tt
        tt = min(force_tt, -(-(t + 1) // 128) * 128)
        tpad = -(-(t + 1) // tt) * tt
    else:
        tpad = -(-(t + 1) // 128) * 128
        units = tpad // 128
        tt = 128 * max(
            u for u in range(1, units + 1) if units % u == 0 and 128 * u <= block_t
        )
    return (b, f, t, cin, cout, kg, tpad, tt)


def smallcin_pack(
    x: jnp.ndarray,
    w: jnp.ndarray,
    block_t: int = 2560,
    pre_transposed: bool = False,
    force_tt: int | None = None,
):
    """Shared packer for the smallcin kernels (serving fwd + train fwd/bwd).

    x (B, F, T, Cin) — or (B, F, Cin, T) with ``pre_transposed`` — and
    w (3, 3, Cin, Cout) become:
      p0 (B, F+2, kg, tpad): F conv halo rows, kg sublanes holding the 3
        time-shifted copies of the Cin channels (zero-padded to the
        sublane-tile multiple), time zero-padded to a 128 multiple;
      wk (Cout, 3*kg): weight rows matching the (dy, (dx, c)) stack order.
    Returns (p0, wk, meta) with meta = (b, f, t, cin, cout, kg, tpad, tt).
    """
    if pre_transposed:
        b, f, cin, t = x.shape
    else:
        b, f, t, cin = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, cin), w.shape
    b, f, t, cin, cout, kg, tpad, tt = smallcin_meta(
        b, f, t, cin, cout, block_t=block_t, force_tt=force_tt
    )

    # (B, F, T, C) -> (B, F+2, C, T): channel-on-sublane, F conv halo
    xt = x if pre_transposed else jnp.transpose(x, (0, 1, 3, 2))
    xt = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0)))
    # three time-shifted copies: shifted_dx[t'] = x[t' + dx - 1]
    sh = [
        jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (1, tpad - t - 1))),
        jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, tpad - t))),
        jnp.pad(xt[..., 1:], ((0, 0), (0, 0), (0, 0), (0, tpad - t + 1))),
    ]
    if kg > 3 * cin:
        sh.append(jnp.zeros((b, f + 2, kg - 3 * cin, tpad), x.dtype))
    p0 = jnp.concatenate(sh, axis=2)  # (B, F+2, kg, tpad)

    # weight rows match the (dy, (dx, c) zero-padded) stack order
    wt = jnp.pad(w.reshape(3, 3 * cin, cout), ((0, 0), (0, kg - 3 * cin), (0, 0)))
    wk = wt.reshape(3 * kg, cout).T  # (cout, 3*kg)
    return p0, wk, (b, f, t, cin, cout, kg, tpad, tt)


def smallcin_unpack_dw(dwk: jnp.ndarray, cin: int) -> jnp.ndarray:
    """(Cout, 3*kg) weight-gradient accumulator -> dense (3, 3, cin, cout),
    inverting the :func:`smallcin_pack` wk construction exactly."""
    cout, k3 = dwk.shape
    kg = k3 // 3
    wt = dwk.T.reshape(3, kg, cout)[:, : 3 * cin]  # drop zero-pad rows
    return wt.reshape(3, 3, cin, cout)


def smallcin_window_spec(pf: int, kg: int, tt: int):
    """Element-indexed overlapping (pf+2)-row F-window over p0 — the real-TPU
    input spec (Element indexing isn't supported by the interpreter)."""
    return pl.BlockSpec(
        # mixed Element/Blocked dims are rejected — every dim is
        # Element-indexed, so the index_map returns ELEMENT
        # starts (lane starts stay 128-aligned: tt | 128)
        (pl.Element(1), pl.Element(pf + 2), pl.Element(kg), pl.Element(tt)),
        lambda b, fo, ti: (b, fo * pf, 0, ti * tt),
        memory_space=pltpu.VMEM,
    )


def smallcin_bands_stack(p0: jnp.ndarray, pf: int) -> jnp.ndarray:
    """Interpret-mode fallback: materialize the overlapping F-windows as a
    stacked (B, F//pf, pf+2, kg, tpad) tensor."""
    f = p0.shape[1] - 2
    return jnp.stack([p0[:, i * pf : i * pf + pf + 2] for i in range(f // pf)], axis=1)


def smallcin_bands_spec(pf: int, kg: int, tt: int):
    return pl.BlockSpec(
        (1, 1, pf + 2, kg, tt),
        lambda b, fo, ti: (b, fo, 0, 0, ti),
        memory_space=pltpu.VMEM,
    )


def conv2d_smallcin_bn_relu_fpool(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    pool_f: int,
    block_t: int = 2560,
    interpret: bool = False,
    pre_transposed: bool = False,
    out_layout: str = "FTC",
) -> jnp.ndarray:
    """x (B, F, T, Cin), w (3, 3, Cin, Cout) -> (B, F//pf, T, Cout).

    ``pre_transposed=True`` takes x already in the packer's internal
    (B, F, Cin, T) channel-on-sublane layout (the conv-STFT serving path
    hands this over directly, skipping a full-tensor transpose).

    ``out_layout='CT'`` returns the kernel's RAW (B, F//pf, Cout, T_pad)
    channel-on-sublane output — padded columns >= T zeroed in-kernel — for
    direct consumption by :func:`conv2d_widecin_ct_bn_relu_fpool` (skipping
    the (..., Cout, T) -> (..., T, Cout) relayout, 14 ms at b64 on the
    serving trace).

    Same contract as :func:`conv2d_bn_relu_fpool`, for small Cin (3*Cin <=
    32; the flagship front-end has Cin=8, reference model.py:261-287).

    Layout strategy: channels ride the SUBLANE axis and time rides the LANE
    axis, so the tiny channel count never pads to 128 lanes. An XLA packer
    builds (B, F//pf, pf+2, kg, T_pad) bands where the kg sublanes hold the
    3 time-shifted copies of the Cin channels (zero-padded to kg = the
    sublane-tile multiple), F-halo rows included. Each grid cell then runs
    one K=3*kg dot per pool row and max-reduces — conv, BN affine, ReLU and
    the frequency pool all fused, output written once.
    """
    p0, wk, (b, f, t, cin, cout, kg, tpad, tt) = smallcin_pack(
        x, w, block_t=block_t, pre_transposed=pre_transposed
    )
    assert f % pool_f == 0, (f, pool_f)
    pf = pool_f
    grid = (b, f // pf, tpad // tt)
    args = (
        wk,
        scale.astype(jnp.float32).reshape(cout, 1),
        bias.astype(jnp.float32).reshape(cout, 1),
    )
    tail_specs = [
        pl.BlockSpec((cout, 3 * kg), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, 1), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, 1), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1, 1, cout, tt), lambda b, fo, ti: (b, fo, 0, ti), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=2 * b * f * tpad * 3 * kg * cout,
        bytes_accessed=(b * f * tpad * kg + b * (f // pf) * tpad * cout)
        * x.dtype.itemsize,
        transcendentals=0,
    )
    mask_t = t if out_layout == "CT" else None
    if not interpret:
        # read overlapping (pf+2)-row F-windows straight out of p0 with an
        # Element-indexed start (fo*pf): no (B, F//pf, pf+2, kg, T) bands
        # stack — at b16 that stack was a 1.6 GB write+read the kernel's
        # ~3 ms of MXU work could never amortize. (Element indexing isn't
        # supported by the interpreter, so interpret-mode tests keep the
        # stacked path.)
        out = pl.pallas_call(
            functools.partial(
                _smallcin_kernel_win, pf=pf, kg=kg, mask_t=mask_t, tt=tt
            ),
            grid=grid,
            in_specs=[smallcin_window_spec(pf, kg, tt), *tail_specs],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, f // pf, cout, tpad), x.dtype),
            cost_estimate=cost,
        )(p0, *args)
    else:
        bands = smallcin_bands_stack(p0, pf)  # (B, F//pf, pf+2, kg, tpad)
        out = pl.pallas_call(
            functools.partial(
                _smallcin_kernel, pf=pf, kg=kg, mask_t=mask_t, tt=tt
            ),
            grid=grid,
            in_specs=[smallcin_bands_spec(pf, kg, tt), *tail_specs],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, f // pf, cout, tpad), x.dtype),
            cost_estimate=cost,
            interpret=True,
        )(bands, *args)
    if out_layout == "CT":
        return out
    return jnp.transpose(out[..., :t], (0, 1, 3, 2))


def smallcin_thin_meta(t: int, block_t: int = 2560, force_tt: int | None = None):
    """Lane tiling for the thin pack (no +1 shift-leak column needed).

    ``force_tt`` mirrors :func:`smallcin_meta`'s: a caller-chosen 128-multiple
    tile; tpad rounds UP to it so the grid always divides."""
    if force_tt is not None:
        assert force_tt % 128 == 0, force_tt
        tt = min(force_tt, -(-t // 128) * 128)
        tpad = -(-t // tt) * tt
        return tpad, tt
    tpad = -(-t // 128) * 128
    units = tpad // 128
    tt = 128 * max(
        u for u in range(1, units + 1) if units % u == 0 and 128 * u <= block_t
    )
    return tpad, tt


def smallcin_thin_pack(
    x: jnp.ndarray,
    w: jnp.ndarray,
    block_t: int = 2560,
    pre_transposed: bool = False,
    force_tt: int | None = None,
    halo_grid: int = 0,
):
    """Thin packer: NO time-shift duplication (1/4 of :func:`smallcin_pack`'s
    bytes — that pack's 3x lane-shifted copy build measured 24.5 ms/b32 on
    the serving trace, the single largest op). The kernel builds the dx taps
    itself from a 128-lane halo.

    x (B, F, T, Cin) — or (B, F, Cin, T) with ``pre_transposed`` — and
    w (3, 3, Cin, Cout) become:
      pt (B, F+2, 8, 128 + tpad + 128): F conv-halo rows, channels
        zero-padded to 8 sublanes, 128 zero lanes each side (the kernel's
        dx-shift halo; doubles as the conv's time zero-pad);
      wk (Cout, 72): rows ordered (dx, dy, c8) to match the kernel's
        stack-of-rolled-slices assembly.

    ``halo_grid=pf`` builds the EXTENDED pack for the CTH output mode: the
    consuming grid gains one border block per edge ((b, nf+2, nt+2)), so the
    pack prepends/appends ``pf`` extra zero F rows and one extra ``tt`` lane
    tile each side — keeping every Element window start affine
    (``fo*pf`` / ``ti*tt``) and in-bounds without index clamping.
    """
    if pre_transposed:
        b, f, cin, t = x.shape
    else:
        b, f, t, cin = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, cin), w.shape
    assert cin <= 8, f"thin smallcin pack needs cin <= 8, got {cin}"
    if halo_grid:
        # CTH contract: the lane tile IS the halo width — no small-t clamp,
        # so consumers always see (CT_HALO + ceil(t/CT_HALO)*CT_HALO + CT_HALO)
        assert force_tt is not None
        tpad, tt = -(-t // force_tt) * force_tt, force_tt
    else:
        tpad, tt = smallcin_thin_meta(t, block_t, force_tt=force_tt)
    xt = x if pre_transposed else jnp.transpose(x, (0, 1, 3, 2))
    fh = 1 + halo_grid  # conv halo row + halo_grid extra border-block rows
    th = 128 + (tt if halo_grid else 0)
    pt = jnp.pad(
        xt, ((0, 0), (fh, fh), (0, 8 - cin), (th, th + tpad - t))
    )  # (B, F+2*fh, 8, th+tpad+th)
    wt = jnp.pad(w, ((0, 0), (0, 0), (0, 8 - cin), (0, 0)))  # (dy, dx, c8, o)
    wk = jnp.transpose(wt, (1, 0, 2, 3)).reshape(72, cout).T  # (o, (dx,dy,c8))
    return pt, wk, (b, f, t, cin, cout, tpad, tt)


def smallcin_thin_stack(block, tt: int, dtype):
    """(3, 8, tt+256) halo block -> (72, tt) (dx, dy, c8) stack in ``dtype``.

    f32 for the assembly (8-row-aligned sublane pieces; bf16's 16-row tile
    would misalign the 24-row pieces), cast at the end for the MXU. Each dx
    tap is rotated to lane offset 0 with ``pltpu.roll`` BEFORE the aligned
    [128:128+tt] slice: Mosaic's tpu.concatenate refuses operands whose
    lane offsets differ (slices at 127+dx have offsets 127/0/1 — "result/
    input offset mismatch on non-concat dimension"), while a cyclic lane
    rotate is supported in both compiled and interpret modes. The wrap
    lanes a rotate drags in land outside the slice window, so values are
    identical to the direct misaligned slices."""
    arr = block.astype(jnp.float32).reshape(24, -1)  # (3*8, tt+256)
    n = arr.shape[1]
    stack = jnp.concatenate(
        [pltpu.roll(arr, (1 - dx) % n, 1)[:, 128 : 128 + tt] for dx in range(3)],
        axis=0,
    )
    return stack.astype(dtype)


def smallcin_thin_unpack_dw(dwk: jnp.ndarray, cin: int) -> jnp.ndarray:
    """(Cout, 72) thin weight-grad accumulator -> dense (3, 3, cin, cout),
    inverting smallcin_thin_pack's (dx, dy, c8) wk row order."""
    cout = dwk.shape[0]
    wt = dwk.T.reshape(3, 3, 8, cout)  # (dx, dy, c8, cout)
    return jnp.transpose(wt, (1, 0, 2, 3))[:, :, :cin]


def smallcin_thin_window_spec(pf: int, tt: int):
    """Element-indexed overlapping window over pt: pf+2 F rows, tt+256
    lanes (the 128-lane dx halo each side; starts ti*tt stay 128-aligned)."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(pf + 2), pl.Element(8), pl.Element(tt + 256)),
        lambda b, fo, ti: (b, fo * pf, 0, ti * tt),
        memory_space=pltpu.VMEM,
    )


def smallcin_thin_bands_spec(pf: int, tpad: int):
    return pl.BlockSpec(
        (1, 1, pf + 2, 8, tpad + 256),
        lambda b, fo, ti: (b, fo, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _smallcin_thin_kernel(
    p_ref, w_ref, s_ref, b_ref, o_ref, *, pf, tt, stacked=False, mask_t=None,
    halo=False,
):
    """Thin-pack kernel body: p (1, pf+2, 8, tt+256) — c on sublanes, lane
    halo 128 each side. Builds the (72, tt) (dx, dy, c8) operand per pool
    row from three lane-offset value slices (f32 — 8-row-aligned sublane
    concat; bf16's 16-row tile would misalign the 24-row pieces), casts to
    the weights' dtype for the MXU dot, and fuses affine+ReLU+freq-pool.

    ``halo=True`` runs the CTH-extended grid: border blocks (first/last F
    row, first/last lane tile) write zeros — the emitted buffer IS the next
    widecin stage's halo'd input, no XLA pad in between."""

    def compute():
        scale = s_ref[...]
        bias = b_ref[...]
        out = None
        for r in range(pf):
            block = p_ref[0, 0, r : r + 3] if stacked else p_ref[0, r : r + 3]
            stack = smallcin_thin_stack(block, tt, w_ref.dtype)  # (72, tt)
            acc = jax.lax.dot_general(
                w_ref[...], stack, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (cout, tt)
            y = jnp.maximum(acc * scale + bias, 0.0)
            out = y if out is None else jnp.maximum(out, y)
        return _zero_pad_cols(
            out, mask_t, tt, tile_off=1 if halo else 0
        ).astype(o_ref.dtype)

    if not halo:
        o_ref[0, 0] = compute()
        return

    @pl.when(_halo_border())
    def _border():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])

    @pl.when(~_halo_border())
    def _interior():
        o_ref[0, 0] = compute()


def conv2d_smallcin_thin_bn_relu_fpool(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    pool_f: int,
    block_t: int = 2560,
    interpret: bool = False,
    pre_transposed: bool = False,
    out_layout: str = "FTC",
) -> jnp.ndarray:
    """Same contract as :func:`conv2d_smallcin_bn_relu_fpool`, via the thin
    pack: 1/4 the packed bytes, dx taps assembled in-kernel (one K=72 MXU
    dot per pool row, same pass count as the wide pack's K=96).
    ``out_layout='CT'`` as on the wide wrapper: raw zero-masked
    (B, F//pf, Cout, T_pad) channel-on-sublane output.

    ``out_layout='CTH'`` emits the halo'd CT buffer the next widecin stage
    consumes directly (``pre_halo=True``): (B, F//pf + 2, Cout,
    CT_HALO + tpad + CT_HALO) with zero borders, written by one extended
    grid — replacing the XLA pad copy between CNN stages (12.6 ms and a
    duplicate ~6 GB buffer at b64, BENCH.md round-3 trace)."""
    if out_layout == "CTH":
        if interpret:
            out_ct = conv2d_smallcin_thin_bn_relu_fpool(
                x, w, scale, bias, pool_f, block_t=block_t, interpret=True,
                pre_transposed=pre_transposed, out_layout="CT",
            )
            t = x.shape[-1] if pre_transposed else x.shape[-2]
            return _halo_pad_ct(out_ct, t, None)
        pt, wk, (b, f, t, cin, cout, tpad, tt) = smallcin_thin_pack(
            x, w, force_tt=CT_HALO, pre_transposed=pre_transposed,
            halo_grid=pool_f,
        )
        assert f % pool_f == 0, (f, pool_f)
        pf = pool_f
        nf, nt = f // pf, tpad // tt
        out = pl.pallas_call(
            functools.partial(
                _smallcin_thin_kernel, pf=pf, tt=tt, mask_t=t, halo=True
            ),
            grid=(b, nf + 2, nt + 2),
            in_specs=[
                smallcin_thin_window_spec(pf, tt),
                pl.BlockSpec((cout, 72), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, 1), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, 1), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, cout, tt), lambda b, fo, ti: (b, fo, 0, ti),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (b, nf + 2, cout, (nt + 2) * tt), x.dtype
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * f * tpad * 72 * cout,
                bytes_accessed=(b * f * tpad * 8 + b * (nf + 2) * (nt + 2) * tt * cout)
                * x.dtype.itemsize,
                transcendentals=0,
            ),
        )(
            pt, wk,
            scale.astype(jnp.float32).reshape(cout, 1),
            bias.astype(jnp.float32).reshape(cout, 1),
        )
        return out
    pt, wk, (b, f, t, cin, cout, tpad, tt) = smallcin_thin_pack(
        x, w, block_t=block_t, pre_transposed=pre_transposed
    )
    assert f % pool_f == 0, (f, pool_f)
    pf = pool_f
    args = (
        wk,
        scale.astype(jnp.float32).reshape(cout, 1),
        bias.astype(jnp.float32).reshape(cout, 1),
    )
    tail_specs = [
        pl.BlockSpec((cout, 72), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, 1), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, 1), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1, 1, cout, tt), lambda b, fo, ti: (b, fo, 0, ti), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=2 * b * f * tpad * 72 * cout,
        bytes_accessed=(b * f * tpad * 8 + b * (f // pf) * tpad * cout)
        * x.dtype.itemsize,
        transcendentals=0,
    )
    mask_t = t if out_layout == "CT" else None
    if not interpret:
        # overlapping Element windows in BOTH F (pf+2 rows) and lanes
        # (tt+256: the 128-lane dx halo each side; starts ti*tt stay
        # 128-aligned because tt | 128)
        out = pl.pallas_call(
            functools.partial(
                _smallcin_thin_kernel, pf=pf, tt=tt, mask_t=mask_t
            ),
            grid=(b, f // pf, tpad // tt),
            in_specs=[smallcin_thin_window_spec(pf, tt), *tail_specs],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, f // pf, cout, tpad), x.dtype),
            cost_estimate=cost,
        )(pt, *args)
    else:
        # interpreter: no Element windows — one lane tile (tt = tpad) and a
        # stacked F-band tensor
        bands = smallcin_bands_stack(pt, pf)  # (B, F//pf, pf+2, 8, 256+tpad)
        out = pl.pallas_call(
            functools.partial(
                _smallcin_thin_kernel, pf=pf, tt=tpad, stacked=True,
                mask_t=mask_t,
            ),
            grid=(b, f // pf, 1),
            in_specs=[smallcin_thin_bands_spec(pf, tpad), *tail_specs],
            out_specs=pl.BlockSpec(
                (1, 1, cout, tpad), lambda b, fo, ti: (b, fo, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, f // pf, cout, tpad), x.dtype),
            cost_estimate=cost,
            interpret=True,
        )(bands, *args)
    if out_layout == "CT":
        return out
    return jnp.transpose(out[..., :t], (0, 1, 3, 2))


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
    # largest 8-aligned divisor of t within the block budget (halving-only
    # search can skip valid divisors, e.g. t=1000 has 8|40|200 but no
    # power-of-two path from 600)
    tt = max(
        (c for c in range(8, min(block_t, t) + 1, 8) if t % c == 0), default=None
    )
    assert tt is not None, f"no 8-aligned time-block divisor for t={t}"


    xw = _pack_windows(x, pool_f, tt)
    pf = pool_f
    grid = (b, f // pf, t // tt)
    out = pl.pallas_call(
        functools.partial(_kernel, pf=pf, tt=tt, cout=cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, pf + 2, 1, tt + 8, cin),
                lambda b, fo, ti: (b, fo, 0, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, cin, cout), lambda b, fo, ti: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tt, cout), lambda b, fo, ti: (b, fo, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, f // pf, t, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f * t * 9 * cin * cout,
            bytes_accessed=(b * f * t * cin + b * (f // pf) * t * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xw, w, scale.reshape(1, cout), bias.reshape(1, cout))
    return out


# ---------------------------------------------------------------------------
# Wide-Cin channel-on-sublane (CT) stage kernel
# ---------------------------------------------------------------------------


def widecin_ct_pack(h: jnp.ndarray, t: int, tt: int) -> jnp.ndarray:
    """(B, F, C, T_in) channel-on-sublane stage input — columns >= ``t``
    REQUIRED zero (the smallcin/widecin kernels' ``out_layout='CT'`` /
    masked outputs guarantee this) -> (B, F+2, C, 128 + tpad + 128): F conv
    halo rows, 128 zero lanes each side (the kernel's dx-shift halo,
    doubling as the conv's time zero-pad), tpad the next ``tt`` multiple
    >= t."""
    b, f, c, tin = h.shape
    assert tin >= t, (tin, t)
    tpad = -(-t // tt) * tt
    if tin > tpad:
        h = h[..., :tpad]  # columns >= t are zero by contract
    return jnp.pad(h, ((0, 0), (1, 1), (0, 0), (128, 128 + tpad - min(tin, tpad))))


def widecin_ct_window_spec(pf: int, c: int, tt: int, lane_off: int = 0):
    """Element-indexed overlapping window: pf+2 F rows, tt+256 lanes (the
    128-lane dx halo each side; lane starts ti*tt stay 128-aligned).
    ``lane_off`` shifts the window into a CTH producer's halo'd buffer
    (``pre_halo``): starts become lane_off + ti*tt, still 128-aligned —
    written as (ti*(tt/128) + lane_off/128) * 128 because Mosaic's
    window-param prover accepts mul-by-constant but NOT add-of-constant
    ("Couldn't prove that tiling (128) divides index", probed on chip)."""
    assert lane_off % 128 == 0 and tt % 128 == 0, (lane_off, tt)
    k, off = tt // 128, lane_off // 128
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(pf + 2), pl.Element(c), pl.Element(tt + 256)),
        lambda b, fo, ti: (b, fo * pf, 0, (ti * k + off) * 128),
        memory_space=pltpu.VMEM,
    )




def _widecin_ct_kernel(
    p_ref, w_ref, s_ref, b_ref, o_ref, *, pf, tt, stacked=False, mask_t=None
):
    """Wide-channel CT stage body: p (1, pf+2, C, tt+256), w (3, 3, C, Cout).

    Channels stay on SUBLANES and time on LANES end-to-end (the smallcin
    stage-1 kernels' native output layout), so no (T, C) relayout ever
    happens between CNN stages — at b64 the XLA formulation spent 14 ms
    relaying stage-1's output plus 49 ms in a channel-last conv fusion
    (serving trace, BENCH.md round 3). Each dx tap is a lane-MISALIGNED
    value slice of a physical row fed straight to its own dot — Mosaic
    accepts offset-127/1 dot operands (probed on chip,
    tools/check_pallas_compile.py::probe_misaligned_slice_dot); only
    tpu.concatenate rejects mismatched lane offsets, and nothing here
    concatenates. (The previous f32 ``pltpu.roll`` round-trip per tap was
    working around the concat constraint this kernel never had.) The conv
    is 9 K=C MXU dots per pool row with the BN affine, ReLU and frequency
    max-pool fused. Reference stage semantics:
    /root/reference/model.py:261-287.
    """
    scale = s_ref[...]
    bias = b_ref[...]
    rows = p_ref[0, 0] if stacked else p_ref[0]  # (pf+2, C, tt+256)

    rolled = [
        [rows[k][:, 127 + dx : 127 + dx + tt] for dx in range(3)]
        for k in range(pf + 2)
    ]
    out = None
    for r in range(pf):
        acc = None
        for dy in range(3):
            for dx in range(3):
                d = jax.lax.dot_general(
                    w_ref[dy, dx], rolled[r + dy][dx],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (cout, tt)
                acc = d if acc is None else acc + d
        y = jnp.maximum(acc * scale + bias, 0.0)
        out = y if out is None else jnp.maximum(out, y)
    o_ref[0, 0] = _zero_pad_cols(out, mask_t, tt).astype(o_ref.dtype)


def conv2d_widecin_ct_bn_relu_fpool(
    h: jnp.ndarray,
    t: int,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    pool_f: int,
    block_t: int = 384,
    interpret: bool = False,
    pre_halo: bool = False,
) -> jnp.ndarray:
    """h (B, F, C, T_pad) channel-on-sublane with columns >= t zero (a CT
    output of the smallcin kernels or of this op), w (3, 3, C, Cout) ->
    (B, F//pf, Cout, tpad') CT with columns >= t zeroed in-kernel.

    maxpool_f(relu(conv2d * scale + bias)) for WIDE channel counts
    (C % 8 == 0), staying in the CT layout between CNN stages. The caller
    slices [..., :t] only at the trunk's end.

    ``pre_halo=True`` takes h ALREADY in the halo'd CTH layout a producer's
    ``out_layout='CTH'`` emits — (B, F+2, C, CT_HALO + tpad_h + CT_HALO)
    with zero borders — and reads its windows straight from it, skipping
    :func:`widecin_ct_pack` entirely (the 12.6 ms / ~6 GB stage-handoff pad
    at b64, BENCH.md round-3 trace). Requires ``block_t == CT_HALO``."""
    b, fin, c, tin = h.shape
    f = fin - 2 if pre_halo else fin
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, c), w.shape
    assert f % pool_f == 0, (f, pool_f)
    assert c % 8 == 0, c
    assert block_t % 128 == 0, block_t
    tt = min(block_t, -(-t // 128) * 128)
    tpad = -(-t // tt) * tt
    if pre_halo:
        assert block_t == CT_HALO, (block_t, CT_HALO)
        tpad_h = -(-t // CT_HALO) * CT_HALO
        assert tin == 2 * CT_HALO + tpad_h, (tin, tpad_h)
        # last window must stay in-bounds: CT_HALO-128 + tpad + tt+256 <= tin
        assert tpad <= tpad_h + CT_HALO - 128, (tpad, tpad_h)
        if interpret:
            # Element windows don't interpret — slice the halo back off and
            # run the plain CT path (bit-identical: borders are zeros)
            return conv2d_widecin_ct_bn_relu_fpool(
                h[:, 1:-1, :, CT_HALO:-CT_HALO], t, w, scale, bias, pool_f,
                block_t=block_t, interpret=True,
            )
        p = h
    else:
        p = widecin_ct_pack(h, t, tt)
    pf = pool_f
    args = (
        w,
        scale.astype(jnp.float32).reshape(cout, 1),
        bias.astype(jnp.float32).reshape(cout, 1),
    )
    tail_specs = [
        pl.BlockSpec(
            (3, 3, c, cout), lambda b, fo, ti: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((cout, 1), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cout, 1), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1, 1, cout, tt), lambda b, fo, ti: (b, fo, 0, ti), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=2 * b * f * tpad * 9 * c * cout,
        bytes_accessed=(b * f * tpad * c + b * (f // pf) * tpad * cout)
        * h.dtype.itemsize,
        transcendentals=0,
    )
    if not interpret:
        out = pl.pallas_call(
            functools.partial(_widecin_ct_kernel, pf=pf, tt=tt, mask_t=t),
            grid=(b, f // pf, tpad // tt),
            in_specs=[
                widecin_ct_window_spec(
                    pf, c, tt, lane_off=CT_HALO - 128 if pre_halo else 0
                ),
                *tail_specs,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, f // pf, cout, tpad), h.dtype),
            cost_estimate=cost,
        )(p, *args)
    else:
        bands = smallcin_bands_stack(p, pf)  # (B, F//pf, pf+2, C, 256+tpad)
        out = pl.pallas_call(
            functools.partial(
                _widecin_ct_kernel, pf=pf, tt=tpad, stacked=True, mask_t=t
            ),
            grid=(b, f // pf, 1),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, pf + 2, c, tpad + 256),
                    lambda b, fo, ti: (b, fo, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                *tail_specs,
            ],
            out_specs=pl.BlockSpec(
                (1, 1, cout, tpad), lambda b, fo, ti: (b, fo, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, f // pf, cout, tpad), h.dtype),
            cost_estimate=cost,
            interpret=True,
        )(bands, *args)
    return out
