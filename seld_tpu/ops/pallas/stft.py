"""Fused STFT-magnitude Pallas kernel for the serving featurizer.

Replaces the strided-XLA-conv STFT (`data/features.py` method='conv') on the
serving path. The real-TPU trace (BENCH.md round 3) showed the conv
formulation pays ~19 ms/b16: 7.7 ms of bf16 conv plus ~11 ms of pure layout
work (pad/bitcast of the audio into the conv's NWC layout, two full-tensor
relayout copies around the conv, and the magnitude/cast epilogue). This
kernel reads the padded audio in its natural row-major layout (only bitcast
reshapes outside), runs the windowed real DFT as MXU matmuls with frames on
sublanes, fuses |.| and the bf16 cast, and writes the (rows, T, F) tensor
the fused serving frontend consumes — no relayouts anywhere.

Alignment strategy (the hard part: hop=400 is not lane-aligned):
``lcm(hop, 128)`` samples form a *frame group* (8 frames of hop 400 ->
3200 samples) whose start is always 128-lane aligned. Within a group,
frame ``df`` starts at ``400*df = 128*a + off`` with ``off in {0,16,..,112}``;
the DFT matrix rows are pre-shifted by ``off`` per ``df`` (zero padding), so
every in-kernel slice start stays 128-aligned. The last frame of a group
additionally needs the first 128 lanes of the *next* group, which the
block reads as one extra overlapping group row (Element-indexed tiles).

Reference semantics reproduced (reference utility_functions.py:129-155 via
scipy.signal.stft): periodic Hamming window, zero boundary of nperseg//2,
tail zero-pad to whole hops, 1/win.sum() normalization, DC bin cut, last
frame cut. Parity vs the scipy path is pinned in tests/test_stft_pallas.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted_dft_tables(nperseg: int, hop: int, fpg: int, n_bins: int):
    """(fpg*wrows, 2*n_bins) stacked per-frame-offset DFT tables + head table.

    Row block ``df`` holds the windowed real-DFT matrix shifted down by
    ``off(df) = hop*df - 128*(hop*df//128)`` so the kernel's lane reads stay
    128-aligned. The final frame of a group crosses into the next group; its
    in-group part uses rows ``[off, wrows)`` and the spillover taps live in a
    separate (128, 2*n_bins) head table.
    """
    win = 0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(nperseg) / nperseg)
    t = np.arange(nperseg)[:, None]
    k = np.arange(1, n_bins + 1)[None, :]
    angle = 2.0 * np.pi * t * k / nperseg
    scale = win[:, None] / win.sum()
    m = np.concatenate(
        [np.cos(angle) * scale, np.sin(angle) * scale], axis=1
    )  # (nperseg, 2F)
    group = hop * fpg
    offs = [hop * df - 128 * ((hop * df) // 128) for df in range(fpg)]
    # taps of the group's last frame that live in the next group
    spill = max(0, hop * (fpg - 1) + nperseg - group)
    wrows = -(-(max(off + nperseg for off in offs)) // 128) * 128
    tables = np.zeros((fpg, wrows, 2 * n_bins), np.float64)
    for df, off in enumerate(offs):
        a0 = hop * df - off
        rows = min(nperseg, wrows - off, group - a0 - off)
        tables[df, off : off + rows] = m[:rows]
    head_rows = -(-spill // 128) * 128 if spill else 128
    head = np.zeros((head_rows, 2 * n_bins), np.float64)
    if spill:
        head[:spill] = m[nperseg - spill :]
    return tables.astype(np.float32), head.astype(np.float32), wrows, offs


def _grouped_dft_tables(nperseg: int, hop: int, fpg: int, n_bins: int):
    """DFT tables for the GROUPED input mode: the scipy zero-boundary shift
    of ``half = nperseg//2`` samples is folded into the tables (every frame's
    group-local start moves to ``hop*df - half``) instead of an XLA front-pad
    of the flat audio — which cost a full-tensor pad + a 2D->3D relayout copy
    (2 x 5.57 GB f32 at b96, the serving memory ceiling; BENCH.md round 3).

    Because ``half % 128 == 0``, the per-frame lane offsets are unchanged;
    frame 0 is the only one reaching back (into the PREVIOUS group row's last
    ``half`` lanes — the separate tail table), and the old last-frame forward
    spill disappears (the support predicate requires it to fit in ``half``).

    Returns (tables, tail, wrows, starts, wd): ``starts[df]`` the 128-aligned
    in-group lane start, ``wd[df]`` the 128-multiple dot depth.
    """
    win = 0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(nperseg) / nperseg)
    t = np.arange(nperseg)[:, None]
    k = np.arange(1, n_bins + 1)[None, :]
    angle = 2.0 * np.pi * t * k / nperseg
    scale = win[:, None] / win.sum()
    m = np.concatenate(
        [np.cos(angle) * scale, np.sin(angle) * scale], axis=1
    )  # (nperseg, 2F)
    half = nperseg // 2
    assert half % 128 == 0, half
    group = hop * fpg
    starts, wd, fills = [0], None, [(0, m[half:])]
    for df in range(1, fpg):
        s = hop * df - half
        assert 0 <= s and s + nperseg <= group, (df, s)
        off = s % 128
        starts.append(s - off)
        fills.append((off, m))
    wrows = -(-max(off + mm.shape[0] for off, mm in fills) // 128) * 128
    tables = np.zeros((fpg, wrows, 2 * n_bins), np.float64)
    for df, (off, mm) in enumerate(fills):
        tables[df, off : off + mm.shape[0]] = mm
    wd = tuple(
        min(wrows, -(-(off + mm.shape[0]) // 128) * 128) for off, mm in fills
    )
    tail = m[:half]  # prev-group taps of frame 0 (the boundary shift)
    return (
        tables.astype(np.float32), tail.astype(np.float32), wrows,
        tuple(starts), wd,
    )


def _stft_kernel(
    x_ref, w_ref, wh_ref, o_ref, *, fpg, wrows, starts, n_bins, gt,
    transpose_out=False, grouped=False, wd=None,
):
    """x (Gt+1, group) -> o (Gt*fpg, n_bins) magnitudes — or, with
    ``transpose_out``, o (n_bins, Gt*fpg): one in-VMEM transpose per tile
    so the consumer (the serving front-end's channel-on-sublane packer)
    gets frequency-on-sublanes / time-on-lanes without the full-tensor
    XLA relayout the BCTF handoff paid (BENCH.md round-3 trace).

    starts[df]: 128-aligned lane start of frame df's table rows.

    ``grouped``: the boundary-shifted table mode (:func:`_grouped_dft_tables`)
    — group g is block row g+1 (row 0 is the previous group / the boundary
    zero row), frame 0 adds a tail dot on the PREVIOUS row's last lanes, and
    there is no forward spill.
    """
    group = x_ref.shape[-1]
    # the audio arrives in its storage dtype (f32 on the serving path) and
    # is cast to the DFT tables' compute dtype HERE — folding the XLA-side
    # convert_bitcast_fusion + its relayout (8.6 + 6.8 ms at b64, BENCH.md
    # round-3 trace) into the block read. (The grouped mode pre-casts — its
    # XLA-side pad is rows-only and writes the compute dtype directly.)
    xall = x_ref[0]
    if xall.dtype != w_ref.dtype:
        xall = xall.astype(w_ref.dtype)
    base = 1 if grouped else 0
    mags = []
    for df in range(fpg):
        a0 = starts[df]
        # dot depth: per-table for grouped; to the group edge otherwise
        wdf = wd[df] if grouped else min(wrows, group - a0)
        xs = xall[base : base + gt, a0 : a0 + wdf]  # (Gt, wdf) aligned
        y = jax.lax.dot_general(
            xs, w_ref[df, :wdf], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Gt, 2F)
        if grouped and df == 0:
            # boundary-shifted frame 0: taps in the previous group's tail
            xt = xall[:gt, group - wh_ref.shape[0] :]
            y = y + jax.lax.dot_general(
                xt, wh_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if not grouped and df == fpg - 1:
            xh = xall[1 : gt + 1, : wh_ref.shape[0]]  # next group's head
            y = y + jax.lax.dot_general(
                xh, wh_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        re, im = y[:, :n_bins], y[:, n_bins:]
        mags.append(jnp.sqrt(re * re + im * im))
    out = jnp.stack(mags, axis=1)  # (Gt, fpg, F)
    tile = out.reshape(gt * fpg, n_bins).astype(o_ref.dtype)
    o_ref[0] = jnp.transpose(tile, (1, 0)) if transpose_out else tile


def _stft_kernel_padless(
    x_ref, w_ref, wh_ref, o_ref, *, fpg, starts, n_bins, gt,
    transpose_out=False, wd=None, single=False,
):
    """PADLESS grouped mode: the block is read straight from the caller's
    (rows, G, group) storage-dtype audio — no XLA-side pad or copy at all
    (the padded grouped path still writes one full-tensor rows-pad in the
    compute dtype, ~2.8 GB bf16 at b96).

    Tiled grid: the input index map is ``max(gi*gt - 8, 0)`` (Element starts
    must stay 8-aligned, so the backward halo is 8 rows). Tile 0 reads rows
    [0, gt+8) and realizes the scipy zero boundary by rolling the df=0 tail
    dot down one group row and masking row 0; tiles >0 read their halo'd
    rows with base 8 (tail rows at base-1 — a sublane-misaligned value
    slice, which Mosaic accepts as a dot operand). ``single=True`` covers
    the one-tile / interpret case (block exactly (1, G, group), boundary
    branch only).
    """

    def body(base, boundary):
        group = x_ref.shape[-1]
        xall = x_ref[0]
        if xall.dtype != w_ref.dtype:
            xall = xall.astype(w_ref.dtype)
        th = wh_ref.shape[0]
        if boundary:
            xt = xall[0:gt, group - th :]
            yt = jax.lax.dot_general(
                xt, wh_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # rows of yt are the tails of groups [1, gt+1); shift down one
            # row and zero row 0 (group 0's boundary is the scipy zero-ext)
            yt = pltpu.roll(yt, 1, 0)
            rowi = jax.lax.broadcasted_iota(jnp.int32, yt.shape, 0)
            yt = jnp.where(rowi > 0, yt, 0.0)
        else:
            xt = xall[base - 1 : base - 1 + gt, group - th :]
            yt = jax.lax.dot_general(
                xt, wh_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        mags = []
        for df in range(fpg):
            a0 = starts[df]
            xs = xall[base : base + gt, a0 : a0 + wd[df]]
            y = jax.lax.dot_general(
                xs, w_ref[df, : wd[df]], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if df == 0:
                y = y + yt
            re, im = y[:, :n_bins], y[:, n_bins:]
            mags.append(jnp.sqrt(re * re + im * im))
        out = jnp.stack(mags, axis=1)  # (Gt, fpg, F)
        tile = out.reshape(gt * fpg, n_bins).astype(o_ref.dtype)
        o_ref[0] = jnp.transpose(tile, (1, 0)) if transpose_out else tile

    if single:
        body(0, True)
    else:
        gi = pl.program_id(1)

        @pl.when(gi == 0)
        def _boundary():
            body(0, True)

        @pl.when(gi > 0)
        def _interior():
            body(8, False)


def _pick_gt(g: int, block_groups: int, align: int = 8) -> int:
    """Groups-per-tile for the Element-indexed grid.

    Mosaic requires BOTH the overlapping input block's sublane size and its
    per-tile start offset (gi*gt) to be 8-divisible, so gt must be a
    multiple of 8 (the tile overlaps the next 8 group rows; the kernel uses
    only the first of them). The transposed output layout additionally
    needs the per-tile LANE start (gi*gt*fpg) 128-aligned — ``align``
    carries that lcm. Among candidates pick the one minimizing padded
    total groups (wasted DFT work), preferring tiles >=48 rows (MXU
    sublane utilization), tie-breaking toward larger tiles. Falls back to
    a single full tile when g is too small to tile.
    """
    cands = [gt for gt in range(align, min(block_groups, g) + 1, align)]
    if not cands:
        return g
    big = [gt for gt in cands if gt >= 48] or cands
    return min(big, key=lambda gt: (-(-g // gt) * gt, -gt))


def stft_mag_supported(nperseg: int, noverlap: int, out_dtype=None) -> bool:
    hop = nperseg - noverlap
    if hop <= 0 or nperseg % 2:
        return False
    fpg = 128 // math.gcd(hop, 128)
    group = hop * fpg
    # only the group's LAST frame may spill into the next group, the spill
    # must fit in one group, and the tables must fit comfortably in VMEM
    if fpg >= 2 and hop * (fpg - 2) + nperseg > group:
        return False
    if hop * (fpg - 1) + nperseg - group > group:
        return False
    # actual stacked-table footprint in the compute dtype (bf16 unless the
    # caller wants f32 output — then the tables are f32 too); 2*n_bins
    # table columns == nperseg. Leave >=5 MB of the 16 MB VMEM for blocks.
    tb = 4 if out_dtype == jnp.float32 else 2
    offs = [(hop * df) % 128 for df in range(fpg)]
    wrows = -(-max(off + nperseg for off in offs) // 128) * 128
    return group <= 8192 and fpg * wrows * nperseg * tb <= 11 * 1024 * 1024


def stft_group_size(nperseg: int, noverlap: int) -> int:
    """Samples per frame group (``lcm(hop, 128)``) — the minor dim callers
    use to pre-group audio for ``grouped_input=True``."""
    hop = nperseg - noverlap
    return hop * (128 // math.gcd(hop, 128))


def stft_grouped_supported(nperseg: int, noverlap: int, out_dtype=None) -> bool:
    """Envelope of the grouped-input mode (boundary shift folded into the
    tables): additionally needs the half-window 128-aligned, every shifted
    frame start in-group, and the old forward spill to fit in ``half``."""
    if not stft_mag_supported(nperseg, noverlap, out_dtype):
        return False
    hop = nperseg - noverlap
    half = nperseg // 2
    fpg = 128 // math.gcd(hop, 128)
    group = hop * fpg
    if half % 128:
        return False
    if fpg > 1 and hop < half:  # frame 1 would still reach back
        return False
    return hop * (fpg - 1) - half + nperseg <= group


@functools.partial(
    jax.jit,
    static_argnames=(
        "nperseg", "noverlap", "out_dtype", "interpret", "block_groups",
        "out_layout", "grouped_input",
    ),
)
def stft_mag_pallas(
    x: jnp.ndarray,
    nperseg: int = 512,
    noverlap: int = 112,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    block_groups: int = 120,
    out_layout: str = "TF",
    grouped_input: bool = False,
) -> jnp.ndarray:
    """x (..., n) f32 audio -> (..., T, F) STFT magnitudes, scipy semantics.

    F = nperseg//2 (DC cut), T = the scipy frame count minus the cut last
    frame — matching ``spectrum_fast(cut_dc=True, cut_last_timeframe=True,
    output_phase=False)``. The DFT runs on the MXU in bf16 with f32
    accumulation (same arithmetic XLA picks for the conv formulation under
    default matmul precision).

    ``out_layout='FT'`` emits (..., F, T) instead — frequency on sublanes,
    time on lanes, transposed tile-by-tile inside the kernel. That is the
    layout the serving front-end's smallcin packer consumes, turning the
    downstream XLA handoff into a lane-preserving shuffle instead of a
    full relayout.

    ``grouped_input=True`` takes x PRE-GROUPED as (..., G, group) with
    ``group == stft_group_size(nperseg, noverlap)`` (a free host-side
    reshape of (..., G*group) audio). The scipy zero boundary is folded
    into the DFT tables (:func:`_grouped_dft_tables`) so the only XLA-side
    prep is a rows-only cast+pad — replacing the flat path's full-tensor
    front-pad + 2D->3D relayout copy (2 x 5.57 GB f32 at b96, the serving
    memory ceiling; BENCH.md round 3). Requires
    :func:`stft_grouped_supported`; output is numerically equivalent to
    the flat path (frame 0's dot is split at the boundary, so f32 sums
    may differ in the last ulp).
    """
    hop = nperseg - noverlap
    fpg = 128 // math.gcd(hop, 128)
    group = hop * fpg
    n_bins = nperseg // 2
    if grouped_input:
        assert stft_grouped_supported(nperseg, noverlap, out_dtype), (
            nperseg, noverlap, out_dtype,
        )
        assert x.shape[-1] == group, (x.shape, group)
        lead = x.shape[:-2]
        gdata = x.shape[-2]
        n = gdata * group
    else:
        assert stft_mag_supported(nperseg, noverlap, out_dtype), (
            nperseg, noverlap, out_dtype,
        )
        lead = x.shape[:-1]
        n = x.shape[-1]
    rows = int(np.prod(lead)) if lead else 1

    assert out_layout in {"TF", "FT"}, out_layout
    transpose_out = out_layout == "FT"
    half = nperseg // 2
    n2 = n + 2 * half
    rem = (-(n2 - nperseg)) % hop
    t_frames = (n2 + rem - nperseg) // hop  # last frame already cut
    g = -(-t_frames // fpg)
    # FT tiles start at lane gi*gt*fpg, which must be 128-aligned
    align = math.lcm(8, 128 // math.gcd(fpg, 128)) if transpose_out else 8
    gt = g if interpret else _pick_gt(g, block_groups, align)
    g_pad = -(-g // gt) * gt

    cdt = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    over = 1 if (interpret or g_pad == gt) else 8
    wd = None
    padless = False
    if grouped_input:
        tables, tail, wrows, starts, wd = _grouped_dft_tables(
            nperseg, hop, fpg, n_bins
        )
        w = jnp.asarray(tables, cdt)
        wh = jnp.asarray(tail, cdt)
        # PADLESS fast path: when the tile size divides the caller's group
        # count exactly (the serving shapes: 600 rows, gt=120), the kernel
        # reads the caller's array directly — zero XLA-side prep. Otherwise
        # fall back to a rows-only pad in the COMPUTE dtype (the convert
        # fuses into the pad): 1 zero boundary row in front, alignment/
        # garbage-frame rows behind. Either way there is no lane shift and
        # no relayout — the input's (G, group) tiling is already the
        # kernel's.
        padless = g == gdata and g % gt == 0
        if padless:
            g_pad = g
            xv = x.reshape(rows, gdata, group)  # storage dtype; cast in-block
        else:
            back = g_pad - gdata + (7 if over == 8 else 0)
            xv = jnp.pad(x.reshape(rows, gdata, group).astype(cdt),
                         ((0, 0), (1, back), (0, 0)))
    else:
        tables, head, wrows, offs = _shifted_dft_tables(
            nperseg, hop, fpg, n_bins
        )
        starts = tuple(hop * df - off for df, off in zip(range(fpg), offs))
        w = jnp.asarray(tables, cdt)
        wh = jnp.asarray(head, cdt)

        # scipy zero boundary + tail padding in the STORAGE dtype — the cast
        # to the compute dtype happens inside the kernel's block read (saves
        # the XLA convert + relayout of the ~1 GB audio at b64; the f32 block
        # read costs 2x HBM bytes but the pad's copy was paying that anyway).
        # The tiled path pads 8 extra group rows (not 1) so every Element
        # tile's 8-row overlap stays in-bounds with an 8-aligned start
        # (Mosaic window constraint).
        npad = (g_pad + over) * group
        xp = jnp.pad(x.reshape(rows, n), ((0, 0), (half, npad - n - half)))
        xv = xp.reshape(rows, g_pad + over, group)

    grid = (rows, g_pad // gt)
    kern = functools.partial(
        _stft_kernel, fpg=fpg, wrows=wrows, starts=starts, n_bins=n_bins, gt=gt,
        transpose_out=transpose_out, grouped=grouped_input, wd=wd,
    )
    wspec = pl.BlockSpec(w.shape, lambda r, gi: (0,) * w.ndim, memory_space=pltpu.VMEM)
    whspec = pl.BlockSpec(wh.shape, lambda r, gi: (0, 0), memory_space=pltpu.VMEM)
    if transpose_out:
        ospec = pl.BlockSpec(
            (1, n_bins, gt * fpg), lambda r, gi: (r, 0, gi), memory_space=pltpu.VMEM
        )
        oshape = jax.ShapeDtypeStruct((rows, n_bins, g_pad * fpg), out_dtype)
    else:
        ospec = pl.BlockSpec(
            (1, gt * fpg, n_bins), lambda r, gi: (r, gi, 0), memory_space=pltpu.VMEM
        )
        oshape = jax.ShapeDtypeStruct((rows, g_pad * fpg, n_bins), out_dtype)
    cost = pl.CostEstimate(
        flops=2 * rows * g_pad * fpg * wrows * 2 * n_bins,
        bytes_accessed=rows * (g_pad + over) * group * xv.dtype.itemsize
        + rows * g_pad * fpg * n_bins * 2,
        transcendentals=0,
    )
    if padless:
        pkern = functools.partial(
            _stft_kernel_padless, fpg=fpg, starts=starts, n_bins=n_bins,
            gt=gt, transpose_out=transpose_out, wd=wd,
            single=interpret or g_pad == gt,
        )
        if interpret or g_pad == gt:
            xspec = pl.BlockSpec(
                (1, gdata, group), lambda r, gi: (r, 0, 0),
                memory_space=pltpu.VMEM,
            )
            pgrid = (rows, 1)
        else:
            xspec = pl.BlockSpec(
                # 8-row backward halo (Element starts must be 8-aligned);
                # tile 0 clamps to row 0 and branches to the boundary body.
                # The //8*8 round-trip is a no-op on the value (both clamp
                # branches are 8-divisible) but makes the divisibility
                # SYNTACTICALLY provable for Mosaic's window-param checker.
                (pl.Element(1), pl.Element(gt + 8), pl.Element(group)),
                lambda r, gi: (r, (jnp.maximum(gi * gt - 8, 0) // 8) * 8, 0),
                memory_space=pltpu.VMEM,
            )
            pgrid = grid
        out = pl.pallas_call(
            pkern,
            grid=pgrid,
            in_specs=[xspec, wspec, whspec],
            out_specs=ospec,
            out_shape=oshape,
            cost_estimate=cost,
            interpret=interpret,
        )(xv, w, wh)
    elif interpret or g_pad == gt:
        # single G-tile: plain Blocked specs (Element indexing is unsupported
        # in interpret mode; small inputs never need tiling anyway)
        out = pl.pallas_call(
            kern,
            grid=(rows, 1),
            in_specs=[
                pl.BlockSpec(
                    (1, g_pad + 1, group), lambda r, gi: (r, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                wspec, whspec,
            ],
            out_specs=ospec,
            out_shape=oshape,
            cost_estimate=cost,
            interpret=interpret,
        )(xv, w, wh)
    else:
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    # overlapping (Gt+8)-group tiles: group row Gt of tile i is
                    # group row 0 of tile i+1 (the cross-group frame spillover);
                    # rows Gt+1..Gt+7 are alignment padding the kernel ignores
                    (pl.Element(1), pl.Element(gt + 8), pl.Element(group)),
                    lambda r, gi: (r, gi * gt, 0),
                    memory_space=pltpu.VMEM,
                ),
                wspec, whspec,
            ],
            out_specs=ospec,
            out_shape=oshape,
            cost_estimate=cost,
        )(xv, w, wh)
    if transpose_out:
        return out[:, :, :t_frames].reshape(*lead, n_bins, t_frames)
    return out[:, :t_frames].reshape(*lead, t_frames, n_bins)
