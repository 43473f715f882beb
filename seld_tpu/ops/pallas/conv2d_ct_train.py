"""Fused TRAIN-mode conv2d(3x3) + BatchNorm + ReLU + freq-maxpool for the
WIDE-channel CNN stages (stage 2/3), in the CT (channel-on-sublane,
time-on-lane) layout, with a hand-derived custom VJP.

Round-4 motivation (BENCH.md b32 bf16 flash remat-off trace): the stage-2
XLA orbit is ~140 ms of the 466 ms device step — conv fwd 25.6 + conv dx
31.5 + conv dW 22.5 ms, ~28 ms of layout copies between the channel-last
logical layout and the conv emitter's layouts, ~20 ms of BN elementwise +
stat reductions and a 6 ms select-and-scatter pool backward — plus another
~41 ms relaying stage 1's kernel output to channel-last and the cotangent
back. This module keeps stages 2/3 in the serving CT chain's layout for
TRAINING too: the stage input is packed once (the sole large residual) and
every pass runs 9 K=C MXU dots per pool row directly on it. It also removes
the b64 compile blocker: the two 3.56 GB channel-last copies of stage-1's
output (the top entries of the b64 HBM dump) never exist.

Reference stage semantics: /root/reference/model.py:261-287
(Conv2d -> BatchNorm2d -> ReLU -> MaxPool2d), torch/flax biased batch
statistics, reduce_window's first-match maxpool tie routing (window order =
increasing frequency row).

Structure (one halo'd pack serves all passes; ``fh = pf+1`` zero rows each
side so the dx pass's 3-group windows stay in bounds with mul-only
affine starts):

  forward:
    pass F1  _ct_stats_kernel   conv -> per-channel sum / sum-of-squares
    [XLA]                       mean/var, BN affine scale/bias (tiny)
    pass F2  _ct_fwd_kernel     conv + affine + ReLU + freq-pool -> out CT
  backward:
    pass B1  _ct_bwd_stats_kernel  recompute conv (ONCE per row, rows held
                                in VMEM), route the pooled cotangent through
                                argmax+ReLU, accumulate S_g (= dbeta) and
                                S_gx (= dgamma)
    pass B2  _ct_dw_kernel      recompute + route again, apply the
                                batch-stats BN backward g_z = scale *
                                (g_pre - S_g/N - xhat*S_gx/N), accumulate
                                dW[dy,dx] += g_z @ tap^T (9 taps)
    pass B3  _ct_dx_kernel      per input-row group: recompute/route the
                                THREE pool groups whose conv rows touch it,
                                then dh[fi] = sum_{dy,dx} W[dy,dx]^T @
                                g_z[fi+1-dy] shifted by 1-dx

The two-pass B1/B2 split is forced: g_z needs the GLOBAL sums S_g/S_gx
(and the merged-accumulator decomposition is a recorded round-3
anti-result — Mosaic f32 dots truncate to bf16, BENCH.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _valid_cols(width: int, t: int, lane0_off: int = 0, stride: int = None):
    """(1, width) mask of global time columns in [0, t) for a tile whose
    column 0 is global ti*stride - lane0_off.

    ``stride`` defaults to ``width`` (the fwd/stats/dw kernels, whose value
    width equals the grid's tile stride). The dx kernel computes width
    tt + 2 over a stride-tt grid — passing the halo'd width as the stride
    was a real compiled-only bug (the mask origin drifted +2 columns per
    tile, mis-zeroing two g_z columns at every t-boundary tile; interpret
    mode runs a single tile and never saw it — caught by
    check_pallas_compile's execute-and-compare, round 5)."""
    stride = width if stride is None else stride
    col0 = pl.program_id(2) * stride - lane0_off
    idx = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    return (idx < t) & (idx >= 0)


def _conv_rows_group(rows, w_ref, pf, tt, lane0=128, n=None):
    """Conv accs for ``pf`` pool rows from ``rows`` (R, C, L) starting at
    physical row 0: acc[r] (cout, n or tt) f32 via 9 K=C dots. ``lane0`` is
    the lane offset of output column 0 inside the window; ``n`` overrides
    the output width (the dx pass computes tt+2 columns)."""
    n = tt if n is None else n
    accs = []
    for r in range(pf):
        acc = None
        for dy in range(3):
            for dx in range(3):
                tap = rows[r + dy][:, lane0 - 1 + dx : lane0 - 1 + dx + n]
                d = jax.lax.dot_general(
                    w_ref[dy, dx], tap, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = d if acc is None else acc + d
        accs.append(acc)
    return accs


def _route_group(accs, scale, bias, g_rows):
    """First-match argmax + ReLU routing of the pooled cotangent ``g_rows``
    (cout, n) onto the group's conv rows. Returns [(g_pre_r, acc_r)]."""
    m = None
    for acc in accs:
        y = jnp.maximum(acc * scale + bias, 0.0)
        m = y if m is None else jnp.maximum(m, y)
    taken = jnp.zeros(m.shape, jnp.bool_)
    out = []
    for acc in accs:
        pre = acc * scale + bias
        y = jnp.maximum(pre, 0.0)
        hit = (y == m) & (~taken)
        taken = taken | hit
        out.append((jnp.where(hit & (pre > 0.0), g_rows, 0.0), acc))
    return out


def _first_step():
    return (
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    )


def _ct_stats_kernel(p_ref, w_ref, s1_ref, s2_ref, *, pf, tt, t, stacked):
    @pl.when(_first_step())
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    rows = p_ref[0, 0] if stacked else p_ref[0]  # (pf+2, C, tt+256)
    mask = _valid_cols(tt, t)
    s1 = jnp.zeros_like(s1_ref)
    s2 = jnp.zeros_like(s2_ref)
    for acc in _conv_rows_group(rows, w_ref, pf, tt):
        acc = jnp.where(mask, acc, 0.0)
        s1 = s1 + jnp.sum(acc, axis=1, keepdims=True)
        s2 = s2 + jnp.sum(acc * acc, axis=1, keepdims=True)
    s1_ref[...] = s1_ref[...] + s1
    s2_ref[...] = s2_ref[...] + s2


def _ct_fwd_kernel(p_ref, w_ref, s_ref, b_ref, o_ref, *, pf, tt, t, stacked):
    rows = p_ref[0, 0] if stacked else p_ref[0]
    scale = s_ref[...]
    bias = b_ref[...]
    out = None
    for acc in _conv_rows_group(rows, w_ref, pf, tt):
        y = jnp.maximum(acc * scale + bias, 0.0)
        out = y if out is None else jnp.maximum(out, y)
    # columns >= t zeroed: the CT-chain contract for the next stage's pack
    out = jnp.where(_valid_cols(tt, t), out, 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _ct_bwd_stats_kernel(
    p_ref, w_ref, s_ref, b_ref, mu_ref, iv_ref, g_ref, sg_ref, sgx_ref,
    *, pf, tt, stacked,
):
    @pl.when(_first_step())
    def _init():
        sg_ref[...] = jnp.zeros_like(sg_ref)
        sgx_ref[...] = jnp.zeros_like(sgx_ref)

    rows = p_ref[0, 0] if stacked else p_ref[0]
    g = g_ref[0, 0].astype(jnp.float32)
    accs = _conv_rows_group(rows, w_ref, pf, tt)
    sg = jnp.zeros_like(sg_ref)
    sgx = jnp.zeros_like(sgx_ref)
    for g_pre, acc in _route_group(accs, s_ref[...], b_ref[...], g):
        xhat = (acc - mu_ref[...]) * iv_ref[...]
        sg = sg + jnp.sum(g_pre, axis=1, keepdims=True)
        sgx = sgx + jnp.sum(g_pre * xhat, axis=1, keepdims=True)
    sg_ref[...] = sg_ref[...] + sg
    sgx_ref[...] = sgx_ref[...] + sgx


def _ct_dw_kernel(
    p_ref, w_ref, s_ref, b_ref, mu_ref, iv_ref, g_ref, c1_ref, c2_ref, dw_ref,
    *, pf, tt, t, stacked,
):
    @pl.when(_first_step())
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    rows = p_ref[0, 0] if stacked else p_ref[0]
    g = g_ref[0, 0].astype(jnp.float32)
    scale = s_ref[...]
    mask = _valid_cols(tt, t)
    accs = _conv_rows_group(rows, w_ref, pf, tt)
    dws = [None] * 9
    for r, (g_pre, acc) in enumerate(
        _route_group(accs, scale, b_ref[...], g)
    ):
        xhat = (acc - mu_ref[...]) * iv_ref[...]
        g_z = jnp.where(
            mask, scale * (g_pre - c1_ref[...] - xhat * c2_ref[...]), 0.0
        )
        gzc = g_z.astype(rows.dtype) if rows.dtype == jnp.bfloat16 else g_z
        for dy in range(3):
            for dx in range(3):
                tap = rows[r + dy][:, 127 + dx : 127 + dx + tt]
                d = jax.lax.dot_general(
                    gzc, tap, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (cout, C)
                k = dy * 3 + dx
                dws[k] = d if dws[k] is None else dws[k] + d
    dw_ref[...] = dw_ref[...] + jnp.stack(dws)


def _ct_dx_kernel(
    p_ref, w_ref, s_ref, b_ref, mu_ref, iv_ref, g_ref, c1_ref, c2_ref, dx_ref,
    *, pf, tt, t, nf,
):
    """dh for ONE input-row group (pf rows) at one lane tile.

    The window ``p_ref`` covers 3pf+2 input rows starting at global input
    row (fo-1)*pf - 1 (the pack's fh=pf+1 zero halo absorbs out-of-range
    reads); ``g_ref`` covers pool-group rows fo-1..fo+1 of the (group-row
    zero-padded) cotangent. g_z is computed over tt+2 columns so the +-1
    dx shifts stay inside the block."""
    fo = pl.program_id(1)
    rows = p_ref[0]  # (3pf+2, C, tt+256)
    g3 = g_ref[0]    # (3, cout, tt+256)
    scale = s_ref[...]
    bias = b_ref[...]
    n = tt + 2
    # validity of g_z columns: global col for local j in [0, n) is
    # ti*tt - 1 + j; out-of-range conv ROWS are zeroed per group below
    mask = _valid_cols(n, t, lane0_off=1, stride=tt)

    gz = []  # g_z for conv rows (fo-1)*pf + pf - 1 .. (fo+1)*pf  (pf+2 rows)
    for gg in range(3):  # pool groups fo-1, fo, fo+1
        # conv rows of group gg start at input row (fo-1+gg)*pf; in window
        # coords the first needed input row is that - ((fo-1)*pf - 1)
        row0 = gg * pf + 1 - 1  # = gg*pf (conv row r reads rows r-1..r+1)
        grp_rows = [rows[row0 + j] for j in range(pf + 2)]
        accs = _conv_rows_group(grp_rows, w_ref, pf, tt, lane0=127, n=n)
        g_row = g3[gg].astype(jnp.float32)[:, 127 : 127 + n]
        group_valid = ((fo + gg - 1) >= 0) & ((fo + gg - 1) < nf)
        routed = _route_group(accs, scale, bias, g_row)
        for r, (g_pre, acc) in enumerate(routed):
            if gg == 0 and r < pf - 1:
                continue  # only the LAST conv row of group fo-1 touches us
            if gg == 2 and r > 0:
                continue  # only the FIRST conv row of group fo+1
            xhat = (acc - mu_ref[...]) * iv_ref[...]
            g_z = jnp.where(
                mask, scale * (g_pre - c1_ref[...] - xhat * c2_ref[...]), 0.0
            )
            g_z = jnp.where(group_valid, g_z, 0.0)
            gz.append(g_z.astype(w_ref.dtype) if w_ref.dtype == jnp.bfloat16 else g_z)

    # dh[fi] = sum_{dy,dx} W[dy,dx] @ g_z[conv row fi+1-dy][:, shifted 1-dx]
    # gz[k] holds conv row fo*pf - 1 + k, so for local input row i the dy
    # taps read gz[i + 2 - dy] wait: conv row = fi + 1 - dy; fi = fo*pf + i
    # -> conv row index in gz = (fi + 1 - dy) - (fo*pf - 1) = i + 2 - dy.
    for i in range(pf):
        acc = None
        for dy in range(3):
            zrow = gz[i + 2 - dy]
            for dx in range(3):
                d = jax.lax.dot_general(
                    w_ref[dy, dx], zrow[:, 2 - dx : 2 - dx + tt],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (C, tt)
                acc = d if acc is None else acc + d
        acc = jnp.where(_valid_cols(tt, t), acc, 0.0)
        dx_ref[0, i] = acc.astype(dx_ref.dtype)


def ct_train_pack(h: jnp.ndarray, t: int, tt: int, pf: int):
    """(B, F, C, Tin) CT stage input (cols >= t zero) -> the all-pass pack
    (B, F + 2*(pf+1), C, 128 + tpad + 128)."""
    b, f, c, tin = h.shape
    tpad = -(-t // tt) * tt
    if tin > tpad:
        h = h[..., :tpad]
    return jnp.pad(
        h, ((0, 0), (pf + 1, pf + 1), (0, 0), (128, 128 + tpad - min(tin, tpad)))
    )


def _win(rows, c, lanes, row_map):
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(rows), pl.Element(c), pl.Element(lanes)),
        row_map,
        memory_space=pltpu.VMEM,
    )


def _col_spec(cout):
    return pl.BlockSpec((cout, 1), lambda b, fo, ti: (0, 0), memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=64)
def _get_ct_op(h_shape, h_dtype, t, cout, pool_f, eps, interpret):
    b, f, c, tin = h_shape
    pf = pool_f
    assert f % pf == 0, (f, pf)
    assert c % 8 == 0, c
    tt = min(384, -(-t // 128) * 128)
    tpad = -(-t // tt) * tt
    nf = f // pf
    grid = (b, nf, tpad // tt)
    lanes = tt + 256

    w_spec = pl.BlockSpec(
        (3, 3, c, cout), lambda b, fo, ti: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    # fwd/stats/dw windows: pf+2 rows starting at input row fo*pf - 1, i.e.
    # pack row fo*pf + pf (additive constant on the untiled row dim)
    p_spec = _win(pf + 2, c, lanes, lambda b, fo, ti: (b, fo * pf + pf, 0, ti * tt))
    g_spec = pl.BlockSpec(
        (1, 1, cout, tt), lambda b, fo, ti: (b, fo, 0, ti),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, cout, tt), lambda b, fo, ti: (b, fo, 0, ti), memory_space=pltpu.VMEM
    )
    conv_flops = 2 * b * f * tpad * 9 * c * cout
    bytes_in = b * f * tpad * c * 2

    def cost(mult):
        return pl.CostEstimate(
            flops=mult * conv_flops, bytes_accessed=bytes_in, transcendentals=0
        )

    if interpret:
        # Element windows don't interpret: run whole-row blocks (one lane
        # tile) over a bands stack, like the serving widecin interpret path
        from seld_tpu.ops.pallas.conv2d_pool import smallcin_bands_stack

        def prep(p):
            inner = p[:, pf : f + pf + 2]  # back to the fh=1 halo form
            return smallcin_bands_stack(inner, pf)

        tt_i = tpad
        lanes_i = tpad + 256
        grid_i = (b, nf, 1)
        p_spec_i = pl.BlockSpec(
            (1, 1, pf + 2, c, lanes_i), lambda b, fo, ti: (b, fo, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        g_spec_i = pl.BlockSpec(
            (1, 1, cout, tpad), lambda b, fo, ti: (b, fo, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def fwd_impl(h, w, gamma, beta):
        p = ct_train_pack(h, t, tt, pf)
        if interpret:
            pin, stacked = prep(p), True
            _tt, _grid, _p_spec, _g_spec = tt_i, grid_i, p_spec_i, g_spec_i
        else:
            pin, stacked = p, False
            _tt, _grid, _p_spec, _g_spec = tt, grid, p_spec, g_spec
        s1, s2 = pl.pallas_call(
            functools.partial(_ct_stats_kernel, pf=pf, tt=_tt, t=t, stacked=stacked),
            grid=_grid,
            in_specs=[_p_spec, w_spec],
            out_specs=[_col_spec(cout), _col_spec(cout)],
            out_shape=[
                jax.ShapeDtypeStruct((cout, 1), jnp.float32),
                jax.ShapeDtypeStruct((cout, 1), jnp.float32),
            ],
            cost_estimate=cost(1),
            interpret=interpret,
        )(pin, w)
        n = b * f * t
        mean = s1[:, 0] / n
        var = jnp.maximum(s2[:, 0] / n - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        scale = gamma.astype(jnp.float32) * inv
        bias = beta.astype(jnp.float32) - mean * scale
        out = pl.pallas_call(
            functools.partial(_ct_fwd_kernel, pf=pf, tt=_tt, t=t, stacked=stacked),
            grid=_grid,
            in_specs=[_p_spec, w_spec, _col_spec(cout), _col_spec(cout)],
            out_specs=pl.BlockSpec(
                (1, 1, cout, _tt), lambda b, fo, ti: (b, fo, 0, ti),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, nf, cout, tpad), h.dtype),
            cost_estimate=cost(1),
            interpret=interpret,
        )(pin, w, scale.reshape(cout, 1), bias.reshape(cout, 1))
        return (out, mean, var), (p, w, mean, inv, scale, bias)

    @jax.custom_vjp
    def op(h, w, gamma, beta):
        outs, _ = fwd_impl(h, w, gamma, beta)
        return outs

    def vjp_bwd(res, cts):
        g_out, _gm, _gv = cts
        p, w, mean, inv, scale, bias = res
        gt = jnp.pad(g_out, ((0, 0), (0, 0), (0, 0), (0, tpad - g_out.shape[-1])))[
            ..., :tpad
        ]
        if interpret:
            pin, stacked = prep(p), True
            _tt, _grid, _p_spec, _g_spec = tt_i, grid_i, p_spec_i, g_spec_i
        else:
            pin, stacked = p, False
            _tt, _grid, _p_spec, _g_spec = tt, grid, p_spec, g_spec
        col = lambda v: v.astype(jnp.float32).reshape(cout, 1)
        common = (w, col(scale), col(bias), col(mean), col(inv))
        common_specs = [w_spec, _col_spec(cout), _col_spec(cout),
                        _col_spec(cout), _col_spec(cout)]

        sg, sgx = pl.pallas_call(
            functools.partial(_ct_bwd_stats_kernel, pf=pf, tt=_tt, stacked=stacked),
            grid=_grid,
            in_specs=[_p_spec, *common_specs, _g_spec],
            out_specs=[_col_spec(cout), _col_spec(cout)],
            out_shape=[
                jax.ShapeDtypeStruct((cout, 1), jnp.float32),
                jax.ShapeDtypeStruct((cout, 1), jnp.float32),
            ],
            cost_estimate=cost(1),
            interpret=interpret,
        )(pin, *common, gt)
        n = b * f * t
        dwk = pl.pallas_call(
            functools.partial(_ct_dw_kernel, pf=pf, tt=_tt, t=t, stacked=stacked),
            grid=_grid,
            in_specs=[_p_spec, *common_specs, _g_spec, _col_spec(cout), _col_spec(cout)],
            out_specs=pl.BlockSpec(
                (9, cout, c), lambda b, fo, ti: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((9, cout, c), jnp.float32),
            cost_estimate=cost(2),
            interpret=interpret,
        )(pin, *common, gt, sg / n, sgx / n)
        dw = jnp.transpose(dwk.reshape(3, 3, cout, c), (0, 1, 3, 2)).astype(w.dtype)

        # dx pass: 3-group windows over the SAME pack; the cotangent gains a
        # zero pool-group row each side and a 128-lane halo
        gx = jnp.pad(gt, ((0, 0), (1, 1), (0, 0), (128, 128)))
        if interpret:
            # rolling-window dx in pure jnp over the interpret path would
            # need Element windows; emulate with one whole-tensor kernel call
            # per group via the compiled path's math in XLA instead
            dh = _dx_interpret(
                p, w, scale, bias, mean, inv, sg[:, 0] / n, sgx[:, 0] / n, gt,
                pf=pf, t=t, nf=nf, tpad=tpad,
            )
        else:
            # the dx pass holds 3 pool groups' conv rows + pf+2 g_z rows +
            # the 3pf+2-row input window live — at flagship widths
            # (C=cout=192, pf=8) Mosaic's unconstrained stack demand is
            # ~34 MB, over the 16 MB default scoped-VMEM limit. Narrower
            # lane tiles do NOT help (measured: 19.7M at tt=128, 27.0M at
            # 256 — the 256-lane halo and lane padding dominate); raising
            # the limit does (34M fits v5e's 128 MB core alongside the
            # ~17 MB of double-buffered windows).
            p3_spec = _win(
                3 * pf + 2, c, lanes, lambda b, fo, ti: (b, fo * pf, 0, ti * tt)
            )
            g3_spec = _win(3, cout, lanes, lambda b, fo, ti: (b, fo, 0, ti * tt))
            dh = pl.pallas_call(
                functools.partial(_ct_dx_kernel, pf=pf, tt=tt, t=t, nf=nf),
                grid=grid,
                in_specs=[p3_spec, *common_specs, g3_spec, _col_spec(cout),
                          _col_spec(cout)],
                out_specs=pl.BlockSpec(
                    (1, pf, c, tt), lambda b, fo, ti: (b, fo, 0, ti),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((b, f, c, tpad), p.dtype),
                cost_estimate=cost(4),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=40 * 1024 * 1024
                ),
            )(p, *common, gx, sg / n, sgx / n)
        if dh.shape[-1] != tin:
            dh = (
                dh[..., :tin]
                if dh.shape[-1] > tin
                else jnp.pad(dh, ((0, 0),) * 3 + ((0, tin - dh.shape[-1]),))
            )
        dgamma = sgx[:, 0]
        dbeta = sg[:, 0]
        return dh, dw, dgamma, dbeta

    op.defvjp(fwd_impl, vjp_bwd)
    return op


def _dx_interpret(p, w, scale, bias, mean, inv, c1, c2, gt, *, pf, t, nf, tpad):
    """XLA-math dx oracle used by interpret mode (and by the unit tests as
    the compiled kernel's reference): recompute conv rows, route, apply the
    BN backward, transposed-conv back to dh."""
    b, frows, c, lanes = p.shape
    f = nf * pf
    h = p[:, pf + 1 : pf + 1 + f, :, 128 : 128 + tpad]  # (B, F, C, tpad)
    hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0), (1, 1)))
    # conv rows (B, F, cout, tpad) via 9 dots
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = hp[:, dy : dy + f, :, dx : dx + tpad]
            d = jnp.einsum(
                "bfct,co->bfot", tap.astype(jnp.float32), w[dy, dx].astype(jnp.float32)
            )
            acc = d if acc is None else acc + d
    pre = acc * scale[None, None, :, None] + bias[None, None, :, None]
    y = jnp.maximum(pre, 0.0)
    ym = y.reshape(b, nf, pf, -1, tpad).max(axis=2, keepdims=True)
    hit = (y.reshape(b, nf, pf, -1, tpad) == ym)
    first = jnp.cumsum(hit, axis=2) == 1
    hit = (hit & first).reshape(b, f, -1, tpad)
    g_pre = jnp.where(
        hit & (pre > 0.0), jnp.repeat(gt.astype(jnp.float32), pf, axis=1), 0.0
    )
    xhat = (acc - mean[None, None, :, None]) * inv[None, None, :, None]
    colmask = (jnp.arange(tpad) < t)[None, None, None, :]
    g_z = jnp.where(
        colmask,
        scale[None, None, :, None]
        * (g_pre - c1[None, None, :, None] - xhat * c2[None, None, :, None]),
        0.0,
    )
    gzp = jnp.pad(g_z, ((0, 0), (1, 1), (0, 0), (1, 1)))
    dh = None
    for dy in range(3):
        for dx in range(3):
            zrow = gzp[:, 2 - dy : 2 - dy + f, :, 2 - dx : 2 - dx + tpad]
            d = jnp.einsum("bfot,co->bfct", zrow, w[dy, dx].astype(jnp.float32))
            dh = d if dh is None else dh + d
    dh = jnp.where(colmask, dh, 0.0)
    return dh.astype(p.dtype)


def conv2d_widecin_ct_bn_relu_fpool_train(
    h, t, w, gamma, beta, pool_f, eps=1e-5, interpret=False
):
    """Fused train-mode WIDE-channel CT stage: h (B, F, C, Tin) CT layout
    with columns >= t zero, w (3, 3, C, Cout), gamma/beta (Cout,).

    Returns (out, mean, var): out (B, F//pool_f, Cout, tpad) CT with columns
    >= t zeroed (a valid input for the next CT stage); mean/var are the
    biased batch statistics (stop-gradient them for the running update).
    The VJP returns (dh, dw, dgamma, dbeta) with dh in the same CT layout.
    """
    op = _get_ct_op(
        tuple(h.shape), jnp.dtype(h.dtype).name, int(t), w.shape[-1],
        int(pool_f), float(eps), bool(interpret),
    )
    return op(h, w, gamma, beta)
