"""Fused inference path for serving: Pallas frontend + jit TCN + direct heads.

Executes a single-trunk :class:`SELDModel` from its regular variables
(checkpoint-compatible — same trees as ``model.apply``), but runs the CNN
front-end through a per-stage choice measured on v5e (BENCH.md):

- small-Cin stages (3*Cin <= 32, i.e. the first stage of every reference
  config) use the fused conv2d+BN+ReLU+freqpool Pallas kernel
  ``conv2d_smallcin_bn_relu_fpool``, which never materializes the 7.5 GB
  full-resolution conv activation and feeds the MXU K=96 instead of K=8;
- wide stages use the plain XLA conv with the BN affine folded in — XLA's
  own conv runs them at ~125 TFLOP/s, faster than any of our kernels.

Eval-mode semantics only (BN running stats folded into the conv affine;
dropout identity).

Parity vs ``model.apply(..., train=False)`` is pinned in
tests/test_pallas.py::test_fused_infer_matches_model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from seld_tpu.models.attention import MultiHeadAttention
from seld_tpu.models.blocks import dilation_schedule
from seld_tpu.models.layers import max_pool_2d, max_pool_time
from seld_tpu.ops.dual_quaternion import dual_quaternion_linear
from seld_tpu.ops.hamilton import assemble_dq_conv_kernel, assemble_q_kernel
from seld_tpu.ops.pallas.conv2d_pool import (
    CT_HALO,
    conv2d_smallcin_bn_relu_fpool,
    conv2d_smallcin_thin_bn_relu_fpool,
    conv2d_widecin_ct_bn_relu_fpool,
)
from seld_tpu.ops.quaternion import conv_nd, quaternion_linear

_BN_EPS = 1e-5


def _frontend_kernel(conv_params) -> jnp.ndarray:
    w = conv_params["w"]
    if w.ndim == 4:  # real conv (kh, kw, cin, cout)
        return w
    if w.shape[0] == 4:
        return assemble_q_kernel(w)
    return assemble_dq_conv_kernel(w)


def _folded_affine(conv_params, bn_params, bn_stats):
    """Fold BN (and the conv bias, if any) into a (scale, bias) affine."""
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    bias = bn_params["bias"] - bn_stats["mean"] * inv
    if "b" in conv_params:
        bias = bias + conv_params["b"] * inv
    return inv, bias


def _linear(domain: str, params, x):
    if "kernel" in params:  # real Dense
        y = jnp.dot(x, params["kernel"])
        return y + params["bias"] if "bias" in params else y
    w = params["w"]
    b = params.get("b")
    if w.shape[0] == 4:
        return quaternion_linear(x, w, b)
    return dual_quaternion_linear(x, w, b)


def _affine(bn_params, bn_stats):
    inv = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    return inv, bn_params["bias"] - bn_stats["mean"] * inv


def _conv1d_kernel(conv_params) -> jnp.ndarray:
    """Assembled 1-D conv kernel (k, Cin, Cout) from real/Q/DQ params.

    Unlike :func:`_frontend_kernel` (2-D), a real 1-D kernel is ndim 3 and a
    stacked Q component tensor is ndim 4 — discriminate on ndim first."""
    w = conv_params["w"]
    if w.ndim == 3:
        return w
    if w.shape[0] == 4:
        return assemble_q_kernel(w)
    return assemble_dq_conv_kernel(w)


def _folded_conv_kernel(conv_params, bn_params, bn_stats, dtype):
    """Assembled 1-D kernel with eval-mode BN (and conv bias) folded in."""
    w = _conv1d_kernel(conv_params)
    inv, bias = _affine(bn_params, bn_stats)
    if "b" in conv_params:
        bias = bias + conv_params["b"] * inv
    return (w * inv).astype(dtype), bias.astype(dtype)


def _fused_tcn(model, tcn_p, tcn_s, h, dtype):
    """Eval-mode TCN from the variables tree, restructured for serving:

    per ResBlock (reference model.py:53-132 semantics, eval):
    - bn_pre as an affine + tanh (BN running stats folded),
    - filter & gate dilated convs MERGED into one L->2G conv with their
      BNs folded into weights/bias (halves conv launches, doubles Cout on
      the MXU),
    - skip & res 1x1 convs MERGED into one G->(U+L) matmul.
    Dropout is identity in eval. Tail (conv1 -> MHA -> conv2 + pools)
    runs through the regular modules. Parity vs model.apply is pinned by
    tests/test_pallas.py::test_fused_infer_matches_model.
    """
    g_width = model.G
    skip_sum = None
    for idx, dil in enumerate(dilation_schedule(model.D, model.dilation_mode)):
        rp, rs = tcn_p[f"resblock_{idx}"], tcn_s[f"resblock_{idx}"]
        inv, ab = _affine(rp["bn_pre"], rs["bn_pre"])
        hpre = jnp.tanh(h * inv.astype(dtype) + ab.astype(dtype))

        wf, bf = _folded_conv_kernel(rp["conv_filter"], rp["bn_filter"], rs["bn_filter"], dtype)
        wg, bg = _folded_conv_kernel(rp["conv_gate"], rp["bn_gate"], rs["bn_gate"], dtype)
        padding = ((model.kernel_size_dilated_conv - 1) * dil) // 2
        y = conv_nd(
            hpre,
            jnp.concatenate([wf, wg], axis=-1),
            jnp.concatenate([bf, bg]),
            padding=padding,
            dilation=dil,
        )
        y = jnp.tanh(y[..., :g_width]) * (1.0 / (1.0 + jnp.exp(-y[..., g_width:])))

        ws = _conv1d_kernel(rp["conv_skip"]).astype(dtype)  # (1, G, U)
        wr = _conv1d_kernel(rp["conv_res"]).astype(dtype)   # (1, G, L)
        w_sr = jnp.concatenate([ws[0], wr[0]], axis=-1)
        # pin f32 precision like the ops modules (CLAUDE.md: the MXU would
        # otherwise truncate f32 operands to bf16); bf16 keeps the fast path
        prec = None if dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        z = jnp.dot(y, w_sr, precision=prec)
        if "b" in rp["conv_skip"]:
            z = z + jnp.concatenate(
                [rp["conv_skip"]["b"], rp["conv_res"]["b"]]
            ).astype(dtype)
        u = ws.shape[-1]
        skip = z[..., :u]
        skip_sum = skip if skip_sum is None else skip_sum + skip
        h = hpre + z[..., u:]

    out = jnp.maximum(skip_sum, 0.0)
    if model.pool_time == "TCN":
        out = max_pool_time(out, model.pool_size[0][1])

    conv1 = _make_tail_conv(model, model.V[0])
    out = conv1.apply({"params": tcn_p["conv1"]}, out)
    # serving resolves 'auto' to the Pallas flash kernel: 3.33 ms/call at
    # the flagship T=2400 vs 8.3 ms for the chunked XLA path (BENCH.md)
    attn_impl = "pallas" if model.attention_impl == "auto" else model.attention_impl
    attn = MultiHeadAttention(
        embed_size=model.V[0], num_heads=8, impl=attn_impl,
        dtype=jnp.bfloat16 if model.compute_dtype == "bfloat16" else None,
    )
    out = attn.apply({"params": tcn_p["attention"]}, out, out, out)
    out = jnp.maximum(out, 0.0)
    if model.pool_time == "TCN":
        out = max_pool_time(out, model.pool_size[1][1])
    conv2 = _make_tail_conv(model, model.V[1])
    out = conv2.apply({"params": tcn_p["conv2"]}, out)
    out = jnp.tanh(out)
    if model.pool_time == "TCN":
        out = max_pool_time(out, model.pool_size[2][1])
    return out


def _make_tail_conv(model, features):
    from seld_tpu.models.layers import make_conv

    return make_conv(
        model.domain, features, model.V_kernel_size, 1, padding=1,
        use_bias=model.use_bias_conv, impl=model.qconv_impl,
    )


def _apply_se(se_p, h, h_layout, t_full):
    """Eval-mode SE epilogue (models/layers.py::SEBlock) on a stage output in
    any of the fused layouts. The squeeze runs in f32 (the SEBlock Denses
    promote to f32); the excitation scale is per-(batch, channel), so scaling
    the raw CT/CTH buffer — halo rows/lanes included — preserves the chain's
    contracts (zero columns stay zero, halo lanes stay copies of their
    channel's neighbors)."""
    if h_layout in {"CT", "CTH"}:
        interior = h
        if h_layout == "CTH":
            interior = h[:, 1:-1, :, CT_HALO:-CT_HALO]
        f = interior.shape[1]
        # CT contract: columns >= t_full are zero, so the full-lane sum is
        # already masked; normalize by the valid count
        s = jnp.sum(interior.astype(jnp.float32), axis=(1, 3)) / (f * t_full)
    else:
        s = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
    s = jnp.dot(s, se_p["Dense_0"]["kernel"]) + se_p["Dense_0"]["bias"]
    s = jnp.maximum(s, 0.0)
    s = jnp.dot(s, se_p["Dense_1"]["kernel"]) + se_p["Dense_1"]["bias"]
    s = 1.0 / (1.0 + jnp.exp(-s))
    if h_layout in {"CT", "CTH"}:
        return h * s[:, None, :, None].astype(h.dtype)
    return h * s[:, None, None, :].astype(h.dtype)


def _trunk_frontend(model, params, stats, x, dtype, interpret, input_layout,
                    smallcin_impl="thin", ct_handoff="halo"):
    """CNN front-end of one trunk, flattened for the TCN: (B, T, C*F).

    x: (B, C, F, T) or — ``input_layout='BCTF'`` — (B, C, T, F).
    Split out of the trunk so serving can scan it over microbatches (the
    b128 structural ceiling is stage-1's CTH output + packed input,
    BENCH.md round 4) while the TCN runs full-batch."""
    cin0 = x.shape[1]
    if input_layout == "BCTF" and 3 * cin0 <= 32:
        h = jnp.transpose(x, (0, 3, 1, 2)).astype(dtype)  # (B, F, C, T)
        first_pre_transposed = True
    elif input_layout == "BCTF":
        h = jnp.transpose(x, (0, 3, 2, 1)).astype(dtype)  # (B, F, T, C)
        first_pre_transposed = False
    elif 3 * cin0 <= 32:
        # BCFT with a smallcin first stage: (B, C, F, T) -> (B, F, C, T) is
        # a lane-preserving (T stays minor) sublane shuffle — the packer's
        # channel-on-sublane layout with no full relayout. This is the
        # handoff the FT-layout Pallas STFT (ops/pallas/stft.py) feeds.
        h = jnp.transpose(x, (0, 2, 1, 3)).astype(dtype)  # (B, F, C, T)
        first_pre_transposed = True
    else:
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(dtype)  # (B, F, T, C)
        first_pre_transposed = False
    t_full = h.shape[-1] if first_pre_transposed else h.shape[-2]
    # static per-stage plan — which stage will consume the widecin CT kernel
    # (its producer then emits channel-on-sublane directly, and — when the
    # producer is the thin smallcin kernel — the HALO'D 'CTH' buffer widecin
    # reads with no XLA pad in between, BENCH.md round-3 b64 trace: the
    # stage-1->2 pad was 12.6 ms and doubled a ~6 GB buffer)
    f_seq = [h.shape[1]]
    for pool in model.pool_size:
        f_seq.append(f_seq[-1] // int(pool[0]))
    couts = [
        params[f"cnn_bn_{i}"]["scale"].shape[0]
        for i in range(len(model.pool_size))
    ]
    widecin_in = [False] * (len(model.pool_size) + 1)
    for i in range(1, len(model.pool_size)):
        widecin_in[i] = (
            dtype == jnp.bfloat16
            and couts[i - 1] % 8 == 0
            and f_seq[i] % int(model.pool_size[i][0]) == 0
        )
    h_layout = "X"  # channel-last / pre-transposed entry
    for i, pool in enumerate(model.pool_size):
        conv_p = params[f"cnn_{i}"]
        kernel = _frontend_kernel(conv_p).astype(dtype)
        scale, bias = _folded_affine(
            conv_p, params[f"cnn_bn_{i}"], stats[f"cnn_bn_{i}"]
        )
        pre_t = first_pre_transposed and i == 0
        ct_in = h_layout in {"CT", "CTH"}
        cin = h.shape[-2] if (pre_t or ct_in) else h.shape[-1]
        if ct_in:
            if widecin_in[i]:
                h = conv2d_widecin_ct_bn_relu_fpool(
                    h, t_full, kernel, scale, bias, pool_f=int(pool[0]),
                    interpret=interpret, pre_halo=h_layout == "CTH",
                )
                h_layout = "CT"
                if model.use_se_block:
                    h = _apply_se(params[f"se_{i}"], h, h_layout, t_full)
                continue
            # structural fallback: convert once to channel-last
            if h_layout == "CTH":
                h = h[:, 1:-1, :, CT_HALO:-CT_HALO]
            h = jnp.transpose(h[..., :t_full], (0, 1, 3, 2))
            h_layout = "X"
        if cin <= 8 and smallcin_impl == "thin":
            # thin pack: 1/4 the packed bytes; the wide pack's 3x shifted
            # copy build was the largest op on the b32 serving trace
            # (24.5 ms, BENCH.md round 3). When the next stage runs widecin,
            # emit the halo'd CTH buffer it consumes directly.
            layout = (
                ("CTH" if ct_handoff == "halo" else "CT")
                if widecin_in[i + 1] else "FTC"
            )
            h = conv2d_smallcin_thin_bn_relu_fpool(
                h, kernel, scale, bias, pool_f=int(pool[0]),
                interpret=interpret, pre_transposed=pre_t,
                out_layout=layout,
            )
            h_layout = layout if layout != "FTC" else "X"
        elif 3 * cin <= 32:
            layout = "CT" if widecin_in[i + 1] else "FTC"
            h = conv2d_smallcin_bn_relu_fpool(
                h, kernel, scale, bias, pool_f=int(pool[0]),
                interpret=interpret, pre_transposed=pre_t,
                out_layout=layout,
            )
            h_layout = layout if layout != "FTC" else "X"
        else:
            y = conv_nd(h, kernel, None, padding=1)
            y = jnp.maximum(y * scale.astype(dtype) + bias.astype(dtype), 0.0)
            h = max_pool_2d(y, (int(pool[0]), 1))
            h_layout = "X"
        if model.use_se_block:
            h = _apply_se(params[f"se_{i}"], h, h_layout, t_full)
    if h_layout == "CT":
        # channel-major flatten straight from CT: (B, F, C, T) ->
        # (B, T, C*F), matching the reference's permute+reshape order
        b, f, c, _ = h.shape
        h = jnp.transpose(h[..., :t_full], (0, 3, 2, 1)).reshape(
            b, t_full, c * f
        )
    else:
        b, f, t, c = h.shape
        h = jnp.transpose(h, (0, 2, 3, 1)).reshape(b, t, c * f)
    return h


def _fused_trunk(model, params, stats, x, dtype, interpret, input_layout,
                 smallcin_impl="thin", ct_handoff="halo"):
    """One ConvTC trunk (frontend stages + TCN) from its variables subtree.

    Returns (B, T_pooled, V[-1])."""
    h = _trunk_frontend(
        model, params, stats, x, dtype, interpret, input_layout,
        smallcin_impl, ct_handoff,
    )
    return _fused_tcn(model, params["tcn"], stats.get("tcn", {}), h, dtype)


def fused_infer(model, variables, x, interpret: bool = False,
                input_layout: str = "BCFT", smallcin_impl: str = "thin",
                ct_handoff: str = "halo", microbatch: int = 1,
                featurize=None):
    """(sed, doa) for a SELDModel, Pallas-fused frontend.

    Supports the single-trunk configs AND the 2Parallel / parallel_magphase
    branch topologies (reference model.py:405-426,462-471): each trunk runs
    the same per-stage fused dispatch from its own variables subtree
    (branch_A / branch_B) and the outputs concatenate on the feature axis.

    x: (B, C, F, T) reference layout (like ``model.apply``), or — with
    ``input_layout='BCTF'`` — the conv-STFT's native (B, C, T, F) order,
    which hands the first smallcin stage its channel-on-sublane layout with
    ONE transpose instead of three (spectrum swap + entry + packer).

    ``microbatch=M`` runs featurization + CNN front-end as a ``lax.map``
    scan over M microbatches (outputs identical — eval-mode stages are
    batch-independent), capping the frontend's structural buffers (stage-1
    CTH output + packed input, the b128 compile-OOM of BENCH.md round 4)
    at one microbatch's size; the TCN + heads stay full-batch. With
    ``featurize`` given, ``x`` is raw audio and ``featurize`` maps one
    audio microbatch to features INSIDE the scan (halving the STFT temps
    too).
    """
    assert input_layout in {"BCFT", "BCTF"}, input_layout
    # mirror seld.py:130 exactly: ONLY the 2Parallel spellings branch; every
    # other value (incl. the QSELD config's literal 'True',
    # config/QSELD-TCN-S1-PHI_parallel_8ch.txt) is single-trunk, as in the
    # reference (model.py:405 checks the same set)
    from seld_tpu.models.seld import _PARALLEL_2

    parallel = model.parallel_ConvTC_block in _PARALLEL_2
    assert model.pool_time == "TCN", "fused frontend pools frequency only"
    assert model.batch_norm == "BN", (
        "fused_infer folds eval-mode BN into the convs (frontend AND TCN); "
        "partial/no-BN configs serve via model.apply"
    )
    dtype = jnp.bfloat16 if model.compute_dtype == "bfloat16" else jnp.float32
    all_p = variables["params"]
    all_s = variables.get("batch_stats", {})

    def frontends(feats):
        """Flattened TCN inputs, one per trunk, from one features batch."""
        if parallel:
            # channel split on axis 1 == the model's channel-last split after
            # its entry transpose (seld.py:130-140)
            if model.parallel_magphase:
                x_a = jnp.concatenate([feats[:, 0:4], feats[:, 8:12]], axis=1)
                x_b = jnp.concatenate([feats[:, 4:8], feats[:, 12:]], axis=1)
            else:
                half = model.input_channels // 2
                x_a, x_b = feats[:, :half], feats[:, half:]
            return tuple(
                _trunk_frontend(
                    model, all_p[br], all_s.get(br, {}), xb, dtype,
                    interpret, input_layout, smallcin_impl, ct_handoff,
                )
                for br, xb in (("branch_A", x_a), ("branch_B", x_b))
            )
        return (
            _trunk_frontend(
                model, all_p["seld_block"], all_s.get("seld_block", {}),
                feats, dtype, interpret, input_layout, smallcin_impl,
                ct_handoff,
            ),
        )

    feat = featurize if featurize is not None else (lambda a: a)
    if microbatch > 1:
        bsz = x.shape[0]
        assert bsz % microbatch == 0, (bsz, microbatch)
        xm = x.reshape(microbatch, bsz // microbatch, *x.shape[1:])
        hs = jax.lax.map(lambda a: frontends(feat(a)), xm)
        hs = tuple(t.reshape(bsz, *t.shape[2:]) for t in hs)
    else:
        hs = frontends(feat(x))

    def tcn_of(trunk, h):
        return _fused_tcn(
            model, all_p[trunk]["tcn"], all_s.get(trunk, {}).get("tcn", {}),
            h, dtype,
        )

    if parallel:
        h = jnp.concatenate(
            [tcn_of("branch_A", hs[0]), tcn_of("branch_B", hs[1])], axis=-1
        )
    else:
        h = tcn_of("seld_block", hs[0])

    cdom = model.classifier_domain
    top = variables["params"]

    def head(h, prefix, act):
        y = h.astype(jnp.float32)
        for li in range(len(model.fc_layers)):
            y = _linear(cdom, top[f"{prefix}_fc{li}"], y)
            if model.fc_activations in {"relu", "ReLU", "RELU"}:
                y = jnp.maximum(y, 0.0)
        y = _linear("R", top[f"{prefix}_out"], y)
        return act(y)

    sed = head(h, "sed", lambda z: 1.0 / (1.0 + jnp.exp(-z)))
    doa = head(h, "doa", jnp.tanh)
    return sed, doa
