"""SELD-TCN building blocks: gated pre-activation ResBlock, TC block, CNN front-end.

Channel-last re-designs of the reference blocks (reference model.py:53-322):
the TCN works on (B, T, L) so 1x1 convs become MXU matmuls and dilated convs
map to ``lax.conv_general_dilated`` with ``rhs_dilation``; the CNN front-end
works on (B, F, T, C) NHWC.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.models.attention import MultiHeadAttention
from seld_tpu.models.layers import (
    BatchNorm,
    SEBlock,
    SpatialDropout1D,
    make_conv,
    max_pool_2d,
    max_pool_time,
)

_BN_ON_TCN = {"BN", "BN_on_TCN", "BNonTCN"}
_BN_ON_CNN = {"BN", "BN_on_CNN", "BNonCNN"}


def dilation_schedule(D: Sequence, mode: str) -> List[int]:
    """Expand the stack spec D into per-resblock dilations.

    D entries are either explicit dilation lists or counts expanded with the
    fibonacci (1,1,2,3,5,...) or exponential (2**d) rule
    (reference model.py:146-174).
    """
    out: List[int] = []
    for n_resblock in D:
        if isinstance(n_resblock, (list, tuple)):
            out.extend(int(d) for d in n_resblock)
        else:
            prev1, prev2 = 1, 0
            for d in range(int(n_resblock)):
                if mode == "fibonacci":
                    if d == 0:
                        dil = 1
                    else:
                        dil = prev1 + prev2
                        prev2, prev1 = prev1, dil
                else:
                    dil = 2 ** d
                out.append(dil)
    return out


def receptive_field(D: Sequence, kernel_size: int, dilation_mode: str):
    """Analytic receptive field: 1 + sum((k-1)*dilation) (reference model.py:482-517)."""
    dils = dilation_schedule(D, dilation_mode)
    return 1 + (kernel_size - 1) * int(np.sum(dils)), len(dils)


class ResBlock(nn.Module):
    """Gated pre-activation residual block on (B, T, L).

    preact BN+tanh -> parallel dilated convs (filter, gate) L->G -> BN each ->
    tanh(f)*sigmoid(g) -> spatial dropout -> 1x1 skip G->U and 1x1 residual
    G->L; returns (x + residual, skip). Mirrors reference model.py:53-132,
    including the quirk that the single pre-activation BN output feeds both
    branches (the reference's ``batch_gate1`` is allocated but unused).
    """

    domain: str = "DQ"
    G: int = 128
    U: int = 128
    kernel_size: int = 3
    dilation: int = 1
    stride: int = 1
    spatial_dropout_rate: float = 0.5
    use_bias: bool = True
    batch_norm: str = "BN"
    qconv_impl: str = "xla"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        L = x.shape[-1]
        padding = ((self.kernel_size - 1) * self.dilation) // 2
        # cdt None = follow the input dtype (f32 normally; f64 in the
        # PARITY_F64 flagship-parity pin, tools/parity_flagship.py)
        cdt = jnp.bfloat16 if self.dtype == "bfloat16" else None
        h = x if cdt is None else x.astype(cdt)
        if self.batch_norm in _BN_ON_TCN:
            h = BatchNorm(dtype=cdt, name="bn_pre")(h, use_running_average=not train)
            h = jnp.tanh(h)
        y_f = make_conv(
            self.domain, self.G, self.kernel_size, 1, stride=self.stride,
            padding=padding, dilation=self.dilation, use_bias=self.use_bias,
            impl=self.qconv_impl, name="conv_filter",
        )(h)
        y_g = make_conv(
            self.domain, self.G, self.kernel_size, 1, stride=self.stride,
            padding=padding, dilation=self.dilation, use_bias=self.use_bias,
            impl=self.qconv_impl, name="conv_gate",
        )(h)
        if self.batch_norm in _BN_ON_TCN:
            y_f = BatchNorm(dtype=cdt, name="bn_filter")(y_f, use_running_average=not train)
            y_g = BatchNorm(dtype=cdt, name="bn_gate")(y_g, use_running_average=not train)
        y = jnp.tanh(y_f) * nn.sigmoid(y_g)
        if self.spatial_dropout_rate != 0:
            y = SpatialDropout1D(self.spatial_dropout_rate)(y, deterministic=not train)
        y_skip = make_conv(
            self.domain, self.U, 1, 1, use_bias=self.use_bias,
            impl=self.qconv_impl, name="conv_skip",
        )(y)
        y_res = make_conv(
            self.domain, L, 1, 1, use_bias=self.use_bias,
            impl=self.qconv_impl, name="conv_res",
        )(y)
        return h + y_res, y_skip


class TCBlock(nn.Module):
    """Dilated TCN stack + head convs + multi-head attention on (B, T, L).

    Mirrors reference model.py:134-232: resblocks accumulate skip outputs
    which are summed, then ReLU -> pool -> conv1 -> MHA(8 heads) -> ReLU ->
    pool -> conv2 -> tanh -> pool (time pooling only when pool_time == 'TCN').
    """

    domain: str = "DQ"
    G: int = 128
    U: int = 128
    V: Sequence[int] = (128, 128)
    V_kernel_size: int = 3
    pool_size: Sequence[Sequence[int]] = ((8, 2), (8, 2), (2, 2))
    D: Sequence = (10,)
    spatial_dropout_rate: float = 0.5
    use_bias: bool = True
    dilation_mode: str = "fibonacci"
    pool_time: str = "TCN"
    batch_norm: str = "BN"
    kernel_size_dilated_conv: int = 3
    attention_impl: str = "auto"
    qconv_impl: str = "xla"
    dtype: str = "float32"
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # rematerialize each ResBlock's activations in the backward pass:
        # training the flagship (T=4800, L=384) at batch 4 f32 otherwise
        # needs ~19 GB of saved activations (> v5e HBM)
        block_cls = nn.remat(ResBlock, static_argnums=(2,)) if self.remat else ResBlock
        skip_sum = None
        for idx, dil in enumerate(dilation_schedule(self.D, self.dilation_mode)):
            x, skip = block_cls(
                domain=self.domain, G=self.G, U=self.U,
                kernel_size=self.kernel_size_dilated_conv, dilation=dil,
                spatial_dropout_rate=self.spatial_dropout_rate,
                use_bias=self.use_bias, batch_norm=self.batch_norm,
                qconv_impl=self.qconv_impl, dtype=self.dtype,
                name=f"resblock_{idx}",
            )(x, train)
            skip_sum = skip if skip_sum is None else skip_sum + skip
        out = nn.relu(skip_sum)
        if self.pool_time == "TCN":
            out = max_pool_time(out, self.pool_size[0][1])
        out = make_conv(
            self.domain, self.V[0], self.V_kernel_size, 1, padding=1,
            use_bias=self.use_bias, impl=self.qconv_impl, name="conv1",
        )(out)
        out = MultiHeadAttention(
            embed_size=self.V[0], num_heads=8, impl=self.attention_impl,
            dtype=jnp.bfloat16 if self.dtype == "bfloat16" else None,
            name="attention",
        )(out, out, out)
        out = nn.relu(out)
        if self.pool_time == "TCN":
            out = max_pool_time(out, self.pool_size[1][1])
        out = make_conv(
            self.domain, self.V[1], self.V_kernel_size, 1, padding=1,
            use_bias=self.use_bias, impl=self.qconv_impl, name="conv2",
        )(out)
        out = jnp.tanh(out)
        if self.pool_time == "TCN":
            out = max_pool_time(out, self.pool_size[2][1])
        return out


class _StatsBatchNorm(nn.Module):
    """BatchNorm with externally computed batch statistics.

    Used by the banded training frontend, where global batch stats are
    accumulated across frequency bands before normalization. Variable paths
    (params scale/bias; batch_stats mean/var) and the running-update formula
    (retention momentum; torch's UNBIASED running var — see BatchNorm in
    models/layers.py) match the repo's torch-compatible BatchNorm exactly,
    so a module instantiated under the same name is
    checkpoint-interchangeable with it. ``n`` is the batch-stat element
    count per channel (for the n/(n-1) unbiased running-var correction);
    callers of ``update_running`` must pass it.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mean, var, update_running: bool = False,
                 return_params: bool = False, n: int = 0):
        """``return_params=True`` declares the variables and returns the raw
        (scale, bias) parameters instead of normalizing — the fused Pallas
        train-mode front-end feeds them into its kernel and routes their
        gradients through its custom VJP (ops/pallas/conv2d_train.py)."""
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if return_params:
            return scale, bias
        if update_running and not self.is_initializing():
            assert n > 1, "pass n (batch-stat element count) for the unbiased update"
            correction = n / (n - 1)
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = (
                self.momentum * ra_var.value
                + (1 - self.momentum) * var * correction
            )
        inv = scale / jnp.sqrt(var + self.epsilon)
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


class _BandedTrainStage(nn.Module):
    """Two-phase banded TRAINING front-end stage (see ConvTCBlock NOTE).

    Phase 1 convs each frequency band and accumulates per-channel
    sum/sum-of-squares (tiny carries; band activations are freed), giving
    EXACT global batch-norm statistics; phase 2 recomputes each band's conv
    and applies normalization + ReLU + freq-pool. The conv and BN submodule
    scopes are shared with the parent ConvTCBlock (``nn.share_scope``), so
    parameters live at the regular ``cnn_{i}`` / ``cnn_bn_{i}`` paths and
    checkpoints are interchangeable with the direct stage. Costs 2x the
    stage's (MXU-cheap) conv FLOPs; buys the training-memory ceiling — the
    full-resolution stage-1 activation never materializes (BENCH.md: it is
    what compile-OOMs the b16 flagship train step). Gradients flow through
    both phases (two differentiable evaluations of the same function; their
    contributions sum to the standard BN training gradient).
    """

    domain: str
    features: int
    kernel_size: int
    pool: Tuple[int, int]
    n_bands: int
    idx: int
    use_bias: bool = False
    qconv_impl: str = "xla"
    use_bn: bool = True
    dropout: float = 0.0
    remat: bool = True

    def setup(self):
        setattr(
            self,
            f"cnn_{self.idx}",
            make_conv(
                self.domain, self.features, self.kernel_size, 2, padding=(0, 1),
                use_bias=self.use_bias, impl=self.qconv_impl,
            ),
        )
        if self.use_bn:
            setattr(self, f"cnn_bn_{self.idx}", _StatsBatchNorm())
        self.drop = nn.Dropout(self.dropout)

    def _conv(self, xb):
        return getattr(self, f"cnn_{self.idx}")(xb)

    def __call__(self, x):
        b, f, t, ch = x.shape
        bh = f // self.n_bands
        assert f % self.n_bands == 0 and bh % self.pool[0] == 0, (
            f, self.n_bands, self.pool
        )
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        bands = jnp.stack(
            [xp[:, k * bh : k * bh + bh + 2] for k in range(self.n_bands)]
        )  # (n_bands, B, bh+2, T, C)

        # Both phases run as nn.scan so the bands are SEQUENCED by
        # construction — with a plain python loop the XLA scheduler overlaps
        # the independent band subgraphs and several 0.9 GB band activations
        # go live at once (measured in the compile-OOM allocation dump).
        mean = var = None
        if self.use_bn:
            def sums_body(mdl, carry, xb):
                y = mdl._conv(xb).astype(jnp.float32)
                return (
                    carry[0] + jnp.sum(y, axis=(0, 1, 2)),
                    carry[1] + jnp.sum(y * y, axis=(0, 1, 2)),
                ), 0
            body = nn.remat(sums_body) if self.remat else sums_body
            scan1 = nn.scan(
                body, variable_broadcast=["params", "batch_stats"],
                split_rngs={}, in_axes=0, out_axes=0,
            )
            zero = jnp.zeros((self.features,), jnp.float32)
            (tot, totsq), _ = scan1(self, (zero, zero), bands)
            n = b * f * t
            mean = tot / n
            var = jnp.maximum(totsq / n - mean * mean, 0.0)
            # running-stats update OUTSIDE the scan (broadcast variables
            # can't be mutated inside); the normalized dummy is discarded
            getattr(self, f"cnn_bn_{self.idx}")(
                jnp.zeros((1, 1, 1, self.features), x.dtype),
                mean, var, update_running=True, n=n,
            )

        def out_body(mdl, carry, xb):
            y = mdl._conv(xb)
            if mdl.use_bn:
                y = getattr(mdl, f"cnn_bn_{mdl.idx}")(y, mean, var)
            y = max_pool_2d(nn.relu(y), mdl.pool)
            return carry, mdl.drop(y, deterministic=False)

        body2 = nn.remat(out_body) if self.remat else out_body
        scan2 = nn.scan(
            body2, variable_broadcast=["params", "batch_stats"],
            split_rngs={"dropout": True}, in_axes=0, out_axes=0,
        )
        _, ys = scan2(self, 0, bands)  # (n_bands, B, bh//pf, T, C')
        ys = jnp.moveaxis(ys, 0, 1)
        return ys.reshape(b, f // self.pool[0], *ys.shape[3:])


class ConvTCBlock(nn.Module):
    """CNN front-end + TCN on (B, F, T, C) -> (B, T_pooled, V[-1]).

    Mirrors reference model.py:234-322: three [conv2d k3 p1 -> (BN) -> ReLU ->
    MaxPool2d([p_freq, p_time or 1]) -> Dropout] blocks, then the (C, F')
    planes are flattened channel-major into the TCN input width
    L = cnn_filters[-1] * F' (matching the reference's permute+reshape
    order at model.py:302-310 so weights map one-to-one).
    """

    domain: str = "DQ"
    cnn_filters: Sequence[int] = (64, 64, 64)
    kernel_size_cnn_blocks: int = 3
    pool_size: Sequence[Sequence[int]] = ((8, 2), (8, 2), (2, 2))
    pool_time: str = "TCN"
    D: Sequence = (10,)
    dilation_mode: str = "fibonacci"
    G: int = 128
    U: int = 128
    kernel_size_dilated_conv: int = 3
    spatial_dropout_rate: float = 0.5
    V: Sequence[int] = (128, 128)
    V_kernel_size: int = 3
    dropout_perc: float = 0.3
    use_bias: bool = True
    batch_norm: str = "noBN"
    use_se_block: bool = False
    attention_impl: str = "auto"
    qconv_impl: str = "xla"
    dtype: str = "float32"
    remat: Any = False  # False | True (per-stage+ResBlocks) | 'frontend'
    frontend_bands: int = 0  # >1: banded eval-time first stage (memory cap)
    # 'auto' | 'pallas' | 'pallas-thin' | 'pallas-interpret' |
    # 'pallas-interpret-thin' | 'xla': train-mode stage-1 fused
    # conv+BN+ReLU+pool kernel (ops/pallas/conv2d_train.py). 'auto'
    # resolves to the (wide-pack) kernel on TPU when the structural
    # conditions hold; the '-thin' spellings select the thin pack
    # (1/4 the packed bytes, cin <= 8 only).
    frontend_impl: str = "auto"

    def _fused_train_ok(self, x, pool) -> bool:
        """Structural conditions under which stage 0 in training can run the
        fused Pallas kernel (matching the serving smallcin constraints plus
        the train op's bias-free/BN-on shape contract)."""
        if self.frontend_impl == "xla":
            return False
        if self.frontend_impl == "auto" and jax.default_backend() != "tpu":
            return False
        cin = x.shape[-1]
        ok = (
            self.kernel_size_cnn_blocks == 3
            and not self.use_bias
            and self.batch_norm in _BN_ON_CNN
            and not self.use_se_block
            and 3 * cin <= 32
            and pool[1] == 1
            and x.shape[1] % pool[0] == 0
        )
        if not ok and self.frontend_impl.startswith("pallas"):
            # an explicit request must not silently measure the XLA stage
            import warnings

            warnings.warn(
                f"frontend_impl={self.frontend_impl!r} requested but the "
                "structural conditions for the fused train-mode stage-1 "
                "kernel do not hold (needs 3x3 kernel, bias-free conv, "
                "BN on, no SE block, 3*cin<=32, freq-only pool dividing F) "
                "— falling back to the XLA stage.",
                stacklevel=3,
            )
        return ok

    def _cnn_stage_fused_train(self, x, i: int, c: int, pool):
        """Train-mode stage 0 through the fused Pallas kernel: conv + batch
        stats + BN + ReLU + freq-pool in three tile passes, never
        materializing the un-pooled (B, F, T, C) activation in forward OR
        backward (custom VJP for dW/dgamma/dbeta; stage-1's input needs no
        gradient). Parameter/variable paths are identical to the direct
        stage (``cnn_{i}``, ``cnn_bn_{i}``), so checkpoints are
        interchangeable. ~150 ms/step of the 270 ms flagship b8 train step
        orbits this activation (BENCH.md round-3 trace)."""
        from seld_tpu.ops.pallas.conv2d_train import (
            conv2d_smallcin_bn_relu_fpool_train,
        )

        conv = make_conv(
            self.domain, c, self.kernel_size_cnn_blocks, 2, padding=1,
            use_bias=self.use_bias, impl=self.qconv_impl, name=f"cnn_{i}",
        )
        w = conv(x, return_dense_kernel=True)  # (3, 3, cin, cout), grads flow
        bn = _StatsBatchNorm(name=f"cnn_bn_{i}")
        gamma, beta = bn(
            jnp.zeros((1, 1, 1, c), x.dtype), None, None, return_params=True
        )
        # 'auto' resolves the pack: thin for bf16 (round 5 overturned the
        # round-3 anti-result — the slimmed single-recompute backward drops
        # the wide pack's build+remat cost, b32 trace 450.0 -> 439.7 ms
        # device; BENCH.md round 5), wide for f32 (unmeasured at f32, whose
        # dw pass uses the narrower 384 time block).
        thin = x.shape[-1] <= 8 and (
            self.frontend_impl.endswith("-thin")
            or (self.frontend_impl == "auto" and x.dtype == jnp.bfloat16)
        )
        out, mean, var = conv2d_smallcin_bn_relu_fpool_train(
            x, w, gamma, beta, pool[0],
            interpret=self.frontend_impl.startswith("pallas-interpret"),
            pack="thin" if thin else "wide",
        )
        # running-stats update through the shared BN variables (output of the
        # dummy call discarded; stats are stop-gradiented by the op's VJP,
        # which ignores their cotangents — stop again for clarity)
        bn(
            jnp.zeros((1, 1, 1, c), x.dtype),
            jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var),
            update_running=True, n=x.shape[0] * x.shape[1] * x.shape[2],
        )
        return nn.Dropout(self.dropout_perc)(out, deterministic=False)

    def _ct_train_ok(self, x) -> bool:
        """Conditions for the full CT train chain: stage 1 runs the fused
        smallcin train kernel emitting CT, stages 2+ run the train-mode
        widecin CT stage (conv2d_ct_train.py) — no channel-last layout ever
        materializes between CNN stages (the b32 trace's ~180 ms stage-2
        orbit + boundary relayouts, BENCH.md round 4). bf16-only: Mosaic
        lowers f32 dots bf16-truncated (the round-3 merged-backward
        anti-result), so the f32 parity path keeps the XLA stages."""
        if self.frontend_impl not in ("pallas-ct", "pallas-ct-interpret"):
            # opt-in until the A/B lands it as the bf16 'auto' default
            return False
        pools = [
            (p[0], p[1]) if self.pool_time == "CNN" else (p[0], 1)
            for p in self.pool_size
        ]
        f = x.shape[1]
        ok = (
            self.kernel_size_cnn_blocks == 3
            and not self.use_bias
            and self.batch_norm in _BN_ON_CNN
            and not self.use_se_block
            and self.frontend_bands <= 1
            and 3 * x.shape[-1] <= 32
            and all(p[1] == 1 for p in pools)
            and all(c % 8 == 0 for c in self.cnn_filters)
        )
        for p in pools:
            ok = ok and (f % p[0] == 0)
            f //= p[0]
        return ok

    def _cnn_frontend_ct_train(self, x):
        """Train-mode CNN front-end entirely in the CT layout: stage 1 via
        the fused smallcin train op (out_layout='CT'), stages 2+ via the
        widecin CT train op; BN running stats stream through the shared
        _StatsBatchNorm variables; dropout rides the CT tensor (elementwise,
        layout-agnostic). Returns channel-last (B, F', T, C')."""
        from seld_tpu.ops.pallas.conv2d_train import (
            conv2d_smallcin_bn_relu_fpool_train,
        )
        from seld_tpu.ops.pallas.conv2d_ct_train import (
            conv2d_widecin_ct_bn_relu_fpool_train,
        )

        interpret = "interpret" in self.frontend_impl
        t = x.shape[2]
        f_cur = x.shape[1]  # conv output F per stage (pool halves after stats)
        h = None
        for i, (p, c) in enumerate(zip(self.pool_size, self.cnn_filters)):
            pool = (p[0], p[1]) if self.pool_time == "CNN" else (p[0], 1)
            conv = make_conv(
                self.domain, c, self.kernel_size_cnn_blocks, 2, padding=1,
                use_bias=self.use_bias, impl=self.qconv_impl, name=f"cnn_{i}",
            )
            probe = jnp.zeros(
                (1, 1, 1, x.shape[-1] if i == 0 else self.cnn_filters[i - 1]),
                x.dtype,
            )
            w = conv(probe, return_dense_kernel=True)
            bn = _StatsBatchNorm(name=f"cnn_bn_{i}")
            gamma, beta = bn(
                jnp.zeros((1, 1, 1, c), x.dtype), None, None, return_params=True
            )
            if i == 0:
                thin = x.shape[-1] <= 8
                h, mean, var = conv2d_smallcin_bn_relu_fpool_train(
                    x, w, gamma, beta, pool[0], interpret=interpret,
                    pack="thin" if thin else "wide", out_layout="CT",
                )
            else:
                h, mean, var = conv2d_widecin_ct_bn_relu_fpool_train(
                    h, t, w, gamma, beta, pool[0], interpret=interpret,
                )
            bn(
                jnp.zeros((1, 1, 1, c), x.dtype),
                jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var),
                update_running=True, n=x.shape[0] * f_cur * t,
            )
            f_cur //= pool[0]
            h = nn.Dropout(self.dropout_perc)(h, deterministic=False)
        # back to channel-last (B, F', T, C') for the flatten
        return jnp.transpose(h[..., :t], (0, 1, 3, 2))

    def _cnn_stage(self, x, i: int, c: int, pool, train: bool, freq_halo: bool = False):
        """One front-end stage. With ``freq_halo`` the input carries a 1-row
        frequency halo on each side (banded execution): the conv runs VALID
        over frequency, which is exactly the padded conv's interior."""
        cdt = jnp.bfloat16 if self.dtype == "bfloat16" else None
        x = make_conv(
            self.domain, c, self.kernel_size_cnn_blocks, 2,
            padding=(0, 1) if freq_halo else 1,
            use_bias=self.use_bias, impl=self.qconv_impl, name=f"cnn_{i}",
        )(x)
        if self.batch_norm in _BN_ON_CNN:
            x = BatchNorm(dtype=cdt, name=f"cnn_bn_{i}")(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_2d(x, pool)
        if self.use_se_block:
            x = SEBlock(name=f"se_{i}")(x)
        return nn.Dropout(self.dropout_perc)(x, deterministic=not train)

    def _cnn_stage_banded_train(self, x, i: int, c: int, pool, n_bands: int):
        """Training counterpart of :meth:`_cnn_stage_banded` — delegates to
        :class:`_BandedTrainStage` with a shared scope so parameters stay at
        the regular ``cnn_{i}`` / ``cnn_bn_{i}`` paths."""
        stage = _BandedTrainStage(
            domain=self.domain, features=c,
            kernel_size=self.kernel_size_cnn_blocks, pool=tuple(pool),
            n_bands=n_bands, idx=i, use_bias=self.use_bias,
            qconv_impl=self.qconv_impl,
            use_bn=self.batch_norm in _BN_ON_CNN,
            dropout=self.dropout_perc, remat=self.remat is True,
        )
        nn.share_scope(self, stage)
        return stage(x)

    def _cnn_stage_banded(self, x, i: int, c: int, pool, train: bool, n_bands: int):
        """Sequential frequency-banded stage (nn.scan, shared params): caps the
        peak activation at 1/n_bands of the full stage — the full-resolution
        first-stage conv output (B, 256, T, C) is what bounds serving batch
        size (BENCH.md). Output-identical to the direct stage (pool windows
        never cross band boundaries)."""
        b, f, t, ch = x.shape
        bh = f // n_bands
        assert f % n_bands == 0 and bh % pool[0] == 0, (f, n_bands, pool)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        bands = jnp.stack(
            [xp[:, k * bh : k * bh + bh + 2] for k in range(n_bands)]
        )  # (n_bands, B, bh+2, T, C)

        def body(mdl, carry, xb):
            return carry, ConvTCBlock._cnn_stage(mdl, xb, i, c, pool, train, True)

        scan = nn.scan(
            body,
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=0,
        )
        _, ys = scan(self, 0, bands)  # (n_bands, B, bh//pf, T', C')
        ys = jnp.moveaxis(ys, 0, 1)  # (B, n_bands, bh//pf, T', C')
        return ys.reshape(b, (f // pool[0]), *ys.shape[3:])

    def _cnn_frontend(self, x, train: bool):
        """All CNN stages. ``remat`` values:
        - True: remat each stage separately (per-stage boundaries still SAVE
          every stage's input — including stage 1's 3.5 GB output at b64);
        - 'frontend': remat the WHOLE frontend as ONE region — only this
          method's input survives as a residual, so stage 1's un-pooled
          output, its packed stage-1 input and every inter-stage copy are
          recomputed in the backward instead of held (the b64 training
          unlock: the two 3.56 GB stage-2 input copies were the top HBM
          allocations in the b64 compile dump, BENCH.md round 4)."""
        if train and self._ct_train_ok(x):
            return self._cnn_frontend_ct_train(x)
        per_stage = (
            nn.remat(ConvTCBlock._cnn_stage, static_argnums=(2, 3, 4, 5, 6))
            if self.remat is True else ConvTCBlock._cnn_stage
        )
        for i, (p, c) in enumerate(zip(self.pool_size, self.cnn_filters)):
            pool = (p[0], p[1]) if self.pool_time == "CNN" else (p[0], 1)
            if i == 0 and train and self._fused_train_ok(x, pool):
                x = self._cnn_stage_fused_train(x, i, c, pool)
            elif (
                i == 0 and self.frontend_bands > 1
                and pool[1] == 1 and not self.use_se_block
            ):
                if train:
                    x = self._cnn_stage_banded_train(x, i, c, pool, self.frontend_bands)
                else:
                    x = self._cnn_stage_banded(x, i, c, pool, train, self.frontend_bands)
            else:
                x = per_stage(self, x, i, c, pool, train, False)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, F, T, C)
        cdt = jnp.bfloat16 if self.dtype == "bfloat16" else None
        x = x if cdt is None else x.astype(cdt)
        # remat the CNN front-end: the un-pooled conv activations (e.g. layer
        # 1's (B, 256, 4800, C) — 3.5 GB f32 at batch 4) dominate training
        # memory; 'frontend' makes the whole front-end one remat region
        frontend = (
            nn.remat(ConvTCBlock._cnn_frontend, static_argnums=(2,))
            if self.remat == "frontend" and train
            else ConvTCBlock._cnn_frontend
        )
        x = frontend(self, x, train)
        # (B, F', T', C') -> (B, T', C'*F') channel-major flatten, matching the
        # reference's permute(0,3,1,2)+reshape of (B, C, F, T).
        b, f, t, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f)
        x = TCBlock(
            domain=self.domain, G=self.G, U=self.U, V=self.V,
            V_kernel_size=self.V_kernel_size, pool_size=self.pool_size, D=self.D,
            spatial_dropout_rate=self.spatial_dropout_rate, use_bias=self.use_bias,
            dilation_mode=self.dilation_mode, pool_time=self.pool_time,
            batch_norm=self.batch_norm,
            kernel_size_dilated_conv=self.kernel_size_dilated_conv,
            attention_impl=self.attention_impl, qconv_impl=self.qconv_impl,
            dtype=self.dtype, remat=self.remat is True, name="tcn",
        )(x, train=train)
        return x  # (B, T_pooled, V[-1])
