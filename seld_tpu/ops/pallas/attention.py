"""Flash attention (online-softmax) Pallas kernels for the TCN's MHA.

The reference materializes the full (B, H, T, T) energy tensor at T=2400
(reference model.py:40-48) — ~184 MB/sample in f32, the dominant activation
(SURVEY.md §2.3). These kernels stream K/V blocks with the online-softmax
recurrence so peak memory is O(block * T) and every matmul lands on the MXU.

Math matches the reference exactly (scores * 1/sqrt(head_dim), softmax over
keys, no mask on the self-attention path). Head dims that are not
lane-aligned (e.g. 48 = 384/8) are zero-padded to 128 in the wrapper —
padded key/query lanes contribute zero to scores and padded value lanes are
sliced off the output.

Training is supported through a custom VJP with FlashAttention-2-style
backward kernels: the forward additionally emits the per-row logsumexp; the
backward recomputes probability blocks from (q, k, lse) and accumulates
  dv += p^T dO,   ds = p * (dO v^T - delta),   dk += ds^T q,   dq += ds k
in two passes (a q-major pass for dq, a k-major pass for dk/dv), never
materializing a (T, T) tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale, nk, g):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (TQ, D)
    k = k_ref[0]  # (TK, D)
    v = v_ref[0]  # (TK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TQ, TK)

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[...] = m_new

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)
        # row stats are stored (BH, T//g, 1, g) — row values on LANES in
        # backward-block-sized pieces (g = bq_bwd, a divisor of bq). The old
        # (BH, T, 1) layout put the size-1 dim on lanes and XLA padded it
        # 128x: 600 MB of pure padding PER stat tensor at b64 (the HBM
        # dump's #4/#5 entries) vs ~42 MB in this layout.
        lse = m_scr[...] + jnp.log(l_scr[...])  # (bq, 1) f32
        for j in range(lse.shape[0] // g):
            lse_ref[0, j] = jnp.transpose(lse[j * g : (j + 1) * g], (1, 0))


def _flash_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_scr, *, scale, nk
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    lse_col = jnp.transpose(lse_ref[0, 0], (1, 0))      # (TQ, 1)
    delta_col = jnp.transpose(delta_ref[0, 0], (1, 0))  # (TQ, 1)
    p = jnp.exp(s - lse_col)  # (TQ, TK)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_col)  # (TQ, TK)
    acc_scr[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = (acc_scr[...] * scale).astype(dq_ref.dtype)


def _flash_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *, scale, nq,
):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse_row = lse_ref[0, 0]      # (1, TQ) — stats arrive row-major already
    delta_row = delta_ref[0, 0]  # (1, TQ)
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TK, TQ)
    pt = jnp.exp(st - lse_row)
    dv_scr[...] += jax.lax.dot_general(
        pt, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TK, TQ)
    dst = pt * (dpt - delta_row)
    dk_scr[...] += jax.lax.dot_general(
        dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(t: int, limit: int):
    """Largest multiple of 8 that divides t and is <= limit."""
    for cand in range(min(limit, t), 7, -8):
        if t % cand == 0 and cand % 8 == 0:
            return cand
    return None


def _prep(x, d_pad):
    b, t, h, d = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
    return jnp.pad(x, ((0, 0), (0, 0), (0, d_pad - d)))


def _flash_forward(qp, kp, vp, scale, bq, bk, g, interpret, out_dtype):
    """Prepped (BH, T, Dpad) tensors -> (out (BH,T,Dpad), lse (BH,T//g,1,g)).

    ``g`` (= the backward q-block, a divisor of bq) is the row-stat lane
    piece size: every stat block's lane dim equals the array's full last
    dim, which Mosaic accepts for any size."""
    bh, t, d_pad = qp.shape
    nq, nk = t // bq, t // bk
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk=nk, g=g),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d_pad), lambda b, qi, ki: (b, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d_pad), lambda b, qi, ki: (b, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d_pad), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bq // g, 1, g), lambda b, qi, ki: (b, qi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d_pad), out_dtype),
            jax.ShapeDtypeStruct((bh, t // g, 1, g), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * d_pad,
            bytes_accessed=4 * bh * t * d_pad * 4,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out, lse


def _flash_backward(qp, kp, vp, dop, lse, delta, scale, bq, bk, interpret):
    bh, t, d_pad = qp.shape
    nq, nk = t // bq, t // bk
    # bq here IS the stat piece size g (bq_bwd): one (1, 1, 1, g) stat block
    # per backward q-block
    qspec = pl.BlockSpec((1, bq, d_pad), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, d_pad), lambda b, qi, ki: (b, ki, 0), memory_space=pltpu.VMEM)
    rowq = pl.BlockSpec((1, 1, 1, bq), lambda b, qi, ki: (b, qi, 0, 0), memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, nk=nk),
        grid=(bh, nq, nk),
        in_specs=[qspec, kspec, kspec, qspec, rowq, rowq],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, t, d_pad), qp.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t * t * d_pad,
            bytes_accessed=4 * bh * t * d_pad * 4,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    # k-major pass: grid (bh, ki, qi), accumulate over qi
    qspec2 = pl.BlockSpec((1, bq, d_pad), lambda b, ki, qi: (b, qi, 0), memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, bk, d_pad), lambda b, ki, qi: (b, ki, 0), memory_space=pltpu.VMEM)
    rowq2 = pl.BlockSpec((1, 1, 1, bq), lambda b, ki, qi: (b, qi, 0, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale, nq=nq),
        grid=(bh, nk, nq),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rowq2, rowq2],
        out_specs=(kspec2, kspec2),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d_pad), kp.dtype),
            jax.ShapeDtypeStruct((bh, t, d_pad), vp.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d_pad), jnp.float32),
            pltpu.VMEM((bk, d_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * t * t * d_pad,
            bytes_accessed=6 * bh * t * d_pad * 4,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention_core(q, k, v, scale, bq, bk, bq_bwd, bk_bwd, interpret):
    out, _ = _flash_core_fwd(q, k, v, scale, bq, bk, bq_bwd, bk_bwd, interpret)
    return out


def _flash_core_fwd(q, k, v, scale, bq, bk, bq_bwd, bk_bwd, interpret):
    b, t, h, d = q.shape
    d_pad = _round_up(d, 128)
    qp, kp, vp = _prep(q, d_pad), _prep(k, d_pad), _prep(v, d_pad)
    outp, lse = _flash_forward(
        qp, kp, vp, scale, bq, bk, bq_bwd, interpret, q.dtype
    )
    out = jnp.transpose(outp[:, :, :d].reshape(b, h, t, d), (0, 2, 1, 3))
    # residuals: original (unpadded) tensors + lse; backward re-preps
    return out, (q, k, v, out, lse)


def _flash_core_bwd(scale, bq, bk, bq_bwd, bk_bwd, interpret, res, g):
    q, k, v, out, lse = res
    b, t, h, d = q.shape
    d_pad = _round_up(d, 128)
    # delta = rowsum(dO * O) per (bh, t): tiny XLA epilogue, stored like lse
    # as (BH, T//g, 1, g) — row values on lanes (a (BH, T, 1) layout pads
    # the size-1 lane dim 128x: 600 MB of pure padding at b64)
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (B, T, H)
    delta = jnp.transpose(delta, (0, 2, 1)).reshape(b * h, t // bq_bwd, 1, bq_bwd)
    qp, kp, vp = _prep(q, d_pad), _prep(k, d_pad), _prep(v, d_pad)
    dop = _prep(g.astype(q.dtype), d_pad)
    dq, dk, dv = _flash_backward(
        qp, kp, vp, dop, lse, delta, scale, bq_bwd, bk_bwd, interpret
    )

    def unprep(xp, like):
        x = xp[:, :, :d].reshape(b, h, t, d)
        return jnp.transpose(x, (0, 2, 1, 3)).astype(like.dtype)

    return unprep(dq, q), unprep(dk, k), unprep(dv, v)


_flash_attention_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 1200,
    block_k: int = 1200,
    block_bwd: int = 600,
    interpret: bool = False,
) -> jnp.ndarray:
    """q, k, v: (B, T, H, D) -> (B, T, H, D). Unmasked self-attention.

    Differentiable: the backward pass runs the Pallas FlashAttention-2
    kernels above (no (T, T) materialization in either direction).

    Block defaults: at the flagship shape (b16, T=2400, H=8, D=48) larger
    FORWARD blocks win decisively — 3.33 ms/call at 1200 vs 5.48 at 480 vs
    8.3 for the chunked XLA path (interleaved A/B 2026-08-17); _pick_block
    rounds down to the largest divisor of T, so smaller T still gets valid
    blocks. The BACKWARD kernels hold four (bq, bk) f32 temps on the VMEM
    stack (st/pt/dpt/dst) — at 1200x1200 that's 16.09 MB, 92 KB over the
    16 MB scoped-VMEM limit (the round-2 "flash training compile-OOM" was
    this, not HBM) — so backward uses its own smaller block bound.
    """
    t = q.shape[1]
    bq = _pick_block(t, block_q)
    bk = _pick_block(t, block_k)
    if bq is None or bk is None:
        # T has no lane-aligned divisor (padding keys would distort softmax);
        # fall back to the exact chunked XLA path. The reference shapes
        # (T=2400 -> blocks of 480) never hit this.
        from seld_tpu.models.attention import _attend_chunked

        return _attend_chunked(q, k, v, scale, 512)
    # bq_bwd must DIVIDE bq: the forward emits row stats in bq_bwd-sized
    # lane pieces that the backward consumes one block apiece
    bq_bwd = _pick_block(bq, min(block_q, block_bwd))
    bk_bwd = _pick_block(t, min(block_k, block_bwd))
    return _flash_attention_core(
        q, k, v, scale, bq, bk, bq_bwd, bk_bwd, interpret
    )
