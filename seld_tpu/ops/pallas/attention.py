"""Flash attention (online-softmax) Pallas kernel for the TCN's MHA.

The reference materializes the full (B, H, T, T) energy tensor at T=2400
(reference model.py:40-48) — ~184 MB/sample in f32, the dominant activation
(SURVEY.md §2.3). This kernel streams K/V blocks with the online-softmax
recurrence so peak memory is O(TQ_BLOCK * T) and the matmuls stay on the MXU.

Math matches the reference exactly (scores * 1/sqrt(head_dim), softmax over
keys, no mask on the self-attention path). Head dims that are not
lane-aligned (e.g. 48 = 384/8) are zero-padded to 128 in the wrapper —
padded key/query lanes contribute zero to scores and padded value lanes are
sliced off the output.

Forward-only: the backward pass falls back to the chunked XLA path via
jax.custom_vjp in the caller when training (inference is the bench-critical
path; training uses attention_impl='chunked'/'full').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, nk):
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """q, k, v: (B, T, H, D) -> (B, T, H, D). Unmasked self-attention."""
    b, t, h, d = q.shape
    d_pad = _round_up(d, 128)

    def pick_block(limit: int):
        """Largest multiple of 8 that divides t and is <= limit."""
        for cand in range(min(limit, t), 7, -8):
            if t % cand == 0 and cand % 8 == 0:
                return cand
        return None

    bq = pick_block(block_q)
    bk = pick_block(block_k)
    if bq is None or bk is None:
        # T has no lane-aligned divisor (padding keys would distort softmax);
        # fall back to the exact chunked XLA path. The reference shapes
        # (T=2400 -> blocks of 480) never hit this.
        from seld_tpu.models.attention import _attend_chunked

        return _attend_chunked(q, k, v, scale, 512)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, 0), (0, d_pad - d)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    nq = t // bq
    nk = t // bk
    t_pad = t

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk=nk),
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d_pad), lambda bh, qi, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d_pad), lambda bh, qi, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d_pad), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_pad * t_pad * d_pad,
            bytes_accessed=3 * b * h * t_pad * d_pad * 4,
            transcendentals=b * h * t_pad * t_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = out[:, :t, :d].reshape(b, h, t, d)
    return jnp.transpose(out, (0, 2, 1, 3))
