"""Multi-head self-attention over the time axis.

Matches the reference ``MultiHeadAttention`` (reference model.py:12-51)
exactly: Q/K/V projections are bias-free 1x1 convs (== Dense over channels),
energy = einsum('nqhd,nkhd->nhqk'), softmax over keys of energy/sqrt(head_dim),
recombine with V, then a biased Linear output projection. Head split is
channel-major: channel c -> (head c // head_dim, lane c % head_dim).

Two execution strategies, same math:
- ``full``: one einsum; energies (B, H, T, T) materialize — fine for short T.
- ``chunked``: lax.scan over query chunks; exact softmax per chunk, memory
  O(chunk * T) instead of O(T^2). Default for long sequences (the reference
  runs this at T=2400, where full f32 energies are ~184 MB/sample).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _attend_full(q, k, v, scale, mask):
    energy = jnp.einsum(
        "nqhd,nkhd->nhqk", q, k,
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
    )
    if mask is not None:
        energy = jnp.where(mask == 0, jnp.float32(-1e9), energy)
    attn = jax.nn.softmax(energy * scale, axis=3).astype(v.dtype)
    return jnp.einsum(
        "nhql,nlhd->nqhd", attn, v,
        preferred_element_type=jnp.promote_types(v.dtype, jnp.float32),
    ).astype(v.dtype)


def _attend_chunked(q, k, v, scale, chunk: int):
    """Exact attention via query chunking (no mask support needed here)."""
    n, t, h, d = q.shape
    pad = (-t) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_chunks = q.shape[1] // chunk
    qc = q.reshape(n, n_chunks, chunk, h, d).transpose(1, 0, 2, 3, 4)

    def body(carry, q_i):
        energy = jnp.einsum(
            "nqhd,nkhd->nhqk", q_i, k,
            preferred_element_type=jnp.promote_types(k.dtype, jnp.float32),
        )
        attn = jax.nn.softmax(energy * scale, axis=3).astype(v.dtype)
        out_i = jnp.einsum(
            "nhql,nlhd->nqhd", attn, v,
            preferred_element_type=jnp.promote_types(v.dtype, jnp.float32),
        ).astype(v.dtype)
        return carry, out_i

    _, out = jax.lax.scan(body, None, qc)
    out = out.transpose(1, 0, 2, 3, 4).reshape(n, n_chunks * chunk, h, d)
    return out[:, :t]


class MultiHeadAttention(nn.Module):
    embed_size: int
    num_heads: int = 8
    impl: str = "auto"  # 'full' | 'chunked' | 'pallas' | 'auto'
    chunk_size: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, v, k, q, mask: Optional[jnp.ndarray] = None):
        assert self.embed_size % self.num_heads == 0, (
            "Embedding size must be divisible by number of heads"
        )
        head_dim = self.embed_size // self.num_heads
        n, q_len = q.shape[0], q.shape[1]

        def proj(x, name):
            return nn.Dense(
                self.embed_size, use_bias=False, dtype=self.dtype, name=name
            )(x).reshape(x.shape[0], x.shape[1], self.num_heads, head_dim)

        vh = proj(v, "values")
        kh = proj(k, "keys")
        qh = proj(q, "queries")

        scale = 1.0 / (head_dim ** 0.5)
        impl = self.impl
        if impl == "auto":
            impl = "chunked" if q_len >= 1024 and mask is None else "full"
            # bf16 long-sequence on TPU: the Pallas flash kernels win in
            # BOTH directions (fwd 3.33 ms/call vs chunked 8.3; training
            # 174 -> 166 ms/step bf16 b8 once the backward got its own
            # VMEM-sized blocks — BENCH.md round 3) and save the chunked
            # scan's ~2.3 GB of per-chunk softmax residuals. f32 (parity
            # mode) keeps the chunked path: flash accumulates in a
            # different summation order than the reference's full softmax.
            if (
                impl == "chunked"
                and self.dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"
            ):
                impl = "pallas"
        if impl == "pallas":
            from seld_tpu.ops.pallas.attention import flash_attention

            out = flash_attention(qh, kh, vh, scale)
        elif impl == "chunked" and mask is None:
            out = _attend_chunked(qh, kh, vh, scale, self.chunk_size)
        else:
            out = _attend_full(qh, kh, vh, scale, mask)

        out = out.reshape(n, q_len, self.embed_size)
        return nn.Dense(self.embed_size, use_bias=True, dtype=self.dtype, name="fc_out")(out)
