"""Fused Hamilton-product matmul kernels.

The XLA path (seld_tpu.ops.quaternion / .dual_quaternion) materializes the
4x/8x sign-expanded block weight with ``jnp.concatenate`` every step; here
the expansion happens in VMEM scratch instead:

- grid = (cdiv(M, TM),) over activation row tiles;
- on the first grid step the kernel assembles the full (Cin, Cout) block
  weight into VMEM scratch from the stacked components (each component is
  read from HBM exactly once per call — VMEM scratch persists across the
  sequential TPU grid);
- every grid step runs ONE large MXU matmul (TM, Cin) @ (Cin, Cout) with the
  bias add fused.

A custom VJP reuses the same kernel for the backward pass: dX = dY @ W^T is
another Hamilton matmul on the axis-swapped component stack with the
transposed sign table (the Hamilton conjugate), and the component gradients
are signed block-sums of X^T @ dY — the same structured gradients the
reference hand-derives in its autograd Function
(reference quaternion/quaternion_ops.py:392-464).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seld_tpu.ops.hamilton import Q_TABLE


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _assemble_q(w_ref, scratch, transpose: bool):
    """Write the 4x4 Hamilton block grid of w_ref (4, cin, cout) into
    scratch (4cin, 4cout). entry[a][b] = T[b][a] (or T[a][b] if transpose)."""
    cin, cout = w_ref.shape[1], w_ref.shape[2]
    for a in range(4):
        for b in range(4):
            idx, sgn = Q_TABLE[a][b] if transpose else Q_TABLE[b][a]
            scratch[a * cin : (a + 1) * cin, b * cout : (b + 1) * cout] = sgn * w_ref[idx]


def _assemble_dq(w_ref, scratch, linear_table: bool):
    """Write the dual-number block grid of w_ref (8, cin, cout) into scratch
    (8cin, 8cout).

    linear_table=False (conv orientation, hamilton.assemble_dq_conv_kernel):
        [in<4, out<4]=Q   [in<4, out>=4]=Q_e
        [in>=4, out<4]=0  [in>=4, out>=4]=Q       blocks use T[b][a]
    linear_table=True (the reference DQ-linear quirk,
    hamilton.assemble_dq_linear_kernel):
        [in<4, out<4]=Q'  [in<4, out>=4]=0
        [in>=4, out<4]=Q_e' [in>=4, out>=4]=Q'    blocks use T[a][b]
    """
    cin, cout = w_ref.shape[1], w_ref.shape[2]
    four_i, four_o = 4 * cin, 4 * cout
    for a in range(4):
        for b in range(4):
            idx, sgn = Q_TABLE[a][b] if linear_table else Q_TABLE[b][a]
            q1 = sgn * w_ref[idx]
            q2 = sgn * w_ref[idx + 4]
            r0, c0 = a * cin, b * cout
            zero = jnp.zeros_like(q1)
            scratch[r0 : r0 + cin, c0 : c0 + cout] = q1
            scratch[four_i + r0 : four_i + r0 + cin, four_o + c0 : four_o + c0 + cout] = q1
            if linear_table:
                scratch[four_i + r0 : four_i + r0 + cin, c0 : c0 + cout] = q2
                scratch[r0 : r0 + cin, four_o + c0 : four_o + c0 + cout] = zero
            else:
                scratch[r0 : r0 + cin, four_o + c0 : four_o + c0 + cout] = q2
                scratch[four_i + r0 : four_i + r0 + cin, c0 : c0 + cout] = zero


def _matmul_kernel(x_ref, w_ref, b_ref, o_ref, w_scratch, *, n_comp, transpose):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        if n_comp == 4:
            _assemble_q(w_ref, w_scratch, transpose)
        else:
            _assemble_dq(w_ref, w_scratch, transpose)

    acc = jnp.dot(x_ref[...], w_scratch[...], preferred_element_type=jnp.float32)
    o_ref[...] = (acc + b_ref[...]).astype(o_ref.dtype)


def _hamilton_matmul(
    x: jnp.ndarray,
    comps: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    n_comp: int,
    transpose: bool,
    block_m: int = 1024,
) -> jnp.ndarray:
    """Fused x (M, Cin) @ assemble(comps) + bias."""
    m, cin = x.shape
    cin_c, cout_c = comps.shape[1], comps.shape[2]
    cout = n_comp * cout_c
    assert cin == n_comp * cin_c, (x.shape, comps.shape)
    if bias is None:
        bias = jnp.zeros((cout,), x.dtype)

    tm = min(block_m, _round_up(m, 8))
    pad_m = _round_up(m, tm)
    if pad_m != m:
        x = jnp.pad(x, ((0, pad_m - m), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_comp=n_comp, transpose=transpose),
        grid=(pad_m // tm,),
        in_specs=[
            pl.BlockSpec((tm, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_comp, cin_c, cout_c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pad_m, cout), x.dtype),
        # scratch matches the input dtype so bf16 stays a bf16 MXU matmul
        # (an f32 scratch also fails to lower: Mosaic rejects mixed-dtype
        # stores into the scratch ref)
        scratch_shapes=[pltpu.VMEM((cin, cout), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * pad_m * cin * cout,
            bytes_accessed=(pad_m * cin + n_comp * cin_c * cout_c + pad_m * cout) * 4,
            transcendentals=0,
        ),
    )(x, comps, bias.reshape(1, cout))
    return out[:m] if pad_m != m else out


def _structured_dw(dw_full: jnp.ndarray, cin_c: int, cout_c: int, n_comp: int, transpose: bool):
    """Accumulate the dense (Cin, Cout) weight grad into signed component grads."""
    n_q = 4
    dcomp = [0.0] * n_comp

    def q_grad(block_fn, base_idx, table_transpose):
        nonlocal dcomp
        for a in range(n_q):
            for b in range(n_q):
                idx, sgn = Q_TABLE[a][b] if table_transpose else Q_TABLE[b][a]
                dcomp[base_idx + idx] = dcomp[base_idx + idx] + sgn * block_fn(a, b)

    if n_comp == 4:
        q_grad(
            lambda a, b: dw_full[a * cin_c : (a + 1) * cin_c, b * cout_c : (b + 1) * cout_c],
            0, transpose,
        )
    else:
        four_i, four_o = 4 * cin_c, 4 * cout_c

        def blk(r, c, a, b):
            return dw_full[
                r + a * cin_c : r + (a + 1) * cin_c, c + b * cout_c : c + (b + 1) * cout_c
            ]

        # Q appears on the diagonal twice; Q_e in one off-diagonal corner.
        q_grad(lambda a, b: blk(0, 0, a, b) + blk(four_i, four_o, a, b), 0, transpose)
        if transpose:  # linear orientation: Q_e at (in>=4, out<4)
            q_grad(lambda a, b: blk(four_i, 0, a, b), 4, transpose)
        else:  # conv orientation: Q_e at (in<4, out>=4)
            q_grad(lambda a, b: blk(0, four_o, a, b), 4, transpose)
    return jnp.stack(dcomp)


def _make_core(n_comp: int, transpose: bool):
    @jax.custom_vjp
    def core(x2d, comps, bias):
        return _hamilton_matmul(x2d, comps, bias, n_comp=n_comp, transpose=transpose)

    def fwd(x2d, comps, bias):
        return core(x2d, comps, bias), (x2d, comps)

    def bwd(res, g):
        x2d, comps = res
        comps_t = jnp.swapaxes(comps, 1, 2)
        dx = _hamilton_matmul(g, comps_t, None, n_comp=n_comp, transpose=not transpose)
        dw_full = jnp.einsum("mi,mo->io", x2d, g, preferred_element_type=jnp.float32)
        dcomps = _structured_dw(
            dw_full, comps.shape[1], comps.shape[2], n_comp, transpose
        ).astype(comps.dtype)
        return dx.astype(x2d.dtype), dcomps, jnp.sum(g, axis=0)

    core.defvjp(fwd, bwd)
    return core


_Q_CORE = _make_core(4, transpose=False)
_DQ_LINEAR_CORE = _make_core(8, transpose=True)
_DQ_CONV_CORE = _make_core(8, transpose=False)


def _flatten_apply(x, fn):
    lead = x.shape[:-1]
    out = fn(x.reshape(-1, x.shape[-1]))
    return out.reshape(*lead, out.shape[-1])


def pallas_q_linear(x: jnp.ndarray, comps: jnp.ndarray, bias=None) -> jnp.ndarray:
    """Fused quaternion linear (Pallas). Semantics match
    seld_tpu.ops.quaternion.quaternion_linear; also serves 1x1 quaternion
    convs on channel-last activations."""
    if bias is None:
        bias = jnp.zeros((comps.shape[2] * 4,), x.dtype)
    return _flatten_apply(x, lambda x2: _Q_CORE(x2, comps, bias))


def pallas_dq_linear(
    x: jnp.ndarray, comps: jnp.ndarray, bias=None, conv_table: bool = False
) -> jnp.ndarray:
    """Fused dual-quaternion linear (Pallas).

    conv_table=False reproduces the reference DQ-linear orientation
    (hamilton.assemble_dq_linear_kernel); conv_table=True gives the conv
    orientation, for 1x1 DQ convolutions routed through the matmul.
    """
    if bias is None:
        bias = jnp.zeros((comps.shape[2] * 8,), x.dtype)
    core = _DQ_CONV_CORE if conv_table else _DQ_LINEAR_CORE
    return _flatten_apply(x, lambda x2: core(x2, comps, bias))
