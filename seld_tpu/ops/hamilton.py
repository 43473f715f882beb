"""Hamilton-product block-weight assembly and quaternion algebra helpers.

A quaternion layer stores 4 real component tensors (r, i, j, k); the layer's
effective real weight is a 4x4 block matrix of signed components implementing
left Hamilton multiplication. The reference builds it with ``torch.cat``
(reference ``quaternion/quaternion_ops.py:131-135`` for conv,
``quaternion/quaternion_ops.py:310-314`` for linear); we build the same
matrix in a feature-last layout suited to ``lax.conv_general_dilated``
(kernel ``(*k, Cin, Cout)``) and right-matmul (``(Cin, Cout)``).

Sign/component tables
---------------------
With component indices r=0, i=1, j=2, k=3, the reference's conv kernel has
block rows (output) over block columns (input):

    out r: ( r, -i, -j, -k)
    out i: ( i,  r, -k,  j)
    out j: ( j,  k,  r, -i)
    out k: ( k, -j,  i,  r)

``quaternion_linear`` uses the identical convention (transposed layout but
the same operator). The dual-quaternion layers embed two quaternions in the
dual-number lower-triangular form [[Q, 0], [Q_e, Q]]
(``dual_quaternion/dual_quaternion_ops.py:134-140``). NOTE a genuine
reference quirk we reproduce for parity: ``dual_quaternion_linear``
(``dual_quaternion/dual_quaternion_ops.py:170-188``) builds its per-quaternion
blocks with the cat dims swapped relative to ``dual_quaternion_conv``, so the
DQ *linear* operator uses the transposed Hamilton table while the DQ *conv*
uses the standard one.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# T[out_block][in_block] = (component_index, sign): the conv-orientation table.
Q_TABLE = (
    ((0, +1), (1, -1), (2, -1), (3, -1)),
    ((1, +1), (0, +1), (3, -1), (2, +1)),
    ((2, +1), (3, +1), (0, +1), (1, -1)),
    ((3, +1), (2, -1), (1, +1), (0, +1)),
)


def _block_rows(comps, table, transpose: bool):
    """Build the (in_block, out_block) grid of signed component tensors.

    ``comps``: component array stacked on axis 0, each (..., cin, cout).
    Returns the assembled (..., 4*cin, 4*cout) array. With ``transpose=False``
    entry [a][b] = T[b][a] (standard Hamilton operator applied from the
    right); with ``transpose=True`` entry [a][b] = T[a][b].
    """
    rows = []
    for a in range(4):
        cols = []
        for b in range(4):
            idx, sgn = table[a][b] if transpose else table[b][a]
            cols.append(sgn * comps[idx])
        rows.append(jnp.concatenate(cols, axis=-1))
    return jnp.concatenate(rows, axis=-2)


def assemble_q_kernel(comps: jnp.ndarray) -> jnp.ndarray:
    """Quaternion weight: comps (4, ..., cin, cout) -> (..., 4*cin, 4*cout).

    Valid for both conv kernels (..., = spatial dims) and linear weights
    (no leading spatial dims); the reference uses the same Hamilton
    convention for both.
    """
    return _block_rows(comps, Q_TABLE, transpose=False)


def assemble_dq_conv_kernel(comps: jnp.ndarray) -> jnp.ndarray:
    """Dual-quaternion conv weight: comps (8, ..., cin, cout) -> (..., 8cin, 8cout).

    Block layout [[Q, 0], [Q_e, Q]] acting on (primary, dual) input halves:
    out_primary = Q(in_primary); out_dual = Q_e(in_primary) + Q(in_dual).
    Matches reference ``dual_quaternion_ops.py:122-140``.
    """
    q = _block_rows(comps[:4], Q_TABLE, transpose=False)
    qe = _block_rows(comps[4:], Q_TABLE, transpose=False)
    zero = jnp.zeros_like(q)
    # The reference builds W[out o][in i] with the zero block at (o<4, i>=4).
    # In our (in a, out b) orientation that zero lands at (a>=4, b<4):
    #   W[in<4,  out<4] = Q ;  W[in<4,  out>=4] = Q_e
    #   W[in>=4, out<4] = 0 ;  W[in>=4, out>=4] = Q
    top = jnp.concatenate([q, qe], axis=-1)
    bot = jnp.concatenate([zero, q], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def assemble_dq_linear_kernel(comps: jnp.ndarray) -> jnp.ndarray:
    """Dual-quaternion *linear* weight (reference-quirk orientation).

    ``dual_quaternion_linear`` builds its quaternion blocks with swapped cat
    dims (``dual_quaternion_ops.py:170-188``), i.e. the transposed Hamilton
    table, and places the zero block at (in_primary, out_dual):
        W[in<4,  out<4] = Q'  ; W[in<4,  out>=4] = 0
        W[in>=4, out<4] = Q_e'; W[in>=4, out>=4] = Q'
    with Q'[a][b] = T[a][b].
    """
    q = _block_rows(comps[:4], Q_TABLE, transpose=True)
    qe = _block_rows(comps[4:], Q_TABLE, transpose=True)
    zero = jnp.zeros_like(q)
    top = jnp.concatenate([q, zero], axis=-1)
    bot = jnp.concatenate([qe, q], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# channel-last quaternion accessors and algebra (reference quaternion_ops.py:52-121,
# 467-503; dual_quaternion_ops.py:206-243). Channels live on the LAST axis.
# ---------------------------------------------------------------------------

def _check_q(x: jnp.ndarray) -> int:
    n = x.shape[-1]
    if n % 4 != 0:
        raise ValueError(f"Quaternion tensors must have last dim divisible by 4, got {n}")
    return n // 4


def get_r(x):
    q = _check_q(x)
    return x[..., 0:q]


def get_i(x):
    q = _check_q(x)
    return x[..., q : 2 * q]


def get_j(x):
    q = _check_q(x)
    return x[..., 2 * q : 3 * q]


def get_k(x):
    q = _check_q(x)
    return x[..., 3 * q : 4 * q]


def get_modulus(x, vector_form: bool = False):
    r, i, j, k = get_r(x), get_i(x), get_j(x), get_k(x)
    sq = r * r + i * i + j * j + k * k
    if vector_form:
        return jnp.sqrt(sq)
    return jnp.sqrt(jnp.sum(sq, axis=0))


def get_normalized(x, eps: float = 1e-4):
    mod = get_modulus(x, vector_form=True)
    reps = x.ndim * [1]
    reps[-1] = 4
    return x / (jnp.tile(mod, reps) + eps)


def hamilton_product(q0: jnp.ndarray, q1: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamilton product on (..., 4n) channel-quartered tensors."""
    a_r, a_i, a_j, a_k = get_r(q0), get_i(q0), get_j(q0), get_k(q0)
    b_r, b_i, b_j, b_k = get_r(q1), get_i(q1), get_j(q1), get_k(q1)
    r = a_r * b_r - a_i * b_i - a_j * b_j - a_k * b_k
    i = a_r * b_i + a_i * b_r + a_j * b_k - a_k * b_j
    j = a_r * b_j - a_i * b_k + a_j * b_r + a_k * b_i
    k = a_r * b_k + a_i * b_j - a_j * b_i + a_k * b_r
    return jnp.concatenate([r, i, j, k], axis=-1)


def q_normalize(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Per-channel unit-normalize quaternion components (dual_quaternion_ops.py:206-226)."""
    r, i, j, k = get_r(x), get_i(x), get_j(x), get_k(x)
    norm = jnp.sqrt(r * r + i * i + j * j + k * k + eps)
    return jnp.concatenate([r / norm, i / norm, j / norm, k / norm], axis=-1)


def quaternion_exp(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Quaternion exponential exp(q) = e^r (cos|v|, v/|v| sin|v|).

    Matches reference dual_quaternion_ops.py:227-243 exactly, including its
    ADDITIVE epsilon convention |v| = sqrt(i^2+j^2+k^2) + 1e-4 (applied
    after the root, unlike q_normalize's under-the-root epsilon)."""
    r, i, j, k = get_r(x), get_i(x), get_j(x), get_k(x)
    v_norm = jnp.sqrt(i * i + j * j + k * k) + eps
    exp_r = jnp.exp(r)
    sinc = jnp.sin(v_norm) / v_norm
    return jnp.concatenate(
        [exp_r * jnp.cos(v_norm), exp_r * i * sinc, exp_r * j * sinc, exp_r * k * sinc],
        axis=-1,
    )


def split_components(w_full_shape: Tuple[int, ...]) -> Tuple[int, int]:
    """Helper: per-component (cin, cout) from a full (4cin, 4cout) weight shape."""
    return w_full_shape[-2] // 4, w_full_shape[-1] // 4
