"""Minimal PyTorch oracles reproducing the reference ops' exact semantics.

These re-state the *specification* of the reference's Hamilton block-weight
construction (reference quaternion/quaternion_ops.py:125-147 and 299-327;
dual_quaternion/dual_quaternion_ops.py:111-203) so seld_tpu's TPU ops can be
parity-tested (<=1e-5) against a CPU torch execution, per SURVEY.md §4.
Used only by tests.
"""

import torch
import torch.nn.functional as F


def q_conv_weight(r, i, j, k):
    """Block conv weight, rows=out blocks, cols=in blocks (OIHW components)."""
    row_r = torch.cat([r, -i, -j, -k], dim=1)
    row_i = torch.cat([i, r, -k, j], dim=1)
    row_j = torch.cat([j, k, r, -i], dim=1)
    row_k = torch.cat([k, -j, i, r], dim=1)
    return torch.cat([row_r, row_i, row_j, row_k], dim=0)


def q_linear_weight(r, i, j, k):
    """Linear weight (in, out): cols=out blocks stacked over in blocks."""
    col_r = torch.cat([r, -i, -j, -k], dim=0)
    col_i = torch.cat([i, r, -k, j], dim=0)
    col_j = torch.cat([j, k, r, -i], dim=0)
    col_k = torch.cat([k, -j, i, r], dim=0)
    return torch.cat([col_r, col_i, col_j, col_k], dim=1)


def dq_conv_weight(c1, c2):
    """[[Q, 0], [Q_e, Q]] over (out, in) block halves; c1/c2 are 4-tuples."""
    q = q_conv_weight(*c1)
    qe = q_conv_weight(*c2)
    zero = torch.zeros_like(q)
    row1 = torch.cat([q, zero], dim=1)
    row2 = torch.cat([qe, q], dim=1)
    return torch.cat([row1, row2], dim=0)


def dq_linear_weight(c1, c2):
    """Reference DQ linear: per-quaternion blocks built with swapped cat dims
    (rows over out axis), zero at (in_primary, out_dual)."""

    def q_rowwise(r, i, j, k):
        row_r = torch.cat([r, -i, -j, -k], dim=1)
        row_i = torch.cat([i, r, -k, j], dim=1)
        row_j = torch.cat([j, k, r, -i], dim=1)
        row_k = torch.cat([k, -j, i, r], dim=1)
        return torch.cat([row_r, row_i, row_j, row_k], dim=0)

    q = q_rowwise(*c1)
    qe = q_rowwise(*c2)
    zero = torch.zeros_like(q)
    row1 = torch.cat([q, zero], dim=1)
    row2 = torch.cat([qe, q], dim=1)
    return torch.cat([row1, row2], dim=0)


def oracle_q_conv(x, comps, bias=None, stride=1, padding=0, dilation=1):
    """x: torch (B, C, *spatial); comps: list of 4 (out/4, in/4, *k) tensors."""
    w = q_conv_weight(*comps)
    fn = {3: F.conv1d, 4: F.conv2d, 5: F.conv3d}[x.dim()]
    return fn(x, w, bias, stride, padding, dilation)


def oracle_dq_conv(x, comps, bias=None, stride=1, padding=0, dilation=1):
    w = dq_conv_weight(comps[:4], comps[4:])
    fn = {3: F.conv1d, 4: F.conv2d, 5: F.conv3d}[x.dim()]
    return fn(x, w, bias, stride, padding, dilation)


def oracle_q_linear(x, comps, bias=None):
    out = x @ q_linear_weight(*comps)
    return out if bias is None else out + bias


def oracle_dq_linear(x, comps, bias=None):
    out = x @ dq_linear_weight(comps[:4], comps[4:])
    return out if bias is None else out + bias
