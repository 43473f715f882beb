"""Pallas TPU kernels for the hot ops.

- ``qmatmul``: fused quaternion / dual-quaternion matmul — the Hamilton
  block weight is assembled once into VMEM scratch (components are read from
  HBM exactly once, vs 4x/8x for the XLA concat path) and activation tiles
  stream through a single MXU matmul with fused bias.
- ``attention``: flash attention (online-softmax) for the TCN's multi-head
  self-attention at T=2400.

All kernels have XLA reference paths in ``seld_tpu.ops`` and are
parity-tested against them (tests/test_pallas.py).
"""

from seld_tpu.ops.pallas.qmatmul import (  # noqa: F401
    pallas_dq_linear,
    pallas_q_linear,
)
