"""Pallas TPU kernels for the hot sparse ops.

- flash_neighbor: blockwise online-softmax neighbor attention — streams key
  blocks through VMEM with running (max, sum, acc); the [N, M] score matrix
  never exists in HBM. For large candidate sets (re-rank pools, ef-width
  neighbor lists).
- spmm: gather-fused sparse matmul — neighbor rows are DMA'd from HBM into
  VMEM per node tile and reduced in place; the [N, M, D] gathered tensor
  never exists in HBM.

Both have XLA reference implementations (ops/segment.py, attention/flash.py)
as correctness oracles; `interpret=True` runs them on CPU in tests.
"""

from ruvector_tpu.ops.pallas.flash_neighbor import flash_neighbor_attention
from ruvector_tpu.ops.pallas.spmm import spmm_pallas

__all__ = ["flash_neighbor_attention", "spmm_pallas"]
