"""ruvector_tpu — a TPU-native graph neural message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Mu-L/ruvector model family (reference: ruvector-gnn, ruvector-attention,
ruvector-attn-mincut, ruvector-graph-transformer, sona):

- batched GNN embedding-update layers over HNSW/kNN neighbor graphs
- a family of graph-attention mechanisms (scaled-dot, multi-head, flash,
  linear, local-global, edge-featured/GATv2, hyperbolic, min-cut gated)
- neighborhood-sampled contrastive training with query-feedback signals
  (InfoNCE, Adam, EWC, replay, SONA-style micro-LoRA loops)
- Pallas kernels for CSR SpMM / SDDMM / fused segment-softmax on TPU
- multi-chip scaling by edge-partitioning the neighbor graph over a
  jax.sharding.Mesh with halo exchange on ICI

All compute is pure-functional JAX: parameters are pytrees, layers are
(init, apply) pairs, and everything composes with jit/grad/vmap/shard_map.
"""

__version__ = "0.1.0"

from ruvector_tpu.graph.neighbors import NeighborGraph
from ruvector_tpu.graph.csr import CSRGraph

__all__ = [
    "NeighborGraph",
    "CSRGraph",
    "__version__",
]
