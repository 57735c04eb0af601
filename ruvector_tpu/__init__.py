"""ruvector_tpu — a TPU-native graph neural message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Mu-L/ruvector model family (reference: ruvector-gnn, ruvector-attention,
ruvector-attn-mincut, ruvector-mincut-gated-transformer, sona):

- batched GNN embedding-update layers over HNSW/kNN neighbor graphs
- a family of graph-attention mechanisms (scaled-dot, multi-head, flash,
  linear, local-global, edge-featured/GATv2, hyperbolic, min-cut gated,
  dual-space, transport/OT, information-bottleneck, diffusion, sheaf,
  mixed-curvature, topology-gated, MoE)
- neighborhood-sampled contrastive training with query-feedback signals
  (InfoNCE, Adam, EWC, replay, SONA-style micro-LoRA loops)
- a tiered, deterministic, int8 mincut-gated transformer
- Pallas kernels for the hot sparse ops; native C++ host runtime
- multi-chip scaling by edge-partitioning the neighbor graph over a
  jax.sharding.Mesh with halo exchange on ICI

All compute is pure-functional JAX: parameters are pytrees, layers are
(init, apply) pairs, and everything composes with jit/grad/vmap/shard_map.
"""

__version__ = "0.1.0"

from ruvector_tpu.graph.neighbors import NeighborGraph
from ruvector_tpu.graph.csr import CSRGraph
from ruvector_tpu.graph.build import build_knn_graph

__all__ = [
    "NeighborGraph",
    "CSRGraph",
    "build_knn_graph",
    "__version__",
]


def __getattr__(name):
    """Lazy subpackage access: ruvector_tpu.models, .attention, ... without
    importing the world at `import ruvector_tpu`."""
    import importlib

    subpackages = {
        "graph", "ops", "nn", "attention", "models", "transformer",
        "graph_transformer", "training", "sona", "solver", "parallel",
        "index", "serve", "utils", "native",
    }
    if name in subpackages:
        return importlib.import_module(f"ruvector_tpu.{name}")
    raise AttributeError(f"module 'ruvector_tpu' has no attribute {name!r}")
