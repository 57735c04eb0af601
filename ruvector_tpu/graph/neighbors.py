"""Padded-dense neighbor graph — the primary TPU layout.

The reference stores HNSW adjacency as per-node Rust `Vec`s of neighbor ids
(ruvector-core/src/index/hnsw.rs) and iterates them one node at a time
(ruvector-gnn/src/layer.rs:379-418). On TPU we exploit the bounded degree of
HNSW graphs (M<=32 by default, ruvector-core/src/types.rs:86-97): adjacency
becomes a dense `[N, M]` int32 index array plus a validity mask, so neighbor
gathers are `jnp.take` and aggregation is a masked dense reduction that XLA
tiles straight onto the MXU/VPU. Variable degree is handled by padding with
index 0 and mask 0 — no dynamic shapes ever reach the compiler.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NeighborGraph:
    """Fixed-degree padded adjacency: the TPU-native graph representation.

    Attributes:
      nbr_idx:  [N, M] int32 — neighbor node ids, padded with 0.
      nbr_mask: [N, M] float32/bool-like — 1.0 for real edges, 0.0 for padding.
      edge_weight: [N, M] float32 — per-edge weights (e.g. distances);
        padding entries are ignored (masked) by all consumers.
    """

    nbr_idx: jax.Array
    nbr_mask: jax.Array
    edge_weight: jax.Array

    @property
    def num_nodes(self) -> int:
        return self.nbr_idx.shape[0]

    @property
    def max_degree(self) -> int:
        return self.nbr_idx.shape[1]

    def degrees(self) -> jax.Array:
        """[N] float32 — true (unpadded) degree of each node."""
        return jnp.sum(self.nbr_mask, axis=1)

    @staticmethod
    def from_lists(
        neighbor_lists: list[list[int]],
        weights: list[list[float]] | None = None,
        max_degree: int | None = None,
    ) -> "NeighborGraph":
        """Build from ragged Python neighbor lists (host-side, numpy)."""
        n = len(neighbor_lists)
        m = max_degree or max((len(l) for l in neighbor_lists), default=1)
        m = max(m, 1)
        idx = np.zeros((n, m), dtype=np.int32)
        mask = np.zeros((n, m), dtype=np.float32)
        w = np.zeros((n, m), dtype=np.float32)
        for i, nbrs in enumerate(neighbor_lists):
            k = min(len(nbrs), m)
            idx[i, :k] = nbrs[:k]
            mask[i, :k] = 1.0
            if weights is not None:
                w[i, :k] = weights[i][:k]
            else:
                w[i, :k] = 1.0
        return NeighborGraph(
            nbr_idx=jnp.asarray(idx),
            nbr_mask=jnp.asarray(mask),
            edge_weight=jnp.asarray(w),
        )

    def gather(self, features: jax.Array) -> jax.Array:
        """Gather neighbor features: [N, D] -> [N, M, D]."""
        return features[self.nbr_idx]

    def to_csr(self) -> "ruvector_tpu.graph.csr.CSRGraph":  # noqa: F821
        """Convert to CSR (host-side; for the general-sparse kernel path)."""
        from ruvector_tpu.graph.csr import CSRGraph

        mask = np.asarray(self.nbr_mask) > 0
        idx = np.asarray(self.nbr_idx)
        w = np.asarray(self.edge_weight)
        deg = mask.sum(axis=1).astype(np.int32)
        row_ptr = np.zeros(self.num_nodes + 1, dtype=np.int32)
        np.cumsum(deg, out=row_ptr[1:])
        col_idx = idx[mask].astype(np.int32)
        values = w[mask].astype(np.float32)
        return CSRGraph(
            row_ptr=jnp.asarray(row_ptr),
            col_idx=jnp.asarray(col_idx),
            values=jnp.asarray(values),
            num_nodes=self.num_nodes,
        )


def pad_degree_to(graph: NeighborGraph, m: int) -> NeighborGraph:
    """Pad (or truncate) max_degree to `m` — e.g. to a lane-friendly multiple."""
    n, cur = graph.nbr_idx.shape
    if cur == m:
        return graph
    if cur > m:
        return NeighborGraph(
            graph.nbr_idx[:, :m], graph.nbr_mask[:, :m], graph.edge_weight[:, :m]
        )
    pad = [(0, 0), (0, m - cur)]
    return NeighborGraph(
        jnp.pad(graph.nbr_idx, pad),
        jnp.pad(graph.nbr_mask, pad),
        jnp.pad(graph.edge_weight, pad),
    )
