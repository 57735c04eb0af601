"""CSR graph representation — general-sparse fallback.

Mirrors the reference's `SparseCSR` (ruvector-mincut-gated-transformer/src/
spectral.rs:27-36) and `CsrMatrix` (ruvector-solver/src/types.rs): row_ptr /
col_idx / values. On TPU the CSR path is used when degree is unbounded or the
graph is far from regular; the padded-dense `NeighborGraph` is preferred.

For jit-compatibility the edge arrays are padded to a static `num_edges`
capacity; `edge_count` tracks the live prefix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CSRGraph:
    """Compressed-sparse-row adjacency.

    Attributes:
      row_ptr: [N+1] int32 — row offsets into the edge arrays.
      col_idx: [E] int32 — destination node ids per edge.
      values:  [E] float32 — edge weights.
      num_nodes: static int.
    """

    row_ptr: jax.Array
    col_idx: jax.Array
    values: jax.Array
    num_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_edges(self) -> int:
        return self.col_idx.shape[0]

    def row_ids(self) -> jax.Array:
        """[E] int32 — source node id for every edge (expanded from row_ptr)."""
        # searchsorted over row_ptr: edge e belongs to row i iff
        # row_ptr[i] <= e < row_ptr[i+1].
        e = jnp.arange(self.num_edges, dtype=jnp.int32)
        return (
            jnp.searchsorted(self.row_ptr, e, side="right").astype(jnp.int32) - 1
        )

    def degrees(self) -> jax.Array:
        return self.row_ptr[1:] - self.row_ptr[:-1]

    @staticmethod
    def from_edges(
        src: np.ndarray, dst: np.ndarray, weight: np.ndarray | None, num_nodes: int
    ) -> "CSRGraph":
        """Build CSR from a COO edge list (host-side)."""
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if weight is None:
            weight = np.ones(src.shape[0], dtype=np.float32)
        order = np.argsort(src, kind="stable")
        src, dst, weight = src[order], dst[order], np.asarray(weight)[order]
        counts = np.bincount(src, minlength=num_nodes)
        row_ptr = np.zeros(num_nodes + 1, dtype=np.int32)
        np.cumsum(counts, out=row_ptr[1:])
        return CSRGraph(
            row_ptr=jnp.asarray(row_ptr),
            col_idx=jnp.asarray(dst.astype(np.int32)),
            values=jnp.asarray(weight.astype(np.float32)),
            num_nodes=num_nodes,
        )

    def to_padded(self, max_degree: int | None = None):
        """Convert to padded-dense NeighborGraph (host-side)."""
        from ruvector_tpu.graph.neighbors import NeighborGraph

        row_ptr = np.asarray(self.row_ptr)
        col_idx = np.asarray(self.col_idx)
        values = np.asarray(self.values)
        deg = row_ptr[1:] - row_ptr[:-1]
        m = int(max_degree or max(int(deg.max(initial=1)), 1))
        n = self.num_nodes
        idx = np.zeros((n, m), dtype=np.int32)
        mask = np.zeros((n, m), dtype=np.float32)
        w = np.zeros((n, m), dtype=np.float32)
        for i in range(n):
            k = min(int(deg[i]), m)
            s = row_ptr[i]
            idx[i, :k] = col_idx[s : s + k]
            w[i, :k] = values[s : s + k]
            mask[i, :k] = 1.0
        return NeighborGraph(jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(w))
