"""Flat (brute-force) index — exact search on the MXU.

Reference: ruvector-core's flat index alongside HNSW (src/index.rs
VectorIndex trait). On TPU the flat index is not the fallback, it is
often the WINNER: batched pairwise distances run at billions/s on the
MXU (ops/distance.py), so exact search beats approximate up to millions
of vectors — and it is trivially shardable over the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.ops.distance import pairwise_cosine, pairwise_euclidean


class FlatIndex:
    """Exact top-k over a device-resident feature matrix."""

    def __init__(self, dim: int, metric: str = "cosine"):
        self.dim = dim
        self.metric = metric
        self._rows: list[np.ndarray] = []
        self._matrix: jax.Array | None = None       # device cache

    def __len__(self) -> int:
        return len(self._rows)

    def add_batch(self, vectors: np.ndarray, num_threads: int = 0):
        v = np.atleast_2d(np.asarray(vectors, np.float32))
        assert v.shape[1] == self.dim
        self._rows.extend(v)
        self._matrix = None                          # invalidate cache

    add = add_batch

    def _mat(self) -> jax.Array:
        if self._matrix is None:
            self._matrix = jnp.asarray(np.stack(self._rows))
        return self._matrix

    def search_batch(self, queries: np.ndarray, k: int = 10,
                     ef: int | None = None, num_threads: int = 0):
        """(ids [Q, k], dists [Q, k]); dists match HNSW's convention
        (squared L2 in the normalized space for cosine)."""
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        mat = self._mat()
        if self.metric == "cosine":
            sim = pairwise_cosine(q, mat)
            d = 2.0 - 2.0 * sim                     # == ||qn - xn||^2
        else:
            d = pairwise_euclidean(q, mat)     # already squared L2
        k_eff = min(k, mat.shape[0])
        neg_d, idx = jax.lax.top_k(-d, k_eff)
        ids = np.full((q.shape[0], k), -1, np.int32)
        dists = np.full((q.shape[0], k), np.inf, np.float32)
        ids[:, :k_eff] = np.asarray(idx)
        dists[:, :k_eff] = -np.asarray(neg_d)
        return ids, dists

    def search(self, query, k: int = 10, ef: int | None = None):
        ids, dists = self.search_batch(np.asarray(query)[None], k, ef)
        return ids[0], dists[0]
