"""Neighbor-graph construction.

The reference builds its graph online via HNSW insertion (hnsw_rs wrapper,
ruvector-core/src/index/hnsw.rs:102-108). For the TPU framework the graph is
*input data*: we build kNN adjacency offline. On-TPU brute-force kNN via one
big [N, D] x [D, N] matmul is MXU-bound and beats CPU HNSW construction by
orders of magnitude up to millions of nodes — so it doubles as the default
"index build". Blocked to bound HBM usage.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph.neighbors import NeighborGraph


@partial(jax.jit, static_argnames=("k", "metric", "block"))
def _knn_blocked(x: jax.Array, k: int, metric: str, block: int):
    """Top-k neighbors for every row of x against all rows of x.

    Returns (idx [N,k] int32, sim [N,k] f32). Self-matches are excluded.
    """
    n, d = x.shape
    if metric == "cosine":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    else:
        xn = x

    nblk = -(-n // block)
    pad_n = nblk * block
    xp = jnp.pad(xn, ((0, pad_n - n), (0, 0)))

    def body(i, _):
        q = jax.lax.dynamic_slice_in_dim(xp, i * block, block)  # [B, D]
        if metric in ("cosine", "dot"):
            sims = jnp.dot(q, xn.T, preferred_element_type=jnp.float32)
        elif metric == "euclidean":
            # negative squared distance so that top-k = nearest
            qq = jnp.sum(q * q, axis=1, keepdims=True)
            xx = jnp.sum(xn * xn, axis=1)[None, :]
            sims = -(qq + xx - 2.0 * jnp.dot(q, xn.T, preferred_element_type=jnp.float32))
        else:
            raise ValueError(f"unknown metric {metric}")
        # exclude self: row r of this block is global row i*block + r
        rows = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        sims = jnp.where(rows == cols, -jnp.inf, sims)
        top_sim, top_idx = jax.lax.top_k(sims, k)
        return i + 1, (top_idx.astype(jnp.int32), top_sim)

    _, (idx, sim) = jax.lax.scan(lambda c, _: body(c, None), 0, None, length=nblk)
    idx = idx.reshape(pad_n, k)[:n]
    sim = sim.reshape(pad_n, k)[:n]
    return idx, sim


def build_knn_graph(
    features,
    k: int = 16,
    metric: str = "cosine",
    weight: str = "similarity",
    block: int = 1024,
) -> NeighborGraph:
    """Build a k-nearest-neighbor NeighborGraph from [N, D] features.

    weight: 'similarity' (softplus-clipped sims) | 'uniform'.
    """
    x = jnp.asarray(features, dtype=jnp.float32)
    n = x.shape[0]
    k = min(k, n - 1)
    idx, sim = _knn_blocked(x, k, metric, min(block, max(8, n)))
    mask = jnp.ones((n, k), dtype=jnp.float32)
    if weight == "similarity":
        w = jnp.maximum(sim, 1e-6)
    else:
        w = mask
    return NeighborGraph(nbr_idx=idx, nbr_mask=mask, edge_weight=w)


def knn_graph_numpy(features: np.ndarray, k: int = 16, metric: str = "cosine"):
    """Pure-numpy reference kNN (for test oracles)."""
    x = np.asarray(features, dtype=np.float64)
    if metric == "cosine":
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    sims = x @ x.T
    np.fill_diagonal(sims, -np.inf)
    idx = np.argsort(-sims, axis=1)[:, :k].astype(np.int32)
    sim = np.take_along_axis(sims, idx, axis=1).astype(np.float32)
    return idx, sim
