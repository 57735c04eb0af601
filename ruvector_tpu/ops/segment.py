"""Core sparse message-passing ops: SpMM, SDDMM, segment softmax.

Two layouts, one semantics:

- **padded-dense** `[N, M]` (NeighborGraph): ops are masked dense reductions.
  XLA fuses the gather + elementwise + reduce into MXU/VPU-friendly code; this
  is the fast path for bounded-degree HNSW graphs and replaces the reference's
  per-node scalar loops (ruvector-gnn/src/layer.rs:421-445 aggregate,
  layer.rs:174-210 scaled-dot attention).

- **CSR** (CSRGraph): segment ops via jax.ops.segment_sum — the general path,
  also the correctness oracle for the Pallas CSR kernels in
  ruvector_tpu/ops/pallas/.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# padded-dense layout
# ---------------------------------------------------------------------------

def masked_softmax(scores: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax over `axis` treating mask==0 entries as -inf.

    Matches the reference's epsilon-guarded softmax (layer.rs:195-199):
    exp-sum is clamped below at 1e-10, and fully-masked rows yield zeros.
    """
    scores = jnp.where(mask > 0, scores, NEG_INF)
    m = jnp.max(scores, axis=axis, keepdims=True)
    m = jnp.maximum(m, NEG_INF)  # all-masked row guard
    e = jnp.exp(scores - m) * (mask > 0)
    s = jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-10)
    return e / s


def masked_weighted_mean(
    nbr_feats: jax.Array, weights: jax.Array, mask: jax.Array
) -> jax.Array:
    """Edge-weight-normalized mean over the neighbor axis.

    [N, M, D] x [N, M] -> [N, D]. Weights are normalized to sum to 1 per row;
    rows whose weights sum to <=0 fall back to a uniform average over valid
    neighbors — exactly the reference fallback (layer.rs:428-432).
    """
    w = weights * mask
    wsum = jnp.sum(w, axis=1, keepdims=True)
    deg = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    uniform = mask / deg
    wnorm = jnp.where(wsum > 0, w / jnp.where(wsum > 0, wsum, 1.0), uniform)
    return jnp.einsum("nm,nmd->nd", wnorm, nbr_feats)


def spmm_padded(
    features: jax.Array, nbr_idx: jax.Array, weights: jax.Array, mask: jax.Array
) -> jax.Array:
    """Sparse matmul A @ X in padded layout: out[i] = sum_j w_ij * x[nbr[i,j]]."""
    gathered = features[nbr_idx]  # [N, M, D]
    return jnp.einsum("nm,nmd->nd", weights * mask, gathered)


def sddmm_padded(
    q: jax.Array, k_feats: jax.Array, nbr_idx: jax.Array, mask: jax.Array
) -> jax.Array:
    """Sampled dense-dense matmul: scores[i, j] = <q[i], k[nbr[i, j]]>.

    [N, D], [N, D], [N, M] -> [N, M]; padding positions return 0.
    """
    kg = k_feats[nbr_idx]  # [N, M, D]
    return jnp.einsum("nd,nmd->nm", q, kg) * mask


# ---------------------------------------------------------------------------
# CSR layout
# ---------------------------------------------------------------------------

def spmm_csr(graph, features: jax.Array) -> jax.Array:
    """CSR SpMM: out[i] = sum_{e in row i} values[e] * x[col_idx[e]]."""
    rows = graph.row_ids()
    contrib = features[graph.col_idx] * graph.values[:, None]
    return jax.ops.segment_sum(contrib, rows, num_segments=graph.num_nodes)


def sddmm_csr(graph, q: jax.Array, k: jax.Array) -> jax.Array:
    """CSR SDDMM: per-edge scores e -> <q[row(e)], k[col(e)]>. Returns [E]."""
    rows = graph.row_ids()
    return jnp.sum(q[rows] * k[graph.col_idx], axis=-1)


def segment_softmax_csr(graph, scores: jax.Array) -> jax.Array:
    """Row-wise softmax over per-edge scores [E] -> [E]."""
    rows = graph.row_ids()
    n = graph.num_nodes
    row_max = jax.ops.segment_max(scores, rows, num_segments=n)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    e = jnp.exp(scores - row_max[rows])
    denom = jax.ops.segment_sum(e, rows, num_segments=n)
    denom = jnp.maximum(denom, 1e-10)
    return e / denom[rows]
