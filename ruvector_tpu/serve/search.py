"""Differentiable search and hierarchical GNN forward.

Reference: ruvector-gnn/src/search.rs — temperature softmax (:29-44),
differentiable (soft-attention) top-k search (:56-94), hierarchical forward
over HNSW layers (:105-162). Batched for TPU: similarity computation is one
MXU matmul per layer, top-k is lax.top_k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ruvector_tpu.nn.ruvector_layer import (
    RuvectorLayerConfig,
    ruvector_layer_apply_single,
)
from ruvector_tpu.ops.distance import pairwise_cosine


def softmax_temperature(values: jax.Array, temperature: float) -> jax.Array:
    """Temperature-scaled softmax with the reference's 1e-10 sum guard
    (search.rs:29-44). Note the reference scales (x - max)/T, not x/T."""
    m = jnp.max(values, axis=-1, keepdims=True)
    e = jnp.exp((values - m) / temperature)
    s = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-10)
    return e / s


@partial(jax.jit, static_argnames=("k",))
def differentiable_search(
    query: jax.Array,           # [D] or [B, D]
    candidates: jax.Array,      # [N, D]
    k: int,
    temperature: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Soft top-k by cosine similarity (search.rs:56-94).

    Returns (indices [.., k] int32, soft_weights [.., k]). Weights are the
    temperature-softmax over ALL candidates, evaluated at the top-k indices
    (so they sum to <= 1, as in the reference).
    """
    squeeze = query.ndim == 1
    q = query[None, :] if squeeze else query
    sims = pairwise_cosine(q, candidates)                  # [B, N]
    soft = softmax_temperature(sims, temperature)          # [B, N]
    top_w, top_i = jax.lax.top_k(soft, min(k, candidates.shape[0]))
    if squeeze:
        return top_i[0].astype(jnp.int32), top_w[0]
    return top_i.astype(jnp.int32), top_w


def hierarchical_forward(
    query: jax.Array,                       # [D]
    layer_embeddings: list[jax.Array],      # per HNSW layer: [N_l, D]
    gnn_params: list[dict],
    gnn_cfgs: list[RuvectorLayerConfig],
    temperature: float = 1.0,
) -> jax.Array:
    """Process a query down the HNSW hierarchy (search.rs:105-162).

    Per layer: soft top-5 retrieve -> soft-weighted aggregate -> average
    combine with the running embedding -> RuvectorLayer forward with the
    retrieved nodes as neighbors and soft weights as edge weights.
    """
    current = query
    for embeddings, params, cfg in zip(layer_embeddings, gnn_params, gnn_cfgs):
        n = embeddings.shape[0]
        if n == 0:
            continue
        k = min(5, n)
        idx, weights = differentiable_search(current, embeddings, k, temperature)
        chosen = embeddings[idx]                        # [k, D]
        aggregated = jnp.einsum("k,kd->d", weights, chosen)
        combined = (current + aggregated) / 2.0
        current = ruvector_layer_apply_single(
            params, cfg, combined, chosen, weights
        )
    return current
