"""Candidate re-ranking: attention over retrieval pools.

The serving pipeline (README:330-343): ANN retrieval pulls an ef-wide
candidate pool; a learned re-rank scores the pool against the query. Here
the re-rank is attention over the pool — for wide pools (ef >= 256) the
Pallas flash kernel (ops/pallas/flash_neighbor) avoids materializing the
[B, ef] score matrix; smaller pools use the fused XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.attention.flash import flash_attention
from ruvector_tpu.ops.distance import pairwise_cosine


def attention_rerank(
    queries: jax.Array,        # [B, D]
    pool_features: jax.Array,  # [B, ef, D] gathered candidate features
    pool_ids: jax.Array,       # [B, ef] global ids
    k: int,
    temperature: float = 1.0,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Rescore candidates by attention weight of the query over the pool,
    blended with raw cosine; returns (ids [B, k], scores [B, k]).

    The attention context vector is compared back against each candidate —
    candidates aligned with the pool's consensus direction under the query
    rank higher (the GNN re-rank effect without running the full GNN).
    """
    b, ef, d = pool_features.shape
    if use_pallas is None:
        use_pallas = ef >= 256 and jax.default_backend() == "tpu"

    if use_pallas:
        from ruvector_tpu.ops.pallas.flash_neighbor import flash_neighbor_attention

        ctx = flash_neighbor_attention(queries, pool_features, pool_features)
    else:
        ctx = flash_attention(queries, pool_features, pool_features,
                              block_size=min(128, ef))

    sim_q = pairwise_cosine_rows(queries, pool_features)          # [B, ef]
    sim_ctx = pairwise_cosine_rows(ctx, pool_features)            # [B, ef]
    blended = (0.5 * sim_q + 0.5 * sim_ctx) / temperature

    scores, local = jax.lax.top_k(blended, min(k, ef))
    ids = jnp.take_along_axis(pool_ids, local, axis=1)
    return ids, scores


def pairwise_cosine_rows(q: jax.Array, pool: jax.Array) -> jax.Array:
    """[B, D] vs [B, ef, D] -> [B, ef] per-row cosine."""
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    pn = pool / jnp.maximum(jnp.linalg.norm(pool, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("bd,bed->be", qn, pn)


def retrieve_and_rerank(
    queries: np.ndarray,       # [B, D]
    features: jax.Array,       # [N, D] corpus
    ef: int = 256,
    k: int = 10,
    temperature: float = 1.0,
):
    """Brute-force stage-1 (MXU) + attention re-rank stage-2."""
    q = jnp.asarray(queries, jnp.float32)
    sims = pairwise_cosine(q, features)                # [B, N]
    _, cand = jax.lax.top_k(sims, min(ef, features.shape[0]))
    pool = features[cand]                              # [B, ef, D]
    return attention_rerank(q, pool, cand, k, temperature)
