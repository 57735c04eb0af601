"""Serving-pipeline latency at 1M-vector scale (reference README:330-343:
"HNSW ~50 candidates 0.3 ms + GNN re-rank 0.4 ms + top-k 0.1 ms < 1 ms").

Measures the DEVICE side of the pipeline with the 1M x 128 feature table
HBM-resident: candidate gather -> 1-layer Ruvector GNN over the candidate
subgraph (candidates + their graph neighbors) -> query scoring -> top-k,
all one jitted program, timed with a chained scan (no per-call dispatch).

Neighbor lists are synthetic ([N, 16] uniform ids): latency depends on
shapes and gather patterns, not values. Run: python benchmarks/rerank_pipeline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ruvector_tpu.graph.neighbors import NeighborGraph
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig, ruvector_layer_apply, ruvector_layer_init,
    )

    n, d, m = 1_000_000, 128, 16
    ef, k, batch = 50, 10, 8
    rng = np.random.default_rng(0)

    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    nbr_idx = jnp.asarray(rng.integers(0, n, size=(n, m)).astype(np.int32))
    jax.block_until_ready(feats)

    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(0), cfg)

    def rerank(params, feats, nbr_idx, query, cand_ids):
        # subgraph: candidates + their 1-hop neighbors, locally indexed
        sub_nbr_global = nbr_idx[cand_ids]                 # [ef, m]
        node_ids = jnp.concatenate([cand_ids, sub_nbr_global.reshape(-1)])
        sub_feats = feats[node_ids]                        # [(1+m)*ef, d]
        local = jnp.arange(ef * m).reshape(ef, m) + ef
        pad = jnp.zeros((ef * m, m), jnp.int32)            # neighbors' rows: leaves
        sub_graph = NeighborGraph(
            nbr_idx=jnp.concatenate([local, pad], axis=0),
            nbr_mask=jnp.concatenate(
                [jnp.ones((ef, m)), jnp.zeros((ef * m, m))], axis=0),
            edge_weight=jnp.ones((ef * (1 + m), m)),
        )
        emb = ruvector_layer_apply(params, cfg, sub_feats, sub_graph)
        cand_emb = emb[:ef]
        qn = query / jnp.linalg.norm(query)
        cn = cand_emb / jnp.maximum(
            jnp.linalg.norm(cand_emb, axis=-1, keepdims=True), 1e-12)
        scores = cn @ qn
        top_s, top_i = jax.lax.top_k(scores, k)
        return cand_ids[top_i], top_s

    batched = jax.vmap(rerank, in_axes=(None, None, None, 0, 0))

    iters = 50

    @jax.jit
    def chain(params, feats, nbr_idx, queries, cand_batches):
        def body(carry, inp):
            q, c = inp
            ids, s = batched(params, feats, nbr_idx, q, c)
            return carry + jnp.sum(s), ids
        tot, ids = jax.lax.scan(
            body, jnp.zeros(()), (queries, cand_batches))
        return tot, ids

    queries = jnp.asarray(
        rng.normal(size=(iters, batch, d)).astype(np.float32))
    cands = jnp.asarray(
        rng.integers(0, n, size=(iters, batch, ef)).astype(np.int32))

    # distinct input sets: the dev tunnel dedupes identical dispatches,
    # so timing a repeat of the same call would measure the cache
    queries2 = jnp.asarray(
        rng.normal(size=(iters, batch, d)).astype(np.float32))
    cands2 = jnp.asarray(
        rng.integers(0, n, size=(iters, batch, ef)).astype(np.int32))
    tot, _ = chain(params, feats, nbr_idx, queries, cands)
    float(tot)          # VALUE fetch: on the dev tunnel block_until_ready
    t0 = time.perf_counter()        # can return before execution finishes
    tot, _ = chain(params, feats, nbr_idx, queries2, cands2)
    float(tot)
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "table_vectors": n,
        "candidates": ef,
        "batch": batch,
        "gnn_rerank_ms_per_batch": round(dt * 1e3, 3),
        "gnn_rerank_ms_per_query": round(dt * 1e3 / batch, 4),
        "reference_claim_ms": 0.4,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
