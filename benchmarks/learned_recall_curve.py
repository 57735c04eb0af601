"""Learned-recall curve on a real query STREAM (VERDICT r3 #6).

Reference claim (README.md:343-347): query-feedback learning lifts
recall@10 by +5-8% after ~1k queries and +12.4% after 100k queries over
HNSW-only retrieval. Round 2 only had a 1-shot training example; this
bench runs the actual serving loop:

  per query: HNSW retrieves ef candidates on RAW vectors -> the GNN
  re-ranker scores them -> feedback arrives (which candidates were
  relevant: cluster match, the standard click signal) -> ONE jitted
  contrastive update on the re-ranker from that feedback (the
  ~10ms/session GNN update tier, README:319-323) + a SONA trajectory
  (MicroLoRA accumulate + periodic background tick, sona/engine.py).

Relevance = cluster identity, and the clusters live in an INFORMATIVE
SUBSPACE (dims 0..15) while the remaining dims carry larger nuisance
noise — the realistic embedding pathology feedback learning fixes: the
raw metric weights all dims equally, so HNSW-only recall is diluted;
the ranker can learn to emphasize the dims that predict relevance.
Score = raw_cos + beta * gnn_cos with beta starting at 0 (query 0 ranks
EXACTLY like HNSW-only; learning is upward-only in expectation).
Recall@10 of the re-ranked candidates is measured on a FIXED held-out
eval query set at checkpoints.

Writes LEARNED_RECALL_r03.json.
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
    import optax

    from ruvector_tpu.index.hnsw import HnswConfig, HnswIndex
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig,
        ruvector_layer_apply,
        ruvector_layer_init,
    )
    from ruvector_tpu.graph import build_knn_graph
    from ruvector_tpu.graph.neighbors import NeighborGraph
    from ruvector_tpu.sona.engine import SonaEngine
    from ruvector_tpu.sona.types import SonaConfig

    n, d, n_clusters = 20_000, 64, 64
    ef, topk = 40, 10
    d_inf = 16                       # informative subspace
    sig_inf, sig_nui = 0.8, 2.0      # nuisance dims dilute raw cosine
    checkpoints = [0, 1_000, 10_000, 100_000]

    rng = np.random.default_rng(0)
    centers = np.zeros((n_clusters, d), np.float32)
    centers[:, :d_inf] = 2.0 * rng.normal(size=(n_clusters, d_inf))
    labels = rng.integers(0, n_clusters, size=n)
    noise_mat = rng.normal(size=(n, d)).astype(np.float32)
    noise_mat[:, :d_inf] *= sig_inf
    noise_mat[:, d_inf:] *= sig_nui
    corpus = (centers[labels] + noise_mat).astype(np.float32)

    # ANN index on raw vectors (candidate generator)
    idx = HnswIndex(HnswConfig(dim=d, m=16, ef_construction=100))
    idx.add_batch(corpus, num_threads=os.cpu_count() or 4)

    # kNN graph for the GNN re-ranker's neighborhood aggregation
    graph = build_knn_graph(jnp.asarray(corpus), k=8)
    nbr_idx = np.asarray(graph.nbr_idx)
    nbr_w = np.asarray(graph.edge_weight)

    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    # residual ranker: score = raw_cos + beta * gnn_cos. beta starts at 0,
    # so query 0 scores EXACTLY like HNSW-only; the feedback stream can
    # only learn upward (the production-safe shape of learned re-ranking)
    params = {"layer": ruvector_layer_init(jax.random.key(0), cfg),
              "beta": jnp.zeros(())}
    # decayed LR: a 100k-query stream at constant LR drifts after convergence
    opt = optax.adam(optax.exponential_decay(
        1e-3, transition_steps=20_000, decay_rate=0.3))
    opt_state = opt.init(params)

    m = nbr_idx.shape[1]

    def subgraph_embed(p, cand_feats, cand_nbr_feats, cand_nbr_w):
        """Embed candidates over their 1-hop neighborhood: rows =
        [ef candidates; ef*m neighbors (leaves)]."""
        feats_all = jnp.concatenate(
            [cand_feats, cand_nbr_feats.reshape(-1, d)], axis=0)
        local = jnp.arange(ef * m).reshape(ef, m) + ef
        pad = jnp.zeros((ef * m, m), jnp.int32)
        g = NeighborGraph(
            nbr_idx=jnp.concatenate([local, pad], axis=0),
            nbr_mask=jnp.concatenate(
                [jnp.ones((ef, m)), jnp.zeros((ef * m, m))], axis=0),
            edge_weight=jnp.concatenate(
                [cand_nbr_w, jnp.ones((ef * m, m))], axis=0),
        )
        return ruvector_layer_apply(p["layer"], cfg, feats_all, g)[:ef]

    def feedback_loss(p, q, cand_feats, cand_nbr_feats, cand_nbr_w,
                      rewards):
        """InfoNCE with feedback labels: relevant candidates are
        positives for the query embedding (training.rs:541-590 role,
        driven by the stream's click signal)."""
        sims = _blended(p, q, cand_feats, cand_nbr_feats, cand_nbr_w) / 0.2
        logz = jax.nn.logsumexp(sims)
        pos = jnp.sum(rewards * (sims - logz))
        return -pos / jnp.maximum(jnp.sum(rewards), 1.0)

    @jax.jit
    def feedback_step(p, st, q, cand_feats, cand_nbr_feats, cand_nbr_w,
                      rewards):
        loss, g = jax.value_and_grad(feedback_loss)(
            p, q, cand_feats, cand_nbr_feats, cand_nbr_w, rewards)
        upd, st = opt.update(g, st)
        return optax.apply_updates(p, upd), st, loss

    def _blended(p, q, cand_feats, cand_nbr_feats, cand_nbr_w):
        emb = subgraph_embed(p, cand_feats, cand_nbr_feats, cand_nbr_w)
        emb = emb / (jnp.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)
        qn = q / (jnp.linalg.norm(q) + 1e-8)
        raw = cand_feats / (jnp.linalg.norm(cand_feats, axis=1,
                                            keepdims=True) + 1e-8)
        return raw @ qn + p["beta"] * (emb @ qn)

    @jax.jit
    def rerank_scores(p, q, cand_feats, cand_nbr_feats, cand_nbr_w):
        return _blended(p, q, cand_feats, cand_nbr_feats, cand_nbr_w)

    sona = SonaEngine(config=SonaConfig(
        hidden_dim=d, embedding_dim=d, flush_threshold=64,
        quality_threshold=0.3))

    def make_queries(count, seed):
        r = np.random.default_rng(seed)
        qc = r.integers(0, n_clusters, count)
        nm = r.normal(size=(count, d)).astype(np.float32)
        nm[:, :d_inf] *= sig_inf
        nm[:, d_inf:] *= sig_nui
        return (centers[qc] + nm).astype(np.float32), qc

    eval_q, eval_c = make_queries(400, 999)
    eval_cands, _ = idx.search_batch(eval_q, k=ef, ef=64,
                                     num_threads=os.cpu_count() or 4)

    def eval_recall(p):
        """Re-ranked recall@10 (fraction of top-10 in the query's
        cluster) + the HNSW-only baseline on the same candidates."""
        hits_rr, hits_raw = 0, 0
        for i in range(len(eval_q)):
            cids = eval_cands[i]
            cf = jnp.asarray(corpus[cids])
            cnf = jnp.asarray(corpus[nbr_idx[cids]])
            cnw = jnp.asarray(nbr_w[cids])
            s = np.asarray(rerank_scores(p, jnp.asarray(eval_q[i]),
                                         cf, cnf, cnw))
            order = np.argsort(-s)[:topk]
            hits_rr += int((labels[cids[order]] == eval_c[i]).sum())
            hits_raw += int((labels[cids[:topk]] == eval_c[i]).sum())
        return hits_rr / (len(eval_q) * topk), hits_raw / (len(eval_q) * topk)

    base_rr, base_raw = eval_recall(params)
    curve = {"hnsw_only_recall@10": round(base_raw, 4),
             "untrained_rerank_recall@10": round(base_rr, 4),
             "checkpoints": {}}
    print(f"baseline: hnsw-only {base_raw:.4f}, untrained GNN {base_rr:.4f}",
          flush=True)

    stream_q, stream_c = make_queries(max(checkpoints), 1)
    t0 = time.time()
    qdone = 0
    for target in checkpoints:
        while qdone < target:
            i = qdone
            q = stream_q[i]
            cids, _ = idx.search(q, k=ef, ef=64)
            cf = jnp.asarray(corpus[cids])
            cnf = jnp.asarray(corpus[nbr_idx[cids]])
            cnw = jnp.asarray(nbr_w[cids])
            rewards = (labels[cids] == stream_c[i]).astype(np.float32)
            params, opt_state, _ = feedback_step(
                params, opt_state, jnp.asarray(q), cf, cnf, cnw,
                jnp.asarray(rewards))
            # SONA trajectory: query + relevant-direction steps
            traj = sona.begin_trajectory(q)
            rel = corpus[cids[rewards > 0]]
            if len(rel):
                traj.add_step((rel.mean(0) - q), np.zeros(1),
                              float(rewards.mean()))
            sona.end_trajectory(traj, float(rewards[:topk].mean()))
            if qdone % 5000 == 4999:
                sona.force_learn()
            qdone += 1
        rr, _ = eval_recall(params)
        curve["checkpoints"][str(target)] = {
            "rerank_recall@10": round(rr, 4),
            "gain_vs_hnsw_only": round(rr - base_raw, 4),
            "elapsed_s": round(time.time() - t0, 1),
        }
        print(f"after {target} queries: recall@10 {rr:.4f} "
              f"(+{rr - base_raw:.4f} vs hnsw-only)", flush=True)

    curve["sona_stats"] = dataclass_dict(sona.stats)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "LEARNED_RECALL_r03.json")
    with open(out, "w") as f:
        json.dump(curve, f, indent=1)
    print(json.dumps(curve, indent=1))


def dataclass_dict(x):
    import dataclasses

    try:
        return dataclasses.asdict(x)
    except Exception:
        return str(x)


if __name__ == "__main__":
    main()
