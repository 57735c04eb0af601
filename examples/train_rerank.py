"""End-to-end example: build a kNN graph, train the GNN contrastively, and
measure the learned-recall gain (BASELINE.json config 1 + README:343-347).

Run: PYTHONPATH=. python examples/train_rerank.py [--n 5000]
"""

import argparse
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ruvector_tpu.graph import build_knn_graph
    from ruvector_tpu.models import (
        RuvectorNetConfig, ruvector_net_apply, ruvector_net_init,
    )
    from ruvector_tpu.ops.distance import pairwise_cosine
    from ruvector_tpu.training.optimizers import adam
    from ruvector_tpu.training.train import TrainConfig, make_train_step, train_epoch

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(args.clusters, args.dim)).astype(np.float32)
    labels = rng.integers(0, args.clusters, size=args.n)
    feats_np = (centers[labels]
                + 1.5 * rng.normal(size=(args.n, args.dim))).astype(np.float32)
    feats = jnp.asarray(feats_np)

    def recall_at_10(emb):
        sims = np.array(pairwise_cosine(jnp.asarray(emb), jnp.asarray(emb)))
        np.fill_diagonal(sims, -np.inf)
        top = np.argsort(-sims, axis=1)[:, :10]
        return float((labels[top] == labels[:, None]).mean())

    print(f"building kNN graph over {args.n} x {args.dim} ...")
    graph = build_knn_graph(feats, k=8)

    cfg = RuvectorNetConfig(input_dim=args.dim, hidden_dim=args.dim,
                            num_layers=1, heads=4)
    params = ruvector_net_init(jax.random.key(0), cfg)

    print(f"recall@10 raw features:   {recall_at_10(feats_np):.4f}")
    out0 = np.asarray(ruvector_net_apply(params, cfg, feats, graph))
    print(f"recall@10 untrained GNN:  {recall_at_10(out0):.4f}")

    tc = TrainConfig(batch_size=64, n_negatives=16, learning_rate=3e-3,
                     temperature=0.2)
    opt = adam(tc.learning_rate)
    opt_state = opt.init(params[0])
    step = make_train_step(cfg.layer_cfgs()[0], opt, tc)
    p = params[0]
    for e in range(args.epochs):
        p, opt_state, loss = train_epoch(step, p, opt_state, feats, graph,
                                         tc, rng)
        print(f"epoch {e}: loss {loss:.4f}")

    out1 = np.asarray(ruvector_net_apply([p], cfg, feats, graph))
    print(f"recall@10 trained GNN:    {recall_at_10(out1):.4f}")


if __name__ == "__main__":
    main()
