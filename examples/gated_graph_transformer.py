"""Example: the mincut-gated graph transformer (BASELINE config 5) in
miniature — clustered data, per-partition device min-cut gates,
cross-partition neighbor mixing, one training step.

Run: PYTHONPATH=. python examples/gated_graph_transformer.py
(Scale version: benchmarks/config5_gated_graph_transformer.py at 1M.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ruvector_tpu.graph import build_block_dense, build_knn_graph
    from ruvector_tpu.graph_transformer import (
        GatedGraphTransformerConfig,
        gated_graph_transformer_apply,
        gated_graph_transformer_init,
        gated_graph_transformer_loss,
    )

    # clustered embeddings (vector-DB regime): 16 clusters x 64 points
    rng = np.random.default_rng(0)
    n, d = 1024, 64
    centers = rng.normal(size=(16, 1, d)).astype(np.float32)
    feats = (centers + 0.25 * rng.normal(size=(16, 64, d))
             ).astype(np.float32).reshape(n, d)

    graph = build_knn_graph(jnp.asarray(feats), k=8)
    bdg = build_block_dense(np.asarray(graph.nbr_idx),
                            np.asarray(graph.nbr_mask),
                            np.asarray(graph.edge_weight), block=128)

    cfg = GatedGraphTransformerConfig(dim=d, num_heads=4, num_layers=2,
                                      gate_chunk=4)
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    fpad = bdg.pad_features(jnp.asarray(feats))

    # forward with gate statistics
    out, stats = gated_graph_transformer_apply(
        params, cfg, fpad, bdg, with_stats=True)
    for li, (applied, cost) in enumerate(stats):
        a = np.asarray(applied)
        print(f"layer {li}: {a.sum()}/{a.size} gates fired a cut "
              f"(mean cost {float(np.asarray(cost)[a].mean()) if a.any() else 0:.3f})")

    # one SGD step (gate decisions are stop-gradient; everything else
    # differentiates end-to-end)
    loss, grads = jax.value_and_grad(gated_graph_transformer_loss)(
        params, cfg, fpad, bdg, jnp.zeros_like(fpad))
    params = jax.tree_util.tree_map(lambda w, g: w - 1e-3 * g, params, grads)
    loss2 = gated_graph_transformer_loss(params, cfg, fpad, bdg,
                                         jnp.zeros_like(fpad))
    print(f"train step: loss {float(loss):.3f} -> {float(loss2):.3f}")


if __name__ == "__main__":
    main()
