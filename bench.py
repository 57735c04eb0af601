"""Benchmark: GNN layer-forward throughput in edges/s on one chip.

Measures the flagship RuvectorLayer batched forward (message transform +
neighbor MHA + weighted aggregate + GRU + LayerNorm) over a 100k-node,
degree-16 kNN graph at 128-d — the shape of BASELINE.json config 1/2.

Execution uses BLOCKED gathers (make_blocked_layer_forward): TPU gather
throughput falls with source-table size, so the layer runs as a scan over
~12.5k-node blocks whose bulk gathers hit a small local table, with halo
rows pulled from the global table via the same HaloPlan that drives the
multi-chip path (docs/DESIGN_NOTES.md "gather cache blocking"). Measured
~1.3x over the flat layer at this shape, more at larger N.

Timing: difference of two scan-loop lengths with value-fetch sync —
cancels the dev-tunnel's fixed dispatch/fetch overhead and its async
quirks (see DESIGN_NOTES tunnel caveats).

Baseline: the reference's GNN re-rank claim (README.md:330-343) — 50
candidates x 32 neighbors re-ranked in 0.4 ms on M4 Pro = 4.0M edges/s.
vs_baseline = our edges/s / 4.0e6 (higher is better).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ruvector_tpu.graph import build_knn_graph
    from ruvector_tpu.models import (
        RuvectorNetConfig,
        ruvector_net_init,
    )
    from ruvector_tpu.parallel import build_halo_plan, make_blocked_layer_forward
    from ruvector_tpu.parallel.partition import pad_features_for_plan

    n, d, h, k, layers = 100_000, 128, 128, 16, 1
    n_blocks = 8
    rng = np.random.default_rng(0)
    feats_np = rng.normal(size=(n, d)).astype(np.float32)
    feats = jnp.asarray(feats_np)

    # cache the kNN graph across bench invocations (construction is itself
    # benchmarked separately; here it's just input data)
    import os
    cache = f"/tmp/ruvector_bench_graph_{n}_{d}_{k}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        from ruvector_tpu.graph import NeighborGraph
        graph = NeighborGraph(jnp.asarray(z["idx"]), jnp.asarray(z["mask"]),
                              jnp.asarray(z["w"]))
    else:
        graph = build_knn_graph(feats, k=k, block=2048)
        jax.block_until_ready(graph.nbr_idx)
        np.savez(cache, idx=np.asarray(graph.nbr_idx),
                 mask=np.asarray(graph.nbr_mask),
                 w=np.asarray(graph.edge_weight))

    cfg = RuvectorNetConfig(input_dim=d, hidden_dim=h, num_layers=layers, heads=4)
    params = ruvector_net_init(jax.random.key(0), cfg)

    plan, perm = build_halo_plan(graph, n_blocks, reorder="cluster")
    fwd = make_blocked_layer_forward(cfg, plan)
    feats_pad = jnp.asarray(pad_features_for_plan(feats_np, plan, perm))

    def make_loop(iters):
        @jax.jit
        def loop(p, f):
            def body(x, _):
                return fwd(p, x), None
            out, _ = jax.lax.scan(body, f, None, length=iters)
            return jnp.sum(out)
        return loop

    short_n, long_n = 2, 22
    f_short, f_long = make_loop(short_n), make_loop(long_n)
    float(f_short(params, feats_pad))       # compile + warmup (value sync)
    float(f_long(params, feats_pad))
    t0 = time.perf_counter()
    float(f_short(params, feats_pad))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f_long(params, feats_pad))
    t_long = time.perf_counter() - t0
    dt = max(t_long - t_short, 1e-9) / (long_n - short_n)

    edges = n * k * layers
    edges_per_s = edges / dt
    baseline = 4.0e6  # reference GNN re-rank: 1600 edges / 0.4 ms (README:330-343)
    print(json.dumps({
        "metric": "gnn_layer_forward_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
