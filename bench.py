"""Benchmark: GNN layer-forward throughput in edges/s on one chip.

Measures the flagship RuvectorLayer batched forward (message transform +
neighbor MHA + weighted aggregate + GRU + LayerNorm) over a 100k-node,
degree-16 kNN graph at 128-d — the shape of BASELINE.json config 1/2.

Timing: one 100-iteration scan-loop with value-fetch sync — the dev
tunnel's fixed dispatch/fetch overhead amortizes to <3% and a single
program keeps remote compile time bounded (see DESIGN_NOTES tunnel
caveats). The blocked-execution variant (gather cache blocking, ~1.5-1.8x
at >=1M nodes) is benchmarked in benchmarks/suite.py and
benchmarks/scale_sweep.py; its compile is too slow for this quick bench
on the dev tunnel.

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

    # persistent compile cache across invocations (remote compiles are the
    # slow part on the dev tunnel)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from ruvector_tpu.graph import NeighborGraph, build_knn_graph
    from ruvector_tpu.models import (
        RuvectorNetConfig,
        ruvector_net_apply,
        ruvector_net_init,
    )

    n, d, h, k, layers = 100_000, 128, 128, 16, 1
    rng = np.random.default_rng(0)
    feats_np = rng.normal(size=(n, d)).astype(np.float32)
    feats = jnp.asarray(feats_np)

    # cache the kNN graph across bench invocations (construction is itself
    # benchmarked separately; here it's just input data)
    import os
    cache = f"/tmp/ruvector_bench_graph_{n}_{d}_{k}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        graph = NeighborGraph(jnp.asarray(z["idx"]), jnp.asarray(z["mask"]),
                              jnp.asarray(z["w"]))
    else:
        graph = build_knn_graph(feats, k=k, block=2048)
        jax.block_until_ready(graph.nbr_idx)
        np.savez(cache, idx=np.asarray(graph.nbr_idx),
                 mask=np.asarray(graph.nbr_mask),
                 w=np.asarray(graph.edge_weight))

    cfg = RuvectorNetConfig(input_dim=d, hidden_dim=h, num_layers=layers,
                            heads=4)
    params = ruvector_net_init(jax.random.key(0), cfg)

    iters = 100

    @jax.jit
    def loop(p, f):
        def body(x, _):
            return ruvector_net_apply(p, cfg, x, graph), None
        out, _ = jax.lax.scan(body, f, None, length=iters)
        return jnp.sum(out)

    float(loop(params, feats))            # compile + warmup (value sync)
    t0 = time.perf_counter()
    float(loop(params, feats))
    dt = (time.perf_counter() - t0) / iters

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
