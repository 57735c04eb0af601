"""North-star scale sweep: fused block-dense layer at 100k -> 1M -> 10M nodes.

BASELINE.json's north star is a 10M-node HNSW-style neighbor graph
(degree 16, 128-d). This sweep runs the fused-kernel layer at all three
sizes on one chip and records edges/s. Writes SCALE_BENCH_r02.json.

Data: clustered embeddings with clusters of exactly 128 points (the
vector-DB regime — real corpora cluster; an isotropic-uniform kNN graph
is an expander and takes the slot path instead, see bench.py). The kNN
graph is exact *within clusters*: at std 0.25 vs O(sqrt(2d)) center
separation, inter-cluster distances dwarf intra-cluster ones, so
within-cluster kNN equals global kNN with overwhelming probability —
and it makes 10M-node graph construction tractable (brute-force global
kNN at 10M is ~2.6e16 FLOPs).

Memory at 10M (v5e 16GB HBM): bf16 IO mode — feats 2.6GB + msg/L 2.6GB
+ wdense bf16 5.1GB + output 2.6GB; the fused kernel runs GRU/LN in f32
in-VMEM, only buffer IO rounds to bf16.

Run: python benchmarks/scale_sweep_r02.py [--sizes 100000 1000000 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLUSTER = 128
DEGREE = 16


def gen_cluster_graph(n, d, k, seed=0, chunk_clusters=512):
    """Clustered features + exact within-cluster kNN in slot format.

    Returns (feats [n, d] f32, idx [n, k] i32, mask [n, k] f32,
    ew [n, k] f32) with clusters contiguous and 128-aligned, so
    block-dense blocks of 256 contain whole clusters (halo = 0).
    Weights follow graph/build.build_knn_graph's 'similarity'
    convention: softplus-clipped negative distance -> 1/(1+dist).
    """
    assert n % CLUSTER == 0

    # threaded native generator (graph_runtime.cpp gen_cluster_knn):
    # same clustered shape + 1/(1+dist) weights, no device round trips —
    # the 10M gen stage drops from 1,420s to ~1 min (VERDICT r3 #4)
    try:
        from ruvector_tpu import native

        if native.available:
            feats, idx, ew = native.gen_cluster_knn(
                n, d, k, CLUSTER, seed=seed)
            return feats, idx, np.ones((n, k), np.float32), ew
    except ImportError:
        pass

    import jax
    import jax.numpy as jnp

    nc = n // CLUSTER
    rng = np.random.default_rng(seed)
    feats = np.empty((n, d), np.float32)
    idx = np.empty((n, k), np.int32)
    ew = np.empty((n, k), np.float32)

    @jax.jit
    def knn_chunk(x):                          # [C, CLUSTER, d]
        d2 = (jnp.sum(x * x, -1)[:, :, None]
              + jnp.sum(x * x, -1)[:, None, :]
              - 2.0 * jnp.einsum("cid,cjd->cij", x, x))
        d2 = d2 + 1e30 * jnp.eye(CLUSTER)[None]          # exclude self
        nd, ni = jax.lax.top_k(-d2, k)
        dist = jnp.sqrt(jnp.maximum(-nd, 0.0))
        return ni.astype(jnp.int32), 1.0 / (1.0 + dist)

    for s in range(0, nc, chunk_clusters):
        c = min(chunk_clusters, nc - s)
        centers = rng.normal(size=(c, 1, d)).astype(np.float32)
        pts = (centers + 0.25 * rng.normal(size=(c, CLUSTER, d))
               ).astype(np.float32)
        ni, w = knn_chunk(jnp.asarray(pts))
        rows = slice(s * CLUSTER, (s + c) * CLUSTER)
        feats[rows] = pts.reshape(-1, d)
        base = (np.arange(s, s + c, dtype=np.int32)[:, None, None] * CLUSTER)
        idx[rows] = (np.asarray(ni) + base).reshape(-1, k)
        ew[rows] = np.asarray(w).reshape(-1, k)
    mask = np.ones((n, k), np.float32)
    return feats, idx, mask, ew


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[100_000 - 100_000 % CLUSTER,
                             1_000_000 - 1_000_000 % CLUSTER,
                             10_000_000 - 10_000_000 % CLUSTER])
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ruvector_tpu.graph import build_block_dense
    from ruvector_tpu.nn.block_dense_layer import (
        ruvector_layer_apply_block_dense_fused,
    )
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig,
        ruvector_layer_init,
    )

    d = args.dim
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4,
                              compute_dtype="bfloat16")
    params = ruvector_layer_init(jax.random.key(0), cfg)
    rows = []
    for n in args.sizes:
        big = n > 2_000_000
        cache = f"/tmp/scale_graph_{n}_{d}_{DEGREE}.npz"
        t0 = time.time()
        if os.path.exists(cache):
            z = np.load(cache)
            feats, idx, mask, ew = (z["feats"], z["idx"],
                                    np.ones((n, DEGREE), np.float32),
                                    z["ew"])
        else:
            feats, idx, mask, ew = gen_cluster_graph(n, d, DEGREE)
            np.savez(cache, feats=feats, idx=idx, ew=ew)
        t_gen = time.time() - t0
        t0 = time.time()
        # bf16 for big sizes: build_block_dense casts on HOST, so wdense
        # crosses the wire and lands in HBM at 2 bytes/entry (5.1GB at
        # 10M) with no f32 staging buffer
        bdg = build_block_dense(
            idx, mask, ew, block=256,
            dtype=jnp.bfloat16 if big else np.float32)
        t_build = time.time() - t0
        if big:
            import ml_dtypes

            feats = feats.astype(ml_dtypes.bfloat16)  # host cast: 2.6GB
        fpad = bdg.pad_features(jnp.asarray(feats))
        del feats, idx, mask, ew

        iters = 3 if big else 20

        if big:
            # separate dispatches with input-buffer donation: at 10M a
            # scan would hold two extra multi-GB buffers; dispatch
            # overhead (~ms) is <1% of the layer time at this size
            import functools

            @functools.partial(jax.jit, donate_argnums=(1,))
            def one(p, f, g):
                return ruvector_layer_apply_block_dense_fused(
                    p, cfg, f, g, tile=256, io_dtype=jnp.bfloat16)

            x = one(params, fpad, bdg)          # compile + warmup
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            for _ in range(iters):
                x = one(params, x, bdg)
            jax.block_until_ready(x)
            dt = (time.perf_counter() - t0) / iters
        else:
            @jax.jit
            def loop(p, f, g):
                def body(x, _):
                    return ruvector_layer_apply_block_dense_fused(
                        p, cfg, x, g, tile=256), None
                out, _ = jax.lax.scan(body, f, None, length=iters)
                return jnp.sum(out)

            float(loop(params, fpad, bdg))
            t0 = time.perf_counter()
            float(loop(params, fpad, bdg))
            dt = (time.perf_counter() - t0) / iters

        edges = float(n * DEGREE)
        rows.append({
            "nodes": n, "edges_per_s": round(edges / dt),
            "layer_ms": round(dt * 1e3, 3),
            "gen_s": round(t_gen, 1), "build_s": round(t_build, 1),
            "blocks": bdg.n_blocks, "table": bdg.table,
            "io": "bf16" if big else "f32",
        })
        print(rows[-1], flush=True)
        del fpad, bdg

    payload = {"dim": d, "degree": DEGREE, "cluster": CLUSTER,
               "backend": jax.devices()[0].platform,
               "path": "fused block-dense kernel (block=256, halo=0)",
               "rows": rows}
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_BENCH_r02.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
