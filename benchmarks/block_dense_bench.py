"""Benchmark the block-dense (gather-free) layer vs the slot path on TPU.

Dataset: clustered synthetic embeddings (1000 centers x 100 points,
cluster std 0.25 at 128-d) — the realistic vector-DB distribution whose
kNN graph has community structure. Uniform isotropic Gaussians (r1's
bench data) produce an expander kNN graph where NO ordering yields small
halos (see parallel/ordering.py); halo_fraction for both is printed so
the adaptive layout threshold is grounded.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clustered_features(n, d, n_centers=1000, std=0.25, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    asg = rng.integers(0, n_centers, size=n)
    return (centers[asg] + std * rng.normal(size=(n, d))).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ruvector_tpu.graph import NeighborGraph, build_block_dense, build_knn_graph
    from ruvector_tpu.nn.block_dense_layer import ruvector_layer_apply_block_dense
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig,
        ruvector_layer_apply,
        ruvector_layer_init,
    )
    from ruvector_tpu.parallel.ordering import graph_grow_blocks

    n, d, m = 100_000, 128, 16
    feats_np = clustered_features(n, d)

    cache = f"/tmp/ruvector_bench_clustered_{n}_{d}_{m}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        idx, mask, ew = z["idx"], z["mask"], z["w"]
    else:
        g = build_knn_graph(jnp.asarray(feats_np), k=m, block=2048)
        idx, mask, ew = (np.asarray(g.nbr_idx), np.asarray(g.nbr_mask),
                         np.asarray(g.edge_weight))
        np.savez(cache, idx=idx, mask=mask, w=ew)


    cfg32 = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    cfg16 = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4,
                                compute_dtype="bfloat16")
    params = ruvector_layer_init(jax.random.key(0), cfg32)
    iters = 50
    edges = float(mask.sum())

    def timed(make_body, fpad, graph_arg):
        # graph passed as a jit ARG: the dev tunnel's remote-compile body
        # rejects large captured constants (HTTP 413 at ~200MB wdense)
        @jax.jit
        def loop(p, f, g):
            def step(x, _):
                return make_body(p, x, g), None
            out, _ = jax.lax.scan(step, f, None, length=iters)
            return jnp.sum(out)
        float(loop(params, fpad, graph_arg))
        t0 = time.perf_counter()
        float(loop(params, fpad, graph_arg))
        return (time.perf_counter() - t0) / iters

    results = {}
    for block in (512, 1024, 2048):
        t_build = time.time()
        perm, leaves = graph_grow_blocks(idx, mask, leaf_size=block)
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        idx_r = inv[idx[perm]].astype(np.int32)
        mask_r = mask[perm]
        ew_r = ew[perm]
        feats_r = feats_np[perm]
        bdg = build_block_dense(idx_r, mask_r, ew_r, leaf_sizes=leaves,
                                dtype=np.float32)
        fpad_j = bdg.pad_features(jnp.asarray(feats_r))
        print(f"block={block}: T={bdg.table} (halo={bdg.table - block}), "
              f"nB={bdg.n_blocks}, build={time.time()-t_build:.1f}s, "
              f"wdense={bdg.wdense.size*4/1e6:.0f}MB", flush=True)

        for name, cfg in (("f32", cfg32), ("bf16", cfg16)):
            dt = timed(lambda p, x, g, cfg=cfg:
                       ruvector_layer_apply_block_dense(p, cfg, x, g),
                       fpad_j, bdg)
            eps = edges / dt
            results[f"bd_b{block}_{name}"] = {
                "ms": round(dt * 1e3, 3), "edges_per_s": round(eps, 0),
                "table": bdg.table}
            print(f"  {name}: {dt*1e3:.3f} ms  {eps/1e6:.1f}M edges/s",
                  flush=True)

    graph_r = NeighborGraph(jnp.asarray(idx), jnp.asarray(mask),
                            jnp.asarray(ew))
    dt = timed(lambda p, x, g: ruvector_layer_apply(p, cfg32, x, g),
               jnp.asarray(feats_np), graph_r)
    results["slot_f32"] = {"ms": round(dt * 1e3, 3),
                           "edges_per_s": round(edges / dt, 0)}
    print(f"slot f32: {dt*1e3:.3f} ms  {edges/dt/1e6:.1f}M edges/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
