"""BASELINE config 5: mincut-gated graph transformer on a 1M-node
partitioned graph, end-to-end on one chip.

Model: graph_transformer/gated.py — per-partition mincut-gated MHA
(device push-relabel gate, chunk-vmapped), cross-partition neighbor
mixing over the BlockDenseGraph edges, pre-norm FFN. Partition = block
(256 nodes = two 128-point clusters), D=128, H=4, L=2.

Measures: forward latency (scan-difference protocol), one training step
(value_and_grad + SGD), gate statistics (fraction of (partition, head)
gates whose cut fired, mean cut cost). Writes CONFIG5_BENCH_r02.json.

Run: python benchmarks/config5_gated_graph_transformer.py [--nodes N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scale_sweep_r02 import gen_cluster_graph  # noqa: E402  (same dir)

BLOCK = 256
DEGREE = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=999_936)  # 3906 blocks
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ruvector_tpu.graph import build_block_dense
    from ruvector_tpu.graph_transformer.gated import (
        GatedGraphTransformerConfig,
        gated_graph_transformer_apply,
        gated_graph_transformer_init,
        gated_graph_transformer_loss,
    )

    n, d = args.nodes - args.nodes % BLOCK, args.dim
    t0 = time.time()
    feats, idx, mask, ew = gen_cluster_graph(n, d, DEGREE)
    t_gen = time.time() - t0
    t0 = time.time()
    bdg = build_block_dense(idx, mask, ew, block=BLOCK, dtype=np.float32)
    t_build = time.time() - t0
    del idx, mask, ew

    cfg = GatedGraphTransformerConfig(
        dim=d, num_heads=4, num_layers=args.layers, gate_chunk=128)
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    fpad = bdg.pad_features(jnp.asarray(feats))
    del feats

    # --- forward + gate stats (once). bdg is a jit ARGUMENT, not a
    # closure: closed-over device arrays become baked-in constants in
    # the serialized program (1GB+ at 1M nodes -> remote-compile 413)
    fwd_stats = jax.jit(
        lambda p, f, g: gated_graph_transformer_apply(
            p, cfg, f, g, with_stats=True))
    t0 = time.time()
    out, stats = fwd_stats(params, fpad, bdg)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    applied = np.concatenate([np.asarray(s[0]).reshape(-1) for s in stats])
    costs = np.concatenate([np.asarray(s[1]).reshape(-1) for s in stats])
    gate_frac = float(applied.mean())
    mean_cost = float(costs[applied].mean()) if applied.any() else 0.0

    # --- forward latency: separate dispatches. The forward at 1M runs
    # for seconds (31 gate chunks of device push-relabel), so dispatch
    # overhead is <0.1%; a multi-iteration scan at this size trips the
    # TPU watchdog ("worker crashed") on the dev tunnel.
    fwd = jax.jit(lambda p, f, g: gated_graph_transformer_apply(
        p, cfg, f, g))
    x = fwd(params, fpad, bdg)
    jax.block_until_ready(x)              # compile + warm
    k = args.iters
    t0 = time.perf_counter()
    for _ in range(k):
        x = fwd(params, x, bdg)
    jax.block_until_ready(x)
    fwd_s = (time.perf_counter() - t0) / k

    # --- one training step. Measured on a 100k-node slice: the
    # BACKWARD program of the full 1M gated model (31 chunk maps of
    # push-relabel while_loops + saved attention residuals) crashes the
    # remote TPU compiler helper; 100k (13 chunks) compiles fine and the
    # cost model is linear in partitions. (tgt built inside jit: a
    # closed-over zeros array would be serialized as a constant.)
    n_t = min(n, 99_840)
    feats_t, idx_t, mask_t, ew_t = gen_cluster_graph(n_t, d, DEGREE, seed=1)
    bdg_t = build_block_dense(idx_t, mask_t, ew_t, block=BLOCK,
                              dtype=np.float32)
    fpad_t = bdg_t.pad_features(jnp.asarray(feats_t))

    @jax.jit
    def train_step(p, f, g):
        loss, gr = jax.value_and_grad(gated_graph_transformer_loss)(
            p, cfg, f, g, jnp.zeros_like(f))
        return jax.tree_util.tree_map(
            lambda w, gw: w - 1e-3 * gw, p, gr), loss

    p2, loss = train_step(params, fpad_t, bdg_t)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    p2, loss = train_step(params, fpad_t, bdg_t)
    jax.block_until_ready(loss)
    step_s = time.perf_counter() - t0

    edges = float(n * DEGREE * args.layers)
    payload = {
        "config": "mincut-gated graph transformer, 1M-node partitioned "
                  "graph (BASELINE config 5)",
        "backend": jax.devices()[0].platform,
        "nodes": n, "dim": d, "layers": args.layers, "heads": 4,
        "partition": BLOCK, "partitions": bdg.n_blocks,
        "gen_s": round(t_gen, 1), "build_s": round(t_build, 1),
        "compile_s": round(t_compile, 1),
        "forward_ms": round(fwd_s * 1e3, 2),
        "train_step_nodes": n_t,
        "train_step_ms": round(step_s * 1e3, 2),
        "gnn_edges_per_s": round(edges / fwd_s),
        "gates_evaluated": int(applied.size),
        "gate_cut_fraction": round(gate_frac, 4),
        "mean_cut_cost": round(mean_cost, 3),
        "loss": float(loss),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CONFIG5_BENCH_r02.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
