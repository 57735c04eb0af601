"""North-star scale sweep, round 3: END-TO-END wall time at 10M nodes.

Round 2's 10M row ran the kernel at 1.29B edges/s but spent 1,420s
generating + 417s building on the host — the device was 0.007% of wall
time (VERDICT r2 weak#3). Round 3 re-does the host side as threaded
native builders (graph_runtime.cpp: gen_cluster_knn + bdense_*, bf16
emitted directly), so the artifact now reports the full stand-up cost:

  gen_s + build_s + transfer_s + compile_s = end_to_end_s
  (target: a 10M-node graph standing up in ~3 minutes, was ~31)

plus the steady-state fused-layer throughput and its roofline fraction.

Run: python benchmarks/scale_sweep_r03.py [--sizes ...]
Writes SCALE_BENCH_r03.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _timing import device_time  # noqa: E402  (honest tunnel timing)
from scale_sweep_r02 import CLUSTER, gen_cluster_graph  # noqa: E402

DEGREE = 16


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
        t_start = time.time()
        t0 = time.time()
        feats, idx, mask, ew = gen_cluster_graph(n, d, DEGREE)
        t_gen = time.time() - t0
        t0 = time.time()
        bdg_host = build_block_dense(
            idx, mask, ew, block=256,
            dtype=jnp.bfloat16 if big else np.float32)
        t_build = time.time() - t0
        if big:
            import ml_dtypes

            feats = feats.astype(ml_dtypes.bfloat16)
        # build_block_dense already device-put the arrays; transfer time
        # is the block_until_ready of its leaves + the features
        t0 = time.time()
        fpad = bdg_host.pad_features(jnp.asarray(feats))
        jax.block_until_ready(fpad)
        jax.block_until_ready(bdg_host.wdense)
        t_xfer = time.time() - t0
        bdg = bdg_host
        del feats, idx, mask, ew

        io_dt = jnp.bfloat16 if big else None

        # first forward, value-synced (block_until_ready on the tunnel is
        # enqueue-ack only — DESIGN_NOTES round-3 timing finding)
        fwd = jax.jit(lambda p, f, g: jnp.sum(
            ruvector_layer_apply_block_dense_fused(
                p, cfg, f, g, tile=256, io_dtype=io_dt
            ).astype(jnp.float32)))
        t0 = time.time()
        float(fwd(params, fpad, bdg))
        t_compile = time.time() - t0
        end_to_end = time.time() - t_start

        # per-iteration device time: scan-diff with the carry folded into
        # a small params leaf (carrying the [n, d] features doubles the
        # activation buffers and OOMs the 10M row at compile)
        dt = device_time(
            lambda p, f, g: ruvector_layer_apply_block_dense_fused(
                p, cfg, f, g, tile=256, io_dtype=io_dt),
            params, fpad, bdg)

        edges = float(n * DEGREE)
        rows.append({
            "nodes": n, "edges_per_s": round(edges / dt),
            "layer_ms": round(dt * 1e3, 3),
            "gen_s": round(t_gen, 1), "build_s": round(t_build, 1),
            "transfer_s": round(t_xfer, 1),
            "compile_plus_first_fwd_s": round(t_compile, 1),
            "end_to_end_s": round(end_to_end, 1),
            "blocks": bdg.n_blocks, "table": bdg.table,
            "io": "bf16" if big else "f32",
        })
        print(rows[-1], flush=True)
        del fpad, bdg, bdg_host

    payload = {
        "dim": d, "degree": DEGREE, "cluster": CLUSTER,
        "backend": jax.devices()[0].platform,
        "path": "fused block-dense kernel, threaded native host builders",
        "rows": rows,
        "r02_10m_host_s": 1837.8,
        "note": "end_to_end_s = stand up the graph from nothing to the "
                "first forward on device",
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_BENCH_r03.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
