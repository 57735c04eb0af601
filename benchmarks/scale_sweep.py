"""Single-chip scale sweep: flat vs blocked layer across graph sizes.

Documents the gather-table-size effect (DESIGN_NOTES "gather cache
blocking") as a reproducible artifact: for each N, measures the flat
RuvectorNet layer and the blocked (halo-plan scan) execution with
difference timing + value sync. Writes SCALE_BENCH.json.

Run: python benchmarks/scale_sweep.py [--sizes 100000 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[100_000, 1_000_000])
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ruvector_tpu.graph.neighbors import NeighborGraph
    from ruvector_tpu.models import (
        RuvectorNetConfig, ruvector_net_apply, ruvector_net_init,
    )
    from ruvector_tpu.parallel import (
        build_halo_plan, make_blocked_layer_forward,
    )
    from ruvector_tpu.parallel.partition import pad_features_for_plan

    d, m = args.dim, args.degree
    rng = np.random.default_rng(0)
    cfg = RuvectorNetConfig(input_dim=d, hidden_dim=d, num_layers=1, heads=4)
    params = ruvector_net_init(jax.random.key(0), cfg)

    def diff_time(make_fn, *fargs, short=2, long_=12):
        f_s, f_l = make_fn(short), make_fn(long_)
        float(f_s(*fargs)); float(f_l(*fargs))
        t0 = time.perf_counter(); float(f_s(*fargs))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f_l(*fargs))
        tl = time.perf_counter() - t0
        return max(tl - ts, 1e-9) / (long_ - short)

    rows = []
    for n in args.sizes:
        feats_np = rng.normal(size=(n, d)).astype(np.float32)
        base = np.arange(n)[:, None]
        off = rng.integers(-512, 512, size=(n, m))
        idx = ((base + off) % n).astype(np.int32)
        graph = NeighborGraph(nbr_idx=jnp.asarray(idx),
                              nbr_mask=jnp.ones((n, m)),
                              edge_weight=jnp.ones((n, m)))
        feats = jnp.asarray(feats_np)

        def make_flat(iters):
            @jax.jit
            def loop(p, f):
                def body(x, _):
                    return ruvector_net_apply(p, cfg, x, graph), None
                out, _ = jax.lax.scan(body, f, None, length=iters)
                return jnp.sum(out)
            return loop

        dt_flat = diff_time(make_flat, params, feats)

        # block-size heuristic: ~12.5k rows is the gather sweet spot, but
        # past ~20 blocks the scan overhead dominates — cap block count
        blocks = min(max(n // 12_500, 1), 10)
        plan, perm = build_halo_plan(graph, blocks)
        fwd = make_blocked_layer_forward(cfg, plan)
        fp = jnp.asarray(pad_features_for_plan(feats_np, plan, perm))

        def make_blk(iters):
            @jax.jit
            def loop(p, f):
                def body(x, _):
                    return fwd(p, x), None
                out, _ = jax.lax.scan(body, f, None, length=iters)
                return jnp.sum(out)
            return loop

        dt_blk = diff_time(make_blk, params, fp)
        row = {
            "nodes": n,
            "flat_edges_per_s": round(n * m / dt_flat, 0),
            "blocked_edges_per_s": round(n * m / dt_blk, 0),
            "blocks": blocks,
            "halo_rows": int(plan.halo),
            "speedup": round(dt_flat / dt_blk, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        del feats, graph, fp

    payload = {"dim": d, "degree": m,
               "backend": jax.devices()[0].platform, "rows": rows}
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_BENCH.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
