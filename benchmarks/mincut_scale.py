"""Incremental min-cut maintenance cost curve (VERDICT r1 missing #3).

The reference's ruvector-mincut keeps a dynamic min-cut under edge
updates with subpolynomial structures (linkcut/euler). Our native
maintainer (graph_runtime.cpp incmc_*) keeps the max-flow residual warm:
value-preserving inserts are O(1), crossing updates repair incrementally.

This bench builds two-community graphs (n/2 + n/2, intra-degree ~8, a
few weak bridges carrying the cut) at n = 10k / 100k / 1M, then streams
mixed updates with a cut query after every update, reporting amortized
us/update+query for (a) the incremental maintainer and (b) full
recompute-per-query (the r1 strategy), plus the native solver's repair
counters. Writes MINCUT_SCALE_r02.json.

Run: python benchmarks/mincut_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ruvector_tpu.native import IncrementalMinCut, available


def build_graph(n, seed=0, intra_deg=8, bridges=6):
    """Edge list for a two-community digraph; cut = the bridge edges."""
    rng = np.random.default_rng(seed)
    half = n // 2
    edges = []
    for lo, hi in ((0, half), (half, n)):
        src = rng.integers(lo, hi, size=(hi - lo) * intra_deg // 2)
        dst = rng.integers(lo, hi, size=src.size)
        keep = src != dst
        w = rng.uniform(0.5, 1.5, size=src.size).astype(np.float32)
        edges.append(np.stack([src[keep], dst[keep],
                               w[keep].astype(np.float64)], 1))
    # weak bridges (the min cut): A -> B
    bu = rng.integers(0, half, bridges)
    bv = rng.integers(half, n, bridges)
    bw = rng.uniform(0.01, 0.05, bridges)
    edges.append(np.stack([bu, bv, bw], 1))
    return np.concatenate(edges)


def load_solver(n, edges):
    mc = IncrementalMinCut(n, 0, n - 1)
    for u, v, w in edges:
        mc.insert_edge(int(u), int(v), float(w))
    return mc


def main():
    assert available, "native runtime required"
    sizes = [10_000, 100_000, 1_000_000]
    updates = 2_000
    rows = []
    for n in sizes:
        edges = build_graph(n)
        t0 = time.perf_counter()
        mc = load_solver(n, edges)
        v0 = mc.cut_value()
        t_initial = time.perf_counter() - t0

        # full-recompute baseline: cold solve time (per query)
        t0 = time.perf_counter()
        mc_cold = load_solver(n, edges)
        mc_cold.cut_value()
        t_recompute = time.perf_counter() - t0
        mc_cold.close()

        rng = np.random.default_rng(1)
        half = n // 2
        t0 = time.perf_counter()
        for i in range(updates):
            op = rng.random()
            if op < 0.8:       # intra-community insert (common case)
                lo = 0 if rng.random() < 0.5 else half
                u = int(rng.integers(lo, lo + half))
                v = int(rng.integers(lo, lo + half))
                if u != v:
                    mc.insert_edge(u, v, float(rng.uniform(0.5, 1.5)))
            elif op < 0.9:     # bridge reweight (crossing: repair path)
                mc.reweight_edge(int(rng.integers(0, half)),
                                 int(rng.integers(half, n)),
                                 float(rng.uniform(0.01, 0.05)))
            else:              # delete a random intra edge
                lo = 0 if rng.random() < 0.5 else half
                mc.delete_edge(int(rng.integers(lo, lo + half)),
                               int(rng.integers(lo, lo + half)))
            mc.cut_value()     # query EVERY update
        t_stream = time.perf_counter() - t0
        stats = mc.stats()
        rows.append({
            "nodes": n, "edges": int(len(edges)),
            "initial_cut": round(v0, 4),
            "initial_solve_s": round(t_initial, 3),
            "full_recompute_per_query_s": round(t_recompute, 3),
            "incremental_us_per_update_query": round(
                t_stream / updates * 1e6, 1),
            "speedup_vs_recompute": round(
                t_recompute / (t_stream / updates), 1),
            "solver_stats": stats,
        })
        print(rows[-1], flush=True)
        mc.close()

    payload = {"updates_per_size": updates,
               "query_after_every_update": True,
               "rows": rows}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MINCUT_SCALE_r02.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
