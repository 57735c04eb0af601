"""At-scale artifact for the GLOBAL dynamic min-cut maintainer.

Three measurements (native gmc_* solver):

1. realistic drift stream at n=2k, query EVERY step, vs one exact
   Stoer-Wagner per query: embedding-graph updates are dominated by
   intra-cluster reweights/inserts/deletes (edge weights drift as
   embeddings move); those hit the maintainer's O(pool) and one-Dinic
   paths.

2. adversarial stream at n=1k: random cross-cluster inserts cross the
   primary cut ~half the time, and an insert that crosses the current
   minimum with no pool certificate forces an exact recompute — this is
   the case the reference's subpolynomial machinery targets, and the
   honest worst case for this design. Reported, not hidden.

3. large scale (n=20k, ~60k edges): growth via the O(pool) attach
   rule, then a 100k-update drift stream with queries every 100
   updates. Decrease repairs early-exit their Dinic at the current
   optimum. The one-time exact solve when the graph first becomes
   connected (first_query_s) is the size limiter: it is Stoer-Wagner,
   O(V*E log V) — the reference's 46k-LoC subpolynomial structures
   exist precisely to beat this one cost; this design instead amortizes
   it away (it happens once; every subsequent update is O(pool) or one
   early-exit Dinic) and stays exact.

Writes GLOBAL_MINCUT_SCALE_r03.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ruvector_tpu.native import GlobalIncrementalMinCut, available

assert available, "native runtime required for the scale artifact"


def build_clustered(inc, rng, n_cl, cluster, p_chord=0.3,
                    bridge_lo=0.05, bridge_hi=0.3):
    live = {}

    def ins(u, v, w):
        inc.insert_edge(u, v, w)
        live[(min(u, v), max(u, v))] = w

    for c in range(n_cl):
        base = c * cluster
        for i in range(1, cluster):
            ins(base + i - 1, base + i, float(rng.uniform(0.8, 1.2)))
        for _ in range(int(cluster * p_chord)):
            a, b = rng.integers(0, cluster, 2)
            if a != b:
                ins(base + int(a), base + int(b),
                    float(rng.uniform(0.5, 1.5)))
        if c:
            ins(base - cluster, base, float(rng.uniform(bridge_lo, bridge_hi)))
    return live


def drift_stream(inc, live, rng, n_cl, cluster, steps, query_every=1):
    """Intra-cluster reweights/inserts/deletes — the embedding-drift mix."""
    t0 = time.perf_counter()
    val = 0.0
    for step in range(steps):
        op = rng.random()
        c = int(rng.integers(0, n_cl))
        base = c * cluster
        a, b = rng.integers(0, cluster, 2)
        u, v = base + int(a), base + int(b)
        if u == v:
            continue
        if op < 0.6:
            inc.reweight_edge(u, v, float(rng.uniform(0.5, 1.5)))
        elif op < 0.85:
            inc.insert_edge(u, v, float(rng.uniform(0.2, 0.8)))
        else:
            inc.delete_edge(u, v)
        if step % query_every == 0:
            val = inc.cut_value()
    return time.perf_counter() - t0, val


def realistic_vs_recompute(n_cl=100, cluster=20, steps=2000, seed=0):
    n = n_cl * cluster
    rng = np.random.default_rng(seed)
    inc = GlobalIncrementalMinCut(n)
    live = build_clustered(inc, rng, n_cl, cluster)
    inc.cut_value()
    t_inc, val = drift_stream(inc, live, rng, n_cl, cluster, steps,
                              query_every=1)

    # one exact from-scratch solve at this size = the per-query cost of
    # the recompute baseline
    fresh = GlobalIncrementalMinCut(n)
    for (u, v), w in live.items():
        fresh.insert_edge(u, v, w)
    t0 = time.perf_counter()
    fresh.cut_value()
    t_sw = time.perf_counter() - t0
    return {
        "n": n, "edges": len(live), "steps": steps,
        "query_every": 1,
        "incremental_total_s": round(t_inc, 3),
        "updates_per_s": round(steps / t_inc),
        "one_recompute_s": round(t_sw, 3),
        "recompute_per_query_est_s": round(t_sw * steps, 1),
        "speedup_vs_recompute_per_query": round(t_sw * steps / t_inc, 1),
        "final_cut": round(val, 4),
        "stats": inc.stats(),
    }


def adversarial_small(n_cl=50, cluster=20, steps=400, seed=2):
    """Random cross-cluster inserts: ~half cross the primary -> exact
    recompute unless a pool certificate fires. Honest worst case."""
    n = n_cl * cluster
    rng = np.random.default_rng(seed)
    inc = GlobalIncrementalMinCut(n)
    build_clustered(inc, rng, n_cl, cluster)
    inc.cut_value()
    t0 = time.perf_counter()
    for step in range(steps):
        u, v = rng.integers(0, n, 2)
        if u != v:
            inc.insert_edge(int(u), int(v), float(rng.uniform(0.05, 0.5)))
        inc.cut_value()
    t = time.perf_counter() - t0
    return {
        "n": n, "steps": steps,
        "total_s": round(t, 2),
        "updates_per_s": round(steps / t),
        "stats": inc.stats(),
        "note": "cross-cluster inserts crossing the minimum cut force "
                "exact recomputes — the subpolynomial-structure case; "
                "reported as the design's worst case",
    }


def large_scale(n=20_000, cluster=50, stream=100_000, seed=1):
    rng = np.random.default_rng(seed)
    n_cl = n // cluster
    inc = GlobalIncrementalMinCut(n)
    t0 = time.perf_counter()
    live = build_clustered(inc, rng, n_cl, cluster, p_chord=1.0)
    t_grow = time.perf_counter() - t0
    t0 = time.perf_counter()
    v0 = inc.cut_value()
    t_first_q = time.perf_counter() - t0
    t_stream, vf = drift_stream(inc, live, rng, n_cl, cluster, stream,
                                query_every=100)
    return {
        "n": n, "grow_edges": len(live),
        "grow_s": round(t_grow, 2),
        "grow_inserts_per_s": round(len(live) / t_grow),
        "first_query_s": round(t_first_q, 3),
        "cut_after_growth": round(v0, 4),
        "stream_updates": stream,
        "stream_s": round(t_stream, 2),
        "stream_updates_per_s": round(stream / t_stream),
        "final_cut": round(vf, 4),
        "stats": inc.stats(),
    }


def main():
    out = {"config": "global dynamic min-cut at scale (native gmc_*)"}
    out["realistic_vs_recompute"] = realistic_vs_recompute()
    print("realistic done", json.dumps(out["realistic_vs_recompute"]))
    out["adversarial_small"] = adversarial_small()
    print("adversarial done", json.dumps(out["adversarial_small"]))
    out["large_scale"] = large_scale()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GLOBAL_MINCUT_SCALE_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
