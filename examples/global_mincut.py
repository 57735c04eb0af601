"""Global dynamic min-cut: maintain "how separable is my graph?" live.

The global minimum cut is the graph's weakest separation — for a vector
DB's neighbor graph it tracks community fragility: a falling cut value
means some region is about to disconnect (stale embeddings, deleted
content), a rising one means the graph is consolidating.

This example maintains the GLOBAL cut of an evolving kNN-style graph,
fires a monitoring callback when the cut weakens past a threshold, and
verifies a cut certificate (the auditable witness the reference's
monitoring + certificate subsystems emit).

Run: PYTHONPATH=. python examples/global_mincut.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ruvector_tpu.mincut import DynamicMinCut, local_k_cut
from ruvector_tpu.graph.csr import CSRGraph


def main():
    rng = np.random.default_rng(0)
    n_clusters, size = 12, 30
    n = n_clusters * size
    mc = DynamicMinCut(n, source=None)          # GLOBAL mode

    # chain of clusters: strong interiors, healthy 3.0 bridges — the
    # global min cut IS the weakest bridge
    for c in range(n_clusters):
        base = c * size
        for i in range(1, size):
            mc.insert_edge(base + i - 1, base + i,
                           float(rng.uniform(1.0, 1.5)))
        for _ in range(3 * size):
            a, b = rng.integers(0, size, 2)
            if a != b:
                mc.insert_edge(base + int(a), base + int(b),
                               float(rng.uniform(1.0, 2.0)))
        if c:
            mc.insert_edge(base - size, base, 3.0)

    print(f"initial global min cut: {mc.cut_value():.3f}  (a 3.0 bridge)")

    alerts = []
    mc.watch_threshold(1.0, "below",
                       lambda name, v: alerts.append(v))

    # embeddings drift: one bridge weakens update by update
    weak = (4 * size - size, 4 * size)        # bridge cluster 3 -> 4
    for w in (2.0, 1.4, 0.7, 0.3):
        mc.reweight_edge(weak[0], weak[1], w)
        v = mc.cut_value()
        fired = len(alerts) > 0
        print(f"bridge -> {w:.1f}: global cut {v:.3f}"
              + ("   << ALERT (below 1.0)" if fired else ""))
    assert alerts, "monitoring should have fired below 1.0"

    side = mc.partition()
    print(f"cut separates {int(side.sum())} nodes from "
          f"{int((~side).sum())}; crossing edges: {mc.cut_edges()[:4]}")

    cert = mc.certificate()
    print(f"certificate: value={cert['value']}, hash={cert['hash'][:16]}..., "
          f"verifies={mc.verify_certificate(cert)}")

    # local k-cut: find a weak cut around a seed WITHOUT touching the
    # whole graph (ruvector-mincut/src/localkcut role)
    rows, cols, vals = [], [], []
    for (u, v), w in mc.weights.items():
        rows += [u, v]
        cols += [v, u]
        vals += [w, w]
    g = CSRGraph.from_edges(np.asarray(rows), np.asarray(cols),
                            np.asarray(vals, np.float32), n)
    seed = 3 * size + 10                  # inside the weakly-bridged cluster
    res = local_k_cut(g, seed=seed, k=5.0, max_radius=4, max_volume=200)
    assert res is not None
    print(f"local k-cut around node {seed}: value {res.value:.3f}, "
          f"{len(res.members)} members, explored {res.explored}/{n} nodes")


if __name__ == "__main__":
    main()
