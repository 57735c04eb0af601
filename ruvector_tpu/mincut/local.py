"""Local clustering: Andersen-Chung-Lang PPR sweep cuts.

Reference: ruvector-mincut/src/localkcut — local k-cut around seed
vertices without touching the whole graph. The classical algorithm with
the same contract is ACL local clustering: an approximate personalized-
PageRank vector from the seed (solver/push — already a device-vectorized
sweep) followed by a sweep over nodes ordered by ppr/degree, returning
the prefix with minimum conductance. Work is local in the push phase and
O(support log support) in the sweep.
"""

from __future__ import annotations

import numpy as np

from ruvector_tpu.graph.csr import CSRGraph


def conductance(graph: CSRGraph, members: np.ndarray) -> float:
    """cut(S) / min(vol(S), vol(V-S)) on the undirected weighted graph."""
    n = graph.num_nodes
    side = np.zeros(n, bool)
    side[np.asarray(members)] = True
    rows = np.asarray(graph.row_ids())
    cols = np.asarray(graph.col_idx)
    vals = np.asarray(graph.values)
    cut = vals[side[rows] != side[cols]].sum()
    vol_s = vals[side[rows]].sum()
    vol_rest = vals.sum() - vol_s
    denom = min(vol_s, vol_rest)
    return float(cut / denom) if denom > 0 else 1.0


def local_cluster(graph: CSRGraph, seed: int, alpha: float = 0.15,
                  epsilon: float = 1e-5,
                  max_size: int | None = None) -> tuple[np.ndarray, float]:
    """ACL: PPR from the seed, sweep by ppr/degree, return
    (members, conductance) of the best prefix."""
    from ruvector_tpu.solver import forward_push_ppr

    ppr = forward_push_ppr(graph, seed, alpha=alpha, epsilon=epsilon,
                           max_sweeps=300)
    deg = np.maximum(np.asarray(graph.degrees()), 1.0)
    score = ppr / deg
    support = np.nonzero(ppr > 0)[0]
    order = support[np.argsort(-score[support])]
    if max_size:
        order = order[:max_size]
    if len(order) == 0:
        return np.asarray([seed]), 1.0

    n = graph.num_nodes
    rows = np.asarray(graph.row_ids())
    cols = np.asarray(graph.col_idx)
    vals = np.asarray(graph.values, np.float64)
    total_vol = vals.sum()
    m = len(order)

    # Vectorized sweep (replaces the per-edge Python loop, which was
    # O(E) per call — untenable at toolkit scale): a CSR copy (r, c)
    # is cut at prefix size k iff r is inside and c outside, i.e. for
    # k in [rank_r+1, min(rank_c, m)]. Accumulate those ranges with a
    # difference array; volumes are a cumsum of row sums over `order`.
    rank = np.full(n, n, np.int64)
    rank[order] = np.arange(m)
    rr, rc = rank[rows], rank[cols]
    act = (rr < m) & (rr < rc)
    lo = rr[act] + 1
    hi = np.minimum(rc[act], m)
    w = vals[act]
    delta = np.zeros(m + 2)
    np.add.at(delta, lo, w)
    np.add.at(delta, hi + 1, -w)
    cut_k = np.cumsum(delta)[1:m + 1]

    rowsum = np.zeros(n)
    np.add.at(rowsum, rows, vals)
    vol_k = np.cumsum(rowsum[order])
    denom = np.minimum(vol_k, total_vol - vol_k)
    phi_k = np.where(denom > 0, cut_k / np.maximum(denom, 1e-300), 1.0)
    best_k = int(np.argmin(phi_k)) + 1
    members = order[:best_k].copy()
    # report with the same convention as conductance() (both CSR copies of
    # each undirected edge counted) so callers can compare directly
    return members, conductance(graph, members)
