"""Expander decomposition: partition into high-conductance clusters.

Reference: ruvector-mincut/src/expander — expander decomposition
underpinning the subpolynomial update structures. Practical variant here:
repeated ACL local clustering (mincut/local.py) from uncovered seeds —
peel off any cluster whose conductance beats phi_target; nodes that no
low-conductance cut separates remain as expander-ish singleton/residual
clusters. Inter-cluster edges are the sparse "boundary" the j-tree
hierarchy would route through; they are exactly what halo planning wants
minimized (parallel/partition.py uses the same objective).
"""

from __future__ import annotations

import numpy as np

from ruvector_tpu.graph.csr import CSRGraph
from ruvector_tpu.mincut.local import conductance, local_cluster


def expander_decompose(graph: CSRGraph, phi_target: float = 0.1,
                       max_clusters: int = 64,
                       seed_order: np.ndarray | None = None):
    """Returns (labels [n], clusters list, boundary_edge_count).

    Greedy peeling: take the lowest-id uncovered node as seed, carve its
    best local cluster; accept if conductance <= phi_target else make the
    seed a singleton. Repeats until covered.
    """
    n = graph.num_nodes
    labels = np.full(n, -1, np.int64)
    clusters: list[np.ndarray] = []
    order = (np.asarray(seed_order) if seed_order is not None
             else np.arange(n))

    for s in order:
        if labels[s] >= 0 or len(clusters) >= max_clusters:
            continue
        members, phi = local_cluster(graph, int(s))
        members = members[labels[members] < 0]      # only uncovered nodes
        if len(members) == 0 or phi > phi_target:
            members = np.asarray([s])
        cid = len(clusters)
        labels[members] = cid
        clusters.append(members)
    # stragglers (max_clusters hit): one residual cluster
    rest = np.nonzero(labels < 0)[0]
    if len(rest):
        labels[rest] = len(clusters)
        clusters.append(rest)

    rows = np.asarray(graph.row_ids())
    cols = np.asarray(graph.col_idx)
    boundary = int((labels[rows] != labels[cols]).sum()) // 2
    return labels, clusters, boundary
