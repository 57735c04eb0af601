"""Locality orderings for block execution.

`cluster_reorder` (partition.py) optimizes the COARSE cut for S=8-ish
shards; block-dense execution (graph/block_dense.py) needs locality at
~1k-node granularity, where label-prop communities are far larger than a
block. `recursive_bisection_order` produces that: balanced recursive
median splits along the current principal direction of the features
(power iteration), so each block is a compact region of embedding space
and a kNN graph's neighbors mostly fall inside their own block.

This is the EdgeCutMinimizer role (ruvector-graph/src/distributed/
shard.rs:209-433) specialized to vector workloads: the reference
minimizes edge cut greedily on the graph; with features available the
geometric split is near-optimal for kNN graphs and runs in
O(N·D·log(N/block)).

Caveat measured on uniform random 128-d Gaussians: high-dimensional
isotropic data has NO community structure (the kNN graph is an
expander), so halos stay ~B regardless of ordering — block-dense only
pays off on clusterable (i.e. real) embedding distributions. Use
`halo_fraction` to decide the layout adaptively.
"""

from __future__ import annotations

import numpy as np


def _top_direction(x: np.ndarray, iters: int = 8, seed: int = 0) -> np.ndarray:
    """Leading principal direction by power iteration on the covariance."""
    rng = np.random.default_rng(seed)
    d = x.shape[1]
    v = rng.normal(size=d).astype(np.float64)
    v /= np.linalg.norm(v) + 1e-30
    xc = x - x.mean(0, keepdims=True)
    for _ in range(iters):
        v = xc.T @ (xc @ v)
        v /= np.linalg.norm(v) + 1e-30
    return v


def recursive_bisection_order(
    features: np.ndarray, leaf_size: int = 1024, seed: int = 0,
    balance: float = 0.3,
) -> tuple[np.ndarray, list[int]]:
    """Return (perm, leaf_sizes): perm (new position -> old id) orders
    nodes by recursive splits of the feature space; leaf_sizes are the
    consecutive leaf lengths (<= leaf_size each), which the block-dense
    builder maps one-to-one onto padded blocks.

    Each split cuts at the LARGEST PROJECTION GAP inside the middle
    [balance, 1-balance] quantile window rather than the exact median:
    a tight cluster almost never has its widest gap inside itself, so
    clusters stay whole (an exact-median split slices every cluster that
    straddles it — measured 2.7 blocks touched per cluster vs ~1 with
    gap splits on a 100-cluster mixture)."""
    f = np.asarray(features, dtype=np.float32)
    n = f.shape[0]
    order = np.empty(n, dtype=np.int64)
    leaf_sizes: list[int] = []
    pos = 0

    stack = [np.arange(n, dtype=np.int64)]
    while stack:
        ids = stack.pop()
        if len(ids) <= leaf_size:
            order[pos: pos + len(ids)] = ids
            leaf_sizes.append(len(ids))
            pos += len(ids)
            continue
        v = _top_direction(f[ids], seed=seed)
        proj = f[ids] @ v.astype(np.float32)
        srt = np.argsort(proj, kind="stable")
        m = len(ids)
        lo = max(1, int(m * balance))
        hi = min(m - 1, int(m * (1.0 - balance)))
        window = proj[srt[lo: hi + 1]]
        gaps = window[1:] - window[:-1]
        cut = lo + 1 + int(np.argmax(gaps)) if len(gaps) else m // 2
        left = ids[srt[:cut]]
        right = ids[srt[cut:]]
        # depth-first, right pushed first so left lands first in `order`
        stack.append(right)
        stack.append(left)
    assert pos == n
    return order, leaf_sizes


def halo_fraction(
    nbr_idx: np.ndarray, nbr_mask: np.ndarray, block: int
) -> float:
    """Max over blocks of |unique out-of-block neighbors| / block —
    the block-dense layout is worthwhile when this is small (<~0.5)."""
    nbr = np.asarray(nbr_idx)
    mask = np.asarray(nbr_mask) > 0
    n = nbr.shape[0]
    nb = -(-n // block)
    worst = 0.0
    for k in range(nb):
        rows = slice(k * block, min((k + 1) * block, n))
        flat = nbr[rows][mask[rows]]
        out = flat[(flat < k * block) | (flat >= (k + 1) * block)]
        worst = max(worst, len(np.unique(out)) / block)
    return worst


def graph_grow_blocks(
    nbr_idx: np.ndarray, nbr_mask: np.ndarray, leaf_size: int = 1024
) -> tuple[np.ndarray, list[int]]:
    """Graph-grown blocks (METIS-style region growing): BFS-grow a region
    from an unassigned seed until `leaf_size`, emit it as one block,
    repeat. Needs no features — locality comes from the adjacency itself:
    connected communities are consumed whole (halo only where a community
    is larger than a block or a block boundary lands mid-community).

    Returns (perm, leaf_sizes) like recursive_bisection_order.
    """
    nbr = np.asarray(nbr_idx)
    mask = np.asarray(nbr_mask) > 0
    n = nbr.shape[0]

    # symmetrized CSR adjacency: kNN digraphs are rarely strongly
    # connected, and growth over out-edges alone fragments communities
    src = np.repeat(np.arange(n), nbr.shape[1])[mask.reshape(-1)]
    dst = nbr.reshape(-1)[mask.reshape(-1)]
    us = np.concatenate([src, dst])
    vs = np.concatenate([dst, src])
    order_e = np.argsort(us, kind="stable")
    us, vs = us[order_e], vs[order_e]
    row_ptr = np.searchsorted(us, np.arange(n + 1))

    assigned = np.zeros(n, bool)
    order = np.empty(n, np.int64)
    region_sizes: list[int] = []
    pos = 0
    seed_cursor = 0

    while pos < n:
        while seed_cursor < n and assigned[seed_cursor]:
            seed_cursor += 1
        if seed_cursor >= n:
            break
        block_nodes = [seed_cursor]
        assigned[seed_cursor] = True
        frontier = [seed_cursor]
        while frontier and len(block_nodes) < leaf_size:
            nxt: list[int] = []
            for u in frontier:
                for v in vs[row_ptr[u]: row_ptr[u + 1]]:
                    v = int(v)
                    if not assigned[v] and len(block_nodes) < leaf_size:
                        assigned[v] = True
                        block_nodes.append(v)
                        nxt.append(v)
            frontier = nxt
        order[pos: pos + len(block_nodes)] = block_nodes
        region_sizes.append(len(block_nodes))
        pos += len(block_nodes)

    # pack consecutive regions into blocks <= leaf_size (whole components
    # packed together add ZERO halo — no edges cross components)
    leaf_sizes: list[int] = []
    acc = 0
    for s in region_sizes:
        if acc and acc + s > leaf_size:
            leaf_sizes.append(acc)
            acc = 0
        acc += s
    if acc:
        leaf_sizes.append(acc)
    return order, leaf_sizes
