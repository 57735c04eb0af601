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
    features: np.ndarray, leaf_size: int = 1024, seed: int = 0
) -> np.ndarray:
    """Return perm (new position -> old id) ordering nodes by recursive
    balanced median splits of the feature space."""
    f = np.asarray(features, dtype=np.float32)
    n = f.shape[0]
    order = np.empty(n, dtype=np.int64)
    pos = 0

    stack = [np.arange(n, dtype=np.int64)]
    while stack:
        ids = stack.pop()
        if len(ids) <= leaf_size:
            order[pos: pos + len(ids)] = ids
            pos += len(ids)
            continue
        v = _top_direction(f[ids], seed=seed)
        proj = f[ids] @ v.astype(np.float32)
        half = len(ids) // 2
        part = np.argpartition(proj, half)
        right = ids[part[half:]]
        left = ids[part[:half]]
        # depth-first, right pushed first so left lands first in `order`
        stack.append(right)
        stack.append(left)
    assert pos == n
    return order


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
