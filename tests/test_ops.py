"""Tests for core sparse ops: padded vs CSR equivalence, masked softmax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruvector_tpu.graph import CSRGraph, NeighborGraph
from ruvector_tpu.ops import (
    masked_softmax,
    masked_weighted_mean,
    sddmm_csr,
    sddmm_padded,
    segment_softmax_csr,
    spmm_csr,
    spmm_padded,
)


def random_graph(rng, n=50, max_deg=8):
    lists, weights = [], []
    for i in range(n):
        deg = rng.integers(0, max_deg + 1)
        nbrs = rng.choice(n, size=deg, replace=False).tolist()
        lists.append(nbrs)
        weights.append(rng.random(deg).astype(np.float32).tolist())
    return NeighborGraph.from_lists(lists, weights, max_degree=max_deg)


def test_masked_softmax_matches_dense():
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    mask = jnp.asarray((rng.random((4, 6)) > 0.3).astype(np.float32))
    out = masked_softmax(scores, mask)
    out_np = np.asarray(out)
    for i in range(4):
        valid = np.asarray(mask[i]) > 0
        if valid.sum() == 0:
            assert np.allclose(out_np[i], 0.0)
            continue
        s = np.asarray(scores[i])[valid]
        e = np.exp(s - s.max())
        expect = e / e.sum()
        np.testing.assert_allclose(out_np[i][valid], expect, rtol=1e-5)
        assert np.allclose(out_np[i][~valid], 0.0)


def test_masked_softmax_all_masked_row_is_zero():
    scores = jnp.ones((2, 4))
    mask = jnp.zeros((2, 4))
    out = masked_softmax(scores, mask)
    assert np.allclose(np.asarray(out), 0.0)


def test_spmm_padded_equals_csr():
    rng = np.random.default_rng(1)
    g = random_graph(rng)
    csr = g.to_csr()
    x = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    out_padded = spmm_padded(x, g.nbr_idx, g.edge_weight, g.nbr_mask)
    out_csr = spmm_csr(csr, x)
    np.testing.assert_allclose(np.asarray(out_padded), np.asarray(out_csr), atol=1e-5)


def test_sddmm_padded_equals_csr():
    rng = np.random.default_rng(2)
    g = random_graph(rng)
    csr = g.to_csr()
    q = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    scores_padded = np.asarray(sddmm_padded(q, k, g.nbr_idx, g.nbr_mask))
    scores_csr = np.asarray(sddmm_csr(csr, q, k))
    # walk CSR and compare edge by edge
    row_ptr = np.asarray(csr.row_ptr)
    mask = np.asarray(g.nbr_mask)
    e = 0
    for i in range(50):
        for j in range(g.max_degree):
            if mask[i, j] > 0:
                np.testing.assert_allclose(
                    scores_padded[i, j], scores_csr[e], atol=1e-4
                )
                e += 1
    assert e == csr.num_edges


def test_segment_softmax_csr_rows_sum_to_one():
    rng = np.random.default_rng(3)
    g = random_graph(rng)
    csr = g.to_csr()
    scores = jnp.asarray(rng.normal(size=(csr.num_edges,)).astype(np.float32))
    attn = segment_softmax_csr(csr, scores)
    rows = np.asarray(csr.row_ids())
    attn = np.asarray(attn)
    for i in range(50):
        sel = rows == i
        if sel.sum() > 0:
            np.testing.assert_allclose(attn[sel].sum(), 1.0, rtol=1e-5)


def test_masked_weighted_mean_uniform_fallback():
    # zero weights -> uniform average over valid neighbors (layer.rs:428-432)
    feats = jnp.asarray([[[1.0, 0.0], [3.0, 0.0], [99.0, 99.0]]])
    weights = jnp.zeros((1, 3))
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    out = masked_weighted_mean(feats, weights, mask)
    np.testing.assert_allclose(np.asarray(out), [[2.0, 0.0]], atol=1e-6)


def test_masked_weighted_mean_normalizes():
    feats = jnp.asarray([[[1.0], [3.0]]])
    weights = jnp.asarray([[1.0, 3.0]])
    mask = jnp.ones((1, 2))
    out = masked_weighted_mean(feats, weights, mask)
    np.testing.assert_allclose(np.asarray(out), [[0.25 * 1 + 0.75 * 3]], atol=1e-6)


def test_csr_row_ids():
    csr = CSRGraph(
        row_ptr=jnp.asarray([0, 2, 2, 5]),
        col_idx=jnp.asarray([1, 2, 0, 1, 2]),
        values=jnp.ones(5),
        num_nodes=3,
    )
    np.testing.assert_array_equal(np.asarray(csr.row_ids()), [0, 0, 2, 2, 2])


def test_padded_csr_roundtrip():
    rng = np.random.default_rng(4)
    g = random_graph(rng)
    g2 = g.to_csr().to_padded(max_degree=g.max_degree)
    # same adjacency as sets with weights
    for i in range(g.num_nodes):
        m1 = np.asarray(g.nbr_mask[i]) > 0
        m2 = np.asarray(g2.nbr_mask[i]) > 0
        s1 = set(zip(np.asarray(g.nbr_idx[i])[m1].tolist(),
                     np.round(np.asarray(g.edge_weight[i])[m1], 5).tolist()))
        s2 = set(zip(np.asarray(g2.nbr_idx[i])[m2].tolist(),
                     np.round(np.asarray(g2.edge_weight[i])[m2], 5).tolist()))
        assert s1 == s2


def test_spmm_bucketed_matches_csr_on_power_law():
    """Degree-bucketed SpMM == segment-sum CSR on a zipf-degree graph
    (ops/spmm_bucketed.py — the unbounded-degree general path)."""
    import numpy as np

    from ruvector_tpu.graph.csr import CSRGraph
    from ruvector_tpu.ops.spmm_bucketed import (
        build_bucket_plan,
        spmm_bucketed,
    )

    rng = np.random.default_rng(0)
    n, d = 400, 24
    deg = np.minimum(rng.zipf(1.8, n) * 2, 64).astype(np.int64)
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    dst = rng.integers(0, n, src.size).astype(np.int64)
    w = rng.uniform(0.1, 1.0, src.size).astype(np.float32)
    csr = CSRGraph.from_edges(src, dst, w, n)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    plan = build_bucket_plan(csr)
    got = spmm_bucketed(plan, x)
    ref = spmm_csr(csr, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # padding waste bounded: total padded cells < 2x live edges
    cells = sum(r.shape[0] * c for r, c in zip(plan.rows, plan.caps))
    assert cells < 2 * src.size
