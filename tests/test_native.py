"""Native C++ graph runtime: build check + parity against Python paths."""

import numpy as np
import pytest

from ruvector_tpu import native
from ruvector_tpu.graph import NeighborGraph

pytestmark = pytest.mark.skipif(
    not native.available, reason="native library unavailable (no compiler)"
)


def random_graph(rng, n=60, max_deg=6):
    lists, weights = [], []
    for i in range(n):
        deg = int(rng.integers(0, max_deg + 1))
        lists.append(rng.choice(n, size=deg, replace=False).tolist())
        weights.append(rng.random(deg).astype(np.float32).tolist())
    return NeighborGraph.from_lists(lists, weights, max_degree=max_deg)


def test_native_builds():
    assert native.available


def test_bfs_reorder_is_permutation():
    rng = np.random.default_rng(0)
    g = random_graph(rng)
    order = native.bfs_reorder(np.asarray(g.nbr_idx), np.asarray(g.nbr_mask))
    assert sorted(order.tolist()) == list(range(g.num_nodes))


def test_halo_plan_matches_python():
    # Python reference path vs native path must produce consistent plans
    from ruvector_tpu.parallel.partition import build_halo_plan

    rng = np.random.default_rng(1)
    g = random_graph(rng, n=64)
    plan_native, _ = build_halo_plan(g, 4)

    # force the python path
    import ruvector_tpu.native as nat
    saved = nat.available
    nat.available = False
    try:
        plan_py, _ = build_halo_plan(g, 4)
    finally:
        nat.available = saved

    assert plan_native.halo == plan_py.halo
    np.testing.assert_array_equal(plan_native.send_idx, plan_py.send_idx)
    np.testing.assert_array_equal(plan_native.send_mask, plan_py.send_mask)
    np.testing.assert_array_equal(plan_native.local_nbr_idx, plan_py.local_nbr_idx)


def test_native_mincut_matches_python_dinic():
    from ruvector_tpu.attention.mincut import _Dinic

    rng = np.random.default_rng(2)
    for trial in range(5):
        seq = int(rng.integers(3, 10))
        logits = rng.normal(size=(seq, seq)).astype(np.float32)
        keep, cost = native.dinic_mincut_gate(logits, lam=0.5, eps=0.01)
        # structural checks against the python solver's max-flow value
        clamped = np.where(logits > 0.01, logits, 0.0)
        d = _Dinic(seq)
        edges = []
        for i in range(seq):
            for j in range(seq):
                if clamped[i, j] > 0:
                    d.add_edge(i, j, float(clamped[i, j]))
                    edges.append((i, j))
        flow = d.max_flow(0, seq - 1)
        pos = clamped > 0
        if pos.sum() == 0:
            assert keep.sum() == 0
            continue
        mean_w = clamped[pos].mean()
        if flow <= 0.5 * mean_w:
            # cut applied: cost equals flow (max-flow = min-cut)
            np.testing.assert_allclose(cost, flow, rtol=1e-4, atol=1e-5)
        else:
            assert cost == 0.0
            np.testing.assert_array_equal(keep, pos)
        # keep never includes non-positive logits
        assert not np.any(keep & ~pos)


def test_native_sample_fanout():
    rng = np.random.default_rng(3)
    g = random_graph(rng)
    idx, mask = native.sample_fanout(
        np.asarray(g.nbr_idx), np.asarray(g.nbr_mask), fanout=3, seed=42
    )
    nbr = np.asarray(g.nbr_idx)
    gm = np.asarray(g.nbr_mask) > 0
    for i in range(g.num_nodes):
        deg = int(gm[i].sum())
        k = int(mask[i].sum())
        assert k == min(deg, 3)
        picked = idx[i][mask[i] > 0]
        true_nbrs = set(nbr[i][gm[i]].tolist())
        assert set(picked.tolist()) <= true_nbrs
        assert len(set(picked.tolist())) == k  # no replacement


def test_native_csr_matches_python():
    rng = np.random.default_rng(4)
    g = random_graph(rng)
    row_ptr, col_idx, values = native.to_csr(
        np.asarray(g.nbr_idx), np.asarray(g.nbr_mask), np.asarray(g.edge_weight)
    )
    csr = g.to_csr()
    np.testing.assert_array_equal(row_ptr, np.asarray(csr.row_ptr))
    np.testing.assert_array_equal(col_idx, np.asarray(csr.col_idx))
    np.testing.assert_allclose(values, np.asarray(csr.values))
