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


def test_bdense_build_pins_python_builder():
    """Threaded native block-dense build == the Python builder bit-for-
    bit (including the fixed halo-at-column-B layout, zero-weight-edge
    eps floor, tail block, and bf16 emission)."""
    import ml_dtypes
    import numpy as np

    from ruvector_tpu import native
    from ruvector_tpu.graph.block_dense import _EPS_EDGE

    if not native.available:
        import pytest

        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(3)
    n, m, B = 1300, 10, 256
    idx = np.stack([rng.choice(n, m, replace=False)
                    for _ in range(n)]).astype(np.int32)
    mask = (rng.random((n, m)) > 0.15).astype(np.float32)
    ew = rng.uniform(0.0, 1.0, (n, m)).astype(np.float32)
    ew[0, :] = 0.0                      # uniform-fallback row
    ew[5, 0] = 0.0                      # zero-weight edge -> eps floor

    # force the python path by building via the internal loop (leaf_sizes
    # = uniform) and compare against the native call
    lens = [B] * (n // B) + ([n % B] if n % B else [])
    from ruvector_tpu.graph.block_dense import build_block_dense

    ref = build_block_dense(idx, mask, ew, block=B, leaf_sizes=lens)
    lid, wd, deg, pad, pos, dup = native.bdense_build(
        idx, mask, ew, block=B, eps_edge=_EPS_EDGE)
    assert dup == 0
    np.testing.assert_array_equal(np.asarray(ref.local_ids), lid)
    np.testing.assert_allclose(np.asarray(ref.wdense), wd,
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(ref.degrees), deg)
    np.testing.assert_array_equal(np.asarray(ref.node_pad), pad)
    np.testing.assert_array_equal(np.asarray(ref.node_pos), pos)

    lid2, wd2, *_ = native.bdense_build(idx, mask, ew, block=B,
                                        eps_edge=_EPS_EDGE, bf16=True)
    ref16 = np.asarray(ref.wdense).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(ref16.view(np.uint16),
                                  wd2.view(np.uint16))


def test_bdense_build_duplicate_slots_fall_back():
    import numpy as np

    from ruvector_tpu import native
    from ruvector_tpu.graph.block_dense import build_block_dense

    if not native.available:
        import pytest

        pytest.skip("native runtime unavailable")
    idx = np.asarray([[1, 1], [0, 0]], np.int32)   # duplicate neighbor
    mask = np.ones((2, 2), np.float32)
    ew = np.ones((2, 2), np.float32)
    *_, dup = native.bdense_build(idx, mask, ew, block=2)
    assert dup == 1
    bdg = build_block_dense(idx, mask, ew, block=2)   # python fallback
    assert bdg.log_mult is not None                   # multiplicity kept


def test_gen_cluster_knn_native():
    import numpy as np

    from ruvector_tpu import native

    if not native.available:
        import pytest

        pytest.skip("native runtime unavailable")
    n, d, k, cl = 1024, 32, 8, 128
    feats, idx, ew = native.gen_cluster_knn(n, d, k, cl, seed=7)
    assert feats.shape == (n, d) and idx.shape == (n, k)
    # neighbors stay within the cluster, exclude self, unique
    rows = np.arange(n)
    assert (idx // cl == (rows // cl)[:, None]).all()
    assert (idx != rows[:, None]).all()
    for r in range(0, n, 97):
        assert len(set(idx[r].tolist())) == k
    # weights are 1/(1+dist) of the actual feature distances
    r = 33
    dvec = np.linalg.norm(feats[idx[r]] - feats[r], axis=1)
    np.testing.assert_allclose(ew[r], 1.0 / (1.0 + dvec), rtol=1e-4)
    # determinism
    f2, i2, w2 = native.gen_cluster_knn(n, d, k, cl, seed=7)
    np.testing.assert_array_equal(feats, f2)
    np.testing.assert_array_equal(idx, i2)


def test_bdense_device_fill_pins_python_builder():
    """The device-fill path (native bdense_plan + on-device scatter) ==
    the Python builder BIT-exactly in f32 and bf16: the host ships the
    numpy-normalized [n, m] weights, so only the densification moves to
    the device. Also: dup rows fall back, and the host-fill path agrees
    at its documented 1e-6 (different f32 summation order)."""
    import numpy as np

    import jax

    from ruvector_tpu import native
    from ruvector_tpu.graph.block_dense import build_block_dense

    if not native.available:
        import pytest

        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(3)
    n, m, B = 1000, 16, 128
    idx = np.stack([rng.choice(n, m, replace=False)
                    for _ in range(n)]).astype(np.int32)
    mask = (rng.uniform(size=(n, m)) > 0.1).astype(np.float32)
    mask[5] = 0.0                       # isolated node
    ew = rng.uniform(0, 1, (n, m)).astype(np.float32)
    ew[7] = 0.0                         # uniform-fallback row

    lens = [B] * (n // B) + ([n % B] if n % B else [])
    for dt in (np.float32, jax.numpy.bfloat16):
        a = build_block_dense(idx, mask, ew, block=B, dtype=dt)
        ref = build_block_dense(idx, mask, ew, block=B, dtype=dt,
                                leaf_sizes=lens)   # python loop
        np.testing.assert_array_equal(np.asarray(a.local_ids),
                                      np.asarray(ref.local_ids))
        np.testing.assert_array_equal(
            np.asarray(a.wdense).astype(np.float32),
            np.asarray(ref.wdense).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(a.degrees),
                                      np.asarray(ref.degrees))
        np.testing.assert_array_equal(np.asarray(a.node_pad),
                                      np.asarray(ref.node_pad))
        np.testing.assert_array_equal(np.asarray(a.node_pos),
                                      np.asarray(ref.node_pos))
        host = build_block_dense(idx, mask, ew, block=B, dtype=dt,
                                 device_fill=False)
        np.testing.assert_allclose(
            np.asarray(a.wdense).astype(np.float32),
            np.asarray(host.wdense).astype(np.float32),
            rtol=1e-6, atol=1e-12)

    idx2 = idx.copy()
    idx2[0, 1] = idx2[0, 0]             # duplicate slot -> log_mult path
    g = build_block_dense(idx2, mask, ew, block=B)
    assert g.log_mult is not None
