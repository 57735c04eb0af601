"""Native incremental min-cut vs the exact-recompute oracle."""

import numpy as np
import pytest

from ruvector_tpu.mincut.dynamic import DynamicMinCut

native = pytest.importorskip("ruvector_tpu.native")
if not native.available:
    pytest.skip("native runtime unavailable", allow_module_level=True)


def _fuzz_stream(n, steps, seed, query_every=3):
    """Random insert/delete/reweight stream; query both backends and
    compare value + partition + cut edges at every query point."""
    rng = np.random.default_rng(seed)
    inc = DynamicMinCut(n, backend="native")
    ref = DynamicMinCut(n, backend="python")
    assert inc._inc is not None and ref._inc is None
    live = {}
    for step in range(steps):
        op = rng.random()
        if op < 0.55 or not live:
            u, v = rng.integers(0, n, 2)
            while v == u:
                v = rng.integers(0, n)
            w = float(rng.uniform(0.1, 2.0))
            inc.insert_edge(int(u), int(v), w)
            ref.insert_edge(int(u), int(v), w)
            live[(int(u), int(v))] = live.get((int(u), int(v)), 0) + w
        elif op < 0.8:
            u, v = list(live)[rng.integers(0, len(live))]
            w = float(rng.uniform(0.05, 2.0))
            inc.reweight_edge(u, v, w)
            ref.reweight_edge(u, v, w)
            live[(u, v)] = w
        else:
            u, v = list(live)[rng.integers(0, len(live))]
            inc.delete_edge(u, v)
            ref.delete_edge(u, v)
            del live[(u, v)]
        if step % query_every == 0 or step == steps - 1:
            v_inc, v_ref = inc.cut_value(), ref.cut_value()
            assert v_inc == pytest.approx(v_ref, abs=1e-3), (
                step, v_inc, v_ref, inc.solver_stats())
            p_inc, p_ref = inc.partition(), ref.partition()
            np.testing.assert_array_equal(p_inc, p_ref, err_msg=str(step))
            assert sorted(inc.cut_edges()) == sorted(ref.cut_edges()), step
    return inc


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_small(seed):
    _fuzz_stream(n=12, steps=120, seed=seed, query_every=1)


@pytest.mark.parametrize("seed", [10, 11])
def test_fuzz_medium(seed):
    _fuzz_stream(n=40, steps=300, seed=seed, query_every=5)


def test_o1_skip_counter_advances():
    """Inserts that don't cross the cut must be O(1)-skipped (the whole
    point of the incremental design)."""
    n = 64
    inc = DynamicMinCut(n, backend="native")
    # two cliques bridged by one weak edge
    for c in (range(0, 32), range(32, 64)):
        c = list(c)
        for i in c:
            for j in c:
                if i != j:
                    inc.insert_edge(i, j, 1.0)
    inc.insert_edge(10, 50, 0.01)
    inc.cut_value()
    base = inc.solver_stats()
    # 100 intra-clique (non-crossing) inserts: no repair needed
    for k in range(100):
        inc.insert_edge(k % 30, (k + 1) % 30, 0.5)
    after = inc.solver_stats()
    assert after["o1_skips"] - base["o1_skips"] == 100
    assert after["augment_phases"] == base["augment_phases"]
    # and the value is still exact
    ref = DynamicMinCut(n, backend="python")
    for (u, v), w in inc.weights.items():
        ref.insert_edge(u, v, w)
    assert inc.cut_value() == pytest.approx(ref.cut_value(), abs=1e-3)


def test_certificate_roundtrip_native():
    inc = DynamicMinCut(8, backend="native")
    rng = np.random.default_rng(5)
    for _ in range(30):
        u, v = rng.integers(0, 8, 2)
        if u != v:
            inc.insert_edge(int(u), int(v), float(rng.uniform(0.1, 1.0)))
    cert = inc.certificate()
    assert inc.verify_certificate(cert)
