"""Global dynamic min-cut vs a brute-force enumerator.

VERDICT r2 missing#1: the toolkit previously answered only s-t cuts; the
GlobalDynamicMinCut maintainer answers "what is the minimum cut of this
graph" under insert/delete/reweight (reference capability:
ruvector-mincut/src/lib.rs:1-57, linkcut/euler/subpolynomial subsystems).
"""

import itertools

import numpy as np
import pytest

from ruvector_tpu.mincut.global_dynamic import (
    GlobalDynamicMinCut,
    stoer_wagner,
)


def brute_force_global_cut(weights: dict, n: int) -> float:
    """Min over all nontrivial bipartitions of the ACTIVE node set."""
    deg = np.zeros(n)
    for (u, v), w in weights.items():
        deg[u] += w
        deg[v] += w
    active = [i for i in range(n) if deg[i] > 1e-12]
    if len(active) < 2:
        return 0.0
    best = np.inf
    k = len(active)
    for bits in range(1, 2 ** (k - 1)):
        side = {active[i] for i in range(k) if (bits >> i) & 1}
        val = sum(w for (u, v), w in weights.items()
                  if (u in side) != (v in side))
        best = min(best, val)
    return float(best)


def _check_partition(mc: GlobalDynamicMinCut, expect: float):
    """The returned partition must be a real cut achieving the value."""
    side = mc.partition()
    deg = np.zeros(mc.n)
    for (u, v), w in mc.weights.items():
        deg[u] += w
        deg[v] += w
    active = deg > 1e-12
    if active.sum() < 2:
        return
    assert side[active].any() and not side[active].all(), "trivial side"
    val = sum(w for (u, v), w in mc.weights.items() if side[u] != side[v])
    assert val == pytest.approx(expect, abs=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_vs_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n = 9
    mc = GlobalDynamicMinCut(n)
    live = {}
    for step in range(500):
        op = rng.random()
        if op < 0.55 or not live:
            u, v = rng.integers(0, n, 2)
            while v == u:
                v = rng.integers(0, n)
            u, v = int(min(u, v)), int(max(u, v))
            w = float(rng.uniform(0.1, 2.0))
            mc.insert_edge(u, v, w)
            live[(u, v)] = live.get((u, v), 0.0) + w
        elif op < 0.8:
            u, v = list(live)[rng.integers(0, len(live))]
            w = float(rng.uniform(0.05, 2.0))
            mc.reweight_edge(u, v, w)
            live[(u, v)] = w
        else:
            u, v = list(live)[rng.integers(0, len(live))]
            mc.delete_edge(u, v)
            del live[(u, v)]
        expect = brute_force_global_cut(live, n)
        assert mc.cut_value() == pytest.approx(expect, abs=1e-6), (
            step, mc.stats())
        _check_partition(mc, expect)
    st = mc.stats()
    assert st["o1_updates"] > 0
    assert st["full_recomputes"] < st["updates"]


def test_fuzz_2k_mixed_updates_with_incremental_wins():
    """The VERDICT acceptance stream: 2k mixed updates, value pinned to
    brute force at every query point, with most updates NOT triggering a
    full recompute."""
    rng = np.random.default_rng(42)
    n = 12
    mc = GlobalDynamicMinCut(n)
    live = {}
    for step in range(2000):
        op = rng.random()
        if op < 0.6 or not live:
            u, v = rng.integers(0, n, 2)
            while v == u:
                v = rng.integers(0, n)
            u, v = int(min(u, v)), int(max(u, v))
            w = float(rng.uniform(0.1, 2.0))
            mc.insert_edge(u, v, w)
            live[(u, v)] = live.get((u, v), 0.0) + w
        elif op < 0.8:
            u, v = list(live)[rng.integers(0, len(live))]
            w = float(rng.uniform(0.05, 2.0))
            mc.reweight_edge(u, v, w)
            live[(u, v)] = w
        else:
            u, v = list(live)[rng.integers(0, len(live))]
            mc.delete_edge(u, v)
            del live[(u, v)]
        if step % 5 == 0 or step == 1999:
            expect = brute_force_global_cut(live, n)
            assert mc.cut_value() == pytest.approx(expect, abs=1e-6), (
                step, mc.stats())
            _check_partition(mc, expect)
    st = mc.stats()
    assert st["o1_updates"] + st["flow_repairs"] > st["full_recomputes"], st


def test_stoer_wagner_known_graph():
    """Classic Stoer-Wagner paper example: min cut value 4."""
    edges = {(0, 1): 2, (0, 4): 3, (1, 2): 3, (1, 4): 2, (1, 5): 2,
             (2, 3): 4, (2, 6): 2, (3, 6): 2, (3, 7): 2, (4, 5): 3,
             (5, 6): 1, (6, 7): 3}
    edges = {k: float(v) for k, v in edges.items()}
    val, side, phases = stoer_wagner(edges, list(range(8)))
    assert val == pytest.approx(4.0)
    inside = side
    cut = sum(w for (u, v), w in edges.items()
              if (u in inside) != (v in inside))
    assert cut == pytest.approx(4.0)
    assert len(phases) == 7


def test_growing_graph_attach_rule_is_o1():
    """A growing star/chain never needs a full recompute: attaching a new
    leaf is O(pool) exact (lambda' = min(lambda, w))."""
    mc = GlobalDynamicMinCut(64)
    mc.insert_edge(0, 1, 5.0)
    assert mc.cut_value() == pytest.approx(5.0)
    for i in range(2, 50):
        mc.insert_edge(i - 1, i, 5.0 + i)       # chain, growing weights
    assert mc.cut_value() == pytest.approx(5.0)   # first link stays min
    st = mc.stats()
    assert st["full_recomputes"] <= 1, st
    # now weaken a middle link below the current min: one flow repair
    mc.reweight_edge(20, 21, 0.5)
    assert mc.cut_value() == pytest.approx(0.5)
    side = mc.partition()
    assert side[20] != side[21]


def test_disconnected_components_zero_cut():
    mc = GlobalDynamicMinCut(10)
    mc.insert_edge(0, 1, 1.0)
    mc.insert_edge(2, 3, 1.0)
    assert mc.cut_value() == 0.0
    side = mc.partition()
    assert side.any() and not side[np.asarray([0, 1, 2, 3])].all()
    # bridging the components brings the cut up
    mc.insert_edge(1, 2, 0.7)
    assert mc.cut_value() == pytest.approx(0.7)


def test_certifies_unchanged_min_via_pool():
    """Insert crossing the primary cut but with a second cut at the same
    value elsewhere: pool certificate avoids the recompute."""
    mc = GlobalDynamicMinCut(8)
    # two triangles bridged by TWO weak edges at different places
    for (u, v) in [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]:
        mc.insert_edge(u, v, 3.0)
    mc.insert_edge(2, 3, 1.0)
    assert mc.cut_value() == pytest.approx(1.0)
    rec0 = mc.stats()["full_recomputes"]
    # strengthen the bridge: primary crossed; new min is a triangle-edge
    # cut? no — bridge at 2.0 still the min; pool certificate only works
    # when another cut sits at the OLD value, so this may recompute; the
    # assertion is on CORRECTNESS here
    mc.insert_edge(2, 3, 1.0)
    assert mc.cut_value() == pytest.approx(2.0)
    assert mc.stats()["full_recomputes"] >= rec0


# --- DynamicMinCut(source=None) facade + local k-cut primitive -------------

def test_dynamic_mincut_without_source_sink_is_global():
    from ruvector_tpu.mincut import DynamicMinCut

    mc = DynamicMinCut(8, source=None)
    for (u, v) in [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]:
        mc.insert_edge(u, v, 3.0)
    mc.insert_edge(2, 3, 0.5)
    assert mc.cut_value() == pytest.approx(0.5)
    side = mc.partition()
    assert side[0] == side[1] == side[2]
    assert side[3] == side[4] == side[5]
    assert side[0] != side[3]
    assert mc.cut_edges() == [(2, 3)]
    fired = []
    mc.watch_threshold(1.0, "above", lambda n, v: fired.append(v))
    mc.insert_edge(1, 4, 2.0)
    assert mc.cut_value() == pytest.approx(2.5)
    assert fired and fired[0] == pytest.approx(2.5)
    cert = mc.certificate()
    assert mc.verify_certificate(cert)
    cert2 = dict(cert)
    cert2["value"] = 0.1
    assert not mc.verify_certificate(cert2)


def test_local_k_cut_finds_planted_weak_cluster():
    from ruvector_tpu.graph.csr import CSRGraph
    from ruvector_tpu.mincut import local_k_cut

    rng = np.random.default_rng(0)
    # 8-node dense cluster weakly attached to a 200-node expander
    n = 208
    src, dst, w = [], [], []
    for i in range(8):
        for j in range(i + 1, 8):
            src.append(i); dst.append(j); w.append(2.0)
    src.append(0); dst.append(100); w.append(0.3)    # weak bridge
    for _ in range(1200):
        u, v = rng.integers(8, n, 2)
        if u != v:
            src.append(int(u)); dst.append(int(v)); w.append(1.0)
    src = np.asarray(src); dst = np.asarray(dst)
    w = np.asarray(w, np.float32)
    g = CSRGraph.from_edges(np.r_[src, dst], np.r_[dst, src],
                            np.r_[w, w], n)
    res = local_k_cut(g, seed=3, k=1.0, max_radius=2, max_volume=64)
    assert res is not None
    assert set(res.members) == set(range(8))
    assert res.value == pytest.approx(0.3)
    assert res.explored < n        # never touched the whole graph
    # no cut below 0.1 exists around the seed
    assert local_k_cut(g, seed=3, k=0.1, max_radius=2) is None
    # a seed deep in the expander has no weight-1 cut nearby
    assert local_k_cut(g, seed=150, k=1.0, max_radius=1) is None


def test_local_k_cut_whole_component_fallback():
    from ruvector_tpu.graph.csr import CSRGraph
    from ruvector_tpu.mincut import local_k_cut

    # small barbell fully inside the ball: falls back to Stoer-Wagner
    src = np.asarray([0, 1, 0, 3, 4, 3, 2, 5])
    dst = np.asarray([1, 2, 2, 4, 5, 5, 3, 0])
    w = np.asarray([2, 2, 2, 2, 2, 2, 0.4, 0.4], np.float32)
    g = CSRGraph.from_edges(np.r_[src, dst], np.r_[dst, src],
                            np.r_[w, w], 6)
    res = local_k_cut(g, seed=0, k=2.0, max_radius=6, max_volume=100)
    assert res is not None
    assert res.value == pytest.approx(0.8)
    assert set(res.members) in ({0, 1, 2}, {3, 4, 5})


@pytest.mark.parametrize("seed", [10, 11])
def test_fuzz_delete_heavy(seed):
    """Exercises leaf deactivation/reactivation: nodes repeatedly leave
    and rejoin the active set."""
    rng = np.random.default_rng(seed)
    n = 8
    mc = GlobalDynamicMinCut(n)
    live = {}
    for step in range(600):
        op = rng.random()
        if op < 0.45 or not live:
            u, v = rng.integers(0, n, 2)
            while v == u:
                v = rng.integers(0, n)
            u, v = int(min(u, v)), int(max(u, v))
            w = float(rng.uniform(0.1, 2.0))
            mc.insert_edge(u, v, w)
            live[(u, v)] = live.get((u, v), 0.0) + w
        else:
            u, v = list(live)[rng.integers(0, len(live))]
            mc.delete_edge(u, v)
            del live[(u, v)]
        expect = brute_force_global_cut(live, n)
        assert mc.cut_value() == pytest.approx(expect, abs=1e-6), step
        _check_partition(mc, expect)


# --- native gmc_* solver pinned to the Python maintainer + brute force -----

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_gmc_fuzz(seed):
    native = pytest.importorskip("ruvector_tpu.native")
    if not native.available:
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(100 + seed)
    n = 10
    gn = native.GlobalIncrementalMinCut(n)
    gp = GlobalDynamicMinCut(n)
    live = {}
    for step in range(700):
        op = rng.random()
        if op < 0.55 or not live:
            u, v = rng.integers(0, n, 2)
            while v == u:
                v = rng.integers(0, n)
            u, v = int(min(u, v)), int(max(u, v))
            w = float(rng.uniform(0.1, 2.0))
            gn.insert_edge(u, v, w)
            gp.insert_edge(u, v, w)
            live[(u, v)] = live.get((u, v), 0.0) + w
        elif op < 0.78:
            u, v = list(live)[rng.integers(0, len(live))]
            w = float(rng.uniform(0.05, 2.0))
            gn.reweight_edge(u, v, w)
            gp.reweight_edge(u, v, w)
            live[(u, v)] = w
        else:
            u, v = list(live)[rng.integers(0, len(live))]
            gn.delete_edge(u, v)
            gp.delete_edge(u, v)
            del live[(u, v)]
        vn, vp = gn.cut_value(), gp.cut_value()
        expect = brute_force_global_cut(live, n)
        assert vn == pytest.approx(expect, abs=1e-6), (step, gn.stats())
        assert vp == pytest.approx(expect, abs=1e-6), step
        # native partition achieves the value
        side = gn.partition()
        deg = np.zeros(n)
        for (uu, vv), w in live.items():
            deg[uu] += w
            deg[vv] += w
        act = deg > 1e-12
        if act.sum() >= 2:
            assert side[act].any() and not side[act].all()
            sval = sum(w for (uu, vv), w in live.items()
                       if side[uu] != side[vv])
            assert sval == pytest.approx(expect, abs=1e-6), step
    st = gn.stats()
    assert st["o1_updates"] > 0


def test_st_cut_dominates_global_cut():
    """Cross-solver invariant: for ANY (s, t), the s-t min cut is an
    upper bound on the global min cut (the global optimum is the min
    over all pairs) — pins the native s-t and global solvers against
    each other on shared random streams."""
    native = pytest.importorskip("ruvector_tpu.native")
    if not native.available:
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(7)
    n = 14
    for trial in range(5):
        edges = {}
        while len(edges) < 26:
            u, v = rng.integers(0, n, 2)
            if u != v:
                edges[(int(min(u, v)), int(max(u, v)))] = float(
                    rng.uniform(0.1, 2.0))
        g = native.GlobalIncrementalMinCut(n)
        for (u, v), w in edges.items():
            g.insert_edge(u, v, w)
        gv = g.cut_value()
        for _ in range(4):
            s, t = rng.integers(0, n, 2)
            if s == t:
                continue
            st = native.IncrementalMinCut(n, int(s), int(t))
            for (u, v), w in edges.items():
                st.insert_edge(u, v, w)
                st.insert_edge(v, u, w)
            assert st.cut_value() >= gv - 1e-6, (trial, s, t)


def test_local_k_cut_dominates_global_cut():
    from ruvector_tpu.graph.csr import CSRGraph
    from ruvector_tpu.mincut import local_k_cut

    rng = np.random.default_rng(3)
    n = 40
    src = rng.integers(0, n, 140)
    dst = rng.integers(0, n, 140)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.1, 1.5, len(src)).astype(np.float32)
    gmc = GlobalDynamicMinCut(n)
    for u, v, ww in zip(src, dst, w):
        gmc.insert_edge(int(u), int(v), float(ww))
    gv = gmc.cut_value()          # exact (Stoer-Wagner backstop)
    g = CSRGraph.from_edges(np.r_[src, dst], np.r_[dst, src],
                            np.r_[w, w], n)
    for seed in range(0, n, 7):
        res = local_k_cut(g, seed=seed, k=1e9, max_radius=6,
                          max_volume=n + 1)
        if res is None:
            continue
        assert res.value >= gv - 1e-6, (seed, res.value, gv)


def test_subthreshold_edges_are_rejected():
    """code-review r3: an edge with weight in (0, 1e-12] must not be
    stored (it would leave its endpoints inactive while influencing the
    maintained value)."""
    mc = GlobalDynamicMinCut(6)
    mc.insert_edge(0, 1, 5.0)
    assert mc.cut_value() == pytest.approx(5.0)
    mc.insert_edge(2, 3, 1e-13)
    assert mc.cut_value() == pytest.approx(5.0)       # unchanged
    assert (2, 3) not in mc.weights
    mc.reweight_edge(0, 1, 1e-13)                      # == delete
    assert mc.cut_value() == 0.0

    import pytest as _p

    native = _p.importorskip("ruvector_tpu.native")
    if native.available:
        g = native.GlobalIncrementalMinCut(6)
        g.insert_edge(0, 1, 5.0)
        assert g.cut_value() == _p.approx(5.0)
        g.insert_edge(2, 3, 1e-13)
        assert g.cut_value() == _p.approx(5.0)
