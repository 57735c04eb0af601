"""Physics / biological / self-organizing / manifold / temporal / economic
graph-transformer modules: invariant-level tests.

Each test checks the physical/mathematical property the reference module
advertises (energy conservation, STDP sign structure, mass conservation,
Shapley efficiency, Granger direction) rather than implementation detail.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruvector_tpu.graph.neighbors import NeighborGraph


def _ring_graph(n: int, d: int, seed: int = 0):
    """Symmetric ring: each node sees left and right neighbor."""
    idx = np.stack([(np.arange(n) - 1) % n, (np.arange(n) + 1) % n], axis=1)
    mask = np.ones((n, 2), np.float32)
    g = NeighborGraph(nbr_idx=jnp.asarray(idx.astype(np.int32)),
                      nbr_mask=jnp.asarray(mask),
                      edge_weight=jnp.asarray(mask))
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    return g, x


# --- physics -----------------------------------------------------------------

def test_hamiltonian_leapfrog_conserves_energy():
    from ruvector_tpu.graph_transformer import HamiltonianGraphNet, PhysicsConfig, hamiltonian

    g, x = _ring_graph(32, 4)
    net = HamiltonianGraphNet(PhysicsConfig(dt=0.01))
    q, p = net.init_state(0.1 * x)
    e0 = float(hamiltonian(q, p, g, net.config))
    q2, p2, energies = net.forward(q, p, g, steps=200)
    drift = abs(float(energies[-1]) - e0) / (abs(e0) + 1e-9)
    assert drift < 1e-3, drift               # symplectic: tiny drift
    assert not np.allclose(np.asarray(q2), np.asarray(q))  # actually moved


def test_conservative_pde_attention_preserves_mass():
    from ruvector_tpu.graph_transformer import conservative_pde_attention

    g, x = _ring_graph(64, 8)
    out, drift = conservative_pde_attention(x, g, diffusion=0.2, steps=10)
    assert abs(float(drift)) < 1e-3
    # diffusion smooths: neighbor differences shrink
    def roughness(v):
        return float(jnp.sum((v - jnp.roll(v, 1, axis=0)) ** 2))
    assert roughness(out) < roughness(x)


# --- biological --------------------------------------------------------------

def test_spiking_attention_spikes_and_aggregates():
    from ruvector_tpu.graph_transformer import BiologicalConfig, SpikingGraphAttention

    g, x = _ring_graph(32, 8, seed=1)
    net = SpikingGraphAttention(BiologicalConfig(threshold=0.5))
    agg, counts, v = net.forward(x, g, steps=10)
    assert float(jnp.sum(counts)) > 0            # something spiked
    assert agg.shape == x.shape
    assert np.all(np.isfinite(np.asarray(agg)))


def test_k_winners_take_all():
    from ruvector_tpu.graph_transformer import k_winners_take_all

    v = jnp.asarray([0.1, 3.0, 2.0, 5.0])
    spikes = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    out = np.asarray(k_winners_take_all(v, spikes, k=2))
    np.testing.assert_array_equal(out, [0.0, 1.0, 0.0, 1.0])


def test_stdp_sign_structure():
    """Pre-before-post potentiates; post-before-pre depresses
    (biological.rs:512)."""
    from ruvector_tpu.graph_transformer import stdp_update

    g, _ = _ring_graph(4, 2)
    w0 = jnp.full((4, 2), 0.5)
    zeros = jnp.zeros(4)

    # step 1: neighbor 1 (pre of node 0) spikes
    pre_spk = jnp.asarray([0.0, 1.0, 0.0, 0.0])
    w1, pre_tr, post_tr = stdp_update(w0, zeros, zeros, pre_spk, zeros, g)
    # step 2: node 0 (post) spikes -> its edge to neighbor 1 potentiates
    post_spk = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    w2, _, _ = stdp_update(w1, pre_tr, post_tr, zeros, post_spk, g)
    assert float(w2[0, 1]) > float(w0[0, 1])     # slot 1 = right nbr (node 1)

    # reversed order: post first, then pre -> depression
    w1b, pre_b, post_b = stdp_update(w0, zeros, zeros, zeros, post_spk, g)
    w2b, _, _ = stdp_update(w1b, pre_b, post_b, pre_spk, zeros, g)
    assert float(w2b[0, 1]) < float(w0[0, 1])


def test_hebbian_oja_bounds_norm():
    from ruvector_tpu.graph_transformer import hebbian_update

    rng = np.random.default_rng(0)
    w = jnp.zeros((8, 8))
    pre = jnp.asarray(rng.normal(size=8).astype(np.float32))
    post = pre                                     # correlated activity
    for _ in range(200):
        w = hebbian_update(w, pre, post, rule="oja", lr=0.05)
    assert float(jnp.linalg.norm(w)) < 100.0       # Oja decay bounds growth
    # plain Hebbian with projection also bounded
    w2 = jnp.zeros((8, 8))
    for _ in range(50):
        w2 = hebbian_update(w2, pre, post, rule="hebbian", lr=0.5,
                            norm_bound=2.0)
    assert float(jnp.linalg.norm(w2)) <= 2.0 + 1e-4


# --- self-organizing ---------------------------------------------------------

def test_morphogenetic_field_differentiates():
    from ruvector_tpu.graph_transformer import MorphogeneticField

    g, _ = _ring_graph(128, 1)
    field = MorphogeneticField()
    a, b = field.init_state(128, seed=0)
    seeded = np.asarray(b) > 0
    assert seeded.any() and not seeded.all()
    a2, b2, scores = field.step(a, b, g, steps=10)
    s = np.asarray(scores)
    assert np.all(np.isfinite(s)) and np.all(np.isfinite(np.asarray(a2)))
    # reaction consumes activator where inhibitor was seeded
    assert np.asarray(a2)[seeded].mean() < np.asarray(a2)[~seeded].mean()


def test_developmental_program_grows_within_budget():
    from ruvector_tpu.graph_transformer import DevelopmentalProgram

    g, _ = _ring_graph(32, 1)
    scores = np.linspace(1.0, 0.0, 32)
    prog = DevelopmentalProgram(max_growth_budget=5, threshold=0.3)
    res = prog.grow(g, scores)
    assert 0 < res.budget_used <= 5
    assert res.new_edges.shape[1] == 2
    # grown edges are novel two-hop connections
    idx = np.asarray(g.nbr_idx)
    for i, t in res.new_edges:
        assert t not in idx[i]


def test_graph_coarsener_roundtrip():
    from ruvector_tpu.graph_transformer import GraphCoarsener

    g, x = _ring_graph(64, 4)
    c = GraphCoarsener()
    res = c.coarsen(g, x)
    assert 1 < res.num_coarse < 64
    back = c.uncoarsen(res, res.coarse_features)
    assert back.shape == x.shape
    # uncoarsen(coarsen(x)) preserves aggregate means exactly
    agg = jnp.asarray(res.agg)
    m1 = jax.ops.segment_sum(x, agg, num_segments=res.num_coarse)
    m2 = jax.ops.segment_sum(back, agg, num_segments=res.num_coarse)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)


# --- manifold ----------------------------------------------------------------

def test_curvature_router_directions():
    from ruvector_tpu.graph_transformer import CurvatureAdaptiveRouter

    r = CurvatureAdaptiveRouter()
    w_neg = r.route(-0.5)
    assert w_neg.hyperbolic > w_neg.spherical and w_neg.hyperbolic > w_neg.euclidean
    w_pos = r.route(0.5)
    assert w_pos.spherical > w_pos.hyperbolic
    w_flat = r.route(0.0)
    assert w_flat.euclidean >= max(w_flat.spherical, w_flat.hyperbolic)
    batch = np.asarray(r.route_batch(jnp.asarray([-0.5, 0.0, 0.5])))
    np.testing.assert_allclose(batch.sum(axis=1), 1.0, atol=1e-6)


def test_ollivier_ricci_triangles_vs_tree():
    from ruvector_tpu.graph_transformer import estimate_ollivier_ricci

    # triangle-rich: complete graph K8 -> high curvature
    n = 8
    idx = np.stack([np.delete(np.arange(n), i) for i in range(n)])
    g_complete = NeighborGraph(
        nbr_idx=jnp.asarray(idx.astype(np.int32)),
        nbr_mask=jnp.ones((n, n - 1), jnp.float32),
        edge_weight=jnp.ones((n, n - 1), jnp.float32))
    # triangle-free ring
    g_ring, _ = _ring_graph(8, 1)
    k_complete = float(jnp.mean(estimate_ollivier_ricci(g_complete)))
    k_ring = float(jnp.mean(estimate_ollivier_ricci(g_ring)))
    assert k_complete > k_ring


def test_riemannian_adam_descends_and_stays_in_ball():
    from ruvector_tpu.graph_transformer import (
        riemannian_adam_init, riemannian_adam_update,
    )
    from ruvector_tpu.attention.hyperbolic import poincare_distance

    target = jnp.asarray([[0.3, 0.2]])
    params = {"z": jnp.asarray([[-0.4, 0.1]])}

    def loss(p):
        return jnp.sum(poincare_distance(p["z"], target) ** 2)

    state = riemannian_adam_init(params)
    l0 = float(loss(params))
    for _ in range(100):
        grads = jax.grad(loss)(params)
        params, state = riemannian_adam_update(params, grads, state, lr=0.05)
    assert float(loss(params)) < l0 * 0.1
    assert float(jnp.linalg.norm(params["z"])) < 1.0   # still in the ball


def test_geodesic_message_passing_contracts():
    from ruvector_tpu.graph_transformer import geodesic_message_passing

    g, _ = _ring_graph(16, 2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.3 * rng.normal(size=(16, 2)).astype(np.float32))
    out = geodesic_message_passing(x, g)
    assert np.all(np.linalg.norm(np.asarray(out), axis=1) < 1.0)
    # averaging toward neighbors reduces spread
    assert float(jnp.var(out)) < float(jnp.var(x)) * 1.5


# --- temporal ----------------------------------------------------------------

def test_temporal_attention_is_causal():
    from ruvector_tpu.graph_transformer import (
        temporal_attention, verify_causal_ordering,
    )

    rng = np.random.default_rng(0)
    seq = rng.normal(size=(12, 6)).astype(np.float32)
    out, w = temporal_attention(seq)
    assert verify_causal_ordering(w)
    assert out.shape == seq.shape
    # first position attends only to itself
    np.testing.assert_allclose(np.asarray(w[0]), np.eye(12)[0], atol=1e-6)


def test_granger_causality_detects_direction():
    from ruvector_tpu.graph_transformer import granger_causality

    rng = np.random.default_rng(42)
    t = 400
    x = rng.normal(size=t).astype(np.float32)
    y = np.zeros(t, np.float32)
    for i in range(2, t):                 # y driven by lagged x
        y[i] = 0.8 * x[i - 2] + 0.1 * rng.normal()
    ratio_xy, causal_xy = granger_causality(x, y, max_lag=4)
    ratio_yx, _ = granger_causality(y, x, max_lag=4)
    assert causal_xy
    assert ratio_xy > ratio_yx            # direction recovered


# --- economic ----------------------------------------------------------------

def test_shapley_efficiency_and_relevance():
    from ruvector_tpu.graph_transformer import shapley_attention

    rng = np.random.default_rng(0)
    n, d = 10, 8
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    query = x[3] + 0.01 * jnp.asarray(rng.normal(size=d).astype(np.float32))
    phi = shapley_attention(x, query, jax.random.key(0),
                            num_permutations=64)
    phi = np.asarray(phi)
    assert np.argmax(phi) == 3            # most similar node matters most
    # efficiency: sum(phi) == v(grand coalition) - v(empty), exactly, for
    # every permutation (telescoping marginals)
    from ruvector_tpu.graph_transformer.economic import _coalition_value

    v_grand = float(_coalition_value(x, query, jnp.ones(n)))
    v_empty = float(_coalition_value(x, query, jnp.zeros(n)))
    np.testing.assert_allclose(phi.sum(), v_grand - v_empty, atol=1e-3)


def test_nash_attention_converges_row_stochastic():
    from ruvector_tpu.graph_transformer import nash_attention

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(12, 4)).astype(np.float32))
    alloc, payoffs = nash_attention(x, stakes=jnp.ones(12), iters=50)
    a = np.asarray(alloc)
    np.testing.assert_allclose(a.sum(axis=1), 1.0, atol=1e-3)
    assert np.all(a >= 0)
    assert np.all(np.isfinite(np.asarray(payoffs)))


def test_incentive_slashing():
    from ruvector_tpu.graph_transformer import (
        IncentiveState, incentive_aligned_step,
    )

    g, x = _ring_graph(16, 4, seed=2)
    x = x.at[5].set(100.0)                # node 5 is a wild outlier
    state = IncentiveState(stakes=jnp.ones(16))
    consensus, new_state, slashed = incentive_aligned_step(
        x, g.nbr_idx, g.nbr_mask, state)
    assert bool(slashed[5])
    assert float(new_state.stakes[5]) < 1.0
    assert consensus.shape == x.shape
