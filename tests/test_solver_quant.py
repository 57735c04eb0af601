"""Solver suite + quantization/compression tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruvector_tpu.graph.csr import CSRGraph
from ruvector_tpu.ops.compress import (
    CompressedTensor,
    TensorCompress,
    level_for_access_frequency,
)
from ruvector_tpu.ops.quantization import (
    binary_quantize,
    binary_similarity,
    hamming_distance,
    int4_dequantize,
    int4_quantize,
    pq_decode,
    pq_distance,
    pq_encode,
    pq_train,
    scalar_dequantize,
    scalar_distance,
    scalar_quantize,
)
from ruvector_tpu.solver import (
    backward_push_ppr,
    cg_solve,
    forward_push_ppr,
    jacobi_solve,
    neumann_solve,
    ppr_power_iteration,
    random_walk_ppr,
)


def dd_matrix(n=16, seed=0):
    """Random diagonally-dominant SPD CSR matrix."""
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)).astype(np.float32) * 0.1
    a = (a + a.T) / 2
    np.fill_diagonal(a, np.abs(a).sum(1) + 1.0)
    src, dst = np.nonzero(a)
    return CSRGraph.from_edges(src, dst, a[src, dst], n), a


def ring_graph(n=20):
    src = np.repeat(np.arange(n), 2)
    dst = np.stack([(np.arange(n) + 1) % n, (np.arange(n) - 1) % n], 1).reshape(-1)
    return CSRGraph.from_edges(src, dst, None, n)


# --- solvers ----------------------------------------------------------------

def test_neumann_solves_dd_system():
    # normalize so rho(I-A) < 1
    csr, a = dd_matrix()
    scale = 1.0 / np.abs(a).sum(1).max()
    csr_scaled = CSRGraph(csr.row_ptr, csr.col_idx, csr.values * scale,
                          csr.num_nodes)
    b = np.ones(16, np.float32)
    r = neumann_solve(csr_scaled, b * scale, tolerance=1e-6,
                      max_iterations=1000)
    expect = np.linalg.solve(a, b)
    np.testing.assert_allclose(np.asarray(r.x), expect, atol=1e-3)
    assert r.converged


def test_cg_solves_spd_system():
    csr, a = dd_matrix(seed=1)
    b = np.random.default_rng(2).normal(size=16).astype(np.float32)
    r = cg_solve(csr, b, tolerance=1e-6, max_iterations=200)
    expect = np.linalg.solve(a, b)
    np.testing.assert_allclose(np.asarray(r.x), expect, atol=1e-3)
    assert r.converged
    # preconditioned converges too (possibly different iteration count)
    rp = cg_solve(csr, b, tolerance=1e-6, max_iterations=200,
                  use_preconditioner=True)
    np.testing.assert_allclose(np.asarray(rp.x), expect, atol=1e-3)


def test_jacobi_solves_dd_system():
    csr, a = dd_matrix(seed=3)
    b = np.ones(16, np.float32)
    r = jacobi_solve(csr, b, tolerance=1e-6, max_iterations=2000)
    np.testing.assert_allclose(np.asarray(r.x), np.linalg.solve(a, b), atol=1e-3)


def test_forward_push_matches_power_iteration():
    g = ring_graph()
    push = forward_push_ppr(g, source=0, alpha=0.2, epsilon=1e-7,
                            max_sweeps=300)
    power = ppr_power_iteration(g, source=0, alpha=0.2, iters=300)
    np.testing.assert_allclose(push, power, atol=1e-4)
    np.testing.assert_allclose(push.sum(), 1.0, atol=1e-3)


def test_backward_push_symmetric_graph():
    g = ring_graph()
    fwd = forward_push_ppr(g, 0, alpha=0.2, epsilon=1e-7, max_sweeps=300)
    bwd = backward_push_ppr(g, 0, alpha=0.2, epsilon=1e-7, max_sweeps=300)
    # undirected regular ring: forward == backward
    np.testing.assert_allclose(fwd, bwd, atol=1e-4)


def test_random_walk_ppr_approximates():
    g = ring_graph(10)
    mc = random_walk_ppr(g, 0, alpha=0.2, num_walks=20000, max_len=100, seed=0)
    exact = ppr_power_iteration(g, 0, alpha=0.2, iters=200)
    # MC estimator: endpoint distribution approximates PPR
    np.testing.assert_allclose(mc, exact, atol=0.03)
    # deterministic given the seed
    mc2 = random_walk_ppr(g, 0, alpha=0.2, num_walks=20000, max_len=100, seed=0)
    np.testing.assert_array_equal(mc, mc2)


# --- quantization -----------------------------------------------------------

def test_scalar_quantization_roundtrip():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(10, 64)).astype(np.float32))
    q = scalar_quantize(x)
    dec = scalar_dequantize(q)
    err = np.abs(np.asarray(dec) - np.asarray(x)).max()
    rangex = float(np.ptp(np.asarray(x)))
    assert err < rangex / 255.0 * 1.5


def test_scalar_asymmetric_distance():
    rng = np.random.default_rng(5)
    db = jnp.asarray(rng.normal(size=(20, 32)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    q = scalar_quantize(db)
    dist = np.asarray(scalar_distance(queries, q))
    dec = np.asarray(scalar_dequantize(q))
    expect = ((np.asarray(queries)[:, None] - dec[None]) ** 2).sum(-1)
    np.testing.assert_allclose(dist, expect, rtol=1e-3, atol=1e-3)


def test_int4_roundtrip():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(8, 33)).astype(np.float32))  # odd dim
    q = int4_quantize(x)
    dec = np.asarray(int4_dequantize(q))
    assert dec.shape == (8, 33)
    err = np.abs(dec - np.asarray(x)).max()
    assert err < float(np.ptp(np.asarray(x))) / 15.0 * 1.5


def test_pq_roundtrip_and_distance():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(200, 32)).astype(np.float32)
    cb = pq_train(x, subvectors=4, centroids=16, iters=5)
    codes = pq_encode(cb, jnp.asarray(x))
    assert codes.shape == (200, 4)
    dec = np.asarray(pq_decode(cb, codes))
    mse = ((dec - x) ** 2).mean()
    assert mse < x.var()  # reconstruction beats the mean predictor

    q = jnp.asarray(x[:3])
    dist = np.asarray(pq_distance(cb, q, codes))
    expect = ((x[:3][:, None] - dec[None]) ** 2).sum(-1)
    np.testing.assert_allclose(dist, expect, rtol=1e-3, atol=1e-2)
    # self-match is among the smallest distances
    assert dist[0].argmin() in np.argsort(expect[0])[:5]


def test_binary_hamming():
    x = jnp.asarray([[1.0, -1.0, 1.0, -1.0] * 16,
                     [1.0, -1.0, 1.0, -1.0] * 16,
                     [-1.0, 1.0, -1.0, 1.0] * 16])
    b = binary_quantize(x)
    h = np.asarray(hamming_distance(b, b))
    assert h[0, 1] == 0
    assert h[0, 2] == 64
    sim = np.asarray(binary_similarity(b, b))
    np.testing.assert_allclose(sim[0, 0], 1.0)
    np.testing.assert_allclose(sim[0, 2], 0.0)


# --- compression tiers ------------------------------------------------------

def test_tier_policy():
    assert level_for_access_frequency(0.9) == "none"
    assert level_for_access_frequency(0.6) == "half"
    assert level_for_access_frequency(0.3) == "pq8"
    assert level_for_access_frequency(0.05) == "pq4"
    assert level_for_access_frequency(0.001) == "binary"


def test_compress_roundtrip_all_levels():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(64, 32)).astype(np.float32)
    tc = TensorCompress(pq_subvectors=4, pq_centroids=16)
    prev_bytes = 1e18
    for level, tol in [("none", 0), ("half", 0.05), ("pq8", 3.0),
                       ("pq4", 1.5), ("binary", None)]:
        t = tc.compress_level(jnp.asarray(x), level)
        dec = np.asarray(tc.decompress(t))
        assert dec.shape == x.shape
        if level == "none":
            np.testing.assert_array_equal(dec, x)
        elif tol is not None:
            assert np.abs(dec - x).max() < tol, level
        else:
            # binary keeps only signs
            assert (np.sign(dec) == np.sign(np.where(x > 0, 1.0, -1.0))).mean() > 0.99
        assert t.bytes_per_vector <= prev_bytes or level == "pq4"
        prev_bytes = t.bytes_per_vector
    # compression ratios: binary is 32x smaller than f32
    t_bin = tc.compress_level(jnp.asarray(x), "binary")
    assert t_bin.bytes_per_vector * 32 == 32 * 4  # 4 bytes of bits for 32 dims


# --- BMSSP (AMG), TRUE solver, router ---------------------------------------

def _grid_laplacian(side: int):
    """2D grid Laplacian + I (SPD, not diagonally dominant enough for fast
    Neumann at scale) as COO."""
    n = side * side
    rows, cols, vals = [], [], []
    for i in range(side):
        for j in range(side):
            u = i * side + j
            deg = 0
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < side and 0 <= jj < side:
                    rows.append(u); cols.append(ii * side + jj); vals.append(-1.0)
                    deg += 1
            rows.append(u); cols.append(u); vals.append(deg + 1.0)
    return (np.asarray(rows), np.asarray(cols),
            np.asarray(vals, np.float64), n)


def test_bmssp_amg_solves_grid_laplacian():
    from ruvector_tpu.solver import BmsspSolver

    rows, cols, vals, n = _grid_laplacian(20)    # 400 unknowns, 2 AMG levels
    rng = np.random.default_rng(0)
    x_true = rng.normal(size=n)
    dense = np.zeros((n, n)); dense[rows, cols] = vals
    b = dense @ x_true

    solver = BmsspSolver(tolerance=1e-6, max_cycles=100).setup(
        rows, cols, vals, n)
    assert len(solver._levels) >= 2               # actually coarsened
    x, rnorm, cycles = solver.solve(b)
    assert rnorm / np.linalg.norm(b) < 1e-4
    np.testing.assert_allclose(x, x_true, atol=5e-3)
    assert cycles < 100


def test_true_solver_exact_at_full_sketch():
    """With k = n the JL sketch S is (a.s.) invertible and the sketched
    solve is algebraically exact: S^T(S A S^T)^-1 S b = A^-1 b."""
    from ruvector_tpu.graph.csr import CSRGraph
    from ruvector_tpu.solver import TrueSolver

    rng = np.random.default_rng(1)
    n = 40
    a = np.eye(n) * 4.0
    for i in range(n - 1):
        a[i, i + 1] = a[i + 1, i] = -1.0
    r, c = np.nonzero(a)
    mat = CSRGraph.from_edges(r, c, a[r, c], n)
    x_true = rng.normal(size=n)
    b = a @ x_true

    x = TrueSolver(tolerance=0.5, jl_dimension=n, ridge=0.0).solve(mat, b)
    np.testing.assert_allclose(x, x_true, atol=1e-2)


def test_true_solver_sketch_reduces_dimension():
    from ruvector_tpu.graph.csr import CSRGraph
    from ruvector_tpu.solver import TrueSolver

    n = 500
    r = np.arange(n); mat = CSRGraph.from_edges(r, r, np.full(n, 2.0), n)
    s = TrueSolver(tolerance=0.3)
    s.preprocess(mat)
    k = s._prep[0].shape[0]
    assert 8 <= k < n                  # sublinear sketch
    x = s.solve(mat, np.ones(n))
    assert x.shape == (n,)


def test_router_rule_order():
    from ruvector_tpu.solver import RouterConfig, SolverRouter, SparsityProfile

    router = SolverRouter(RouterConfig())
    dd_sparse = SparsityProfile(rows=1000, nnz=3000, density=0.003,
                                is_diag_dominant=True,
                                estimated_spectral_radius=0.5,
                                estimated_condition=10.0)
    assert router.select_algorithm(dd_sparse) == "neumann"
    well_cond = SparsityProfile(rows=1000, nnz=3000, density=0.003,
                                is_diag_dominant=False,
                                estimated_spectral_radius=1.5,
                                estimated_condition=50.0)
    assert router.select_algorithm(well_cond) == "cg"
    ill = SparsityProfile(rows=2000, nnz=3000, density=0.003,
                          is_diag_dominant=False,
                          estimated_spectral_radius=1.5,
                          estimated_condition=1e4)
    assert router.select_algorithm(ill) == "bmssp"
    assert router.select_algorithm(ill, "pagerank_single") == "forward_push"
    assert router.select_algorithm(ill, "pagerank_pairwise") == "hybrid_random_walk"
    assert router.select_algorithm(dd_sparse, "batch_linear_system",
                                   batch_size=200) == "true"
    assert router.select_algorithm(dd_sparse, "batch_linear_system",
                                   batch_size=10) == "cg"


def test_orchestrator_end_to_end():
    from ruvector_tpu.graph.csr import CSRGraph
    from ruvector_tpu.solver import SolverOrchestrator, analyze_sparsity

    rows, cols, vals, n = _grid_laplacian(10)
    mat = CSRGraph.from_edges(rows, cols, vals, n)
    profile = analyze_sparsity(mat)
    assert profile.is_diag_dominant
    rng = np.random.default_rng(2)
    x_true = rng.normal(size=n)
    dense = np.zeros((n, n)); dense[rows, cols] = vals
    result, algo = SolverOrchestrator().solve(mat, dense @ x_true)
    assert result.converged
    np.testing.assert_allclose(np.asarray(result.x), x_true, atol=1e-2)


# --- temporal tensor store ---------------------------------------------------

def test_bitpack_roundtrip_all_widths():
    from ruvector_tpu.ops.temporal_tensor import dequantize_bits, quantize_bits

    rng = np.random.default_rng(0)
    x = rng.normal(size=300).astype(np.float32)
    for bits in (3, 5, 7, 8):
        packed, scales, n = quantize_bits(x, bits)
        back = dequantize_bits(packed, scales, bits, n)
        qmax = (1 << (bits - 1)) - 1
        # error bounded by one quantization step per group
        step = np.abs(x).max() / qmax
        assert np.max(np.abs(back - x)) <= step + 1e-6, bits


def test_temporal_store_tiers_by_access():
    from ruvector_tpu.ops.temporal_tensor import TemporalTensorStore, TierPolicy

    st = TemporalTensorStore(TierPolicy())
    rng = np.random.default_rng(1)
    hot = rng.normal(size=(4, 64)).astype(np.float32)
    cold = rng.normal(size=(4, 64)).astype(np.float32)
    st.write("hot", hot)
    st.write("cold", cold)
    for _ in range(200):                     # age the clock
        st._now()
    for _ in range(50):                      # hammer the hot tensor NOW
        st.read("hot")
    moved = st.migrate()
    assert st.tier_of("hot") == 8            # stays hot
    assert st.tier_of("cold") == 3           # demoted to 3-bit
    assert "cold" in moved
    assert st.compression_ratio("cold") > 6  # ~32/3 minus scale overhead
    # cold read still approximates the data
    back = np.asarray(st.read("cold"))
    assert np.corrcoef(back.ravel(), cold.ravel())[0, 1] > 0.95


def test_tier_policy_select_bits_reference_semantics():
    from ruvector_tpu.ops.temporal_tensor import TierPolicy

    p = TierPolicy()
    assert p.select_bits(access_count=100, last_access_ts=99, now_ts=100) == 8
    assert p.select_bits(access_count=1, last_access_ts=90, now_ts=100) == 7
    assert p.select_bits(access_count=1, last_access_ts=0, now_ts=10_000) == 3
    assert abs(p.drift_factor() - (1 + 26 / 256)) < 1e-9
