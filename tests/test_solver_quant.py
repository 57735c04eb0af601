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
