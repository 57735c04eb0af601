"""Randomized property sweeps (the reference's proptest role,
ruvector-core/tests/property_tests.rs): invariants over random inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruvector_tpu.graph import CSRGraph, NeighborGraph
from ruvector_tpu.nn import RuvectorLayerConfig, ruvector_layer_init
from ruvector_tpu.nn.ruvector_layer import ruvector_layer_apply
from ruvector_tpu.ops.quantization import (
    int4_dequantize,
    int4_quantize,
    scalar_dequantize,
    scalar_quantize,
)
from ruvector_tpu.ops.segment import masked_softmax, spmm_csr, spmm_padded


@pytest.mark.parametrize("seed", range(5))
def test_prop_masked_softmax_rows_sum_one_or_zero(seed):
    rng = np.random.default_rng(seed)
    shape = (int(rng.integers(1, 20)), int(rng.integers(1, 30)))
    scores = jnp.asarray(rng.normal(scale=10, size=shape).astype(np.float32))
    mask = jnp.asarray((rng.random(shape) > rng.random()).astype(np.float32))
    out = np.asarray(masked_softmax(scores, mask))
    sums = out.sum(axis=-1)
    has = np.asarray(mask).sum(axis=-1) > 0
    np.testing.assert_allclose(sums[has], 1.0, rtol=1e-4)
    np.testing.assert_allclose(sums[~has], 0.0, atol=1e-6)
    assert (out >= 0).all()


@pytest.mark.parametrize("seed", range(5))
def test_prop_spmm_layouts_agree(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(5, 60))
    max_deg = int(rng.integers(1, 9))
    lists = [rng.choice(n, size=int(rng.integers(0, max_deg + 1)),
                        replace=False).tolist() for _ in range(n)]
    weights = [rng.random(len(l)).astype(np.float32).tolist() for l in lists]
    g = NeighborGraph.from_lists(lists, weights, max_degree=max_deg)
    x = jnp.asarray(rng.normal(size=(n, int(rng.integers(2, 40)))).astype(np.float32))
    a = np.asarray(spmm_padded(x, g.nbr_idx, g.edge_weight, g.nbr_mask))
    b = np.asarray(spmm_csr(g.to_csr(), x))
    np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize("seed", range(4))
def test_prop_layer_output_finite_any_graph(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(3, 40))
    d = int(rng.integers(1, 5)) * 8
    lists = [rng.choice(n, size=int(rng.integers(0, 5)),
                        replace=False).tolist() for _ in range(n)]
    g = NeighborGraph.from_lists(lists, max_degree=6)
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(seed), cfg)
    feats = jnp.asarray(rng.normal(scale=5, size=(n, d)).astype(np.float32))
    out = np.asarray(ruvector_layer_apply(params, cfg, feats, g))
    assert np.all(np.isfinite(out))


@pytest.mark.parametrize("seed", range(5))
def test_prop_quantization_error_bounds(seed):
    rng = np.random.default_rng(300 + seed)
    x = jnp.asarray(rng.normal(scale=rng.random() * 10 + 0.1,
                               size=(int(rng.integers(2, 30)),
                                     int(rng.integers(4, 100)))).astype(np.float32))
    rangex = float(np.ptp(np.asarray(x), axis=1).max())
    err8 = np.abs(np.asarray(scalar_dequantize(scalar_quantize(x)) - x)).max()
    assert err8 <= rangex / 255.0 + 1e-5
    err4 = np.abs(np.asarray(int4_dequantize(int4_quantize(x)) - x)).max()
    assert err4 <= rangex / 15.0 + 1e-5


@pytest.mark.parametrize("seed", range(4))
def test_prop_csr_roundtrip(seed):
    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(4, 50))
    e = int(rng.integers(1, n * 3))
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    w = rng.random(e).astype(np.float32)
    csr = CSRGraph.from_edges(src, dst, w, n)
    assert csr.num_edges == e
    rows = np.asarray(csr.row_ids())
    # every edge preserved as a (src, dst, w) multiset
    got = sorted(zip(rows.tolist(), np.asarray(csr.col_idx).tolist(),
                     np.round(np.asarray(csr.values), 5).tolist()))
    want = sorted(zip(src.tolist(), dst.tolist(), np.round(w, 5).tolist()))
    assert got == want


@pytest.mark.parametrize("seed", range(5))
def test_prop_bitpack_roundtrip_bounded(seed):
    """Any width, any length: dequantize error <= one step per group."""
    from ruvector_tpu.ops.temporal_tensor import dequantize_bits, quantize_bits

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 500))
    bits = int(rng.choice([3, 5, 7, 8]))
    scale = float(rng.uniform(0.01, 100.0))
    x = (rng.normal(size=n) * scale).astype(np.float32)
    packed, scales, n_out = quantize_bits(x, bits)
    back = dequantize_bits(packed, scales, bits, n_out)
    qmax = (1 << (bits - 1)) - 1
    step = np.abs(x).max() / qmax + 1e-6
    assert back.shape == x.shape
    assert np.max(np.abs(back - x)) <= step


@pytest.mark.parametrize("seed", range(3))
def test_prop_mask_builder_subset_of_union(seed):
    """Composed masks equal the union of their parts; causal only removes."""
    from ruvector_tpu.attention.mask import SparseMaskBuilder

    rng = np.random.default_rng(seed)
    s = int(rng.integers(8, 48))
    w = int(rng.integers(1, 5))
    g = rng.integers(0, s, size=2)
    a = np.asarray(SparseMaskBuilder(s).add_local_window(w).build())
    b = np.asarray(SparseMaskBuilder(s).add_global_tokens(g).build())
    u = np.asarray(SparseMaskBuilder(s).add_local_window(w)
                   .add_global_tokens(g).build())
    np.testing.assert_array_equal(u, a | b)
    c = np.asarray(SparseMaskBuilder(s).add_local_window(w)
                   .add_global_tokens(g).add_causal().build())
    assert not (c & ~u).any()
