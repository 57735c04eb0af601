"""Pallas kernel correctness (interpret mode on CPU) vs XLA oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruvector_tpu.attention.scaled_dot import scaled_dot_attention
from ruvector_tpu.ops.pallas.flash_neighbor import flash_neighbor_attention
from ruvector_tpu.ops.pallas.spmm import spmm_pallas
from ruvector_tpu.ops.segment import spmm_padded


def test_flash_neighbor_matches_dense():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(8, 256, 128)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(8, 256, 128)).astype(np.float32))
    out = flash_neighbor_attention(q, k, v, tile_b=8, block_m=128,
                                   interpret=True)
    expect = scaled_dot_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-4)


def test_flash_neighbor_masked():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(8, 256, 128)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(8, 256, 128)).astype(np.float32))
    mask = jnp.asarray((rng.random((8, 256)) > 0.5).astype(np.float32))
    out = flash_neighbor_attention(q, k, v, mask, tile_b=8, block_m=128,
                                   interpret=True)
    expect = scaled_dot_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-4)


def test_flash_neighbor_fully_masked_rows():
    q = jnp.ones((8, 128))
    k = jnp.ones((8, 128, 128))
    v = jnp.ones((8, 128, 128))
    mask = jnp.zeros((8, 128))
    out = flash_neighbor_attention(q, k, v, mask, tile_b=8, block_m=128,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_flash_neighbor_padding():
    # non-multiple shapes exercise the padding path
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(5, 128)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(5, 100, 128)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(5, 100, 128)).astype(np.float32))
    out = flash_neighbor_attention(q, k, v, tile_b=8, block_m=128,
                                   interpret=True)
    expect = scaled_dot_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-4)


def test_spmm_pallas_matches_xla():
    rng = np.random.default_rng(3)
    n, b, m, d = 200, 64, 16, 128
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(b, m)).astype(np.int32))
    mask = jnp.asarray((rng.random((b, m)) > 0.3).astype(np.float32))
    w = jnp.asarray(rng.random((b, m)).astype(np.float32)) * mask
    out = spmm_pallas(feats, idx, w, tile_b=32, interpret=True)
    expect = spmm_padded(feats, idx, w, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-4, rtol=1e-4)


def test_fused_neighbor_mix_matches_xla_path():
    """The Pallas fused layer kernel must reproduce the XLA folded path."""
    from ruvector_tpu.graph import NeighborGraph
    from ruvector_tpu.nn import RuvectorLayerConfig, ruvector_layer_init
    from ruvector_tpu.nn.ruvector_layer import ruvector_layer_apply

    rng = np.random.default_rng(5)
    n, d = 50, 32
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    lists = [rng.choice(n, size=int(rng.integers(0, 6)), replace=False).tolist()
             for _ in range(n)]
    weights = [rng.random(len(l)).astype(np.float32).tolist() for l in lists]
    graph = NeighborGraph.from_lists(lists, weights, max_degree=8)

    cfg_xla = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    cfg_pl = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4,
                                 use_pallas=True)
    params = ruvector_layer_init(jax.random.key(0), cfg_xla)
    out_xla = ruvector_layer_apply(params, cfg_xla, feats, graph)
    out_pl = ruvector_layer_apply(params, cfg_pl, feats, graph)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               atol=1e-4)
