"""Allclose harness: batched TPU RuvectorLayer vs the NumPy oracle that
encodes the reference Rust semantics (ruvector-gnn/src/layer.rs:379-457)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruvector_tpu.graph import NeighborGraph
from ruvector_tpu.nn import (
    RuvectorLayerConfig,
    ruvector_layer_apply,
    ruvector_layer_init,
)
from ruvector_tpu.nn.ruvector_layer import ruvector_layer_apply_single

from tests.oracle import ruvector_layer_forward, to_numpy_params


@pytest.fixture(scope="module")
def setup():
    cfg = RuvectorLayerConfig(input_dim=12, hidden_dim=16, heads=4, dropout=0.1)
    params = ruvector_layer_init(jax.random.key(0), cfg)
    return cfg, params, to_numpy_params(params)


def test_batched_matches_oracle(setup):
    cfg, params, np_params = setup
    rng = np.random.default_rng(7)
    n = 30
    feats = rng.normal(size=(n, cfg.input_dim)).astype(np.float32)
    lists, weights = [], []
    for i in range(n):
        deg = int(rng.integers(0, 7))
        lists.append(rng.choice(n, size=deg, replace=False).tolist())
        weights.append(rng.random(deg).astype(np.float32).tolist())
    g = NeighborGraph.from_lists(lists, weights, max_degree=8)

    out = np.asarray(ruvector_layer_apply(params, cfg, jnp.asarray(feats), g))

    for i in range(n):
        nbr_embs = [feats[j] for j in lists[i]]
        expect = ruvector_layer_forward(
            np_params, cfg.heads, cfg.dropout, feats[i], nbr_embs, weights[i]
        )
        np.testing.assert_allclose(out[i], expect, atol=2e-4, err_msg=f"node {i}")


def test_no_neighbors_shortcircuit(setup):
    cfg, params, np_params = setup
    rng = np.random.default_rng(8)
    feats = rng.normal(size=(4, cfg.input_dim)).astype(np.float32)
    g = NeighborGraph.from_lists([[], [], [], []], max_degree=4)
    out = np.asarray(ruvector_layer_apply(params, cfg, jnp.asarray(feats), g))
    for i in range(4):
        expect = ruvector_layer_forward(np_params, cfg.heads, cfg.dropout, feats[i], [], [])
        np.testing.assert_allclose(out[i], expect, atol=1e-4)


def test_single_node_api(setup):
    cfg, params, np_params = setup
    rng = np.random.default_rng(9)
    node = rng.normal(size=(cfg.input_dim,)).astype(np.float32)
    nbrs = rng.normal(size=(3, cfg.input_dim)).astype(np.float32)
    w = np.asarray([0.3, 0.5, 0.2], np.float32)
    out = np.asarray(
        ruvector_layer_apply_single(
            params, cfg, jnp.asarray(node), jnp.asarray(nbrs), jnp.asarray(w)
        )
    )
    expect = ruvector_layer_forward(
        np_params, cfg.heads, cfg.dropout, node, list(nbrs), w
    )
    np.testing.assert_allclose(out, expect, atol=2e-4)


def test_zero_weight_fallback(setup):
    cfg, params, np_params = setup
    rng = np.random.default_rng(10)
    node = rng.normal(size=(cfg.input_dim,)).astype(np.float32)
    nbrs = rng.normal(size=(2, cfg.input_dim)).astype(np.float32)
    w = np.zeros(2, np.float32)
    out = np.asarray(
        ruvector_layer_apply_single(
            params, cfg, jnp.asarray(node), jnp.asarray(nbrs), jnp.asarray(w)
        )
    )
    expect = ruvector_layer_forward(np_params, cfg.heads, cfg.dropout, node, list(nbrs), w)
    np.testing.assert_allclose(out, expect, atol=2e-4)


def test_config_validation():
    with pytest.raises(ValueError):
        RuvectorLayerConfig(input_dim=4, hidden_dim=8, heads=2, dropout=1.5)
    with pytest.raises(ValueError):
        RuvectorLayerConfig(input_dim=4, hidden_dim=7, heads=3)


def test_jit_and_grad(setup):
    cfg, params, _ = setup
    rng = np.random.default_rng(11)
    feats = jnp.asarray(rng.normal(size=(10, cfg.input_dim)).astype(np.float32))
    g = NeighborGraph.from_lists(
        [[(i + 1) % 10, (i + 2) % 10] for i in range(10)], max_degree=4
    )

    @jax.jit
    def loss_fn(p):
        out = ruvector_layer_apply(p, cfg, feats, g)
        return jnp.sum(out ** 2)

    g_params = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(g_params)
    assert all(np.all(np.isfinite(np.asarray(a))) for a in flat)
    assert any(np.abs(np.asarray(a)).max() > 0 for a in flat)


def test_block_dense_matches_flat():
    """Block-dense (MXU-matmul) layer == padded-slot layer to 2e-4, incl.
    degree-0, zero-weight rows, ragged block tails."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ruvector_tpu.graph import NeighborGraph, build_block_dense
    from ruvector_tpu.nn.block_dense_layer import ruvector_layer_apply_block_dense
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig,
        ruvector_layer_apply,
        ruvector_layer_init,
    )

    rng = np.random.default_rng(11)
    n, d, m = 203, 32, 5                      # ragged tail vs block=64
    feats = rng.normal(size=(n, d)).astype(np.float32)
    idx = rng.integers(0, n, size=(n, m)).astype(np.int32)
    mask = (rng.uniform(size=(n, m)) < 0.8).astype(np.float32)
    mask[7] = 0.0                             # degree-0 node
    ew = rng.uniform(0.0, 1.0, size=(n, m)).astype(np.float32)
    ew[11] = 0.0                              # zero-weight row -> uniform

    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(0), cfg)

    graph = NeighborGraph(jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(ew))
    ref = np.asarray(ruvector_layer_apply(params, cfg, jnp.asarray(feats), graph))

    bdg = build_block_dense(idx, mask, ew, block=64)
    n_pad = bdg.n_blocks * bdg.block
    fpad = np.zeros((n_pad, d), np.float32)
    fpad[:n] = feats
    out = np.asarray(ruvector_layer_apply_block_dense(
        params, cfg, jnp.asarray(fpad), bdg))[:n]
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_block_dense_ragged_leaves_and_ordering():
    """graph_grow_blocks ordering + ragged leaf blocks: parity with the
    flat layer through pad_features/unpad round trip."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ruvector_tpu.graph import NeighborGraph, build_block_dense
    from ruvector_tpu.nn.block_dense_layer import ruvector_layer_apply_block_dense
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig,
        ruvector_layer_apply,
        ruvector_layer_init,
    )
    from ruvector_tpu.parallel.ordering import graph_grow_blocks

    rng = np.random.default_rng(4)
    n, d, m = 257, 32, 6
    feats = rng.normal(size=(n, d)).astype(np.float32)
    idx = np.stack([rng.choice(n, size=m, replace=False)
                    for _ in range(n)]).astype(np.int32)
    mask = (rng.uniform(size=(n, m)) < 0.9).astype(np.float32)
    ew = rng.uniform(0.1, 1.0, size=(n, m)).astype(np.float32)

    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(0), cfg)
    ref = np.asarray(ruvector_layer_apply(
        params, cfg, jnp.asarray(feats),
        NeighborGraph(jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(ew))))

    perm, leaves = graph_grow_blocks(idx, mask, leaf_size=64)
    assert sorted(perm.tolist()) == list(range(n))
    assert sum(leaves) == n
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    idx_r = inv[idx[perm]].astype(np.int32)
    bdg = build_block_dense(idx_r, mask[perm], ew[perm], leaf_sizes=leaves)
    fpad = bdg.pad_features(jnp.asarray(feats[perm]))
    out_pad = ruvector_layer_apply_block_dense(params, cfg, fpad, bdg)
    out = np.asarray(bdg.unpad(out_pad))
    np.testing.assert_allclose(out, ref[perm], atol=2e-4)
