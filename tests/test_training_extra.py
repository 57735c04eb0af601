"""Q15 ops, online learning path, EWC-integrated train step, HNSW save/load."""

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph import build_knn_graph
from ruvector_tpu.nn import RuvectorLayerConfig, ruvector_layer_init
from ruvector_tpu.ops.q15 import (
    Q15_MAX,
    f32_to_q15,
    q15_add,
    q15_dot,
    q15_lerp,
    q15_matmul,
    q15_mul,
    q15_to_f32,
)
from ruvector_tpu.training import ewc_compute_fisher, ewc_consolidate, ewc_init
from ruvector_tpu.training.optimizers import adam
from ruvector_tpu.training.train import (
    OnlineConfig,
    TrainConfig,
    make_online_update,
    make_train_step,
)


# --- Q15 --------------------------------------------------------------------

def test_q15_roundtrip():
    x = jnp.asarray([0.0, 0.5, -0.5, 0.999, -1.0])
    q = f32_to_q15(x)
    back = q15_to_f32(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_q15_saturation():
    assert int(f32_to_q15(jnp.asarray(2.0))) == Q15_MAX
    big = f32_to_q15(jnp.asarray([0.9]))
    assert int(q15_add(big, big)[0]) == Q15_MAX


def test_q15_mul_and_dot():
    a = f32_to_q15(jnp.asarray([0.5, 0.25]))
    b = f32_to_q15(jnp.asarray([0.5, 0.5]))
    prod = q15_to_f32(q15_mul(a, b))
    np.testing.assert_allclose(np.asarray(prod), [0.25, 0.125], atol=1e-3)
    d = q15_to_f32(q15_dot(a, b))
    np.testing.assert_allclose(float(d), 0.375, atol=1e-3)


def test_q15_lerp_deterministic():
    a = f32_to_q15(jnp.asarray([0.0]))
    b = f32_to_q15(jnp.asarray([0.5]))
    t = f32_to_q15(jnp.asarray([0.5]))
    out1 = q15_lerp(a, b, t)
    out2 = q15_lerp(a, b, t)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_allclose(float(q15_to_f32(out1)[0]), 0.25, atol=1e-3)


def test_q15_matmul():
    a = f32_to_q15(jnp.asarray([[0.5, 0.0], [0.0, 0.5]]))
    b = f32_to_q15(jnp.asarray([[0.5, 0.0], [0.0, -0.5]]))
    out = q15_to_f32(q15_matmul(a, b))
    np.testing.assert_allclose(np.asarray(out), [[0.25, 0], [0, -0.25]],
                               atol=1e-3)


# --- online learning --------------------------------------------------------

def test_online_update_moves_query_embedding():
    rng = np.random.default_rng(0)
    n, d = 30, 16
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    graph = build_knn_graph(feats, k=4)
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(0), cfg)

    update = make_online_update(cfg, OnlineConfig(local_steps=3),
                                learning_rate=0.01)
    negs = jnp.asarray([20, 21, 22, 23], jnp.int32)
    new_params, new_feats = update(params, feats, graph, jnp.int32(5), negs)
    # query node embedding moved; other nodes untouched
    assert not np.allclose(np.asarray(new_feats[5]), np.asarray(feats[5]))
    np.testing.assert_array_equal(np.asarray(new_feats[6]), np.asarray(feats[6]))
    # propagate_updates=True also moved the layer params
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(new_params),
                        jax.tree_util.tree_leaves(params))
    )
    assert changed


def test_online_update_no_propagation_keeps_params():
    rng = np.random.default_rng(1)
    n, d = 20, 8
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    graph = build_knn_graph(feats, k=3)
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=2)
    params = ruvector_layer_init(jax.random.key(1), cfg)
    update = make_online_update(cfg, OnlineConfig(local_steps=2,
                                                  propagate_updates=False))
    negs = jnp.asarray([15, 16], jnp.int32)
    new_params, new_feats = update(params, feats, graph, jnp.int32(2), negs)
    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- EWC-integrated train step ----------------------------------------------

def test_train_step_with_ewc_penalty_pulls_toward_anchor():
    rng = np.random.default_rng(2)
    n, d = 40, 8
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    graph = build_knn_graph(feats, k=4)
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=2)
    params = ruvector_layer_init(jax.random.key(2), cfg)

    # consolidated EWC at current params with uniform Fisher
    ewc = ewc_init(params, lam=1e5)
    ones = jax.tree.map(jnp.ones_like, params)
    ewc = ewc_compute_fisher(ewc, [ones])
    ewc = ewc_consolidate(ewc, params)

    tc = TrainConfig(batch_size=8, n_negatives=4, learning_rate=0.05)
    opt = adam(tc.learning_rate)
    step_plain = make_train_step(cfg, opt, tc, with_ewc=False)
    step_ewc = make_train_step(cfg, opt, tc, with_ewc=True)

    anchors = jnp.arange(8, dtype=jnp.int32)
    negs = jnp.asarray(rng.integers(20, 40, size=(8, 4)).astype(np.int32))

    # the train step donates its inputs: keep a host copy for comparison and
    # give each run its own device copy
    ref = jax.tree.map(lambda a: np.asarray(a).copy(), params)
    fresh = lambda: jax.tree.map(jnp.asarray, ref)
    p1, s1 = fresh(), opt.init(fresh())
    p2, s2 = fresh(), opt.init(fresh())
    for _ in range(5):
        p1, s1, _ = step_plain(p1, s1, feats, graph, anchors, negs)
        p2, s2, _ = step_ewc(p2, s2, feats, graph, anchors, negs, ewc)

    def drift(p):
        return sum(
            float(np.abs(np.asarray(a) - b).sum())
            for a, b in zip(jax.tree_util.tree_leaves(p),
                            jax.tree_util.tree_leaves(ref))
        )

    assert drift(p2) < drift(p1)   # EWC pins params near the anchor


# --- HNSW persistence -------------------------------------------------------

def test_hnsw_save_load(tmp_path):
    from ruvector_tpu.index import HnswConfig, HnswIndex

    rng = np.random.default_rng(3)
    data = rng.normal(size=(100, 8)).astype(np.float32)
    idx = HnswIndex(HnswConfig(dim=8, m=8, seed=7))
    idx.add_batch(data)
    idx.save(tmp_path / "index", data)

    idx2, vecs = HnswIndex.load(tmp_path / "index")
    assert len(idx2) == 100
    np.testing.assert_array_equal(vecs, data)
    ids, _ = idx2.search(data[42], k=1)
    assert ids[0] == 42
