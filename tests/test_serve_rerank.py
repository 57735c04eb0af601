"""Attention re-rank + temporal tiered store tests."""

import jax.numpy as jnp
import numpy as np

from ruvector_tpu.ops.temporal_tiers import TemporalTensorStore, TierPolicyConfig
from ruvector_tpu.serve.rerank import attention_rerank, retrieve_and_rerank


def test_retrieve_and_rerank_self_match():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(200, 16)).astype(np.float32))
    queries = np.asarray(feats)[[3, 77]]
    ids, scores = retrieve_and_rerank(queries, feats, ef=32, k=5)
    assert int(ids[0, 0]) == 3
    assert int(ids[1, 0]) == 77
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()   # descending


def test_attention_rerank_shapes():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    pool = jnp.asarray(rng.normal(size=(4, 64, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 1000, size=(4, 64)).astype(np.int32))
    out_ids, out_scores = attention_rerank(q, pool, ids, k=10)
    assert out_ids.shape == (4, 10)
    assert np.all(np.isfinite(np.asarray(out_scores)))


# --- temporal tiers ----------------------------------------------------------

def test_temporal_store_roundtrip_and_demotion():
    clock = [0.0]
    store = TemporalTensorStore(
        dim=16,
        policy=TierPolicyConfig(hot_threshold=0.5, warm_threshold=0.05,
                                decay_per_second=1.0, demote_interval_s=0.0),
        clock=lambda: clock[0],
    )
    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, 16)).astype(np.float32)
    store.write(0, x)
    assert store.tier_of(0) == "hot"
    got = np.asarray(store.read(0))
    assert np.abs(got - x).max() < np.ptp(x) / 255 * 2   # 8-bit accuracy

    # age the chunk -> demote to warm then cold
    clock[0] += 3.0
    store.tick(force=True)
    assert store.tier_of(0) == "warm"
    got_warm = np.asarray(store.read(0))    # read bumps the score
    assert np.abs(got_warm - x).max() < np.ptp(x) / 15 * 2   # 4-bit accuracy

    clock[0] += 60.0
    store.tick(force=True)
    assert store.tier_of(0) == "cold"
    got_cold = np.asarray(store.read(0))
    assert np.abs(got_cold - x).max() < np.ptp(x) / 7 * 2    # ~3-bit accuracy


def test_temporal_store_promotion_and_stats():
    clock = [0.0]
    store = TemporalTensorStore(
        dim=8,
        policy=TierPolicyConfig(decay_per_second=1.0, demote_interval_s=0.0),
        clock=lambda: clock[0],
    )
    x = np.ones((4, 8), np.float32)
    store.write(0, x)
    store.write(1, x)
    clock[0] += 10.0
    store.tick(force=True)
    assert store.tier_of(0) == "cold"
    # hot access promotes back
    for _ in range(5):
        store.read(0)
    store.tick(force=True)
    assert store.tier_of(0) == "hot"
    s = store.stats()
    assert s["hot"] == 1 and s["cold"] == 1
    assert s["compression_ratio"] > 1.0
