"""Aux subsystem tests: checkpoint roundtrip + corruption detection,
metrics, profiler, witness chains, cold-tier streaming."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruvector_tpu.utils import (
    Counter,
    Histogram,
    MetricsRegistry,
    Profiler,
    WitnessLog,
    restore_checkpoint,
    save_checkpoint,
    tensor_witness,
)
from ruvector_tpu.utils.cold_tier import (
    AdaptiveHotset,
    ColdTierTrainer,
    FeatureStorage,
    HyperbatchConfig,
    HyperbatchIterator,
)


def test_checkpoint_roundtrip_npz(tmp_path):
    tree = {"a": jnp.asarray([1.0, 2.0]), "b": {"c": jnp.ones((3, 4))},
            "lst": [jnp.zeros(2), jnp.ones(2)]}
    save_checkpoint(tmp_path, tree, step=7, use_orbax=False)
    restored = restore_checkpoint(tmp_path, tree, step=7, use_orbax=False)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_detects_corruption(tmp_path):
    tree = {"w": jnp.ones(8)}
    path = save_checkpoint(tmp_path, tree, step=0, use_orbax=False)
    # corrupt the file
    data = np.load(path)
    np.savez(path[:-4], w=np.asarray(data["w"]) + 1.0)
    with pytest.raises(ValueError, match="checksum"):
        restore_checkpoint(tmp_path, tree, step=0, use_orbax=False)


def test_metrics_counter_histogram():
    reg = MetricsRegistry()
    c = reg.counter("search_total", "searches")
    c.inc(collection="a")
    c.inc(collection="a")
    c.inc(collection="b")
    assert c.get(collection="a") == 2

    h = reg.histogram("latency_seconds")
    for v in [0.0002, 0.003, 0.004, 0.2]:
        h.observe(v, op="search")
    assert h.percentile(50, op="search") <= 0.005
    text = reg.expose()
    assert "search_total" in text and "latency_seconds_bucket" in text
    assert reg.health()["status"] == "healthy"


def test_histogram_timer():
    h = Histogram("t")
    with h.time():
        pass
    assert h._total[()] == 1


def test_profiler_regions_and_csv():
    prof = Profiler()
    x = jnp.ones((100, 100))
    for _ in range(3):
        with prof.region("matmul") as holder:
            holder.append(jnp.dot(x, x))
    s = prof.summary()
    assert s["matmul"]["count"] == 3
    assert s["matmul"]["mean_ms"] > 0
    csv_text = prof.to_csv()
    assert "matmul" in csv_text
    assert len(Profiler.config_hash({"a": 1})) == 16


def test_witness_deterministic_and_chained():
    log1, log2 = WitnessLog(), WitnessLog()
    x = np.arange(10, dtype=np.float32)
    for log in (log1, log2):
        log.record("logits", x, step=1)
        log.record("activations", x * 2, step=2)
    assert log1.head == log2.head
    assert log1.verify()
    # different data -> different chain
    log3 = WitnessLog()
    log3.record("logits", x + 1, step=1)
    assert log3.head != log1.head
    # tamper detection
    log1.records[0].tensor_hash = "0" * 64
    assert not log1.verify()


def test_tensor_witness_shape_sensitivity():
    a = np.zeros((2, 3), np.float32)
    b = np.zeros((3, 2), np.float32)
    assert tensor_witness(a) != tensor_witness(b)


# --- cold tier --------------------------------------------------------------

def test_feature_storage_roundtrip(tmp_path):
    fs = FeatureStorage.create(tmp_path / "feat.npy", dim=8, num_nodes=100)
    rng = np.random.default_rng(0)
    data = rng.normal(size=(100, 8)).astype(np.float32)
    fs.write_batch(np.arange(100), data)
    fs.flush()
    fs2 = FeatureStorage.open(tmp_path / "feat.npy")
    got = fs2.read_batch(np.asarray([5, 50, 99]))
    np.testing.assert_array_equal(got, data[[5, 50, 99]])


def test_hyperbatch_iterator_covers_epoch(tmp_path):
    fs = FeatureStorage.create(tmp_path / "f.npy", dim=4, num_nodes=25)
    data = np.arange(100, dtype=np.float32).reshape(25, 4)
    fs.write_batch(np.arange(25), data)
    order = np.random.default_rng(1).permutation(25)
    it = HyperbatchIterator(fs, HyperbatchConfig(batch_size=10), order)
    seen = []
    while True:
        batch = it.next_batch()
        if batch is None:
            break
        ids, feats = batch
        seen.extend(ids.tolist())
        np.testing.assert_array_equal(np.asarray(feats), data[ids])
    assert sorted(seen) == list(range(25))
    assert it.batch_counter == 3


def test_cold_tier_trainer_epoch(tmp_path):
    fs = FeatureStorage.create(tmp_path / "f.npy", dim=4, num_nodes=32)
    fs.write_batch(np.arange(32),
                   np.ones((32, 4), np.float32))

    def step(ids, feats):
        return jnp.mean(feats ** 2)

    trainer = ColdTierTrainer(fs, HyperbatchConfig(batch_size=8))
    stats = trainer.train_epoch(step)
    assert stats.batches == 4
    np.testing.assert_allclose(stats.loss, 1.0, atol=1e-6)
    assert stats.io_time_s >= 0 and stats.compute_time_s > 0


def test_adaptive_hotset_lfu():
    hs = AdaptiveHotset(capacity=2)
    loads = []

    def loader(i):
        loads.append(i)
        return i * 10

    # 0 and 1 become hot
    for _ in range(3):
        hs.access(0, loader)
        hs.access(1, loader)
    assert hs.access(0, loader) == 0
    assert loads.count(0) == 1          # cached after first load
    # 2 is cold: loaded but not necessarily retained over hot entries
    hs.access(2, loader)
    assert 0 in hs.hit_rate_nodes() and 1 in hs.hit_rate_nodes()
    hs.decay_scores()
    assert all(v < 4 for v in hs.scores.values())


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Sharded arrays checkpoint + restore with shardings preserved
    (the orbax-style sharded checkpoint of SURVEY §5's mapping)."""
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ruvector_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    sharding = NamedSharding(mesh, P("nodes"))
    x = jax.device_put(jnp.arange(64.0).reshape(16, 4), sharding)
    tree = {"feats": x, "step_scalar": jnp.asarray(3.0)}
    save_checkpoint(tmp_path, tree, step=1, use_orbax=False)

    proto = {"feats": jnp.zeros((16, 4)), "step_scalar": jnp.zeros(())}
    restored = restore_checkpoint(tmp_path, proto, step=1, use_orbax=False)
    np.testing.assert_array_equal(np.asarray(restored["feats"]), np.asarray(x))
    # re-shard the restored array onto the mesh: value preserved
    resharded = jax.device_put(restored["feats"], sharding)
    np.testing.assert_array_equal(np.asarray(resharded), np.asarray(x))


def test_training_metrics_hook():
    from ruvector_tpu.training.metrics_hook import TrainingMetrics

    tm = TrainingMetrics(edges_per_step=1000)
    for loss in [1.0, 0.8, 0.5]:
        tm.record_step(loss, 0.01)
    assert tm.steps.get() == 3
    assert tm.loss_sum.get() == 2.3
    assert tm.edges_per_second() > 0
    text = tm.registry.expose()
    assert "train_step_seconds" in text


def test_training_metrics_timed_step():
    from ruvector_tpu.training.metrics_hook import TrainingMetrics

    tm = TrainingMetrics()
    out = tm.timed_step(lambda x: (x, None, jnp.asarray(0.7)), 5)
    assert out[0] == 5
    assert abs(tm.loss_sum.get() - 0.7) < 1e-6


# --- mmap store --------------------------------------------------------------

def test_mmap_store_roundtrip_and_dirty_flush(tmp_path):
    from ruvector_tpu.utils.mmap_store import MmapEmbeddingStore

    st = MmapEmbeddingStore(tmp_path / "emb.bin", num_nodes=300, dim=8,
                            create=True)
    rng = np.random.default_rng(0)
    vals = rng.normal(size=(300, 8)).astype(np.float32)
    st.set_batch(np.arange(300), vals)
    assert st.flush_dirty() > 0
    assert st.flush_dirty() == 0          # clean after flush

    st.set_embedding(5, np.ones(8, np.float32))
    assert st.dirty.test(5 // st.PAGE_ROWS)
    np.testing.assert_array_equal(st.get_embedding(5), np.ones(8))
    st.prefetch(np.asarray([0, 100, 299]))     # no-op safe
    st.close()

    st2 = MmapEmbeddingStore(tmp_path / "emb.bin", num_nodes=300, dim=8)
    np.testing.assert_array_equal(st2.get_embedding(7), vals[7])


def test_mmap_gradient_accumulator(tmp_path):
    from ruvector_tpu.utils.mmap_store import (
        MmapEmbeddingStore, MmapGradientAccumulator,
    )

    st = MmapEmbeddingStore(tmp_path / "e.bin", num_nodes=50, dim=4,
                            create=True)
    st.set_batch(np.arange(50), np.zeros((50, 4), np.float32))
    acc = MmapGradientAccumulator(tmp_path / "g.bin", num_nodes=50, dim=4)
    # node 3 hit twice with grad 1.0 -> averaged grad 1.0
    acc.accumulate(np.asarray([3, 7]), np.ones((2, 4), np.float32))
    acc.accumulate(np.asarray([3]), np.ones((1, 4), np.float32))
    n = acc.apply(st, lr=0.5)
    assert n == 2
    np.testing.assert_allclose(st.get_embedding(3), -0.5 * np.ones(4))
    np.testing.assert_allclose(st.get_embedding(7), -0.5 * np.ones(4))
    assert acc.apply(st, lr=0.5) == 0      # accumulator zeroed


# --- monitoring --------------------------------------------------------------

def test_metric_watcher_edge_triggered_with_hysteresis():
    from ruvector_tpu.utils.monitoring import MetricWatcher

    fired = []
    w = MetricWatcher()
    w.watch("lambda", threshold=0.8, direction="above",
            callback=lambda n, v: fired.append(v), hysteresis=0.1)
    for v in [0.5, 0.85, 0.9, 0.95]:       # crossing fires ONCE
        w.observe("lambda", v)
    assert fired == [0.85]
    w.observe("lambda", 0.65)              # rearm (below 0.7)
    w.observe("lambda", 0.9)               # fires again
    assert fired == [0.85, 0.9]
    assert w.recent("lambda") == [0.5, 0.85, 0.9, 0.95, 0.65, 0.9]


def test_health_monitor_states_and_quorum():
    from ruvector_tpu.utils.monitoring import HealthMonitor

    hm = HealthMonitor(unhealthy_after=2, unresponsive_after_s=5.0)
    for m in ("a", "b", "c"):
        hm.report_success(m)
    assert hm.quorum_healthy()
    hm.report_failure("c"); hm.report_failure("c")
    assert hm.members["c"].status == "unhealthy"
    assert hm.quorum_healthy()             # 2/3 healthy
    # silence member b past the deadline
    hm.members["b"].last_seen -= 10.0
    statuses = hm.sweep()
    assert statuses["b"] == "unresponsive"
    assert not hm.quorum_healthy()         # 1/3 healthy


def test_async_sharded_checkpoint_roundtrip(tmp_path):
    """AsyncShardedCheckpointer: per-shard background save, restore onto
    the same mesh sharding; resume-identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ruvector_tpu.utils.checkpoint import AsyncShardedCheckpointer

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("x",))
    sh = NamedSharding(mesh, P("x"))
    n = 8 * len(devs)
    tree = {
        "feats": jax.device_put(
            jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4), sh),
        "step_scalar": jnp.float32(3.5),
        "opt": {"m": jax.device_put(jnp.ones((n, 4)) * 2, sh)},
    }
    ck = AsyncShardedCheckpointer(tmp_path)
    ck.save(tree, step=7)
    ck.wait_until_finished()

    proto = jax.tree.map(jnp.zeros_like, tree)
    out = ck.restore(proto, step=7)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored arrays keep the mesh sharding
    assert out["feats"].sharding.is_equivalent_to(sh, 2)


def test_meta_to_index_never_evals():
    """ADVICE r2: shard-index strings from an archive must be parsed
    structurally, not eval'd — malicious strings raise instead of run."""
    import pytest

    from ruvector_tpu.utils.checkpoint import _meta_to_index

    assert _meta_to_index("()") == ()
    assert _meta_to_index(
        "(slice(0, 4, None), slice(None, None, None))") == (
        slice(0, 4, None), slice(None, None, None))
    assert _meta_to_index([[0, 4, None]]) == (slice(0, 4, None),)
    with pytest.raises(ValueError):
        _meta_to_index("__import__('os').system('true')")
    with pytest.raises(ValueError):
        _meta_to_index("slice(__import__('os'), 1, None)")
