"""Background training worker + params JSON serde."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.nn import RuvectorLayerConfig, ruvector_layer_init
from ruvector_tpu.nn.serde import params_from_json, params_to_json
from ruvector_tpu.training.worker import GnnTrainingWorker, JobStatus


def test_params_json_roundtrip():
    cfg = RuvectorLayerConfig(input_dim=8, hidden_dim=8, heads=2)
    params = ruvector_layer_init(jax.random.key(0), cfg)
    text = params_to_json(params)
    restored = params_from_json(text)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # list-of-dicts (multi-layer nets) round-trip too
    stack = [params, params]
    restored2 = params_from_json(params_to_json(stack))
    assert isinstance(restored2, list) and len(restored2) == 2


def test_worker_trains_and_publishes():
    calls = []

    def train_fn(collection, epochs):
        calls.append(collection)
        return {"weights": np.ones(4) * epochs}, 0.5 / epochs

    w = GnnTrainingWorker(train_fn)
    try:
        jid = w.enqueue("products", epochs=2)
        job = w.wait(jid, timeout=10)
        assert job.status is JobStatus.DONE
        assert job.loss == 0.25
        model = w.model("products")
        np.testing.assert_array_equal(model["weights"], np.full(4, 2.0))
        assert calls == ["products"]
    finally:
        w.shutdown()


def test_worker_failure_keeps_running():
    def train_fn(collection, epochs):
        if collection == "bad":
            raise ValueError("boom")
        return "ok", 0.1

    w = GnnTrainingWorker(train_fn)
    try:
        bad = w.wait(w.enqueue("bad"), timeout=10)
        assert bad.status is JobStatus.FAILED
        assert "boom" in bad.error
        good = w.wait(w.enqueue("good"), timeout=10)
        assert good.status is JobStatus.DONE
        assert w.model("good") == "ok"
    finally:
        w.shutdown()


def test_worker_retrain_throttle():
    count = [0]

    def train_fn(collection, epochs):
        count[0] += 1
        return count[0], 0.0

    w = GnnTrainingWorker(train_fn, min_retrain_interval_s=3600.0)
    try:
        w.wait(w.enqueue("c"), timeout=10)
        skipped = w.wait(w.enqueue("c"), timeout=10)   # throttled
        assert "skipped" in skipped.error
        forced = w.wait(w.enqueue("c", force=True), timeout=10)
        assert forced.error == ""
        assert count[0] == 2
    finally:
        w.shutdown()
