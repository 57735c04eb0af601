"""SONA export (safetensors format) + federated aggregation tests."""

import json
import struct

import numpy as np
import pytest

from ruvector_tpu.sona import SonaConfig, SonaEngine
from ruvector_tpu.sona.export import (
    export_lora,
    export_trajectory_dataset,
    import_lora,
    load_safetensors,
    save_safetensors,
)
from ruvector_tpu.sona.federated import FederatedAggregator
from ruvector_tpu.sona.types import QueryTrajectory, TrajectoryStep


def test_safetensors_roundtrip(tmp_path):
    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": np.ones((2, 2), np.float32),
    }
    p = tmp_path / "t.safetensors"
    save_safetensors(p, tensors, metadata={"k": "v"})
    loaded, meta = load_safetensors(p)
    np.testing.assert_array_equal(loaded["a"], tensors["a"])
    np.testing.assert_array_equal(loaded["b"], tensors["b"])
    assert meta["k"] == "v"
    # wire format sanity: 8-byte LE header length + JSON header
    raw = p.read_bytes()
    (hlen,) = struct.unpack("<Q", raw[:8])
    header = json.loads(raw[8 : 8 + hlen])
    assert header["a"]["dtype"] == "F32"
    assert header["a"]["shape"] == [3, 4]


def make_engine(seed=0):
    cfg = SonaConfig(hidden_dim=8, embedding_dim=8, flush_threshold=1,
                     quality_threshold=0.0, num_layers=2)
    engine = SonaEngine(config=cfg)
    rng = np.random.default_rng(seed)
    for _ in range(4):
        b = engine.begin_trajectory(rng.normal(size=8).astype(np.float32))
        b.add_step(rng.normal(size=8).astype(np.float32), np.ones(1), 1.0)
        engine.end_trajectory(b, quality=0.9)
    engine.flush()
    return engine


def test_lora_export_import_roundtrip(tmp_path):
    e1 = make_engine(0)
    p = tmp_path / "lora.safetensors"
    export_lora(e1, p)

    e2 = make_engine(1)
    import_lora(e2, p)
    np.testing.assert_array_equal(
        e2.coordinator.instant.micro_lora.up,
        e1.coordinator.instant.micro_lora.up,
    )
    x = np.ones((1, 8), np.float32)
    np.testing.assert_allclose(
        np.asarray(e1.apply_micro_lora(x)),
        np.asarray(e2.apply_micro_lora(x)), atol=1e-6,
    )


def test_trajectory_dataset_export(tmp_path):
    t = QueryTrajectory(
        id=1, query_embedding=np.ones(4, np.float32),
        steps=[TrajectoryStep(np.zeros(4, np.float32), np.ones(1), 0.5, "s")],
        final_quality=0.8, model_route="fast",
    )
    p = tmp_path / "ds.jsonl"
    export_trajectory_dataset([t], p)
    lines = p.read_text().strip().split("\n")
    rec = json.loads(lines[0])
    assert rec["quality"] == 0.8
    assert rec["steps"][0]["reward"] == 0.5


def test_federated_aggregation():
    engines = [make_engine(s) for s in range(3)]
    agg = FederatedAggregator(hidden_dim=8, num_layers=2)
    updates = [agg.collect(e, weight=w) for e, w in zip(engines, [1.0, 1.0, 2.0])]
    merged = agg.aggregate(updates)

    expect = (updates[0].micro_up * 0.25 + updates[1].micro_up * 0.25
              + updates[2].micro_up * 0.5)
    np.testing.assert_allclose(merged.micro_up, expect, atol=1e-6)

    target = make_engine(9)
    agg.apply(target, merged)
    np.testing.assert_array_equal(
        target.coordinator.instant.micro_lora.up, merged.micro_up
    )
