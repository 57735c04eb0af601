"""Perf-assertion gates (the reference gates perf in CI:
ruvector-cli/tests/gnn_performance_test.rs:32,69 asserts layer create
<100ms and forward <5ms in release builds).

CPU gates always run (loose bounds — catch catastrophic regressions, not
noise). TPU gates run only when the backend is a real TPU AND
RUVECTOR_PERF_GATES=tpu is set (tunnel compiles cost minutes; the driver
opts in explicitly). Thresholds live in PERF_GATES.json, committed with
each bench refresh; regressions >20% vs the committed artifact fail.
"""
import json
import os
import time
from pathlib import Path

import numpy as np
import pytest

GATES = json.loads(
    (Path(__file__).resolve().parent.parent / "PERF_GATES.json").read_text())


def _backend():
    import jax
    return jax.devices()[0].platform


def test_layer_create_and_forward_cpu_gate():
    import jax
    import jax.numpy as jnp

    from ruvector_tpu.graph import NeighborGraph
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig,
        ruvector_layer_apply,
        ruvector_layer_init,
    )

    g = GATES["cpu"]
    n, d, m = 10_000, 128, 16
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    graph = NeighborGraph(
        jnp.asarray(rng.integers(0, n, (n, m)).astype(np.int32)),
        jnp.ones((n, m), jnp.float32),
        jnp.asarray(rng.uniform(0.1, 1, (n, m)).astype(np.float32)))
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)

    t0 = time.perf_counter()
    params = ruvector_layer_init(jax.random.key(0), cfg)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    create_ms = (time.perf_counter() - t0) * 1e3
    assert create_ms < g["layer_create_ms_max"], f"layer create {create_ms:.0f}ms"

    f = jax.jit(lambda p, x: ruvector_layer_apply(p, cfg, x, graph))
    jax.block_until_ready(f(params, feats))        # compile
    # min over iterations, not mean: the gate bounds the code's capability
    # (catastrophic-regression catch); a mean soaks up scheduler noise when
    # the shared box is under load (e.g. concurrent bench host threads)
    fwd_ms = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(params, feats))
        fwd_ms = min(fwd_ms, (time.perf_counter() - t0) * 1e3)
    assert fwd_ms < g["layer_forward_10k_ms_max"], f"forward {fwd_ms:.2f}ms"


def test_hnsw_insert_search_gate():
    from ruvector_tpu.index.hnsw import HnswConfig, HnswIndex

    g = GATES["cpu"]
    rng = np.random.default_rng(1)
    idx = HnswIndex(HnswConfig(dim=64))
    vecs = rng.normal(size=(2000, 64)).astype(np.float32)
    t0 = time.perf_counter()
    idx.add_batch(vecs)
    rate = 2000 / (time.perf_counter() - t0)
    assert rate > g["hnsw_insert_per_s_min"], f"insert {rate:.0f}/s"

    t0 = time.perf_counter()
    for i in range(200):
        idx.search(vecs[i], 10)
    qps = 200 / (time.perf_counter() - t0)
    assert qps > g["hnsw_search_qps_min"], f"search {qps:.0f} qps"


def test_decode_step_gate():
    import jax
    import jax.numpy as jnp

    from ruvector_tpu.transformer.config import TransformerConfig
    from ruvector_tpu.transformer.decode import make_decode_step
    from ruvector_tpu.transformer.kv_cache import KVCacheConfig, kv_cache_init
    from ruvector_tpu.transformer.model import init_weights

    g = GATES["cpu"]
    cfg = TransformerConfig.micro()
    weights = init_weights(jax.random.key(0), cfg)
    cache_cfg = KVCacheConfig(hot_capacity=8, warm_capacity=16,
                              archive_capacity=16, heads=cfg.heads,
                              head_dim=cfg.head_dim)
    step = make_decode_step(cfg, cache_cfg)
    caches = [kv_cache_init(cache_cfg) for _ in range(cfg.layers)]
    logits, caches = step(weights, caches, jnp.int32(1), jnp.int32(0),
                          jnp.bool_(True))          # compile
    t0 = time.perf_counter()
    for p in range(1, 21):
        logits, caches = step(weights, caches, jnp.int32(p % 7),
                              jnp.int32(p), jnp.bool_(True))
    jax.block_until_ready(logits)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    assert ms < g["decode_step_ms_max"], f"decode step {ms:.1f}ms"


@pytest.mark.skipif(
    os.environ.get("RUVECTOR_PERF_GATES") != "tpu",
    reason="TPU gates run only with RUVECTOR_PERF_GATES=tpu on real TPU",
)
def test_tpu_layer_throughput_gate():
    import jax

    assert _backend() not in ("cpu",), "TPU gate requires TPU backend"
    import jax.numpy as jnp

    from ruvector_tpu.graph import NeighborGraph
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig,
        ruvector_layer_apply,
        ruvector_layer_init,
    )

    g = GATES["tpu"]
    n, d, m = 100_000, 128, 16
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    graph = NeighborGraph(
        jnp.asarray(rng.integers(0, n, (n, m)).astype(np.int32)),
        jnp.ones((n, m), jnp.float32),
        jnp.asarray(rng.uniform(0.1, 1, (n, m)).astype(np.float32)))
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(0), cfg)

    iters = 50

    @jax.jit
    def loop(p, f):
        def body(x, _):
            return ruvector_layer_apply(p, cfg, x, graph), None
        out, _ = jax.lax.scan(body, f, None, length=iters)
        return jnp.sum(out)

    float(loop(params, feats))
    t0 = time.perf_counter()
    float(loop(params, feats))
    dt = (time.perf_counter() - t0) / iters
    eps = n * m / dt
    assert eps > g["layer_forward_100k_edges_per_s_min"], \
        f"layer {eps/1e6:.0f}M edges/s"


@pytest.mark.skipif(
    os.environ.get("RUVECTOR_PERF_GATES") != "tpu",
    reason="TPU gates run only with RUVECTOR_PERF_GATES=tpu on real TPU",
)
def test_tpu_fused_block_dense_gate():
    """The headline path (bench.py): fused block-dense layer on clustered
    data must stay above the committed floor (680M edges/s measured,
    1.5x regression margin -> 450M)."""
    import jax
    import jax.numpy as jnp

    assert _backend() not in ("cpu",), "TPU gate requires TPU backend"

    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "benchmarks"))
    from scale_sweep_r02 import gen_cluster_graph

    from ruvector_tpu.graph import build_block_dense
    from ruvector_tpu.nn.block_dense_layer import (
        ruvector_layer_apply_block_dense_fused,
    )
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig,
        ruvector_layer_init,
    )

    g = GATES["tpu"]
    n, d, k = 99_968, 128, 16
    feats, idx, mask, ew = gen_cluster_graph(n, d, k)
    bdg = build_block_dense(idx, mask, ew, block=256)
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4,
                              compute_dtype="bfloat16")
    params = ruvector_layer_init(jax.random.key(0), cfg)
    fpad = bdg.pad_features(jnp.asarray(feats))

    iters = 20

    @jax.jit
    def loop(p, f):
        def body(x, _):
            return ruvector_layer_apply_block_dense_fused(
                p, cfg, x, bdg, tile=256), None
        out, _ = jax.lax.scan(body, f, None, length=iters)
        return jnp.sum(out)

    float(loop(params, fpad))
    t0 = time.perf_counter()
    float(loop(params, fpad))
    dt = (time.perf_counter() - t0) / iters
    eps = n * k / dt
    assert eps > g["fused_layer_100k_edges_per_s_min"], \
        f"fused layer {eps/1e6:.0f}M edges/s"
