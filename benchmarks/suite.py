"""Benchmark suite: per-subsystem throughput/latency on the current backend.

Run: python benchmarks/suite.py [--json out.json] [--quick]

Covers the reference's benchmark surface (BASELINE.md rows):
- GNN layer forward (edges/s)              vs GNN re-rank claim
- SpMM padded (edges/s)
- flash attention (queries/s at M=512)
- batched cosine distance (distances/s)    vs SIMD distance rows
- HNSW insert + search QPS (native C++)    vs HNSW rows
- int8/PQ/binary quantized distance        vs quantization rows
- mincut-gated transformer infer latency
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import device_time  # noqa: E402  (honest tunnel timing)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ruvector_tpu.graph import NeighborGraph, build_knn_graph
    from ruvector_tpu.nn import RuvectorLayerConfig, ruvector_layer_init
    from ruvector_tpu.nn.ruvector_layer import ruvector_layer_apply
    from ruvector_tpu.ops.distance import pairwise_cosine
    from ruvector_tpu.ops.segment import spmm_padded
    from ruvector_tpu.attention.flash import flash_attention

    results = {}
    rng = np.random.default_rng(0)
    n = 20_000 if args.quick else 100_000
    d, k = 128, 16

    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    cache = f"/tmp/ruvector_bench_graph_{n}_{d}_{k}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        graph = NeighborGraph(jnp.asarray(z["idx"]), jnp.asarray(z["mask"]),
                              jnp.asarray(z["w"]))
    else:
        t0 = time.perf_counter()
        graph = build_knn_graph(feats, k=k, block=2048)
        idx_np = np.asarray(graph.nbr_idx)   # value fetch = the only real sync
        results["knn_build_s"] = round(time.perf_counter() - t0, 2)
        np.savez(cache, idx=idx_np,
                 mask=np.asarray(graph.nbr_mask),
                 w=np.asarray(graph.edge_weight))

    def scan_diff_time(apply_fn, *args, short=2, long_=12):
        """Scan-looped difference timing with value sync — immune to
        per-dispatch overhead and the tunnel's async quirks."""
        def make(iters):
            @jax.jit
            def loop(*a):
                def body(x, _):
                    return apply_fn(*a[:-1], x), None
                out, _ = jax.lax.scan(body, a[-1], None, length=iters)
                return jnp.sum(out)
            return loop
        f_s, f_l = make(short), make(long_)
        float(f_s(*args)); float(f_l(*args))
        t0 = time.perf_counter(); float(f_s(*args))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f_l(*args))
        t_l = time.perf_counter() - t0
        return max(t_l - t_s, 1e-9) / (long_ - short)

    # 1. GNN layer forward — flat path (scan-diff protocol)
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(0), cfg)
    dt = scan_diff_time(lambda p, f: ruvector_layer_apply(p, cfg, f, graph),
                        params, feats)
    results["gnn_layer_forward_ms"] = round(dt * 1e3, 3)
    results["gnn_layer_edges_per_s"] = round(n * k / dt, 0)

    # 1b. blocked execution (gather cache blocking — bench.py's path)
    from ruvector_tpu.models import RuvectorNetConfig, ruvector_net_init
    from ruvector_tpu.parallel import build_halo_plan, make_blocked_layer_forward
    from ruvector_tpu.parallel.partition import pad_features_for_plan

    ncfg = RuvectorNetConfig(input_dim=d, hidden_dim=d, num_layers=1, heads=4)
    nparams = ruvector_net_init(jax.random.key(0), ncfg)
    plan, perm = build_halo_plan(graph, 8, reorder="cluster")
    fwd_b = make_blocked_layer_forward(ncfg, plan)
    feats_pad = jnp.asarray(pad_features_for_plan(np.asarray(feats), plan,
                                                  perm))
    dt = scan_diff_time(fwd_b, nparams, feats_pad)
    results["gnn_layer_blocked_edges_per_s"] = round(n * k / dt, 0)

    # 1c. fused block-dense kernel — the bench.py headline path, on
    # CLUSTERED data (the vector-DB regime; the suite's main graph is
    # uniform-random = an expander, where the fused path correctly
    # declines and falls back to the slot layer).
    from ruvector_tpu.graph import build_block_dense
    from ruvector_tpu.nn.block_dense_layer import (
        ruvector_layer_apply_block_dense_fused,
    )
    from ruvector_tpu.parallel.ordering import graph_grow_blocks

    try:
        import sys as _sys
        _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from scale_sweep_r02 import gen_cluster_graph

        n_c = n - n % 128
        feats_c, idx_c, mask_c, ew_c = gen_cluster_graph(n_c, d, k)
        order, leaves = graph_grow_blocks(idx_c, mask_c, 512)
        inv = np.empty(n_c, np.int64)
        inv[order] = np.arange(n_c)
        bdg = build_block_dense(inv[idx_c[order]].astype(np.int32),
                                mask_c[order], ew_c[order],
                                leaf_sizes=leaves)
        if bdg.table <= 2 * bdg.block:
            cfg_f = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4,
                                        compute_dtype="bfloat16")
            params_f = ruvector_layer_init(jax.random.key(0), cfg_f)
            tile = 512 if bdg.block % 512 == 0 else 256
            fpad_f = bdg.pad_features(jnp.asarray(feats_c[order]))
            dt = scan_diff_time(
                lambda p, x: ruvector_layer_apply_block_dense_fused(
                    p, cfg_f, x, bdg, tile=tile), params_f, fpad_f)
            results["gnn_layer_fused_edges_per_s"] = round(n_c * k / dt, 0)
        else:
            results["gnn_layer_fused_edges_per_s"] = None   # degenerate halo
    except Exception as e:      # fused path optional on exotic backends
        results["gnn_layer_fused_edges_per_s"] = f"error: {e}"

    # 1c. GraphSAGE 2-layer fixed-fanout forward (BASELINE config 2)
    from ruvector_tpu.models import (
        GraphSAGENetConfig,
        graphsage_net_apply,
        graphsage_net_init,
    )

    sage_cfg = GraphSAGENetConfig(in_features=d, hidden_features=d,
                                  out_features=d, fanouts=(10, 10))
    sage_params = graphsage_net_init(jax.random.key(2), sage_cfg)
    dt = device_time(
        lambda p, f: graphsage_net_apply(p, sage_cfg, f, graph),
        sage_params, feats)
    results["graphsage_2layer_nodes_per_s"] = round(n / dt, 0)
    results["graphsage_2layer_ms"] = round(dt * 1e3, 2)

    # 2. SpMM
    dt = device_time(
        lambda f: spmm_padded(f, graph.nbr_idx, graph.edge_weight,
                              graph.nbr_mask), feats)
    results["spmm_edges_per_s"] = round(n * k / dt, 0)

    # 3. flash attention over candidate pools
    b, m = 1024, 512
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    kk = jnp.asarray(rng.normal(size=(b, m, d)).astype(np.float32))
    vv = jnp.asarray(rng.normal(size=(b, m, d)).astype(np.float32))
    dt = device_time(lambda a, b, c: flash_attention(a, b, c,
                                                      block_size=128),
                     q, kk, vv)
    results["flash_attention_queries_per_s"] = round(b / dt, 0)

    # 4. batched cosine distance
    queries = jnp.asarray(rng.normal(size=(256, d)).astype(np.float32))
    dt = device_time(pairwise_cosine, queries, feats)
    results["cosine_distances_per_s"] = round(256 * n / dt, 0)

    # 5. HNSW (native, host-side)
    from ruvector_tpu.index import HnswConfig, HnswIndex

    n_index = 10_000
    data = rng.normal(size=(n_index, d)).astype(np.float32)
    threads = os.cpu_count() or 4
    idx = HnswIndex(HnswConfig(dim=d, m=16, ef_construction=100))
    t0 = time.perf_counter()
    idx.add_batch(data, num_threads=threads)
    results["hnsw_insert_per_s"] = round(n_index / (time.perf_counter() - t0), 0)
    qs = data[rng.integers(0, n_index, size=200)]
    t0 = time.perf_counter()
    idx.search_batch(qs, k=10, ef=100, num_threads=threads)
    dt = time.perf_counter() - t0
    results["hnsw_search_qps"] = round(200 / dt, 0)
    results["hnsw_search_p50_ms"] = round(dt / 200 * 1e3, 3)

    # 6. quantized distances
    from ruvector_tpu.ops.quantization import (
        binary_quantize, hamming_distance, scalar_distance, scalar_quantize,
    )

    sq = scalar_quantize(feats)
    dt = device_time(lambda q: scalar_distance(q, sq), queries)
    results["int8_distances_per_s"] = round(256 * n / dt, 0)
    bq = binary_quantize(feats)
    bq_q = binary_quantize(queries)
    dt = device_time(hamming_distance, bq_q, bq)
    results["binary_distances_per_s"] = round(256 * n / dt, 0)

    # 7. transformer inference
    from ruvector_tpu.transformer import (
        GatePolicy, MincutGatedTransformer, TransformerConfig, init_weights,
    )

    tcfg = TransformerConfig.baseline()
    model = MincutGatedTransformer(tcfg, GatePolicy(),
                                   init_weights(jax.random.key(1), tcfg))
    tokens = np.arange(32) % tcfg.vocab
    model.infer(tokens=tokens)  # warm tier program
    t0 = time.perf_counter()
    iters = 50
    for _ in range(iters):
        model.infer(tokens=tokens)
    # NOTE: this is TUNNEL-BOUND — per-call host->device dispatch + logits
    # fetch + witness hashing dominate on the dev tunnel. The device-bound
    # program latency is transformer_infer_device_ms below; keep both so
    # artifacts stay comparable across rounds.
    results["transformer_infer_ms"] = round(
        (time.perf_counter() - t0) / iters * 1e3, 3
    )

    # 7b. DEVICE-BOUND tier-program latency: the same normal-tier program
    # in a value-synced scan (each iteration's last_pos depends on the
    # previous logits, so XLA cannot hoist the body; dispatch cost
    # amortizes over the scan length).
    s_full = tcfg.seq_len_max
    ids_dev = jnp.asarray(np.resize(tokens, s_full).astype(np.int32))
    extra_m = jnp.ones((s_full, s_full), jnp.float32)
    mod_m = jnp.ones((tcfg.layers, s_full), jnp.float32)
    run_prog = model._program(tcfg.layers, s_full, tcfg.window_normal)

    def make_tier_loop(iters):
        @jax.jit
        def loop(w, ids):
            def body(acc, _):
                # the TOKENS must depend on the carry — a carry-dependent
                # slice position alone lets XLA hoist the whole
                # transformer body out of the scan (measured 0.03ms,
                # i.e. just the head GEMV)
                ids2 = ids + (acc > jnp.float32(3.4e38)).astype(jnp.int32)
                logits, _ = run_prog(w, ids2, jnp.int32(31), extra_m,
                                     mod_m, from_tokens=True)
                return jnp.sum(logits), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return out
        return loop

    # seq-64/hidden-256 is ~10us/call on TPU — the iteration counts must
    # be large enough that the difference clears tunnel timing noise
    n_short, n_long = 20, 2020
    f_short, f_long = make_tier_loop(n_short), make_tier_loop(n_long)
    float(f_short(model.weights, ids_dev))
    float(f_long(model.weights, ids_dev))
    t0 = time.perf_counter(); float(f_short(model.weights, ids_dev))
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f_long(model.weights, ids_dev))
    t_l = time.perf_counter() - t0
    results["transformer_infer_device_us"] = round(
        max(t_l - t_s, 1e-9) / (n_long - n_short) * 1e6, 1)

    # 8. autoregressive decode throughput (whole-generation jitted scan —
    # one dispatch for the full sequence, so tunnel latency is amortized)
    from ruvector_tpu.transformer.decode import Decoder, make_generate_fn

    dec = Decoder(tcfg, GatePolicy(), model.weights)
    new_tokens = 64
    gen = make_generate_fn(tcfg, dec.cache_cfg, prompt_len=8,
                           max_new_tokens=new_tokens)
    prompt = jnp.asarray(np.arange(8) % tcfg.vocab, jnp.int32)
    caches0 = dec.init_caches()
    dt = device_time(gen, model.weights, caches0, prompt)
    results["decode_tokens_per_s"] = round((8 + new_tokens) / dt, 1)

    # 8b. speculative decoding (self-drafting early-exit draft model):
    # token-identical to greedy; reports throughput + acceptance so the
    # speedup claim is measured, not asserted (VERDICT r1 item 7)
    from ruvector_tpu.transformer.decode import make_decode_step
    from ruvector_tpu.transformer.spec_decode import (
        SpecDecodeConfig,
        make_speculative_generate_fn,
    )

    step_fn = make_decode_step(tcfg, dec.cache_cfg)
    caches_sp = dec.init_caches()
    logits_sp = None
    for pos, t in enumerate(np.asarray(prompt)):
        logits_sp, caches_sp = step_fn(
            model.weights, caches_sp, jnp.int32(int(t)), jnp.int32(pos),
            jnp.bool_(True))
    first_sp = jnp.argmax(logits_sp).astype(jnp.int32)
    sgen = make_speculative_generate_fn(
        tcfg, dec.cache_cfg, SpecDecodeConfig(gamma=4, draft_layers=1),
        new_tokens)
    out_sp = sgen(model.weights, caches_sp, first_sp)
    dt_sp = device_time(sgen, model.weights, caches_sp, first_sp)
    # this row is the machinery-overhead FLOOR (random weights, so the
    # draft almost never agrees); the acceptance story lives in the
    # ceiling row below and the trained-draft rows merged from
    # SPEC_TRAINED/SPEC_AT_SIZE — the untrained ~0.005 acceptance row
    # was dead weight and is dropped (VERDICT r4 #10)
    results["decode_speculative_tokens_per_s"] = round(new_tokens / dt_sp, 1)

    # 8c. speculative CEILING — converged-model proxy: post-draft layers
    # contribute ~0 (zeroed residual branches), so the 1-layer draft
    # equals the full model and acceptance is total. Random-weight
    # acceptance above is the floor; real models sit between. This row
    # is the measured speedup the machinery delivers when drafts land.
    layers_cv = []
    for li, lp in enumerate(model.weights["layers"]):
        lp2 = dict(lp)
        if li >= 1:
            lp2["out"] = {kk: vv * 0 for kk, vv in lp["out"].items()}
            lp2["ffn_out"] = {kk: vv * 0 for kk, vv in lp["ffn_out"].items()}
        layers_cv.append(lp2)
    w_cv = dict(model.weights)
    w_cv["layers"] = layers_cv
    caches_cv = dec.init_caches()
    logits_cv = None
    for pos, t in enumerate(np.asarray(prompt)):
        logits_cv, caches_cv = step_fn(
            w_cv, caches_cv, jnp.int32(int(t)), jnp.int32(pos),
            jnp.bool_(True))
    first_cv = jnp.argmax(logits_cv).astype(jnp.int32)
    out_cv = sgen(w_cv, caches_cv, first_cv)
    dt_cv = device_time(sgen, w_cv, caches_cv, first_cv)
    # greedy under the same weights for the apples-to-apples ratio
    dt_gcv = device_time(gen, w_cv, dec.init_caches(), prompt)
    n_macros_cv = int(np.searchsorted(
        np.cumsum(np.asarray(out_cv[4])), float(out_cv[1]))) + 1
    results["decode_speculative_ceiling_tokens_per_s"] = round(
        new_tokens / dt_cv, 1)
    results["spec_ceiling_tokens_per_macro_step"] = round(
        float(out_cv[1]) / max(n_macros_cv, 1), 2)
    # per-token ratio (greedy decodes prompt_len + new_tokens steps)
    results["spec_ceiling_speedup_vs_greedy"] = round(
        (dt_gcv / (8 + new_tokens)) / (dt_cv / new_tokens), 2)

    # 9. batched serving decode (vmap over sequences: GEMVs become GEMMs)
    from ruvector_tpu.transformer.decode import make_batched_generate_fn

    bsz = 16
    genb = make_batched_generate_fn(tcfg, dec.cache_cfg, prompt_len=8,
                                    max_new_tokens=new_tokens)
    caches_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[dec.init_caches() for _ in range(bsz)])
    prompts = jnp.asarray(np.arange(8 * bsz).reshape(bsz, 8) % tcfg.vocab,
                          jnp.int32)
    dt = device_time(genb, model.weights, caches_b, prompts,
                     short=2, long=8)
    results["decode_batched_tokens_per_s"] = round(bsz * (8 + new_tokens) / dt, 1)

    # 10. SONA MicroLoRA instant path (BASELINE rows: rank-2 4096-d
    # forward 2.61us SIMD on M4 Pro, reference README.md:997; "MicroLoRA
    # instant <1 ms" loop-latency claim, README.md:319-323). Single-query
    # device time plus the batched shape serving actually runs (vmap-free
    # — the einsum broadcasts over leading dims, sona/lora.py).
    from ruvector_tpu.sona.lora import MicroLoRA, _lora_forward

    ml = MicroLoRA(4096, rank=2)
    rngl = np.random.default_rng(5)
    x1 = jnp.asarray(rngl.normal(size=(4096,)).astype(np.float32))
    down, up = jnp.asarray(ml.down), jnp.asarray(ml.up)

    def lora_f(x, d, u):
        return _lora_forward(x, d, u, ml.scale)

    dt1 = device_time(lora_f, x1, down, up, short=100, long=4100)
    results["microlora_forward_us"] = round(dt1 * 1e6, 2)
    xb = jnp.asarray(rngl.normal(size=(256, 4096)).astype(np.float32))
    dtb = device_time(lora_f, xb, down, up, short=100, long=4100)
    results["microlora_batch256_adapted_qps"] = round(256 / dtb, 1)

    # 8d. TRAINED-draft speculative rows (VERDICT r2 missing#2: the suite
    # must carry MEASURED acceptance/speedup, not only the floor/ceiling
    # rows above). benchmarks/spec_trained.py trains the early-exit draft
    # and measures on the same backend earlier in the same refresh
    # (benchmarks/run_r03_tpu.sh step 5 runs before the suite); merge its
    # rows when the artifact matches this backend.
    spec_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SPEC_TRAINED_r03.json")
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            sp = json.load(f)
        keys = ("measured_acceptance", "measured_speedup_vs_greedy",
                "speculative_tokens_per_s", "token_identical_to_greedy")
        if (sp.get("backend") == jax.devices()[0].platform
                and all(k in sp for k in keys)):
            results["spec_trained_acceptance"] = sp["measured_acceptance"]
            results["spec_trained_speedup_vs_greedy"] = (
                sp["measured_speedup_vs_greedy"])
            results["spec_trained_tokens_per_s"] = (
                sp["speculative_tokens_per_s"])
            results["spec_trained_token_identical"] = (
                sp["token_identical_to_greedy"])
            # Provenance: lets a stale same-backend artifact from an
            # earlier round be detected instead of silently relabeled.
            results["spec_trained_artifact_mtime"] = int(
                os.path.getmtime(spec_path))

    results["backend"] = jax.devices()[0].platform

    # artifact hygiene (VERDICT r4 #8): no measurement may be an error
    # string — a failed phase must raise, not record its exception text
    bad = [k for k, v in results.items()
           if isinstance(v, str) and v not in ("cpu", "tpu")]
    if bad:
        raise SystemExit(f"suite rows are error strings, refusing to "
                         f"write artifact: {bad}")

    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
