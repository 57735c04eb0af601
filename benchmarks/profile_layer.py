"""Per-op difference-timing profile of the RuvectorLayer forward at the
production shape [100k nodes, M=16, D=128] — drives VERDICT r2 item 1.

Each variant is a scan-looped single-dispatch program (value-fetch sync);
subtracting pairs isolates op costs. Run on the TPU tunnel:

    python benchmarks/profile_layer.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=50):
    import jax

    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ruvector_tpu.graph import NeighborGraph
    from ruvector_tpu.nn.core import gru_apply, layer_norm_apply, linear_apply
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig,
        ruvector_layer_apply,
        ruvector_layer_init,
    )
    from ruvector_tpu.ops.segment import masked_softmax

    n, d, m = 100_000, 128, 16
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(n, m)).astype(np.int32))
    mask = jnp.ones((n, m), jnp.float32)
    ew = jnp.asarray(rng.uniform(0.1, 1.0, size=(n, m)).astype(np.float32))
    graph = NeighborGraph(idx, mask, ew)

    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(0), cfg)

    iters = 50
    results = {}

    def scan_loop(body):
        @jax.jit
        def run(f):
            def step(x, _):
                return body(x), None
            out, _ = jax.lax.scan(step, f, None, length=iters)
            return jnp.sum(out)
        return run

    # --- 1. full layer (current production path) ---
    full = scan_loop(lambda x: ruvector_layer_apply(params, cfg, x, graph))
    results["full_layer_ms"] = timeit(full, feats, iters=iters) * 1e3

    # --- 2. dense-only: replace attention+aggregate with identity ---
    def dense_only(x):
        msg = linear_apply(params["w_msg"], x)
        aggregated = linear_apply(params["w_agg"], msg)
        updated = gru_apply(params["gru"], aggregated, msg)
        return layer_norm_apply(params["norm"], updated, cfg.eps)

    results["dense_only_ms"] = timeit(scan_loop(dense_only), feats,
                                      iters=iters) * 1e3

    # --- 3. gather-only: per-slot gathers, summed (1 gather per edge) ---
    def gather_only(x):
        msg = linear_apply(params["w_msg"], x)
        acc = jnp.zeros_like(msg)
        for j in range(m):
            acc = acc + msg[idx[:, j]]
        return acc

    results["msg_plus_gather_ms"] = timeit(scan_loop(gather_only), feats,
                                           iters=iters) * 1e3

    # --- 4. gather + scores (pass 1 of the two-pass path) ---
    def gather_scores(x):
        msg = linear_apply(params["w_msg"], x)
        q = linear_apply(params["attn"]["q"], msg).reshape(n, 4, 32)
        wk = params["attn"]["k"]["kernel"].reshape(d, 4, 32)
        u = jnp.einsum("nhf,dhf->nhd", q, wk)
        ss = [jnp.sum(u * msg[idx[:, j]][:, None, :], axis=-1)
              for j in range(m)]
        return jnp.sum(jnp.stack(ss, -1), axis=(1, 2))[:, None] * jnp.ones((1, d))

    results["msg_gather_scores_ms"] = timeit(scan_loop(gather_scores), feats,
                                             iters=iters) * 1e3

    # --- 5. materialized nbr_msg: gather once to HBM, einsum twice ---
    def materialized(x):
        msg = linear_apply(params["w_msg"], x)
        q = linear_apply(params["attn"]["q"], msg).reshape(n, 4, 32)
        wk = params["attn"]["k"]["kernel"].reshape(d, 4, 32)
        u = jnp.einsum("nhf,dhf->nhd", q, wk)
        nbr = jax.lax.optimization_barrier(msg[idx])      # [N, M, D] in HBM
        scores = jnp.einsum("nhd,nmd->nhm", u, nbr,
                            preferred_element_type=jnp.float32) / (32 ** 0.5)
        attn_w = masked_softmax(scores, mask[:, None, :], axis=-1)
        w = ew / jnp.sum(ew, 1, keepdims=True)
        allw = jnp.concatenate([attn_w, w[:, None, :]], axis=1)
        mixed = jnp.einsum("nhm,nmd->nhd", allw, nbr,
                           preferred_element_type=jnp.float32)
        return mixed.reshape(n, -1)[:, :d]

    results["materialized_attn_ms"] = timeit(scan_loop(materialized), feats,
                                             iters=iters) * 1e3

    # --- 6. one-pass online softmax (1 gather per edge, flash-style) ---
    def online(x):
        msg = linear_apply(params["w_msg"], x)
        q = linear_apply(params["attn"]["q"], msg).reshape(n, 4, 32)
        wk = params["attn"]["k"]["kernel"].reshape(d, 4, 32)
        u = jnp.einsum("nhf,dhf->nhd", q, wk)
        scale = 1.0 / (32 ** 0.5)
        w = ew / jnp.sum(ew, 1, keepdims=True)
        run_max = jnp.full((n, 4), -1e30)
        run_sum = jnp.zeros((n, 4))
        acc = jnp.zeros((n, 4, d))
        wacc = jnp.zeros((n, d))
        for j in range(m):
            g = msg[idx[:, j]]                            # [N, D] — only gather
            s = jnp.sum(u * g[:, None, :], axis=-1) * scale  # [N, H]
            new_max = jnp.maximum(run_max, s)
            corr = jnp.exp(run_max - new_max)
            p = jnp.exp(s - new_max)
            run_sum = run_sum * corr + p
            acc = acc * corr[:, :, None] + p[:, :, None] * g[:, None, :]
            run_max = new_max
            wacc = wacc + w[:, j][:, None] * g
        out = acc / run_sum[:, :, None]
        return out.reshape(n, -1)[:, :d] + wacc

    results["online_attn_ms"] = timeit(scan_loop(online), feats,
                                       iters=iters) * 1e3

    # --- 7. two-pass with explicit slot materialization (barrier) ---
    def two_pass_barrier(x):
        msg = linear_apply(params["w_msg"], x)
        q = linear_apply(params["attn"]["q"], msg).reshape(n, 4, 32)
        wk = params["attn"]["k"]["kernel"].reshape(d, 4, 32)
        u = jnp.einsum("nhf,dhf->nhd", q, wk)
        scale = 1.0 / (32 ** 0.5)
        slots = [jax.lax.optimization_barrier(msg[idx[:, j]])
                 for j in range(m)]
        ss = [jnp.sum(u * g[:, None, :], axis=-1) for g in slots]
        scores = jnp.stack(ss, -1) * scale
        attn_w = masked_softmax(scores, mask[:, None, :], axis=-1)
        w = ew / jnp.sum(ew, 1, keepdims=True)
        allw = jnp.concatenate([attn_w, w[:, None, :]], axis=1)
        mixed = jnp.zeros((n, 5, d))
        for j in range(m):
            mixed = mixed + allw[:, :, j][:, :, None] * slots[j][:, None, :]
        return mixed.reshape(n, -1)[:, :d]

    results["two_pass_barrier_ms"] = timeit(scan_loop(two_pass_barrier), feats,
                                            iters=iters) * 1e3

    for k, v in results.items():
        print(f"{k:28s} {v:8.3f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
