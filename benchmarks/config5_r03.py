"""BASELINE config 5, round 3: mincut-gated graph transformer at 1M nodes
with temporal gate reuse (hysteresis state, budget-capped incremental
re-solve) — the round-2 version re-solved all 31,248 gates every forward
(1,297 ms, 52x the ungated path). Round-3 protocol:

  init:    gate_state_init solves every partition once (one-time)
  forward: gated_graph_transformer_step — signature einsum + top-k drift
           selection + ONE batched push-relabel over <= nB/16 partitions
           + masked attention under the state's masks
  train:   gate refresh (non-diff) + loss_with_masks grad — the backward
           program carries no push-relabel, so the FULL 1M graph trains
           (round 2 had to fall back to a 100k subset).

Measured rows: steady forward (zero drift: pure reuse), drift forward
(features perturbed each iter -> budget-capped re-solves), train step on
the full graph, plus the one-time init/gen/build costs.

Run: python benchmarks/config5_r03.py [--nodes N]
"""

from __future__ import annotations

import functools
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scale_sweep_r02 import gen_cluster_graph  # noqa: E402  (same dir)

BLOCK = 256
DEGREE = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=999_936)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("--io", choices=["auto", "bf16", "f32"], default="auto",
                    help="edge-table/feature dtype; auto = bf16 only >2M "
                         "nodes (compute is bf16 at every size)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ruvector_tpu.graph import build_block_dense
    from ruvector_tpu.graph_transformer.gated import (
        GatedGraphTransformerConfig,
        gate_state_init,
        gated_graph_transformer_init,
        gated_graph_transformer_loss_with_masks,
        gated_graph_transformer_step,
    )

    n, d = args.nodes - args.nodes % BLOCK, args.dim
    # >2M nodes: bf16 edge tables + features (the 10M-node f32 tables
    # alone are ~10GB of HBM; bf16 halves every big buffer and the layer
    # computes in bf16 anyway — same protocol as scale_sweep_r03)
    big = args.io == "bf16" or (args.io == "auto" and n > 2_000_000)
    t0 = time.time()
    feats, idx, mask, ew = gen_cluster_graph(n, d, DEGREE)
    t_gen = time.time() - t0
    t0 = time.time()
    bdg = build_block_dense(idx, mask, ew, block=BLOCK,
                            dtype=jnp.bfloat16 if big else np.float32)
    t_build = time.time() - t0
    del idx, mask, ew
    if big:
        import ml_dtypes

        feats = feats.astype(ml_dtypes.bfloat16)

    cfg = GatedGraphTransformerConfig(
        dim=d, num_heads=4, num_layers=args.layers, gate_chunk=128,
        hysteresis_band=0.05, remat=True, compute_dtype="bfloat16")
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    fpad = bdg.pad_features(jnp.asarray(feats))
    del feats

    # NOTE on timing: jax.block_until_ready on the remote (axon) tunnel
    # acknowledges enqueue, not execution — every measurement below uses
    # value-fetch sync (float()/np.asarray) and, for per-iteration rates,
    # two scan lengths whose difference cancels the tunnel's fixed
    # dispatch/fetch cost (see benchmarks/_timing.py).

    # --- one-time gate state init (all gates, chunked) ---
    init_fn = jax.jit(lambda p, f, g: gate_state_init(p, cfg, f, g))
    t0 = time.time()
    state = init_fn(params, fpad, bdg)
    float(jnp.sum(state["sig"]))          # value fetch = real sync
    t_init_cold = time.time() - t0        # includes XLA compile
    t0 = time.time()
    state = init_fn(params, fpad, bdg)
    float(jnp.sum(state["sig"]))
    t_init = time.time() - t0             # pure device execution

    max_resolve = max(1, bdg.n_blocks // 16)

    # --- steady-state forward: same input, zero drift (pure reuse);
    # state threads through the scan so reuse semantics are exact ---
    def make_steady(n_it):
        @jax.jit
        def loop(p, f, s, g):
            def body(carry, _):
                s, acc = carry
                out, s2, nres = gated_graph_transformer_step(
                    p, cfg, f, g, s, max_resolve=max_resolve)
                return (s2, acc + jnp.sum(out) * 1e-38), nres
            (s, acc), nres = jax.lax.scan(
                body, (s, jnp.zeros((), fpad.dtype)), None, length=n_it)
            return acc + jnp.sum(s["sig"]) * 1e-38, nres
        return loop

    k = args.iters
    s_short, s_long = max(1, k // 2), max(1, k // 2) + 2 * k
    f_s, f_l = make_steady(s_short), make_steady(s_long)
    a, nres0 = f_s(params, fpad, state, bdg)
    float(a); float(f_l(params, fpad, state, bdg)[0])
    t0 = time.perf_counter(); float(f_s(params, fpad, state, bdg)[0])
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    a, nres_steady = f_l(params, fpad, state, bdg)
    float(a)
    t_l = time.perf_counter() - t0
    fwd_steady_s = max(t_l - t_s, 1e-9) / (s_long - s_short)
    assert int(np.asarray(nres_steady).max()) == 0   # pure hysteresis reuse
    state2 = state

    # --- drift forward: perturb features each iter so gates re-solve
    # up to the budget (the realistic evolving-embedding loop) ---
    def perturb(f, sub):
        if not big:
            return f + 0.1 * jax.random.normal(sub, f.shape, f.dtype)
        # 10M: chunk the noise generation — the threefry bit tensor for
        # a full-width normal() is a [n, d] uint32 transient (5.1 GB)
        # that tips the drift loop over HBM next to the carried f/f2
        nchunks = 8
        rows = f.shape[0] // nchunks
        ks = jax.random.split(sub, nchunks)
        return jax.lax.map(
            lambda a: a[0] + 0.1 * jax.random.normal(
                a[1], a[0].shape, a[0].dtype),
            (f.reshape(nchunks, rows, -1), ks)).reshape(f.shape)

    def make_drift(n_it):
        @jax.jit
        def loop(p, f, s, key, g):
            def body(carry, _):
                if big:
                    # 10M: INDEPENDENT jitter around the base features —
                    # carrying a random-walk f through the scan forces
                    # XLA to copy the 2.38 GB carry at loop entry, which
                    # was the drift program's HBM deficit. Same gate
                    # churn (signatures jitter past the band each step);
                    # stimulus documented in the artifact.
                    s, key, acc = carry
                    key, sub = jax.random.split(key)
                    f2 = perturb(f, sub)
                    out, s2, nres = gated_graph_transformer_step(
                        p, cfg, f2, g, s, max_resolve=max_resolve)
                    return (s2, key, acc + jnp.sum(out) * 1e-38), nres
                f1, s, key, acc = carry
                key, sub = jax.random.split(key)
                f2 = perturb(f1, sub)
                out, s2, nres = gated_graph_transformer_step(
                    p, cfg, f2, g, s, max_resolve=max_resolve)
                return (f2, s2, key, acc + jnp.sum(out) * 1e-38), nres
            if big:
                carry0 = (s, key, jnp.zeros((), fpad.dtype))
            else:
                carry0 = (f, s, key, jnp.zeros((), fpad.dtype))
            carry, nres = jax.lax.scan(body, carry0, None, length=n_it)
            s_out = carry[0] if big else carry[1]
            return carry[-1] + jnp.sum(s_out["sig"]) * 1e-38, nres
        return loop

    d_short, d_long = max(1, k // 2), max(1, k // 2) + k
    g_s, g_l = make_drift(d_short), make_drift(d_long)
    key = jax.random.key(7)
    float(g_s(params, fpad, state2, key, bdg)[0])
    float(g_l(params, fpad, state2, key, bdg)[0])
    t0 = time.perf_counter(); float(g_s(params, fpad, state2, key, bdg)[0])
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    a, nres_drift = g_l(params, fpad, state2, key, bdg)
    float(a)
    t_l = time.perf_counter() - t0
    fwd_drift_s = max(t_l - t_s, 1e-9) / (d_long - d_short)
    resolved = [int(x) for x in np.asarray(nres_drift)][:k]

    # --- train step on the FULL graph: refresh masks (non-diff) is
    # already timed above; here the differentiable step given masks ---
    def make_train(n_it):
        @jax.jit
        def loop(p, f, masks, g):
            def body(p, _):
                loss, gr = jax.value_and_grad(
                    gated_graph_transformer_loss_with_masks)(
                    p, cfg, f, g, masks, jnp.zeros_like(f))
                return jax.tree_util.tree_map(
                    lambda w, gw: w - 1e-3 * gw, p, gr), loss
            p, losses = jax.lax.scan(body, p, None, length=n_it)
            return losses[-1]
        return loop

    t_s1, t_l1 = make_train(1), make_train(4)
    loss = float(t_s1(params, fpad, state2["keep"], bdg))
    float(t_l1(params, fpad, state2["keep"], bdg))
    t0 = time.perf_counter(); float(t_s1(params, fpad, state2["keep"], bdg))
    ts_ = time.perf_counter() - t0
    t0 = time.perf_counter(); float(t_l1(params, fpad, state2["keep"], bdg))
    tl_ = time.perf_counter() - t0
    grad_step_s = max(tl_ - ts_, 1e-9) / 3

    edges = float(n * DEGREE * args.layers)
    payload = {
        "config": f"mincut-gated graph transformer w/ temporal gate "
                  f"reuse, {n}-node partitioned graph (BASELINE "
                  f"config 5)",
        "backend": jax.devices()[0].platform,
        "nodes": n, "dim": d, "layers": args.layers, "heads": 4,
        "partition": BLOCK, "partitions": bdg.n_blocks,
        "io": "bf16" if big else "f32",
        "hysteresis_band": cfg.hysteresis_band,
        "max_resolve_per_step": max_resolve,
        "gen_s": round(t_gen, 1), "build_s": round(t_build, 1),
        "gate_init_s": round(t_init, 1),
        "gate_init_compile_s": round(t_init_cold - t_init, 1),
        "forward_steady_ms": round(fwd_steady_s * 1e3, 2),
        "forward_drift_ms": round(fwd_drift_s * 1e3, 2),
        "resolved_per_drift_step": resolved,
        "train_step_nodes": n,
        "train_step_ms": round(grad_step_s * 1e3, 2),
        "train_plus_refresh_ms": round(
            (grad_step_s + fwd_drift_s) * 1e3, 2),
        "gnn_edges_per_s_steady": round(edges / fwd_steady_s),
        "gnn_edges_per_s_drift": round(edges / fwd_drift_s),
        "loss": float(loss),
        "r02_forward_ms": 1296.85,
        "speedup_vs_r02": round(1296.85 / (fwd_drift_s * 1e3), 1),
    }
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CONFIG5_BENCH_r03.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
