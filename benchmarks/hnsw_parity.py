"""HNSW recall at the REFERENCE's published operating point.

BASELINE.md row 1 / bench_results/comparison_benchmark.md:9-20 claims
1,216 QPS with 100% recall@1/10/100 on 10k x 384-d, m=32, efc=200,
ef=100. Reading the generator shows those recall figures are HARDCODED
CONSTANTS, not measurements (ruvector-bench/src/bin/
comparison_benchmark.rs:130-132,177-179: `recall_at_1: 1.0` literals) —
so "matching 100%" is not a meaningful target. This bench publishes
HONEST recall measured against exact brute-force ground truth at the
same config, on BOTH of the reference's synthetic distributions
(ruvector-bench/src/lib.rs:90,116-118):

  - clustered (the realistic embedding-corpus case): measured 1.000
    recall@1/10/100 at ef=100
  - uniform random 384-d (the adversarial, structure-free case):
    measured ~0.78-0.89 at ef=100, >=0.98 at ef=400 (ef sweep included)

plus QPS single-/multi-thread and insert throughput.

Writes HNSW_PARITY_r03.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ruvector_tpu.index.hnsw import HnswConfig, HnswIndex


def exact_topk(base: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """Brute-force cosine ground truth."""
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    out = np.zeros((len(queries), k), np.int32)
    for i in range(0, len(queries), 256):
        sims = qn[i:i + 256] @ bn.T
        out[i:i + 256] = np.argpartition(-sims, k, axis=1)[:, :k]
        # order the top-k exactly
        part = out[i:i + 256]
        row = np.arange(part.shape[0])[:, None]
        order = np.argsort(-sims[row, part], axis=1)
        out[i:i + 256] = part[row, order]
    return out


def recall_at(ids: np.ndarray, truth: np.ndarray, k: int) -> float:
    hits = 0
    for a, b in zip(ids[:, :k], truth[:, :k]):
        hits += len(set(a.tolist()) & set(b.tolist()))
    return hits / (len(ids) * k)


def run_distribution(kind: str, n=10_000, d=384, nq=1_000):
    rng = np.random.default_rng(0)
    if kind == "uniform":
        base = rng.normal(size=(n, d)).astype(np.float32)
        queries = rng.normal(size=(nq, d)).astype(np.float32)
    else:   # clustered: reference lib.rs:116-118 distribution shape
        centers = rng.normal(size=(100, d)).astype(np.float32) * 3.0
        base = (centers[rng.integers(0, 100, n)]
                + rng.normal(size=(n, d))).astype(np.float32)
        queries = (centers[rng.integers(0, 100, nq)]
                   + rng.normal(size=(nq, d))).astype(np.float32)

    cfg = HnswConfig(dim=d, m=32, ef_construction=200, ef_search=100)
    # median-of-3 builds: these 4 vCPUs are shared, and single-run build
    # times spread +-15-20% (observed 5,450-7,126 inserts/s for one
    # binary); the median is the honest, reproducible figure
    builds = []
    for _ in range(3):
        idx = HnswIndex(cfg)
        t0 = time.perf_counter()
        idx.add_batch(base, num_threads=os.cpu_count() or 4)
        builds.append(time.perf_counter() - t0)
    t_build = sorted(builds)[1]
    truth = exact_topk(base, queries, 100)

    # QPS measured AT EVERY swept ef (VERDICT r4 #6: QPS was published
    # only at ef=100, where uniform-data recall@10 is ~0.78 — no
    # recall-matched comparison existed against the reference's QPS rows)
    nthreads = os.cpu_count() or 4
    sweep = {}
    # larger uniform corpora need deeper beams to reach recall 0.95
    efs = (100, 200, 400) if n <= 10_000 else (100, 200, 400, 800, 1600)
    for ef in efs:
        ids, _ = idx.search_batch(queries, k=100, ef=ef,
                                  num_threads=nthreads)
        t0 = time.perf_counter()
        idx.search_batch(queries, k=100, ef=ef, num_threads=nthreads)
        t_mt = time.perf_counter() - t0
        t0 = time.perf_counter()
        idx.search_batch(queries, k=100, ef=ef, num_threads=1)
        t_1t = time.perf_counter() - t0
        lats = []
        for q in queries[:200]:
            t0 = time.perf_counter()
            idx.search(q, k=10, ef=ef)
            lats.append(time.perf_counter() - t0)
        lats = np.sort(lats)
        sweep[f"ef={ef}"] = {
            "recall@1": round(recall_at(ids, truth, 1), 4),
            "recall@10": round(recall_at(ids, truth, 10), 4),
            "recall@100": round(recall_at(ids, truth, 100), 4),
            "qps_1thread": round(nq / t_1t),
            "qps_multithread": round(nq / t_mt),
            "p50_ms": round(float(lats[len(lats) // 2]) * 1e3, 3),
            "p99_ms": round(float(lats[int(len(lats) * 0.99)]) * 1e3, 3),
        }

    # recall-matched operating point: the lowest swept ef reaching
    # recall@10 >= 0.95, and its measured QPS
    matched = next((sweep[f"ef={ef}"] | {"ef": ef}
                    for ef in efs
                    if sweep[f"ef={ef}"]["recall@10"] >= 0.95), None)
    return {
        "build_s": round(t_build, 2),
        "inserts_per_s": round(n / t_build),
        "recall_sweep": sweep,
        "qps_at_recall10_ge_0.95": matched,
        "qps_1thread": sweep["ef=100"]["qps_1thread"],
        "qps_multithread": sweep["ef=100"]["qps_multithread"],
        "p50_ms": sweep["ef=100"]["p50_ms"],
        "p99_ms": sweep["ef=100"]["p99_ms"],
    }


def main():
    payload = {
        "config": "reference operating point: 10k x 384, m=32, efc=200, "
                  "ef=100 (BASELINE.md row 1)",
        "reference": {
            "qps": 1216, "p50_ms": 0.78,
            "recall@1": 1.0, "recall@10": 1.0, "recall@100": 1.0,
            "hardware": "Apple M4 Pro",
            "note": "reference recall figures are HARDCODED constants, "
                    "not measurements (comparison_benchmark.rs:130-132,"
                    "177-179); ours below are measured vs exact "
                    "brute-force ground truth",
        },
        "threads": os.cpu_count(),
        "clustered": run_distribution("clustered"),
        "uniform": run_distribution("uniform"),
        # the reference's 50k x 384 multithread row (3,597 QPS, p50
        # 2.86 ms at 16 threads on M4 Pro — latency_benchmark.md:85-99);
        # ours is measured on 4 shared vCPUs with per-ef QPS so the
        # recall-matched comparison is explicit
        "uniform_50k": {
            "reference": {"qps_16thread": 3597, "p50_ms": 2.86,
                          "hardware": "Apple M4 Pro, 16 threads"},
            **run_distribution("uniform", n=50_000),
        },
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "HNSW_PARITY_r05.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
