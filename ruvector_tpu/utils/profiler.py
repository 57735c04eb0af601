"""Profiler: latency/memory accounting + jax.profiler trace hooks.

Reference: ruvector-profiler (latency/memory/power profilers + CSV emitter +
config hashing, crates/ruvector-profiler/src/). TPU mapping: wall-clock
regions with block_until_ready discipline, device memory stats from
jax.local_devices()[0].memory_stats(), and optional XLA trace capture via
jax.profiler.trace for TensorBoard.
"""

from __future__ import annotations

import contextlib
import csv
import hashlib
import io
import json
import time
from collections import defaultdict

import jax
import numpy as np


class Profiler:
    def __init__(self):
        self.records: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def region(self, name: str, sync: bool = True):
        """Time a region; `sync=True` waits for device completion so the
        measurement covers actual execution, not dispatch."""
        t0 = time.perf_counter()
        result_holder = []
        try:
            yield result_holder
        finally:
            if sync and result_holder:
                jax.block_until_ready(result_holder[-1])
            self.records[name].append(time.perf_counter() - t0)

    def summary(self) -> dict[str, dict]:
        out = {}
        for name, times in self.records.items():
            arr = np.asarray(times)
            out[name] = {
                "count": len(arr),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p99_ms": float(np.percentile(arr, 99) * 1e3),
                "total_s": float(arr.sum()),
            }
        return out

    def to_csv(self) -> str:
        """CSV emission (ruvector-profiler csv_emitter parity)."""
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(["region", "count", "mean_ms", "p50_ms", "p99_ms", "total_s"])
        for name, s in self.summary().items():
            w.writerow([name, s["count"], f"{s['mean_ms']:.4f}",
                        f"{s['p50_ms']:.4f}", f"{s['p99_ms']:.4f}",
                        f"{s['total_s']:.4f}"])
        return buf.getvalue()

    @staticmethod
    def device_memory_stats() -> dict:
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            return {k: int(v) for k, v in stats.items()}
        except Exception:
            return {}

    @staticmethod
    def config_hash(config) -> str:
        """Stable hash of a config object for run identification
        (ruvector-profiler config_hash parity)."""
        try:
            payload = json.dumps(dataclass_to_dict(config), sort_keys=True)
        except TypeError:
            payload = repr(config)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    @contextlib.contextmanager
    def xla_trace(self, logdir: str):
        """Capture an XLA trace viewable in TensorBoard/Perfetto."""
        with jax.profiler.trace(logdir):
            yield


def dataclass_to_dict(obj):
    import dataclasses

    if dataclasses.is_dataclass(obj):
        return {f.name: dataclass_to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [dataclass_to_dict(o) for o in obj]
    if isinstance(obj, dict):
        return {k: dataclass_to_dict(v) for k, v in obj.items()}
    return obj


@contextlib.contextmanager
def profile_region(name: str, profiler: Profiler | None = None):
    prof = profiler or _global_profiler
    with prof.region(name) as holder:
        yield holder


_global_profiler = Profiler()
