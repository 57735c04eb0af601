"""Dynamic min-cut maintenance with monitoring callbacks.

Reference: ruvector-mincut — subpolynomial dynamic min-cut
(linkcut/euler/expander subsystems) + monitoring module (event-driven
threshold callbacks, monitoring/mod.rs). This maintainer keeps the exact
s-t min-cut of an edge-weighted digraph under insert/delete/reweight.

Two backends:
- native (default when the C++ runtime builds): the INCREMENTAL solver
  (native/graph_runtime.cpp incmc_*) — persistent warm max-flow
  residual; inserts that don't cross the current cut are O(1) and
  provably value-preserving, crossing updates repair with warm Dinic
  phases, deletes cancel only the excess flow. 542x faster than
  recompute-per-query at 1M nodes / 4M edges (MINCUT_SCALE_r02.json).
- python: lazy exact recompute with the Dinic core
  (attention/mincut._Dinic) — always available; serves as the bit-exact
  oracle the native backend is fuzz-pinned to
  (tests/test_incremental_mincut.py).

Monitoring semantics follow the reference: registered watchers fire when
the cut value crosses their threshold (edge-triggered, via
utils.monitoring.MetricWatcher).
"""

from __future__ import annotations

import numpy as np

from ruvector_tpu.utils.monitoring import MetricWatcher



def _cert_hash(payload: dict) -> str:
    import hashlib
    import json

    return hashlib.sha256(
        json.dumps(payload, sort_keys=True).encode()).hexdigest()


def _cert_hash_ok(cert: dict) -> bool:
    payload = {k: v for k, v in cert.items() if k != "hash"}
    return _cert_hash(payload) == cert.get("hash")


def _crossing_edges(weights: dict, side) -> list:
    """Directed crossing edges (u on the True side, v off it)."""
    return sorted((u, v) for (u, v) in weights if side[u] and not side[v])


class DynamicMinCut:
    """backend='auto' uses the native incremental solver
    (native.IncrementalMinCut: persistent warm residual, O(1)
    value-preserving inserts, excess-cancellation deletes) when the C++
    runtime is importable; 'python' forces the lazy exact-recompute path
    (always available, bit-exact oracle for the native one)."""

    def __new__(cls, num_nodes: int, source: int | None = 0,
                sink: int | None = None, backend: str = "auto"):
        if source is None and cls is DynamicMinCut:
            # no (source, sink): GLOBAL min-cut semantics
            # (ruvector-mincut/src/lib.rs:1-57 maintains the global cut)
            return GlobalMinCutFacade(num_nodes, backend=backend)
        return super().__new__(cls)

    def __init__(self, num_nodes: int, source: int | None = 0,
                 sink: int | None = None, backend: str = "auto"):
        self.n = num_nodes
        self.source = source
        self.sink = sink if sink is not None else num_nodes - 1
        self.weights: dict[tuple[int, int], float] = {}
        self._dirty = True
        self._cut_value = 0.0
        self._cut_edges: list[tuple[int, int]] = []
        self.watcher = MetricWatcher()
        self.update_count = 0
        self._inc = None
        if backend in ("auto", "native"):
            try:
                from ruvector_tpu.native import IncrementalMinCut, available

                if available:
                    self._inc = IncrementalMinCut(
                        num_nodes, self.source, self.sink)
                elif backend == "native":
                    raise RuntimeError("native runtime unavailable")
            except ImportError:
                if backend == "native":
                    raise

    # --- updates (linkcut-equivalent surface) ------------------------------

    def insert_edge(self, u: int, v: int, w: float):
        self.weights[(u, v)] = self.weights.get((u, v), 0.0) + w
        if self._inc is not None:
            self._inc.insert_edge(u, v, w)
        self._dirty = True
        self.update_count += 1

    def delete_edge(self, u: int, v: int):
        self.weights.pop((u, v), None)
        if self._inc is not None:
            self._inc.delete_edge(u, v)
        self._dirty = True
        self.update_count += 1

    def reweight_edge(self, u: int, v: int, w: float):
        if w <= 0:
            self.delete_edge(u, v)
        else:
            self.weights[(u, v)] = w
            if self._inc is not None:
                self._inc.reweight_edge(u, v, w)
            self._dirty = True
            self.update_count += 1

    # --- queries -----------------------------------------------------------

    def _recompute(self):
        if self._inc is not None:
            self._cut_value = self._inc.cut_value()
            self._cut_edges = self._inc.cut_edges()
            self._dirty = False
            self.watcher.observe("cut_value", self._cut_value)
            return
        from ruvector_tpu.attention.mincut import _Dinic

        dinic = _Dinic(self.n)
        edges = list(self.weights.items())
        for (u, v), w in edges:
            dinic.add_edge(u, v, float(w))
        self._cut_value = float(dinic.max_flow(self.source, self.sink))
        reach = dinic.reachable(self.source)
        self._cut_edges = [(u, v) for (u, v), w in edges
                           if reach[u] and not reach[v]]
        self._dirty = False
        self.watcher.observe("cut_value", self._cut_value)

    def cut_value(self) -> float:
        if self._dirty:
            self._recompute()
        return self._cut_value

    def cut_edges(self) -> list[tuple[int, int]]:
        if self._dirty:
            self._recompute()
        return list(self._cut_edges)

    def solver_stats(self) -> dict | None:
        """Native repair counters (None on the python backend)."""
        return self._inc.stats() if self._inc is not None else None

    def partition(self) -> np.ndarray:
        """Boolean source-side indicator over nodes."""
        if self._dirty:
            self._recompute()
        if self._inc is not None:
            return self._inc.partition()
        from ruvector_tpu.attention.mincut import _Dinic

        dinic = _Dinic(self.n)
        for (u, v), w in self.weights.items():
            dinic.add_edge(u, v, float(w))
        dinic.max_flow(self.source, self.sink)
        return np.asarray(dinic.reachable(self.source), bool)

    # --- monitoring (monitoring/mod.rs semantics) --------------------------

    def watch_threshold(self, threshold: float, direction: str, callback,
                        hysteresis: float = 0.0):
        """callback(name, value) fires when the cut value crosses the
        threshold; re-arms after a hysteresis re-cross."""
        return self.watcher.watch("cut_value", threshold, direction,
                                  callback, hysteresis)

    # --- certificate (certificate/ subsystem role) -------------------------

    def certificate(self) -> dict:
        """Verifiable cut witness: partition + crossing edges + value +
        hash. verify_certificate re-checks it against the live graph."""
        side = self.partition()
        payload = {
            "source": self.source, "sink": self.sink,
            "value": round(self.cut_value(), 6),
            "cut_edges": sorted(self.cut_edges()),
            "source_side": np.nonzero(side)[0].tolist(),
        }
        payload["hash"] = _cert_hash(payload)
        return payload

    def verify_certificate(self, cert: dict) -> bool:
        """A valid certificate's partition separates s from t, its edges
        are exactly the crossing edges, and their weight equals the value
        (max-flow == min-cut ensures optimality of an honest witness)."""
        if not _cert_hash_ok(cert):
            return False
        side = np.zeros(self.n, bool)
        side[cert["source_side"]] = True
        if not side[self.source] or side[self.sink]:
            return False
        crossing = _crossing_edges(self.weights, side)
        if crossing != [tuple(e) for e in cert["cut_edges"]]:
            return False
        weight = sum(self.weights[e] for e in crossing)
        return abs(weight - cert["value"]) < 1e-4


class GlobalMinCutFacade:
    """DynamicMinCut-shaped surface over the GLOBAL min-cut maintainer
    (mincut/global_dynamic.py): same update verbs and monitoring, but the
    answers are the graph's global minimum cut — no (source, sink).

    backend='native' uses the C++ gmc_* solver (graph_runtime.cpp) when
    available; 'python'/'auto' fall back to the exact Python maintainer.
    """

    def __init__(self, num_nodes: int, backend: str = "auto"):
        self.n = num_nodes
        self.source = None
        self.sink = None
        self.watcher = MetricWatcher()
        self._g = None
        if backend in ("auto", "native"):
            try:
                from ruvector_tpu.native import (
                    GlobalIncrementalMinCut,
                    available,
                )

                if available:
                    self._g = GlobalIncrementalMinCut(num_nodes)
                elif backend == "native":
                    raise RuntimeError("native runtime unavailable")
            except ImportError:
                if backend == "native":
                    raise
        if self._g is None:
            from ruvector_tpu.mincut.global_dynamic import (
                GlobalDynamicMinCut,
            )

            self._g = GlobalDynamicMinCut(num_nodes)

        # facade-side undirected weight book (certificates re-check the
        # live graph; the native solver doesn't expose its map)
        self.weights: dict[tuple[int, int], float] = {}

    @property
    def update_count(self) -> int:
        return self._g.update_count

    @staticmethod
    def _key(u: int, v: int) -> tuple[int, int]:
        return (u, v) if u < v else (v, u)

    def insert_edge(self, u: int, v: int, w: float):
        if u == v or w <= 0:
            return
        k = self._key(u, v)
        self.weights[k] = self.weights.get(k, 0.0) + w
        self._g.insert_edge(u, v, w)

    def delete_edge(self, u: int, v: int):
        self.weights.pop(self._key(u, v), None)
        self._g.delete_edge(u, v)

    def reweight_edge(self, u: int, v: int, w: float):
        if w <= 0:
            return self.delete_edge(u, v)
        self.weights[self._key(u, v)] = w
        self._g.reweight_edge(u, v, w)

    def cut_value(self) -> float:
        v = self._g.cut_value()
        self.watcher.observe("cut_value", v)
        return v

    def cut_edges(self) -> list[tuple[int, int]]:
        return self._g.cut_edges()

    def partition(self) -> np.ndarray:
        return np.asarray(self._g.partition(), bool)

    def solver_stats(self) -> dict:
        return self._g.stats()

    def watch_threshold(self, threshold: float, direction: str, callback,
                        hysteresis: float = 0.0):
        return self.watcher.watch("cut_value", threshold, direction,
                                  callback, hysteresis)

    def certificate(self) -> dict:
        side = self.partition()
        payload = {
            "global": True,
            "value": round(self.cut_value(), 6),
            "cut_edges": [list(e) for e in sorted(self.cut_edges())],
            "source_side": np.nonzero(side)[0].tolist(),
        }
        payload["hash"] = _cert_hash(payload)
        return payload

    def verify_certificate(self, cert: dict) -> bool:
        """Valid iff: hash checks, both sides hold >=1 active node, the
        listed edges are exactly the crossing edges (either direction —
        the cut is global/undirected), and their weight equals the
        claimed value."""
        if not _cert_hash_ok(cert):
            return False
        side = np.zeros(self.n, bool)
        side[cert["source_side"]] = True
        w = dict(self.weights)
        deg = np.zeros(self.n)
        for (u, v), ww in w.items():
            deg[u] += ww
            deg[v] += ww
        active = deg > 1e-12
        if active.sum() >= 2 and not (
                side[active].any() and not side[active].all()):
            return False
        crossing = sorted((u, v) for (u, v) in w if side[u] != side[v])
        if crossing != [tuple(e) for e in cert["cut_edges"]]:
            return False
        weight = sum(w[e] for e in crossing)
        return abs(weight - cert["value"]) < 1e-4
