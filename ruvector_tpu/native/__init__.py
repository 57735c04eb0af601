"""ctypes bindings for the native graph runtime (graph_runtime.cpp).

Builds the shared library on first import (g++ -O3, cached next to the
source); falls back to `available = False` when no compiler is present so
pure-Python paths keep working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_runtime.cpp")
_LIB = os.path.join(_HERE, "libgraph_runtime.so")

available = False
_lib = None


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-std=c++17",
             "-pthread", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, available
    if not _build():
        return
    lib = ctypes.CDLL(_LIB)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    u64 = ctypes.c_uint64
    f32 = ctypes.c_float

    lib.bfs_reorder.argtypes = [i32p, f32p, i64, i64, i64p]
    lib.label_propagation_order.argtypes = [i32p, f32p, i64, i64, i64, i64p]
    lib.halo_plan_size.argtypes = [i32p, f32p, i64, i64, i64, i64]
    lib.halo_plan_size.restype = i64
    lib.halo_plan_fill.argtypes = [i32p, f32p, i64, i64, i64, i64, i64,
                                   i32p, f32p, i32p]
    lib.sample_fanout.argtypes = [i32p, f32p, i64, i64, i64, u64, i32p, f32p]
    lib.dinic_mincut_gate.argtypes = [f32p, i64, f32, f32, u8p]
    lib.dinic_mincut_gate.restype = f32
    lib.csr_count.argtypes = [f32p, i64, i64]
    lib.csr_count.restype = i64
    lib.csr_fill.argtypes = [i32p, f32p, f32p, i64, i64, i32p, i32p, f32p]

    i32 = ctypes.c_int32
    voidp = ctypes.c_void_p
    lib.incmc_create.argtypes = [i32, i32, i32]
    lib.incmc_create.restype = voidp
    lib.incmc_free.argtypes = [voidp]
    lib.incmc_update.argtypes = [voidp, i32, i32, f32, i32]
    lib.incmc_value.argtypes = [voidp]
    lib.incmc_value.restype = f32
    lib.incmc_partition.argtypes = [voidp, u8p]
    lib.incmc_cut_edges.argtypes = [voidp, i32p, i32p, i64]
    lib.incmc_cut_edges.restype = i64
    lib.incmc_stats.argtypes = [voidp, i64p]

    f64 = ctypes.c_double
    lib.gmc_create.argtypes = [i32]
    lib.gmc_create.restype = voidp
    lib.gmc_free.argtypes = [voidp]
    lib.gmc_insert.argtypes = [voidp, i32, i32, f64]
    lib.gmc_delete.argtypes = [voidp, i32, i32]
    lib.gmc_reweight.argtypes = [voidp, i32, i32, f64]
    lib.gmc_value.argtypes = [voidp]
    lib.gmc_value.restype = f64
    lib.gmc_partition.argtypes = [voidp, u8p]
    lib.gmc_cut_edges.argtypes = [voidp, i32p, i32p, i64]
    lib.gmc_cut_edges.restype = i64
    lib.gmc_stats.argtypes = [voidp, i64p]

    lib.bdense_halo_max.argtypes = [i32p, f32p, i64, i64, i64, i64]
    lib.bdense_halo_max.restype = i64
    lib.bdense_fill.argtypes = [i32p, f32p, f32p, i64, i64, i64, i64,
                                f32, i32, i64, i32p, ctypes.c_void_p,
                                f32p, f32p, i64p]
    lib.bdense_fill.restype = i32
    lib.bdense_slots.argtypes = [i32p, f32p, i64, i64, i64, i64, i64,
                                 i32p, i32p]
    lib.bdense_slots.restype = i32
    lib.gen_cluster_knn.argtypes = [i64, i64, i64, i64, u64, i64,
                                    f32p, i32p, f32p]

    _lib = lib
    available = True


_load()


def bfs_reorder(nbr: np.ndarray, mask: np.ndarray) -> np.ndarray:
    n, m = nbr.shape
    out = np.zeros(n, np.int64)
    _lib.bfs_reorder(np.ascontiguousarray(nbr, np.int32),
                     np.ascontiguousarray(mask, np.float32), n, m, out)
    return out


def label_propagation_order(nbr: np.ndarray, mask: np.ndarray,
                            iters: int = 10) -> np.ndarray:
    n, m = nbr.shape
    out = np.zeros(n, np.int64)
    _lib.label_propagation_order(
        np.ascontiguousarray(nbr, np.int32),
        np.ascontiguousarray(mask, np.float32), n, m, iters, out,
    )
    return out


def halo_plan(nbr: np.ndarray, mask: np.ndarray, n_shards: int, block: int):
    """Returns (halo, send_idx [S,S,H], send_mask [S,S,H], local_nbr [S,block,M])."""
    n_pad, m = nbr.shape
    nbr_c = np.ascontiguousarray(nbr, np.int32)
    mask_c = np.ascontiguousarray(mask, np.float32)
    halo = int(_lib.halo_plan_size(nbr_c, mask_c, n_pad, m, n_shards, block))
    send_idx = np.zeros((n_shards, n_shards, halo), np.int32)
    send_mask = np.zeros((n_shards, n_shards, halo), np.float32)
    local_nbr = np.zeros((n_shards, block, m), np.int32)
    _lib.halo_plan_fill(nbr_c, mask_c, n_pad, m, n_shards, block, halo,
                        send_idx, send_mask, local_nbr)
    return halo, send_idx, send_mask, local_nbr


def sample_fanout(nbr: np.ndarray, mask: np.ndarray, fanout: int, seed: int = 42):
    n, m = nbr.shape
    out_idx = np.zeros((n, fanout), np.int32)
    out_mask = np.zeros((n, fanout), np.float32)
    _lib.sample_fanout(np.ascontiguousarray(nbr, np.int32),
                       np.ascontiguousarray(mask, np.float32),
                       n, m, fanout, seed, out_idx, out_mask)
    return out_idx, out_mask


def dinic_mincut_gate(logits: np.ndarray, lam: float, eps: float):
    """Returns (keep_mask [S,S] bool, applied_cut_cost)."""
    seq = logits.shape[0]
    keep = np.zeros(seq * seq, np.uint8)
    cost = _lib.dinic_mincut_gate(
        np.ascontiguousarray(logits.reshape(-1), np.float32), seq, lam, eps, keep
    )
    return keep.reshape(seq, seq).astype(bool), float(cost)


def to_csr(nbr: np.ndarray, mask: np.ndarray, weight: np.ndarray):
    """Returns (row_ptr [n+1], col_idx [E], values [E])."""
    n, m = nbr.shape
    mask_c = np.ascontiguousarray(mask, np.float32)
    e = int(_lib.csr_count(mask_c, n, m))
    row_ptr = np.zeros(n + 1, np.int32)
    col_idx = np.zeros(e, np.int32)
    values = np.zeros(e, np.float32)
    _lib.csr_fill(np.ascontiguousarray(nbr, np.int32), mask_c,
                  np.ascontiguousarray(weight, np.float32),
                  n, m, row_ptr, col_idx, values)
    return row_ptr, col_idx, values


class IncrementalMinCut:
    """Persistent-residual incremental s-t min-cut (graph_runtime.cpp
    incmc_*) — the large-graph maintainer standing in for the reference's
    subpolynomial structures (ruvector-mincut/src/{linkcut,euler}/).

    Updates are O(1) bookkeeping (value-preserving inserts skip repair
    entirely); queries repair the warm max-flow residual instead of
    recomputing from scratch.
    """

    def __init__(self, n: int, source: int = 0, sink: int | None = None):
        if not available:
            raise RuntimeError("native graph runtime unavailable")
        self.n = int(n)
        self.source = int(source)
        self.sink = int(sink if sink is not None else n - 1)
        self._h = _lib.incmc_create(self.n, self.source, self.sink)

    def close(self):
        if self._h:
            _lib.incmc_free(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    def insert_edge(self, u: int, v: int, w: float):
        _lib.incmc_update(self._h, u, v, float(w), 0)

    def reweight_edge(self, u: int, v: int, w: float):
        _lib.incmc_update(self._h, u, v, float(w), 1)

    def delete_edge(self, u: int, v: int):
        _lib.incmc_update(self._h, u, v, 0.0, 1)

    def cut_value(self) -> float:
        return float(_lib.incmc_value(self._h))

    def partition(self) -> np.ndarray:
        out = np.zeros(self.n, np.uint8)
        _lib.incmc_partition(self._h, out)
        return out.astype(bool)

    def cut_edges(self) -> list[tuple[int, int]]:
        cap = 1024
        while True:
            us = np.zeros(cap, np.int32)
            vs = np.zeros(cap, np.int32)
            k = int(_lib.incmc_cut_edges(self._h, us, vs, cap))
            if k <= cap:
                return sorted(zip(us[:k].tolist(), vs[:k].tolist()))
            cap = k

    def stats(self) -> dict:
        out = np.zeros(5, np.int64)
        _lib.incmc_stats(self._h, out)
        return {"updates": int(out[0]), "o1_skips": int(out[1]),
                "augment_phases": int(out[2]), "cancels": int(out[3]),
                "rebuilds": int(out[4])}


class GlobalIncrementalMinCut:
    """Native GLOBAL (no source/sink) dynamic min-cut (graph_runtime.cpp
    gmc_*) — same exact incremental invariants as the Python
    mincut/global_dynamic.GlobalDynamicMinCut (which it is fuzz-pinned
    to): O(pool) non-crossing updates, one-Dinic decrease repairs,
    candidate-pool certificates, Stoer-Wagner recompute backstop."""

    def __init__(self, n: int):
        if not available:
            raise RuntimeError("native graph runtime unavailable")
        self.n = int(n)
        self._h = _lib.gmc_create(self.n)
        self._updates = 0

    def close(self):
        if self._h:
            _lib.gmc_free(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    @property
    def update_count(self) -> int:
        return self._updates

    def insert_edge(self, u: int, v: int, w: float):
        self._updates += 1
        _lib.gmc_insert(self._h, u, v, float(w))

    def delete_edge(self, u: int, v: int):
        self._updates += 1
        _lib.gmc_delete(self._h, u, v)

    def reweight_edge(self, u: int, v: int, w: float):
        self._updates += 1
        _lib.gmc_reweight(self._h, u, v, float(w))

    def cut_value(self) -> float:
        return float(_lib.gmc_value(self._h))

    def partition(self) -> np.ndarray:
        out = np.zeros(self.n, np.uint8)
        _lib.gmc_partition(self._h, out)
        return out.astype(bool)

    def cut_edges(self) -> list[tuple[int, int]]:
        cap = 1024
        while True:
            us = np.zeros(cap, np.int32)
            vs = np.zeros(cap, np.int32)
            k = int(_lib.gmc_cut_edges(self._h, us, vs, cap))
            if k <= cap:
                return sorted(zip(us[:k].tolist(), vs[:k].tolist()))
            cap = k

    def stats(self) -> dict:
        out = np.zeros(5, np.int64)
        _lib.gmc_stats(self._h, out)
        return {"updates": int(out[0]), "o1_updates": int(out[1]),
                "flow_repairs": int(out[2]), "full_recomputes": int(out[3]),
                "ball_certified": int(out[4])}


def bdense_build(nbr: np.ndarray, mask: np.ndarray, ew: np.ndarray,
                 block: int, table_pad: int = 128, eps_edge: float = 1e-8,
                 bf16: bool = False, threads: int = 0):
    """Threaded block-dense table build (graph/block_dense.py semantics,
    uniform blocks). Returns (local_ids, wdense, degrees, node_pad,
    node_pos, dup) — wdense is bf16 (ml_dtypes) when bf16=True."""
    import os as _os

    threads = threads or (_os.cpu_count() or 4)
    n, m = nbr.shape
    nbr_c = np.ascontiguousarray(nbr, np.int32)
    mask_c = np.ascontiguousarray(mask, np.float32)
    ew_c = np.ascontiguousarray(ew, np.float32)
    nb = -(-n // block)
    halo = int(_lib.bdense_halo_max(nbr_c, mask_c, n, m, block, threads))
    table = block + halo
    table = -(-table // table_pad) * table_pad
    local_ids = np.zeros((nb, table), np.int32)
    if bf16:
        wdense = np.zeros((nb, block, table), np.uint16)
    else:
        wdense = np.zeros((nb, block, table), np.float32)
    degrees = np.zeros((nb, block), np.float32)
    node_pad = np.zeros((nb, block), np.float32)
    node_pos = np.zeros(n, np.int64)
    dup = int(_lib.bdense_fill(
        nbr_c, mask_c, ew_c, n, m, block, table,
        np.float32(eps_edge), 1 if bf16 else 0, threads,
        local_ids, wdense.ctypes.data_as(ctypes.c_void_p),
        degrees, node_pad, node_pos))
    if bf16:
        import ml_dtypes

        wdense = wdense.view(ml_dtypes.bfloat16)
    return local_ids, wdense, degrees, node_pad, node_pos, dup


def bdense_plan(nbr: np.ndarray, mask: np.ndarray, block: int,
                table_pad: int = 128, threads: int = 0):
    """Compact block-dense plan for device-side densification: returns
    (local_ids [nb, T], slot [n, m], dup). slot[g, j] is edge (g, j)'s
    column in its block's local table (== T for masked edges, the
    scatter-drop sentinel). The [nb, B, T] weight table itself is built
    ON DEVICE from (slot, normalized weights) — see
    graph/block_dense.py's device-fill path — so only ~n*m values cross
    the host->device link instead of nb*B*T."""
    import os as _os

    threads = threads or (_os.cpu_count() or 4)
    n, m = nbr.shape
    nbr_c = np.ascontiguousarray(nbr, np.int32)
    mask_c = np.ascontiguousarray(mask, np.float32)
    nb = -(-n // block)
    halo = int(_lib.bdense_halo_max(nbr_c, mask_c, n, m, block, threads))
    table = block + halo
    table = -(-table // table_pad) * table_pad
    local_ids = np.zeros((nb, table), np.int32)
    slot = np.zeros((n, m), np.int32)
    dup = int(_lib.bdense_slots(nbr_c, mask_c, n, m, block, table,
                                threads, local_ids, slot))
    return local_ids, slot, dup


def gen_cluster_knn(n: int, d: int, k: int, cluster: int, seed: int = 0,
                    threads: int = 0):
    """Threaded clustered corpus + exact within-cluster kNN. Returns
    (feats [n,d], idx [n,k], ew [n,k]); ids cluster-contiguous."""
    import os as _os

    threads = threads or (_os.cpu_count() or 4)
    assert n % cluster == 0
    assert 0 < k < cluster, "k must be < cluster (self excluded)"
    feats = np.empty((n, d), np.float32)
    idx = np.empty((n, k), np.int32)
    ew = np.empty((n, k), np.float32)
    _lib.gen_cluster_knn(n, d, k, cluster, np.uint64(seed), threads,
                         feats, idx, ew)
    return feats, idx, ew
