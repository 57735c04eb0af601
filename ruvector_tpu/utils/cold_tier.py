"""Out-of-core training: disk feature storage + hyperbatch streaming.

Reference: ruvector-gnn/src/cold_tier.rs — block-aligned FeatureStorage
(:35-240), BFS-reordered HyperbatchIterator with double buffers (:242-349),
LFU-decay AdaptiveHotset (:350-500), ColdTierTrainer epoch loop with
io/compute timing (:503+); and mmap.rs MmapManager/MmapGradientAccumulator.

TPU mapping: features live in a numpy memmap (the host tier); hyperbatches
stream BFS-ordered blocks to HBM with an overlapped prefetch
(device_put of batch k+1 while batch k computes — the double-buffer design,
cold_tier.rs num_buffers). The AdaptiveHotset pins hot rows in HBM.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import jax
import numpy as np


class FeatureStorage:
    """Disk-backed [num_nodes, dim] f32 feature store via numpy memmap.

    The memmap replaces the reference's hand-rolled block-aligned file +
    page-size logic (cold_tier.rs:35-240) — the OS page cache provides the
    same block alignment and madvise-style readahead.
    """

    def __init__(self, path: str | Path, dim: int, num_nodes: int,
                 mode: str = "r+", create: bool = False):
        if dim <= 0:
            raise ValueError("dim must be > 0")
        self.path = Path(path)
        self.dim = dim
        self.num_nodes = num_nodes
        if create:
            mm = np.lib.format.open_memmap(
                self.path, mode="w+", dtype=np.float32, shape=(num_nodes, dim)
            )
            mm.flush()
            self._mm = mm
        else:
            self._mm = np.lib.format.open_memmap(self.path, mode=mode)
            assert self._mm.shape == (num_nodes, dim)

    @staticmethod
    def create(path, dim: int, num_nodes: int) -> "FeatureStorage":
        return FeatureStorage(path, dim, num_nodes, create=True)

    @staticmethod
    def open(path) -> "FeatureStorage":
        mm = np.lib.format.open_memmap(path, mode="r+")
        fs = FeatureStorage.__new__(FeatureStorage)
        fs.path = Path(path)
        fs._mm = mm
        fs.num_nodes, fs.dim = mm.shape
        return fs

    def write_batch(self, node_ids: np.ndarray, features: np.ndarray):
        self._mm[node_ids] = features

    def read_batch(self, node_ids: np.ndarray) -> np.ndarray:
        return np.asarray(self._mm[node_ids])

    def flush(self):
        self._mm.flush()


@dataclasses.dataclass(frozen=True)
class HyperbatchConfig:
    batch_size: int = 1024
    num_buffers: int = 2


class HyperbatchIterator:
    """BFS-ordered batches streamed to device with prefetch overlap.

    next_batch() returns (node_ids, features_on_device); the following
    batch's host->device copy is already in flight (double buffering,
    cold_tier.rs:242-330).
    """

    def __init__(self, storage: FeatureStorage, config: HyperbatchConfig,
                 node_order: np.ndarray | None = None):
        self.storage = storage
        self.config = config
        self.node_order = (
            np.asarray(node_order) if node_order is not None
            else np.arange(storage.num_nodes)
        )
        self.reset()

    def reset(self):
        self._offset = 0
        self.batch_counter = 0
        self._inflight = None
        self._prefetch()

    def _prefetch(self):
        if self._offset >= len(self.node_order):
            self._inflight = None
            return
        end = min(self._offset + self.config.batch_size, len(self.node_order))
        ids = self.node_order[self._offset : end]
        host = self.storage.read_batch(ids)
        # async host->device; completes while the previous batch computes
        dev = jax.device_put(host)
        self._inflight = (ids, dev)
        self._offset = end

    def next_batch(self):
        if self._inflight is None:
            return None
        ids, dev = self._inflight
        self._prefetch()              # start the next copy before returning
        self.batch_counter += 1
        return ids, dev


class AdaptiveHotset:
    """LFU-with-decay cache of hot rows pinned in HBM (cold_tier.rs:350-500)."""

    def __init__(self, capacity: int, decay: float = 0.9):
        self.capacity = capacity
        self.decay = decay
        self.scores: dict[int, float] = {}
        self.cache: dict[int, jax.Array] = {}

    def access(self, node_id: int, loader=None):
        self.scores[node_id] = self.scores.get(node_id, 0.0) + 1.0
        if node_id in self.cache:
            return self.cache[node_id]
        if loader is None:
            return None
        value = loader(node_id)
        self._insert(node_id, value)
        return value

    def _insert(self, node_id: int, value):
        if len(self.cache) >= self.capacity:
            # evict min-score cached entry
            victim = min(self.cache, key=lambda k: self.scores.get(k, 0.0))
            if self.scores.get(victim, 0.0) >= self.scores.get(node_id, 0.0):
                return  # new entry not hot enough
            del self.cache[victim]
        self.cache[node_id] = value

    def decay_scores(self):
        for k in list(self.scores):
            self.scores[k] *= self.decay
            if self.scores[k] < 1e-3:
                del self.scores[k]

    def hit_rate_nodes(self) -> set[int]:
        return set(self.cache)


@dataclasses.dataclass
class EpochStats:
    batches: int
    io_time_s: float
    compute_time_s: float
    loss: float


class ColdTierTrainer:
    """Epoch loop over hyperbatches with io/compute timing
    (cold_tier.rs:503+). `step_fn(node_ids, features)->loss` is the user's
    jitted compute."""

    def __init__(self, storage: FeatureStorage, config: HyperbatchConfig,
                 node_order: np.ndarray | None = None):
        self.storage = storage
        self.config = config
        self.node_order = node_order

    def train_epoch(self, step_fn) -> EpochStats:
        it = HyperbatchIterator(self.storage, self.config, self.node_order)
        io_t = 0.0
        compute_t = 0.0
        losses = []
        while True:
            t0 = time.perf_counter()
            batch = it.next_batch()
            io_t += time.perf_counter() - t0
            if batch is None:
                break
            ids, feats = batch
            t0 = time.perf_counter()
            loss = step_fn(ids, feats)
            jax.block_until_ready(loss)
            compute_t += time.perf_counter() - t0
            losses.append(float(loss))
        return EpochStats(
            batches=it.batch_counter, io_time_s=io_t,
            compute_time_s=compute_t,
            loss=float(np.mean(losses)) if losses else 0.0,
        )
