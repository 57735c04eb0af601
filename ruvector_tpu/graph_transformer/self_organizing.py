"""Self-organizing graph structures: morphogenetic fields + coarsening.

Reference: ruvector-graph-transformer/src/self_organizing.rs —
MorphogeneticField (:37, step :91): activator/inhibitor reaction-diffusion
over the graph driving growth decisions; DevelopmentalProgram (:218) with
GrowthRule budget; GraphCoarsener (:425) aggregation-based coarsening with
CoarsenResult/UncoarsenResult (:396-412).

TPU re-design: reaction-diffusion is a Gray-Scott update on the graph
Laplacian — pure elementwise + neighbor-sum ops under `lax.scan`. Growth
(topology mutation) is host-side by necessity (shapes change); the device
produces the growth scores, the host rewires. Coarsening reuses the AMG
aggregation (solver/bmssp.py) so the transformer and the solver share one
partitioning primitive.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph.neighbors import NeighborGraph


@dataclasses.dataclass(frozen=True)
class SelfOrganizingConfig:
    diffusion_a: float = 0.16
    diffusion_b: float = 0.08
    feed: float = 0.035
    kill: float = 0.065
    dt: float = 1.0
    growth_threshold: float = 0.5


class MorphogeneticField:
    """Gray-Scott activator (a) / inhibitor (b) dynamics on the graph."""

    def __init__(self, config: SelfOrganizingConfig = SelfOrganizingConfig()):
        self.config = config

    def init_state(self, num_nodes: int, seed: int = 0):
        key = jax.random.key(seed)
        a = jnp.ones((num_nodes,))
        b = jnp.where(
            jax.random.uniform(key, (num_nodes,)) < 0.05, 0.25, 0.0)
        return a, b

    @partial(jax.jit, static_argnames=("self", "steps"))
    def step(self, a, b, graph: NeighborGraph, steps: int = 50):
        """Run reaction-diffusion; returns (a, b, growth_scores [n]).

        Growth score = inhibitor concentration — nodes where structure
        'condenses' (self_organizing.rs:91 uses the field maxima the same
        way)."""
        cfg = self.config
        deg = jnp.maximum(jnp.sum(graph.nbr_mask, axis=1), 1.0)

        def lap(x):
            nbr = jnp.sum(graph.nbr_mask * x[graph.nbr_idx], axis=1)
            return nbr / deg - x

        def rd(carry, _):
            a, b = carry
            ab2 = a * b * b
            a2 = a + cfg.dt * (cfg.diffusion_a * lap(a) - ab2
                               + cfg.feed * (1.0 - a))
            b2 = b + cfg.dt * (cfg.diffusion_b * lap(b) + ab2
                               - (cfg.kill + cfg.feed) * b)
            return (jnp.clip(a2, 0.0, 1.5), jnp.clip(b2, 0.0, 1.5)), None

        (a, b), _ = jax.lax.scan(rd, (a, b), None, length=steps)
        return a, b, b


@dataclasses.dataclass
class GrowthResult:
    new_edges: np.ndarray      # [k, 2] grown edges
    budget_used: int


class DevelopmentalProgram:
    """Host-side growth: connect high-score nodes to their strongest
    neighbors' neighbors, bounded by a growth budget
    (self_organizing.rs:218-229)."""

    def __init__(self, max_growth_budget: int = 64,
                 threshold: float = 0.2):
        self.max_growth_budget = max_growth_budget
        self.threshold = threshold

    def grow(self, graph: NeighborGraph, scores) -> GrowthResult:
        scores = np.asarray(scores)
        idx = np.asarray(graph.nbr_idx)
        mask = np.asarray(graph.nbr_mask) > 0
        candidates = np.argsort(-scores)
        existing = {(i, int(j)) for i in range(len(idx))
                    for j in idx[i][mask[i]]}
        new_edges = []
        for i in candidates:
            if scores[i] < self.threshold or \
                    len(new_edges) >= self.max_growth_budget:
                break
            # two-hop: neighbors of my strongest neighbor
            nb = idx[i][mask[i]]
            if len(nb) == 0:
                continue
            best = nb[np.argmax(scores[nb])]
            for two_hop in idx[best][mask[best]]:
                t = int(two_hop)
                if t != i and (int(i), t) not in existing:
                    new_edges.append((int(i), t))
                    existing.add((int(i), t))
                    break
        return GrowthResult(
            new_edges=np.asarray(new_edges, np.int64).reshape(-1, 2),
            budget_used=len(new_edges))


@dataclasses.dataclass
class CoarsenResult:
    agg: np.ndarray            # [n] aggregate id per node
    num_coarse: int
    coarse_features: jax.Array


class GraphCoarsener:
    """Aggregation coarsening (self_organizing.rs:425) sharing the AMG
    aggregation primitive; uncoarsen broadcasts coarse features back."""

    def __init__(self, ratio: float = 0.5):
        self.ratio = ratio

    def coarsen(self, graph: NeighborGraph, features) -> CoarsenResult:
        from ruvector_tpu.solver.bmssp import _coarsen

        idx = np.asarray(graph.nbr_idx)
        mask = np.asarray(graph.nbr_mask) > 0
        rows = np.repeat(np.arange(idx.shape[0]), idx.shape[1])[mask.ravel()]
        cols = idx.ravel()[mask.ravel()]
        vals = -np.ones(len(rows))
        # include diagonal so strength-of-connection is defined
        n = idx.shape[0]
        rows = np.concatenate([rows, np.arange(n)])
        cols = np.concatenate([cols, np.arange(n)])
        vals = np.concatenate([vals, np.full(n, 2.0)])
        agg = _coarsen(rows, cols, vals, n)
        nc = int(agg.max()) + 1
        agg_j = jnp.asarray(agg)
        coarse = jax.ops.segment_sum(jnp.asarray(features), agg_j,
                                     num_segments=nc)
        counts = jax.ops.segment_sum(jnp.ones((n,)), agg_j, num_segments=nc)
        return CoarsenResult(agg=agg, num_coarse=nc,
                             coarse_features=coarse / counts[:, None])

    def uncoarsen(self, result: CoarsenResult, coarse_features):
        return jnp.asarray(coarse_features)[jnp.asarray(result.agg)]
