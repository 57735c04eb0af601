"""Query API: modes, request/result types, execution.

Reference: ruvector-gnn/src/query.rs — QueryMode (:10), RuvectorQuery
(:23-58, defaults k=10 ef=50 gnn_depth=2), SubGraph (:173), QueryResult
(:227-370). TPU re-design: candidate retrieval is brute-force batched
cosine top-k on the MXU (beats CPU HNSW descent for N up to millions and
needs no index maintenance); `ef` survives as the candidate-pool width for
the GNN re-rank stage, mirroring the reference pipeline
(README:330-343: HNSW ~50 candidates -> GNN re-rank -> top-k).
"""

from __future__ import annotations

import dataclasses
import enum
import time

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph.neighbors import NeighborGraph
from ruvector_tpu.nn.ruvector_layer import RuvectorLayerConfig, ruvector_layer_apply
from ruvector_tpu.ops.distance import pairwise_cosine
from ruvector_tpu.serve.search import differentiable_search, softmax_temperature


class QueryMode(enum.Enum):
    VECTOR_SEARCH = "vector_search"
    NEURAL_SEARCH = "neural_search"
    SUBGRAPH_EXTRACTION = "subgraph_extraction"
    DIFFERENTIABLE_SEARCH = "differentiable_search"


@dataclasses.dataclass
class RuvectorQuery:
    """Query request (query.rs:23-58 defaults)."""

    vector: np.ndarray
    mode: QueryMode = QueryMode.VECTOR_SEARCH
    k: int = 10
    ef: int = 50
    gnn_depth: int = 2
    temperature: float = 1.0
    return_embeddings: bool = False
    return_attention: bool = False


@dataclasses.dataclass
class SubGraph:
    """Extracted neighborhood (query.rs:173)."""

    nodes: list[int]
    edges: list[tuple[int, int, float]]  # (from, to, weight)


@dataclasses.dataclass
class QueryResult:
    """Query response (query.rs:227-370)."""

    nodes: list[int]
    scores: list[float]
    embeddings: np.ndarray | None = None
    attention: np.ndarray | None = None
    subgraph: SubGraph | None = None
    latency_ms: float = 0.0


class QueryEngine:
    """Executes queries against a feature matrix + neighbor graph with an
    optional stack of GNN layers for neural re-ranking."""

    def __init__(
        self,
        features: jax.Array,                 # [N, D]
        graph: NeighborGraph,
        gnn_params: list[dict] | None = None,
        gnn_cfgs: list[RuvectorLayerConfig] | None = None,
    ):
        self.features = features
        self.graph = graph
        self.gnn_params = gnn_params or []
        self.gnn_cfgs = gnn_cfgs or []
        self._gnn_cache: jax.Array | None = None

    def _gnn_embeddings(self, depth: int) -> jax.Array:
        """Run (and cache) the GNN stack over all nodes."""
        if self._gnn_cache is not None:
            return self._gnn_cache
        x = self.features
        for params, cfg in zip(self.gnn_params[:depth], self.gnn_cfgs[:depth]):
            x = ruvector_layer_apply(params, cfg, x, self.graph)
        self._gnn_cache = x
        return x

    def invalidate_cache(self):
        self._gnn_cache = None

    def execute(self, query: RuvectorQuery) -> QueryResult:
        t0 = time.perf_counter()
        q = jnp.asarray(query.vector, jnp.float32)

        if query.mode == QueryMode.VECTOR_SEARCH:
            sims = pairwise_cosine(q[None, :], self.features)[0]
            scores, idx = jax.lax.top_k(sims, query.k)
            result = QueryResult(
                nodes=np.asarray(idx).tolist(),
                scores=np.asarray(scores).tolist(),
            )

        elif query.mode == QueryMode.DIFFERENTIABLE_SEARCH:
            idx, weights = differentiable_search(
                q, self.features, query.k, query.temperature
            )
            result = QueryResult(
                nodes=np.asarray(idx).tolist(),
                scores=np.asarray(weights).tolist(),
            )

        elif query.mode == QueryMode.NEURAL_SEARCH:
            # stage 1: wide candidate pool by raw similarity (ef) — the HNSW
            # retrieval stage of the reference pipeline (README:330-343)
            sims = pairwise_cosine(q[None, :], self.features)[0]
            ef = min(query.ef, self.features.shape[0])
            _, cand = jax.lax.top_k(sims, ef)
            # stage 2: learned re-rank in the GNN-updated embedding space —
            # anchor = the query's nearest node's updated embedding; blend
            # raw similarity with similarity in the learned space
            emb = self._gnn_embeddings(query.gnn_depth)
            cand_emb = emb[cand]
            anchor = cand_emb[0]
            raw_sims = sims[cand]
            learned = pairwise_cosine(anchor[None, :], cand_emb)[0]
            blended = 0.5 * raw_sims + 0.5 * learned
            k = min(query.k, ef)
            scores, local = jax.lax.top_k(blended, k)
            nodes = cand[local]
            attention = softmax_temperature(blended[None, :], query.temperature)[0]
            result = QueryResult(
                nodes=np.asarray(nodes).tolist(),
                scores=np.asarray(scores).tolist(),
                attention=np.asarray(attention[local]) if query.return_attention else None,
            )
            if query.return_embeddings:
                result.embeddings = np.asarray(cand_emb[local])

        elif query.mode == QueryMode.SUBGRAPH_EXTRACTION:
            sims = pairwise_cosine(q[None, :], self.features)[0]
            scores, seed = jax.lax.top_k(sims, query.k)
            nodes = self._khop(np.asarray(seed), query.gnn_depth)
            edges = self._edges_within(nodes)
            result = QueryResult(
                nodes=np.asarray(seed).tolist(),
                scores=np.asarray(scores).tolist(),
                subgraph=SubGraph(nodes=sorted(nodes), edges=edges),
            )
        else:
            raise ValueError(f"unknown mode {query.mode}")

        result.latency_ms = (time.perf_counter() - t0) * 1e3
        return result

    def _khop(self, seeds: np.ndarray, depth: int) -> set[int]:
        nbr = np.asarray(self.graph.nbr_idx)
        mask = np.asarray(self.graph.nbr_mask) > 0
        frontier = set(int(s) for s in seeds)
        visited = set(frontier)
        for _ in range(depth):
            nxt = set()
            for u in frontier:
                nxt.update(int(v) for v in nbr[u][mask[u]])
            frontier = nxt - visited
            visited |= nxt
        return visited

    def _edges_within(self, nodes: set[int]) -> list[tuple[int, int, float]]:
        nbr = np.asarray(self.graph.nbr_idx)
        mask = np.asarray(self.graph.nbr_mask) > 0
        w = np.asarray(self.graph.edge_weight)
        edges = []
        for u in sorted(nodes):
            for j, v in enumerate(nbr[u]):
                if mask[u, j] and int(v) in nodes:
                    edges.append((int(u), int(v), float(w[u, j])))
        return edges


def execute_query(
    query: RuvectorQuery,
    features: jax.Array,
    graph: NeighborGraph,
    gnn_params: list[dict] | None = None,
    gnn_cfgs: list[RuvectorLayerConfig] | None = None,
) -> QueryResult:
    """One-shot convenience wrapper around QueryEngine."""
    return QueryEngine(features, graph, gnn_params, gnn_cfgs).execute(query)
