"""GraphSAGE with fixed-fanout neighbor sampling.

Reference: ruvector-postgres/src/gnn/graphsage.rs:25-180 — uniform sampling
of `num_samples` neighbors (seeded, :93-101), mean/max aggregation, update
relu(W_n·agg + W_s·h_self) (:160-174 — the code adds the two transforms
elementwise), optional L2 normalization.

TPU form: sampling is host-side (deterministic seed) producing a [N, F]
index tensor; the layer itself is two batched GEMMs + masked reduce.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph.neighbors import NeighborGraph
from ruvector_tpu.nn.core import xavier_normal


@dataclasses.dataclass(frozen=True)
class GraphSAGEConfig:
    in_features: int
    out_features: int
    num_samples: int = 10
    aggregator: str = "mean"   # mean | max
    normalize: bool = True


def graphsage_init(key, cfg: GraphSAGEConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "w_neighbor": xavier_normal(k1, cfg.in_features, cfg.out_features),
        "w_self": xavier_normal(k2, cfg.in_features, cfg.out_features),
    }


def sample_fanout(
    graph: NeighborGraph, fanout: int, seed: int = 42
) -> tuple[jax.Array, jax.Array]:
    """Uniform fixed-fanout sampling (graphsage.rs:93-101, seed 42).

    Host-side: returns ([N, fanout] indices, [N, fanout] mask). Nodes with
    degree <= fanout keep all neighbors (no resampling), matching the
    reference's early return.
    """
    from ruvector_tpu import native

    nbr = np.asarray(graph.nbr_idx)
    if native.available:
        idx, m = native.sample_fanout(nbr, np.asarray(graph.nbr_mask), fanout, seed)
        return jnp.asarray(idx), jnp.asarray(m)

    rng = np.random.default_rng(seed)
    mask = np.asarray(graph.nbr_mask) > 0
    n = graph.num_nodes
    out_idx = np.zeros((n, fanout), np.int32)
    out_mask = np.zeros((n, fanout), np.float32)
    for i in range(n):
        nbrs = nbr[i][mask[i]]
        if len(nbrs) <= fanout:
            out_idx[i, : len(nbrs)] = nbrs
            out_mask[i, : len(nbrs)] = 1.0
        else:
            pick = rng.choice(nbrs, size=fanout, replace=False)
            out_idx[i] = pick
            out_mask[i] = 1.0
    return jnp.asarray(out_idx), jnp.asarray(out_mask)


@dataclasses.dataclass(frozen=True)
class GraphSAGENetConfig:
    """Multi-layer GraphSAGE with per-layer fanouts (the classic (25, 10)
    recipe; graphsage.rs models one layer — the stack composes them)."""

    in_features: int
    hidden_features: int
    out_features: int
    fanouts: tuple = (10, 10)
    aggregator: str = "mean"
    normalize: bool = True

    def layer_cfgs(self) -> list[GraphSAGEConfig]:
        cfgs = []
        n = len(self.fanouts)
        for i, f in enumerate(self.fanouts):
            cfgs.append(GraphSAGEConfig(
                in_features=self.in_features if i == 0 else self.hidden_features,
                out_features=self.out_features if i == n - 1 else self.hidden_features,
                num_samples=f,
                aggregator=self.aggregator,
                normalize=self.normalize,
            ))
        return cfgs


def graphsage_net_init(key, cfg: GraphSAGENetConfig) -> list[dict]:
    return [
        graphsage_init(k, lc)
        for k, lc in zip(jax.random.split(key, len(cfg.fanouts)),
                         cfg.layer_cfgs())
    ]


def graphsage_net_apply(
    params: list[dict],
    cfg: GraphSAGENetConfig,
    features: jax.Array,
    graph: NeighborGraph,
    seed: int = 42,
) -> jax.Array:
    """Full-graph multi-layer forward: each layer gets an independently
    sampled fanout (deterministic per (seed, layer))."""
    x = features
    for i, (p, lc) in enumerate(zip(params, cfg.layer_cfgs())):
        idx, mask = sample_fanout(graph, lc.num_samples, seed=seed + i)
        x = graphsage_apply(p, lc, x, idx, mask)
    return x


def graphsage_apply(
    params: dict,
    cfg: GraphSAGEConfig,
    features: jax.Array,           # [N, Din]
    sampled_idx: jax.Array,        # [N, F]
    sampled_mask: jax.Array,       # [N, F]
) -> jax.Array:
    """relu(W_n·agg(neighbors) + W_s·h_self), optional L2 norm."""
    nbr_feats = features[sampled_idx]                       # [N, F, Din]
    m = sampled_mask[..., None]
    if cfg.aggregator == "mean":
        deg = jnp.maximum(jnp.sum(sampled_mask, axis=1, keepdims=True), 1.0)
        agg = jnp.sum(nbr_feats * m, axis=1) / deg
    elif cfg.aggregator == "max":
        neg = jnp.where(m > 0, nbr_feats, -jnp.inf)
        agg = jnp.max(neg, axis=1)
        agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
    else:
        raise ValueError(f"unknown aggregator {cfg.aggregator}")
    # degree-0 nodes aggregate to zeros (graphsage.rs:151-153)
    has = jnp.sum(sampled_mask, axis=1, keepdims=True) > 0
    agg = jnp.where(has, agg, 0.0)

    neighbor_h = jnp.dot(agg, params["w_neighbor"], preferred_element_type=jnp.float32)
    self_h = jnp.dot(features, params["w_self"], preferred_element_type=jnp.float32)
    combined = jax.nn.relu(neighbor_h + self_h)
    if cfg.normalize:
        norm = jnp.linalg.norm(combined, axis=-1, keepdims=True)
        combined = jnp.where(norm > 0, combined / jnp.where(norm > 0, norm, 1.0), combined)
    return combined
