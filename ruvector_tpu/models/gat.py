"""Graph attention network layer over the neighbor graph.

Composes the edge-featured (GATv2-style) attention mechanism
(ruvector-attention/src/graph/edge_featured.rs) with the padded-dense
neighbor layout: each node attends over its neighbors, with the scalar edge
weight lifted to a 1-d edge feature.
"""

from __future__ import annotations

import dataclasses

import jax

from ruvector_tpu.attention.edge_featured import (
    EdgeFeaturedConfig,
    edge_featured_apply,
    edge_featured_init,
)
from ruvector_tpu.graph.neighbors import NeighborGraph


@dataclasses.dataclass(frozen=True)
class GATConfig:
    node_dim: int
    num_heads: int = 4
    edge_dim: int = 1
    negative_slope: float = 0.2
    concat_heads: bool = True
    residual: bool = True

    def attn_cfg(self) -> EdgeFeaturedConfig:
        return EdgeFeaturedConfig(
            node_dim=self.node_dim,
            edge_dim=self.edge_dim,
            num_heads=self.num_heads,
            concat_heads=self.concat_heads,
            negative_slope=self.negative_slope,
        )


def gat_init(key, cfg: GATConfig) -> dict:
    return {"attn": edge_featured_init(key, cfg.attn_cfg())}


def gat_apply(
    params: dict,
    cfg: GATConfig,
    features: jax.Array,
    graph: NeighborGraph,
) -> jax.Array:
    nbr = features[graph.nbr_idx]                    # [N, M, D]
    edges = graph.edge_weight[..., None]             # [N, M, 1]
    out = edge_featured_apply(
        params["attn"], cfg.attn_cfg(),
        features, nbr, nbr, graph.nbr_mask, edges,
    )
    if cfg.residual and out.shape == features.shape:
        out = out + features
    return out
