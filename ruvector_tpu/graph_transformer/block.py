"""Graph transformer block over the NeighborGraph.

Composes graph attention (GATv2 edge-featured over neighbors) with a
pre-norm FFN — the transformer layer of the graph-transformer family, usable
with the mincut gate for partitioned graphs (BASELINE.json config 5).
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
from ruvector_tpu.nn.core import (
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
)


@dataclasses.dataclass(frozen=True)
class GraphTransformerConfig:
    dim: int
    num_heads: int = 4
    ffn_mult: int = 4
    num_layers: int = 2
    edge_dim: int = 1
    negative_slope: float = 0.2

    def attn_cfg(self) -> EdgeFeaturedConfig:
        return EdgeFeaturedConfig(
            node_dim=self.dim, edge_dim=self.edge_dim,
            num_heads=self.num_heads, concat_heads=True,
            negative_slope=self.negative_slope,
        )


def graph_transformer_init(key, cfg: GraphTransformerConfig) -> list[dict]:
    layers = []
    for k in jax.random.split(key, cfg.num_layers):
        k1, k2, k3 = jax.random.split(k, 3)
        layers.append({
            "attn": edge_featured_init(k1, cfg.attn_cfg()),
            "ln1": layer_norm_init(cfg.dim),
            "ln2": layer_norm_init(cfg.dim),
            "ffn_in": linear_init(k2, cfg.dim, cfg.dim * cfg.ffn_mult),
            "ffn_out": linear_init(k3, cfg.dim * cfg.ffn_mult, cfg.dim),
        })
    return layers


def graph_transformer_apply(
    params: list[dict],
    cfg: GraphTransformerConfig,
    features: jax.Array,
    graph: NeighborGraph,
) -> jax.Array:
    """Pre-norm blocks: x += attn(LN(x), neighbors); x += FFN(LN(x))."""
    x = features
    edges = graph.edge_weight[..., None]
    for p in params:
        h = layer_norm_apply(p["ln1"], x)
        nbr = h[graph.nbr_idx]
        attn = edge_featured_apply(
            p["attn"], cfg.attn_cfg(), h, nbr, nbr, graph.nbr_mask, edges
        )
        x = x + attn
        h2 = layer_norm_apply(p["ln2"], x)
        x = x + linear_apply(
            p["ffn_out"], jax.nn.gelu(linear_apply(p["ffn_in"], h2))
        )
    return x
