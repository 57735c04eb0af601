"""Graph Convolutional Network layer (Kipf & Welling).

Reference: ruvector-postgres/src/gnn/gcn.rs — message = x_src * edge_weight,
sum aggregation scaled by 1/sqrt(deg), linear transform + bias, ReLU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.graph.neighbors import NeighborGraph
from ruvector_tpu.nn.core import xavier_normal
from ruvector_tpu.ops.segment import spmm_padded


@dataclasses.dataclass(frozen=True)
class GCNConfig:
    in_features: int
    out_features: int
    normalize: bool = True
    use_bias: bool = True


def gcn_init(key, cfg: GCNConfig) -> dict:
    p = {"kernel": xavier_normal(key, cfg.in_features, cfg.out_features)}
    if cfg.use_bias:
        p["bias"] = jnp.zeros((cfg.out_features,))
    return p


def gcn_apply(
    params: dict,
    cfg: GCNConfig,
    features: jax.Array,
    graph: NeighborGraph,
    use_edge_weights: bool = True,
) -> jax.Array:
    """relu(W · norm(Σ_j w_ij x_j) + b) with 1/sqrt(deg) normalization
    (gcn.rs:118-140 message/aggregate, :89-110 forward+relu)."""
    w = graph.edge_weight if use_edge_weights else graph.nbr_mask
    agg = spmm_padded(features, graph.nbr_idx, w, graph.nbr_mask)   # [N, Din]
    if cfg.normalize:
        deg = jnp.sum(graph.nbr_mask, axis=1, keepdims=True)
        norm = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1.0)), 1.0)
        agg = agg * norm
    out = jnp.dot(agg, params["kernel"], preferred_element_type=jnp.float32)
    if "bias" in params:
        out = out + params["bias"]
    return jax.nn.relu(out)
