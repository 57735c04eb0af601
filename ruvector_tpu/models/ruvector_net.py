"""RuvectorNet — the flagship multi-layer GNN embedding-update model.

A stack of RuvectorLayers over the neighbor graph (the reference composes
layers the same way in hierarchical_forward, search.rs:105-162, and the CLI
GNN cache holds `Vec<RuvectorLayer>`). First layer maps input_dim->hidden,
the rest hidden->hidden.
"""

from __future__ import annotations

import dataclasses

import jax

from ruvector_tpu.graph.neighbors import NeighborGraph
from ruvector_tpu.nn.ruvector_layer import (
    RuvectorLayerConfig,
    ruvector_layer_apply,
    ruvector_layer_init,
)


@dataclasses.dataclass(frozen=True)
class RuvectorNetConfig:
    input_dim: int
    hidden_dim: int
    num_layers: int = 2
    heads: int = 4
    dropout: float = 0.0
    remat: bool = False   # jax.checkpoint each layer: recompute activations
                          # in backward instead of storing them — trades
                          # FLOPs for HBM on deep stacks / big graphs

    def layer_cfgs(self) -> list[RuvectorLayerConfig]:
        cfgs = []
        for i in range(self.num_layers):
            cfgs.append(
                RuvectorLayerConfig(
                    input_dim=self.input_dim if i == 0 else self.hidden_dim,
                    hidden_dim=self.hidden_dim,
                    heads=self.heads,
                    dropout=self.dropout,
                )
            )
        return cfgs


def ruvector_net_init(key, cfg: RuvectorNetConfig) -> list[dict]:
    keys = jax.random.split(key, cfg.num_layers)
    return [
        ruvector_layer_init(k, lc) for k, lc in zip(keys, cfg.layer_cfgs())
    ]


def ruvector_net_apply(
    params: list[dict],
    cfg: RuvectorNetConfig,
    features: jax.Array,
    graph: NeighborGraph,
) -> jax.Array:
    x = features
    for p, lc in zip(params, cfg.layer_cfgs()):
        layer = ruvector_layer_apply
        if cfg.remat:
            layer = jax.checkpoint(ruvector_layer_apply,
                                   static_argnums=(1,))
        x = layer(p, lc, x, graph)
    return x
