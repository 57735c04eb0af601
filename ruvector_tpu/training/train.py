"""Training loops: contrastive graph training and query-feedback updates.

Reference: ruvector-gnn/src/training.rs — TrainConfig (batch 256, 64
negatives, τ=0.07, lr=1e-3, flush_threshold=1000, :466-489), OnlineConfig
(local_steps=5, :493-507), per-embedding sgd_step (:667-677); the training
flow of README's query-feedback loop: anchors are query/result nodes,
positives their graph neighbors, negatives random non-neighbors.

TPU design: one jitted `train_step` consumes a batch of anchor ids plus
pre-sampled negative ids, runs the GNN layer over the whole graph, and
applies the contrastive loss on the *updated* embeddings — the gradient
flows through the layer parameters AND (optionally) the input features.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ruvector_tpu.graph.neighbors import NeighborGraph
from ruvector_tpu.nn.ruvector_layer import (
    RuvectorLayerConfig,
    ruvector_layer_apply,
)
from ruvector_tpu.training.ewc import EWCState, ewc_penalty
from ruvector_tpu.training.losses import batched_info_nce


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Contrastive training config (training.rs:466-489 defaults)."""

    batch_size: int = 256
    n_negatives: int = 64
    temperature: float = 0.07
    learning_rate: float = 0.001
    flush_threshold: int = 1000
    train_features: bool = False  # also learn the node embeddings themselves


@dataclasses.dataclass(frozen=True)
class OnlineConfig:
    """Online learning config (training.rs:493-507 defaults)."""

    local_steps: int = 5
    propagate_updates: bool = True


def sgd_step(embedding: jax.Array, grad: jax.Array, learning_rate: float) -> jax.Array:
    """Per-embedding SGD update (training.rs:667-677)."""
    return embedding - learning_rate * grad


def contrastive_loss_fn(
    params: dict,
    layer_cfg: RuvectorLayerConfig,
    features: jax.Array,
    graph: NeighborGraph,
    anchor_ids: jax.Array,    # [B]
    neg_ids: jax.Array,       # [B, Q]
    temperature: float,
    ewc_state: EWCState | None = None,
) -> jax.Array:
    """Local contrastive loss on GNN-updated embeddings.

    anchors' positives are their graph neighbors (masked), negatives are the
    provided sampled ids — the structure of local_contrastive_loss
    (training.rs:623-641) lifted to a batch.
    """
    out = ruvector_layer_apply(params, layer_cfg, features, graph)  # [N, H]
    anchors = out[anchor_ids]                                  # [B, H]
    pos = out[graph.nbr_idx[anchor_ids]]                       # [B, M, H]
    pos_mask = graph.nbr_mask[anchor_ids]                      # [B, M]
    negs = out[neg_ids]                                        # [B, Q, H]
    loss = batched_info_nce(anchors, pos, negs, temperature, pos_mask)
    if ewc_state is not None:
        loss = loss + ewc_penalty(ewc_state, params)
    return loss


def make_train_step(
    layer_cfg: RuvectorLayerConfig,
    optimizer: optax.GradientTransformation,
    cfg: TrainConfig = TrainConfig(),
    with_ewc: bool = False,
):
    """Build the jitted contrastive train step.

    Returns step(params, opt_state, features, graph, anchor_ids, neg_ids
                 [, ewc_state]) -> (params, opt_state, loss)
    If cfg.train_features, features are updated too and returned as
    (params, features), opt_state must then be created over that tuple.
    """

    def loss_wrapper(trainable, features, graph, anchor_ids, neg_ids, ewc_state):
        if cfg.train_features:
            params, feats = trainable
        else:
            params, feats = trainable, features
        return contrastive_loss_fn(
            params, layer_cfg, feats, graph, anchor_ids, neg_ids,
            cfg.temperature, ewc_state if with_ewc else None,
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(trainable, opt_state, features, graph, anchor_ids, neg_ids,
             ewc_state=None):
        loss, grads = jax.value_and_grad(loss_wrapper)(
            trainable, features, graph, anchor_ids, neg_ids, ewc_state
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    return step


def make_online_update(
    layer_cfg: RuvectorLayerConfig,
    cfg: OnlineConfig = OnlineConfig(),
    learning_rate: float = 0.001,
    temperature: float = 0.07,
):
    """Per-query online learning (training.rs OnlineConfig + sgd_step :667).

    Returns update(params, features, graph, node_id, neg_ids) -> (params,
    new_embedding): runs `local_steps` SGD steps of the local contrastive
    loss around ONE node (its neighbors as positives), then returns the
    refreshed embedding. When cfg.propagate_updates, gradients also flow to
    the layer params (the session-update path); otherwise only the node's
    embedding moves.
    """
    from ruvector_tpu.training.losses import info_nce_loss

    @jax.jit
    def update(params, features, graph, node_id, neg_ids):
        def one_step(carry, _):
            params, feats = carry

            def loss_fn(p, f):
                out = ruvector_layer_apply(p, layer_cfg, f, graph)
                anchor = out[node_id]
                pos = out[graph.nbr_idx[node_id]]
                negs = out[neg_ids]
                return info_nce_loss(anchor, pos, negs, temperature)

            if cfg.propagate_updates:
                (g_params, g_feats) = jax.grad(loss_fn, argnums=(0, 1))(
                    params, feats
                )
                params = jax.tree.map(
                    lambda p, g: p - learning_rate * g, params, g_params
                )
            else:
                g_feats = jax.grad(loss_fn, argnums=1)(params, feats)
            # only the query node's embedding moves (sgd_step semantics)
            feats = feats.at[node_id].add(-learning_rate * g_feats[node_id])
            return (params, feats), None

        (params, feats), _ = jax.lax.scan(
            one_step, (params, features), None, length=cfg.local_steps
        )
        return params, feats

    return update


def sample_negatives(
    rng: np.random.Generator,
    graph: NeighborGraph,
    anchor_ids: np.ndarray,
    n_negatives: int,
) -> np.ndarray:
    """Host-side uniform negative sampling avoiding each anchor's neighbors.

    Deterministic given the generator — mirrors the reference's seeded
    sampling discipline (postgres/src/gnn/graphsage.rs:100).
    """
    n = graph.num_nodes
    nbr = np.asarray(graph.nbr_idx)
    mask = np.asarray(graph.nbr_mask)
    out = np.empty((len(anchor_ids), n_negatives), np.int32)
    for row, a in enumerate(anchor_ids):
        forbidden = set(nbr[a][mask[a] > 0].tolist())
        forbidden.add(int(a))
        cand = rng.integers(0, n, size=n_negatives * 2)
        picked = [c for c in cand if int(c) not in forbidden][:n_negatives]
        while len(picked) < n_negatives:
            c = int(rng.integers(0, n))
            if c not in forbidden:
                picked.append(c)
        out[row] = picked
    return out


def train_epoch(
    step_fn,
    trainable,
    opt_state,
    features: jax.Array,
    graph: NeighborGraph,
    cfg: TrainConfig,
    rng: np.random.Generator,
    ewc_state=None,
) -> tuple[Any, Any, float]:
    """One epoch of contrastive training over all nodes in shuffled batches."""
    n = graph.num_nodes
    order = rng.permutation(n)
    losses = []
    bs = cfg.batch_size
    for start in range(0, n - bs + 1, bs):
        anchors = order[start : start + bs].astype(np.int32)
        negs = sample_negatives(rng, graph, anchors, cfg.n_negatives)
        trainable, opt_state, loss = step_fn(
            trainable, opt_state, features, graph,
            jnp.asarray(anchors), jnp.asarray(negs),
            *( (ewc_state,) if ewc_state is not None else () ),
        )
        losses.append(float(loss))
    return trainable, opt_state, float(np.mean(losses)) if losses else 0.0
