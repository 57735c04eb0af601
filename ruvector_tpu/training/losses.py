"""Loss functions: MSE / CE / BCE, InfoNCE, local contrastive.

Reference: ruvector-gnn/src/training.rs — Loss fwd+bwd (:250-430, backward
passes replaced by JAX autodiff), info_nce_loss (:541-590),
local_contrastive_loss (:623-641). Numerical conventions preserved:
EPS=1e-7 clamps, log-sum-exp stabilization, cosine similarities scaled by
1/temperature (default τ=0.07, TrainConfig :466-489).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ruvector_tpu.ops.distance import cosine_similarity

EPS = 1e-7


def mse_loss(predictions: jax.Array, targets: jax.Array) -> jax.Array:
    """mean((pred - target)^2) (training.rs:354-357)."""
    return jnp.mean(jnp.square(predictions - targets))


def cross_entropy_loss(predictions: jax.Array, targets: jax.Array) -> jax.Array:
    """-mean_rows(sum(targets * log(max(pred, eps)))) (training.rs:371-375).

    Targets one-hot, predictions are probabilities (softmax output).
    """
    log_pred = jnp.log(jnp.maximum(predictions, EPS))
    return -jnp.sum(targets * log_pred) / predictions.shape[0]


def binary_cross_entropy_loss(predictions: jax.Array, targets: jax.Array) -> jax.Array:
    """BCE with (eps, 1-eps) clamping (training.rs:396-407)."""
    p = jnp.clip(predictions, EPS, 1.0 - EPS)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))


def info_nce_loss(
    anchor: jax.Array,       # [D]
    positives: jax.Array,    # [P, D]
    negatives: jax.Array,    # [Q, D]
    temperature: float = 0.07,
) -> jax.Array:
    """InfoNCE averaged over positives (training.rs:541-590).

    For each positive: loss = -(pos_sim - logsumexp([pos_sim, neg_sims]))
    with cosine similarities scaled by 1/temperature.
    """
    pos_sims = cosine_similarity(anchor[None, :], positives) / temperature  # [P]
    neg_sims = cosine_similarity(anchor[None, :], negatives) / temperature  # [Q]

    # per-positive logsumexp over [pos_sim, all neg_sims]
    def per_pos(p):
        logits = jnp.concatenate([p[None], neg_sims])
        return -(p - jax.scipy.special.logsumexp(logits))

    losses = jax.vmap(per_pos)(pos_sims)
    return jnp.mean(losses)


def local_contrastive_loss(
    node_embedding: jax.Array,        # [D]
    neighbor_embeddings: jax.Array,   # [P, D] (positives)
    non_neighbor_embeddings: jax.Array,  # [Q, D] (negatives)
    temperature: float = 0.07,
) -> jax.Array:
    """Graph-local InfoNCE: neighbors=positives, non-neighbors=negatives
    (training.rs:623-641)."""
    return info_nce_loss(
        node_embedding, neighbor_embeddings, non_neighbor_embeddings, temperature
    )


def batched_info_nce(
    anchors: jax.Array,      # [B, D]
    positives: jax.Array,    # [B, P, D]
    negatives: jax.Array,    # [B, Q, D]
    temperature: float = 0.07,
    pos_mask: jax.Array | None = None,  # [B, P] 1=valid positive
) -> jax.Array:
    """Batched InfoNCE over B anchors at once — the TPU training shape.

    Each anchor contrasts its own positives against its own negatives; the
    per-anchor mean over valid positives is averaged over the batch.
    """
    b, p, d = positives.shape
    pos_sims = jax.vmap(
        lambda a, ps: cosine_similarity(a[None, :], ps)
    )(anchors, positives) / temperature                      # [B, P]
    neg_sims = jax.vmap(
        lambda a, ns: cosine_similarity(a[None, :], ns)
    )(anchors, negatives) / temperature                      # [B, Q]

    # lse over [pos, negs] per (b, p)
    lse = jax.scipy.special.logsumexp(
        jnp.concatenate(
            [pos_sims[:, :, None], jnp.broadcast_to(neg_sims[:, None, :], (b, p, neg_sims.shape[1]))],
            axis=-1,
        ),
        axis=-1,
    )                                                       # [B, P]
    per_pos = lse - pos_sims                                # [B, P]
    if pos_mask is None:
        pos_mask = jnp.ones((b, p), dtype=anchors.dtype)
    denom = jnp.maximum(jnp.sum(pos_mask, axis=1), 1.0)
    per_anchor = jnp.sum(per_pos * pos_mask, axis=1) / denom
    # anchors with zero valid positives contribute 0 (training.rs:547-549)
    per_anchor = jnp.where(jnp.sum(pos_mask, axis=1) > 0, per_anchor, 0.0)
    return jnp.mean(per_anchor)
