"""Batched RuvectorLayer — the flagship GNN embedding-update layer.

TPU-native re-design of `RuvectorLayer::forward`
(ruvector-gnn/src/layer.rs:315-457). The reference processes one node at a
time (Vec<f32> loops); here one call updates ALL N nodes:

    x [N, Din] --W_msg--> msg [N, H]
    gather neighbors     nbr_msg [N, M, H]        (jnp.take, padded layout)
    MHA(query=msg, k=v=nbr_msg, mask)             (MXU batched GEMMs)
    + edge-weight-normalized mean of nbr_msg      (masked VPU reduce)
    --W_agg--> GRU(input=agg, hidden=msg) --dropout-scale--> LayerNorm

Semantic parity notes (encoded in tests/test_ruvector_layer.py):
- degree-0 nodes short-circuit to LayerNorm(W_msg x) (layer.rs:385-389)
- GRU hidden state is the *node message*, not the raw embedding
  (layer.rs:411: `w_update.forward(&aggregated, &node_msg)`)
- dropout is deterministic scaling by (1 - p) (layer.rs:447-451)
- zero/negative edge-weight rows fall back to uniform (layer.rs:428-432)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.graph.neighbors import NeighborGraph
from ruvector_tpu.nn.core import (
    gru_apply,
    gru_init,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    mha_apply,
    mha_init,
)
from ruvector_tpu.ops.segment import masked_softmax, masked_weighted_mean


@dataclasses.dataclass(frozen=True)
class RuvectorLayerConfig:
    input_dim: int
    hidden_dim: int
    heads: int = 4
    dropout: float = 0.0
    eps: float = 1e-5
    # 'float32' (exact reference parity) or 'bfloat16' (half the HBM traffic
    # on the gather-bound edge path; matmuls accumulate in f32 — ~1e-2
    # relative accuracy, the production-serving configuration)
    compute_dtype: str = "float32"
    # fused Pallas kernel for scores+softmax+aggregation (TPU; ~2.4x layer
    # speedup — XLA lowers the batched per-node contractions poorly). The
    # XLA path remains the correctness oracle.
    use_pallas: bool = False

    def __post_init__(self):
        if not 0.0 <= self.dropout <= 1.0:
            raise ValueError(f"dropout must be in [0, 1], got {self.dropout}")
        if self.hidden_dim % self.heads != 0:
            raise ValueError(
                f"hidden_dim ({self.hidden_dim}) must be divisible by heads "
                f"({self.heads})"
            )


def ruvector_layer_init(key, cfg: RuvectorLayerConfig, dtype=jnp.float32) -> dict:
    k_msg, k_agg, k_gru, k_attn = jax.random.split(key, 4)
    return {
        "w_msg": linear_init(k_msg, cfg.input_dim, cfg.hidden_dim, dtype),
        "w_agg": linear_init(k_agg, cfg.hidden_dim, cfg.hidden_dim, dtype),
        "gru": gru_init(k_gru, cfg.hidden_dim, cfg.hidden_dim, dtype),
        "attn": mha_init(k_attn, cfg.hidden_dim, cfg.heads, dtype),
        "norm": layer_norm_init(cfg.hidden_dim, dtype),
    }


def _folded_attention_and_aggregate(
    attn_params: dict,
    heads: int,
    msg: jax.Array,        # [N, D] per-node messages (queries draw from these)
    kv_src: jax.Array,     # [N_src, D] neighbor gather source (messages)
    nbr_idx: jax.Array,    # [N, M] indices into kv_src
    mask: jax.Array,       # [N, M]
    edge_weight: jax.Array,  # [N, M]
    use_pallas: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """MHA over neighbors + edge-weighted mean in ONE pass over nbr_msg.

    HBM-optimal re-association of mha_apply (exact same math):
      score_h(i,j) = <q_h(i), (W_k msg_j + b_k)_h>
                   = <W_k_h^T q_h(i), msg_j> + <q_h(i), b_k_h>
      out_h(i) = W_v_h (Σ_j a_h(i,j) msg_j) + (Σ_j a_h(i,j)) b_v_h
    so neither K nor V is ever materialized at [N, M, D] — the gathered
    messages are the only edge-sized tensor, read twice (scores + weighted
    sums). The edge-weighted mean aggregate rides the same einsum as an
    extra 'head'. ~3x less HBM traffic than the naive formulation at M=16.
    """
    n, m = nbr_idx.shape
    d = kv_src.shape[-1]
    hd = d // heads
    cdt = kv_src.dtype  # compute dtype flows from the (possibly bf16) source
    q = linear_apply(attn_params["q"], msg).reshape(n, heads, hd)
    wk = attn_params["k"]["kernel"].reshape(d, heads, hd)
    bk = attn_params["k"]["bias"].reshape(heads, hd)
    wv = attn_params["v"]["kernel"].reshape(d, heads, hd)
    bv = attn_params["v"]["bias"].reshape(heads, hd)

    # u[i,h,:] = W_k_h^T q_h(i)  ([N, H, D]); score bias per (i,h)
    u = jnp.einsum("nhf,dhf->nhd", q, wk)
    score_bias = jnp.einsum("nhf,hf->nh", q, bk)
    scale = 1.0 / (hd ** 0.5)

    # normalized edge weights with uniform fallback (layer.rs:428-432)
    w = edge_weight * mask
    wsum = jnp.sum(w, axis=1, keepdims=True)
    deg = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    wnorm = jnp.where(wsum > 0, w / jnp.where(wsum > 0, wsum, 1.0), mask / deg)

    if use_pallas:
        from ruvector_tpu.ops.pallas.neighbor_mix import fused_neighbor_mix

        mixed = fused_neighbor_mix(
            u.astype(jnp.float32), score_bias,
            kv_src[nbr_idx].astype(jnp.float32),
            mask, wnorm, heads=heads, scale=scale,
        )
    elif m <= 32:
        # slot-unrolled path: per-slot GATHERS + [N, D] dots. Crucial detail:
        # the [N, M, D] gathered tensor is never materialized — each slot's
        # gather kv_src[nbr_idx[:, j]] fuses into its consumers (XLA), which
        # beats both the batched einsums AND slicing a materialized tensor
        # (measured: 9.6 ms vs 11.8 ms attention block at M=16; see
        # docs/DESIGN_NOTES.md). Same math, different summation association.
        uc = u.astype(cdt)
        slots = [kv_src[nbr_idx[:, j]] for j in range(m)]          # [N, D] x M
        slot_scores = [
            jnp.sum(uc * g[:, None, :], axis=-1) for g in slots
        ]
        scores = (jnp.stack(slot_scores, axis=-1).astype(jnp.float32)
                  + score_bias[..., None]) * scale
        attn_w = masked_softmax(scores, mask[:, None, :], axis=-1)  # [N,H,M]
        allw = jnp.concatenate([attn_w, wnorm[:, None, :]], axis=1).astype(cdt)
        mixed = jnp.zeros((n, heads + 1, d), jnp.float32)
        for j in range(m):
            mixed = mixed + (allw[:, :, j][:, :, None]
                             * slots[j][:, None, :]).astype(jnp.float32)
    else:
        nbr_msg = kv_src[nbr_idx]                                   # [N, M, D]
        scores = (
            jnp.einsum("nhd,nmd->nhm", u.astype(cdt), nbr_msg,
                       preferred_element_type=jnp.float32)
            + score_bias[..., None]
        ) * scale
        attn_w = masked_softmax(scores, mask[:, None, :], axis=-1)  # [N, H, M]
        # one einsum aggregates all H attention heads AND the weighted mean
        allw = jnp.concatenate([attn_w, wnorm[:, None, :]], axis=1)
        mixed = jnp.einsum("nhm,nmd->nhd", allw.astype(cdt), nbr_msg,
                           preferred_element_type=jnp.float32)      # [N,H+1,D]

    tv, weighted = mixed[:, :heads, :], mixed[:, heads, :]

    o = jnp.einsum("nhd,dhf->nhf", tv, wv)                        # [N, H, hd]
    # softmax rows sum to 1 iff the node has any valid neighbor (the V-bias
    # term scales by Σ_j a_ij, which is exactly that indicator)
    has_any = (jnp.sum(mask, axis=1) > 0).astype(o.dtype)         # [N]
    o = o + has_any[:, None, None] * bv
    attn_out = linear_apply(attn_params["out"], o.reshape(n, d))
    return attn_out, weighted


def ruvector_layer_apply(
    params: dict,
    cfg: RuvectorLayerConfig,
    features: jax.Array,
    graph: NeighborGraph,
) -> jax.Array:
    """Update all node embeddings: [N, Din] x graph -> [N, H]."""
    # Step 1: message transform for every node once; neighbors gather it
    # (layer.rs:392-396 recomputes W_msg per neighbor — algebraically equal).
    msg = linear_apply(params["w_msg"], features)                 # [N, H]
    gather_src = (
        msg.astype(jnp.bfloat16) if cfg.compute_dtype == "bfloat16" else msg
    )

    # Steps 2+3: attention (layer.rs:398-401) + edge-weighted mean
    # (layer.rs:404, 421-445); the neighbor gather happens INSIDE (per-slot,
    # fused into consumers — see docs/DESIGN_NOTES.md).
    attn_out, weighted = _folded_attention_and_aggregate(
        params["attn"], cfg.heads, msg, gather_src, graph.nbr_idx,
        graph.nbr_mask, graph.edge_weight, use_pallas=cfg.use_pallas,
    )

    # Step 4-5: combine -> W_agg -> GRU(input=aggregated, hidden=msg)
    aggregated = linear_apply(params["w_agg"], attn_out + weighted)
    updated = gru_apply(params["gru"], aggregated, msg)

    # Step 6: deterministic dropout scaling (layer.rs:447-451)
    dropped = updated * (1.0 - cfg.dropout)

    # Step 7: layer norm; degree-0 nodes short-circuit (layer.rs:385-389)
    out = layer_norm_apply(params["norm"], dropped, cfg.eps)
    isolated = layer_norm_apply(params["norm"], msg, cfg.eps)
    has_nbrs = (jnp.sum(graph.nbr_mask, axis=1, keepdims=True) > 0)
    return jnp.where(has_nbrs, out, isolated)


def ruvector_layer_apply_single(
    params: dict,
    cfg: RuvectorLayerConfig,
    node_embedding: jax.Array,     # [Din]
    neighbor_embeddings: jax.Array,  # [M, Din]
    edge_weights: jax.Array,       # [M]
    mask: jax.Array | None = None,  # [M]
) -> jax.Array:
    """Single-node forward with explicit neighbor features — mirrors the
    reference call signature (layer.rs:379-418) for parity tests and the
    hierarchical search path where neighbors are not drawn from `features`.
    """
    m = neighbor_embeddings.shape[0]
    if mask is None:
        mask = jnp.ones((m,), dtype=jnp.float32)

    msg = linear_apply(params["w_msg"], node_embedding[None, :])   # [1, H]
    nbr_msg = linear_apply(params["w_msg"], neighbor_embeddings)[None]  # [1, M, H]

    attn_out = mha_apply(
        params["attn"], msg, nbr_msg, nbr_msg, mask[None, :], cfg.heads
    )
    weighted = masked_weighted_mean(nbr_msg, edge_weights[None, :], mask[None, :])
    aggregated = linear_apply(params["w_agg"], attn_out + weighted)
    updated = gru_apply(params["gru"], aggregated, msg)
    dropped = updated * (1.0 - cfg.dropout)
    out = layer_norm_apply(params["norm"], dropped, cfg.eps)
    isolated = layer_norm_apply(params["norm"], msg, cfg.eps)
    has_nbrs = jnp.sum(mask) > 0
    return jnp.where(has_nbrs, out, isolated)[0]
