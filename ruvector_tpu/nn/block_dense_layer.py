"""RuvectorLayer forward on the block-dense layout — gather-free attention.

Same math as nn/ruvector_layer.py (parity-pinned to the NumPy oracle
encoding ruvector-gnn/src/layer.rs:379-457), different data movement:
per-edge gathers are replaced by per-block dense MXU matmuls against the
block's local table (see graph/block_dense.py for the layout argument).

Per block (scan over blocks, one compiled body):
    L      = msg[local_ids[k]]                      # [T, D]  (only gather)
    scores = u_k @ L^T * scale + bias + mask        # [B, H, T] MXU
    attn   = softmax_T(scores)
    allw   = [attn ; wdense_k]                      # [B, H+1, T]
    mixed  = allw @ L                               # [B, H+1, D] MXU
then the standard epilogue (out-proj, W_agg, GRU, LayerNorm) on all nodes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ruvector_tpu.graph.block_dense import BlockDenseGraph
from ruvector_tpu.nn.core import gru_apply, layer_norm_apply, linear_apply
from ruvector_tpu.nn.ruvector_layer import RuvectorLayerConfig


def ruvector_layer_apply_block_dense(
    params: dict,
    cfg: RuvectorLayerConfig,
    features: jax.Array,        # [Npad, Din] (padded to n_blocks * block)
    bdg: BlockDenseGraph,
) -> jax.Array:
    """Update all node embeddings: [Npad, Din] x block-dense graph -> [Npad, H]."""
    nb, b, t = bdg.n_blocks, bdg.block, bdg.table
    heads = cfg.heads
    d = cfg.hidden_dim
    hd = d // heads
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    msg = linear_apply(params["w_msg"], features)               # [Npad, D]
    gather_src = msg.astype(cdt)

    q = linear_apply(params["attn"]["q"], msg).reshape(-1, heads, hd)
    wk = params["attn"]["k"]["kernel"].reshape(d, heads, hd)
    bk = params["attn"]["k"]["bias"].reshape(heads, hd)
    wv = params["attn"]["v"]["kernel"].reshape(d, heads, hd)
    bv = params["attn"]["v"]["bias"].reshape(heads, hd)

    # folded-attention transforms (see nn/ruvector_layer.py): score_h(i,j)
    # = <u_h(i), msg_j> + <q_h(i), b_k_h>
    u = jnp.einsum("nhf,dhf->nhd", q, wk)                       # [Npad, H, D]
    score_bias = jnp.einsum("nhf,hf->nh", q, bk)                # [Npad, H]
    scale = 1.0 / (hd ** 0.5)

    u_blk = u.reshape(nb, b, heads, d).astype(cdt)
    sb_blk = score_bias.reshape(nb, b, heads)

    def block_step(_, inp):
        ids, wd, ub, sb, lm = inp      # [T], [B, T], [B, H, D], [B, H], [B, T]?
        L = gather_src[ids]                                     # [T, D]
        scores = (
            jnp.einsum("bhd,td->bht", ub, L,
                       preferred_element_type=jnp.float32) * scale
            + sb[..., None]
        )
        if lm is not None:             # duplicate-slot multiplicity
            scores = scores + lm[:, None, :]
        edge = (wd > 0)
        scores = jnp.where(edge[:, None, :], scores, -1e30)
        # epsilon-guarded softmax, matching ops/segment.masked_softmax
        # (layer.rs:195-199 semantics)
        smax = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - jnp.maximum(smax, -1e30)) * edge[:, None, :]
        denom = jnp.sum(p, axis=-1, keepdims=True)
        attn = p / jnp.maximum(denom, 1e-10)                    # [B, H, T]
        allw = jnp.concatenate(
            [attn.astype(cdt), wd.astype(cdt)[:, None, :]], axis=1)
        mixed = jnp.einsum("bht,td->bhd", allw, L,
                           preferred_element_type=jnp.float32)  # [B, H+1, D]
        return None, mixed

    _, mixed = jax.lax.scan(
        block_step, None,
        (bdg.local_ids, bdg.wdense, u_blk, sb_blk, bdg.log_mult),
    )                                                            # [nB, B, H+1, D]
    mixed = mixed.reshape(-1, heads + 1, d)

    tv, weighted = mixed[:, :heads, :], mixed[:, heads, :]
    o = jnp.einsum("nhd,dhf->nhf", tv, wv)                      # [Npad, H, hd]
    has_any = (bdg.degrees.reshape(-1) > 0).astype(o.dtype)
    o = o + has_any[:, None, None] * bv
    attn_out = linear_apply(params["attn"]["out"], o.reshape(-1, d))

    aggregated = linear_apply(params["w_agg"], attn_out + weighted)
    updated = gru_apply(params["gru"], aggregated, msg)
    dropped = updated * (1.0 - cfg.dropout)
    out = layer_norm_apply(params["norm"], dropped, cfg.eps)
    isolated = layer_norm_apply(params["norm"], msg, cfg.eps)
    return jnp.where((bdg.degrees.reshape(-1) > 0)[:, None], out, isolated)
