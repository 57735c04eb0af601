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
    use_pallas: bool = False,
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

    if use_pallas:
        # Fused kernel: scores never touch HBM (ops/pallas/block_dense_attn).
        # Head-major layout end-to-end — u/sb produced and mixed consumed
        # as [H(+1), nB, B, D] so the kernel works on pure 2-D tiles.
        from ruvector_tpu.ops.pallas.block_dense_attn import (
            block_dense_attention,
        )
        L_tab = gather_src[bdg.local_ids]                   # [nB, T, D]
        u_hm = jnp.einsum("nhf,dhf->hnd", q, wk).reshape(
            heads, nb, b, d).astype(cdt)
        sb_hm = jnp.einsum("nhf,hf->hn", q, bk).reshape(heads, nb, b)
        mixed_hm = block_dense_attention(
            L_tab, u_hm, sb_hm, bdg.wdense, bdg.log_mult,
            scale=scale)                                    # [H+1, nB, B, D]
        tv = mixed_hm[:heads].reshape(heads, -1, d)         # [H, Npad, D]
        weighted = mixed_hm[heads].reshape(-1, d)
        o = jnp.einsum("hnd,dhf->nhf", tv, wv)              # [Npad, H, hd]
    else:
        _, mixed = jax.lax.scan(
            block_step, None,
            (bdg.local_ids, bdg.wdense, u_blk, sb_blk, bdg.log_mult),
        )                                                        # [nB, B, H+1, D]
        mixed = mixed.reshape(-1, heads + 1, d)
        tv, weighted = mixed[:, :heads, :], mixed[:, heads, :]
        o = jnp.einsum("nhd,dhf->nhf", tv, wv)                  # [Npad, H, hd]
    has_any = (bdg.degrees.reshape(-1) > 0).astype(o.dtype)
    o = o + has_any[:, None, None] * bv
    attn_out = linear_apply(params["attn"]["out"], o.reshape(-1, d))

    aggregated = linear_apply(params["w_agg"], attn_out + weighted)
    updated = gru_apply(params["gru"], aggregated, msg)
    dropped = updated * (1.0 - cfg.dropout)
    out = layer_norm_apply(params["norm"], dropped, cfg.eps)
    isolated = layer_norm_apply(params["norm"], msg, cfg.eps)
    return jnp.where((bdg.degrees.reshape(-1) > 0)[:, None], out, isolated)


def fold_layer_params(params: dict, cfg: RuvectorLayerConfig) -> dict:
    """Fold the layer's attention/epilogue parameters for the fused kernel
    (ops/pallas/block_dense_attn.block_dense_layer_fused). All folds are
    exact algebra on the [D, D]-class parameter matrices; see the kernel
    docstring for the identities."""
    d = cfg.hidden_dim
    heads = cfg.heads
    hd = d // heads
    wq = params["attn"]["q"]["kernel"].reshape(d, heads, hd)
    bq = params["attn"]["q"]["bias"].reshape(heads, hd)
    wk = params["attn"]["k"]["kernel"].reshape(d, heads, hd)
    bk = params["attn"]["k"]["bias"].reshape(heads, hd)
    wv = params["attn"]["v"]["kernel"].reshape(d, heads, hd)
    bv = params["attn"]["v"]["bias"].reshape(heads, hd)
    wout = params["attn"]["out"]["kernel"]
    bout = params["attn"]["out"]["bias"]
    gru = params["gru"]

    # pre-scaled by 1/sqrt(hd): score = (u@L)*scale == (scale*u)@L exactly,
    # saving a [Bt, T] VPU pass per head in the kernel
    scale = 1.0 / (hd ** 0.5)
    A = jnp.einsum("dhf,ehf->hde", wq, wk) * scale      # [H, D, D]
    c = jnp.einsum("hf,ehf->he", bq, wk)[:, None, :] * scale   # [H, 1, D]
    # the <q_h(i), b_k_h> score bias (wsb/ssb) is row-constant in the
    # softmax and cancels exactly — the fused kernel never computes it
    wout_h = wout.reshape(heads, hd, d)
    Wvo = jnp.einsum("dhf,hfe->hde", wv, wout_h)        # [H, D, D]
    bvo = (bv.reshape(-1) @ wout)[None, :]              # [1, D]

    return dict(
        A=A, c=c, Wvo=Wvo, bvo=bvo,
        bout=bout[None, :],
        Wagg=params["w_agg"]["kernel"], bagg=params["w_agg"]["bias"][None, :],
        w3=jnp.concatenate([gru["w_z"]["kernel"], gru["w_r"]["kernel"],
                            gru["w_h"]["kernel"]], axis=1),
        b3=jnp.concatenate([gru["w_z"]["bias"], gru["w_r"]["bias"],
                            gru["w_h"]["bias"]])[None, :],
        u2=jnp.concatenate([gru["u_z"]["kernel"], gru["u_r"]["kernel"]],
                           axis=1),
        ub2=jnp.concatenate([gru["u_z"]["bias"],
                             gru["u_r"]["bias"]])[None, :],
        uhk=gru["u_h"]["kernel"], uhb=gru["u_h"]["bias"][None, :],
        gamma=params["norm"]["gamma"][None, :],
        beta=params["norm"]["beta"][None, :],
    )


def ruvector_layer_apply_block_dense_fused(
    params: dict,
    cfg: RuvectorLayerConfig,
    features: jax.Array,        # [Npad, Din]
    bdg: BlockDenseGraph,
    tile: int = 256,
    io_dtype=None,
) -> jax.Array:
    """Whole layer as msg-linear + ONE fused Pallas kernel.

    io_dtype=jnp.bfloat16 stores msg and the output in bf16 (halves the
    layer's HBM residency for 10M-node-class graphs); in-kernel GRU/LN
    math stays f32.

    When the block layout has no halo (table == block, the common case
    after graph-grown blocking on clustered data), the local tables are a
    free reshape of msg — the layer then runs with zero gathers and no
    HBM intermediate except msg itself.
    """
    from ruvector_tpu.ops.pallas.block_dense_attn import (
        block_dense_layer_fused,
    )
    nb, b, t = bdg.n_blocks, bdg.block, bdg.table
    d = cfg.hidden_dim
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    if io_dtype is not None:
        # compute the projection directly in io_dtype: at 10M nodes a
        # transient f32 [Npad, D] (5.1GB) is the difference between
        # fitting HBM and OOM; bf16 matmul loses <1e-2 which the f32
        # in-kernel GRU/LN math downstream tolerates (parity test
        # test_fused_bf16_io_parity)
        msg = (jnp.dot(features.astype(io_dtype),
                       params["w_msg"]["kernel"].astype(io_dtype),
                       preferred_element_type=io_dtype)
               + params["w_msg"]["bias"].astype(io_dtype))
    else:
        msg = linear_apply(params["w_msg"], features)   # [Npad, D] f32
    msgf = msg.reshape(nb, b, d)
    if t == b:
        L_tab = msgf.astype(cdt)                        # free: own rows only
    else:
        own = msgf.astype(cdt)
        halo = msg.astype(cdt)[bdg.local_ids[:, b:]]    # [nB, T-B, D]
        L_tab = jnp.concatenate([own, halo], axis=1)

    folded = fold_layer_params(params, cfg)
    out = block_dense_layer_fused(
        L_tab, msgf, bdg.wdense, folded, bdg.log_mult,
        scale=1.0 / ((d // cfg.heads) ** 0.5),
        dropout=cfg.dropout, eps=cfg.eps, tile=tile)
    return out.reshape(-1, d)
