"""Halo exchange + sharded forward/train over a 1-D node mesh.

The multi-chip data plane (SURVEY.md §2.2): node features live sharded in
contiguous blocks; per layer, each shard W_msg-transforms its own block,
exchanges exactly the boundary rows other shards need via ONE
`jax.lax.all_to_all` over ICI (driven by the static HaloPlan), and then the
entire neighbor aggregation — gather, attention, weighted mean, GRU, norm —
is shard-local. Messages (hidden_dim) are exchanged instead of raw features,
so communication shrinks with the hidden size and the W_msg GEMM runs once
per node.

Differentiation goes straight through shard_map/all_to_all, so the same
forward powers the sharded training step.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ruvector_tpu.nn.core import (
    gru_apply,
    layer_norm_apply,
    linear_apply,
)
from ruvector_tpu.nn.ruvector_layer import _folded_attention_and_aggregate
from ruvector_tpu.models.ruvector_net import RuvectorNetConfig
from ruvector_tpu.ops.segment import masked_weighted_mean
from ruvector_tpu.parallel.partition import HaloPlan
from ruvector_tpu.training.losses import batched_info_nce


def halo_exchange(
    local_rows: jax.Array,   # [block, D] this shard's rows (post-transform)
    send_idx: jax.Array,     # [S, H] local row ids to send to each dst shard
    send_mask: jax.Array,    # [S, H]
    axis_name: str,
) -> jax.Array:
    """Exchange boundary rows: returns halo buffer [S*H, D] where slice
    [src*H:(src+1)*H] holds the rows received from shard `src` — matching
    the HaloPlan's src-major halo addressing."""
    outgoing = local_rows[send_idx] * send_mask[..., None]      # [S, H, D]
    received = jax.lax.all_to_all(
        outgoing, axis_name, split_axis=0, concat_axis=0, tiled=True
    )                                                           # [S, H, D]
    return received.reshape(-1, local_rows.shape[-1])


def _layer_forward_block(
    params: dict,
    cfg,
    feats_blk: jax.Array,       # [block, Din]
    send_idx: jax.Array,        # [S, H]
    send_mask: jax.Array,
    local_nbr: jax.Array,       # [block, M]
    nbr_mask: jax.Array,        # [block, M]
    edge_weight: jax.Array,     # [block, M]
    pad_mask: jax.Array,        # [block]
    axis_name: str,
) -> jax.Array:
    """One RuvectorLayer on a shard block with halo'd neighbor messages.

    Same math as ruvector_layer_apply (nn/ruvector_layer.py) — kept in sync
    by tests/test_parallel.py equivalence checks.
    """
    msg = linear_apply(params["w_msg"], feats_blk)              # [block, Hd]
    halo = halo_exchange(msg, send_idx, send_mask, axis_name)   # [S*H, Hd]
    all_msg = jnp.concatenate([msg, halo], axis=0)

    attn_out, weighted = _folded_attention_and_aggregate(
        params["attn"], cfg.heads, msg, all_msg, local_nbr,
        nbr_mask, edge_weight,
    )
    aggregated = linear_apply(params["w_agg"], attn_out + weighted)
    updated = gru_apply(params["gru"], aggregated, msg)
    dropped = updated * (1.0 - cfg.dropout)
    out = layer_norm_apply(params["norm"], dropped, cfg.eps)
    isolated = layer_norm_apply(params["norm"], msg, cfg.eps)
    has_nbrs = jnp.sum(nbr_mask, axis=1, keepdims=True) > 0
    out = jnp.where(has_nbrs, out, isolated)
    return out * pad_mask[:, None]


def make_sharded_layer_forward(
    net_cfg: RuvectorNetConfig,
    plan: HaloPlan,
    mesh: Mesh,
    axis_name: str = "nodes",
):
    """Build jitted multi-layer forward: (params_list, feats [S*block, Din])
    -> embeddings [S*block, hidden], sharded over the mesh."""
    plan_arrays = plan.device_arrays()
    layer_cfgs = net_cfg.layer_cfgs()

    def block_fn(params_list, feats, send_idx, send_mask, local_nbr,
                 nbr_mask, edge_weight, pad_mask):
        # shard_map gives each block with a leading singleton shard axis
        send_idx = send_idx[0]
        send_mask = send_mask[0]
        local_nbr = local_nbr[0]
        nbr_mask = nbr_mask[0]
        edge_weight = edge_weight[0]
        pad_mask = pad_mask[0]
        x = feats
        for params, cfg in zip(params_list, layer_cfgs):
            x = _layer_forward_block(
                params, cfg, x, send_idx, send_mask, local_nbr,
                nbr_mask, edge_weight, pad_mask, axis_name,
            )
        return x

    sharded = shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            P(),                    # params replicated
            P(axis_name),           # feats
            P(axis_name), P(axis_name), P(axis_name),
            P(axis_name), P(axis_name), P(axis_name),
        ),
        out_specs=P(axis_name),
        check_vma=False,
    )

    @jax.jit
    def forward(params_list, feats):
        return sharded(
            params_list, feats,
            plan_arrays["send_idx"], plan_arrays["send_mask"],
            plan_arrays["local_nbr_idx"], plan_arrays["nbr_mask"],
            plan_arrays["edge_weight"], plan_arrays["node_pad_mask"],
        )

    return forward


def make_sharded_train_step(
    net_cfg: RuvectorNetConfig,
    plan: HaloPlan,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    temperature: float = 0.07,
    axis_name: str = "nodes",
):
    """Sharded contrastive train step.

    step(params, opt_state, feats, neg_ids [N_pad, Q]) ->
        (params, opt_state, loss)

    The forward runs under shard_map (halo exchange on ICI); the contrastive
    loss treats every real node as an anchor with its graph neighbors as
    positives and the supplied sampled ids as negatives. Gradients flow
    through the all_to_all; XLA inserts the (reduce-)collectives for the
    replicated-parameter gradient automatically.
    """
    forward = make_sharded_layer_forward(net_cfg, plan, mesh, axis_name)
    # global-addressed neighbor arrays for the loss
    g_nbr = jnp.asarray(
        plan.local_nbr_idx  # local addressing; rebuild global below
    )
    # Build global neighbor ids: local ids < block are own-block rows;
    # halo ids map back to their source shard rows via send_idx.
    import numpy as np

    S, B, M = plan.local_nbr_idx.shape
    H = plan.halo
    glob = np.zeros((S, B, M), np.int32)
    for s in range(S):
        local = plan.local_nbr_idx[s]
        own = local < B
        glob[s][own] = local[own] + s * B
        halo_pos = local[~own] - B           # src*H + pos
        src = halo_pos // H
        pos = halo_pos % H
        glob[s][~own] = plan.send_idx[src, s, pos] + src * B
    global_nbr = jnp.asarray(glob.reshape(S * B, M))
    nbr_mask = jnp.asarray(plan.nbr_mask.reshape(S * B, M))
    pad_mask = jnp.asarray(plan.node_pad_mask.reshape(S * B))

    def loss_fn(params, feats, neg_ids):
        out = forward(params, feats)                      # [N_pad, Hd]
        anchors = out
        pos = out[global_nbr]                             # [N_pad, M, Hd]
        negs = out[neg_ids]                               # [N_pad, Q, Hd]
        per_node_mask = nbr_mask * pad_mask[:, None]
        return batched_info_nce(anchors, pos, negs, temperature, per_node_mask)

    @jax.jit
    def step(params, opt_state, feats, neg_ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, neg_ids)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_mp_forward(step_fns, plan: "HaloPlan", mesh: Mesh,
                            axis_name: str = "nodes"):
    """Generic sharded message passing over the halo plan — the SPMD path
    for GCN / GraphSAGE / GAT-style layers (the reference's second GNN
    family, ruvector-postgres/src/gnn/).

    step_fns: list of fn(x_blk [B, Din], nbr_feats [B, M, Din],
        nbr_mask [B, M], edge_weight [B, M], pad_mask [B]) -> [B, Dout].
    Each layer's RAW features are halo-exchanged (one all_to_all), then the
    step runs entirely shard-local. Returns jitted forward(feats) ->
    [S*block, Dout] sharded over the mesh.
    """
    plan_arrays = plan.device_arrays()

    def block_fn(feats, send_idx, send_mask, local_nbr, nbr_mask,
                 edge_weight, pad_mask):
        send_idx, send_mask = send_idx[0], send_mask[0]
        local_nbr, nbr_mask = local_nbr[0], nbr_mask[0]
        edge_weight, pad_mask = edge_weight[0], pad_mask[0]
        x = feats
        for fn in step_fns:
            halo = halo_exchange(x, send_idx, send_mask, axis_name)
            combined = jnp.concatenate([x, halo], axis=0)
            nbr_feats = combined[local_nbr]                  # [B, M, D]
            x = fn(x, nbr_feats, nbr_mask, edge_weight, pad_mask)
        return x

    sharded = shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(P(axis_name),) * 7,
        out_specs=P(axis_name),
        check_vma=False,
    )

    @jax.jit
    def forward(feats):
        return sharded(
            feats,
            plan_arrays["send_idx"], plan_arrays["send_mask"],
            plan_arrays["local_nbr_idx"], plan_arrays["nbr_mask"],
            plan_arrays["edge_weight"], plan_arrays["node_pad_mask"],
        )

    return forward


def make_blocked_layer_forward(net_cfg: RuvectorNetConfig, plan: HaloPlan):
    """SINGLE-DEVICE blocked execution over the same HaloPlan.

    Why: gather throughput on TPU falls with source-table size (measured:
    155M edges/s from a 100k-row table vs 88M from 1M rows — table size,
    not index locality, is what matters; docs/DESIGN_NOTES.md). Blocking
    restructures the per-slot gathers to hit a small local table
    [block + halo] instead of the full [N] message table: per block, only
    the halo rows (a few % after cluster reordering) are gathered from the
    big table; the M-slot bulk gathers stay block-local. The plan — and
    therefore the data layout — is IDENTICAL to the multi-chip sharded
    path; a lax.scan over blocks replaces the mesh.

    Returns jitted forward(params_list, feats [S*block, Din]) ->
    [S*block, hidden] matching make_sharded_layer_forward's output.
    """
    import numpy as np

    layer_cfgs = net_cfg.layer_cfgs()
    S, B, M = plan.local_nbr_idx.shape

    send_idx = np.asarray(plan.send_idx)          # [src, dst, H]
    send_mask = np.asarray(plan.send_mask)
    # rows each DST block reads from the global table, src-major (matching
    # local_nbr_idx's halo addressing local id B + src*H + pos)
    halo_rows = (np.arange(S)[:, None, None] * B + send_idx)
    halo_rows_dst = jnp.asarray(
        np.transpose(halo_rows, (1, 0, 2)).reshape(S, -1))        # [S, S*H]
    halo_mask_dst = jnp.asarray(
        np.transpose(send_mask, (1, 0, 2)).reshape(S, -1))        # [S, S*H]

    pa = plan.device_arrays()
    xs_static = (halo_rows_dst, halo_mask_dst, pa["local_nbr_idx"],
                 pa["nbr_mask"], pa["edge_weight"], pa["node_pad_mask"])

    @jax.jit
    def forward(params_list, feats):
        x = feats
        for params, cfg in zip(params_list, layer_cfgs):
            msg = linear_apply(params["w_msg"], x)        # dense, full table
            msg_blocks = msg.reshape(S, B, -1)

            def block_step(_, inp):
                (own, halo_ids, halo_mask, local_nbr, nbr_mask,
                 edge_weight, pad_mask) = inp
                halo = msg[halo_ids] * halo_mask[:, None]
                local_tab = jnp.concatenate([own, halo], axis=0)
                attn_out, weighted = _folded_attention_and_aggregate(
                    params["attn"], cfg.heads, own, local_tab, local_nbr,
                    nbr_mask, edge_weight,
                )
                aggregated = linear_apply(params["w_agg"],
                                          attn_out + weighted)
                updated = gru_apply(params["gru"], aggregated, own)
                dropped = updated * (1.0 - cfg.dropout)
                out = layer_norm_apply(params["norm"], dropped, cfg.eps)
                isolated = layer_norm_apply(params["norm"], own, cfg.eps)
                has_nbrs = jnp.sum(nbr_mask, axis=1, keepdims=True) > 0
                out = jnp.where(has_nbrs, out, isolated)
                return None, out * pad_mask[:, None]

            _, blocks = jax.lax.scan(
                block_step, None, (msg_blocks,) + xs_static)
            x = blocks.reshape(S * B, -1)
        return x

    return forward


def make_blocked_train_step(
    net_cfg: RuvectorNetConfig,
    plan: HaloPlan,
    optimizer: optax.GradientTransformation,
    temperature: float = 0.07,
):
    """Single-device big-graph training with the blocked forward: the same
    contrastive objective as make_sharded_train_step, with gradients
    flowing through the block scan instead of the mesh collectives. This
    is the cold-tier / one-chip path for graphs whose flat-layer gather
    tables leave the fast regime (DESIGN_NOTES gather cache blocking)."""
    import numpy as np

    forward = make_blocked_layer_forward(net_cfg, plan)

    S, B, M = plan.local_nbr_idx.shape
    H = plan.halo
    glob = np.zeros((S, B, M), np.int32)
    for s in range(S):
        local = plan.local_nbr_idx[s]
        own = local < B
        glob[s][own] = local[own] + s * B
        halo_pos = local[~own] - B
        src = halo_pos // H
        pos = halo_pos % H
        glob[s][~own] = plan.send_idx[src, s, pos] + src * B
    global_nbr = jnp.asarray(glob.reshape(S * B, M))
    nbr_mask = jnp.asarray(plan.nbr_mask.reshape(S * B, M))
    pad_mask = jnp.asarray(plan.node_pad_mask.reshape(S * B))

    def loss_fn(params, feats, neg_ids):
        out = forward(params, feats)
        pos = out[global_nbr]
        negs = out[neg_ids]
        per_node_mask = nbr_mask * pad_mask[:, None]
        return batched_info_nce(out, pos, negs, temperature, per_node_mask)

    @jax.jit
    def step(params, opt_state, feats, neg_ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, neg_ids)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# Overlapped halo exchange (VERDICT r1 item 3): packed all_gather + interior/
# boundary compute split. The all_gather result is consumed ONLY by the
# boundary rows' attention, so XLA's latency-hiding scheduler runs the
# collective concurrently with the interior attention (the dominant term at
# sub-percent halo fractions). See parallel/partition.OverlapPlan.
# ---------------------------------------------------------------------------


def _layer_forward_overlap(
    params, cfg, feats_blk, pack_idx, pack_mask, local_nbr, nbr_mask,
    edge_weight, pad_mask, n_interior: int, axis_name: str,
):
    msg = linear_apply(params["w_msg"], feats_blk)              # [block, Hd]
    # publish packed boundary rows; collective starts here
    pack = msg[pack_idx] * pack_mask[:, None]                   # [Bmax, Hd]
    halo = jax.lax.all_gather(pack, axis_name, tiled=True)      # [S*Bmax, Hd]

    nI = n_interior
    # interior rows: no dependence on `halo` -> overlaps with the gather
    attn_i, wmean_i = _folded_attention_and_aggregate(
        params["attn"], cfg.heads, msg[:nI], msg,
        local_nbr[:nI], nbr_mask[:nI], edge_weight[:nI],
    )
    # boundary rows: consume local + gathered halo
    all_msg = jnp.concatenate([msg, halo], axis=0)
    attn_b, wmean_b = _folded_attention_and_aggregate(
        params["attn"], cfg.heads, msg[nI:], all_msg,
        local_nbr[nI:], nbr_mask[nI:], edge_weight[nI:],
    )
    attn_out = jnp.concatenate([attn_i, attn_b], axis=0)
    weighted = jnp.concatenate([wmean_i, wmean_b], axis=0)

    aggregated = linear_apply(params["w_agg"], attn_out + weighted)
    updated = gru_apply(params["gru"], aggregated, msg)
    dropped = updated * (1.0 - cfg.dropout)
    out = layer_norm_apply(params["norm"], dropped, cfg.eps)
    isolated = layer_norm_apply(params["norm"], msg, cfg.eps)
    has_nbrs = jnp.sum(nbr_mask, axis=1, keepdims=True) > 0
    out = jnp.where(has_nbrs, out, isolated)
    return out * pad_mask[:, None]


def make_overlap_layer_forward(
    net_cfg: RuvectorNetConfig,
    plan,                       # OverlapPlan
    mesh: Mesh,
    axis_name: str = "nodes",
):
    """Jitted multi-layer forward over the OverlapPlan: packed all_gather
    halo + interior/boundary split per layer."""
    plan_arrays = plan.device_arrays()
    layer_cfgs = net_cfg.layer_cfgs()
    n_interior = plan.n_interior

    def block_fn(params_list, feats, pack_idx, pack_mask, local_nbr,
                 nbr_mask, edge_weight, pad_mask):
        pack_idx = pack_idx[0]
        pack_mask = pack_mask[0]
        local_nbr = local_nbr[0]
        nbr_mask = nbr_mask[0]
        edge_weight = edge_weight[0]
        pad_mask = pad_mask[0]
        x = feats
        for params, cfg in zip(params_list, layer_cfgs):
            x = _layer_forward_overlap(
                params, cfg, x, pack_idx, pack_mask, local_nbr,
                nbr_mask, edge_weight, pad_mask, n_interior, axis_name,
            )
        return x

    sharded = shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            P(),
            P(axis_name),
            P(axis_name), P(axis_name), P(axis_name),
            P(axis_name), P(axis_name), P(axis_name),
        ),
        out_specs=P(axis_name),
        check_vma=False,
    )

    @jax.jit
    def forward(params_list, feats):
        return sharded(
            params_list, feats,
            plan_arrays["pack_idx"], plan_arrays["pack_mask"],
            plan_arrays["local_nbr_idx"], plan_arrays["nbr_mask"],
            plan_arrays["edge_weight"], plan_arrays["node_pad_mask"],
        )

    return forward
