"""Partitioned mincut-gated graph transformer (BASELINE.json config 5).

The reference runs its mincut-gated transformer over a partitioned graph
(ruvector-graph-transformer + ruvector-attn-mincut/src/gating.rs:70-102,
with the partitioner role of ruvector-graph/src/distributed/shard.rs:209):
attention within a partition is gated by a dynamic min-cut over the
positive attention logits, and information crosses partitions only along
graph edges.

TPU-first formulation: partitions ARE the block-dense blocks
(graph/block_dense.py), so one layer is three batched sublayers over the
[nB, B, D] layout with no gathers in the hot path:

  1. intra-partition mincut-gated MHA — per-(partition, head) device
     push-relabel gate (attention/mincut_device.py), chunk-vmapped with
     lax.map so the [chunk, B, B] residual/capacity buffers stay bounded
     at 1M-node scale;
  2. cross-partition neighbor mixing — the normalized edge weights of the
     BlockDenseGraph as one einsum against each block's local table
     (mean-aggregate semantics, layer.rs:379-457's aggregate step);
  3. pre-norm FFN.

The gate decision is a discrete mask: it is wrapped in stop_gradient, so
the whole layer is differentiable end-to-end through the kept attention
entries (the host Dinic gate has the same semantics by construction).

Round 3 — temporal gate reuse (the reference's hysteresis semantics,
ruvector-attn-mincut/src/gating.rs:70-102 + hysteresis module): gates are
state, not per-forward work. `gate_state_init` solves every partition
once; `gated_graph_transformer_step` then re-solves ONLY partitions whose
per-partition gate signature (mean positive pooled logit — the lambda
proxy the reference band-tests) drifted past the hysteresis band,
batched into ONE device push-relabel program with a static re-solve
budget. Because the pooled (head-mean) logit matrix equals the full-dim
QK^T dot / H, the signature pass is a single einsum — no per-head logits
are materialized for gating. Training splits the same way:
`gated_graph_transformer_loss_with_masks` consumes the state's masks, so
the backward program carries no push-relabel while_loops at all (that is
what crashed the remote TPU compiler on 1M-node backward in round 2).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.mincut_device import mincut_gate_device
from ruvector_tpu.graph.block_dense import BlockDenseGraph
from ruvector_tpu.ops.pallas.gated_block_attn import (
    fold_gated_attention_params,
    gated_block_attention,
)
from ruvector_tpu.nn.core import (
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    xavier_normal,
)
from ruvector_tpu.ops.segment import masked_softmax


@dataclasses.dataclass(frozen=True)
class GatedGraphTransformerConfig:
    dim: int
    num_heads: int = 4
    ffn_mult: int = 4
    num_layers: int = 2
    lam: float = 0.5            # gate threshold multiplier (mincut.rs:163)
    eps: float = 0.01           # positive-logit clamp
    gate_chunk: int = 256       # partitions per lax.map step (memory bound)
    # 'pooled' (default): ONE gate per partition over the head-mean
    # logits, mask shared across heads — gating.rs:70-102 operates on a
    # single [S, S] logit matrix, so this is the faithful granularity
    # (and 1/H the gate cost). 'per_head': independent gate per head.
    gate_mode: str = "pooled"
    # hysteresis band for temporal gate reuse (gating.rs hysteresis
    # semantics): a partition's gate re-solves only when its signature
    # (mean positive pooled logit) moves more than band (relative)
    hysteresis_band: float = 0.05
    # static per-step re-solve budget for the incremental path, as a
    # fraction of partitions (rounded up to >=1); drifted partitions
    # beyond the budget keep their stale mask and queue for next step
    max_resolve_frac: float = 1 / 16
    # staleness control (round 4): drifted-but-deferred partitions age
    # (steps since last re-solve while flagged); budget selection orders
    # by age first, so no flagged partition starves — staleness is
    # bounded by ceil(flagged / budget) steps. max_gate_age > 0 adds a
    # hard bound: a partition whose mask is older than this re-solves
    # even without signature drift (0 = pure hysteresis, the reference's
    # semantics — gating.rs hysteresis band), and the budget ESCALATES
    # (a second budget-sized batched solve) on steps where partitions
    # would still exceed the bound — the bound then holds whenever
    # nB <= 2 * budget * max_gate_age (measured: GATE_STALENESS_r04).
    max_gate_age: int = 0
    # rematerialize each layer in the backward pass: shrinks the saved-
    # residual plumbing that overruns the remote TPU compiler on
    # 1M-node backward programs (and cuts activation memory ~L-fold)
    remat: bool = False
    compute_dtype: str = "float32"
    # fused Pallas gated-MHA kernel: 'auto' uses it on TPU when shapes
    # tile (D%128==0, B%8==0); 'always' forces it (tests run it in
    # interpret mode); 'never' disables. Round 4: the kernel has a
    # recompute-backward custom_vjp, so the differentiable loss path
    # uses it too — training no longer round-trips [*, B, B] logits
    # through HBM.
    fused_gate_attn: str = "auto"

    @property
    def head_dim(self) -> int:
        assert self.dim % self.num_heads == 0
        return self.dim // self.num_heads


def gated_graph_transformer_init(
    key, cfg: GatedGraphTransformerConfig
) -> list[dict]:
    layers = []
    for k in jax.random.split(key, cfg.num_layers):
        kq, kk, kv, ko, kg, ki, kf = jax.random.split(k, 7)
        d = cfg.dim
        layers.append({
            "wq": xavier_normal(kq, d, d),
            "wk": xavier_normal(kk, d, d),
            "wv": xavier_normal(kv, d, d),
            "wo": xavier_normal(ko, d, d),
            "w_gnn": linear_init(kg, d, d),
            "ln1": layer_norm_init(d),
            "ln_g": layer_norm_init(d),
            "ln2": layer_norm_init(d),
            "ffn_in": linear_init(ki, d, d * cfg.ffn_mult),
            "ffn_out": linear_init(kf, d * cfg.ffn_mult, d),
        })
    return layers


def _gated_attention_block(h, node_pad, wq, wk, wv, wo, cfg):
    """Mincut-gated MHA within each partition.

    h: [nB, B, D]; node_pad: [nB, B]. Returns ([nB, B, D], stats) where
    stats = (cut_applied [nB, H] bool, cut_cost [nB, H]).
    """
    nb, b, d = h.shape
    hh, dh = cfg.num_heads, cfg.head_dim
    scale = 1.0 / (dh ** 0.5)

    def proj(w):
        return jnp.einsum(
            "nbd,de->nbe", h, w, preferred_element_type=jnp.float32
        ).reshape(nb, b, hh, dh).transpose(0, 2, 1, 3)    # [nB, H, B, dh]

    q, k, v = proj(wq), proj(wk), proj(wv)

    def one_chunk(args):
        qc, kc, vc, padc = args                     # [C, H, B, *] / [C, B]
        # pad mask built per chunk: materializing [nB, 1, B, B] up front
        # costs ~1 GB at 1M nodes and becomes a stacked scan residual
        vmc = padc[:, None, :, None] * padc[:, None, None, :]
        logits = jnp.einsum(
            "chqd,chkd->chqk", qc, kc,
            preferred_element_type=jnp.float32) * scale
        # padding rows/cols carry no positive weight -> invisible to gate
        logits = jnp.where(vmc > 0, logits, -1.0)
        if cfg.gate_mode == "pooled":
            # one gate per partition over head-mean logits (the
            # reference's single-matrix granularity); keep broadcast
            pooled = jnp.mean(logits, axis=1)       # [C, B, B]
            keep1, cost1 = jax.vmap(
                lambda lg: mincut_gate_device(lg, cfg.lam, cfg.eps)
            )(pooled)
            keep = jnp.broadcast_to(keep1[:, None], logits.shape)
            cost = jnp.broadcast_to(cost1[:, None],
                                    logits.shape[:2])
        else:
            keep, cost = jax.vmap(jax.vmap(
                lambda lg: mincut_gate_device(lg, cfg.lam, cfg.eps)
            ))(logits)
        keep = jax.lax.stop_gradient(keep)
        attn = masked_softmax(logits, keep.astype(jnp.float32) * vmc)
        out = jnp.einsum(
            "chqk,chkd->chqd", attn, vc,
            preferred_element_type=jnp.float32)
        return out, (cost > 0, cost)

    # ceil-chunked lax.map bounds the [chunk, H, B, B] gate buffers at
    # 1M-node scale (chunk=nb would blow them)
    out, (applied, cost) = _ceil_chunked_map(
        one_chunk, (q, k, v, node_pad), nb, cfg.gate_chunk)
    out = out.transpose(0, 2, 1, 3).reshape(nb, b, d)
    out = jnp.einsum(
        "nbd,de->nbe", out, wo, preferred_element_type=jnp.float32)
    return out * node_pad[..., None], (applied, cost)


def _neighbor_mix(h, bdg: BlockDenseGraph, w_gnn):
    """Cross-partition mean-aggregate along graph edges (one einsum)."""
    nb, b, d = h.shape
    flat = h.reshape(nb * b, d)
    if bdg.table == b:            # halo-free: local table is the block
        local = h
    else:
        local = flat[bdg.local_ids]                  # [nB, T, D]
    # operands in h.dtype (casting a bf16 wdense to f32 is a 9.5 GB HBM
    # temp at 10M nodes); the MXU still accumulates f32 for bf16 inputs
    agg = jnp.einsum(
        "nbt,ntd->nbd", bdg.wdense.astype(h.dtype), local,
        preferred_element_type=jnp.float32).astype(h.dtype)
    return linear_apply(w_gnn, agg)


def gated_graph_transformer_apply(
    params: list[dict],
    cfg: GatedGraphTransformerConfig,
    fpad: jax.Array,              # [nB*B, D] padded to the block layout
    bdg: BlockDenseGraph,
    with_stats: bool = False,
):
    """Forward over the partitioned graph. Returns [nB*B, D] (and, with
    with_stats, a list of per-layer (cut_applied [nB, H], cut_cost))."""
    nb, b = bdg.n_blocks, bdg.block
    x = fpad.reshape(nb, b, -1)
    pad = bdg.node_pad
    stats = []

    def layer(p, x):
        h = layer_norm_apply(p["ln1"], x)
        a, st = _gated_attention_block(
            h, pad, p["wq"], p["wk"], p["wv"], p["wo"], cfg)
        x = x + a
        g = layer_norm_apply(p["ln_g"], x)
        x = x + _neighbor_mix(g, bdg, p["w_gnn"]) * pad[..., None]
        h2 = layer_norm_apply(p["ln2"], x)
        x = x + linear_apply(
            p["ffn_out"], jax.nn.gelu(linear_apply(p["ffn_in"], h2))
        ) * pad[..., None]
        return x, st

    if cfg.remat:
        layer = jax.checkpoint(layer)
    for p in params:
        x, st = layer(p, x)
        stats.append(st)
    out = x.reshape(nb * b, -1)
    return (out, stats) if with_stats else out


@functools.partial(jax.jit, static_argnums=(1,))
def gated_graph_transformer_loss(params, cfg, fpad, bdg, targets):
    """Mean-squared node-embedding loss — proves end-to-end
    differentiability through the gated layers (gate is stop-gradient)."""
    out = gated_graph_transformer_apply(params, cfg, fpad, bdg)
    pad = bdg.node_pad.reshape(-1, 1)
    err = (out - targets) * pad
    return jnp.sum(err * err) / jnp.maximum(jnp.sum(pad), 1.0)


# ---------------------------------------------------------------------------
# Temporal gate reuse (round 3): hysteresis state + incremental re-solve
# ---------------------------------------------------------------------------

def _qk_proj(h, wq, wk, cfg):
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    q = jnp.einsum("nbd,de->nbe", h, wq,
                   preferred_element_type=jnp.float32).astype(cdt)
    k = jnp.einsum("nbd,de->nbe", h, wk,
                   preferred_element_type=jnp.float32).astype(cdt)
    return q, k


def _pooled_from_qk(q, k, node_pad, cfg):
    lg = jnp.einsum("nqd,nkd->nqk", q, k,
                    preferred_element_type=jnp.float32)
    lg = lg * (1.0 / (cfg.head_dim ** 0.5) / cfg.num_heads)
    valid = node_pad[:, :, None] * node_pad[:, None, :]
    return jnp.where(valid > 0, lg, -1.0)


def _pooled_logits(h, node_pad, wq, wk, cfg):
    """Head-mean logits for one layer in one einsum: since heads are
    disjoint slices of the projected dim, sum_h q_h.k_h == (hWq).(hWk)
    over the full dim, so the pooled [nB, B, B] matrix never needs the
    per-head [nB, H, B, B] tensor. Padding entries are -1.0, matching
    _gated_attention_block's pooled path exactly."""
    q, k = _qk_proj(h, wq, wk, cfg)
    return _pooled_from_qk(q, k, node_pad, cfg)


def _signature_fused(q, k, node_pad, cfg):
    """Signature via the Pallas reduction kernel — no [nB, B, B] HBM
    tensor. Must be used consistently by init AND step (its reduction
    order differs from _gate_signature's, so mixing the two would read
    as spurious drift)."""
    from ruvector_tpu.ops.pallas.gated_block_attn import block_gate_signature

    rsum, rcnt = block_gate_signature(
        q, k, node_pad, eps=cfg.eps,
        scale=1.0 / (cfg.head_dim ** 0.5) / cfg.num_heads)
    return jnp.sum(rsum, axis=1) / jnp.maximum(jnp.sum(rcnt, axis=1), 1.0)


def _fold_sig_params(p, cfg):
    """A_sig = Wq @ Wk^T / (sqrt(dh) * H): the head-mean pooled-logit
    matrix folded so signature AND selected-partition pooled logits read
    the pre-norm features directly — the per-step q/k projections
    (2x [nB, B, D] HBM write+read per layer) existed only to feed drift
    detection."""
    return (p["wq"] @ p["wk"].T) * (
        1.0 / (cfg.head_dim ** 0.5) / cfg.num_heads)


def _signature_fused_x(h, A_sig, node_pad, cfg):
    from ruvector_tpu.ops.pallas.gated_block_attn import (
        block_gate_signature_x,
    )

    rsum, rcnt = block_gate_signature_x(
        h, node_pad, A_sig, eps=cfg.eps,
        compute_bf16=cfg.compute_dtype == "bfloat16")
    return jnp.sum(rsum, axis=1) / jnp.maximum(jnp.sum(rcnt, axis=1), 1.0)


def _signature_from_x(x, p, A_sig, node_pad, cfg):
    """Signature straight from the residual stream: the LN1 is folded
    into the reduction kernel, so the step path never materializes the
    [nB, B, D] normalized tensor (it existed in HBM purely to feed
    drift detection — ~1 GB write+read per layer per step at 1M)."""
    from ruvector_tpu.ops.pallas.gated_block_attn import (
        block_gate_signature_ln_x,
    )

    rsum, rcnt = block_gate_signature_ln_x(
        x, node_pad, A_sig, p["ln1"]["gamma"], p["ln1"]["beta"],
        eps=cfg.eps, compute_bf16=cfg.compute_dtype == "bfloat16")
    return jnp.sum(rsum, axis=1) / jnp.maximum(jnp.sum(rcnt, axis=1), 1.0)


def _solve_gates_kernel(x_sel, pad_sel, A_sig, p, cfg):
    """Batched gate solve via the VMEM-resident push-relabel kernel
    (ops/pallas/mincut_gate_block): LN1 folded in, logits built
    in-kernel, masks emitted bit-packed. Returns keep [K, W, B] u32."""
    from ruvector_tpu.ops.pallas.mincut_gate_block import (
        mincut_gate_block_from_x,
    )

    keep, _ = mincut_gate_block_from_x(
        x_sel, pad_sel, A_sig, lam=cfg.lam, eps=cfg.eps,
        ln=(p["ln1"]["gamma"], p["ln1"]["beta"]),
        compute_bf16=cfg.compute_dtype == "bfloat16")
    return keep


def _pooled_from_x(h_sel, pad_sel, A_sig):
    """Pooled (head-mean) logits for a subset of partitions, straight
    from pre-norm features: X (Wq Wk^T / (sqrt(dh) H)) X^T with -1.0 on
    padding — _pooled_from_qk's output by the A-folded association."""
    qs = jnp.einsum("kbd,de->kbe", h_sel, A_sig,
                    preferred_element_type=jnp.float32)
    lg = jnp.einsum("kqd,kjd->kqj", qs, h_sel,
                    preferred_element_type=jnp.float32)
    valid = pad_sel[:, :, None] * pad_sel[:, None, :]
    return jnp.where(valid > 0, lg, -1.0)


def pack_keep(keep):
    """[..., B, B] bool -> [..., ceil(B/32), B] uint32: row i of the mask
    lives in word i//32, bit i%32 (sublane-packed — at B=256 the packed
    block is an exactly-tiled (8, 256) uint32 operand). 32x smaller: the
    10M-node mask state is 0.32 GB packed vs 10.2 GB as bf16."""
    b = keep.shape[-2]
    w = -(-b // 32)
    if w * 32 != b:
        keep = jnp.concatenate(
            [keep, jnp.zeros((*keep.shape[:-2], w * 32 - b,
                              keep.shape[-1]), keep.dtype)], axis=-2)
    bits = keep.reshape(*keep.shape[:-2], w, 32, keep.shape[-1])
    shifts = jnp.arange(32, dtype=jnp.uint32).reshape(
        *([1] * (bits.ndim - 2)), 32, 1)
    return jnp.sum(bits.astype(jnp.uint32) << shifts, axis=-2,
                   dtype=jnp.uint32)


def unpack_keep(kp, b=None):
    """Inverse of pack_keep: [..., W, B] uint32 -> [..., B, B] bool."""
    w = kp.shape[-2]
    b = b if b is not None else kp.shape[-1]
    shifts = jnp.arange(32, dtype=jnp.uint32).reshape(
        *([1] * (kp.ndim - 1)), 32, 1)
    bits = (kp[..., :, None, :] >> shifts) & jnp.uint32(1)
    full = bits.reshape(*kp.shape[:-2], w * 32, kp.shape[-1])
    return full[..., :b, :].astype(bool)


def _gate_signature(pooled, eps):
    """Per-partition lambda proxy: mean positive clamped logit — the same
    statistic the gate thresholds against (gating.rs:70-102)."""
    clamped = jnp.where(pooled > eps, pooled, 0.0)
    npos = jnp.sum(clamped > 0, axis=(-2, -1))
    return jnp.sum(clamped, axis=(-2, -1)) / jnp.maximum(npos, 1)


def _attention_with_keep(h, node_pad, keep, p, cfg, chunk):
    """MHA within partitions under a FIXED per-partition keep mask
    ([nB, B, B] bool, broadcast across heads). Differentiable; no gate
    solves. Chunked with lax.map to bound the [c, H, B, B] transients.

    compute_dtype='bfloat16' casts Q/K/V (and the softmax weights fed to
    the AV matmul) to bf16 with f32 accumulation — at 1M nodes the
    [c, H, B, B] logits are the dominant HBM traffic and halve.
    """
    nb, b, d = h.shape
    hh, dh = cfg.num_heads, cfg.head_dim
    scale = 1.0 / (dh ** 0.5)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def proj(w):
        return jnp.einsum(
            "nbd,de->nbe", h, w, preferred_element_type=jnp.float32
        ).reshape(nb, b, hh, dh).transpose(0, 2, 1, 3).astype(cdt)

    q, k, v = proj(p["wq"]), proj(p["wk"]), proj(p["wv"])

    # checkpointed chunk body: without remat, the lax.map backward stacks
    # every chunk's [c, H, B, B] logits/attn residuals into
    # [n_chunks, c, H, B, B] HBM temps (3×3.8 GB at 1M nodes — the exact
    # round-3 OOM); recomputing one chunk's attention in the backward scan
    # costs two small einsums and keeps the peak bounded by one chunk
    @jax.checkpoint
    def one_chunk(args):
        qc, kc, vc, padc, keepc = args              # padc: [c, B]
        vmc = padc[:, None, :, None] * padc[:, None, None, :]
        logits = jnp.einsum(
            "chqd,chkd->chqk", qc, kc,
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(vmc > 0, logits, -1.0)
        mask = keepc[:, None].astype(jnp.float32) * vmc
        attn = masked_softmax(logits, mask)
        return jnp.einsum("chqk,chkd->chqd", attn.astype(cdt), vc,
                          preferred_element_type=jnp.float32)

    out = _ceil_chunked_map(one_chunk, (q, k, v, node_pad, keep), nb,
                            chunk)
    out = out.transpose(0, 2, 1, 3).reshape(nb, b, d)
    out = jnp.einsum("nbd,de->nbe", out, p["wo"],
                     preferred_element_type=jnp.float32)
    return out * node_pad[..., None]


def _use_fused_attn(cfg, b, d):
    return cfg.fused_gate_attn == "always" or (
        cfg.fused_gate_attn == "auto"
        and jax.default_backend() == "tpu"
        and d % 128 == 0 and b % 8 == 0)


# blocks-per-program bound for the big-graph chunked paths below. At
# 10M nodes (39,062 blocks) the full-width inter-sublayer temps (LN
# outputs, attention out, gelu hidden at 2.4-9.5 GB each) cannot all be
# live next to the 4.8 GB edge tables in 15.75 GB of HBM; under the
# bound each temp is <=0.5 GB while every chunk's matmul keeps >=100k
# rows (MXU-sized). Tests monkeypatch this to force the chunked route
# on small graphs.
_CHUNK_NB = 4096


def _ceil_chunked_map(f, args, nb, chunk):
    """Chunked map over the leading block axis in ceil(nb/chunk) steps.

    Replaces the old largest-divisor rule, which silently serialized
    when nB had no divisor near the chunk bound (nB prime -> chunk 1 ->
    nB unit-sized lax.map steps at exactly the 10M-node scale this path
    targets). A non-divisible nb is handled by CLAMPING the last
    chunk's start to nb - c (it re-processes up to c-1 overlap blocks):
    bodies here are block-local, so the overlap rows recompute the same
    values and the dynamic_update_slice chain keeps exactly one
    contribution per row in both the forward and the VJP (the
    overwritten window's cotangent is zeroed by the later update).

    Zero-copy by construction: a lax.scan body dynamic-slices the FULL
    input arrays — the pad-with-zeros variant this replaces
    concatenated full padded COPIES of every operand, which at 10M
    nodes put a second 4.77 GB wdense (plus padded x copies) next to
    the originals and OOMed the train step."""
    c = min(chunk, nb)
    n_chunks = -(-nb // c)
    if n_chunks == 1:
        return f(args)
    starts = jnp.asarray(
        [min(i * c, nb - c) for i in range(n_chunks)], jnp.int32)
    out_struct = jax.eval_shape(f, jax.tree.map(
        lambda t: jax.ShapeDtypeStruct((c, *t.shape[1:]), t.dtype), args))
    buf0 = jax.tree.map(
        lambda s: jnp.zeros((nb, *s.shape[1:]), s.dtype), out_struct)

    # checkpoint the SLICING together with the body, with `args` closed
    # over: the scan VJP then saves only the per-iteration `start`
    # scalar and re-slices from the (loop-invariant) full arrays on the
    # backward pass. Slicing inside the scanned body proper would make
    # each iteration's sliced operands scan residuals — stacked back to
    # a full-size copy of every input (a second 5 GB wdense at 10M).
    @jax.checkpoint
    def chunk_out(start):
        sl = jax.tree.map(
            lambda t: jax.lax.dynamic_slice_in_dim(t, start, c, 0), args)
        return f(sl)

    def body(buf, start):
        buf = jax.tree.map(
            lambda b, o: jax.lax.dynamic_update_slice_in_dim(
                b, o, start, 0), buf, chunk_out(start))
        return buf, None

    buf, _ = jax.lax.scan(body, buf0, starts)
    return buf


def _ffn_apply(p, h2, pad, out_dtype):
    """Pre-norm FFN, chunked over blocks when nB is large: the [nB, B,
    ffn_mult*D] gelu hidden is 9.5 GB (bf16) at 10M nodes — chunking
    bounds it to ~1 GB while each chunk's matmul stays MXU-sized
    (>=100k rows). Small nB (tests, <=_CHUNK_NB blocks) takes the
    straight path; both are numerically identical (same ops, same
    order)."""
    nb = h2.shape[0]

    def f(hh, pp):
        mid = jax.nn.gelu(linear_apply(p["ffn_in"], hh)).astype(out_dtype)
        # pad is 0/1 — exact in any dtype; an f32 pad would promote the
        # whole product (and the residual stream) back to f32
        return (linear_apply(p["ffn_out"], mid).astype(out_dtype)
                * pp[..., None].astype(out_dtype))

    if nb <= _CHUNK_NB:
        return f(h2, pad)
    return _ceil_chunked_map(lambda args: f(*args), (h2, pad), nb,
                             _CHUNK_NB)


def _layer_body_halo_free(cfg, p, x, keep_p, pad, wdense):
    """The XLA sublayer composition of one gated layer on a HALO-FREE
    graph (local table == block, so neighbor mix is one block-local
    einsum). This is the fused-layer kernel's reference semantics AND
    its backward recompute path: straight below _CHUNK_NB blocks,
    checkpointed ceil-chunked above (bounding the inter-sublayer temps
    exactly as before)."""
    dt = x.dtype
    nb = x.shape[0]
    cbf = cfg.compute_dtype == "bfloat16"
    A, Wvo = fold_gated_attention_params(p, cfg)

    def body(xc, kc, pc, wc):
        hc = layer_norm_apply(p["ln1"], xc).astype(dt)
        if _use_fused_attn(cfg, xc.shape[1], xc.shape[-1]):
            xc = xc + gated_block_attention(hc, kc, pc, A, Wvo,
                                            compute_bf16=cbf)
        else:
            xc = xc + _attention_with_keep(
                hc, pc, unpack_keep(kc, xc.shape[1]), p, cfg,
                512).astype(dt)
        gc = layer_norm_apply(p["ln_g"], xc).astype(dt)
        aggc = jnp.einsum(
            "nbt,ntd->nbd", wc.astype(dt), gc,
            preferred_element_type=jnp.float32).astype(dt)
        xc = xc + (linear_apply(p["w_gnn"], aggc).astype(dt)
                   * pc[..., None].astype(dt))
        h2c = layer_norm_apply(p["ln2"], xc).astype(dt)
        return xc + _ffn_apply(p, h2c, pc, dt)

    if nb <= _CHUNK_NB:
        return body(x, keep_p, pad, wdense)
    # checkpoint per chunk: the scan VJP would otherwise stack every
    # body intermediate (incl. the [c, B, 4D] gelu hidden) back to full
    # width — exactly the temps chunking removes.
    ck = jax.checkpoint(lambda args: body(*args))
    return _ceil_chunked_map(ck, (x, keep_p, pad, wdense), nb, _CHUNK_NB)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_layer_halo_free(cfg, p, x, keep_p, pad, wdense):
    """One-kernel gated layer forward (ops/pallas/gated_block_layer):
    LN1 + gated MHA + LN_g + neighbor mix + LN2 + FFN in a single
    Pallas pass — no inter-sublayer HBM tensor, no chunked lax.map at
    10M nodes. Backward recomputes through _layer_body_halo_free (the
    fused-attention custom_vjp inside keeps it flash-style), so
    training memory equals the round-4 path."""
    from ruvector_tpu.ops.pallas.gated_block_layer import (
        fold_gated_layer_params,
        gated_block_layer,
    )

    folded = fold_gated_layer_params(p, cfg)
    return gated_block_layer(x, keep_p, pad, wdense, folded,
                             compute_bf16=cfg.compute_dtype == "bfloat16")


def _fused_layer_fwd(cfg, p, x, keep_p, pad, wdense):
    return _fused_layer_halo_free(cfg, p, x, keep_p, pad, wdense), (
        p, x, keep_p, pad, wdense)


def _fused_layer_bwd(cfg, res, g):
    import numpy as np

    p, x, keep_p, pad, wdense = res
    # wdense is DATA (the graph), not a parameter: differentiating wrt
    # it makes the vjp treat the 4.77 GB (10M-node) edge table as a
    # primal residual inside the train scan — XLA then materializes a
    # full copy per loop body plus the d_wdense accumulator, which is
    # exactly the 10M OOM. Zero cotangent matches the gate/pad stance
    # (the reference's graph is likewise not trained through).
    _, vjp = jax.vjp(
        lambda p_, x_: _layer_body_halo_free(
            cfg, p_, x_, keep_p, pad, wdense), p, x)
    dp, dx = vjp(g.astype(x.dtype))
    return (dp, dx, np.zeros(keep_p.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(pad), jnp.zeros_like(wdense))


_fused_layer_halo_free.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def _use_fused_layer(cfg, bdg, d):
    """Whole-layer fusion requires every sublayer to be block-local:
    halo-free graphs only (tests monkeypatch this to drive the XLA
    sublayer routes)."""
    return bdg.table == bdg.block


# flip to drive the step through the standalone signature pass (parity
# tests compare both routes)
_FUSE_NEXT_SIG = True


def _layer_with_keep_emit_sig(p, p_next, cfg, x, bdg, keep_p):
    """Fused layer + the NEXT layer's gate signature in one kernel pass
    (step path only — forward-only, never differentiated). Mirrors the
    fused branch of _layer_with_keep; returns (out, sig_next [nB])."""
    from ruvector_tpu.ops.pallas.gated_block_layer import (
        fold_gated_layer_params,
        gated_block_layer_with_sig,
    )

    wd = bdg.wdense
    if cfg.compute_dtype == "bfloat16" and wd.dtype != jnp.bfloat16:
        wd = wd.astype(jnp.bfloat16)
    folded = fold_gated_layer_params(p, cfg)
    A_sig_next = _fold_sig_params(p_next, cfg)
    nb = x.shape[0]

    def run(xc, kc, pc, wc):
        return gated_block_layer_with_sig(
            xc, kc, pc, wc, folded, A_sig_next,
            p_next["ln1"]["gamma"], p_next["ln1"]["beta"],
            compute_bf16=cfg.compute_dtype == "bfloat16", sig_eps=cfg.eps)

    if nb <= _CHUNK_NB:
        out, rsum, rcnt = run(x, keep_p, bdg.node_pad, wd)
    else:
        # 10M-scale: the signature is block-local, so the chunked route
        # emits it per chunk exactly like the straight kernel
        out, rsum, rcnt = _ceil_chunked_map(
            lambda a: run(a[0], a[1], a[2], a[3]),
            (x, keep_p, bdg.node_pad, wd), nb, _CHUNK_NB)
    sig = jnp.sum(rsum, axis=1) / jnp.maximum(jnp.sum(rcnt, axis=1), 1.0)
    return out, sig


def _layer_with_keep(p, cfg, x, bdg, keep_p, attn_chunk=512, fused=False):
    """keep_p: BIT-PACKED gate masks [nB, ceil(B/32), B] uint32
    (pack_keep). The fused kernel unpacks per block in VMEM; the XLA
    fallback unpacks here (test shapes only — at scale the fused path
    is what runs, and the [nB, B, B] bool never exists in HBM).

    Every materialized tensor stays in x.dtype: layer_norm_apply
    promotes bf16 inputs to f32 (f32 gamma/beta), which at 10M nodes is
    a 4.77 GB temp PER LN — the .astype folds the cast into the LN
    fusion so the f32 tensor never reaches HBM (f32 inputs: no-op)."""
    pad = bdg.node_pad
    dt = x.dtype
    nb = x.shape[0]
    use_fused = fused and _use_fused_attn(cfg, bdg.block, x.shape[-1])
    if use_fused and _use_fused_layer(cfg, bdg, x.shape[-1]):
        # halo-free: the WHOLE layer runs as one Pallas kernel. In bf16
        # compute mode the kernel casts wdense to bf16 in VMEM anyway —
        # pre-casting it halves the kernel's HBM edge-table read
        # (1.02 GB/layer f32 at 1M; XLA CSEs the cast across layers)
        wd = bdg.wdense
        if cfg.compute_dtype == "bfloat16" and wd.dtype != jnp.bfloat16:
            wd = wd.astype(jnp.bfloat16)
        if nb <= _CHUNK_NB:
            return _fused_layer_halo_free(cfg, p, x, keep_p, pad, wd)
        # >_CHUNK_NB (10M nodes): the same kernel, driven through the
        # checkpointed ceil-chunked map. The forward is still all-kernel
        # (a scan of ~10 grid launches == one big grid); the point is
        # the TRAIN backward: carried at full width, the custom_vjp's
        # residual tuple made XLA materialize a second 4.77 GB wdense
        # copy inside the train scan (the r5 10M OOM) — chunked, each
        # chunk's residuals are re-sliced from loop-invariant closures
        # and the transient is one 0.5 GB chunk.
        return _ceil_chunked_map(
            lambda a: _fused_layer_halo_free(cfg, p, a[0], a[1], a[2],
                                             a[3]),
            (x, keep_p, pad, wd), nb, _CHUNK_NB)
    if use_fused and bdg.table == bdg.block:
        # halo-free but fused-layer kernel disabled (monkeypatched in
        # tests / future non-kernel configs): the XLA composition,
        # ceil-chunked above _CHUNK_NB blocks to bound the
        # inter-sublayer temps (the unchunked layer peaks ~15 GB at 10M
        # nodes next to the persistent edge tables and OOMs)
        return _layer_body_halo_free(cfg, p, x, keep_p, pad, bdg.wdense)
    h = layer_norm_apply(p["ln1"], x).astype(dt)
    if use_fused:
        A, Wvo = fold_gated_attention_params(p, cfg)
        x = x + gated_block_attention(
            h, keep_p, pad, A, Wvo,
            compute_bf16=cfg.compute_dtype == "bfloat16")
    else:
        keep = unpack_keep(keep_p, bdg.block)
        # .astype(dt): _attention_with_keep returns f32 — without the
        # cast a bf16 residual stream silently promotes to f32 here,
        # violating the keep-x.dtype invariant the fused branch pins
        x = x + _attention_with_keep(
            h, pad, keep, p, cfg, attn_chunk).astype(dt)
    g = layer_norm_apply(p["ln_g"], x).astype(dt)
    x = x + (_neighbor_mix(g, bdg, p["w_gnn"]).astype(dt)
             * pad[..., None].astype(dt))
    h2 = layer_norm_apply(p["ln2"], x).astype(dt)
    x = x + _ffn_apply(p, h2, pad, dt)
    return x


def check_gate_age_feasibility(cfg: GatedGraphTransformerConfig, nb: int,
                               max_resolve: int | None = None) -> bool:
    """The hard staleness bound (max_gate_age) holds under saturating
    drift only when nB <= 2 * budget * max_gate_age (the escalation
    pass doubles the per-step budget on bound-threatening steps;
    GATE_STALENESS_r04 measured the bound at exactly this edge). A
    config outside the window silently CANNOT honor its bound, and
    max_gate_age=0 (the default, pure-hysteresis reference semantics)
    bounds nothing at all. Returns True when the bound is enforceable;
    warns and returns False otherwise (VERDICT r4 #9)."""
    import warnings

    if cfg.max_gate_age <= 0:
        return False          # reference hysteresis: unbounded by design
    budget = max_resolve if max_resolve is not None else max(
        1, int(nb * cfg.max_resolve_frac))
    if nb > 2 * budget * cfg.max_gate_age:
        warnings.warn(
            f"gate staleness bound INFEASIBLE: nB={nb} > 2*budget"
            f"({budget})*max_gate_age({cfg.max_gate_age}) — under "
            f"saturating drift the realized mask age can exceed the "
            f"bound. Raise max_resolve_frac to >= "
            f"{1 / (2 * cfg.max_gate_age):.4f} "
            f"(budget >= {-(-nb // (2 * cfg.max_gate_age))}) or "
            f"max_gate_age to >= {-(-nb // (2 * budget))}.",
            stacklevel=3)
        return False
    return True


def gate_state_init(params, cfg: GatedGraphTransformerConfig, fpad, bdg):
    """Solve every partition's gate once (chunked lax.map to bound the
    [c, B, B] push-relabel buffers) and record the signatures. Returns
    {"keep": [L, nB, ceil(B/32), B] uint32 (bit-packed, pack_keep),
    "sig": [L, nB] f32, "age": [L, nB] i32}."""
    if cfg.gate_mode != "pooled":
        raise ValueError(
            "temporal gate reuse operates on the pooled (head-mean) gate "
            "granularity — gating.rs's single-matrix semantics; use the "
            "stateless apply for per_head mode")
    nb, b = bdg.n_blocks, bdg.block
    check_gate_age_feasibility(cfg, nb)
    x = fpad.reshape(nb, b, -1)
    fused = _use_fused_attn(cfg, b, x.shape[-1])
    gate_kernel = fused and b % 32 == 0
    keeps, sigs = [], []
    for p in params:
        A_sig = _fold_sig_params(p, cfg)
        if gate_kernel:
            # VMEM-resident push-relabel kernel: LN1 + pooled logits +
            # solve + bit-pack per block, nothing intermediate in HBM;
            # the grid streams all nB blocks (no chunking needed), and
            # each block exits its while_loop when ITS solve converges
            # (the vmap path lock-stepped every chunk to its slowest
            # partition). SAME function as the step's solve path, so
            # budget-capped re-solves reproduce init masks exactly.
            keep = _solve_gates_kernel(x, bdg.node_pad, A_sig, p, cfg)
            keeps.append(keep)
            sigs.append(_signature_from_x(x, p, A_sig, bdg.node_pad, cfg))
        else:
            h = layer_norm_apply(p["ln1"], x).astype(x.dtype)
            # pooled logits are (re)built per chunk inside the map body
            # — the full [nB, B, B] tensor never exists in HBM; packing
            # INSIDE the chunked map keeps the bool mask out of HBM too
            # (at 10M nodes it is 5.1 GB; packed it is 0.16)
            keep = _ceil_chunked_map(
                lambda args: pack_keep(jax.vmap(
                    lambda m: mincut_gate_device(m, cfg.lam, cfg.eps)[0])(
                    _pooled_from_x(args[0], args[1], A_sig))),
                (h, bdg.node_pad), nb, cfg.gate_chunk)
            keeps.append(keep)
            if fused:
                sigs.append(_signature_fused_x(h, A_sig, bdg.node_pad,
                                               cfg))
            else:
                sigs.append(_gate_signature(
                    _pooled_from_x(h, bdg.node_pad, A_sig), cfg.eps))
        x = _layer_with_keep(p, cfg, x, bdg, keep, fused=True)
    if cfg.max_gate_age > 0:
        # stagger initial ages: synchronized age-0 masks would all hit
        # the hard bound on the SAME step, and the escalated budget
        # (2x per step) then needs a full rotation to clear the backlog
        # — the realized age would overshoot the bound ~1.5-2x during
        # that transient. Staggering pre-mixes the refresh waves
        # (nb/max_gate_age partitions reach the bound per step), so the
        # bound holds from step 1 whenever nb <= 2*budget*max_gate_age.
        # Cost: partitions refresh EARLIER than strictly needed at the
        # start (masks are freshly solved) — extra solves, never staler.
        age0 = jnp.tile(
            jnp.arange(nb, dtype=jnp.int32) % cfg.max_gate_age,
            (len(params), 1))
    else:
        age0 = jnp.zeros((len(params), nb), jnp.int32)
    return {"keep": jnp.stack(keeps), "sig": jnp.stack(sigs),
            "age": age0}


def gated_graph_transformer_step(
    params, cfg: GatedGraphTransformerConfig, fpad, bdg, state,
    max_resolve: int | None = None,
):
    """Forward with temporal gate reuse. Returns (out, new_state, n_resolved).

    Per layer: compute the pooled-logit signature (one einsum), flag
    partitions whose signature drifted past the hysteresis band, re-solve
    the top-`max_resolve` drifted gates as ONE batched device program
    (gather -> vmap push-relabel -> scatter), and run the layer under the
    refreshed masks. Un-drifted partitions reuse their stored mask —
    the reference's hysteresis semantics (gating.rs hysteresis band).
    """
    nb, b = bdg.n_blocks, bdg.block
    if max_resolve is None:
        max_resolve = max(1, int(nb * cfg.max_resolve_frac))
    max_resolve = min(max_resolve, nb)
    check_gate_age_feasibility(cfg, nb, max_resolve)
    x = fpad.reshape(nb, b, -1)
    new_keep, new_sig, new_age = [], [], []
    resolved = jnp.zeros((), jnp.int32)
    # age defaults cover pre-round-4 states (pure-hysteresis semantics)
    ages = state.get("age", jnp.zeros((len(params), nb), jnp.int32))
    fused = _use_fused_attn(cfg, b, x.shape[-1])
    gate_kernel = fused and b % 32 == 0
    # layer li's fused kernel can emit layer li+1's signature while the
    # output is still in VMEM (bitwise-equal to _signature_from_x on the
    # written stream) — the standalone signature pass, a full [nB, B, D]
    # HBM re-read per layer per step, then only runs for layer 0
    emit_sig = (_FUSE_NEXT_SIG and gate_kernel
                and _use_fused_layer(cfg, bdg, x.shape[-1]))
    carried_sig = None
    for li, p in enumerate(params):
        A_sig = _fold_sig_params(p, cfg)
        if gate_kernel:
            # LN1 folded into the signature and solve kernels: the
            # normalized [nB, B, D] tensor never exists in HBM
            if carried_sig is not None:
                sig = carried_sig
            else:
                sig = _signature_from_x(x, p, A_sig, bdg.node_pad, cfg)

            def solve_masks(idx, p=p, A_sig=A_sig, x=x):
                return _solve_gates_kernel(
                    jnp.take(x, idx, axis=0),
                    jnp.take(bdg.node_pad, idx, axis=0), A_sig, p, cfg)
        else:
            h = layer_norm_apply(p["ln1"], x).astype(x.dtype)
            if fused:
                sig = _signature_fused_x(h, A_sig, bdg.node_pad, cfg)
            else:
                sig = _gate_signature(
                    _pooled_from_x(h, bdg.node_pad, A_sig), cfg.eps)

            def solve_masks(idx, h=h, A_sig=A_sig):
                # pooled logits only for the selected partitions — the
                # full [nB, B, B] tensor is never materialized
                sub = _pooled_from_x(
                    jnp.take(h, idx, axis=0),
                    jnp.take(bdg.node_pad, idx, axis=0), A_sig)
                return pack_keep(jax.vmap(
                    lambda m: mincut_gate_device(m, cfg.lam,
                                                 cfg.eps)[0])(sub))
        prev_sig = state["sig"][li]
        drift = jnp.abs(sig - prev_sig)
        flagged = drift > cfg.hysteresis_band * (jnp.abs(prev_sig) + 1e-6)
        age = ages[li] + 1
        if cfg.max_gate_age > 0:
            # hard staleness bound: refresh even without signature drift
            flagged = flagged | (age >= cfg.max_gate_age)

        def solve(keep_prev, sig_prev, age):
            # oldest-first among flagged partitions: a persistently-
            # drifted partition cannot starve behind louder ones, so
            # deferred staleness is bounded by ceil(flagged/budget) steps
            score = jnp.where(flagged,
                              age.astype(jnp.float32) * 1e6 + drift, -1.0)
            _, idx = jax.lax.top_k(score, max_resolve)
            sel = jnp.take(flagged, idx)                   # [k] bool
            keep_k = solve_masks(idx)
            old_k = jnp.take(keep_prev, idx, axis=0)
            keep_k = jnp.where(sel[:, None, None], keep_k, old_k)
            keep_l = keep_prev.at[idx].set(keep_k)
            sig_l = sig_prev.at[idx].set(
                jnp.where(sel, jnp.take(sig, idx), jnp.take(sig_prev, idx)))
            age_l = age.at[idx].set(
                jnp.where(sel, 0, jnp.take(age, idx)))
            return keep_l, sig_l, age_l, jnp.sum(sel.astype(jnp.int32))

        def reuse(keep_prev, sig_prev, age):
            return keep_prev, sig_prev, age, jnp.zeros((), jnp.int32)

        # zero drift -> skip the whole batched push-relabel program
        # (round 3 ran it unconditionally: the steady-state forward paid
        # a full max_resolve-partition solve per layer for nothing)
        keep_l, sig_l, age_l, nres = jax.lax.cond(
            jnp.any(flagged), solve, reuse,
            state["keep"][li], prev_sig, age)
        resolved = resolved + nres
        if cfg.max_gate_age > 0:
            # BUDGET ESCALATION: partitions still at/over the age bound
            # after the primary budget get a second budget-sized batched
            # solve (oldest first). Per-step gate cost is then at most
            # 2x budget, paid only on bound-threatening steps, and the
            # bound holds whenever flagged arrivals <= 2*budget*bound
            # per bound-window (the steady worst case: every partition
            # re-flagging every step with nB <= 2*budget*bound).
            overflow = age_l >= cfg.max_gate_age

            def solve_over(keep_prev, sig_prev, age_o):
                score = jnp.where(
                    overflow, age_o.astype(jnp.float32) * 1e6 + drift,
                    -1.0)
                _, idx = jax.lax.top_k(score, max_resolve)
                sel = jnp.take(overflow, idx)
                keep_k = solve_masks(idx)
                old_k = jnp.take(keep_prev, idx, axis=0)
                keep_k = jnp.where(sel[:, None, None], keep_k, old_k)
                keep_o = keep_prev.at[idx].set(keep_k)
                sig_o = sig_prev.at[idx].set(
                    jnp.where(sel, jnp.take(sig, idx),
                              jnp.take(sig_prev, idx)))
                age_n = age_o.at[idx].set(
                    jnp.where(sel, 0, jnp.take(age_o, idx)))
                return keep_o, sig_o, age_n, jnp.sum(sel.astype(jnp.int32))

            keep_l, sig_l, age_l, nres2 = jax.lax.cond(
                jnp.any(overflow), solve_over, reuse,
                keep_l, sig_l, age_l)
            resolved = resolved + nres2
        new_keep.append(keep_l)
        new_sig.append(sig_l)
        new_age.append(age_l)
        if emit_sig and li + 1 < len(params):
            x, carried_sig = _layer_with_keep_emit_sig(
                p, params[li + 1], cfg, x, bdg, keep_l)
        else:
            carried_sig = None
            x = _layer_with_keep(p, cfg, x, bdg, keep_l, fused=True)
    new_state = {"keep": jnp.stack(new_keep), "sig": jnp.stack(new_sig),
                 "age": jnp.stack(new_age)}
    return x.reshape(nb * b, -1), new_state, resolved


def gated_graph_transformer_apply_with_masks(
    params, cfg: GatedGraphTransformerConfig, fpad, bdg, keep_masks,
):
    """Differentiable forward under FIXED bit-packed gate masks
    ([L, nB, ceil(B/32), B] uint32 from the gate state). No push-relabel
    anywhere — safe to grad at 1M."""
    nb, b = bdg.n_blocks, bdg.block
    x = fpad.reshape(nb, b, -1)

    def layer(p, x, keep):
        return _layer_with_keep(p, cfg, x, bdg,
                                jax.lax.stop_gradient(keep), fused=True)

    if cfg.remat:
        layer = jax.checkpoint(layer)
    for li, p in enumerate(params):
        x = layer(p, x, keep_masks[li])
    return x.reshape(nb * b, -1)


def _loss_chunked_halo_free(params, cfg, x, pad, wdense, keep_masks,
                            tgt):
    """Whole-model chunked loss for halo-free big graphs: every sublayer
    (and therefore the WHOLE L-layer network and the loss reduction) is
    block-local, so the model runs end-to-end per block-chunk. Peak HBM
    is one chunk's activations instead of L+1 full-width streams plus
    the loss temp (the 10M train OOMed ~4 GB over budget with full-width
    buffers even under remat). The scan body is checkpointed with every
    big array closed over, so backward residuals are the per-chunk start
    indices; dp accumulates across chunks in the scan vjp."""
    nb = x.shape[0]
    c = min(_CHUNK_NB, nb)
    n_chunks = -(-nb // c)
    starts = jnp.asarray(
        [min(i * c, nb - c) for i in range(n_chunks)], jnp.int32)
    raw = jnp.asarray([i * c for i in range(n_chunks)], jnp.int32)

    @jax.checkpoint
    def chunk_sums(start, raw_start):
        sl = lambda t: jax.lax.dynamic_slice_in_dim(t, start, c, 0)  # noqa: E731
        xc, pc, wc, tc = sl(x), sl(pad), sl(wdense), sl(tgt)
        # rows already covered by an earlier chunk (the clamped last
        # chunk overlaps) contribute zero
        fresh = (start + jnp.arange(c, dtype=jnp.int32)
                 >= raw_start).astype(jnp.float32)
        for li, p in enumerate(params):
            kc = jax.lax.dynamic_slice_in_dim(keep_masks[li], start, c, 0)
            xc = _fused_layer_halo_free(
                cfg, p, xc, jax.lax.stop_gradient(kc), pc, wc)
        err = ((xc - tc).astype(jnp.float32)
               * pc[..., None] * fresh[:, None, None])
        return (jnp.sum(err * err),
                jnp.sum(pc * fresh[:, None]))

    def body(carry, st):
        es, ps = chunk_sums(st[0], st[1])
        return (carry[0] + es, carry[1] + ps), None

    (err_sum, pad_sum), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        (starts, raw))
    return err_sum / jnp.maximum(pad_sum, 1.0)


@functools.partial(jax.jit, static_argnums=(1,))
def gated_graph_transformer_loss_with_masks(
    params, cfg, fpad, bdg, keep_masks, targets,
):
    nb, b = bdg.n_blocks, bdg.block
    if (nb > _CHUNK_NB and _use_fused_attn(cfg, b, cfg.dim)
            and _use_fused_layer(cfg, bdg, cfg.dim)):
        return _loss_chunked_halo_free(
            params, cfg, fpad.reshape(nb, b, -1), bdg.node_pad,
            bdg.wdense, keep_masks, targets.reshape(nb, b, -1))
    out = gated_graph_transformer_apply_with_masks(
        params, cfg, fpad, bdg, keep_masks)
    pad = bdg.node_pad.reshape(-1, 1)
    err = (out - targets) * pad
    return jnp.sum(err * err) / jnp.maximum(jnp.sum(pad), 1.0)
