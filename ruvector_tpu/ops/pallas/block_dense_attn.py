"""Fused block-dense neighbor attention — the Pallas kernel that wins at M=16.

Round-1 finding (DESIGN_NOTES): at the production shape [100k nodes,
M=16, D=128] the slot path is gather-bound (~1 row/edge, 444M rows/s)
and the XLA block-dense path is bound by materializing the per-block
score tensor in HBM between the SDDMM and the aggregation matmul
(~1.8GB of HBM traffic per layer at B=T=512, f32). This kernel removes
that traffic: each (block, node-tile) grid step stages the block's
local message table L [T, D] in VMEM once and runs

    SDDMM (u_h @ L^T)  ->  masked eps-guarded softmax  ->
    attn_h @ L (per head)  and  wd @ L (weighted-mean head)

entirely on-chip; scores never touch HBM.

Layout is HEAD-MAJOR ([H, nB, B, D] / [H+1, nB, B, D]) and the head loop
is unrolled in-kernel, so every tensor op is a well-tiled 2-D [Bt, T] /
[Bt, D] op — no (B, H, T) relayouts and no 5-sublane-padded writes (the
v1 node-major layout lost ~35% to both; see DESIGN_NOTES round 2).

Semantics pinned to the reference layer (ruvector-gnn/src/layer.rs:
379-457): eps-guarded masked softmax (:195-199 via ops/segment), edge
mask = wdense > 0 (zero-weight real edges carry tiny eps), duplicate-
slot multiplicity via additive log_mult, degree-0 rows handled by the
caller's isolated-node short-circuit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(heads: int, scale: float, with_lm: bool):
    def kernel(L_ref, u_ref, sb_ref, wd_ref, *rest):
        if with_lm:
            lm_ref, out_ref = rest
        else:
            (out_ref,) = rest
        L = L_ref[0]                               # [T, D]
        wd = wd_ref[0]                             # [Bt, T]
        # compare in f32: v5e has no native bf16 vector compare
        edge = wd.astype(jnp.float32) > 0
        lm = lm_ref[0].astype(jnp.float32) if with_lm else None
        cdt = L.dtype

        for h in range(heads):
            s = jax.lax.dot_general(
                u_ref[h, 0], L,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # [Bt, T]
            s = s * scale + sb_ref[h, 0].astype(jnp.float32)
            if lm is not None:
                s = s + lm
            s = jnp.where(edge, s, -1e30)
            smax = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - jnp.maximum(smax, -1e30))
            p = jnp.where(edge, p, 0.0)
            attn = p / jnp.maximum(
                jnp.sum(p, axis=-1, keepdims=True), 1e-10)
            out_ref[h, 0] = jax.lax.dot_general(
                attn.astype(cdt), L,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[heads, 0] = jax.lax.dot_general(
            wd.astype(cdt), L,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "tile"))
def block_dense_attention(L, u, sb, wd, lm=None, *, scale: float,
                          tile: int = 256):
    """Fused SDDMM + masked softmax + (H+1)-way aggregate over local tables.

    L:  [nB, T, D]     block-local message tables (bf16 or f32)
    u:  [H, nB, B, D]  folded per-node query rows, HEAD-MAJOR
    sb: [H, nB, B]     additive score bias  <q_h(i), b_k_h>
        (reshaped internally to [H, nB, B, 1] — Mosaic requires the last
        two block dims to be tileable, so the bias rides a unit lane dim)
    wd: [nB, B, T]     normalized edge weights (0 = no edge)
    lm: [nB, B, T]     optional additive log-multiplicity
    returns mixed [H+1, nB, B, D] float32: per-head attention values,
    then the weighted-mean head.
    """
    h, nb, b, d = u.shape
    t = L.shape[1]
    bt = min(tile, b)
    assert b % bt == 0, (b, bt)

    in_specs = [
        pl.BlockSpec((1, t, d), lambda k, i: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1, bt, d), lambda k, i: (0, k, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1, bt, 1), lambda k, i: (0, k, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, t), lambda k, i: (k, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [L, u, sb[..., None], wd]
    if lm is not None:
        in_specs.append(pl.BlockSpec((1, bt, t), lambda k, i: (k, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(lm)

    flops = 2 * nb * b * (2 * h + 1) * t * d
    bytes_accessed = (L.size * L.dtype.itemsize
                      + u.size * u.dtype.itemsize
                      + wd.size * wd.dtype.itemsize
                      + (h + 1) * nb * b * d * 4)
    return pl.pallas_call(
        _make_kernel(h, scale, lm is not None),
        grid=(nb, b // bt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((h + 1, 1, bt, d), lambda k, i: (0, k, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h + 1, nb, b, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=nb * b * h * t),
        interpret=jax.default_backend() != "tpu",
    )(*args)


# ---------------------------------------------------------------------------
# Fully-fused layer kernel: attention + out-proj + aggregate + GRU + LN in
# one pass. The [H+1, nB, B, D] mixed tensor never exists; per layer the
# kernel reads L (+msg f32, wd) and writes only the [nB, B, D] output.
#
# Key algebraic folds (all exact):
#   u_h(i)  = msg_i @ A_h + c_h          A_h = Wq_h Wk_h^T,  c_h = bq_h Wk_h^T
#   sb_h(i) = msg_i @ wsb_h + ssb_h      wsb_h = Wq_h bk_h,  ssb_h = <bq_h, bk_h>
#   attn_out = sum_h tv_h @ Wvo_h + 1[deg>0] * bvo + bout
#              Wvo_h = wv_h Wout[h*hd:(h+1)*hd, :],  bvo = bv_flat @ Wout
# so the folded-query tensor u ([H, N, D]) and the per-head value concat
# are never materialized in HBM either (they were 1.1ms/layer of XLA passes).
# ---------------------------------------------------------------------------


def _make_fused_kernel(heads: int, scale: float, dropout: float, eps: float,
                       with_lm: bool):
    def kernel(L_ref, msg_ref, wd_ref,
               A_ref, c_ref,
               Wvo_ref, bvo_ref, bout_ref, Wagg_ref, bagg_ref,
               w3_ref, b3_ref, u2_ref, ub2_ref, uhk_ref, uhb_ref,
               gam_ref, bet_ref, *rest):
        if with_lm:
            lm_ref, out_ref = rest
        else:
            (out_ref,) = rest
        L = L_ref[0]                                  # [T, D] cdt
        # msg may arrive bf16 (large-scale IO mode); GRU/LN math runs f32
        M = msg_ref[0].astype(jnp.float32)            # [Bt, D]
        wd = wd_ref[0]                                # [Bt, T]
        d = M.shape[1]
        cdt = L.dtype
        edge = wd.astype(jnp.float32) > 0
        lm = lm_ref[0].astype(jnp.float32) if with_lm else None

        f32 = jnp.float32
        attn_out = bout_ref[0]                        # [1, D] broadcasts
        # one explicit VMEM transpose instead of a (1),(1)-contracting
        # dot: current Mosaic rejects bf16 lhs matmuls that need an
        # implicit rhs transpose ("Bad lhs type")
        LT = L.T                                      # [D, T] cdt
        for h in range(heads):
            # A/c arrive PRE-SCALED by 1/sqrt(hd) (fold_layer_params), so
            # no per-score scale pass. The reference's <q_h(i), b_k_h> score
            # bias is row-constant and cancels in softmax — never computed.
            u = jax.lax.dot_general(
                M, A_ref[h], (((1,), (0,)), ((), ())),
                preferred_element_type=f32) + c_ref[h]
            s = jax.lax.dot_general(
                u.astype(cdt), LT, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)           # [Bt, T]
            if lm is not None:
                s = s + lm
            s = jnp.where(edge, s, -1e30)
            smax = jnp.max(s, axis=-1, keepdims=True)
            # exp(-1e30 - smax) underflows to exactly 0, so masked slots
            # drop out with no second mask pass; the softmax division is
            # linear, so it moves AFTER the [Bt, T] @ L matmul — a [Bt, D]
            # divide instead of [Bt, T] (eps-guard semantics unchanged).
            p = jnp.exp(s - jnp.maximum(smax, -1e30))
            denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-10)
            tv = jax.lax.dot_general(
                p.astype(cdt), L, (((1,), (0,)), ((), ())),
                preferred_element_type=f32) / denom   # [Bt, D]
            attn_out = attn_out + jax.lax.dot_general(
                tv, Wvo_ref[h], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
        wm = jax.lax.dot_general(
            wd.astype(cdt), L, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)               # [Bt, D]

        # deg > 0 <=> the wd row has any positive entry (real zero-weight
        # edges carry the eps floor, padding rows are all-zero) — deriving
        # it from the edge mask already in VMEM avoids a [nB, B, 1] HBM
        # operand whose unit lane dim tile-pads 128x (4.77 GB at 10M)
        has_any = (jnp.sum(edge.astype(f32), axis=-1, keepdims=True)
                   > 0).astype(f32)                    # [Bt, 1]
        attn_out = attn_out + has_any * bvo_ref[0]
        aggregated = jax.lax.dot_general(
            attn_out + wm, Wagg_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + bagg_ref[0]

        # GRU (nn/core.gru_apply semantics, layer.rs:255-275)
        wx = jax.lax.dot_general(
            aggregated, w3_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + b3_ref[0]   # [Bt, 3D]
        uh = jax.lax.dot_general(
            M, u2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + ub2_ref[0]  # [Bt, 2D]
        z = jax.nn.sigmoid(wx[:, :d] + uh[:, :d])
        r = jax.nn.sigmoid(wx[:, d:2 * d] + uh[:, d:])
        h_tilde = jnp.tanh(
            wx[:, 2 * d:] + jax.lax.dot_general(
                r * M, uhk_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=f32) + uhb_ref[0])
        updated = (1.0 - z) * M + z * h_tilde
        dropped = updated * (1.0 - dropout)

        def ln(x):
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + eps) * gam_ref[0] + bet_ref[0]

        out_ref[0] = jnp.where(has_any > 0, ln(dropped),
                               ln(M)).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "dropout", "eps",
                                             "tile"))
def block_dense_layer_fused(L, msgf, wd, folded, lm=None, *,
                            scale: float, dropout: float, eps: float,
                            tile: int = 256):
    """One-kernel RuvectorLayer epilogue-fused forward over local tables.

    L:      [nB, T, D]  local message tables (cdt)
    msgf:   [nB, B, D]  message rows (block-own rows). f32 for strict
            parity; bf16 IO is supported for HBM-constrained scales —
            GRU/LN math still runs in f32 in-kernel, only the buffer IO
            rounds. Output dtype follows msgf.
    wd:     [nB, B, T]  normalized edge weights (isolated-node
            short-circuit derives from all-zero rows in-kernel)
    folded: dict of folded parameter tensors (see fold_layer_params)
    returns [nB, B, D] f32 — the layer output (padded rows undefined-masked).
    """
    nb, b, d = msgf.shape
    t = L.shape[1]
    h = folded["A"].shape[0]
    bt = min(tile, b)
    assert b % bt == 0, (b, bt)

    def node3(k, i):
        return (k, i, 0)

    full = lambda k, i: (0, 0)          # noqa: E731
    full3 = lambda k, i: (0, 0, 0)      # noqa: E731

    in_specs = [
        pl.BlockSpec((1, t, d), lambda k, i: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, d), node3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, t), node3, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, d, d), full3, memory_space=pltpu.VMEM),    # A
        pl.BlockSpec((h, 1, d), full3, memory_space=pltpu.VMEM),    # c
        pl.BlockSpec((h, d, d), full3, memory_space=pltpu.VMEM),    # Wvo
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),        # bvo
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),        # bout
        pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM),        # Wagg
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),        # bagg
        pl.BlockSpec((d, 3 * d), full, memory_space=pltpu.VMEM),    # w3
        pl.BlockSpec((1, 3 * d), full, memory_space=pltpu.VMEM),    # b3
        pl.BlockSpec((d, 2 * d), full, memory_space=pltpu.VMEM),    # u2
        pl.BlockSpec((1, 2 * d), full, memory_space=pltpu.VMEM),    # ub2
        pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM),        # uhk
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),        # uhb
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),        # gamma
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),        # beta
    ]
    args = [L, msgf, wd,
            folded["A"], folded["c"],
            folded["Wvo"], folded["bvo"], folded["bout"], folded["Wagg"],
            folded["bagg"], folded["w3"], folded["b3"], folded["u2"],
            folded["ub2"], folded["uhk"], folded["uhb"], folded["gamma"],
            folded["beta"]]
    if lm is not None:
        in_specs.append(pl.BlockSpec((1, bt, t), node3,
                                     memory_space=pltpu.VMEM))
        args.append(lm)

    flops = 2 * nb * b * ((2 * h + 1) * t + (h + 2) * d + 7 * d) * d
    bytes_accessed = (L.size * L.dtype.itemsize + msgf.size * 4
                      + wd.size * wd.dtype.itemsize + nb * b * d * 4)
    return pl.pallas_call(
        _make_fused_kernel(h, scale, dropout, eps, lm is not None),
        grid=(nb, b // bt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bt, d), node3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, b, d), msgf.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=nb * b * (h * t + 3 * d)),
        interpret=jax.default_backend() != "tpu",
    )(*args)
