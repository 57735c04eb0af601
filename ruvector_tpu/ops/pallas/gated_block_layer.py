"""Fully-fused gated graph-transformer LAYER — one Pallas pass per block.

Round 4 closed the gated/ungated gap to 1.76x by fusing the gated MHA
(gated_block_attn.py); the per-sublayer profile (CONFIG5_PROFILE_r04)
then showed the remaining cost is everything OUTSIDE that kernel: the
three LayerNorms, the cross-partition neighbor mix and the FFN together
cost more than the attention itself because each is a separate XLA pass
that round-trips the [nB, B, D] stream through HBM (5 extra read+write
pairs per layer ~ 6.5 GB of traffic at 1M nodes f32).

On HALO-FREE graphs (bdg.table == bdg.block — the config-5 cluster
graphs, where cross-partition edges stay inside the 256-node block)
every sublayer is block-local, so the ENTIRE layer fuses into one
kernel. Per block it computes

    h  = LN1(x)
    x += gated-MHA(h)            (same math as gated_block_attn.py:
                                  (h A_h) h^T -> keep&pad-masked
                                  eps-guarded softmax -> @ (h Wvo_h))
    g  = LN_g(x);  x += (wdense @ g) @ W_gnn + b     (neighbor mix)
    h2 = LN2(x);   x += gelu(h2 @ Wi + bi) @ Wo + bo (pre-norm FFN)

entirely in VMEM: per layer the kernel reads x + the bit-packed gate
mask + the block's wdense tile and writes only the [nB, B, D] output —
no inter-sublayer tensor ever exists in HBM. This also deletes the
chunked lax.map the 10M-node forward needed (the full-width temps it
bounded are gone by construction).

Semantics: graph_transformer/gated.py _layer_with_keep's straight path
(ruvector-attn-mincut/src/gating.rs:70-102 gate mask before softmax;
layer.rs:379-457 aggregate; pre-norm FFN). f32 mode matches the XLA
composition to reassociation error (~1e-5); bf16 mode runs every MXU
operand in bf16 with f32 accumulation — the residual stream stays f32
IN-kernel (more accurate than the XLA path's per-sublayer bf16
rounding) and rounds once at the output.

The backward is NOT a kernel: graph_transformer/gated.py wraps this in
a custom_vjp whose bwd recomputes through the XLA composition (with the
fused-attention custom_vjp inside), so training memory/cost equals the
round-4 path while the forward takes the one-kernel fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ruvector_tpu.ops.pallas.gated_block_attn import (
    _unpack_bits,
    keep_words,
)


def _make_layer_kernel(heads: int, ln_eps: float, compute_bf16: bool,
                       sig_eps: float | None = None):
    def kernel(x_ref, keep_ref, pad_ref, wd_ref, A_ref, Wvo_ref,
               ln1g_ref, ln1b_ref, lngg_ref, lngb_ref, ln2g_ref, ln2b_ref,
               Wg_ref, bg_ref, Wi_ref, bi_ref, Wo_ref, bo_ref,
               *rest):
        if sig_eps is None:
            (out_ref,) = rest
        else:
            As_ref, sg_ref, sb_ref, out_ref, sig_ref = rest
        f32 = jnp.float32
        cdt = jnp.bfloat16 if compute_bf16 else f32
        x = x_ref[0].astype(f32)                       # [B, D]
        d = x.shape[1]
        pad_row = pad_ref[0].astype(f32)               # [1, B]
        pad = pad_row.T                                # [B, 1]
        valid = pad * pad_row
        keepb = _unpack_bits(keep_ref[0], x.shape[0]) & (valid > 0)

        def ln(v, g_row, b_row):
            mu = jnp.mean(v, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(v - mu), axis=-1, keepdims=True)
            return (v - mu) * jax.lax.rsqrt(var + ln_eps) * g_row + b_row

        # --- sublayer 1: gated MHA (gated_block_attn.py math) ---
        h = ln(x, ln1g_ref[0], ln1b_ref[0])
        hc = h.astype(cdt)
        hT = hc.T                                      # [D, B]
        q = jax.lax.dot_general(
            hc, A_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                # [B, H*D]
        y = jax.lax.dot_general(
            hc, Wvo_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                # [B, H*D]
        attn = jnp.zeros_like(x)
        for hh in range(heads):
            q_h = q[:, hh * d:(hh + 1) * d]
            y_h = y[:, hh * d:(hh + 1) * d]
            s = jax.lax.dot_general(
                q_h.astype(cdt), hT, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)            # [B, B]
            s = jnp.where(keepb, s, -1e30)
            smax = jnp.max(s, axis=-1, keepdims=True)
            # exp(-1e30 - smax) underflows to exactly 0 for masked
            # entries, so no [B, B] keepb multiply; rows with NO kept
            # entries (smax == -1e30 -> exp(0) == 1 everywhere) are
            # zeroed by the [B, 1] row-validity factor instead
            pu = jnp.exp(s - jnp.maximum(smax, -1e30))
            inv = jnp.where(smax > -1e29,
                            1.0 / jnp.maximum(
                                jnp.sum(pu, axis=-1, keepdims=True),
                                1e-10), 0.0)
            attn = attn + jax.lax.dot_general(
                pu.astype(cdt), y_h.astype(cdt), (((1,), (0,)), ((), ())),
                preferred_element_type=f32) * inv
        x = x + attn * pad

        # --- sublayer 2: cross-partition neighbor mix (halo-free:
        # the local table IS the block) ---
        g1 = ln(x, lngg_ref[0], lngb_ref[0])
        agg = jax.lax.dot_general(
            wd_ref[0].astype(cdt), g1.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                # [B, D]
        mix = jax.lax.dot_general(
            agg.astype(cdt), Wg_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + bg_ref[0]
        x = x + mix * pad

        # --- sublayer 3: pre-norm FFN ---
        h2 = ln(x, ln2g_ref[0], ln2b_ref[0])
        mid = jax.nn.gelu(jax.lax.dot_general(
            h2.astype(cdt), Wi_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + bi_ref[0])   # [B, FM*D]
        ff = jax.lax.dot_general(
            mid.astype(cdt), Wo_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + bo_ref[0]
        x = x + ff * pad
        out_ref[0] = x.astype(out_ref.dtype)

        if sig_eps is not None:
            # NEXT layer's gate signature from the output, while it is
            # still in VMEM — the separate block_gate_signature_ln_x
            # pass (a full [nB, B, D] HBM re-read per layer per step)
            # disappears for every layer but the first. Rounds through
            # the IO dtype first (the standalone kernel reads the
            # WRITTEN stream), then the identical LN -> (H As) H^T ->
            # clamp reduction: bf16-compute mode matches that kernel
            # bitwise; f32 mode matches the positives SET exactly and
            # rsum to <=1e-7 relative (dot-chain reassociation), far
            # inside the 5% hysteresis band it feeds.
            Xs = x.astype(out_ref.dtype).astype(f32)
            mu_s = jnp.mean(Xs, axis=-1, keepdims=True)
            var_s = jnp.mean(jnp.square(Xs - mu_s), axis=-1, keepdims=True)
            Hs = ((Xs - mu_s) * jax.lax.rsqrt(var_s + 1e-5) * sg_ref[0]
                  + sb_ref[0]).astype(cdt)
            qs = jax.lax.dot_general(
                Hs, As_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
                preferred_element_type=f32)              # [B, D]
            s = jax.lax.dot_general(
                qs.astype(cdt), Hs.T, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)              # [B, B]
            pos = (s > sig_eps) & (valid > 0)
            clamped = jnp.where(pos, s, 0.0)
            rsum = jnp.sum(clamped, axis=1)[None, :]
            rcnt = jnp.sum(pos.astype(f32), axis=1)[None, :]
            sig_ref[0] = jnp.concatenate(
                [rsum, rcnt, jnp.zeros((6, s.shape[0]), f32)], axis=0)

    return kernel


def fold_gated_layer_params(p, cfg):
    """Fold one gated-GT layer's params for the fused-layer kernel.

    Returns (A_cat [D, H*D], Wvo_cat [D, H*D], ln rows, W_gnn, FFN mats)
    with A_h = Wq_h Wk_h^T / sqrt(dh) head-concatenated on lanes (the
    same folding as fold_gated_attention_params) and every vector param
    reshaped to a [1, dim] row (unit-sublane VMEM operands)."""
    from ruvector_tpu.ops.pallas.gated_block_attn import (
        fold_gated_attention_params,
    )

    d, hh = cfg.dim, cfg.num_heads
    A, Wvo = fold_gated_attention_params(p, cfg)       # [H, D, D]
    A_cat = jnp.transpose(A, (1, 0, 2)).reshape(d, hh * d)
    Wvo_cat = jnp.transpose(Wvo, (1, 0, 2)).reshape(d, hh * d)
    row = lambda v: v.reshape(1, -1)                   # noqa: E731
    return (A_cat, Wvo_cat,
            row(p["ln1"]["gamma"]), row(p["ln1"]["beta"]),
            row(p["ln_g"]["gamma"]), row(p["ln_g"]["beta"]),
            row(p["ln2"]["gamma"]), row(p["ln2"]["beta"]),
            p["w_gnn"]["kernel"], row(p["w_gnn"]["bias"]),
            p["ffn_in"]["kernel"], row(p["ffn_in"]["bias"]),
            p["ffn_out"]["kernel"], row(p["ffn_out"]["bias"]))


@functools.partial(jax.jit, static_argnames=("ln_eps", "compute_bf16"))
def gated_block_layer(x, keep_packed, pad, wdense, folded, *,
                      ln_eps: float = 1e-5, compute_bf16: bool):
    """One-kernel gated-GT layer forward over halo-free block layouts.

    x:           [nB, B, D] residual stream (f32 or bf16; output follows)
    keep_packed: [nB, ceil(B/32), B] uint32 bit-packed gate mask
    pad:         [nB, B]    1 for real nodes
    wdense:      [nB, B, B] normalized edge weights (table == block)
    folded:      fold_gated_layer_params output
    returns [nB, B, D] in x.dtype == _layer_with_keep's straight path.
    """
    nb, b, d = x.shape
    (A_cat, Wvo_cat, ln1g, ln1b, lngg, lngb, ln2g, ln2b,
     Wg, bg, Wi, bi, Wo, bo) = folded
    heads = A_cat.shape[1] // d
    fm = Wi.shape[1] // d

    blk = lambda k: (k, 0, 0)        # noqa: E731
    cst2 = lambda k: (0, 0)          # noqa: E731
    in_specs = [
        pl.BlockSpec((1, b, d), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, keep_words(b), b), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, b), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, b), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, heads * d), cst2, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, heads * d), cst2, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM)] * 6 + [
        pl.BlockSpec((d, d), cst2, memory_space=pltpu.VMEM),       # Wg
        pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM),       # bg
        pl.BlockSpec((d, fm * d), cst2, memory_space=pltpu.VMEM),  # Wi
        pl.BlockSpec((1, fm * d), cst2, memory_space=pltpu.VMEM),  # bi
        pl.BlockSpec((fm * d, d), cst2, memory_space=pltpu.VMEM),  # Wo
        pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM),       # bo
    ]
    # attn (q/y proj + per-head s/av) + mix (wd@g + @Wg) + FFN
    flops = 2 * nb * b * (heads * (2 * d + 2 * b) * d
                          + (b + d) * d + 2 * fm * d * d)
    bytes_accessed = (2 * x.size * x.dtype.itemsize
                      + keep_packed.size * 4
                      + wdense.size * wdense.dtype.itemsize)
    return pl.pallas_call(
        _make_layer_kernel(heads, ln_eps, compute_bf16),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, b, d), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, b, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=nb * b * (heads * b + fm * d)),
        interpret=jax.default_backend() != "tpu",
    )(x, keep_packed, pad[:, None, :], wdense, A_cat, Wvo_cat,
      ln1g, ln1b, lngg, lngb, ln2g, ln2b, Wg, bg, Wi, bi, Wo, bo)


@functools.partial(jax.jit, static_argnames=("ln_eps", "compute_bf16",
                                             "sig_eps"))
def gated_block_layer_with_sig(x, keep_packed, pad, wdense, folded,
                               A_sig_next, sig_gamma, sig_beta, *,
                               ln_eps: float = 1e-5, compute_bf16: bool,
                               sig_eps: float):
    """Fused layer that ALSO emits the NEXT layer's gate signature.

    Same computation as gated_block_layer, plus the next layer's
    block_gate_signature_ln_x reduction (A_sig_next [D, D] =
    Wq Wk^T/(sqrt(dh) H) of the FOLLOWING layer, with its LN1 rows)
    evaluated on the output while it is still in VMEM. Returns
    (out [nB, B, D], rsum [nB, B] f32, rcnt [nB, B] f32); the caller
    reduces sig = rsum.sum(1)/max(rcnt.sum(1), 1). Forward-only (the
    temporal-reuse step path — never differentiated).
    """
    nb, b, d = x.shape
    (A_cat, Wvo_cat, ln1g, ln1b, lngg, lngb, ln2g, ln2b,
     Wg, bg, Wi, bi, Wo, bo) = folded
    heads = A_cat.shape[1] // d
    fm = Wi.shape[1] // d

    blk = lambda k: (k, 0, 0)        # noqa: E731
    cst2 = lambda k: (0, 0)          # noqa: E731
    in_specs = [
        pl.BlockSpec((1, b, d), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, keep_words(b), b), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, b), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, b), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, heads * d), cst2, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, heads * d), cst2, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM)] * 6 + [
        pl.BlockSpec((d, d), cst2, memory_space=pltpu.VMEM),       # Wg
        pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM),       # bg
        pl.BlockSpec((d, fm * d), cst2, memory_space=pltpu.VMEM),  # Wi
        pl.BlockSpec((1, fm * d), cst2, memory_space=pltpu.VMEM),  # bi
        pl.BlockSpec((fm * d, d), cst2, memory_space=pltpu.VMEM),  # Wo
        pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM),       # bo
        pl.BlockSpec((d, d), cst2, memory_space=pltpu.VMEM),       # A_sig
        pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM),       # sgamma
        pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM),       # sbeta
    ]
    flops = 2 * nb * b * (heads * (2 * d + 2 * b) * d
                          + (b + d) * d + 2 * fm * d * d
                          + (b + d) * d)                 # + sig reduction
    bytes_accessed = (2 * x.size * x.dtype.itemsize
                      + keep_packed.size * 4
                      + wdense.size * wdense.dtype.itemsize
                      + nb * b * 8)
    out, sig = pl.pallas_call(
        _make_layer_kernel(heads, ln_eps, compute_bf16, sig_eps=sig_eps),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, b, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, b), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, b, d), x.dtype),
            jax.ShapeDtypeStruct((nb, 8, b), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=nb * b * (heads * b + fm * d)),
        interpret=jax.default_backend() != "tpu",
    )(x, keep_packed, pad[:, None, :], wdense, A_cat, Wvo_cat,
      ln1g, ln1b, lngg, lngb, ln2g, ln2b, Wg, bg, Wi, bi, Wo, bo,
      A_sig_next, sig_gamma.reshape(1, -1), sig_beta.reshape(1, -1))
    return out, sig[:, 0], sig[:, 1]
