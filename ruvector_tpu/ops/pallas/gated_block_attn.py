"""Fused gated block MHA — the config-5 forward kernel.

The mincut-gated graph transformer's intra-partition attention
(graph_transformer/gated.py:_attention_with_keep) is HBM-bound in XLA:
the [nB, H, B, B] logits and attention tensors round-trip to HBM
between the QK matmul, the mask/softmax pass, and the AV matmul —
~8 GB of traffic per layer at 1M nodes. This kernel keeps the whole
block in VMEM: per (block, head) it computes

    (X @ A_h) @ X^T  ->  keep&pad-masked eps-guarded softmax  ->
    attn @ (X @ Wvo_h)  accumulated into the [B, D] output

with A_h = Wq_h @ Wk_h^T * scale and Wvo_h = Wv_h @ Wo_h — the same
head-folding the RuvectorLayer kernel uses (block_dense_attn.py), so
per-head D/H-wide lane slices never appear and every matmul is a
well-tiled [B, D] x [D, *] op. Scores never touch HBM; per layer the
kernel reads X + the gate mask and writes only the [nB, B, D] output.

Round 4: the kernel has a custom_vjp with a flash-style RECOMPUTE
backward (per block+head, scores/softmax are re-derived in VMEM on the
backward pass — nothing [B, B]-shaped is ever saved to HBM), so the
training path (gated_graph_transformer_loss_with_masks) runs it too:
round 3's XLA loss path paid ~8 GB/layer of logit round-trips at 1M
nodes. dA/dWvo accumulate across the sequential TPU grid into
constant-index output blocks. Gradient parity with the XLA attention
is pinned in tests/test_gated_graph_transformer.py (head-folding
reassociates f32 products, so equality is to ~1e-4, not bit-exact).

Reference semantics: ruvector-attn-mincut/src/gating.rs:70-102 (gate
mask applied to the logit matrix before softmax); the eps-guarded
softmax matches ops/segment.masked_softmax (layer.rs:195-199).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def keep_words(b: int) -> int:
    """Packed-mask row words for block size b (rows packed 32/word)."""
    return -(-b // 32)


def _unpack_bits(kp, b):
    """[ceil(B/32), B] uint32 -> [B, B] float bits.

    The gate mask travels HBM->VMEM bit-PACKED along SUBLANES (row i
    lives in word i//32, bit i%32): a [B/32, B] uint32 block is an
    exactly-tiled (8, 128k)-shaped operand at B=256 — no padding — and
    the row-major [W, 32, B] -> [W*32, B] merge is a free reshape (the
    minor dim is untouched). 32x less mask traffic than the bf16 mask
    round 3 shipped, and the only layout whose 10M-node state fits HBM."""
    w = kp.shape[0]
    bits = (kp[:, None, :] >> jax.lax.broadcasted_iota(
        jnp.uint32, (w, 32, kp.shape[1]), 1)) & jnp.uint32(1)
    # Mosaic has no uint32->f32 cast; return bool (compare lowers fine)
    return bits.reshape(w * 32, kp.shape[1])[:b] > 0


def _make_kernel(heads: int, compute_bf16: bool):
    """A_ref/Wvo_ref arrive head-CONCATENATED: [D, H*D]. The per-head
    q/y projections then batch into ONE [B, D] x [D, H*D] matmul each
    (the round-3 per-head loop issued 4x as many small MXU ops with a
    serial q->s->softmax->av dependency chain per head; with q/y hoisted
    the heads' score/softmax/AV pipelines are independent and Mosaic
    overlaps head h's VPU softmax with head h+1's MXU score matmul)."""

    def kernel(x_ref, keep_ref, pad_ref, A_ref, Wvo_ref, out_ref):
        f32 = jnp.float32
        cdt = jnp.bfloat16 if compute_bf16 else f32
        X = x_ref[0].astype(f32)                       # [B, D]
        d = X.shape[1]
        # pad rides a [1, B] row (a [B, 1] unit-lane operand tile-pads
        # 128x in HBM); transpose to the column form in VMEM
        pad_row = pad_ref[0].astype(f32)               # [1, B]
        pad = pad_row.T                                # [B, 1]
        # valid pairs = pad outer product; gate mask is shared across heads
        valid = pad * pad_row                          # [B, B]
        keepb = _unpack_bits(keep_ref[0], X.shape[0]) & (valid > 0)
        Xc = X.astype(cdt)
        XT = Xc.T                                      # [D, B] cdt

        # bf16 mode runs the MXU passes on bf16 operands (f32 accumulate)
        q = jax.lax.dot_general(
            Xc, A_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                # [B, H*D]
        y = jax.lax.dot_general(
            Xc, Wvo_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                # [B, H*D]

        out = jnp.zeros_like(X)
        for h in range(heads):
            q_h = q[:, h * d:(h + 1) * d]              # aligned lane slice
            y_h = y[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                q_h.astype(cdt), XT, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)            # [B, B]
            # masked eps-guarded softmax (ops/segment.masked_softmax);
            # normalization deferred to the [B, D] output (one fewer
            # [B, B] VPU pass)
            s = jnp.where(keepb, s, -1e30)
            smax = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
            pu = jnp.exp(s - smax) * keepb
            inv = 1.0 / jnp.maximum(
                jnp.sum(pu, axis=-1, keepdims=True), 1e-10)
            out = out + jax.lax.dot_general(
                pu.astype(cdt), y_h.astype(cdt), (((1,), (0,)), ((), ())),
                preferred_element_type=f32) * inv
        out_ref[0] = (out * pad).astype(out_ref.dtype)

    return kernel


def _fwd_pallas(x, keep_io, pad3, A_cat, Wvo_cat, compute_bf16):
    nb, b, d = x.shape
    h = A_cat.shape[1] // d
    in_specs = [
        pl.BlockSpec((1, b, d), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, keep_words(b), b), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, b), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, h * d), lambda k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, h * d), lambda k: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    flops = 2 * nb * b * h * (2 * d + 2 * b) * d
    bytes_accessed = (x.size * x.dtype.itemsize + keep_io.size * 4
                      + nb * b * d * 4)
    return pl.pallas_call(
        _make_kernel(h, compute_bf16),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, b, d), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        # out in x.dtype: a hard-f32 output is a 4.77 GB HBM temp at 10M
        # nodes when the residual stream is bf16 (in-kernel accumulate
        # stays f32 either way)
        out_shape=jax.ShapeDtypeStruct((nb, b, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=nb * b * h * b),
        interpret=jax.default_backend() != "tpu",
    )(x, keep_io, pad3, A_cat, Wvo_cat)


def _make_bwd_kernel(heads: int, compute_bf16: bool):
    """Recompute backward: scores/softmax re-derived per (block, head) in
    VMEM — the flash-attention trick — so nothing [B, B]-shaped is saved
    or read from HBM. dA/dWvo accumulate into constant-index output
    blocks across the (sequential) TPU grid."""

    def kernel(x_ref, keep_ref, pad_ref, A_ref, Wvo_ref, g_ref,
               dx_ref, dA_ref, dWvo_ref):
        f32 = jnp.float32
        cdt = jnp.bfloat16 if compute_bf16 else f32
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _init():
            dA_ref[...] = jnp.zeros_like(dA_ref)
            dWvo_ref[...] = jnp.zeros_like(dWvo_ref)

        X = x_ref[0].astype(f32)                       # [B, D]
        d = X.shape[1]
        pad_row = pad_ref[0].astype(f32)               # [1, B]
        pad = pad_row.T                                # [B, 1]
        valid = pad * pad_row
        keepb = _unpack_bits(keep_ref[0], X.shape[0]) & (valid > 0)
        # fold the forward's final `out * pad` into the cotangent
        g = g_ref[0].astype(f32) * pad                 # [B, D]

        Xc = X.astype(cdt)
        XT = Xc.T                                      # [D, B] cdt
        # recompute the forward's batched projections (as _make_kernel)
        q = jax.lax.dot_general(
            Xc, A_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                # [B, H*D]
        y = jax.lax.dot_general(
            Xc, Wvo_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                # [B, H*D]

        dX = jnp.zeros_like(X)
        dq_parts, dy_parts = [], []
        for h in range(heads):
            q_h = q[:, h * d:(h + 1) * d]
            y_h = y[:, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                q_h.astype(cdt), XT, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)            # [B, B]
            s = jnp.where(keepb, s, -1e30)
            smax = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
            pu = jnp.exp(s - smax) * keepb
            denom = jnp.maximum(jnp.sum(pu, axis=-1, keepdims=True), 1e-10)
            p = pu / denom
            # --- backward (out_h = p @ y_h) ---
            dp = jax.lax.dot_general(                  # dp[i,j] = g[i]·y[j]
                g, y_h, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dy_parts.append(jax.lax.dot_general(       # dy[j] = Σ_i p[i,j] g[i]
                p, g, (((0,), (0,)), ((), ())),
                preferred_element_type=f32))
            # softmax vjp: masked/fully-masked rows have p == 0 -> ds == 0,
            # matching the eps-guarded forward's zero gradient there
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dq_parts.append(jax.lax.dot_general(       # s = q_h @ X^T
                ds, X, (((1,), (0,)), ((), ())),
                preferred_element_type=f32))
            dX = dX + jax.lax.dot_general(             # dX_j += Σ_i ds[i,j] q[i]
                ds, q_h, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
        dQ = jnp.concatenate(dq_parts, axis=1)         # [B, H*D]
        dY = jnp.concatenate(dy_parts, axis=1)
        # batched parameter/input grads — one [D, H*D]-shaped matmul each
        dA_ref[...] += jax.lax.dot_general(            # X^T @ dQ
            X, dQ, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        dWvo_ref[...] += jax.lax.dot_general(
            X, dY, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        dX = dX + jax.lax.dot_general(                 # dQ @ A_cat^T
            dQ, A_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        dX = dX + jax.lax.dot_general(
            dY, Wvo_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        dx_ref[0] = dX.astype(dx_ref.dtype)

    return kernel


def _bwd_pallas(x, keep_io, pad3, A_cat, Wvo_cat, g, compute_bf16):
    nb, b, d = x.shape
    h = A_cat.shape[1] // d
    in_specs = [
        pl.BlockSpec((1, b, d), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, keep_words(b), b), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, b), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, h * d), lambda k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, h * d), lambda k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, d), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, b, d), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, h * d), lambda k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, h * d), lambda k: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    flops = 2 * nb * b * h * (6 * d + 5 * b) * d
    bytes_accessed = (2 * x.size * 4 + keep_io.size * 4
                      + nb * b * d * 4 + 2 * h * d * d * 4)
    return pl.pallas_call(
        _make_bwd_kernel(h, compute_bf16),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, b, d), x.dtype),
            jax.ShapeDtypeStruct((d, h * d), jnp.float32),
            jax.ShapeDtypeStruct((d, h * d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=nb * b * h * b),
        interpret=jax.default_backend() != "tpu",
    )(x, keep_io, pad3, A_cat, Wvo_cat, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _gated_attn(x, keep_io, pad3, A_cat, Wvo_cat, compute_bf16):
    return _fwd_pallas(x, keep_io, pad3, A_cat, Wvo_cat, compute_bf16)


def _gated_attn_fwd(x, keep_io, pad3, A_cat, Wvo_cat, compute_bf16):
    out = _fwd_pallas(x, keep_io, pad3, A_cat, Wvo_cat, compute_bf16)
    return out, (x, keep_io, pad3, A_cat, Wvo_cat)


def _gated_attn_bwd(compute_bf16, res, g):
    import numpy as np

    x, keep_io, pad3, A_cat, Wvo_cat = res
    dx, dA, dWvo = _bwd_pallas(x, keep_io, pad3, A_cat, Wvo_cat, g,
                               compute_bf16)
    # keep is an integer (bit-packed) input: its tangent type is float0.
    # pad is a discrete gate — zero cotangent (stop_gradient upstream).
    return (dx, np.zeros(keep_io.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(pad3),
            dA.astype(A_cat.dtype), dWvo.astype(Wvo_cat.dtype))


_gated_attn.defvjp(_gated_attn_fwd, _gated_attn_bwd)


@functools.partial(jax.jit, static_argnames=("compute_bf16",))
def gated_block_attention(x, keep_packed, pad, A, Wvo, *,
                          compute_bf16: bool):
    """Per-partition gated MHA over the block-dense layout.

    x:           [nB, B, D]         pre-norm features (f32)
    keep_packed: [nB, ceil(B/32), B] uint32 bit-packed gate mask (row i
                 in word i//32 bit i%32; graph_transformer/gated.py
                 pack_keep) — 32x less HBM traffic than a bf16 mask and
                 the only layout whose 10M-node state fits HBM
    pad:         [nB, B]        1 for real nodes
    A:           [H, D, D]      Wq_h @ Wk_h^T * scale (head-folded)
    Wvo:         [H, D, D]      Wv_h @ Wo_h (value+output folded)
    returns [nB, B, D] in x.dtype == _attention_with_keep(...) to ~1e-4
    (in-kernel accumulation is f32; only the output IO rounds).

    Differentiable: a custom_vjp recomputes scores in VMEM on the
    backward pass and returns (dx, dA, dWvo); keep (integer) gets a
    float0 tangent and pad zeros. The head axis is concatenated onto
    lanes OUTSIDE the custom_vjp (the kernels batch the per-head
    projections into [D, H*D] matmuls); autodiff maps the [D, H*D]
    cotangents back to [H, D, D].
    """
    hh, d, _ = A.shape
    A_cat = jnp.transpose(A, (1, 0, 2)).reshape(d, hh * d)
    Wvo_cat = jnp.transpose(Wvo, (1, 0, 2)).reshape(d, hh * d)
    return _gated_attn(x, keep_packed, pad[:, None, :], A_cat, Wvo_cat,
                       compute_bf16)


def _make_sig_kernel(eps: float, scale: float):
    def kernel(q_ref, k_ref, pad_ref, out_ref):
        f32 = jnp.float32
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=f32) * scale          # [B, B]
        pad_row = pad_ref[0].astype(f32)                 # [1, B]
        valid = pad_row.T * pad_row
        pos = (s > eps) & (valid > 0)
        clamped = jnp.where(pos, s, 0.0)
        # rows 0/1 of an 8-sublane-padded output (Mosaic needs the last
        # two block dims tileable; a [1, B] block is rejected, and .at[]
        # scatter has no TPU lowering — concatenate instead)
        rsum = jnp.sum(clamped, axis=1)[None, :]
        rcnt = jnp.sum(pos.astype(f32), axis=1)[None, :]
        out_ref[0] = jnp.concatenate(
            [rsum, rcnt, jnp.zeros((6, s.shape[0]), f32)], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("eps", "scale"))
def block_gate_signature(q, k, pad, *, eps: float, scale: float):
    """Per-partition gate-signature reduction without HBM logits.

    q, k: [nB, B, D] projected features (f32 or bf16); pad: [nB, B].
    Computes the pooled logits s = (q @ k^T) * scale per block IN VMEM
    and returns (rsum, rcnt) [nB, B] f32 — row sums/counts of the
    eps-clamped positive entries. The per-partition signature is then
    rsum.sum(1) / max(rcnt.sum(1), 1) (graph_transformer/gated.py
    _gate_signature semantics, gating.rs:70-102's lambda proxy) — the
    [nB, B, B] tensor that round 3 materialized (~1 GB/layer at 1M
    nodes) never exists.
    """
    nb, b, d = q.shape
    in_specs = [
        pl.BlockSpec((1, b, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _make_sig_kernel(eps, scale),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * b * b * d,
            bytes_accessed=q.size * q.dtype.itemsize * 2 + nb * b * 32,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(q, k, pad[:, None, :])
    return out[:, 0], out[:, 1]


def _make_sig_x_kernel(eps: float, compute_bf16: bool):
    def kernel(x_ref, pad_ref, As_ref, out_ref):
        f32 = jnp.float32
        cdt = jnp.bfloat16 if compute_bf16 else f32
        X = x_ref[0].astype(cdt)                         # [B, D]
        qs = jax.lax.dot_general(
            X, As_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                  # [B, D]
        s = jax.lax.dot_general(
            qs.astype(cdt), X.T, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                  # [B, B]
        pad_row = pad_ref[0].astype(f32)                 # [1, B]
        valid = pad_row.T * pad_row
        pos = (s > eps) & (valid > 0)
        clamped = jnp.where(pos, s, 0.0)
        rsum = jnp.sum(clamped, axis=1)[None, :]
        rcnt = jnp.sum(pos.astype(f32), axis=1)[None, :]
        out_ref[0] = jnp.concatenate(
            [rsum, rcnt, jnp.zeros((6, s.shape[0]), f32)], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("eps", "compute_bf16"))
def block_gate_signature_x(x, pad, A_sig, *, eps: float,
                           compute_bf16: bool):
    """Gate-signature reduction STRAIGHT from pre-norm features.

    x: [nB, B, D]; pad: [nB, B]; A_sig: [D, D] = Wq @ Wk^T / (sqrt(dh)*H)
    (the head-mean score matrix folded like the attention kernel's A).
    Computes s = (x @ A_sig) @ x^T per block in VMEM and reduces to
    (rsum, rcnt) [nB, B] — unlike block_gate_signature this never needs
    the projected q/k tensors, which cost a 2x[nB, B, D] HBM write +
    read per layer per step (~2 GB at 1M nodes) purely for drift
    detection. Semantics: gating.rs:70-102's lambda proxy.
    """
    nb, b, d = x.shape
    in_specs = [
        pl.BlockSpec((1, b, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _make_sig_x_kernel(eps, compute_bf16),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * b * d * (b + d),
            bytes_accessed=x.size * x.dtype.itemsize + nb * b * 32,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x, pad[:, None, :], A_sig)
    return out[:, 0], out[:, 1]


def _make_sig_ln_x_kernel(eps: float, compute_bf16: bool):
    def kernel(x_ref, pad_ref, As_ref, g_ref, b_ref, out_ref):
        f32 = jnp.float32
        cdt = jnp.bfloat16 if compute_bf16 else f32
        X = x_ref[0].astype(f32)                         # [B, D]
        mu = jnp.mean(X, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(X - mu), axis=-1, keepdims=True)
        H = ((X - mu) * jax.lax.rsqrt(var + 1e-5) * g_ref[0]
             + b_ref[0]).astype(cdt)
        qs = jax.lax.dot_general(
            H, As_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                  # [B, D]
        s = jax.lax.dot_general(
            qs.astype(cdt), H.T, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                  # [B, B]
        pad_row = pad_ref[0].astype(f32)                 # [1, B]
        valid = pad_row.T * pad_row
        pos = (s > eps) & (valid > 0)
        clamped = jnp.where(pos, s, 0.0)
        rsum = jnp.sum(clamped, axis=1)[None, :]
        rcnt = jnp.sum(pos.astype(f32), axis=1)[None, :]
        out_ref[0] = jnp.concatenate(
            [rsum, rcnt, jnp.zeros((6, s.shape[0]), f32)], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("eps", "compute_bf16"))
def block_gate_signature_ln_x(x, pad, A_sig, gamma, beta, *, eps: float,
                              compute_bf16: bool):
    """Gate-signature reduction straight from the RESIDUAL stream.

    Same reduction as block_gate_signature_x, with the pre-norm LN1
    folded in (h = LN(x) * gamma + beta, rounded to the compute dtype
    like gated.py's layer_norm_apply(...).astype(dt)) — the step path's
    only remaining use of the materialized [nB, B, D] h tensor was this
    signature, so folding the LN deletes a full-stream HBM write+read
    per layer per step (~1 GB at 1M nodes).
    """
    nb, b, d = x.shape
    cst2 = lambda i: (0, 0)      # noqa: E731
    in_specs = [
        pl.BlockSpec((1, b, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), cst2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), cst2, memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _make_sig_ln_x_kernel(eps, compute_bf16),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * b * d * (b + d),
            bytes_accessed=x.size * x.dtype.itemsize + nb * b * 32,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x, pad[:, None, :], A_sig, gamma.reshape(1, d).astype(jnp.float32),
      beta.reshape(1, d).astype(jnp.float32))
    return out[:, 0], out[:, 1]


def fold_gated_attention_params(p, cfg):
    """Head-fold the gated-GT attention weights for the kernel.

    A_h = Wq[:, h] @ Wk[:, h]^T / sqrt(dh);  Wvo_h = Wv[:, h] @ Wo[h, :].
    """
    d, hh, dh = cfg.dim, cfg.num_heads, cfg.head_dim
    wq = p["wq"].reshape(d, hh, dh).transpose(1, 0, 2)     # [H, D, dh]
    wk = p["wk"].reshape(d, hh, dh).transpose(1, 0, 2)
    wv = p["wv"].reshape(d, hh, dh).transpose(1, 0, 2)
    wo = p["wo"].reshape(hh, dh, d)                        # [H, dh, D]
    scale = 1.0 / (dh ** 0.5)
    A = jnp.einsum("hdk,hek->hde", wq, wk,
                   preferred_element_type=jnp.float32) * scale
    Wvo = jnp.einsum("hdk,hke->hde", wv, wo,
                     preferred_element_type=jnp.float32)
    return A, Wvo
