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

FORWARD-ONLY: pallas_call has no autodiff rule here, so training
(gated_graph_transformer_loss_with_masks) keeps the XLA path; the
hysteresis step/init/apply paths — where config 5's serving time goes —
use this kernel on TPU. Parity with the XLA path is pinned in
tests/test_gated_graph_transformer.py (head-folding reassociates the
f32 products, so equality is to ~1e-4, not bit-exact).

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


def _make_kernel(heads: int, compute_bf16: bool):
    def kernel(x_ref, keep_ref, pad_ref, A_ref, Wvo_ref, out_ref):
        f32 = jnp.float32
        cdt = jnp.bfloat16 if compute_bf16 else f32
        X = x_ref[0].astype(f32)                       # [B, D]
        # pad rides a [1, B] row (a [B, 1] unit-lane operand tile-pads
        # 128x in HBM); transpose to the column form in VMEM
        pad_row = pad_ref[0].astype(f32)               # [1, B]
        pad = pad_row.T                                # [B, 1]
        # valid pairs = pad outer product; gate mask is shared across heads
        valid = pad * pad_row                          # [B, B]
        mask = keep_ref[0].astype(f32) * valid
        XT = X.astype(cdt).T                           # [D, B] cdt

        out = jnp.zeros_like(X)
        for h in range(heads):
            q = jax.lax.dot_general(
                X, A_ref[h], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)            # [B, D] (scale folded)
            s = jax.lax.dot_general(
                q.astype(cdt), XT, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)            # [B, B]
            # masked eps-guarded softmax (ops/segment.masked_softmax)
            s = jnp.where(mask > 0, s, -1e30)
            smax = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
            p = jnp.exp(s - smax) * (mask > 0)
            p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-10)
            y = jax.lax.dot_general(
                X.astype(cdt), Wvo_ref[h].astype(cdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32)            # [B, D]
            out = out + jax.lax.dot_general(
                p.astype(cdt), y.astype(cdt), (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
        out_ref[0] = (out * pad).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("compute_bf16",))
def gated_block_attention(x, keep, pad, A, Wvo, *, compute_bf16: bool):
    """Per-partition gated MHA over the block-dense layout.

    x:    [nB, B, D]  pre-norm features (f32)
    keep: [nB, B, B]  gate mask (bool/float; broadcast across heads)
    pad:  [nB, B]     1 for real nodes
    A:    [H, D, D]   Wq_h @ Wk_h^T * scale (head-folded, pre-scaled)
    Wvo:  [H, D, D]   Wv_h @ Wo_h (value+output projection folded)
    returns [nB, B, D] f32 == _attention_with_keep(...) to ~1e-4.
    """
    nb, b, d = x.shape
    h = A.shape[0]
    keep_io = keep.astype(jnp.bfloat16)    # 0/1 exact; halves mask traffic

    in_specs = [
        pl.BlockSpec((1, b, d), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, b), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, b), lambda k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, d, d), lambda k: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, d, d), lambda k: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    flops = 2 * nb * b * h * (2 * d + 2 * b) * d
    bytes_accessed = (x.size * x.dtype.itemsize + keep_io.size * 2
                      + nb * b * d * 4)
    return pl.pallas_call(
        _make_kernel(h, compute_bf16),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, b, d), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, b, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=nb * b * h * b),
        interpret=jax.default_backend() != "tpu",
    )(x, keep_io, pad[:, None, :], A, Wvo)


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
