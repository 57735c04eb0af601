"""Local-global (Longformer-style) attention.

Reference: ruvector-attention/src/sparse/local_global.rs — each query attends
to a local window around its position plus the first G global tokens,
O(S * (W + G)). TPU form: build the banded+global mask once (static shapes)
and run a single masked batched attention; XLA prunes the masked FLOPs via
block-sparse fusion for large S, and for small S a dense masked matmul is
already optimal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.ops.segment import masked_softmax


def local_global_mask(
    seq_len: int, local_window: int, num_global: int, dtype=jnp.float32
) -> jax.Array:
    """[S, S] mask: position i attends j iff |i-j| <= W/2 or j < G.

    Matches local_global.rs:31-67: the window is [i - W/2, i + W/2]
    inclusive, and global positions are the first `num_global` tokens.
    """
    half = local_window // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    local = jnp.abs(rows - cols) <= half
    global_ = cols < num_global
    return (local | global_).astype(dtype)


def local_global_attention(
    q: jax.Array,          # [S, D] (sequence self-attention form)
    k: jax.Array,          # [S, D]
    v: jax.Array,          # [S, Dv]
    local_window: int = 64,
    num_global: int = 4,
    mask: jax.Array | None = None,  # extra [S] key validity mask
) -> jax.Array:
    s, d = q.shape
    band = local_global_mask(s, local_window, num_global, q.dtype)
    if mask is not None:
        band = band * mask[None, :]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    attn = masked_softmax(scores, band, axis=-1)
    return jnp.dot(attn, v, preferred_element_type=jnp.float32)


register_attention(
    AttentionMechanism(name="local_global", init=None,
                       apply=lambda params, cfg, q, k, v, mask=None, **kw:
                       local_global_attention(q, k, v, mask=mask, **kw))
)
