"""Scaled dot-product attention (parameter-free, batched).

Reference: ruvector-attention/src/attention/scaled_dot_product.rs and the
per-head routine in ruvector-gnn/src/layer.rs:174-210. One batched einsum
replaces the per-query score loops; the epsilon-guarded masked softmax
reproduces the reference's `sum_exp.max(1e-10)` convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.ops.segment import masked_softmax


def scaled_dot_attention(
    q: jax.Array,          # [B, D]
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv]
    mask: jax.Array | None = None,  # [B, S]
    temperature: float = 1.0,
) -> jax.Array:
    """out[b] = softmax(<q[b], k[b, s]> / (sqrt(D) * temperature)) @ v[b]."""
    d = q.shape[-1]
    if mask is None:
        mask = jnp.ones(k.shape[:-1], dtype=q.dtype)
    scale = 1.0 / (jnp.sqrt(jnp.asarray(d, q.dtype)) * temperature)
    scores = jnp.einsum("bd,bsd->bs", q, k) * scale
    attn = masked_softmax(scores, mask, axis=-1)
    return jnp.einsum("bs,bsd->bd", attn, v)


register_attention(
    AttentionMechanism(name="scaled_dot", init=None,
                       apply=lambda params, cfg, q, k, v, mask=None, **kw:
                       scaled_dot_attention(q, k, v, mask, **kw))
)
