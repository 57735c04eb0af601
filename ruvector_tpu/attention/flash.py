"""Flash attention: blockwise online-softmax streaming.

Reference: ruvector-attention/src/sparse/flash.rs:86-140 — running
(max, sum, acc) recurrence over key blocks with O(block) memory. Here the
recurrence is a lax.scan over key blocks, so XLA keeps each block's scores
in registers/VMEM and never materializes the [B, S] score matrix. The
dedicated Pallas kernel for very long neighbor lists lives in
ruvector_tpu/ops/pallas/flash_kernel.py; this is the portable XLA form and
the correctness oracle (flash == dense within 1e-4, mirrored from
flash.rs:192-211 tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention

_NEG = -1e30


@partial(jax.jit, static_argnames=("block_size",))
def flash_attention(
    q: jax.Array,          # [B, D]
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv]
    mask: jax.Array | None = None,  # [B, S]
    block_size: int = 128,
) -> jax.Array:
    b, s, d = k.shape
    dv = v.shape[-1]
    if mask is None:
        mask = jnp.ones((b, s), dtype=q.dtype)

    nblk = -(-s // block_size)
    pad = nblk * block_size - s
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))

    kb = k.reshape(b, nblk, block_size, d).transpose(1, 0, 2, 3)
    vb = v.reshape(b, nblk, block_size, dv).transpose(1, 0, 2, 3)
    mb = mask.reshape(b, nblk, block_size).transpose(1, 0, 2)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))

    def step(carry, blk):
        m_run, l_run, acc = carry
        kblk, vblk, mblk = blk
        scores = jnp.einsum("bd,bsd->bs", q, kblk) * scale
        scores = jnp.where(mblk > 0, scores, _NEG)
        m_blk = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m_run, m_blk)
        rescale = jnp.exp(m_run - m_new)
        p = jnp.exp(scores - m_new[:, None]) * (mblk > 0)
        l_new = l_run * rescale + jnp.sum(p, axis=-1)
        acc_new = acc * rescale[:, None] + jnp.einsum("bs,bsd->bd", p, vblk)
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b,), _NEG, jnp.float32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b, dv), jnp.float32),
    )
    (m_f, l_f, acc), _ = jax.lax.scan(step, init, (kb, vb, mb))
    # reference final guard: only normalize when sum_exp > 1e-8 (flash.rs:137)
    denom = jnp.where(l_f > 1e-8, l_f, 1.0)
    return acc / denom[:, None]


register_attention(
    AttentionMechanism(name="flash", init=None,
                       apply=lambda params, cfg, q, k, v, mask=None, **kw:
                       flash_attention(q, k, v, mask, **kw))
)
