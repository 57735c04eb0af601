"""Sequence parallelism: ring attention over a device mesh.

SURVEY §2.2: the reference has no sequence parallelism — its closest
analogue is FlashAttention's blockwise online softmax (sparse/flash.rs:
86-140). Ring attention IS that recurrence distributed: the sequence is
sharded over devices, each device keeps its Q shard resident and rotates
K/V shards around the ring with `lax.ppermute`, folding each incoming
block into the running (max, sum, accumulator) online-softmax state. Peak
memory per device is O(S/n * S/n); the K/V transfer overlaps with the
block computation (XLA schedules the ppermute asynchronously when the
next block's math doesn't depend on it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _block_update(m, l, acc, q, k, v, scale, mask):
    """Fold one K/V block into the online-softmax state (flash recurrence)."""
    s = (q @ k.T) * scale                              # [Bq, Bk]
    s = jnp.where(mask, s, -jnp.inf)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    # guard fully-masked rows (m_new = -inf)
    safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    p = jnp.exp(s - safe_m[:, None])
    p = jnp.where(mask, p, 0.0)
    corr = jnp.exp(jnp.where(jnp.isfinite(m), m - safe_m, -jnp.inf))
    l_new = corr * l + jnp.sum(p, axis=-1)
    acc_new = corr[:, None] * acc + p @ v
    return m_new, l_new, acc_new


def make_ring_attention(mesh: Mesh, seq_len: int, causal: bool = True,
                        axis_name: str = "nodes"):
    """Jitted attention(q, k, v [S, D]) -> [S, D] with the sequence sharded
    over the mesh and K/V rotated around the ring."""
    n_dev = mesh.shape[axis_name]
    assert seq_len % n_dev == 0
    blk = seq_len // n_dev

    def block(q, k, v):
        # local shards [blk, D]
        q, k, v = q, k, v
        d = q.shape[-1]
        scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
        me = jax.lax.axis_index(axis_name)
        rows = me * blk + jnp.arange(blk)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(carry, r):
            m, l, acc, k_blk, v_blk = carry
            # K/V block currently held arrived from device (me - r) mod n
            src = (me - r) % n_dev
            cols = src * blk + jnp.arange(blk)
            mask = (cols[None, :] <= rows[:, None]) if causal else \
                jnp.ones((blk, blk), bool)
            m, l, acc = _block_update(m, l, acc, q, k_blk, v_blk, scale,
                                      mask)
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            return (m, l, acc, k_blk, v_blk), None

        init = (jnp.full((blk,), -jnp.inf), jnp.zeros((blk,)),
                jnp.zeros_like(q), k, v)
        (m, l, acc, _, _), _ = jax.lax.scan(step, init,
                                            jnp.arange(n_dev))
        return acc / jnp.maximum(l, 1e-20)[:, None]

    sharded = shard_map(
        block, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded)


def reference_attention(q, k, v, causal: bool = True):
    """Dense single-device oracle."""
    d = q.shape[-1]
    s = (q @ k.T) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    if causal:
        n = q.shape[0]
        s = jnp.where(jnp.tril(jnp.ones((n, n), bool)), s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)
    return w @ v
