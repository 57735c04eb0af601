"""Three-tier KV cache (ADR-004): hot f32 ring → warm int8 → archive int4.

Reference: ruvector-mincut-gated-transformer/src/kv_cache/ (9 files,
~4k LoC) — HotBuffer (hot_buffer.rs), KIVI-style quantizer (kivi.rs: keys
per-channel, values per-token), archive tier, tier policy/manager.

TPU design: the cache is a functional pytree with STATIC capacities per
tier (ring buffers + position counters); `kv_cache_append` shifts a token
from hot to warm (quantizing) when hot is full, and warm to archive (int4)
when warm is full. `kv_cache_read` materializes the effective (K, V) in
f32 for attention — dequantization is fused by XLA into the attention
matmuls, so quantized tiers cost bandwidth, not extra passes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class KVCacheConfig:
    hot_capacity: int = 16       # recent tokens kept f32
    warm_capacity: int = 48      # int8 (KIVI scheme)
    archive_capacity: int = 64   # int4 grouped
    heads: int = 4
    head_dim: int = 64


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KVCacheState:
    # hot: f32 ring buffers [hot_cap, H, hd]
    hot_k: jax.Array
    hot_v: jax.Array
    # warm: int8 + scales. Keys per-CHANNEL scale [warm_cap, H, 1] is the
    # KIVI finding (kivi.rs): key outliers are channel-aligned. Values
    # per-token.
    warm_k: jax.Array        # int8 [warm_cap, H, hd]
    warm_k_scale: jax.Array  # [warm_cap, H, 1]  (per token-head here; channel
                             # scales live along hd for keys, see append)
    warm_v: jax.Array
    warm_v_scale: jax.Array
    # archive: int4 stored as int8 in [-7, 7], coarser scale
    arch_k: jax.Array
    arch_k_scale: jax.Array
    arch_v: jax.Array
    arch_v_scale: jax.Array
    # counts: total tokens appended; each tier's fill derived from it
    length: jax.Array        # scalar int32


def kv_cache_init(cfg: KVCacheConfig) -> KVCacheState:
    h, d = cfg.heads, cfg.head_dim
    z = lambda c: jnp.zeros((c, h, d), jnp.float32)
    zi = lambda c: jnp.zeros((c, h, d), jnp.int8)
    zs = lambda c: jnp.ones((c, h, 1), jnp.float32)
    return KVCacheState(
        hot_k=z(cfg.hot_capacity), hot_v=z(cfg.hot_capacity),
        warm_k=zi(cfg.warm_capacity), warm_k_scale=zs(cfg.warm_capacity),
        warm_v=zi(cfg.warm_capacity), warm_v_scale=zs(cfg.warm_capacity),
        arch_k=zi(cfg.archive_capacity), arch_k_scale=zs(cfg.archive_capacity),
        arch_v=zi(cfg.archive_capacity), arch_v_scale=zs(cfg.archive_capacity),
        length=jnp.zeros((), jnp.int32),
    )


def _quant_token(x: jax.Array, bits: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-(token,head) quantization of [H, hd] to int8/int4."""
    qmax = 127.0 if bits == 8 else 7.0
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / qmax
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale


def kv_cache_append(
    cfg: KVCacheConfig, state: KVCacheState, k: jax.Array, v: jax.Array
) -> KVCacheState:
    """Append one token's (k, v) [H, hd]. Cascading eviction:
    hot full -> oldest hot token quantized into warm (int8);
    warm full -> oldest warm token requantized into archive (int4)."""
    hot_fill = jnp.minimum(state.length, cfg.hot_capacity)
    hot_full = hot_fill >= cfg.hot_capacity

    # token leaving hot (only meaningful when hot_full)
    evict_k = state.hot_k[0]
    evict_v = state.hot_v[0]

    # shift hot ring (roll) and write new token at the end position
    def append_hot(buf, x):
        rolled = jnp.where(hot_full, jnp.roll(buf, -1, axis=0), buf)
        pos = jnp.minimum(state.length, cfg.hot_capacity - 1)
        return jax.lax.dynamic_update_index_in_dim(rolled, x, pos, 0)

    new_hot_k = append_hot(state.hot_k, k)
    new_hot_v = append_hot(state.hot_v, v)

    # warm bookkeeping
    warm_count = jnp.clip(state.length - cfg.hot_capacity + 1, 0, None)
    warm_fill = jnp.minimum(warm_count - 1, cfg.warm_capacity)
    warm_full = warm_fill >= cfg.warm_capacity

    warm_evict_k = state.warm_k[0].astype(jnp.float32) * state.warm_k_scale[0]
    warm_evict_v = state.warm_v[0].astype(jnp.float32) * state.warm_v_scale[0]

    qk, sk = _quant_token(evict_k, 8)
    qv, sv = _quant_token(evict_v, 8)

    def append_warm(buf, scale_buf, x_q, x_s):
        do = hot_full
        rolled = jnp.where(warm_full & do, jnp.roll(buf, -1, axis=0), buf)
        rolled_s = jnp.where(warm_full & do, jnp.roll(scale_buf, -1, axis=0), scale_buf)
        pos = jnp.clip(warm_fill, 0, cfg.warm_capacity - 1)
        new = jax.lax.dynamic_update_index_in_dim(rolled, x_q, pos, 0)
        new_s = jax.lax.dynamic_update_index_in_dim(rolled_s, x_s, pos, 0)
        return (
            jnp.where(do, new, buf),
            jnp.where(do, new_s, scale_buf),
        )

    new_warm_k, new_warm_k_s = append_warm(state.warm_k, state.warm_k_scale, qk, sk)
    new_warm_v, new_warm_v_s = append_warm(state.warm_v, state.warm_v_scale, qv, sv)

    # archive bookkeeping
    arch_count = jnp.clip(state.length - cfg.hot_capacity - cfg.warm_capacity + 1, 0, None)
    arch_fill = jnp.minimum(arch_count - 1, cfg.archive_capacity)
    arch_full = arch_fill >= cfg.archive_capacity

    ak, ask = _quant_token(warm_evict_k, 4)
    av, asv = _quant_token(warm_evict_v, 4)

    def append_arch(buf, scale_buf, x_q, x_s):
        do = warm_full & hot_full
        rolled = jnp.where(arch_full & do, jnp.roll(buf, -1, axis=0), buf)
        rolled_s = jnp.where(arch_full & do, jnp.roll(scale_buf, -1, axis=0), scale_buf)
        pos = jnp.clip(arch_fill, 0, cfg.archive_capacity - 1)
        new = jax.lax.dynamic_update_index_in_dim(rolled, x_q, pos, 0)
        new_s = jax.lax.dynamic_update_index_in_dim(rolled_s, x_s, pos, 0)
        return (jnp.where(do, new, buf), jnp.where(do, new_s, scale_buf))

    new_arch_k, new_arch_k_s = append_arch(state.arch_k, state.arch_k_scale, ak, ask)
    new_arch_v, new_arch_v_s = append_arch(state.arch_v, state.arch_v_scale, av, asv)

    return KVCacheState(
        hot_k=new_hot_k, hot_v=new_hot_v,
        warm_k=new_warm_k, warm_k_scale=new_warm_k_s,
        warm_v=new_warm_v, warm_v_scale=new_warm_v_s,
        arch_k=new_arch_k, arch_k_scale=new_arch_k_s,
        arch_v=new_arch_v, arch_v_scale=new_arch_v_s,
        length=state.length + 1,
    )


def kv_cache_read(
    cfg: KVCacheConfig, state: KVCacheState
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Materialize effective (K, V, valid_mask) in chronological order:
    [archive | warm | hot], shapes [T_total, H, hd] with T_total =
    archive+warm+hot capacities; mask marks live positions."""
    k = jnp.concatenate([
        state.arch_k.astype(jnp.float32) * state.arch_k_scale,
        state.warm_k.astype(jnp.float32) * state.warm_k_scale,
        state.hot_k,
    ], axis=0)
    v = jnp.concatenate([
        state.arch_v.astype(jnp.float32) * state.arch_v_scale,
        state.warm_v.astype(jnp.float32) * state.warm_v_scale,
        state.hot_v,
    ], axis=0)
    hot_fill = jnp.minimum(state.length, cfg.hot_capacity)
    warm_fill = jnp.clip(state.length - cfg.hot_capacity, 0, cfg.warm_capacity)
    arch_fill = jnp.clip(
        state.length - cfg.hot_capacity - cfg.warm_capacity, 0, cfg.archive_capacity
    )
    ha, hw, hh = cfg.archive_capacity, cfg.warm_capacity, cfg.hot_capacity
    pos = jnp.arange(ha + hw + hh)
    mask = jnp.where(
        pos < ha, pos < arch_fill,
        jnp.where(pos < ha + hw, (pos - ha) < warm_fill, (pos - ha - hw) < hot_fill),
    ).astype(jnp.float32)
    return k, v, mask


def kv_cache_flush(cfg: KVCacheConfig, state: KVCacheState) -> KVCacheState:
    """FlushKv intervention (gate decision) — reset to empty."""
    return kv_cache_init(cfg)
