"""Three-tier KV cache (ADR-004): hot f32 ring → warm int8 → archive int4.

Reference: ruvector-mincut-gated-transformer/src/kv_cache/ (9 files,
~4k LoC) — HotBuffer (hot_buffer.rs), KIVI-style quantizer (kivi.rs: keys
per-channel, values per-token), archive tier, tier policy/manager.

TPU design: the cache is a functional pytree of POINTER-BASED ring buffers
with static capacities. Each `kv_cache_append` performs O(1) row writes:
the write slot is `position % capacity` per tier, the token being
overwritten cascades down a tier (hot→warm quantizes to int8, warm→archive
requantizes to int4), and nothing is ever rolled or copied whole
(the r1 formulation `jnp.roll`-ed every tier every token — O(capacity)
bytes/token; this one moves O(1) rows/token).

Slots are therefore NOT in chronological order; each tier carries a
position array (`*_pos`, -1 = empty) from which `kv_cache_read` builds the
validity mask and `kv_cache_positions` exposes absolute token positions
for windowed/causal masking. Attention itself is order-invariant.

Conditional writes (gate-frozen KV) are O(1) too: every buffer owns one
extra scratch row at index `capacity`; a disabled append redirects all
writes there instead of `jnp.where`-selecting whole buffers.

Dequantization of warm/archive happens in `kv_cache_read` and is fused by
XLA into the attention matmuls — quantized tiers cost bandwidth, not
extra passes.
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
    # Every buffer is [capacity + 1, H, hd]; row `capacity` is the scratch
    # row that disabled/inactive writes land in.
    hot_k: jax.Array
    hot_v: jax.Array
    hot_pos: jax.Array       # int32 [hot_cap + 1], -1 = empty
    # warm: int8 + per-(token, head) scales [warm_cap + 1, H, 1]
    warm_k: jax.Array
    warm_k_scale: jax.Array
    warm_v: jax.Array
    warm_v_scale: jax.Array
    warm_pos: jax.Array
    # archive: int4 stored as int8 in [-7, 7], coarser scale
    arch_k: jax.Array
    arch_k_scale: jax.Array
    arch_v: jax.Array
    arch_v_scale: jax.Array
    arch_pos: jax.Array
    # total tokens appended (writes actually committed)
    length: jax.Array        # scalar int32


def kv_cache_init(cfg: KVCacheConfig) -> KVCacheState:
    h, d = cfg.heads, cfg.head_dim
    z = lambda c: jnp.zeros((c + 1, h, d), jnp.float32)
    zi = lambda c: jnp.zeros((c + 1, h, d), jnp.int8)
    zs = lambda c: jnp.ones((c + 1, h, 1), jnp.float32)
    zp = lambda c: jnp.full((c + 1,), -1, jnp.int32)
    return KVCacheState(
        hot_k=z(cfg.hot_capacity), hot_v=z(cfg.hot_capacity),
        hot_pos=zp(cfg.hot_capacity),
        warm_k=zi(cfg.warm_capacity), warm_k_scale=zs(cfg.warm_capacity),
        warm_v=zi(cfg.warm_capacity), warm_v_scale=zs(cfg.warm_capacity),
        warm_pos=zp(cfg.warm_capacity),
        arch_k=zi(cfg.archive_capacity), arch_k_scale=zs(cfg.archive_capacity),
        arch_v=zi(cfg.archive_capacity), arch_v_scale=zs(cfg.archive_capacity),
        arch_pos=zp(cfg.archive_capacity),
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
    cfg: KVCacheConfig, state: KVCacheState, k: jax.Array, v: jax.Array,
    enabled: jax.Array | bool = True,
) -> KVCacheState:
    """Append one token's (k, v) [H, hd]; O(1) row writes.

    `enabled` may be a traced bool: when False (gate froze KV writes) all
    writes go to the scratch rows and `length` does not advance — the
    whole-buffer select the r1 decode loop paid per layer per token is gone.
    """
    enabled = jnp.asarray(enabled, jnp.bool_)
    pos = state.length                      # absolute position of this token
    hc, wc, ac = cfg.hot_capacity, cfg.warm_capacity, cfg.archive_capacity

    # --- hot tier ---
    hot_real = pos % hc
    hot_slot = jnp.where(enabled, hot_real, hc)
    # token being overwritten (only meaningful when pos >= hc)
    evict_k = state.hot_k[hot_real]
    evict_v = state.hot_v[hot_real]
    new_hot_k = jax.lax.dynamic_update_index_in_dim(state.hot_k, k, hot_slot, 0)
    new_hot_v = jax.lax.dynamic_update_index_in_dim(state.hot_v, v, hot_slot, 0)
    new_hot_pos = state.hot_pos.at[hot_slot].set(pos)

    # --- warm tier (receives the hot eviction) ---
    do_warm = enabled & (pos >= hc)
    warm_real = (pos - hc) % wc
    warm_slot = jnp.where(do_warm, warm_real, wc)
    warm_evict_k = state.warm_k[warm_real].astype(jnp.float32) * state.warm_k_scale[warm_real]
    warm_evict_v = state.warm_v[warm_real].astype(jnp.float32) * state.warm_v_scale[warm_real]
    qk, sk = _quant_token(evict_k, 8)
    qv, sv = _quant_token(evict_v, 8)
    upd = jax.lax.dynamic_update_index_in_dim
    new_warm_k = upd(state.warm_k, qk, warm_slot, 0)
    new_warm_k_s = upd(state.warm_k_scale, sk, warm_slot, 0)
    new_warm_v = upd(state.warm_v, qv, warm_slot, 0)
    new_warm_v_s = upd(state.warm_v_scale, sv, warm_slot, 0)
    # position entering warm is the evicted hot token's absolute position
    new_warm_pos = state.warm_pos.at[warm_slot].set(pos - hc)

    # --- archive tier (receives the warm eviction; oldest rolls off) ---
    do_arch = enabled & (pos >= hc + wc)
    arch_real = (pos - hc - wc) % ac
    arch_slot = jnp.where(do_arch, arch_real, ac)
    ak, ask = _quant_token(warm_evict_k, 4)
    av, asv = _quant_token(warm_evict_v, 4)
    new_arch_k = upd(state.arch_k, ak, arch_slot, 0)
    new_arch_k_s = upd(state.arch_k_scale, ask, arch_slot, 0)
    new_arch_v = upd(state.arch_v, av, arch_slot, 0)
    new_arch_v_s = upd(state.arch_v_scale, asv, arch_slot, 0)
    new_arch_pos = state.arch_pos.at[arch_slot].set(pos - hc - wc)

    return KVCacheState(
        hot_k=new_hot_k, hot_v=new_hot_v, hot_pos=new_hot_pos,
        warm_k=new_warm_k, warm_k_scale=new_warm_k_s,
        warm_v=new_warm_v, warm_v_scale=new_warm_v_s, warm_pos=new_warm_pos,
        arch_k=new_arch_k, arch_k_scale=new_arch_k_s,
        arch_v=new_arch_v, arch_v_scale=new_arch_v_s, arch_pos=new_arch_pos,
        length=state.length + enabled.astype(jnp.int32),
    )


def kv_cache_positions(cfg: KVCacheConfig, state: KVCacheState) -> jax.Array:
    """Absolute token position per slot in read order [archive|warm|hot];
    -1 marks empty slots. Slot order is ring order, not chronological —
    sort by this array to reconstruct the sequence."""
    # Each tier's stored value is already the token's ABSOLUTE position:
    # the w-th token pushed into warm is the token with absolute position w
    # (hot evicts in order), and likewise for archive.
    return jnp.concatenate(
        [state.arch_pos[:-1], state.warm_pos[:-1], state.hot_pos[:-1]], axis=0)


def kv_cache_read(
    cfg: KVCacheConfig, state: KVCacheState
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Materialize effective (K, V, valid_mask), shapes [T_total, H, hd]
    with T_total = archive+warm+hot capacities. Slots are in ring order
    (attention is order-invariant); `kv_cache_positions` gives each slot's
    absolute position. A warm/archive slot only counts as live while its
    token has not yet been superseded by a newer write of the same ring
    index — the position arrays encode exactly that."""
    k = jnp.concatenate([
        state.arch_k[:-1].astype(jnp.float32) * state.arch_k_scale[:-1],
        state.warm_k[:-1].astype(jnp.float32) * state.warm_k_scale[:-1],
        state.hot_k[:-1],
    ], axis=0)
    v = jnp.concatenate([
        state.arch_v[:-1].astype(jnp.float32) * state.arch_v_scale[:-1],
        state.warm_v[:-1].astype(jnp.float32) * state.warm_v_scale[:-1],
        state.hot_v[:-1],
    ], axis=0)
    hc, wc, ac = cfg.hot_capacity, cfg.warm_capacity, cfg.archive_capacity
    # live windows per tier, in absolute-position terms
    L = state.length
    hot_lo = jnp.maximum(L - hc, 0)
    warm_lo = jnp.maximum(L - hc - wc, 0)          # positions now in warm
    arch_lo = jnp.maximum(L - hc - wc - ac, 0)
    pos = kv_cache_positions(cfg, state)
    tier = jnp.concatenate([
        jnp.zeros((ac,), jnp.int32), jnp.ones((wc,), jnp.int32),
        jnp.full((hc,), 2, jnp.int32)])
    lo = jnp.where(tier == 2, hot_lo, jnp.where(tier == 1, warm_lo, arch_lo))
    hi = jnp.where(tier == 2, L,
                   jnp.where(tier == 1, hot_lo, warm_lo))
    mask = ((pos >= 0) & (pos >= lo) & (pos < hi)).astype(jnp.float32)
    return k, v, mask


def kv_cache_flush(cfg: KVCacheConfig, state: KVCacheState) -> KVCacheState:
    """FlushKv intervention (gate decision) — reset to empty."""
    return kv_cache_init(cfg)
