"""Graph rotary position embeddings (GraphRoPE).

Reference: ruvector-attention/src/graph/rope.rs — RoPE where "position" is a
graph-topological distance (hop count / shortest path) instead of sequence
index. Frequencies inv_freq_i = base^(-2i/dim); positions scale by
1/scaling_factor (linear context extension). Rotation is applied to (q, k)
before scoring; scores then depend on *relative* graph distance.

Also provides the context-extension scaling family of the gated transformer
(ruvector-mincut-gated-transformer/src/rope.rs:53-62): linear / NTK-aware /
YaRN, selected by `scaling` in `rope_tables`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_tables(
    dim: int,
    max_position: int,
    base: float = 10000.0,
    scaling: str = "none",
    scaling_factor: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables [max_position, dim/2].

    scaling:
      none   — vanilla RoPE
      linear — positions divided by scaling_factor (rope.rs Linear)
      ntk    — base multiplied by scaling_factor^(dim/(dim-2)) (NTK-aware)
      yarn   — NTK-by-parts interpolation ramp between high/low freq bands
    """
    half = dim // 2
    i = jnp.arange(half, dtype=jnp.float32)
    if scaling == "ntk" and scaling_factor != 1.0:
        base = base * scaling_factor ** (dim / max(dim - 2, 1))
    inv_freq = 1.0 / (base ** (2.0 * i / dim))

    pos = jnp.arange(max_position, dtype=jnp.float32)
    if scaling == "linear" and scaling_factor != 1.0:
        pos = pos / scaling_factor
    if scaling == "yarn" and scaling_factor != 1.0:
        # NTK-by-parts: interpolate only low-frequency bands
        lo, hi = 1.0, 32.0
        wavelen = 2.0 * jnp.pi / inv_freq
        ramp = jnp.clip((wavelen - lo) / (hi - lo), 0.0, 1.0)
        inv_freq = inv_freq / scaling_factor * ramp + inv_freq * (1.0 - ramp)

    angles = pos[:, None] * inv_freq[None, :]  # [P, half]
    return jnp.cos(angles), jnp.sin(angles)


def rope_rotate(
    x: jax.Array,            # [..., dim]
    positions: jax.Array,    # [...] int32 graph distances
    cos_table: jax.Array,    # [P, dim/2]
    sin_table: jax.Array,
) -> jax.Array:
    """Rotate feature pairs (x_2i, x_2i+1) by the position's angle."""
    cos = cos_table[positions]   # [..., half]
    sin = sin_table[positions]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    out = jnp.stack([r1, r2], axis=-1)
    return out.reshape(x.shape)


def graph_rope_encode(
    q: jax.Array,            # [B, D]
    k: jax.Array,            # [B, S, D]
    hop_distance: jax.Array,  # [B, S] int32 graph distance of each key
    cos_table: jax.Array,
    sin_table: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Apply RoPE: query at distance 0, keys at their hop distances."""
    zero = jnp.zeros(q.shape[:-1], dtype=jnp.int32)
    q_rot = rope_rotate(q, zero, cos_table, sin_table)
    k_rot = rope_rotate(k, hop_distance, cos_table, sin_table)
    return q_rot, k_rot
