"""Q15 fixed-point batch ops — wire-format parity.

Reference: ruvector-mincut-gated-transformer/src/q15.rs — Q15 is the
reference's deterministic integer format (int16, 15 fractional bits,
range [-1, 1)). The TPU compute path uses int8 MXU matmuls instead
(transformer/quant.py), but Q15 conversion/arithmetic is kept for
interchange with reference-format weights, gate packets
(boundary_concentration_q15 etc.), and bit-exact cross-validation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Q15_ONE = 32768
Q15_MAX = 32767
Q15_MIN = -32768


def f32_to_q15(x: jax.Array) -> jax.Array:
    """Saturating f32 -> Q15 (q15.rs f32_to_q15_batch)."""
    return jnp.clip(jnp.round(x * Q15_ONE), Q15_MIN, Q15_MAX).astype(jnp.int16)


def q15_to_f32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32) / Q15_ONE


def q15_add(a: jax.Array, b: jax.Array) -> jax.Array:
    """Saturating Q15 add (q15_batch_add)."""
    s = a.astype(jnp.int32) + b.astype(jnp.int32)
    return jnp.clip(s, Q15_MIN, Q15_MAX).astype(jnp.int16)


def q15_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Q15 multiply with rounding: (a*b + 2^14) >> 15 (q15_batch_mul)."""
    prod = a.astype(jnp.int32) * b.astype(jnp.int32)
    out = (prod + (1 << 14)) >> 15
    return jnp.clip(out, Q15_MIN, Q15_MAX).astype(jnp.int16)


def q15_lerp(a: jax.Array, b: jax.Array, t_q15: jax.Array) -> jax.Array:
    """a + t*(b-a) in Q15 (q15_batch_lerp)."""
    diff = b.astype(jnp.int32) - a.astype(jnp.int32)
    delta = (diff * t_q15.astype(jnp.int32) + (1 << 14)) >> 15
    return jnp.clip(a.astype(jnp.int32) + delta, Q15_MIN, Q15_MAX).astype(jnp.int16)


def q15_dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Q15 dot product with int32 accumulation -> Q15 scalar (q15_dot).

    Deterministic: integer accumulate has no reassociation variance.
    """
    acc = jnp.sum(a.astype(jnp.int32) * b.astype(jnp.int32), axis=-1)
    return jnp.clip((acc + (1 << 14)) >> 15, Q15_MIN, Q15_MAX).astype(jnp.int16)


def q15_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """[M, K] x [K, N] Q15 matmul, int32 accumulate, Q15 out."""
    acc = jax.lax.dot_general(
        a.astype(jnp.int32), b.astype(jnp.int32),
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return jnp.clip((acc + (1 << 14)) >> 15, Q15_MIN, Q15_MAX).astype(jnp.int16)
