"""Int8 symmetric quantization for deterministic MXU inference.

The reference runs Q15 fixed-point scalar GEMMs for determinism on CPU
(q15.rs, kernel/qgemm.rs). On TPU the deterministic integer path is int8
matmul on the MXU with int32 accumulation (`preferred_element_type`), with
per-output-channel f32 scales — same round-trip-stable property (same
inputs ⇒ same outputs), ~4x the f32 matmul throughput.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight_int8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: returns (w_q [in,out] int8,
    scale [out] f32) with w ≈ w_q * scale."""
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_activation_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row (token) symmetric int8 activation quantization."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def dequantize_int8(w_q: jax.Array, scale: jax.Array) -> jax.Array:
    return w_q.astype(jnp.float32) * scale


def int8_matmul(
    x: jax.Array,          # [.., in] f32 activations
    w_q: jax.Array,        # [in, out] int8
    w_scale: jax.Array,    # [out] f32
    bias: jax.Array | None = None,
) -> jax.Array:
    """Quantize-activations → int8×int8 MXU matmul (int32 accum) → rescale.

    Deterministic: integer accumulation has no reassociation variance.
    """
    x_q, x_scale = quantize_activation_int8(x)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * w_scale
    if bias is not None:
        out = out + bias
    return out
