"""Batched distance / similarity ops.

Replaces the reference's per-pair SIMD distance kernels
(ruvector-core/src/distance.rs:9-43, simd_intrinsics.rs): on TPU, distance
computation is a batched matmul on the MXU — one [B, D] x [D, N] contraction
computes B*N similarities at once, which is the shape the hardware wants.

`cosine_similarity` matches the reference's f64-accumulated norm semantics
(ruvector-gnn/src/search.rs:4-26) including the zero-norm -> 0 convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cosine_similarity(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cosine similarity along the last axis; 0 where either norm is 0.

    Broadcasts like jnp: [D]x[D] -> scalar, [N,D]x[D] -> [N], etc.
    Norms accumulate in f32 via stable two-level sum (reference uses f64 on
    CPU, search.rs:9-19; on TPU f32 + jnp.linalg.norm's scaling is within
    1e-6 of it for unit-scale data, asserted in tests).
    """
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    denom = na * nb
    return jnp.where(denom > 0, dot / jnp.where(denom > 0, denom, 1.0), 0.0)


def pairwise_dot(q: jax.Array, x: jax.Array) -> jax.Array:
    """[B, D] x [N, D] -> [B, N] dot products (MXU)."""
    return jnp.dot(q, x.T, preferred_element_type=jnp.float32)


def pairwise_cosine(q: jax.Array, x: jax.Array) -> jax.Array:
    """[B, D] x [N, D] -> [B, N] cosine similarities; zero-norm rows -> 0."""
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    xn = jnp.linalg.norm(x, axis=-1, keepdims=True)
    qs = jnp.where(qn > 0, q / jnp.where(qn > 0, qn, 1.0), 0.0)
    xs = jnp.where(xn > 0, x / jnp.where(xn > 0, xn, 1.0), 0.0)
    return jnp.dot(qs, xs.T, preferred_element_type=jnp.float32)


def pairwise_euclidean(q: jax.Array, x: jax.Array) -> jax.Array:
    """[B, D] x [N, D] -> [B, N] squared Euclidean distances via matmul."""
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    xx = jnp.sum(x * x, axis=-1)[None, :]
    d2 = qq + xx - 2.0 * jnp.dot(q, x.T, preferred_element_type=jnp.float32)
    return jnp.maximum(d2, 0.0)
