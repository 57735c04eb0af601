"""Poincaré-ball hyperbolic geometry ops and hyperbolic attention.

Reference: ruvector-attention/src/hyperbolic/poincare.rs (exp_map, log_map,
mobius_add, poincare_distance, project_to_ball — exported at lib.rs:74-77)
and hyperbolic_attention.rs. All ops are batched over arbitrary leading axes
and numerically guarded exactly as the reference (EPS=1e-7 clamps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.ops.segment import masked_softmax

EPS = 1e-7


def _nsq(x):
    return jnp.sum(x * x, axis=-1, keepdims=True)


def project_to_ball(x: jax.Array, c: float = 1.0, eps: float = EPS) -> jax.Array:
    """Clip to the open Poincaré ball of curvature -c: ||x|| < (1-eps)/sqrt(c)."""
    c = abs(c)
    max_norm = (1.0 - eps) / (c ** 0.5)
    norm = jnp.sqrt(jnp.maximum(_nsq(x), EPS * EPS))
    scale = jnp.minimum(1.0, max_norm / norm)
    return x * scale


def poincare_distance(u: jax.Array, v: jax.Array, c: float = 1.0) -> jax.Array:
    """d_c(u,v) = (1/sqrt(c)) acosh(1 + 2c||u-v||^2 / ((1-c||u||^2)(1-c||v||^2)))."""
    c = abs(c)
    sqrt_c = c ** 0.5
    diff_sq = jnp.sum((u - v) ** 2, axis=-1)
    lam_u = 1.0 - c * jnp.sum(u * u, axis=-1)
    lam_v = 1.0 - c * jnp.sum(v * v, axis=-1)
    arg = 1.0 + 2.0 * c * diff_sq / jnp.maximum(lam_u * lam_v, EPS)
    return jnp.arccosh(jnp.maximum(arg, 1.0)) / sqrt_c


def mobius_add(u: jax.Array, v: jax.Array, c: float = 1.0) -> jax.Array:
    """Möbius addition u ⊕_c v (poincare.rs:43-60), projected into the ball."""
    c = abs(c)
    uu, vv = _nsq(u), _nsq(v)
    uv = jnp.sum(u * v, axis=-1, keepdims=True)
    coef_u = 1.0 + 2.0 * c * uv + c * vv
    coef_v = 1.0 - c * uu
    denom = 1.0 + 2.0 * c * uv + c * c * uu * vv
    out = (coef_u * u + coef_v * v) / jnp.maximum(denom, EPS)
    return project_to_ball(out, c)


def mobius_scalar_mult(r: float, v: jax.Array, c: float = 1.0) -> jax.Array:
    """r ⊗_c v = (1/sqrt(c)) tanh(r atanh(sqrt(c)||v||)) v/||v||."""
    c = abs(c)
    sqrt_c = c ** 0.5
    norm = jnp.sqrt(jnp.maximum(_nsq(v), EPS * EPS))
    arg = jnp.minimum(sqrt_c * norm, 1.0 - EPS)
    scale = jnp.tanh(r * jnp.arctanh(arg)) / (sqrt_c * norm)
    return jnp.where(norm > EPS, scale * v, v)


def exp_map(v: jax.Array, p: jax.Array, c: float = 1.0) -> jax.Array:
    """Exponential map of tangent v at point p (poincare.rs:78-96)."""
    c = abs(c)
    sqrt_c = c ** 0.5
    lam_p = 1.0 / jnp.maximum(1.0 - c * _nsq(p), EPS)
    norm_v = jnp.sqrt(jnp.maximum(_nsq(v), EPS * EPS))
    norm_vp = lam_p * norm_v
    coef = jnp.tanh(sqrt_c * norm_vp / 2.0) / (sqrt_c * norm_vp)
    transported = coef * v
    out = mobius_add(p, transported, c)
    return jnp.where(norm_v > EPS, out, jnp.broadcast_to(p, out.shape))


def log_map(y: jax.Array, p: jax.Array, c: float = 1.0) -> jax.Array:
    """Logarithmic map of y into the tangent space at p (poincare.rs:99-118):
    coef = (2 / (sqrt_c * lambda_p)) atanh(sqrt_c ||-p⊕y||) / ||-p⊕y||,
    with lambda_p = 1/(1 - c||p||^2)."""
    c = abs(c)
    sqrt_c = c ** 0.5
    lam_p = 1.0 / jnp.maximum(1.0 - c * _nsq(p), EPS)
    w = mobius_add(-p, y, c)
    norm_w = jnp.sqrt(jnp.maximum(_nsq(w), EPS * EPS))
    arg = jnp.minimum(sqrt_c * norm_w, 1.0 - EPS)
    coef = (2.0 / (sqrt_c * lam_p)) * jnp.arctanh(arg) / norm_w
    return jnp.where(norm_w > EPS, coef * w, jnp.zeros_like(w))


def hyperbolic_attention(
    q: jax.Array,          # [B, D] points in the ball
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv] (euclidean values)
    mask: jax.Array | None = None,
    c: float = 1.0,
    temperature: float = 1.0,
) -> jax.Array:
    """Attention weighted by negative Poincaré distance.

    scores = -d_c(q, k) / temperature -> masked softmax -> weighted value sum
    (tangent-space aggregation: values are treated euclidean, matching the
    reference's HyperbolicAttention distance-softmax design).
    """
    qp = project_to_ball(q, c)
    kp = project_to_ball(k, c)
    if mask is None:
        mask = jnp.ones(k.shape[:-1], dtype=q.dtype)
    dist = poincare_distance(qp[:, None, :], kp, c)   # [B, S]
    scores = -dist / temperature
    attn = masked_softmax(scores, mask, axis=-1)
    return jnp.einsum("bs,bsd->bd", attn, v)


register_attention(
    AttentionMechanism(name="hyperbolic", init=None,
                       apply=lambda params, cfg, q, k, v, mask=None, **kw:
                       hyperbolic_attention(q, k, v, mask, **kw))
)
