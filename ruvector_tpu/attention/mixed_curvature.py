"""Mixed-curvature and Lorentz-model attention.

Reference: ruvector-attention/src/hyperbolic/{mixed_curvature,
lorentz_cascade}.rs and curvature/ (fused mixed-curvature + quantizer) —
product-manifold attention over (Euclidean × Hyperbolic × Spherical)
factors with per-factor curvature, and a Lorentz (hyperboloid) cascade that
scores in the Lorentz model for numerical stability far from the origin.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.attention.hyperbolic import poincare_distance, project_to_ball
from ruvector_tpu.ops.segment import masked_softmax


@dataclasses.dataclass(frozen=True)
class MixedCurvatureConfig:
    dim: int = 96                 # split evenly across the three factors
    curvature_hyp: float = 1.0    # negative curvature magnitude
    curvature_sph: float = 1.0    # positive curvature magnitude
    temperature: float = 1.0

    @property
    def factor_dim(self) -> int:
        return self.dim // 3


def spherical_distance(u: jax.Array, v: jax.Array, c: float = 1.0) -> jax.Array:
    """Great-circle distance on the radius-1/sqrt(c) sphere (projected)."""
    un = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-8)
    vn = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    cos = jnp.clip(jnp.sum(un * vn, axis=-1), -1.0, 1.0)
    return jnp.arccos(cos) / (c ** 0.5)


def mixed_curvature_distance(
    q: jax.Array, k: jax.Array, cfg: MixedCurvatureConfig
) -> jax.Array:
    """d² = d_E² + d_H² + d_S² over the three factor subspaces."""
    f = cfg.factor_dim
    qe, qh, qs = q[..., :f], q[..., f:2 * f], q[..., 2 * f:3 * f]
    ke, kh, ks = k[..., :f], k[..., f:2 * f], k[..., 2 * f:3 * f]
    de = jnp.linalg.norm(qe - ke, axis=-1)
    dh = poincare_distance(
        project_to_ball(qh, cfg.curvature_hyp),
        project_to_ball(kh, cfg.curvature_hyp),
        cfg.curvature_hyp,
    )
    ds = spherical_distance(qs, ks, cfg.curvature_sph)
    return jnp.sqrt(de ** 2 + dh ** 2 + ds ** 2 + 1e-12)


def mixed_curvature_attention(
    q: jax.Array,          # [B, D]
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv]
    mask: jax.Array | None = None,
    cfg: MixedCurvatureConfig = MixedCurvatureConfig(),
) -> jax.Array:
    b, s, d = k.shape
    if mask is None:
        mask = jnp.ones((b, s), dtype=q.dtype)
    dist = mixed_curvature_distance(q[:, None, :], k, cfg)
    attn = masked_softmax(-dist / cfg.temperature, mask, axis=-1)
    return jnp.einsum("bs,bsd->bd", attn, v)


# --- Lorentz (hyperboloid) model --------------------------------------------

def to_lorentz(x: jax.Array, c: float = 1.0) -> jax.Array:
    """Lift Poincaré-ball points to the hyperboloid: adds the time
    coordinate x0 = sqrt(1/c + ||x||²)."""
    x0 = jnp.sqrt(1.0 / c + jnp.sum(x * x, axis=-1, keepdims=True))
    return jnp.concatenate([x0, x], axis=-1)


def lorentz_inner(u: jax.Array, v: jax.Array) -> jax.Array:
    """Minkowski inner product <u,v>_L = -u0·v0 + Σ ui·vi."""
    return -u[..., 0] * v[..., 0] + jnp.sum(u[..., 1:] * v[..., 1:], axis=-1)


def lorentz_distance(u: jax.Array, v: jax.Array, c: float = 1.0) -> jax.Array:
    """d(u,v) = (1/sqrt(c)) arccosh(-c <u,v>_L), stable far from origin."""
    arg = jnp.maximum(-c * lorentz_inner(u, v), 1.0 + 1e-7)
    return jnp.arccosh(arg) / (c ** 0.5)


def lorentz_cascade_attention(
    q: jax.Array,          # [B, D] (ambient euclidean; projected per stage)
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv]
    mask: jax.Array | None = None,
    curvatures: tuple = (0.5, 1.0, 2.0),
    temperature: float = 1.0,
) -> jax.Array:
    """Cascade over curvatures (lorentz_cascade.rs): score at each curvature
    in the Lorentz model, average the attention distributions — a
    multi-scale hierarchy reader."""
    b, s, d = k.shape
    if mask is None:
        mask = jnp.ones((b, s), dtype=q.dtype)
    attn_sum = jnp.zeros((b, s))
    for c in curvatures:
        qb = project_to_ball(q, c)
        kb = project_to_ball(k, c)
        ql = to_lorentz(qb, c)
        kl = to_lorentz(kb, c)
        dist = lorentz_distance(ql[:, None, :], kl, c)
        attn_sum = attn_sum + masked_softmax(-dist / temperature, mask, axis=-1)
    attn = attn_sum / len(curvatures)
    # renormalize (average of distributions already sums to 1 on valid rows)
    return jnp.einsum("bs,bsd->bd", attn, v)


register_attention(
    AttentionMechanism(
        name="mixed_curvature",
        init=None,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            mixed_curvature_attention(q, k, v, mask,
                                      cfg or MixedCurvatureConfig()),
        default_config=MixedCurvatureConfig(),
    )
)

register_attention(
    AttentionMechanism(
        name="lorentz_cascade",
        init=None,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            lorentz_cascade_attention(q, k, v, mask, **kw),
    )
)
