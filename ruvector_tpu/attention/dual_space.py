"""Dual-space attention: blended Euclidean + hyperbolic scoring.

Reference: ruvector-attention/src/graph/dual_space.rs — scores are a
weighted blend of Euclidean dot-product similarity and negative Poincaré
distance, softmax over the blend; weights (w_e, w_h) optionally learned.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.attention.hyperbolic import poincare_distance, project_to_ball
from ruvector_tpu.ops.segment import masked_softmax


@dataclasses.dataclass(frozen=True)
class DualSpaceConfig:
    dim: int = 256
    curvature: float = 1.0
    euclidean_weight: float = 0.5
    hyperbolic_weight: float = 0.5
    temperature: float = 1.0
    learn_weights: bool = False


def dual_space_init(key, cfg: DualSpaceConfig) -> dict:
    """Learnable blend logits when cfg.learn_weights (softmaxed at apply)."""
    return {
        "blend": jnp.log(jnp.asarray(
            [max(cfg.euclidean_weight, 1e-6), max(cfg.hyperbolic_weight, 1e-6)]
        ))
    }


def dual_space_attention(
    q: jax.Array,          # [B, D]
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv]
    mask: jax.Array | None = None,
    cfg: DualSpaceConfig = DualSpaceConfig(),
    params: dict | None = None,
) -> jax.Array:
    b, s, d = k.shape
    if mask is None:
        mask = jnp.ones((b, s), dtype=q.dtype)

    # Euclidean branch: scaled dot product
    euc = jnp.einsum("bd,bsd->bs", q, k) / (d ** 0.5)

    # hyperbolic branch: negative Poincaré distance of ball-projected points
    qb = project_to_ball(q, cfg.curvature)
    kb = project_to_ball(k, cfg.curvature)
    hyp = -poincare_distance(qb[:, None, :], kb, cfg.curvature)

    if cfg.learn_weights and params is not None:
        w = jax.nn.softmax(params["blend"])
        we, wh = w[0], w[1]
    else:
        total = cfg.euclidean_weight + cfg.hyperbolic_weight
        we = cfg.euclidean_weight / total
        wh = cfg.hyperbolic_weight / total

    scores = (we * euc + wh * hyp) / cfg.temperature
    attn = masked_softmax(scores, mask, axis=-1)
    return jnp.einsum("bs,bsd->bd", attn, v)


register_attention(
    AttentionMechanism(
        name="dual_space",
        init=dual_space_init,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            dual_space_attention(q, k, v, mask, cfg or DualSpaceConfig(), params),
        default_config=DualSpaceConfig(),
    )
)
