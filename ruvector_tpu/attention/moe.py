"""Mixture-of-Experts attention.

Reference: ruvector-attention/src/moe/ — learned router over expert types
(Standard scaled-dot / Linear-kernel / Hyperbolic, expert.rs), top-k routing
(router.rs), weighted mixture of expert outputs (moe_attention.rs).

TPU form: all experts run batched (they're cheap relative to dispatch
overhead at graph-neighborhood sizes), and routing is a differentiable
soft top-k blend — dense compute with sparse weights is the right trade on
MXU hardware at this scale, and keeps the whole thing one jitted graph.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.attention.hyperbolic import hyperbolic_attention
from ruvector_tpu.attention.linear_attn import (
    LinearAttentionConfig,
    linear_attention_apply,
    linear_attention_init,
)
from ruvector_tpu.attention.scaled_dot import scaled_dot_attention
from ruvector_tpu.nn.core import linear_apply, linear_init

EXPERT_TYPES = ("standard", "linear", "hyperbolic")


@dataclasses.dataclass(frozen=True)
class MoEAttentionConfig:
    dim: int = 256
    num_experts: int = 3          # one per expert type by default
    top_k: int = 2
    num_features: int = 64        # for the linear expert
    jitter_noise: float = 0.0


def moe_attention_init(key, cfg: MoEAttentionConfig) -> dict:
    k_router, k_linear = jax.random.split(key)
    return {
        "router": linear_init(k_router, cfg.dim, cfg.num_experts),
        "linear_expert": linear_attention_init(
            k_linear, LinearAttentionConfig(cfg.dim, cfg.num_features)
        ),
    }


def moe_attention_apply(
    params: dict,
    cfg: MoEAttentionConfig,
    q: jax.Array,          # [B, D]
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, D]
    mask: jax.Array | None = None,
    rng: jax.Array | None = None,
) -> jax.Array:
    logits = linear_apply(params["router"], q)           # [B, E]
    if cfg.jitter_noise > 0 and rng is not None:
        logits = logits + cfg.jitter_noise * jax.random.normal(rng, logits.shape)

    # top-k gate: keep k largest router logits per query, softmax over them
    top_k = min(cfg.top_k, cfg.num_experts)
    kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
    gate_logits = jnp.where(logits >= kth, logits, -jnp.inf)
    gates = jax.nn.softmax(gate_logits, axis=-1)         # [B, E]

    outs = []
    for e in range(cfg.num_experts):
        kind = EXPERT_TYPES[e % len(EXPERT_TYPES)]
        if kind == "standard":
            outs.append(scaled_dot_attention(q, k, v, mask))
        elif kind == "linear":
            outs.append(
                linear_attention_apply(
                    params["linear_expert"],
                    LinearAttentionConfig(cfg.dim, cfg.num_features),
                    q, k, v, mask,
                )
            )
        else:
            outs.append(hyperbolic_attention(q, k, v, mask))
    stacked = jnp.stack(outs, axis=1)                    # [B, E, D]
    return jnp.einsum("be,bed->bd", gates, stacked)


register_attention(
    AttentionMechanism(
        name="moe",
        init=moe_attention_init,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            moe_attention_apply(params, cfg, q, k, v, mask, **kw),
        default_config=MoEAttentionConfig(),
    )
)
