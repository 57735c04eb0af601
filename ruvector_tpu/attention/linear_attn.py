"""Linear attention via kernel feature maps (Performer-style).

Reference: ruvector-attention/src/sparse/linear.rs — FAVOR+ softmax
approximation plus ReLU/ELU kernels, O(S * F * D). Batched: feature maps are
one GEMM, and the attention reduces to two einsum contractions
(phi_q @ (phi_k^T V)) — MXU-shaped by construction.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention


@dataclasses.dataclass(frozen=True)
class LinearAttentionConfig:
    dim: int
    num_features: int = 64
    kernel: str = "softmax"  # softmax | relu | elu


def linear_attention_init(key, cfg: LinearAttentionConfig) -> dict:
    """Random Gaussian projection [F, D], scaled by 1/sqrt(D) (linear.rs:73-77)."""
    proj = jax.random.normal(key, (cfg.num_features, cfg.dim)) / jnp.sqrt(
        jnp.asarray(cfg.dim, jnp.float32)
    )
    return {"proj": proj}


def _feature_map(x: jax.Array, proj: jax.Array, kernel: str) -> jax.Array:
    """phi(x): [..., D] -> [..., F] (linear.rs:84-110)."""
    p = jnp.einsum("...d,fd->...f", x, proj)
    if kernel == "softmax":
        # FAVOR+: exp(proj - ||x||^2/2)/sqrt(F)
        norm_sq = jnp.sum(x * x, axis=-1, keepdims=True)
        f = proj.shape[0]
        return jnp.exp(p - norm_sq / 2.0) / jnp.sqrt(jnp.asarray(f, jnp.float32))
    if kernel == "relu":
        return jnp.maximum(p, 0.0)
    if kernel == "elu":
        return jnp.where(p >= 0, p, jnp.exp(p) - 1.0)
    raise ValueError(f"unknown kernel {kernel}")


def linear_attention_apply(
    params: dict,
    cfg: LinearAttentionConfig,
    q: jax.Array,          # [B, D]
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv]
    mask: jax.Array | None = None,  # [B, S]
) -> jax.Array:
    """out = phi(q) @ (phi(k)^T v) / (phi(q) @ phi(k)^T 1)."""
    proj = params["proj"]
    phi_q = _feature_map(q, proj, cfg.kernel)            # [B, F]
    phi_k = _feature_map(k, proj, cfg.kernel)            # [B, S, F]
    if mask is not None:
        phi_k = phi_k * (mask[..., None] > 0)
    kv = jnp.einsum("bsf,bsd->bfd", phi_k, v)            # [B, F, Dv]
    normalizer = jnp.einsum("bf,bsf->b", phi_q, phi_k)   # [B]
    out = jnp.einsum("bf,bfd->bd", phi_q, kv)
    return out / jnp.maximum(normalizer, 1e-8)[:, None]


register_attention(
    AttentionMechanism(
        name="linear",
        init=linear_attention_init,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            linear_attention_apply(params, cfg, q, k, v, mask),
        default_config=LinearAttentionConfig(dim=64),
    )
)
