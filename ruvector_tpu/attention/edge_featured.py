"""Edge-featured graph attention (GATv2-style).

Reference: ruvector-attention/src/graph/edge_featured.rs:87-258 — per-head
scores a_src·(W h_i) + a_dst·(W h_j) + a_edge·(W_e e_ij) through LeakyReLU,
softmax over neighbors, weighted sum of transformed values; heads concat or
mean. Batched over all nodes: the per-head transforms are batched GEMMs and
the score is one fused einsum — the SDDMM shape.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.nn.core import xavier_normal
from ruvector_tpu.ops.segment import masked_softmax


@dataclasses.dataclass(frozen=True)
class EdgeFeaturedConfig:
    node_dim: int = 256
    edge_dim: int = 64
    num_heads: int = 4
    concat_heads: bool = True
    negative_slope: float = 0.2

    @property
    def head_dim(self) -> int:
        return self.node_dim // self.num_heads


def edge_featured_init(key, cfg: EdgeFeaturedConfig) -> dict:
    """Weights per edge_featured.rs:98-141: W_node/W_edge xavier-scaled,
    attention vectors scaled by 1/sqrt(head_dim)."""
    hd, h = cfg.head_dim, cfg.num_heads
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    attn_scale = (1.0 / hd) ** 0.5
    return {
        # [H, node_dim, head_dim] per-head node transform
        "w_node": jnp.stack(
            [xavier_normal(kk, cfg.node_dim, hd) for kk in jax.random.split(k1, h)]
        ),
        "w_edge": jnp.stack(
            [xavier_normal(kk, cfg.edge_dim, hd) for kk in jax.random.split(k2, h)]
        ),
        "a_src": attn_scale * jax.random.normal(k3, (h, hd)),
        "a_dst": attn_scale * jax.random.normal(k4, (h, hd)),
        "a_edge": attn_scale * jax.random.normal(k5, (h, hd)),
    }


def edge_featured_apply(
    params: dict,
    cfg: EdgeFeaturedConfig,
    q: jax.Array,                  # [B, node_dim] query/center nodes
    k: jax.Array,                  # [B, S, node_dim] neighbor nodes
    v: jax.Array,                  # [B, S, node_dim] neighbor values
    mask: jax.Array | None = None,  # [B, S]
    edges: jax.Array | None = None,  # [B, S, edge_dim]
) -> jax.Array:
    b, s, _ = k.shape
    if mask is None:
        mask = jnp.ones((b, s), dtype=q.dtype)
    if edges is None:
        # zero edge features for plain attention (edge_featured.rs:284-287)
        edges = jnp.zeros((b, s, cfg.edge_dim), dtype=q.dtype)

    qh = jnp.einsum("bd,hdf->bhf", q, params["w_node"])        # [B, H, hd]
    kh = jnp.einsum("bsd,hdf->bshf", k, params["w_node"])      # [B, S, H, hd]
    vh = jnp.einsum("bsd,hdf->bshf", v, params["w_node"])
    eh = jnp.einsum("bse,hef->bshf", edges, params["w_edge"])  # [B, S, H, hd]

    score = (
        jnp.einsum("bhf,hf->bh", qh, params["a_src"])[:, None, :]
        + jnp.einsum("bshf,hf->bsh", kh, params["a_dst"])
        + jnp.einsum("bshf,hf->bsh", eh, params["a_edge"])
    )  # [B, S, H]
    score = jax.nn.leaky_relu(score, cfg.negative_slope)

    attn = masked_softmax(score, mask[:, :, None], axis=1)     # softmax over S
    out = jnp.einsum("bsh,bshf->bhf", attn, vh)                # [B, H, hd]

    if cfg.concat_heads:
        return out.reshape(b, cfg.num_heads * cfg.head_dim)
    return jnp.mean(out, axis=1)


register_attention(
    AttentionMechanism(
        name="edge_featured",
        init=edge_featured_init,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            edge_featured_apply(params, cfg, q, k, v, mask, **kw),
        default_config=EdgeFeaturedConfig(),
    )
)
