"""Optimal-transport attention: sliced-Wasserstein and centroid OT.

Reference: ruvector-attention/src/transport/ — ProjectionCache of random
1-d projections (cached_projections.rs:11-95), sliced-Wasserstein distance
via sorted projections, CentroidOTAttention (k-means centroids as transport
anchors, centroid_ot.rs:19-250).

TPU form: all P projections are one [D, P] matmul; per-set sorting uses
jnp.sort along the set axis (XLA's bitonic sort) — fully batched.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.ops.segment import masked_softmax


@dataclasses.dataclass(frozen=True)
class TransportConfig:
    dim: int = 256
    num_projections: int = 16
    num_centroids: int = 8
    temperature: float = 1.0
    seed: int = 42


def transport_init(key, cfg: TransportConfig) -> dict:
    """Random projection directions [D, P], unit-normalized (cached
    projections)."""
    proj = jax.random.normal(key, (cfg.dim, cfg.num_projections))
    proj = proj / jnp.maximum(jnp.linalg.norm(proj, axis=0, keepdims=True), 1e-8)
    return {"proj": proj}


def sliced_wasserstein_distance(
    x: jax.Array,   # [A, D] point set
    y: jax.Array,   # [B, D] point set
    proj: jax.Array,  # [D, P]
) -> jax.Array:
    """SW2 distance between two point sets via sorted 1-d projections.

    Sets of different sizes are compared via quantile alignment (linear
    interpolation of the sorted projections onto a common grid).
    """
    px = jnp.sort(x @ proj, axis=0)     # [A, P]
    py = jnp.sort(y @ proj, axis=0)     # [B, P]
    n = max(px.shape[0], py.shape[0])
    grid = jnp.linspace(0.0, 1.0, n)

    def resample(sorted_vals):
        a = sorted_vals.shape[0]
        pos = grid * (a - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, a - 1)
        frac = pos - lo
        return sorted_vals[lo] * (1 - frac[:, None]) + sorted_vals[hi] * frac[:, None]

    qx = resample(px)
    qy = resample(py)
    return jnp.sqrt(jnp.mean((qx - qy) ** 2))


def sliced_wasserstein_attention(
    params: dict,
    cfg: TransportConfig,
    q: jax.Array,          # [B, D] — each query is a 1-point distribution
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv]
    mask: jax.Array | None = None,
) -> jax.Array:
    """Per-key scores = -SW distance between the query point and each key
    point (degenerate 1-point sets reduce SW to projected L2, which is the
    reference's fast path)."""
    proj = params["proj"]
    b, s, d = k.shape
    if mask is None:
        mask = jnp.ones((b, s), dtype=q.dtype)
    qp = q @ proj                        # [B, P]
    kp = jnp.einsum("bsd,dp->bsp", k, proj)
    sw = jnp.sqrt(jnp.mean((qp[:, None, :] - kp) ** 2, axis=-1) + 1e-12)
    attn = masked_softmax(-sw / cfg.temperature, mask, axis=-1)
    return jnp.einsum("bs,bsd->bd", attn, v)


def centroid_ot_attention(
    params: dict,
    cfg: TransportConfig,
    q: jax.Array,          # [B, D]
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv]
    mask: jax.Array | None = None,
    kmeans_iters: int = 4,
) -> jax.Array:
    """Centroid OT (centroid_ot.rs): cluster keys into C centroids, compute
    query-to-centroid transport weights, distribute to keys by membership."""
    b, s, d = k.shape
    if mask is None:
        mask = jnp.ones((b, s), dtype=q.dtype)
    c = min(cfg.num_centroids, s)

    # batched k-means over each key set (deterministic init: first c keys)
    cent = k[:, :c, :]
    for _ in range(kmeans_iters):
        d2 = jnp.sum((k[:, :, None, :] - cent[:, None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(mask[:, :, None] > 0, d2, jnp.inf)
        assign = jax.nn.one_hot(jnp.argmin(d2, axis=-1), c, dtype=k.dtype)
        assign = assign * mask[:, :, None]
        counts = jnp.maximum(jnp.sum(assign, axis=1), 1e-8)     # [B, C]
        cent = jnp.einsum("bsc,bsd->bcd", assign, k) / counts[:, :, None]

    # transport plan: softmax over query-centroid similarity, weighted by mass
    sim = jnp.einsum("bd,bcd->bc", q, cent) / (d ** 0.5)
    mass = counts / jnp.maximum(jnp.sum(counts, axis=1, keepdims=True), 1e-8)
    plan = jax.nn.softmax(sim / cfg.temperature + jnp.log(mass + 1e-12), axis=-1)

    # distribute centroid weight uniformly over member keys
    key_w = jnp.einsum("bc,bsc->bs", plan / counts, assign)
    key_w = key_w * mask
    key_w = key_w / jnp.maximum(jnp.sum(key_w, axis=1, keepdims=True), 1e-10)
    return jnp.einsum("bs,bsd->bd", key_w, v)


register_attention(
    AttentionMechanism(
        name="sliced_wasserstein",
        init=transport_init,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            sliced_wasserstein_attention(params, cfg or TransportConfig(),
                                         q, k, v, mask),
        default_config=TransportConfig(),
    )
)

register_attention(
    AttentionMechanism(
        name="centroid_ot",
        init=transport_init,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            centroid_ot_attention(params, cfg or TransportConfig(),
                                  q, k, v, mask),
        default_config=TransportConfig(),
    )
)
