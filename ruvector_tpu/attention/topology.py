"""Topology-aware coherence-gated attention.

Reference: ruvector-attention/src/topology/ — attention gated by a
topological coherence signal of the key set: when the keys form a coherent
cluster (high algebraic connectivity of their affinity graph), attend
densely; when fragmented, restrict attention to the query's own component.

The coherence score is the Fiedler value (λ₂ of the normalized Laplacian),
estimated by deterministic inverse power iteration — differentiable and
batched.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.attention.pde import graph_laplacian
from ruvector_tpu.ops.segment import masked_softmax


@dataclasses.dataclass(frozen=True)
class TopologyConfig:
    dim: int = 64
    coherence_threshold: float = 0.2   # λ₂ below this = fragmented
    affinity_threshold: float = 0.5    # component membership cut
    temperature: float = 1.0
    power_iters: int = 16


def fiedler_value(lap: jax.Array, iters: int = 16) -> jax.Array:
    """λ₂ estimate per batch: power iteration on (2I - L) deflated against
    the constant vector; λ₂(L) = 2 - λ_max(2I - L restricted ⊥ 1)."""
    b, s, _ = lap.shape
    shifted = 2.0 * jnp.eye(s)[None] - lap
    ones = jnp.ones((b, s)) / jnp.sqrt(s)

    v = jnp.broadcast_to(
        jnp.sin(jnp.arange(1, s + 1, dtype=jnp.float32))[None], (b, s)
    )
    v = v - jnp.sum(v * ones, axis=1, keepdims=True) * ones
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-8)

    def step(v, _):
        w = jnp.einsum("bst,bt->bs", shifted, v)
        w = w - jnp.sum(w * ones, axis=1, keepdims=True) * ones
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-8)
        return w, None

    v, _ = jax.lax.scan(step, v, None, length=iters)
    lam_max = jnp.einsum("bs,bst,bt->b", v, shifted, v)
    return 2.0 - lam_max


def coherence_gated_attention(
    q: jax.Array,          # [B, D]
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv]
    mask: jax.Array | None = None,
    cfg: TopologyConfig = TopologyConfig(),
) -> tuple[jax.Array, jax.Array]:
    """Returns (output, coherence λ₂ per batch row).

    Coherent key sets get full attention; fragmented sets restrict to keys
    whose affinity with the query exceeds the component threshold.
    """
    b, s, d = k.shape
    if mask is None:
        mask = jnp.ones((b, s), dtype=q.dtype)
    lap = graph_laplacian(k, mask, normalized=True)
    lam2 = fiedler_value(lap, cfg.power_iters)                 # [B]

    kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-8)
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    affinity = jnp.einsum("bd,bsd->bs", qn, kn)

    fragmented = (lam2 < cfg.coherence_threshold)[:, None]
    component_mask = jnp.where(
        fragmented, (affinity > cfg.affinity_threshold).astype(mask.dtype), 1.0
    )
    eff_mask = mask * component_mask
    # guard: if the component filter empties a row, fall back to full mask
    empty = jnp.sum(eff_mask, axis=1, keepdims=True) == 0
    eff_mask = jnp.where(empty, mask, eff_mask)

    scores = jnp.einsum("bd,bsd->bs", q, k) / (d ** 0.5) / cfg.temperature
    attn = masked_softmax(scores, eff_mask, axis=-1)
    return jnp.einsum("bs,bsd->bd", attn, v), lam2


register_attention(
    AttentionMechanism(
        name="coherence_gated",
        init=None,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            coherence_gated_attention(q, k, v, mask,
                                      cfg or TopologyConfig())[0],
        default_config=TopologyConfig(),
    )
)
