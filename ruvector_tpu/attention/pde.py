"""PDE (diffusion) attention: heat-equation smoothing on the key graph.

Reference: ruvector-attention/src/pde_attention/ — graph Laplacian L = D - W
from key similarities, explicit Euler evolution x_{t+dt} = x_t - dt·L·x_t,
multi-scale attention via diffusion time.

TPU form: the Laplacian is a dense [S, S] similarity kernel per set (S =
neighborhood size, small); diffusion steps are matmuls under lax.scan.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.ops.segment import masked_softmax


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    dim: int = 256
    dt: float = 0.1
    num_steps: int = 4
    normalized: bool = True
    temperature: float = 1.0


def graph_laplacian(
    k: jax.Array,          # [B, S, D]
    mask: jax.Array,       # [B, S]
    normalized: bool = True,
) -> jax.Array:
    """Per-set Laplacian from cosine-similarity affinity (clamped >= 0)."""
    kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-8)
    w = jnp.maximum(jnp.einsum("bsd,btd->bst", kn, kn), 0.0)
    m2 = mask[:, :, None] * mask[:, None, :]
    w = w * m2
    d = jnp.sum(w, axis=-1)
    if normalized:
        dinv = jnp.where(d > 1e-8, jax.lax.rsqrt(jnp.maximum(d, 1e-8)), 0.0)
        lap = (jnp.eye(k.shape[1]) * (d > 1e-8)[:, :, None]
               - dinv[:, :, None] * w * dinv[:, None, :])
    else:
        lap = jnp.eye(k.shape[1])[None] * d[:, :, None] - w
    return lap


def diffusion_attention(
    q: jax.Array,          # [B, D]
    k: jax.Array,          # [B, S, D]
    v: jax.Array,          # [B, S, Dv]
    mask: jax.Array | None = None,
    cfg: DiffusionConfig = DiffusionConfig(),
) -> jax.Array:
    """Diffuse the VALUES along the key graph, then standard attention.

    x_{t+dt} = x_t - dt·L·x_t smooths value information across similar keys
    before the query reads it — attention as continuous information flow.
    """
    b, s, d = k.shape
    if mask is None:
        mask = jnp.ones((b, s), dtype=q.dtype)
    lap = graph_laplacian(k, mask, cfg.normalized)

    def step(x, _):
        return x - cfg.dt * jnp.einsum("bst,btd->bsd", lap, x), None

    v_smooth, _ = jax.lax.scan(step, v, None, length=cfg.num_steps)

    scores = jnp.einsum("bd,bsd->bs", q, k) / (d ** 0.5) / cfg.temperature
    attn = masked_softmax(scores, mask, axis=-1)
    return jnp.einsum("bs,bsd->bd", attn, v_smooth)


register_attention(
    AttentionMechanism(
        name="diffusion",
        init=None,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            diffusion_attention(q, k, v, mask, cfg or DiffusionConfig()),
        default_config=DiffusionConfig(),
    )
)
