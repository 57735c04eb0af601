"""Sheaf attention — Coherence-Gated Transformer (ADR-015).

Reference: ruvector-attention/src/sheaf/ (6 files, ~3.3k LoC):
- restriction maps ρ replace learned QKV projections (restriction.rs)
- residual r_ij = ρ_i(x_i) - ρ_j(x_j); edge energy E_ij = w_ij·||r_ij||²
- sheaf attention A_ij = softmax_j(-β·E_ij)               (attention.rs)
- token routing to compute lanes by coherence energy       (router.rs)
- residual-sparse attention: attend only high-residual pairs (sparse.rs)
- energy-based early exit: stop when total energy converges (early_exit.rs)

TPU form: residual energies for all pairs are one fused broadcast-subtract
+ reduce ([S, S, D] contraction expanded via the ||a-b||² = |a|²+|b|²-2ab
identity, so it's a matmul); routing/early-exit decisions are cheap scalar
reductions.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.nn.core import xavier_normal
from ruvector_tpu.ops.segment import masked_softmax


@dataclasses.dataclass(frozen=True)
class SheafAttentionConfig:
    dim: int = 64
    restriction_dim: int = 64
    beta: float = 1.0                 # energy -> attention sharpness
    residual_sparse_threshold: float = 0.0   # 0 = dense
    exit_energy_tol: float = 1e-3


def restriction_map_init(key, in_dim: int, out_dim: int) -> jax.Array:
    """Near-orthogonal restriction map (restriction.rs): QR of a random
    matrix — geometric, norm-preserving, deterministic given the key."""
    m = jax.random.normal(key, (in_dim, max(in_dim, out_dim)))
    q, _ = jnp.linalg.qr(m)
    return q[:, :out_dim]


def sheaf_init(key, cfg: SheafAttentionConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "rho_q": restriction_map_init(k1, cfg.dim, cfg.restriction_dim),
        "rho_k": restriction_map_init(k2, cfg.dim, cfg.restriction_dim),
        "rho_v": xavier_normal(k3, cfg.dim, cfg.dim),
    }


def edge_energies(
    params: dict, x: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """E_ij = ||ρ_q(x_i) - ρ_k(x_j)||² for all pairs, [S, S]."""
    rq = x @ params["rho_q"]
    rk = x @ params["rho_k"]
    qq = jnp.sum(rq * rq, axis=-1, keepdims=True)
    kk = jnp.sum(rk * rk, axis=-1)[None, :]
    e = qq + kk - 2.0 * jnp.dot(rq, rk.T, preferred_element_type=jnp.float32)
    e = jnp.maximum(e, 0.0)
    if mask is not None:
        e = jnp.where(mask[None, :] > 0, e, jnp.inf)
    return e


def sheaf_attention(
    params: dict,
    cfg: SheafAttentionConfig,
    x: jax.Array,                   # [S, D] token states (self-attention form)
    mask: jax.Array | None = None,  # [S]
) -> tuple[jax.Array, jax.Array]:
    """Returns (output [S, D], token_energy [S]).

    A_ij ∝ exp(-β E_ij): coherent (low-residual) pairs attend strongly.
    Optional residual-sparse masking keeps only pairs with energy above the
    threshold quantile — the reference's 'attend the incoherent' mode is
    exposed via negative beta.
    """
    s = x.shape[0]
    if mask is None:
        mask = jnp.ones((s,), dtype=x.dtype)
    e = edge_energies(params, x, mask)                  # [S, S]
    scores = -cfg.beta * jnp.where(jnp.isfinite(e), e, 1e30)

    pair_mask = jnp.broadcast_to(mask[None, :], (s, s))
    if cfg.residual_sparse_threshold > 0:
        finite_e = jnp.where(jnp.isfinite(e), e, 0.0)
        thresh = jnp.quantile(finite_e, cfg.residual_sparse_threshold)
        pair_mask = pair_mask * (finite_e <= thresh)

    attn = masked_softmax(scores, pair_mask, axis=-1)
    v = x @ params["rho_v"]
    out = jnp.dot(attn, v, preferred_element_type=jnp.float32)
    token_energy = jnp.sum(
        jnp.where(jnp.isfinite(e), e, 0.0) * pair_mask, axis=-1
    ) * mask
    return out, token_energy


class ComputeLane(enum.Enum):
    FULL = 0       # high-energy tokens: full compute
    CHEAP = 1      # mid-energy: reduced compute
    SKIP = 2       # coherent tokens: skip


def route_lanes_device(
    token_energy: jax.Array, full_quantile: float = 0.7,
    skip_quantile: float = 0.3,
) -> jax.Array:
    """TokenRouter (router.rs) as one device program: [.., S] energies ->
    [.., S] int32 lane ids (ComputeLane values). Batched over any leading
    axes; no host transfer, so it composes with jit/vmap serving paths."""
    e = jnp.asarray(token_energy)
    hi = jnp.quantile(e, full_quantile, axis=-1, keepdims=True)
    lo = jnp.quantile(e, skip_quantile, axis=-1, keepdims=True)
    return jnp.where(
        e >= hi, jnp.int32(ComputeLane.FULL.value),
        jnp.where(e <= lo, jnp.int32(ComputeLane.SKIP.value),
                  jnp.int32(ComputeLane.CHEAP.value)))


def route_tokens_by_energy(
    token_energy: jax.Array, full_quantile: float = 0.7,
    skip_quantile: float = 0.3,
) -> list[ComputeLane]:
    """Enum view of route_lanes_device for host-side inspection (one
    device->host transfer, no per-token loop)."""
    import numpy as np

    ids = np.asarray(
        route_lanes_device(token_energy, full_quantile, skip_quantile))
    by_val = {m.value: m for m in ComputeLane}
    return [by_val[int(v)] for v in ids.reshape(-1)]


def process_with_early_exit(
    params: dict,
    cfg: SheafAttentionConfig,
    x: jax.Array,
    max_layers: int = 8,
) -> tuple[jax.Array, int]:
    """Iterate sheaf attention until total energy converges
    (early_exit.rs: energy-based, not confidence-based)."""
    prev_energy = jnp.inf
    layers_run = 0
    for _ in range(max_layers):
        out, energy = sheaf_attention(params, cfg, x)
        x = x + out
        total = float(jnp.sum(energy))
        layers_run += 1
        if abs(prev_energy - total) / max(abs(prev_energy), 1e-8) < cfg.exit_energy_tol:
            break
        prev_energy = total
    return x, layers_run


register_attention(
    AttentionMechanism(
        name="sheaf",
        init=sheaf_init,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            sheaf_attention(params, cfg or SheafAttentionConfig(), q, mask)[0],
        default_config=SheafAttentionConfig(),
    )
)
