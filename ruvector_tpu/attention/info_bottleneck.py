"""Variational information-bottleneck attention.

Reference: ruvector-attention/src/info_bottleneck/ — diagonal-Gaussian
encoder over attention context, KL(q(z|x) || N(0,I)) rate term, per-layer
IB loss balancing compression vs reconstruction.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.base import AttentionMechanism, register_attention
from ruvector_tpu.attention.scaled_dot import scaled_dot_attention
from ruvector_tpu.nn.core import linear_apply, linear_init


@dataclasses.dataclass(frozen=True)
class IBConfig:
    dim: int = 256
    bottleneck_dim: int = 64
    beta: float = 1e-3        # rate weight


def kl_diagonal_gaussian(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """KL(N(mu, diag(exp(logvar))) || N(0, I)) summed over the last axis."""
    return 0.5 * jnp.sum(jnp.exp(logvar) + mu * mu - 1.0 - logvar, axis=-1)


def ib_init(key, cfg: IBConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mu": linear_init(k1, cfg.dim, cfg.bottleneck_dim),
        "logvar": linear_init(k2, cfg.dim, cfg.bottleneck_dim),
        "decode": linear_init(k3, cfg.bottleneck_dim, cfg.dim),
    }


def ib_attention(
    params: dict,
    cfg: IBConfig,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    rng: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Attention -> stochastic bottleneck -> decode. Returns (out, ib_loss).

    At inference (rng=None) the mean is used (deterministic); in training
    the reparameterized sample flows gradients through mu/logvar and the
    KL rate term regularizes the context representation.
    """
    ctx = scaled_dot_attention(q, k, v, mask)
    mu = linear_apply(params["mu"], ctx)
    logvar = jnp.clip(linear_apply(params["logvar"], ctx), -10.0, 10.0)
    if rng is not None:
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
    else:
        z = mu
    out = linear_apply(params["decode"], z)
    rate = jnp.mean(kl_diagonal_gaussian(mu, logvar))
    return out, cfg.beta * rate


register_attention(
    AttentionMechanism(
        name="info_bottleneck",
        init=ib_init,
        apply=lambda params, cfg, q, k, v, mask=None, **kw:
            ib_attention(params, cfg or IBConfig(), q, k, v, mask, **kw)[0],
        default_config=IBConfig(),
    )
)
