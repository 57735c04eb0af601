"""Mamba (selective SSM) layer.

Reference: ruvector-mincut-gated-transformer/src/mamba.rs — in_proj ->
(x, z); causal conv1d; input-dependent (Δ, B, C); softplus+clamped Δ;
selective scan h' = exp(Δ·A)·h + Δ·B·x, y = C·h + D·x; gated y·silu(z);
out_proj. TPU: the recurrence runs as lax.scan over time (the sequence
form) and a pure functional step (decode form).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MambaConfig:
    d_model: int = 128
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int = 8
    dt_min: float = 1e-3
    dt_max: float = 0.1

    @property
    def d_inner(self) -> int:
        return self.d_model * self.expand

    @staticmethod
    def micro() -> "MambaConfig":
        return MambaConfig(d_model=128, d_state=8, d_conv=4, expand=2, dt_rank=8)

    @staticmethod
    def baseline() -> "MambaConfig":
        return MambaConfig(d_model=256, d_state=16, d_conv=4, expand=2, dt_rank=16)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MambaState:
    conv_state: jax.Array    # [d_conv - 1, d_inner] past inputs for conv
    ssm_state: jax.Array     # [d_inner, d_state]


def mamba_state_init(cfg: MambaConfig) -> MambaState:
    return MambaState(
        conv_state=jnp.zeros((cfg.d_conv - 1, cfg.d_inner)),
        ssm_state=jnp.zeros((cfg.d_inner, cfg.d_state)),
    )


def mamba_init(key, cfg: MambaConfig) -> dict:
    di, ds, dm, dr = cfg.d_inner, cfg.d_state, cfg.d_model, cfg.dt_rank
    ks = jax.random.split(key, 6)
    scale = lambda i, o: (2.0 / (i + o)) ** 0.5
    return {
        "in_proj": scale(dm, 2 * di) * jax.random.normal(ks[0], (dm, 2 * di)),
        "conv1d": 0.1 * jax.random.normal(ks[1], (cfg.d_conv, di)),
        "x_proj": scale(di, dr + 2 * ds) * jax.random.normal(ks[2], (di, dr + 2 * ds)),
        "dt_proj": scale(dr, di) * jax.random.normal(ks[3], (dr, di)),
        # A initialized negative-log-spaced (S4D-real); stored as log
        "a_log": jnp.log(jnp.broadcast_to(jnp.arange(1, ds + 1, dtype=jnp.float32),
                                          (di, ds))),
        "d": jnp.ones((di,)),
        "out_proj": scale(di, dm) * jax.random.normal(ks[5], (di, dm)),
    }


def mamba_step(
    cfg: MambaConfig, weights: dict, x: jax.Array, state: MambaState
) -> tuple[jax.Array, MambaState]:
    """One token step (mamba.rs:235-312). x [d_model] -> (y [d_model], state)."""
    xz = x @ weights["in_proj"]                        # [2*d_inner]
    x_in, z = jnp.split(xz, 2)

    # causal conv1d over (conv_state, x_in)
    window = jnp.concatenate([state.conv_state, x_in[None, :]], axis=0)  # [d_conv, di]
    x_conv = jnp.sum(window * weights["conv1d"], axis=0)
    x_conv = jax.nn.silu(x_conv)
    new_conv_state = window[1:]

    params = x_conv @ weights["x_proj"]
    dt_in = params[: cfg.dt_rank]
    b = params[cfg.dt_rank : cfg.dt_rank + cfg.d_state]
    c = params[cfg.dt_rank + cfg.d_state :]

    delta = jax.nn.softplus(dt_in @ weights["dt_proj"])
    delta = jnp.clip(delta, cfg.dt_min, cfg.dt_max)    # [d_inner]

    a = -jnp.exp(weights["a_log"])                     # [di, ds]
    da = jnp.exp(delta[:, None] * a)                   # [di, ds]
    new_ssm = da * state.ssm_state + delta[:, None] * b[None, :] * x_conv[:, None]
    y = jnp.sum(new_ssm * c[None, :], axis=-1) + weights["d"] * x_conv

    out = (y * jax.nn.silu(z)) @ weights["out_proj"]
    return out, MambaState(conv_state=new_conv_state, ssm_state=new_ssm)


def mamba_forward_sequence(
    cfg: MambaConfig, weights: dict, x: jax.Array
) -> jax.Array:
    """[T, d_model] -> [T, d_model] via lax.scan (mamba.rs:315-330)."""
    def step(state, x_t):
        y, state = mamba_step(cfg, weights, x_t, state)
        return state, y

    _, ys = jax.lax.scan(step, mamba_state_init(cfg), x)
    return ys
