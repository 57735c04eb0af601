"""Elastic Weight Consolidation over arbitrary param pytrees.

Reference: ruvector-gnn/src/ewc.rs — diagonal Fisher from per-sample
gradients (:65-96), anchor consolidation (:103-120), quadratic penalty
λ/2 Σ F_i (θ_i - θ*_i)² (:130-152) and its gradient λ F_i (θ_i - θ*_i)
(:164-186). Here the state is a pytree matching the params, so one EWC
instance covers a whole model; everything is jit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EWCState:
    fisher: Any          # pytree like params (or None-leaves before compute)
    anchor: Any          # pytree like params
    lam: jax.Array       # scalar regularization strength
    active: jax.Array    # scalar bool — penalty is 0 until consolidated


def ewc_init(params: Any, lam: float) -> EWCState:
    if lam < 0:
        raise ValueError("lambda must be non-negative")
    zeros = jax.tree.map(jnp.zeros_like, params)
    return EWCState(
        fisher=zeros,
        anchor=jax.tree.map(jnp.zeros_like, params),
        lam=jnp.asarray(lam, jnp.float32),
        active=jnp.asarray(False),
    )


def ewc_compute_fisher(state: EWCState, grads_samples: list[Any]) -> EWCState:
    """Fisher_i = (1/N) Σ_n g_n,i² over per-sample gradient pytrees
    (ewc.rs:65-96). Resets the previous Fisher."""
    if not grads_samples:
        return state
    n = len(grads_samples)
    acc = jax.tree.map(jnp.zeros_like, grads_samples[0])
    for g in grads_samples:
        acc = jax.tree.map(lambda a, gi: a + gi * gi, acc, g)
    fisher = jax.tree.map(lambda a: a / n, acc)
    return dataclasses.replace(state, fisher=fisher)


def ewc_fisher_from_batch(state: EWCState, per_sample_grads: Any) -> EWCState:
    """Vectorized Fisher from stacked per-sample grads (leading batch axis),
    e.g. produced by jax.vmap(jax.grad(loss)) — the TPU-native route."""
    fisher = jax.tree.map(lambda g: jnp.mean(g * g, axis=0), per_sample_grads)
    return dataclasses.replace(state, fisher=fisher)


def ewc_consolidate(state: EWCState, params: Any) -> EWCState:
    """Anchor current params and activate the penalty (ewc.rs:103-120)."""
    return dataclasses.replace(
        state, anchor=jax.tree.map(jnp.asarray, params), active=jnp.asarray(True)
    )


def ewc_penalty(state: EWCState, params: Any) -> jax.Array:
    """λ/2 Σ F_i (θ_i - θ*_i)²; 0 when inactive (ewc.rs:130-152)."""
    def leaf(f, p, a):
        return jnp.sum(f * jnp.square(p - a))

    total = jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(leaf, state.fisher, params, state.anchor),
        jnp.asarray(0.0),
    )
    return jnp.where(state.active, 0.5 * state.lam * total, 0.0)


def ewc_gradient(state: EWCState, params: Any) -> Any:
    """λ F_i (θ_i - θ*_i) pytree; zeros when inactive (ewc.rs:164-186)."""
    def leaf(f, p, a):
        return jnp.where(state.active, state.lam * f * (p - a), jnp.zeros_like(p))

    return jax.tree.map(leaf, state.fisher, params, state.anchor)
