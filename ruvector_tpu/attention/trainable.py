"""TrainableAttention: explicit forward/backward/update surface.

Reference: ruvector-attention/src/traits.rs:155-254 — the
TrainableAttention trait with hand-written forward/backward passes and a
Gradients struct (:190). On TPU the backward pass IS `jax.grad` (the
hand-derived gradients disappear — SURVEY §7); this adapter restores the
trait-shaped API for users porting reference code: explicit
forward / backward / update methods over any registered mechanism, with
the optimizer state carried functionally.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ruvector_tpu.attention.base import get_attention


@dataclasses.dataclass
class Gradients:
    """traits.rs:190 equivalent — gradient pytree + scalar stats."""

    grads: Any
    loss: float
    grad_norm: float


class TrainableAttention:
    """Wraps a registered mechanism with fwd/bwd/update (traits.rs:155)."""

    def __init__(self, name: str, config: Any = None, seed: int = 0,
                 learning_rate: float = 1e-3):
        self.mech = get_attention(name)
        self.config = config if config is not None else self.mech.default_config
        self.params = (self.mech.init(jax.random.key(seed), self.config)
                       if self.mech.init is not None else None)
        self.opt = optax.adam(learning_rate)
        self.opt_state = self.opt.init(self.params) if self.params is not None \
            else None

        mech, cfg = self.mech, self.config

        @jax.jit
        def _loss(params, q, k, v, target):
            out = mech.apply(params, cfg, q, k, v)
            return jnp.mean((out - target) ** 2)

        self._loss = _loss
        self._grad = jax.jit(jax.value_and_grad(_loss))

    def forward(self, q, k, v):
        return self.mech.apply(self.params, self.config, q, k, v)

    def backward(self, q, k, v, target) -> Gradients:
        """MSE-to-target gradients (the trait's backward contract)."""
        if self.params is None:
            return Gradients(grads=None, loss=float(self._loss(
                None, q, k, v, target)), grad_norm=0.0)
        loss, grads = self._grad(self.params, q, k, v, target)
        norm = optax.global_norm(grads)
        return Gradients(grads=grads, loss=float(loss),
                         grad_norm=float(norm))

    def update(self, gradients: Gradients):
        """Apply one optimizer step (the trait's update contract)."""
        if self.params is None or gradients.grads is None:
            return
        updates, self.opt_state = self.opt.update(
            gradients.grads, self.opt_state, self.params)
        self.params = optax.apply_updates(self.params, updates)

    def train_step(self, q, k, v, target) -> float:
        g = self.backward(q, k, v, target)
        self.update(g)
        return g.loss
