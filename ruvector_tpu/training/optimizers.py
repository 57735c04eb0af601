"""Optimizers (optax-based) matching the reference update rules.

Reference: ruvector-gnn/src/training.rs — SGD with momentum
(v = momentum*v + lr*grad; p -= v, :126-158 — note lr is *inside* the
velocity, unlike optax.sgd's default) and Adam with bias correction
(:160-227, standard Kingma-Ba). AdamW mirrors
ruvector-attention/src/training/optimizer.rs.

All optimizers accept either a float learning rate or an optax schedule.
"""

from __future__ import annotations


import jax
import optax


def sgd(learning_rate, momentum: float = 0.0) -> optax.GradientTransformation:
    """SGD; with momentum: v = momentum*v + lr*g; p -= v (training.rs:128-155).

    Implemented as trace-after-scaling so the lr sits inside the velocity,
    matching the reference exactly (optax.sgd defaults put lr outside).
    """
    if momentum == 0.0:
        return optax.sgd(learning_rate)
    return optax.chain(
        optax.scale_by_learning_rate(learning_rate, flip_sign=False),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale(-1.0),
    )


def adam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam with bias correction (training.rs:169-227, standard algorithm)."""
    return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)


def adamw(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)


def make_optimizer(name: str, learning_rate, **kw) -> optax.GradientTransformation:
    """Factory by name: 'sgd' | 'adam' | 'adamw'."""
    if name == "sgd":
        return sgd(learning_rate, momentum=kw.get("momentum", 0.0))
    if name == "adam":
        return adam(learning_rate, **{k: v for k, v in kw.items() if k in ("b1", "b2", "eps")})
    if name == "adamw":
        return adamw(learning_rate, **{k: v for k, v in kw.items()
                                       if k in ("b1", "b2", "eps", "weight_decay")})
    raise ValueError(f"unknown optimizer {name!r}")
