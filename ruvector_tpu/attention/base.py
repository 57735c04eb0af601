"""Attention mechanism registry and shared protocol.

Replaces the reference trait hierarchy (ruvector-attention/src/traits.rs:
Attention :34, GraphAttention :85, GeometricAttention :124, SparseAttention
:155, TrainableAttention :202) with a registry of named mechanisms. Each
entry describes how to construct params (may be None for parameter-free
mechanisms) and the batched apply function.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable


@dataclasses.dataclass(frozen=True)
class AttentionMechanism:
    """A named attention mechanism.

    init: (key, config) -> params pytree (or None for parameter-free).
    apply: (params, config, q, k, v, mask, **kw) -> output.
    """

    name: str
    init: Callable[..., Any] | None
    apply: Callable[..., Any]
    default_config: Any = None


_REGISTRY: dict[str, AttentionMechanism] = {}


def register_attention(mech: AttentionMechanism) -> AttentionMechanism:
    _REGISTRY[mech.name] = mech
    return mech


def get_attention(name: str) -> AttentionMechanism:
    if name not in _REGISTRY:
        # populate lazily: importing the package registers everything
        import ruvector_tpu.attention  # noqa: F401
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown attention mechanism {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def list_attention() -> list[str]:
    import ruvector_tpu.attention  # noqa: F401

    return sorted(_REGISTRY)
