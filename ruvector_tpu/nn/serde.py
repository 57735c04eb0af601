"""Param pytree <-> JSON serialization.

Reference: the NAPI surface serializes GNN layers as JSON
(ruvector-gnn-node/src/lib.rs:98-109 to_json/from_json) — the interchange
format for handing weights across language boundaries. Arrays are nested
lists; structure keys are preserved so any of our (init, apply) params
round-trip.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def params_to_json(params: Any) -> str:
    def conv(node):
        if isinstance(node, dict):
            return {k: conv(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [conv(v) for v in node]
        arr = np.asarray(node)
        return {"__array__": arr.tolist(), "dtype": str(arr.dtype)}

    return json.dumps(conv(params))


def params_from_json(text: str) -> Any:
    def conv(node):
        if isinstance(node, dict):
            if "__array__" in node:
                return jnp.asarray(
                    np.asarray(node["__array__"], dtype=node["dtype"])
                )
            return {k: conv(v) for k, v in node.items()}
        if isinstance(node, list):
            return [conv(v) for v in node]
        return node

    return conv(json.loads(text))
