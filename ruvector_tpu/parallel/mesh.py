"""Device mesh utilities.

The data plane replaces the reference's cluster/RPC machinery
(ruvector-cluster, ruvector-graph/src/distributed/) with SPMD collectives
over a jax.sharding.Mesh: no RPC, no gossip — shardings + XLA collectives
on ICI/DCN (SURVEY.md §2.2 mapping).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def make_mesh(n_devices: int | None = None, axis_name: str = "nodes") -> Mesh:
    """1-D mesh over node blocks — the graph-parallel axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis_name,))
