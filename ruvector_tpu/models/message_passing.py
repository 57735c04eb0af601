"""Generic message-passing framework.

Reference: ruvector-postgres/src/gnn/message_passing.rs — the
message/aggregate/update protocol that GCN/GraphSAGE implement, plus the
aggregator zoo (aggregators.rs: mean/max/sum).

TPU form: `propagate` composes three pure functions over the padded
neighbor layout; everything stays batched and jit-friendly. Custom layers
implement the protocol by supplying the three callables.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ruvector_tpu.graph.neighbors import NeighborGraph


def sum_aggregate(messages: jax.Array, mask: jax.Array) -> jax.Array:
    """[N, M, D] masked sum -> [N, D] (aggregators.rs sum_aggregate)."""
    return jnp.sum(messages * mask[..., None], axis=1)


def mean_aggregate(messages: jax.Array, mask: jax.Array) -> jax.Array:
    deg = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    return jnp.sum(messages * mask[..., None], axis=1) / deg


def max_aggregate(messages: jax.Array, mask: jax.Array) -> jax.Array:
    neg = jnp.where(mask[..., None] > 0, messages, -jnp.inf)
    out = jnp.max(neg, axis=1)
    return jnp.where(jnp.isfinite(out), out, 0.0)


AGGREGATORS: dict[str, Callable] = {
    "sum": sum_aggregate,
    "mean": mean_aggregate,
    "max": max_aggregate,
}


def propagate(
    features: jax.Array,
    graph: NeighborGraph,
    message_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    aggregate: str | Callable = "sum",
    update_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
) -> jax.Array:
    """One message-passing round (message_passing.rs propagate):

    messages = message_fn(neighbor_features [N,M,D], edge_weights [N,M])
    agg      = aggregate(messages, mask)
    out      = update_fn(agg, self_features)

    Defaults: message = x_j * w_ij; aggregate = sum; update = agg.
    """
    nbr = features[graph.nbr_idx]                    # [N, M, D]
    if message_fn is None:
        messages = nbr * graph.edge_weight[..., None]
    else:
        messages = message_fn(nbr, graph.edge_weight)

    agg_fn = AGGREGATORS[aggregate] if isinstance(aggregate, str) else aggregate
    aggregated = agg_fn(messages, graph.nbr_mask)

    if update_fn is None:
        return aggregated
    return update_fn(aggregated, features)
