"""Manifold-aware routing + Riemannian optimization.

Reference: ruvector-graph-transformer/src/manifold.rs —
ProductManifoldAttention (:98) over S x H x E (delegated here to
ruvector_tpu.attention.mixed_curvature, the same product construction);
CurvatureAdaptiveRouter (:339, route :389, estimate_ollivier_ricci :420):
route features to the sphere/hyperbolic/euclidean factor by local graph
curvature; GeodesicMessagePassing (:461); plus Riemannian Adam for
Poincare-ball parameters (the reference trains manifold params with a
Riemannian optimizer).

TPU notes: curvature estimation and routing are batched elementwise math;
Riemannian Adam is ordinary Adam with the gradient rescaled by the inverse
metric lam^-2 and the update applied via exp_map — all jittable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.hyperbolic import exp_map, project_to_ball
from ruvector_tpu.graph.neighbors import NeighborGraph


def _lambda(p, c: float):
    """Conformal factor 1/(1 - c||p||^2), matching the reference convention
    in attention/hyperbolic.py log_map (poincare.rs:99-118)."""
    nsq = jnp.sum(p * p, axis=-1, keepdims=True)
    return 1.0 / jnp.maximum(1.0 - c * nsq, 1e-6)


@dataclasses.dataclass(frozen=True)
class RoutingWeights:
    spherical: float
    hyperbolic: float
    euclidean: float


class CurvatureAdaptiveRouter:
    """Route by Ollivier-Ricci curvature (manifold.rs:339-408): negative
    curvature -> hyperbolic factor, positive -> spherical, flat ->
    euclidean; soft assignment by temperature."""

    def __init__(self, neg_threshold: float = -0.1, pos_threshold: float = 0.1,
                 temperature: float = 10.0):
        self.neg_threshold = neg_threshold
        self.pos_threshold = pos_threshold
        self.temperature = temperature

    def route(self, curvature: float) -> RoutingWeights:
        w = self.route_batch(jnp.asarray([curvature]))
        return RoutingWeights(float(w[0, 0]), float(w[0, 1]), float(w[0, 2]))

    def route_batch(self, curvatures) -> jax.Array:
        """[k] curvatures -> [k, 3] softmax weights (sph, hyp, euc)."""
        c = jnp.asarray(curvatures)
        logits = jnp.stack([
            self.temperature * (c - self.pos_threshold),        # spherical
            self.temperature * (self.neg_threshold - c),        # hyperbolic
            -self.temperature * jnp.abs(c),                     # euclidean
        ], axis=-1)
        return jax.nn.softmax(logits, axis=-1)


def estimate_ollivier_ricci(graph: NeighborGraph) -> jax.Array:
    """Per-node mean Ollivier-Ricci curvature estimate (manifold.rs:420).

    Uses the standard combinatorial proxy: for edge (i,j),
    kappa ~= overlap(N(i), N(j)) / max_degree - penalty for tree-like
    expansion. Triangles raise curvature; disjoint neighborhoods lower it.
    Fully batched: the overlap matrix rides one one-hot matmul (MXU)."""
    idx, mask = graph.nbr_idx, graph.nbr_mask
    n, m = idx.shape
    deg = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    # one-hot adjacency [n, n] (fine at module scale; large graphs use the
    # sampled estimator in attention.topology)
    adj = jnp.zeros((n, n)).at[
        jnp.repeat(jnp.arange(n), m), idx.ravel()].add(mask.ravel())
    adj = jnp.minimum(adj, 1.0)
    common = adj @ adj.T                                  # [n,n] shared nbrs
    # mean over i's edges of: triangles/deg - (1 - 2/deg)
    tri = jnp.sum(mask * common[jnp.arange(n)[:, None], idx], axis=1) / deg
    kappa = tri / deg - jnp.maximum(1.0 - 2.0 / deg, 0.0)
    return kappa


def riemannian_adam_init(params):
    return {"m": jax.tree_util.tree_map(jnp.zeros_like, params),
            "v": jax.tree_util.tree_map(jnp.zeros_like, params),
            "t": jnp.zeros((), jnp.int32)}


def riemannian_adam_update(params, grads, state, lr: float = 1e-3,
                           b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8, c: float = 1.0):
    """Riemannian Adam on the Poincare ball: Euclidean grad -> Riemannian
    grad via the inverse metric (1/lam^2), Adam moments in the tangent
    space, update applied with exp_map, result projected to the ball."""
    t = state["t"] + 1

    def upd(p, g, m, v):
        rg = g / (_lambda(p, c) ** 2)
        m2 = b1 * m + (1 - b1) * rg
        v2 = b2 * v + (1 - b2) * rg * rg
        mhat = m2 / (1 - b1 ** t.astype(jnp.float32))
        vhat = v2 / (1 - b2 ** t.astype(jnp.float32))
        step = -lr * mhat / (jnp.sqrt(vhat) + eps)
        return project_to_ball(exp_map(step, p, c), c), m2, v2

    flat_p, tree = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_m = jax.tree_util.tree_leaves(state["m"])
    flat_v = jax.tree_util.tree_leaves(state["v"])
    out = [upd(p, g, m, v) for p, g, m, v
           in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = jax.tree_util.tree_unflatten(tree, [o[0] for o in out])
    new_m = jax.tree_util.tree_unflatten(tree, [o[1] for o in out])
    new_v = jax.tree_util.tree_unflatten(tree, [o[2] for o in out])
    return new_p, {"m": new_m, "v": new_v, "t": t}


def geodesic_message_passing(x, graph: NeighborGraph, c: float = 1.0):
    """Aggregate neighbors along geodesics (manifold.rs:461): Frechet-mean
    lite — log-map neighbors to the tangent space at each node, average,
    exp-map back."""
    from ruvector_tpu.attention.hyperbolic import log_map

    nbr = x[graph.nbr_idx]                                # [n, m, d]
    base = jnp.broadcast_to(x[:, None, :], nbr.shape)
    tangent = log_map(nbr.reshape(-1, x.shape[-1]),
                      base.reshape(-1, x.shape[-1]), c).reshape(nbr.shape)
    w = graph.nbr_mask[..., None]
    mean_t = jnp.sum(w * tangent, axis=1) / jnp.maximum(
        jnp.sum(w, axis=1), 1.0)
    return project_to_ball(exp_map(mean_t, x, c), c)
