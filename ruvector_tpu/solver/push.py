"""Personalized PageRank: forward/backward push and random-walk estimators.

Reference: ruvector-solver — ForwardPush (forward_push.rs:59-250: local push
with residual queue), BackwardPush (backward_push.rs), RandomWalk
(random_walk.rs: Monte-Carlo PPR).

TPU re-design: sequential push queues are pointer-chasing and hostile to
SPMD, so the device path is a *vectorized* push — every node pushes its
residual simultaneously per sweep (x += α·r; r' = (1-α)·P^T r), which is
the dense-iteration form of push with identical fixed point; sweeps run
until max residual < eps·deg. The exact queue-based push runs on host for
small local queries (parity with the reference's access pattern), and the
random-walk estimator uses vectorized walkers with a fixed PRNG key.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph.csr import CSRGraph


def _degree_normalized_transpose_spmv(graph: CSRGraph, r: jax.Array) -> jax.Array:
    """y = P^T r where P = D^-1 A (push distributes r[u]/deg(u) to u's
    out-neighbors)."""
    rows = graph.row_ids()
    deg = jnp.maximum(graph.degrees().astype(jnp.float32), 1.0)
    # each edge (u -> v) carries r[u]/deg(u) to v
    return jax.ops.segment_sum(
        (r / deg)[rows], graph.col_idx, num_segments=graph.num_nodes
    )


@partial(jax.jit, static_argnames=("max_sweeps",))
def _push_sweeps(graph: CSRGraph, seed_vec: jax.Array, alpha: float,
                 epsilon: float, max_sweeps: int):
    deg = jnp.maximum(graph.degrees().astype(jnp.float32), 1.0)

    def cond(c):
        k, x, r = c
        return (k < max_sweeps) & (jnp.max(jnp.abs(r) / deg) > epsilon)

    def body(c):
        k, x, r = c
        x = x + alpha * r
        r = (1.0 - alpha) * _degree_normalized_transpose_spmv(graph, r)
        return k + 1, x, r

    k, x, r = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros_like(seed_vec), seed_vec)
    )
    return x, r, k


def forward_push_ppr(
    graph: CSRGraph, source: int, alpha: float = 0.15,
    epsilon: float = 1e-4, max_sweeps: int = 100,
) -> np.ndarray:
    """PPR vector from a source node (forward_push.rs:108-240 semantics:
    push until all residuals < eps·deg)."""
    seed = jnp.zeros((graph.num_nodes,)).at[source].set(1.0)
    x, r, _ = _push_sweeps(graph, seed, alpha, epsilon, max_sweeps)
    return np.asarray(x)


def backward_push_ppr(
    graph: CSRGraph, target: int, alpha: float = 0.15,
    epsilon: float = 1e-4, max_sweeps: int = 100,
) -> np.ndarray:
    """PPR contribution TO a target (backward_push.rs:143): runs forward
    push on the reverse graph."""
    # reverse graph: swap roles of rows/cols (host-side, cached by caller)
    rows = np.asarray(graph.row_ids())
    rev = CSRGraph.from_edges(
        np.asarray(graph.col_idx), rows,
        np.asarray(graph.values), graph.num_nodes,
    )
    seed = jnp.zeros((graph.num_nodes,)).at[target].set(1.0)
    x, r, _ = _push_sweeps(rev, seed, alpha, epsilon, max_sweeps)
    return np.asarray(x)


@partial(jax.jit, static_argnames=("iters",))
def _ppr_power(graph: CSRGraph, seed_vec, alpha: float, iters: int):
    def step(x, _):
        x = alpha * seed_vec + (1 - alpha) * _degree_normalized_transpose_spmv(
            graph, x
        )
        return x, None

    x, _ = jax.lax.scan(step, seed_vec, None, length=iters)
    return x


def ppr_power_iteration(graph: CSRGraph, source: int, alpha: float = 0.15,
                        iters: int = 50) -> np.ndarray:
    """Dense power-iteration PPR — the convergence oracle for push/walks."""
    seed = jnp.zeros((graph.num_nodes,)).at[source].set(1.0)
    return np.asarray(_ppr_power(graph, seed, alpha, iters))


def random_walk_ppr(
    graph: CSRGraph, source: int, alpha: float = 0.15,
    num_walks: int = 1000, max_len: int = 50, seed: int = 0,
) -> np.ndarray:
    """Monte-Carlo PPR (random_walk.rs:135+): α-terminating walks from the
    source; estimate = visit distribution of walk endpoints.

    Vectorized: all walks advance in lockstep under one fixed PRNG key —
    deterministic given (seed, shapes).
    """
    n = graph.num_nodes
    row_ptr = jnp.asarray(graph.row_ptr)
    col_idx = jnp.asarray(graph.col_idx)
    deg = graph.degrees()

    key = jax.random.key(seed)

    @jax.jit
    def run(key):
        pos = jnp.full((num_walks,), source, jnp.int32)
        stopped = jnp.zeros((num_walks,), jnp.bool_)

        def body(carry, key_step):
            pos, stopped = carry
            k1, k2 = jax.random.split(key_step)
            stop_now = jax.random.uniform(k1, (num_walks,)) < alpha
            d = deg[pos]
            # pick a uniform out-edge; dead-ends stop the walk
            offset = (jax.random.uniform(k2, (num_walks,))
                      * jnp.maximum(d, 1)).astype(jnp.int32)
            nxt = col_idx[row_ptr[pos] + jnp.minimum(offset, jnp.maximum(d - 1, 0))]
            dead = d == 0
            new_stopped = stopped | stop_now | dead
            new_pos = jnp.where(stopped | stop_now | dead, pos, nxt)
            return (new_pos, new_stopped), None

        keys = jax.random.split(key, max_len)
        (pos, stopped), _ = jax.lax.scan(body, (pos, stopped), keys)
        return jax.ops.segment_sum(
            jnp.ones((num_walks,)), pos, num_segments=n
        ) / num_walks

    return np.asarray(run(key))
