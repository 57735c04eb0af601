"""Pipeline parallelism: GPipe microbatch schedule over a device ring.

The reference runs its transformer on one node; a TPU pod runs deep
stacks by placing consecutive layer groups (stages) on consecutive
devices and streaming microbatches through the ring. This is the
textbook GPipe schedule expressed as ONE jitted program: a lax.scan over
(num_microbatches + num_stages - 1) ticks, with `lax.ppermute` shifting
activations stage->stage+1 each tick. Bubble fraction is the usual
(S-1)/(M+S-1); all stages share one homogeneous layer function so the
whole pipeline is a single SPMD computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_pp_forward(layer_fn, mesh: Mesh, num_microbatches: int,
                    axis_name: str = "nodes"):
    """Build jitted pipeline forward.

    layer_fn(stage_params, x [B, D]) -> [B, D] — one stage's computation;
    stage_params holds a leading stage axis sharded over the mesh.

    forward(params [S, ...], x [M, B, D]) -> [M, B, D]: microbatch m's
    output equals layer_fn applied S times (stage 0..S-1 in order).
    """
    n_stage = mesh.shape[axis_name]
    m = num_microbatches

    def block(params, mb):
        # params local [1, ...] (this stage's weights); mb [M, B, D] replicated
        stage = jax.lax.axis_index(axis_name)
        local = jax.tree_util.tree_map(lambda a: a[0], params)
        b, d = mb.shape[1], mb.shape[2]
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

        def tick(carry, t):
            buf, acc = carry                     # buf [B, D] incoming act
            idx = t - stage                      # microbatch this stage sees
            valid = (idx >= 0) & (idx < m)
            x_in = jnp.where(stage == 0,
                             mb[jnp.clip(idx, 0, m - 1)], buf)
            y = layer_fn(local, x_in)
            y = jnp.where(valid, y, jnp.zeros_like(y))
            # last stage banks its finished microbatch
            done_here = valid & (stage == n_stage - 1)
            acc = jax.lax.cond(
                done_here,
                lambda a: jax.lax.dynamic_update_index_in_dim(
                    a, y, jnp.clip(idx, 0, m - 1), axis=0),
                lambda a: a, acc)
            # shift activations around the ring for the next tick
            buf = jax.lax.ppermute(y, axis_name, perm)
            return (buf, acc), None

        acc0 = jnp.zeros((m, b, d), mb.dtype)
        (_, acc), _ = jax.lax.scan(
            tick, (jnp.zeros((b, d), mb.dtype), acc0),
            jnp.arange(m + n_stage - 1))
        # only the last stage holds real outputs; psum broadcasts them
        # (every other stage contributes zeros)
        return jax.lax.psum(
            jnp.where(stage == n_stage - 1, acc, jnp.zeros_like(acc)),
            axis_name)

    sharded = shard_map(
        block, mesh=mesh,
        in_specs=(P(axis_name), P()), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def reference_pp_forward(layer_fn, params, x_mb):
    """Oracle: run every microbatch through all stages sequentially."""
    def one(xb):
        for s in range(params_leading_dim(params)):
            stage_params = jax.tree_util.tree_map(lambda a: a[s], params)
            xb = layer_fn(stage_params, xb)
        return xb

    return jnp.stack([one(x_mb[i]) for i in range(x_mb.shape[0])])


def params_leading_dim(params) -> int:
    return jax.tree_util.tree_leaves(params)[0].shape[0]
