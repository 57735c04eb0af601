"""Distributed query execution: scatter-gather over a sharded corpus.

Reference: ruvector-graph/src/distributed/{coordinator,federation}.rs —
cross-shard query fan-out with per-shard top-k then global merge.

TPU-native (SURVEY §2.2): the fan-out is a shard_map over the node mesh —
each shard scores its block against the (replicated) query batch, takes a
local top-k, and one all_gather merges the candidates; the global top-k
reduction is tiny. No RPC: the 'shards' are mesh devices.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ruvector_tpu.ops.distance import pairwise_cosine


def make_distributed_search(
    mesh: Mesh, n_total: int, k: int, axis_name: str = "nodes"
):
    """Build a jitted scatter-gather search over features sharded by rows.

    search(queries [B, D], features [N_pad, D] sharded) ->
        (global ids [B, k] int32, scores [B, k])
    """
    n_shards = mesh.devices.size
    block = n_total // n_shards
    assert n_total % n_shards == 0, "pad features to a multiple of the mesh"

    def shard_fn(queries, feats_blk):
        # feats_blk: [block, D] local rows
        sims = pairwise_cosine(queries, feats_blk)             # [B, block]
        local_scores, local_idx = jax.lax.top_k(sims, k)       # [B, k]
        shard_id = jax.lax.axis_index(axis_name)
        global_idx = local_idx.astype(jnp.int32) + shard_id * block
        # gather all shards' candidates: [S, B, k]
        all_scores = jax.lax.all_gather(local_scores, axis_name)
        all_idx = jax.lax.all_gather(global_idx, axis_name)
        b = queries.shape[0]
        merged_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(b, -1)
        merged_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(b, -1)
        top_scores, pos = jax.lax.top_k(merged_scores, k)
        top_idx = jnp.take_along_axis(merged_idx, pos, axis=1)
        return top_idx, top_scores

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def search(queries, features):
        return sharded(queries, features)

    return search
