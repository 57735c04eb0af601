"""Graph partitioning and the static halo-exchange plan.

Replaces the reference's EdgeCutMinimizer / shard router
(ruvector-graph/src/distributed/shard.rs:209-433, ruvector-cluster/src/
shard.rs) with an offline partitioner producing, per shard, a contiguous
node block plus a *static* halo plan: exactly which local rows each shard
must send to every other shard so that all neighbor gathers become local.

The plan is built once on host (numpy) and then drives a single
`jax.lax.all_to_all` per layer inside shard_map — the TPU-native analogue
of the reference's boundary-feature RPC, riding ICI instead of sockets.

Locality: nodes are optionally BFS-reordered before blocking (the
Hyperbatch idea, ruvector-gnn/src/cold_tier.rs:307) which minimizes edge
cut for neighborhood graphs without a heavyweight partitioner.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph.neighbors import NeighborGraph


def bfs_reorder(graph: NeighborGraph) -> np.ndarray:
    """BFS ordering over the neighbor graph for block locality
    (cold_tier.rs:307 reorder_bfs). Returns perm: new_pos -> old_id.

    Uses the native C++ runtime when available (ruvector_tpu/native)."""
    from ruvector_tpu import native

    n = graph.num_nodes
    nbr = np.asarray(graph.nbr_idx)
    if native.available:
        return native.bfs_reorder(nbr, np.asarray(graph.nbr_mask))
    mask = np.asarray(graph.nbr_mask) > 0
    visited = np.zeros(n, bool)
    order = []
    for start in range(n):
        if visited[start]:
            continue
        queue = [start]
        visited[start] = True
        while queue:
            u = queue.pop(0)
            order.append(u)
            for v in nbr[u][mask[u]]:
                if not visited[v]:
                    visited[v] = True
                    queue.append(int(v))
    return np.asarray(order, np.int64)


def cluster_reorder(graph: NeighborGraph, iters: int = 10) -> np.ndarray:
    """Community-clustered ordering via label propagation — the edge-cut
    minimizer for block partitioning (shard.rs:209 EdgeCutMinimizer role).
    BFS interleaves clusters through bridge edges; label propagation keeps
    each community contiguous. Returns perm: new_pos -> old_id."""
    from ruvector_tpu import native

    nbr = np.asarray(graph.nbr_idx)
    mask = np.asarray(graph.nbr_mask)
    if native.available:
        return native.label_propagation_order(nbr, mask, iters)

    n, m = nbr.shape
    label = np.arange(n, dtype=np.int64)
    valid = mask > 0
    for _ in range(iters):
        changed = False
        for i in range(n):
            nbrs = nbr[i][valid[i]]
            if len(nbrs) == 0:
                continue
            labels, counts = np.unique(label[nbrs], return_counts=True)
            best = labels[np.lexsort((labels, -counts))][0]
            if best != label[i]:
                label[i] = best
                changed = True
        if not changed:
            break
    return np.argsort(label, kind="stable").astype(np.int64)


def block_partition(n: int, n_shards: int) -> np.ndarray:
    """node -> shard by contiguous equal blocks (after padding)."""
    block = -(-n // n_shards)
    return np.minimum(np.arange(n) // block, n_shards - 1)


@dataclasses.dataclass
class HaloPlan:
    """Static exchange plan for an edge-partitioned graph.

    All shapes are padded/static so the whole thing jits:
      n_shards, block (local rows per shard), halo (max rows any pair sends)
      send_idx  [S, S, H] — send_idx[src, dst] = local row ids on `src` that
                             `dst` needs (padded with 0)
      send_mask [S, S, H]
      local_nbr_idx  [S, block, M] — neighbor indices remapped into the
          shard-local address space: [0, block) = own rows,
          [block, block + S*H) = halo buffer (src-major), laid out to match
          the all_to_all result.
      nbr_mask       [S, block, M]
      edge_weight    [S, block, M]
      node_pad_mask  [S, block] — 1 for real nodes, 0 for padding rows
    """

    n_shards: int
    block: int
    halo: int
    send_idx: np.ndarray
    send_mask: np.ndarray
    local_nbr_idx: np.ndarray
    nbr_mask: np.ndarray
    edge_weight: np.ndarray
    node_pad_mask: np.ndarray

    def device_arrays(self):
        """As jnp arrays reshaped for shard_map consumption (leading shard axis)."""
        return dict(
            send_idx=jnp.asarray(self.send_idx),
            send_mask=jnp.asarray(self.send_mask),
            local_nbr_idx=jnp.asarray(self.local_nbr_idx),
            nbr_mask=jnp.asarray(self.nbr_mask),
            edge_weight=jnp.asarray(self.edge_weight),
            node_pad_mask=jnp.asarray(self.node_pad_mask),
        )


def build_halo_plan(
    graph: NeighborGraph,
    n_shards: int,
    reorder: bool | str = False,
    min_halo: int = 1,
) -> tuple[HaloPlan, np.ndarray]:
    """Build the halo plan. Returns (plan, perm) where perm maps
    new position -> old node id (identity when reorder=False).

    reorder: False | True/'bfs' (BFS IO-locality order) | 'cluster'
    (label-propagation communities — minimizes the edge cut; use this for
    multi-shard partitioning).

    Features must be permuted by `perm` and padded to n_shards*block rows
    before sharding.
    """
    n = graph.num_nodes
    m = graph.max_degree
    nbr = np.asarray(graph.nbr_idx)
    mask = np.asarray(graph.nbr_mask).astype(np.float32)
    ew = np.asarray(graph.edge_weight).astype(np.float32)

    if reorder:
        if reorder == "cluster":
            perm = cluster_reorder(graph)   # new_pos -> old_id
        else:
            perm = bfs_reorder(graph)       # new_pos -> old_id
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)            # old_id -> new_pos
        nbr = inv[nbr[perm]]
        mask = mask[perm]
        ew = ew[perm]
    else:
        perm = np.arange(n, dtype=np.int64)

    block = -(-n // n_shards)
    n_pad = block * n_shards
    if n_pad > n:
        pad = n_pad - n
        nbr = np.concatenate([nbr, np.zeros((pad, m), nbr.dtype)])
        mask = np.concatenate([mask, np.zeros((pad, m), np.float32)])
        ew = np.concatenate([ew, np.zeros((pad, m), np.float32)])
    node_pad_mask = (np.arange(n_pad) < n).astype(np.float32).reshape(n_shards, block)

    from ruvector_tpu import native

    if native.available:
        halo_n, send_idx, send_mask, local_nbr = native.halo_plan(
            nbr, mask, n_shards, block
        )
        halo_n = max(halo_n, min_halo)
        if send_idx.shape[-1] < halo_n:  # min_halo padding
            pad = halo_n - send_idx.shape[-1]
            send_idx = np.pad(send_idx, ((0, 0), (0, 0), (0, pad)))
            send_mask = np.pad(send_mask, ((0, 0), (0, 0), (0, pad)))
        plan = HaloPlan(
            n_shards=n_shards,
            block=block,
            halo=halo_n,
            send_idx=send_idx,
            send_mask=send_mask,
            local_nbr_idx=local_nbr,
            nbr_mask=mask.reshape(n_shards, block, m),
            edge_weight=ew.reshape(n_shards, block, m),
            node_pad_mask=node_pad_mask,
        )
        return plan, perm

    owner = (np.arange(n_pad) // block).astype(np.int32)

    # per (src, dst): sorted unique rows on src needed by dst
    needed: list[list[np.ndarray]] = [
        [np.empty(0, np.int64) for _ in range(n_shards)] for _ in range(n_shards)
    ]
    for dst in range(n_shards):
        rows = slice(dst * block, (dst + 1) * block)
        nbrs_d = nbr[rows]
        mask_d = mask[rows] > 0
        flat = nbrs_d[mask_d]
        if flat.size == 0:
            continue
        owners = owner[flat]
        for src in range(n_shards):
            if src == dst:
                continue
            remote = np.unique(flat[owners == src])
            needed[src][dst] = remote - src * block   # local rows on src

    halo = max(min_halo, max(
        (len(needed[s][d]) for s in range(n_shards) for d in range(n_shards)),
        default=min_halo,
    ))

    send_idx = np.zeros((n_shards, n_shards, halo), np.int32)
    send_mask = np.zeros((n_shards, n_shards, halo), np.float32)
    # lookup: global node id -> (dst-local halo position) per dst shard
    halo_pos: list[dict[int, int]] = [dict() for _ in range(n_shards)]
    for src in range(n_shards):
        for dst in range(n_shards):
            loc = needed[src][dst]
            send_idx[src, dst, : len(loc)] = loc
            send_mask[src, dst, : len(loc)] = 1.0
            for pos, l in enumerate(loc):
                g = src * block + int(l)
                # halo buffer layout on dst: [S, H] src-major flatten
                halo_pos[dst][g] = src * halo + pos

    # remap neighbor indices into shard-local space
    local_nbr = np.zeros((n_shards, block, m), np.int32)
    for dst in range(n_shards):
        rows = slice(dst * block, (dst + 1) * block)
        nbrs_d = nbr[rows]
        mask_d = mask[rows] > 0
        out = np.zeros((block, m), np.int32)
        for i in range(block):
            for j in range(m):
                if not mask_d[i, j]:
                    continue
                g = int(nbrs_d[i, j])
                if owner[g] == dst:
                    out[i, j] = g - dst * block
                else:
                    out[i, j] = block + halo_pos[dst][g]
        local_nbr[dst] = out

    plan = HaloPlan(
        n_shards=n_shards,
        block=block,
        halo=halo,
        send_idx=send_idx,
        send_mask=send_mask,
        local_nbr_idx=local_nbr,
        nbr_mask=mask.reshape(n_shards, block, m),
        edge_weight=ew.reshape(n_shards, block, m),
        node_pad_mask=node_pad_mask,
    )
    return plan, perm


def pad_features_for_plan(
    features: np.ndarray | jax.Array, plan: HaloPlan, perm: np.ndarray
) -> jax.Array:
    """Permute + pad features to [S*block, D] matching the plan layout."""
    f = np.asarray(features)
    f = f[perm]
    n_pad = plan.n_shards * plan.block
    if n_pad > f.shape[0]:
        f = np.concatenate([f, np.zeros((n_pad - f.shape[0], f.shape[1]), f.dtype)])
    return jnp.asarray(f)
