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


@dataclasses.dataclass
class OverlapPlan:
    """Halo plan v2: packed exchange + interior/boundary compute split.

    Two improvements over HaloPlan (VERDICT r1 weak #5):
      1. RAGGED PACKING: instead of the [S, S, H_max] all_to_all layout
         (traffic scales S^2 * worst pair), each shard all_gathers ONE
         packed buffer of the boundary rows any other shard needs
         ([S, B_max] where B_max = max unique outgoing rows) — bytes per
         layer = S * B_max * D * 4 on the wire.
      2. INTERIOR-FIRST ROW ORDER: each shard's rows are permuted so rows
         whose neighbors are all shard-local come first; the first
         `n_interior` rows of every shard can be aggregated WITHOUT the
         halo, so XLA's async collective scheduler hides the all_gather
         behind the interior attention (the overlap SURVEY §2.2 calls
         for; the split is the interior/boundary decomposition of
         shard.rs's edge-cut view).

      pack_idx   [S, Bmax]  local rows to publish (padded 0)
      pack_mask  [S, Bmax]
      local_nbr  [S, block, M] neighbor addresses: [0, block) = own rows,
                 block + src*Bmax + pos = halo (gathered layout)
      n_interior int — min over shards of interior row count; rows
                 [0, n_interior) of every shard need no halo
    """

    n_shards: int
    block: int
    bmax: int
    n_interior: int
    pack_idx: np.ndarray
    pack_mask: np.ndarray
    local_nbr_idx: np.ndarray
    nbr_mask: np.ndarray
    edge_weight: np.ndarray
    node_pad_mask: np.ndarray

    def device_arrays(self):
        return dict(
            pack_idx=jnp.asarray(self.pack_idx),
            pack_mask=jnp.asarray(self.pack_mask),
            local_nbr_idx=jnp.asarray(self.local_nbr_idx),
            nbr_mask=jnp.asarray(self.nbr_mask),
            edge_weight=jnp.asarray(self.edge_weight),
            node_pad_mask=jnp.asarray(self.node_pad_mask),
        )

    def bytes_per_layer(self, hidden_dim: int, dtype_bytes: int = 4) -> dict:
        """Wire-traffic model for one layer's halo exchange."""
        payload = self.n_shards * self.bmax * hidden_dim * dtype_bytes
        a2a_equiv = (self.n_shards * self.n_shards * self.bmax
                     * hidden_dim * dtype_bytes)
        return {
            "all_gather_bytes": payload,
            "all_to_all_padded_bytes_upper": a2a_equiv,
            "interior_fraction": self.n_interior / self.block,
        }


def build_overlap_plan(
    graph: NeighborGraph,
    n_shards: int,
    reorder: bool | str = "cluster",
) -> tuple[OverlapPlan, np.ndarray]:
    """Build the packed/overlapped halo plan. Returns (plan, perm) where
    perm maps new position -> old node id (composed with the interior-
    first within-shard permutation)."""
    n = graph.num_nodes
    m = graph.max_degree
    nbr = np.asarray(graph.nbr_idx)
    mask = np.asarray(graph.nbr_mask).astype(np.float32)
    ew = np.asarray(graph.edge_weight).astype(np.float32)

    if reorder:
        if reorder == "cluster":
            perm = cluster_reorder(graph)
        else:
            perm = bfs_reorder(graph)
    else:
        perm = np.arange(n, dtype=np.int64)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    nbr = inv[nbr[perm]]
    mask = mask[perm]
    ew = ew[perm]

    block = -(-n // n_shards)
    n_pad = block * n_shards
    if n_pad > n:
        pad = n_pad - n
        nbr = np.concatenate([nbr, np.zeros((pad, m), nbr.dtype)])
        mask = np.concatenate([mask, np.zeros((pad, m), np.float32)])
        ew = np.concatenate([ew, np.zeros((pad, m), np.float32)])
    real = np.arange(n_pad) < n

    # within-shard interior-first permutation
    owner = (np.arange(n_pad) // block).astype(np.int64)
    row_owner = owner[np.clip(nbr, 0, n_pad - 1)]
    is_remote = (row_owner != owner[:, None]) & (mask > 0)
    has_remote = is_remote.any(axis=1)

    perm2 = np.empty(n_pad, np.int64)         # new padded pos -> old padded pos
    interior_counts = []
    for s in range(n_shards):
        rows = np.arange(s * block, (s + 1) * block)
        interior = rows[~has_remote[rows]]
        boundary = rows[has_remote[rows]]
        perm2[s * block: (s + 1) * block] = np.concatenate([interior, boundary])
        interior_counts.append(len(interior))
    n_interior = int(min(interior_counts))

    inv2 = np.empty(n_pad, np.int64)
    inv2[perm2] = np.arange(n_pad)
    nbr = inv2[np.clip(nbr, 0, n_pad - 1)][perm2]
    mask = mask[perm2]
    ew = ew[perm2]
    real = real[perm2]

    # composed global perm for the first n entries (features permutation):
    # new padded position -> old node id (only real rows meaningful)
    composed = np.full(n_pad, -1, np.int64)
    for p_new in range(n_pad):
        p_old = perm2[p_new]
        if p_old < n:
            composed[p_new] = perm[p_old]

    # packed boundary rows per shard: union of rows referenced remotely
    needed_by_other: list[np.ndarray] = []
    for s in range(n_shards):
        rows = slice(s * block, (s + 1) * block)
        flat = nbr[rows][mask[rows] > 0]
        remote = flat[(flat < s * block) | (flat >= (s + 1) * block)]
        needed_by_other.append(remote)
    # rows on shard s that anyone needs
    pack: list[np.ndarray] = []
    for s in range(n_shards):
        wanted = np.concatenate(
            [needed_by_other[d] for d in range(n_shards) if d != s]
            or [np.empty(0, np.int64)])
        own = wanted[(wanted >= s * block) & (wanted < (s + 1) * block)]
        pack.append(np.unique(own) - s * block)
    bmax = max(1, max(len(p) for p in pack))

    pack_idx = np.zeros((n_shards, bmax), np.int32)
    pack_mask = np.zeros((n_shards, bmax), np.float32)
    halo_pos: dict[int, int] = {}
    for s in range(n_shards):
        pack_idx[s, : len(pack[s])] = pack[s]
        pack_mask[s, : len(pack[s])] = 1.0
        for i, r in enumerate(pack[s]):
            halo_pos[s * block + int(r)] = s * bmax + i

    local_nbr = np.zeros((n_shards, block, m), np.int32)
    for s in range(n_shards):
        rows = slice(s * block, (s + 1) * block)
        nbrs_s = nbr[rows]
        mask_s = mask[rows] > 0
        out = np.zeros((block, m), np.int32)
        r_idx, m_idx = np.nonzero(mask_s)
        for i, j in zip(r_idx, m_idx):
            g = int(nbrs_s[i, j])
            if s * block <= g < (s + 1) * block:
                out[i, j] = g - s * block
            else:
                out[i, j] = block + halo_pos[g]
        local_nbr[s] = out

    plan = OverlapPlan(
        n_shards=n_shards, block=block, bmax=bmax, n_interior=n_interior,
        pack_idx=pack_idx, pack_mask=pack_mask,
        local_nbr_idx=local_nbr,
        nbr_mask=mask.reshape(n_shards, block, m),
        edge_weight=ew.reshape(n_shards, block, m),
        node_pad_mask=real.astype(np.float32).reshape(n_shards, block),
    )
    return plan, composed
