"""Block-dense graph layout: neighbor aggregation as MXU matmuls.

The padded-slot layout (graph/neighbors.py) pays ~2 gather-rows per edge
per layer (score pass + aggregate pass) — measured 444M rows/s on a
100k-row table, which caps the layer at ~150M edges/s
(benchmarks/profile_layer.py). This layout removes the per-edge gather
entirely:

Nodes are blocked contiguously (community-reorder first:
parallel/partition.cluster_reorder — the EdgeCutMinimizer role,
ruvector-graph/src/distributed/shard.rs:209). For each block, the union
of the block's rows and its out-of-block neighbors ("halo") forms a
LOCAL TABLE of T = block + halo_max rows. Every neighbor relation then
lives inside [block, T], so attention scores become one real matmul
`[B*H, D] @ [D, T]` against the local table and aggregation another
`[B*(H+1), T] @ [T, D]` — dense MXU work with a static additive mask,
instead of 2x per-edge row gathers. The ~1-2% edge density inside the
[B, T] tile wastes MXU flops, but at bf16 the MXU is ~50x cheaper per
byte than the gather path (the classic dense-beats-sparse TPU result).

The only remaining gather is the local-table load: Σ_k T_k ≈ N(1+halo%)
rows per layer — ~16x fewer rows than the slot path at M=16.

Memory: one [n_blocks, B, T] bf16 array holds the normalized edge
weights; mask is derived as wdense > 0 (zero-weight real edges are
stored as a tiny epsilon so they stay visible to attention).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockDenseGraph:
    """Static block-local dense adjacency.

    local_ids: [nB, T] int32 — global row ids of each block's local table
        (block's own rows first, then its halo rows; padded with 0).
    wdense:    [nB, B, T] f32/bf16 — normalized edge weight from block row
        r to local-table column t; 0 = no edge (mask), tiny eps = real
        zero-weight edge. Rows already carry the reference's
        normalize-with-uniform-fallback semantics (layer.rs:428-432).
    degrees:   [nB, B] float32 — true degree per node (for the degree-0
        short-circuit, layer.rs:385-389).
    node_pad:  [nB, B] float32 — 1 for real nodes, 0 for padding.
    n:         true (unpadded) node count.
    """

    local_ids: jax.Array
    wdense: jax.Array
    degrees: jax.Array
    node_pad: jax.Array
    # node_pos[i] = row of original node i in the padded [nB*B] layout
    node_pos: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    # log edge multiplicity [nB, B, T], present only when some node lists
    # the same neighbor in several slots (exp(s)*c = exp(s + ln c) keeps
    # softmax exactly equal to the per-slot formulation); None for the
    # common unique-neighbor (kNN/HNSW) case.
    log_mult: jax.Array | None = None

    @property
    def n_blocks(self) -> int:
        return self.local_ids.shape[0]

    @property
    def block(self) -> int:
        return self.wdense.shape[1]

    @property
    def table(self) -> int:
        return self.local_ids.shape[1]

    def pad_features(self, features) -> jax.Array:
        """Scatter [N, D] node features into the padded [nB*B, D] layout."""
        f = jnp.asarray(features)
        out = jnp.zeros((self.n_blocks * self.block, f.shape[1]), f.dtype)
        return out.at[self.node_pos].set(f[: self.n])

    def unpad(self, x) -> jax.Array:
        """Gather padded [nB*B, ...] outputs back to original order [N, ...]."""
        return jnp.asarray(x)[self.node_pos]


_EPS_EDGE = 1e-7  # marks real zero-weight edges in wdense


@functools.partial(jax.jit, static_argnums=(2, 3, 4), donate_argnums=())
def _densify_chunk(slot, wnorm, rows, t, dtype):
    """One chunk of the device-side densification: a 1-D flat-index
    scatter. A 2-D [n, m, 2] scatter-index tensor is tile-padded 64x by
    the (8, 128) TPU layout (82 GB at 10M nodes); the flat [n*m] index
    vector pads only to the lane boundary. Masked edges (slot == t) are
    redirected one past the buffer end -> mode='drop'. `rows` is the
    chunk's row count — flat indices stay below 2**31 because callers
    chunk at (2**31 - 1) // t rows."""
    n, m = slot.shape
    base = jnp.arange(n, dtype=jnp.int32)[:, None] * t
    flat_idx = jnp.where(slot >= t, rows * t, base + slot).reshape(-1)
    flat = jnp.zeros((rows * t,), dtype)
    return flat.at[flat_idx].set(wnorm.reshape(-1), mode="drop")


def _densify_device(slot, wnorm, nb, block, t, dtype):
    """Scatter per-edge weights into the padded dense table ON DEVICE.

    slot: [n, m] int32 local-table columns (masked edges carry T — the
    drop sentinel). Shipping (slot, wnorm) instead of the materialized
    table cuts the host->device transfer by ~T/m (5.1 GB -> ~1 GB at 10M
    nodes, where the dev tunnel moves ~40 MB/s). Chunked over
    block-aligned row ranges so the int32 flat index never overflows."""
    n = slot.shape[0]
    rows_total = nb * block
    max_rows = max(((2**31 - 1) // t) // block * block, block)
    parts = []
    for lo in range(0, rows_total, max_rows):
        hi = min(rows_total, lo + max_rows)
        e_lo, e_hi = min(lo, n), min(hi, n)   # edge rows live in [0, n)
        parts.append(_densify_chunk(
            jnp.asarray(slot[e_lo:e_hi]), jnp.asarray(wnorm[e_lo:e_hi]),
            hi - lo, t, jnp.dtype(dtype)).reshape(-1, block, t))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def build_block_dense(
    nbr_idx: np.ndarray,
    nbr_mask: np.ndarray,
    edge_weight: np.ndarray,
    block: int = 1024,
    table_pad: int = 128,
    dtype=np.float32,
    leaf_sizes: list[int] | None = None,
    device_fill: bool | None = None,
) -> BlockDenseGraph:
    """Build from padded-slot adjacency (already locality-reordered —
    parallel/ordering.recursive_bisection_order or
    parallel/partition.cluster_reorder; locality sets the halo size).

    leaf_sizes: optional consecutive leaf lengths from the bisection
    order — each leaf becomes its own padded block, so block boundaries
    align with the partitioner's cuts (straddling a cut doubles halo).
    Without it, nodes are sliced into uniform [block]-sized chunks.
    table_pad: T is rounded up to a multiple of this (MXU lane alignment).
    """
    nbr = np.asarray(nbr_idx)
    mask = np.asarray(nbr_mask).astype(np.float32)
    ew = np.asarray(edge_weight).astype(np.float32)
    n, m = nbr.shape

    # device-fill fast path (default when native is available): the native
    # planner emits only local_ids + per-edge table columns, the host
    # normalizes the [n, m] weights (same values as the fill paths — the
    # bf16 cast is RNE on both sides), and one jitted scatter densifies in
    # HBM. Falls back on duplicate neighbor slots (log_mult path below).
    if leaf_sizes is None and device_fill is not False:
        try:
            from ruvector_tpu import native
        except ImportError:
            native = None
        if native is not None and native.available:
            lid, slot, dup = native.bdense_plan(
                nbr, mask, block=block, table_pad=table_pad)
            if not dup:
                nb, t = lid.shape
                w = ew * mask
                wsum = w.sum(1, keepdims=True)
                deg = np.maximum(mask.sum(1, keepdims=True), 1.0)
                wnorm = np.where(wsum > 0,
                                 w / np.where(wsum > 0, wsum, 1.0),
                                 mask / deg)
                wnorm = np.where(mask > 0, np.maximum(wnorm, _EPS_EDGE), 0.0)
                if jnp.dtype(dtype) == jnp.bfloat16:
                    import ml_dtypes

                    wnorm = wnorm.astype(ml_dtypes.bfloat16)
                else:
                    wnorm = wnorm.astype(dtype)
                degrees = np.zeros((nb, block), np.float32)
                degrees.reshape(-1)[:n] = mask.sum(1)
                node_pad = np.zeros((nb, block), np.float32)
                node_pad.reshape(-1)[:n] = 1.0
                wdense = _densify_device(slot, wnorm, nb, block, t, dtype)
                return BlockDenseGraph(
                    local_ids=jnp.asarray(lid),
                    wdense=wdense,
                    degrees=jnp.asarray(degrees),
                    node_pad=jnp.asarray(node_pad),
                    node_pos=jnp.asarray(np.arange(n, dtype=np.int64)),
                    n=n,
                    log_mult=None,
                )

    # threaded native host-fill path for uniform blocks (graph_runtime.cpp
    # bdense_*): bit-identical to the Python loop below (pinned in
    # tests/test_native.py), ~30x faster and emits bf16 directly —
    # the 10M-node pipeline's build stage drops from 417s to seconds.
    # Falls back when a node lists the same neighbor in several slots
    # (needs log_mult) or when leaf_sizes blocks are requested.
    if leaf_sizes is None:
        try:
            from ruvector_tpu import native

            if native.available:
                want_bf16 = jnp.dtype(dtype) == jnp.bfloat16
                lid, wd, deg, pad, pos, dup = native.bdense_build(
                    nbr, mask, ew, block=block, table_pad=table_pad,
                    eps_edge=_EPS_EDGE, bf16=want_bf16)
                if not dup:
                    return BlockDenseGraph(
                        local_ids=jnp.asarray(lid),
                        wdense=jnp.asarray(wd),
                        degrees=jnp.asarray(deg),
                        node_pad=jnp.asarray(pad),
                        node_pos=jnp.asarray(pos),
                        n=n,
                        log_mult=None,
                    )
        except ImportError:
            pass

    if leaf_sizes is None:
        nb = -(-n // block)
        starts = [min(k * block, n) for k in range(nb)]
        lens = [min(n - s, block) for s in starts]
        bsz = block
    else:
        assert sum(leaf_sizes) == n, "leaf_sizes must cover all nodes"
        nb = len(leaf_sizes)
        starts = list(np.cumsum([0] + list(leaf_sizes[:-1])))
        lens = list(leaf_sizes)
        bsz = max(8, -(-max(lens) // 8) * 8)

    # node -> (block, offset) and padded position
    node_pos = np.zeros(n, np.int64)
    for k in range(nb):
        node_pos[starts[k]: starts[k] + lens[k]] = (
            k * bsz + np.arange(lens[k]))

    # normalized edge weights with uniform fallback (layer.rs:428-432)
    w = ew * mask
    wsum = w.sum(1, keepdims=True)
    deg = np.maximum(mask.sum(1, keepdims=True), 1.0)
    wnorm = np.where(wsum > 0, w / np.where(wsum > 0, wsum, 1.0), mask / deg)
    wnorm = np.where(mask > 0, np.maximum(wnorm, _EPS_EDGE), 0.0)

    # per block: halo = sorted unique out-of-block neighbors
    halos = []
    for k in range(nb):
        rows = slice(starts[k], starts[k] + lens[k])
        mk = mask[rows] > 0
        flat = nbr[rows][mk]
        out = flat[(flat < starts[k]) | (flat >= starts[k] + lens[k])]
        halos.append(np.unique(out))
    halo_max = max((len(h) for h in halos), default=0)
    table = bsz + halo_max
    table = -(-table // table_pad) * table_pad

    local_ids = np.zeros((nb, table), np.int32)
    wdense = np.zeros((nb, bsz, table), np.float32)
    counts = np.zeros((nb, bsz, table), np.float32)
    # global->local column map allocated ONCE and reset per block by
    # touched entries only: a fresh np.full(n) per block is O(n·nb) —
    # ~30 wasted minutes at 10M nodes / 39k blocks
    pos = np.full(n, -1, np.int64)
    for k in range(nb):
        own = np.arange(starts[k], starts[k] + lens[k], dtype=np.int64)
        h = halos[k]
        # FIXED LAYOUT: own rows at columns [0, lens), halo ALWAYS at
        # [bsz, bsz+len(h)) even for a short (padded) tail block — the
        # fused kernel builds its local table as concat(own_block, halo)
        # and needs halo to start at the block width, not at lens[k]
        local_ids[k, : lens[k]] = node_pos[own]
        local_ids[k, bsz: bsz + len(h)] = node_pos[h]
        pos[own] = np.arange(lens[k])
        pos[h] = bsz + np.arange(len(h))
        rows = slice(starts[k], starts[k] + lens[k])
        mk = mask[rows] > 0
        r, s = np.nonzero(mk)
        cols = pos[nbr[rows][r, s]]
        # duplicate neighbor slots accumulate (kNN graphs have none)
        np.add.at(wdense[k], (r, cols), wnorm[rows][r, s])
        np.add.at(counts[k], (r, cols), 1.0)
        pos[own] = -1
        pos[h] = -1

    degrees = np.zeros((nb, bsz), np.float32)
    node_pad = np.zeros((nb, bsz), np.float32)
    degs = mask.sum(1)
    for k in range(nb):
        degrees[k, : lens[k]] = degs[starts[k]: starts[k] + lens[k]]
        node_pad[k, : lens[k]] = 1.0
    log_mult = None
    if counts.max() > 1.0:
        log_mult = jnp.asarray(np.log(np.maximum(counts, 1.0)))
    # cast to the target dtype on HOST before the device transfer: a
    # [39k, 256, 256] f32 staging buffer on device is 10.2GB at 10M
    # nodes — casting first halves both transfer bytes and peak HBM
    if jnp.dtype(dtype) == jnp.bfloat16:
        import ml_dtypes

        wdense = wdense.astype(ml_dtypes.bfloat16)
    else:
        wdense = wdense.astype(dtype)
    return BlockDenseGraph(
        local_ids=jnp.asarray(local_ids),
        wdense=jnp.asarray(wdense),
        degrees=jnp.asarray(degrees),
        node_pad=jnp.asarray(node_pad),
        node_pos=jnp.asarray(node_pos),
        n=n,
        log_mult=log_mult,
    )
