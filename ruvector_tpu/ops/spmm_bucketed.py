"""Degree-bucketed SpMM — the general-degree (power-law) path.

The padded-dense layout (ops/segment.spmm_padded) pads every row to the
MAX degree: on a zipf-degree graph with max degree 512 and mean 16 that
is a 32x gather-traffic blowup. Bucketing rows by degree into
power-of-two capacity classes bounds padding waste at <2x while keeping
every bucket a dense, MXU/VPU-friendly masked reduction — the idiomatic
TPU answer to ragged rows (pad/bucket, never scalar-loop; SURVEY §7
"padding/bucketing of variable-degree rows").

Reference semantics: CSR SpMM out[i] = Σ_e w[e] x[col[e]]
(ruvector-solver O(nnz) SpMV, spectral.rs:54-57), reproduced exactly —
bucketing only regroups rows.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BucketPlan:
    """Rows grouped by degree class. Per bucket b (static count/caps):
    rows[b] [Nb] original row ids, nbr[b] [Nb, cap_b], w[b] [Nb, cap_b]
    (weight*mask folded; 0 on padding)."""

    rows: tuple
    nbr: tuple
    w: tuple
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    caps: tuple = dataclasses.field(metadata=dict(static=True))


def build_bucket_plan(csr, min_cap: int = 8) -> BucketPlan:
    """Host-side: split CSR rows into power-of-two degree buckets."""
    row_ptr = np.asarray(csr.row_ptr)
    col_idx = np.asarray(csr.col_idx)
    values = np.asarray(csr.values)
    n = csr.num_nodes
    deg = row_ptr[1:] - row_ptr[:-1]

    caps, rows_l, nbr_l, w_l = [], [], [], []
    cap = min_cap
    remaining = np.arange(n)[deg > 0]
    while remaining.size:
        in_b = remaining[deg[remaining] <= cap]
        remaining = remaining[deg[remaining] > cap]
        if in_b.size:
            nb = in_b.size
            nbr = np.zeros((nb, cap), np.int32)
            w = np.zeros((nb, cap), np.float32)
            for j, r in enumerate(in_b):
                s, e = row_ptr[r], row_ptr[r + 1]
                k = e - s
                nbr[j, :k] = col_idx[s:e]
                w[j, :k] = values[s:e]
            caps.append(cap)
            rows_l.append(jnp.asarray(in_b.astype(np.int32)))
            nbr_l.append(jnp.asarray(nbr))
            w_l.append(jnp.asarray(w))
        cap *= 2
    return BucketPlan(rows=tuple(rows_l), nbr=tuple(nbr_l), w=tuple(w_l),
                      num_nodes=n, caps=tuple(caps))


@jax.jit
def spmm_bucketed(plan: BucketPlan, features: jax.Array) -> jax.Array:
    """out[i] = Σ_j w[i,j] · x[nbr[i,j]] over all buckets. [N, D]."""
    out = jnp.zeros((plan.num_nodes, features.shape[-1]),
                    features.dtype)
    for rows, nbr, w in zip(plan.rows, plan.nbr, plan.w):
        gathered = features[nbr]                       # [Nb, cap, D]
        contrib = jnp.einsum("nc,ncd->nd", w, gathered)
        out = out.at[rows].set(contrib)                # rows are disjoint
    return out
