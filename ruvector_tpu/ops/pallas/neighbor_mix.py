"""Fused neighbor attention + aggregation kernel — the RuvectorLayer's hot op.

Computes, in ONE VMEM pass over the pre-gathered neighbor messages:

    scores[n,h,m] = (Σ_d u[n,h,d] · nbr[n,m,d] + bias[n,h]) * scale
    attn          = masked softmax over m          (epsilon-guarded)
    allw          = [attn ; wnorm]                 (H+1 weight rows)
    mixed[n,h,d]  = Σ_m allw[n,h,m] · nbr[n,m,d]

This replaces the two XLA einsums of nn/ruvector_layer.py's folded
attention, which lower as batched matvecs at ~10% HBM efficiency (measured:
~10 ms of the 12.3 ms layer at [100k, M=16, D=128]). Here the neighbor tile
is read from HBM exactly once and both contractions run on the VPU in VMEM.

SURVEY.md §7 hard-part: "segment softmax fused into one kernel without
materializing the [N, M] score matrix in HBM" — this is that kernel for the
padded layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(u_ref, bias_ref, nbr_ref, mask_ref, wnorm_ref, out_ref, *, scale):
    u = u_ref[0]          # [TB, H, D]
    bias = bias_ref[0]    # [TB, H]
    nbr = nbr_ref[0]      # [TB, M, D]
    mask = mask_ref[0]    # [TB, M]
    wnorm = wnorm_ref[0]  # [TB, M]
    tb, h, d = u.shape
    m = nbr.shape[1]

    # Slot-unrolled formulation: only 3-D ops with a small broadcast dim (H)
    # — a single [TB, H, M, D] broadcast forces pathological Mosaic
    # relayouts; per-slot [TB, H, D] stays in native (sublane, lane) tiling.
    score_cols = []
    for j in range(m):
        g = nbr[:, j, :]                               # [TB, D]
        s_j = jnp.sum(u * g[:, None, :], axis=-1)      # [TB, H]
        score_cols.append(s_j)
    scores = (jnp.stack(score_cols, axis=-1) + bias[:, :, None]) * scale
    scores = jnp.where(mask[:, None, :] > 0, scores, NEG)   # [TB, H, M]

    m_max = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m_max) * (mask[:, None, :] > 0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-10)
    attn = e / denom                                    # [TB, H, M]

    allw = jnp.concatenate([attn, wnorm[:, None, :]], axis=1)  # [TB, H+1, M]
    acc = jnp.zeros((tb, h + 1, d), jnp.float32)
    for j in range(m):
        g = nbr[:, j, :]                               # [TB, D]
        acc = acc + allw[:, :, j][:, :, None] * g[:, None, :]
    out_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "tile_b", "interpret")
)
def fused_neighbor_mix(
    u: jax.Array,          # [N, H, D] transformed queries (W_k^T q)
    score_bias: jax.Array,  # [N, H]
    nbr_msg: jax.Array,    # [N, M, D] gathered neighbor messages
    mask: jax.Array,       # [N, M]
    wnorm: jax.Array,      # [N, M] normalized edge weights
    heads: int,
    scale: float,
    tile_b: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Returns mixed [N, H+1, D]: H attention aggregates + the weighted mean."""
    if jax.default_backend() != "tpu":
        interpret = True   # CPU/GPU: run the kernel interpreted
    n, m, d = nbr_msg.shape
    pb = -(-n // tile_b) * tile_b
    if pb != n:
        pad = pb - n
        u = jnp.pad(u, ((0, pad), (0, 0), (0, 0)))
        score_bias = jnp.pad(score_bias, ((0, pad), (0, 0)))
        nbr_msg = jnp.pad(nbr_msg, ((0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        wnorm = jnp.pad(wnorm, ((0, pad), (0, 0)))

    grid = (pb // tile_b,)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_b, heads, d), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, heads), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, m, d), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, m), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, m), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_b, heads + 1, d),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, pb, heads + 1, d), jnp.float32),
        interpret=interpret,
    )(
        u.reshape(1, pb, heads, d),
        score_bias.reshape(1, pb, heads),
        nbr_msg.reshape(1, pb, m, d),
        mask.reshape(1, pb, m),
        wnorm.reshape(1, pb, m),
    )
    return out[0, :n]
