"""Pallas flash attention over neighbor/candidate sets.

Blockwise online-softmax (the flash recurrence of the reference's
sparse/flash.rs:86-140) lowered to a TPU grid: program (i, j) processes
query tile i against key block j, keeping running (max, sumexp, acc) in VMEM
scratch across the j dimension. The [B, M] score matrix lives only as one
[TILE_B, BLOCK_M] tile in registers/VMEM — nothing edge-sized touches HBM.

Shapes: q [B, D], k [B, M, D], v [B, M, D], mask [B, M] -> out [B, D].
Intended for large M (candidate pools / ef-width lists); for M <= 64 the
fused XLA path (attention/flash.py) is already optimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, m_scr, l_scr, acc_scr):
    j = pl.program_id(1)
    nblk = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:]                       # [TB, D]
    k = k_ref[0]                       # [TB, BM, D] -> block for this tile
    v = v_ref[0]
    mask = mask_ref[0]                 # [TB, BM]

    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    # per-node neighbor attention is a batched matvec (each query has its
    # OWN key set) — Mosaic has no batched-dot lowering, and the MXU can't
    # share operands across the batch anyway, so the VPU multiply-reduce is
    # the honest lowering.
    scores = jnp.sum(q[:, None, :] * k, axis=-1) * scale   # [TB, BM]
    scores = jnp.where(mask > 0, scores, NEG)

    m_prev = m_scr[:]                  # [TB, 1]
    m_blk = jnp.max(scores, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_blk)
    rescale = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new) * (mask > 0)           # [TB, BM]
    l_scr[:] = l_scr[:] * rescale + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.sum(p[:, :, None] * v, axis=1)            # [TB, D]
    acc_scr[:] = acc_scr[:] * rescale + pv
    m_scr[:] = m_new

    @pl.when(j == nblk - 1)
    def _finalize():
        denom = jnp.where(l_scr[:] > 1e-8, l_scr[:], 1.0)
        out_ref[:] = acc_scr[:] / denom


@functools.partial(
    jax.jit, static_argnames=("tile_b", "block_m", "interpret")
)
def flash_neighbor_attention(
    q: jax.Array,           # [B, D]
    k: jax.Array,           # [B, M, D]
    v: jax.Array,           # [B, M, D]
    mask: jax.Array | None = None,
    tile_b: int = 32,
    block_m: int = 128,
    interpret: bool = False,
) -> jax.Array:
    b, m, d = k.shape
    if mask is None:
        mask = jnp.ones((b, m), dtype=jnp.float32)
    mask = mask.astype(jnp.float32)

    # pad to tile multiples
    pb = -(-b // tile_b) * tile_b
    pm = -(-m // block_m) * block_m
    if pb != b:
        q = jnp.pad(q, ((0, pb - b), (0, 0)))
        k = jnp.pad(k, ((0, pb - b), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pb - b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pb - b), (0, 0)))
    if pm != m:
        k = jnp.pad(k, ((0, 0), (0, pm - m), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pm - m), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pm - m)))

    grid = (pb // tile_b, pm // block_m)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, block_m, d),
                         lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, block_m, d),
                         lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, block_m),
                         lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pb, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_b, 1), jnp.float32),
            pltpu.VMEM((tile_b, 1), jnp.float32),
            pltpu.VMEM((tile_b, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k.reshape(1, pb, pm, d), v.reshape(1, pb, pm, d),
      mask.reshape(1, pb, pm))
    return out[:b]
