"""Pallas gather-fused SpMM: out[i] = Σ_m w[i,m] · feat[nbr[i,m]].

The padded-layout sparse matmul with the gather INSIDE the kernel: per node
tile, neighbor rows are DMA'd from HBM straight into VMEM scratch and
reduced in place — the [N, M, D] gathered tensor never exists in HBM
(the XLA path ops/segment.spmm_padded materializes it: write + read of
N·M·D·4 bytes; this kernel reads N·M·D·4 once).

Neighbor indices arrive via PrefetchScalarGridSpec so DMA addresses are
known before the kernel body runs; row DMAs are issued back-to-back and
waited together (the DMA engines pipeline them).

MEASURED NEGATIVE RESULT (kept as the documented justification for the
layout-transform design): each neighbor row is one 512B DMA descriptor,
and descriptor issue rate (~7M/s) bounds the kernel at ~7M edges/s —
30x below the plain XLA gather and 200x below block-dense. Two hard
capacity walls compound it: DMA semaphores live in 2KB sflag memory
(<=256 in-flight copies) and the scalar-prefetch operand must fit 1MB
SMEM (<=~250k edges per call). TPU SpMM wants layout transforms
(graph/block_dense.py, ops/spmm_bucketed.py), not gather fusion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def spmm_pallas(
    features: jax.Array,     # [N, D]
    nbr_idx: jax.Array,      # [B, M] int32
    weights: jax.Array,      # [B, M] (weight * mask; 0 on padding)
    tile_b: int = 64,
    interpret: bool = False,
) -> jax.Array:
    b, m = nbr_idx.shape
    n, d = features.shape
    pb = -(-b // tile_b) * tile_b
    if pb != b:
        nbr_idx = jnp.pad(nbr_idx, ((0, pb - b), (0, 0)))
        weights = jnp.pad(weights, ((0, pb - b), (0, 0)))

    flat_idx = nbr_idx.reshape(-1).astype(jnp.int32)

    # sflag memory (DMA semaphores) is 2KB: one semaphore per in-flight
    # row copy caps the wave at 256 rows (tile_b*m semaphores = 4KB
    # fails AOT compile). Rows are gathered in waves of <=256 with a
    # full issue/wait barrier between waves.
    n_rows = tile_b * m
    wave = min(n_rows, 256)
    assert n_rows % wave == 0

    def kernel(idx_pref, w_ref, feat_ref, out_ref, gathered, sems):
        i = pl.program_id(0)
        base = i * n_rows

        def one_wave(wv, carry):
            off = wv * wave

            def issue(r, c):
                pltpu.make_async_copy(
                    feat_ref.at[idx_pref[base + off + r]],
                    gathered.at[off + r], sems.at[r]
                ).start()
                return c

            jax.lax.fori_loop(0, wave, issue, None)

            def wait(r, c):
                pltpu.make_async_copy(
                    feat_ref.at[idx_pref[base + off + r]],
                    gathered.at[off + r], sems.at[r]
                ).wait()
                return c

            jax.lax.fori_loop(0, wave, wait, None)
            return carry

        jax.lax.fori_loop(0, n_rows // wave, one_wave, None)

        g = gathered[:].reshape(tile_b, m, d)
        # batched weighted reduce (Mosaic has no batched-dot lowering;
        # this is a VPU multiply-accumulate over the M axis)
        out_ref[:] = jnp.sum(w_ref[:][:, :, None] * g, axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pb // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, m), lambda i, idx: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # features stay in HBM
        ],
        out_specs=pl.BlockSpec((tile_b, d), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_b * m, d), jnp.float32),
            pltpu.SemaphoreType.DMA((wave,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pb, d), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(flat_idx, weights, features)
    return out[:b]
