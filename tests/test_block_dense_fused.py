"""Parity tests for the fused Pallas block-dense layer kernel.

The fused kernel (ops/pallas/block_dense_attn.block_dense_layer_fused)
folds attention + out-proj + aggregate + GRU + LayerNorm into one pass
with several exact algebraic folds (pre-scaled A, softmax-cancelled
score bias, post-matmul softmax division). These tests pin it against
the scan-path block-dense layer (itself pinned to the NumPy oracle of
ruvector-gnn/src/layer.rs:379-457) on CPU interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruvector_tpu.graph import build_block_dense
from ruvector_tpu.nn.block_dense_layer import (
    ruvector_layer_apply_block_dense,
    ruvector_layer_apply_block_dense_fused,
)
from ruvector_tpu.nn.ruvector_layer import (
    RuvectorLayerConfig,
    ruvector_layer_init,
)


def _random_graph(n, m, seed, with_isolated=True, duplicate_slots=False):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, (n, m)).astype(np.int32)
    if duplicate_slots:
        idx[1, 1:] = idx[1, 0]          # node listing one neighbor M-1 times
    mask = np.ones((n, m), np.float32)
    if with_isolated:
        mask[7] = 0.0                   # degree-0 node
    mask[11, 2:] = 0.0                  # partial degree
    ew = rng.uniform(0.0, 1.0, (n, m)).astype(np.float32)
    ew[5, 0] = 0.0                      # real zero-weight edge
    return idx, mask, ew


@pytest.mark.parametrize("heads", [4, 8])
def test_fused_matches_scan(heads):
    n, d, m = 600, 128, 8
    idx, mask, ew = _random_graph(n, m, seed=0)
    bdg = build_block_dense(idx, mask, ew, dtype=np.float32)
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=heads)
    params = ruvector_layer_init(jax.random.key(0), cfg)
    feats = jnp.asarray(
        np.random.default_rng(1).normal(size=(n, d)).astype(np.float32))
    fpad = bdg.pad_features(feats)
    ref = np.asarray(ruvector_layer_apply_block_dense(params, cfg, fpad, bdg))
    got = np.asarray(
        ruvector_layer_apply_block_dense_fused(params, cfg, fpad, bdg))
    np.testing.assert_allclose(got[: len(ref)], ref, atol=2e-5)


def test_fused_duplicate_slots_log_mult():
    """Duplicate neighbor slots exercise the log_mult input path."""
    n, d, m = 300, 64, 6
    idx, mask, ew = _random_graph(n, m, seed=3, duplicate_slots=True)
    bdg = build_block_dense(idx, mask, ew, dtype=np.float32)
    assert bdg.log_mult is not None
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(2), cfg)
    feats = jnp.asarray(
        np.random.default_rng(4).normal(size=(n, d)).astype(np.float32))
    fpad = bdg.pad_features(feats)
    ref = np.asarray(ruvector_layer_apply_block_dense(params, cfg, fpad, bdg))
    got = np.asarray(
        ruvector_layer_apply_block_dense_fused(params, cfg, fpad, bdg))
    np.testing.assert_allclose(got[: len(ref)], ref, atol=2e-5)


def test_fused_matches_oracle_layer():
    """Fused kernel vs the slot-path layer (the oracle-pinned reference
    implementation) — covers the whole fold chain end to end."""
    from ruvector_tpu.graph import NeighborGraph
    from ruvector_tpu.nn.ruvector_layer import ruvector_layer_apply

    n, d, m = 500, 128, 10
    idx, mask, ew = _random_graph(n, m, seed=7)
    graph = NeighborGraph(jnp.asarray(idx), jnp.asarray(mask),
                          jnp.asarray(ew))
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(5), cfg)
    feats = jnp.asarray(
        np.random.default_rng(6).normal(size=(n, d)).astype(np.float32))
    ref = np.asarray(ruvector_layer_apply(params, cfg, feats, graph))
    bdg = build_block_dense(idx, mask, ew, dtype=np.float32)
    fpad = bdg.pad_features(feats)
    got = np.asarray(
        ruvector_layer_apply_block_dense_fused(params, cfg, fpad, bdg))
    np.testing.assert_allclose(got[: len(ref)], ref, atol=2e-4)


def test_mixed_kernel_head_major_matches_scan():
    """The standalone mixed-output kernel (block_dense_attention) parity."""
    n, d, m = 400, 128, 8
    idx, mask, ew = _random_graph(n, m, seed=9)
    bdg = build_block_dense(idx, mask, ew, dtype=np.float32)
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(8), cfg)
    feats = jnp.asarray(
        np.random.default_rng(10).normal(size=(n, d)).astype(np.float32))
    fpad = bdg.pad_features(feats)
    ref = np.asarray(ruvector_layer_apply_block_dense(params, cfg, fpad, bdg))
    got = np.asarray(ruvector_layer_apply_block_dense(
        params, cfg, fpad, bdg, use_pallas=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)

def test_fused_bf16_io_parity():
    """bf16 IO mode: buffers round to bf16 but GRU/LN math stays f32 —
    output must track the f32 path within bf16 rounding noise."""
    n, d, m = 500, 128, 8
    idx, mask, ew = _random_graph(n, m, seed=11)
    bdg = build_block_dense(idx, mask, ew, dtype=np.float32)
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(12), cfg)
    feats = jnp.asarray(
        np.random.default_rng(13).normal(size=(n, d)).astype(np.float32))
    fpad = bdg.pad_features(feats)
    ref = np.asarray(
        ruvector_layer_apply_block_dense_fused(params, cfg, fpad, bdg))
    got = ruvector_layer_apply_block_dense_fused(
        params, cfg, fpad, bdg, io_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    got32 = np.asarray(got.astype(jnp.float32))
    # bf16 has ~3 decimal digits; LN-normalized outputs are O(1)
    np.testing.assert_allclose(got32[: len(ref)], ref, atol=4e-2)
    assert np.mean(np.abs(got32[: len(ref)] - ref)) < 8e-3


def test_fused_short_tail_block_with_halo():
    """Regression: when n % block != 0, the tail block is padded and its
    halo must land at column `block` in the local-ids layout — the fused
    kernel builds its table as concat(own_block, halo). Before the fix
    the halo slice picked the wrong rows (max err ~2.0)."""
    n, d, m = 600, 64, 12          # 600 % 256 != 0 -> padded tail block
    rng = np.random.default_rng(7)
    idx = rng.integers(0, n, (n, m)).astype(np.int32)
    mask = np.ones((n, m), np.float32)
    ew = rng.uniform(0.1, 1.0, (n, m)).astype(np.float32)
    bdg = build_block_dense(idx, mask, ew, block=256)
    assert bdg.table > bdg.block            # real halo
    cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=d, heads=4)
    params = ruvector_layer_init(jax.random.key(0), cfg)
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    fpad = bdg.pad_features(feats)
    ref = np.asarray(ruvector_layer_apply_block_dense(params, cfg, fpad, bdg))
    got = np.asarray(
        ruvector_layer_apply_block_dense_fused(params, cfg, fpad, bdg))
    np.testing.assert_allclose(got[: len(ref)], ref, atol=2e-5)
