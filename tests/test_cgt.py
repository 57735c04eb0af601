"""Coherence-Gated Transformer stack (attention/cgt.py vs sheaf/*.rs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruvector_tpu.attention.cgt import (
    CgtConfig,
    ComputeLane,
    EarlyExitConfig,
    ExitReason,
    SparseResidualConfig,
    TokenRouterConfig,
    cgt_block_apply,
    cgt_forward,
    cgt_init,
    early_exit_result,
    lane_statistics,
    mask_to_csr,
    residual_sparse_mask,
    route_by_energy,
    run_with_early_exit,
    sparsity_statistics,
    tune_thresholds,
)


def test_router_lane_boundaries():
    cfg = TokenRouterConfig(theta_reflex=1.0, theta_standard=5.0,
                            theta_deep=20.0, use_average_energy=False)
    cfg.validate()
    e = jnp.asarray([0.5, 1.5, 10.0, 50.0])
    lanes = np.asarray(route_by_energy(e, cfg))
    assert lanes.tolist() == [0, 1, 2, 3]
    stats = lane_statistics(lanes)
    assert stats.total_tokens == 4
    assert stats.reflex_ratio == stats.deep_ratio == 0.25
    assert stats.estimate_latency_ms() == pytest.approx(
        0.1 + 1.0 + 5.0 + 0.05)


def test_router_average_energy_normalization():
    cfg = TokenRouterConfig(theta_reflex=1.0, theta_standard=5.0,
                            theta_deep=20.0, use_average_energy=True)
    # energy 8 over context 4 -> mean 2 -> standard lane
    lanes = np.asarray(route_by_energy(jnp.asarray([8.0] * 4), cfg))
    assert (lanes == 1).all()


def test_router_validate_rejects_misordered():
    with pytest.raises(ValueError):
        TokenRouterConfig(theta_reflex=5.0, theta_standard=1.0).validate()


def test_tune_thresholds_moves_toward_targets():
    cfg = TokenRouterConfig(theta_reflex=1.0, theta_standard=5.0,
                            theta_deep=20.0)
    stats = lane_statistics(np.asarray([1, 1, 1, 1]))  # all standard
    # want 50% reflex -> theta_reflex must rise
    cfg2 = tune_thresholds(cfg, stats, 0.5, 0.25)
    assert cfg2.theta_reflex > cfg.theta_reflex
    assert cfg2.theta_reflex < cfg2.theta_standard < cfg2.theta_deep


def test_sparse_mask_keeps_incoherent_and_floors():
    s = 16
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.uniform(0, 2, (s, s)).astype(np.float32))
    cfg = SparseResidualConfig(residual_threshold=1.9, max_sparsity=0.95,
                               min_connections=3, include_self=True)
    cfg.validate()
    mask = np.asarray(residual_sparse_mask(e, cfg))
    # self always kept; >= 3 connections per row
    assert mask.diagonal().all()
    assert (mask.sum(1) >= 3).all()
    # thresholded pairs kept
    assert mask[np.asarray(e) >= 1.9].all()
    stats = sparsity_statistics(mask)
    assert 0 < stats.sparsity < 1
    assert stats.estimated_speedup > 1
    row_ptr, cols = mask_to_csr(mask)
    assert row_ptr[-1] == stats.nnz and len(cols) == stats.nnz


def test_sparse_mask_local_window():
    # distinct sub-threshold energies: the floor keeps only each row's
    # top-1; the window band must add the |i-j|<=2 pairs
    s = 12
    e = jnp.asarray(np.arange(s * s, dtype=np.float32).reshape(s, s) * 1e-3)
    cfg = SparseResidualConfig(residual_threshold=10.0, max_sparsity=1.0,
                               min_connections=1, include_self=False,
                               local_window=2)
    mask = np.asarray(residual_sparse_mask(e, cfg))
    i = 5
    assert mask[i, i + 2] and mask[i, i - 2]      # in band
    assert not mask[i, i + 4]                     # off band, sub-top-1
    assert mask[i, s - 1]                         # row argmax (floor)


def test_early_exit_converges_on_contraction():
    cfg = EarlyExitConfig(epsilon=1e-2, min_layers=1, max_layers=30,
                          patience=2, ema_alpha=1.0)
    # layer halves the state -> energy (sum sq) converges to 0 fast
    xf, n, ema, conv, e0 = run_with_early_exit(
        lambda x: 0.5 * x, jnp.ones((4,)) * 2.0,
        lambda x: jnp.sum(x * x), cfg)
    n = int(n)
    assert n < 30
    res, stats = early_exit_result(n, ema, conv, cfg, e0)
    assert res.exit_reason in (ExitReason.ENERGY_CONVERGED,
                               ExitReason.PERFECT_COHERENCE)
    assert stats.layers_saved == 30 - n
    assert stats.speedup_ratio > 1
    assert stats.energy_reduction > 0.5


def test_early_exit_hits_max_layers_when_diverging():
    cfg = EarlyExitConfig(epsilon=1e-6, min_layers=1, max_layers=5,
                          patience=3, ema_alpha=1.0)
    xf, n, ema, conv, e0 = run_with_early_exit(
        lambda x: 1.5 * x, jnp.ones((4,)),
        lambda x: jnp.sum(x * x), cfg)
    assert int(n) == 5
    res, _ = early_exit_result(int(n), ema, conv, cfg, e0)
    assert res.exit_reason is ExitReason.MAX_LAYERS_REACHED


def test_cgt_block_lane_modulation():
    """Escalate rows pass through the attention unchanged; deep rows get
    the FFN; shapes and finiteness hold."""
    d, s = 32, 24
    rng = np.random.default_rng(1)
    cfg = CgtConfig(dim=d,
                    router=TokenRouterConfig(theta_reflex=1e-4,
                                             theta_standard=1e-2,
                                             theta_deep=1e6))
    params = cgt_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.normal(size=(s, d)).astype(np.float32))
    out, lanes, energy = cgt_block_apply(params, cfg, x)
    assert out.shape == (s, d)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.asarray(energy).min() >= 0
    lanes = np.asarray(lanes)
    assert set(lanes.tolist()) <= {0, 1, 2, 3}


def test_cgt_forward_early_exit_end_to_end():
    d, s = 16, 12
    cfg = CgtConfig(dim=d)
    params = cgt_init(jax.random.key(2), cfg)
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(s, d)).astype(np.float32))
    ecfg = EarlyExitConfig(epsilon=5e-2, max_layers=6, patience=1)
    xf, n, ema, conv, e0, lanes = jax.jit(
        lambda p, xx: cgt_forward(p, cfg, xx, ecfg))(params, x)
    assert 1 <= int(n) <= 6
    assert np.all(np.isfinite(np.asarray(xf)))
    res, stats = early_exit_result(int(n), ema, conv, ecfg, e0)
    assert isinstance(res.exit_reason, ExitReason)
    assert stats.max_layers == 6
