"""SONA tests: MicroLoRA math + flush discipline, BaseLoRA, EWC++ boundary
detection & constraints, ReasoningBank clustering, full two-loop engine."""

import numpy as np
import pytest

from ruvector_tpu.sona import (
    EwcConfig,
    EwcPlusPlus,
    LearningSignal,
    MicroLoRA,
    BaseLoRA,
    PatternConfig,
    ReasoningBank,
    SonaConfig,
    SonaEngine,
)
from ruvector_tpu.sona.types import QueryTrajectory, TrajectoryStep


# --- MicroLoRA --------------------------------------------------------------

def test_micro_lora_zero_init_is_identity():
    lora = MicroLoRA(hidden_dim=16, rank=2)
    x = np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32)
    y = np.asarray(lora.forward(x))
    np.testing.assert_allclose(y, x, atol=1e-6)  # up=0 -> identity


def test_micro_lora_accumulate_then_apply():
    lora = MicroLoRA(hidden_dim=8, rank=1)
    g = np.ones(8, np.float32)
    lora.accumulate_gradient(LearningSignal(g, quality_score=0.5))
    lora.accumulate_gradient(LearningSignal(g, quality_score=1.0))
    assert lora.update_count == 2
    # up unchanged until apply
    assert np.allclose(lora.up, 0.0)
    lora.apply_accumulated(learning_rate=0.1)
    # up += lr/2 * (0.5+1.0)*g = 0.075
    np.testing.assert_allclose(lora.up, 0.075, atol=1e-6)
    assert lora.update_count == 0
    # forward now differs from identity
    x = np.ones((1, 8), np.float32)
    y = np.asarray(lora.forward(x))
    assert not np.allclose(y, x)


def test_micro_lora_rank_validation():
    with pytest.raises(ValueError):
        MicroLoRA(hidden_dim=8, rank=3)


def test_micro_lora_forward_formula():
    lora = MicroLoRA(hidden_dim=4, rank=1)
    lora.up = np.asarray([[1.0, 0.0, 0.0, 0.0]], np.float32)
    x = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    inter = x @ lora.down            # [1]
    expect = x + lora.scale * inter @ lora.up
    np.testing.assert_allclose(np.asarray(lora.forward(x)), expect, atol=1e-5)


def test_base_lora_pattern_update():
    base = BaseLoRA(hidden_dim=16, num_layers=2, rank=4)
    c = np.random.default_rng(1).normal(size=16).astype(np.float32)
    x = np.random.default_rng(2).normal(size=(3, 16)).astype(np.float32)
    before = np.asarray(base.forward_layer(0, x))
    base.update_from_pattern(0, c, quality=1.0, lr=0.1)
    after = np.asarray(base.forward_layer(0, x))
    assert not np.allclose(before, after)
    # other layer untouched
    np.testing.assert_allclose(
        np.asarray(base.forward_layer(1, x)), x, atol=1e-6
    )


# --- EWC++ ------------------------------------------------------------------

def test_ewc_pp_fisher_ema():
    ewc = EwcPlusPlus(EwcConfig(param_count=4, fisher_ema_decay=0.5))
    ewc.update_fisher(np.asarray([2.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(ewc.current_fisher, [2.0, 0, 0, 0], atol=1e-6)
    ewc.update_fisher(np.asarray([0.0, 2.0, 0.0, 0.0]))
    np.testing.assert_allclose(ewc.current_fisher, [1.0, 2.0, 0, 0], atol=1e-6)


def test_ewc_pp_boundary_detection():
    rng = np.random.default_rng(3)
    ewc = EwcPlusPlus(EwcConfig(param_count=32, boundary_threshold=3.0))
    for _ in range(100):
        ewc.update_fisher(rng.normal(0, 1, 32).astype(np.float32))
    assert not ewc.detect_task_boundary(rng.normal(0, 1, 32).astype(np.float32))
    assert ewc.detect_task_boundary(np.full(32, 50.0, np.float32))


def test_ewc_pp_constraints_shrink_important_params():
    ewc = EwcPlusPlus(EwcConfig(param_count=4, initial_lambda=100.0))
    ewc.current_fisher = np.asarray([10.0, 0.0, 0.0, 0.0], np.float32)
    ewc.start_new_task()   # snapshot into memory
    g = np.ones(4, np.float32)
    constrained = ewc.apply_constraints(g)
    assert constrained[0] < 0.01       # heavily shrunk (important param)
    np.testing.assert_allclose(constrained[1:], 1.0, atol=1e-6)


def test_ewc_pp_task_memory_and_lambda():
    ewc = EwcPlusPlus(EwcConfig(param_count=4, max_tasks=2, initial_lambda=100))
    for _ in range(3):
        ewc.start_new_task()
    assert ewc.task_count == 2          # circular buffer
    assert ewc.lam > 100                # adaptive lambda grows


def test_ewc_pp_regularization_loss():
    ewc = EwcPlusPlus(EwcConfig(param_count=2, initial_lambda=2.0))
    ewc.current_fisher = np.asarray([1.0, 0.0], np.float32)
    ewc.set_optimal_weights(np.asarray([1.0, 1.0], np.float32))
    ewc.start_new_task()
    # moved w0 by 2: loss = λ/2 · F·(2²) ; λ adapted = 2.0*1.1=2.2
    loss = ewc.regularization_loss(np.asarray([3.0, 1.0], np.float32))
    np.testing.assert_allclose(loss, 0.5 * ewc.lam * 4.0, rtol=1e-5)


# --- ReasoningBank ----------------------------------------------------------

def make_traj(tid, direction, quality, dim=16):
    emb = np.zeros(dim, np.float32)
    emb[direction] = 1.0
    return QueryTrajectory(
        id=tid, query_embedding=emb,
        steps=[TrajectoryStep(emb, np.ones(1), reward=1.0)],
        final_quality=quality,
    )


def test_reasoning_bank_clusters_directions():
    bank = ReasoningBank(PatternConfig(k_clusters=2, embedding_dim=16,
                                       min_cluster_size=2,
                                       quality_threshold=0.1))
    for i in range(6):
        bank.add_trajectory(make_traj(i, 0, 0.9))
    for i in range(6, 12):
        bank.add_trajectory(make_traj(i, 5, 0.8))
    patterns = bank.extract_patterns()
    assert len(patterns) == 2
    # each centroid dominated by one direction
    dims = sorted(int(np.argmax(np.abs(p.centroid))) for p in patterns)
    assert dims == [0, 5]


def test_reasoning_bank_find_similar():
    bank = ReasoningBank(PatternConfig(k_clusters=2, embedding_dim=8,
                                       min_cluster_size=1,
                                       quality_threshold=0.0))
    for i in range(4):
        bank.add_trajectory(make_traj(i, 0, 0.9, dim=8))
    for i in range(4, 8):
        bank.add_trajectory(make_traj(i, 3, 0.9, dim=8))
    bank.extract_patterns()
    q = np.zeros(8, np.float32)
    q[0] = 1.0
    top = bank.find_similar(q, k=1)
    assert len(top) == 1
    assert int(np.argmax(np.abs(top[0].centroid))) == 0
    assert top[0].access_count == 1


def test_reasoning_bank_consolidate_merges_duplicates():
    bank = ReasoningBank(PatternConfig(embedding_dim=4))
    from ruvector_tpu.sona.types import LearnedPattern
    bank.patterns[0] = LearnedPattern(0, np.asarray([1.0, 0, 0, 0]), 0.9, 2)
    bank.patterns[1] = LearnedPattern(1, np.asarray([0.99, 0.01, 0, 0]), 0.7, 2)
    bank.patterns[2] = LearnedPattern(2, np.asarray([0, 1.0, 0, 0]), 0.8, 2)
    bank.consolidate(similarity_threshold=0.95)
    assert bank.pattern_count == 2


# --- engine end-to-end ------------------------------------------------------

def test_sona_engine_two_loops():
    cfg = SonaConfig(hidden_dim=16, embedding_dim=16, flush_threshold=4,
                     background_interval_s=0.0, pattern_clusters=2,
                     quality_threshold=0.2)
    engine = SonaEngine(config=cfg)
    rng = np.random.default_rng(5)

    for i in range(8):
        b = engine.begin_trajectory(rng.normal(size=16).astype(np.float32))
        b.add_step(rng.normal(size=16).astype(np.float32), np.ones(4), reward=1.0)
        engine.end_trajectory(b, quality=0.9)

    engine.flush()
    # instant loop applied: micro lora adapter has consumed the updates
    lora = engine.coordinator.instant.micro_lora
    assert np.abs(lora.up).max() > 0
    assert lora.update_count == 0
    x = np.ones((1, 16), np.float32)
    y = np.asarray(engine.apply_micro_lora(x))
    assert np.abs(y - x).max() > 0  # adapter active (effect may be tiny)

    msg = engine.tick()
    assert msg is not None and "trajectories" in msg
    assert engine.stats.background_cycles == 1
    assert engine.stats.trajectories_seen == 8


def test_sona_engine_low_quality_not_learned():
    cfg = SonaConfig(hidden_dim=8, embedding_dim=8, flush_threshold=1,
                     quality_threshold=0.5)
    engine = SonaEngine(config=cfg)
    b = engine.begin_trajectory(np.ones(8, np.float32))
    b.add_step(np.ones(8, np.float32), np.ones(1), reward=1.0)
    engine.end_trajectory(b, quality=0.1)   # below threshold
    engine.flush()
    x = np.ones((1, 8), np.float32)
    np.testing.assert_allclose(np.asarray(engine.apply_micro_lora(x)), x,
                               atol=1e-6)


def test_background_per_parameter_consolidation():
    """EWC++ state spans every BaseLoRA up parameter, Fisher grows only
    where gradients flowed, and the cycle order matches background.rs
    (constrain -> boundary on raw -> fisher on constrained -> apply)."""
    cfg = SonaConfig(hidden_dim=8, embedding_dim=8, num_layers=2,
                     base_lora_rank=4, pattern_clusters=1,
                     background_interval_s=0.0, quality_threshold=0.0)
    engine = SonaEngine(config=cfg)
    rng = np.random.default_rng(0)
    for _ in range(6):
        b = engine.begin_trajectory(np.ones(8, np.float32))
        b.add_step(rng.normal(size=8).astype(np.float32), np.ones(2),
                   reward=1.0)
        engine.end_trajectory(b, quality=0.9)
    engine.coordinator.force_background()

    bg = engine.coordinator.background
    n_up = cfg.num_layers * cfg.base_lora_rank * cfg.hidden_dim
    assert bg.ewc.config.param_count == n_up
    assert bg.ewc.current_fisher.shape == (n_up,)
    # the consolidated adapters moved and fisher recorded it
    assert max(np.abs(u).max() for u in bg.base_lora.up) > 0
    assert bg.ewc.current_fisher.max() > 0
    # anchor weights snapshot the post-update adapters
    np.testing.assert_allclose(
        bg.ewc.current_weights,
        np.concatenate([u.reshape(-1) for u in bg.base_lora.up]))
