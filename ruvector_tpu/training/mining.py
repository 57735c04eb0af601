"""Hard-negative mining + curriculum scheduling + regularizers.

Reference: ruvector-attention/src/training/{mining,curriculum}.rs —
HardNegativeMiner (strategies: hard / semi-hard with margin / distance-
weighted), InBatchMiner, CurriculumStage/CurriculumScheduler (difficulty,
duration, temperature, negative count per stage), temperature annealing,
spectral regularization.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.ops.distance import pairwise_cosine


# --- hard negative mining ---------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MiningConfig:
    strategy: str = "hard"       # hard | semi_hard | distance_weighted
    margin: float = 0.2
    temperature: float = 0.07
    n_negatives: int = 16


def mine_negatives(
    anchors: jax.Array,       # [B, D]
    candidates: jax.Array,    # [N, D] negative pool
    positives: jax.Array,     # [B, D] each anchor's positive
    cfg: MiningConfig = MiningConfig(),
    rng: np.random.Generator | None = None,
) -> jax.Array:
    """Select negative indices [B, K] from the pool per strategy.

    hard: highest-similarity negatives (most confusable).
    semi_hard: negatives harder than (pos_sim - margin) but easier than the
      positive — the stable triplet-mining band.
    distance_weighted: sample ∝ softmax(sim/temperature) (needs rng).
    """
    sims = pairwise_cosine(anchors, candidates)                 # [B, N]
    pos_sims = jnp.sum(
        anchors * positives, axis=-1
    ) / jnp.maximum(
        jnp.linalg.norm(anchors, axis=-1) * jnp.linalg.norm(positives, axis=-1),
        1e-12,
    )

    k = min(cfg.n_negatives, candidates.shape[0])
    if cfg.strategy == "hard":
        _, idx = jax.lax.top_k(sims, k)
        return idx.astype(jnp.int32)
    if cfg.strategy == "semi_hard":
        in_band = (sims > (pos_sims[:, None] - cfg.margin)) & (
            sims < pos_sims[:, None]
        )
        scored = jnp.where(in_band, sims, -jnp.inf)
        # fall back to hard negatives when the band is empty
        scored = jnp.where(
            jnp.any(in_band, axis=1, keepdims=True), scored, sims
        )
        _, idx = jax.lax.top_k(scored, k)
        return idx.astype(jnp.int32)
    if cfg.strategy == "distance_weighted":
        rng = rng or np.random.default_rng(0)
        p = np.asarray(jax.nn.softmax(sims / cfg.temperature, axis=-1))
        out = np.stack([
            rng.choice(candidates.shape[0], size=k, replace=False, p=row / row.sum())
            for row in p
        ])
        return jnp.asarray(out.astype(np.int32))
    raise ValueError(f"unknown strategy {cfg.strategy}")


def in_batch_negatives(batch_size: int, include_positive: bool = False
                       ) -> jax.Array:
    """InBatchMiner (mining.rs:237-280): each row's negatives are the other
    rows of the batch. Returns [B, B-1] (or [B, B]) index matrix."""
    idx = jnp.arange(batch_size)
    grid = jnp.broadcast_to(idx[None, :], (batch_size, batch_size))
    if include_positive:
        return grid.astype(jnp.int32)
    mask = grid != idx[:, None]
    return grid[mask].reshape(batch_size, batch_size - 1).astype(jnp.int32)


# --- curriculum -------------------------------------------------------------

@dataclasses.dataclass
class CurriculumStage:
    name: str
    difficulty: float = 0.5
    duration: int = 1000
    temperature: float = 0.07
    negative_count: int = 16


class CurriculumScheduler:
    """Stage progression by step count (curriculum.rs:58-130)."""

    def __init__(self, stages: Iterable[CurriculumStage] = ()):
        self.stages = list(stages)
        self.step_count = 0

    def add_stage(self, stage: CurriculumStage) -> "CurriculumScheduler":
        self.stages.append(stage)
        return self

    @staticmethod
    def default_curriculum(total_steps: int) -> "CurriculumScheduler":
        """easy -> medium -> hard thirds (curriculum.rs:82-115)."""
        third = max(total_steps // 3, 1)
        return CurriculumScheduler([
            CurriculumStage("easy", 0.2, third, temperature=0.1,
                            negative_count=8),
            CurriculumStage("medium", 0.5, third, temperature=0.07,
                            negative_count=16),
            CurriculumStage("hard", 0.9, total_steps - 2 * third,
                            temperature=0.05, negative_count=32),
        ])

    def current_stage(self) -> CurriculumStage | None:
        acc = 0
        for s in self.stages:
            acc += s.duration
            if self.step_count < acc:
                return s
        return self.stages[-1] if self.stages else None

    def step(self) -> CurriculumStage | None:
        self.step_count += 1
        return self.current_stage()


def anneal_temperature(step: int, total_steps: int, t_start: float = 0.1,
                       t_end: float = 0.05) -> float:
    """Linear temperature annealing over training."""
    frac = min(step / max(total_steps, 1), 1.0)
    return t_start + frac * (t_end - t_start)


# --- spectral regularization ------------------------------------------------

def spectral_regularizer(params, power_iters: int = 4) -> jax.Array:
    """Σ over weight matrices of (largest singular value)² — penalizes
    spectral growth (training/loss.rs spectral regularization).

    Differentiable: power iteration is unrolled under jit.
    """
    total = jnp.asarray(0.0)
    for leaf in jax.tree_util.tree_leaves(params):
        if leaf.ndim != 2:
            continue
        v = jnp.ones((leaf.shape[1],)) / jnp.sqrt(leaf.shape[1])
        for _ in range(power_iters):
            w = leaf.T @ (leaf @ v)
            v = w / jnp.maximum(jnp.linalg.norm(w), 1e-12)
        total = total + jnp.sum((leaf @ v) ** 2)
    return total
