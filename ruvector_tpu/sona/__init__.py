"""SONA — self-optimizing two-loop learning engine.

TPU-native re-design of the `sona` crate: instant loop (per-query MicroLoRA
gradient accumulation, engine.rs:46-77, loops/instant.rs) + background loop
(ReasoningBank k-means pattern extraction + BaseLoRA consolidation gated by
EWC++, loops/background.rs, reasoning_bank.rs, ewc.rs) coordinated by a
LoopCoordinator (loops/coordinator.rs:13-120).

Design note: the accumulate-then-apply discipline (flush_threshold,
lora.rs:192-230) is exactly what jit wants — adapters are plain arrays, the
forward is jitted, and updates land between steps, never inside the traced
graph.
"""

from ruvector_tpu.sona.types import (
    SonaConfig,
    LearningSignal,
    TrajectoryStep,
    QueryTrajectory,
    LearnedPattern,
)
from ruvector_tpu.sona.trajectory import (
    TrajectoryBuilder,
    TrajectoryBuffer,
    TrajectoryIdGen,
)
from ruvector_tpu.sona.lora import MicroLoRA, BaseLoRA
from ruvector_tpu.sona.ewc_pp import EwcConfig, EwcPlusPlus
from ruvector_tpu.sona.reasoning_bank import PatternConfig, ReasoningBank
from ruvector_tpu.sona.engine import SonaEngine, LoopCoordinator

__all__ = [
    "SonaConfig",
    "LearningSignal",
    "TrajectoryStep",
    "QueryTrajectory",
    "LearnedPattern",
    "TrajectoryBuilder",
    "TrajectoryBuffer",
    "TrajectoryIdGen",
    "MicroLoRA",
    "BaseLoRA",
    "EwcConfig",
    "EwcPlusPlus",
    "PatternConfig",
    "ReasoningBank",
    "SonaEngine",
    "LoopCoordinator",
]
