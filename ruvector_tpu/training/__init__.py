from ruvector_tpu.training.losses import (
    mse_loss,
    cross_entropy_loss,
    binary_cross_entropy_loss,
    info_nce_loss,
    local_contrastive_loss,
    batched_info_nce,
)
from ruvector_tpu.training.optimizers import (
    sgd,
    adam,
    adamw,
    make_optimizer,
)
from ruvector_tpu.training.schedulers import (
    constant_schedule,
    step_decay_schedule,
    exponential_schedule,
    cosine_annealing_schedule,
    warmup_linear_schedule,
    ReduceOnPlateau,
    make_schedule,
)
from ruvector_tpu.training.ewc import (
    EWCState,
    ewc_init,
    ewc_compute_fisher,
    ewc_consolidate,
    ewc_penalty,
    ewc_gradient,
)
from ruvector_tpu.training.replay import ReplayBuffer, ReplayEntry
from ruvector_tpu.training.metrics_hook import TrainingMetrics

__all__ = [
    "mse_loss",
    "cross_entropy_loss",
    "binary_cross_entropy_loss",
    "info_nce_loss",
    "local_contrastive_loss",
    "batched_info_nce",
    "sgd",
    "adam",
    "adamw",
    "make_optimizer",
    "constant_schedule",
    "step_decay_schedule",
    "exponential_schedule",
    "cosine_annealing_schedule",
    "warmup_linear_schedule",
    "ReduceOnPlateau",
    "make_schedule",
    "EWCState",
    "ewc_init",
    "ewc_compute_fisher",
    "ewc_consolidate",
    "ewc_penalty",
    "ewc_gradient",
    "ReplayBuffer",
    "TrainingMetrics",
    "ReplayEntry",
]
