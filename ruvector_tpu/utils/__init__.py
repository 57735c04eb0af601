from ruvector_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint
from ruvector_tpu.utils.metrics import MetricsRegistry, Counter, Histogram
from ruvector_tpu.utils.profiler import Profiler, profile_region
from ruvector_tpu.utils.witness import tensor_witness, WitnessLog

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "MetricsRegistry",
    "Counter",
    "Histogram",
    "Profiler",
    "profile_region",
    "tensor_witness",
    "WitnessLog",
]
