"""Graph transformer: verified training + sublinear attention.

TPU-native re-design of `ruvector-graph-transformer` (module map lib.rs:
31-57). This package covers the load-bearing modules:

- verified_training: delta-apply train step with invariant checks, rollback
  and certificates (verified_training.rs:343-650)
- sublinear_attention: LSH-bucket and PPR-sampled attention, O(n log n)
  (sublinear_attention.rs)
- block: graph-transformer block composing graph attention + FFN over the
  NeighborGraph.
"""

from ruvector_tpu.graph_transformer.sublinear import (
    SublinearConfig,
    lsh_bucket_attention,
    ppr_sampled_attention,
    lsh_bucket_assignments,
)
from ruvector_tpu.graph_transformer.verified import (
    TrainingInvariant,
    LossStabilityBound,
    WeightNormBound,
    LipschitzBound,
    PermutationEquivariance,
    EnergyGateInvariant,
    VerifiedTrainer,
    TrainingCertificate,
)
from ruvector_tpu.graph_transformer.block import (
    GraphTransformerConfig,
    graph_transformer_init,
    graph_transformer_apply,
)

__all__ = [
    "SublinearConfig",
    "lsh_bucket_attention",
    "ppr_sampled_attention",
    "lsh_bucket_assignments",
    "TrainingInvariant",
    "LossStabilityBound",
    "WeightNormBound",
    "LipschitzBound",
    "PermutationEquivariance",
    "EnergyGateInvariant",
    "VerifiedTrainer",
    "TrainingCertificate",
    "GraphTransformerConfig",
    "graph_transformer_init",
    "graph_transformer_apply",
]
