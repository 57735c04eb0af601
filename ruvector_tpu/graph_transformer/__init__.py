"""Graph transformer: verified training + sublinear attention.

TPU-native re-design of `ruvector-graph-transformer` (module map lib.rs:
31-57). This package covers the load-bearing modules:

- verified_training: delta-apply train step with invariant checks, rollback
  and certificates (verified_training.rs:343-650)
- sublinear_attention: LSH-bucket and PPR-sampled attention, O(n log n)
  (sublinear_attention.rs)
- block: graph-transformer block composing graph attention + FFN over the
  NeighborGraph.
- physics: Hamiltonian graph net (symplectic leapfrog via jax.grad) +
  mass-conserving PDE attention (physics.rs:38,640)
- biological: spiking graph attention (LIF + surrogate grads), STDP edge
  updates, Hebbian/Oja rules (biological.rs:848,468,344)
- self_organizing: morphogenetic reaction-diffusion fields, growth
  program, graph coarsening (self_organizing.rs:37,218,425)
- manifold: curvature-adaptive routing, Ollivier-Ricci estimate,
  Riemannian Adam, geodesic message passing (manifold.rs:339,420,461)
- temporal: causal attention + Granger causality (temporal.rs:105,389)
- economic: Shapley attribution, Nash attention, incentive-aligned MPNN
  (economic.rs:269,31,440)
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
from ruvector_tpu.graph_transformer.physics import (
    PhysicsConfig,
    HamiltonianGraphNet,
    conservative_pde_attention,
    hamiltonian,
)
from ruvector_tpu.graph_transformer.biological import (
    BiologicalConfig,
    SpikingGraphAttention,
    StdpConfig,
    stdp_update,
    hebbian_update,
    k_winners_take_all,
)
from ruvector_tpu.graph_transformer.self_organizing import (
    SelfOrganizingConfig,
    MorphogeneticField,
    DevelopmentalProgram,
    GraphCoarsener,
)
from ruvector_tpu.graph_transformer.manifold import (
    CurvatureAdaptiveRouter,
    RoutingWeights,
    estimate_ollivier_ricci,
    riemannian_adam_init,
    riemannian_adam_update,
    geodesic_message_passing,
)
from ruvector_tpu.graph_transformer.temporal import (
    TemporalConfig,
    temporal_attention,
    verify_causal_ordering,
    granger_causality,
    granger_matrix,
)
from ruvector_tpu.graph_transformer.economic import (
    shapley_attention,
    nash_attention,
    IncentiveState,
    incentive_aligned_step,
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
    "PhysicsConfig",
    "HamiltonianGraphNet",
    "conservative_pde_attention",
    "hamiltonian",
    "BiologicalConfig",
    "SpikingGraphAttention",
    "StdpConfig",
    "stdp_update",
    "hebbian_update",
    "k_winners_take_all",
    "SelfOrganizingConfig",
    "MorphogeneticField",
    "DevelopmentalProgram",
    "GraphCoarsener",
    "CurvatureAdaptiveRouter",
    "RoutingWeights",
    "estimate_ollivier_ricci",
    "riemannian_adam_init",
    "riemannian_adam_update",
    "geodesic_message_passing",
    "TemporalConfig",
    "temporal_attention",
    "verify_causal_ordering",
    "granger_causality",
    "granger_matrix",
    "shapley_attention",
    "nash_attention",
    "IncentiveState",
    "incentive_aligned_step",
]
from ruvector_tpu.graph_transformer.gated import (
    GatedGraphTransformerConfig,
    gated_graph_transformer_init,
    gated_graph_transformer_apply,
    gated_graph_transformer_loss,
)
