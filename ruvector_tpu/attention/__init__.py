"""Graph-attention mechanism family.

TPU-native re-design of `ruvector-attention` (17 mechanisms, traits.rs:34-254).
The reference's `Attention::compute(query, keys, values)` trait over per-query
Vec<f32> becomes one batched pure-function protocol:

    attend(q [B, D], k [B, S, D], v [B, S, D], mask [B, S]) -> [B, D]

where B is a batch of queries (nodes) and S the attended set (neighbors /
sequence). Parametric mechanisms are (init, apply) pairs; `TrainableAttention`
(traits.rs:202, explicit fwd/bwd/update) disappears — JAX autodiff provides
the backward pass.

Registry: `get_attention(name)` -> mechanism; `list_attention()` -> names.
"""

from ruvector_tpu.attention.base import (
    AttentionMechanism,
    get_attention,
    list_attention,
    register_attention,
)
from ruvector_tpu.attention.scaled_dot import scaled_dot_attention
from ruvector_tpu.attention.flash import flash_attention
from ruvector_tpu.attention.linear_attn import (
    LinearAttentionConfig,
    linear_attention_init,
    linear_attention_apply,
)
from ruvector_tpu.attention.local_global import local_global_attention
from ruvector_tpu.attention.edge_featured import (
    EdgeFeaturedConfig,
    edge_featured_init,
    edge_featured_apply,
)
from ruvector_tpu.attention.mincut import (
    MincutGateConfig,
    attn_mincut,
    dynamic_min_cut,
    HysteresisState,
    hysteresis_init,
    hysteresis_apply,
)
from ruvector_tpu.attention.hyperbolic import (
    poincare_distance,
    mobius_add,
    mobius_scalar_mult,
    exp_map,
    log_map,
    project_to_ball,
    hyperbolic_attention,
)
from ruvector_tpu.attention.rope import graph_rope_encode, rope_rotate
from ruvector_tpu.attention.moe import (
    MoEAttentionConfig,
    moe_attention_init,
    moe_attention_apply,
)
from ruvector_tpu.attention.sdk import (
    AttentionBuilder,
    AttentionPipeline,
    preset,
    PRESETS,
)
# register the extended family (side-effect imports populate the registry)
from ruvector_tpu.attention import dual_space as _dual_space  # noqa: F401
from ruvector_tpu.attention import transport as _transport  # noqa: F401
from ruvector_tpu.attention import info_bottleneck as _ib  # noqa: F401
from ruvector_tpu.attention import pde as _pde  # noqa: F401
from ruvector_tpu.attention import sheaf as _sheaf  # noqa: F401
from ruvector_tpu.attention import mixed_curvature as _mixed  # noqa: F401
from ruvector_tpu.attention import topology as _topology  # noqa: F401
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
    lane_statistics,
    residual_sparse_mask,
    route_by_energy,
    run_with_early_exit,
    tune_thresholds,
)

__all__ = [
    "AttentionMechanism",
    "get_attention",
    "list_attention",
    "register_attention",
    "scaled_dot_attention",
    "flash_attention",
    "LinearAttentionConfig",
    "linear_attention_init",
    "linear_attention_apply",
    "local_global_attention",
    "EdgeFeaturedConfig",
    "edge_featured_init",
    "edge_featured_apply",
    "MincutGateConfig",
    "attn_mincut",
    "dynamic_min_cut",
    "HysteresisState",
    "hysteresis_init",
    "hysteresis_apply",
    "poincare_distance",
    "mobius_add",
    "mobius_scalar_mult",
    "exp_map",
    "log_map",
    "project_to_ball",
    "hyperbolic_attention",
    "graph_rope_encode",
    "rope_rotate",
    "MoEAttentionConfig",
    "moe_attention_init",
    "moe_attention_apply",
    "SparseMaskBuilder",
    "TrainableAttention",
    "Gradients",
    "AttentionBuilder",
    "AttentionPipeline",
    "preset",
    "PRESETS",
]

from ruvector_tpu.attention.mask import SparseMaskBuilder
from ruvector_tpu.attention.trainable import Gradients, TrainableAttention
