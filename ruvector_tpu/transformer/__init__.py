"""Mincut-gated transformer — deterministic, tiered, quantized inference.

TPU-native re-design of `ruvector-mincut-gated-transformer` (27k LoC Rust).
The reference's three roles (lib.rs:29-36) map as:

1. **Transformer kernel** — int8-quantized batched GEMMs on the MXU
   (replacing Q15 fixed-point scalar loops, q15.rs / kernel/qgemm.rs),
   windowed attention with RoPE, FFN. Deterministic: fixed shapes, no RNG,
   one compiled program per tier.
2. **Spike scheduler** — host-side skip/tier pre-selection (spike.rs).
3. **Mincut gate** — authoritative GateController (gate.rs:195-297) that
   picks the compute tier; each tier is a separately-jitted static program
   (layers_to_run, seq_len, window are compile-time constants — the
   XLA-native version of "allocation-free tiered compute").

Every inference emits a Witness (packets.rs) recording the gate decision
and a hash of the logits — same inputs ⇒ same witness (determinism tests
mirror tests/determinism.rs:17-40).
"""

from ruvector_tpu.transformer.config import TransformerConfig, GatePolicy
from ruvector_tpu.transformer.packets import (
    GatePacket,
    SpikePacket,
    GateDecision,
    GateReason,
    TierDecision,
    Witness,
    InferOutput,
)
from ruvector_tpu.transformer.gate import GateController
from ruvector_tpu.transformer.quant import (
    quantize_weight_int8,
    dequantize_int8,
    int8_matmul,
)
from ruvector_tpu.transformer.model import MincutGatedTransformer, init_weights
from ruvector_tpu.transformer.spec_decode import (
    SpecDecodeConfig,
    make_speculative_generate_fn,
)
from ruvector_tpu.transformer.kv_cache import (
    KVCacheConfig,
    KVCacheState,
    kv_cache_init,
    kv_cache_append,
    kv_cache_positions,
    kv_cache_read,
)

__all__ = [
    "TransformerConfig",
    "GatePolicy",
    "GatePacket",
    "SpikePacket",
    "GateDecision",
    "GateReason",
    "TierDecision",
    "Witness",
    "InferOutput",
    "GateController",
    "quantize_weight_int8",
    "dequantize_int8",
    "int8_matmul",
    "MincutGatedTransformer",
    "init_weights",
    "KVCacheConfig",
    "KVCacheState",
    "SpecDecodeConfig",
    "make_speculative_generate_fn",
    "kv_cache_init",
    "kv_cache_append",
    "kv_cache_positions",
    "kv_cache_read",
    "TraceState",
    "TraceSnapshot",
    "Decoder",
    "make_decode_step",
    "make_generate_fn",
    "make_batched_generate_fn",
]

from ruvector_tpu.transformer.trace import TraceState, TraceSnapshot
from ruvector_tpu.transformer.decode import (
    Decoder,
    make_decode_step,
    make_generate_fn,
    make_batched_generate_fn,
)
