"""Incremental decoding with the tiered KV cache + speculative loop.

Reference: the serving path of ruvector-mincut-gated-transformer —
model.rs run_layers with KV reads/writes (kv_cache/manager.rs), gate-
controlled flush (FlushKv decision), and speculative decoding
(speculative.rs).

decode_step is one jitted program: embed token -> per layer (attend over
the cache's materialized K/V + the new token, append to cache) -> logits.
Cache tiers quantize transparently inside kv_cache_append. The generate()
host loop drives it and consults the gate before each KV write.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.attention.rope import rope_rotate, rope_tables
from ruvector_tpu.transformer.config import GatePolicy, TransformerConfig
from ruvector_tpu.transformer.gate import GateController
from ruvector_tpu.transformer.kv_cache import (
    KVCacheConfig,
    KVCacheState,
    kv_cache_append,
    kv_cache_flush,
    kv_cache_init,
    kv_cache_read,
)
from ruvector_tpu.transformer.model import _apply_dense, _ln
from ruvector_tpu.transformer.packets import GatePacket


def make_decode_step(config: TransformerConfig, cache_cfg: KVCacheConfig):
    """Build the jitted single-token decode step.

    step(weights, caches [L], token_id, position, kv_write_enabled) ->
        (logits [logits], new_caches)
    kv_write_enabled is a traced bool: when the gate freezes KV writes the
    step still attends over the existing cache but does not extend it.
    """
    cos_t, sin_t = rope_tables(
        config.head_dim, max(config.seq_len_max * 8, 1024), config.rope_base,
        config.rope_scaling, config.rope_scaling_factor,
    )
    heads, hd = config.heads, config.head_dim

    @jax.jit
    def step(weights, caches, token_id, position, kv_write_enabled):
        x = weights["embedding"][token_id]                   # [hidden]
        new_caches = []
        for layer, cache in zip(weights["layers"], caches):
            h = _ln(layer["ln1"], x)
            qkv = _apply_dense(layer["qkv"], h[None, :])[0]
            q, k, v = jnp.split(qkv, 3)
            pos = jnp.full((heads,), position, jnp.int32)
            q = rope_rotate(q.reshape(heads, hd), pos, cos_t, sin_t)
            k = rope_rotate(k.reshape(heads, hd), pos, cos_t, sin_t)
            v = v.reshape(heads, hd)

            ck, cv, cmask = kv_cache_read(cache_cfg, cache)  # [T, H, hd]
            # include the current token
            all_k = jnp.concatenate([ck, k[None]], axis=0)
            all_v = jnp.concatenate([cv, v[None]], axis=0)
            all_mask = jnp.concatenate([cmask, jnp.ones((1,))], axis=0)

            scale = 1.0 / (hd ** 0.5)
            scores = jnp.einsum("hd,thd->ht", q, all_k) * scale
            scores = jnp.where(all_mask[None, :] > 0, scores, -1e30)
            attn = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("ht,thd->hd", attn, all_v).reshape(-1)
            x = x + _apply_dense(layer["out"], ctx[None, :])[0]

            h2 = _ln(layer["ln2"], x)
            ff = _apply_dense(layer["ffn_out"],
                              jax.nn.gelu(_apply_dense(layer["ffn_in"],
                                                       h2[None, :])))[0]
            x = x + ff

            # O(1) conditional append: a disabled write lands in the scratch
            # rows instead of where-selecting whole buffers (see kv_cache.py)
            new_caches.append(
                kv_cache_append(cache_cfg, cache, k, v, enabled=kv_write_enabled)
            )

        x = _ln(weights["final_ln"], x)
        logits = _apply_dense(weights["head"], x[None, :])[0]
        return logits, new_caches

    return step


@dataclasses.dataclass
class GenerationResult:
    tokens: list[int]
    kv_flushes: int
    frozen_steps: int
    accepted: int = 0      # speculative path: drafts accepted in total


def make_generate_fn(config: TransformerConfig, cache_cfg: KVCacheConfig,
                     prompt_len: int, max_new_tokens: int):
    """Whole-generation program: prompt consumption + greedy decoding in ONE
    jitted lax.scan — the production serving path (no per-token dispatch).

    Returns generate(weights, caches, prompt_ids [prompt_len]) ->
        (tokens [prompt_len + max_new_tokens], caches).
    """
    step = make_decode_step(config, cache_cfg)
    total = prompt_len + max_new_tokens

    @jax.jit
    def generate(weights, caches, prompt_ids):
        def body(carry, pos):
            caches, prev_logits = carry
            # token at this position: prompt token, or argmax of the last
            # logits once past the prompt
            tok = jnp.where(
                pos < prompt_len,
                prompt_ids[jnp.minimum(pos, prompt_len - 1)],
                jnp.argmax(prev_logits).astype(jnp.int32),
            )
            logits, caches = step(weights, caches, tok, pos, jnp.bool_(True))
            return (caches, logits), tok

        (caches, _), tokens = jax.lax.scan(
            body, (caches, jnp.zeros((config.logits,), jnp.float32)),
            jnp.arange(total, dtype=jnp.int32),
        )
        return tokens, caches

    return generate


def make_batched_generate_fn(config: TransformerConfig,
                             cache_cfg: KVCacheConfig,
                             prompt_len: int, max_new_tokens: int):
    """Batched serving decode: vmap the whole-generation scan over a batch
    of prompts with shared weights — per-token GEMVs become GEMMs, which is
    how the MXU earns its keep at serving time.

    Returns generate(weights, caches_batch, prompt_ids [B, prompt_len]) ->
        (tokens [B, prompt_len + max_new_tokens], caches_batch).
    Build caches_batch by stacking per-sequence init caches, e.g.
    jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[dec.init_caches()
    for _ in range(B)]).
    """
    gen = make_generate_fn(config, cache_cfg, prompt_len, max_new_tokens)
    return jax.jit(jax.vmap(gen, in_axes=(None, 0, 0)))


class Decoder:
    """Host-side generation loop with gate-controlled KV discipline."""

    def __init__(self, config: TransformerConfig, policy: GatePolicy,
                 weights: dict, cache_cfg: KVCacheConfig | None = None):
        self.config = config
        self.weights = weights
        self.cache_cfg = cache_cfg or KVCacheConfig(
            hot_capacity=config.window_normal,
            warm_capacity=config.seq_len_max,
            archive_capacity=config.seq_len_max,
            heads=config.heads, head_dim=config.head_dim,
        )
        self.gate_controller = GateController(policy, config)
        self._step = make_decode_step(config, self.cache_cfg)

    def init_caches(self) -> list[KVCacheState]:
        return [kv_cache_init(self.cache_cfg)
                for _ in range(len(self.weights["layers"]))]

    def generate_speculative(
        self,
        prompt: np.ndarray,
        max_new_tokens: int = 16,
        gamma: int = 4,
        draft_layers: int = 1,
    ) -> GenerationResult:
        """Speculative serving path: early-exit-prefix draft + parallel
        verify (spec_decode.py). Token-identical to greedy; returns the
        acceptance count in GenerationResult.frozen_steps slot's place via
        the `accepted` attribute added on the result."""
        from ruvector_tpu.transformer.spec_decode import (
            SpecDecodeConfig,
            make_speculative_generate_fn,
        )

        caches = self.init_caches()
        logits = None
        pos = 0
        for t in prompt:
            logits, caches = self._step(
                self.weights, caches, jnp.int32(int(t)), jnp.int32(pos),
                jnp.bool_(True),
            )
            pos += 1
        b = jnp.argmax(logits).astype(jnp.int32)
        gen = make_speculative_generate_fn(
            self.config, self.cache_cfg,
            SpecDecodeConfig(gamma=gamma, draft_layers=draft_layers),
            max_new_tokens,
        )
        out, count, _, acc_total, _ = gen(self.weights, caches, b)
        result = GenerationResult(
            tokens=[int(t) for t in prompt] + [int(t) for t in out[:int(count)]],
            kv_flushes=0, frozen_steps=0,
        )
        result.accepted = int(acc_total)
        return result

    def generate(
        self,
        prompt: np.ndarray,
        max_new_tokens: int = 16,
        gate_fn=None,          # step -> GatePacket (coherence stream)
    ) -> GenerationResult:
        caches = self.init_caches()
        tokens = [int(t) for t in prompt]
        flushes = 0
        frozen = 0
        pos = 0
        logits = None
        for t in tokens:
            gate = gate_fn(pos) if gate_fn else GatePacket()
            from ruvector_tpu.transformer.packets import GateDecision
            decision = self.gate_controller.evaluate(gate)
            if decision.decision == GateDecision.FLUSH_KV:
                caches = [kv_cache_flush(self.cache_cfg, c) for c in caches]
                flushes += 1
            kv_ok = self.gate_controller.should_allow_kv_writes(gate)
            if not kv_ok:
                frozen += 1
            logits, caches = self._step(
                self.weights, caches, jnp.int32(t), jnp.int32(pos),
                jnp.bool_(kv_ok),
            )
            pos += 1
        for _ in range(max_new_tokens):
            nxt = int(jnp.argmax(logits))
            tokens.append(nxt)
            gate = gate_fn(pos) if gate_fn else GatePacket()
            kv_ok = self.gate_controller.should_allow_kv_writes(gate)
            logits, caches = self._step(
                self.weights, caches, jnp.int32(nxt), jnp.int32(pos),
                jnp.bool_(kv_ok),
            )
            pos += 1
        return GenerationResult(tokens=tokens, kv_flushes=flushes,
                                frozen_steps=frozen)
