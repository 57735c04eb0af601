"""MincutGatedTransformer — tiered, deterministic, int8 inference.

Reference: ruvector-mincut-gated-transformer/src/model.rs — infer
(:393-465), run_layers (:534), run_single_layer (:583), output projection
(:631), witness creation (:640). The TPU design compiles ONE static program
per tier (normal/degraded/safe): layers_to_run, seq_len, and attention
window are compile-time constants, so the hot path is a single XLA
executable per tier — the analogue of the reference's allocation-free
preplanned buffers.

Layer: pre-LayerNorm → windowed causal MHA with RoPE (int8 QKV/out
projections) → residual → LayerNorm → FFN (int8, GELU) → residual.
Early exit: after each layer the hidden-state change is measured; once the
relative change drops below threshold the remaining layers are skipped
(CoherenceEarlyExit, early_exit.rs) — done with lax.while_loop so it stays
one compiled program and fully deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.attention.rope import rope_rotate, rope_tables
from ruvector_tpu.transformer.config import GatePolicy, TransformerConfig
from ruvector_tpu.transformer.gate import GateController
from ruvector_tpu.transformer.packets import (
    GateDecision,
    GatePacket,
    InferOutput,
    SpikePacket,
    Witness,
)
from ruvector_tpu.transformer.quant import int8_matmul, quantize_weight_int8


# --- weights ----------------------------------------------------------------

def init_weights(key, cfg: TransformerConfig, quantize: bool = True) -> dict:
    """Random-init (or load) weights; int8-quantized per channel."""
    d, f, v, lg = cfg.hidden, cfg.ffn_dim, cfg.vocab, cfg.logits
    n_layers = cfg.layers

    def dense(k, i, o):
        w = jax.random.normal(k, (i, o)) * (2.0 / (i + o)) ** 0.5
        if quantize:
            wq, s = quantize_weight_int8(w)
            return {"w_q": wq, "scale": s, "bias": jnp.zeros((o,))}
        return {"w": w, "bias": jnp.zeros((o,))}

    keys = jax.random.split(key, n_layers * 6 + 2)
    layers = []
    for l in range(n_layers):
        k0, k1, k2, k3, k4, k5 = keys[l * 6 : l * 6 + 6]
        layers.append({
            "qkv": dense(k0, d, 3 * d),
            "out": dense(k1, d, d),
            "ffn_in": dense(k2, d, f),
            "ffn_out": dense(k3, f, d),
            "ln1": {"gamma": jnp.ones((d,)), "beta": jnp.zeros((d,))},
            "ln2": {"gamma": jnp.ones((d,)), "beta": jnp.zeros((d,))},
        })
    emb = jax.random.normal(keys[-2], (v, d)) * 0.02
    head = dense(keys[-1], d, lg)
    final_ln = {"gamma": jnp.ones((d,)), "beta": jnp.zeros((d,))}
    return {"embedding": emb, "layers": layers, "head": head, "final_ln": final_ln}


def _apply_dense(p: dict, x: jax.Array) -> jax.Array:
    if "w_q" in p:
        return int8_matmul(x, p["w_q"], p["scale"], p["bias"])
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["bias"]


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


# --- core block -------------------------------------------------------------

def _windowed_causal_mask(s: int, window: int) -> jax.Array:
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return ((cols <= rows) & (rows - cols < window)).astype(jnp.float32)


def _layer_fn(layer_params, x, cos_t, sin_t, mask, heads):
    s, d = x.shape
    hd = d // heads
    h = _ln(layer_params["ln1"], x)
    qkv = _apply_dense(layer_params["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    pos = jnp.arange(s, dtype=jnp.int32)
    q = rope_rotate(q.reshape(s, heads, hd).transpose(1, 0, 2),
                    pos[None, :], cos_t, sin_t)
    k = rope_rotate(k.reshape(s, heads, hd).transpose(1, 0, 2),
                    pos[None, :], cos_t, sin_t)
    v = v.reshape(s, heads, hd).transpose(1, 0, 2)          # [H, S, hd]

    scale = 1.0 / (hd ** 0.5)
    scores = jnp.einsum("hqd,hkd->hqk", q, k) * scale
    scores = jnp.where(mask[None] > 0, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("hqk,hkd->hqd", attn, v)
    ctx = ctx.transpose(1, 0, 2).reshape(s, d)
    x = x + _apply_dense(layer_params["out"], ctx)

    h2 = _ln(layer_params["ln2"], x)
    ff = _apply_dense(layer_params["ffn_out"],
                      jax.nn.gelu(_apply_dense(layer_params["ffn_in"], h2)))
    return x + ff


# --- model ------------------------------------------------------------------

class MincutGatedTransformer:
    """Gated transformer with per-tier compiled programs.

    infer(input_tokens_or_embedding, gate, spikes) -> InferOutput with
    logits + witness (model.rs:393-465 flow: gate evaluate → tier →
    run layers with early exit → output projection → witness).
    """

    def __init__(self, config: TransformerConfig, policy: GatePolicy,
                 weights: dict, early_exit_threshold: float = 0.0,
                 sparsity_config=None, mod_config=None):
        """sparsity_config: transformer.sparse_attention.SparsityConfig —
        min-cut partition-structured attention masks built from the gate.
        mod_config: transformer.mod_routing.ModRoutingConfig — Mixture-of-
        Depths token routing (tokens off the route keep their residual).
        """
        self.config = config
        self.policy = policy
        self.weights = weights
        self.gate_controller = GateController(policy, config)
        self.early_exit_threshold = early_exit_threshold
        self._programs: dict = {}
        cos_t, sin_t = rope_tables(
            config.head_dim, config.seq_len_max, config.rope_base,
            config.rope_scaling, config.rope_scaling_factor,
        )
        self._rope = (cos_t, sin_t)
        self._cached_logits: np.ndarray | None = None
        self._sparse = None
        if sparsity_config is not None:
            from ruvector_tpu.transformer.sparse_attention import (
                MincutSparseAttention,
            )
            self._sparse = MincutSparseAttention(sparsity_config)
        self._router = None
        if mod_config is not None:
            from ruvector_tpu.transformer.mod_routing import MincutDepthRouter
            self._router = MincutDepthRouter(mod_config)

    def _program(self, layers_to_run: int, seq_len: int, window: int):
        """One jitted program per (layers, seq, window) tier signature."""
        key = (layers_to_run, seq_len, window)
        if key in self._programs:
            return self._programs[key]

        cfg = self.config
        cos_t, sin_t = self._rope
        thresh = self.early_exit_threshold

        @functools.partial(jax.jit, static_argnames=("from_tokens",))
        def run(weights, x, last_pos, extra_mask, mod_masks,
                from_tokens=False):
            # x: [seq_len] int32 token ids (from_tokens) or [seq_len, hidden]
            # embeddings; extra_mask: [S, S] (sparse-attention structure
            # ANDed with the windowed causal mask); mod_masks:
            # [layers_to_run, S] per-layer MoD compute masks (1 = compute).
            if from_tokens:
                # embedding lookup stays ON DEVICE (a host-side gather would
                # pull the whole table across the wire every call)
                x = weights["embedding"][x]
            mask = _windowed_causal_mask(seq_len, window) * extra_mask

            def body(carry):
                i, h, prev_delta, done = carry
                h_new = jax.lax.switch(
                    jnp.minimum(i, layers_to_run - 1),
                    [functools.partial(_layer_fn, lp, cos_t=cos_t, sin_t=sin_t,
                                       mask=mask, heads=cfg.heads)
                     for lp in weights["layers"][:layers_to_run]],
                    h,
                )
                # MoD: skipped tokens keep their residual (mod_routing.rs)
                layer_mask = mod_masks[jnp.minimum(i, layers_to_run - 1)]
                h_new = jnp.where(layer_mask[:, None] > 0, h_new, h)
                # coherence early exit: relative change below threshold
                delta = jnp.linalg.norm(h_new - h) / jnp.maximum(
                    jnp.linalg.norm(h), 1e-8
                )
                exit_now = (thresh > 0) & (delta < thresh)
                return i + 1, h_new, delta, done | exit_now

            def cond(carry):
                i, _, _, done = carry
                return (i < layers_to_run) & (~done)

            i, h, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), x, jnp.float32(1.0), jnp.bool_(False))
            )
            h = _ln(weights["final_ln"], h)
            # logits at the last REAL token position (zero-padding beyond)
            last = jax.lax.dynamic_index_in_dim(h, last_pos, 0, keepdims=False)
            logits = _apply_dense(weights["head"], last)
            return logits, i

        self._programs[key] = run
        return run

    def infer(
        self,
        tokens: np.ndarray | None = None,
        gate: GatePacket = GatePacket(),
        spikes: SpikePacket | None = None,
        embedding: np.ndarray | None = None,
    ) -> InferOutput:
        decision = self.gate_controller.evaluate(gate, spikes)
        kv_ok = self.gate_controller.should_allow_kv_writes(gate)
        ext_ok = self.gate_controller.should_allow_external_writes(gate)

        if decision.skip:
            # tier 3: return cached logits or zeros (model.rs:410-430)
            logits = (
                self._cached_logits
                if self._cached_logits is not None
                else np.zeros(self.config.logits, np.float32)
            )
            witness = Witness(
                tier=decision.tier, decision=decision.decision,
                reason=decision.reason, kv_writes_enabled=0,
                external_writes_enabled=0, layers_run=0, early_exit_layer=0,
                logits_hash=Witness.hash_logits(logits),
            )
            return InferOutput(logits=logits, witness=witness,
                               stats={"skipped": True})

        s = decision.effective_seq_len
        from_tokens = embedding is None
        if from_tokens:
            ids = np.asarray(tokens, np.int32)[:s]
            x = np.zeros(s, np.int32)
            x[: len(ids)] = ids
            x = jnp.asarray(x)
        else:
            e = np.asarray(embedding, np.float32)[:s]
            if e.shape[0] < s:
                e = np.concatenate(
                    [e, np.zeros((s - e.shape[0], self.config.hidden),
                                 np.float32)]
                )
            x = jnp.asarray(e)

        n_real = min(
            len(tokens) if tokens is not None else embedding.shape[0], s
        )

        # sparse-attention structure from the gate (sparse_attention.rs);
        # the all-ones default is cached per seq len (device-resident)
        if self._sparse is not None:
            extra_mask = jnp.asarray(
                self._sparse.build_mask(gate, s).mask.astype(np.float32)
            )
        else:
            if not hasattr(self, "_ones_masks"):
                self._ones_masks = {}
            if s not in self._ones_masks:
                self._ones_masks[s] = jnp.ones((s, s), jnp.float32)
            extra_mask = self._ones_masks[s]

        # MoD routing from the gate (mod_routing.rs); padding never computes
        if self._router is not None:
            routes = self._router.route_tokens(gate, np.arange(n_real))
            base = self._router.compute_layer_mask(routes).astype(np.float32)
            row = np.zeros(s, np.float32)
            row[:n_real] = base
            row[max(n_real - 1, 0)] = 1.0   # logits position always computes
            mod_masks = jnp.asarray(
                np.tile(row, (decision.layers_to_run, 1))
            )
        else:
            if not hasattr(self, "_ones_mod"):
                self._ones_mod = {}
            key = (decision.layers_to_run, s)
            if key not in self._ones_mod:
                self._ones_mod[key] = jnp.ones(key, jnp.float32)
            mod_masks = self._ones_mod[key]

        run = self._program(decision.layers_to_run, s, decision.effective_window)
        logits, layers_run = run(
            self.weights, x, jnp.int32(max(n_real - 1, 0)),
            extra_mask, mod_masks, from_tokens=from_tokens,
        )
        logits = np.asarray(logits)
        self._cached_logits = logits

        witness = Witness(
            tier=decision.tier, decision=decision.decision,
            reason=decision.reason,
            kv_writes_enabled=int(kv_ok and decision.decision
                                  not in (GateDecision.FLUSH_KV,
                                          GateDecision.FREEZE_WRITES)),
            external_writes_enabled=int(ext_ok and decision.decision
                                        == GateDecision.ALLOW),
            layers_run=int(layers_run),
            early_exit_layer=int(layers_run)
            if int(layers_run) < decision.layers_to_run else 0,
            logits_hash=Witness.hash_logits(logits),
        )
        return InferOutput(
            logits=logits, witness=witness,
            stats={"tier": decision.tier, "layers_run": int(layers_run)},
        )
