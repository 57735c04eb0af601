"""Jitted self-speculative decoding: layer-prefix draft + parallel verify.

Reference: ruvector-mincut-gated-transformer/src/speculative.rs feeds
model.rs's serving loop with draft tokens that the full model verifies.
The TPU-native realization drafts with an EARLY-EXIT PREFIX of the same
model (first `draft_layers` layers + the shared head — the reference's
tiered-compute/early-exit idea, early_exit.rs) and verifies a whole
chunk with ONE full forward in which the chunk's per-token GEMVs batch
into GEMMs. Greedy acceptance keeps the output bit-identical in
token space to plain greedy decoding (same argmax chain), so the
speedup is free of quality change.

Everything runs inside one `lax.scan` over macro steps:

  macro step (chunk of gamma tokens):
    1. draft gamma-1 tokens autoregressively with the cheap prefix,
       attending over the committed KV cache + the chunk so far
       (no cache writes — chunk K/V live in registers)
    2. verify: full model over the whole chunk in parallel
       (causal inside the chunk, cache beyond it)
    3. accept the longest agreeing prefix; commit its K/V into the
       tiered cache with O(1) conditional appends (enabled = i < n)
    4. the target's own argmax at the cut becomes the next chunk's
       first token (bonus token) — at least one token commits per step

Cache rollback never happens: draft/verify never write the cache, so
rejected tokens leave no trace (the tiered ring cache cascades evictions
on append, which a rollback could not undo — see kv_cache.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ruvector_tpu.attention.rope import rope_rotate, rope_tables
from ruvector_tpu.transformer.config import TransformerConfig
from ruvector_tpu.transformer.kv_cache import (
    KVCacheConfig,
    kv_cache_append,
    kv_cache_read,
)
from ruvector_tpu.transformer.model import _apply_dense, _ln


@dataclasses.dataclass(frozen=True)
class SpecDecodeConfig:
    gamma: int = 4           # chunk size (1 bonus + gamma-1 drafts)
    draft_layers: int = 1    # early-exit prefix depth for the draft model


def _attend(q, ks, vs, mask, hd):
    """q [H, hd] against ks/vs [T, H, hd] with mask [T] -> [H, hd]."""
    scale = 1.0 / (hd ** 0.5)
    scores = jnp.einsum("hd,thd->ht", q, ks) * scale
    scores = jnp.where(mask[None, :] > 0, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("ht,thd->hd", attn, vs)


def make_speculative_generate_fn(
    config: TransformerConfig,
    cache_cfg: KVCacheConfig,
    spec: SpecDecodeConfig,
    max_new_tokens: int,
):
    """Build generate(weights, caches, first_token, macro_steps fixed) ->
    (tokens [max_new_tokens], count, caches, accepted_total, chunks).

    `first_token` seeds the chain (e.g. last prompt token's argmax); run
    the prompt through `make_generate_fn` or decode_step first to fill the
    caches. Token output is identical to greedy decoding.
    """
    heads, hd = config.heads, config.head_dim
    gamma = spec.gamma
    dl = spec.draft_layers
    cos_t, sin_t = rope_tables(
        config.head_dim, max(config.seq_len_max * 8, 1024), config.rope_base,
        config.rope_scaling, config.rope_scaling_factor,
    )
    # worst case 1 token per macro step
    macro_steps = max_new_tokens

    def layer_forward(layer, x, pos, cache_k, cache_v, cache_mask,
                      chunk_k, chunk_v, chunk_mask):
        """One token through one layer, attending cache + chunk prefix.
        chunk_k/v [gamma, H, hd] with chunk_mask [gamma] selecting j < i."""
        h = _ln(layer["ln1"], x)
        qkv = _apply_dense(layer["qkv"], h[None, :])[0]
        q, k, v = jnp.split(qkv, 3)
        p = jnp.full((heads,), pos, jnp.int32)
        q = rope_rotate(q.reshape(heads, hd), p, cos_t, sin_t)
        k = rope_rotate(k.reshape(heads, hd), p, cos_t, sin_t)
        v = v.reshape(heads, hd)
        all_k = jnp.concatenate([cache_k, chunk_k, k[None]], axis=0)
        all_v = jnp.concatenate([cache_v, chunk_v, v[None]], axis=0)
        all_m = jnp.concatenate([cache_mask, chunk_mask, jnp.ones((1,))], axis=0)
        ctx = _attend(q, all_k, all_v, all_m, hd).reshape(-1)
        x = x + _apply_dense(layer["out"], ctx[None, :])[0]
        h2 = _ln(layer["ln2"], x)
        ff = _apply_dense(layer["ffn_out"],
                          jax.nn.gelu(_apply_dense(layer["ffn_in"],
                                                   h2[None, :])))[0]
        return x + ff, k, v

    def forward_chunk_token(weights, caches, layer_ids, tok, pos,
                            chunk_ks, chunk_vs, chunk_mask):
        """Run `tok` through layers `layer_ids`, reading caches + chunk
        buffers chunk_ks/vs [L, gamma, H, hd]; returns logits and this
        token's per-layer (k, v) [len(layer_ids), H, hd]."""
        x = weights["embedding"][tok]
        ks, vs = [], []
        for li in layer_ids:
            ck, cv, cm = kv_cache_read(cache_cfg, caches[li])
            x, k, v = layer_forward(
                weights["layers"][li], x, pos, ck, cv, cm,
                chunk_ks[li], chunk_vs[li], chunk_mask)
            ks.append(k)
            vs.append(v)
        x = _ln(weights["final_ln"], x)
        logits = _apply_dense(weights["head"], x[None, :])[0]
        return logits, jnp.stack(ks), jnp.stack(vs)

    @jax.jit
    def generate(weights, caches, first_token):
        n_layers = len(weights["layers"])
        zero_chunk = jnp.zeros((n_layers, gamma, heads, hd), jnp.float32)

        def macro(carry, _):
            caches, b, cursor, out, acc_total = carry
            base_pos = caches[0].length  # committed length = absolute pos of b

            # ---- 1. draft gamma-1 tokens with the layer prefix ----
            draft_ids = list(range(dl))
            dk = zero_chunk
            dv = zero_chunk

            def draft_body(i, state):
                dk, dv, toks, cur = state
                cmask = (jnp.arange(gamma) < i).astype(jnp.float32)
                logits, ks, vs = forward_chunk_token(
                    weights, caches, draft_ids, cur, base_pos + i,
                    dk, dv, cmask)
                dk = dk.at[:dl, i].set(ks)
                dv = dv.at[:dl, i].set(vs)
                toks = toks.at[i].set(cur)
                return dk, dv, toks, jnp.argmax(logits).astype(jnp.int32)

            toks0 = jnp.zeros((gamma,), jnp.int32)
            dk, dv, chunk_toks, _ = jax.lax.fori_loop(
                0, gamma, draft_body, (dk, dv, toks0, b))
            # chunk_toks = [b, d1, ..., d_{gamma-1}]

            # ---- 2. verify: full model over the WHOLE chunk in one
            # batched pass. This is where speculation pays on TPU: the
            # per-token decode GEMVs become [gamma, hidden] GEMMs, so the
            # weight stream from HBM is amortized over gamma tokens
            # (speculative.rs's tree verification role, flattened to the
            # accepted chain). Same math as the sequential token loop —
            # token i attends cache + chunk positions j <= i.
            all_ids = list(range(n_layers))
            X = weights["embedding"][chunk_toks]            # [G, hidden]
            causal = (jnp.arange(gamma)[None, :]
                      <= jnp.arange(gamma)[:, None])        # [G, G]
            vks, vvs = [], []
            for li in all_ids:
                layer = weights["layers"][li]
                ck_l, cv_l, cm_l = kv_cache_read(cache_cfg, caches[li])
                h = _ln(layer["ln1"], X)
                qkv = _apply_dense(layer["qkv"], h)         # [G, 3*H*hd]
                q, k, v = jnp.split(qkv, 3, axis=-1)
                poss = base_pos + jnp.arange(gamma, dtype=jnp.int32)
                rot = jax.vmap(
                    lambda x, p: rope_rotate(
                        x.reshape(heads, hd),
                        jnp.full((heads,), p, jnp.int32), cos_t, sin_t))
                q = rot(q, poss)                            # [G, H, hd]
                k = rot(k, poss)
                v = v.reshape(gamma, heads, hd)
                scale = 1.0 / (hd ** 0.5)
                s_cache = jnp.einsum("ghd,thd->ght", q, ck_l) * scale
                s_cache = jnp.where(cm_l[None, None, :] > 0, s_cache, -1e30)
                s_chunk = jnp.einsum("ghd,jhd->ghj", q, k) * scale
                s_chunk = jnp.where(causal[:, None, :], s_chunk, -1e30)
                s_all = jnp.concatenate([s_cache, s_chunk], axis=-1)
                attn = jax.nn.softmax(s_all, axis=-1)
                tc = ck_l.shape[0]
                ctx = (jnp.einsum("ght,thd->ghd", attn[..., :tc], cv_l)
                       + jnp.einsum("ghj,jhd->ghd", attn[..., tc:], v))
                X = X + _apply_dense(layer["out"],
                                     ctx.reshape(gamma, heads * hd))
                h2 = _ln(layer["ln2"], X)
                X = X + _apply_dense(
                    layer["ffn_out"],
                    jax.nn.gelu(_apply_dense(layer["ffn_in"], h2)))
                vks.append(k)
                vvs.append(v)
            Xf = _ln(weights["final_ln"], X)
            chunk_logits = _apply_dense(weights["head"], Xf)  # [G, logits]
            vk = jnp.stack(vks)                             # [L, G, H, hd]
            vv = jnp.stack(vvs)
            targets = jnp.argmax(chunk_logits, axis=-1).astype(jnp.int32)

            # ---- 3. accept longest agreeing prefix of the drafts ----
            # draft i (i>=1) is accepted iff all drafts 1..i matched the
            # target argmax at the previous chunk position
            agree = chunk_toks[1:] == targets[:-1]            # [gamma-1]
            acc_prefix = jnp.cumprod(agree.astype(jnp.int32))
            n_acc = jnp.sum(acc_prefix)                       # in [0, gamma-1]
            n_commit = 1 + n_acc                              # bonus always

            # ---- 4. commit the accepted chunk K/V ----
            new_caches = []
            for li in all_ids:
                c = caches[li]
                for i in range(gamma):
                    c = kv_cache_append(cache_cfg, c, vk[li, i], vv[li, i],
                                        enabled=i < n_commit)
                new_caches.append(c)

            # ---- 5. emit committed tokens; next chain token ----
            idx = jnp.arange(gamma)
            emit_pos = cursor + idx
            ok = (idx < n_commit) & (emit_pos < max_new_tokens)
            # disabled writes land on the scratch slot max_new_tokens
            out = out.at[jnp.where(ok, emit_pos, max_new_tokens)].set(chunk_toks)
            b_next = targets[n_acc]
            return ((new_caches, b_next, cursor + n_commit, out, acc_total
                     + n_acc),
                    n_commit)

        out0 = jnp.zeros((max_new_tokens + 1,), jnp.int32)
        commits0 = jnp.zeros((macro_steps,), jnp.int32)

        # while_loop, not a fixed-length scan: at high acceptance only
        # ~max_new/gamma macro steps are needed — running the rest would
        # forfeit the speculative speedup the chunking just bought
        def cond(state):
            carry, commits, step = state
            _, _, cursor, _, _ = carry
            return (cursor < max_new_tokens) & (step < macro_steps)

        def body(state):
            carry, commits, step = state
            carry, n_commit = macro(carry, None)
            return carry, commits.at[step].set(n_commit), step + 1

        (carry, commits, _) = jax.lax.while_loop(
            cond, body,
            ((caches, first_token, jnp.zeros((), jnp.int32), out0,
              jnp.zeros((), jnp.int32)), commits0,
             jnp.zeros((), jnp.int32)))
        caches, b, cursor, out, acc_total = carry
        count = jnp.minimum(cursor, max_new_tokens)
        return out[:max_new_tokens], count, caches, acc_total, commits

    return generate
