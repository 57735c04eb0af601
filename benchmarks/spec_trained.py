"""Speculative decoding with a TRAINED draft (VERDICT r2 missing#2).

Round 2 measured acceptance 0.005 on random weights and a draft==target
ceiling of 2.55x — nothing showed the mechanism pays on a model whose
draft actually predicts the target. This bench trains early-exit
(LayerSkip-style) weights on a peaked Markov corpus
(transformer/train_spec.py: joint CE at draft depth and full depth,
shared head), then measures REAL acceptance and REAL wall speedup of
speculative vs greedy decoding on the same trained weights, decoding
in-distribution prompts.

Writes SPEC_TRAINED_r03.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import device_time  # noqa: E402  (honest tunnel timing)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

    from ruvector_tpu.transformer.config import TransformerConfig
    from ruvector_tpu.transformer.decode import make_decode_step, make_generate_fn
    from ruvector_tpu.transformer.kv_cache import KVCacheConfig, kv_cache_init
    from ruvector_tpu.transformer.spec_decode import (
        SpecDecodeConfig,
        make_speculative_generate_fn,
    )
    from ruvector_tpu.transformer.train_spec import (
        markov_corpus,
        train_early_exit,
    )

    cfg = TransformerConfig(
        seq_len_max=256, hidden=256, heads=4, layers=8, vocab=256,
        logits=256, layers_degraded=4, seq_len_degraded=64, seq_len_safe=32)
    t0 = time.time()
    res = train_early_exit(cfg, draft_layers=1, steps=300, batch=32,
                           seq_len=48, lr=3e-3, seed=0)
    t_train = time.time() - t0
    weights = res.weights

    new_tokens = 96
    gamma = 6
    cache_cfg = KVCacheConfig(
        hot_capacity=256, warm_capacity=0, archive_capacity=0,
        heads=cfg.heads, head_dim=cfg.head_dim)

    prompt_np, _ = markov_corpus(0, cfg.vocab, n_seq=1, seq_len=9,
                                 sample_seed=1234)
    prompt = prompt_np[0]

    def warm_caches():
        caches = [kv_cache_init(cache_cfg) for _ in range(cfg.layers)]
        step_fn = make_decode_step(cfg, cache_cfg)
        logits = None
        for pos, t in enumerate(prompt):
            logits, caches = step_fn(weights, caches, jnp.int32(int(t)),
                                     jnp.int32(pos), jnp.bool_(True))
        return caches, jnp.argmax(logits).astype(jnp.int32)

    # --- greedy baseline (prompt consumption + decode in one scan) ---
    gen = make_generate_fn(cfg, cache_cfg, prompt_len=len(prompt),
                           max_new_tokens=new_tokens)

    def fresh_caches():
        return [kv_cache_init(cache_cfg) for _ in range(cfg.layers)]

    out_g = gen(weights, fresh_caches(), jnp.asarray(prompt))
    dt_g = device_time(gen, weights, fresh_caches(), jnp.asarray(prompt))

    # --- speculative with the trained draft ---
    sgen = make_speculative_generate_fn(
        cfg, cache_cfg, SpecDecodeConfig(gamma=gamma, draft_layers=1),
        new_tokens)
    caches_s, first = warm_caches()
    out_s = sgen(weights, caches_s, first)
    dt_s = device_time(sgen, weights, caches_s, first)

    commits = np.asarray(out_s[4])
    done_at = int(np.searchsorted(np.cumsum(commits), float(out_s[1])))
    n_macros = done_at + 1
    acceptance = float(out_s[3]) / max((gamma - 1) * n_macros, 1)
    tokens_per_macro = float(out_s[1]) / max(n_macros, 1)

    # token identity: speculative greedy == plain greedy
    toks_g = np.asarray(out_g[0])[len(prompt):]
    toks_s = np.asarray(out_s[0])[:int(out_s[1])]
    k = min(len(toks_g), len(toks_s))
    identical = bool((toks_g[:k] == toks_s[:k]).all())

    payload = {
        "config": "trained early-exit draft (train_spec.py), 8 layers x "
                  "256 hidden, draft_layers=1, gamma=6, Markov corpus",
        "backend": jax.devices()[0].platform,
        "train_s": round(t_train, 1),
        "train_loss_first": round(res.losses[0], 3),
        "train_loss_last": round(res.losses[-1], 3),
        "eval_full_acc": round(res.full_acc, 3),
        "eval_draft_acc": round(res.draft_acc, 3),
        "eval_agreement": round(res.agreement, 3),
        "new_tokens": new_tokens,
        "greedy_s": round(dt_g, 3),
        "speculative_s": round(dt_s, 3),
        "greedy_tokens_per_s": round((len(prompt) + new_tokens) / dt_g, 1),
        "speculative_tokens_per_s": round(new_tokens / dt_s, 1),
        "measured_acceptance": round(acceptance, 3),
        "tokens_per_macro_step": round(tokens_per_macro, 2),
        "measured_speedup_vs_greedy": round((dt_g / (len(prompt) + new_tokens)) / (dt_s / new_tokens), 2),
        "token_identical_to_greedy": identical,
        "r02_random_weight_acceptance": 0.005,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SPEC_TRAINED_r03.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
