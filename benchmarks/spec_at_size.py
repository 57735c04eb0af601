"""Speculative decoding at production size (VERDICT r4 weak#8 / ask#9).

Round 3 proved the mechanism at 8x256 — a size where greedy already runs
at 8.8k tok/s and nothing needs speculating. This bench re-runs the same
protocol at **12 layers x 1024 hidden x 16 heads** (151M-param class,
where per-token decode is weight-stream bound and batching the verify
GEMMs is the whole point), with **batch 4** sequences decoded jointly
(vmapped speculative while_loops; the batch finishes when its slowest
member does — the deployment-honest accounting).

Protocol (ref: ruvector-mincut-gated-transformer/src/speculative.rs:199-330):
  1. train early-exit (LayerSkip) weights: joint CE at draft depth (2)
     and full depth (12) on a peaked Markov corpus
  2. greedy baseline: batched whole-generation scan (B=4)
  3. speculative: same trained weights, gamma=6, draft_layers=2, vmapped
  4. assert token-identity per sequence, report measured acceptance +
     wall speedup

Writes SPEC_AT_SIZE_r04.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _timing import device_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ruvector_tpu.transformer.config import TransformerConfig
    from ruvector_tpu.transformer.decode import (
        make_batched_generate_fn,
        make_decode_step,
    )
    from ruvector_tpu.transformer.kv_cache import KVCacheConfig, kv_cache_init
    from ruvector_tpu.transformer.spec_decode import (
        SpecDecodeConfig,
        make_speculative_generate_fn,
    )
    from ruvector_tpu.transformer.train_spec import (
        markov_corpus,
        train_early_exit,
    )

    hidden, layers, heads, vocab = 1024, 12, 16, 512
    draft_layers, gamma, batch_b = 2, 6, 4
    new_tokens, prompt_len = 128, 9

    cfg = TransformerConfig(
        seq_len_max=512, hidden=hidden, heads=heads, layers=layers,
        vocab=vocab, logits=vocab, layers_degraded=draft_layers,
        seq_len_degraded=64, seq_len_safe=32)

    t0 = time.time()
    res = train_early_exit(cfg, draft_layers=draft_layers, steps=250,
                           batch=16, seq_len=48, lr=1e-3, seed=0)
    t_train = time.time() - t0
    weights = res.weights
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(weights))

    cache_cfg = KVCacheConfig(
        hot_capacity=256, warm_capacity=0, archive_capacity=0,
        heads=cfg.heads, head_dim=cfg.head_dim)

    # in-distribution prompts, one chain, distinct sample seeds
    prompts_np, _ = markov_corpus(0, cfg.vocab, n_seq=batch_b,
                                  seq_len=prompt_len, sample_seed=1234)
    prompts = jnp.asarray(prompts_np)

    def fresh_caches_batch():
        stacks = [
            [kv_cache_init(cache_cfg) for _ in range(cfg.layers)]
            for _ in range(batch_b)
        ]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stacks)

    # --- greedy baseline: batched whole-generation scan ---
    gen_b = make_batched_generate_fn(cfg, cache_cfg, prompt_len, new_tokens)
    out_g, _ = gen_b(weights, fresh_caches_batch(), prompts)
    dt_g = device_time(gen_b, weights, fresh_caches_batch(), prompts)

    # --- speculative: warm caches on the prompt, then vmapped spec loop ---
    step_fn = make_decode_step(cfg, cache_cfg)
    vstep = jax.jit(jax.vmap(step_fn, in_axes=(None, 0, 0, None, None)))

    def warm_caches_batch():
        caches = fresh_caches_batch()
        logits = None
        for pos in range(prompt_len):
            logits, caches = vstep(weights, caches, prompts[:, pos],
                                   jnp.int32(pos), jnp.bool_(True))
        return caches, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    sgen = make_speculative_generate_fn(
        cfg, cache_cfg, SpecDecodeConfig(gamma=gamma,
                                         draft_layers=draft_layers),
        new_tokens)
    vsgen = jax.jit(jax.vmap(sgen, in_axes=(None, 0, 0)))

    caches_w, first = warm_caches_batch()
    out_s = vsgen(weights, caches_w, first)

    def run_spec(w, c, f):
        return vsgen(w, c, f)

    caches_w2, first2 = warm_caches_batch()
    dt_s = device_time(run_spec, weights, caches_w2, first2)

    toks_s, counts, _, acc_totals, commits = out_s
    toks_s = np.asarray(toks_s)
    counts = np.asarray(counts)
    acc_totals = np.asarray(acc_totals)
    commits = np.asarray(commits)

    # acceptance: accepted drafts / offered drafts, per sequence
    accs, identical = [], True
    toks_g = np.asarray(out_g)[:, prompt_len:]
    for i in range(batch_b):
        done_at = int(np.searchsorted(np.cumsum(commits[i]),
                                      float(counts[i])))
        n_macros = done_at + 1
        accs.append(acc_totals[i] / max((gamma - 1) * n_macros, 1))
        k = min(len(toks_g[i]), int(counts[i]))
        identical &= bool((toks_g[i][:k] == toks_s[i][:k]).all())
    acceptance = float(np.mean(accs))

    total_toks = batch_b * new_tokens
    greedy_tps = batch_b * (prompt_len + new_tokens) / dt_g
    spec_tps = total_toks / dt_s
    speedup = (dt_g / (prompt_len + new_tokens)) / (dt_s / new_tokens)

    payload = {
        "config": f"{layers} layers x {hidden} hidden x {heads} heads, "
                  f"vocab {vocab}, draft_layers={draft_layers}, "
                  f"gamma={gamma}, batch={batch_b}, Markov corpus",
        "backend": jax.devices()[0].platform,
        "n_params": n_params,
        "train_s": round(t_train, 1),
        "train_loss_first": round(res.losses[0], 3),
        "train_loss_last": round(res.losses[-1], 3),
        "eval_full_acc": round(res.full_acc, 3),
        "eval_draft_acc": round(res.draft_acc, 3),
        "eval_agreement": round(res.agreement, 3),
        "new_tokens": new_tokens,
        "greedy_s": round(dt_g, 4),
        "speculative_s": round(dt_s, 4),
        "greedy_tokens_per_s": round(greedy_tps, 1),
        "speculative_tokens_per_s": round(spec_tps, 1),
        "measured_acceptance": round(acceptance, 3),
        "measured_speedup_vs_greedy": round(speedup, 2),
        "token_identical_to_greedy": identical,
        "r03_toy_size": "8x256 (8.8k tok/s greedy — speculation not "
                        "load-bearing there)",
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SPEC_AT_SIZE_r04.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
