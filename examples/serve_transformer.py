"""Serving example: mincut-gated transformer with batched greedy decode.

Shows the production decode path — one jitted whole-generation scan,
vmapped over a request batch — plus the gate controller's tier decisions
and the deterministic witness chain for the served batch.

Run: PYTHONPATH=. python examples/serve_transformer.py [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ruvector_tpu.transformer import (
        GatePolicy, MincutGatedTransformer, TransformerConfig, init_weights,
    )
    from ruvector_tpu.transformer.decode import (
        Decoder, make_batched_generate_fn,
    )
    from ruvector_tpu.utils.witness import WitnessLog

    cfg = TransformerConfig.baseline()
    weights = init_weights(jax.random.key(0), cfg)
    model = MincutGatedTransformer(cfg, GatePolicy(), weights)
    dec = Decoder(cfg, GatePolicy(), weights)

    rng = np.random.default_rng(0)
    prompt_len = 8
    prompts = rng.integers(0, cfg.vocab, size=(args.batch, prompt_len))

    # 1. single infer showing the gate's tier decision + witness
    out = model.infer(tokens=prompts[0])
    print(f"gate tier={out.witness.tier} decision={out.witness.decision} "
          f"layers_run={out.witness.layers_run} "
          f"logits_hash={out.witness.logits_hash[:12]}…")

    # 2. batched decode: one compiled program for the whole batch
    gen = make_batched_generate_fn(cfg, dec.cache_cfg, prompt_len,
                                   args.new_tokens)
    caches = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[dec.init_caches() for _ in range(args.batch)])
    p = jnp.asarray(prompts, jnp.int32)

    tokens, _ = gen(weights, caches, p)          # compile
    jax.block_until_ready(tokens)
    t0 = time.perf_counter()
    tokens, _ = gen(weights, caches, p)
    jax.block_until_ready(tokens)
    dt = time.perf_counter() - t0
    total = args.batch * (prompt_len + args.new_tokens)
    print(f"decoded {total} tokens in {dt*1e3:.1f} ms "
          f"({total/dt:.0f} tokens/s)")

    # 3. witness chain over the served outputs (determinism audit)
    log = WitnessLog()
    for i, row in enumerate(np.asarray(tokens)):
        log.record(f"request_{i}", row.astype(np.float32), step=i)
    print(f"witness head: {log.head[:16]}…  verified={log.verify()}")

    # decode twice -> identical tokens (deterministic serving)
    tokens2, _ = gen(weights, caches, p)
    assert np.array_equal(np.asarray(tokens), np.asarray(tokens2))
    print("determinism check: identical batch on re-serve")

    # 4. speculative decoding: token-identical to greedy, batched chunk
    # verification (2.55x greedy at full acceptance on TPU — BENCH_SUITE)
    g = dec.generate(prompts[0], max_new_tokens=16)
    s = dec.generate_speculative(prompts[0], max_new_tokens=16)
    assert list(g.tokens) == list(s.tokens)
    print(f"speculative == greedy over {len(s.tokens)} tokens "
          f"(gamma=4 self-drafting)")


if __name__ == "__main__":
    main()
