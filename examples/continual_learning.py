"""Example: query-feedback continual learning with SONA + EWC.

The serving loop records trajectories from search feedback; the instant
loop adapts MicroLoRA per query, the background loop consolidates patterns
into BaseLoRA under EWC++ constraints (BASELINE.json config 4).

Run: PYTHONPATH=. python examples/continual_learning.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from ruvector_tpu.graph import build_knn_graph
    from ruvector_tpu.ops.distance import pairwise_cosine
    from ruvector_tpu.sona import SonaConfig, SonaEngine
    from ruvector_tpu.sona.export import export_lora

    rng = np.random.default_rng(0)
    n, d = 500, 32
    centers = rng.normal(size=(8, d)).astype(np.float32)
    labels = rng.integers(0, 8, size=n)
    feats = (centers[labels] + 0.5 * rng.normal(size=(n, d))).astype(np.float32)
    x = jnp.asarray(feats)

    engine = SonaEngine(config=SonaConfig(
        hidden_dim=d, embedding_dim=d, flush_threshold=8,
        background_interval_s=0.0, quality_threshold=0.2,
    ))

    print("serving 100 queries with feedback ...")
    for step in range(100):
        qi = int(rng.integers(0, n))
        q = feats[qi]
        # micro-LoRA adapts the query representation online
        q_adapted = np.asarray(engine.apply_micro_lora(q[None]))[0]
        sims = np.asarray(pairwise_cosine(jnp.asarray(q_adapted[None]), x))[0]
        top = np.argsort(-sims)[1:6]
        reward = float((labels[top] == labels[qi]).mean())

        b = engine.begin_trajectory(q)
        for t in top:
            b.add_step(feats[t], np.ones(1), reward=reward)
        engine.end_trajectory(b, quality=reward)

        if step % 25 == 24:
            msg = engine.tick()
            if msg:
                print(f"  step {step}: {msg}")

    engine.flush()
    s = engine.stats
    print(f"trajectories: {s.trajectories_seen}, background cycles: "
          f"{s.background_cycles}, patterns: {s.patterns_total}")

    export_lora(engine, "/tmp/sona_lora.safetensors")
    print("exported adapters to /tmp/sona_lora.safetensors")


if __name__ == "__main__":
    main()
