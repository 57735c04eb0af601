"""Per-mechanism attention latency at 100 tokens (the reference's bench
target: <100 us per mechanism @ 100 tokens, benches/attention_latency.rs
— whose harness is partly placeholder; ours measures every registered
mechanism for real).

Each mechanism runs scan-looped inside one jit (50 chained applies) with
value-fetch sync, so numbers are device time, not tunnel dispatch.
Mechanisms with host-side stages (mincut's Dinic) are timed per-call and
flagged "host_loop": true.

Run: python benchmarks/attention_latency.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def config_dim(cfg, fallback=64):
    for attr in ("dim", "node_dim", "hidden_dim"):
        if hasattr(cfg, attr):
            return getattr(cfg, attr)
    return fallback


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--tokens", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ruvector_tpu.attention.base import get_attention, list_attention

    s, b = args.tokens, args.batch
    rng = np.random.default_rng(0)
    results = {}

    for name in list_attention():
        mech = get_attention(name)
        cfg = mech.default_config
        d = config_dim(cfg) if cfg is not None else 64
        key = jax.random.key(0)
        try:
            params = mech.init(key, cfg) if mech.init is not None else None
        except Exception as e:
            results[name] = {"error": f"init: {e}"}
            continue

        if name in ("local_global", "mincut"):
            # sequence self-attention signature: q/k/v all [S, D]
            q = jnp.asarray(0.3 * rng.normal(size=(s, d)).astype(np.float32))
            k = jnp.asarray(0.3 * rng.normal(size=(s, d)).astype(np.float32))
            v = jnp.asarray(rng.normal(size=(s, d)).astype(np.float32))
        else:
            q = jnp.asarray(0.3 * rng.normal(size=(b, d)).astype(np.float32))
            k = jnp.asarray(0.3 * rng.normal(size=(b, s, d)).astype(np.float32))
            v = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))

        # difference timing: T(long) - T(short) cancels the fixed
        # dispatch+fetch overhead of the dev tunnel (~tens of ms), leaving
        # pure per-iteration device time
        def make_chain(iters):
            def chain(params, q, k, v):
                def body(x, _):
                    out = mech.apply(params, cfg, x, k, v)
                    return 0.9 * x + 0.1 * out[..., :d], None
                x, _ = jax.lax.scan(body, q, None, length=iters)
                return jnp.sum(x)
            return jax.jit(chain)

        try:
            # escalate the iteration count until the long-short signal
            # clears the tunnel's fetch jitter (multi-ms): round 3 read
            # 0.0 us for 8/18 mechanisms because 500 iterations of a
            # sub-us kernel is less signal than the noise floor
            short = 10
            q2 = q + 0.01
            us = 0.0
            for long_ in (510, 5_010, 50_010):
                f_short, f_long = make_chain(short), make_chain(long_)
                float(f_short(params, q, k, v))        # compile + warm
                float(f_long(params, q, k, v))
                # median-of-3 difference pairs
                diffs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(f_short(params, q2, k, v))
                    t_short = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    float(f_long(params, q2, k, v))
                    t_long = time.perf_counter() - t0
                    diffs.append(t_long - t_short)
                diffs.sort()
                med = max(diffs[1], 1e-9)
                us = med / (long_ - short) * 1e6
                if med > 0.02:          # >=20 ms of signal: jitter-proof
                    break
            entry = {"us_per_call": round(us, 2), "dim": d,
                     "host_loop": False, "amortized_iters": long_}
            results[name] = entry
        except Exception:
            # host-stage mechanism: per-call timing (includes host work)
            try:
                out = mech.apply(params, cfg, q, k, v)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(5):
                    out = mech.apply(params, cfg, q + 0.01, k, v)
                np.asarray(out)
                dt = (time.perf_counter() - t0) / 5
                results[name] = {"us_per_call": round(dt * 1e6, 1),
                                 "dim": d, "host_loop": True}
            except Exception as e:
                results[name] = {"error": str(e)[:120]}

    # CGT at serving batch shape: vmap the lane-modulated block over 32
    # independent sequences (the shape batch decode was benched at) — the
    # router, sparse masks and early-exit energies are all device-side,
    # so the whole batch is one program.
    try:
        from ruvector_tpu.attention.cgt import (
            CgtConfig,
            cgt_block_apply,
            cgt_init,
        )

        ccfg = CgtConfig(dim=64)
        cparams = cgt_init(jax.random.key(1), ccfg)
        xb = jnp.asarray(
            0.3 * rng.normal(size=(32, s, 64)).astype(np.float32))

        def make_cgt_chain(iters):
            vblock = jax.vmap(lambda xx: cgt_block_apply(cparams, ccfg, xx)[0])

            def chain(x):
                def body(x, _):
                    return 0.9 * x + 0.1 * vblock(x), None
                x, _ = jax.lax.scan(body, x, None, length=iters)
                return jnp.sum(x)
            return jax.jit(chain)

        short, long_ = 10, 210
        g_short, g_long = make_cgt_chain(short), make_cgt_chain(long_)
        float(g_short(xb)); float(g_long(xb))
        diffs = []
        for _ in range(3):
            t0 = time.perf_counter(); float(g_short(xb + 0.01))
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter(); float(g_long(xb + 0.01))
            t_l = time.perf_counter() - t0
            diffs.append(t_l - t_s)
        diffs.sort()
        us = max(diffs[1], 1e-9) / (long_ - short) * 1e6
        results["cgt_batch32"] = {
            "us_per_call": round(us, 1), "dim": 64, "batch": 32,
            "host_loop": False,
            "note": "vmapped lane-modulated CGT block, batch 32 x 100 tok",
        }
    except Exception as e:
        results["cgt_batch32"] = {"error": str(e)[:120]}

    # reference target: <100 us per mechanism @ 100 tokens
    # (benches/attention_latency.rs). Asserted per row; batch rows are
    # judged per sequence.
    for name, e in results.items():
        if "us_per_call" in e:
            per_seq = e["us_per_call"] / e.get("batch", 1)
            e["meets_target_100us"] = bool(per_seq < 100.0)
    payload = {"tokens": s, "batch": b,
               "backend": jax.devices()[0].platform,
               "reference_target_us": 100,
               "all_meet_target": all(
                   e.get("meets_target_100us", False)
                   for e in results.values() if "error" not in e),
               "mechanisms": results}
    print(json.dumps(payload, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
