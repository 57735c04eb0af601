"""GATE_STALENESS_r04.json — output quality under sustained drift with a
budget-capped gate refresh (VERDICT r4 ask #5).

Round 3 pinned init==stateless, zero-drift reuse and the budget cap, but
nothing bounded what a STALE mask costs: under sustained feature drift
the budget (nB/16 per layer per step) refreshes the oldest flagged
partitions first, so every mask's age is bounded by
ceil(flagged/budget) steps — this bench measures what that staleness
does to the OUTPUT.

Protocol (250k-node clustered graph, 2 layers, bf16 compute):
  drive `steps` drift steps (feature perturbation each step); at each
  step run BOTH
    - the budgeted incremental step (gated_graph_transformer_step), and
    - a fresh full solve at the same features (gate_state_init ==
      zero-staleness oracle),
  and record relative output divergence ||out_budget - out_fresh|| /
  ||out_fresh||, the mask-disagreement fraction, and the age
  distribution. Repeated for max_gate_age=0 (pure hysteresis) and
  max_gate_age=8 (hard bound) to show the bound engaging.

Asserted in the artifact: (a) with max_gate_age=A and budget B such
that nb <= 2*B*A, the realized mask age never exceeds A after the
first rotation (the escalation pass in gated.py doubles the effective
budget on bound-threatening steps); (b) output divergence decreases
monotonically as the staleness knob tightens (age0/B -> age8/B ->
age4/2B) — the knob works and its cost is the budget.
Ref semantics: gating.rs:70-102 hysteresis.

Run: python benchmarks/gate_staleness.py [--nodes N] [--steps K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scale_sweep_r02 import gen_cluster_graph  # noqa: E402

BLOCK = 256
DEGREE = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=249_856)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--drift", type=float, default=0.05)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ruvector_tpu.graph import build_block_dense
    from ruvector_tpu.graph_transformer.gated import (
        GatedGraphTransformerConfig,
        gate_state_init,
        gated_graph_transformer_init,
        gated_graph_transformer_step,
    )

    n, d = args.nodes, args.dim
    feats, idx, mask, ew = gen_cluster_graph(n, d, DEGREE)
    bdg = build_block_dense(
        jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(ew), block=BLOCK)
    nb = bdg.n_blocks

    rows = {}
    # (age bound, budget): bound holds when nb <= 2*budget*bound (the
    # escalation pass doubles the effective budget on bound-threatening
    # steps). nb=976: (8, nb/16=61) -> 2*61*8=976 and (4, nb/8=122) ->
    # 2*122*4=976 — both exactly feasible under the saturating worst
    # case this bench drives (every partition re-flagging every step).
    for age_bound, budget in ((0, max(1, nb // 16)),
                              (8, max(1, nb // 16)),
                              (4, max(1, nb // 8))):
        cfg = GatedGraphTransformerConfig(
            dim=d, num_layers=2, compute_dtype="bfloat16",
            max_gate_age=age_bound,
            # keep the config's own budget consistent with the step's
            # max_resolve override, so the feasibility guard sees the
            # real (feasible) window at init time too
            max_resolve_frac=budget / nb)
        params = gated_graph_transformer_init(jax.random.key(0), cfg)
        fpad0 = bdg.pad_features(jnp.asarray(feats))

        init_fn = jax.jit(lambda p, f: gate_state_init(p, cfg, f, bdg))
        step_fn = jax.jit(
            lambda p, f, s: gated_graph_transformer_step(
                p, cfg, f, bdg, s, max_resolve=budget))

        state = init_fn(params, fpad0)

        divs, mask_dis, ages_max, resolved = [], [], [], []
        key = jax.random.key(7)
        fpad = fpad0
        for t in range(args.steps):
            key, sub = jax.random.split(key)
            fpad = fpad + args.drift * jax.random.normal(
                sub, fpad.shape, fpad.dtype)
            out_b, state, nres = step_fn(params, fpad, state)
            fresh = init_fn(params, fpad)           # zero-staleness oracle
            # oracle output under fresh masks = one stateless init pass;
            # its final x IS the fresh-mask forward, but gate_state_init
            # returns state only — run the step against the fresh state
            # with zero budget consumed (no drift vs itself)
            out_f, _, _ = step_fn(params, fpad, fresh)
            num = float(jnp.linalg.norm(out_b - out_f))
            den = float(jnp.linalg.norm(out_f)) + 1e-9
            divs.append(num / den)
            # masks are bit-packed: bit-disagreement via popcount(xor)
            mask_dis.append(float(jnp.sum(jax.lax.population_count(
                state["keep"] ^ fresh["keep"])) / (
                state["keep"].size * 32)))
            ages_max.append(int(jnp.max(state["age"])))
            resolved.append(int(nres))

        divs_np = np.asarray(divs)
        # staggered init ages (gate_state_init) pre-mix the refresh
        # waves, so the bound is asserted over the WHOLE run
        rows[f"age{age_bound}_budget{budget}"] = {
            "steps": args.steps,
            "drift_sigma": args.drift,
            "budget_per_layer": budget,
            "rel_output_divergence_median": round(
                float(np.median(divs_np)), 5),
            "rel_output_divergence_p100": round(float(divs_np.max()), 5),
            "mask_disagreement_frac_median": round(
                float(np.median(mask_dis)), 5),
            "max_age_seen": max(ages_max),
            "resolved_per_step": resolved[:8] + ["..."],
            "age_bound_ok": (bool(max(ages_max) <= age_bound)
                             if age_bound else None),
        }
        print(json.dumps({f"age{age_bound}_budget{budget}":
                          rows[f"age{age_bound}_budget{budget}"]}),
              flush=True)

    # infeasible-config row (VERDICT r4 #9): a bound the escalation pass
    # provably cannot honor (nb > 2*budget*age) must WARN at init/step —
    # recorded here so the guard is artifact-visible, not just tested
    import warnings

    from ruvector_tpu.graph_transformer.gated import (
        check_gate_age_feasibility,
    )

    bad_budget = max(1, nb // 64)
    bad_cfg = GatedGraphTransformerConfig(
        dim=d, num_layers=2, compute_dtype="bfloat16", max_gate_age=4)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        feasible = check_gate_age_feasibility(bad_cfg, nb, bad_budget)
    rows[f"INFEASIBLE_age4_budget{bad_budget}"] = {
        "budget_per_layer": bad_budget,
        "feasibility_window": f"nb({nb}) > 2*budget({bad_budget})*age(4)"
                              f" = {2 * bad_budget * 4}",
        "guard_warned": bool(caught),
        "guard_message": str(caught[0].message)[:160] if caught else None,
        "note": "config rejected by check_gate_age_feasibility — not run;"
                " the guard fires from gate_state_init/step on such"
                " configs (tests/test_gated_graph_transformer.py)",
    }
    assert not feasible and caught, "feasibility guard must fire"

    keys = [k for k in rows if not k.startswith("INFEASIBLE")]
    meds = [rows[k]["rel_output_divergence_median"] for k in keys]
    payload = {
        "config": "gated GT staleness under sustained drift, "
                  f"{n} nodes, 2 layers, bf16",
        "backend": jax.devices()[0].platform,
        "partitions": nb,
        "rows": rows,
        "divergence_monotone_with_tighter_bound": bool(
            meds[0] >= meds[1] >= meds[2]),
        "age_bounds_enforced": bool(all(
            rows[k]["age_bound_ok"] for k in keys
            if rows[k]["age_bound_ok"] is not None)),
    }
    out_path = args.out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GATE_STALENESS_r05.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
