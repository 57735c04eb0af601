"""SCALING_MEASURED_r04.json — measured (not analytic) multi-device
scaling of the sharded forward/train on the virtual CPU mesh.

SCALING_MODEL.json computed bytes-on-wire and interior fractions from
the plan alone (r2's wall-clock table was dropped as core-timesharing
noise). This bench actually RUNS the sharded programs at 1/2/4/8
devices and publishes measured per-iteration wall time, with the
honest reading the virtual mesh demands: XLA's forced host devices
EXECUTE SERIALLY in one process (measured: wall time is flat from 1 to
8 shards while per-shard compute shrinks 8x), so speedup cannot be
observed here at all. What CAN be measured — and is what transfers to
real chips, where XLA emits the identical per-device program over ICI —
is the OVERHEAD the sharding machinery adds: overhead_vs_unsharded =
t(s shards, serialized) / t(1 shard). 1.0 means the halo collectives,
padding and per-device dispatch add nothing over the unsharded
program; the compute term divides by s on real hardware.

Rows per shard count:
  - seq:     make_sharded_layer_forward (all_to_all halo, sequential)
  - overlap: make_overlap_layer_forward (packed all_gather + interior/
             boundary split — the exchange hides behind interior work)
  - train:   make_sharded_train_step (forward + psum'd contrastive grad)

Pass criterion (north star >=80% scaling efficiency): overhead <=1.25
at 8 shards, i.e. the machinery itself cannot push efficiency below
80% even before overlap hides the exchange.

Must run on CPU: forces jax_platforms=cpu + an 8-device host platform
via jax.config before any computation (conftest.py's dance — this
environment pre-imports jax, so env vars alone are too late).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_DEV = int(os.environ.get("RUVECTOR_SCALING_NDEV", "8"))


def _force_cpu():
    # this environment pre-imports jax via sitecustomize, so the platform
    # must be forced through jax.config (env vars alone are too late) —
    # same dance as tests/conftest.py
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEV}")
    import jax

    jax.config.update("jax_platforms", "cpu")


def bench(fn, *args, iters=2):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)          # local CPU: real sync
    best = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best.append((time.perf_counter() - t0) / iters)
    return min(best)


def main():
    ap = argparse.ArgumentParser()
    # r5 protocol (VERDICT r4 #5): >=250k nodes, shards <= physical
    # cores so each virtual device maps to a real core and the overlap
    # structure can actually hide exchange latency behind interior work
    ap.add_argument("--nodes", type=int, default=250_880)
    ap.add_argument("--shards", type=int, nargs="+", default=None)
    ap.add_argument("--out", default="SCALING_MEASURED_r05.json")
    args = ap.parse_args()
    _force_cpu()

    import jax
    import jax.numpy as jnp
    import optax

    assert jax.default_backend() == "cpu" and jax.device_count() >= N_DEV

    from benchmarks.scale_sweep_r02 import gen_cluster_graph
    from ruvector_tpu.graph import NeighborGraph
    from ruvector_tpu.models.ruvector_net import (
        RuvectorNetConfig,
        ruvector_net_init,
    )
    from ruvector_tpu.parallel.halo import (
        make_overlap_layer_forward,
        make_sharded_layer_forward,
        make_sharded_train_step,
    )
    from ruvector_tpu.parallel.mesh import make_mesh
    from ruvector_tpu.parallel.partition import (
        build_halo_plan,
        build_overlap_plan,
        pad_features_for_plan,
    )

    ncores0 = os.cpu_count() or 4
    shard_counts = args.shards or sorted({1} | {
        s for s in (2, 4, 8) if s <= ncores0})
    n, d, m = args.nodes - args.nodes % 512, 128, 16   # CLUSTER-aligned
    feats_np, idx, mask, ew = gen_cluster_graph(n, d, m)
    graph = NeighborGraph(jnp.asarray(idx), jnp.asarray(mask),
                          jnp.asarray(ew))

    cfg = RuvectorNetConfig(input_dim=d, hidden_dim=d, num_layers=2, heads=4)
    params = ruvector_net_init(jax.random.key(0), cfg)
    edges = 2 * n * m                      # 2 layers
    ncores = os.cpu_count() or 4
    opt = optax.adam(1e-3)

    results = {"nodes": n, "dim": d, "degree": m, "layers": 2,
               "physical_cores": ncores,
               "note": "virtual host devices execute serially; "
                       "overhead_* = t(s)/t(1) is the sharding-machinery "
                       "cost (collectives+padding+dispatch), the quantity "
                       "that bounds real-chip efficiency from below",
               "rows": {}}
    t1 = {}
    for s in shard_counts:
        mesh = make_mesh(s)
        plan, perm = build_halo_plan(graph, s, reorder="cluster")
        fwd = make_sharded_layer_forward(cfg, plan, mesh)
        f_in = pad_features_for_plan(feats_np, plan, perm)
        print(f"s={s}: benching seq...", flush=True)
        t_seq = bench(fwd, params, f_in)

        oplan, operm = build_overlap_plan(graph, s)
        ofwd = make_overlap_layer_forward(cfg, oplan, mesh)
        of_in = pad_features_for_plan(feats_np, oplan, operm)
        print(f"s={s}: benching overlap...", flush=True)
        t_ovl = bench(ofwd, params, of_in)

        step = make_sharded_train_step(cfg, plan, mesh, opt)
        opt_state = opt.init(params)
        n_pad = plan.n_shards * plan.block
        neg = jnp.asarray(
            np.random.default_rng(0).integers(
                0, n, (n_pad, 8)).astype(np.int32))

        def train_once(p, st, f, ng):
            p2, st2, loss = step(p, st, f, ng)
            return loss

        print(f"s={s}: benching train...", flush=True)
        t_train = bench(train_once, params, opt_state, f_in, neg, iters=1)

        row = {
            "seq_ms": round(t_seq * 1e3, 2),
            "overlap_ms": round(t_ovl * 1e3, 2),
            "train_ms": round(t_train * 1e3, 2),
            "fwd_edges_per_s": round(edges / t_ovl, 0),
        }
        if s == 1:
            t1 = {"seq": t_seq, "overlap": t_ovl, "train": t_train}
        row["overhead_seq"] = round(t_seq / t1["seq"], 3)
        row["overhead_overlap"] = round(t_ovl / t1["overlap"], 3)
        row["overhead_train"] = round(t_train / t1["train"], 3)
        results["rows"][f"shards_{s}"] = row
        print(f"s={s}: {json.dumps(row)}", flush=True)

    # overlay the analytic model where present
    model_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_MODEL.json")
    if os.path.exists(model_path):
        with open(model_path) as f:
            results["analytic_model"] = json.load(f)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), args.out)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["rows"], indent=1))


if __name__ == "__main__":
    main()
