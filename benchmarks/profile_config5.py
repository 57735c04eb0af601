"""Per-sublayer profile of the config-5 gated step (VERDICT r3 weak#1:
"Where do the other ~160ms go? No profile in the artifact").

Times each component of gated_graph_transformer_step in isolation with
the scan-diff harness (benchmarks/_timing.py), at a configurable node
count, and prints a JSON breakdown. Components:

  ln1           layer_norm_apply on [nB, B, D]
  pooled_logits _pooled_logits (full [nB, B, B] materialization)
  signature     _gate_signature reduction
  gate_solve    batched push-relabel over max_resolve partitions
  fused_attn    gated_block_attention Pallas kernel
  neighbor_mix  cross-partition einsum + w_gnn
  ffn           pre-norm FFN
  full_step     the whole gated_graph_transformer_step

Run: python benchmarks/profile_config5.py [--nodes N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from _timing import device_time  # noqa: E402
from scale_sweep_r02 import gen_cluster_graph  # noqa: E402

BLOCK = 256
DEGREE = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=249_856)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from ruvector_tpu.attention.mincut_device import mincut_gate_device
    from ruvector_tpu.graph import build_block_dense
    from ruvector_tpu.graph_transformer.gated import (
        GatedGraphTransformerConfig,
        _gate_signature,
        _neighbor_mix,
        _pooled_logits,
        gate_state_init,
        gated_graph_transformer_init,
        gated_graph_transformer_step,
    )
    from ruvector_tpu.nn.core import layer_norm_apply, linear_apply
    from ruvector_tpu.ops.pallas.gated_block_attn import (
        fold_gated_attention_params,
        gated_block_attention,
    )

    n, d = args.nodes - args.nodes % BLOCK, args.dim
    feats, idx, mask, ew = gen_cluster_graph(n, d, DEGREE)
    bdg = build_block_dense(idx, mask, ew, block=BLOCK, dtype=np.float32)
    del idx, mask, ew

    cfg = GatedGraphTransformerConfig(
        dim=d, num_heads=4, num_layers=2, gate_chunk=128,
        hysteresis_band=0.05, remat=True, compute_dtype="bfloat16")
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    fpad = bdg.pad_features(jnp.asarray(feats))
    del feats

    nb, b = bdg.n_blocks, bdg.block
    p = params[0]
    x = fpad.reshape(nb, b, -1)
    pad = bdg.node_pad
    max_resolve = max(1, nb // 16)

    state = jax.jit(lambda pp, f, g: gate_state_init(pp, cfg, f, g))(
        params, fpad, bdg)
    float(jnp.sum(state["sig"]))

    rows = {}

    def t(name, f, *a, short=10, long=110, **kw):
        dt = device_time(f, *a, short=short, long=long, **kw)
        rows[name] = round(dt * 1e3, 3)
        print(f"{name:>16}: {dt * 1e3:8.3f} ms", flush=True)

    h = layer_norm_apply(p["ln1"], x)
    t("ln1", lambda xx: layer_norm_apply(p["ln1"], xx), x)

    t("pooled_logits",
      lambda hh: _pooled_logits(hh, pad, p["wq"], p["wk"], cfg), h)

    pooled = _pooled_logits(h, pad, p["wq"], p["wk"], cfg)
    t("signature", lambda pl_: _gate_signature(pl_, cfg.eps), pooled)

    from ruvector_tpu.graph_transformer.gated import (  # noqa: E402
        _fold_sig_params,
        _signature_fused_x,
    )
    A_sig = _fold_sig_params(p, cfg)
    t("signature_x",
      lambda hh: _signature_fused_x(hh, A_sig, pad, cfg), h)

    sub = pooled[:max_resolve]
    t("gate_solve",
      lambda ss: jax.vmap(
          lambda m: mincut_gate_device(m, cfg.lam, cfg.eps)[0])(ss),
      sub, short=2, long=12)

    A, Wvo = fold_gated_attention_params(p, cfg)
    keep = state["keep"][0]
    t("fused_attn",
      lambda hh, kk: gated_block_attention(
          hh, kk, pad, A, Wvo, compute_bf16=True),
      h, keep, no_perturb=())

    t("neighbor_mix", lambda hh: _neighbor_mix(hh, bdg, p["w_gnn"]), h)

    def ffn(hh):
        h2 = layer_norm_apply(p["ln2"], hh)
        return linear_apply(
            p["ffn_out"], jax.nn.gelu(linear_apply(p["ffn_in"], h2)))
    t("ffn", ffn, x)

    # --- round-5 kernels -------------------------------------------------
    from ruvector_tpu.graph_transformer.gated import (  # noqa: E402
        _fused_layer_halo_free,
        _signature_from_x,
        _solve_gates_kernel,
    )

    t("signature_ln_x",
      lambda xx: _signature_from_x(xx, p, A_sig, pad, cfg), x)
    t("gate_solve_kernel",
      lambda xx: _solve_gates_kernel(xx[:max_resolve], pad[:max_resolve],
                                     A_sig, p, cfg),
      x, short=2, long=12)
    if bdg.table == bdg.block:
        t("fused_layer_kernel",
          lambda xx: _fused_layer_halo_free(cfg, p, xx, keep, pad,
                                            bdg.wdense),
          x, no_perturb=())

    def full(f, s):
        out, s2, nres = gated_graph_transformer_step(
            params, cfg, f, bdg, s, max_resolve=max_resolve)
        return out, s2["sig"], nres
    t("full_step", full, fpad, state, short=2, long=12)

    payload = {"nodes": n, "dim": d, "partitions": nb,
               "max_resolve": max_resolve,
               "backend": jax.devices()[0].platform,
               "ms": rows,
               "note": "per-LAYER components except full_step (2 layers)"}
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CONFIG5_PROFILE_r05.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
