"""Partitioned mincut-gated graph transformer (BASELINE config 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ruvector_tpu.graph.block_dense import build_block_dense
from ruvector_tpu.graph_transformer.gated import (
    GatedGraphTransformerConfig,
    _gated_attention_block,
    gated_graph_transformer_apply,
    gated_graph_transformer_init,
    gated_graph_transformer_loss,
)
from ruvector_tpu.attention.mincut_device import mincut_gate_device


def _graph(n, m, seed=0, block=32):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, (n, m)).astype(np.int32)
    mask = np.ones((n, m), np.float32)
    ew = rng.uniform(0.1, 1.0, (n, m)).astype(np.float32)
    return build_block_dense(idx, mask, ew, block=block, table_pad=8)


def test_forward_shapes_and_padding():
    n, d = 50, 32          # padded to 2 blocks of 32 -> 14 pad rows
    bdg = _graph(n, 8, block=32)
    cfg = GatedGraphTransformerConfig(dim=d, num_heads=4, num_layers=2)
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    feats = np.random.default_rng(1).normal(size=(n, d)).astype(np.float32)
    fpad = bdg.pad_features(jnp.asarray(feats))
    out, stats = gated_graph_transformer_apply(
        params, cfg, fpad, bdg, with_stats=True)
    assert out.shape == (bdg.n_blocks * bdg.block, d)
    # padded rows never acquire signal
    pad = np.asarray(bdg.node_pad.reshape(-1))
    np.testing.assert_array_equal(np.asarray(out)[pad == 0], 0.0)
    assert len(stats) == cfg.num_layers
    applied, cost = stats[0]
    assert applied.shape == (bdg.n_blocks, cfg.num_heads)
    assert np.all(np.asarray(cost) >= 0)


def test_chunked_gate_matches_direct_vmap():
    """The lax.map chunking is a memory optimization — results must be
    identical to a direct double-vmap over (partition, head)."""
    nb, b, d, h = 4, 16, 32, 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(nb, b, d)).astype(np.float32))
    pad = jnp.ones((nb, b), jnp.float32)
    cfg_c = GatedGraphTransformerConfig(dim=d, num_heads=h, gate_chunk=2)
    cfg_1 = GatedGraphTransformerConfig(dim=d, num_heads=h, gate_chunk=4)
    w = [jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.2)
         for _ in range(4)]
    out_c, (ap_c, co_c) = _gated_attention_block(x, pad, *w, cfg_c)
    out_1, (ap_1, co_1) = _gated_attention_block(x, pad, *w, cfg_1)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_1),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ap_c), np.asarray(ap_1))


def test_gate_stats_reflect_structure():
    """Two-community partitions draw a cut; dense partitions do not."""
    b, d, h = 32, 32, 1
    rng = np.random.default_rng(3)
    # block 0: two tight communities in orthogonal subspaces, weakly
    # bridged through two rows — the min s-t cut severs the bridge
    cA = np.zeros(d)
    cA[: d // 2] = rng.normal(size=d // 2)
    cA *= 2 * np.sqrt(d) / np.linalg.norm(cA)
    cB = np.zeros(d)
    cB[d // 2:] = rng.normal(size=d // 2)
    cB *= 2 * np.sqrt(d) / np.linalg.norm(cB)
    f0 = np.zeros((b, d))
    f0[: b // 2, : d // 2] = 0.1 * rng.normal(size=(b // 2, d // 2))
    f0[b // 2:, d // 2:] = 0.1 * rng.normal(size=(b // 2, d // 2))
    f0[: b // 2] += cA
    f0[b // 2:] += cB
    for i in (16, 17):
        f0[i] += 0.01 * cA
    # block 1: one tight community -> flow >> threshold, no cut
    f1 = cA + 0.05 * rng.normal(size=(b, d))
    x = jnp.asarray(np.stack([f0, f1]).astype(np.float32))
    pad = jnp.ones((2, b), jnp.float32)
    eye = jnp.eye(d, dtype=jnp.float32)
    cfg = GatedGraphTransformerConfig(dim=d, num_heads=h, lam=0.5)
    _, (applied, cost) = _gated_attention_block(
        x, pad, eye, eye, eye, eye, cfg)
    applied = np.asarray(applied)
    # identity projections: logits = x @ x.T / sqrt(d); orthogonal
    # communities -> cheap cut; tight cluster -> flow >> threshold
    assert applied[0, 0] and not applied[1, 0]


def test_gate_matches_device_oracle_per_partition():
    """Layer-internal gating equals mincut_gate_device run standalone on
    the same logits."""
    nb, b, d, h = 2, 16, 16, 2
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(nb, b, d)).astype(np.float32))
    pad = jnp.ones((nb, b), jnp.float32)
    w = [jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.3)
         for _ in range(4)]
    cfg = GatedGraphTransformerConfig(dim=d, num_heads=h,
                                      gate_mode="per_head")
    _, (applied, cost) = _gated_attention_block(x, pad, *w, cfg)
    dh = d // h
    q = (x @ w[0]).reshape(nb, b, h, dh).transpose(0, 2, 1, 3)
    k = (x @ w[1]).reshape(nb, b, h, dh).transpose(0, 2, 1, 3)
    for i in range(nb):
        for j in range(h):
            lg = (q[i, j] @ k[i, j].T) / (dh ** 0.5)
            _, ref_cost = mincut_gate_device(lg, cfg.lam, cfg.eps)
            assert (float(ref_cost) > 0) == bool(applied[i, j])
            np.testing.assert_allclose(
                float(ref_cost), float(cost[i, j]), atol=1e-5)


def test_loss_differentiable_end_to_end():
    n, d = 64, 32
    bdg = _graph(n, 8, seed=5, block=32)
    cfg = GatedGraphTransformerConfig(dim=d, num_heads=4, num_layers=2)
    params = gated_graph_transformer_init(jax.random.key(6), cfg)
    feats = np.random.default_rng(7).normal(size=(n, d)).astype(np.float32)
    fpad = bdg.pad_features(jnp.asarray(feats))
    tgt = jnp.zeros_like(fpad)
    loss, grads = jax.value_and_grad(gated_graph_transformer_loss)(
        params, cfg, fpad, bdg, tgt)
    assert np.isfinite(float(loss)) and float(loss) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_pooled_gate_matches_head_mean_oracle():
    """Default 'pooled' mode: one gate per partition over the head-mean
    logits (gating.rs single-matrix granularity); cost identical across
    heads and equal to the standalone oracle on the pooled logits."""
    nb, b, d, h = 2, 16, 16, 2
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(nb, b, d)).astype(np.float32))
    pad = jnp.ones((nb, b), jnp.float32)
    w = [jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.3)
         for _ in range(4)]
    cfg = GatedGraphTransformerConfig(dim=d, num_heads=h)   # pooled default
    _, (applied, cost) = _gated_attention_block(x, pad, *w, cfg)
    cost = np.asarray(cost)
    np.testing.assert_array_equal(cost[:, 0], cost[:, 1])   # shared gate
    dh = d // h
    q = (x @ w[0]).reshape(nb, b, h, dh).transpose(0, 2, 1, 3)
    k = (x @ w[1]).reshape(nb, b, h, dh).transpose(0, 2, 1, 3)
    for i in range(nb):
        pooled = np.mean(
            [np.asarray(q[i, j] @ k[i, j].T) / (dh ** 0.5)
             for j in range(h)], axis=0)
        _, ref_cost = mincut_gate_device(jnp.asarray(pooled),
                                         cfg.lam, cfg.eps)
        np.testing.assert_allclose(float(ref_cost), float(cost[i, 0]),
                                   atol=1e-5)


# --- temporal gate reuse (round 3: hysteresis state + incremental solve) ---

def _state_setup(n=96, d=32, m=8, seed=0):
    from ruvector_tpu.graph_transformer.gated import (
        gate_state_init,
    )

    bdg = _graph(n, m, seed=seed, block=32)
    cfg = GatedGraphTransformerConfig(dim=d, num_heads=4, num_layers=2,
                                      hysteresis_band=0.05)
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    feats = np.random.default_rng(seed + 1).normal(
        size=(n, d)).astype(np.float32)
    fpad = bdg.pad_features(jnp.asarray(feats))
    state = gate_state_init(params, cfg, fpad, bdg)
    return params, cfg, fpad, bdg, state


def test_gate_state_init_matches_stateless_apply():
    """Init-solved masks reproduce the stateless pooled-gate forward."""
    from ruvector_tpu.graph_transformer.gated import (
        gated_graph_transformer_apply_with_masks,
    )

    params, cfg, fpad, bdg, state = _state_setup()
    ref = gated_graph_transformer_apply(params, cfg, fpad, bdg)
    out = gated_graph_transformer_apply_with_masks(
        params, cfg, fpad, bdg, state["keep"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_step_same_input_reuses_all_gates():
    """Zero drift => zero re-solves, identical masks, identical output."""
    from ruvector_tpu.graph_transformer.gated import (
        gated_graph_transformer_step,
    )

    params, cfg, fpad, bdg, state = _state_setup()
    out, new_state, n_res = gated_graph_transformer_step(
        params, cfg, fpad, bdg, state)
    assert int(n_res) == 0
    np.testing.assert_array_equal(np.asarray(new_state["keep"]),
                                  np.asarray(state["keep"]))
    ref = gated_graph_transformer_apply(params, cfg, fpad, bdg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_step_with_full_budget_matches_fresh_solve():
    """band=0 + budget=all => incremental step == stateless apply on the
    NEW input (every drifted partition re-solves; undrifted ones hold a
    still-correct mask)."""
    import dataclasses

    from ruvector_tpu.graph_transformer.gated import (
        gated_graph_transformer_step,
    )

    params, cfg, fpad, bdg, state = _state_setup()
    cfg0 = dataclasses.replace(cfg, hysteresis_band=0.0)
    fpad2 = fpad + 0.25 * jnp.asarray(
        np.random.default_rng(9).normal(size=fpad.shape).astype(np.float32))
    fpad2 = fpad2 * bdg.node_pad.reshape(-1)[:, None]
    out, new_state, n_res = gated_graph_transformer_step(
        params, cfg0, fpad2, bdg, state, max_resolve=bdg.n_blocks)
    assert int(n_res) > 0
    ref = gated_graph_transformer_apply(params, cfg0, fpad2, bdg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_step_respects_resolve_budget():
    from ruvector_tpu.graph_transformer.gated import (
        gated_graph_transformer_step,
    )

    params, cfg, fpad, bdg, state = _state_setup()
    fpad2 = fpad + 0.5 * jnp.asarray(
        np.random.default_rng(3).normal(size=fpad.shape).astype(np.float32))
    fpad2 = fpad2 * bdg.node_pad.reshape(-1)[:, None]
    out, new_state, n_res = gated_graph_transformer_step(
        params, cfg, fpad2, bdg, state, max_resolve=1)
    assert int(n_res) <= 1
    # un-resolved partitions keep their stored mask bit-for-bit
    same = np.asarray(new_state["keep"]) == np.asarray(state["keep"])
    assert same.all(axis=(-2, -1)).sum() >= same.shape[0] * same.shape[1] - 2


def test_loss_with_masks_matches_and_grads():
    """Same loss + same grads as the in-line gate loss when masks come
    from the state (gates are stop-gradient in both)."""
    from ruvector_tpu.graph_transformer.gated import (
        gated_graph_transformer_loss_with_masks,
    )

    params, cfg, fpad, bdg, state = _state_setup()
    tgt = jnp.zeros_like(fpad)
    l_ref, g_ref = jax.value_and_grad(gated_graph_transformer_loss)(
        params, cfg, fpad, bdg, tgt)
    l_new, g_new = jax.value_and_grad(gated_graph_transformer_loss_with_masks)(
        params, cfg, fpad, bdg, state["keep"], tgt)
    np.testing.assert_allclose(float(l_new), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_new), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_bf16_compute_mode_tracks_f32():
    """compute_dtype='bfloat16' halves the attention HBM traffic at 1M
    scale; outputs must track the f32 path within bf16 tolerance and the
    gate masks must be identical on well-separated logits."""
    import dataclasses

    from ruvector_tpu.graph_transformer.gated import (
        gate_state_init,
        gated_graph_transformer_step,
    )

    bdg = _graph(96, 8, seed=4, block=32)
    cfg32 = GatedGraphTransformerConfig(dim=32, num_heads=4, num_layers=2)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    params = gated_graph_transformer_init(jax.random.key(0), cfg32)
    feats = np.random.default_rng(5).normal(size=(96, 32)).astype(np.float32)
    fpad = bdg.pad_features(jnp.asarray(feats))

    out32 = gated_graph_transformer_apply(params, cfg32, fpad, bdg)
    out16 = gated_graph_transformer_apply(params, cfg16, fpad, bdg)
    err = np.abs(np.asarray(out32) - np.asarray(out16)).max()
    scale = np.abs(np.asarray(out32)).max()
    assert err <= 0.05 * max(scale, 1.0), (err, scale)

    # state machinery runs in bf16 mode too
    st = gate_state_init(params, cfg16, fpad, bdg)
    out, st2, nres = gated_graph_transformer_step(params, cfg16, fpad,
                                                  bdg, st)
    assert int(nres) == 0
    assert np.isfinite(np.asarray(out)).all()


def test_fused_gate_attention_matches_xla_path():
    """The Pallas gated-MHA kernel (forward/step paths) == the XLA
    attention to ~1e-4 (head-folding A=WqWk^T and Wvo=WvWo reassociates
    the f32 products, so equality is close-but-not-bitwise). Runs in
    interpret mode on CPU."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ruvector_tpu.graph import build_block_dense
    from ruvector_tpu.graph_transformer.gated import (
        GatedGraphTransformerConfig,
        gate_state_init,
        gated_graph_transformer_init,
        gated_graph_transformer_step,
    )

    rng = np.random.default_rng(5)
    blk, nblocks, deg, d = 8, 4, 3, 128
    n = blk * nblocks
    idx = ((rng.integers(0, n, (n, deg)) % blk)
           + (np.arange(n)[:, None] // blk) * blk).astype(np.int32)
    mask = np.ones((n, deg), np.float32)
    ew = rng.uniform(0.1, 1, (n, deg)).astype(np.float32)
    bdg = build_block_dense(idx, mask, ew, block=blk, table_pad=8)
    feats = rng.normal(size=(n, d)).astype(np.float32)

    outs = {}
    for mode in ("never", "always"):
        cfg = GatedGraphTransformerConfig(
            dim=d, num_heads=4, num_layers=2, gate_chunk=2,
            fused_gate_attn=mode)
        params = gated_graph_transformer_init(jax.random.key(0), cfg)
        fpad = bdg.pad_features(jnp.asarray(feats))
        state = gate_state_init(params, cfg, fpad, bdg)
        out, state2, nres = gated_graph_transformer_step(
            params, cfg, fpad, bdg, state, max_resolve=1)
        outs[mode] = (np.asarray(out), np.asarray(state["keep"]),
                      int(nres))

    np.testing.assert_array_equal(outs["never"][1], outs["always"][1])
    assert outs["never"][2] == outs["always"][2] == 0
    np.testing.assert_allclose(outs["never"][0], outs["always"][0],
                               atol=2e-4, rtol=1e-4)


# --- round 4: fused-kernel backward + gate staleness control ---

def test_fused_kernel_grads_match_xla_path():
    """The gated kernel's custom_vjp (in-VMEM recompute backward) must
    produce the same parameter gradients as the XLA attention path.
    Shapes chosen to satisfy _use_fused_attn's tiling (D=128); interpret
    mode on CPU."""
    import dataclasses

    from ruvector_tpu.graph import build_block_dense
    from ruvector_tpu.graph_transformer.gated import (
        gate_state_init,
        gated_graph_transformer_loss_with_masks,
    )

    rng = np.random.default_rng(11)
    blk, nblocks, deg, d = 8, 4, 3, 128
    n = blk * nblocks
    idx = ((rng.integers(0, n, (n, deg)) % blk)
           + (np.arange(n)[:, None] // blk) * blk).astype(np.int32)
    mask = np.ones((n, deg), np.float32)
    ew = rng.uniform(0.1, 1, (n, deg)).astype(np.float32)
    bdg = build_block_dense(idx, mask, ew, block=blk, table_pad=8)
    feats = rng.normal(size=(n, d)).astype(np.float32)

    cfg_x = GatedGraphTransformerConfig(
        dim=d, num_heads=4, num_layers=2, fused_gate_attn="never")
    cfg_k = dataclasses.replace(cfg_x, fused_gate_attn="always")
    params = gated_graph_transformer_init(jax.random.key(0), cfg_x)
    fpad = bdg.pad_features(jnp.asarray(feats))
    state = gate_state_init(params, cfg_x, fpad, bdg)
    tgt = jnp.zeros_like(fpad)

    l_x, g_x = jax.value_and_grad(gated_graph_transformer_loss_with_masks)(
        params, cfg_x, fpad, bdg, state["keep"], tgt)
    l_k, g_k = jax.value_and_grad(gated_graph_transformer_loss_with_masks)(
        params, cfg_k, fpad, bdg, state["keep"], tgt)
    np.testing.assert_allclose(float(l_k), float(l_x), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_x)):
        scale = max(np.abs(np.asarray(b)).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=2e-3)


def test_gate_age_tracks_deferred_resolves():
    """Ages reset on re-solve, grow while a partition stays deferred, and
    the oldest-first budget prevents starvation (every flagged partition
    is eventually solved under a budget of 1). band=0 so any signature
    change flags — LayerNorm keeps signatures so stable that a 0.5-noise
    feature perturbation stays inside the default 5% band."""
    import dataclasses

    from ruvector_tpu.graph_transformer.gated import (
        gated_graph_transformer_step,
    )

    params, cfg, fpad, bdg, state = _state_setup()
    assert "age" in state and int(np.asarray(state["age"]).max()) == 0
    cfg0 = dataclasses.replace(cfg, hysteresis_band=0.0)

    fpad2 = fpad + 0.5 * jnp.asarray(
        np.random.default_rng(3).normal(size=fpad.shape).astype(np.float32))
    fpad2 = fpad2 * bdg.node_pad.reshape(-1)[:, None]

    solved = np.zeros((cfg.num_layers, bdg.n_blocks), bool)
    s = state
    for it in range(2 * bdg.n_blocks + 2):
        out, s, nres = gated_graph_transformer_step(
            params, cfg0, fpad2, bdg, s, max_resolve=1)
        assert int(nres) <= cfg.num_layers
        newly = np.asarray(s["age"]) == 0
        solved |= newly
    # with budget 1/layer/step and oldest-first ordering every partition
    # of every layer must have been refreshed (layer 1 re-flags while
    # layer 0's masks settle, hence the 2x horizon)
    assert solved.all(), solved.sum(axis=1)


def test_max_gate_age_forces_refresh_without_drift():
    """max_gate_age bounds staleness even at zero signature drift."""
    import dataclasses

    from ruvector_tpu.graph_transformer.gated import (
        gated_graph_transformer_step,
    )

    params, cfg, fpad, bdg, state = _state_setup()
    cfg_b = dataclasses.replace(cfg, max_gate_age=3)
    s = state
    res_per_step = []
    for it in range(4):
        out, s, nres = gated_graph_transformer_step(
            params, cfg_b, fpad, bdg, s, max_resolve=bdg.n_blocks)
        res_per_step.append(int(nres))
        assert int(np.asarray(s["age"]).max()) <= 3
    # steps 1-2: pure reuse (no drift, under the age bound);
    # step 3: every partition hits the bound and re-solves
    assert res_per_step[0] == 0 and res_per_step[1] == 0
    assert res_per_step[2] == cfg.num_layers * bdg.n_blocks
    # the forced re-solve on identical input must not change masks
    np.testing.assert_array_equal(np.asarray(s["keep"]),
                                  np.asarray(state["keep"]))


def test_gate_age_feasibility_guard():
    """A config whose bound cannot be honored (nB > 2*budget*max_gate_age)
    must WARN at init/step time instead of silently shipping unbounded
    staleness; feasible configs and the pure-hysteresis default stay
    silent (VERDICT r4 #9)."""
    import dataclasses
    import warnings

    from ruvector_tpu.graph_transformer.gated import (
        check_gate_age_feasibility,
        gate_state_init,
    )

    base = GatedGraphTransformerConfig(dim=32, num_heads=4, num_layers=1)
    # infeasible: nb=64, budget=max(1, 64/16)=4, age=2 -> 2*4*2=16 < 64
    bad = dataclasses.replace(base, max_gate_age=2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert check_gate_age_feasibility(bad, 64) is False
    assert any("INFEASIBLE" in str(w.message) for w in caught)

    # feasible: age=8 -> 2*4*8=64 >= 64; and default age=0 never warns
    good = dataclasses.replace(base, max_gate_age=8)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert check_gate_age_feasibility(good, 64) is True
        assert check_gate_age_feasibility(base, 64) is False
    assert not caught

    # the guard fires from gate_state_init on a real graph
    n, d = 128, 32
    bdg = _graph(n, 8, block=32)          # 4 blocks
    cfg = dataclasses.replace(
        GatedGraphTransformerConfig(dim=d, num_heads=4, num_layers=1,
                                    max_resolve_frac=1 / 4),
        max_gate_age=1)                   # 2*1*1=2 < 4 blocks
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    feats = np.random.default_rng(1).normal(size=(n, d)).astype(np.float32)
    fpad = bdg.pad_features(jnp.asarray(feats))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        gate_state_init(params, cfg, fpad, bdg)
    assert any("INFEASIBLE" in str(w.message) for w in caught)


def test_max_gate_age_escalation_holds_under_saturating_drift():
    """When every partition re-flags every step and the primary budget
    alone would let ages reach ceil(nB/budget), the escalation pass
    (second budget-sized solve for at/over-bound partitions) keeps
    max age <= max_gate_age whenever nB <= 2*budget*bound.
    Here nB=8, budget=1, bound=4: without escalation ages reach 8."""
    import dataclasses

    from ruvector_tpu.graph_transformer.gated import (
        gate_state_init,
        gated_graph_transformer_step,
    )

    n, d, m = 256, 32, 8
    bdg = _graph(n, m, seed=5, block=32)
    assert bdg.n_blocks == 8
    cfg = dataclasses.replace(
        GatedGraphTransformerConfig(dim=d, num_heads=4, num_layers=1),
        hysteresis_band=0.0, max_gate_age=4)
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    rng = np.random.default_rng(9)
    fpad = bdg.pad_features(jnp.asarray(
        rng.normal(size=(n, d)).astype(np.float32)))
    s = gate_state_init(params, cfg, fpad, bdg)

    max_ages = []
    for it in range(14):
        f2 = fpad + 0.3 * jnp.asarray(
            rng.normal(size=fpad.shape).astype(np.float32))
        f2 = f2 * bdg.node_pad.reshape(-1)[:, None]
        out, s, nres = gated_graph_transformer_step(
            params, cfg, f2, bdg, s, max_resolve=1)
        # primary budget 1 + escalation budget 1
        assert int(nres) <= 2 * cfg.num_layers
        max_ages.append(int(np.asarray(s["age"]).max()))
    # after the first full rotation the hard bound must hold
    assert max(max_ages[6:]) <= cfg.max_gate_age, max_ages


def test_chunked_ffn_matches_straight_path(monkeypatch):
    """_ffn_apply chunks over blocks above the nB threshold purely to
    bound the [nB, B, ffn_mult*D] gelu hidden (9.5 GB bf16 at 10M
    nodes); the REAL chunked branch (driven by monkeypatching the
    threshold, nb=6 with chunk 4 -> ceil-padded to 8) must be
    numerically identical."""
    import ruvector_tpu.graph_transformer.gated as g

    nb, b, d = 6, 16, 32
    rng = np.random.default_rng(5)
    h2 = jnp.asarray(rng.normal(size=(nb, b, d)).astype(np.float32))
    pad = jnp.asarray((rng.uniform(size=(nb, b)) > 0.1)
                      .astype(np.float32))
    cfg = GatedGraphTransformerConfig(dim=d)
    p = gated_graph_transformer_init(jax.random.key(3), cfg)[0]
    straight = g._ffn_apply(p, h2, pad, h2.dtype)

    # nb=6 has no divisor in [4, 6) — the old largest-divisor rule would
    # have serialized into chunks of 2; ceil-chunking pads 6 -> 8
    monkeypatch.setattr(g, "_CHUNK_NB", 4)
    out_c = g._ffn_apply(p, h2, pad, h2.dtype)
    np.testing.assert_allclose(np.asarray(straight), np.asarray(out_c),
                               atol=1e-6)


def test_bf16_residual_stream_keeps_dtype_and_tracks_f32():
    """At >2M nodes the whole residual stream runs bf16: every
    materialized tensor (LN outputs, attention out, FFN hidden) must
    stay bf16 — an f32 LN temp alone is 4.77 GB at 10M nodes — and the
    result must track the f32 forward."""
    from ruvector_tpu.graph_transformer.gated import (
        gate_state_init, gated_graph_transformer_step)
    import dataclasses

    n, d = 128, 32
    bdg32 = _graph(n, 8, block=32)
    cfg = GatedGraphTransformerConfig(
        dim=d, num_heads=4, num_layers=2, gate_chunk=2,
        compute_dtype="bfloat16", fused_gate_attn="always")
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    feats = np.random.default_rng(1).normal(size=(n, d)).astype(np.float32)
    f32 = bdg32.pad_features(jnp.asarray(feats))
    fb16 = f32.astype(jnp.bfloat16)

    st = gate_state_init(params, cfg, fb16, bdg32)
    out_b, st2, _ = gated_graph_transformer_step(
        params, cfg, fb16, bdg32, st, max_resolve=2)
    assert out_b.dtype == jnp.bfloat16

    cfg_f = dataclasses.replace(cfg, compute_dtype="float32")
    st_f = gate_state_init(params, cfg_f, f32, bdg32)
    out_f, _, _ = gated_graph_transformer_step(
        params, cfg_f, f32, bdg32, st_f, max_resolve=2)
    scale = float(jnp.max(jnp.abs(out_f))) + 1e-9
    err = float(jnp.max(jnp.abs(out_b.astype(jnp.float32) - out_f)))
    assert err / scale < 0.1, (err, scale)


def test_chunked_whole_layer_matches_straight(monkeypatch):
    """Halo-free big graphs chunk the ENTIRE layer over blocks (every
    sublayer is block-local when bdg.table == block) to bound HBM temps
    at 10M nodes; the chunked program must match the straight one."""
    import ruvector_tpu.graph_transformer.gated as g

    n, d, block = 512, 32, 128   # table pads to 128-lane multiples, so
    rng = np.random.default_rng(7)  # halo-free needs block >= 128
    # self-contained blocks: neighbors within the same block
    base = (np.arange(n)[:, None] // block) * block
    idx = (base + rng.integers(0, block, (n, 8))).astype(np.int32)
    mask = np.ones((n, 8), np.float32)
    ew = rng.uniform(0.1, 1.0, (n, 8)).astype(np.float32)
    bdg = build_block_dense(idx, mask, ew, block=block)
    assert bdg.table == bdg.block, "graph must be halo-free for this test"

    cfg = GatedGraphTransformerConfig(dim=d, num_heads=4, num_layers=1,
                                      fused_gate_attn="always")
    p = gated_graph_transformer_init(jax.random.key(0), cfg)[0]
    x = jnp.asarray(rng.normal(size=(bdg.n_blocks, block, d))
                    .astype(np.float32))
    kp = g.pack_keep(jnp.ones((bdg.n_blocks, block, block), bool))

    # disable the fused-layer kernel so the XLA sublayer routes run
    monkeypatch.setattr(g, "_use_fused_layer", lambda *a: False)
    straight = g._layer_with_keep(p, cfg, x, bdg, kp, fused=True)
    monkeypatch.setattr(g, "_CHUNK_NB", 2)   # force the chunked route
    chunked = g._layer_with_keep(p, cfg, x, bdg, kp, fused=True)
    np.testing.assert_allclose(np.asarray(straight), np.asarray(chunked),
                               atol=2e-5)

    # and the ONE-KERNEL fused layer must match the XLA composition
    monkeypatch.setattr(g, "_CHUNK_NB", 4096)
    fused_out = g._fused_layer_halo_free(cfg, p, x, kp, bdg.node_pad,
                                         bdg.wdense)
    np.testing.assert_allclose(np.asarray(straight), np.asarray(fused_out),
                               atol=3e-5)


def test_chunked_whole_layer_grad_parity(monkeypatch):
    """value_and_grad through the chunked whole-layer route (checkpointed
    ceil-chunked lax.map, incl. a NON-divisible nB that exercises the
    zero-block padding) must match the straight path's loss and grads."""
    import ruvector_tpu.graph_transformer.gated as g

    n, d, block = 640, 32, 128           # nb=5: not a multiple of chunk 2
    rng = np.random.default_rng(9)
    base = (np.arange(n)[:, None] // block) * block
    idx = (base + rng.integers(0, block, (n, 8))).astype(np.int32)
    mask = np.ones((n, 8), np.float32)
    ew = rng.uniform(0.1, 1.0, (n, 8)).astype(np.float32)
    bdg = build_block_dense(idx, mask, ew, block=block)
    assert bdg.table == bdg.block and bdg.n_blocks == 5

    cfg = GatedGraphTransformerConfig(dim=d, num_heads=4, num_layers=1,
                                      fused_gate_attn="always")
    p = gated_graph_transformer_init(jax.random.key(0), cfg)[0]
    x = jnp.asarray(rng.normal(size=(bdg.n_blocks, block, d))
                    .astype(np.float32))
    kp = g.pack_keep(jnp.ones((bdg.n_blocks, block, block), bool))

    def loss(p, x):
        out = g._layer_with_keep(p, cfg, x, bdg, kp, fused=True)
        return jnp.sum(out * out) / out.size

    def assert_grads_close(ga, gb, tol):
        flat_a, _ = jax.tree_util.tree_flatten(ga)
        flat_b, _ = jax.tree_util.tree_flatten(gb)
        for a, b in zip(flat_a, flat_b):
            scale = float(jnp.max(jnp.abs(a))) + 1e-9
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=tol * scale)

    # the DEFAULT route: one-kernel forward + recompute backward
    v_k, g_k = jax.value_and_grad(loss, argnums=(0, 1))(p, x)

    # XLA straight vs ceil-chunked routes
    monkeypatch.setattr(g, "_use_fused_layer", lambda *a: False)
    v_s, g_s = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
    monkeypatch.setattr(g, "_CHUNK_NB", 2)
    v_c, g_c = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(float(v_s), float(v_c), rtol=2e-5)
    assert_grads_close(g_s, g_c, 6e-5)
    # fused-layer kernel value and custom_vjp grads match the XLA path
    np.testing.assert_allclose(float(v_k), float(v_s), rtol=3e-5)
    assert_grads_close(g_k, g_s, 6e-5)


def test_chunked_whole_model_loss_parity(monkeypatch):
    """The whole-model chunked loss (halo-free big graphs run the full
    L-layer network + reduction per block-chunk) must match the straight
    loss in value AND parameter gradients, including at a non-divisible
    nB where the clamped last chunk overlaps."""
    import ruvector_tpu.graph_transformer.gated as g

    n, d, block = 640, 32, 128           # nb=5, chunk 2: overlap path
    rng = np.random.default_rng(11)
    base = (np.arange(n)[:, None] // block) * block
    idx = (base + rng.integers(0, block, (n, 8))).astype(np.int32)
    bdg = build_block_dense(idx, np.ones((n, 8), np.float32),
                            rng.uniform(0.1, 1.0, (n, 8)).astype(np.float32),
                            block=block)
    assert bdg.table == bdg.block and bdg.n_blocks == 5

    cfg = GatedGraphTransformerConfig(dim=d, num_heads=4, num_layers=2,
                                      fused_gate_attn="always")
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    fpad = bdg.pad_features(jnp.asarray(
        rng.normal(size=(n, d)).astype(np.float32)))
    st = g.gate_state_init(params, cfg, fpad, bdg)
    tgt = jnp.asarray(rng.normal(size=fpad.shape).astype(np.float32))

    def loss(p):
        return g.gated_graph_transformer_loss_with_masks(
            p, cfg, fpad, bdg, st["keep"], tgt)

    v_s, g_s = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(g, "_CHUNK_NB", 2)
    v_c, g_c = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(v_s), float(v_c), rtol=3e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_c)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=6e-5 * scale)


def _halo_free_setup(n=512, d=32, block=128, layers=2, seed=13,
                     compute="float32"):
    rng = np.random.default_rng(seed)
    base = (np.arange(n)[:, None] // block) * block
    idx = (base + rng.integers(0, block, (n, 8))).astype(np.int32)
    mask = np.ones((n, 8), np.float32)
    ew = rng.uniform(0.1, 1.0, (n, 8)).astype(np.float32)
    bdg = build_block_dense(idx, mask, ew, block=block)
    assert bdg.table == bdg.block
    cfg = GatedGraphTransformerConfig(dim=d, num_heads=4,
                                      num_layers=layers,
                                      fused_gate_attn="always",
                                      hysteresis_band=0.05,
                                      compute_dtype=compute)
    params = gated_graph_transformer_init(jax.random.key(0), cfg)
    feats = rng.normal(size=(n, d)).astype(np.float32)
    fpad = bdg.pad_features(jnp.asarray(feats))
    return params, cfg, fpad, bdg, rng


def test_layer_kernel_emitted_sig_matches_standalone():
    """gated_block_layer_with_sig == (gated_block_layer, then the
    standalone block_gate_signature_ln_x on the written output):
    bf16-compute mode bitwise; f32 mode positives-set exact and rsum
    within dot-chain reassociation (<=1e-7 relative — far inside the
    hysteresis band it feeds)."""
    import ruvector_tpu.graph_transformer.gated as g
    from ruvector_tpu.ops.pallas.gated_block_attn import (
        block_gate_signature_ln_x,
    )
    from ruvector_tpu.ops.pallas.gated_block_layer import (
        fold_gated_layer_params,
        gated_block_layer,
        gated_block_layer_with_sig,
    )

    params, cfg, fpad, bdg, rng = _halo_free_setup()
    p, p_next = params[0], params[1]
    x = fpad.reshape(bdg.n_blocks, bdg.block, -1)
    kp = g.pack_keep(jnp.ones(
        (bdg.n_blocks, bdg.block, bdg.block), bool))
    folded = fold_gated_layer_params(p, cfg)
    A_sig_next = g._fold_sig_params(p_next, cfg)
    for bf16 in (False, True):
        ref = gated_block_layer(x, kp, bdg.node_pad, bdg.wdense, folded,
                                compute_bf16=bf16)
        out, rsum, rcnt = gated_block_layer_with_sig(
            x, kp, bdg.node_pad, bdg.wdense, folded, A_sig_next,
            p_next["ln1"]["gamma"], p_next["ln1"]["beta"],
            compute_bf16=bf16, sig_eps=cfg.eps)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        rs_ref, rc_ref = block_gate_signature_ln_x(
            ref.astype(jnp.float32), bdg.node_pad, A_sig_next,
            p_next["ln1"]["gamma"], p_next["ln1"]["beta"],
            eps=cfg.eps, compute_bf16=bf16)
        if bf16:
            np.testing.assert_array_equal(np.asarray(rsum),
                                          np.asarray(rs_ref))
        else:
            np.testing.assert_allclose(np.asarray(rsum),
                                       np.asarray(rs_ref), rtol=2e-6)
        np.testing.assert_array_equal(np.asarray(rcnt),
                                      np.asarray(rc_ref))


def test_step_fused_next_sig_matches_standalone_route(monkeypatch):
    """The temporal-reuse step with the in-kernel next-layer signature
    must reproduce the standalone-signature route: bitwise in
    bf16-compute mode (the config-5 production mode), and to f32
    reassociation tolerance in f32 mode — on a steady step AND a
    drifted one, with identical masks/ages/resolve counts."""
    import ruvector_tpu.graph_transformer.gated as g
    from ruvector_tpu.graph_transformer.gated import (
        gate_state_init,
        gated_graph_transformer_step,
    )

    import dataclasses

    for compute in ("bfloat16", "float32"):
        params, cfg, fpad, bdg, rng = _halo_free_setup(compute=compute)
        state = gate_state_init(params, cfg, fpad, bdg)
        drifted = fpad + 0.3 * jnp.asarray(
            rng.normal(size=fpad.shape).astype(np.float32))
        drifted = drifted * bdg.node_pad.reshape(-1)[:, None]
        # band=0 on the drifted step so gates actually re-solve (the
        # emitted layer-1 signature then feeds real refreshes)
        cfg0 = dataclasses.replace(cfg, hysteresis_band=0.0)

        for inp, c in ((fpad, cfg), (drifted, cfg0)):
            assert g._FUSE_NEXT_SIG
            out_f, st_f, n_f = gated_graph_transformer_step(
                params, c, inp, bdg, state)
            monkeypatch.setattr(g, "_FUSE_NEXT_SIG", False)
            out_s, st_s, n_s = gated_graph_transformer_step(
                params, c, inp, bdg, state)
            monkeypatch.setattr(g, "_FUSE_NEXT_SIG", True)
            assert int(n_f) == int(n_s)
            if inp is drifted:
                assert int(n_f) > 0
            for k in ("keep", "age"):
                np.testing.assert_array_equal(np.asarray(st_f[k]),
                                              np.asarray(st_s[k]))
            if compute == "bfloat16":
                np.testing.assert_array_equal(np.asarray(out_f),
                                              np.asarray(out_s))
                np.testing.assert_array_equal(np.asarray(st_f["sig"]),
                                              np.asarray(st_s["sig"]))
            else:
                np.testing.assert_array_equal(np.asarray(out_f),
                                              np.asarray(out_s))
                np.testing.assert_allclose(np.asarray(st_f["sig"]),
                                           np.asarray(st_s["sig"]),
                                           rtol=2e-6)


def test_step_fused_next_sig_chunked_route(monkeypatch):
    """The sig-emitting layer driven through the ceil-chunked map
    (>_CHUNK_NB blocks, incl. the clamped-overlap last chunk at a
    non-divisible nb) must match the unchunked program exactly."""
    import ruvector_tpu.graph_transformer.gated as g
    from ruvector_tpu.graph_transformer.gated import (
        gate_state_init,
        gated_graph_transformer_step,
    )

    # nb = 5 blocks: chunk 2 -> chunks [0:2], [2:4], [3:5] (overlap)
    params, cfg, fpad, bdg, rng = _halo_free_setup(n=640,
                                                   compute="bfloat16")
    assert bdg.n_blocks == 5
    state = gate_state_init(params, cfg, fpad, bdg)
    drifted = fpad + 0.3 * jnp.asarray(
        rng.normal(size=fpad.shape).astype(np.float32))
    drifted = drifted * bdg.node_pad.reshape(-1)[:, None]

    out_ref, st_ref, n_ref = gated_graph_transformer_step(
        params, cfg, drifted, bdg, state)
    monkeypatch.setattr(g, "_CHUNK_NB", 2)
    out_c, st_c, n_c = gated_graph_transformer_step(
        params, cfg, drifted, bdg, state)
    assert int(n_ref) == int(n_c)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_c))
    for k in ("keep", "sig", "age"):
        np.testing.assert_array_equal(np.asarray(st_ref[k]),
                                      np.asarray(st_c[k]))
