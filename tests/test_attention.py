"""Attention family tests: flash==dense equivalence, masking, registry,
mincut gating semantics, hyperbolic geometry identities, RoPE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruvector_tpu.attention import (
    EdgeFeaturedConfig,
    LinearAttentionConfig,
    MoEAttentionConfig,
    attn_mincut,
    dynamic_min_cut,
    edge_featured_apply,
    edge_featured_init,
    exp_map,
    flash_attention,
    get_attention,
    graph_rope_encode,
    hyperbolic_attention,
    hysteresis_apply,
    hysteresis_init,
    linear_attention_apply,
    linear_attention_init,
    list_attention,
    local_global_attention,
    log_map,
    mobius_add,
    poincare_distance,
    project_to_ball,
    scaled_dot_attention,
)
from ruvector_tpu.attention.mincut import MincutGateConfig, attn_softmax
from ruvector_tpu.attention.rope import rope_tables


def rand(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_registry_has_core_mechanisms():
    names = list_attention()
    for want in ["scaled_dot", "flash", "linear", "local_global",
                 "edge_featured", "mincut", "hyperbolic", "moe"]:
        assert want in names, names


def test_flash_matches_standard():
    # mirror of flash.rs:192-211 equivalence test
    q = rand(4, 32, seed=1)
    k = rand(4, 100, 32, seed=2)
    v = rand(4, 100, 32, seed=3)
    dense = scaled_dot_attention(q, k, v)
    flash = flash_attention(q, k, v, block_size=16)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense), atol=1e-4)


def test_flash_masked_matches_dense_masked():
    rng = np.random.default_rng(4)
    q = rand(3, 16, seed=5)
    k = rand(3, 50, 16, seed=6)
    v = rand(3, 50, 16, seed=7)
    mask = jnp.asarray((rng.random((3, 50)) > 0.5).astype(np.float32))
    dense = scaled_dot_attention(q, k, v, mask)
    flash = flash_attention(q, k, v, mask, block_size=8)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense), atol=1e-4)


def test_scaled_dot_fully_masked_returns_zero():
    q, k, v = rand(2, 8, seed=8), rand(2, 5, 8, seed=9), rand(2, 5, 8, seed=10)
    out = scaled_dot_attention(q, k, v, jnp.zeros((2, 5)))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_linear_attention_approximates_softmax_weights():
    cfg = LinearAttentionConfig(dim=16, num_features=256, kernel="softmax")
    params = linear_attention_init(jax.random.key(0), cfg)
    q = 0.3 * rand(2, 16, seed=11)
    k = 0.3 * rand(2, 20, 16, seed=12)
    v = rand(2, 20, 16, seed=13)
    out = linear_attention_apply(params, cfg, q, k, v)
    assert np.all(np.isfinite(np.asarray(out)))
    # output should be a convex-ish combination: within value range bounds
    vmax = np.abs(np.asarray(v)).max()
    assert np.abs(np.asarray(out)).max() < vmax * 2


def test_linear_attention_relu_elu_kernels():
    for kernel in ["relu", "elu"]:
        cfg = LinearAttentionConfig(dim=8, num_features=32, kernel=kernel)
        params = linear_attention_init(jax.random.key(1), cfg)
        out = linear_attention_apply(
            params, cfg, rand(2, 8, seed=14), rand(2, 6, 8, seed=15), rand(2, 6, 8, seed=16)
        )
        assert np.all(np.isfinite(np.asarray(out)))


def test_local_global_window():
    s, d = 32, 8
    q, k, v = rand(s, d, seed=17), rand(s, d, seed=18), rand(s, d, seed=19)
    out = local_global_attention(q, k, v, local_window=4, num_global=2)
    assert out.shape == (s, d)
    # position 20 attends only {0,1} ∪ {18..22}; verify by perturbing key 10
    k2 = k.at[10].set(k[10] + 100.0)
    out2 = local_global_attention(q, k2, v, local_window=4, num_global=2)
    np.testing.assert_allclose(np.asarray(out[20]), np.asarray(out2[20]), atol=1e-5)
    # but perturbing key 0 (global) changes everything
    k3 = k.at[0].set(k[0] + 100.0)
    out3 = local_global_attention(q, k3, v, local_window=4, num_global=2)
    assert not np.allclose(np.asarray(out[20]), np.asarray(out3[20]))


def test_edge_featured_shapes_and_edges_matter():
    cfg = EdgeFeaturedConfig(node_dim=32, edge_dim=8, num_heads=4)
    params = edge_featured_init(jax.random.key(2), cfg)
    q, k, v = rand(3, 32, seed=20), rand(3, 10, 32, seed=21), rand(3, 10, 32, seed=22)
    e = rand(3, 10, 8, seed=23)
    out0 = edge_featured_apply(params, cfg, q, k, v)
    out1 = edge_featured_apply(params, cfg, q, k, v, edges=e)
    assert out0.shape == (3, 32)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
    # mean heads variant
    cfg2 = EdgeFeaturedConfig(node_dim=32, edge_dim=8, num_heads=4, concat_heads=False)
    out2 = edge_featured_apply(params, cfg2, q, k, v)
    assert out2.shape == (3, 8)


def test_mincut_gating_semantics():
    # all-negative logits -> everything gated (mincut.rs test_dynamic_all_negative)
    r = dynamic_min_cut(np.full(4, -1.0), 2, 0.5, 2, 0.01)
    assert r.edges_kept == 0
    # identity-ish logits keep positives
    logits = np.asarray([1.0, 0.5, 0.0, 0.0, 1.0, 0.5, 0.0, 0.0, 1.0])
    r = dynamic_min_cut(logits, 3, 0.5, 2, 0.01)
    assert r.edges_total == 9
    assert r.edges_kept > 0


def test_attn_mincut_output_finite_and_gated():
    q, k, v = rand(4, 8, seed=24), rand(4, 8, seed=25), rand(4, 8, seed=26)
    out, gating = attn_mincut(q, k, v, MincutGateConfig(lam=0.5, tau=2, eps=0.01))
    assert out.shape == (4, 8)
    assert np.all(np.isfinite(np.asarray(out)))
    assert gating.edges_total == 16
    # baseline ungated differs when gating removed edges
    base = attn_softmax(q, k, v)
    if gating.edges_kept < gating.edges_total:
        assert not np.allclose(np.asarray(out), np.asarray(base))


def test_hysteresis_tau():
    # no flip before tau, flip at tau (hysteresis.rs tests)
    state = hysteresis_init((3,))
    init = jnp.asarray([True, True, False])
    state, out = hysteresis_apply(state, init, tau=3)
    np.testing.assert_array_equal(np.asarray(out), [True, True, False])
    changed = jnp.asarray([False, True, True])
    state, out = hysteresis_apply(state, changed, tau=3)
    np.testing.assert_array_equal(np.asarray(out), [True, True, False])
    state, out = hysteresis_apply(state, changed, tau=3)
    np.testing.assert_array_equal(np.asarray(out), [True, True, False])
    state, out = hysteresis_apply(state, changed, tau=3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(changed))


def test_poincare_identities():
    u = project_to_ball(0.3 * rand(5, 8, seed=27))
    v = project_to_ball(0.3 * rand(5, 8, seed=28))
    # d(u, u) = 0
    np.testing.assert_allclose(np.asarray(poincare_distance(u, u)), 0.0, atol=1e-3)
    # symmetry
    np.testing.assert_allclose(
        np.asarray(poincare_distance(u, v)),
        np.asarray(poincare_distance(v, u)),
        rtol=1e-4,
    )
    # mobius_add(0, v) = v
    zero = jnp.zeros_like(u)
    np.testing.assert_allclose(np.asarray(mobius_add(zero, v)), np.asarray(v), atol=1e-5)
    # exp/log roundtrip at the origin is exact (reference maps are exact
    # inverses only at p=0 — log uses atanh(sqrt_c||w||), poincare.rs:114)
    t = 0.1 * rand(5, 8, seed=29)
    zero_p = jnp.zeros_like(t)
    y0 = exp_map(t, zero_p)
    t0 = log_map(y0, zero_p)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t), atol=1e-5)
    # near a small-norm base point the roundtrip is approximate
    p_small = project_to_ball(0.05 * rand(5, 8, seed=41))
    y1 = exp_map(t, p_small)
    t1 = log_map(y1, p_small)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t), atol=2e-2)


def test_hyperbolic_attention_shape():
    q = 0.3 * rand(3, 8, seed=30)
    k = 0.3 * rand(3, 6, 8, seed=31)
    v = rand(3, 6, 8, seed=32)
    out = hyperbolic_attention(q, k, v)
    assert out.shape == (3, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rope_relative_property():
    # RoPE: score depends only on relative distance
    dim = 16
    cos_t, sin_t = rope_tables(dim, max_position=64)
    q = rand(1, dim, seed=33)
    k = rand(1, 4, dim, seed=34)
    d1 = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
    q1, k1 = graph_rope_encode(q, k, d1, cos_t, sin_t)
    s1 = np.einsum("bd,bsd->bs", np.asarray(q1), np.asarray(k1))
    # shifting all positions by the same offset changes absolute angles;
    # relative-score property holds when query position shifts equally.
    from ruvector_tpu.attention.rope import rope_rotate
    off = 7
    q2 = rope_rotate(q, jnp.full(q.shape[:-1], off, jnp.int32), cos_t, sin_t)
    k2 = rope_rotate(k, d1 + off, cos_t, sin_t)
    s2 = np.einsum("bd,bsd->bs", np.asarray(q2), np.asarray(k2))
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_rope_scaling_variants():
    for scaling in ["none", "linear", "ntk", "yarn"]:
        cos_t, sin_t = rope_tables(16, 32, scaling=scaling, scaling_factor=2.0)
        assert cos_t.shape == (32, 8)
        assert np.all(np.isfinite(np.asarray(cos_t)))


def test_moe_attention():
    from ruvector_tpu.attention import moe_attention_apply, moe_attention_init

    cfg = MoEAttentionConfig(dim=16, num_experts=3, top_k=2)
    params = moe_attention_init(jax.random.key(3), cfg)
    q = 0.3 * rand(4, 16, seed=35)
    k = 0.3 * rand(4, 8, 16, seed=36)
    v = rand(4, 8, 16, seed=37)
    out = moe_attention_apply(params, cfg, q, k, v)
    assert out.shape == (4, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    # gradients flow through router
    def loss(p):
        return jnp.sum(moe_attention_apply(p, cfg, q, k, v) ** 2)
    g = jax.grad(loss)(params)
    assert np.abs(np.asarray(g["router"]["kernel"])).max() > 0


def test_get_attention_applies():
    mech = get_attention("scaled_dot")
    out = mech.apply(None, None, rand(2, 8, seed=38), rand(2, 4, 8, seed=39),
                     rand(2, 4, 8, seed=40))
    assert out.shape == (2, 8)


def test_attn_mincut_witness_logging():
    from ruvector_tpu.utils.witness import WitnessLog

    q, k, v = rand(4, 8, seed=50), rand(4, 8, seed=51), rand(4, 8, seed=52)
    log = WitnessLog()
    out1, _ = attn_mincut(q, k, v, MincutGateConfig(), witness_log=log)
    assert len(log.records) == 1
    assert log.records[0].label == "attn_mincut"
    assert log.verify()
    # identical inputs reproduce the identical witness chain
    log2 = WitnessLog()
    attn_mincut(q, k, v, MincutGateConfig(), witness_log=log2)
    assert log.head == log2.head
