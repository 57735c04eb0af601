"""Tests: MoD routing, sparse attention masks, Mamba, speculative decoding,
spectral PE, spike scheduler, energy gate."""

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.transformer.mod_routing import (
    MincutDepthRouter,
    ModRoutingConfig,
    TokenRoute,
    apply_layer_masked,
    apply_layer_routed,
)
from ruvector_tpu.transformer.packets import GateDecision, GatePacket, SpikePacket
from ruvector_tpu.transformer.sparse_attention import (
    MincutSparseAttention,
    SparseMask,
    SparsityConfig,
    sparse_attention,
)
from ruvector_tpu.transformer.mamba import (
    MambaConfig,
    mamba_forward_sequence,
    mamba_init,
    mamba_state_init,
    mamba_step,
)
from ruvector_tpu.transformer.speculative import (
    DraftTree,
    SpeculativeConfig,
    SpeculativeDecoder,
    generate_tree_attention_mask,
)
from ruvector_tpu.transformer.spectral import (
    SpectralPEConfig,
    SpectralPositionEncoder,
    laplacian_from_edges,
    lanczos,
    power_iteration,
)
from ruvector_tpu.transformer.spike import EnergyGate, SpikeScheduler


# --- MoD routing ------------------------------------------------------------

def test_mod_capacity_target():
    router = MincutDepthRouter(ModRoutingConfig(layer_capacity_ratio=0.5,
                                                min_tokens_per_layer=2,
                                                adaptive_capacity=False))
    routes = router.route_tokens(GatePacket(partition_count=1), np.arange(32))
    stats = router.routing_stats(routes)
    assert stats.compute_tokens == 16        # 50% capacity
    assert stats.skip_tokens == 16


def test_mod_boundary_tokens_forced():
    router = MincutDepthRouter(ModRoutingConfig(layer_capacity_ratio=0.25))
    routes = router.route_tokens(GatePacket(partition_count=4), np.arange(32))
    assert sum(r is TokenRoute.BOUNDARY for r in routes) == 4
    # boundary positions are partition starts: 0, 8, 16, 24
    assert routes[0] is TokenRoute.BOUNDARY
    assert routes[8] is TokenRoute.BOUNDARY


def test_mod_unstable_lambda_raises_capacity():
    cfg = ModRoutingConfig(layer_capacity_ratio=0.25, adaptive_capacity=True)
    router = MincutDepthRouter(cfg)
    stable = router.routing_stats(
        router.route_tokens(GatePacket(lam=100, lam_prev=100), np.arange(32)))
    unstable = router.routing_stats(
        router.route_tokens(GatePacket(lam=100, lam_prev=50), np.arange(32)))
    assert unstable.compute_tokens > stable.compute_tokens


def test_mod_apply_masked_and_routed_agree():
    layer = lambda x: x * 2.0 + 1.0
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32))
    mask = jnp.asarray([1, 0, 1, 0, 1, 0, 1, 0], jnp.float32)
    out_masked = apply_layer_masked(layer, x, mask)
    idx = jnp.asarray([0, 2, 4, 6])
    out_routed = apply_layer_routed(layer, x, idx)
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_routed), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_masked[1]), np.asarray(x[1]))


# --- sparse attention -------------------------------------------------------

def test_sparse_mask_full_when_unstructured():
    sa = MincutSparseAttention()
    mask = sa.build_mask(GatePacket(partition_count=1), seq_len=32)
    assert mask.density == 1.0  # falls back to full causal


def test_sparse_mask_partition_structure():
    sa = MincutSparseAttention()
    gate = GatePacket(lam=100, partition_count=4)
    mask = sa.build_mask(gate, seq_len=32)
    assert 0.0 < mask.density <= 1.0
    assert len(mask.partition_boundaries) == 4
    # causal: no attention to the future
    m = mask.mask
    assert not np.any(np.triu(m, k=1))
    # boundary tokens attendable from everywhere (causally)
    for b in mask.boundary_tokens:
        for q in range(b, 32):
            assert m[q, b]


def test_sparse_density_schedules():
    from ruvector_tpu.transformer.sparse_attention import LambdaDensitySchedule
    lin = MincutSparseAttention(SparsityConfig(
        lambda_based_density=LambdaDensitySchedule("linear", 0.2, 0.8)))
    assert lin.calculate_density(GatePacket(lam=30)) <= 0.21
    assert lin.calculate_density(GatePacket(lam=300)) >= 0.79
    thr = MincutSparseAttention(SparsityConfig(
        lambda_based_density=LambdaDensitySchedule("threshold",
                                                   dense_above_lambda=150)))
    assert thr.calculate_density(GatePacket(lam=200)) == 0.9
    assert thr.calculate_density(GatePacket(lam=100)) == 0.1


def test_sparse_attention_matches_dense_on_full_mask():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    full = SparseMask.full(8)
    out = sparse_attention(q, k, v, full.mask)
    # manual causal attention
    scores = np.asarray(q) @ np.asarray(k).T / 4.0
    for i in range(8):
        scores[i, i + 1:] = -np.inf
    attn = np.exp(scores - scores.max(1, keepdims=True))
    attn /= attn.sum(1, keepdims=True)
    expect = attn @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)


# --- Mamba ------------------------------------------------------------------

def test_mamba_step_and_sequence_agree():
    cfg = MambaConfig.micro()
    weights = mamba_init(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(6, cfg.d_model)).astype(np.float32))
    seq_out = mamba_forward_sequence(cfg, weights, x)
    state = mamba_state_init(cfg)
    for t in range(6):
        y, state = mamba_step(cfg, weights, x[t], state)
        np.testing.assert_allclose(np.asarray(y), np.asarray(seq_out[t]),
                                   atol=1e-5, err_msg=f"t={t}")


def test_mamba_state_carries_history():
    cfg = MambaConfig.micro()
    weights = mamba_init(jax.random.key(1), cfg)
    x = jnp.ones((cfg.d_model,))
    s0 = mamba_state_init(cfg)
    y1, s1 = mamba_step(cfg, weights, x, s0)
    y2, s2 = mamba_step(cfg, weights, x, s1)
    # same input, different state -> different output
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


# --- speculative ------------------------------------------------------------

def make_tree():
    t = DraftTree()
    r = t.add(5, 0.9, None)
    a = t.add(7, 0.8, r)
    b = t.add(9, 0.75, r)
    t.add(11, 0.9, a)
    return t


def test_tree_attention_mask_ancestors_only():
    t = make_tree()
    mask = generate_tree_attention_mask(t)
    assert mask[3, 1] and mask[3, 0] and mask[3, 3]   # leaf sees its chain
    assert not mask[3, 2]                             # not the sibling branch
    assert not mask[1, 2] and not mask[2, 1]


def test_speculative_verify_accepts_matching_prefix():
    t = make_tree()
    vocab = 16
    logits = np.full((4, vocab), -10.0, np.float32)
    logits[0, 7] = 10.0     # target at root predicts 7 -> accepts node a
    logits[1, 11] = 10.0    # at node a predicts 11 -> accepts leaf
    logits[3, 2] = 10.0
    # root itself: target argmax at root position must equal root token 5
    logits[0, 5] = 5.0  # 7 still wins; root check uses its own position
    dec = SpeculativeDecoder(SpeculativeConfig(acceptance_threshold=0.5,
                                               use_lambda_guidance=False))
    # root has parent None -> checked against its own position: argmax=7 != 5
    res = dec.verify(t, logits)
    assert res.num_accepted == 0
    logits[0, 5] = 20.0     # now root matches
    res = dec.verify(t, logits)
    # path root(5)->a(7)? a checked at parent pos 0, argmax now 5 != 7 -> stop
    assert res.accepted_tokens[:1] == [5]


def test_speculative_lambda_guidance_raises_threshold():
    dec = SpeculativeDecoder(SpeculativeConfig(acceptance_threshold=0.7))
    calm = dec.effective_threshold(GatePacket(lam=100, lam_prev=100))
    crisis = dec.effective_threshold(GatePacket(lam=30, lam_prev=100))
    assert crisis > calm


# --- spectral ---------------------------------------------------------------

def test_laplacian_rows_sum_zero():
    lap = laplacian_from_edges([(0, 1), (1, 2), (2, 3)], 4)
    np.testing.assert_allclose(lap.sum(axis=1), 0.0, atol=1e-6)


def test_power_iteration_finds_dominant():
    m = jnp.asarray(np.diag([1.0, 5.0, 2.0]).astype(np.float32))
    v = np.abs(np.asarray(power_iteration(m, 64)))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-3)


def test_lanczos_eigenvalues_match_numpy():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(12, 12))
    sym = (a + a.T) / 2
    evals, evecs = lanczos(jnp.asarray(sym, dtype=jnp.float32), k=3, max_iters=12)
    expect = np.linalg.eigvalsh(sym)[:3]
    np.testing.assert_allclose(evals, expect, atol=1e-3)
    # eigenvector property: A v ≈ λ v
    for i in range(3):
        np.testing.assert_allclose(sym @ evecs[:, i], evals[i] * evecs[:, i],
                                   atol=1e-2)


def test_spectral_pe_separates_components():
    # two disconnected cliques -> Fiedler-like vector separates them
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    enc = SpectralPositionEncoder(SpectralPEConfig(num_eigenvectors=2))
    pe = enc.encode_from_edges(edges, 6)
    assert pe.shape == (6, 2)
    d_within = enc.spectral_distance(pe, 0, 1)
    d_across = enc.spectral_distance(pe, 0, 5)
    assert d_across > d_within


# --- spike scheduler + energy gate ------------------------------------------

def test_spike_scheduler_fires_on_novelty():
    s = SpikeScheduler(novelty_threshold=0.1)
    x = np.ones(8)
    p1 = s.observe(x)
    assert p1.is_active()              # first observation fires
    p2 = s.observe(x)
    assert not p2.is_active()          # identical input: no spike
    p3 = s.observe(x * 5.0)
    assert p3.is_active()              # big change fires
    assert p3.novelty_q15 > p2.novelty_q15


def test_energy_gate_decisions():
    g = EnergyGate()
    calm = GatePacket(lam=200, lam_prev=200)
    dec, conf = g.decide(calm)
    assert dec == GateDecision.ALLOW and conf >= 0.7
    crisis = GatePacket(lam=5, lam_prev=200, boundary_concentration_q15=30000,
                        partition_count=20)
    dec, conf = g.decide(crisis)
    assert dec == GateDecision.FREEZE_WRITES and conf >= 0.7


# --- spike-driven attention --------------------------------------------------

def test_spike_rate_coding_roundtrip():
    from ruvector_tpu.transformer.spike_attention import (
        SpikeDrivenConfig, decode_rate, encode_rate)
    cfg = SpikeDrivenConfig(temporal_coding_steps=16, spike_threshold=0.25,
                            refractory_period=0)
    x = jnp.asarray([[1.0, -0.5, 0.0, 2.0]])
    spikes = encode_rate(x, cfg)
    assert spikes.shape == (16, 1, 4)
    dec = np.asarray(decode_rate(spikes, cfg))
    # rate coding approximates magnitude*sign within threshold resolution
    np.testing.assert_allclose(dec, np.asarray(x), atol=0.3)
    assert dec[0, 2] == 0.0
    assert dec[0, 1] < 0


def test_spike_refractory_limits_rate():
    from ruvector_tpu.transformer.spike_attention import (
        SpikeDrivenConfig, encode_rate)
    x = jnp.asarray([[10.0]])  # saturating input
    no_refr = encode_rate(x, SpikeDrivenConfig(temporal_coding_steps=8,
                                               refractory_period=0))
    refr = encode_rate(x, SpikeDrivenConfig(temporal_coding_steps=8,
                                            refractory_period=2))
    assert int(jnp.sum(jnp.abs(refr))) < int(jnp.sum(jnp.abs(no_refr)))


def test_spike_attention_output():
    from ruvector_tpu.transformer.spike_attention import (
        SpikeDrivenConfig, energy_estimate, spike_driven_attention)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    out = spike_driven_attention(x, x, x)
    assert out.shape == (6, 8)
    assert np.all(np.isfinite(np.asarray(out)))
    # deterministic
    out2 = spike_driven_attention(x, x, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    e = energy_estimate(SpikeDrivenConfig(), seq=64, dim=128)
    assert e["energy_ratio"] > 1.0  # fewer-energy claim accounting


# --- KV cache metrics + adaptive policy --------------------------------------

def test_kv_memory_stats():
    from ruvector_tpu.transformer.kv_metrics import MemoryStats
    s = MemoryStats(hot_tokens=16, warm_tokens=48, archive_tokens=64,
                    head_dim=64, heads=4)
    h, w, a = s.tier_percentages()
    np.testing.assert_allclose(h + w + a, 1.0)
    assert s.memory_saved_vs_f32() > 0.4   # quantized tiers save memory


def test_quality_tracker_and_policy():
    from ruvector_tpu.transformer.kv_cache import KVCacheConfig
    from ruvector_tpu.transformer.kv_metrics import (
        QualityFeedback, QualityTracker, TierPolicy)

    t = QualityTracker(quality_target=0.95)
    for _ in range(8):
        t.record(QualityFeedback.from_ppl(12.0, baseline_ppl=10.0))  # 0.83
    assert not t.meets_target()
    cfg = KVCacheConfig(hot_capacity=16)
    policy = TierPolicy()
    cfg2 = policy.adapt(cfg, t)
    assert cfg2.hot_capacity > cfg.hot_capacity   # widen on bad quality

    t2 = QualityTracker(quality_target=0.9)
    for _ in range(8):
        t2.record(QualityFeedback.from_accuracy(0.99))
    cfg3 = policy.adapt(cfg, t2)
    assert cfg3.hot_capacity < cfg.hot_capacity   # shrink when comfortable

    # improvement detection
    t3 = QualityTracker()
    for q in [0.5, 0.5, 0.6, 0.9, 0.95, 0.99]:
        t3.record(QualityFeedback(q))
    assert t3.is_improving()


def test_trace_state_counters_and_snapshot():
    """trace.rs TraceCounters/TraceSnapshot semantics over real witnesses."""
    import numpy as np

    from ruvector_tpu.transformer import (
        GatePolicy, MincutGatedTransformer, TransformerConfig, init_weights,
    )
    from ruvector_tpu.transformer.packets import GatePacket
    from ruvector_tpu.transformer.trace import TraceState

    cfg = TransformerConfig.micro()
    model = MincutGatedTransformer(cfg, GatePolicy(),
                                   init_weights(jax.random.key(0), cfg))
    trace = TraceState()
    tokens = np.arange(8) % cfg.vocab
    for _ in range(3):
        out = model.infer(tokens=tokens)
        trace.record(out.witness)
    snap = trace.snapshot()
    assert snap.inferences == 3
    assert snap.total_layers_run > 0
    assert snap.mean_layers_per_inference > 0
    # deterministic: replayed inputs produce ONE distinct logits hash
    assert snap.distinct_logit_hashes == 1
    assert len(trace.recent()) == 3
    assert sum(snap.tier_counts.values()) == 3


def test_kvquant_pre_rope_beats_post_rope():
    """kvquant.rs core claim: quantizing PRE-RoPE keys loses less than
    quantizing post-RoPE keys at the same bit budget."""
    import numpy as np

    from ruvector_tpu.attention.rope import rope_rotate, rope_tables
    from ruvector_tpu.transformer.kv_quantizers import (
        kvquant_dequantize_keys, kvquant_quantize_keys,
    )

    rng = np.random.default_rng(0)
    t, d = 64, 32
    # realistic keys: a few dominant channels (post-RoPE mixes them)
    # large EVEN channels paired (by RoPE) with small odd channels:
    # rotation leaks the large range into the small channels, which is
    # exactly why pre-RoPE quantization wins
    chan_scale = np.ones(d); chan_scale[0:8:2] = 8.0
    keys = jnp.asarray((rng.normal(size=(t, d)) * chan_scale).astype(np.float32))
    cos_t, sin_t = rope_tables(d, 128)
    positions = jnp.arange(t)
    keys_rot = rope_rotate(keys, positions, cos_t, sin_t)

    # pre-RoPE: quantize raw keys, rotate after dequant
    pre = kvquant_quantize_keys(keys, bits=3, pre_rope=True)
    rec_pre = rope_rotate(kvquant_dequantize_keys(pre), positions,
                          cos_t, sin_t)
    # post-RoPE: quantize the rotated keys directly
    post = kvquant_quantize_keys(keys_rot, bits=3, pre_rope=False)
    rec_post = kvquant_dequantize_keys(post)

    err_pre = float(jnp.mean((rec_pre - keys_rot) ** 2))
    err_post = float(jnp.mean((rec_post - keys_rot) ** 2))
    assert err_pre < err_post


def test_kvquant_nonuniform_values_outliers_exact():
    import numpy as np

    from ruvector_tpu.transformer.kv_quantizers import (
        kvquant_dequantize_values, kvquant_quantize_values,
    )

    rng = np.random.default_rng(1)
    v = rng.normal(size=(16, 32)).astype(np.float32)
    v[3, 7] = 50.0                        # massive outlier
    nv = kvquant_quantize_values(jnp.asarray(v), bits=4)
    dec = np.asarray(kvquant_dequantize_values(nv))
    assert dec[3, 7] == 50.0              # outlier preserved exactly
    assert np.mean((dec - v) ** 2) < 0.05


def test_squat_decorrelation_beats_direct_quant():
    """squat.rs claim: orthogonal-subspace quantization beats direct
    quantization at equal bits on correlated data."""
    import numpy as np

    from ruvector_tpu.transformer.kv_quantizers import (
        SQuatBasis, squat_dequantize, squat_learn_basis, squat_quantize,
        squat_compression_ratio,
    )

    rng = np.random.default_rng(2)
    t, d = 256, 32
    # strongly correlated components (low-rank + noise): the realistic KV shape
    latent = rng.normal(size=(t, 4))
    mix = rng.normal(size=(4, d)) * 3.0
    kv = jnp.asarray((latent @ mix + 0.1 * rng.normal(size=(t, d)))
                     .astype(np.float32))

    basis = squat_learn_basis(kv, num_subspaces=8, bits=4)
    c = squat_quantize(kv, basis)
    rec = squat_dequantize(c, basis)
    err_squat = float(jnp.mean((rec - kv) ** 2))

    # direct per-subspace quant WITHOUT decorrelation (identity basis)
    ident = SQuatBasis(basis=jnp.eye(d), num_subspaces=8, bits=4)
    c2 = squat_quantize(kv, ident)
    err_direct = float(jnp.mean((squat_dequantize(c2, ident) - kv) ** 2))

    assert err_squat < err_direct          # decorrelation pays
    # compression accounting at production dims (d=128, 3-bit, 4 subspaces)
    prod = SQuatBasis(basis=jnp.eye(128), num_subspaces=4, bits=3)
    assert squat_compression_ratio(prod, 128) > 3.0


# --- speculative decoding (jitted self-speculative loop) --------------------

def test_speculative_generate_matches_greedy():
    """Greedy acceptance makes speculative output token-identical to plain
    greedy decoding (speculative.rs's verification contract)."""
    import jax
    import jax.numpy as jnp

    from ruvector_tpu.transformer.config import TransformerConfig
    from ruvector_tpu.transformer.decode import make_decode_step
    from ruvector_tpu.transformer.kv_cache import KVCacheConfig, kv_cache_init
    from ruvector_tpu.transformer.model import init_weights
    from ruvector_tpu.transformer.spec_decode import (
        SpecDecodeConfig,
        make_speculative_generate_fn,
    )

    cfg = TransformerConfig.micro()
    weights = init_weights(jax.random.key(7), cfg)
    cache_cfg = KVCacheConfig(hot_capacity=8, warm_capacity=16,
                              archive_capacity=16, heads=cfg.heads,
                              head_dim=cfg.head_dim)
    step = make_decode_step(cfg, cache_cfg)

    prompt = [5, 17, 9]
    caches = [kv_cache_init(cache_cfg) for _ in range(cfg.layers)]
    logits = None
    for pos, t in enumerate(prompt):
        logits, caches = step(weights, caches, jnp.int32(t), jnp.int32(pos),
                              jnp.bool_(True))
    b = jnp.argmax(logits).astype(jnp.int32)

    max_new = 10
    # greedy reference continuation
    g_caches = caches
    g_logits = logits
    greedy = []
    cur = b
    pos = len(prompt)
    for _ in range(max_new):
        greedy.append(int(cur))
        g_logits, g_caches = step(weights, g_caches, cur, jnp.int32(pos),
                                  jnp.bool_(True))
        cur = jnp.argmax(g_logits).astype(jnp.int32)
        pos += 1

    gen = make_speculative_generate_fn(
        cfg, cache_cfg, SpecDecodeConfig(gamma=4, draft_layers=1), max_new)
    out, count, _, acc_total, commits = gen(weights, caches, b)
    assert int(count) == max_new
    assert [int(t) for t in out] == greedy
    # every EXECUTED macro step commits at least the bonus token (the
    # while_loop exits once the budget is met, leaving trailing zeros)
    c = np.asarray(commits)
    executed = c[: int(np.searchsorted(np.cumsum(c), max_new)) + 1]
    assert executed.min() >= 1
