"""Cross-subsystem integration: speculative decode against the real model,
curriculum-driven training, sharded forward with layer variants, transformer
+ SONA adapters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruvector_tpu.graph import build_knn_graph
from ruvector_tpu.models import RuvectorNetConfig, ruvector_net_init
from ruvector_tpu.nn import RuvectorLayerConfig, ruvector_layer_init
from ruvector_tpu.nn.ruvector_layer import ruvector_layer_apply
from ruvector_tpu.transformer import (
    GatePolicy,
    MincutGatedTransformer,
    TransformerConfig,
    init_weights,
)
from ruvector_tpu.transformer.decode import Decoder
from ruvector_tpu.transformer.speculative import (
    DraftTree,
    SpeculativeConfig,
    SpeculativeDecoder,
)

requires_multi = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_speculative_decode_against_real_model():
    """Draft with the model's own argmax (self-drafting): everything the
    verifier checks must then be accepted."""
    cfg = TransformerConfig.micro()
    weights = init_weights(jax.random.key(7), cfg)
    dec = Decoder(cfg, GatePolicy(), weights)

    # run the real model to get its greedy continuations
    r = dec.generate(np.asarray([3, 1, 4]), max_new_tokens=3)
    greedy = r.tokens[3:]

    # draft tree whose root chain is the greedy path
    caches = dec.init_caches()
    logits_seq = []
    logits = None
    for pos, t in enumerate(r.tokens[:-1]):
        logits, caches = dec._step(weights, caches, jnp.int32(t),
                                   jnp.int32(pos), jnp.bool_(True))
        logits_seq.append(np.asarray(logits))

    tree = DraftTree()
    # node i in the tree corresponds to target position (prompt_len-1+i)
    base = 2  # logits after consuming token index 2 predict token 3
    parent = None
    for i, tok in enumerate(greedy):
        parent = tree.add(int(tok), 0.95, parent)
    target_logits = np.stack(logits_seq[base : base + len(greedy)])

    sd = SpeculativeDecoder(SpeculativeConfig(acceptance_threshold=0.5,
                                              use_lambda_guidance=False))
    # verifier checks node i against its parent's position; node 0 (root)
    # against position 0 of the provided logits
    res = sd.verify(tree, target_logits)
    assert res.num_accepted >= 1
    assert res.accepted_tokens[0] == greedy[0]


def test_curriculum_driven_training_loop():
    """Curriculum stages adjust temperature/negatives across epochs."""
    from ruvector_tpu.training.mining import CurriculumScheduler
    from ruvector_tpu.training.optimizers import adam
    from ruvector_tpu.training.train import TrainConfig, make_train_step, train_epoch

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(48, 16)).astype(np.float32))
    graph = build_knn_graph(feats, k=4)
    cfg = RuvectorLayerConfig(input_dim=16, hidden_dim=16, heads=4)
    params = ruvector_layer_init(jax.random.key(0), cfg)
    sched = CurriculumScheduler.default_curriculum(3)

    losses = []
    opt = adam(3e-3)
    opt_state = opt.init(params)
    for epoch in range(3):
        stage = sched.current_stage()
        tc = TrainConfig(batch_size=16, n_negatives=min(stage.negative_count, 8),
                         temperature=stage.temperature, learning_rate=3e-3)
        step = make_train_step(cfg, opt, tc)
        params, opt_state, loss = train_epoch(step, params, opt_state, feats,
                                              graph, tc, rng)
        losses.append(loss)
        sched.step()
    assert all(np.isfinite(losses))


@requires_multi
def test_sharded_forward_multilayer_uneven():
    """3-layer sharded net on an uneven node count stays consistent with
    the single-device stack."""
    from ruvector_tpu.models import ruvector_net_apply
    from ruvector_tpu.parallel import build_halo_plan, make_mesh, make_sharded_layer_forward
    from ruvector_tpu.parallel.partition import pad_features_for_plan

    rng = np.random.default_rng(1)
    n, d = 83, 16
    feats = rng.normal(size=(n, d)).astype(np.float32)
    graph = build_knn_graph(jnp.asarray(feats), k=5)
    cfg = RuvectorNetConfig(input_dim=d, hidden_dim=d, num_layers=3, heads=4)
    params = ruvector_net_init(jax.random.key(2), cfg)

    mesh = make_mesh(8)
    plan, perm = build_halo_plan(graph, 8, reorder="cluster")
    fwd = make_sharded_layer_forward(cfg, plan, mesh)
    feats_pad = pad_features_for_plan(feats, plan, perm)
    out_sharded = np.asarray(fwd(params, feats_pad))

    out_single = np.asarray(
        ruvector_net_apply(params, cfg, jnp.asarray(feats), graph)
    )
    # sharded rows are permuted by `perm`
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    np.testing.assert_allclose(out_sharded[inv[np.arange(n)]][: n],
                               out_single, atol=3e-4)


def test_transformer_with_sona_adapter():
    """SONA MicroLoRA adapts the transformer's input embeddings — the
    continual-serving composition (engine.apply_micro_lora on activations)."""
    from ruvector_tpu.sona import SonaConfig, SonaEngine

    cfg = TransformerConfig.micro()
    weights = init_weights(jax.random.key(8), cfg)
    model = MincutGatedTransformer(cfg, GatePolicy(), weights)
    engine = SonaEngine(config=SonaConfig(hidden_dim=cfg.hidden,
                                          embedding_dim=cfg.hidden,
                                          flush_threshold=1,
                                          quality_threshold=0.0))

    emb = np.asarray(weights["embedding"])[np.arange(8)]
    out_base = model.infer(embedding=emb)

    # feedback adapts the adapter; adapted embeddings change the logits
    b = engine.begin_trajectory(emb[0])
    b.add_step(np.ones(cfg.hidden, np.float32) * 5.0, np.ones(1), reward=1.0)
    engine.end_trajectory(b, quality=1.0)
    engine.flush()
    adapted = np.asarray(engine.apply_micro_lora(emb))
    out_adapted = model.infer(embedding=adapted)
    assert not np.array_equal(out_base.logits, out_adapted.logits)
