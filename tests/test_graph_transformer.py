"""Graph transformer tests: verified training invariants + certificates,
sublinear attention, transformer block."""

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph import build_knn_graph
from ruvector_tpu.graph_transformer import (
    EnergyGateInvariant,
    GraphTransformerConfig,
    LipschitzBound,
    LossStabilityBound,
    PermutationEquivariance,
    SublinearConfig,
    VerifiedTrainer,
    WeightNormBound,
    graph_transformer_apply,
    graph_transformer_init,
    lsh_bucket_assignments,
    lsh_bucket_attention,
    ppr_sampled_attention,
)
from ruvector_tpu.training.optimizers import adam, sgd


def quad_loss(params, batch):
    return jnp.sum((params["w"] - batch) ** 2)


def test_verified_trainer_commits_good_steps():
    params = {"w": jnp.asarray([5.0, 5.0])}
    trainer = VerifiedTrainer(
        quad_loss, adam(0.3), params,
        [LossStabilityBound(spike_cap=10.0, max_gradient_norm=1000.0,
                            max_step_size=10.0),
         WeightNormBound(max_norm=100.0)],
    )
    target = jnp.zeros(2)
    for _ in range(100):
        r = trainer.train_step(target)
        assert r.committed
    assert trainer.latest_loss < 5.0
    cert = trainer.seal()
    assert cert.steps == 100
    assert cert.committed_steps == 100
    assert cert.total_violations == 0
    assert len(cert.chain_hash) == 64


def test_verified_trainer_rejects_gradient_explosion():
    params = {"w": jnp.asarray([5.0])}
    trainer = VerifiedTrainer(
        quad_loss, sgd(1.0), params,
        [LossStabilityBound(spike_cap=0.5, max_gradient_norm=1.0,
                            max_step_size=0.1)],
    )
    r = trainer.train_step(jnp.zeros(1))   # grad = 10 > 1.0
    assert not r.committed
    # params unchanged (fail-closed)
    np.testing.assert_allclose(np.asarray(trainer.params["w"]), [5.0])
    assert trainer.total_violations >= 1


def test_verified_trainer_weight_norm_rollback():
    params = {"w": jnp.asarray([1.0])}

    def diverge_loss(p, batch):
        return -jnp.sum(p["w"] ** 2)   # gradient pushes w to grow

    trainer = VerifiedTrainer(
        diverge_loss, sgd(10.0), params, [WeightNormBound(max_norm=2.0)]
    )
    for _ in range(5):
        trainer.train_step(jnp.zeros(1))
    # weight norm never exceeds bound because violating steps are discarded
    assert float(jnp.abs(trainer.params["w"][0])) <= 2.0 + 1e-6


def test_verified_certificate_deterministic():
    def build():
        params = {"w": jnp.asarray([3.0])}
        t = VerifiedTrainer(quad_loss, sgd(0.1), params,
                            [WeightNormBound(max_norm=10.0)])
        for _ in range(5):
            t.train_step(jnp.zeros(1))
        return t.seal()

    c1, c2 = build(), build()
    assert c1.chain_hash == c2.chain_hash
    assert c1.final_weights_hash == c2.final_weights_hash


def test_permutation_equivariance_invariant():
    # row-wise (equivariant) model passes; fixed-output model fails
    def rowwise_forward(params, x):
        return x * params["w"]

    params = {"w": jnp.asarray(2.0)}

    def loss(p, batch):
        return jnp.sum((rowwise_forward(p, batch) - 1.0) ** 2)

    t = VerifiedTrainer(loss, sgd(0.001), params,
                        [PermutationEquivariance(tolerance=1e-4)],
                        forward_fn=rowwise_forward)
    batch = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)),
                        dtype=jnp.float32)
    r = t.train_step(batch)
    assert r.committed

    def not_equivariant(params, x):
        # position-dependent: output depends on row index
        return x * jnp.arange(x.shape[0], dtype=x.dtype)[:, None]

    t2 = VerifiedTrainer(loss, sgd(0.001), params,
                         [PermutationEquivariance(tolerance=1e-4)],
                         forward_fn=not_equivariant)
    r2 = t2.train_step(batch)
    assert not r2.committed


def test_energy_gate_rejects_dead_gradient():
    params = {"w": jnp.asarray([0.0])}   # at the optimum: zero gradient

    def loss(p, batch):
        return jnp.sum(p["w"] ** 2)

    t = VerifiedTrainer(loss, sgd(0.1), params,
                        [EnergyGateInvariant(energy_threshold=1e-6)])
    r = t.train_step(jnp.zeros(1))
    assert not r.committed


def test_lipschitz_bound_checks_spectral_norm():
    params = {"w": jnp.eye(4) * 50.0}

    def loss(p, batch):
        return jnp.sum(p["w"] ** 2) * 1e-6

    t = VerifiedTrainer(loss, sgd(0.001), params, [LipschitzBound(tolerance=10.0)])
    r = t.train_step(jnp.zeros(1))
    assert not r.committed   # spectral norm ~50 > 10


# --- sublinear attention -----------------------------------------------------

def test_lsh_buckets_group_similar():
    rng = np.random.default_rng(1)
    base = rng.normal(size=(1, 16)).astype(np.float32)
    cluster_a = base + 0.01 * rng.normal(size=(10, 16)).astype(np.float32)
    cluster_b = -base + 0.01 * rng.normal(size=(10, 16)).astype(np.float32)
    feats = jnp.asarray(np.concatenate([cluster_a, cluster_b]))
    buckets = np.asarray(lsh_bucket_assignments(feats, num_hashes=4))
    # same-cluster rows share a bucket; clusters differ
    assert len(set(buckets[:10])) == 1
    assert len(set(buckets[10:])) == 1
    assert buckets[0] != buckets[10]


def test_lsh_attention_shape_and_locality():
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
    out = lsh_bucket_attention(feats, SublinearConfig(num_hashes=2))
    assert out.shape == (20, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ppr_sampled_attention():
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(30, 8)).astype(np.float32))
    g = build_knn_graph(feats, k=4).to_csr()
    out = ppr_sampled_attention(feats, g, np.asarray([0, 5, 7]),
                                SublinearConfig(ppr_top_k=8))
    assert out.shape == (3, 8)
    assert np.all(np.isfinite(np.asarray(out)))


# --- transformer block -------------------------------------------------------

def test_graph_transformer_block():
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.normal(size=(24, 16)).astype(np.float32))
    graph = build_knn_graph(feats, k=4)
    cfg = GraphTransformerConfig(dim=16, num_heads=4, num_layers=2)
    params = graph_transformer_init(jax.random.key(0), cfg)
    out = graph_transformer_apply(params, cfg, feats, graph)
    assert out.shape == (24, 16)

    def loss(p):
        return jnp.sum(graph_transformer_apply(p, cfg, feats, graph) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
