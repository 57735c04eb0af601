"""Training subsystem tests: losses vs oracle values, optimizer parity with
reference update rules, schedules, EWC, replay buffer, end-to-end training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ruvector_tpu.graph import NeighborGraph, build_knn_graph
from ruvector_tpu.nn import RuvectorLayerConfig, ruvector_layer_init
from ruvector_tpu.training import (
    ReduceOnPlateau,
    ReplayBuffer,
    adam,
    batched_info_nce,
    binary_cross_entropy_loss,
    cross_entropy_loss,
    ewc_compute_fisher,
    ewc_consolidate,
    ewc_gradient,
    ewc_init,
    ewc_penalty,
    info_nce_loss,
    local_contrastive_loss,
    make_schedule,
    mse_loss,
    sgd,
)
from ruvector_tpu.training.train import (
    TrainConfig,
    make_train_step,
    sample_negatives,
    sgd_step,
    train_epoch,
)


# --- losses -----------------------------------------------------------------

def test_mse_values():
    pred = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_allclose(float(mse_loss(pred, pred)), 0.0, atol=1e-6)
    target = pred + 1.0
    np.testing.assert_allclose(float(mse_loss(pred, target)), 1.0, atol=1e-6)
    # varying diffs: mean of [1,4,9,16] = 7.5
    p = jnp.zeros((1, 4))
    t = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    np.testing.assert_allclose(float(mse_loss(p, t)), 7.5, atol=1e-6)


def test_bce_values():
    good = jnp.asarray([[0.999, 0.001]])
    target = jnp.asarray([[1.0, 0.0]])
    assert float(binary_cross_entropy_loss(good, target)) < 0.1
    bad = jnp.asarray([[0.001, 0.999]])
    assert float(binary_cross_entropy_loss(bad, target)) > 1.0
    # extreme values stay finite (training.rs:1211-1220)
    extreme = jnp.asarray([[0.0, 1.0]])
    assert np.isfinite(float(binary_cross_entropy_loss(extreme, target)))


def test_cross_entropy_values():
    pred = jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]])
    target = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    loss = float(cross_entropy_loss(pred, target))
    assert 0.0 < loss < 1.0
    wrong = jnp.asarray([[0.1, 0.1, 0.8]])
    target1 = jnp.asarray([[1.0, 0.0, 0.0]])
    assert float(cross_entropy_loss(wrong, target1)) > 1.0


def test_info_nce_matches_reference_math():
    """Scalar check against the reference formula (training.rs:541-590)."""
    anchor = np.asarray([1.0, 0.0, 0.0], np.float32)
    positive = np.asarray([[0.9, 0.1, 0.0]], np.float32)
    negatives = np.asarray([[0.5, 0.8, 0.0], [0.4, 0.0, 0.9]], np.float32)
    tau = 0.5

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    pos_sim = cos(anchor, positive[0]) / tau
    neg_sims = [cos(anchor, n) / tau for n in negatives]
    logits = np.asarray([pos_sim] + neg_sims)
    m = logits.max()
    lse = m + np.log(np.exp(logits - m).sum())
    expect = -(pos_sim - lse)

    got = float(info_nce_loss(jnp.asarray(anchor), jnp.asarray(positive),
                              jnp.asarray(negatives), tau))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_info_nce_closer_positive_lower_loss():
    anchor = jnp.asarray([1.0, 0.0, 0.0])
    neg = jnp.asarray([[0.0, 1.0, 0.0]])
    far = jnp.asarray([[0.5, 0.5, 0.0]])
    close = jnp.asarray([[0.9, 0.1, 0.0]])
    assert float(info_nce_loss(anchor, close, neg)) < float(info_nce_loss(anchor, far, neg))


def test_local_contrastive_no_neighbors_is_zero():
    node = jnp.asarray([1.0, 0.0])
    # batched form: anchors with zero valid positives contribute 0
    loss = batched_info_nce(
        node[None], jnp.zeros((1, 2, 2)), jnp.ones((1, 3, 2)),
        pos_mask=jnp.zeros((1, 2)),
    )
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_batched_info_nce_matches_single():
    rng = np.random.default_rng(0)
    anchors = rng.normal(size=(3, 8)).astype(np.float32)
    pos = rng.normal(size=(3, 4, 8)).astype(np.float32)
    neg = rng.normal(size=(3, 6, 8)).astype(np.float32)
    batched = float(batched_info_nce(jnp.asarray(anchors), jnp.asarray(pos),
                                     jnp.asarray(neg)))
    singles = [
        float(info_nce_loss(jnp.asarray(anchors[i]), jnp.asarray(pos[i]),
                            jnp.asarray(neg[i])))
        for i in range(3)
    ]
    np.testing.assert_allclose(batched, np.mean(singles), rtol=1e-4)


# --- optimizers -------------------------------------------------------------

def test_sgd_matches_reference_first_step():
    # training.rs test_sgd_optimizer_basic: params -= lr * grad
    opt = sgd(0.1)
    params = {"w": jnp.asarray([[1.0, 2.0], [3.0, 4.0]])}
    grads = {"w": jnp.asarray([[0.1, 0.2], [0.3, 0.4]])}
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(new["w"]), [[0.99, 1.98], [2.97, 3.96]], atol=1e-6
    )


def test_sgd_momentum_matches_reference():
    # v = m*v + lr*g; p -= v — second step update is lr*g*(1+m)
    opt = sgd(0.1, momentum=0.9)
    params = {"w": jnp.asarray([1.0])}
    grads = {"w": jnp.asarray([0.1])}
    state = opt.init(params)
    u1, state = opt.update(grads, state, params)
    p1 = optax.apply_updates(params, u1)
    np.testing.assert_allclose(np.asarray(p1["w"]), [0.99], atol=1e-6)
    u2, state = opt.update(grads, state, p1)
    p2 = optax.apply_updates(p1, u2)
    # v2 = 0.9*0.01 + 0.01 = 0.019; p = 0.99 - 0.019 = 0.971
    np.testing.assert_allclose(np.asarray(p2["w"]), [0.971], atol=1e-6)


def test_adam_convergence_quadratic():
    # training.rs test_adam_convergence: minimize x^2+y^2 from (5,5)
    opt = adam(0.5)
    params = jnp.asarray([5.0, 5.0])
    state = opt.init(params)
    for _ in range(200):
        grads = 2.0 * params
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert np.all(np.abs(np.asarray(params)) < 0.5)


# --- schedules --------------------------------------------------------------

def test_schedule_formulas():
    s = make_schedule("step_decay", 1.0, step_size=10, gamma=0.5)
    np.testing.assert_allclose(float(s(0)), 1.0)
    np.testing.assert_allclose(float(s(10)), 0.5)
    np.testing.assert_allclose(float(s(25)), 0.25)

    e = make_schedule("exponential", 1.0, gamma=0.9)
    np.testing.assert_allclose(float(e(2)), 0.81, rtol=1e-5)

    c = make_schedule("cosine_annealing", 1.0, t_max=10, eta_min=0.1)
    np.testing.assert_allclose(float(c(0)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(c(5)), 0.55, rtol=1e-5)
    np.testing.assert_allclose(float(c(10)), 1.0, rtol=1e-5)  # warm restart

    w = make_schedule("warmup_linear", 1.0, warmup_steps=10, total_steps=110)
    np.testing.assert_allclose(float(w(5)), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(w(10)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(w(60)), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(w(110)), 0.0, atol=1e-6)


def test_reduce_on_plateau():
    r = ReduceOnPlateau(1.0, factor=0.5, patience=2, min_lr=0.1)
    assert r.step_with_metric(1.0) == 1.0   # first metric = improvement
    assert r.step_with_metric(1.0) == 1.0   # no improvement, patience 1
    assert r.step_with_metric(1.0) == 0.5   # patience hit -> halve
    assert r.step_with_metric(0.5) == 0.5   # improvement resets
    r2 = ReduceOnPlateau(0.15, factor=0.5, patience=1, min_lr=0.1)
    r2.step_with_metric(1.0)
    assert r2.step_with_metric(2.0) == 0.1  # floor at min_lr


# --- EWC --------------------------------------------------------------------

def test_ewc_lifecycle():
    params = {"w": jnp.asarray([1.0, 2.0])}
    state = ewc_init(params, lam=10.0)
    # inactive -> zero penalty/gradient
    np.testing.assert_allclose(float(ewc_penalty(state, params)), 0.0)
    g = ewc_gradient(state, params)
    np.testing.assert_allclose(np.asarray(g["w"]), [0.0, 0.0])

    grads = [{"w": jnp.asarray([1.0, 0.0])}, {"w": jnp.asarray([3.0, 0.0])}]
    state = ewc_compute_fisher(state, grads)
    np.testing.assert_allclose(np.asarray(state.fisher["w"]), [5.0, 0.0])  # (1+9)/2

    state = ewc_consolidate(state, params)
    moved = {"w": jnp.asarray([2.0, 5.0])}
    # penalty = 10/2 * (5*(2-1)^2 + 0) = 25
    np.testing.assert_allclose(float(ewc_penalty(state, moved)), 25.0, rtol=1e-5)
    g = ewc_gradient(state, moved)
    np.testing.assert_allclose(np.asarray(g["w"]), [50.0, 0.0], rtol=1e-5)


def test_ewc_penalty_grad_consistent_with_autodiff():
    params = {"w": jnp.asarray([1.0, 2.0, 3.0])}
    state = ewc_init(params, lam=3.0)
    state = ewc_compute_fisher(state, [{"w": jnp.asarray([1.0, 2.0, 0.5])}])
    state = ewc_consolidate(state, params)
    moved = {"w": jnp.asarray([1.5, 1.0, 4.0])}
    auto = jax.grad(lambda p: ewc_penalty(state, p))(moved)
    manual = ewc_gradient(state, moved)
    np.testing.assert_allclose(np.asarray(auto["w"]), np.asarray(manual["w"]), rtol=1e-5)


# --- replay -----------------------------------------------------------------

def test_replay_buffer_reservoir():
    buf = ReplayBuffer(capacity=10, seed=0)
    for i in range(100):
        buf.add(np.asarray([float(i)]), [i])
    assert len(buf) == 10
    assert buf.total_seen == 100
    batch = buf.sample(5)
    assert len(batch) == 5
    qs, ids = buf.sample_arrays(3)
    assert qs.shape == (3, 1)


def test_replay_shift_detection():
    buf = ReplayBuffer(capacity=200, seed=1)
    rng = np.random.default_rng(2)
    for _ in range(100):
        buf.add(rng.normal(0.0, 1.0, size=8), [0])
    no_shift = buf.detect_distribution_shift(20)
    for _ in range(100):
        buf.add(rng.normal(5.0, 1.0, size=8), [0])
    shift = buf.detect_distribution_shift(20)
    assert shift > no_shift
    assert shift > 0.5


# --- end-to-end contrastive training ---------------------------------------

def test_contrastive_training_reduces_loss():
    rng = np.random.default_rng(3)
    n, d, h = 64, 16, 16
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    graph = build_knn_graph(feats, k=4)
    layer_cfg = RuvectorLayerConfig(input_dim=d, hidden_dim=h, heads=4, dropout=0.0)
    params = ruvector_layer_init(jax.random.key(0), layer_cfg)

    cfg = TrainConfig(batch_size=32, n_negatives=8, learning_rate=0.01)
    opt = adam(cfg.learning_rate)
    opt_state = opt.init(params)
    step = make_train_step(layer_cfg, opt, cfg)

    first_loss = None
    last_loss = None
    for epoch in range(12):
        params, opt_state, loss = train_epoch(
            step, params, opt_state, feats, graph, cfg, rng
        )
        if first_loss is None:
            first_loss = loss
        last_loss = loss
    assert last_loss < first_loss, (first_loss, last_loss)


def test_sample_negatives_avoids_neighbors():
    g = NeighborGraph.from_lists([[1, 2], [0], [0, 3], [2]], max_degree=2)
    rng = np.random.default_rng(4)
    negs = sample_negatives(rng, g, np.asarray([0]), 2)
    assert negs.shape == (1, 2)
    assert set(negs[0].tolist()).isdisjoint({0, 1, 2})


def test_sgd_step_embedding():
    emb = jnp.asarray([1.0, 2.0, 3.0])
    grad = jnp.asarray([0.1, -0.2, 0.3])
    out = sgd_step(emb, grad, 0.01)
    np.testing.assert_allclose(np.asarray(out), [0.999, 2.002, 2.997], atol=1e-6)


# --- reference test-strategy parity (SURVEY §4) ------------------------------

def _finite_difference_grad(f, x, eps=1e-3):
    g = np.zeros_like(x)
    for i in range(x.size):
        d = np.zeros_like(x).ravel()
        d[i] = eps
        d = d.reshape(x.shape)
        g.ravel()[i] = (f(x + d) - f(x - d)) / (2 * eps)
    return g


def test_numerical_vs_analytical_gradients():
    """training.rs:1311-1339 — finite differences agree with autodiff for
    every loss."""
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(4, 8)).astype(np.float32)
    target = rng.normal(size=(4, 8)).astype(np.float32)

    for loss_fn in (mse_loss,
                    lambda p, t: binary_cross_entropy_loss(
                        p, (np.sign(t) + 1) / 2)):
        f = lambda p: float(loss_fn(jnp.asarray(p), jnp.asarray(target)))
        ana = np.asarray(jax.grad(
            lambda p: loss_fn(p, jnp.asarray(target)))(jnp.asarray(pred)))
        num = _finite_difference_grad(f, pred)
        np.testing.assert_allclose(ana, num, atol=5e-2, rtol=5e-2)


def test_optimizer_convergence_on_quadratic():
    """training.rs:1067-1116 — Adam and SGD drive x^2 + y^2 to ~0."""
    for make in (lambda: adam(0.1), lambda: sgd(0.05, momentum=0.9)):
        opt = make()
        params = {"p": jnp.asarray([3.0, -2.0])}
        state = opt.init(params)
        loss = lambda p: jnp.sum(p["p"] ** 2)
        import optax
        for _ in range(200):
            g = jax.grad(loss)(params)
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        assert float(loss(params)) < 1e-3


def test_softmax_temperature_monotonicity():
    """search.rs:194-203 — lower temperature sharpens the distribution."""
    from ruvector_tpu.serve.search import softmax_temperature

    scores = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    entropies = []
    for t in (2.0, 1.0, 0.5, 0.1):
        p = np.asarray(softmax_temperature(scores, temperature=t))
        np.testing.assert_allclose(p.sum(), 1.0, atol=1e-6)
        entropies.append(-(p * np.log(p + 1e-12)).sum())
    assert all(entropies[i] > entropies[i + 1] for i in range(3))
