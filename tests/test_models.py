"""Model family tests: RuvectorNet stack, GraphSAGE sampling semantics,
GCN, GAT."""

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.graph import NeighborGraph, build_knn_graph
from ruvector_tpu.models import (
    GATConfig,
    GCNConfig,
    GraphSAGEConfig,
    RuvectorNetConfig,
    gat_apply,
    gat_init,
    gcn_apply,
    gcn_init,
    graphsage_apply,
    graphsage_init,
    ruvector_net_apply,
    ruvector_net_init,
    sample_fanout,
)


def setup(n=40, d=8, k=4, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    graph = build_knn_graph(feats, k=k)
    return feats, graph


def test_ruvector_net_stack():
    feats, graph = setup()
    cfg = RuvectorNetConfig(input_dim=8, hidden_dim=16, num_layers=3, heads=4)
    params = ruvector_net_init(jax.random.key(0), cfg)
    assert len(params) == 3
    out = ruvector_net_apply(params, cfg, feats, graph)
    assert out.shape == (40, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_graphsage_fanout_sampling():
    g = NeighborGraph.from_lists(
        [[1, 2, 3, 4, 5], [0], [0, 1], [], [0, 1, 2]], max_degree=5
    )
    idx, mask = sample_fanout(g, fanout=3, seed=42)
    assert idx.shape == (5, 3)
    m = np.asarray(mask)
    # degree <= fanout kept entirely
    assert m[1].sum() == 1
    assert m[2].sum() == 2
    assert m[3].sum() == 0
    # degree > fanout downsampled to exactly fanout, all from true neighbors
    assert m[0].sum() == 3
    assert set(np.asarray(idx)[0][m[0] > 0].tolist()) <= {1, 2, 3, 4, 5}


def test_graphsage_forward_mean_and_max():
    feats, graph = setup()
    idx, mask = sample_fanout(graph, fanout=3)
    for agg in ["mean", "max"]:
        cfg = GraphSAGEConfig(in_features=8, out_features=12, aggregator=agg)
        params = graphsage_init(jax.random.key(1), cfg)
        out = graphsage_apply(params, cfg, feats, idx, mask)
        assert out.shape == (40, 12)
        norms = np.linalg.norm(np.asarray(out), axis=1)
        # L2-normalized (or zero for all-relu-dead rows)
        assert np.all((np.abs(norms - 1.0) < 1e-4) | (norms < 1e-6))


def test_graphsage_isolated_node_zero_agg():
    g = NeighborGraph.from_lists([[1], []], max_degree=1)
    feats = jnp.asarray(np.eye(2, 4, dtype=np.float32))
    idx, mask = sample_fanout(g, fanout=1)
    cfg = GraphSAGEConfig(in_features=4, out_features=4, normalize=False)
    params = graphsage_init(jax.random.key(2), cfg)
    out = graphsage_apply(params, cfg, feats, idx, mask)
    # isolated node: only self path contributes
    expect = jax.nn.relu(feats[1] @ params["w_self"])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(expect), atol=1e-6)


def test_gcn_forward():
    feats, graph = setup()
    cfg = GCNConfig(in_features=8, out_features=6)
    params = gcn_init(jax.random.key(3), cfg)
    out = gcn_apply(params, cfg, feats, graph)
    assert out.shape == (40, 6)
    assert np.all(np.asarray(out) >= 0)  # relu


def test_gat_forward_residual():
    feats, graph = setup(d=16)
    cfg = GATConfig(node_dim=16, num_heads=4)
    params = gat_init(jax.random.key(4), cfg)
    out = gat_apply(params, cfg, feats, graph)
    assert out.shape == (40, 16)
    out_nores = gat_apply(params, GATConfig(node_dim=16, num_heads=4, residual=False),
                          feats, graph)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_nores + feats), atol=1e-5
    )


def test_models_are_differentiable():
    feats, graph = setup()
    cfg = RuvectorNetConfig(input_dim=8, hidden_dim=8, num_layers=2, heads=2)
    params = ruvector_net_init(jax.random.key(5), cfg)

    def loss(p):
        return jnp.sum(ruvector_net_apply(p, cfg, feats, graph) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_generic_message_passing():
    from ruvector_tpu.models.message_passing import (
        mean_aggregate, max_aggregate, propagate, sum_aggregate)
    import jax.numpy as jnp
    g = NeighborGraph.from_lists([[1, 2], [0], []],
                                 weights=[[2.0, 1.0], [1.0], []],
                                 max_degree=2)
    feats = jnp.asarray(np.eye(3, dtype=np.float32))
    # default: weighted sum of neighbor features
    out = propagate(feats, g)
    np.testing.assert_allclose(np.asarray(out[0]), [0, 2, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), [0, 0, 0], atol=1e-6)
    # mean aggregate ignores edge weight in the custom message
    out2 = propagate(feats, g, message_fn=lambda nbr, w: nbr,
                     aggregate="mean")
    np.testing.assert_allclose(np.asarray(out2[0]), [0, 0.5, 0.5], atol=1e-6)
    # max + custom update
    out3 = propagate(feats, g, message_fn=lambda nbr, w: nbr,
                     aggregate="max",
                     update_fn=lambda agg, x: agg + x)
    np.testing.assert_allclose(np.asarray(out3[1]), [1, 1, 0], atol=1e-6)


def test_graphsage_net_stack():
    from ruvector_tpu.models import (
        GraphSAGENetConfig, graphsage_net_apply, graphsage_net_init)
    feats, graph = setup(n=30, d=8, k=5)
    cfg = GraphSAGENetConfig(in_features=8, hidden_features=16,
                             out_features=12, fanouts=(4, 3))
    params = graphsage_net_init(jax.random.key(6), cfg)
    assert len(params) == 2
    out = graphsage_net_apply(params, cfg, feats, graph)
    assert out.shape == (30, 12)
    # deterministic sampling -> identical reruns
    out2 = graphsage_net_apply(params, cfg, feats, graph)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_remat_forward_and_grads_match():
    """remat=True (jax.checkpoint per layer) must be numerically identical
    in forward AND gradients — it only changes the memory/FLOP tradeoff."""
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(48, 16)).astype(np.float32))
    graph = build_knn_graph(feats, k=4)
    cfg = RuvectorNetConfig(input_dim=16, hidden_dim=16, num_layers=3)
    cfg_r = RuvectorNetConfig(input_dim=16, hidden_dim=16, num_layers=3,
                              remat=True)
    params = ruvector_net_init(jax.random.key(0), cfg)

    out = ruvector_net_apply(params, cfg, feats, graph)
    out_r = ruvector_net_apply(params, cfg_r, feats, graph)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)

    def loss(p, c):
        return jnp.sum(ruvector_net_apply(p, c, feats, graph) ** 2)

    g = jax.grad(lambda p: loss(p, cfg))(params)
    g_r = jax.grad(lambda p: loss(p, cfg_r))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
