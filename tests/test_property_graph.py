"""Property-graph ingestion path (ruvector-graph/src/graph.rs:17-306 role:
storage+conversion; loaders for edge lists, JSONL dumps, Cypher CREATE)."""
import numpy as np

from ruvector_tpu.graph import PropertyGraph


def test_crud_and_lookup():
    g = PropertyGraph()
    g.add_node("a", ["Person"], age=30)
    g.add_node("b", ["Person"], age=40)
    g.add_node("c", ["City"])
    g.add_edge("a", "b", type="KNOWS", weight=0.5)
    g.add_edge("a", "c", type="LIVES_IN")
    assert g.node_count == 3 and g.edge_count == 2
    assert [n.id for n in g.nodes_by_label("Person")] == ["a", "b"]
    assert [n.id for n in g.nodes_by_property("age", 40)] == ["b"]
    assert [e.dst for e in g.outgoing("a")] == ["b", "c"]
    assert [e.src for e in g.incoming("b")] == ["a"]
    assert g.delete_node("c")
    assert g.node_count == 2 and g.edge_count == 1


def test_edge_list_and_lowering():
    src = np.array([0, 0, 1, 2, 2])
    dst = np.array([1, 2, 2, 0, 1])
    w = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    g = PropertyGraph.from_edge_list(src, dst, w)
    ng, ids = g.to_neighbor_graph()
    assert ng.num_nodes == 3 and ng.max_degree == 2
    row = {nid: i for i, nid in enumerate(ids)}
    i0 = row["0"]
    assert float(ng.nbr_mask[i0].sum()) == 2.0
    csr, ids2 = g.to_csr()
    assert int(csr.row_ptr[-1]) == 5
    assert ids2 == ids


def test_jsonl_and_features():
    lines = [
        '{"type": "node", "id": "x", "labels": ["Doc"], "properties": {"embedding": [1, 2]}}',
        '{"type": "node", "id": "y", "properties": {"embedding": [3, 4]}}',
        '{"type": "relationship", "start": "x", "end": "y", "label": "NEAR", "properties": {"weight": 0.7}}',
    ]
    g = PropertyGraph.from_jsonl(lines)
    assert g.edge_count == 1 and g.edges_by_type("NEAR")[0].weight == 0.7
    f = g.feature_matrix()
    np.testing.assert_allclose(f, [[1, 2], [3, 4]])


def test_cypher_create_subset():
    text = """
    CREATE (a:Person {id: 'alice', age: 33})
    CREATE (b:Person {id: 'bob'})
    CREATE (a)-[:KNOWS {weight: 0.9}]->(b)
    """
    g = PropertyGraph.from_cypher(text)
    assert g.node_count == 2
    assert g.get_node("alice").properties["age"] == 33
    e = g.edges_by_type("KNOWS")
    assert len(e) == 1 and e[0].weight == 0.9 and e[0].src == "alice"


def test_edge_file(tmp_path):
    p = tmp_path / "edges.tsv"
    p.write_text("# comment\n0 1 0.5\n1 2\n")
    g = PropertyGraph.from_edge_file(str(p))
    assert g.edge_count == 2
    ng, _ = g.to_neighbor_graph(symmetrize=True)
    assert float(ng.nbr_mask.sum()) == 4.0


# --- hyperedges (graph.rs:22-45, hyperedge.rs) + MERGE (round 3) -----------

def test_hyperedge_crud_and_node_index():
    from ruvector_tpu.graph import PropertyGraph

    g = PropertyGraph()
    he = g.add_hyperedge(["a", "b", "c"], edge_type="MEETING",
                         description="standup", confidence=0.9,
                         room="4a")
    assert g.hyperedge_count == 1
    assert he.order == 3 and he.contains_node("b")
    assert he.contains_all_nodes(["a", "c"])
    assert not he.contains_all_nodes(["a", "z"])
    assert he.contains_any_node(["z", "c"])
    assert g.get_hyperedge(he.id).properties["room"] == "4a"
    # node index
    assert [h.id for h in g.hyperedges_of_node("b")] == [he.id]
    g.add_hyperedge(["b", "d"], edge_type="PAIR")
    assert len(g.hyperedges_of_node("b")) == 2
    assert len(g.hyperedges_by_type("MEETING")) == 1
    # delete via id
    assert g.delete_hyperedge(he.id)
    assert g.get_hyperedge(he.id) is None
    assert len(g.hyperedges_of_node("b")) == 1
    assert not g.delete_hyperedge("nope")


def test_hyperedge_survives_node_delete_by_shrinking():
    from ruvector_tpu.graph import PropertyGraph

    g = PropertyGraph()
    he = g.add_hyperedge(["a", "b", "c"], edge_type="TEAM")
    pair = g.add_hyperedge(["a", "b"], edge_type="PAIR")
    g.delete_node("c")
    assert g.get_hyperedge(he.id).nodes == ("a", "b")
    g.delete_node("b")
    # order < 2 vanishes; the TEAM edge and PAIR edge are both gone
    assert g.get_hyperedge(he.id) is None
    assert g.get_hyperedge(pair.id) is None


def test_hyperedge_clique_expansion_feeds_gnn():
    import numpy as np

    from ruvector_tpu.graph import PropertyGraph

    g = PropertyGraph()
    g.add_edge("a", "b", weight=1.0)
    g.add_hyperedge(["a", "c", "d"], confidence=0.6)
    ng, ids = g.to_neighbor_graph(hyperedges="clique")
    row = {nid: i for i, nid in enumerate(ids)}
    idx = np.asarray(ng.nbr_idx)
    msk = np.asarray(ng.nbr_mask)
    w = np.asarray(ng.edge_weight)
    # a's neighbors include b (pairwise) and c, d (clique, w=0.3 each)
    a_nbrs = {int(idx[row["a"], j]): float(w[row["a"], j])
              for j in range(idx.shape[1]) if msk[row["a"], j] > 0}
    assert row["b"] in a_nbrs
    assert abs(a_nbrs[row["c"]] - 0.3) < 1e-6
    assert abs(a_nbrs[row["d"]] - 0.3) < 1e-6
    # star expansion adds one hub row per hyperedge
    ng2, ids2 = g.to_neighbor_graph(hyperedges="star")
    assert len(ids2) == len(ids) + 1
    hub = len(ids)                      # appended after nodes
    c_nbrs = {int(idx2j) for idx2j, m in zip(
        np.asarray(ng2.nbr_idx)[row["c"]], np.asarray(ng2.nbr_mask)[row["c"]])
        if m > 0}
    assert hub in c_nbrs


def test_hyperedge_jsonl_roundtrip():
    import json

    from ruvector_tpu.graph import PropertyGraph

    lines = [
        json.dumps({"type": "node", "id": "x", "labels": ["P"]}),
        json.dumps({"type": "hyperedge", "nodes": ["x", "y", "z"],
                    "label": "GROUP", "confidence": 0.5,
                    "properties": {"topic": "gnn"}}),
    ]
    g = PropertyGraph.from_jsonl(lines)
    assert g.hyperedge_count == 1
    he = g.hyperedges_by_type("GROUP")[0]
    assert he.nodes == ("x", "y", "z")
    assert he.properties["topic"] == "gnn"


# --- transactions (transaction.rs surface; VERDICT r2 missing#4) ------------

def test_transaction_commit_applies_atomically():
    from ruvector_tpu.graph import PropertyGraph

    g = PropertyGraph()
    g.add_node("seed")
    with g.begin() as tx:
        tx.add_node("a", ["P"], score=1)
        tx.add_node("b", ["P"])
        tx.add_edge("a", "b", type="KNOWS", weight=0.5)
        tx.add_hyperedge(["a", "b", "seed"], edge_type="TEAM")
        # nothing visible before commit
        assert g.get_node("a") is None
        # read-your-writes inside the tx
        assert tx.read_node("a").properties["score"] == 1
    assert g.get_node("a") is not None
    assert g.edge_count == 1 and g.hyperedge_count == 1


def test_transaction_rollback_on_exception_leaves_graph_untouched():
    import pytest

    from ruvector_tpu.graph import PropertyGraph

    g = PropertyGraph()
    g.add_node("keep", score=7)
    g.add_edge("keep", "other")
    with pytest.raises(RuntimeError, match="boom"):
        with g.begin() as tx:
            tx.add_node("ghost")
            tx.add_edge("ghost", "keep")
            raise RuntimeError("boom")
    assert g.get_node("ghost") is None
    assert g.node_count == 2 and g.edge_count == 1
    assert tx.state == "rolled_back"


def test_transaction_midway_failure_restores_snapshot():
    """A failing op INSIDE commit() (set_property on a missing node)
    rolls back everything already applied — indexes included."""
    import pytest

    from ruvector_tpu.graph import PropertyGraph

    g = PropertyGraph()
    g.add_node("x")
    tx = g.begin()
    tx.add_node("y")
    tx.add_edge("x", "y")
    tx.set_property("does-not-exist", "k", 1)    # will fail at commit
    with pytest.raises(KeyError):
        tx.commit()
    assert tx.state == "rolled_back"
    assert g.get_node("y") is None
    assert g.edge_count == 0
    assert g.outgoing("x") == []                 # indexes restored too


def test_transaction_explicit_rollback_and_reuse_guard():
    import pytest

    from ruvector_tpu.graph import PropertyGraph, TransactionAborted

    g = PropertyGraph()
    tx = g.begin()
    tx.add_node("n1")
    tx.rollback()
    assert g.get_node("n1") is None
    with pytest.raises(TransactionAborted):
        tx.add_node("n2")
    with pytest.raises(TransactionAborted):
        tx.commit()


def test_transaction_delete_and_read_your_writes():
    from ruvector_tpu.graph import PropertyGraph

    g = PropertyGraph()
    g.add_node("a", score=1)
    with g.begin() as tx:
        tx.delete_node("a")
        assert tx.read_node("a") is None         # sees pending delete
        tx.add_node("b")
    assert g.get_node("a") is None and g.get_node("b") is not None


def test_transaction_interleaved_ops_rollback_ordering():
    """Undo journal must unwind interleaved creates/deletes/overwrites
    in exact reverse order (code-review r3 follow-up)."""
    import pytest

    from ruvector_tpu.graph import PropertyGraph

    g = PropertyGraph()
    g.add_node("keep", v=1)
    g.add_edge("keep", "other", weight=2.0)
    he0 = g.add_hyperedge(["keep", "other"], edge_type="OLD", id="H")

    tx = g.begin()
    tx.add_node("a", score=1)            # fresh
    tx.add_node("a", score=2)            # overwrite within the txn
    tx.add_edge("a", "b")                # creates b
    tx.add_edge("a", "c")                # creates c
    tx.add_hyperedge(["a", "b"], edge_type="NEW", id="H")   # overwrites H
    tx.delete_node("other")              # rewrites edges + indexes
    tx.add_edge("keep", "d")             # after the delete
    tx.set_property("keep", "v", 99)
    tx.set_property("nope", "k", 1)      # fails -> full unwind
    with pytest.raises(KeyError):
        tx.commit()

    # graph is bit-for-bit the pre-transaction state
    assert set(g._nodes) == {"keep", "other"}
    assert g.edge_count == 1
    assert g.get_node("keep").properties["v"] == 1
    assert g.get_hyperedge("H").edge_type == "OLD"
    assert [e.dst for e in g.outgoing("keep")] == ["other"]
    assert g.hyperedges_of_node("other") == [g.get_hyperedge("H")]
