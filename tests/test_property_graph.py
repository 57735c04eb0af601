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
