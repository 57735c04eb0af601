"""Example: property graph -> Cypher queries -> GNN over the same graph.

Build a small knowledge graph, query it with Cypher (the reference's
ruvector-graph cypher surface), then lower it to a NeighborGraph and run
the RuvectorLayer over node features — the "HNSW/Cypher neighbor graphs
feed the GNN" pipeline of the north star.

Run: PYTHONPATH=. python examples/graph_query.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ruvector_tpu.graph import PropertyGraph, execute_cypher
    from ruvector_tpu.nn import RuvectorLayerConfig, ruvector_layer_init
    from ruvector_tpu.nn.ruvector_layer import ruvector_layer_apply

    # 1. build a property graph (or load: from_edge_file / from_jsonl /
    #    from_cypher)
    g = PropertyGraph()
    rng = np.random.default_rng(0)
    people = [f"p{i}" for i in range(40)]
    for i, p in enumerate(people):
        g.add_node(p, ["Person"], age=int(20 + i % 30),
                   embedding=rng.normal(size=16).tolist())
    for i in range(len(people)):
        for j in rng.choice(40, size=4, replace=False):
            if i != j:
                g.add_edge(people[i], people[int(j)], "KNOWS",
                           weight=float(rng.uniform(0.1, 1.0)))

    # 2. Cypher queries
    rows = execute_cypher(
        g, "MATCH (a:Person)-[:KNOWS]->(b) WHERE a.age > 40 "
           "RETURN a.age AS age, count(*) AS fanout")
    print("query:", rows)
    rows = execute_cypher(
        g, "MATCH (a)-[:KNOWS*1..2]->(b:Person {age: 25}) "
           "RETURN count(*) AS paths_to_25")
    print("2-hop:", rows)

    # 3. lower to the TPU compute path
    graph, node_ids = g.to_neighbor_graph(max_degree=8)
    feats = jnp.asarray(g.feature_matrix("embedding", dim=16))
    cfg = RuvectorLayerConfig(input_dim=16, hidden_dim=16, heads=4)
    params = ruvector_layer_init(jax.random.key(0), cfg)
    out = jax.jit(
        lambda p, f: ruvector_layer_apply(p, cfg, f, graph))(params, feats)
    print("GNN embeddings over the Cypher graph:", out.shape,
          f"finite={bool(jnp.all(jnp.isfinite(out)))}")


if __name__ == "__main__":
    main()
