"""Example: the pgvector/ruvector-compatible SQL surface.

A user coming from the reference's Postgres extension
(`crates/ruvector-postgres`: `ruvector` columns, `<->`/`<#>`/`<=>`
operators, HNSW access method, `ruvector_gnn_train` background worker)
finds the same surface here as an in-process engine: the kNN executes
either through the native threaded HNSW index or as one batched jnp
distance scan on the accelerator.

Run: PYTHONPATH=. python examples/sql_vector_search.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np


def main():
    from ruvector_tpu.serve import SqlEngine

    eng = SqlEngine()
    eng.execute("""
        CREATE TABLE docs (
            id int,
            category text,
            embedding ruvector(64)
        )
    """)

    rng = np.random.default_rng(0)
    # three clusters so nearest-neighbor structure is visible
    centers = rng.normal(size=(3, 64)).astype(np.float32) * 3
    rows = []
    for i in range(600):
        c = i % 3
        v = centers[c] + rng.normal(size=64).astype(np.float32)
        vec = "[" + ",".join(f"{x:.4f}" for x in v) + "]"
        rows.append(f"({i}, 'cat{c}', '{vec}')")
    eng.execute("INSERT INTO docs VALUES " + ", ".join(rows))
    print("rows:", eng.execute("SELECT count(*) FROM docs")[0]["count"])

    q = "[" + ",".join(f"{x:.4f}" for x in centers[1]) + "]"

    # exact kNN: one batched device distance scan
    plan = eng.execute(
        f"EXPLAIN SELECT id FROM docs ORDER BY embedding <=> '{q}' LIMIT 5")
    print("plan (no index):", [s["plan"] for s in plan])
    hits = eng.execute(
        f"SELECT id, category, embedding <=> '{q}' AS dist "
        f"FROM docs ORDER BY embedding <=> '{q}' LIMIT 5")
    for h in hits:
        print(f"  id={h['id']:4d} {h['category']}  dist={h['dist']:.4f}")
    assert all(h["category"] == "cat1" for h in hits)

    # HNSW access method (native threaded index underneath)
    eng.execute("CREATE INDEX docs_emb ON docs USING hnsw "
                "(embedding vector_cosine_ops) WITH (m = 16)")
    plan = eng.execute(
        f"EXPLAIN SELECT id FROM docs ORDER BY embedding <=> '{q}' LIMIT 5")
    print("plan (indexed):", [s["plan"] for s in plan])

    # filtered query (falls back to the exact scan over the filtered set)
    filtered = eng.execute(
        f"SELECT id FROM docs WHERE category = 'cat2' "
        f"ORDER BY embedding <=> '{q}' LIMIT 3")
    print("filtered:", [r["id"] for r in filtered])

    # the ruvector_* function surface
    [r] = eng.execute("SELECT ruvector_cosine_distance('[1,0]', '[0,1]') AS d")
    print("ruvector_cosine_distance([1,0],[0,1]) =", r["d"])

    # background GNN training over the table's vector column
    [r] = eng.execute("SELECT ruvector_gnn_train('docs', 1) AS job")
    [r] = eng.execute(f"SELECT ruvector_gnn_wait({r['job']}, 300.0) AS s")
    print("gnn train:", json.loads(r["s"])["status"],
          "loss:", round(json.loads(r["s"])["loss"], 4))
    [r] = eng.execute("SELECT ruvector_gnn_model('docs') AS m")
    print("model:", r["m"])
    eng.close()


if __name__ == "__main__":
    main()
