"""Tests for the pgvector/ruvector-compatible SQL surface (serve/sql.py).

Mirrors the reference's SQL-surface behavior: operator semantics from
`crates/ruvector-postgres/src/operators.rs:19-120` and the function names
from `sql/ruvector--0.3.0.sql`.
"""

import numpy as np
import pytest

from ruvector_tpu.serve.sql import SqlEngine, SqlError, parse_sql


@pytest.fixture()
def eng():
    e = SqlEngine()
    e.execute("CREATE TABLE items (id int, tag text, embedding ruvector(4))")
    e.execute(
        "INSERT INTO items (id, tag, embedding) VALUES "
        "(1, 'a', '[1,0,0,0]'), (2, 'b', '[0,1,0,0]'), "
        "(3, 'a', '[0,0,1,0]'), (4, 'b', '[0.5,0.5,0,0]')")
    return e


def test_create_insert_count(eng):
    assert eng.execute("SELECT count(*) FROM items") == [{"count": 4}]


def test_knn_l2_orders_by_distance(eng):
    rows = eng.execute(
        "SELECT id, embedding <-> '[1,0,0,0]' AS d FROM items "
        "ORDER BY embedding <-> '[1,0,0,0]' LIMIT 3")
    assert [r["id"] for r in rows] == [1, 4, 2]
    assert rows[0]["d"] == pytest.approx(0.0, abs=1e-6)
    assert rows[1]["d"] == pytest.approx(np.sqrt(0.5), abs=1e-5)


def test_knn_operators_match_numpy(eng):
    vecs = {1: [1, 0, 0, 0], 2: [0, 1, 0, 0], 3: [0, 0, 1, 0],
            4: [0.5, 0.5, 0, 0]}
    q = np.array([0.3, 0.9, 0.1, 0.0], np.float32)
    for op, fn in [
        ("<->", lambda v: float(np.linalg.norm(np.array(v) - q))),
        ("<#>", lambda v: -float(np.array(v, np.float32) @ q)),
        ("<=>", lambda v: 1.0 - float(np.array(v, np.float32) @ q)
         / (np.linalg.norm(v) * np.linalg.norm(q))),
    ]:
        rows = eng.execute(
            f"SELECT id, embedding {op} '[0.3,0.9,0.1,0]' AS d "
            f"FROM items ORDER BY embedding {op} '[0.3,0.9,0.1,0]'")
        expect = sorted(vecs, key=lambda i: fn(vecs[i]))
        assert [r["id"] for r in rows] == expect
        for r in rows:
            assert r["d"] == pytest.approx(fn(vecs[r["id"]]), abs=1e-5)


def test_where_filter_and_projection(eng):
    rows = eng.execute(
        "SELECT id FROM items WHERE tag = 'a' "
        "ORDER BY embedding <-> '[0,0,1,0]' LIMIT 10")
    assert [r["id"] for r in rows] == [3, 1]


def test_where_and_or_not(eng):
    rows = eng.execute(
        "SELECT id FROM items WHERE (tag = 'a' OR id = 4) AND NOT id = 3 "
        "ORDER BY id")
    assert [r["id"] for r in rows] == [1, 4]


def test_select_star_and_vector_roundtrip(eng):
    rows = eng.execute("SELECT * FROM items WHERE id = 2")
    assert rows[0]["tag"] == "b"
    assert rows[0]["embedding"] == [0.0, 1.0, 0.0, 0.0]


def test_hnsw_index_path_matches_exact(eng):
    # exact answer first (no index)
    exact = eng.execute(
        "SELECT id FROM items ORDER BY embedding <-> '[1,0,0,0]' LIMIT 2")
    eng.execute("CREATE INDEX itx ON items USING hnsw "
                "(embedding vector_l2_ops) WITH (m = 8, ef_construction = 64)")
    indexed = eng.execute(
        "SELECT id FROM items ORDER BY embedding <-> '[1,0,0,0]' LIMIT 2")
    assert [r["id"] for r in indexed] == [r["id"] for r in exact]


def test_hnsw_index_sees_rows_inserted_after_build():
    e = SqlEngine()
    e.execute("CREATE TABLE t (id int, v ruvector(8))")
    rng = np.random.default_rng(0)
    for i in range(50):
        vec = ", ".join(f"{x:.6f}" for x in rng.normal(size=8))
        e.execute(f"INSERT INTO t VALUES ({i}, '[{vec}]')")
    e.execute("CREATE INDEX tix ON t USING hnsw (v vector_l2_ops)")
    e.execute("INSERT INTO t VALUES (999, '[9,9,9,9,9,9,9,9]')")
    rows = e.execute("SELECT id FROM t ORDER BY v <-> '[9,9,9,9,9,9,9,9]' "
                     "LIMIT 1")
    assert rows[0]["id"] == 999


def test_large_batched_path_matches_brute_force():
    e = SqlEngine()
    e.execute("CREATE TABLE big (id int, v ruvector(16))")
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(300, 16)).astype(np.float32)
    vals = ", ".join(
        f"({i}, '[{','.join(f'{x:.6f}' for x in mat[i])}]')"
        for i in range(300))
    e.execute(f"INSERT INTO big VALUES {vals}")
    q = rng.normal(size=16).astype(np.float32)
    qs = "[" + ",".join(f"{x:.6f}" for x in q) + "]"
    rows = e.execute(f"SELECT id FROM big ORDER BY v <-> '{qs}' LIMIT 5")
    expect = np.argsort(np.linalg.norm(mat - q, axis=1), kind="stable")[:5]
    assert [r["id"] for r in rows] == [int(i) for i in expect]


def test_delete_update(eng):
    assert eng.execute("DELETE FROM items WHERE tag = 'b'") == 2
    assert eng.execute("SELECT count(*) FROM items") == [{"count": 2}]
    assert eng.execute(
        "UPDATE items SET embedding = '[0,0,0,1]' WHERE id = 1") == 1
    rows = eng.execute(
        "SELECT id FROM items ORDER BY embedding <-> '[0,0,0,1]' LIMIT 1")
    assert rows[0]["id"] == 1


def test_limit_offset(eng):
    rows = eng.execute(
        "SELECT id FROM items ORDER BY embedding <-> '[1,0,0,0]' "
        "LIMIT 2 OFFSET 1")
    assert [r["id"] for r in rows] == [4, 2]


def test_function_surface_no_table():
    e = SqlEngine()
    [row] = e.execute("SELECT ruvector_l2_distance('[3,0]', '[0,4]') AS d")
    assert row["d"] == pytest.approx(5.0)
    [row] = e.execute("SELECT ruvector_cosine_distance('[1,0]', '[0,1]')")
    assert row["ruvector_cosine_distance"] == pytest.approx(1.0)
    [row] = e.execute("SELECT ruvector_inner_product('[1,2]', '[3,4]')")
    assert row["ruvector_inner_product"] == pytest.approx(11.0)
    [row] = e.execute("SELECT ruvector_dims('[1,2,3]')")
    assert row["ruvector_dims"] == 3
    [row] = e.execute("SELECT ruvector_norm('[3,4]')")
    assert row["ruvector_norm"] == pytest.approx(5.0)
    [row] = e.execute("SELECT ruvector_normalize('[3,4]')")
    assert row["ruvector_normalize"] == pytest.approx([0.6, 0.8])
    [row] = e.execute("SELECT ruvector_add('[1,2]', '[3,4]')")
    assert row["ruvector_add"] == [4.0, 6.0]
    [row] = e.execute("SELECT binary_quantize_arr('[0.5,-0.5,2]')")
    assert row["binary_quantize_arr"] == [1, 0, 1]


def test_hyperbolic_exp_log_roundtrip():
    e = SqlEngine()
    [row] = e.execute(
        "SELECT ruvector_log_map(ruvector_exp_map('[0.1,0.2]', '[0,0]'), "
        "'[0,0]') AS v")
    assert row["v"] == pytest.approx([0.1, 0.2], abs=1e-5)


def test_graph_surface_and_cypher_bridge():
    import json
    e = SqlEngine()
    e.execute("SELECT ruvector_create_graph('g')")
    e.execute("SELECT ruvector_add_node('g', 'alice', 'Person', "
              "'{\"age\": 31}')")
    e.execute("SELECT ruvector_add_node('g', 'bob', 'Person', '{}')")
    e.execute("SELECT ruvector_add_edge('g', 'alice', 'bob', 'KNOWS', '{}')")
    [row] = e.execute("SELECT ruvector_graph_stats('g') AS s")
    assert json.loads(row["s"]) == {"nodes": 2, "edges": 1}
    [row] = e.execute(
        "SELECT ruvector_cypher('g', "
        "'MATCH (a:Person)-[:KNOWS]->(b) RETURN a.age') AS r")
    assert json.loads(row["r"]) == [{"a.age": 31}]


def test_errors():
    e = SqlEngine()
    e.execute("CREATE TABLE t (v ruvector(3))")
    with pytest.raises(SqlError):
        e.execute("INSERT INTO t VALUES ('[1,2]')")          # dim mismatch
    with pytest.raises(SqlError):
        e.execute("SELECT * FROM missing")                    # unknown table
    with pytest.raises(SqlError):
        e.execute("SELECT nope FROM t")                       # unknown column
    with pytest.raises(SqlError):
        e.execute("SELECT ruvector_l2_distance('[1]', '[1,2]')")
    with pytest.raises(SqlError):
        e.execute("CREATE TABLE t (v ruvector(3))")           # duplicate
    e.execute("CREATE TABLE IF NOT EXISTS t (v ruvector(3))")  # tolerated
    with pytest.raises(SqlError):
        e.execute("FROBNICATE")                               # parse error


def test_parse_multi_statement_and_comments():
    stmts = parse_sql(
        "-- a comment\nCREATE TABLE a (x int); CREATE TABLE b (y int);")
    assert len(stmts) == 2


def test_scalar_arith_in_projection(eng):
    [row] = eng.execute("SELECT id * 2 + 1 AS z FROM items WHERE id = 3")
    assert row["z"] == 7


def test_order_by_plain_column_desc(eng):
    rows = eng.execute("SELECT id FROM items ORDER BY id DESC LIMIT 2")
    assert [r["id"] for r in rows] == [4, 3]


def test_cast_and_bare_vector_literal(eng):
    rows = eng.execute(
        "SELECT id FROM items ORDER BY embedding <-> '[1,0,0,0]'::vector(4) "
        "LIMIT 1")
    assert rows[0]["id"] == 1
    [row] = eng.execute("SELECT ruvector_dims([1, 2, 3, 4]) AS d")
    assert row["d"] == 4


def test_gnn_train_worker_bridge():
    import json
    e = SqlEngine()
    try:
        e.execute("CREATE TABLE corpus (id int, emb ruvector(8))")
        rng = np.random.default_rng(11)
        mat = rng.normal(size=(40, 8)).astype(np.float32)
        vals = ", ".join(
            f"({i}, '[{','.join(f'{x:.5f}' for x in mat[i])}]')"
            for i in range(40))
        e.execute(f"INSERT INTO corpus VALUES {vals}")
        [row] = e.execute("SELECT ruvector_gnn_train('corpus', 2) AS job")
        job = row["job"]
        [row] = e.execute(
            f"SELECT ruvector_gnn_wait({job}, 120.0) AS s")
        status = json.loads(row["s"])
        assert status["status"] == "done", status
        assert status["loss"] is not None
        [row] = e.execute("SELECT ruvector_gnn_model('corpus') AS m")
        model = json.loads(row["m"])
        assert model["param_count"] > 0 and model["rows"] == 40
        # programmatic fetch returns the real pytree
        full = e.gnn_model("corpus")
        assert full["column"] == "emb"
    finally:
        e.close()


def test_gnn_train_errors():
    e = SqlEngine()
    try:
        e.execute("CREATE TABLE s (id int)")
        with pytest.raises(SqlError):
            e.execute("SELECT ruvector_gnn_train('missing')")
        [row] = e.execute("SELECT ruvector_gnn_train('s') AS job")
        import json
        [st] = e.execute(
            f"SELECT ruvector_gnn_wait({row['job']}, 60.0) AS s")
        assert json.loads(st["s"])["status"] == "failed"  # no vector column
    finally:
        e.close()


def test_http_sql_route():
    import json
    import urllib.request
    from ruvector_tpu.serve.server import RuvectorServer

    server = RuvectorServer(port=0).start()
    base = f"http://127.0.0.1:{server.port}"

    def req(payload):
        r = urllib.request.Request(
            base + "/sql", data=json.dumps(payload).encode(), method="POST",
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(r, timeout=10) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as err:
            return err.code, json.loads(err.read())

    try:
        code, _ = req({"sql": "CREATE TABLE t (id int, v ruvector(2))"})
        assert code == 200
        code, _ = req({"sql": "INSERT INTO t VALUES (1,'[1,0]'), (2,'[0,1]')"})
        assert code == 200
        code, out = req(
            {"sql": "SELECT id FROM t ORDER BY v <-> '[0,1]' LIMIT 1"})
        assert code == 200 and out["result"] == [{"id": 2}]
        code, out = req({"sql": "SELECT * FROM missing"})
        assert code == 400 and "missing" in out["error"]
    finally:
        server.stop()


def test_explain_reports_index_vs_scan(eng):
    plan = eng.execute(
        "EXPLAIN SELECT id FROM items ORDER BY embedding <-> '[1,0,0,0]' "
        "LIMIT 2")
    assert any("batched device distance scan" in s["plan"] for s in plan)
    eng.execute("CREATE INDEX ex ON items USING hnsw (embedding vector_l2_ops)")
    plan = eng.execute(
        "EXPLAIN SELECT id FROM items ORDER BY embedding <-> '[1,0,0,0]' "
        "LIMIT 2")
    assert any("hnsw index scan" in s["plan"] for s in plan)
    # filtered query cannot ride the index
    plan = eng.execute(
        "EXPLAIN SELECT id FROM items WHERE tag = 'a' "
        "ORDER BY embedding <-> '[1,0,0,0]' LIMIT 2")
    assert any("filtered scan set" in s["plan"] for s in plan)
    # non-select explain
    plan = eng.execute("EXPLAIN DELETE FROM items WHERE id = 1")
    assert plan == [{"plan": "delete"}]
