"""MCP server facade (ruvector-cli/src/main.rs:168-260 role) — drive the
stdio JSON-RPC protocol end to end, including the GNN program cache
(mcp/gnn_cache.rs:1-100 role)."""
import io
import json

import numpy as np

from ruvector_tpu.serve.mcp import GnnProgramCache, McpServer


def rpc(server, method, params=None, mid=1):
    resp = server.handle({"jsonrpc": "2.0", "id": mid, "method": method,
                          "params": params or {}})
    return resp


def call(server, tool, args):
    resp = rpc(server, "tools/call", {"name": tool, "arguments": args})
    assert "result" in resp, resp
    res = resp["result"]
    assert not res.get("isError"), res
    return json.loads(res["content"][0]["text"])


def test_mcp_lifecycle():
    s = McpServer()
    init = rpc(s, "initialize")
    assert init["result"]["serverInfo"]["name"] == "ruvector-tpu"
    tools = rpc(s, "tools/list")["result"]["tools"]
    assert {t["name"] for t in tools} >= {
        "create_collection", "insert", "search", "query", "train", "info"}

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(80, 16)).astype(np.float32)
    call(s, "create_collection", {"name": "c", "dimensions": 16})
    out = call(s, "insert", {"collection": "c", "vectors": vecs.tolist()})
    assert out["inserted"] == 80

    res = call(s, "search", {"collection": "c", "vector": vecs[3].tolist(),
                             "k": 5})
    assert res["results"][0]["id"] == 3

    q = call(s, "query", {"collection": "c", "vector": vecs[3].tolist(),
                          "mode": "neural_search", "k": 5, "gnn_depth": 0})
    assert len(q["nodes"]) == 5
    # second query hits the cached engine
    call(s, "query", {"collection": "c", "vector": vecs[4].tolist(),
                      "mode": "neural_search", "k": 5, "gnn_depth": 0})
    info = call(s, "info", {})
    assert info["gnn_cache"]["hits"] >= 1
    assert info["collections"]["c"]["vectors"] == 80

    t = call(s, "train", {"collection": "c", "steps": 2})
    assert "loss_last" in t
    info2 = call(s, "info", {})
    assert info2["collections"]["c"]["trained_gnn_layers"] == 1


def test_mcp_error_and_unknown():
    s = McpServer()
    resp = rpc(s, "tools/call", {"name": "search",
                                 "arguments": {"collection": "nope",
                                               "vector": [1.0]}})
    assert resp["result"]["isError"]
    resp2 = rpc(s, "no/such")
    assert resp2["error"]["code"] == -32601


def test_mcp_stdio_loop():
    s = McpServer()
    lines = [
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"}),
        json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}),
    ]
    out = io.StringIO()
    s.serve_stdio(stdin=iter(lines), stdout=out)
    replies = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(replies) == 2 and replies[1]["id"] == 2


def test_gnn_cache_lru_ttl():
    c = GnnProgramCache(capacity=2, ttl_s=1000)
    c.put(("a", 1), "A")
    c.put(("b", 1), "B")
    assert c.get(("a", 1)) == "A"
    c.put(("c", 1), "C")          # evicts LRU ("b")
    assert c.get(("b", 1)) is None
    assert c.get(("a", 1)) == "A" and c.get(("c", 1)) == "C"
    c2 = GnnProgramCache(capacity=2, ttl_s=-1)
    c2.put(("x", 0), "X")
    assert c2.get(("x", 0)) is None   # expired


def test_graph_mincut_tool():
    import json

    import numpy as np

    from ruvector_tpu.serve.mcp import McpServer

    srv = McpServer()

    def call(method, params=None, mid=1):
        return srv.handle({"jsonrpc": "2.0", "id": mid, "method": method,
                           "params": params or {}})

    call("initialize")
    call("tools/call", {"name": "create_collection",
                        "arguments": {"name": "c", "dimensions": 8,
                                      "index_type": "flat"}})
    rng = np.random.default_rng(0)
    vecs = np.concatenate([rng.normal(size=(20, 8)) + 4,
                           rng.normal(size=(20, 8)) - 4]).astype(np.float32)
    call("tools/call", {"name": "insert",
                        "arguments": {"collection": "c",
                                      "vectors": vecs.tolist()}})
    r = call("tools/call", {"name": "graph_mincut",
                            "arguments": {"collection": "c", "k": 6}})
    payload = json.loads(r["result"]["content"][0]["text"])
    # two far-apart blobs: the kNN graph splits cleanly
    assert payload["mode"] == "global"
    assert payload["value"] == 0.0
    assert {payload["side_a"], payload["side_b"]} == {20}
    # s-t variant across the blobs
    r2 = call("tools/call", {"name": "graph_mincut",
                             "arguments": {"collection": "c", "k": 6,
                                           "source": 0, "sink": 39}})
    p2 = json.loads(r2["result"]["content"][0]["text"])
    assert p2["mode"] == "s-t" and p2["value"] == 0.0


def test_sql_tool():
    import json

    from ruvector_tpu.serve.mcp import McpServer

    srv = McpServer()

    def call(method, params=None, mid=1):
        return srv.handle({"jsonrpc": "2.0", "id": mid, "method": method,
                           "params": params or {}})

    call("initialize")
    tools = call("tools/list")["result"]["tools"]
    assert any(t["name"] == "sql" for t in tools)
    call("tools/call", {"name": "sql", "arguments": {
        "sql": "CREATE TABLE t (id int, v ruvector(2))"}})
    call("tools/call", {"name": "sql", "arguments": {
        "sql": "INSERT INTO t VALUES (1,'[1,0]'), (2,'[0,1]')"}})
    r = call("tools/call", {"name": "sql", "arguments": {
        "sql": "SELECT id FROM t ORDER BY v <-> '[0,1]' LIMIT 1"}})
    payload = json.loads(r["result"]["content"][0]["text"])
    assert payload["result"] == [{"id": 2}]
    # SQL errors surface as tool isError, rpc stays up
    r = call("tools/call", {"name": "sql",
                            "arguments": {"sql": "SELECT * FROM missing"}})
    assert r["result"]["isError"] is True
