"""Distributed scatter-gather search, HTTP server routes, CLI."""

import json
import subprocess
import sys
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ruvector_tpu.ops.distance import pairwise_cosine
from ruvector_tpu.parallel import make_mesh
from ruvector_tpu.serve.distributed import make_distributed_search

requires_multi = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@requires_multi
def test_distributed_search_matches_single_device():
    rng = np.random.default_rng(0)
    n, d, k, b = 256, 16, 5, 4
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))

    mesh = make_mesh(8)
    search = make_distributed_search(mesh, n, k)
    ids, scores = search(queries, feats)

    sims = np.asarray(pairwise_cosine(queries, feats))
    expect_ids = np.argsort(-sims, axis=1)[:, :k]
    for i in range(b):
        assert set(np.asarray(ids)[i].tolist()) == set(expect_ids[i].tolist())
        np.testing.assert_allclose(
            np.asarray(scores)[i], np.sort(sims[i])[::-1][:k], rtol=1e-5
        )


def test_http_server_roundtrip():
    from ruvector_tpu.serve.server import RuvectorServer

    server = RuvectorServer(port=0).start()
    base = f"http://127.0.0.1:{server.port}"

    def req(method, path, payload=None):
        data = json.dumps(payload).encode() if payload is not None else None
        r = urllib.request.Request(base + path, data=data, method=method,
                                   headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(r, timeout=10) as resp:
            return json.loads(resp.read())

    try:
        assert req("GET", "/health")["status"] == "healthy"
        req("PUT", "/collections/test",
            {"vectors": {"size": 4, "distance": "Cosine"}})
        cols = req("GET", "/collections")["result"]["collections"]
        assert cols[0]["name"] == "test"

        req("PUT", "/collections/test/points", {"points": [
            {"id": 1, "vector": [1, 0, 0, 0], "payload": {"tag": "a"}},
            {"id": 2, "vector": [0, 1, 0, 0]},
            {"id": 3, "vector": [0.9, 0.1, 0, 0]},
        ]})
        info = req("GET", "/collections/test")["result"]
        assert info["points_count"] == 3

        res = req("POST", "/collections/test/points/search",
                  {"vector": [1, 0, 0, 0], "limit": 2})["result"]
        assert res[0]["id"] == 1
        assert res[1]["id"] == 3
        assert res[0].get("payload") == {"tag": "a"}

        metrics = urllib.request.urlopen(base + "/metrics", timeout=10).read()
        assert b"search_latency_seconds" in metrics
    finally:
        server.stop()


def test_cli_create_insert_search(tmp_path):
    vecs = np.random.default_rng(1).normal(size=(20, 8)).astype(np.float32)
    np.save(tmp_path / "vecs.npy", vecs)
    col = str(tmp_path / "col")

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "ruvector_tpu", *args],
            capture_output=True, text=True, timeout=120, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr
        return r.stdout

    run("create", col, "--dim", "8")
    out = run("insert", col, "--vectors", str(tmp_path / "vecs.npy"))
    assert "inserted 20" in out
    q = json.dumps(vecs[5].tolist())
    res = json.loads(run("search", col, "--query", q, "-k", "3"))
    assert res["results"][0]["id"] == 5
    info = json.loads(run("info", col))
    assert info["points_count"] == 20


def test_http_server_concurrent_load():
    """Threaded server under mixed load: 4 writer + 8 reader threads
    hammer upserts and searches concurrently; every request must succeed
    and the final collection must hold every written point (weak spot
    flagged in round-1 review: no concurrency test touched the server)."""
    import threading

    from ruvector_tpu.serve.server import RuvectorServer

    server = RuvectorServer(port=0).start()
    base = f"http://127.0.0.1:{server.port}"

    def req(method, path, payload=None):
        data = json.dumps(payload).encode() if payload is not None else None
        r = urllib.request.Request(base + path, data=data, method=method,
                                   headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(r, timeout=30) as resp:
            return json.loads(resp.read())

    try:
        req("PUT", "/collections/load",
            {"vectors": {"size": 8, "distance": "Cosine"}})
        rng = np.random.default_rng(0)
        n_writers, per_writer, n_readers = 4, 25, 8
        errors = []

        def writer(w):
            try:
                for i in range(per_writer):
                    pid = w * per_writer + i
                    req("PUT", "/collections/load/points", {"points": [{
                        "id": pid,
                        "vector": rng.normal(size=8).tolist(),
                        "payload": {"w": w}}]})
            except Exception as e:          # pragma: no cover
                errors.append(e)

        def reader():
            try:
                for _ in range(20):
                    out = req("POST", "/collections/load/points/search",
                              {"vector": rng.normal(size=8).tolist(),
                               "limit": 5})
                    assert "result" in out
                    # /metrics is prometheus text, not JSON
                    with urllib.request.urlopen(
                            base + "/metrics", timeout=30) as resp:
                        assert b"search_latency_seconds" in resp.read()
            except Exception as e:          # pragma: no cover
                errors.append(e)

        threads = ([threading.Thread(target=writer, args=(w,))
                    for w in range(n_writers)]
                   + [threading.Thread(target=reader)
                      for _ in range(n_readers)])
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        info = req("GET", "/collections/load")["result"]
        assert info["points_count"] == n_writers * per_writer
        # searches after the storm return exact top-k
        res = req("POST", "/collections/load/points/search",
                  {"vector": rng.normal(size=8).tolist(), "limit": 5})
        assert len(res["result"]) == 5
    finally:
        server.stop()


def test_http_server_point_get_and_collection_delete():
    """Qdrant-surface depth: GET a point by id, DELETE a collection
    (ruvector-server routes/points.rs:59, collections.rs:48)."""
    from ruvector_tpu.serve.server import RuvectorServer

    server = RuvectorServer(port=0).start()
    base = f"http://127.0.0.1:{server.port}"

    def req(method, path, payload=None, expect_error=False):
        data = json.dumps(payload).encode() if payload is not None else None
        r = urllib.request.Request(base + path, data=data, method=method,
                                   headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(r, timeout=10) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read() or b"{}")

    try:
        req("PUT", "/collections/pts",
            {"vectors": {"size": 4, "distance": "Cosine"}})
        req("PUT", "/collections/pts/points", {"points": [
            {"id": 7, "vector": [1, 0, 0, 0], "payload": {"tag": "a"}},
            {"id": 9, "vector": [0, 1, 0, 0]}]})
        code, out = req("GET", "/collections/pts/points/7")
        assert code == 200
        assert out["result"]["vector"] == [1.0, 0.0, 0.0, 0.0]
        assert out["result"]["payload"] == {"tag": "a"}
        code, out = req("GET", "/collections/pts/points/9")
        assert code == 200 and "payload" not in out["result"]
        code, _ = req("GET", "/collections/pts/points/999")
        assert code == 404
        code, _ = req("DELETE", "/collections/pts")
        assert code == 200
        code, _ = req("GET", "/collections/pts")
        assert code == 404
        code, _ = req("DELETE", "/collections/pts")
        assert code == 404
    finally:
        server.stop()


def test_http_scroll_with_filter_and_pagination():
    """Qdrant scroll: paginated listing with payload filter."""
    from ruvector_tpu.serve.server import RuvectorServer

    server = RuvectorServer(port=0).start()
    base = f"http://127.0.0.1:{server.port}"

    def req(method, path, payload=None):
        data = json.dumps(payload).encode() if payload is not None else None
        r = urllib.request.Request(base + path, data=data, method=method)
        with urllib.request.urlopen(r, timeout=10) as resp:
            return json.loads(resp.read())

    try:
        req("PUT", "/collections/s",
            {"vectors": {"size": 4, "distance": "Cosine"}})
        req("PUT", "/collections/s/points", {"points": [
            {"id": i, "vector": [1, 0, 0, i * 0.01],
             "payload": {"even": i % 2 == 0}} for i in range(10)]})
        out = req("POST", "/collections/s/points/scroll",
                  {"limit": 3, "filter": {"must": [
                      {"key": "even", "match": {"value": True}}]}})
        pts = out["result"]["points"]
        assert [p["id"] for p in pts] == [0, 2, 4]
        nxt = out["result"]["next_page_offset"]
        assert nxt == 6
        out2 = req("POST", "/collections/s/points/scroll",
                   {"limit": 3, "offset": nxt, "filter": {"must": [
                       {"key": "even", "match": {"value": True}}]},
                    "with_vector": True})
        pts2 = out2["result"]["points"]
        assert [p["id"] for p in pts2] == [6, 8]
        assert out2["result"]["next_page_offset"] is None
        assert pts2[0]["vector"][0] == 1.0
    finally:
        server.stop()
