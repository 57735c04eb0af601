"""Payload filtering (index/filter.py vs ruvector-filter expression.rs)."""

import numpy as np
import pytest

from ruvector_tpu.index.filter import (
    FilterExpression as F,
    PayloadIndex,
    matches,
    parse_qdrant_filter,
)
from ruvector_tpu.index.vector_db import DbOptions, VectorDB


def test_comparison_and_logic_ops():
    p = {"age": 30, "name": "Alice", "tags": ["a", "b"], "score": 0.5}
    assert matches(p, F.eq("age", 30))
    assert not matches(p, F.eq("age", 31))
    assert matches(p, F.ne("name", "Bob"))
    assert matches(p, F.gt("age", 29)) and not matches(p, F.gt("age", 30))
    assert matches(p, F.gte("age", 30)) and matches(p, F.lte("age", 30))
    assert matches(p, F.range("score", gte=0.0, lt=1.0))
    assert not matches(p, F.range("score", gt=0.5))
    assert matches(p, F.in_values("tags", ["b", "z"]))     # list any-match
    assert matches(p, F.in_values("name", ["Alice", "Bob"]))
    assert matches(p, F.match_text("name", "lic"))
    assert matches(p, F.and_([F.eq("age", 30), F.exists("name")]))
    assert matches(p, F.or_([F.eq("age", 99), F.eq("name", "Alice")]))
    assert matches(p, F.not_(F.eq("age", 99)))
    assert matches(p, F.is_null("missing"))
    assert not matches(p, F.is_null("age"))
    # type-mismatched comparisons are False, not errors
    assert not matches(p, F.gt("name", 5))
    assert not matches(None, F.eq("x", 1))


def test_geo_filters():
    sf = {"loc": {"lat": 37.7749, "lon": -122.4194}}
    nyc = {"loc": {"lat": 40.7128, "lon": -74.0060}}
    near_sf = F.geo_radius("loc", 37.77, -122.42, 5_000)
    assert matches(sf, near_sf) and not matches(nyc, near_sf)
    bbox = F.geo_bounding_box("loc", (41.0, -75.0), (40.0, -73.0))
    assert matches(nyc, bbox) and not matches(sf, bbox)


def test_parse_qdrant_filter():
    f = parse_qdrant_filter({
        "must": [{"key": "city", "match": {"value": "sf"}},
                 {"key": "age", "range": {"gte": 18, "lt": 65}}],
        "must_not": [{"key": "banned", "match": {"value": True}}],
    })
    assert matches({"city": "sf", "age": 30}, f)
    assert not matches({"city": "sf", "age": 70}, f)
    assert not matches({"city": "sf", "age": 30, "banned": True}, f)
    f2 = parse_qdrant_filter(
        {"should": [{"key": "t", "match": {"any": ["x", "y"]}},
                    {"key": "v", "match": {"text": "ell"}}]})
    assert matches({"t": "x"}, f2) and matches({"v": "hello"}, f2)
    assert not matches({"t": "z", "v": "nope"}, f2)
    with pytest.raises(ValueError):
        parse_qdrant_filter({})


def test_payload_index_candidates():
    idx = PayloadIndex()
    for i in range(100):
        idx.add(i, {"parity": "even" if i % 2 == 0 else "odd", "v": i})
    assert idx.ids_eq("parity", "even") == set(range(0, 100, 2))
    assert idx.ids_in("parity", ["odd"]) == set(range(1, 100, 2))
    assert idx.ids_range("v", gte=10, lt=13) == {10, 11, 12}
    assert idx.ids_range("v", gt=97) == {98, 99}
    assert idx.ids_range("missing", gte=0) == set()


def test_vector_db_filtered_search():
    rng = np.random.default_rng(0)
    db = VectorDB(DbOptions(dimensions=8, index_type="flat"))
    for i in range(200):
        db.insert(rng.normal(size=8).astype(np.float32), id=i,
                  payload={"group": i % 4, "score": float(i)})
    q = rng.normal(size=8).astype(np.float32)
    res = db.search(q, k=5, filter={"must": [
        {"key": "group", "match": {"value": 2}}]})
    assert len(res) == 5
    assert all(r.payload["group"] == 2 for r in res)
    # filtered results are the best-scoring group-2 points
    allres = db.search(q, k=200)
    best2 = [r.id for r in allres if r.payload["group"] == 2][:5]
    assert [r.id for r in res] == best2
    # impossible filter -> empty
    assert db.search(q, k=5, filter={"must": [
        {"key": "group", "match": {"value": 99}}]}) == []


def test_http_search_with_filter():
    import json
    import urllib.request

    from ruvector_tpu.serve.server import RuvectorServer

    server = RuvectorServer(port=0).start()
    base = f"http://127.0.0.1:{server.port}"

    def req(method, path, payload=None):
        data = json.dumps(payload).encode() if payload is not None else None
        r = urllib.request.Request(base + path, data=data, method=method)
        with urllib.request.urlopen(r, timeout=10) as resp:
            return json.loads(resp.read())

    try:
        req("PUT", "/collections/f",
            {"vectors": {"size": 4, "distance": "Cosine"}})
        req("PUT", "/collections/f/points", {"points": [
            {"id": 1, "vector": [1, 0, 0, 0], "payload": {"color": "red"}},
            {"id": 2, "vector": [0.99, 0.1, 0, 0],
             "payload": {"color": "blue"}},
            {"id": 3, "vector": [0.98, 0.15, 0, 0],
             "payload": {"color": "red"}}]})
        res = req("POST", "/collections/f/points/search",
                  {"vector": [1, 0, 0, 0], "limit": 2,
                   "filter": {"must": [
                       {"key": "color", "match": {"value": "red"}}]}})
        ids = [r["id"] for r in res["result"]]
        assert ids == [1, 3]
    finally:
        server.stop()


def test_candidate_ids_soundness():
    from ruvector_tpu.index.filter import candidate_ids

    idx = PayloadIndex()
    for i in range(50):
        idx.add(i, {"g": i % 5, "v": i, "name": f"n{i}"})
    # and: intersection of bounded children
    f = F.and_([F.eq("g", 2), F.range("v", gte=10, lte=20)])
    assert candidate_ids(idx, f) == {12, 17}
    # or with unbounded branch -> None
    assert candidate_ids(idx, F.or_([F.eq("g", 1),
                                     F.match_text("name", "n4")])) is None
    # and with one unbounded child still bounded by the other
    f2 = F.and_([F.eq("g", 0), F.match_text("name", "n")])
    assert candidate_ids(idx, f2) == {0, 5, 10, 15, 20, 25, 30, 35, 40, 45}
    # comparisons map onto the numeric index
    assert candidate_ids(idx, F.gt("v", 47)) == {48, 49}
    # fully unbounded
    assert candidate_ids(idx, F.not_(F.eq("g", 1))) is None


def test_accelerated_path_matches_overfetch_path():
    """The index-accelerated candidate path must rank exactly like the
    over-fetch + post-filter path."""
    rng = np.random.default_rng(3)
    db = VectorDB(DbOptions(dimensions=8, index_type="flat"))
    for i in range(300):
        db.insert(rng.normal(size=8).astype(np.float32), id=i,
                  payload={"g": i % 10})
    q = rng.normal(size=8).astype(np.float32)
    # g==7: 30 candidates of 300 -> accelerated path fires
    fast = db.search(q, k=8, filter={"must": [
        {"key": "g", "match": {"value": 7}}]})
    # force the over-fetch path by passing an expression the index
    # can't bound (not(not(eq))) — logically identical filter
    from ruvector_tpu.index.filter import FilterExpression as FE
    slow = db.search(q, k=8, filter=FE.not_(FE.not_(FE.eq("g", 7))))
    assert [r.id for r in fast] == [r.id for r in slow]
    np.testing.assert_allclose([r.score for r in fast],
                               [r.score for r in slow], atol=1e-5)


def test_list_valued_payloads_indexed():
    """ADVICE r2: list-valued fields must be element-indexed (Qdrant array
    semantics) so the index-accelerated path never drops matching points."""
    idx = PayloadIndex()
    idx.add(1, {"tags": ["red", "blue"], "nums": [3, 7]})
    idx.add(2, {"tags": "red", "nums": 5})
    idx.add(3, {"tags": ["green"]})
    assert idx.ids_eq("tags", "red") == {1, 2}
    assert idx.ids_in("tags", ["blue", "green"]) == {1, 3}
    assert idx.ids_range("nums", gte=4, lte=7) == {1, 2}
    # matches() agrees: eq/in/range treat arrays as match-any
    assert matches({"tags": ["red", "blue"]}, F.eq("tags", "red"))
    assert not matches({"tags": ["red"]}, F.ne("tags", "red"))
    assert matches({"nums": [3, 7]}, F.range("nums", gte=6))
    assert matches({"nums": [3, 7]}, F.gt("nums", 5))
    assert not matches({"nums": [3, 7]}, F.gt("nums", 7))


def test_index_accelerated_search_with_array_payloads():
    from ruvector_tpu.index.filter import candidate_ids

    rng = np.random.default_rng(1)
    db = VectorDB(DbOptions(dimensions=8, index_type="flat"))
    for i in range(60):
        tags = ["even" if i % 2 == 0 else "odd"]
        if i % 3 == 0:
            tags.append("tri")
        db.insert(rng.normal(size=8).astype(np.float32), id=i,
                  payload={"tags": tags})
    q = rng.normal(size=8).astype(np.float32)
    res = db.search(q, k=10, filter={"must": [
        {"key": "tags", "match": {"any": ["tri"]}}]})
    assert {r.id for r in res} <= set(range(0, 60, 3))
    assert len(res) == 10
    # candidate set is exact for the 'in' filter over array fields
    f = F.in_values("tags", ["tri"])
    assert candidate_ids(db._payload_index, f) == set(range(0, 60, 3))
