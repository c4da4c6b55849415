"""Semantic splitter (T4) invariants and the serving-layer graph JSON
(G4/fact mode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hippollm_spark.fixtures import DIM, paris_store
from hippollm_spark.functions.text import split_semantic
from hippollm_spark.serving import entity_graph, fact_graph
from hippollm_spark.store import HippoStore
from hippollm_spark.testing import hash_embedding


TEXT = (
    "Spark processes data. Catalyst optimizes plans. Tungsten emits code. "
    "Cats chase mice. Dogs chase cats. Birds fly away."
)


def test_split_semantic_invariants(spark):
    docs = spark.createDataFrame(
        [(0, TEXT), (1, "One sentence only."), (2, "")],
        "doc_id long, content string",
    )
    chunks = split_semantic(docs, lambda s: hash_embedding(s, 16), 60.0)
    rows = chunks.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # reference splitter invariants: coverage, ordering, reconstruction
    for did, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        assert rs[0]["pos_start"] == 0
        text = TEXT if did == 0 else "One sentence only."
        assert rs[-1]["pos_end"] == len(text)
        assert "".join(r["text"] for r in rs) == text
        for a, b in zip(rs, rs[1:]):
            assert a["pos_end"] == b["pos_start"]
    assert 2 not in by_doc          # empty doc → no chunks
    assert len(by_doc[0]) >= 2      # breakpoints found
    assert len(by_doc[1]) == 1


def test_split_semantic_deterministic(spark):
    docs = spark.createDataFrame([(0, TEXT)], "doc_id long, content string")
    one = split_semantic(docs, lambda s: hash_embedding(s, 16)).collect()
    two = split_semantic(docs, lambda s: hash_embedding(s, 16)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))


def _store(spark):
    t = paris_store(spark)
    return HippoStore(spark, entities=t["entities"], facts=t["facts"], dim=DIM)


def test_fact_graph_json(spark):
    store = _store(spark)
    q = hash_embedding("Paris is the capital of France", DIM)
    out = fact_graph(store, q, k=1)
    ids = {n["id"] for n in out["nodes"]}
    assert ids == {"Paris", "France"}
    assert out["links"] == [
        {"source": "France", "target": "Paris", "value": 1, "facts": [0]}
    ]


def test_entity_graph_json(spark):
    store = _store(spark)
    q = hash_embedding("Paris (Capital of France)", DIM)
    out = entity_graph(store, [q], k=2, max_depth=1, max_relations=5)
    ids = {n["id"] for n in out["nodes"]}
    # seeds include Paris; exploring reaches France via fact 0
    assert "Paris" in ids and "France" in ids
    pairs = {(l["source"], l["target"]) for l in out["links"]}
    assert ("Paris", "France") in pairs or ("France", "Paris") in pairs
    # no duplicate undirected links
    norm = [tuple(sorted(p)) for p in pairs]
    assert len(norm) == len(set(norm))


def test_search_graph_dispatch_and_validation(spark):
    from hippollm_spark.serving import search_graph

    store = _store(spark)
    embed = lambda s: hash_embedding(s, DIM)  # noqa: E731
    ent = search_graph(store, embed, "Paris; France", "entity", k=1)
    assert {n["id"] for n in ent["nodes"]}  # seeds resolved
    fct = search_graph(store, embed, "Paris", "fact", k=2)
    assert set(fct) == {"nodes", "links"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        search_graph(store, embed, "x", "neither")


def test_flask_route_returns_graph_json(spark):
    """G5: the reference's GET /search/<k>/<n>/<p>/<type>/<query>
    (hippoview app.py:170-186) served over the Spark store."""
    import json

    import pytest as _pytest

    flask = _pytest.importorskip("flask")  # noqa: F841
    from hippollm_spark.serving import create_app

    store = _store(spark)
    app = create_app(store, lambda s: hash_embedding(s, DIM))
    client = app.test_client()
    resp = client.get("/search/1/2/15/entity/Paris")
    assert resp.status_code == 200
    payload = json.loads(resp.data)
    assert set(payload) == {"nodes", "links"}
    assert all({"id", "group"} <= set(n) for n in payload["nodes"])

    resp2 = client.get("/search/2/2/15/fact/Paris;France")
    assert resp2.status_code == 200
    payload2 = json.loads(resp2.data)
    assert set(payload2) == {"nodes", "links"}
