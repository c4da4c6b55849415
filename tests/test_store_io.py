"""HippoStore persistence: parquet round-trip, reference-JSON import/
export round-trip, and (when available) loading the reference's shipped
example DB (examples/wikipedia_Paris)."""

from __future__ import annotations

import json
import os

import pytest

from hippollm_spark.store import HippoStore
from hippollm_spark.testing import hash_embedding_udf

REF_EXAMPLE = "/root/reference/examples/wikipedia_Paris"


def _mini_store(spark, tmp):
    """Build a store via the reference JSON format."""
    ents = {
        "Paris": {"name": "Paris", "description": "Capital of France", "facts": [0]},
        "France": {"name": "France", "description": "Country", "facts": [0]},
        "Mars": {"name": "Mars", "description": "Planet", "facts": []},
    }
    facts = [
        {
            "text": "Paris is the capital of France",
            "entities": ["Paris", "France"],
            "sources": [
                {
                    "name": "wiki",
                    "description": "d",
                    "url": "http://x",
                    "date": None,
                    "position": [0, 30],
                }
            ],
            "confidence": 1.0,
            "id": 0,
        }
    ]
    os.makedirs(tmp, exist_ok=True)
    with open(f"{tmp}/entities.json", "w") as f:
        json.dump(ents, f)
    with open(f"{tmp}/facts.json", "w") as f:
        json.dump(facts, f)
    return HippoStore.import_reference_json(
        spark, tmp, embed=hash_embedding_udf(16), dim=16
    )


def test_reference_json_roundtrip(spark, tmp_path):
    store = _mini_store(spark, str(tmp_path / "in"))
    assert store.entities.count() == 3
    assert store.facts.count() == 1
    assert store.edges.count() == 2
    # embeddings recomputed on import
    assert store.entities.filter("embedding IS NULL").count() == 0

    out = str(tmp_path / "out")
    store.export_reference_json(out)
    with open(f"{out}/entities.json") as f:
        ents = json.load(f)
    assert ents["Paris"]["facts"] == [0]
    assert ents["Mars"]["facts"] == []
    with open(f"{out}/facts.json") as f:
        facts = json.load(f)
    assert facts[0]["entities"] == ["Paris", "France"]
    assert facts[0]["sources"][0]["position"] == [0, 30]

    # re-import the export → identical relational content
    store2 = HippoStore.import_reference_json(spark, out)
    assert store2.facts.count() == 1 and store2.entities.count() == 3


def test_parquet_roundtrip(spark, tmp_path):
    store = _mini_store(spark, str(tmp_path / "in"))
    store.save(str(tmp_path / "pq"))
    loaded = HippoStore.load(spark, str(tmp_path / "pq"))
    assert loaded.entities.count() == 3
    assert {r["entity"] for r in loaded.edges.collect()} == {"Paris", "France"}
    rep = loaded.check_integrity()
    assert rep["ok"] == 1


def test_store_facade_queries(spark, tmp_path):
    from hippollm_spark.testing import hash_embedding

    store = _mini_store(spark, str(tmp_path / "in"))
    assert store.get_entity("Paris").count() == 1
    assert store.get_fact(0).first()["text"].startswith("Paris")
    q = hash_embedding("Paris is the capital of France", 16)
    top = store.get_closest_facts(q, k=1).first()
    assert top["id"] == 0
    store.prune_lone_entities()
    assert store.entities.count() == 2  # Mars dropped


@pytest.mark.skipif(
    not os.path.exists(f"{REF_EXAMPLE}/entities.json"),
    reason="reference example DB not present",
)
def test_load_reference_example_db(spark):
    """Parity check against the shipped example DB: 1,556 entities /
    1,173 facts (reference examples/wikipedia_Paris; SURVEY.md §6)."""
    store = HippoStore.import_reference_json(spark, REF_EXAMPLE)
    assert store.entities.count() == 1556
    assert store.facts.count() == 1173
    # every fact's entities resolve to the entity table (hyperedge FKs)
    dangling = store.edges.join(
        store.entities.select("name").withColumnRenamed("name", "entity"),
        on="entity",
        how="left_anti",
    )
    assert dangling.count() == 0
    # graph query end-to-end on real data
    nb = store.get_neighbours("Paris")
    assert nb.count() > 0


def test_sql_surface(spark, tmp_path):
    store = _mini_store(spark, str(tmp_path / "in"))
    out = store.sql(
        """
        SELECT e.entity, count(*) AS n
        FROM edges e JOIN facts f ON e.fact_id = f.id
        GROUP BY e.entity ORDER BY e.entity
        """
    ).collect()
    assert [(r["entity"], r["n"]) for r in out] == [("France", 1), ("Paris", 1)]
