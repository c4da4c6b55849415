"""Shared in-memory fixtures mirroring the reference's unit-test data
(reference tests/test_storage.py:15-21: Paris/London/France/UK entities,
two facts), with deterministic hash embeddings so any engine reproduces
identical vectors."""

from __future__ import annotations

from pyspark.sql import SparkSession

from hippollm_spark.operators.relational import edges_from_facts
from hippollm_spark.schema import ENTITIES_SCHEMA, FACTS_SCHEMA
from hippollm_spark.testing import hash_embedding

DIM = 16  # small dim keeps test plans readable; semantics are dim-agnostic

ENTITY_ROWS = [
    ("Paris", "Capital of France"),
    ("London", "Capital of the UK"),
    ("France", "Country in Europe"),
    ("UK", "Country in Europe"),
]

FACT_ROWS = [
    (0, "Paris is the capital of France", ["Paris", "France"]),
    (1, "London is the capital of the UK", ["London", "UK"]),
]


def paris_store(spark: SparkSession, dim: int = DIM):
    entities = spark.createDataFrame(
        [
            (n, d, [float(x) for x in hash_embedding(f"{n} ({d})", dim)])
            for n, d in ENTITY_ROWS
        ],
        ENTITIES_SCHEMA,
    )
    facts = spark.createDataFrame(
        [
            (i, t, es, [], 1.0, [float(x) for x in hash_embedding(t, dim)])
            for i, t, es in FACT_ROWS
        ],
        FACTS_SCHEMA,
    )
    edges = edges_from_facts(facts)
    return {"entities": entities, "facts": facts, "edges": edges}
