"""Canonical schemas for the engine's tables.

Spark mapping of the reference data model (reference storage.py:18-71):

- ``Entity(name, description, facts)``  → ``entities`` table; the
  ``facts`` adjacency list is *derived* state, normalized into ``edges``.
- ``Fact(text, entities, sources, confidence, id)`` → ``facts`` table
  with dense contiguous BIGINT ids (reference storage.py:238 uses
  list-position ids).
- ``Source(name, description, url, date, position)`` → nested struct
  array on facts (reference storage.py:31-59).
- Chroma vector collections → ``embedding ARRAY<FLOAT>`` columns
  co-located on entities/facts (single source of truth instead of the
  reference's dual store — storage.py:124-133).
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBEDDING_DIM = 384  # all-MiniLM-L6-v2 (reference storage.py:117-122)

SOURCE_TYPE = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("date", T.TimestampType()),
        T.StructField("pos_start", T.IntegerType()),
        T.StructField("pos_end", T.IntegerType()),
    ]
)

ENTITIES_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), nullable=False),
        T.StructField("description", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

FACTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("text", T.StringType(), nullable=False),
        T.StructField("entities", T.ArrayType(T.StringType())),
        T.StructField("sources", T.ArrayType(SOURCE_TYPE)),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

# Derived adjacency: facts.select(id, explode(entities)).
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("fact_id", T.LongType(), nullable=False),
        T.StructField("entity", T.StringType(), nullable=False),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("date", T.TimestampType()),
    ]
)

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("chunk_idx", T.IntegerType(), nullable=False),
        T.StructField("text", T.StringType(), nullable=False),
        T.StructField("pos_start", T.IntegerType(), nullable=False),
        T.StructField("pos_end", T.IntegerType(), nullable=False),
    ]
)
