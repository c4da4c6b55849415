"""hippollm_spark — a PySpark-native analytics engine with the capability
surface of adrian-valente/hippollm (hybrid graph + vector store for LLM
memory), rebuilt Spark-first for 100-TB scale.

Reference semantics are documented per-operator with ``file:line``
citations into the read-only reference snapshot. Architecture:

- ``schema``     — canonical StructTypes (entities / facts / edges / docs).
- ``session``    — tuned SparkSession builder (AQE, Arrow, UTC).
- ``store``      — the EntityStore equivalent: Parquet-backed DataFrames,
                   dense-id appends, JSON import/export of the reference
                   on-disk format.
- ``functions``  — JVM-side column expression libraries (vector distances,
                   text metrics) that stay inside whole-stage codegen.
- ``operators``  — the query surface: exact/approx kNN, graph ops,
                   relational ops, dedup family, text analysis.
- ``pipelines``  — the annotation write-path (LLM fact extraction) as
                   staged batch jobs over pluggable model backends.
- ``streaming``  — Structured Streaming wrappers for incremental ingest.
"""

__version__ = "0.1.0"
