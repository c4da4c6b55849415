"""Physical-layout operators: bucketed co-located fact joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders,
events ⋈ sessions, …) is the shuffle of both sides onto the join key.
Spark's answer is table LAYOUT: persist both facts bucketed (and
sorted) by the key with the same bucket count, and every subsequent
equi-join on that key is exchange-free — each task reads bucket i of
both tables and merge-joins them in place. The shuffle is paid ONCE at
write time and amortized over every downstream query, which is exactly
how a curation pipeline reads its fact tables (many queries, one
layout).

This module is the fact-table counterpart of the engine's existing
bucketed INDEX tables (dedup band tables, BM25 postings, IVF-PQ code
lists — dedup.py:1536, ranking.py:215, similarity.py:1413): same
mechanism, applied to the relational core. The session pins
``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` so the
bucketed scan is always honored (session.py).

Reference scope note: the reference keeps all state in one process
(storage.py) and has no layout layer at all; this is the Spark-first
answer to the same "query the facts repeatedly" workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hippollm_spark.session import drop_table


def save_colocated(
    df: DataFrame,
    table: str,
    key: str,
    *,
    n_buckets: int = 32,
) -> None:
    """Persist ``df`` bucketed AND sorted by ``key`` into ``table``.

    Writing costs one shuffle-free repartition pass per bucket file
    set; the payoff is that any join between two tables saved with the
    same ``key``/``n_buckets`` plans with ZERO Exchange on either side
    (verified by plan assertion in tests/test_layout.py). Sorting
    within buckets additionally lets the sort-merge join skip its Sort
    nodes."""
    spark = df.sparkSession
    drop_table(spark, table)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_colocated(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact
    (``spark.table`` — a plain parquet read of the same files would
    lose the bucket spec and re-shuffle on join)."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Exchange-free equi-join of two co-located tables. The plan for
    tables saved via ``save_colocated`` with matching bucket counts
    contains no ShuffleExchange on either input (each task merge-joins
    bucket i of both tables in place)."""
    left = read_colocated(spark, left_table)
    right = read_colocated(spark, right_table)
    return left.join(right, left[left_key] == right[right_key], how)
