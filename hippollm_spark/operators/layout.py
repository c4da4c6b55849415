"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional scan pruning.

Parquet pruning is driven by per-row-group min/max statistics. A table
sorted by one column prunes filters on that column only — every row
group spans the full range of every OTHER column. Interleaving the
bits of two columns into one Morton key and range-sorting by it gives
every row group a tight bounding BOX over both columns, so range
predicates on either (or both) prune — the same trick Delta/Iceberg
expose as OPTIMIZE ZORDER BY, here as a plain column expression plus
`repartitionByRange` + `sortWithinPartitions` before write.

At 100 TB this is the difference between scanning one dimension's
matching stripes (and ALL of the other dimension) and scanning only
the intersecting boxes; it costs one range shuffle at write time and
nothing at read time.

The key is exact integer bit arithmetic — engine-portable (the DuckDB
twin computes identical keys with the same shifts), so it is
oracle-checkable like everything else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "write_zordered",
    "table_file_stats",
    "compact_table",
    "write_partitioned",
    "save_colocated",
    "read_colocated",
    "colocated_join",
]


def zorder_key(col_a, col_b, *, bits: int = 21) -> Column:
    """Morton interleave of two non-negative integer columns (values
    must fit in ``bits`` bits; 21+21 = 42 result bits stays well
    inside BIGINT). Even result bits come from ``col_a``, odd bits
    from ``col_b``. Pure JVM bitwise ops — whole-stage codegen, no
    UDF."""
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("long")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by the Morton key of (col_a, col_b):
    range-partition on the key (so files tile the Z-curve) and sort
    within partitions (so row groups inside each file tile it too).
    The key itself is not persisted — it is purely a layout device.

    Both columns are first min/max-normalized to the same ``bits``-bit
    bucket space (one tiny aggregate, broadcast back). This is NOT
    optional: interleaving raw values whose bit widths differ puts all
    of the curve's high bits in the wider column, which degenerates to
    a single-column sort — the narrow column ends up unbounded in
    every file (observed directly in the layout test before the
    normalization was added)."""
    lo_hi = df.agg(
        F.min(col_a).alias("_la"),
        F.max(col_a).alias("_ha"),
        F.min(col_b).alias("_lb"),
        F.max(col_b).alias("_hb"),
    )
    norm_a = F.expr(
        f"(({col_a} - _la) * {1 << bits}) div (_ha - _la + 1)"
    )
    norm_b = F.expr(
        f"(({col_b} - _lb) * {1 << bits}) div (_hb - _lb + 1)"
    )
    (
        df.crossJoin(F.broadcast(lo_hi))
        .withColumn("__z__", zorder_key(norm_a, norm_b, bits=bits))
        .repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__", "_la", "_ha", "_lb", "_hb")
        .write.mode("overwrite")
        .parquet(path)
    )


def table_file_stats(spark, path: str) -> dict:
    """(n_files, total_bytes) of a parquet table's data files, via the
    Hadoop FileSystem API (works on any supported scheme — local,
    HDFS, object stores — not just local paths)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            n += 1
            total += st.getLen()
    return {"n_files": n, "total_bytes": total}


def compact_table(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    zorder: tuple[str, str] | None = None,
    sort_col: str | None = None,
) -> dict:
    """Rewrite a fragmented parquet table into ~target-sized files.

    The small-files problem is THE silent killer of long-lived 100-TB
    tables: every streaming micro-batch / incremental append adds
    files, and scan parallelism + footer-read overhead degrade until a
    table of N GB costs like one of N TB. Compaction = read → one
    shuffle into ceil(bytes/target) range-partitions → atomic-ish
    swap (write temp, delete, rename — the discipline a table format
    automates; without one, run compaction in the table's single
    writer process, which is also what keeps appends safe here).

    ``sort_col`` re-sorts files by that column (restores range
    clustering destroyed by appends); ``zorder`` re-clusters by the
    Morton key of two columns (see write_zordered). Plain mode
    round-robins (pure size leveling).

    Returns {files_before, files_after, bytes}.
    """
    before = table_file_stats(spark, path)
    n_out = max(1, -(-before["total_bytes"] // target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    if zorder is not None:
        write_zordered(df, tmp, zorder[0], zorder[1], n_files=n_out)
    elif sort_col is not None:
        (
            df.repartitionByRange(n_out, sort_col)
            .sortWithinPartitions(sort_col)
            .write.mode("overwrite")
            .parquet(tmp)
        )
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = dst.getFileSystem(conf)
    fs.delete(dst, True)
    fs.rename(src, dst)
    after = table_file_stats(spark, path)
    return {
        "files_before": before["n_files"],
        "files_after": after["n_files"],
        "bytes": after["total_bytes"],
    }


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    files_per_partition: int = 1,
    max_records_per_file: int | None = None,
    sort_within: str | None = None,
    overwrite_partitions: bool = False,
) -> None:
    """Hive-partitioned parquet write with controlled file counts —
    the layout that makes partition pruning work AND avoids the
    small-files trap.

    A naive ``df.write.partitionBy(cols)`` emits one file per
    (task, partition-value) pair: with 1000 tasks × 365 days that is
    365k files. The fix baked in here: repartition on the partition
    columns first (plus a hash salt when ``files_per_partition`` > 1,
    for hot partitions that need parallel writers), so each output
    partition is produced by exactly that many tasks.

    - ``sort_within``: sorts rows inside each file by this column —
      parquet row-group min/max stats then prune within the partition
      (the poor man's clustering; see ``write_zordered`` for 2-D).
    - ``max_records_per_file``: hard cap via Spark's own option,
      protecting against a skewed partition producing one huge file.
    - ``overwrite_partitions``: dynamic partition overwrite — ONLY
      the partitions present in ``df`` are replaced (the late-data
      re-materialization mode `incremental_rollup` uses); default is
      error-if-exists to protect against accidental full truncation.
    """
    parts = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        out = df.repartition(*parts, salt)
    else:
        out = df.repartition(*parts)
    if sort_within is not None:
        out = out.sortWithinPartitions(*partition_cols, sort_within)
    writer = out.write.partitionBy(*partition_cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if overwrite_partitions:
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            writer.mode("overwrite").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        writer.parquet(path)


# --------------------------------------------------------------------------
# Bucketed co-located fact joins (round 9)
# --------------------------------------------------------------------------
# At 100 TB the dominant cost of a fact-fact join is the shuffle of
# both sides onto the join key. Persist both facts bucketed (and
# sorted) by the key with the same bucket count and every subsequent
# equi-join on that key is exchange-free -- each task merge-joins
# bucket i of both tables in place. The shuffle is paid ONCE at write
# and amortized over every downstream query. Fact-table counterpart of
# the engine's bucketed INDEX tables (dedup bands dedup.py:1536, BM25
# postings ranking.py:215, IVF-PQ code lists similarity.py:1413); the
# session pins bucketing.autoBucketedScan.enabled=false so the
# bucketed scan is always honored (session.py).

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
