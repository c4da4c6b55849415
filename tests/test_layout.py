"""Z-order layout: Morton key correctness and the bounding-box
property that makes multi-dimensional pruning work."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hippollm_spark.operators.layout import write_zordered, zorder_key


def _py_morton(a: int, b: int, bits: int = 21) -> int:
    k = 0
    for i in range(bits):
        k |= ((a >> i) & 1) << (2 * i)
        k |= ((b >> i) & 1) << (2 * i + 1)
    return k


def test_zorder_key_matches_pure_python(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 1), (2**20, 2**20 - 1)]
    df = spark.createDataFrame(rows, ["a", "b"]).withColumn(
        "z", zorder_key("a", "b")
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    assert got == {(a, b): _py_morton(a, b) for a, b in rows}


def _file_spans(path: str, col_a: str, col_b: str):
    """Per-file (span_a, span_b) from parquet footer statistics."""
    import glob

    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins_a, maxs_a, mins_b, maxs_b = [], [], [], []
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            sa = md.row_group(rg).column(idx[col_a]).statistics
            sb = md.row_group(rg).column(idx[col_b]).statistics
            mins_a.append(sa.min)
            maxs_a.append(sa.max)
            mins_b.append(sb.min)
            maxs_b.append(sb.max)
        spans.append(
            (max(maxs_a) - min(mins_a), max(maxs_b) - min(mins_b))
        )
    return spans


def test_zorder_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Sorted-by-A layout leaves B unbounded per file; Z-ordered
    layout bounds BOTH dimensions — the statistic parquet pruning
    actually uses."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    lo_a, hi_a = 0, li.agg(F.max("l_partkey")).first()[0]
    lo_b, hi_b = 0, li.agg(F.max("l_suppkey")).first()[0]

    p_sorted = str(tmp_path / "sorted_a")
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(p_sorted)
    )
    p_z = str(tmp_path / "zorder")
    write_zordered(li, p_z, "l_partkey", "l_suppkey", n_files=8)

    spans_sorted = _file_spans(p_sorted, "l_partkey", "l_suppkey")
    spans_z = _file_spans(p_z, "l_partkey", "l_suppkey")
    assert len(spans_sorted) > 1 and len(spans_z) > 1

    # same total rows round-tripped
    assert (
        spark.read.parquet(p_z).count()
        == spark.read.parquet(p_sorted).count()
        == li.count()
    )

    def avg(xs):
        return sum(xs) / len(xs)

    frac_b_sorted = avg([sb / max(hi_b - lo_b, 1) for _, sb in spans_sorted])
    frac_b_z = avg([sb / max(hi_b - lo_b, 1) for _, sb in spans_z])
    frac_a_z = avg([sa / max(hi_a - lo_a, 1) for sa, _ in spans_z])
    # single-column sort: every file spans ~the full suppkey range
    assert frac_b_sorted > 0.9
    # z-order: both dimensions bounded well below the full range
    assert frac_b_z < 0.6
    assert frac_a_z < 0.6


def test_compact_table_merges_small_files(spark, tmp_path):
    from hippollm_spark.operators.layout import compact_table, table_file_stats

    path = str(tmp_path / "frag")
    df = spark.range(20_000).selectExpr("id", "id % 97 AS k")
    df.repartition(40).write.parquet(path)
    assert table_file_stats(spark, path)["n_files"] == 40
    stats = compact_table(spark, path, target_file_bytes=10**9)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1
    back = spark.read.parquet(path)
    assert back.count() == 20_000
    assert back.selectExpr("sum(id)").first()[0] == sum(range(20_000))


def test_compact_table_sorted_restores_clustering(spark, tmp_path):
    import pyarrow.parquet as pq

    from hippollm_spark.operators.layout import compact_table

    path = str(tmp_path / "frag2")
    spark.range(50_000).selectExpr("id").repartition(16).write.parquet(path)
    stats = compact_table(spark, path, target_file_bytes=120_000, sort_col="id")
    assert 1 < stats["files_after"] < 16
    # each output file covers a disjoint id range (range clustering)
    import glob

    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.read_metadata(f)
        mins = [md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)]
        maxs = [md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)]
        spans.append((min(mins), max(maxs)))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_write_partitioned_file_counts_and_pruning(spark, sf_dir, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from hippollm_spark.operators.layout import write_partitioned

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"], sort_within="n_chars")
    # exactly one file per lang partition
    for d in glob.glob(f"{path}/lang=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d
    # partition pruning visible in the scan
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert back.count() == docs.filter(F.col("lang") == "en").count()


def test_write_partitioned_dynamic_overwrite(spark, tmp_path):
    from pyspark.sql import functions as F

    from hippollm_spark.operators.layout import write_partitioned

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a", 1), ("b", 2)], "part string, v int"
    )
    write_partitioned(base, path, ["part"])
    # overwrite ONLY partition b with new data
    patch = spark.createDataFrame([("b", 99)], "part string, v int")
    write_partitioned(patch, path, ["part"], overwrite_partitions=True)
    out = {r["part"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert out == {"a": 1, "b": 99}  # a untouched, b replaced


def test_write_training_shards_deterministic_stream(spark, sf_dir, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from hippollm_spark.pipelines.curate import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    s1 = write_training_shards(docs, p1, shards_per_lang=2, salt="e0")
    s2 = write_training_shards(docs.repartition(9), p2, shards_per_lang=2, salt="e0")
    assert s1 == s2 and len(s1) > 0  # summary identical under repartition

    # identical packed stream: same (doc order, offsets) per lang
    a = spark.read.parquet(p1).orderBy("lang", "shuffle_key").select(
        "lang", "doc_id", "start_offset", "chunk_id"
    ).collect()
    b = spark.read.parquet(p2).orderBy("lang", "shuffle_key").select(
        "lang", "doc_id", "start_offset", "chunk_id"
    ).collect()
    assert a == b

    # re-salting permutes the order
    p3 = str(tmp_path / "s3")
    write_training_shards(docs, p3, shards_per_lang=2, salt="e1")
    c = spark.read.parquet(p3).orderBy("lang", "shuffle_key").select("doc_id").collect()
    assert [r["doc_id"] for r in c] != [r["doc_id"] for r in a]

    # file-count control: <= 2 files per lang partition
    for d in glob.glob(f"{p1}/lang=*"):
        assert len(glob.glob(f"{d}/*.parquet")) <= 2


# ---- bucketed co-located fact joins (round 9) ----

from hippollm_spark.operators import layout  # noqa: E402

SF_COLOC = "/root/testdata/sf0.001"


def _executed(df) -> str:
    df.write.mode("overwrite").format("noop").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_is_exchange_free_and_value_equal(spark):
    li = spark.read.parquet(f"{SF_COLOC}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF_COLOC}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    layout.save_colocated(li, "t_layout_li", "l_orderkey", n_buckets=8)
    layout.save_colocated(orders, "t_layout_ord", "o_orderkey", n_buckets=8)

    j = layout.colocated_join(
        spark, "t_layout_li", "t_layout_ord", "l_orderkey", "o_orderkey"
    )
    agg = j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("l_extendedprice") * 1000000.0 + 0.5)).alias("s_e6"),
    )
    plan = _executed(agg)
    # the join inputs are bucketed scans: no SHUFFLE exchange anywhere
    # below the aggregation (a BroadcastExchange of the tiny side is
    # allowed — it is not a data shuffle)
    join_part = plan.split("HashAggregate")[-1]
    assert "Exchange hashpartitioning" not in join_part, join_part[:2000]
    assert "Bucketed: true" in join_part

    # and with broadcast off (the 100-TB case: both sides too big),
    # the sort-merge join runs on the bucketed scans with ZERO
    # exchange of any kind below the aggregate
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j2 = layout.colocated_join(
            spark, "t_layout_li", "t_layout_ord", "l_orderkey", "o_orderkey"
        ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        p2 = _executed(j2)
        smj = p2.split("HashAggregate")[-1]
        assert "SortMergeJoin" in p2
        assert "Exchange" not in smj, smj[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    # value parity vs the plain shuffling join
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("l_extendedprice") * 1000000.0 + 0.5)).alias(
                "s_e6"
            ),
        )
    )
    got = {r["o_orderpriority"]: (r["n"], r["s_e6"]) for r in agg.collect()}
    want = {r["o_orderpriority"]: (r["n"], r["s_e6"]) for r in plain.collect()}
    assert got == want


def test_colocated_join_requires_table_read(spark):
    """Reading the same files as plain parquet loses the bucket spec —
    the join must then shuffle (documents why read_colocated exists)."""
    li = spark.table("t_layout_li")
    warehouse_dir = spark.conf.get("spark.sql.warehouse.dir")
    raw = spark.read.parquet(
        warehouse_dir.replace("file:", "") + "/t_layout_li"
    )
    orders = spark.table("t_layout_ord")
    j = raw.join(orders, raw.l_orderkey == orders.o_orderkey).groupBy().count()
    plan = _executed(j)
    assert plan.count("Exchange") >= 1
    assert li.count() == raw.count()


def test_bucketed_groupby_on_bucket_key_is_exchange_free(spark):
    """The round-10 q18 shape: a groupBy on the bucket key aggregates
    bucket-locally — the bucketed scan's hash distribution already
    satisfies the aggregation's clustering, so there is NO Exchange
    between the scan and the (partial+final) HashAggregates, and the
    subsequent join to the other co-located table is bucket-aligned.
    With broadcast disabled (the 100-TB posture) the whole
    scan→agg→filter→join pipeline plans with zero shuffle."""
    from hippollm_spark.operators import layout

    li = spark.read.parquet(f"{SF_COLOC}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_COLOC}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    layout.save_colocated(li, "t_layout_li18", "l_orderkey", n_buckets=8)
    layout.save_colocated(orders, "t_layout_ord18", "o_orderkey", n_buckets=8)

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = (
            spark.table("t_layout_li18")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sq"))
            .filter(F.col("sq") > 100)
        )
        j = spark.table("t_layout_ord18").join(
            big, F.col("o_orderkey") == big.l_orderkey
        )
        plan = _executed(j)
        assert "Exchange" not in plan, plan[:3000]
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    # value parity vs the plain (shuffling) plan
    plain = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 100)
    )
    pj = orders.join(plain, F.col("o_orderkey") == plain.l_orderkey)
    got = sorted(tuple(r) for r in j.collect())
    want = sorted(tuple(r) for r in pj.collect())
    assert got == want and len(got) > 0
