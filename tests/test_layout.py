"""Bucketed co-located fact joins (operators/layout.py): the join on
the bucket key must plan WITHOUT a shuffle on either side, and its
values must equal the plain (shuffling) join's."""

from __future__ import annotations

from pyspark.sql import functions as F

from hippollm_spark.operators import layout

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    df.write.mode("overwrite").format("noop").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_is_exchange_free_and_value_equal(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
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
