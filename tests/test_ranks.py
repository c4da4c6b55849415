"""distributed_rank: windowless row_number parity, null groups, AQE
upstream shuffles, and plan shape."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hippollm_spark.operators.ranks import distributed_rank


def test_distributed_rank_matches_window_global(spark):
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("v")
    )
    got = {
        r["id"]: r["rk"]
        for r in distributed_rank(
            df, ["v", "id"], rank_col="rk", partitions=8
        ).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want


def test_distributed_rank_matches_window_grouped_with_nulls(spark):
    rows = [
        (i, ["a", "b", None][i % 3], float((i * 13) % 50)) for i in range(900)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {
        (r["g"], r["id"]): r["rk"]
        for r in distributed_rank(
            df, ["v", "id"], by="g", rank_col="rk", partitions=6
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r["g"], r["id"]): r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want


def test_distributed_rank_expression_order_col(spark):
    df = spark.range(0, 300).select(F.col("id"))
    key = F.md5(F.concat_ws("|", F.lit("s"), F.col("id").cast("string")))
    out = distributed_rank(df, [key, "id"], rank_col="rk", partitions=4)
    assert set(out.columns) == {"id", "rk"}
    w = Window.orderBy(
        F.md5(F.concat_ws("|", F.lit("s"), F.col("id").cast("string"))), "id"
    )
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    got = {r["id"]: r["rk"] for r in out.collect()}
    assert got == want


def test_distributed_rank_survives_aqe_upstream_shuffle(spark):
    """An upstream groupBy shuffle under AQE (runtime-coalesced
    partitions) must not corrupt offsets — the localCheckpoint pins one
    partitioning across the count job and the stamp job."""
    df = (
        spark.range(0, 4000)
        .select((F.col("id") % 777).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("c"))
    )
    out = distributed_rank(df, ["k"], rank_col="rk", partitions=5)
    rows = out.collect()
    ranks = sorted(r["rk"] for r in rows)
    assert ranks == list(range(1, 778))
    by_rank = sorted(rows, key=lambda r: r["rk"])
    assert [r["k"] for r in by_rank] == sorted(r["k"] for r in rows)


def test_distributed_rank_empty_input(spark):
    df = spark.createDataFrame([], "id long, v double")
    out = distributed_rank(df, ["v"], rank_col="rk")
    assert out.count() == 0


def test_distributed_rank_plan_has_no_unpartitioned_window(spark):
    df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 7).alias("v"))
    out = distributed_rank(df, ["v", "id"], rank_col="rk", partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only Window in the plan is partitioned by the physical pid
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid__" in line, line


def test_distributed_prefix_sum_matches_window(spark):
    from hippollm_spark.operators.ranks import distributed_prefix_sum

    df = spark.range(0, 3000).select(
        F.col("id"), ((F.col("id") * 31) % 97).alias("v")
    )
    got = {
        r["id"]: (r["rs"], r["pos"])
        for r in distributed_prefix_sum(
            df, "v", ["id"], sum_col="rs", rank_col="pos", partitions=7
        ).collect()
    }
    w = (
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    )
    w2 = Window.orderBy("id")
    want = {
        r["id"]: (r["rs"], r["pos"])
        for r in df.withColumn("rs", F.sum("v").over(w))
        .withColumn("pos", F.row_number().over(w2).cast("long"))
        .collect()
    }
    assert got == want


def test_distributed_prefix_sum_grouped_decimal(spark):
    from decimal import Decimal

    from hippollm_spark.operators.ranks import distributed_prefix_sum

    rows = [
        (i, ["a", "b"][i % 2], Decimal(f"{(i % 13) + 0.5:.6f}"))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v decimal(18,6)")
    got = {
        (r["g"], r["id"]): r["rs"]
        for r in distributed_prefix_sum(
            df, "v", ["id"], by="g", sum_col="rs", partitions=5
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        (r["g"], r["id"]): r["rs"]
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_distributed_prefix_sum_empty(spark):
    from hippollm_spark.operators.ranks import distributed_prefix_sum

    df = spark.createDataFrame([], "id long, v long")
    assert distributed_prefix_sum(df, "v", ["id"]).count() == 0


def test_distributed_prefix_sum_null_values_match_window(spark):
    """NULL values are skipped by a running sum but still occupy
    positions; parity must hold even when a whole range slice is
    NULL."""
    from hippollm_spark.operators.ranks import distributed_prefix_sum

    rows = [(i, None if (i < 40 or 200 <= i < 260) else float(i % 7))
            for i in range(600)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["id"]: r["rs"]
        for r in distributed_prefix_sum(
            df, "v", ["id"], sum_col="rs", partitions=6
        ).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["rs"]
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_distributed_rank_with_total(spark):
    # r12: with_total returns the exact global row count from the
    # per-partition counts the operator already collects — no second job
    df = spark.createDataFrame([(i,) for i in range(137)], "id long")
    out, total = distributed_rank(df, ["id"], rank_col="rk", with_total=True)
    assert total == 137
    assert out.count() == 137
    empty = spark.createDataFrame([], "id long")
    out_e, total_e = distributed_rank(
        empty, ["id"], rank_col="rk", with_total=True
    )
    assert total_e == 0 and out_e.count() == 0
