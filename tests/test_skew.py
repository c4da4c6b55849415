"""Salted aggregation/join produce identical results to their plain
counterparts on a deliberately skewed dataset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hippollm_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one key
    hot = spark.range(9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    return hot.union(cold).repartition(8).cache()


def test_salted_aggregate_matches_plain(skewed):
    plain = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("*").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in skew.salted_aggregate(
            skewed,
            "k",
            {"s": ("v", "sum"), "n": ("*", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
            n_salts=16,
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][1:] == salted[k][1:]
        assert abs(plain[k][0] - salted[k][0]) < 1e-6


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"c{i}", f"dim{i}") for i in range(50)],
        "k string, label string",
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = skew.salted_join(skewed, dim, "k", n_salts=8).groupBy("k", "label").count()
    p = {(r["k"], r["label"]): r["count"] for r in plain.collect()}
    s = {(r["k"], r["label"]): r["count"] for r in salted.collect()}
    assert p == s


def test_top_frequencies_finds_hot_key(skewed):
    top = skew.top_frequencies(skewed, "k", n=3, fraction=0.2)
    assert top[0][0] == "HOT"
