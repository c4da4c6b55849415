"""Containment pairs, linear attribution, and kNN label propagation."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np

from pyspark.sql import functions as F

from hippollm_spark.operators.behavior import linear_attribution
from hippollm_spark.operators.dedup import containment_pairs
from hippollm_spark.operators.similarity import knn_classify


def test_containment_catches_quote_jaccard_misses(spark):
    short = "alpha beta gamma delta epsilon zeta"
    longd = ("intro words before the quote " + short +
             " and then a very long tail " + " ".join(f"w{i}" for i in range(50)))
    docs = spark.createDataFrame(
        [(1, short), (2, longd), (3, "completely different content here entirely")],
        "doc_id long, text string",
    )
    out = containment_pairs(docs, threshold=0.8, n=3).collect()
    pairs = {(r["doc_inner"], r["doc_outer"]): r["containment"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # short fully inside long
    assert (2, 1) not in pairs  # asymmetric: long not contained in short
    assert all(inner != 3 and outer != 3 for inner, outer in pairs)

    # and symmetric Jaccard would have missed it at any useful threshold
    from hippollm_spark.operators.dedup import jaccard_dup_pairs

    assert jaccard_dup_pairs(docs, threshold=0.5, n=3).count() == 0


def test_containment_digest_join_matches_string_join(spark):
    """Pin the digest-collision assumption (round-6 advice): the
    production path equi-joins on a 60-bit md5 digest of each shingle;
    a collision between two distinct shingles shared by a pair would
    inflate `inter` identically on both engines, so the DuckDB oracle
    structurally cannot catch it. This parity test CAN: it recomputes
    containment joining on the raw shingle STRING over the real test
    corpus (sf0.001 documents, 500 rows) and asserts the full outputs
    are identical."""
    import os

    from hippollm_spark.operators.dedup import with_shingles

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    fast = containment_pairs(docs, threshold=0.5, n=3)

    # string-join replica: identical logic, raw `s` as the join key
    sh = with_shingles(docs, 3)
    ex = sh.select(
        "doc_id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("s")
    )
    a = ex.select(F.col("doc_id").alias("doc_inner"), F.col("n_sh").alias("n_inner"), "s")
    b = ex.select(F.col("doc_id").alias("doc_outer"), F.col("n_sh").alias("n_outer"), "s")
    slow = (
        a.join(b, on="s")
        .filter(F.col("doc_inner") != F.col("doc_outer"))
        .groupBy("doc_inner", "doc_outer", "n_inner")
        .agg(F.count("*").alias("inter"))
        .withColumn("containment", F.round(F.col("inter") / F.col("n_inner"), 6))
        .filter((F.col("containment") >= 0.5) & (F.col("n_inner") > 0))
        .select("doc_inner", "doc_outer", "n_inner", "inter", "containment")
    )
    got = sorted(map(tuple, fast.collect()))
    want = sorted(map(tuple, slow.collect()))
    assert got == want and len(got) > 0


def test_linear_attribution_hand_computed(spark):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view+click within window, conversion 100 -> 50/50
        (1, 1, t0 - timedelta(minutes=10), "view", 0.0),
        (2, 1, t0 - timedelta(minutes=5), "click", 0.0),
        (3, 1, t0, "purchase", 100.0),
        # user 2: only a view, conversion 30 -> view gets 30
        (4, 2, t0 - timedelta(minutes=3), "view", 0.0),
        (5, 2, t0, "purchase", 30.0),
        # user 3: touch OUTSIDE the 60-min window -> no credit
        (6, 3, t0 - timedelta(minutes=90), "view", 0.0),
        (7, 3, t0, "purchase", 999.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {r["channel"]: r for r in linear_attribution(df).collect()}
    assert out["view"]["credit"] == 80.0  # 50 + 30
    assert out["click"]["credit"] == 50.0
    assert out["view"]["n_conversions"] == 2
    assert "999" not in str(out)  # expired touch earned nothing


def test_knn_classify_majority_and_tiebreak(spark):
    # two clusters around +1 and -1 on axis 0
    labeled_rows = []
    for i in range(10):
        labeled_rows.append((i, [1.0, 0.1 * i], "pos"))
        labeled_rows.append((100 + i, [-1.0, 0.1 * i], "neg"))
    labeled = spark.createDataFrame(
        labeled_rows, "vec_id long, embedding array<double>, label string"
    )
    queries = spark.createDataFrame(
        [(0, [0.9, 0.2]), (1, [-0.8, 0.1])],
        "query_id long, query_vec array<double>",
    )
    out = {r["query_id"]: r for r in knn_classify(labeled, queries, k=5).collect()}
    assert out[0]["pred_label"] == "pos" and out[0]["votes"] == 5
    assert out[1]["pred_label"] == "neg"
    assert out[0]["n_neighbors"] == 5

    # exact 2-2 tie -> smallest label wins ("a" < "b")
    lab2 = spark.createDataFrame(
        [(1, [1.0, 0.0], "b"), (2, [1.0, 0.01], "b"),
         (3, [1.0, -0.01], "a"), (4, [1.0, 0.02], "a")],
        "vec_id long, embedding array<double>, label string",
    )
    q2 = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, query_vec array<double>"
    )
    r = knn_classify(lab2, q2, k=4).first()
    assert r["pred_label"] == "a" and r["votes"] == 2
