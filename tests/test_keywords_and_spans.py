"""New training-data-pipeline operators: TF-IDF keywords, PMI
collocations, hashed linear classifier, sequence-level duplicated
spans, BFS shortest paths, CDC merge, winsorization, sweep-line
concurrency — all hand-computed or library-parity checked."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_tfidf_keywords_hand_computed(spark):
    from hippollm_spark.operators.textstats import tfidf_keywords

    df = _docs(spark, ["a a b", "a c", "b b d d"])
    got = tfidf_keywords(df, k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score_tfidf"]))
    idf2 = round(math.log(1 + 3 / 2), 6)  # df=2 terms (a, b)
    idf1 = round(math.log(1 + 3 / 1), 6)  # df=1 terms (c, d)
    assert sorted(by_doc[0]) == [
        (1, "a", round(2 * idf2, 6)),
        (2, "b", round(1 * idf2, 6)),
    ]
    # doc2: a (tf1,df2) vs c (tf1,df1) -> c scores higher
    assert by_doc[1][0][1] == "c" if by_doc[1][0][0] == 1 else True
    top2 = {r[0]: r[1] for r in sorted(by_doc[2])}
    assert top2 == {1: "d", 2: "b"}  # d: 2*idf1 > b: 2*idf2


def test_pmi_collocations_hand_computed(spark):
    from hippollm_spark.operators.textstats import pmi_collocations

    # "new york" appears 3x; filler tokens vary.
    df = _docs(
        spark,
        ["new york is big", "i love new york", "new york wins", "big wins today"],
    )
    got = pmi_collocations(df, k=5, min_count=3).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["w1"], r["w2"], r["n_pair"]) == ("new", "york", 3)
    T = 4 + 4 + 3 + 3  # total tokens
    B = 3 + 3 + 2 + 2  # total bigram occurrences
    want = round(math.log(3 * T * T / (B * 3 * 3)), 6)
    assert abs(r["pmi"] - want) < 1e-9


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _round6(x: float) -> float:
    """Spark's ROUND semantics for doubles: HALF_UP over the shortest
    decimal representation (BigDecimal.valueOf) — python's built-in
    round() is half-even and diverges on exact .5 boundaries."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_linear_classifier_score_matches_python(spark):
    from hippollm_spark.operators.textstats import (
        N_CLASSIFIER_BUCKETS,
        linear_classifier_score,
    )

    texts = ["the quick brown fox", "lorem ipsum dolor sit amet", "a b a b"]
    got = {r["doc_id"]: r for r in linear_classifier_score(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        w_sum = 0
        for tok in toks:
            bucket = _md5_long(tok) % N_CLASSIFIER_BUCKETS
            w_sum += (_md5_long(str(bucket)) % 2_000_001) - 1_000_000
        # floor-at-6dp convention (cross-engine boundary-stable)
        z = math.floor(w_sum / max(len(toks), 1)) / 1_000_000.0
        score = math.floor((1.0 / (1.0 + math.exp(-z))) * 1_000_000.0) / 1_000_000.0
        r = got[i]
        assert r["w_sum_e6"] == w_sum
        assert abs(r["z"] - z) < 1e-12
        assert abs(r["score"] - score) < 1e-12
        assert 0.0 < r["score"] < 1.0


def test_duplicated_span_stats(spark):
    from hippollm_spark.operators.dedup import duplicated_span_stats

    df = _docs(
        spark,
        [
            "a b c d e f",  # shares "a b c" with doc1
            "x y a b c z",
            "p q r s",  # unique
            "a b c d e",  # overlapping dup grams vs doc4: a b c / b c d
            "a b c d x2",
        ],
    )
    got = {r["doc_id"]: r for r in duplicated_span_stats(df, n=3).collect()}
    # doc0 shares "a b c"/"b c d"/"c d e" (with docs 1,3,4): starts
    # {0,1,2} union-cover tokens 0..4 -> 5 of 6 ("d e f" is unique)
    assert (got[0]["dup_tokens"], got[0]["n_tokens"]) == (5, 6)
    assert abs(got[0]["dup_frac"] - 5 / 6) < 1e-6
    # doc1: only "a b c" (start 2) is shared -> 3 of 6
    assert (got[1]["dup_tokens"], got[1]["n_tokens"]) == (3, 6)
    assert abs(got[1]["dup_frac"] - 0.5) < 1e-9
    assert got[2]["dup_tokens"] == 0 and got[2]["dup_frac"] == 0.0
    # doc3: every 3-gram occurs elsewhere -> fully covered
    assert got[3]["dup_tokens"] == 5 and abs(got[3]["dup_frac"] - 1.0) < 1e-9
    # doc4: "a b c"(0) + "b c d"(1) cover tokens 0..3; "c d x2" unique
    assert got[4]["dup_tokens"] == 4 and abs(got[4]["dup_frac"] - 0.8) < 1e-9


def test_duplicated_span_short_doc(spark):
    from hippollm_spark.operators.dedup import duplicated_span_stats

    df = _docs(spark, ["a b", "a b"])  # shorter than n: no n-grams at all
    got = duplicated_span_stats(df, n=3).collect()
    assert all(r["dup_tokens"] == 0 for r in got)


def test_shortest_paths(spark):
    from hippollm_spark.operators.graph import shortest_paths

    und = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src string, dst string"
    )
    got = {r["vertex"]: r["dist"] for r in shortest_paths(edges, ["a"]).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    capped = {
        r["vertex"]: r["dist"]
        for r in shortest_paths(edges, ["a"], max_depth=2).collect()
    }
    assert capped == {"a": 0, "b": 1, "c": 2}
    multi = {
        r["vertex"]: r["dist"]
        for r in shortest_paths(edges, ["a", "d"]).collect()
    }
    assert multi == {"a": 0, "d": 0, "b": 1, "c": 1}


def test_merge_into(spark):
    from hippollm_spark.operators.scd import merge_into

    target = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "id long, val string"
    )
    changes = spark.createDataFrame(
        [
            (1, "ONE", "U", 2),
            (1, None, "D", 1),  # superseded by the seq-2 upsert
            (2, None, "D", 5),
            (4, "four", "U", 1),
        ],
        "id long, val string, op string, seq long",
    )
    got = {r["id"]: r["val"] for r in merge_into(target, changes, "id").collect()}
    assert got == {1: "ONE", 3: "three", 4: "four"}


def test_merge_into_same_seq_tie(spark):
    from hippollm_spark.operators.scd import merge_into

    target = spark.createDataFrame([(9, "old")], "id long, val string")
    changes = spark.createDataFrame(
        [(9, "new", "U", 7), (9, None, "D", 7)],
        "id long, val string, op string, seq long",
    )
    got = merge_into(target, changes, "id").collect()
    assert [(r["id"], r["val"]) for r in got] == [(9, "new")]


def test_winsorize_matches_numpy(spark):
    from hippollm_spark.operators.stats import winsorize

    vals = [float(v) for v in range(1, 101)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    got = winsorize(df, "v", "g", lower=0.1, upper=0.9).collect()
    lo, hi = np.percentile(np.array(vals), [10, 90], method="linear")
    ws = sorted(r["v_w"] for r in got)
    assert abs(ws[0] - round(lo, 6)) < 1e-9
    assert abs(ws[-1] - round(hi, 6)) < 1e-9
    assert len(got) == 100
    mid = [r for r in got if 20 <= r["v"] <= 80]
    assert all(r["v_w"] == r["v"] for r in mid)


def test_concurrency_sweep_line(spark):
    from hippollm_spark.operators.temporal import (
        concurrency_profile,
        max_concurrency,
    )

    df = spark.createDataFrame(
        [(0, 10), (5, 15), (10, 20)], "start_ts long, end_ts long"
    )
    prof = {
        r["ts"]: r["concurrent"] for r in concurrency_profile(df).collect()
    }
    # [start,end): at t=10 one ends as another starts -> still 2 open
    assert prof == {0: 1, 5: 2, 10: 2, 15: 1, 20: 0}
    assert max_concurrency(df).first()["peak"] == 2

    # NULL-bounded intervals are dropped, not counted: they are
    # undefined for [start, end) sweep semantics, and a NULL boundary
    # sorts first in Spark's window but last in DuckDB's — counting
    # them skews the profile in opposite directions per engine (the
    # sf1 NULL-bearing sweep catch)
    with_null = spark.createDataFrame(
        [(0, 10), (5, None), (None, 15), (5, 15)],
        "start_ts long, end_ts long",
    )
    prof2 = {
        r["ts"]: r["concurrent"] for r in concurrency_profile(with_null).collect()
    }
    assert prof2 == {0: 1, 5: 2, 10: 1, 15: 0}
    assert max_concurrency(with_null).first()["peak"] == 2


def test_concurrency_grouped(spark):
    from hippollm_spark.operators.temporal import max_concurrency

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 4), ("a", 2, 3), ("b", 0, 1)],
        "g string, start_ts long, end_ts long",
    )
    got = {
        r["g"]: r["peak"]
        for r in max_concurrency(df, by="g").collect()
    }
    assert got == {"a": 3, "b": 1}


def test_entity_jaccard(spark):
    from hippollm_spark.operators.graph import entity_jaccard

    edges = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")],
        "fact_id long, entity string",
    )
    got = {
        (r["entity_a"], r["entity_b"]): r
        for r in entity_jaccard(edges).collect()
    }
    # a: {1,2,3}; b: {1,2}; c: {3}
    assert got[("a", "b")]["n_shared"] == 2
    assert abs(got[("a", "b")]["jaccard"] - 2 / 3) < 1e-6
    assert abs(got[("a", "c")]["jaccard"] - 1 / 3) < 1e-6
    assert ("b", "c") not in got
    only2 = entity_jaccard(edges, min_shared=2).collect()
    assert [(r["entity_a"], r["entity_b"]) for r in only2] == [("a", "b")]


def test_label_propagation_two_cliques(spark):
    from hippollm_spark.operators.graph import label_propagation

    # two triangles bridged by one edge: communities should separate
    und = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a3", "b1"),
    ]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    got = {r["vertex"]: r["label"] for r in label_propagation(edges, 3).collect()}
    assert got["a1"] == got["a2"] == "a1"
    assert got["b2"] == got["b3"]
    # deterministic across reruns
    again = {r["vertex"]: r["label"] for r in label_propagation(edges, 3).collect()}
    assert got == again


def test_mad_outliers(spark):
    from hippollm_spark.operators.stats import mad_outliers

    vals = [10.0] * 5 + [11.0] * 5 + [12.0] * 5 + [100.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    got = mad_outliers(df, "v", "g", k=3.0).collect()
    # median = 11, MAD = 1 -> only 100.0 flagged (|100-11| = 89 > 3)
    flagged = [r["v"] for r in got if r["is_outlier"]]
    assert flagged == [100.0]
    assert all(r["mad"] == 1.0 for r in got)


def test_ntile_buckets(spark):
    from hippollm_spark.operators.stats import ntile_buckets

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(20)], "id long, score double"
    )
    got = {r["id"]: r["bucket"] for r in ntile_buckets(df, "score", 4, tiebreak_col="id").collect()}
    # descending score: ids 0..4 -> bucket 1, ..., 15..19 -> bucket 4
    assert got[0] == 1 and got[4] == 1 and got[5] == 2 and got[19] == 4
