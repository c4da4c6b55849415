"""PSI drift and NDCG@k vs reference computations."""

from __future__ import annotations

import math

from hippollm_spark.operators.ranking import ndcg_at_k
from hippollm_spark.operators.stats import psi_drift


def _psi_reference(p_counts, q_counts, eps=1e-4):
    np_, nq = sum(p_counts.values()), sum(q_counts.values())
    cats = set(p_counts) | set(q_counts)
    psi = 0.0
    for c in cats:
        p = max(p_counts.get(c, 0) / np_, eps)
        q = max(q_counts.get(c, 0) / nq, eps)
        psi += round((p - q) * math.log(p / q), 6)
    return round(psi, 6)


def test_psi_matches_reference(spark):
    rows = (
        [("s1", "a")] * 50 + [("s1", "b")] * 50
        + [("s2", "a")] * 90 + [("s2", "b")] * 5 + [("s2", "c")] * 5
    )
    df = spark.createDataFrame(rows, "slice string, cat string")
    out = {r["slice"]: r for r in psi_drift(df, "cat", "slice").collect()}
    glob = {"a": 140, "b": 55, "c": 5}
    assert out["s1"]["psi"] == _psi_reference({"a": 50, "b": 50}, glob)
    assert out["s2"]["psi"] == _psi_reference(
        {"a": 90, "b": 5, "c": 5}, glob
    )
    # the shifted slice drifts more
    assert out["s2"]["psi"] > 0 and out["s1"]["psi"] > 0
    assert out["s1"]["n_rows"] == 100


def test_psi_identical_distribution_near_zero(spark):
    rows = [("x", str(i % 4)) for i in range(400)] + [
        ("y", str(i % 4)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "slice string, cat string")
    for r in psi_drift(df, "cat", "slice").collect():
        assert abs(r["psi"]) < 1e-9


def _dcg(rels):
    return sum(
        round((2**r - 1) / math.log2(i + 2), 6) for i, r in enumerate(rels)
    )


def test_ndcg_hand_computed(spark):
    results = spark.createDataFrame(
        [(1, "d1", 1), (1, "d2", 2), (1, "d3", 3),
         (2, "d9", 1), (2, "d1", 2)],
        "query_id long, doc_id string, rank int",
    )
    relevance = spark.createDataFrame(
        [(1, "d1", 3), (1, "d3", 1), (1, "d7", 2),
         (2, "d1", 1)],
        "query_id long, doc_id string, rel int",
    )
    out = {r["query_id"]: r for r in ndcg_at_k(results, relevance, k=3).collect()}
    # q1: ranked rels [3, 0, 1]; ideal [3, 2, 1]
    dcg1 = _dcg([3, 0, 1])
    idcg1 = _dcg([3, 2, 1])
    assert abs(out[1]["dcg"] - round(dcg1, 6)) < 1e-9
    assert abs(out[1]["idcg"] - round(idcg1, 6)) < 1e-9
    assert abs(out[1]["ndcg"] - round(dcg1 / idcg1, 6)) < 1e-6
    # q2: unjudged d9 scores 0; d1 at rank 2
    assert abs(out[2]["dcg"] - _dcg([0, 1])) < 1e-9
    assert out[2]["ndcg"] < 1.0


def test_ndcg_perfect_and_unjudged(spark):
    results = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (3, "z", 1)],
        "query_id long, doc_id string, rank int",
    )
    relevance = spark.createDataFrame(
        [(1, "a", 2), (1, "b", 1)], "query_id long, doc_id string, rel int"
    )
    out = {r["query_id"]: r for r in ndcg_at_k(results, relevance, k=5).collect()}
    assert out[1]["ndcg"] == 1.0  # perfect ordering
    assert out[3]["ndcg"] is None  # no judgments at all
