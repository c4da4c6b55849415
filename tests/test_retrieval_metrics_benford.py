"""Recall/precision/MRR and Benford chi-square vs reference math."""

from __future__ import annotations

import math

import numpy as np

from hippollm_spark.operators.ranking import retrieval_metrics
from hippollm_spark.operators.stats import benford_test


def test_retrieval_metrics_hand_computed(spark):
    results = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3),
         (2, "x", 1), (2, "y", 2),
         (3, "m", 1)],
        "query_id long, doc_id string, rank int",
    )
    relevance = spark.createDataFrame(
        [(1, "b", 1), (1, "z", 2),       # q1: 1 of 2 relevant found, first at rank 2
         (2, "x", 3),                     # q2: perfect at rank 1
         (3, "q", 1)],                    # q3: relevant exists, none retrieved
        "query_id long, doc_id string, rel int",
    )
    out = {r["query_id"]: r for r in retrieval_metrics(results, relevance, k=3).collect()}
    assert out[1]["recall_at_k"] == 0.5
    assert abs(out[1]["precision_at_k"] - 1 / 3) < 1e-6
    assert out[1]["mrr_at_k"] == 0.5
    assert out[2]["recall_at_k"] == 1.0 and out[2]["mrr_at_k"] == 1.0
    assert out[3]["n_hits"] == 0 and out[3]["mrr_at_k"] == 0.0
    assert out[3]["recall_at_k"] == 0.0


def test_retrieval_metrics_k_cutoff(spark):
    results = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 5)], "query_id long, doc_id string, rank int"
    )
    relevance = spark.createDataFrame(
        [(1, "b", 1)], "query_id long, doc_id string, rel int"
    )
    r = retrieval_metrics(results, relevance, k=3).first()
    assert r["n_retrieved"] == 1 and r["n_hits"] == 0  # b cut off at k=3


def _benford_reference(values):
    from collections import Counter

    digs = []
    for v in values:
        s = f"{abs(v):.6f}".replace(".", "").lstrip("0")
        if s:
            digs.append(int(s[0]))
    n = len(digs)
    obs = Counter(digs)
    chi2 = 0.0
    # standard definition: ALL nine digits contribute, absent digits
    # add the full (0-E)^2/E = E term
    for d in range(1, 10):
        e = n * math.log10(1 + 1 / d)
        chi2 += round((obs.get(d, 0) - e) ** 2 / e, 6)
    return n, round(chi2, 6)


def test_benford_conforming_vs_uniform(spark):
    rng = np.random.RandomState(11)
    # log-uniform data conforms to Benford; uniform [1,2) does not
    conforming = list(np.round(10 ** (rng.rand(2000) * 4 - 2), 6))
    uniform = list(np.round(rng.rand(2000) + 1, 6))
    rows = [("ok", float(v)) for v in conforming] + [
        ("bad", float(v)) for v in uniform
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in benford_test(df, "v", "g").collect()}
    n_ok, chi_ok = _benford_reference(conforming)
    n_bad, chi_bad = _benford_reference(uniform)
    assert out["ok"]["n"] == n_ok
    assert abs(out["ok"]["chi2_benford"] - chi_ok) < 1e-4
    assert abs(out["bad"]["chi2_benford"] - chi_bad) < 1e-4
    assert out["bad"]["chi2_benford"] > 10 * out["ok"]["chi2_benford"]


def test_benford_excludes_zero_and_null(spark):
    df = spark.createDataFrame(
        [("g", 0.0), ("g", None), ("g", 123.45), ("g", -0.002)],
        "g string, v double",
    )
    r = benford_test(df, "v", "g").first()
    assert r["n"] == 2  # 123.45 -> 1, -0.002 -> 2


def test_benford_degenerate_single_digit(spark):
    """All values share one leading digit — the case zero-cell omission
    used to understate: the other eight digits' E terms must appear."""
    df = spark.createDataFrame(
        [("g", 1.0 + i / 100) for i in range(50)], "g string, v double"
    )
    r = benford_test(df, "v", "g").first()
    n = 50
    e1 = n * math.log10(2)
    want = round((n - e1) ** 2 / e1, 6) + sum(
        round(n * math.log10(1 + 1 / d), 6) for d in range(2, 10)
    )
    assert abs(r["chi2_benford"] - round(want, 6)) < 1e-4


def test_benford_empty_input_ungrouped_returns_empty(spark):
    """groupBy() with no keys emits one global row even on empty input;
    the ungrouped form must filter it out so an empty/fully-filtered
    input yields an empty frame, matching the grouped contract."""
    df = spark.createDataFrame([("g", 0.0), ("g", None)], "g string, v double")
    assert benford_test(df, "v").count() == 0
    assert benford_test(df, "v", "g").count() == 0
    assert benford_test(df.limit(0), "v").count() == 0
