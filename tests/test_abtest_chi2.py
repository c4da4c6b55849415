"""Welch's t, conversion chi-square, and chi-square keywords vs
hand/numpy reference computations."""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from hippollm_spark.operators.stats import conversion_chi2, welch_t_test
from hippollm_spark.operators.textstats import chi2_keywords


def _welch_reference(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = np.mean(xs), np.mean(ys)
    va, vb = np.var(xs, ddof=1), np.var(ys, ddof=1)
    sea, seb = va / na, vb / nb
    t = (mb - ma) / math.sqrt(sea + seb)
    dof = (sea + seb) ** 2 / (sea**2 / (na - 1) + seb**2 / (nb - 1))
    return t, dof


def test_welch_t_matches_reference(spark):
    rng = np.random.RandomState(9)
    xs = np.round(rng.randn(150) * 2 + 10, 3)
    ys = np.round(rng.randn(90) * 3 + 10.5, 3)
    rows = [("control", float(v)) for v in xs] + [("treat", float(v)) for v in ys]
    df = spark.createDataFrame(rows, "arm string, value double")
    row = welch_t_test(df, "arm", "value", "control", "treat").first()
    t, dof = _welch_reference(xs, ys)
    assert row["n_a"] == 150 and row["n_b"] == 90
    assert abs(row["t_stat"] - t) < 1e-5
    assert abs(row["dof"] - dof) < 1e-3
    assert abs(row["lift"] - (np.mean(ys) - np.mean(xs))) < 1e-6


def test_welch_t_degenerate(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 2.0)], "arm string, value double"
    )
    row = welch_t_test(df, "arm", "value", "a", "b").first()
    assert row["t_stat"] is None  # n_a < 2 (and zero variances)


def _chi2_reference(table):
    """table: list of (row_success, row_fail)."""
    import numpy as np

    obs = np.array(table, dtype=float)
    rt = obs.sum(axis=1)
    ct = obs.sum(axis=0)
    n = obs.sum()
    exp = np.outer(rt, ct) / n
    return float((((obs - exp) ** 2) / exp).sum())


def test_conversion_chi2_matches_reference(spark):
    # 3 arms x (success, fail)
    table = {"a": (30, 70), "b": (45, 55), "c": (20, 80)}
    rows = []
    for arm, (s, f) in table.items():
        rows += [(arm, True)] * s + [(arm, False)] * f
    df = spark.createDataFrame(rows, "arm string, ok boolean")
    row = conversion_chi2(df, "arm", "ok").first()
    want = _chi2_reference([table[a] for a in ["a", "b", "c"]])
    assert row["n"] == 300 and row["n_arms"] == 3 and row["dof"] == 2
    # per-arm terms are rounded at 6dp before the exact sum
    assert abs(row["chi2"] - want) < 1e-4


def test_conversion_chi2_degenerate_margin(spark):
    # all successes -> expected-failure cells are 0 -> NULL chi2
    df = spark.createDataFrame(
        [("a", True), ("a", True), ("b", True)], "arm string, ok boolean"
    )
    assert conversion_chi2(df, "arm", "ok").first()["chi2"] is None


def test_conversion_chi2_grouped_and_expression(spark):
    rows = [("g1", "a", 5.0), ("g1", "a", 150.0), ("g1", "b", 200.0),
            ("g1", "b", 10.0), ("g2", "a", 1.0), ("g2", "b", 2.0)]
    df = spark.createDataFrame(rows, "g string, arm string, value double")
    out = {
        r["g"]: r
        for r in conversion_chi2(
            df, "arm", F.col("value") > 100, by="g"
        ).collect()
    }
    assert out["g1"]["n"] == 4 and out["g1"]["chi2"] == 0.0  # 1/2 vs 1/2
    assert out["g2"]["chi2"] is None  # no successes at all


def test_chi2_keywords_finds_planted_terms(spark):
    rows = []
    for i in range(20):
        rows.append((i, f"common words here plus python spark filler{i}", "tech"))
    for i in range(20, 40):
        rows.append((i, f"common words here plus recipe butter filler{i}", "food"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = chi2_keywords(df, "lang", k=3)
    top = {
        r["label"]: [] for r in out.collect()
    }
    for r in out.orderBy("label", "rank").collect():
        top[r["label"]].append(r["term"])
    assert set(top["tech"][:2]) == {"python", "spark"}
    assert set(top["food"][:2]) == {"butter", "recipe"}
    # shared terms score 0 and never outrank the planted ones
    chi = {(r["label"], r["term"]): r["chi2"] for r in out.collect()}
    assert chi[("tech", "python")] > 30  # perfectly separating term, N=40
