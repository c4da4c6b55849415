"""OLS fit, correlation matrix, and rank-sum AUC vs numpy / manual
reference computations."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from hippollm_spark.operators.stats import (
    correlation_matrix,
    grouped_auc,
    linear_fit,
)


def test_linear_fit_matches_numpy(spark):
    rng = np.random.RandomState(7)
    rows = []
    for g, (a, b) in [("g0", (2.5, -3.0)), ("g1", (-0.75, 10.0))]:
        x = rng.rand(200) * 50
        y = a * x + b + rng.randn(200) * 2
        rows += [(g, round(float(xi), 4), round(float(yi), 4)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in linear_fit(df, "x", "y", "g").collect()}
    for g in ["g0", "g1"]:
        xs = np.array([x for k, x, _ in rows if k == g])
        ys = np.array([y for k, _, y in rows if k == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert abs(got[g]["slope"] - slope) < 1e-4, g
        assert abs(got[g]["intercept"] - intercept) < 1e-4, g
        assert abs(got[g]["r2"] - r * r) < 1e-4, g
        assert got[g]["n"] == 200


def test_linear_fit_degenerate_groups(spark):
    df = spark.createDataFrame(
        [("one", 1.0, 5.0), ("flat", 2.0, 1.0), ("flat", 2.0, 9.0)],
        "g string, x double, y double",
    )
    got = {r["g"]: r for r in linear_fit(df, "x", "y", "g").collect()}
    assert got["one"]["slope"] is None  # n < 2
    assert got["flat"]["slope"] is None  # zero x-variance
    # constant y: slope 0, r2 null
    df2 = spark.createDataFrame(
        [("c", 1.0, 4.0), ("c", 2.0, 4.0), ("c", 3.0, 4.0)],
        "g string, x double, y double",
    )
    row = linear_fit(df2, "x", "y", "g").first()
    assert row["slope"] == 0.0 and row["r2"] is None


def test_linear_fit_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", None, 99.0), ("g", 3.0, None)],
        "g string, x double, y double",
    )
    row = linear_fit(df, "x", "y", "g").first()
    assert row["n"] == 2 and abs(row["slope"] - 2.0) < 1e-9


def test_correlation_matrix_matches_numpy(spark):
    rng = np.random.RandomState(11)
    base = rng.rand(300)
    a = base * 10
    b = -2 * base + rng.randn(300) * 0.1
    c = rng.rand(300)
    rows = [
        (round(float(x), 4), round(float(y), 4), round(float(z), 4))
        for x, y, z in zip(a, b, c)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["a", "b", "c"]).collect()
    }
    arr = np.array(rows)
    want = np.corrcoef(arr.T)
    assert abs(got[("a", "b")] - want[0, 1]) < 1e-5
    assert abs(got[("a", "c")] - want[0, 2]) < 1e-5
    assert abs(got[("b", "c")] - want[1, 2]) < 1e-5
    assert len(got) == 3  # k(k-1)/2 pairs, no self rows


def test_correlation_matrix_listwise_nulls_and_constant(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, 7.0), (2.0, 2.0, 7.0), (3.0, None, 7.0), (4.0, 4.0, 7.0)],
        "a double, b double, k double",
    )
    got = {
        (r["col_a"], r["col_b"]): (r["n"], r["corr"])
        for r in correlation_matrix(df, ["a", "b", "k"]).collect()
    }
    assert got[("a", "b")] == (3, 1.0)  # null row dropped listwise
    assert got[("a", "k")][1] is None  # zero-variance column


def _auc_reference(scores, labels):
    """Quadratic-time AUC with half-credit for ties."""
    pos = [s for s, l in zip(scores, labels) if l]
    neg = [s for s, l in zip(scores, labels) if not l]
    total = 0.0
    for p in pos:
        for n in neg:
            total += 1.0 if p > n else (0.5 if p == n else 0.0)
    return total / (len(pos) * len(neg))


def test_grouped_auc_matches_pairwise_definition(spark):
    rng = np.random.RandomState(5)
    rows = []
    for g in ["g0", "g1"]:
        labels = rng.rand(120) < 0.4
        # discretized scores force ties
        scores = np.round(rng.rand(120) + labels * 0.3, 1)
        rows += [(g, float(s), bool(l)) for s, l in zip(scores, labels)]
    df = spark.createDataFrame(rows, "g string, score double, label boolean")
    got = {r["g"]: r["auc"] for r in grouped_auc(df, "score", "label", "g").collect()}
    for g in ["g0", "g1"]:
        sub = [(s, l) for k, s, l in rows if k == g]
        want = _auc_reference([s for s, _ in sub], [l for _, l in sub])
        assert abs(got[g] - want) < 1e-6, g


def test_grouped_auc_perfect_and_degenerate(spark):
    df = spark.createDataFrame(
        [("p", 1.0, False), ("p", 2.0, False), ("p", 3.0, True), ("p", 4.0, True),
         ("allpos", 1.0, True), ("allpos", 2.0, True)],
        "g string, score double, label boolean",
    )
    got = {r["g"]: r for r in grouped_auc(df, "score", "label", "g").collect()}
    assert got["p"]["auc"] == 1.0
    assert got["allpos"]["auc"] is None  # no negatives
    assert got["p"]["n_pos"] == 2


def test_grouped_auc_column_expression_label(spark):
    df = spark.createDataFrame(
        [("purchase", 5.0), ("view", 1.0), ("purchase", 4.0), ("view", 2.0)],
        "event_type string, value double",
    )
    row = grouped_auc(df, "value", F.col("event_type") == "purchase").first()
    assert row["auc"] == 1.0


def test_grouped_auc_excludes_null_labels(spark):
    """NULL-labeled rows are outside the test population: they must
    not occupy ranks or count as negatives."""
    base = [("g", 1.0, False), ("g", 2.0, True), ("g", 3.0, False),
            ("g", 4.0, True)]
    with_nulls = base + [("g", 0.5, None), ("g", 5.0, None)]
    df_a = spark.createDataFrame(base, "g string, score double, label boolean")
    df_b = spark.createDataFrame(
        with_nulls, "g string, score double, label boolean"
    )
    ra = grouped_auc(df_a, "score", "label", "g").first()
    rb = grouped_auc(df_b, "score", "label", "g").first()
    assert rb["n"] == ra["n"] == 4
    assert rb["auc"] == ra["auc"]


def test_privacy_risk_k_and_l(spark):
    from hippollm_spark.operators.stats import privacy_risk

    rows = [
        # (zip, age_band, diagnosis)
        ("100", "30s", "flu"), ("100", "30s", "flu"), ("100", "30s", "cold"),
        ("100", "30s", "flu"), ("100", "30s", "ok"),
        ("999", "40s", "rare"),  # singleton group -> k violation
        ("200", "20s", "flu"), ("200", "20s", "flu"),  # l violation (1 value)
        ("200", "20s", "flu"), ("200", "20s", "flu"), ("200", "20s", "flu"),
    ]
    df = spark.createDataFrame(rows, "zip string, age string, dx string")
    out = {
        (r["zip"], r["age"]): r
        for r in privacy_risk(df, ["zip", "age"], "dx", k=5, l=2).collect()
    }
    assert not out[("100", "30s")]["k_violation"]
    assert not out[("100", "30s")]["l_violation"]
    assert out[("999", "40s")]["k_violation"]
    assert out[("200", "20s")]["l_violation"]  # 5 rows but 1 dx value
    assert not out[("200", "20s")]["k_violation"]
    # without a sensitive column, l flag is null
    r = privacy_risk(df, ["zip"], k=3).filter("zip = '999'").first()
    assert r["l_violation"] is None and r["k_violation"]
