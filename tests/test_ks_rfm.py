"""KS two-sample test vs a quadratic reference; RFM segmentation vs
hand computation."""

from __future__ import annotations

from datetime import datetime

import numpy as np

from hippollm_spark.operators.behavior import rfm_segments
from hippollm_spark.operators.stats import ks_test


def _ks_reference(xs, ys):
    pooled = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    d = 0.0
    for v in pooled:
        fa = sum(1 for x in xs if x <= v) / na
        fb = sum(1 for y in ys if y <= v) / nb
        d = max(d, abs(fa - fb))
    return d


def test_ks_matches_reference_with_ties(spark):
    rng = np.random.RandomState(21)
    xs = list(np.round(rng.randn(80), 1))  # heavy ties at 1dp
    ys = list(np.round(rng.randn(120) + 0.4, 1))
    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    df = spark.createDataFrame(rows, "arm string, v double")
    row = ks_test(df, "v", "arm", "a", "b").first()
    want = _ks_reference(xs, ys)
    assert row["n_a"] == 80 and row["n_b"] == 120
    assert abs(row["d_stat"] - want) < 1e-6
    assert abs(
        row["ks_scaled"] - (80 * 120 / 200) ** 0.5 * row["d_stat"]
    ) < 1e-5


def test_ks_identical_and_disjoint(spark):
    same = [("a", float(i)) for i in range(10)] + [
        ("b", float(i)) for i in range(10)
    ]
    row = ks_test(
        spark.createDataFrame(same, "arm string, v double"), "v", "arm", "a", "b"
    ).first()
    assert row["d_stat"] == 0.0

    disj = [("a", float(i)) for i in range(10)] + [
        ("b", float(i + 100)) for i in range(10)
    ]
    row2 = ks_test(
        spark.createDataFrame(disj, "arm string, v double"), "v", "arm", "a", "b"
    ).first()
    assert row2["d_stat"] == 1.0


def test_ks_grouped_missing_arm(spark):
    rows = [("g1", "a", 1.0), ("g1", "b", 2.0), ("g2", "a", 1.0)]
    df = spark.createDataFrame(rows, "g string, arm string, v double")
    out = {r["g"]: r for r in ks_test(df, "v", "arm", "a", "b", by="g").collect()}
    assert out["g1"]["d_stat"] == 1.0
    assert out["g2"]["d_stat"] is None


def test_rfm_segments_hand_computed(spark):
    rows = [
        # u1: recent, frequent, big
        (1, datetime(2024, 1, 30), 100.0),
        (1, datetime(2024, 1, 29), 100.0),
        (1, datetime(2024, 1, 28), 100.0),
        # u2: old, rare, small
        (2, datetime(2024, 1, 2), 1.0),
        # u3: middle
        (3, datetime(2024, 1, 15), 10.0),
        (3, datetime(2024, 1, 16), 10.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        r["user_id"]: r
        for r in rfm_segments(df, ref_date="2024-02-01", n_bins=3).collect()
    }
    assert out[1]["recency_days"] == 2 and out[1]["frequency"] == 3
    assert abs(out[1]["monetary"] - 300.0) < 1e-9
    assert out[1]["segment"] == "333"
    assert out[2]["segment"] == "111"
    assert out[3]["segment"] == "222"


def test_rfm_deterministic_under_repartition(spark):
    rng = np.random.RandomState(4)
    rows = [
        (int(i % 37), datetime(2024, 1, 1 + int(i % 28)), float(v))
        for i, v in enumerate(np.round(rng.rand(300) * 50, 2))
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    a = sorted(
        (r["user_id"], r["segment"]) for r in rfm_segments(df).collect()
    )
    b = sorted(
        (r["user_id"], r["segment"])
        for r in rfm_segments(df.repartition(11)).collect()
    )
    assert a == b


def test_rfm_threshold_plan_has_no_whole_table_window(spark):
    """The 100-TB default must not funnel the users table through an
    unpartitioned (or constant-partitioned) NTILE window."""
    rows = [
        (int(i % 11), datetime(2024, 1, 1 + int(i % 28)), float(i % 7))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    plan = (
        rfm_segments(df)._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__pid__" in line, line


def test_rfm_threshold_vs_ntile_twin(spark):
    """Away from boundary ties the two methods agree; with ties the
    threshold form keeps equal values in one bin."""
    # distinct metric values per user -> no boundary ties
    rows = []
    for u in range(10):
        for j in range(u + 1):  # frequency strictly increasing in u
            rows.append((u, datetime(2024, 1, 1 + u), 10.0 + u))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    thr = {
        r["user_id"]: r["segment"]
        for r in rfm_segments(df, n_bins=5).collect()
    }
    nt = {
        r["user_id"]: r["segment"]
        for r in rfm_segments(df, n_bins=5, method="ntile").collect()
    }
    assert thr == nt
