"""Funnel and cohort-retention operators on hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

from hippollm_spark.operators.behavior import cohort_retention, funnel_counts

T = dt.datetime


def test_funnel_order_sensitive(spark):
    rows = [
        # u1 converts fully in order
        (1, T(2024, 1, 1, 10), "view"),
        (1, T(2024, 1, 1, 11), "click"),
        (1, T(2024, 1, 1, 12), "purchase"),
        # u2 views and clicks only
        (2, T(2024, 1, 2, 9), "view"),
        (2, T(2024, 1, 2, 10), "click"),
        # u3 purchases BEFORE viewing -> must not count as converted
        (3, T(2024, 1, 3, 8), "purchase"),
        (3, T(2024, 1, 3, 9), "view"),
        # u4 never enters the funnel
        (4, T(2024, 1, 4, 9), "signup"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    out = {
        r["step"]: (r["step_idx"], r["n_users"], r["conversion"])
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert out["view"] == (1, 3, 1.0)
    assert out["click"] == (2, 2, round(2 / 3, 6))
    assert out["purchase"] == (3, 1, round(1 / 3, 6))


def test_funnel_requires_strict_order_within_user(spark):
    # click at the same timestamp as view does NOT advance (strict >)
    rows = [(1, T(2024, 1, 1, 10), "view"), (1, T(2024, 1, 1, 10), "click")]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    out = {r["step"]: r["n_users"] for r in funnel_counts(df, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 0}


def test_cohort_retention_triangle(spark):
    rows = [
        # cohort of Jan 1 (Monday): u1 active weeks 0 and 1, u2 week 0 only
        (1, T(2024, 1, 2)),
        (1, T(2024, 1, 9)),
        (2, T(2024, 1, 3)),
        # cohort of Jan 8: u3 active weeks 0 and 2
        (3, T(2024, 1, 10)),
        (3, T(2024, 1, 24)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {
        (r["cohort"].date().isoformat(), r["period_offset"]): (
            r["n_users"],
            r["retention"],
        )
        for r in cohort_retention(df).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1.0)
    assert out[("2024-01-08", 2)] == (1, 1.0)
    assert len(out) == 4


def test_funnel_methods_agree(spark):
    import random

    random.seed(7)
    rows = []
    for u in range(200):
        for _ in range(random.randint(1, 8)):
            rows.append(
                (
                    u,
                    T(2024, 1, random.randint(1, 28), random.randint(0, 23)),
                    random.choice(["view", "click", "purchase", "signup"]),
                )
            )
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    steps = ["view", "click", "purchase"]
    walk = sorted(
        map(tuple, funnel_counts(df, steps, method="walk").collect())
    )
    joins = sorted(
        map(tuple, funnel_counts(df, steps, method="joins").collect())
    )
    assert walk == joins
