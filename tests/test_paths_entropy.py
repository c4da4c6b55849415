"""Session-path mining and categorical entropy."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import numpy as np

from hippollm_spark.operators.behavior import session_paths
from hippollm_spark.operators.stats import entropy


def test_session_paths_hand_computed(spark):
    t0 = datetime(2024, 1, 1, 9, 0, 0)
    rows = []
    eid = 0
    # user 1: two sessions — (view>click>purchase) and (view)
    for i, et in enumerate(["view", "click", "purchase"]):
        rows.append((eid, 1, t0 + timedelta(minutes=i), et)); eid += 1
    rows.append((eid, 1, t0 + timedelta(hours=5), "view")); eid += 1
    # user 2: one session (view>click>purchase)
    for i, et in enumerate(["view", "click", "purchase"]):
        rows.append((eid, 2, t0 + timedelta(minutes=i), et)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r["path"]: r for r in session_paths(df, k=10).collect()}
    assert out["view>click>purchase"]["n_sessions"] == 2
    assert out["view>click>purchase"]["rank"] == 1
    assert out["view"]["n_sessions"] == 1
    assert out["view>click>purchase"]["n_steps"] == 3


def test_session_paths_truncation_and_ties(spark):
    t0 = datetime(2024, 1, 1)
    rows = [(i, 1, t0 + timedelta(seconds=i), "e") for i in range(15)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    r = session_paths(df, max_steps=4).first()
    assert r["path"] == "e>e>e>e" and r["n_steps"] == 4
    # same-instant ties ordered by event_id
    rows2 = [(2, 9, t0, "b"), (1, 9, t0, "a")]
    df2 = spark.createDataFrame(
        rows2, "event_id long, user_id long, ts timestamp, event_type string"
    )
    assert session_paths(df2).first()["path"] == "a>b"


def test_entropy_matches_reference(spark):
    rng = np.random.RandomState(17)
    cats = rng.choice(["a", "b", "c", "d"], p=[0.5, 0.3, 0.15, 0.05], size=500)
    rows = [("g", str(c)) for c in cats]
    df = spark.createDataFrame(rows, "g string, c string")
    row = entropy(df, "c", "g").first()
    from collections import Counter

    counts = Counter(cats)
    want = -sum(
        round(-(-(v / 500) * math.log(v / 500)), 6) * -1 for v in counts.values()
    )
    # reference with the same 6dp-per-term rounding
    want = sum(round(-(v / 500) * math.log(v / 500), 6) for v in counts.values())
    assert abs(row["entropy"] - round(want, 6)) < 1e-9
    assert row["n_distinct"] == 4 and row["n"] == 500
    assert 0 < row["entropy_norm"] <= 1


def test_entropy_uniform_and_constant(spark):
    uni = spark.createDataFrame(
        [("u", str(i % 8)) for i in range(800)], "g string, c string"
    )
    r = entropy(uni, "c", "g").first()
    assert abs(r["entropy"] - math.log(8)) < 1e-4
    assert abs(r["entropy_norm"] - 1.0) < 1e-5

    const = spark.createDataFrame([("k", "x")] * 10, "g string, c string")
    r2 = entropy(const, "c", "g").first()
    assert r2["entropy"] == 0.0 and r2["entropy_norm"] == 0.0
