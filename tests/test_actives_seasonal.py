"""DAU/WAU/MAU rolling actives and seasonal profile."""

from __future__ import annotations

from datetime import datetime, timedelta

from hippollm_spark.operators.behavior import active_users
from hippollm_spark.operators.temporal import seasonal_profile


def test_active_users_hand_computed(spark):
    d0 = datetime(2024, 1, 1, 10, 0)
    rows = []
    eid = 0
    # user 1 active on days 0..9; user 2 only day 0; user 3 day 9
    for day in range(10):
        rows.append((eid, 1, d0 + timedelta(days=day))); eid += 1
        rows.append((eid, 1, d0 + timedelta(days=day, hours=2))); eid += 1
    rows.append((eid, 2, d0)); eid += 1
    rows.append((eid, 3, d0 + timedelta(days=9))); eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {str(r["day"].date()): r for r in active_users(df).collect()}
    assert out["2024-01-01"]["dau"] == 2  # u1 counted once despite 2 events
    assert out["2024-01-02"]["dau"] == 1
    assert out["2024-01-02"]["wau"] == 2  # u1 + u2 (day0 within 7-day window)
    assert out["2024-01-10"]["wau"] == 2  # u1 + u3 (u2 aged out)
    assert out["2024-01-10"]["mau"] == 3  # all within 28 days
    assert len(out) == 10


def test_active_users_windows_are_trailing(spark):
    d0 = datetime(2024, 3, 1)
    rows = [(1, 7, d0), (2, 8, d0 + timedelta(days=8))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {str(r["day"].date()): r for r in active_users(df).collect()}
    # day 8: u7's activity 8 days earlier is outside WAU but inside MAU
    assert out["2024-03-09"]["wau"] == 1
    assert out["2024-03-09"]["mau"] == 2


def test_seasonal_profile_dow(spark):
    rows = []
    eid = 0
    # 4 full weeks: Sundays value 20, other days value 10
    d0 = datetime(2024, 1, 1)  # a Monday
    for i in range(28):
        d = d0 + timedelta(days=i)
        v = 20.0 if d.weekday() == 6 else 10.0
        rows.append((eid, d, v)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r["bucket"]: r for r in seasonal_profile(df, "ts", "value").collect()}
    overall = (4 * 20 + 24 * 10) / 28
    # dayofweek: 1 = Sunday
    assert abs(out[1]["mean_value"] - 20.0) < 1e-9
    assert abs(out[1]["seasonal_index"] - 20.0 / overall) < 1e-6
    assert abs(out[2]["seasonal_index"] - 10.0 / overall) < 1e-6
    assert out[1]["n"] == 4 and out[2]["n"] == 4


def test_seasonal_profile_hour_and_bad_period(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 5), 1.0), (2, datetime(2024, 1, 1, 5), 3.0),
         (3, datetime(2024, 1, 2, 9), 2.0)],
        "event_id long, ts timestamp, value double",
    )
    out = {r["bucket"]: r for r in seasonal_profile(df, "ts", "value", period="hour").collect()}
    assert out[5]["n"] == 2 and abs(out[5]["mean_value"] - 2.0) < 1e-9
    with pytest.raises(ValueError):
        seasonal_profile(df, "ts", "value", period="month")


def test_active_users_approx_within_rsd(spark):
    rng = __import__("numpy").random.RandomState(2)
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, int(rng.randint(0, 2000)), t0 + timedelta(days=int(rng.randint(0, 14))))
        for i in range(8000)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    exact = {r["day"]: (r["dau"], r["wau"], r["mau"]) for r in active_users(df).collect()}
    approx = {
        r["day"]: (r["dau"], r["wau"], r["mau"])
        for r in active_users(df, approx=True, approx_rsd=0.02).collect()
    }
    assert set(exact) == set(approx)
    for day, (d, w, m) in exact.items():
        ad, aw, am = approx[day]
        for e, a in ((d, ad), (w, aw), (m, am)):
            assert abs(a - e) <= max(5, 0.1 * e), (day, e, a)
