"""As-of join and range join semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hippollm_spark.operators import temporal

T0 = dt.datetime(2024, 1, 1)


def ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", ts(10)),
            (2, "A", ts(20)),
            (3, "B", ts(5)),
            (4, "B", ts(0)),   # before any quote
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (100, "A", ts(9), 9.5),
            (101, "A", ts(10), 10.0),   # same instant as trade 1 → matched (<=)
            (102, "A", ts(15), 11.0),
            (103, "B", ts(4), 4.0),
            (104, "B", ts(4), 4.5),     # duplicate instant → tiebreak on id
        ],
        "quote_id long, sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward_semantics(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = temporal.asof_join(
        trades, quotes, on="ts", by="sym",
        right_cols=["quote_id", "px"], tiebreak="quote_id",
    )
    got = {r["trade_id"]: (r["quote_id_asof"], r["px_asof"]) for r in out.collect()}
    assert got[1] == (101, 10.0)   # equal timestamp matches
    assert got[2] == (102, 11.0)   # latest prior
    assert got[3] == (104, 4.5)    # tie at ts(4) → greatest quote_id
    assert got[4] == (None, None)  # nothing before
    assert out.count() == trades.count()  # left-join semantics


def test_asof_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 3, 50),
            "ts": rng.randint(0, 1000, 50).astype("datetime64[s]"),
        }
    ).assign(lid=range(50))
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 3, 40),
            "ts": rng.randint(0, 1000, 40).astype("datetime64[s]"),
        }
    ).assign(rid=range(40), val=rng.randn(40).round(3))
    # drop duplicate (k, ts) on the right so merge_asof's tie handling
    # can't differ from ours
    right = right.drop_duplicates(["k", "ts"])

    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    out = temporal.asof_join(
        sl, sr, on="ts", by="k", right_cols=["rid", "val"], tiebreak="rid"
    ).toPandas()

    expected = pd.merge_asof(
        left.sort_values(["ts", "lid"]),
        right.sort_values("ts"),
        on="ts", by="k", direction="backward",
    )
    e = {r.lid: r.rid for r in expected.itertuples()}
    g = {r.lid: r.rid_asof for r in out.itertuples()}
    for lid in e:
        ev = e[lid]
        gv = g[lid]
        assert (pd.isna(ev) and pd.isna(gv)) or ev == gv, (lid, ev, gv)


def test_range_join(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 15), (3, 25), (4, 99)], "pid long, x long"
    )
    intervals = spark.createDataFrame(
        [(10, 0, 10), (20, 10, 20), (30, 0, 30)], "iid long, lo long, hi long"
    )
    out = temporal.range_join(points, intervals, "x", "lo", "hi", bucket_width=8)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 10), (1, 30), (2, 20), (2, 30), (3, 30)]


def test_gap_fill_locf(spark):
    import datetime as dt

    from hippollm_spark.operators.temporal import gap_fill

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 0, 30), 10.0),
        (1, T(2024, 1, 1, 0, 45), 11.0),   # same bucket, later ts wins
        (1, T(2024, 1, 3, 12, 0), 30.0),   # 1-day gap on Jan 2
        (2, T(2024, 1, 5, 1, 0), 99.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = gap_fill(df, by="user_id", step="1 day", value_cols=["value"])
    got = {
        (r["user_id"], r["tick"].date().isoformat()): (r["value"], r["n_obs"])
        for r in out.collect()
    }
    assert got[(1, "2024-01-01")] == (11.0, 2)
    assert got[(1, "2024-01-02")] == (11.0, 0)   # gap filled by LOCF
    assert got[(1, "2024-01-03")] == (30.0, 1)
    assert got[(2, "2024-01-05")] == (99.0, 1)
    assert len(got) == 4


def test_gap_fill_null_observation_is_missing_not_shadowing(spark):
    """Round 11 (found by the sf3 sweep): a NULL value is a missing
    measurement — it must neither win a bucket whose later rows are
    null (the last VALID same-bucket reading wins) nor resurrect an
    older tick's value over it; a bucket that is ALL null falls back
    to LOCF from the previous tick."""
    import datetime as dt

    from hippollm_spark.operators.temporal import gap_fill

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 8, 0), 5.0),
        (1, T(2024, 1, 2, 8, 0), 7.0),    # valid reading on Jan 2...
        (1, T(2024, 1, 2, 9, 0), None),   # ...followed by a null row
        (1, T(2024, 1, 3, 8, 0), None),   # Jan 3: ONLY null rows
        (1, T(2024, 1, 4, 8, 0), 9.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = gap_fill(df, by="user_id", step="1 day", value_cols=["value"])
    got = {
        (r["user_id"], r["tick"].date().isoformat()): (r["value"], r["n_obs"])
        for r in out.collect()
    }
    assert got[(1, "2024-01-02")] == (7.0, 2)  # null didn't shadow 7.0
    assert got[(1, "2024-01-03")] == (7.0, 1)  # all-null bucket: LOCF
    assert got[(1, "2024-01-04")] == (9.0, 1)


def test_gap_fill_null_mode_leaves_gaps_null(spark):
    import datetime as dt

    from hippollm_spark.operators.temporal import gap_fill

    T = dt.datetime
    df = spark.createDataFrame(
        [(1, T(2024, 1, 1), 1.0), (1, T(2024, 1, 3), 3.0)],
        "user_id int, ts timestamp, value double",
    )
    out = gap_fill(df, by="user_id", step="1 day", fill="none")
    mid = [r for r in out.collect() if r["tick"].day == 2][0]
    assert mid["value"] is None and mid["n_obs"] == 0


def test_ewma_latest_fixed_point(spark):
    import datetime as dt

    from hippollm_spark.operators.temporal import ewma_latest

    base = dt.datetime(2024, 1, 1)
    vals = [4.0, 8.0, -8.0, 16.0]
    rows = [
        (i, 1, base + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = ewma_latest(df, "value", by="user_id").first()

    def tdiv(t, d):
        return t // d if t >= 0 else -((-t) // d)

    s = None
    for v in vals:
        x = round(v * 1e6)
        s = x if s is None else tdiv(x * 1 + s * 3, 4)
    assert got["n_obs"] == 4
    assert abs(got["ewma"] - round(s / 1e6, 6)) < 1e-12
    # sanity: close to the float recurrence
    f = vals[0]
    for v in vals[1:]:
        f = 0.25 * v + 0.75 * f
    assert abs(got["ewma"] - f) < 1e-3


def test_ohlc_bars_hand_computed(spark):
    from datetime import datetime

    from hippollm_spark.operators.temporal import ohlc_bars

    rows = [
        (1, datetime(2024, 1, 1, 9, 0, 5), "a", 10.0),
        (2, datetime(2024, 1, 1, 9, 30, 0), "a", 30.0),
        (3, datetime(2024, 1, 1, 9, 59, 59), "a", 20.0),
        (4, datetime(2024, 1, 1, 10, 1, 0), "a", 5.0),
        (5, datetime(2024, 1, 1, 9, 15, 0), "b", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, sym string, value double"
    )
    out = {
        (r["sym"], r["bucket"].hour): r
        for r in ohlc_bars(
            df, "ts", "value", by="sym", bucket="hour", id_col="event_id"
        ).collect()
    }
    bar = out[("a", 9)]
    assert (bar["open"], bar["high"], bar["low"], bar["close"]) == (
        10.0, 30.0, 10.0, 20.0,
    )
    assert bar["n"] == 3 and abs(bar["mean_value"] - 20.0) < 1e-9
    assert out[("a", 10)]["open"] == 5.0
    assert out[("b", 9)]["n"] == 1


def test_ohlc_bars_tie_broken_by_id(spark):
    from datetime import datetime

    from hippollm_spark.operators.temporal import ohlc_bars

    t = datetime(2024, 1, 1, 9, 0, 0)
    df = spark.createDataFrame(
        [(2, t, 99.0), (1, t, 11.0)], "event_id long, ts timestamp, value double"
    )
    bar = ohlc_bars(df, "ts", "value", id_col="event_id").first()
    assert bar["open"] == 11.0 and bar["close"] == 99.0


def test_ohlc_bars_wide_and_negative_ids(spark):
    """Ids beyond 1e12 used to truncate in the 12-wide pad; negative
    ids/pre-1970 timestamps used to order by the '-' sign."""
    from datetime import datetime

    from hippollm_spark.operators.temporal import ohlc_bars

    t = datetime(2024, 1, 1, 9, 0, 0)
    # 13-digit ids sharing a 12-char prefix: truncation made them tie
    df = spark.createDataFrame(
        [(9_999_999_999_991, t, 1.0), (9_999_999_999_990, t, 2.0)],
        "event_id long, ts timestamp, value double",
    )
    bar = ohlc_bars(df, "ts", "value", id_col="event_id").first()
    assert bar["open"] == 2.0 and bar["close"] == 1.0

    # negative vs positive id on the same timestamp
    df2 = spark.createDataFrame(
        [(-5, t, 7.0), (3, t, 8.0)], "event_id long, ts timestamp, value double"
    )
    bar2 = ohlc_bars(df2, "ts", "value", id_col="event_id").first()
    assert bar2["open"] == 7.0 and bar2["close"] == 8.0

    # pre-1970 timestamps order by instant, not by the '-' sign
    df3 = spark.createDataFrame(
        [(1, datetime(1969, 6, 1, 0, 0, 30), 4.0),
         (2, datetime(1969, 6, 1, 0, 0, 10), 6.0)],
        "event_id long, ts timestamp, value double",
    )
    bar3 = ohlc_bars(df3, "ts", "value", bucket="minute", id_col="event_id").first()
    assert bar3["open"] == 6.0 and bar3["close"] == 4.0


def test_ewma_latest_skips_null_observations(spark):
    """NULL values are skipped, not folded: the level after
    [10, NULL, 20] equals the level after [10, 20], and n_obs counts
    observed values only. Without the explicit filter the two engines
    disagreed (Spark's aggregate NULL-restart silently RESET the level
    mid-sequence; DuckDB's list_reduce poisoned the fold) — caught by
    the sf1 sweep over a NULL-bearing generated table."""
    from datetime import datetime

    from hippollm_spark.operators.temporal import ewma_latest

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    with_null = spark.createDataFrame(
        [(1, 1, t(1), 10.0), (2, 1, t(2), None), (3, 1, t(3), 20.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    without = spark.createDataFrame(
        [(1, 1, t(1), 10.0), (3, 1, t(3), 20.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    a = ewma_latest(with_null, "value", by="user_id").first()
    b = ewma_latest(without, "value", by="user_id").first()
    assert a["ewma"] == b["ewma"] and a["n_obs"] == 2 == b["n_obs"]
    # all-NULL user contributes no output row
    only_null = spark.createDataFrame(
        [(1, 9, t(1), None)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    assert ewma_latest(only_null, "value", by="user_id").count() == 0
