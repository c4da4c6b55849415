"""CUSUM changepoint and Cramér's V vs reference computations."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import numpy as np

from hippollm_spark.operators.stats import association_chi2
from hippollm_spark.operators.temporal import cusum_changepoint


def _cusum_reference(xs):
    e6 = [round(x * 1e6) for x in xs]
    tot, n = sum(e6), len(e6)
    q = (abs(tot) - abs(tot) % n) // n
    mu = -q if tot < 0 else q
    best, pos, run = -1, None, 0
    for i, v in enumerate(e6, 1):
        run += v
        s = abs(run - i * mu)
        if s > best:
            best, pos = s, i
    return best / 1e6, pos


def test_cusum_detects_level_shift(spark):
    t0 = datetime(2024, 1, 1)
    xs = [10.0] * 30 + [14.0] * 30  # shift at index 30
    rows = [
        (i, 1, t0 + timedelta(minutes=i), float(v)) for i, v in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    r = cusum_changepoint(df, "value", by="user_id").first()
    want_max, want_pos = _cusum_reference(xs)
    assert abs(r["cusum_max"] - want_max) < 1e-9
    assert r["change_pos"] == want_pos == 30  # S peaks exactly at the shift
    assert r["n_obs"] == 60


def test_cusum_matches_reference_on_noise(spark):
    rng = np.random.RandomState(3)
    t0 = datetime(2024, 1, 1)
    per_key = {}
    rows = []
    eid = 0
    for k in [1, 2]:
        xs = list(np.round(rng.randn(80) * 5 + (k * 3), 3))
        per_key[k] = xs
        for i, v in enumerate(xs):
            rows.append((eid, k, t0 + timedelta(seconds=i), float(v)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {r["user_id"]: r for r in cusum_changepoint(df, "value").collect()}
    for k, xs in per_key.items():
        want_max, want_pos = _cusum_reference(xs)
        assert abs(out[k]["cusum_max"] - want_max) < 1e-9, k
        assert out[k]["change_pos"] == want_pos, k


def test_cusum_negative_values_mean_wrap(spark):
    t0 = datetime(2024, 1, 1)
    xs = [-5.0, -5.0, -5.0, 1.0]  # negative total exercises the sign wrap
    rows = [(i, 1, t0 + timedelta(seconds=i), v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    r = cusum_changepoint(df, "value").first()
    want_max, want_pos = _cusum_reference(xs)
    assert abs(r["cusum_max"] - want_max) < 1e-9
    assert r["change_pos"] == want_pos


def _cramers_reference(pairs):
    from collections import Counter

    n = len(pairs)
    obs = Counter(pairs)
    ra = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    chi2 = 0.0
    for a in ra:
        for b in cb:
            e = ra[a] * cb[b] / n
            o = obs.get((a, b), 0)
            chi2 += round((o - e) ** 2 / e, 6)
    v = math.sqrt(chi2 / (n * min(len(ra) - 1, len(cb) - 1)))
    return chi2, v


def test_cramers_v_matches_reference(spark):
    rng = np.random.RandomState(7)
    pairs = []
    for _ in range(400):
        a = rng.choice(["x", "y", "z"])
        # b correlated with a
        b = a.upper() if rng.rand() < 0.6 else rng.choice(["X", "Y", "Z"])
        pairs.append((str(a), str(b)))
    df = spark.createDataFrame(pairs, "a string, b string")
    r = association_chi2(df, "a", "b").first()
    chi2, v = _cramers_reference(pairs)
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-6
    assert abs(r["cramers_v"] - round(v, 6)) < 1e-6
    assert r["dof"] == 4 and r["n"] == 400


def test_cramers_v_independent_near_zero_and_perfect(spark):
    perfect = [("a", "A"), ("b", "B")] * 50
    r = association_chi2(
        spark.createDataFrame(perfect, "a string, b string"), "a", "b"
    ).first()
    assert abs(r["cramers_v"] - 1.0) < 1e-6

    indep = [(x, y) for x in "ab" for y in "AB"] * 25
    r2 = association_chi2(
        spark.createDataFrame(indep, "a string, b string"), "a", "b"
    ).first()
    assert r2["chi2"] == 0.0
