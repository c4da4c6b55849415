"""Weighted corpus interleaving and lag autocorrelation."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest

from hippollm_spark.operators.sampling import interleave_corpora
from hippollm_spark.operators.temporal import autocorrelation


def test_interleave_ratio_and_determinism(spark):
    rows = [(i, "big") for i in range(300)] + [
        (1000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, corpus string")
    out = interleave_corpora(df, "corpus", {"big": 3, "small": 1})
    seq = [
        r["corpus"]
        for r in out.orderBy("mix_key", "corpus", "mix_rank").collect()
    ]
    # every prefix holds roughly a 3:1 ratio
    for cut in (40, 200, 400):
        big = seq[:cut].count("big")
        assert abs(big / cut - 0.75) < 0.08, (cut, big)
    # deterministic under repartition
    seq2 = [
        r["corpus"]
        for r in interleave_corpora(df.repartition(7), "corpus", {"big": 3, "small": 1})
        .orderBy("mix_key", "corpus", "mix_rank")
        .collect()
    ]
    assert seq == seq2


def test_interleave_drops_unweighted_and_validates(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, corpus string"
    )
    out = interleave_corpora(df, "corpus", {"a": 1, "b": 2})
    assert sorted(r["corpus"] for r in out.collect()) == ["a", "b"]
    with pytest.raises(ValueError):
        interleave_corpora(df, "corpus", {"a": 0})


def _acf_reference(xs, k):
    x = np.array(xs[k:], dtype=float)
    y = np.array(xs[:-k], dtype=float)
    return float(np.corrcoef(x, y)[0, 1])


def test_autocorrelation_matches_numpy(spark):
    rng = np.random.RandomState(6)
    t0 = datetime(2024, 1, 1)
    # AR(1)-ish series: strong lag-1 correlation
    xs = [0.0]
    for _ in range(199):
        xs.append(0.8 * xs[-1] + rng.randn())
    xs = [round(v, 4) for v in xs]
    rows = [(i, 1, t0 + timedelta(minutes=i), float(v)) for i, v in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        r["lag"]: r for r in autocorrelation(df, "value", [1, 5]).collect()
    }
    assert out[1]["n_pairs"] == 199
    assert abs(out[1]["acf"] - _acf_reference(xs, 1)) < 1e-4
    assert abs(out[5]["acf"] - _acf_reference(xs, 5)) < 1e-4
    assert out[1]["acf"] > 0.6 > abs(out[5]["acf"] - out[1]["acf"] ** 5) + 0.0 - 1  # sanity


def test_autocorrelation_constant_series_null(spark):
    t0 = datetime(2024, 1, 1)
    rows = [(i, 1, t0 + timedelta(seconds=i), 5.0) for i in range(10)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    assert autocorrelation(df, "value", [1]).first()["acf"] is None
