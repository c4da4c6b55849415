"""Invariants of the e6 BIGINT fixed-point money-sum discipline
(round 9, `__spark_entry__._e6/_e6sum/_rnd` — the replacement for the
DECIMAL(38,10) cast that forced Spark's BigDecimal aggregation path):

1. the hi/lo-split sum equals the exact integer sum of the per-row e6
   units, including negatives (shiftright is arithmetic = floor
   division; `& 0xFFFFF` = mod 2^20 in [0, 2^20));
2. the split survives magnitudes where a plain long sum would
   overflow (the 100-TB case the split exists for);
3. `_rnd`'s floor-rendering agrees with DuckDB's identical expression
   on the exact .xx5 boundary doubles where round() diverges between
   the engines (the q10 307843.595 regression caught by the first
   post-e6 sweep).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


def test_e6sum_equals_exact_integer_sum(spark):
    vals = [
        0.0,
        0.005,
        -0.005,
        1.115,
        -1.115,
        104999.91,
        -999.99,
        0.3,
        123456.789012,
        -123456.789012,
        2.675,
        1e-7,
        -1e-7,
    ] * 7
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(entry._e6sum(F.col("x")).alias("s")).first()["s"]
    exact = sum(math.floor(v * 1000000.0 + 0.5) for v in vals)
    assert int(got) == exact


def test_e6sum_conditional_matches_filtered_sum(spark):
    df = spark.createDataFrame(
        [(float(i) + 0.115, i % 3) for i in range(100)], "x double, g int"
    )
    got = df.agg(
        entry._e6sum(F.col("x"), cond=F.col("g") == 0).alias("s")
    ).first()["s"]
    exact = sum(
        math.floor((float(i) + 0.115) * 1000000.0 + 0.5)
        for i in range(100)
        if i % 3 == 0
    )
    assert int(got) == exact
    # no row matches -> NULL, like sum(when(...)) with no otherwise
    none = df.agg(
        entry._e6sum(F.col("x"), cond=F.col("g") == 99).alias("s")
    ).first()["s"]
    assert none is None


def test_e6sum_units_survive_long_overflow(spark):
    """1000 rows of ~2^62 e6 units: a plain sum(long) wraps past
    2^63, the hi/lo split recombines exactly in DECIMAL(38,0)."""
    unit = (1 << 62) + 987654321
    df = spark.createDataFrame([(unit,)] * 1000, "e long")
    got = df.agg(entry._e6sum(F.col("e"), units=True).alias("s")).first()["s"]
    assert int(got) == 1000 * unit  # = ~4.6e21, far past long max


def test_rnd_matches_duckdb_floor_formula_on_xx5_boundaries(spark):
    """The doubles where Spark round() (shortest-repr HALF_UP) and
    DuckDB round() (exact binary) DISAGREE must render identically
    under the shared floor formula."""
    vals = [307843.595, 2.675, 0.125, -2.675, 1.005, 999999.995, 0.0, -0.005]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["x"]: r["r"]
        for r in df.select("x", entry._rnd(F.col("x"), 2).alias("r")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        duck = con.execute(
            f"SELECT floor(({v!r})::DOUBLE * 100.0 + 0.5) / 100.0"
        ).fetchone()[0]
        assert got[v] == duck, (v, got[v], duck)
    # and the motivating case really is a round() divergence
    spark_round = (
        spark.createDataFrame([(307843.595,)], "x double")
        .select(F.round("x", 2).alias("r"))
        .first()["r"]
    )
    duck_round = con.execute("SELECT round(307843.595::DOUBLE, 2)").fetchone()[0]
    assert spark_round != duck_round  # the trap _rnd exists to remove


def test_e6_engine_parity_on_duckdb(spark):
    """Per-row e6 units are bit-identical across engines for the same
    doubles (identical IEEE *1e6+0.5 then floor)."""
    vals = [0.3, 0.005, -0.005, 104999.91, 1.115, -1.115, 3.000000499]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["x"]: r["e"]
        for r in df.select("x", entry._e6(F.col("x")).alias("e")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        duck = con.execute(
            f"SELECT CAST(floor(({v!r})::DOUBLE * 1000000.0 + 0.5) AS BIGINT)"
        ).fetchone()[0]
        assert got[v] == duck, (v, got[v], duck)
