"""Parity tests for tools/check_oracle.py --engine: the engine-side
canonical-row digest (per-row string → md5 → two little-endian 64-bit
halves → order-insensitive DECIMAL sums) must agree between Spark and
DuckDB on every supported column type, because at sf1+ it replaces the
driver-side toPandas() comparison entirely (emb_dup_pairs at sf1 is
44 M rows — uncollectable under spark.driver.maxResultSize)."""

from __future__ import annotations

import datetime
import hashlib
import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_oracle import UnsupportedType, _duck_digest, _spark_digest  # noqa: E402


def _duck_con():
    return duckdb.connect()


def test_md5_le_halves_match_duckdb_number_functions(spark):
    """The Spark byte-pair-reversed conv() must equal DuckDB's
    md5_number_upper/lower for the same input string."""
    from pyspark.sql import functions as F

    s = "hello|world|1.000000"
    df = spark.createDataFrame([(s,)], "v string")
    md5 = F.md5("v")

    def le(lo):
        return F.conv(
            F.concat(*[F.substring(md5, i, 2) for i in range(lo + 14, lo - 1, -2)]),
            16,
            10,
        ).cast("decimal(38,0)")

    row = df.select(le(1).alias("a"), le(17).alias("b")).first()
    drow = _duck_con().execute(
        "SELECT md5_number_upper(?), md5_number_lower(?)", [s, s]
    ).fetchone()
    assert (int(row["a"]), int(row["b"])) == (int(drow[0]), int(drow[1]))
    # and both agree with a reference little-endian parse of hashlib
    h = hashlib.md5(s.encode()).hexdigest()
    assert int(row["a"]) == int.from_bytes(bytes.fromhex(h[:16]), "little")
    assert int(row["b"]) == int.from_bytes(bytes.fromhex(h[16:]), "little")


def test_engine_digest_parity_all_types(spark):
    """One row set covering every supported type — floats (incl. NaN,
    ±inf, NULL, negative zero), ints with NULL, strings containing the
    '|' separator, booleans, DuckDB DATE vs Spark midnight TIMESTAMP
    (the fetchdf conflation the pandas path bakes in), timestamps with
    and without microseconds, float arrays and int arrays — must
    digest identically in both engines."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(
        [
            (
                1,
                0.35,
                "plain",
                True,
                datetime.datetime(2024, 1, 2),
                datetime.datetime(2024, 1, 2, 3, 4, 5),
                [1.5, 2.25],
                [1, 2, 3],
            ),
            (
                2,
                float("nan"),
                "with|pipe",
                False,
                datetime.datetime(1999, 12, 31),
                datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
                [float("nan")],
                [],
            ),
            (
                3,
                float("inf"),
                None,
                None,
                None,
                None,
                None,
                None,
            ),
            (4, float("-inf"), "", True, None, None, [], [0]),
            (5, None, "neg zero next", False, None, None, [-0.0], [-1]),
            (6, -0.0, "x", True, None, None, [3.0], [7]),
            # large magnitudes where ulp > 1e-6: Java's %.6f pads the
            # SHORTEST repr while printf rounds the exact binary value
            # (81175716847.35 is really …847.350006103515625) — the
            # split-digit renderer must agree on the exact digits
            (7, 81175716847.35, "big", False, None, None,
             [81175716847.35, -81175716847.35], [9]),
            (8, -977.0775, "half-ulp", True, None, None,
             [1e15 + 0.1250001], []),
        ],
        "i long, d double, s string, b boolean, dt timestamp, ts timestamp, "
        "ad array<double>, ai array<bigint>",
    )
    con = _duck_con()
    con.execute(
        """
        CREATE TABLE t AS
        SELECT * FROM (VALUES
          (1, 0.35::DOUBLE, 'plain', TRUE, DATE '2024-01-02',
           TIMESTAMP '2024-01-02 03:04:05', [1.5, 2.25]::DOUBLE[],
           [1, 2, 3]::BIGINT[]),
          (2, 'nan'::DOUBLE, 'with|pipe', FALSE, DATE '1999-12-31',
           TIMESTAMP '2024-01-02 03:04:05.123456', ['nan'::DOUBLE],
           []::BIGINT[]),
          (3, 'infinity'::DOUBLE, NULL, NULL, NULL, NULL, NULL, NULL),
          (4, '-infinity'::DOUBLE, '', TRUE, NULL, NULL, []::DOUBLE[],
           [0]::BIGINT[]),
          (5, NULL, 'neg zero next', FALSE, NULL, NULL,
           [-(0.0::DOUBLE)]::DOUBLE[], [-1]::BIGINT[]),
          (6, -0.0::DOUBLE, 'x', TRUE, NULL, NULL, [3.0]::DOUBLE[],
           [7]::BIGINT[]),
          (7, 81175716847.35::DOUBLE, 'big', FALSE, NULL, NULL,
           [81175716847.35::DOUBLE, -81175716847.35::DOUBLE],
           [9]::BIGINT[]),
          (8, -977.0775::DOUBLE, 'half-ulp', TRUE, NULL, NULL,
           [1e15 + 0.1250001]::DOUBLE[], []::BIGINT[])
        ) v(i, d, s, b, dt, ts, ad, ai)
        """
    )
    s_n, s_a, s_b, s_cols = _spark_digest(sdf)
    o_n, o_a, o_b, o_cols = _duck_digest(con, "SELECT * FROM t")
    assert s_cols == o_cols
    assert s_n == o_n == 8
    assert (s_a, s_b) == (o_a, o_b)


def test_engine_digest_detects_value_difference(spark):
    """A single changed cell must flip the digest (no silent pass)."""
    sdf = spark.createDataFrame([(1, "a"), (2, "b")], "i long, s string")
    con = _duck_con()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, 'a'), (2, 'X')) v(i, s)")
    s = _spark_digest(sdf)
    o = _duck_digest(con, "SELECT * FROM t")
    assert s[0] == o[0]  # same row count
    assert (s[1], s[2]) != (o[1], o[2])


def test_engine_digest_order_insensitive(spark):
    """Row order must not affect the digest (sum combine)."""
    a = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "i long, s string")
    b = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "i long, s string")
    assert _spark_digest(a)[1:3] == _spark_digest(b)[1:3]


def test_engine_digest_unsupported_type_raises(spark):
    from pyspark.sql import functions as F

    sdf = spark.range(1).select(F.struct(F.col("id")).alias("st"))
    with pytest.raises(UnsupportedType):
        _spark_digest(sdf)


def test_engine_digest_empty_result(spark):
    sdf = spark.createDataFrame([], "i long, s string")
    con = _duck_con()
    s = _spark_digest(sdf)
    o = _duck_digest(con, "SELECT 1::BIGINT AS i, 'x' AS s WHERE FALSE")
    assert s == o == (0, 0, 0, ["i", "s"])


def test_split_ctes_tolerates_inter_cte_comments():
    """ADVICE r9: a -- comment between a CTE's closing paren/comma and
    the next CTE head must not knock the statement back to the
    monolithic path — exactly the big MATERIALIZED oracles the
    temp-table spill fix targets carry such comments."""
    from check_oracle import _split_ctes

    sql = """
        WITH a AS MATERIALIZED (SELECT 1 AS x),
        -- comment between comma and next head
        b AS MATERIALIZED (
            SELECT x + 1 AS y FROM a  -- trailing body comment
        )
        -- comment before the comma itself
        , c AS (SELECT * FROM b)
        SELECT * FROM c
    """
    parsed = _split_ctes(sql)
    assert parsed is not None
    ctes, final = parsed
    assert [n for n, _ in ctes] == ["a", "b", "c"]
    assert final.strip().startswith("SELECT * FROM c")

    # and the real heavy oracle that motivated the fix splits too
    import __spark_entry__ as entry

    parsed2 = _split_ctes(entry.oracle_sql()["doc_containment"])
    assert parsed2 is not None and len(parsed2[0]) >= 3
