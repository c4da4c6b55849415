"""Round-11 floor adjudication for the q5/q8/q9 ad-hoc join family
(VERDICT r10 next-round #2): after BOTH layout variants measured
negative on q9 (orderkey r10, partkey r11 — the part arm is
AQE-broadcast, so no partkey exchange even exists in the plan), the
family's residual vs DuckDB must be located. Method = the q22
retirement standard: time each query's INPUTS as bare count-only
scans with the query's own column projections and pushed filters,
interleaved same-process with the full queries and the DuckDB twins.
wall ≈ scans + irreducible-shuffle-delta ⇒ floor.

Usage: python tools/join_family_floor_probe.py [sf_dir] [reps]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from hippollm_spark.session import get_spark
from pyspark.sql import functions as F
from __spark_entry__ import _t

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/spark-warehouse/sf10"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark("join_family_floor_probe")
spark.range(1000).selectExpr("sum(id)").collect()
qs = entry_mod.queries()


def _scan(table, cols, flt=None):
    df = _t(spark, sf_dir, table)
    if flt is not None:
        df = df.filter(flt)
    return df.select(*cols).agg(*[F.count(c).alias(f"n_{c}") for c in cols])


def scans_q5():
    for t, cols, flt in [
        ("customer", ["c_custkey", "c_nationkey"], None),
        ("orders", ["o_orderkey", "o_custkey"], None),
        ("lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"], None),
        ("supplier", ["s_suppkey", "s_nationkey"], None),
    ]:
        _scan(t, cols, flt).collect()


def scans_q8():
    date = (F.col("o_orderdate") >= F.lit("1996-01-01")) & (
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    for t, cols, flt in [
        ("lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"], None),
        ("orders", ["o_orderkey", "o_custkey", "o_orderdate"], date),
        ("customer", ["c_custkey", "c_nationkey"], None),
        ("supplier", ["s_suppkey", "s_nationkey"], None),
    ]:
        _scan(t, cols, flt).collect()


def scans_q9():
    for t, cols, flt in [
        (
            "lineitem",
            ["l_partkey", "l_orderkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount"],
            None,
        ),
        ("part", ["p_partkey", "p_retailprice"], F.col("p_type") == "STANDARD"),
        ("orders", ["o_orderkey", "o_orderdate"], None),
        ("supplier", ["s_suppkey", "s_nationkey"], None),
    ]:
        _scan(t, cols, flt).collect()


VARIANTS = [
    ("q5_full", lambda: qs["tpch_q5"](spark, sf_dir).write.mode("overwrite").format("noop").save()),
    ("q5_scans", scans_q5),
    ("q8_full", lambda: qs["tpch_q8"](spark, sf_dir).write.mode("overwrite").format("noop").save()),
    ("q8_scans", scans_q8),
    ("q9_full", lambda: qs["tpch_q9"](spark, sf_dir).write.mode("overwrite").format("noop").save()),
    ("q9_scans", scans_q9),
]

for _, fn in VARIANTS:
    fn()  # warm

walls = {n: [] for n, _ in VARIANTS}
for r in range(reps):
    for name, fn in VARIANTS:
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.time()
        fn()
        walls[name].append(round(time.time() - t0, 3))

con = duckdb.connect()
for t in ["customer", "orders", "lineitem", "part", "supplier", "nation", "region"]:
    p = f"{sf_dir}/{t}.parquet"
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{p}"
        + ("/*.parquet" if os.path.isdir(p) else "")
        + "'"
    )
duck = {}
for name in ("tpch_q5", "tpch_q8", "tpch_q9"):
    duck[name] = []
    for r in range(reps):
        t0 = time.time()
        con.execute(entry_mod.oracle_sql()[name]).fetchall()
        duck[name].append(round(time.time() - t0, 3))

print("\n== spark walls (s) ==")
for name, ws in walls.items():
    print(f"  {name:10s} {ws}  median {sorted(ws)[len(ws)//2]}")
print("== duckdb walls (s) ==")
for name, ws in duck.items():
    print(f"  {name:10s} {ws}  median {sorted(ws)[len(ws)//2]}")
