"""Round-10 probe: does a second co-located layout shape pay for the
q3/q18 join family at sf10?

Shapes measured (layout build EXCLUDED — paid once at write):
  A. plain          — the contract q_tpch_q18 / q_tpch_q3 (AQE plans)
  B. orderkey layout — lineitem+orders bucketed on the order key:
       q18: groupBy(l_orderkey) runs exchange-free on the bucketed
            lineitem, the big-orders join to orders is bucket-aligned,
            customer joins the having-collapsed rows (AQE).
       q3:  bucketed li⋈orders exchange-free; filtered customer joins
            the reduced result (AQE).
  C. custkey layout — orders ALSO saved bucketed on o_custkey +
       customer bucketed on c_custkey:
       q3:  customer⋈orders exchange-free on custkey; the result then
            shuffles on orderkey against the bucketed lineitem
            (one-side Exchange only).
DuckDB walls for the same logical queries are printed for the ratio.

Usage: python tools/coloc_shape_probe.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from hippollm_spark.operators import layout
from hippollm_spark.session import get_spark
from pyspark.sql import functions as F
from __spark_entry__ import _e6, _e6out, _e6sum, _t

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/spark-warehouse/sf10"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("coloc_shape_probe")
spark.range(1000).selectExpr("sum(id)").collect()

# ---- layouts (build time reported separately, excluded from walls) ----
t0 = time.time()
li_t, ord_t = "probe_li_ok", "probe_ord_ok"
ordc_t, cust_t = "probe_ord_ck", "probe_cust_ck"
layout.save_colocated(
    _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    ),
    li_t,
    "l_orderkey",
)
layout.save_colocated(
    _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority"
    ),
    ord_t,
    "o_orderkey",
)
layout.save_colocated(
    _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    ),
    ordc_t,
    "o_custkey",
)
layout.save_colocated(
    _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment"),
    cust_t,
    "c_custkey",
)
print(f"layout build: {time.time()-t0:.1f}s", file=sys.stderr)


def q18_plain(spark, sf):
    return entry_mod.queries()["tpch_q18"](spark, sf)


def q18_coloc(spark, sf):
    li = layout.read_colocated(spark, li_t)
    orders = layout.read_colocated(spark, ord_t)
    cust = _t(spark, sf, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_e6(F.col("l_quantity"))).alias("_sq"))
        .filter(F.col("_sq") > 300 * 1000000)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            _e6out(F.col("_sq")).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q3_plain(spark, sf):
    return entry_mod.queries()["tpch_q3"](spark, sf)


def _q3_agg(j):
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _e6out(F.sum(_e6(F.col("l_extendedprice") * (1 - F.col("l_discount")))))
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q3_coloc_ok(spark, sf):
    li = layout.read_colocated(spark, li_t).filter(
        F.col("l_shipdate") > F.lit("1998-06-01")
    )
    orders = layout.read_colocated(spark, ord_t).filter(
        F.col("o_orderdate") < F.lit("1998-06-01")
    )
    cust = _t(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, F.col("o_custkey") == cust.c_custkey
    )
    return _q3_agg(j)


def q3_coloc_ck(spark, sf):
    li = layout.read_colocated(spark, li_t).filter(
        F.col("l_shipdate") > F.lit("1998-06-01")
    )
    orders = layout.read_colocated(spark, ordc_t).filter(
        F.col("o_orderdate") < F.lit("1998-06-01")
    )
    cust = layout.read_colocated(spark, cust_t).filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    co = orders.join(cust, orders.o_custkey == cust.c_custkey)
    j = li.join(co, li.l_orderkey == co.o_orderkey)
    return _q3_agg(j)


VARIANTS = [
    ("q18_plain", q18_plain),
    ("q18_coloc", q18_coloc),
    ("q3_plain", q3_plain),
    ("q3_coloc_ok", q3_coloc_ok),
    ("q3_coloc_ck", q3_coloc_ck),
]

# warm every variant once
for name, fn in VARIANTS:
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

import gc

walls: dict[str, list[float]] = {n: [] for n, _ in VARIANTS}
for r in range(reps):
    for name, fn in VARIANTS:
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        walls[name].append(round(time.time() - t0, 3))

con = duckdb.connect()
for t in ["customer", "orders", "lineitem"]:
    p = f"{sf_dir}/{t}.parquet"
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{p}"
        + ("/*.parquet" if os.path.isdir(p) else "")
        + "'"
    )
oracles = entry_mod.oracle_sql()
duck: dict[str, list[float]] = {}
for name in ("tpch_q18", "tpch_q3"):
    duck[name] = []
    for r in range(reps):
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        duck[name].append(round(time.time() - t0, 3))

print("\n== spark walls (s) ==")
for name, ws in walls.items():
    print(f"  {name:14s} {ws}  median {sorted(ws)[len(ws)//2]}")
print("== duckdb walls (s) ==")
for name, ws in duck.items():
    print(f"  {name:14s} {ws}  median {sorted(ws)[len(ws)//2]}")
