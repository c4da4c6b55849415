"""Round-10 probe #2: the orderkey layout vs the remaining >2x ad-hoc
join rows (q5/q8/q9) at sf10. The deployment premise: the FULL fact
table is bucketed once at ingest (all columns), so every orderkey join
leaves lineitem unshuffled; dimension arms ride AQE.

Usage: python tools/coloc_family_probe.py [sf_dir] [reps]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from hippollm_spark.operators import layout
from hippollm_spark.session import get_spark
from pyspark.sql import functions as F
from __spark_entry__ import _e6sum, _e6out, _rnd, _t

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/spark-warehouse/sf10"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("coloc_family_probe")
spark.range(1000).selectExpr("sum(id)").collect()

t0 = time.time()
li_t = "probe_li_full"
layout.save_colocated(
    _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate",
    ),
    li_t,
    "l_orderkey",
)
print(f"full-li layout build: {time.time()-t0:.1f}s", file=sys.stderr)


def q9_coloc(spark, sf):
    li = layout.read_colocated(spark, li_t)
    part = _t(spark, sf, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey", "p_retailprice"
    )
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_e6out(_e6sum(profit)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q8_coloc(spark, sf):
    li = layout.read_colocated(spark, li_t)
    orders = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf, "nation")
    reg = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    cnat = (
        nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    snat = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ord_arm = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .select("o_orderkey", "o_orderdate")
    )
    base = (
        li.join(ord_arm, li.l_orderkey == ord_arm.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _e6sum(vol, cond=F.col("supp_nation") == "NATION_8").alias("_n"),
            _e6sum(vol).alias("_d"),
        )
        .select(
            "o_year",
            _rnd(
                F.coalesce(F.col("_n"), F.lit(0)).cast("double")
                / F.col("_d").cast("double"),
                6,
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def q5_coloc(spark, sf):
    """q5 with the orderkey-bucketed lineitem: the supplier reduction
    rides a broadcast (preserves bucketing), so the big orderkey join
    shuffles ONLY the reduced orders arm into the bucket layout —
    the fact side never exchanges (round-11 last unmeasured cell)."""
    li = layout.read_colocated(spark, li_t)
    cust = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf, "nation")
    reg = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    asia_nat = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    acust = cust.join(
        F.broadcast(asia_nat), cust.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", F.col("c_nationkey").alias("cnat"))
    asupp = supp.join(
        F.broadcast(asia_nat), supp.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", F.col("s_nationkey").alias("snat"))
    aorders = orders.join(acust, orders.o_custkey == acust.c_custkey).select(
        "o_orderkey", "cnat"
    )
    ali = li.join(asupp, li.l_suppkey == asupp.s_suppkey)
    return (
        ali.join(aorders, ali.l_orderkey == aorders.o_orderkey)
        .filter(F.col("cnat") == F.col("snat"))
        .join(F.broadcast(asia_nat), F.col("snat") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            _e6out(_e6sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


VARIANTS = [
    ("q9_plain", entry_mod.queries()["tpch_q9"]),
    ("q9_coloc", q9_coloc),
    ("q8_plain", entry_mod.queries()["tpch_q8"]),
    ("q8_coloc", q8_coloc),
    ("q5_plain", entry_mod.queries()["tpch_q5"]),
    ("q5_coloc", q5_coloc),
]

for name, fn in VARIANTS:
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

walls = {n: [] for n, _ in VARIANTS}
for r in range(reps):
    for name, fn in VARIANTS:
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
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
for name in ("tpch_q9", "tpch_q8"):
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

# value parity spot-check
a = sorted(tuple(r) for r in q9_coloc(spark, sf_dir).collect())
b = sorted(tuple(r) for r in entry_mod.queries()["tpch_q9"](spark, sf_dir).collect())
print("q9 parity:", a == b)
a = sorted(tuple(r) for r in q5_coloc(spark, sf_dir).collect())
b = sorted(tuple(r) for r in entry_mod.queries()["tpch_q5"](spark, sf_dir).collect())
print("q5 parity:", a == b)
a = sorted(tuple(r) for r in q8_coloc(spark, sf_dir).collect())
b = sorted(tuple(r) for r in entry_mod.queries()["tpch_q8"](spark, sf_dir).collect())
print("q8 parity:", a == b)
