"""Round-11 probe: the LAST unmeasured layout variant for the >2x
ad-hoc join family (VERDICT r10 next-round #2) — a PARTKEY-bucketed
lineitem copy feeding q9's part join. Round 10 measured the orderkey
layout on q9 (does NOT pay: the wall is the partkey/suppkey shuffles);
this measures whether buying the partkey exchange instead does.

Deployment premise mirrored from the orderkey layout: lineitem and
part are each bucketed once at ingest on the part key; q9's heaviest
single exchange (the 60M-row fact shuffle onto partkey) then
disappears — the li⋈part join is bucket-local. The orderkey and
suppkey joins still shuffle the (part-filtered, ~1/5) join output.

Usage: python tools/coloc_partkey_probe.py [sf_dir] [reps]
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
from __spark_entry__ import _e6sum, _e6out, _t

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/spark-warehouse/sf10"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("coloc_partkey_probe")
spark.range(1000).selectExpr("sum(id)").collect()

t0 = time.time()
li_t, part_t = "probe_li_pk", "probe_part_pk"
layout.save_colocated(
    _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    ),
    li_t,
    "l_partkey",
)
layout.save_colocated(
    _t(spark, sf_dir, "part").select("p_partkey", "p_type", "p_retailprice"),
    part_t,
    "p_partkey",
)
print(f"partkey layout build: {time.time()-t0:.1f}s", file=sys.stderr)


def q9_pk(spark, sf):
    li = layout.read_colocated(spark, li_t)
    part = layout.read_colocated(spark, part_t).filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey", "p_retailprice")
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


VARIANTS = [
    ("q9_plain", entry_mod.queries()["tpch_q9"]),
    ("q9_partkey", q9_pk),
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
for t in ["orders", "lineitem", "part", "supplier", "nation"]:
    p = f"{sf_dir}/{t}.parquet"
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{p}"
        + ("/*.parquet" if os.path.isdir(p) else "")
        + "'"
    )
duck = []
for r in range(reps):
    t0 = time.time()
    con.execute(entry_mod.oracle_sql()["tpch_q9"]).fetchall()
    duck.append(round(time.time() - t0, 3))

print("\n== spark walls (s) ==")
for name, ws in walls.items():
    print(f"  {name:12s} {ws}  median {sorted(ws)[len(ws)//2]}")
print(f"== duckdb q9 == {duck}  median {sorted(duck)[len(duck)//2]}")

# exchange count in the physical plan of the part join stage
plan = q9_pk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
print("q9_pk plan Exchange count:", plan.count("Exchange"))

# value parity
a = sorted(tuple(r) for r in q9_pk(spark, sf_dir).collect())
b = sorted(tuple(r) for r in entry_mod.queries()["tpch_q9"](spark, sf_dir).collect())
print("q9 parity:", a == b)
