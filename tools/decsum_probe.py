"""One-off probe: per-row summable representations for the TPC-H
scan-aggregates (judge r8 item 1). Compares wall clock of tpch_q1's
aggregation shape at a given sf_dir under:

  dec3810  — current: cast(double AS DECIMAL(38,10)), sum
  dec186   — cast(double AS DECIMAL(18,6)) (long-backed), sum
  e6long   — floor(x*1e6 + 0.5) BIGINT units, sum(long)
  e6dec    — floor(x*1e6 + 0.5) BIGINT -> DECIMAL(38,0), sum
  double   — plain double sum (lower bound; NOT cross-engine exact)

Usage: python tools/decsum_probe.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hippollm_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "spark-warehouse/sf10"
    spark = get_spark("decsum_probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))

    def e6(c):
        return F.floor(c * F.lit(1000000.0) + F.lit(0.5))

    reps = {
        "dec3810": lambda c: c.cast("decimal(38,10)"),
        "dec186": lambda c: c.cast("decimal(18,6)"),
        "e6long": e6,
        "e6dec": lambda c: e6(c).cast("decimal(38,0)"),
        "double": lambda c: c,
    }

    def e6sum_split(c):
        # lo via two's-complement AND: identical value to
        # e - (e >> 20) * 2^20 (incl. negatives), but the shallower
        # tree keeps the agg at the plain-long-sum floor (0.67 s vs
        # 0.85 s for the subtract form at sf10)
        e = e6(c)
        hi = F.shiftright(e, 20)
        lo = e.bitwiseAND(F.lit(1048575))
        return (
            F.sum(hi).cast("decimal(38,0)") * F.lit(1 << 20)
            + F.sum(lo).cast("decimal(38,0)")
        )

    def build(rep):
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(rep(F.col("l_quantity"))).alias("sum_qty"),
                F.sum(rep(F.col("l_extendedprice"))).alias("sum_base_price"),
                F.sum(rep(disc)).alias("sum_disc_price"),
                F.sum(rep(charge)).alias("sum_charge"),
                F.count("*").alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    q_split = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            e6sum_split(F.col("l_quantity")).alias("sum_qty"),
            e6sum_split(F.col("l_extendedprice")).alias("sum_base_price"),
            e6sum_split(disc).alias("sum_disc_price"),
            e6sum_split(charge).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )

    for name, q in [(n, build(r)) for n, r in reps.items()] + [("e6split", q_split)]:
        q.write.mode("overwrite").format("noop").save()  # warm
        walls = []
        for _ in range(3):
            t0 = time.time()
            q.write.mode("overwrite").format("noop").save()
            walls.append(time.time() - t0)
        print(f"{name:8s} {min(walls):6.2f}s  (runs: {' '.join(f'{w:.2f}' for w in walls)})")


if __name__ == "__main__":
    main()
