"""Crossover probe: unpartitioned row_number window vs
ranks.distributed_rank as rows grow.

The window funnels every row through ONE task (single-partition sort);
the distributed form pays two extra tiny jobs + a localCheckpoint but
sorts range slices in parallel. This prints the wall-clock pair at
increasing row counts so DESIGN.md can cite the crossover — the same
methodology as tools/crossover_probe.py.

Usage: python tools/rank_scale_probe.py [max_rows_millions]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from hippollm_spark.operators.ranks import distributed_rank
from hippollm_spark.session import get_spark


def main() -> None:
    max_m = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    spark = get_spark("rank_scale_probe")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm

    sizes = [m for m in (1, 6, 20, 60) if m <= max_m]
    print(f"{'rows':>8} {'window_s':>9} {'distrib_s':>10} {'ratio':>6}")
    for m in sizes:
        n = m * 1_000_000
        base = spark.range(n).select(
            F.col("id"), ((F.col("id") * 2654435761) % 1_000_003).alias("v")
        )

        def run(df):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            return time.time() - t0

        w = Window.orderBy("v", "id")
        t_win = run(base.withColumn("rk", F.row_number().over(w)))
        t_dist = run(distributed_rank(base, ["v", "id"], rank_col="rk"))
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        except Exception:
            pass
        print(f"{n:>8} {t_win:>9.2f} {t_dist:>10.2f} {t_win / t_dist:>6.2f}")


if __name__ == "__main__":
    main()
