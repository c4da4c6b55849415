"""Crossover probe: Spark-vs-DuckDB wall clock on IDENTICAL parquet as
row count grows.

tools/bench_vs_duckdb.py at sf0.1 (600k rows) is dominated by Spark's
fixed DAG-scheduling floor (~0.3-1 s/stage locally) — an embedded
single-process engine wins any sub-second query by default. This probe
measures where the curves cross by generating the same lineitem-shaped
table at several sizes in /tmp (the driver's testdata is read-only) and
timing two representative shapes on both engines:

- q1-style group-aggregate (the classic scan+agg workload)
- window rank per group (sort-heavy shape)

Usage: python tools/crossover_probe.py [sizes_csv]   # default 600000,6000000,60000000
Appends one JSON line per (size, query, engine) to stdout; the summary
table feeds DESIGN.md §5.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                  AS sum_qty,
           sum(l_extendedprice)             AS sum_base,
           sum(l_extendedprice * (1 - l_discount)) AS sum_disc,
           avg(l_quantity)                  AS avg_qty,
           count(*)                         AS n
    FROM li
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""

WINDOW_SQL = """
    SELECT * FROM (
        SELECT l_returnflag, l_orderkey, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice DESC, l_orderkey) AS rk
        FROM li
    ) WHERE rk <= 5
"""


def gen(spark, n: int, path: str) -> None:
    """Deterministic lineitem-shaped table, fully JVM-generated."""
    h = lambda m: F.pmod(F.xxhash64("id"), F.lit(m))  # noqa: E731
    (
        spark.range(n)
        .select(
            F.col("id").alias("l_orderkey"),
            (h(50) + 1).cast("double").alias("l_quantity"),
            ((h(100000) + 1) / 100.0).alias("l_extendedprice"),
            (h(11) / 100.0).alias("l_discount"),
            F.element_at(
                F.array(F.lit("A"), F.lit("N"), F.lit("R")), (h(3) + 1).cast("int")
            ).alias("l_returnflag"),
            F.element_at(
                F.array(F.lit("F"), F.lit("O")), (h(2) + 1).cast("int")
            ).alias("l_linestatus"),
            F.date_add(F.lit("1995-01-01"), h(1500).cast("int")).alias("l_shipdate"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else
                              "600000,6000000,60000000").split(",")]
    from hippollm_spark.session import get_spark

    import duckdb

    spark = get_spark("crossover_probe")
    tmp = tempfile.mkdtemp(prefix="crossover_")
    results = []
    try:
        for n in sizes:
            path = f"{tmp}/li_{n}"
            gen(spark, n, path)
            sdf = spark.read.parquet(path)
            sdf.createOrReplaceTempView("li")
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW li AS SELECT * FROM read_parquet('{path}/*.parquet')"
            )
            for qname, sql in (("q1_agg", Q1_SQL), ("window_top5", WINDOW_SQL)):
                # steady state: best of 3 (post-JIT; a resident cluster
                # and a resident duckdb process both run warm)
                t_s = min(
                    _time(lambda: spark.sql(sql).collect()) for _ in range(3)
                )
                t_d = min(_time(lambda: con.execute(sql).fetchall()) for _ in range(3))
                rec = {"rows": n, "query": qname, "spark_s": round(t_s, 3),
                       "duckdb_s": round(t_d, 3),
                       "ratio": round(t_s / t_d, 2)}
                results.append(rec)
                print(json.dumps(rec), flush=True)
            con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print("\nrows        query         spark    duckdb   spark/duckdb")
    for r in results:
        print(f"{r['rows']:<11,} {r['query']:<13} {r['spark_s']:>6.2f}s "
              f"{r['duckdb_s']:>7.2f}s   {r['ratio']:>6.2f}x")


def _time(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
