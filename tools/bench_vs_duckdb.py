"""Compare per-query wall clock: Spark (noop sink) vs DuckDB oracle at
the same scale factor. The BASELINE.md target is Spark within 2× of
DuckDB for the oracle-expressible operators.

Usage: python tools/bench_vs_duckdb.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from hippollm_spark.session import get_spark

    spark = get_spark("bench_vs_duckdb")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet"
            + ("/*.parquet" if os.path.isdir(f"{sf_dir}/{t}.parquet") else "")
            + "'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    print(f"{'query':24s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
    worst = []
    import gc

    for name, fn in qs.items():
        if only and name not in only:
            continue
        # bench.py's protocol, per query: one warm run (JIT, codegen,
        # python-worker spinup), then clear every cache/checkpoint block
        # so the timed run pays its own materialization but nobody
        # else's — without the clear, pins left by earlier queries
        # inflate later Spark walls 3-5x (measured: dedup_jaccard 15.7s
        # polluted vs ~3s isolated), corrupting the ratio this tool
        # exists to report.
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        except Exception:
            pass
        gc.collect()
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        t_s = time.time() - t0
        if name in oracles:
            # Warm-then-time for DuckDB too, but only when the first run
            # is fast: plan-compile/buffer-pool overhead only moves the
            # needle at sub-second scale, and some oracles are enormous
            # by design (graph_hits' unrolled HUGEINT recurrence runs
            # ~10 min at sf0.1 — re-running it doubles that for a
            # rounding-error correction).
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            t_d = time.time() - t0
            if t_d < 5.0:
                t0 = time.time()
                con.execute(oracles[name]).fetchall()
                t_d = time.time() - t0
            ratio = t_s / max(t_d, 1e-9)
            print(f"{name:24s} {t_s:8.2f} {t_d:8.2f} {ratio:7.1f}x")
            if ratio > 2:
                worst.append((ratio, name))
        else:
            print(f"{name:24s} {t_s:8.2f} {'--':>8s}")
    if worst:
        worst.sort(reverse=True)
        print("\nOVER 2x:", ", ".join(f"{n} ({r:.0f}x)" for r, n in worst))


if __name__ == "__main__":
    main()
