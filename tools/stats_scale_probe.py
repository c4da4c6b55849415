"""Scale probe for the statistics / governance operators added in this
round: synthetic data generated at runtime in /tmp, measuring k-core,
PCA, chi-square keywords, Welch/AUC/OLS aggregates, and the sharded
global shuffle at multi-million-row scale. Results feed DESIGN.md §4.

Usage: python tools/stats_scale_probe.py [n_rows] [n_edges] [n_vecs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    from hippollm_spark.session import get_spark

    spark = get_spark("stats_scale_probe")
    tmp = tempfile.mkdtemp(prefix="stats_probe_")

    # ---- wide numeric fact table: n_rows of (group, x, y, arm, ok) ----
    t0 = time.time()
    (
        spark.range(n_rows)
        .select(
            F.concat(F.lit("g"), F.pmod(F.xxhash64("id"), F.lit(50))).alias("g"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)) / 10.0).alias("x"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100000)) / 100.0).alias("y"),
            F.when(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(2)) == 0, "control")
            .otherwise("treat")
            .alias("arm"),
            (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(10)) < 3).alias("ok"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/facts")
    )
    facts = spark.read.parquet(f"{tmp}/facts")
    print(f"gen {facts.count():,} fact rows: {time.time()-t0:.1f}s")

    from hippollm_spark.operators.stats import (
        conversion_chi2,
        correlation_matrix,
        grouped_auc,
        linear_fit,
        welch_t_test,
    )

    t0 = time.time()
    linear_fit(facts, "x", "y", "g").write.mode("overwrite").format("noop").save()
    print(f"linear_fit, {n_rows:,} rows x 50 groups: {time.time()-t0:.1f}s")

    t0 = time.time()
    correlation_matrix(facts, ["x", "y"], "g").write.mode("overwrite").format(
        "noop"
    ).save()
    print(f"correlation_matrix: {time.time()-t0:.1f}s")

    t0 = time.time()
    welch_t_test(facts, "arm", "y", "control", "treat", by="g").write.mode(
        "overwrite"
    ).format("noop").save()
    print(f"welch_t_test: {time.time()-t0:.1f}s")

    t0 = time.time()
    conversion_chi2(facts, "arm", "ok", by="g").write.mode("overwrite").format(
        "noop"
    ).save()
    print(f"conversion_chi2: {time.time()-t0:.1f}s")

    t0 = time.time()
    grouped_auc(facts, "y", "ok", "g").write.mode("overwrite").format(
        "noop"
    ).save()
    print(f"grouped_auc (window rank): {time.time()-t0:.1f}s")

    # ---- graph: k-core over hub-skewed edges ----
    t0 = time.time()
    (
        spark.range(n_edges)
        .select(
            F.concat(F.lit("v"), F.pmod(F.xxhash64("id"), F.lit(200_000))).alias(
                "src"
            ),
            F.concat(
                F.lit("v"),
                F.pmod(
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(200_000))
                    * F.pmod(F.xxhash64("id", F.lit(2)), F.lit(200_000)),
                    F.lit(200_000),
                ),
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .write.mode("overwrite")
        .parquet(f"{tmp}/edges")
    )
    e = spark.read.parquet(f"{tmp}/edges")
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    print(f"gen {e.count():,} edges: {time.time()-t0:.1f}s")

    from hippollm_spark.operators.graph import k_core

    t0 = time.time()
    n_core = k_core(sym, 20, rounds=6).count()
    print(f"k_core(20), 6 rounds, {n_edges:,} edges: {time.time()-t0:.1f}s "
          f"({n_core:,} core vertices)")

    # ---- vectors: PCA fit + project ----
    t0 = time.time()
    (
        spark.range(n_vecs)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.pmod(F.xxhash64("id", i), F.lit(2000)) / 1000.0 - 1.0,
            ).alias("embedding"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/vecs")
    )
    vecs = spark.read.parquet(f"{tmp}/vecs")
    print(f"gen {vecs.count():,} d=64 vectors: {time.time()-t0:.1f}s")

    from hippollm_spark.operators.similarity import pca_fit, pca_project

    t0 = time.time()
    model = pca_fit(vecs, 8)
    t_fit = time.time() - t0
    t0 = time.time()
    pca_project(vecs, model).write.mode("overwrite").format("noop").save()
    print(f"pca 64->8, {n_vecs:,} vecs: fit {t_fit:.1f}s, project "
          f"{time.time()-t0:.1f}s")

    # ---- shuffle: sharded deterministic permutation ----
    from hippollm_spark.operators.sampling import global_shuffle

    t0 = time.time()
    global_shuffle(
        facts.select(F.col("g").alias("doc_id")).limit(n_rows // 2), shards=64
    ).write.mode("overwrite").parquet(f"{tmp}/shuffled")
    print(f"global_shuffle -> 64 shards, {n_rows//2:,} rows: "
          f"{time.time()-t0:.1f}s")

    print("probe dir:", tmp)


if __name__ == "__main__":
    main()
