"""Stage-level wall-clock profile of the curate_corpus pipeline at a
given sf_dir: times each pipeline prefix with the noop sink so the
incremental cost of every stage is visible (guide §1: measure first,
isolate with noop, label jobs).

Usage: python tools/profile_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(spark, df, label):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"{dt:8.3f}s  {label}", file=sys.stderr, flush=True)
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from hippollm_spark.operators.dedup import (
        apply_dedup,
        cross_jaccard_pairs,
        dedup_canonicalize,
        exact_dedup,
        jaccard_dup_pairs,
    )
    from hippollm_spark.operators.textstats import language_id, quality_features
    from hippollm_spark.session import get_spark

    spark = get_spark("profile_curation")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # warmup: JIT + codegen
    docs.write.mode("overwrite").format("noop").save()

    for rnd in range(2):
        print(f"--- round {rnd} ---", file=sys.stderr)
        t(spark, docs, "scan documents")
        scored = quality_features(docs).select("doc_id", "quality_score_e8", "n_tokens")
        t(spark, scored, "quality_features")
        lid = language_id(docs)
        t(spark, lid, "language_id")
        keep_plain = (
            docs.join(scored, "doc_id")
            .join(lid, "doc_id")
            .filter(
                (F.col("quality_score_e8") >= 55_000_000)
                & (F.col("lang_pred") != "und")
            )
        )
        t(spark, keep_plain, "keep (3-scan join form)")

        keep = keep_plain.cache()
        t(spark, keep, "keep cache materialize")
        bench = keep.filter(F.col("doc_id") % 20 == 0)
        corpus = keep.filter(F.col("doc_id") % 20 != 0)

        surv0 = exact_dedup(corpus).cache()
        t(spark, surv0, "exact_dedup (+cache)")
        t0 = time.time()
        pairs = jaccard_dup_pairs(surv0, threshold=0.5, n=3)
        t(spark, pairs, "jaccard_dup_pairs")
        t0 = time.time()
        assign = dedup_canonicalize(pairs)
        print(f"{time.time()-t0:8.3f}s  dedup_canonicalize (eager loop)", file=sys.stderr)
        surv = apply_dedup(surv0, assign).cache()
        t(spark, surv, "apply_dedup (+cache)")

        t0 = time.time()
        cont = cross_jaccard_pairs(surv, bench, threshold=0.5, n=3)
        t(spark, cont, "cross_jaccard_pairs")
        clean = surv.join(
            cont.select(F.col("corpus_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
        t(spark, clean, "decontaminated clean")

        from hippollm_spark.operators.sampling import pack_sequences

        packed = pack_sequences(
            clean.withColumn("n_tokens", F.col("n_tokens").cast("long")),
            ctx=2048,
            shard_col="lang",
            token_count_col="n_tokens",
        )
        out = (
            packed.groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
                F.countDistinct("chunk_id").alias("n_chunks"),
            )
            .orderBy("lang")
        )
        t(spark, out, "pack + summary (full tail)")

        for p in (keep, surv0, surv):
            p.unpersist()
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        except Exception:
            pass


if __name__ == "__main__":
    main()
