"""Probe the persisted-LSH incremental dedup path at scale: index a
synthetic corpus once, then measure per-batch dedup cost vs the
one-shot pair join re-run — the number that justifies the index.

Usage: python tools/incremental_dedup_probe.py [corpus_docs] [batch_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from hippollm_spark.session import get_spark

    spark = get_spark("incremental_dedup_probe")

    def _words(seed_col):
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(F.xxhash64(seed_col, i), F.lit(5000))
                ),
            ),
            " ",
        )

    def synth(n, offset, dup_every=None):
        # text seeded by the raw range id (+offset) so every doc is
        # unique; with dup_every, every dup_every-th doc instead takes
        # the text of shared seed (id % 1000) — a planted near/exact
        # dup of the corpus docs built from the same shared seeds.
        base = spark.range(n)
        text = _words(F.col("id") + offset)
        if dup_every:
            text = F.when(
                F.pmod(F.col("id"), F.lit(dup_every)) == 0,
                _words(F.pmod(F.col("id"), F.lit(1000))),
            ).otherwise(text)
        return base.select(
            (F.col("id") + offset).alias("doc_id"), text.alias("text")
        )

    corpus = synth(n_corpus, 0)
    # corpus side of the plant: 1000 docs built from the shared seeds
    shared = spark.range(1000).select(
        (F.col("id") + n_corpus).alias("doc_id"),
        _words(F.pmod(F.col("id"), F.lit(1000))).alias("text"),
    )
    corpus = corpus.unionByName(shared)
    # batch: every 10th doc duplicates a shared-seed text
    batch = synth(n_batch, 10_000_000, dup_every=10)

    from hippollm_spark.operators.dedup import (
        incremental_dedup,
        minhash_lsh_pairs,
        save_dedup_index,
    )

    t0 = time.time()
    save_dedup_index(spark, corpus, "probe_idx", partitions=64)
    t_build = time.time() - t0
    print(f"index build, {n_corpus + 1000:,} docs: {t_build:.1f}s (one-off)")

    t0 = time.time()
    dups = incremental_dedup(spark, batch, "probe_idx", partitions=64)
    n_dups = dups.count()
    t_inc = time.time() - t0
    print(f"incremental batch, {n_batch:,} docs: {t_inc:.1f}s "
          f"({n_dups:,} dups found)")

    t0 = time.time()
    oneshot = minhash_lsh_pairs(
        corpus.unionByName(batch), threshold=0.5, partitions=64
    )
    n_pairs = oneshot.count()
    t_one = time.time() - t0
    print(f"one-shot pair join over union, {n_corpus + n_batch + 1000:,} docs: "
          f"{t_one:.1f}s ({n_pairs:,} pairs) -> index amortizes after "
          f"{t_build / max(t_one - t_inc, 0.01):.1f} batches")


if __name__ == "__main__":
    main()
