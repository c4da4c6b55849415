"""Scale probe for the graph + lexical-retrieval operators: generate a
multi-million-edge synthetic graph and a synthetic corpus at runtime
(in /tmp — the driver's testdata is read-only) and measure PageRank,
personalized PageRank, triangle census, BM25, and the postings index.
Results feed DESIGN.md §4.

Usage: python tools/graph_text_scale_probe.py [n_edges] [n_vertices] [n_docs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_verts = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000

    from hippollm_spark.session import get_spark

    spark = get_spark("graph_text_scale_probe")
    tmp = tempfile.mkdtemp(prefix="gt_probe_")

    # ---- synthetic graph: hash-derived endpoints, mild power bias ----
    # dst draws from a quadratically-skewed range so some vertices are
    # hubs (the regime degree-ordered orientation exists for).
    t0 = time.time()
    (
        spark.range(n_edges)
        .select(
            F.concat(F.lit("v"), F.pmod(F.xxhash64("id"), F.lit(n_verts))).alias(
                "src"
            ),
            F.concat(
                F.lit("v"),
                F.pmod(
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_verts))
                    * F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_verts)),
                    F.lit(n_verts),
                ),
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .write.mode("overwrite")
        .parquet(f"{tmp}/edges")
    )
    edges = spark.read.parquet(f"{tmp}/edges")
    m = edges.count()
    print(f"gen {m:,} edges over {n_verts:,} vertices: {time.time()-t0:.1f}s")

    from hippollm_spark.operators.graph import pagerank, triangle_stats

    t0 = time.time()
    pagerank(edges, iterations=6).write.mode("overwrite").format("noop").save()
    print(f"pagerank 6 iters, {m:,} edges: {time.time()-t0:.1f}s")

    t0 = time.time()
    pagerank(edges, iterations=6, seeds=["v0", "v1", "v2"]).write.mode(
        "overwrite"
    ).format("noop").save()
    print(f"personalized pagerank (3 seeds): {time.time()-t0:.1f}s")

    t0 = time.time()
    row = triangle_stats(edges).collect()[0]
    print(
        f"triangle census: {time.time()-t0:.1f}s "
        f"({row['n_triangles']:,} triangles, {row['n_wedges']:,} wedges)"
    )

    # ---- synthetic corpus: zipf-ish vocab (same scheme as scale_probe) --
    words = F.transform(
        F.sequence(F.lit(0), F.pmod(F.xxhash64("id"), F.lit(40)) + 20),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(5000)).cast("string")
        ),
    )
    t0 = time.time()
    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/docs")
    )
    docs = spark.read.parquet(f"{tmp}/docs")
    print(f"gen {n_docs:,} docs: {time.time()-t0:.1f}s")

    from hippollm_spark.operators.ranking import (
        bm25_topk,
        bm25_topk_indexed,
        save_postings,
    )

    terms = ["w17", "w42", "w99"]
    t0 = time.time()
    bm25_topk(docs, terms, k=20).write.mode("overwrite").format("noop").save()
    print(f"bm25_topk (scan path), {n_docs:,} docs: {time.time()-t0:.1f}s")

    t0 = time.time()
    save_postings(spark, docs, "probe_bm25", n_buckets=64)
    t_build = time.time() - t0
    t0 = time.time()
    bm25_topk_indexed(spark, "probe_bm25", terms, k=20).write.mode(
        "overwrite"
    ).format("noop").save()
    t_q = time.time() - t0
    print(f"postings index: build {t_build:.1f}s, query {t_q:.2f}s")
    for t in ("postings", "term_stats", "corpus_stats"):
        spark.sql(f"DROP TABLE IF EXISTS probe_bm25_{t}")


if __name__ == "__main__":
    main()
