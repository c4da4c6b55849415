"""Scale probe: generate multi-million-row synthetic tables at runtime
(in /tmp — the driver's testdata is read-only) and measure the novel
operators' scaling behavior. Results feed DESIGN.md §5.

Usage: python tools/scale_probe.py [n_vectors] [n_docs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    dim = 64

    from hippollm_spark.session import get_spark

    spark = get_spark("scale_probe")
    tmp = tempfile.mkdtemp(prefix="scale_probe_")

    # ---- synthetic embeddings: deterministic, fully JVM-generated ----
    vec_expr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - 1000) / 1000.0,
    ).cast("array<float>")
    t0 = time.time()
    (
        spark.range(n_vec)
        .select(
            F.col("id").alias("vec_id"),
            vec_expr.alias("embedding"),
            F.pmod(F.col("id"), F.lit(10)).cast("int").alias("label"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/vecs")
    )
    print(f"gen {n_vec:,} vectors: {time.time()-t0:.1f}s")
    vecs = spark.read.parquet(f"{tmp}/vecs")

    from hippollm_spark.operators.knn import knn
    from hippollm_spark.operators.similarity import ivf_build, ivf_topk, topk_per_query
    from hippollm_spark.testing import hash_embedding

    q = hash_embedding("scale probe query", dim)

    t0 = time.time()
    exact = [r["vec_id"] for r in knn(vecs, q, 10, id_col="vec_id").collect()]
    t_exact = time.time() - t0
    print(f"exact kNN over {n_vec:,}: {t_exact:.2f}s")

    t0 = time.time()
    exact_pd = [
        r["vec_id"] for r in knn(vecs, q, 10, id_col="vec_id", method="pandas").collect()
    ]
    print(f"exact kNN (pandas matmul): {time.time()-t0:.2f}s (agrees: {exact == exact_pd})")

    t0 = time.time()
    queries = vecs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk_per_query(vecs, queries, k=10).write.mode("overwrite").format("noop").save()
    print(f"batch top-k (8 queries): {time.time()-t0:.2f}s")

    t0 = time.time()
    assigned, cents = ivf_build(vecs, nlist=32, iters=3)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(f"{tmp}/ivf")
    ivf_tbl = spark.read.parquet(f"{tmp}/ivf")
    t_build = time.time() - t0
    t0 = time.time()
    approx = [
        r["vec_id"] for r in ivf_topk(ivf_tbl, cents, q, k=10, nprobe=4, id_col="vec_id").collect()
    ]
    t_probe = time.time() - t0
    recall = len(set(exact) & set(approx)) / 10
    print(
        f"IVF: build+write {t_build:.1f}s, probe(nprobe=4/32) {t_probe:.2f}s, "
        f"recall@10 {recall:.2f}, speedup {t_exact / max(t_probe, 1e-9):.1f}x"
    )

    # ---- clustered vectors: IVF's intended regime ----
    # 32 well-separated centroids (scaled ±4) + small per-vector noise
    # (±0.5): real embeddings cluster, uniform random (above) is IVF's
    # worst case. Same probe, same budget, honest best-case counterpart.
    cent_expr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.xxhash64(F.pmod(F.col("id"), F.lit(32)), i), F.lit(2001)) - 1000)
        / 250.0,
    )
    noise_expr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.xxhash64(F.col("id"), i, F.lit(7)), F.lit(2001)) - 1000) / 2000.0,
    )
    (
        spark.range(n_vec)
        .select(
            F.col("id").alias("vec_id"),
            F.zip_with(cent_expr, noise_expr, lambda a, b: (a + b).cast("float")).alias(
                "embedding"
            ),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/cvecs")
    )
    cvecs = spark.read.parquet(f"{tmp}/cvecs")
    exact_c = [r["vec_id"] for r in knn(cvecs, q, 10, id_col="vec_id").collect()]
    t0 = time.time()
    cassigned, ccents = ivf_build(cvecs, nlist=32, iters=3)
    cassigned.write.mode("overwrite").partitionBy("list_id").parquet(f"{tmp}/civf")
    civf = spark.read.parquet(f"{tmp}/civf")
    t_build = time.time() - t0
    t0 = time.time()
    approx_c = [
        r["vec_id"]
        for r in ivf_topk(civf, ccents, q, k=10, nprobe=4, id_col="vec_id").collect()
    ]
    t_probe = time.time() - t0
    recall_c = len(set(exact_c) & set(approx_c)) / 10
    print(
        f"IVF clustered: build+write {t_build:.1f}s, probe(nprobe=4/32) {t_probe:.2f}s, "
        f"recall@10 {recall_c:.2f}"
    )

    # ---- synthetic docs: zipf-ish vocab, planted near-dups ----
    words = F.transform(
        F.sequence(F.lit(0), F.pmod(F.xxhash64("id"), F.lit(40)) + 20),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(5000)).cast("string")
        ),
    )
    t0 = time.time()
    (
        spark.range(n_doc)
        .select(
            F.col("id").alias("doc_id"),
            # every 100th doc duplicates its predecessor's content seed
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.pmod(F.xxhash64(F.expr("id - id % 100")), F.lit(40)) + 20,
                    ),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.xxhash64(F.expr("id - (case when id % 100 < 2 then id % 100 else 0 end)"), i),
                            F.lit(5000),
                        ).cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/docs")
    )
    _ = words
    print(f"gen {n_doc:,} docs: {time.time()-t0:.1f}s")
    docs = spark.read.parquet(f"{tmp}/docs")

    from hippollm_spark.operators.dedup import exact_dedup, minhash_lsh_pairs

    t0 = time.time()
    kept = exact_dedup(docs).count()
    print(f"exact dedup over {n_doc:,}: {time.time()-t0:.1f}s ({n_doc - kept:,} dups removed)")

    from hippollm_spark.operators.textstats import repetition_signals

    t0 = time.time()
    rep = repetition_signals(docs)
    rep.write.mode("overwrite").format("noop").save()
    print(f"repetition signals over {n_doc:,}: {time.time()-t0:.1f}s")

    t0 = time.time()
    pair_df = minhash_lsh_pairs(docs, threshold=0.5, num_hashes=128, bands=32)
    pair_df.write.mode("overwrite").parquet(f"{tmp}/pairs")
    pairs_tbl = spark.read.parquet(f"{tmp}/pairs")
    pairs = pairs_tbl.count()
    print(f"minhash LSH over {n_doc:,}: {time.time()-t0:.1f}s ({pairs:,} near-dup pairs)")

    from hippollm_spark.operators.dedup import dedup_canonicalize

    t0 = time.time()
    groups = dedup_canonicalize(pairs_tbl)
    n_drop = groups.filter(F.col("doc_id") != F.col("canonical_id")).count()
    print(
        f"canonicalize {pairs:,} pairs: {time.time()-t0:.1f}s "
        f"({n_drop:,} docs marked for drop)"
    )

    from hippollm_spark.operators.sampling import pack_sequences, stratified_sample

    docs_meta = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(16)).cast("int").alias("shard"),
        (F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    t0 = time.time()
    n_samp = stratified_sample(
        docs_meta, strata_col="shard", n_per_stratum=1000, method="threshold"
    ).count()
    print(f"threshold-sample {n_doc:,} docs (16 strata): {time.time()-t0:.1f}s ({n_samp:,} kept)")

    t0 = time.time()
    n_chunks = (
        pack_sequences(docs_meta, ctx=2048, shard_col="shard")
        .agg(F.countDistinct("shard", "chunk_id"))
        .first()[0]
    )
    print(f"pack {n_doc:,} docs into 2048-token chunks: {time.time()-t0:.1f}s ({n_chunks:,} chunks)")

    from hippollm_spark.functions.vectors import label_centroids

    t0 = time.time()
    label_centroids(vecs).write.mode("overwrite").format("noop").save()
    print(f"label centroids over {n_vec:,}x{dim}: {time.time()-t0:.1f}s")

    from hippollm_spark.pipelines.curate import curate_corpus

    # The synthetic vocab (w####) has no stopwords, so append an English
    # tail — otherwise langid yields 'und' for every row and the gates
    # drop the whole corpus before the interesting stages run.
    cdocs = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" the and of to in is that with")).alias(
            "text"
        ),
        F.element_at(
            F.array(F.lit("en"), F.lit("fr"), F.lit("de"), F.lit("es")),
            (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"),
        ).alias("lang"),
    )
    t0 = time.time()
    # max_shingle_df: the appended stopword tail is shared boilerplate
    # across ALL docs — without the stop-shingle cap the similarity
    # join's blocking key degenerates into a near-cross-join (observed:
    # run wedged at this stage). 5% of the corpus is a generous cap.
    summary = curate_corpus(
        cdocs, min_quality_e8=40_000_000, max_shingle_df=n_doc // 20
    ).collect()
    kept = sum(r["n_docs"] for r in summary)
    print(
        f"curate {n_doc:,} docs end-to-end: {time.time()-t0:.1f}s "
        f"({kept:,} kept across {len(summary)} langs)"
    )

    t0 = time.time()
    summary_mh = curate_corpus(
        cdocs,
        min_quality_e8=40_000_000,
        max_shingle_df=n_doc // 20,
        near_dup_method="minhash",
    ).collect()
    kept_mh = sum(r["n_docs"] for r in summary_mh)
    print(
        f"curate (minhash path) {n_doc:,} docs end-to-end: "
        f"{time.time()-t0:.1f}s ({kept_mh:,} kept across "
        f"{len(summary_mh)} langs)"
    )

    # ---- connected components: hash-min vs star on a path graph ----
    # The adversarial topology for hash-min (O(diameter) rounds): a
    # chain of n_path entities, consecutive pairs sharing a fact.
    # Star-contraction solves it in O(log n) alternations.
    from hippollm_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    n_path = 3000
    chain = spark.range(n_path - 1).select(
        F.col("id").alias("fact_id"),
        F.concat(F.lit("p"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("entity"),
    ).unionByName(
        spark.range(n_path - 1).select(
            F.col("id").alias("fact_id"),
            F.concat(
                F.lit("p"), F.lpad((F.col("id") + 1).cast("string"), 7, "0")
            ).alias("entity"),
        )
    ).localCheckpoint(eager=True)
    t0 = time.time()
    n_star = connected_components_star(chain, max_rounds=20).select("component").distinct().count()
    t_star = time.time() - t0
    t0 = time.time()
    # hash-min capped at 40 rounds: on a 3000-diameter path it CANNOT
    # finish — count the components it (wrongly, by design of the cap)
    # reports to show the failure mode the star path removes
    n_hm = connected_components(chain, max_iter=40).select("component").distinct().count()
    t_hm = time.time() - t0
    print(
        f"path-{n_path} CC: star {t_star:.1f}s -> {n_star} component(s); "
        f"hash-min@40rounds {t_hm:.1f}s -> {n_hm} labels (unconverged: "
        f"needs {n_path - 1} rounds)"
    )

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
