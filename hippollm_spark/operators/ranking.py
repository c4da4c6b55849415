"""Lexical relevance ranking (BM25) over a document corpus.

The reference engine's only retrieval primitive is embedding kNN
(reference storage.py:255-276); a production corpus-scale engine also
needs the lexical side: score documents against a bag of query terms
and return the top-k. This is the classic inverted-index shape
expressed as DataFrame ops:

    tokens --explode--> (doc, term, tf)  [only query terms survive]
    df per term = window count over tf   [no second corpus scan]
    corpus stats (N, avgdl)              [single-row agg; broadcast]
    score per (doc, term) --> sum per doc --> top-k

Scale shape: the ``isin(query_terms)`` filter runs inside the explode
projection, so only rows matching the query are ever shuffled — at
100 TB the shuffle volume is proportional to query-term postings, not
corpus size (exactly what an inverted index buys, without building
one). The term-df and corpus-stat aggregates are bytes-sized and
broadcast; the final top-k is a TakeOrderedAndProject (partition-local
heads, no global sort).

Cross-engine float discipline (see __spark_entry__ docstring): the
only transcendental, ``ln`` in the idf, is rounded to 6dp before use
(its 1-ulp libm divergence is ~1e-16 — far from the rounding grid);
every remaining per-term operation is a single exactly-rounded IEEE
op written with identical parenthesization on both engines; per-term
contributions are rounded to 6dp and summed as DECIMAL so the
per-document total is order-independent and bit-identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_text

__all__ = [
    "bm25_scores",
    "bm25_topk",
    "build_postings",
    "save_postings",
    "bm25_topk_indexed",
    "bm25_topk_batch",
    "rrf_fuse",
    "mmr_rerank",
]


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score) — Okapi BM25 score of every document matching
    at least one query term. Documents containing no query term are
    absent (their score is 0 by definition).

    idf is the Robertson/Sparck-Jones form used by Lucene:
    ``ln((N - df + 0.5) / (df + 0.5) + 1)`` — always positive, so
    stopword-heavy queries cannot produce negative contributions.
    """
    terms = sorted(set(query_terms))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalized_text(text_col), " ").alias("__toks__"),
    )
    # Document length must be computed before the query filter (it is
    # a property of the document, not of the matching postings).
    with_dl = toks.select(
        "doc_id", F.size("__toks__").alias("dl"), "__toks__"
    )
    tf = (
        with_dl.select(
            "doc_id", "dl", F.explode("__toks__").alias("term")
        )
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    # Corpus stats: one row, broadcast. N and total token count are
    # exact integers; avgdl = total/N is one exactly-rounded IEEE
    # division, identical across engines. This is the only pass that
    # must see every document (lengths are corpus properties); it
    # reads one column and shuffles one row.
    stats = with_dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # Document frequency per term as a window count over the postings
    # aggregate (tf has exactly one row per (doc, term)) — NOT an
    # independent groupBy branch off the scan: Spark does not share
    # subplans, so a second aggregate would re-read and re-tokenize
    # the whole corpus. The window's exchange is over query-matching
    # postings only.
    w = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count("*").over(w))
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
        .withColumn(
            "contrib",
            F.round(
                F.col("idf")
                * (
                    (F.col("tf") * F.lit(k1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") / F.col("avgdl")
                        )
                    )
                ),
                6,
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("contrib").cast("decimal(38,10)")).cast("double"), 6
            ).alias("score")
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score, deterministic ``(score desc,
    doc_id asc)`` order → TakeOrderedAndProject (no global sort)."""
    return bm25_scores(
        docs, query_terms, k1=k1, b=b, id_col=id_col, text_col=text_col
    ).orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def build_postings(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the inverted-index relations for repeated BM25 querying:
    ``(postings, term_stats, corpus_stats)`` where postings =
    (term, doc_id, tf, dl), term_stats = (term, df), corpus_stats =
    one row (n_docs, sum_dl). One corpus scan computes all three
    (the per-query path in bm25_scores re-derives them every call —
    build once when the corpus is queried many times)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalized_text(text_col), " ").alias("__toks__"),
    )
    with_dl = toks.select("doc_id", F.size("__toks__").alias("dl"), "__toks__")
    postings = (
        with_dl.select("doc_id", "dl", F.explode("__toks__").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )
    term_stats = postings.groupBy("term").agg(F.count("*").alias("df"))
    corpus_stats = with_dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    return postings, term_stats, corpus_stats


def save_postings(
    spark,
    docs: DataFrame,
    table_prefix: str,
    *,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the inverted index BUCKETED BY TERM: a query-time
    ``term IN (...)`` filter then reads only the matching buckets
    (Spark bucket pruning — `SelectedBucketsCount` in the scan node),
    so per-query I/O is |index|/n_buckets·|terms| instead of the full
    postings table. term_stats/corpus_stats are tiny side tables."""
    from hippollm_spark.session import drop_table

    for suffix in ("postings", "term_stats", "corpus_stats"):
        drop_table(spark, f"{table_prefix}_{suffix}")
    postings, term_stats, corpus_stats = build_postings(
        docs, id_col=id_col, text_col=text_col
    )
    (
        postings.write.mode("overwrite")
        .bucketBy(n_buckets, "term")
        .sortBy("term")
        .saveAsTable(f"{table_prefix}_postings")
    )
    term_stats.write.mode("overwrite").saveAsTable(f"{table_prefix}_term_stats")
    corpus_stats.write.mode("overwrite").saveAsTable(
        f"{table_prefix}_corpus_stats"
    )


def bm25_topk_indexed(
    spark,
    table_prefix: str,
    query_terms: Sequence[str],
    k: int = 20,
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k against a saved postings index: no corpus scan, no
    tokenization, no window — the bucket-pruned postings read plus two
    broadcast side tables. Identical scores to bm25_topk (same
    rounding discipline), tested for parity."""
    terms = sorted(set(query_terms))
    postings = spark.table(f"{table_prefix}_postings").filter(
        F.col("term").isin(terms)
    )
    term_stats = spark.table(f"{table_prefix}_term_stats").filter(
        F.col("term").isin(terms)
    )
    corpus_stats = spark.table(f"{table_prefix}_corpus_stats")
    scored = (
        postings.join(F.broadcast(term_stats), "term")
        .crossJoin(F.broadcast(corpus_stats))
        .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
        .withColumn(
            "contrib",
            F.round(
                F.col("idf")
                * (
                    (F.col("tf") * F.lit(k1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") / F.col("avgdl")
                        )
                    )
                ),
                6,
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("contrib").cast("decimal(38,10)")).cast("double"), 6
            ).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_batch(
    spark,
    table_prefix: str,
    queries: DataFrame,
    k: int = 20,
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Many keyword queries against the postings index in ONE pass —
    the lexical twin of similarity.topk_per_query. ``queries`` is
    (query_id, terms ARRAY<STRING>).

    The distinct term set is collected to the driver (query metadata,
    bytes-sized) so the postings filter stays a LITERAL ``isin`` —
    that is what keeps bucket pruning: a join-based filter would scan
    every bucket. The (query_id, term) mapping then joins back as a
    broadcast, so each matching posting fans out only to the queries
    that asked for its term. One aggregation per (query_id, doc_id),
    one window top-k per query. Scores are identical to
    bm25_topk_indexed (same rounding discipline; parity-tested).
    Output: (query_id, doc_id, score, rank)."""
    qt = queries.select(
        "query_id", F.explode("terms").alias("term")
    ).distinct()
    terms = sorted({r["term"] for r in qt.select("term").distinct().collect()})
    postings = spark.table(f"{table_prefix}_postings").filter(
        F.col("term").isin(terms)
    )
    term_stats = spark.table(f"{table_prefix}_term_stats").filter(
        F.col("term").isin(terms)
    )
    corpus_stats = spark.table(f"{table_prefix}_corpus_stats")
    scored = (
        postings.join(F.broadcast(qt), "term")
        .join(F.broadcast(term_stats), "term")
        .crossJoin(F.broadcast(corpus_stats))
        .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
        .withColumn(
            "contrib",
            F.round(
                F.col("idf")
                * (
                    (F.col("tf") * F.lit(k1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") / F.col("avgdl")
                        )
                    )
                ),
                6,
            ),
        )
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.round(
            F.sum(F.col("contrib").cast("decimal(38,10)")).cast("double"), 6
        ).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion (lexical ∪ vector)
# --------------------------------------------------------------------------

def rrf_fuse(
    ranked: Sequence[DataFrame],
    k: int = 10,
    k0: int = 60,
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    scale: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (Cormack et al. 2009):
    ``rrf(d) = Σ_lists 1/(k0 + rank_list(d))``, higher is better.

    The modern RAG retrieval stack is exactly this: BM25 top-N fused
    with embedding-kNN top-N (the reference engine only has the vector
    half — storage.py:266-276). Each input is (id, rank); the fusion is
    a union of k-row lists + one tiny groupBy — cost is O(N·k),
    independent of corpus size, so at 100 TB the expensive part stays
    the upstream retrievers.

    With ``scale`` set, scores are exact scaled-integer
    ``Σ scale // (k0 + rank)`` BIGINTs (order-independent, bit-identical
    across engines — the same discipline as graph.pagerank); otherwise
    double ``1/(k0+rank)``. Output: (id, rrf_score|rrf_scaled,
    rank INT) — top-k by (score desc, id asc) via TakeOrdered.
    """
    unioned = None
    for df in ranked:
        part = df.select(F.col(id_col), F.col(rank_col).alias("__r__"))
        unioned = part if unioned is None else unioned.unionByName(part)
    if scale is not None:
        contrib = F.expr(f"{int(scale)} div (__r__ + {int(k0)})")
        out_col = "rrf_scaled"
    else:
        contrib = F.lit(1.0) / (F.col("__r__") + F.lit(float(k0)))
        out_col = "rrf_score"
    fused = (
        unioned.groupBy(id_col)
        .agg(F.sum(contrib).alias(out_col))
        .orderBy(F.desc(out_col), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc(out_col), F.asc(id_col))
    # the window sees <= k rows (post-limit) — single tiny partition is fine
    return fused.withColumn("rank", F.row_number().over(w).cast("int"))


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lambda_: float = 0.5,
    *,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "score",
) -> DataFrame:
    """Maximal-marginal-relevance reranking (Carbonell & Goldstein 1998):
    greedily pick ``argmax λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)``
    until k results, per query.

    ``candidates`` is a retriever's top-N — (query_id, id, score, vec) —
    so the greedy O(N²·d) loop runs over N≈100s of rows per query, NOT
    the corpus: the operator is ``applyInPandas`` grouped by query_id —
    queries rerank in parallel across executors, each group vectorized
    in numpy. At 100 TB the corpus-sized work stays in the upstream
    retriever; this stage's cost is queries × N², corpus-independent.

    Deterministic: ties broken by ascending id. Output (query_id, id,
    mmr_rank INT, mmr_score DOUBLE 6dp).
    """
    import numpy as np
    import pandas as pd

    lam = float(lambda_)

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["__qid__"].iloc[0]
        mat = np.array(pdf["__vec__"].tolist(), dtype=np.float64)
        ids = pdf["__id__"].to_numpy()
        rel = pdf["__score__"].to_numpy(dtype=np.float64)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        unit = mat / nrm[:, None]
        # order by (rel desc, id asc) so argmax ties resolve to min id
        order = np.lexsort((ids, -rel))
        unit, ids, rel = unit[order], ids[order], rel[order]
        n = len(ids)
        take = min(k, n)
        max_sim = np.full(n, -np.inf)
        remaining = np.ones(n, dtype=bool)
        out_ids, out_scores = [], []
        for step in range(take):
            if step == 0:
                mmr = lam * rel
            else:
                mmr = lam * rel - (1.0 - lam) * max_sim
            mmr_masked = np.where(remaining, mmr, -np.inf)
            pick = int(mmr_masked.argmax())  # first (lowest-id-on-tie) argmax
            out_ids.append(ids[pick])
            out_scores.append(round(float(mmr_masked[pick]), 6))
            remaining[pick] = False
            sims = unit @ unit[pick]
            max_sim = np.maximum(max_sim, sims)
        return pd.DataFrame(
            {
                "query_id": qid,
                "vec_id": out_ids,
                "mmr_rank": np.arange(1, take + 1, dtype=np.int32),
                "mmr_score": out_scores,
            }
        )

    qid_type = candidates.schema[query_id_col].dataType.simpleString()
    id_type = candidates.schema[id_col].dataType.simpleString()
    prepared = candidates.select(
        F.col(query_id_col).alias("__qid__"),
        F.col(id_col).alias("__id__"),
        F.col(score_col).alias("__score__"),
        F.col(vec_col).cast("array<double>").alias("__vec__"),
    )
    return prepared.groupBy("__qid__").applyInPandas(
        _mmr,
        f"query_id {qid_type}, vec_id {id_type}, mmr_rank int, mmr_score double",
    )


def mmr_rerank_quantized(
    candidates: DataFrame,
    k: int = 10,
    lambda_e6: int = 500_000,
    *,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "score",
) -> DataFrame:
    """Oracle-grade MMR twin: the same greedy selection as
    `mmr_rerank`, but over 6dp-QUANTIZED relevance and pairwise
    similarity in exact BIGINT arithmetic — so the whole chain of k
    argmax decisions is bit-identical on any engine and a SQL oracle
    can unroll it step by step (the integer-PageRank discipline
    applied to reranking). `mmr_rerank` (raw float64, numpy matmul)
    stays the throughput path; this twin trades a little speed for a
    hash-checkable fixpoint.

    Quantization: rel_e6 = round(score·1e6) (score is the retriever's
    6dp cosine), sim_e6 = round(cos(a,b)·1e6) computed with the JVM
    sequential fold (`vectors.cosine_similarity` + round — the same
    bridge DuckDB's list_cosine_similarity replays, cf.
    ann_cosine_topk). Selection score at step 1 is
    ``lambda_e6·rel_e6``; thereafter
    ``lambda_e6·rel_e6 − (1e6−lambda_e6)·max_sim_e6`` with max_sim
    over the selected set — all int64 (≤ 1e12 magnitude). Ties break
    by ascending id, identically replayable.

    Scale shape: the pairwise sim matrix is a per-query N×N self-join
    (N = retriever top-N, corpus-independent), grouped to one Arrow
    batch per query; the greedy loop is O(k·N) integer ops in the
    worker. Output: (query_id, vec_id, mmr_rank INT,
    mmr_score_e12 BIGINT).
    """
    from hippollm_spark.functions import vectors as V

    lam = int(lambda_e6)
    base = candidates.select(
        F.col(query_id_col).alias("__qid__"),
        F.col(id_col).alias("__id__"),
        F.round(F.col(score_col) * 1e6).cast("long").alias("__rel__"),
        F.col(vec_col).cast("array<double>").alias("__vec__"),
    )
    a = base.select("__qid__", F.col("__id__").alias("a"), F.col("__rel__").alias("rel_a"), F.col("__vec__").alias("va"))
    b = base.select("__qid__", F.col("__id__").alias("b"), F.col("__vec__").alias("vb"))
    pairs = (
        a.join(b, "__qid__")
        .select(
            "__qid__",
            "a",
            "rel_a",
            "b",
            F.when(
                F.col("a") == F.col("b"), F.lit(None).cast("long")
            ).otherwise(
                # try_divide: a zero-norm embedding yields NULL (not an
                # ANSI DIVIDE_BY_ZERO crash); the greedy treats the
                # missing sim as 0, matching the float path's
                # nrm[nrm == 0] = 1.0 guard. Identical to
                # cosine_similarity for non-degenerate vectors.
                F.round(
                    F.try_divide(
                        V.dot(F.col("va"), F.col("vb")),
                        V.norm(F.col("va")) * V.norm(F.col("vb")),
                    )
                    * 1e6
                ).cast("long")
            ).alias("sim_e6"),
        )
    )

    def _greedy(pdf):
        import pandas as pd

        qid = pdf["__qid__"].iloc[0]
        rel = {}
        sim = {}
        for r in pdf.itertuples(index=False):
            ia, ib = r.a, r.b
            rel[ia] = int(r.rel_a)
            if ia != ib and not pd.isna(r.sim_e6):
                sim[(ia, ib)] = int(r.sim_e6)
        remaining = sorted(rel)
        max_sim: dict = {}
        rows = []
        for step in range(min(k, len(remaining))):
            best_id, best_s = None, None
            for cid in remaining:  # ascending id => ties pick min id
                if step == 0:
                    s = lam * rel[cid]
                else:
                    s = lam * rel[cid] - (1_000_000 - lam) * max_sim[cid]
                if best_s is None or s > best_s:
                    best_id, best_s = cid, s
            rows.append((qid, best_id, step + 1, best_s))
            remaining.remove(best_id)
            for cid in remaining:
                # NULL cosine (zero-norm embedding) never enters `sim`;
                # treat it as similarity 0, like the float path's
                # null-ignoring max — instead of a KeyError
                s2 = sim.get((cid, best_id), 0)
                max_sim[cid] = s2 if cid not in max_sim else max(max_sim[cid], s2)
        return pd.DataFrame(
            rows, columns=["query_id", "vec_id", "mmr_rank", "mmr_score_e12"]
        )

    qid_type = candidates.schema[query_id_col].dataType.simpleString()
    id_type = candidates.schema[id_col].dataType.simpleString()
    return pairs.groupBy("__qid__").applyInPandas(
        _greedy,
        f"query_id {qid_type}, vec_id {id_type}, mmr_rank int, mmr_score_e12 long",
    )


def ndcg_at_k(
    results: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    *,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    round_to: int = 6,
) -> DataFrame:
    """NDCG@k per query — the standard graded-relevance evaluation for
    any ranking this module produces (BM25, RRF, MMR): DCG = Σ
    (2^rel − 1)/log2(rank+1) over the top-k, normalized by the ideal
    DCG of the query's relevance set.

    Numeric discipline: each gain term is 6dp-rounded then summed as
    exact DECIMAL (order-independent); the ideal ranking orders by
    (rel desc, doc asc) — a deterministic total order, so IDCG is
    engine-replayable. Unjudged result rows score rel 0; queries with
    no judged-relevant documents yield NULL ndcg.

    Shape: results⋈relevance on (query, doc) — a broadcast when the
    judgment set is small, which it always is; IDCG is a window over
    the judgments only. Output: (query_id, dcg, idcg, ndcg).
    """
    from pyspark.sql import Window

    res = results.filter(F.col(rank_col) <= k).select(
        query_col,
        doc_col,
        F.col(rank_col).alias("__rank__"),
    )
    rel = relevance.select(
        query_col, doc_col, F.col(rel_col).alias("__rel__")
    )
    gain = F.round(
        (F.pow(F.lit(2.0), F.col("__rel__").cast("double")) - 1.0)
        / F.log2(F.col("__rank__").cast("double") + 1.0),
        round_to,
    ).cast("decimal(28,6)")
    dcg = (
        res.join(F.broadcast(rel), [query_col, doc_col], "left")
        .fillna(0, subset=["__rel__"])
        .groupBy(query_col)
        .agg(F.sum(gain).alias("__dcg__"))
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("__rel__"), F.asc(doc_col)
    )
    ideal = (
        rel.filter(F.col("__rel__") > 0)
        .withColumn("__irank__", F.row_number().over(w))
        .filter(F.col("__irank__") <= k)
        .groupBy(query_col)
        .agg(
            F.sum(
                F.round(
                    (F.pow(F.lit(2.0), F.col("__rel__").cast("double")) - 1.0)
                    / F.log2(F.col("__irank__").cast("double") + 1.0),
                    round_to,
                ).cast("decimal(28,6)")
            ).alias("__idcg__")
        )
    )
    return (
        dcg.join(ideal, query_col, "left")
        .select(
            query_col,
            F.round(F.col("__dcg__").cast("double"), round_to).alias("dcg"),
            F.round(F.col("__idcg__").cast("double"), round_to).alias("idcg"),
            F.round(
                F.when(
                    F.col("__idcg__") > 0,
                    F.col("__dcg__").cast("double")
                    / F.col("__idcg__").cast("double"),
                ),
                round_to,
            ).alias("ndcg"),
        )
    )


def retrieval_metrics(
    results: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    *,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    round_to: int = 6,
) -> DataFrame:
    """Set-based retrieval evaluation per query — recall@k,
    precision@k, and MRR@k — completing the eval pair with `ndcg_at_k`
    (graded) for any ranking this module emits.

    All three are single exact divisions of integer counts (hits/k,
    hits/|relevant|, 1/first_relevant_rank) — no accumulation, so
    hash-grade by construction. Relevance = rel > 0. Queries with no
    relevant documents yield NULL recall and MRR; queries absent from
    `results` are not emitted (evaluate the union upstream if missing
    queries should score 0).

    Shape: one broadcast join of the judgments onto the top-k rows,
    one aggregate.
    """
    res = results.filter(F.col(rank_col) <= k).select(
        query_col, doc_col, F.col(rank_col).alias("__rank__")
    )
    rel = relevance.filter(F.col(rel_col) > 0).select(
        query_col, doc_col, F.lit(1).alias("__isrel__")
    )
    n_rel = rel.groupBy(query_col).agg(F.count("*").alias("__nrel__"))
    joined = res.join(F.broadcast(rel), [query_col, doc_col], "left")
    agg = joined.groupBy(query_col).agg(
        F.count("*").alias("n_retrieved"),
        F.sum(F.coalesce("__isrel__", F.lit(0))).alias("__hits__"),
        F.min(
            F.when(F.col("__isrel__").isNotNull(), F.col("__rank__"))
        ).alias("__frank__"),
    )
    out = agg.join(F.broadcast(n_rel), query_col, "left")
    hits = F.col("__hits__").cast("double")
    return out.select(
        query_col,
        "n_retrieved",
        F.col("__hits__").alias("n_hits"),
        F.round(hits / F.col("n_retrieved").cast("double"), round_to).alias(
            "precision_at_k"
        ),
        F.round(
            F.when(
                F.col("__nrel__") > 0, hits / F.col("__nrel__").cast("double")
            ),
            round_to,
        ).alias("recall_at_k"),
        F.round(
            F.when(
                F.col("__frank__").isNotNull(),
                F.lit(1.0) / F.col("__frank__").cast("double"),
            ).otherwise(
                F.when(F.col("__nrel__") > 0, F.lit(0.0))
            ),
            round_to,
        ).alias("mrr_at_k"),
    )
