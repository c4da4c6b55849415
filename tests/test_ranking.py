"""BM25 lexical ranking vs an independent pure-Python implementation."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from hippollm_spark.operators import ranking
from hippollm_spark.operators.ranking import bm25_scores, bm25_topk


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    """Independent oracle: textbook BM25 over (doc_id, text) pairs,
    same normalization (lowercase, whitespace split) and the same 6dp
    per-term rounding discipline as the Spark operator."""
    toks = {d: re.sub(r"\s+", " ", t.strip()).lower().split(" ") for d, t in rows}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        q: sum(1 for v in toks.values() if q in v)
        for q in terms
    }
    out = {}
    for d, v in toks.items():
        s = 0.0
        for q in set(terms):
            tf = v.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = round(math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0), 6)
            part = (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(v) / avgdl)
            )
            s += round(idf * part, 6)
        if s > 0:
            out[d] = round(s, 6)
    return out


DOCS = [
    (0, "spark join hash join  vector"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "join join join join join"),
    (3, "vector hash"),
    (4, "nothing relevant here at all whatsoever truly"),
    (5, "hash HASH Hash vector spark spark"),
]
TERMS = ["join", "vector", "hash"]


def test_bm25_matches_pure_python(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, TERMS).collect()
    }
    want = _py_bm25(DOCS, TERMS)
    assert got == want
    # docs 1 and 4 match no query term -> absent
    assert 1 not in got and 4 not in got


def test_bm25_topk_order_and_ties(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    top = bm25_topk(docs, TERMS, k=3).collect()
    want = _py_bm25(DOCS, TERMS)
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["doc_id"], r["score"]) for r in top] == expect


def test_bm25_repeated_query_terms_count_once(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    once = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["join"]).collect()}
    twice = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["join", "join"]).collect()
    }
    assert once == twice


def test_bm25_on_corpus(documents):
    """Smoke on the synthetic corpus: scores positive, k respected,
    descending order."""
    top = bm25_topk(documents, ["vector", "hash", "join"], k=10).collect()
    assert len(top) == 10
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_indexed_parity_and_bucket_pruning(spark, documents, tmp_path):
    """The saved bucketed-postings path returns exactly the per-query
    path's results, and the postings scan is bucket-pruned."""
    from hippollm_spark.operators.ranking import (
        bm25_topk,
        bm25_topk_indexed,
        save_postings,
    )

    terms = ["vector", "hash", "join"]
    save_postings(spark, documents, "bm25_idx", n_buckets=16)
    try:
        got = bm25_topk_indexed(spark, "bm25_idx", terms, k=15).collect()
        want = bm25_topk(documents, terms, k=15).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]
        plan = (
            spark.table("bm25_idx_postings")
            .filter(F.col("term").isin(terms))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount" in plan
    finally:
        for t in ("postings", "term_stats", "corpus_stats"):
            spark.sql(f"DROP TABLE IF EXISTS bm25_idx_{t}")


def test_bm25_batch_matches_per_query(spark, documents):
    """One-pass multi-query search over the index == per-query path."""
    from hippollm_spark.operators.ranking import (
        bm25_topk_batch,
        bm25_topk_indexed,
        save_postings,
    )

    qsets = {
        "q1": ["vector", "hash"],
        "q2": ["join", "table"],
        "q3": ["spark"],
    }
    save_postings(spark, documents, "bm25_b", n_buckets=16)
    try:
        queries = spark.createDataFrame(
            [(k, v) for k, v in qsets.items()], ["query_id", "terms"]
        )
        batch = bm25_topk_batch(spark, "bm25_b", queries, k=10).collect()
        by_q = {}
        for r in batch:
            by_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], r["score"])
            )
        for qid, terms in qsets.items():
            want = [
                (i + 1, r["doc_id"], r["score"])
                for i, r in enumerate(
                    bm25_topk_indexed(spark, "bm25_b", terms, k=10).collect()
                )
            ]
            assert sorted(by_q[qid]) == want, qid
    finally:
        for t in ("postings", "term_stats", "corpus_stats"):
            spark.sql(f"DROP TABLE IF EXISTS bm25_b_{t}")


def test_rrf_fuse_matches_pure_python(spark):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 4)], "doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(3, 1), (1, 2), (5, 3)], "doc_id long, rank int"
    )
    got = {
        r["doc_id"]: (r["rrf_score"], r["rank"])
        for r in ranking.rrf_fuse([lex, vec], k=10, k0=60).collect()
    }
    expect = {}
    for d, rs in {1: [1, 2], 2: [2], 3: [3, 1], 4: [4], 5: [3]}.items():
        expect[d] = sum(1.0 / (60 + r) for r in rs)
    order = sorted(expect, key=lambda d: (-expect[d], d))
    for i, d in enumerate(order):
        assert abs(got[d][0] - expect[d]) < 1e-12
        assert got[d][1] == i + 1
    # scaled-integer mode is exact
    scaled = {
        r["doc_id"]: r["rrf_scaled"]
        for r in ranking.rrf_fuse([lex, vec], k=10, scale=10**15).collect()
    }
    assert scaled[3] == 10**15 // 63 + 10**15 // 61


def test_rrf_fuse_topk_cut(spark):
    lists = [
        spark.createDataFrame([(i, i) for i in range(1, 30)], "doc_id long, rank int")
    ]
    out = ranking.rrf_fuse(lists, k=5).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]


def _py_mmr(rows, k, lam):
    """Independent greedy MMR: rows = (id, score, vec)."""
    import numpy as np

    rows = sorted(rows, key=lambda r: (-r[1], r[0]))
    ids = [r[0] for r in rows]
    rel = np.array([r[1] for r in rows], dtype=np.float64)
    mat = np.array([r[2] for r in rows], dtype=np.float64)
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    picked, out = set(), []
    max_sim = np.full(len(ids), -np.inf)
    for step in range(min(k, len(ids))):
        best, best_v = None, -np.inf
        for i in range(len(ids)):
            if i in picked:
                continue
            v = lam * rel[i] - (0.0 if step == 0 else (1 - lam) * max_sim[i])
            if step == 0:
                v = lam * rel[i]
            if v > best_v:
                best, best_v = i, v
        picked.add(best)
        out.append((ids[best], round(float(best_v), 6)))
        max_sim = np.maximum(max_sim, unit @ unit[best])
    return out


def test_mmr_rerank_matches_pure_python(spark, embeddings):
    import numpy as np
    from pyspark.sql import functions as F

    from hippollm_spark.operators.similarity import topk_per_query

    queries = embeddings.filter(F.col("vec_id").isin(3, 7)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cands = topk_per_query(embeddings, queries, k=30, id_col="vec_id").join(
        embeddings.select("vec_id", "embedding"), "vec_id"
    )
    got = ranking.mmr_rerank(cands, k=8, lambda_=0.5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {3, 7}
    raw = cands.collect()
    for qid in (3, 7):
        rows = [
            (r["vec_id"], r["score"], list(r["embedding"]))
            for r in raw
            if r["query_id"] == qid
        ]
        expect = _py_mmr(rows, 8, 0.5)
        mine = sorted(by_q[qid], key=lambda r: r["mmr_rank"])
        assert [(r["vec_id"]) for r in mine] == [e[0] for e in expect]
        for r, e in zip(mine, expect):
            assert abs(r["mmr_score"] - e[1]) < 1e-6
    # rank 1 is the highest-relevance candidate (the query itself)
    assert [r for r in by_q[3] if r["mmr_rank"] == 1][0]["vec_id"] == 3


def test_mmr_diversifies(spark):
    """A near-duplicate of the top hit is demoted below a less-relevant
    but novel candidate."""
    rows = [
        (0, 1, 0.99, [1.0, 0.0]),
        (0, 2, 0.98, [1.0, 0.001]),   # near-dup of 1
        (0, 3, 0.50, [0.0, 1.0]),     # orthogonal
    ]
    df = spark.createDataFrame(
        rows, "query_id int, vec_id int, score double, embedding array<double>"
    )
    out = sorted(
        ranking.mmr_rerank(df, k=3, lambda_=0.5).collect(),
        key=lambda r: r["mmr_rank"],
    )
    assert [r["vec_id"] for r in out] == [1, 3, 2]


def test_mmr_quantized_matches_float_selection(spark):
    """The oracle-grade quantized twin picks the same documents in the
    same order as the float mmr_rerank on well-separated data (6dp
    quantization can only flip picks within 1e-6 — the fixture's score
    gaps are orders of magnitude larger)."""
    from hippollm_spark.operators.ranking import mmr_rerank, mmr_rerank_quantized

    rows = []
    for i in range(12):
        base = [0.0] * 8
        base[i % 4] = 1.0
        base[4 + (i % 3)] = 0.5 + 0.01 * i
        rows.append((0, i, round(1.0 - 0.03 * i, 6), base))
    cands = spark.createDataFrame(
        rows, "query_id int, vec_id long, score double, embedding array<double>"
    )
    f = mmr_rerank(cands, k=6, lambda_=0.5).orderBy("mmr_rank").collect()
    q = mmr_rerank_quantized(cands, k=6, lambda_e6=500_000).orderBy("mmr_rank").collect()
    assert [r["vec_id"] for r in f] == [r["vec_id"] for r in q]
    # quantized scores are the exact integer form of the float scores
    for rf, rq in zip(f, q):
        assert abs(rf["mmr_score"] * 2e12 - 2 * rq["mmr_score_e12"]) <= 2e6


def test_mmr_quantized_zero_norm_embedding_no_keyerror(spark):
    """Regression: a zero-norm embedding yields NULL cosine for its
    non-self pairs; the quantized greedy used to KeyError on the
    missing sim entry. It must degrade like the float path (missing
    sim treated as 0) and still return k rows."""
    from hippollm_spark.operators.ranking import mmr_rerank_quantized

    rows = [
        (0, 1, 0.9, [1.0, 0.0]),
        (0, 2, 0.8, [0.0, 0.0]),  # zero-norm -> NULL cosine vs others
        (0, 3, 0.7, [0.0, 1.0]),
    ]
    cands = spark.createDataFrame(
        rows, "query_id int, vec_id long, score double, embedding array<double>"
    )
    out = (
        mmr_rerank_quantized(cands, k=3, lambda_e6=500_000)
        .orderBy("mmr_rank")
        .collect()
    )
    assert [r["vec_id"] for r in out] == [1, 2, 3]  # rel order, sim-0 ties
    assert len(out) == 3
