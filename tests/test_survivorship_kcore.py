"""Golden-record survivorship, k-core peeling, and domain-quality
verdicts."""

from __future__ import annotations

from pyspark.sql import functions as F

from hippollm_spark.operators.dedup import golden_record
from hippollm_spark.operators.graph import k_core
from hippollm_spark.pipelines.curate import domain_filter, domain_quality_stats


def test_golden_record_picks_by_rank_and_fills(spark):
    docs = spark.createDataFrame(
        [
            # group 1 (canonical 1): 3 members, survivor = longest (id 2)
            (1, "short", None, 5),
            (2, "the longest text here", "src_a", 21),
            (3, "mid text", "src_b", 8),
            # group 10: single pair, tie on length -> min id wins
            (10, "aaaa", None, 4),
            (11, "bbbb", "src_c", 4),
        ],
        "doc_id long, text string, source string, n_chars int",
    )
    assignments = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, canonical_id long",
    )
    out = {
        r["group_id"]: r
        for r in golden_record(
            docs,
            assignments,
            rank_cols=[F.col("n_chars").desc()],
            fill_cols=["source"],
        ).collect()
    }
    assert out[1]["doc_id"] == 2 and out[1]["n_members"] == 3
    assert out[1]["source"] == "src_a"  # survivor had it
    assert out[10]["doc_id"] == 10  # tie -> min id
    # survivor 10's null source back-filled from next-ranked member 11
    assert out[10]["source"] == "src_c"
    assert out[10]["n_members"] == 2


def test_golden_record_excludes_singletons(spark):
    docs = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (99, "solo", 4)],
        "doc_id long, text string, n_chars int",
    )
    assignments = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, canonical_id long"
    )
    rows = golden_record(
        docs, assignments, rank_cols=[F.col("n_chars").desc()]
    ).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_k_core_peels_tail(spark):
    # triangle A-B-C (2-core) with a pendant chain C-D-E
    edges = _sym(
        spark,
        [("A", "B"), ("B", "C"), ("A", "C"), ("C", "D"), ("D", "E")],
    )
    out = {r["vertex"]: r["degree"] for r in k_core(edges, 2).collect()}
    assert set(out) == {"A", "B", "C"}
    assert all(d == 2 for d in out.values())


def test_k_core_cascading_removal_needs_multiple_rounds(spark):
    # path graph a-b-c-d-e: 2-core is empty, but only after cascading
    # peels (endpoints first, then the chain unravels)
    edges = _sym(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    assert k_core(edges, 2).count() == 0


def test_k_core_whole_graph_survives(spark):
    # K4: every vertex degree 3 -> 3-core keeps everything
    vs = ["w", "x", "y", "z"]
    pairs = [(a, b) for a in vs for b in vs if a < b]
    out = k_core(_sym(spark, pairs), 3).collect()
    assert len(out) == 4 and all(r["degree"] == 3 for r in out)


def test_domain_quality_stats_and_filter(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again", "good.com"),
            (2, "a fine and readable sentence with the usual words", "good.com"),
            (3, "!!!! ???? @@@@ #### $$$$ %%%%", "spam.com"),
            (4, "zz zz zz zz zz zz zz zz", "spam.com"),
            (5, "blocked content that is otherwise fine to read", "evil.com"),
        ],
        "doc_id long, text string, source string",
    )
    stats = {
        r["domain"]: r
        for r in domain_quality_stats(
            docs, min_docs=2, min_mean_score=0.5, blocklist=["evil.com"]
        ).collect()
    }
    assert stats["good.com"]["keep"] is True
    assert stats["spam.com"]["keep"] is False  # junk text scores low
    assert stats["evil.com"]["keep"] is False  # blocklisted
    assert stats["evil.com"]["n_docs"] == 1

    verdicts = domain_quality_stats(
        docs, min_docs=2, min_mean_score=0.5, blocklist=["evil.com"]
    )
    kept = sorted(
        r["doc_id"] for r in domain_filter(docs, verdicts).collect()
    )
    assert kept == [1, 2]
