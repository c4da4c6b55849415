"""Persisted LSH dedup index: batch-vs-index detection, within-batch
pairs, and the steady-state append loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from hippollm_spark.operators.dedup import incremental_dedup, save_dedup_index

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_against_index_and_within_batch(spark):
    corpus = _docs(
        spark,
        [
            (1, BASE),
            (2, "completely different content about spark and catalyst plans"),
        ],
    )
    save_dedup_index(spark, corpus, "dd_idx1")

    batch = _docs(
        spark,
        [
            (10, BASE + " extra"),           # near-dup of indexed doc 1
            (11, "brand new unique text with many novel words in it entirely"),
            (12, "brand new unique text with many novel words in it entirely!"),
            # 12 is a within-batch near-dup of 11
        ],
    )
    out = incremental_dedup(spark, batch, "dd_idx1", threshold=0.5)
    pairs = {(r["doc_id"], r["dup_of"]): r["jaccard"] for r in out.collect()}
    assert (10, 1) in pairs and pairs[(10, 1)] >= 0.5
    assert (12, 11) in pairs  # within-batch, earlier id wins
    assert all(d != 11 for d, _ in pairs)  # 11 itself is not a duplicate


def test_incremental_dedup_update_index_steady_state(spark):
    corpus = _docs(spark, [(1, BASE)])
    save_dedup_index(spark, corpus, "dd_idx2")

    b1 = _docs(
        spark,
        [(20, "some novel survivor document with plenty of distinct tokens here")],
    )
    out1 = incremental_dedup(spark, b1, "dd_idx2", update_index=True)
    assert out1.count() == 0  # unique -> survives, appended to index

    # a later batch duplicating the batch-1 survivor is now caught
    b2 = _docs(
        spark,
        [(30, "some novel survivor document with plenty of distinct tokens here!!")],
    )
    out2 = incremental_dedup(spark, b2, "dd_idx2")
    rows = out2.collect()
    assert len(rows) == 1 and rows[0]["dup_of"] == 20

    # duplicates are NOT appended: re-running the same batch still
    # matches the original survivor, not the duplicate
    out2b = incremental_dedup(spark, b2, "dd_idx2", update_index=True)
    assert {r["dup_of"] for r in out2b.collect()} == {20}
    b3 = _docs(
        spark,
        [(40, "some novel survivor document with plenty of distinct tokens here??")],
    )
    out3 = incremental_dedup(spark, b3, "dd_idx2")
    assert {r["dup_of"] for r in out3.collect()} == {20}


def test_incremental_dedup_retry_is_idempotent(spark):
    """foreachBatch retry / re-ingest: a batch whose doc_ids were
    ALREADY appended to the index (at-least-once semantics) must not
    match itself at jaccard 1.0 and vanish from the survivors sink."""
    corpus = _docs(spark, [(1, BASE)])
    save_dedup_index(spark, corpus, "dd_idx4")

    batch = _docs(
        spark,
        [(50, "unique retry survivor text with many fresh tokens appearing once")],
    )
    out1 = incremental_dedup(spark, batch, "dd_idx4", update_index=True)
    assert out1.count() == 0  # survivor appended to the index

    # the crash-retry replays the SAME batch against the index that now
    # contains it: no self-match, the doc survives again
    out_retry = incremental_dedup(spark, batch, "dd_idx4")
    assert out_retry.count() == 0

    # and a genuine near-dup of it is still caught exactly once
    b2 = _docs(
        spark,
        [(60, "unique retry survivor text with many fresh tokens appearing once!")],
    )
    rows = incremental_dedup(spark, b2, "dd_idx4").collect()
    assert len(rows) == 1 and rows[0]["dup_of"] == 50


def test_incremental_matches_oneshot_pairs(spark):
    """Index path finds the same dups the one-shot similarity join
    finds on the union corpus."""
    from hippollm_spark.operators.dedup import jaccard_dup_pairs

    corpus = _docs(
        spark,
        [(i, f"shared prefix tokens run long here plus filler{i} tail{i}")
         for i in range(5)],
    )
    save_dedup_index(spark, corpus, "dd_idx3")
    batch = _docs(
        spark,
        [(100, "shared prefix tokens run long here plus filler2 tail2 x")],
    )
    inc = incremental_dedup(spark, batch, "dd_idx3", threshold=0.5)
    got = {(r["doc_id"], r["dup_of"]) for r in inc.collect()}

    oneshot = jaccard_dup_pairs(corpus.unionByName(batch), threshold=0.5, n=3)
    want = {
        (r["doc_b"], r["doc_a"])
        for r in oneshot.collect()
        if r["doc_b"] == 100
    }
    assert got == want and len(got) > 0
