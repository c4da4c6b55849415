"""Incremental annotation over a document stream: two docs arriving in
separate micro-batches end up in the same store with consistent ids and
cross-batch dedup (the second batch's duplicate is dropped against the
fact added by the first)."""

from __future__ import annotations

from hippollm_spark.pipelines.annotate import AnnotateConfig
from hippollm_spark.pipelines.backends import ScriptedLLM, ScriptedNLI
from hippollm_spark.store import HippoStore
from hippollm_spark.streaming.annotate_stream import annotate_stream, read_doc_stream
from hippollm_spark.testing import hash_embedding_udf

DIM = 16

LLM_SCRIPT = {
    "Summarize in one sentence": "Stream docs.",
    "The sky is blue.": "- The sky is blue",
    "Blue is the sky's color.": "- The sky has a blue color",
    "Statement: The sky is blue": "The sky is blue",
    "Statement: The sky has a blue color": "The sky has a blue color",
    "A: The sky is blue\nB: The sky has a blue color": "Yes",
    "Fact: The sky is blue": "- Sky",
    "Fact: The sky has a blue color": "- Sky",
}

NLI_TABLE = {("The sky is blue", "The sky has a blue color"): 0.8}


def test_annotate_stream_two_epochs(spark, tmp_path):
    drop = tmp_path / "docs"
    drop.mkdir()
    docs1 = spark.createDataFrame(
        [(1, "d1", "u1", "The sky is blue.", None)],
        "doc_id long, title string, url string, content string, date timestamp",
    )
    docs2 = spark.createDataFrame(
        [(2, "d2", "u2", "Blue is the sky's color.", None)],
        docs1.schema,
    )
    docs1.coalesce(1).write.mode("append").parquet(str(drop))
    docs2.coalesce(1).write.mode("append").parquet(str(drop))

    store = HippoStore(spark, embed=hash_embedding_udf(DIM), dim=DIM)
    stream = read_doc_stream(spark, str(drop), max_files_per_trigger=1)
    q = annotate_stream(
        stream,
        store,
        ScriptedLLM(script=LLM_SCRIPT),
        ScriptedNLI(table=NLI_TABLE),
        hash_embedding_udf(DIM),
        AnnotateConfig(splitter="paragraph", embed_dim=DIM),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    # one doc per micro-batch (maxFilesPerTrigger=1, separate files):
    # the second doc's fact entails the first and is dropped
    facts = store.facts.collect()
    texts = sorted(r["text"] for r in facts)
    assert texts == ["The sky is blue"]
    assert [r["id"] for r in facts] == [0]
    assert sorted(r["name"] for r in store.entities.collect()) == ["Sky"]


def test_annotate_stream_two_epochs_with_ann_index(spark, tmp_path):
    """Same two-epoch scenario through the per-epoch IVF index rebuild
    (full-width probe = exact parity): the second epoch's duplicate is
    deduped against the FIRST epoch's fact via the index built at epoch
    start — the reference's always-current-HNSW coverage."""
    drop = tmp_path / "docs"
    drop.mkdir()
    docs1 = spark.createDataFrame(
        [(1, "d1", "u1", "The sky is blue.", None)],
        "doc_id long, title string, url string, content string, date timestamp",
    )
    docs2 = spark.createDataFrame(
        [(2, "d2", "u2", "Blue is the sky's color.", None)],
        docs1.schema,
    )
    docs1.coalesce(1).write.mode("append").parquet(str(drop))
    docs2.coalesce(1).write.mode("append").parquet(str(drop))

    store = HippoStore(spark, embed=hash_embedding_udf(DIM), dim=DIM)
    stream = read_doc_stream(spark, str(drop), max_files_per_trigger=1)
    q = annotate_stream(
        stream,
        store,
        ScriptedLLM(script=LLM_SCRIPT),
        ScriptedNLI(table=NLI_TABLE),
        hash_embedding_udf(DIM),
        AnnotateConfig(splitter="paragraph", embed_dim=DIM),
        checkpoint=str(tmp_path / "ckpt"),
        use_ann_index=True,
        index_nlist=2,
        index_nprobe=2,
    )
    q.processAllAvailable()
    q.stop()

    texts = sorted(r["text"] for r in store.facts.collect())
    assert texts == ["The sky is blue"]  # cross-epoch dedup via the index
    assert sorted(r["name"] for r in store.entities.collect()) == ["Sky"]
