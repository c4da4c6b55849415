"""Run the engine's splitters over the REFERENCE's own fixture files
(reference tests/assets/{rust,short}.txt) and assert the reference's
splitter invariants (reference tests/test_splitters.py:21-31):
first chunk starts at 0, last chunk ends at len(text), every chunk's
text equals the substring at its recorded positions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

ASSETS = "/root/reference/tests/assets"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{ASSETS}/rust.txt"), reason="reference assets not present"
)


@pytest.fixture(scope="module")
def ref_docs(spark):
    rows = []
    for i, name in enumerate(["rust.txt", "short.txt"]):
        with open(f"{ASSETS}/{name}", encoding="utf-8") as f:
            rows.append((i, name, f.read()))
    return spark.createDataFrame(rows, "doc_id long, name string, content string").cache()


def _assert_invariants(chunks, ref_docs, *, contiguous: bool):
    joined = chunks.join(ref_docs, "doc_id")
    mismatched = joined.filter(
        F.col("text") != F.expr("substring(content, pos_start + 1, pos_end - pos_start)")
    )
    assert mismatched.count() == 0
    firsts = chunks.groupBy("doc_id").agg(F.min("pos_start").alias("s")).collect()
    assert all(r["s"] == 0 for r in firsts)
    lasts = (
        chunks.groupBy("doc_id").agg(F.max("pos_end").alias("e")).join(ref_docs, "doc_id").collect()
    )
    assert all(r["e"] == len(r["content"]) for r in lasts)
    if contiguous:
        # chunks tile the document with no gaps
        rows = chunks.orderBy("doc_id", "chunk_idx").collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for rs in by_doc.values():
            for a, b in zip(rs, rs[1:]):
                assert a["pos_end"] == b["pos_start"]


def test_naive_splitter_on_reference_assets(spark, ref_docs):
    from hippollm_spark.functions.text import split_naive

    _assert_invariants(split_naive(ref_docs, chunk_size=1000), ref_docs, contiguous=True)


def test_recursive_splitter_on_reference_assets(spark, ref_docs):
    from hippollm_spark.functions.text import split_recursive

    chunks = split_recursive(ref_docs, chunk_size=1000)
    _assert_invariants(chunks, ref_docs, contiguous=True)
    assert chunks.filter(F.length("text") > 1000).count() == 0
    # both documents actually split into multiple chunks at size 1000
    counts = {r["doc_id"]: r["n"] for r in chunks.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert counts[0] > 1


def test_semantic_splitter_on_reference_assets(spark, ref_docs):
    from hippollm_spark.functions.text import split_semantic
    from hippollm_spark.testing import hash_embedding

    chunks = split_semantic(ref_docs, lambda s: hash_embedding(s, 16), 80.0)
    _assert_invariants(chunks, ref_docs, contiguous=True)


def test_full_annotation_on_reference_asset(spark, ref_docs):
    """The analog of the reference's gated long test
    (tests/test_annotator.py: full annotate() on short.txt then
    integrity + non-empty assertions) — runnable here because the
    models are deterministic fakes."""
    from hippollm_spark.pipelines.annotate import AnnotateConfig, annotate_documents
    from hippollm_spark.pipelines.backends import ExtractiveFakeLLM, ScriptedNLI
    from hippollm_spark.store import HippoStore
    from hippollm_spark.testing import hash_embedding_udf

    docs = ref_docs.filter("name = 'short.txt'").select(
        "doc_id",
        F.col("name").alias("title"),
        F.lit("file://short.txt").alias("url"),
        "content",
        F.lit(None).cast("timestamp").alias("date"),
    )
    store = HippoStore(spark, embed=hash_embedding_udf(16), dim=16)
    annotate_documents(
        store, docs, ExtractiveFakeLLM(), ScriptedNLI(), hash_embedding_udf(16),
        AnnotateConfig(splitter="recursive", chunk_size=1000, embed_dim=16),
    )
    assert store.facts.count() > 0
    assert store.entities.count() > 0
    assert store.check_integrity()["ok"] == 1
    # hyperedges reference known entities only
    dangling = store.edges.join(
        store.entities.select(F.col("name").alias("entity")), "entity", "left_anti"
    )
    assert dangling.count() == 0


def test_recursive_langchain_golden_vectors(spark):
    """T3 parity: split_recursive_langchain reproduces the committed
    golden chunk lists for the reference's own fixtures
    (reference tests/assets/rust.txt, short.txt; chunk_size=1000,
    langchain default overlap=200, separators from annotator.py:33).
    Goldens were generated from the public langchain
    RecursiveCharacterTextSplitter algorithm (keep_separator=True,
    strip_whitespace=True) and spot-checked for the overlap carry."""
    import json
    import os

    from hippollm_spark.functions.text import split_recursive_langchain

    golden = json.load(
        open(os.path.join(os.path.dirname(__file__), "assets_recursive_golden.json"))
    )
    texts = {
        name: open(f"/root/reference/tests/assets/{name}").read()
        for name in golden
    }
    docs = spark.createDataFrame(
        [(i, texts[name]) for i, name in enumerate(sorted(golden))],
        "doc_id long, content string",
    )
    out = split_recursive_langchain(docs, 1000, 200).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, name in enumerate(sorted(golden)):
        rows = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        assert [r["text"] for r in rows] == golden[name], name
        text = texts[name]
        for r in rows:
            # reference position recovery: chunk is the exact substring
            assert text[r["pos_start"]:r["pos_end"]] == r["text"], name
            assert len(r["text"]) <= 1000


def test_semantic_langchain_golden_vectors(spark):
    """T4 parity: split_semantic_langchain reproduces the committed
    golden chunk lists for the reference's own fixtures (reference
    tests/assets/rust.txt, short.txt; SemanticChunker defaults:
    percentile 95, buffer_size 1, sentence regex (?<=[.?!])\\s+),
    embedded with the deterministic dim-16 hash embedder. Goldens
    were generated from the published SemanticChunker algorithm
    (langchain-experimental text_splitter.py — the library itself is
    not installable in this container, so the replica is committed
    alongside and auditable against the real library offline).
    Positions follow the reference's cursor-find (splitters.py:19-27)
    INCLUDING its miss behavior when a chunk's re-joined whitespace
    differs from the original (one such chunk in rust.txt)."""
    import json
    import os

    from hippollm_spark.functions.text import split_semantic_langchain
    from hippollm_spark.testing import hash_embedding

    golden = json.load(
        open(os.path.join(os.path.dirname(__file__), "assets_semantic_golden.json"))
    )
    texts = {
        name: open(f"/root/reference/tests/assets/{name}").read()
        for name in golden
    }
    docs = spark.createDataFrame(
        [(i, texts[name]) for i, name in enumerate(sorted(golden))],
        "doc_id long, content string",
    )
    out = split_semantic_langchain(
        docs, lambda s: hash_embedding(s, 16), 95.0, 1
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, name in enumerate(sorted(golden)):
        rows = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        assert [r["text"] for r in rows] == golden[name], name
        # positions replay the reference's cursor-find arithmetic
        text, j = texts[name], 0
        for r in rows:
            j += text[j:].find(r["text"][: min(100, len(r["text"]))])
            assert r["pos_start"] == j, name
            assert r["pos_end"] == j + len(r["text"]), name
        # rust.txt is multi-sentence: the splitter must actually split
        if name == "rust.txt":
            assert len(rows) > 1
