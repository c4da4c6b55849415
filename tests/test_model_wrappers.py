"""Executor-local model wrappers with injected deterministic loaders —
pins the loading contract (once per process per model), the batching
contract (one encode/predict per call), and the reference's argmax==1
entailment semantics (nlp_additional.py:16-34) without the real
runtime. Loaders live in hippollm_spark.testing so executor processes
can unpickle them."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import hippollm_spark.pipelines.models as M
from hippollm_spark.pipelines.models import CrossEncoderNLI, SentenceTransformerEmbed
from hippollm_spark.testing import fake_ce_loader, fake_st_loader


@pytest.fixture(autouse=True)
def fresh_caches(monkeypatch):
    monkeypatch.setattr(M, "_ST_CACHE", {})
    monkeypatch.setattr(M, "_CE_CACHE", {})


def test_embed_loads_once_and_batches(monkeypatch):
    loads = []

    def counting_loader(name):
        loads.append(name)
        return fake_st_loader(name)

    emb = SentenceTransformerEmbed("mini", dim=3, loader=counting_loader)
    out = emb.encode(["ab", "cdef", None])
    assert out == [[2.0, 1.0, 0.0], [4.0, 1.0, 0.0], [0.0, 1.0, 0.0]]
    emb.encode(["x"])
    assert loads == ["mini"]  # cached after first load


def test_embed_udf_runs_in_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("hi",), ("worlds",)], "t string")
    emb = SentenceTransformerEmbed("mini", dim=3, loader=fake_st_loader)
    out = df.withColumn("e", emb.udf()(F.col("t")))
    rows = {r["t"]: list(r["e"]) for r in out.collect()}
    assert rows["hi"][0] == 2.0 and rows["worlds"][0] == 6.0


def test_cross_encoder_reference_semantics():
    nli = CrossEncoderNLI("nli-x", loader=fake_ce_loader)
    assert nli.detect_entailment("paris is big", "paris grows")
    assert not nli.detect_entailment("paris is big", "london grows")
    assert nli.score("paris is big", "paris grows") == float(len("paris is big"))
    assert nli.score("paris is big", "london grows") is None

    res = nli.score_pairs(
        [("a b", "a c"), ("a b", "z c"), ("longer premise", "longer text")]
    )
    assert res[0] == 3.0 and res[1] is None
    assert res[2] == float(len("longer premise"))
    assert nli.score_pairs([]) == []

    # classify: entailing candidates ranked by entail score desc
    ranked = nli.entailment_classify(
        "paris", ["paris one", "nope", "paris twenty-two"]
    )
    assert [o for o, _ in ranked] == ["paris twenty-two", "paris one"]


def test_cross_encoder_drop_in_for_dedup_gate(spark):
    """CrossEncoderNLI satisfies the same gate surface ScriptedNLI
    does — dedup_facts runs end-to-end with it on executors."""
    from hippollm_spark.fixtures import DIM
    from hippollm_spark.pipelines.annotate import dedup_facts
    from hippollm_spark.pipelines.backends import ScriptedLLM
    from hippollm_spark.store import HippoStore
    from hippollm_spark.testing import hash_embedding_udf

    facts = spark.createDataFrame(
        [(1, "alpha fact one"), (2, "alpha fact one again"), (3, "beta different")],
        "__ord__ long, fact_text string",
    )
    store = HippoStore(spark, embed=hash_embedding_udf(DIM), dim=DIM)
    llm = ScriptedLLM(script={"A:": "Yes"})  # confirm every entailed pair
    nli = CrossEncoderNLI("nli-x", loader=fake_ce_loader)
    out = dedup_facts(facts, store, llm, nli, hash_embedding_udf(DIM), k=2)
    rows = {r["__ord__"]: r for r in out.collect()}
    assert not rows[1]["redundant"]  # first of its pair
    assert rows[2]["redundant"]
    assert rows[2]["dup_of"] is None and rows[2]["dup_of_ord"] == 1
    assert not rows[3]["redundant"]  # shares no first word with others


@pytest.mark.skipif(
    "HIPPODB_DO_LONG_TESTS" not in os.environ,
    reason="real-model integration: set HIPPODB_DO_LONG_TESTS (and have "
    "sentence-transformers + a model cache) to run — the reference's "
    "long-test gate (tests/test_annotator.py:10-12)",
)
def test_real_sentence_transformer_and_cross_encoder(spark):
    """Env-gated REAL-runtime integration (reference models:
    all-MiniLM-L6-v2 embeddings dim 384 — storage.py:117-122;
    nli-deberta-v3-base entailment — nlp_additional.py:9-34). Skipped
    in this container (no model runtimes); with a cache present it
    drives the identical wrappers every fake-loader test pins."""
    pytest.importorskip("sentence_transformers")
    emb = SentenceTransformerEmbed()  # real loader, default model
    df = spark.createDataFrame(
        [(1, "Paris is the capital of France"), (2, "The Seine is a river")],
        "id long, text string",
    )
    out = df.withColumn("e", emb.udf()(F.col("text"))).collect()
    assert all(len(r["e"]) == 384 for r in out)
    # embeddings are text-dependent
    assert out[0]["e"][:8] != out[1]["e"][:8]

    nli = CrossEncoderNLI()  # real loader, default model
    assert nli.detect_entailment(
        "Paris is the capital of France", "Paris is in France"
    )
    assert not nli.detect_entailment(
        "Paris is the capital of France", "Paris is in Spain"
    )
    s = nli.score("Paris is the capital of France", "Paris is in France")
    assert s is not None and s > 0
