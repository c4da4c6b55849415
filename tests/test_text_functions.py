"""Splitter invariants (reference tests/test_splitters.py:21-31) and the
bullet-parser golden cases (reference tests/test_helpers.py:3-63)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hippollm_spark.functions import text as TX

LOREM = (
    "Spark is a unified analytics engine. It scales to thousands of nodes.\n\n"
    "Catalyst optimizes logical plans; Tungsten generates code. "
    "Shuffles are the expensive part, so partition wisely! "
    "Broadcast the small side; salt the skewed keys.\n\n"
    "Structured Streaming handles late data with watermarks."
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, LOREM), (1, "short text"), (2, "x" * 205), (3, "")]
    return spark.createDataFrame(rows, "doc_id long, content string").cache()


def _check_invariants(chunks, docs):
    """Reference splitter invariants: first chunk starts at 0, last ends
    at len(content), text == substring(content, pos_start, pos_end)."""
    joined = chunks.join(docs, "doc_id")
    bad = joined.filter(
        F.col("text")
        != F.expr("substring(content, pos_start + 1, pos_end - pos_start)")
    )
    assert bad.count() == 0
    firsts = chunks.groupBy("doc_id").agg(F.min("pos_start").alias("s")).collect()
    assert all(r["s"] == 0 for r in firsts)
    lasts = (
        chunks.groupBy("doc_id")
        .agg(F.max("pos_end").alias("e"))
        .join(docs, "doc_id")
        .collect()
    )
    assert all(r["e"] == len(r["content"]) for r in lasts if r["content"])


def test_split_naive_invariants(docs, spark):
    chunks = TX.split_naive(docs.filter("content != ''"), chunk_size=50)
    _check_invariants(chunks, docs)
    two = chunks.filter("doc_id = 2").orderBy("chunk_idx").collect()
    assert [r["pos_start"] for r in two] == [0, 50, 100, 150, 200]
    assert two[-1]["pos_end"] == 205 and len(two[-1]["text"]) == 5


def test_split_paragraphs(docs):
    chunks = TX.split_paragraphs(docs.filter("doc_id = 0"))
    rows = chunks.orderBy("chunk_idx").collect()
    assert len(rows) == 3
    assert rows[0]["pos_start"] == 0
    # +2 offset per '\n\n' separator (reference splitters.py:80-96)
    assert rows[1]["pos_start"] == rows[0]["pos_end"] + 2
    assert rows[2]["pos_end"] == len(LOREM)


def test_split_recursive_invariants(docs):
    chunks = TX.split_recursive(docs.filter("content != ''"), chunk_size=80)
    _check_invariants(chunks, docs)
    assert chunks.filter(F.length("text") > 80).count() == 0


def test_first_sentence(spark):
    df = spark.createDataFrame(
        [("Hello world. Second sentence.",), ("No terminator here",)],
        "t string",
    )
    got = [r[0] for r in df.select(TX.first_sentence("t")).collect()]
    assert got == ["Hello world.", "No terminator here"]


# Golden cases mirroring the reference's seven parser tests
# (tests/test_helpers.py:3-63).
PARSER_CASES = [
    ("- fact one\n- fact two", ["fact one", "fact two"]),
    ("* fact one\n* fact two", ["fact one", "fact two"]),
    ("1. fact one\n2. fact two", ["fact one", "fact two"]),
    ("Here are the facts:\n- fact one\n- fact two", ["fact one", "fact two"]),
    ("There are no facts.", []),
    ("None", []),
    ("fact one\nfact two", ["fact one", "fact two"]),
    ("Facts:\n- a\n- b", ["a", "b"]),
]


@pytest.mark.parametrize("raw,expected", PARSER_CASES)
def test_parse_bullet_points(raw, expected):
    assert TX.parse_bullet_points(raw) == expected


def test_parse_bullets_only_first_block():
    raw = "- a\n- b\nSome trailing prose explains things."
    assert TX.parse_bullet_points(raw, only_first_bullets=True) == ["a", "b"]
    assert TX.parse_bullet_points(raw) == ["a", "b", "Some trailing prose explains things."]


def test_choice_selection():
    assert TX.choice_selection("Paris", ["Paris", "London"]) == "Paris"
    assert TX.choice_selection("I think it is London", ["Paris", "London"]) == "London"
    assert TX.choice_selection("none of these", ["Paris"]) is None


def test_is_yes(spark):
    df = spark.createDataFrame([(" Yes!",), ("no",), ("YEAH",)], "t string")
    assert [r[0] for r in df.select(TX.is_yes("t")).collect()] == [True, False, True]


def test_scrub_pii_replaces_each_class(spark):
    from hippollm_spark.operators.textstats import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io or https://x.io/p?q=1 or +4915123456789 done"),
         (2, "nothing sensitive here")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in df.select(
        "id", scrub_pii("text").alias("s"), *pii_counts("text")).collect()}
    assert rows[1]["s"] == "mail <EMAIL> or <URL> or <PHONE> done"
    assert (rows[1]["n_email"], rows[1]["n_url"], rows[1]["n_phone"]) == (1, 1, 1)
    assert rows[2]["s"] == "nothing sensitive here"
    assert (rows[2]["n_email"], rows[2]["n_url"], rows[2]["n_phone"]) == (0, 0, 0)


def test_quality_gate_matches_quality_features(spark, documents):
    """The stream-legal gate's inline score must agree with
    quality_features row-for-row."""
    from hippollm_spark.operators.textstats import quality_features, quality_gate

    thr = 55_000_000
    want = {
        r["doc_id"]
        for r in quality_features(documents).collect()
        if r["quality_score_e8"] >= thr
    }
    got_all = {
        r["doc_id"]
        for r in quality_gate(
            documents, min_quality_e8=thr, require_lang=False
        ).collect()
    }
    assert got_all == want


def test_repetition_signals_hand_computed(spark):
    """Gopher repetition signals on a hand-checked micro-corpus."""
    from hippollm_spark.operators.textstats import repetition_signals

    df = spark.createDataFrame(
        [
            # "a b a b a b": 2-grams [ab, ba, ab, ba, ab] -> max 3 of 5;
            # 3-grams [aba, bab, aba, bab] -> max 2; 5-grams [ababa, babab]
            # -> all distinct
            (1, "a b a b a b"),
            # no repeats at all
            (2, "one two three four five six"),
            # shorter than every n-gram window
            (3, "single"),
            # exact duplicated 5-gram: "p q r s t p q r s t"
            # 5-grams: pqrst qrstp rstpq stpqr tpqrs pqrst -> 6 total, 5 distinct
            (4, "p q r s t p q r s t"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rows[1]["n_tokens"] == 6
    assert rows[1]["top2_frac"] == round(3 * 2 / 6, 6) == 1.0
    assert rows[1]["top3_frac"] == round(2 * 3 / 6, 6) == 1.0
    assert rows[1]["dup5_frac"] == 0.0
    assert rows[2]["top2_frac"] == round(1 * 2 / 6, 6)
    assert rows[2]["top3_frac"] == round(1 * 3 / 6, 6)
    assert rows[2]["dup5_frac"] == 0.0
    assert rows[3]["n_tokens"] == 1
    assert rows[3]["top2_frac"] == 0.0
    assert rows[3]["top3_frac"] == 0.0
    assert rows[3]["dup5_frac"] == 0.0
    assert rows[4]["dup5_frac"] == round(1 / 6, 6)


def test_quality_gate_repetition_filters(spark):
    """The stream-legal repetition gates agree with repetition_signals'
    thresholds row-for-row."""
    from hippollm_spark.operators.textstats import quality_gate, repetition_signals

    rows = [
        (1, "spark shuffles data across the executors with a hash " * 6),
        (2, "the quick brown fox jumps over the lazy dog near the river "
            "bank and rests in the shade of the old tree"),
        (3, "go go go go go go go go go go go go"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    want = {
        d for d, r in sig.items()
        if r["top2_frac"] <= 0.5 and r["dup5_frac"] <= 0.2
    }
    got = {
        r["doc_id"]
        for r in quality_gate(
            docs,
            min_quality_e8=0,
            require_lang=False,
            max_top2_frac=0.5,
            max_dup5_frac=0.2,
        ).collect()
    }
    assert got == want
    assert 2 in got and 3 not in got  # sanity: repeated docs filtered
