"""Property-based tests (hypothesis) for the pure-Python kernels and
splitter invariants — arbitrary inputs, reference invariants from
tests/test_splitters.py:30-31 of the reference suite."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from hippollm_spark.functions.text import (
    SEPARATORS,
    _recursive_split,
    choice_selection,
    parse_bullet_points,
)
from hippollm_spark.testing import hash_embedding

TEXTISH = st.text(alphabet="abcdefgh XY.?!;,\n", max_size=400)


@given(TEXTISH, st.integers(min_value=5, max_value=120))
@settings(max_examples=200, deadline=None)
def test_recursive_split_reconstructs(text, chunk_size):
    chunks = _recursive_split(text, chunk_size, SEPARATORS)
    assert "".join(chunks) == text
    assert all(chunks), "no empty chunks"
    # a chunk may only exceed chunk_size if it is a single unsplittable run
    for c in chunks:
        if len(c) > chunk_size:
            assert not any(s in c[:-len(s) or None] for s in SEPARATORS) or len(
                [p for p in re.split("|".join(map(re.escape, SEPARATORS)), c) if p]
            ) <= 1


@given(st.lists(st.text(alphabet="abc XYZ", min_size=1, max_size=40), max_size=8))
@settings(max_examples=100, deadline=None)
def test_parse_bullets_roundtrip(items):
    items = [i.strip() for i in items if i.strip()]
    raw = "\n".join(f"- {i}" for i in items)
    assert parse_bullet_points(raw) == items


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_parse_bullets_total(raw):
    out = parse_bullet_points(raw)
    assert isinstance(out, list)
    assert all(isinstance(x, str) and x.strip() == x for x in out)


@given(st.text(max_size=50), st.lists(st.text(min_size=1, max_size=20), max_size=5))
@settings(max_examples=100, deadline=None)
def test_choice_selection_total(answer, choices):
    got = choice_selection(answer, choices)
    assert got is None or got in choices


@given(st.text(max_size=60), st.integers(min_value=1, max_value=64))
@settings(max_examples=50, deadline=None)
def test_hash_embedding_deterministic_and_bounded(text, dim):
    v1 = hash_embedding(text, dim)
    v2 = hash_embedding(text, dim)
    assert v1 == v2
    assert len(v1) == dim
    assert all(-1.0 <= x <= 1.0 for x in v1)


# --------------------------------------------------------------------------
# Spark-backed properties for the training-mix operators: few examples
# (each example is a real Spark job), each checked against an
# independent pure-Python implementation.
# --------------------------------------------------------------------------

@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(1, 500)),
        min_size=1,
        max_size=30,
    ),
    st.integers(16, 1024),
)
def test_pack_sequences_matches_prefix_sums(spark, rows, ctx):
    from hippollm_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, shard, n) for i, (shard, n) in enumerate(rows)],
        "doc_id long, lang string, n_tokens long",
    )
    got = {
        r["doc_id"]: (r["start_offset"], r["chunk_id"])
        for r in pack_sequences(docs, ctx=ctx, shard_col="lang").collect()
    }
    acc: dict[str, int] = {}
    for i, (shard, n) in enumerate(rows):
        start = acc.get(shard, 0)
        assert got[i] == (start, start // ctx), (i, shard, n, ctx)
        acc[shard] = start + n


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_canonicalize_matches_union_find(spark, pairs):
    from hippollm_spark.operators.dedup import dedup_canonicalize

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["canonical_id"] for r in dedup_canonicalize(df).collect()
    }
    # independent oracle: union-find over the same pairs
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want
