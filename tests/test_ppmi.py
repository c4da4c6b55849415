"""PPMI co-occurrence vectors vs a pure-Python replica."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from hippollm_spark.operators.textstats import ppmi_pairs, ppmi_vectors


def _ppmi_reference(texts, vocab_size, window):
    tok_docs = [t.lower().split() for t in texts]
    counts = Counter(w for d in tok_docs for w in d)
    vocab = set(
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_size
        ]
    )
    pair = Counter()
    for d in tok_docs:
        for i, w in enumerate(d):
            if w not in vocab:
                continue
            for o in range(-window, window + 1):
                if o == 0 or not (0 <= i + o < len(d)):
                    continue
                c = d[i + o]
                if c in vocab:
                    pair[(w, c)] += 1
    total = sum(pair.values())
    na = Counter()
    nb = Counter()
    for (a, b), n in pair.items():
        na[a] += n
        nb[b] += n
    return {
        (a, b): (n, round(max(0.0, math.log(n * total / (na[a] * nb[b]))), 6))
        for (a, b), n in pair.items()
    }


def test_ppmi_pairs_match_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog met",
        "the mat and the log",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["term_a"], r["term_b"]): (r["n_ab"], r["ppmi"])
        for r in ppmi_pairs(df, vocab_size=20, window=2).collect()
    }
    want = _ppmi_reference(texts, 20, 2)
    assert got == want
    # symmetric window => symmetric counts
    assert got[("cat", "sat")][0] == got[("sat", "cat")][0]


def test_ppmi_vectors_shape_and_similarity(spark):
    # two interchangeable words share contexts; an unrelated word doesn't
    texts = [
        "red apple tastes sweet", "green apple tastes sweet",
        "red pear tastes sweet", "green pear tastes sweet",
        "the engine burns fuel", "the engine needs fuel",
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pairs = ppmi_pairs(df, vocab_size=30, window=2)
    vecs = {r["term"]: np.array(r["embedding"]) for r in ppmi_vectors(pairs).collect()}
    dim = len(next(iter(vecs.values())))
    assert all(len(v) == dim for v in vecs.values())

    def cos(a, b):
        return float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))

    assert cos("apple", "pear") > cos("apple", "engine")
    assert cos("apple", "pear") > 0.5
