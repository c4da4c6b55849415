"""Gini coefficient, int8 quantization, and readability heuristics."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from hippollm_spark.functions.vectors import dequantize_int8, quantize_int8
from hippollm_spark.operators.stats import gini
from hippollm_spark.operators.textstats import readability_scores


def _gini_reference(xs):
    xs = np.sort(np.asarray(xs, dtype=float))
    n = len(xs)
    i = np.arange(1, n + 1)
    return 2 * (i * xs).sum() / (n * xs.sum()) - (n + 1) / n


def test_gini_matches_reference(spark):
    rng = np.random.RandomState(13)
    rows = []
    data = {
        "equal": [10.0] * 50,
        "pareto": list(np.round(rng.pareto(1.5, 200) * 10 + 0.01, 2)),
    }
    for g, xs in data.items():
        rows += [(g, float(v)) for v in xs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in gini(df, "v", "g").collect()}
    assert abs(out["equal"]["gini"]) < 1e-9
    want = _gini_reference(data["pareto"])
    assert abs(out["pareto"]["gini"] - want) < 1e-6
    assert out["pareto"]["n"] == 200


def test_gini_zero_total_null(spark):
    df = spark.createDataFrame([("z", 0.0), ("z", 0.0)], "g string, v double")
    assert gini(df, "v", "g").first()["gini"] is None


def test_quantize_int8_roundtrip_error_bounded(spark):
    rng = np.random.RandomState(8)
    mat = rng.randn(100, 16).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    q = quantize_int8(df)
    rows = dequantize_int8(q).collect()
    for r in rows:
        orig = np.array(mat[r["vec_id"]])
        dq = np.array(r["embedding_dq"])
        scale = r["q8_scale"]
        assert np.all(np.abs(np.array(r["q8"])) <= 127)
        assert np.allclose(orig, dq, atol=scale / 2 + 1e-12)
        # cosine preserved to quantization grid accuracy
        cos = (orig @ dq) / (np.linalg.norm(orig) * np.linalg.norm(dq))
        assert cos > 0.999


def test_quantize_int8_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    r = quantize_int8(df).first()
    assert r["q8"] == [0, 0, 0] and r["q8_scale"] == 0.0


def test_readability_hand_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, "zzz qqq"),  # no vowels, no sentence punctuation
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability_scores(df).collect()}
    r1 = out[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    # the, cat, sat, the, dog, ran -> one vowel group each
    assert r1["n_syllables"] == 6
    wps, spw = 3.0, 1.0
    assert abs(r1["flesch_ease"] - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-9
    assert out[2]["n_sentences"] == 1  # clamped
    assert out[2]["n_syllables"] == 0


def test_readability_orders_junk_below_prose(spark):
    df = spark.createDataFrame(
        [
            (1, "He went home. She read a book. It was good."),
            (2, "antidisestablishmentarianism electroencephalographically "
                "incomprehensibilities without punctuation at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["flesch_ease"] for r in readability_scores(df).collect()}
    assert out[1] > out[2]
