"""Vector column expressions — JVM-side, codegen-friendly.

All distance math is expressed with ``zip_with`` / ``aggregate`` higher-
order functions so it executes inside whole-stage codegen (no Python
boundary in the hot path). Inputs are cast to DOUBLE before arithmetic so
results are bit-comparable with the DuckDB oracle's
``list_distance(a::DOUBLE[], b::DOUBLE[])`` (both engines then do a
sequential double-precision fold).

Reference semantics: ChromaDB 0.4.24 default L2 distance, unnormalized
embeddings (reference storage.py:124-133; SURVEY.md §2.4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_vec(values: Sequence[float]) -> Column:
    """A literal ARRAY<DOUBLE> column for a query vector."""
    return F.array(*[F.lit(float(v)) for v in values])


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def _as_col_or_vec(b: Column | str | Sequence[float]) -> Column:
    """Column passes through, a string is a column NAME, any other
    sequence is a literal query vector."""
    if isinstance(b, Column):
        return b
    if isinstance(b, str):
        return F.col(b)
    return to_vec(b)


def l2_squared(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """Sum of squared differences (monotone in L2; avoids the sqrt)."""
    b = _as_col_or_vec(b)
    diffsq = F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffsq, F.lit(0.0), lambda acc, v: acc + v)


def l2_distance(a: Column | str, b: Column | Sequence[float]) -> Column:
    """Euclidean distance — matches DuckDB ``list_distance``."""
    return F.sqrt(l2_squared(a, b))


def dot(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    b = _as_col_or_vec(b)
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, F.col(a) if isinstance(a, str) else a))


def cosine_similarity(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """dot(a,b) / (|a||b|) — matches DuckDB ``list_cosine_similarity``."""
    b = _as_col_or_vec(b)
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


def label_centroids(
    df,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
):
    """Per-label centroid (element-wise mean) of an embedding column, in
    LONG format: (label, pos, c) — one row per label per dimension.

    posexplode + hash-aggregate on (label, pos): the shuffle key carries
    the dimension index, so the load is spread over labels × dim
    reducers regardless of label skew, and Spark's map-side partial
    aggregation means the shuffle volume is #partitions × #labels × dim
    rows, independent of corpus size — the scalable shape for a 100-TB
    corpus with a handful of labels.

    Float discipline (cross-engine determinism): per-dimension sums are
    exact DECIMAL(38,10) (order-independent), cast to DOUBLE once, then
    one IEEE double division by the count and a 6dp round — every step
    bit-identical between the JVM and the DuckDB oracle.
    """
    ex = df.select(label_col, F.posexplode(vec_col).alias("pos", "val"))
    s = F.sum(F.col("val").cast("double").cast("decimal(38,10)"))
    return ex.groupBy(label_col, "pos").agg(
        F.round(s.cast("double") / F.count("*"), 6).alias("c")
    )
