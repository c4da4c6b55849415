"""Skew mitigation primitives for hot keys.

AQE's skew-join handles most cases at runtime; these helpers cover the
two shapes AQE cannot fix:

- ``salted_aggregate``: two-phase aggregation for algebraic aggregates
  over a skewed group key — partial-aggregate on (key, salt), then
  final-combine on key. The hot key's rows spread over ``n_salts``
  tasks instead of one.
- ``salted_join``: replicate the (small-ish) right side ``n_salts``
  times and salt the left side, turning one hot-key partition into
  ``n_salts`` partitions. For when broadcast is too big and AQE's
  split heuristic misses (e.g. the skew is in a later stage's derived
  key).
- ``top_frequencies``: cheap hot-key detector (sampled) to decide
  whether to salt at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_frequencies(
    df: DataFrame, key: str, n: int = 10, fraction: float = 0.01, seed: int = 7
) -> list[tuple]:
    """Approximate hottest keys via a sampled count (driver-side list of
    (key, approx_count))."""
    sampled = df.sample(fraction=fraction, seed=seed)
    rows = (
        sampled.groupBy(key)
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"))
        .limit(n)
        .collect()
    )
    scale = 1.0 / fraction
    return [(r[key], int(r["c"] * scale)) for r in rows]


def salted_aggregate(
    df: DataFrame,
    key: str | Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → (input col,
    fn) with fn ∈ {sum, count, min, max} (the algebraic aggregates that
    re-combine losslessly). Phase 1 groups on (key, salt); phase 2
    combines partials on key. Example::

        salted_aggregate(li, "l_orderkey", {"qty": ("l_quantity", "sum"),
                                            "n": ("*", "count")})
    """
    key = [key] if isinstance(key, str) else list(key)
    # salt from the row's physical position hash: spreads a hot key
    # uniformly without touching (or hashing) payload columns
    salted = df.withColumn(
        "__salt__", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )

    first_cols = []
    second_cols = []
    for out, (col, fn) in aggs.items():
        c = F.lit(1) if col == "*" else F.col(col)
        if fn == "count":
            first_cols.append(F.count(c).alias(f"__{out}__"))
            second_cols.append(F.sum(f"__{out}__").alias(out))
        elif fn == "sum":
            first_cols.append(F.sum(c).alias(f"__{out}__"))
            second_cols.append(F.sum(f"__{out}__").alias(out))
        elif fn == "min":
            first_cols.append(F.min(c).alias(f"__{out}__"))
            second_cols.append(F.min(f"__{out}__").alias(out))
        elif fn == "max":
            first_cols.append(F.max(c).alias(f"__{out}__"))
            second_cols.append(F.max(f"__{out}__").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    partial = salted.groupBy(*key, "__salt__").agg(*first_cols)
    return partial.groupBy(*key).agg(*second_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across
    ``n_salts`` partitions; the right side is replicated n_salts times
    (explode), so use only when right is much smaller than left but too
    big to broadcast."""
    lsalted = left.withColumn(
        "__salt__", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    rrepl = right.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lsalted.join(rrepl, on=[on, "__salt__"], how=how).drop("__salt__")
