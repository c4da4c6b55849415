"""Statistical operators with scale-correct physical shapes.

``exact_percentiles``: grouped exact interpolated percentiles
(quantile_cont semantics) via sort + window instead of Spark's built-in
``percentile`` aggregate. The built-in buffers EVERY group value in an
in-memory ObjectHashAggregate buffer — at 100 TB a hot group OOMs an
executor. The sort-based shape shuffles once (range/hash by group),
sorts within partitions (Tungsten spillable sort), and picks the two
boundary rows per requested percentile — constant memory per group, and
~2-3× faster even at test scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str],
    percentiles: Sequence[float],
    *,
    round_to: int | None = None,
) -> DataFrame:
    """Exact interpolated percentiles per group.

    For percentile p over n sorted values v[1..n] (1-indexed):
    r = 1 + (n-1)*p; result = v[floor(r)] + (v[floor(r)+1] - v[floor(r)])
    * (r - floor(r)) — the quantile_cont / numpy 'linear' definition.

    Output: group cols + one column per percentile named ``p<percent>``
    (e.g. p25, p50, p75; p2_5 for fractional percents).
    """
    by = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*by).orderBy(F.col(value_col).asc())
    ranked = df.select(
        *by,
        F.col(value_col).alias("__v__"),
        F.row_number().over(w).alias("__rn__"),
        F.count("*").over(Window.partitionBy(*by)).alias("__n__"),
    )

    def _name(p: float) -> str:
        pct = p * 100
        s = f"{pct:g}".replace(".", "_").replace("-", "m")
        return f"p{s}"

    aggs = []
    for p in percentiles:
        # target continuous rank and its two boundary integer ranks
        r = 1 + (F.col("__n__") - 1) * F.lit(float(p))
        lo = F.floor(r).cast("long")
        frac = r - F.floor(r)
        # keep the value only on its boundary rows, then max-agg per group
        v_lo = F.max(F.when(F.col("__rn__") == lo, F.col("__v__")))
        v_hi = F.max(
            F.when(F.col("__rn__") == lo + 1, F.col("__v__"))
        )
        frac_val = F.max(F.when(F.col("__rn__") == lo, frac))
        expr = v_lo + (F.coalesce(v_hi, v_lo) - v_lo) * frac_val
        if round_to is not None:
            expr = F.round(expr, round_to)
        aggs.append(expr.alias(_name(p)))
    return ranked.groupBy(*by).agg(*aggs)


def approx_stats(
    df: DataFrame,
    value_col: str,
    distinct_col: str,
    by: str | Sequence[str],
    *,
    percentiles: Sequence[float] = (0.5,),
    rsd: float = 0.05,
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based grouped statistics: HyperLogLog++ distinct counts
    and quantile-sketch percentiles — the sub-linear-memory path for
    cardinalities where the exact forms (countDistinct's dedup
    shuffle, exact_percentiles' sort) are not worth their cost.

    Both sketches are mergeable, so partial aggregation stays map-side
    and the shuffle carries fixed-size sketch buffers instead of
    values: at 100 TB the shuffle volume is #groups × sketch size
    (KB), independent of row count — the entire point. Error is
    bounded, not zero: HLL++ relative error ≈ ``rsd``;
    percentile_approx rank error ≤ 1/``accuracy``. Tested against the
    exact operators at those bounds; deliberately NOT oracle-hashed
    (sketch internals differ across engines by design).
    """
    by = [by] if isinstance(by, str) else list(by)
    aggs = [
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("approx_distinct"),
        F.count("*").alias("n_rows"),
    ]
    for p in percentiles:
        aggs.append(
            F.percentile_approx(value_col, p, accuracy).alias(
                f"approx_p{int(round(p * 100)):02d}"
            )
        )
    return df.groupBy(*by).agg(*aggs)


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_share: float = 0.001,
    *,
    cap: int | None = None,
    share_ratio: tuple[int, int] | None = None,
) -> DataFrame:
    """Guaranteed-complete frequent items with EXACT counts in two
    passes and bounded executor memory (the scale-safe alternative to
    ``groupBy(col).count()`` when the item domain is huge — token
    vocabularies, URLs, user agents).

    Pass 1 runs Misra-Gries summaries per partition via ``mapInPandas``
    (at most ``cap`` counters live at once; batches are absorbed with
    vectorized value_counts, then compressed by the classic
    subtract-the-(cap+1)th-count step). MG summaries are mergeable with
    additive error ≤ n_partition/(cap+1), so with cap ≥ 2/min_share
    every item of global share ≥ min_share survives summation with a
    positive residual — the candidate set is provably complete; false
    positives are fine because pass 2 semi-joins candidates back and
    counts them EXACTLY, then applies the threshold. Output is
    therefore deterministic and oracle-checkable: identical to
    ``GROUP BY col HAVING count >= ceil(min_share·N)``, but the full
    shuffle only ever carries candidate rows.

    Output: (item, cnt, share 6dp) for items with cnt ≥
    ceil(min_share·N), where N = count of non-null rows.
    """
    import pandas as pd

    if cap is None:
        if share_ratio is not None:
            cap = max(16, (2 * share_ratio[1]) // max(1, share_ratio[0]))
        else:
            cap = max(16, int(2.0 / min_share))
    item_type = df.schema[col].dataType.simpleString()

    def _mg(batches):
        counts: dict = {}
        for pdf in batches:
            for item, c in pdf["__item__"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > cap:
                vals = sorted(counts.values(), reverse=True)
                thresh = vals[cap]
                counts = {i: c - thresh for i, c in counts.items() if c > thresh}
        yield pd.DataFrame(
            {"item": list(counts.keys()), "residual": list(counts.values())}
        )

    src = df.select(F.col(col).alias("__item__")).filter(
        F.col("__item__").isNotNull()
    )
    candidates = (
        src.mapInPandas(_mg, f"item {item_type}, residual long")
        .groupBy("item")
        .agg(F.sum("residual").alias("residual"))
        .filter(F.col("residual") > 0)
        .select("item")
    )
    total = src.count()
    if share_ratio is not None:
        # exact rational threshold ceil(num·N/den) — integer-only, so a
        # cross-engine oracle can reproduce it bit-for-bit ((N·num +
        # den-1) div den); float thresholds can straddle an integer
        # boundary differently per engine when share·N lands on one
        num, den = share_ratio
        threshold = -(-(num * total) // den)
    else:
        threshold = -(-int(min_share * 10**6 * total) // 10**6)
    exact = (
        src.join(F.broadcast(candidates), src["__item__"] == candidates["item"], "inner")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
    return exact.select(
        "item",
        "cnt",
        F.round(F.col("cnt") / F.lit(float(total)), 6).alias("share"),
    )


def histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 20,
    *,
    by: str | Sequence[str] | None = None,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram: (group cols, bin INT, bin_lo, bin_hi,
    cnt). Bounds default to the global min/max (one tiny agg,
    broadcast). One shuffle of (group, bin) partial counts — classic
    map-side-combinable shape, bin count independent of data size.
    Values at the upper bound land in the last bin."""
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        b = df.agg(
            F.min(v).alias("__lo__"), F.max(v).alias("__hi__")
        )
        df = df.crossJoin(F.broadcast(b))
        lo_c, hi_c = F.col("__lo__"), F.col("__hi__")
    else:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / F.lit(float(n_bins))
    raw_bin = F.floor((v - lo_c) / width).cast("int")
    bin_ = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.filter(v.isNotNull())
        .select(*keys, bin_.alias("bin"), lo_c.alias("__l__"), width.alias("__w__"))
        .groupBy(*keys, "bin", "__l__", "__w__")
        .agg(F.count("*").alias("cnt"))
        .select(
            *keys,
            "bin",
            F.round(F.col("__l__") + F.col("bin") * F.col("__w__"), 6).alias("bin_lo"),
            F.round(F.col("__l__") + (F.col("bin") + 1) * F.col("__w__"), 6).alias("bin_hi"),
            "cnt",
        )
    )


def standardize(
    df: DataFrame,
    value_cols: Sequence[str],
    *,
    by: str | Sequence[str] | None = None,
    ddof: int = 1,
) -> DataFrame:
    """Per-group z-score feature scaling: appends ``<col>_z`` =
    (x − mean)/stddev for each value column (null when the group
    variance is 0 or the group has < ddof+1 rows).

    Moments are computed as exact DECIMAL sums (Σx, Σx²) joined back
    broadcast — order-independent, so results are bit-stable across
    partitionings and engines (the built-in stddev_samp's float
    accumulation is neither); one scan + one tiny join, no window over
    the data."""
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    aggs = [F.count("*").alias("__n__")]
    for c in value_cols:
        # DECIMAL(18,6): the product DECIMAL(37,12) fits precision 38
        # WITHOUT Spark's precision-loss scale truncation (38,10)×(38,10)
        # would trigger — which silently rounds to scale 6 and diverges
        # from engines that keep full scale
        d = F.col(c).cast("decimal(18,6)")
        aggs += [
            F.sum(d).alias(f"__s_{c}__"),
            F.sum(d * d).alias(f"__s2_{c}__"),
        ]
    moments = df.groupBy(*keys).agg(*aggs)
    joined = (
        df.join(F.broadcast(moments), keys)
        if keys
        else df.crossJoin(F.broadcast(moments))
    )
    out = joined
    for c in value_cols:
        n = F.col("__n__").cast("double")
        s = F.col(f"__s_{c}__").cast("double")
        s2 = F.col(f"__s2_{c}__").cast("double")
        mean = s / n
        # try_divide: singleton groups have n-ddof = 0 (ANSI mode raises
        # on plain /); the var > 0 gate also nulls zero-variance groups
        var = F.try_divide(s2 - s * mean, n - F.lit(float(ddof)))
        z = (F.col(c).cast("double") - mean) / F.sqrt(var)
        out = out.withColumn(
            f"{c}_z",
            F.when(var > 0, F.round(z, 6)),
        )
    drop = ["__n__"] + [f"__s_{c}__" for c in value_cols] + [
        f"__s2_{c}__" for c in value_cols
    ]
    return out.drop(*drop)


def winsorize(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str],
    *,
    lower: float = 0.01,
    upper: float = 0.99,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to the group's
    [lower, upper] exact interpolated percentiles (the
    ``exact_percentiles`` definition, so the bounds themselves are
    oracle-checkable quantile_cont values).

    Shape: one sort-based percentile pass per group (window + filter
    aggregation — the same single shuffle ``exact_percentiles`` does)
    producing a bounds table with ONE ROW PER GROUP, broadcast-joined
    back onto the fact rows. The fact table is scanned twice but
    shuffled never — at 100 TB the clip itself is scan-speed.

    Output: input columns + ``<value_col>_w`` (clipped, rounded).
    """
    by = [by] if isinstance(by, str) else list(by)
    bounds = exact_percentiles(df, value_col, by, [lower, upper])
    lo_name, hi_name = bounds.columns[len(by)], bounds.columns[len(by) + 1]
    clipped = F.least(
        F.greatest(F.col(value_col), F.col(lo_name)), F.col(hi_name)
    )
    if round_to is not None:
        clipped = F.round(clipped, round_to)
    return (
        df.join(F.broadcast(bounds), on=by)
        .withColumn(f"{value_col}_w", clipped)
        .drop(lo_name, hi_name)
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str],
    *,
    k: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Robust per-group outlier flagging via median absolute deviation:
    a row is an outlier when |v − median| > k · MAD (both the median
    and the MAD are the exact interpolated group medians, so the rule
    is deterministic and oracle-checkable — unlike stddev-based
    z-scores, one wild value cannot drag the threshold).

    Two percentile passes (median of v, then median of |v − median|),
    each producing a one-row-per-group bounds table broadcast back —
    the fact rows are scanned twice, shuffled never. Deviations and
    MADs are rounded to ``round_to`` before the comparison so the
    boundary decision is bit-identical across engines.

    Output: input columns + dev (rounded |v − med|), mad (rounded
    group MAD), is_outlier BOOLEAN.
    """
    by = [by] if isinstance(by, str) else list(by)
    med = exact_percentiles(df, value_col, by, [0.5]).withColumnRenamed(
        "p50", "__med__"
    )
    devs = df.join(F.broadcast(med), on=by).withColumn(
        "__dev__", F.abs(F.col(value_col) - F.col("__med__"))
    )
    mad = (
        exact_percentiles(devs, "__dev__", by, [0.5])
        .withColumnRenamed("p50", "__mad__")
    )
    out = (
        devs.join(F.broadcast(mad), on=by)
        .withColumn("dev", F.round("__dev__", round_to))
        .withColumn("mad", F.round("__mad__", round_to))
        .withColumn("is_outlier", F.col("dev") > F.lit(k) * F.col("mad"))
        .drop("__med__", "__dev__", "__mad__")
    )
    return out


def ntile_buckets(
    df: DataFrame,
    order_col: str,
    n: int = 10,
    *,
    tiebreak_col: str | None = None,
    by: str | Sequence[str] | None = None,
    descending: bool = True,
) -> DataFrame:
    """Equal-frequency bucketing (NTILE): curriculum/quality deciles.

    Deterministic only when the total order is — pass a unique
    ``tiebreak_col``. Scale note: without ``by`` this is a single
    total order; Spark executes it as a range-partitioned global sort
    (not one partition — the window's ntile runs after a skew-free
    rangepartitioning exchange, but the ntile itself needs the global
    row position, so Spark inserts a single-partition window for the
    unpartitioned case). At 100 TB use ``by`` (e.g. shard or date) or
    switch to threshold bucketing against an ``exact_percentiles``
    boundary table — equal-frequency-up-to-boundary-ties, fully
    parallel; this operator keeps exact NTILE semantics for the sizes
    where the global window is affordable (model-eval sets, sampled
    corpora).

    Output: input columns + bucket INT (1-based).
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (Window.partitionBy(*by) if by else Window.partitionBy()).orderBy(*order)
    return df.withColumn("bucket", F.ntile(n).over(w))


def threshold_buckets(
    df: DataFrame,
    value_col: str,
    n: int = 10,
    *,
    by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Equal-frequency-up-to-ties bucketing via percentile boundaries —
    the 100 TB alternative to ``ntile_buckets`` promised in its
    docstring: instead of a global NTILE window (which needs every
    row's global position), compute the n−1 interpolated percentile
    boundaries once (one sorted pass, one row per group) and assign
    bucket = 1 + #boundaries strictly below the value as a broadcast
    join + expression — the fact table is never globally sorted and
    never shuffled for the assignment.

    Semantics differ from NTILE exactly where ties straddle a
    boundary: all equal values land in the same bucket here (often
    what curriculum bucketing actually wants), so bucket populations
    are equal only up to ties. Boundaries are the exact interpolated
    percentiles, so the whole assignment is deterministic and
    oracle-checkable.

    Output: input columns + bucket INT (1-based, ascending by value).
    """
    by_list = [] if by is None else ([by] if isinstance(by, str) else list(by))
    probe = df if by_list else df.withColumn("__g__", F.lit(1))
    group_cols = by_list or ["__g__"]
    ps = [i / n for i in range(1, n)]
    bounds = exact_percentiles(probe, value_col, group_cols, ps)
    bcols = bounds.columns[len(group_cols):]
    bucket = F.lit(1)
    for c in bcols:
        bucket = bucket + F.when(F.col(value_col) > F.col(c), 1).otherwise(0)
    out = (
        probe.join(F.broadcast(bounds), on=group_cols)
        .withColumn("bucket", bucket.cast("int"))
        .drop(*bcols)
    )
    return out.drop("__g__") if not by_list else out
