"""Training-mix construction operators: deterministic sampling and
sequence packing.

Both are the "last mile" of a 100-TB data pipeline — after dedup and
quality filtering, the surviving corpus is (a) subsampled per stratum to
hit a target language/source mix, and (b) packed into fixed-size token
chunks for training. Both must be deterministic so a re-run of the
pipeline reproduces the same training set bit-for-bit.

Scale notes
-----------
- ``stratified_sample`` shuffles once on the stratum key and does a
  per-stratum top-N (window row_number) — no global sort. A hot stratum
  (one language = 40% of the corpus) makes one fat partition; for that
  case take ``method='threshold'`` which needs NO window at all: it
  keeps a row iff its rank-hash falls below quota/stratum_size, one
  aggregate + one broadcast join, fully parallel. (Threshold sampling
  gives a binomial-sized sample, not exactly-N; both are standard.)
- ``pack_sequences`` is a per-shard running sum. Sharding is the
  parallelism unit: pack per (source, date, …) shard, never globally —
  a global pack of 100 TB would be a single-partition window. Packing is
  concat-and-chunk (the standard pretraining layout): documents are
  concatenated in id order and sliced every ``ctx`` tokens, so a
  document may straddle a boundary; ``chunk_id`` is the chunk where the
  document STARTS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rank_hash(id_col: str = "doc_id"):
    """Deterministic per-row rank: the first 15 hex digits of
    md5(id) as a BIGINT in [0, 2^60). Engine-portable (DuckDB's
    ``('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT`` is the
    identical value), uniform, and independent of row order. Kept as an
    exact integer — no float anywhere, so cross-engine comparisons can
    never hit a rounding boundary."""
    h = F.md5(F.col(id_col).cast("string"))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str = "lang",
    n_per_stratum: int = 100,
    id_col: str = "doc_id",
    method: str = "exact",
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_stratum`` rows with
    the smallest ``rank_hash`` per stratum (``method='exact'``), or —
    windowless, for skewed strata at scale — every row whose rank-hash
    is below ``2^60 * n_per_stratum / |stratum|``
    (``method='threshold'``)."""
    r = rank_hash(id_col).alias("__r__")
    if method == "exact":
        # Per-stratum top-N via ranks.distributed_rank: a
        # Window.partitionBy(stratum) would funnel each whole stratum
        # (one language = 40% of the corpus is normal) through ONE
        # task; the distributed form range-partitions on (stratum,
        # hash, id), sorts all slices in parallel, and stamps ranks
        # from broadcast per-partition offsets — identical kept set
        # (the (hash, id) order is total), no whole-stratum sort.
        from hippollm_spark.operators.ranks import distributed_rank

        return (
            distributed_rank(
                df.select("*", r),
                ["__r__", id_col],
                by=strata_col,
                rank_col="__rk__",
            )
            .filter(F.col("__rk__") <= n_per_stratum)
            .drop("__r__", "__rk__")
        )
    if method == "threshold":
        sizes = df.groupBy(strata_col).agg(F.count("*").alias("__n__"))
        return (
            df.select("*", r)
            .join(F.broadcast(sizes), strata_col)
            .filter(
                F.col("__r__")
                < F.lit(float(1 << 60)) * n_per_stratum / F.col("__n__")
            )
            .drop("__r__", "__n__")
        )
    raise ValueError(f"unknown method: {method!r}")


def pack_sequences(
    docs: DataFrame,
    *,
    ctx: int = 2048,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each shard, documents
    are laid out in ``id_col`` order and the token stream is sliced
    every ``ctx`` tokens. Adds per document:

    - ``start_offset``: position of the document's first token in the
      shard's concatenated stream (exclusive running sum),
    - ``chunk_id``: ``start_offset // ctx`` — the training chunk the
      document starts in.

    Scale shape: the running sum goes through
    `ranks.distributed_prefix_sum` — a ``Window.partitionBy(shard)``
    running sum would stream each ENTIRE shard (one language can be
    half the corpus) through one task; the distributed form
    range-partitions on (shard, id), computes per-partition sums in
    parallel, and adds broadcast cumulative offsets. The exclusive
    start is the inclusive running sum minus the row's own count; a
    NULL ``token_count_col`` counts as 0 tokens, so the row still gets
    a defined start_offset/chunk_id (pre-r03 coalesce semantics).
    """
    from hippollm_spark.operators.ranks import distributed_prefix_sum

    n_tok = F.coalesce(F.col(token_count_col).cast("long"), F.lit(0))
    inc = distributed_prefix_sum(
        docs,
        n_tok,
        [id_col],
        by=shard_col,
        sum_col="__rs__",
    )
    start = (F.col("__rs__") - n_tok).cast("long")
    return inc.select(
        *[c for c in docs.columns],
        start.alias("start_offset"),
        (start / ctx).cast("long").alias("chunk_id"),
    )


def pack_summary(packed: DataFrame, *, shard_col: str = "lang") -> DataFrame:
    """Per-chunk rollup of ``pack_sequences`` output: how many documents
    start in each chunk and how many tokens they contribute."""
    return packed.groupBy(shard_col, "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


def temperature_sample(
    df: DataFrame,
    *,
    strata_col: str = "lang",
    tau: float = 0.5,
    total_n: int = 1000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened mix sampling (the multilingual "alpha
    sampling" scheme used to rebalance language mixes): stratum s gets
    an expected quota of ``total_n * n_s^tau / sum_t n_t^tau`` rows —
    tau=1 reproduces the natural distribution, tau=0 gives a uniform
    mix, 0<tau<1 upsamples the tail relative to the head.

    Windowless and deterministic: a row survives iff its
    ``rank_hash`` falls below the stratum's quota fraction of 2^60
    (binomial-sized per stratum, like ``method='threshold'``).

    Cross-engine float discipline: tau=0.5 uses sqrt (correctly rounded
    in both engines, unlike pow), and the per-stratum threshold is
    quantized to 2^20 granularity before the integer comparison so an
    ulp of divergence in the double arithmetic cannot flip a row.
    """
    w = F.sqrt(F.col("__n__")) if tau == 0.5 else F.pow(F.col("__n__"), F.lit(tau))
    sizes = df.groupBy(strata_col).agg(F.count("*").alias("__n__"))
    z = sizes.agg(F.sum(w).alias("__z__"))
    thr_raw = (
        F.lit(float(1 << 60)) * total_n * w / (F.col("__z__") * F.col("__n__"))
    )
    thr = (F.floor(thr_raw / F.lit(float(1 << 20))) * (1 << 20)).cast("long")
    quotas = sizes.crossJoin(F.broadcast(z)).select(
        strata_col, thr.alias("__thr__")
    )
    r = rank_hash(id_col).alias("__r__")
    return (
        df.select("*", r)
        .join(F.broadcast(quotas), strata_col)
        .filter(F.col("__r__") < F.col("__thr__"))
        .drop("__r__", "__thr__")
    )


def hash_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "split",
    fractions: "tuple[float, ...]" = (0.8, 0.1, 0.1),
    labels: "tuple[str, ...]" = ("train", "val", "test"),
) -> DataFrame:
    """Deterministic train/val/test assignment — the split every
    training pipeline needs, as a pure map (no shuffle, no state, no
    ordering dependence). Each row's bucket is
    ``rank_hash(id || ':' || salt) mod 10000`` compared against the
    cumulative fraction thresholds, so membership depends only on the
    row's id and the salt: stable under reruns, repartitioning,
    appends, and engine choice (the DuckDB twin computes the identical
    md5 buckets). Changing the salt re-rolls the whole split;
    downstream leakage checks can join train⨝test on content hashes.

    Thresholds are exact integers (floor of cumulative fraction ×
    10000), so a fraction like 0.8 puts exactly the buckets [0, 8000)
    in 'train' — no float comparison anywhere."""
    if len(fractions) != len(labels):
        raise ValueError("fractions and labels must align")
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    bucket = (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % 10000).alias(
        "__b__"
    )
    cum = 0.0
    expr = None
    for frac, label in zip(fractions[:-1], labels[:-1]):
        cum += frac
        thresh = int(cum * 10000 + 0.5)
        cond = F.col("__b__") < F.lit(thresh)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    expr = (
        F.lit(labels[-1])
        if expr is None
        else expr.otherwise(F.lit(labels[-1]))
    )
    return df.withColumn("__b__", bucket).withColumn(
        "split", expr
    ).drop("__b__")


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int = 100,
    *,
    by: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis 2006): each row gets an exponential arrival
    key ``-ln(u)/w`` from its md5 rank-hash uniform; the n smallest
    keys per stratum are the sample — inclusion probability ∝ weight,
    reproducible under reruns/repartition/appends like every sampler
    here (the key is f(id), not f(position)).

    Cross-engine float discipline: u = (rank_hash+1)/2^60 and the
    division by w are single exactly-rounded IEEE ops; the one
    transcendental (ln) is rounded to 6dp before use (BM25-idf rule);
    ties on the rounded key break by id.

    Scale shape — no window in either mode: ungrouped selection is
    ``orderBy(key, id).limit(n)``, which compiles to
    TakeOrderedAndProject (per-partition n-heaps, driver merges
    #partitions × n rows — a ``Window.partitionBy()`` here would sort
    the ENTIRE table in one task); grouped selection goes through
    `ranks.distributed_rank` (range exchange + broadcast offsets), so
    a hot stratum spreads across many tasks. Kept set is identical to
    the window form — (key, id) is a total order.

    Output order is unspecified beyond the kept SET: the ungrouped
    path returns rows ordered by the sampling key (TakeOrdered), not
    by input order — callers needing a particular order must sort.
    """
    u = (rank_hash(id_col).cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    key = F.round(-F.log(u), 6) / F.col(weight_col).cast("double")
    keyed = df.withColumn("__k__", key)
    if by is None:
        return keyed.orderBy(F.col("__k__").asc(), F.col(id_col).asc()).limit(n).drop("__k__")
    from hippollm_spark.operators.ranks import distributed_rank

    return (
        distributed_rank(
            keyed, [F.col("__k__").asc(), F.col(id_col).asc()], by=by, rank_col="__ws_rn__"
        )
        .filter(F.col("__ws_rn__") <= n)
        .drop("__k__", "__ws_rn__")
    )


def upsample(
    df: DataFrame,
    factor: float,
    *,
    id_col: str = "doc_id",
    salt: str = "up",
    factor_col=None,
) -> DataFrame:
    """Deterministic fractional upsampling (epoch replication) — the
    data-mixing primitive behind "repeat the high-quality source 2.3
    epochs": every row appears floor(factor) times, plus one more with
    probability frac(factor), decided by the row's md5 rank-hash — so
    re-running the pipeline reproduces the exact same training mix,
    and appends never re-roll existing rows (membership = f(id, salt),
    the hash_split contract).

    The extra-copy test is integer-exact: ``hash % 10^6 <
    round(frac·10^6)`` — a one-in-a-million modulo bias (2^60 is not a
    multiple of 10^6), which is noise for a sampling ratio but keeps
    the decision reproducible on any engine (no float compare).

    Pass ``factor_col`` (a Column of per-row factors, e.g. joined from
    a per-source mixing-weight table) to vary the rate by row;
    ``factor`` is then ignored. Output: input columns + ``copy_idx``
    (0-based) — one row per emitted copy, produced by a map-side
    sequence explode: no shuffle, no window.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    f_col = factor_col if factor_col is not None else F.lit(float(factor))
    base = F.floor(f_col).cast("long")
    frac_e6 = F.round((f_col - F.floor(f_col)) * 1_000_000, 0).cast("long")
    n_copies = base + F.when(F.pmod(h, F.lit(1_000_000)) < frac_e6, 1).otherwise(0)
    return (
        df.withColumn("__n__", n_copies)
        .filter(F.col("__n__") > 0)
        .withColumn(
            "copy_idx",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("__n__") - 1)
            ),
        )
        .drop("__n__")
    )


def length_batches(
    df: DataFrame,
    length_col: str,
    batch_size: int,
    *,
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> DataFrame:
    """Length-grouped batch assignment — the padding-efficiency
    construction for sequence training: bucket rows by length decile
    (percentile thresholds, no global sort), then number off
    fixed-size batches WITHIN each bucket in (length, id) order, so a
    batch's members have near-equal lengths and padding waste is
    bounded by the bucket's spread.

    batch_id = (row_number within bucket − 1) div batch_size, prefixed
    by the bucket so ids are globally unique. The within-bucket
    numbering runs through `ranks.distributed_rank` — buckets are
    deciles, i.e. each holds ~10% of the corpus, far too fat for a
    one-task-per-bucket window sort; the distributed form
    range-partitions on (bucket, length, id) and sorts all slices in
    parallel. (A globally optimal packing is a bin-packing problem;
    decile-bucketed batching captures most of the win.)

    Output: input columns + (bucket INT, batch_id STRING,
    pos_in_batch INT).
    """
    from hippollm_spark.operators.ranks import distributed_rank
    from hippollm_spark.operators.stats import threshold_buckets

    bucketed = threshold_buckets(df, length_col, n_buckets)
    ranked = distributed_rank(
        bucketed,
        [F.col(length_col).asc(), F.col(id_col).asc()],
        by="bucket",
        rank_col="__lb_rn__",
    )
    rn = F.col("__lb_rn__") - 1
    return (
        ranked.withColumn(
            "batch_id",
            F.concat_ws(
                "-",
                F.col("bucket").cast("string"),
                (rn / batch_size).cast("long").cast("string"),
            ),
        )
        .withColumn("pos_in_batch", F.pmod(rn, F.lit(batch_size)).cast("int"))
        .drop("__lb_rn__")
    )


def negative_samples(
    pairs: DataFrame,
    n_candidates: int | Column,
    k: int = 4,
    *,
    query_col: str = "query_id",
    positive_col: str = "pos_id",
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every (query, positive) pair emit ``k`` pseudo-random negative ids
    drawn from [0, n_candidates) by hashing (query, slot, salt) — a
    pure map-side expression (sequence explode + md5), no join, no
    shuffle, and a rerun reproduces the identical negatives (the
    training-set determinism contract every sampler here follows).

    A drawn id that collides with the row's positive is shifted by one
    (mod n) — the standard rejection-free fix; candidate ids are
    assumed dense 0..n-1 (row_number-style ids, which is what
    `with_dense_ids` produces).

    Output: (query_id, pos_id, slot INT, neg_id BIGINT).

    ``n_candidates`` may be a scalar-subquery Column
    (``cands.agg(F.count('*')).scalar()``) so the candidate count runs
    inside the sampling query instead of as a separate eager ``count()``
    job per call (guide §1.2 — fewer actions); the drawn ids are
    value-identical either way.
    """
    n_lit = (
        n_candidates
        if isinstance(n_candidates, Column)
        else F.lit(n_candidates)
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col(query_col).cast("string"),
                    F.col("slot").cast("string"),
                    F.lit(salt),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    raw = F.pmod(h, n_lit)
    neg = F.when(
        raw == F.col(positive_col), F.pmod(raw + 1, n_lit)
    ).otherwise(raw)
    return (
        pairs.select(
            query_col,
            positive_col,
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
        )
        .withColumn("neg_id", neg)
    )


def shuffle_key(id_col: str = "doc_id", salt: str = "shuffle"):
    """The deterministic md5(salt|id) permutation key `global_shuffle`
    orders by — exposed so windowless consumers (`distributed_rank`
    position stamping, `interleave_corpora`) can build the identical
    key without forcing the sort."""
    return F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    salt: str = "shuffle",
    shards: int | None = None,
) -> DataFrame:
    """Deterministic global corpus shuffle — the final stage before
    writing training shards. Order = md5(salt|id): rerun-identical,
    partitioning-independent, and re-saltable per epoch (a different
    ``salt`` is a fresh permutation without touching the data).

    Scale shape: with ``shards`` set, ONE `repartitionByRange` on the
    hash key + `sortWithinPartitions` — the range exchange samples the
    (uniform) key space, every shard gets an even slice, and the
    concatenation of shard files in shard order IS the shuffled
    corpus; no global sort ever materializes on one node. Without
    ``shards`` (test scale) a plain orderBy gives the same sequence.

    Adds ``shuffle_key`` (hex) — stable sort key and audit column.
    """
    key = shuffle_key(id_col, salt)
    out = df.withColumn("shuffle_key", key)
    if shards is not None:
        return out.repartitionByRange(shards, "shuffle_key").sortWithinPartitions(
            "shuffle_key"
        )
    return out.orderBy("shuffle_key", id_col)


def interleave_corpora(
    df: DataFrame,
    corpus_col: str,
    weights: dict[str, int],
    *,
    id_col: str = "doc_id",
    salt: str = "interleave",
) -> DataFrame:
    """Deterministic weighted interleave of multiple corpora into ONE
    training order: corpus c with weight w contributes ~w of every
    Σweights consecutive documents, evenly spread (the data-mixing
    step after per-corpus sampling, before sharded writes).

    Each document's global position key is the exact rational
    rank/weight, carried as the integer rank·LCM/w (weights are small
    integers, LCM is tiny) — no float division, so the total order
    (key, corpus, rank) is engine-exact. Within a corpus, rank is the
    salted md5 order (`global_shuffle`'s key), so the interleave is
    also a shuffle and re-salts per epoch.

    Scale shape: per-corpus rank via `ranks.distributed_rank` — a
    ``Window.partitionBy(corpus)`` would funnel each ENTIRE corpus
    (1/3-1/10 of 100 TB) through one task; the distributed form range-
    partitions on (corpus, md5 key), sorts all slices in parallel, and
    stamps ranks from broadcast per-partition offsets. Identical
    output (unique md5‖id order), no whole-corpus sort anywhere.

    Output: input columns + (mix_rank, mix_key BIGINT); order by
    (mix_key, corpus, mix_rank) — or feed `repartitionByRange` on
    those keys for the sharded write. Corpora absent from ``weights``
    are dropped (explicit mixing decisions only).
    """
    from functools import reduce
    from math import gcd

    from hippollm_spark.operators.ranks import distributed_rank

    ws = {k: int(v) for k, v in weights.items()}
    if not ws or any(v <= 0 for v in ws.values()):
        raise ValueError("weights must be positive integers")
    lcm = reduce(lambda a, b: a * b // gcd(a, b), ws.values())
    kept = df.filter(F.col(corpus_col).isin(list(ws)))
    key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    mult = F.create_map(
        *[x for k, v in sorted(ws.items()) for x in (F.lit(k), F.lit(lcm // v))]
    )
    out = distributed_rank(
        kept, [key, F.col(id_col)], by=corpus_col, rank_col="mix_rank"
    ).withColumn("mix_rank", F.col("mix_rank").cast("int"))
    return out.withColumn(
        "mix_key",
        (F.col("mix_rank").cast("long") * mult[F.col(corpus_col)]).cast("long"),
    )


def cap_per_group(
    df: DataFrame,
    by: str,
    n: int,
    *,
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Cap each group at ``n`` rows, keeping a deterministic uniform
    sample — the domain-capping step web-scale corpora apply so one
    hot domain can't dominate the training mix. Selection order is the
    salted md5 of the id (re-saltable, rerun-identical), so the kept
    subset is an unbiased per-group sample, not "first n in storage
    order".

    Scale shape: `ranks.distributed_rank` with the group as the
    partition key — a hot group (one domain = 30% of the corpus is
    normal) range-partitions across MANY tasks instead of sorting in
    one window task; rank ≤ n is then a pure filter. Output: input
    columns + cap_rank (1..n within each group).
    """
    from hippollm_spark.operators.ranks import distributed_rank

    key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    ranked = distributed_rank(
        df, [key, F.col(id_col)], by=by, rank_col="cap_rank"
    )
    return ranked.filter(F.col("cap_rank") <= n).withColumn(
        "cap_rank", F.col("cap_rank").cast("int")
    )


def pack_bins_ffd(
    docs: DataFrame,
    *,
    budget: int = 2048,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
) -> DataFrame:
    """Whole-document bin packing, first-fit-decreasing — the packing
    used when samples must NOT straddle context boundaries (SFT
    examples, eval prompts), complementing `pack_sequences`'
    concat-and-chunk. Documents are ordered by (tokens DESC, id) and
    each goes into the first bin with room; a document longer than
    ``budget`` gets a bin of its own (flagged oversized). FFD is the
    classic 11/9·OPT + 6/9 guarantee.

    Scale shape: packing is inherently sequential, so the SHARD is the
    parallelism unit (exactly `pack_sequences`' contract) — one
    ``applyInPandas`` per shard group, deterministic order inside.
    Output: input columns + (bin_id INT per shard, bin_fill INT tokens
    in the doc's bin after packing, oversized BOOLEAN).
    """
    import pandas as pd

    out_fields = docs.schema.fields
    schema_ddl = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
        + ", bin_id int, bin_fill int, oversized boolean"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_count_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        assign: list[int] = []
        oversized: list[bool] = []
        for n in pdf[token_count_col]:
            n = int(n)
            placed = False
            if n <= budget:
                for b, fill in enumerate(fills):
                    if fill + n <= budget:
                        fills[b] = fill + n
                        assign.append(b)
                        oversized.append(False)
                        placed = True
                        break
            if not placed:
                fills.append(n)
                assign.append(len(fills) - 1)
                oversized.append(n > budget)
        pdf["bin_id"] = assign
        pdf["bin_fill"] = [fills[b] for b in assign]
        pdf["oversized"] = oversized
        return pdf

    return docs.groupBy(shard_col).applyInPandas(_pack, schema_ddl)


def uniform_sample_k(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Exactly-k deterministic uniform sample: the k rows with the
    smallest salted rank-hash — re-saltable, rerun-identical,
    partitioning-independent (the distributed reservoir-sampling
    equivalent, without reservoir state). ``orderBy(limit)`` compiles
    to TakeOrderedAndProject: per-partition k-heaps, driver merges
    #partitions × k candidate rows — no global sort, no window.
    Output: input columns + sample_key (hex md5)."""
    key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.withColumn("sample_key", key)
        .orderBy("sample_key", id_col)
        .limit(k)
    )
