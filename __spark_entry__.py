"""Driver contract for the spark-graft builder (PySpark target).

Maps the hippollm_spark operator surface (SURVEY.md §2) onto the
driver's synthetic tables per FIXTURES.md §6:

- part.p_name        ↔ entity names
- lineitem ⋈ part    ↔ edges (fact_id = l_orderkey, entity = p_name)
- embeddings         ↔ the vector collections (dim 64)
- documents          ↔ the training-data corpus (dedup / text analysis)
- events             ↔ the stream table

Every ``queries()`` entry has a matching ``oracle_sql()`` DuckDB query
unless the op is engine-specific by design (approx_stats sketches,
pack_bins greedy FFD), which the driver checks rows-only and pytest
checks by recall/parity vs the exact op — even MinHash/SimHash are
oracle-hashed via their deterministic md5 variants, mmr_rerank via the
quantized-BIGINT greedy twin, and ann_pq_topk / pca_embeddings via
persisted e6-integer artifacts replayed as literals on both engines
(tests/test_contract.py pins the rows-only set).

Float discipline for cross-engine hash-matching: money aggregates are
summed as DECIMAL (exact, order-independent) then cast back to DOUBLE
and rounded; distances/similarities are computed in DOUBLE on both
sides and rounded to 6dp; ordering keys always include a unique id
tie-break.
"""

from __future__ import annotations

import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF1 = "/root/testdata/sf0.001"

# Entity names present at every scale factor (the part-name vocabulary
# is fixed; only multiplicities scale).
ENTITY_A = "blue rod"
ENTITY_B = "hot rod"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS). Spark ≥4.1 reads it
    natively as TIMESTAMP_NTZ truncated to µs (verified identical to
    DuckDB's ns→µs cast); older readers need
    spark.sql.legacy.parquet.nanosAsLong=true, yielding a BIGINT we
    convert with integer division (ns epoch > 2^53, so double math
    would lose precision). Handle both schemas.

    The session TZ is pinned to UTC and the result cast to
    TIMESTAMP_NTZ so wall-clock values match DuckDB's naive timestamps
    regardless of the host session's timezone configuration."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H mapping of the hypergraph adjacency: one edge per
    distinct (order, part-name) incidence (FIXTURES.md §6).

    No forced broadcast hint on `part`: it grows with sf (2M rows at
    sf10, ~200M at sf1000), so at 100 TB it is not broadcastable and a
    hint would bypass autoBroadcastJoinThreshold entirely. AQE under
    the 64 MB budget picks broadcast at small sf and shuffle at scale
    (round-10 policy, matching the TPC-H family de-hint of e3510b2)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("fact_id"), F.col("p_name").alias("entity"))
        .distinct()
    )


_EDGES_SQL = """
    SELECT DISTINCT l.l_orderkey AS fact_id, p.p_name AS entity
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
"""


def _cc_minlabel_oracle(rounds: int = 16) -> str:
    """Connected-components oracle as UNROLLED min-label propagation
    with path-halving — O(E) per round, O(V) state per round — built
    for both `graph_components` twins.

    The previous WITH RECURSIVE transitive closure was O(V²): at sf1
    the (near-)single-component 25k-vertex co-occurrence graph made
    `reach` ~625M rows and OOM-killed DuckDB at its 48 GB cap (round-10
    sf1 sweep). Per round r: hop h_r(v) = min label among v's
    neighbourhood (ee keeps self-pairs, so v's own label rides along),
    then jump j_r(v) = h_r(h_r(v)) (labels are always vertex names of
    the same component, so the composition is defined and monotone).
    Hop+jump doubles the covered radius per round → 16 rounds converge
    for any component diameter ≤ 2^16; every CTE is MATERIALIZED so
    the engine-mode temp-table path executes it with real stats. The
    oracle equality against the Spark fixpoint (which iterates to
    convergence) also certifies the unrolling converged at each tested
    sf."""
    ctes = [
        f"WITH base AS MATERIALIZED ({_EDGES_SQL})",
        "ee AS MATERIALIZED (SELECT DISTINCT a.entity AS ea,"
        " b.entity AS eb FROM base a JOIN base b ON a.fact_id = b.fact_id)",
        "l0 AS MATERIALIZED (SELECT ea AS v, min(eb) AS l FROM ee GROUP BY ea)",
    ]
    prev = "l0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"h{r} AS MATERIALIZED (SELECT e.ea AS v, min(l.l) AS l"
            f" FROM ee e JOIN {prev} l ON e.eb = l.v GROUP BY e.ea)"
        )
        ctes.append(
            f"j{r} AS MATERIALIZED (SELECT a.v AS v, b.l AS l"
            f" FROM h{r} a JOIN h{r} b ON a.l = b.v)"
        )
        prev = f"j{r}"
    return (
        ",\n            ".join(ctes)
        + f"""
            SELECT l AS component_root, count(*) AS n_entities
            FROM {prev} GROUP BY l
            ORDER BY n_entities DESC, component_root
        """
    )



_COOC_MEMO: dict[tuple[str, str], DataFrame] = {}


def _cooc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized co-occurrence projection (entity_a, entity_b, weight):
    ten graph queries share this exact upstream (the pairwise self-join
    per fact), so it is materialized ONCE per (session, sf_dir) as a
    small parquet table under the (gitignored) spark-warehouse scratch
    dir, and every consumer just scans it — the deployment shape where
    the co-occurrence graph is a materialized table that many graph
    queries read. A parquet file (not cache/localCheckpoint blocks)
    because it must survive aggressive inter-query hygiene: bench.py
    clears the catalog cache AND force-unpersists every persistent RDD
    between queries (including locally-checkpointed ones), which would
    destroy block-based memo storage mid-run. Before the r6 graph-op
    seal, the queries were getting this reuse ACCIDENTALLY through
    leaked plan-identical cache entries — this makes it explicit,
    leak-free, and cleanup-proof."""
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _COOC_MEMO.get(key)
    if df is None:
        import hashlib as _hl
        import os as _os

        from hippollm_spark.operators.graph import cooccurrence

        path = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)),
            "spark-warehouse",
            "_cooc_cache",
            # sf_dir-keyed (NOT per-appId): overwrite-on-rebuild makes
            # staleness impossible and per-session names leaked one
            # scratch dir per process (69 dirs / 17 GB found in r10);
            # single-writer assumption as for the co-located tables.
            _hl.md5(sf_dir.encode()).hexdigest()[:16],
        )
        cooccurrence(_edges(spark, sf_dir)).write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        _COOC_MEMO[key] = df
    return df


_KMEANS_MEMO: dict[tuple[str, str], DataFrame] = {}


def _kmeans_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized exact-Lloyd assignment (k=8, 3 rounds, pandas method)
    over the embeddings table: four queries (`kmeans_clusters`,
    `semantic_dedup`, `semantic_prune`, `cluster_sample`) share this
    identical fit, so it is materialized ONCE per (session, sf_dir) as
    a small parquet table (__id__, cluster, dist_e12) under the
    gitignored spark-warehouse scratch dir — the deployment shape
    where a curation pipeline clusters once and serves many downstream
    ops from the assignment table. Parquet, not cache/localCheckpoint
    blocks, for the same reason as `_cooc_pairs`: bench.py clears the
    catalog cache and force-unpersists every persistent RDD between
    queries, which would destroy block-based memo storage mid-run."""
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _KMEANS_MEMO.get(key)
    if df is None:
        import hashlib as _hl
        import os as _os

        from hippollm_spark.operators.similarity import kmeans_fit

        path = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)),
            "spark-warehouse",
            "_kmeans_cache",
            # sf_dir-keyed (NOT per-appId): overwrite-on-rebuild makes
            # staleness impossible and per-session names leaked one
            # scratch dir per process (69 dirs / 17 GB found in r10);
            # single-writer assumption as for the co-located tables.
            _hl.md5(sf_dir.encode()).hexdigest()[:16],
        )
        emb = _t(spark, sf_dir, "embeddings")
        _cents, assigned = kmeans_fit(emb, k=8, iterations=3, method="pandas")
        assigned.write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        _KMEANS_MEMO[key] = df
    return df


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


def _dec(col):
    """Exact (order-independent) summable representation of a per-row
    double expression: both engines round the identical double to the
    identical DECIMAL(38,10), so SUM is exact and engine-order-proof.

    SLOW PATH — Spark sums DECIMAL(38,10) through BigDecimal (~6.4x a
    long sum at sf10, tools/decsum_probe.py). The money-sum family now
    uses ``_e6`` / ``_e6sum`` below; ``_dec`` remains for the few
    non-hot-path disciplines that want a decimal-typed value."""
    return col.cast("decimal(38,10)")


def _e6(col):
    """Per-row exact e6 fixed-point units of a double expression, as
    BIGINT: both engines compute the identical IEEE double, the
    identical ``* 1e6 + 0.5``, and the identical floor, so the long is
    engine-identical and integer sums/compares on it are exact and
    order-independent. Replaces the DECIMAL(38,10) cast on the
    scan-aggregate hot path: Spark's BigDecimal-backed decimal sum was
    4.15 s vs 0.65 s for the long sum at sf10 (tools/decsum_probe.py;
    DuckDB twin 0.50 s). Oracle twin: ``CAST(floor(x * 1000000.0 +
    0.5) AS BIGINT)``.

    Use the raw long sum ONLY where the per-group row count is
    structurally bounded (per-order, per-part, per-supplier groups —
    their size does not grow with sf); unbounded groups go through
    ``_e6sum``."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5))


def _e6sum(col, cond=None, units=False):
    """Overflow-safe exact SUM of ``_e6`` units for UNBOUNDED groups:
    hi/lo split — ``hi = e >> 20`` (arithmetic shift = floor division,
    correct for negatives), ``lo = e - (hi << 20)`` in [0, 2^20) —
    summed as two plain long sums inside whole-stage codegen, then
    recombined exactly in DECIMAL(38,0) on the handful of
    post-aggregate rows. Safe to ~2^43 rows per group (~8.8e12 — past
    100 TB of lineitem); the DuckDB twin is a plain ``sum(BIGINT)``,
    which DuckDB widens to HUGEINT (128-bit, exact) natively, and the
    recombination is the algebraic identity sum(e) = sum(hi)*2^20 +
    sum(lo). Cost at sf10: 0.67 s vs 0.63 s for the raw (overflowable)
    long sum (tools/decsum_probe.py).

    ``cond`` wraps both partial sums in the same WHEN (for conditional
    sums; NULL when no row matches, like sum(when(...)));
    ``units=True`` means ``col`` already is an e6 BIGINT column.

    lo is ``e & 0xFFFFF`` (two's-complement AND = e mod 2^20 in
    [0, 2^20), identical to ``e - (e >> 20) * 2^20`` incl. negatives)
    rather than the subtract form: the shallower expression tree keeps
    the agg at the plain-long-sum floor (0.67 s vs 0.85 s at sf10,
    tools/decsum_probe.py) — the subtract re-evaluated the whole
    floor chain through ``hi``."""
    e = col if units else _e6(col)
    hi = F.shiftright(e, 20)
    lo = e.bitwiseAND(F.lit(1048575))
    if cond is not None:
        hi = F.when(cond, hi)
        lo = F.when(cond, lo)
    return (
        F.sum(hi).cast("decimal(38,0)") * F.lit(1 << 20)
        + F.sum(lo).cast("decimal(38,0)")
    )


def _rnd(col, nd=2):
    """Cross-engine-identical half-up(+inf) rounding of a double to nd
    places as pure IEEE ops: ``floor(x * 10^nd + 0.5) / 10^nd``.
    Spark's round() decimalizes through Java's shortest-repr string
    while DuckDB rounds the exact binary value, and they DISAGREE on
    doubles at exact .xx5 boundaries — which e6-exact sums hit
    constantly (first sweep after the e6 switch: q10 rendered
    307843.595 as .60 on Spark, .59 on DuckDB). Both engines now run
    the identical floor expression instead; oracle twin:
    ``floor((x) * 1e<nd> + 0.5) / 1e<nd>``. Bound: |x|*10^nd must fit
    a signed 64-bit int (fine to ~9e16 cents)."""
    s = F.lit(float(10**nd))
    return (F.floor(col * s + F.lit(0.5)) / s).cast("double")


def _e6out(sumcol, nd=2):
    """Render an exact e6 sum (long or decimal) as the contract's
    rounded double: cast to double (identical round-to-nearest in both
    engines), descale by the exact double 1e6, round via ``_rnd``.
    Oracle twin: ``floor(sum(...)::DOUBLE / 1000000.0 * 1e<nd> + 0.5)
    / 1e<nd>``."""
    return _rnd(sumcol.cast("double") / F.lit(1000000.0), nd)


# ===========================================================================
# TPC-H style relational queries (the generic surface SURVEY.md §2.10)
# ===========================================================================

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _e6out(_e6sum(F.col("l_quantity"))).alias("sum_qty"),
            _e6out(_e6sum(F.col("l_extendedprice"))).alias("sum_base_price"),
            _e6out(_e6sum(disc)).alias("sum_disc_price"),
            _e6out(_e6sum(charge)).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-06-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-06-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            # per-order group (<= 7 lineitems at any sf): raw long sum
            _e6out(F.sum(_e6(F.col("l_extendedprice") * (1 - F.col("l_discount")))))
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (Q5). The ASIA predicate is pushed
    through BOTH join arms before the one big shuffle: customers
    restrict to ASIA nations (joined onto orders — orders shrinks ~5x
    and carries the customer nation), suppliers restrict to ASIA
    (joined onto lineitem — lineitem shrinks ~5x and carries the
    supplier nation), and only then do the two reduced sides shuffle
    on orderkey with the nation-equality filter. Catalyst cannot
    derive this reorder itself because the c_nationkey = s_nationkey
    equality couples the two dimension arms. Scale notes: only the
    constant-size nation dim gets an explicit broadcast hint; the
    filtered customer/supplier sides GROW with the corpus, so their
    join strategy is left to AQE's runtime sizes (broadcast at sf10's
    ~5 MB, shuffle/bucketed at 100 TB). The win that survives scale
    is the 5x smaller shuffle inputs."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nat = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    acust = cust.join(
        F.broadcast(asia_nat), cust.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", F.col("c_nationkey").alias("cnat"))
    asupp = supp.join(
        F.broadcast(asia_nat), supp.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", F.col("s_nationkey").alias("snat"))
    aorders = orders.join(acust, orders.o_custkey == acust.c_custkey).select(
        "o_orderkey", "cnat"
    )
    ali = li.join(asupp, li.l_suppkey == asupp.s_suppkey)
    return (
        ali.join(aorders, ali.l_orderkey == aorders.o_orderkey)
        .filter(F.col("cnat") == F.col("snat"))
        .join(F.broadcast(asia_nat), F.col("snat") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            _e6out(_e6sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _e6out(_e6sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 adapted to this schema: the
    commit/receipt columns don't exist, so "late" = shipped more than
    90 days after the order date). EXISTS → left-semi join; Catalyst
    pushes the date filter to the orders scan."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (Q7): bilateral trade NATION_1 ↔ NATION_2 by
    ship year. Nation dims broadcast; the fact tables join on keys."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            pair
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_e6out(_e6sum(rev)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (Q8): NATION_8's share of supply revenue
    to ASIA customers per order year. Share = ratio of two exact
    DECIMAL sums, divided in DOUBLE (identical on both engines).

    Join order (round 10, q5's pattern): the customer/ASIA semi-join
    reduces ORDERS first — the date window keeps ~30% and ASIA ~20% of
    orders, so the 60M-row lineitem join shuffles a ~5x smaller right
    side. Catalyst cannot derive this reorder without stats (the
    reduction runs through a semi-join arm). Interleaved same-minute
    A/B at sf10: 4.42 s -> 3.94 s median (BASELINE.md round 10)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cnat = (
        nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    snat = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ord_arm = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .select("o_orderkey", "o_orderdate")
    )
    base = (
        li.join(ord_arm, li.l_orderkey == ord_arm.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _e6sum(vol, cond=F.col("supp_nation") == "NATION_8").alias("_n"),
            _e6sum(vol).alias("_d"),
        )
        .select(
            "o_year",
            # e6 scales cancel in the ratio — no descale needed
            _rnd(
                F.coalesce(F.col("_n"), F.lit(0)).cast("double")
                / F.col("_d").cast("double"),
                6,
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (Q9 adapted: no partsupp, so unit cost is
    proxied by p_retailprice): profit by supplier nation × order year
    for STANDARD-type parts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey", "p_retailprice"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(_e6out(_e6sum(profit)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative windowed aggregation: per-customer running order
    total in date order (the lag/cumsum window family beyond top-k
    rank) for one market segment."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            # per-customer window (order count per customer is
            # sf-invariant): raw long window sum
            _e6out(F.sum(_e6(F.col("o_totalprice"))).over(w)).alias(
                "running_total"
            ),
        )
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (Q10): top-20 customers by revenue lost
    to returns in 1996Q1."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        # per-customer quarter revenue: orders/customer is sf-invariant
        .agg(_e6out(F.sum(_e6(rev))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (Q13): histogram of orders
    per customer (excluding low-priority orders), customers with zero
    kept via the outer join."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (Q14): percentage of September-1996 revenue
    from PROMO parts."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            _e6sum(rev, cond=F.col("p_type") == "PROMO").alias("_p"),
            _e6sum(rev).alias("_t"),
        )
        .select(
            _rnd(
                F.lit(100.0)
                * F.coalesce(F.col("_p"), F.lit(0)).cast("double")
                / F.col("_t").cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (Q15): supplier(s) with the maximum 1996Q1
    revenue. The max is taken on the exact DECIMAL sum (rank over the
    100-row supplier aggregate — no revenue ties lost to rounding)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # per-supplier quarter (lineitems/supplier is sf-invariant): long sum
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_e6(rev)).alias("_rev"))
    # argmax via broadcast scalar max (exact DECIMAL equality) — no
    # global rank window over the supplier aggregate
    mx = per_supp.agg(F.max("_rev").alias("__mx__"))
    top = per_supp.crossJoin(F.broadcast(mx)).filter(
        F.col("_rev") == F.col("__mx__")
    )
    return (
        top.join(supp, top.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey"),
            "s_name",
            _e6out(F.col("_rev")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (Q17) for Brand#1: lineitems below
    20% of their part's average quantity. The fractional comparison
    q < 0.2·S/n is done as the exact integer-decimal cross-product
    5·q·n < S (no double division → no cross-engine ulp flips)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").join(
        part, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_e6(F.col("l_quantity"))).alias("_sq"),
        F.count("*").alias("_n"),
    )
    return (
        li.join(per_part, "l_partkey")
        # exact integer cross-product in e6 longs (q_e6 <= 5e7, n is
        # the sf-invariant lineitems-per-part count): no overflow
        .filter(_e6(F.col("l_quantity")) * 5 * F.col("_n") < F.col("_sq"))
        .agg(
            # /7e6 = descale-by-1e6 and /7 in ONE identical-IEEE step
            _rnd(
                _e6sum(F.col("l_extendedprice")).cast("double")
                / F.lit(7000000.0),
                2,
            ).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (Q18): orders totalling > 300 units."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        # per-order group (<= 7 lineitems): raw long sum; threshold in
        # the same e6 units
        .agg(F.sum(_e6(F.col("l_quantity"))).alias("_sq"))
        .filter(F.col("_sq") > 300 * 1000000)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            _e6out(F.col("_sq")).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (Q19): disjunctive brand/size/quantity
    predicate — one broadcast join, predicate evaluated in codegen."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(16, 30) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(31, 50) & q.between(20, 40))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(
            _e6out(_e6sum(rev)).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (Q22 adapted: no phone column, so the
    country code is the nation key; "no orders" = none since
    2001-01-01): wealthy-but-idle customers per nation. The
    above-average test b·n > S is exact integer-decimal, like Q17."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01")
    ).select("o_custkey")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        _e6sum(F.col("c_acctbal")).alias("_s"), F.count("*").alias("_n")
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        # b_e6 * n can pass 2^63 at scale (n = |customers|): widen the
        # per-row side to DECIMAL(38,0) — exact integer compare against
        # the exact decimal sum on both engines
        .filter(
            _e6(F.col("c_acctbal")).cast("decimal(38,0)") * F.col("_n")
            > F.col("_s")
        )
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            _e6out(_e6sum(F.col("c_acctbal"))).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reduced schema has no partsupp table; derive the
    part-supplier relationship from lineitem. ps_supplycost is the
    minimum observed sale price for the pair — min over doubles is
    exact and order-independent, so both engines agree bit-for-bit
    (no arithmetic, unlike an avg unit price)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("ps_supplycost")
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (Q2 adapted: partsupp derived from
    lineitem, supplycost = min observed price). For STANDARD parts of
    size <= 10, the EUROPE supplier(s) matching the per-part minimum
    cost. The correlated-min subquery becomes a window min — one
    shuffle on p_partkey; supplier⋈nation⋈region is broadcast."""
    ps = _derived_partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    snr = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_name")
    cand = (
        ps.join(part, ps.l_partkey == part.p_partkey)
        .join(snr, ps.l_suppkey == snr.s_suppkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("_mn", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("_mn"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
                 F.asc("p_partkey"))
        .limit(100)
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (Q11 adapted: inventory value =
    sum of extendedprice·quantity shipped by NATION_1 suppliers per
    part). Parts holding > 0.1% of the national total; the fractional
    test value·1000 > total is exact integer-decimal (no division).
    The scalar total rides along as a broadcast cross join."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nsupp = supp.join(
        F.broadcast(nat), supp.s_nationkey == nat.n_nationkey, "left_semi"
    ).select("s_suppkey")
    nli = li.join(nsupp, li.l_suppkey == nsupp.s_suppkey, "left_semi")
    per_part = nli.groupBy("l_partkey").agg(
        # per-part group (lineitems/part is sf-invariant): raw long sum
        F.sum(_e6(F.col("l_extendedprice") * F.col("l_quantity"))).alias("_v")
    )
    # grand total over an UNBOUNDED number of parts: hi/lo-split the
    # already-e6 partials (units=True) into the exact decimal sum
    total = per_part.agg(_e6sum(F.col("_v"), units=True).alias("_t"))
    return (
        per_part.crossJoin(F.broadcast(total))
        # long*1000 vs exact decimal total — Spark widens, exact
        .filter(F.col("_v") * 1000 > F.col("_t"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            _e6out(F.col("_v")).alias("value"),
        )
        .orderBy(F.desc("value"), F.asc("ps_partkey"))
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority split (Q12 adapted: no shipmode/receipt
    columns — the category is l_linestatus and "late" = shipped > 60
    days after the order date). One shuffle join orders⋈lineitem;
    the priority CASE folds into the aggregate (map-side partial)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (Q16 adapted: partsupp derived from
    lineitem; the "complaints" exclusion is suppliers with negative
    account balance). Distinct supplier count per (brand, type, size)
    for non-PROMO, non-Brand#1 parts of selected sizes."""
    ps = _derived_partsupp(spark, sf_dir).select("l_partkey", "l_suppkey")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        # No forced hints: both the negative-acctbal supplier subset and
        # the filtered part subset grow with sf — AQE decides at runtime
        # from measured sizes (round-10 broadcast policy).
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (Q20 adapted: no availqty — a
    NATION_3 supplier qualifies if it shipped more than half of some
    blue part's total 1996 volume). The half test 2·qty > total is
    exact integer-decimal. Per-part totals via a window over the
    (part, supplier) aggregate — one shuffle, no self-join."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("blue")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        # (part, supplier) group is sf-invariant in size: raw long sum
        F.sum(_e6(F.col("l_quantity"))).alias("_q")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        pair.withColumn("_tot", F.sum("_q").over(w))
        .filter(F.col("_q") * 2 > F.col("_tot"))
        .select("l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey, "left_semi")
        .join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (Q21 adapted: "late" =
    shipped > 90 days after the order date). For finished orders with
    >1 supplier where exactly one supplier shipped late, count the
    waits per NATION_1 supplier. The double EXISTS/NOT EXISTS
    collapses into one per-order aggregate (supplier count + late
    count) — two shuffles total instead of two self-joins."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_pair = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "_late",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).cast("int"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("_late").alias("_late"))
    )
    w = Window.partitionBy("l_orderkey")
    culprit = (
        per_pair.withColumn("_nsupp", F.count("*").over(w))
        .withColumn("_nlate", F.sum("_late").over(w))
        .filter(
            (F.col("_late") == 1) & (F.col("_nsupp") > 1) & (F.col("_nlate") == 1)
        )
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nsupp = supp.join(
        F.broadcast(nat), supp.s_nationkey == nat.n_nationkey, "left_semi"
    ).select("s_suppkey", "s_name")
    return (
        culprit.join(nsupp, culprit.l_suppkey == nsupp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


_COLOCATED_MEMO: dict[tuple[str, str], tuple[str, str]] = {}


def _colocated_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Memoized bucketed layout of (lineitem, orders) on the order key
    (operators/layout.py): built ONCE per (session, sf_dir) — the
    deployment shape where the layout shuffle is paid at ingest and
    amortized over every downstream fact-fact join."""
    key = (spark.sparkContext.applicationId, sf_dir)
    names = _COLOCATED_MEMO.get(key)
    if names is None:
        import hashlib as _hl

        from hippollm_spark.operators import layout

        # Table names are keyed on sf_dir ONLY (not applicationId):
        # save_colocated drops-and-rewrites, so a stale table from an
        # earlier session is impossible, and the old per-appId names
        # leaked one orphaned warehouse dir per session (42 found in
        # round 10). The session memo above still makes the build
        # once-per-session. Trade-off: two PROCESSES hitting the same
        # sf_dir concurrently would race on the drop/rewrite — the
        # driver and all repo tooling run sweeps sequentially; a
        # deployment wanting concurrency would write the layout once
        # at ingest, not lazily here.
        h = _hl.md5(sf_dir.encode()).hexdigest()[:12]
        li_t, ord_t = f"blj_li_{h}", f"blj_ord_{h}"
        layout.save_colocated(
            _t(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
            ),
            li_t,
            "l_orderkey",
        )
        layout.save_colocated(
            _t(spark, sf_dir, "orders").select(
                "o_orderkey",
                "o_custkey",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            ),
            ord_t,
            "o_orderkey",
        )
        names = (li_t, ord_t)
        _COLOCATED_MEMO[key] = names
    return names


def q_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free fact-fact join via bucketed co-location
    (operators/layout.py): lineitem and orders are persisted bucketed
    + sorted on the order key with matching bucket counts, so this
    join plans with NO shuffle on either side — each task merge-joins
    bucket i of both tables in place (plan-asserted in
    tests/test_layout.py). The layout shuffle is paid once at write
    and amortized over every later join — the 100-TB fact-join story.
    Values are layout-independent: the oracle replays the plain
    join."""
    li_t, ord_t = _colocated_tables(spark, sf_dir)
    from hippollm_spark.operators import layout

    j = layout.colocated_join(spark, li_t, ord_t, "l_orderkey", "o_orderkey")
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            _e6out(
                _e6sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def q_colocated_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 re-run on the bucketed layout — the second co-location win
    (round 10). The l_orderkey bucketing removes BOTH heavy exchanges:
    the 60M-row groupBy(l_orderkey) aggregates bucket-locally (the
    bucketed scan already satisfies the hash distribution), and the
    big-orders⋈orders join is bucket-aligned; only the having-collapsed
    survivors meet customer (AQE broadcast at every sf that fits,
    shuffle otherwise). Measured sf10: plain 4.4 s → 2.5 s, vs DuckDB
    1.2 s = 2.15× — below the 2.6× parquet scan floor on this fixture
    (BASELINE.md round 10). Values are layout-independent: the oracle
    replays the plain q18 SQL. Plan-asserted exchange-free below the
    aggregate in tests/test_layout.py."""
    li_t, ord_t = _colocated_tables(spark, sf_dir)
    from hippollm_spark.operators import layout

    li = layout.read_colocated(spark, li_t)
    orders = layout.read_colocated(spark, ord_t)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_e6(F.col("l_quantity"))).alias("_sq"))
        .filter(F.col("_sq") > 300 * 1000000)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            _e6out(F.col("_sq")).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q_tpch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals — ROLLUP over (returnflag, linestatus);
    grouping nulls coalesced to 'ALL' for cross-engine stability.
    Same pre-aggregate-then-expand shape as q_sales_cube: the decimal
    aggregation runs once over the fact rows, the rollup re-aggregates
    the handful of exact partials."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("_n"),
        _e6sum(F.col("l_extendedprice")).alias("_s"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_n").alias("n_rows"),
            # re-aggregates a handful of exact DECIMAL e6 partials
            _e6out(F.sum("_s")).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_price",
        )
    )


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by total price within each priority (the generic
    top-k-per-group window pattern)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")
    )


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — sort-based
    (constant memory per group; Spark's builtin `percentile` buffers
    whole groups). Rounded at 4dp: quartiles of 2-decimal prices have
    <= 4 decimals, so the 4dp grid contains the exact value (2dp
    rounding sits ON the half-cent boundary and flips between engines)."""
    from hippollm_spark.operators.stats import exact_percentiles

    li = _t(spark, sf_dir, "lineitem")
    return exact_percentiles(
        li, "l_extendedprice", "l_returnflag", [0.25, 0.5, 0.75], round_to=4
    ).orderBy("l_returnflag")


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) keys over (partkey, suppkey) — the exact
    integer bit-interleave behind multi-dimensional layout clustering
    (operators/layout.py; bounding-box property asserted in
    tests/test_layout.py). First 100 distinct pairs along the curve."""
    from hippollm_spark.operators.layout import zorder_key

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    return (
        li.withColumn("z", zorder_key("l_partkey", "l_suppkey"))
        .orderBy("z")
        .limit(100)
    )


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based grouped stats (HLL++ distinct orders + quantile-
    sketch median price per returnflag). Mergeable sketches: shuffle
    carries KB-sized buffers, not values — the sub-linear path at
    100 TB. No oracle by design (sketch internals are engine-
    specific); error bounds vs the exact operators are pytest-asserted
    (tests/test_stats.py)."""
    from hippollm_spark.operators.stats import approx_stats

    li = _t(spark, sf_dir, "lineitem")
    return approx_stats(
        li, "l_extendedprice", "l_orderkey", "l_returnflag", percentiles=[0.5]
    ).orderBy("l_returnflag")


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks natively): each purchase event
    matched to the user's most recent click at-or-before it."""
    from hippollm_spark.operators.temporal import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases, clicks, on="ts", by="user_id",
        right_cols=["event_id"], tiebreak="event_id",
    )
    return out.select(
        "event_id", "user_id", F.col("event_id_asof").alias("click_event_id")
    )


# ===========================================================================
# Graph / relational operators (P*, G*) on the FIXTURES.md §6 mapping
# ===========================================================================

def q_p1_entity_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — point lookup by entity name (reference storage.py:201-205)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name") == ENTITY_A)
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy("p_partkey")
    )


def q_p2_fact_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — point lookup by dense fact id (reference storage.py:207-211),
    mapped onto the orders table keyed by o_orderkey."""
    from hippollm_spark.operators.relational import get_fact

    facts = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"), "o_custkey", "o_totalprice", "o_orderstatus"
    )
    return get_fact(facts, 7)


def q_p4_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — fact ids touching ANY entity (reference storage.py:278-289)."""
    from hippollm_spark.operators.relational import fact_ids_by_entities_union

    return fact_ids_by_entities_union(_edges(spark, sf_dir), [ENTITY_A, ENTITY_B])


def q_p5_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — relational division (reference storage.py:291-302)."""
    from hippollm_spark.operators.relational import fact_ids_by_entities_intersection

    return fact_ids_by_entities_intersection(_edges(spark, sf_dir), [ENTITY_A, ENTITY_B])


def q_p6_lone_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — entities with no incident fact (reference storage.py:171-181):
    part names never ordered. Uses the RAW incidence rows, not the
    deduplicated `_edges` view: a left-anti join is insensitive to
    right-side duplicates, so the (fact_id, entity) distinct would be
    a pure-cost shuffle here (measured 2x at sf0.1)."""
    parts = _t(spark, sf_dir, "part").select("p_name").distinct()
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    # part grows with sf — no forced hint; AQE broadcasts it at small
    # sf and falls back to shuffle at scale (round-10 broadcast policy).
    incidences = li.join(
        part, li.l_partkey == part.p_partkey
    ).select("p_name")
    return parts.join(incidences, on="p_name", how="left_anti")


def q_m1_upsert_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/M1 — upsert guard: names in the incoming batch not already
    present in the entity table survive (reference storage.py:188-190).
    Batch = low-key part names (all collide) + supplier names (all new)."""
    from hippollm_spark.operators.relational import new_entities_only

    part = _t(spark, sf_dir, "part")
    existing = part.select(F.col("p_name").alias("name")).distinct()
    new = (
        part.filter(F.col("p_partkey") < 100)
        .select(F.col("p_name").alias("name"))
        .union(_t(spark, sf_dir, "supplier").select(F.col("s_name").alias("name")))
        .distinct()
    )
    return new_entities_only(new, existing)


def q_g1_neighbours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — 1-hop neighbours with shared-fact counts (reference
    storage.py:213-224)."""
    from hippollm_spark.operators.graph import neighbours

    out = neighbours(_edges(spark, sf_dir), ENTITY_A)
    return out.select(
        "entity",
        "n_facts",
        F.array_min("fact_ids").alias("min_fact"),
        F.array_max("fact_ids").alias("max_fact"),
    )


def q_g2_explore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — 2-hop BFS from one entity, uncapped; links keep their
    first-discovery depth (reference hippoview app.py:37-63)."""
    from hippollm_spark.operators.graph import explore

    out = explore(
        _edges(spark, sf_dir),
        [ENTITY_A],
        max_depth=2,
        max_relations=None,
        # uncapped 2-hop: the dst arm rebuilds the lineitem⋈part edge
        # view once per hop without the pin (r11 A/B: 3.76→3.32 s)
        persist_edges=True,
    )
    return out.select("src", "dst", "n_facts", "depth")


def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the entity graph (hash-min label
    propagation), one row per component keyed by its lexicographically
    smallest member — oracle-checked against a DuckDB unrolled
    min-label/path-halving chain (r10: the earlier recursive-CTE
    transitive closure was O(V²) and OOMed DuckDB on the dense sf1
    graph; the unrolled form is O(E) per round like the Spark side)."""
    from hippollm_spark.operators.graph import connected_components

    cc = connected_components(_edges(spark, sf_dir), max_iter=15)
    return (
        cc.groupBy("component")
        .agg(F.count("*").alias("n_entities"), F.min("entity").alias("component_root"))
        .select("component_root", "n_entities")
        .orderBy(F.desc("n_entities"), F.asc("component_root"))
    )

def q_graph_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same component rollup as `graph_components`, computed by the
    large-star/small-star alternation (Kiveris et al., SoCC 2014) —
    the O(log² n)-worst-case-round scale path for graphs whose
    diameter grows with size (hash-min is O(diameter)). Identical
    output ⇒ identical recursive-closure oracle."""
    from hippollm_spark.operators.graph import connected_components_star

    cc = connected_components_star(_edges(spark, sf_dir))
    return (
        cc.groupBy("component")
        .agg(F.count("*").alias("n_entities"), F.min("entity").alias("component_root"))
        .select("component_root", "n_entities")
        .orderBy(F.desc("n_entities"), F.asc("component_root"))
    )



def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (6 iterations, damping 0.85) over the undirected
    entity co-occurrence graph, in exact scaled-integer arithmetic so
    the iterative fixpoint is hash-comparable across engines — the
    DuckDB twin unrolls the identical integer recurrence. The Spark
    side is the scalable iterative-join form (operators/graph.pagerank)."""
    from hippollm_spark.operators.graph import pagerank

    pairs = _cooc_pairs(spark, sf_dir).select("entity_a", "entity_b")
    sym = pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    ).union(
        pairs.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
    )
    return pagerank(sym, iterations=6).orderBy(
        F.desc("rank_scaled"), F.asc("vertex")
    )


def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded at {blue rod, hot rod}: proximity
    of every entity to the seed pair — the batch generalization of
    G2's entity-centric exploration. Same exact-integer recurrence as
    graph_pagerank, teleport restricted to the seeds."""
    from hippollm_spark.operators.graph import pagerank

    pairs = _cooc_pairs(spark, sf_dir).select("entity_a", "entity_b")
    sym = pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    ).union(
        pairs.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
    )
    return pagerank(sym, iterations=6, seeds=[ENTITY_A, ENTITY_B]).orderBy(
        F.desc("rank_scaled"), F.asc("vertex")
    )


def q_graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank: outbound mass split proportionally to the
    number of shared facts per entity pair (cooccurrence weight) —
    still exact scaled-integer arithmetic, so the 6-iteration fixpoint
    hash-matches the unrolled DuckDB recurrence."""
    from hippollm_spark.operators.graph import pagerank

    pairs = _cooc_pairs(spark, sf_dir).select(
        "entity_a", "entity_b", "weight"
    )
    sym = pairs.select(
        F.col("entity_a").alias("src"),
        F.col("entity_b").alias("dst"),
        "weight",
    ).union(
        pairs.select(
            F.col("entity_b").alias("src"),
            F.col("entity_a").alias("dst"),
            "weight",
        )
    )
    return pagerank(sym, iterations=6, weight_col="weight").orderBy(
        F.desc("rank_scaled"), F.asc("vertex")
    )


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the entity co-occurrence graph via
    degree-ordered orientation (skew-proof: out-degree bounded by
    O(√m) even under hub vertices — see graph.triangle_stats)."""
    from hippollm_spark.operators.graph import triangle_stats

    pairs = _cooc_pairs(spark, sf_dir).select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    )
    return triangle_stats(pairs)


def q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus, ship-year): all 8 grouping
    sets; grouping nulls coalesced for cross-engine stability.

    Pre-aggregate THEN cube: Spark's Expand runs before aggregation,
    so a naive ``li.cube(...)`` pays the (slow) decimal aggregation
    over 8× the fact rows. Aggregating to the ~|flag|·|status|·|year|
    base cells first and re-aggregating the exact decimal partials
    under the cube is algebraically identical (decimal sums are
    associative) and ~4× faster here; at 100 TB it is the only viable
    shape — the Expand blowup then touches hundreds of rows, not 8×
    the corpus."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    base = li.groupBy("l_returnflag", "l_linestatus", "ship_year").agg(
        F.count("*").alias("_n"),
        _e6sum(F.col("l_extendedprice")).alias("_s"),
    )
    return (
        base.cube("l_returnflag", "l_linestatus", "ship_year")
        .agg(
            F.sum("_n").alias("n_rows"),
            # re-aggregates the ~|flag|x|status|x|year| exact partials
            _e6out(F.sum("_s")).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.coalesce("ship_year", F.lit(-1)).alias("ship_year"),
            "n_rows",
            "sum_price",
        )
    )


def q_g3_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — entity co-occurrence projection (reference hippoview
    app.py:144-167)."""
    out = _cooc_pairs(spark, sf_dir)
    return out.select(
        "entity_a",
        "entity_b",
        "weight",
        F.array_min("fact_ids").alias("min_fact"),
    ).filter(F.col("weight") >= 2)


# ===========================================================================
# Vector search (V*)
# ===========================================================================

def q_v3_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 — exact top-10 by L2 (reference storage.py:266-276)."""
    from hippollm_spark.operators.knn import knn

    q = _query_vec(spark, sf_dir, 0)
    out = knn(_t(spark, sf_dir, "embeddings"), q, 10, id_col="vec_id")
    return out.select("vec_id", "label", F.round("distance", 6).alias("distance"))


def q_v4_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4 — kNN restricted to a candidate subset (reference
    storage.py:304-323); candidates = label ∈ {1,2,3}."""
    from hippollm_spark.operators.knn import knn

    q = _query_vec(spark, sf_dir, 0)
    cands = _t(spark, sf_dir, "embeddings").filter(F.col("label").isin(1, 2, 3))
    out = knn(cands, q, 10, id_col="vec_id")
    return out.select("vec_id", "label", F.round("distance", 6).alias("distance"))


def _fact_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture facts-with-embeddings table for V5/V6: every hypergraph
    fact id carries the embedding of vec_id = fact_id % 500."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ids = _edges(spark, sf_dir).select("fact_id").distinct()
    return ids.join(emb, ids.fact_id % 500 == emb.vec_id).select(
        "fact_id", "embedding"
    )


def q_v5_union_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5 — closest facts touching ANY of two entities (reference
    storage.py:325-330): P4 union candidates, then filtered kNN."""
    from hippollm_spark.operators.knn import knn_facts_with_entities_union

    q = _query_vec(spark, sf_dir, 0)
    out = knn_facts_with_entities_union(
        _fact_vectors(spark, sf_dir),
        _edges(spark, sf_dir),
        q,
        [ENTITY_A, ENTITY_B],
        k=5,
        id_col="fact_id",
    )
    if "distance" not in out.columns:  # k > |candidates| short-circuit
        out = out.withColumn("distance", F.lit(None).cast("double"))
    return out.select("fact_id", F.round("distance", 6).alias("distance"))


def q_v6_intersection_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V6 — closest facts touching ALL of two entities (reference
    storage.py:332-337): P5 relational-division candidates, then
    filtered kNN."""
    from hippollm_spark.operators.knn import knn_facts_with_entities_intersection

    q = _query_vec(spark, sf_dir, 0)
    out = knn_facts_with_entities_intersection(
        _fact_vectors(spark, sf_dir),
        _edges(spark, sf_dir),
        q,
        [ENTITY_A, ENTITY_B],
        k=5,
        id_col="fact_id",
    )
    # the reference's STRICT k > |candidates| short-circuit returns the
    # candidate set UNRANKED with no distance column (storage.py:
    # 308-309) — totalize the contract schema with a NULL distance so
    # the query is well-formed on any data shape (the sf1 fixture's
    # smaller name groups triggered the branch; the oracle replays the
    # same count-conditional)
    if "distance" not in out.columns:
        out = out.withColumn("distance", F.lit(None).cast("double"))
    return out.select("fact_id", F.round("distance", 6).alias("distance"))


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch similarity search: exact cosine top-5 for 3 query vectors."""
    from hippollm_spark.operators.similarity import topk_per_query

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return topk_per_query(emb, queries, k=5, id_col="vec_id")


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN serving scan, HASH-ORACLED: the
    codebooks were trained ONCE (tools/train_pq_pca_assets.py, float
    Lloyd at sf0.01, seed 42 — pq_build itself stays recall-tested in
    tests/test_similarity.py) and persisted e6-quantized under
    hippollm_spark/assets/; this query replays the exact-BIGINT
    encode + asymmetric-distance scan against those frozen literals
    (64-dim floats -> 8 subspace codes -> LUT-gather distance), so
    DuckDB reproduces it bit-for-bit from the same literals at any sf.
    TakeOrdered, no shuffle, original float vectors never re-read after
    the quantize step."""
    from hippollm_spark.operators.similarity import (
        load_pq_codebooks_e6,
        pq_adc_scan_quantized,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cb = load_pq_codebooks_e6()
    # quantize the query with the ENGINE's half-up round (same expr as
    # the table scan), so the oracle's round(x*1e6) matches exactly
    q_e6 = emb.filter("vec_id = 3").select(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1_000_000.0, 0).cast("long"),
        ).alias("q")
    ).first()["q"]
    import numpy as np

    return pq_adc_scan_quantized(
        emb, np.array(cb["codebooks_e6"]), np.array(q_e6, dtype=np.int64), k=10
    )


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (IVFADC) serving scan, HASH-ORACLED: coarse centroids +
    residual codebooks trained once (tools/train_pq_pca_assets.py,
    k-means++ seeded, seed 42 at sf0.1) and persisted e6-quantized;
    the query prunes to the nprobe=32 of nlist=128 inverted lists
    nearest the query (75% of the corpus never scored — the partition pruning that makes 100-TB
    ANN affordable), PQ-encodes residuals, and scores with per-list
    integer ADC LUTs. Every step is exact BIGINT with (dist, id)
    tie-breaks, so DuckDB replays coarse argmin, probe selection,
    residual encode, and LUT gather bit-for-bit at any sf."""
    from hippollm_spark.operators.similarity import (
        ivfpq_scan_quantized,
        load_ivfpq_e6,
    )

    emb = _t(spark, sf_dir, "embeddings")
    art = load_ivfpq_e6()
    q_e6 = emb.filter("vec_id = 3").select(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1_000_000.0, 0).cast("long"),
        ).alias("q")
    ).first()["q"]
    import numpy as np

    return ivfpq_scan_quantized(
        emb,
        np.array(art["coarse_e6"]),
        np.array(art["codebooks_e6"]),
        np.array(q_e6, dtype=np.int64),
        k=10,
        nprobe=32,
    )


def q_ann_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC-R serving path: the nprobe=64 (= nlist/2) ADC scan produces a
    100-deep shortlist whose rows are re-scored with the EXACT integer
    distance (one broadcast semi-join + O(100·d) map — the page of
    full vectors a deployment fetches for the shortlist). Converts
    PQ-distortion-limited ranking into coarse-quantizer-limited
    recall (the measured curve is in COVERAGE.md); every step exact
    BIGINT, so DuckDB replays shortlist AND re-rank bit-for-bit."""
    from hippollm_spark.operators.similarity import (
        ivfpq_topk_rerank,
        load_ivfpq_e6,
    )

    emb = _t(spark, sf_dir, "embeddings")
    art = load_ivfpq_e6()
    q_e6 = emb.filter("vec_id = 3").select(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1_000_000.0, 0).cast("long"),
        ).alias("q")
    ).first()["q"]
    import numpy as np

    return ivfpq_topk_rerank(
        emb,
        np.array(art["coarse_e6"]),
        np.array(art["codebooks_e6"]),
        np.array(q_e6, dtype=np.int64),
        k=10,
        nprobe=64,
        rerank=100,
    )


_IVFX_MEMO: dict[tuple[str, str], str] = {}


def _ivfx_table(spark: SparkSession, sf_dir: str) -> str:
    """Memoized persisted full-vector IVF index over the embeddings
    table, assigned against the FROZEN ivfpq coarse centroids
    (nlist=128, exact-int64 — similarity.save_ivf_index_e6): built
    ONCE per (session, sf_dir), bucketed by list_id. Table name keyed
    on sf_dir only (drop-and-rewrite; single-writer assumption as for
    the co-located tables — README)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    name = _IVFX_MEMO.get(key)
    if name is None:
        import hashlib as _hl

        import numpy as np

        from hippollm_spark.operators.similarity import (
            load_ivfpq_e6,
            save_ivf_index_e6,
        )

        name = f"ivx_{_hl.md5(sf_dir.encode()).hexdigest()[:12]}"
        save_ivf_index_e6(
            spark,
            _t(spark, sf_dir, "embeddings"),
            name,
            np.array(load_ivfpq_e6()["coarse_e6"]),
        )
        _IVFX_MEMO[key] = name
    return name


def q_v3_knn_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 through the PERSISTED IVF index (VERDICT r10 stretch): the
    store-facade serving path (`use_index=True`, store.py) given a
    measured contract row. The index is the full-vector table bucketed
    by its frozen-centroid list assignment; the probe reads nprobe=32
    of nlist=128 buckets (75% of the corpus never scanned — the
    partition pruning that makes repeat-query ANN serving affordable
    at 100 TB) and scores ONLY those lists with the exact float L2 of
    the brute-force path. Same output schema as `v3_knn`; the DuckDB
    twin replays assignment + probe selection from the same e6
    centroid literals and the same exact distance, so the row is
    hash-oracled, not merely recall-tested."""
    import numpy as np

    from hippollm_spark.operators.similarity import (
        ivf_topk_indexed_e6,
        load_ivfpq_e6,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # one scalar job fetches BOTH query forms (float for the exact
    # scoring, engine-rounded e6 for the probe selection) — the
    # serving path's per-query driver cost is a single collect
    q_row = emb.filter("vec_id = 0").select(
        F.col("embedding").alias("qv"),
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1_000_000.0, 0).cast("long"),
        ).alias("q"),
    ).first()
    out = ivf_topk_indexed_e6(
        spark,
        _ivfx_table(spark, sf_dir),
        np.array(load_ivfpq_e6()["coarse_e6"]),
        q_row["q"],
        [float(x) for x in q_row["qv"]],
        k=10,
        nprobe=32,
    )
    return out.select("vec_id", "label", F.round("distance", 6).alias("distance"))


def q_emb_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the EXACT baseline the
    LSH variants are recall-tested against, NOT the 100-TB path: at
    this loose threshold (0.35) the true output grows quadratically
    with the corpus (44 M pairs at sf1), so scale users take
    `similarity.lsh_dup_pairs` (SRP-banded, recall-tested against
    this exact baseline); the operator warns below 0.5."""
    from hippollm_spark.operators.dedup import embedding_dup_pairs

    return embedding_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.35)


# ===========================================================================
# Dedup family on documents
# ===========================================================================

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate clusters (md5 of normalized text)."""
    from hippollm_spark.operators.dedup import duplicate_groups

    out = duplicate_groups(_t(spark, sf_dir, "documents"))
    return out.select(
        "text_hash", "n_dups", F.array_min("doc_ids").alias("min_doc_id")
    )


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-gram Jaccard similarity join at threshold 0.5."""
    from hippollm_spark.operators.dedup import jaccard_dup_pairs

    return jaccard_dup_pairs(_t(spark, sf_dir, "documents"), threshold=0.5, n=3)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (banded candidate generation, exact
    Jaccard verification) — fully oracle-checked: with the md5 shingle
    hash every stage (shingle→int64, seeded multiply-add permutation
    mins, 32×4 banding, verify) is deterministic and DuckDB recomputes
    it bit-for-bit from the same seed-42 parameters."""
    from hippollm_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        threshold=0.5,
        num_hashes=128,
        bands=32,
        shingle_hash="md5",
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) over the pure-SQL 60-bit
    md5 simhash — fully oracle-checked: DuckDB recomputes the same
    fingerprints bit-for-bit and brute-forces the pairs, while Spark
    uses the 4-block candidate join."""
    from hippollm_spark.operators.dedup import simhash60_sql, simhash_block_pairs

    fp = simhash60_sql(_t(spark, sf_dir, "documents"))
    return simhash_block_pairs(fp, max_hamming=3, n_bits=60)


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data curation pipeline as ONE query: quality
    gate → language gate → held-out split → exact dedup → near-dup
    canonicalization → benchmark decontamination → per-language
    concat-and-chunk packing summary. End-to-end oracle: DuckDB replays
    every stage (integer quality score, langid argmax, md5 winners,
    recursive-CTE dup closure, cross-corpus Jaccard, windowed packing),
    so a regression in any stage OR any stage handoff breaks the hash.
    Output: (lang_pred, n_docs, n_tokens, n_chunks)."""
    from hippollm_spark.pipelines.curate import curate_corpus

    return curate_corpus(_t(spark, sf_dir, "documents"))


def q_corpus_curation_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline WITH the SemDeDup stage (keeper-anchored
    epsilon-prune over the shared corpus-wide Lloyd fit) inserted
    between decontamination and packing — the SemDeDup paper's
    placement in a training-data pipeline. The fit is injected from
    the `_kmeans_assigned` memo (the same one clustering serves four
    other queries); the DuckDB oracle replays the full composition:
    every curation stage + the unrolled exact-BIGINT Lloyd chain +
    the keeper window + the distance-to-keeper prune.
    Output: (lang, n_docs, n_tokens, n_chunks) of the pruned corpus."""
    from hippollm_spark.pipelines.curate import curate_corpus

    return curate_corpus(
        _t(spark, sf_dir, "documents"),
        embeddings=_t(spark, sf_dir, "embeddings"),
        semantic_eps_e12=1_600_000_000_000,
        semantic_assigned=_kmeans_assigned(spark, sf_dir),
    )


def q_ingest_m1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 bulk entity ingest (reference storage.py:183-199 as a batch):
    guarded insert of 15k customer rows against a 10% pre-seeded store,
    embedding the fresh rows' "name (description)" repr with the
    deterministic dim-384 sha256 stand-in via an Arrow-batched
    pandas_udf — the full write-path shape (anti-join guard → embed →
    union). Output: one row per entity with a 6dp checksum of its
    embedding (NULL for pre-seeded rows, which skip embedding), so the
    DuckDB oracle replays every one of the 384 hash dims bit-for-bit.
    Throughput context: the reference ingests 62.5 entities/s
    single-process (bootstrap_wikipedia.py:184); this query's sf0.1
    wall clock / 15,000 rows gives our per-core-comparable rate."""
    from hippollm_spark.operators.relational import add_entities
    from hippollm_spark.testing import hash_embedding_udf

    cust = _t(spark, sf_dir, "customer")
    existing = cust.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_name").alias("name"), F.col("c_mktsegment").alias("description")
    )
    new = cust.select(
        F.col("c_name").alias("name"), F.col("c_mktsegment").alias("description")
    )
    # embed_partitions: AQE coalesces the guard's small-in-bytes shuffle
    # to ~1 partition, which would serialize the per-row embedding UDF
    # onto one core (measured 6×) — spread the model stage explicitly.
    out = add_entities(existing, new, embed=hash_embedding_udf(384), embed_partitions=64)
    proj = out.select(
        "name",
        # + 0.0 normalizes IEEE signed zero: a tiny negative sum rounds
        # to -0.0 in DuckDB but +0.0 in Spark (BigDecimal strips the
        # sign), and the driver's canonical format prints them apart
        (
            F.round(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda a, x: a + x.cast("double")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("emb_sum"),
    )
    # Materialize the ~16 B/row (name, emb_sum) projection BEFORE the
    # global sort: orderBy's RangePartitioner SAMPLES its input, which
    # otherwise executes the whole guard→repartition→embed-UDF chain a
    # second time (r11 event-log profile: two 65-task ArrowEvalPython
    # stages for one query — the batch-4 range-sampler shape). The
    # checkpoint runs the embed exactly once; the sort reads 15k tiny
    # rows from storage. plan_barrier (r12) picks a RELIABLE checkpoint
    # when the deployment configured a checkpoint dir — on a cluster an
    # executor loss after this barrier would otherwise fail the query
    # instead of recomputing (ADVICE r11).
    from hippollm_spark.operators.dedup import plan_barrier

    return plan_barrier(proj, eager=True).orderBy("name")


def q_emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (element-wise mean) in long format
    (label, pos, c) — the vector aggregate behind IVF coarse quantizers
    and class prototypes. Exact decimal sums, one double division, 6dp
    round: bit-identical to the DuckDB oracle."""
    from hippollm_spark.functions.vectors import label_centroids

    out = label_centroids(_t(spark, sf_dir, "embeddings"))
    return out.orderBy("label", "pos")


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup decision: exact 3-gram Jaccard pairs at 0.5 →
    duplicate groups via min-label propagation over the pair graph →
    one row per grouped document with its canonical (smallest
    reachable) id. Rows where doc_id != canonical_id are the drops;
    chains a~b, b~c collapse into one group even though (a,c) was never
    a pair. Oracle: recursive-CTE transitive closure over the same pair
    set (feasible only because sf duplicate groups are tiny — the Spark
    side never materializes a closure)."""
    from hippollm_spark.operators.dedup import dedup_canonicalize, jaccard_dup_pairs

    pairs = jaccard_dup_pairs(_t(spark, sf_dir, "documents"), threshold=0.5, n=3)
    return dedup_canonicalize(pairs).orderBy("canonical_id", "doc_id")


def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide boilerplate segment removal (the C4/RefinedWeb
    repeated-line rule on 10-token segments): segments appearing in more
    than 2 documents are dropped, documents reassembled in order. Output
    fingerprints the cleaned text so every drop decision is replayed."""
    from hippollm_spark.operators.dedup import remove_boilerplate_segments

    out = remove_boilerplate_segments(
        _t(spark, sf_dir, "documents"), seg_tokens=10, max_df=2
    )
    return out.select(
        "doc_id", F.md5("text").alias("clean_md5"), F.length("text").alias("n_chars")
    ).orderBy("doc_id")


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination join: exact 3-gram Jaccard >= 0.5 pairs
    between the training corpus (doc_id % 20 != 0) and a held-out
    benchmark slice (doc_id % 20 == 0). The benchmark's exploded
    shingles are broadcast, so the corpus side never shuffles."""
    from hippollm_spark.operators.dedup import cross_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return cross_jaccard_pairs(corpus, bench, threshold=0.5, n=3).orderBy(
        "corpus_id", "bench_id"
    )


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment (pure map —
    membership depends only on md5(id, salt), stable under reruns,
    repartitioning, and appends), summarized per (split, lang)."""
    from hippollm_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    return (
        hash_split(docs)
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split", "lang")
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit: identical-content documents (same
    normalized fingerprint) landing on both sides of the hash split —
    the check every eval pipeline runs after splitting. Composition of
    hash_split ∘ fingerprint; the fingerprint groupBy carries only
    per-split flags, so shuffle volume is one row per distinct
    content, not per document."""
    from hippollm_spark.operators.sampling import hash_split
    from hippollm_spark.operators.textstats import fingerprint

    docs = hash_split(_t(spark, sf_dir, "documents")).withColumn(
        "fp", fingerprint("text")
    )
    per_fp = docs.groupBy("fp").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0)).alias("in_test"),
        F.count("*").alias("n_docs"),
    )
    return per_fp.agg(
        F.count("*").alias("n_distinct_contents"),
        F.sum(
            F.when((F.col("in_train") == 1) & (F.col("in_test") == 1), 1).otherwise(0)
        ).alias("n_leaked_contents"),
        F.sum(
            F.when(
                (F.col("in_train") == 1) & (F.col("in_test") == 1), F.col("n_docs")
            ).otherwise(0)
        ).alias("n_leaked_docs"),
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 25 docs per language, chosen by
    smallest md5 rank-hash — re-running the pipeline reproduces the
    exact same training mix."""
    from hippollm_spark.operators.sampling import stratified_sample

    out = stratified_sample(
        _t(spark, sf_dir, "documents"), strata_col="lang", n_per_stratum=25
    )
    return out.select("doc_id", "lang").orderBy("lang", "doc_id")


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) mix sampling: per-language quotas
    proportional to sqrt(stratum size) — the standard multilingual
    rebalancing — realized as a windowless rank-hash threshold."""
    from hippollm_spark.operators.sampling import temperature_sample

    out = temperature_sample(
        _t(spark, sf_dir, "documents"), strata_col="lang", tau=0.5, total_n=200
    )
    return out.select("doc_id", "lang").orderBy("lang", "doc_id")


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per-language token streams in
    doc_id order sliced every 2048 tokens; one row per training chunk
    with the docs that start in it."""
    from hippollm_spark.operators.sampling import pack_sequences, pack_summary
    from hippollm_spark.operators.textstats import token_count

    docs = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count("text").cast("long")
    )
    packed = pack_sequences(docs, ctx=2048, shard_col="lang")
    return pack_summary(packed, shard_col="lang").orderBy("lang", "chunk_id")


# ===========================================================================
# Text analysis on documents
# ===========================================================================

def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hippollm_spark.operators.textstats import quality_features

    return quality_features(_t(spark, sf_dir, "documents"))


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID, tokenize-once DataFrame form (the text-column form
    re-runs the tokenizer once per language probe)."""
    from hippollm_spark.operators.textstats import language_id

    return language_id(_t(spark, sf_dir, "documents"))


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents augmented with deterministic
    synthetic PII (the corpus itself is clean): per doc, the md5 of the
    scrubbed text plus per-class match counts. Both engines construct
    the identical augmented text, so every replacement is replayed."""
    from hippollm_spark.operators.textstats import pii_counts, scrub_pii

    docs = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id"),
        F.lit("@mail.example.com via https://ex.org/d"), F.col("doc_id"),
        F.lit(" or call +1202555"), F.lpad(F.col("doc_id") % 1000, 4, "0"),
    )
    return docs.select(
        "doc_id",
        F.md5(scrub_pii(aug)).alias("scrubbed_md5"),
        *pii_counts(aug),
    ).orderBy("doc_id")


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hippollm_spark.operators.textstats import bpe_ish_token_count, token_count

    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_pieces"),
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hippollm_spark.operators.textstats import with_fingerprints

    return with_fingerprints(_t(spark, sf_dir, "documents"))


def q_split_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 paragraph splitter over deterministically paragraphed text
    (the corpus has no newlines, so both engines rebuild each doc as
    12-token paragraphs joined with blank lines first): verifies the
    split AND the running +2 char offsets (reference splitters.py:80-96)."""
    from hippollm_spark.functions.text import split_paragraphs

    toks = F.split(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")), " ")
    staged = _t(spark, sf_dir, "documents").select("doc_id", toks.alias("__toks__"))
    n_para = F.ceil(F.size("__toks__") / F.lit(12)).cast("int")
    content = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_para - 1),
            lambda i: F.array_join(F.slice(F.col("__toks__"), i * 12 + 1, 12), " "),
        ),
        "\n\n",
    )
    out = split_paragraphs(staged.select("doc_id", content.alias("content")))
    return out.select(
        "doc_id", "chunk_idx", F.md5("text").alias("chunk_md5"),
        "pos_start", "pos_end",
    ).orderBy("doc_id", "chunk_idx")


def q_split_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — fixed-size chunking with positions (reference
    splitters.py:46-61)."""
    from hippollm_spark.functions.text import split_naive

    return split_naive(
        _t(spark, sf_dir, "documents"), chunk_size=50, text_col="text"
    )


# ===========================================================================
# Events (stream table, batch view)
# ===========================================================================

def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (batch equivalent of the
    Structured Streaming aggregation in hippollm_spark.streaming)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            _e6out(_e6sum(F.col("value"))).alias("sum_value"),
        )
        .orderBy("hour_ts", "event_type")
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample, 20 per language
    (Efraimidis-Spirakis exponential keys off the md5 rank-hash;
    deterministic, weight-proportional, repartition-stable)."""
    from hippollm_spark.operators.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    out = weighted_sample(
        docs, "n_chars", n=20, by="lang", id_col="doc_id"
    )
    return out.select("doc_id", "lang", "n_chars")


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity self-join: part-name pairs within
    Levenshtein distance 2, via lossless PassJoin pigeonhole blocking
    + exact verify (operators/dedup.edit_distance_pairs) — output is
    provably identical to a quadratic cross join + filter (the oracle
    replays it grouped by distinct name). The OUTPUT is quadratic in
    the largest same-name group, so a column whose cardinality doesn't
    grow with the corpus emits Θ(n²) true rows — at 100 TB dedup the
    column first or use the banded minhash variants (see the operator
    docstring's scale guard)."""
    from hippollm_spark.operators.dedup import edit_distance_pairs

    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("doc_id"), F.col("p_name").alias("text")
    )
    return edit_distance_pairs(part, "text", k=2)


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of event values per event type
    (global bounds). Partial counts combine map-side; the shuffle is
    #types × #bins rows regardless of scale."""
    from hippollm_spark.operators.stats import histogram

    return histogram(_events(spark, sf_dir), "value", n_bins=20, by="event_type")


def q_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score scaling of event values via exact DECIMAL
    moments (order-independent — bit-stable across partitionings,
    unlike the built-in stddev_samp's float accumulation)."""
    from hippollm_spark.operators.stats import standardize

    out = standardize(
        _events(spark, sf_dir).select("event_id", "event_type", "value"),
        ["value"],
        by="event_type",
    )
    return out.select("event_id", "event_type", "value_z")


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: per step, users whose
    earliest step event strictly follows their earliest qualifying
    previous-step event (operators/behavior.funnel_counts)."""
    from hippollm_spark.operators.behavior import funnel_counts

    return funnel_counts(_events(spark, sf_dir), ["view", "click", "purchase"])


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle (operators/behavior
    .cohort_retention): users bucketed by first-active week; cells
    count distinct active users at each week offset."""
    from hippollm_spark.operators.behavior import cohort_retention

    return cohort_retention(_events(spark, sf_dir), period="week")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent tokens (share ≥ 1%) over the document corpus via
    two-pass Misra-Gries: bounded-memory per-partition summaries →
    provably-complete candidate set → exact verification count. The
    final output is deterministic (= GROUP BY HAVING with an exact
    integer threshold), so it oracle-checks despite the sketch."""
    from hippollm_spark.operators.dedup import normalized_text
    from hippollm_spark.operators.stats import heavy_hitters

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    )
    return heavy_hitters(toks, "tok", share_ratio=(1, 100))


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: one row per user per day from each
    user's first to last active day, gaps filled by LOCF (operators/
    temporal.gap_fill). Input is deduped to one row per (user, ts) so
    the last-observation pick is deterministic on both engines."""
    from hippollm_spark.operators.temporal import gap_fill

    ev = _events(spark, sf_dir).filter(F.col("user_id") <= 5)
    base = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    out = gap_fill(base, by="user_id", step="1 day", value_cols=["value"])
    return out.select(
        "user_id",
        F.col("tick"),
        F.round("value", 2).alias("value"),
        "n_obs",
    )


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column processing: schema'd JSON parse of the
    events props payload (`from_json` — typed extraction inside
    codegen, the idiomatic Spark path for JSON-string columns; at
    scale the parse is a narrow map, no shuffle until the aggregate).
    Exact integer aggregates per event type."""
    ev = _events(spark, sf_dir)
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        ev.withColumn("_k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("_k").alias("n_with_k"),
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def q_events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment, batch twin: events joined
    to the customer dimension, hourly revenue per market segment
    (streaming form: streaming.events.segment_windowed_revenue — same
    logical plan with a watermark; parity-tested). customer grows with
    sf, so no forced broadcast hint — the planner broadcasts it while
    its stats fit autoBroadcastJoinThreshold and shuffles at scale."""
    ev = _events(spark, sf_dir)
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"), "c_mktsegment"
        )
        .agg(
            F.count("*").alias("n_events"),
            _e6out(_e6sum(F.col("value"))).alias("sum_value"),
        )
        .orderBy("hour_ts", "c_mktsegment")
    )


def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream attribution join
    (streaming.events.click_purchase_join): purchases matched to same-
    user clicks within the preceding hour, per-user pair counts and
    exact integer-µs delay bounds. The oracle compares in integer µs
    (DuckDB reads the raw ns timestamps; Spark truncates to µs on
    read, so timestamp-typed comparison would straddle precisions)."""
    from hippollm_spark.streaming.events import click_purchase_join

    ev = _events(spark, sf_dir)
    j = click_purchase_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        within="1 hour",
    )
    return (
        j.groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("delay_us").alias("min_delay_us"),
            F.max("delay_us").alias("max_delay_us"),
        )
        .orderBy("user_id")
    )


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap per user (lag + cumulative
    flag-sum — the batch twin of streaming session_window)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ-safe gap: timestamp difference is a day-time interval
    gap = F.col("ts") - F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), 1).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type pivot (wide activity matrix)."""
    ev = _events(spark, sf_dir)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )
    return out.select(
        "user_id",
        *[F.col(c).alias(f"n_{c}") for c in ["click", "error", "purchase", "signup", "view"]],
    )


def q_events_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) the wide activity matrix back to long form —
    Spark's native ``unpivot`` operator (zero-count cells dropped so
    the long form is sparse)."""
    wide = q_events_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            "user_id",
            [f"n_{c}" for c in ["click", "error", "purchase", "signup", "view"]],
            "event_type",
            "n",
        )
        .filter(F.col("n") > 0)
        .select(
            "user_id",
            F.expr("substring(event_type, 3)").alias("event_type"),
            "n",
        )
    )


def q_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day purchase-revenue change per day: lag window +
    exact DECIMAL daily sums; delta null on the first day."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        _e6out(_e6sum(F.col("value"))).alias("revenue")
    )
    # unpartitioned window over DAYS: bounded at ~|date range| rows
    # (a few hundred at any sf — one row per day post-aggregate), never
    # the event count, so the single-task sort is safe
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "revenue",
        _rnd(F.col("revenue") - F.lag("revenue").over(w), 2).alias("delta"),
    )


def q_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user reach and value stats per event type."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("event_type")
    )


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 word trigrams by document frequency."""
    from hippollm_spark.operators.dedup import _cpu_spread, with_shingles

    # spread before the shingle transform: single-file scans otherwise
    # run the whole tokenizer+n-gram chain in one task (r11, guide §2.2)
    sh = with_shingles(_cpu_spread(_t(spark, sf_dir, "documents"), None), n=3)
    return (
        sh.select(F.explode("shingles").alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("ngram"))
        .limit(20)
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical top-20 for the query {hash, join, vector} —
    the lexical complement of the kNN retrieval path (operators/
    ranking.py). Only query-matching postings are shuffled; term-df
    and corpus stats are broadcast; top-k is TakeOrderedAndProject."""
    from hippollm_spark.operators.ranking import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"), ["hash", "join", "vector"], k=20
    )


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 for {hash, join, vector} fused
    with embedding-cosine top-50 for the embedding of vec_id 3 (the
    corpus convention: vec_id == doc_id) via reciprocal-rank fusion.
    Exact scaled-integer scores (sum of 10^15 div (60+rank)) make the
    fusion bit-identical to the DuckDB oracle."""
    from hippollm_spark.operators.ranking import bm25_topk, rrf_fuse
    from hippollm_spark.operators.similarity import topk_per_query

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, ["hash", "join", "vector"], k=50)
    # unpartitioned window over a top-k result (k<=50 rows by
    # construction) — bounded input, single tiny partition is fine
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex_ranked = lex.withColumn("rank", F.row_number().over(w).cast("int"))
    queries = emb.filter(F.col("vec_id") == 3).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # spread=False: one query — the corpus-spread exchange costs more
    # than one query's scoring wins back (r12 A/B)
    vec_ranked = topk_per_query(
        emb, queries, k=50, id_col="vec_id", spread=False
    ).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse(
        [lex_ranked.select("doc_id", "rank"), vec_ranked],
        k=10,
        k0=60,
        scale=10**15,
    )


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified rerank of the cosine top-30 for the embedding of
    vec_id 3 (λ=0.5), via the ORACLE-GRADE quantized twin: 6dp-integer
    relevance/similarity and exact BIGINT argmax chains, so DuckDB can
    unroll the identical 10 greedy selections (ranking.
    mmr_rerank_quantized; the raw-float `mmr_rerank` remains the
    throughput path, pure-Python-parity-tested in test_ranking)."""
    from hippollm_spark.operators.ranking import mmr_rerank_quantized
    from hippollm_spark.operators.similarity import topk_per_query

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") == 3).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # spread=False: single-query call (r12 A/B — see bm25_ndcg note)
    cands = topk_per_query(
        emb, queries, k=30, id_col="vec_id", spread=False
    ).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    return mmr_rerank_quantized(cands, k=10, lambda_e6=500_000).orderBy(
        "mmr_rank"
    )


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copied-span detection via winnowing fingerprints (MOSS scheme):
    doc pairs sharing >= 20 selected rolling-hash fingerprints, after
    dropping boilerplate fingerprints present in > 2% of the corpus
    (the skew/quadratic-blowup guard; mirrored in the oracle SQL)."""
    from hippollm_spark.operators.textstats import winnow_dup_pairs

    docs = _t(spark, sf_dir, "documents")
    # max_df = n_docs div 50 as a scalar subquery: the corpus count runs
    # inside the pair query (one job) instead of as a separate eager
    # docs.count() action per call — same value, integer div on both
    # paths (guide §1.2: fewer actions).
    return winnow_dup_pairs(
        docs,
        k=8,
        window=4,
        min_shared=20,
        max_df=docs.agg(F.expr("count(*) div 50").alias("__max_df__")).scalar(),
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (most-frequent-n-gram coverage,
    duplicate-5-gram fraction) — zero-shuffle quality filters."""
    from hippollm_spark.operators.textstats import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"))


def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword removal: normalized text with English stopwords dropped
    (a boilerplate-reduction map stage)."""
    from hippollm_spark.operators.dedup import normalized_text
    from hippollm_spark.operators.textstats import LANG_MARKERS

    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    toks = F.split(normalized_text("text"), " ")
    kept = F.filter(toks, lambda t: ~F.array_contains(stop, t))
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).alias("n_kept"),
    )


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document — keyword extraction for
    corpus exploration/labeling. One corpus shuffle for tf, a
    vocabulary-sized broadcast for df, a doc-partitioned top-k window."""
    from hippollm_spark.operators.textstats import tfidf_keywords

    return tfidf_keywords(_t(spark, sf_dir, "documents"), k=3)


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 adjacent-bigram collocations by PMI (min_count=5) —
    Church & Hanks collocation mining; ln over exact integer products
    so the 6dp score is engine-independent."""
    from hippollm_spark.operators.textstats import pmi_collocations

    return pmi_collocations(_t(spark, sf_dir, "documents"), k=15, min_count=5)


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-bag-of-words logistic scoring at scan
    speed: token→bucket→weight→mean→sigmoid as ONE codegen'd
    expression chain, zero exchanges — the shape of quality-classifier
    inference over 100 TB (a trained model would broadcast its weight
    table; the deterministic md5-derived weights stand in)."""
    from hippollm_spark.operators.textstats import linear_classifier_score

    return linear_classifier_score(_t(spark, sf_dir, "documents"))


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-level dedup signal (Lee et al. 2022): per-document
    coverage by 8-token spans that also occur in another document —
    the relational stand-in for the suffix-array substring dedup pass,
    shuffling only (digest, doc, pos) triples."""
    from hippollm_spark.operators.dedup import duplicated_span_stats

    return duplicated_span_stats(_t(spark, sf_dir, "documents"), n=8)


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS distance (≤4 hops) from the two probe entities
    over the undirected co-occurrence graph — the batch form of G2's
    depth-limited explore; one frontier join + anti-join per hop."""
    from hippollm_spark.operators.graph import shortest_paths

    pairs = _cooc_pairs(spark, sf_dir).select("entity_a", "entity_b")
    sym = pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    ).union(
        pairs.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
    )
    return shortest_paths(sym, [ENTITY_A, ENTITY_B], max_depth=4).orderBy(
        "dist", "vertex"
    )


def q_merge_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (SCD1) applied to the customer dimension: a synthetic
    deterministic change feed — custkey%5==0 deletes, %5==1 updates
    acctbal (+100.00) and re-inserts under key+10^6 — folded in with
    one window + one anti-join + one union, the Delta/Iceberg MERGE
    physical plan minus the commit protocol."""
    from hippollm_spark.operators.scd import merge_into

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    upd = cust.filter(F.col("c_custkey") % 5 == 1).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        F.lit("U").alias("op"),
        F.col("c_custkey").alias("seq"),
    )
    ins = cust.filter(F.col("c_custkey") % 5 == 1).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.concat(F.lit("copy of "), F.col("c_name")).alias("c_name"),
        F.col("c_mktsegment"),
        F.col("c_acctbal"),
        F.lit("U").alias("op"),
        F.col("c_custkey").alias("seq"),
    )
    dels = cust.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_acctbal",
        F.lit("D").alias("op"),
        F.col("c_custkey").alias("seq"),
    )
    changes = upd.unionByName(ins).unionByName(dels)
    return merge_into(cust, changes, "c_custkey")


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorization of `value` at the exact
    interpolated [p5, p95]: one sorted percentile pass per group
    (group-count-sized bounds table) broadcast back onto the facts —
    outlier clipping before any downstream mean/variance stage."""
    from hippollm_spark.operators.stats import winsorize

    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    return winsorize(ev, "value", "event_type", lower=0.05, upper=0.95)


def q_entity_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-similarity: Jaccard of fact sets for entity pairs sharing
    ≥2 facts — shared-fact blocking generates pairs, never a cross
    join; degrees join back on narrow keys."""
    from hippollm_spark.operators.graph import entity_jaccard

    return entity_jaccard(_edges(spark, sf_dir), min_shared=2)


def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round synchronous label propagation with the deterministic
    (max count, min label) update rule over the undirected
    co-occurrence graph — community detection whose fixpoint the
    DuckDB oracle replays exactly (plain LPA's random tie-break
    cannot be hash-compared)."""
    from hippollm_spark.operators.graph import label_propagation

    pairs = _cooc_pairs(spark, sf_dir).select("entity_a", "entity_b")
    sym = pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    ).union(
        pairs.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
    )
    return label_propagation(sym, iterations=3).orderBy("vertex")


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags per event type: |v − median| > 3·MAD with
    exact interpolated medians — two bounds tables broadcast back,
    facts never shuffle."""
    from hippollm_spark.operators.stats import mad_outliers

    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    return mad_outliers(ev, "value", "event_type", k=3.0)


def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing: NTILE(10) over the integer quality score
    (doc_id tie-break makes the total order — and therefore every
    bucket boundary — deterministic)."""
    from hippollm_spark.operators.stats import ntile_buckets
    from hippollm_spark.operators.textstats import quality_features

    q = quality_features(_t(spark, sf_dir, "documents")).select(
        "doc_id", "quality_score_e8"
    )
    return ntile_buckets(q, "quality_score_e8", 10, tiebreak_col="doc_id")


def q_rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing revenue average: exact DECIMAL daily sums, then
    a RANGE window over the integer day index (so calendar gaps
    shorten the window instead of silently spanning them); the
    trailing mean divides the exact decimal window sum by the window
    row count."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        _e6sum(F.col("value")).alias("__rev__")
    )
    daily = daily.withColumn(
        "day_idx", F.datediff(F.col("day").cast("date"), F.lit("1970-01-01").cast("date"))
    )
    # unpartitioned range window over DAYS (one row per day
    # post-aggregate, bounded at ~|date range| regardless of sf)
    w = Window.orderBy("day_idx").rangeBetween(-6, 0)
    return daily.select(
        "day",
        _e6out(F.col("__rev__")).alias("revenue"),
        # descale THEN divide by the window count — op order mirrors
        # the oracle exactly (identical IEEE steps)
        _rnd(
            F.sum("__rev__").over(w).cast("double")
            / F.lit(1000000.0)
            / F.count("*").over(w),
            6,
        ).alias("avg_7d"),
        F.count("*").over(w).alias("n_days"),
    ).orderBy("day")


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (k=8, 3 rounds) over the embeddings
    in exact fixed-point integer arithmetic — quantize to µ-units,
    integer squared-L2 argmin with (dist, cid) tie-break, sign-wrapped
    truncating-division means — so the iterative fixpoint is
    bit-identical on any engine; the DuckDB twin unrolls the same
    recurrence (the PageRank determinism discipline applied to
    clustering). Per round: one numpy-int64 assignment pass (identical
    exact integers to the codegen-literal form — parity-tested — but
    the plan is not recompiled each round) + one (cluster, dim) sum
    shuffle. The fit is shared with the three semantic-curation
    queries via the `_kmeans_assigned` parquet memo — fit once,
    serve four."""
    return (
        _kmeans_assigned(spark, sf_dir)
        .select(F.col("__id__").alias("vec_id"), "cluster", "dist_e12")
        .orderBy("vec_id")
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embeddings table: the
    exact fixed-point Lloyd clustering (same k=8, 3 rounds and integer
    discipline as q_kmeans_clusters), then one keeper per cluster —
    the member closest to its final centroid, ties to the smallest id
    — with the member count alongside. The oracle replays the shared
    unrolled chain and the same keeper window, all exact BIGINT."""
    from hippollm_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, k=8, iterations=3, method="pandas",
        assigned=_kmeans_assigned(spark, sf_dir),
    ).orderBy("cluster")


def q_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded SemDeDup over the embeddings table: cluster with the
    exact Lloyd fit, then survivors = each cluster's keeper plus the
    members farther than eps from it (squared-L2, e12 integer units;
    eps=1.6e12 sits just below the observed median keeper distance, so
    the prune is substantive at any sf). Fully integer → hash oracle."""
    from hippollm_spark.operators.similarity import semantic_prune

    emb = _t(spark, sf_dir, "embeddings")
    return (
        semantic_prune(
            emb, eps_e12=1_600_000_000_000, k=8, iterations=3, method="pandas",
            assigned=_kmeans_assigned(spark, sf_dir),
        )
        .withColumnRenamed("__id__", "vec_id")
        .orderBy("vec_id")
    )


def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sample over the embeddings: 20 per
    semantic cluster (k=8 exact Lloyd), drawn by salted-md5 rank within
    the cluster — the deterministic training-mix sampler that keeps
    rare modes represented. Oracle replays the shared Lloyd chain plus
    the identical md5-rank window."""
    from hippollm_spark.operators.similarity import cluster_stratified_sample

    emb = _t(spark, sf_dir, "embeddings")
    return (
        cluster_stratified_sample(
            emb, 20, k=8, iterations=3, method="pandas",
            assigned=_kmeans_assigned(spark, sf_dir),
        )
        .withColumnRenamed("__id__", "vec_id")
        .orderBy("cluster", "sample_key")
    )


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix per user stream:
    lead window with (ts, event_id) tie-break, map-side pair counts,
    type-cardinality broadcast for the row-normalized probabilities."""
    from hippollm_spark.operators.behavior import transition_matrix

    return transition_matrix(_events(spark, sf_dir))


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over (order, part-name)
    baskets: support ≥ 3 pairs via the shared-basket self-join (no
    cross join), lift from exact integer counts."""
    from hippollm_spark.operators.behavior import basket_lift

    return basket_lift(
        _edges(spark, sf_dir),
        basket_col="fact_id",
        item_col="entity",
        min_support=3,
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level reconciliation of the CDC-merged customer dimension
    against the original snapshot: one full-outer join emitting
    added/removed/changed/same verdicts — the rebuild-validation
    query every backfill pipeline runs."""
    from hippollm_spark.operators.scd import snapshot_diff

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    return snapshot_diff(cust, q_merge_changes(spark, sf_dir), "c_custkey")


def q_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α=1/4) of event values, final level — exact
    fixed-point sequential recurrence (sign-wrapped truncating steps);
    the oracle replays it with list_reduce over the same sorted list."""
    from hippollm_spark.operators.temporal import ewma_latest

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    return ewma_latest(ev, "value", by="user_id")


def q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-efficient batch assignment: documents bucketed into
    length deciles (percentile thresholds, no global sort), fixed-size
    batches numbered off within each bucket in (length, id) order."""
    from hippollm_spark.operators.sampling import length_batches

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return length_batches(docs, "n_chars", 32)


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling: 4 hash-drawn
    negatives per (query, positive) pair — map-side explode + md5,
    no join, rerun-identical."""
    from hippollm_spark.operators.sampling import negative_samples

    emb = _t(spark, sf_dir, "embeddings")
    # candidate count as a scalar subquery (one job instead of an eager
    # emb.count() + the sampling job; Catalyst's ReuseSubquery evaluates
    # the shared count once). Value-identical negatives.
    n = emb.agg(F.count("*").alias("__n__")).scalar()
    pairs = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.pmod(F.col("vec_id") + 1, n).alias("pos_id"),
    )
    return negative_samples(pairs, n, k=4)


def q_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: customers who ordered in 1996 but not in
    1997 (EXCEPT), customers active in both years (INTERSECT), and the
    counts — Spark plans these as left-anti / left-semi joins over the
    distinct key sets."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("y")
    )
    y94 = o.filter("y = 1996").select("o_custkey").distinct()
    y95 = o.filter("y = 1997").select("o_custkey").distinct()
    churned = y94.exceptAll(y95).withColumn("status", F.lit("churned"))
    retained = y94.intersect(y95).withColumn("status", F.lit("retained"))
    return churned.unionByName(retained).orderBy("status", "o_custkey")


def q_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position windows per event type: percent_rank and
    cume_dist of each event's value (event_id tie-break for a total
    order), plus the value's global rank — the remaining members of
    the window-function family (rank/dense_rank/row_number/ntile are
    covered elsewhere)."""
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum mix: score → percentile quartiles (no
    global sort) → per-bucket epoch replication (0.25x/1x/1.5x/2x,
    hash-selected fractional copies) — the composed, end-to-end
    oracle-checked training-mix pipeline."""
    from hippollm_spark.pipelines.curate import build_training_mix

    return build_training_mix(_t(spark, sf_dir, "documents"))


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering signal: mean −ln P of each
    document's token bigrams under the corpus's own add-one-smoothed
    bigram LM — two count passes + vocabulary-keyed joins; rounded
    terms summed as exact DECIMAL."""
    from hippollm_spark.operators.textstats import ngram_lm_score

    return ngram_lm_score(_t(spark, sf_dir, "documents"))


def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (4 Bellman-Ford rounds)
    from the probe entity over the co-occurrence graph, edge cost =
    10^6 div shared-fact-count (more evidence = cheaper hop) — exact
    BIGINT relaxations, hash-comparable fixpoint."""
    from hippollm_spark.operators.graph import bellman_ford

    pairs = _cooc_pairs(spark, sf_dir).select(
        "entity_a", "entity_b", F.expr("1000000 div weight").alias("w")
    )
    sym = pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst"), "w"
    ).union(
        pairs.select(
            F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"), "w"
        )
    )
    return bellman_ford(sym, [ENTITY_A], rounds=4).orderBy("dist", "vertex")


def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window outliers: each event z-scored against its own
    previous ≤10 observations per user (exact integer window sums;
    the current row is excluded from its own baseline)."""
    from hippollm_spark.operators.temporal import rolling_zscore

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    return rolling_zscore(
        ev, "value", by="user_id", lookback=10, min_obs=3, threshold=2.5
    ).select("event_id", "user_id", "value", "roll_n", "z", "is_anomaly")


def q_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1.3-epoch upsampling of the corpus: every doc
    once, plus an md5-hash-selected 30% a second time — map-side
    sequence explode, no shuffle; membership is f(id, salt) so
    appends never re-roll existing rows."""
    from hippollm_spark.operators.sampling import upsample

    return upsample(_t(spark, sf_dir, "documents"), 1.3).select(
        "doc_id", "lang", "copy_idx"
    )


def q_event_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-user modal event type (max count, min value
    tie-break — the built-in mode() leaves ties undefined, so it can
    never hash-match)."""
    from hippollm_spark.operators.stats import grouped_mode

    return grouped_mode(_events(spark, sf_dir), "event_type", "user_id")


def q_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition-drift monitor: Jensen-Shannon divergence of each
    source's language mix against the corpus-wide distribution —
    per-category terms rounded then summed as exact DECIMAL (a raw
    double sum's accumulation order is partition-dependent)."""
    from hippollm_spark.operators.stats import distribution_drift

    return distribution_drift(_t(spark, sf_dir, "documents"), "lang", "source")


def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling summary of the events table (row/null/exact
    distinct counts, typed min/max) — one aggregation pass, unpivoted
    to a row per column; the 100 TB variant swaps exact distincts for
    HLL sketches, same contract."""
    from hippollm_spark.operators.stats import profile_columns

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    return profile_columns(ev)


def q_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over a binary media column
    (synthesized deterministically from the documents: data =
    unhex(md5(lang:source)) — deliberately low-entropy so duplicate
    "images" actually exist, ~10-16 per (lang, source) group). The
    within-bucket pair blowup those groups cause is the realistic
    stress the banding shape must absorb. Exercises the
    real multimodal plumbing — BINARY column, banding join with the
    pigeonhole guarantee (hamming ≤ 3 < 4 bands ⇒ no pair lost),
    bit_count(xor) verify — with the container-fake hash, so the
    whole pipeline is oracle-checkable; the oracle runs the QUADRATIC
    form, which doubles as a cross-engine losslessness proof of the
    banding."""
    from hippollm_spark.operators.multimodal import phash_dup_pairs

    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.unhex(F.md5(F.concat_ws(":", "lang", "source"))).alias("data"),
    )
    return phash_dup_pairs(media, max_hamming=3).orderBy("media_a", "media_b")


def q_score_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency-up-to-ties value deciles per event type via
    percentile-boundary broadcast — the parallel alternative to the
    NTILE window (`quality_deciles`): the fact table is never
    globally sorted; assignment is a 9-comparison expression."""
    from hippollm_spark.operators.stats import threshold_buckets

    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    return threshold_buckets(ev, "value", 10, by="event_type")


def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open 'view' intervals per day (sweep-line over
    [ts, ts + floor(value×10) s) spans): unpivot to ±1 deltas, net per
    instant (map-side combinable — makes the prefix sum deterministic),
    running sum per day. The `by` grouping is what keeps the prefix
    sum parallel at 100 TB."""
    from hippollm_spark.operators.temporal import max_concurrency

    iv = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.date_trunc("day", "ts").alias("day"),
            F.col("ts").alias("start_ts"),
            F.expr(
                "timestampadd(SECOND, cast(floor(value * 10) as int), ts)"
            ).alias("end_ts"),
        )
    )
    return max_concurrency(iv, by="day").orderBy("day")


def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped closed-form OLS (value vs. day index per event type):
    ONE map-side-combinable aggregate carrying six exact DECIMAL
    sufficient statistics per group — shuffle volume independent of
    row count; the DuckDB oracle replays the identical decimal sums
    and double-precision normal equations."""
    from hippollm_spark.operators.stats import linear_fit

    # x is days since 2024-01-01, NOT the 1970 epoch: the small day
    # index keeps the normal-equation cancellation shallow, so the
    # decimal->double casts agree across engines to the last ulp (a
    # 19,000-day epoch index puts ~25 significant digits into the
    # scale-12 sums, past what a double can carry).
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("x"),
        F.col("value").alias("y"),
    )
    return linear_fit(ev, "x", "y", "event_type").orderBy("event_type")


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of three lineitem measures in one
    aggregation pass (k(k+3)/2 exact DECIMAL sums, unpivoted to long
    form) — the single-scan wide-agg shape that profiles feature
    redundancy without k² passes over 100 TB."""
    from hippollm_spark.operators.stats import correlation_matrix

    li = _t(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount"
    )
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    ).orderBy("col_a", "col_b")


def q_auc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day ROC-AUC of `value` predicting the purchase event via
    the Mann-Whitney rank-sum identity with exact integer midranks —
    one spillable window sort + one aggregate, never the O(P·N)
    positive×negative pair join."""
    from hippollm_spark.operators.stats import grouped_auc

    ev = _events(spark, sf_dir).select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
        "value",
    )
    return grouped_auc(
        ev, "value", F.col("event_type") == "purchase", "day"
    ).orderBy("day")


def q_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship over near-duplicate groups: exact-Jaccard pair
    graph → min-label closure → one golden row per group (longest doc
    wins, id tie-break) with group size — the MDM merge step after any
    dedup pass; one window over tiny groups, corpus never re-shuffles
    past the group join."""
    from hippollm_spark.operators.dedup import (
        dedup_canonicalize,
        golden_record,
        jaccard_dup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_dup_pairs(docs, threshold=0.5, n=3)
    assign = dedup_canonicalize(pairs)
    return (
        golden_record(docs, assign, rank_cols=[F.col("n_chars").desc()])
        .select("group_id", "doc_id", "source", "n_chars", "n_members")
        .orderBy("group_id")
    )


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the entity co-occurrence graph by iterative peeling
    (4 bounded rounds, confluent so deletion order is irrelevant) —
    the classic dense-subgraph extraction; each round is a degree
    count + two semi-joins on narrow keys."""
    from hippollm_spark.operators.graph import k_core

    pairs = _cooc_pairs(spark, sf_dir).select("entity_a", "entity_b")
    sym = pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    ).union(
        pairs.select(
            F.col("entity_b").alias("src"), F.col("entity_a").alias("dst")
        )
    )
    return k_core(sym, 3, rounds=4).orderBy("vertex")


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain curation verdicts (UT1/RefinedWeb-style source
    filter): exact e8-integer mean quality + doc count per source,
    keep = volume- and quality-floored — the tiny verdict table then
    broadcast-filters the corpus without shuffling it."""
    from hippollm_spark.pipelines.curate import domain_quality_stats

    return domain_quality_stats(
        _t(spark, sf_dir, "documents"), min_docs=10, min_mean_score=0.55
    ).orderBy("domain")


def q_pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA 64->8 projection, HASH-ORACLED: the mean + components were
    fit ONCE (tools/train_pq_pca_assets.py: pca_fit's moment-matrix
    pass + driver eigh at sf0.01 — the fit itself stays covered by the
    numpy-parity / partition-invariance tests) and persisted
    e6-quantized; this query applies the deployed transform
    proj[pc] = Σ_j (ve[j]−mean_e6[j])·comp_e6[pc][j] in exact BIGINT,
    so DuckDB replays it bit-for-bit from the same literals at any sf.
    One Arrow pass, no shuffle. Output unnested to scalar
    (vec_id, label, pc, proj_e12) rows — ARRAY columns break the
    driver's pandas canonicalizer (same pattern as emb_quantize)."""
    from hippollm_spark.operators.similarity import (
        load_pca_components_e6,
        pca_project_quantized,
    )

    emb = _t(spark, sf_dir, "embeddings")
    art = load_pca_components_e6()
    proj = pca_project_quantized(
        emb, art["mean_e6"], art["components_e6"]
    ).select("vec_id", "label", "proj_e12")
    return (
        proj.select(
            "vec_id", "label", F.posexplode("proj_e12").alias("pc", "proj_e12")
        )
        .orderBy("vec_id", "pc")
    )


def q_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Welch's t between the view and purchase arms on
    `value`: one aggregation pass of six exact DECIMAL sufficient
    statistics per day — the A/B readout whose shuffle volume is
    independent of event count."""
    from hippollm_spark.operators.stats import welch_t_test

    ev = _events(spark, sf_dir).select(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type", "value"
    )
    return welch_t_test(
        ev, "event_type", "value", "view", "purchase", by="day"
    ).orderBy("day")


def q_conversion_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day R-by-2 chi-square of arm (event type) vs conversion
    (value > 100): exact integer contingency cells, per-arm terms
    rounded then summed as exact DECIMAL (order-independent)."""
    from hippollm_spark.operators.stats import conversion_chi2

    ev = _events(spark, sf_dir).select(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type", "value"
    )
    return conversion_chi2(
        ev, "event_type", F.col("value") > 100, by="day"
    ).orderBy("day")


def q_chi2_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 language-distinctive terms by chi-square feature selection
    (presence-based 2x2 per term-language) — exact integer counts, a
    vocabulary-sized scored table, one per-label top-k window."""
    from hippollm_spark.operators.textstats import chi2_keywords

    return chi2_keywords(
        _t(spark, sf_dir, "documents"), "lang", k=5, min_df=2
    ).orderBy("label", "rank")


def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle (md5 salt|id order) with an
    explicit position column: rerun- and partitioning-stable; at scale
    the same key feeds repartitionByRange + sortWithinPartitions so
    shard-file concatenation IS the shuffled order (no global sort on
    one node)."""
    from hippollm_spark.operators.ranks import distributed_rank
    from hippollm_spark.operators.sampling import shuffle_key

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    out = docs.withColumn("shuffle_key", shuffle_key("doc_id"))
    return (
        distributed_rank(out, ["shuffle_key", "doc_id"], rank_col="pos")
        .select("doc_id", "shuffle_key", F.col("pos").cast("int").alias("pos"))
        .orderBy("pos")
    )


def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsampling of purchase values: one hash
    aggregate using MIN/MAX_BY over a (ts, id) struct — no window, no
    per-group sort; the shuffle carries one row per bar. Timestamp
    ties break on event_id for hash-grade determinism."""
    from hippollm_spark.operators.temporal import ohlc_bars

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    return ohlc_bars(
        ev, "ts", "value", bucket="hour", id_col="event_id"
    ).orderBy("bucket")


def q_ks_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day two-sample Kolmogorov-Smirnov D between view and
    purchase value distributions — the ECDF maximization runs entirely
    in integers (cumulative counts cross-multiplied), one distinct-
    value pre-aggregate + one window cumsum, no pairwise expansion."""
    from hippollm_spark.operators.stats import ks_test

    ev = _events(spark, sf_dir).select(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type", "value"
    )
    return ks_test(
        ev, "value", "event_type", "view", "purchase", by="day"
    ).orderBy("day")


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-user recency/frequency/monetary
    (exact DECIMAL sums) quantile-binned by deterministic NTILE with
    unique user tie-breaks — windows run over the users-sized
    aggregate, never the raw events."""
    from hippollm_spark.operators.behavior import rfm_segments

    return rfm_segments(_events(spark, sf_dir)).orderBy("user_id")


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of event value per event type — exact
    DECIMAL rank-weighted sums (tie-permutation invariant), one
    spillable sort + one aggregate; the inequality profile that flags
    domains/users dominating a corpus."""
    from hippollm_spark.operators.stats import gini

    ev = _events(spark, sf_dir).select("event_type", "value")
    return gini(ev, "value", "event_type").orderBy("event_type")


def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (scale = max|v|/127,
    floor(v/scale + 0.5)) unnested to (vec_id, pos, code) rows + the
    per-vector scale — pure codegen'd transform expressions at scan
    speed, 4x at-rest compression before any ANN stage; floor(x+0.5)
    keeps both engines on the identical IEEE path (Spark's round()
    decimal-string detour does not)."""
    from hippollm_spark.functions.vectors import quantize_int8

    # deterministic subset by PREDICATE, not limit(): an ORDER-less
    # LIMIT picks whichever partitions arrive first, which happened to
    # match the oracle's vec_id < 200 only while the input was a
    # single file in id order — the sf1 multi-file sweep broke it
    q = quantize_int8(
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    )
    return (
        q.select("vec_id", "q8_scale", F.posexplode("q8").alias("pos", "code"))
        .orderBy("vec_id", "pos")
    )


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + FK grade from three codegen'd
    regexp_count integers — scan-speed curation gate, no UDF, no
    shuffle."""
    from hippollm_spark.operators.textstats import readability_scores

    return readability_scores(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session flows (ordered event-type paths per 30-min
    session): one user-key shuffle serves sessionization AND ordered
    path assembly; paths truncate at 10 steps so the distinct-path
    domain stays bounded."""
    from hippollm_spark.operators.behavior import session_paths

    return session_paths(_events(spark, sf_dir), k=20).orderBy("rank")


def q_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Shannon entropy of the event-type mix (diversity /
    mode-collapse drift signal) — category-domain-sized shuffle,
    ln terms 6dp-rounded then DECIMAL-summed."""
    from hippollm_spark.operators.stats import entropy

    ev = _events(spark, sf_dir).select(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    )
    return entropy(ev, "event_type", "day").orderBy("day")


def q_doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (quote/subset detection the
    symmetric Jaccard join misses by construction): same lossless
    shared-shingle blocking, directed output, containment =
    inter/|inner|."""
    from hippollm_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, n=3
    ).orderBy("doc_inner", "doc_outer")


def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch linear attribution: event-time-bounded touch-to-
    conversion self-join per user (fanout = touches within the 60-min
    window, never full history); per-conversion credit is one exact
    division, channel rollup sums rounded credits as DECIMAL."""
    from hippollm_spark.operators.behavior import linear_attribution

    return linear_attribution(_events(spark, sf_dir))


def q_knn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label propagation (auto-labeling): majority label among 5
    exact-cosine neighbours per query with (count desc, label asc)
    tie-break — broadcast queries, one winner-rows label join, one
    two-stage argmax."""
    from hippollm_spark.operators.similarity import knn_classify

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return knn_classify(emb, queries, k=5).orderBy("query_id")


def q_lang_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's language mix vs the
    corpus — the conventional drift score (PSI > 0.25 = significant)
    beside the JS-divergence monitor; epsilon-floored ratios of exact
    integer counts, terms 6dp-rounded then DECIMAL-summed."""
    from hippollm_spark.operators.stats import psi_drift

    return psi_drift(
        _t(spark, sf_dir, "documents"), "lang", "source"
    ).orderBy("slice")


def q_bm25_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation closing the loop on the lexical stack:
    NDCG@20 of the BM25 ranking for {hash, join, vector} against
    term-coverage graded judgments (rel = #query terms present) —
    judgments join is a broadcast; IDCG windows over judgments only."""
    from hippollm_spark.operators.dedup import normalized_text
    from hippollm_spark.operators.ranking import bm25_topk, ndcg_at_k

    docs = _t(spark, sf_dir, "documents")
    terms = ["hash", "join", "vector"]
    res = bm25_topk(docs, terms, k=20)
    # unpartitioned window over a top-k result (k<=50 rows by
    # construction) — bounded input, single tiny partition is fine
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    results = res.select(
        F.lit(1).alias("query_id"),
        "doc_id",
        F.row_number().over(w).alias("rank"),
    )
    toks = docs.select(
        "doc_id",
        F.array_distinct(F.split(normalized_text("text"), " ")).alias("t"),
    )
    rel = toks.select(
        F.lit(1).alias("query_id"),
        "doc_id",
        F.size(
            F.array_intersect("t", F.array(*[F.lit(t) for t in terms]))
        ).alias("rel"),
    ).filter(F.col("rel") > 0)
    return ndcg_at_k(results, rel, k=20).orderBy("query_id")


def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the customer->supplier purchase graph (hubs = broad
    buyers, authorities = widely-bought-from suppliers) in exact
    scaled-integer arithmetic — 3 rounds, max-normalized; the DuckDB
    oracle unrolls the identical integer recurrence.

    The graph runs on INTEGER vertex ids (custkey·2 / suppkey·2+1 —
    the dictionary-encoding move every at-scale graph pipeline makes):
    the distinct, the per-round shuffles, and the broadcast state all
    key on 8-byte longs instead of ~8-char strings; the c…/s… names
    the oracle compares against are reconstructed over the tiny final
    vertex table only. Output is identical to the string-keyed build
    (the encoding is injective and the name map is applied before the
    ORDER BY)."""
    from hippollm_spark.operators.graph import hits

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    out = hits(e, iterations=3, pre_deduped=True)
    vname = F.when(
        F.col("vertex") % 2 == 0,
        F.concat(F.lit("c"), (F.col("vertex") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("vertex") - 1) / 2).cast("long").cast("string"))
    )
    return out.select(
        vname.alias("vertex"), "hub_scaled", "auth_scaled"
    ).orderBy("vertex")


def q_value_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM mean-shift score per event type — exact
    fixed-point prefix-sum statistic (max |S_t|) with the first
    attaining index as change location; one window pass, hash-grade
    across engines."""
    from hippollm_spark.operators.temporal import cusum_changepoint

    return cusum_changepoint(
        _events(spark, sf_dir), "value", by="event_type"
    ).orderBy("event_type")


def q_lang_source_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between language and source domain —
    the R×C chi-square generalization over two margin-table cross
    joins; per-cell terms 6dp-rounded then DECIMAL-summed."""
    from hippollm_spark.operators.stats import association_chi2

    return association_chi2(_t(spark, sf_dir, "documents"), "lang", "source")


def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU: rolling distinct actives via (user, day) dedup —
    the only row-sized shuffle — then constant-fanout range joins onto
    the broadcast day grid (HLL sketch swap documented for petabyte
    scale)."""
    from hippollm_spark.operators.behavior import active_users

    return active_users(_events(spark, sf_dir)).orderBy("day")


def q_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal indices of event value (bucket mean /
    overall mean, exact DECIMAL sums, overall derived from bucket sums
    — one aggregate, no second scan)."""
    from hippollm_spark.operators.temporal import seasonal_profile

    return seasonal_profile(
        _events(spark, sf_dir), "ts", "value", period="dow"
    ).orderBy("bucket")


def q_bm25_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-based eval of the BM25 ranking (recall/precision/MRR@20
    against term-coverage judgments) — single exact divisions of
    integer counts, the ungraded companion to `bm25_ndcg`."""
    from hippollm_spark.operators.dedup import normalized_text
    from hippollm_spark.operators.ranking import bm25_topk, retrieval_metrics

    docs = _t(spark, sf_dir, "documents")
    terms = ["hash", "join", "vector"]
    res = bm25_topk(docs, terms, k=20)
    # unpartitioned window over a top-k result (k<=50 rows by
    # construction) — bounded input, single tiny partition is fine
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    results = res.select(
        F.lit(1).alias("query_id"),
        "doc_id",
        F.row_number().over(w).alias("rank"),
    )
    toks = docs.select(
        "doc_id",
        F.array_distinct(F.split(normalized_text("text"), " ")).alias("t"),
    )
    rel = toks.select(
        F.lit(1).alias("query_id"),
        "doc_id",
        F.size(
            F.array_intersect("t", F.array(*[F.lit(t) for t in terms]))
        ).alias("rel"),
    ).filter(F.col("rel") > 0)
    return retrieval_metrics(results, rel, k=20).orderBy("query_id")


def q_value_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit chi-square per event type (fabricated-
    numbers screen) — decimal-canonical digit extraction, exact
    counts, rounded terms DECIMAL-summed."""
    from hippollm_spark.operators.stats import benford_test

    return benford_test(
        _events(spark, sf_dir), "value", by="event_type"
    ).orderBy("event_type")


def q_corpus_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3:1:1:1 language interleave of the corpus into a
    single training order — exact-rational position keys (rank·LCM/w),
    salted md5 rank inside each corpus; rerun- and
    partitioning-identical."""
    from hippollm_spark.operators.sampling import interleave_corpora

    docs = _t(spark, sf_dir, "documents")
    out = interleave_corpora(
        docs, "lang", {"en": 3, "de": 1, "fr": 1, "es": 1}
    )
    return out.select("doc_id", "lang", "mix_rank", "mix_key").orderBy(
        "mix_key", "lang", "mix_rank"
    )


def q_value_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of event values per type — one
    lag-window pass, exact DECIMAL sufficient statistics per (key,
    lag), the `linear_fit` recipe applied to the series' own past."""
    from hippollm_spark.operators.temporal import autocorrelation

    return autocorrelation(
        _events(spark, sf_dir), "value", [1, 7], by="event_type"
    ).orderBy("event_type", "lag")


def q_graph_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform random walks over the entity
    co-occurrence graph (1 walk x 3 steps per vertex) — the node2vec/
    DeepWalk corpus generator with an md5 picker, so the DuckDB
    oracle unrolls the identical walk step by step."""
    from hippollm_spark.operators.graph import random_walks

    pairs = _cooc_pairs(spark, sf_dir).select("entity_a", "entity_b")
    sym = pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    ).union(
        pairs.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
    )
    return random_walks(sym, walks_per_vertex=1, walk_length=3).orderBy(
        "walk_id", "step"
    )


def q_privacy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the customer table under
    the (nation, segment) quasi-identifier with account-balance sign
    as the sensitive value — one exact hash aggregate, the
    release-gate report."""
    from hippollm_spark.operators.stats import privacy_risk

    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_sign", F.when(F.col("c_acctbal") < 0, "neg").otherwise("pos")
    )
    return privacy_risk(
        cust, ["c_nationkey", "c_mktsegment"], "bal_sign", k=5, l=2
    ).orderBy("c_nationkey", "c_mktsegment")


def q_ppmi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free distributional word vectors: PPMI over +/-2-window
    co-occurrences of the top-50 vocabulary — map-side offset explode
    + one (doc, pos) equi-join, exact integer counts; rows feed
    `ppmi_vectors` and then PCA for SVD-style embeddings."""
    from hippollm_spark.operators.textstats import ppmi_pairs

    return ppmi_pairs(
        _t(spark, sf_dir, "documents"), vocab_size=50, window=2
    ).orderBy("term_a", "term_b")


def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact ranking of documents by (length DESC, doc_id) via
    ranks.distributed_rank — range-partitioned parallel sort +
    broadcast partition offsets, never an unpartitioned row_number
    window; output identical to the window form."""
    from hippollm_spark.operators.ranks import distributed_rank

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    return distributed_rank(
        docs, [-F.col("n_chars"), F.col("doc_id")], rank_col="rank"
    ).orderBy("rank")


def q_prefix_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact running revenue over the full event order via
    ranks.distributed_prefix_sum — the windowless batch prefix sum
    (range exchange + broadcast partial-sum offsets), sampled at every
    500th position to keep the checkable output bounded. Values are
    e6-quantized BIGINTs, so the running total is engine-exact."""
    from hippollm_spark.operators.ranks import distributed_prefix_sum

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "ts",
            "event_id",
            F.round(F.col("value") * 1_000_000).cast("long").alias("value_e6"),
        )
    )
    out = distributed_prefix_sum(
        ev,
        "value_e6",
        ["ts", "event_id"],
        sum_col="running_e6",
        rank_col="pos",
    )
    return (
        out.filter(F.col("pos") % 500 == 0)
        .select("pos", "ts", "event_id", "value_e6", "running_e6")
        .orderBy("pos")
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational ingest-dedup loop, end to end: persist the LSH
    index over the corpus (doc_id < 400), then dedup the arriving
    batch (doc_id ≥ 400) against it — batch-sized banding work only,
    the bucketed index never re-shingles. md5 shingle hash makes every
    stage DuckDB-replayable: the oracle recomputes the union LSH and
    keeps pairs whose newer side is in the batch."""
    from hippollm_spark.operators.dedup import (
        incremental_dedup,
        save_dedup_index,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    # Physical sizing only (results are bucket-count-invariant): 8
    # buckets/partitions for a hundreds-of-docs demo corpus — the
    # default 64 is the 100-TB shape and costs 64-task shuffles per
    # write here (measured 2x the whole query).
    save_dedup_index(
        spark, corpus, "dd_contract_idx", shingle_hash="md5",
        n_buckets=8, partitions=8,
    )
    return incremental_dedup(
        spark, batch, "dd_contract_idx", threshold=0.5, shingle_hash="md5",
        partitions=8,
    ).orderBy("doc_id", "dup_of")


def q_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining over a synthetic two-language split
    (even vec_ids = source, odd = target): nearest target per source
    scored by the ratio margin (cos / avg of both sides' mean top-4
    cosines) — hubness-corrected parallel-pair mining."""
    from hippollm_spark.operators.similarity import bitext_margin_pairs

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    return bitext_margin_pairs(src, tgt, k=4).orderBy("src_id")


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping (the web-corpus step that stops one hot domain
    from dominating the mix): keep a deterministic uniform sample of
    at most 50 docs per source, selected by salted-hash order via the
    group-keyed distributed rank — hot domains sort across many
    tasks, never one window."""
    from hippollm_spark.operators.sampling import cap_per_group

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(docs, "source", 50).orderBy("source", "cap_rank")


def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming module's tumbling-window aggregation driven in
    batch mode (streaming/events.py windowed_counts accepts static
    frames — identical plan minus the watermark): per-hour counts and
    exact-DECIMAL value sums per event type."""
    from hippollm_spark.streaming.events import windowed_counts

    return windowed_counts(_events(spark, sf_dir), "1 hour").orderBy(
        "window_start", "event_type"
    )


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-native session_window sessionization in batch mode:
    sessions merge while consecutive gaps are < 30 min; session_end =
    last event + gap (session_window's definition — note the boundary
    differs from the batch lag+cumsum twin, which starts a new session
    only when gap > 30 min)."""
    from hippollm_spark.streaming.events import sessionize

    return sessionize(_events(spark, sf_dir), "30 minutes").orderBy(
        "user_id", "session_start"
    )


def q_stream_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream attribution join in batch mode: every
    (click, purchase) pair of the same user within one hour, with the
    exact µs delay — the time-bounded join whose event-time condition
    is what lets streaming state expire."""
    from hippollm_spark.streaming.events import click_purchase_join

    ev = _events(spark, sf_dir)
    out = click_purchase_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        within="1 hour",
    )
    return out.orderBy("user_id", "click_id", "purchase_id")


def q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document FFD bin packing per language shard (the
    no-straddle packing for SFT-style samples). Greedy-sequential per
    shard → genuinely non-SQL-expressible, so this entry is rows-only
    (like ann_pq_topk); pytest pins the invariants (budget respected,
    deterministic under repartition, oversized isolation)."""
    from hippollm_spark.operators.sampling import pack_bins_ffd

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.length("text") / 4).cast("long").alias("n_tokens"),
    )
    return pack_bins_ffd(docs, budget=2048).orderBy("lang", "bin_id", "doc_id")


def q_uniform_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-100 deterministic uniform document sample (smallest
    salted md5 ranks) — TakeOrderedAndProject, per-partition heaps,
    no global sort; the exact-k counterpart of the windowless
    threshold samplers."""
    from hippollm_spark.operators.sampling import uniform_sample_k

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return uniform_sample_k(docs, 100).orderBy("sample_key")


def q_trimmed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% trimmed mean of event value per type — the robust location
    estimate (tail outliers ignored, interior kept). Boundaries are
    exact interpolated percentiles; survivors sum as exact DECIMAL;
    the quotient floors at 6dp (the boundary-stable convention)."""
    from hippollm_spark.operators.stats import trimmed_mean

    return trimmed_mean(
        _events(spark, sf_dir), "value", "event_type", trim=0.1
    ).orderBy("event_type")


# ===========================================================================
# Driver contract
# ===========================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hybrid filtered vector search (the reference's core
    query pattern — storage.py:304-337) at sf0.001."""
    return q_v4_filtered_knn(spark, SF1)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
    # Ordered for the driver's 50-query-per-round checked prefix
    # (round 8): slots 0-14 = queries whose implementation, oracle, or
    # persisted artifact changed this round (emb_dup_pairs rebuilt on
    # the exact-integer e6 predicate, both engines; fuzzy_name_pairs
    # oracle regrouped by distinct name; IVF-PQ artifact retrained at
    # nlist=128 with k-means++ seeding, nprobe rescaled, both IVF
    # queries; curate_corpus pin/guard rework behind both curation
    # entries; the _loop_tuning/_bc gating rework behind every
    # iterative graph query). Slots 15-49 keep round 7's freshness
    # rotation. NOTE the full 183-query sweep (tools/check_oracle.py,
    # ~4 min) is the real per-round gate since r8 — this prefix is
    # only the driver's interface.
        "emb_dup_pairs": q_emb_dup_pairs,  # e6-exact predicate r8
        "fuzzy_name_pairs": q_fuzzy_name_pairs,  # grouped oracle r8
        "ann_ivfpq_topk": q_ann_ivfpq_topk,  # nlist=128 artifact r8
        "v3_knn_indexed": q_v3_knn_indexed,  # persisted-IVF serving r11
        "ann_ivfpq_rerank": q_ann_ivfpq_rerank,  # nlist=128 artifact r8
        "corpus_curation": q_corpus_curation,  # pin seal rework r8
        "corpus_curation_semantic": q_corpus_curation_semantic,  # r8
        "doc_containment": q_doc_containment,  # max_shingle_df warn r8
        "graph_hits": q_graph_hits,  # _bc vertex-count gating r8
        "lpa_communities": q_lpa_communities,  # _bc vertex-count gating r8
        "graph_bfs": q_graph_bfs,  # frontier-size gating r8
        "graph_sssp": q_graph_sssp,  # 2x-edge dist bound r8
        "graph_components": q_graph_components,  # _loop_tuning refcount r8
        "graph_components_star": q_graph_components_star,  # 2x-edge bound r8
        "graph_pagerank": q_graph_pagerank,  # _loop_tuning refcount r8
        "graph_kcore": q_graph_kcore,  # _loop_tuning refcount r8
    # --- round-7 rotation rows (fresh as of r7) ---
        "kmeans_clusters": q_kmeans_clusters,  # shared-fit memo r7
        "semantic_dedup": q_semantic_dedup,  # struct-min keeper r7
        "semantic_prune": q_semantic_prune,  # struct-min keeper r7
        "cluster_sample": q_cluster_sample,  # cap_per_group draw r7
        "phash_pairs": q_phash_pairs,  # phash small-dim resample r7
    # --- freshness refreshes ---
        "tpch_q22": q_tpch_q22,
        "tpch_q2": q_tpch_q2,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q16": q_tpch_q16,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "tpch_rollup": q_tpch_rollup,
        "colocated_join": q_colocated_join,  # r9: bucketed fact-fact join
        "colocated_q18": q_colocated_q18,  # r10: exchange-free agg+join
        "window_topk": q_window_topk,
        "quantiles": q_quantiles,
        "asof_join": q_asof_join,
        "approx_stats": q_approx_stats,
        "zorder_key": q_zorder_key,
        "p1_entity_lookup": q_p1_entity_lookup,
        "p2_fact_lookup": q_p2_fact_lookup,
        "p4_union": q_p4_union,
        "p5_intersection": q_p5_intersection,
        "p6_lone_entities": q_p6_lone_entities,
        "m1_upsert_guard": q_m1_upsert_guard,
        "g1_neighbours": q_g1_neighbours,
        "g3_cooccurrence": q_g3_cooccurrence,
        "v3_knn": q_v3_knn,
        "v4_filtered_knn": q_v4_filtered_knn,
        "v5_union_knn": q_v5_union_knn,
        "v6_intersection_knn": q_v6_intersection_knn,
    # --- r02-era rows, oldest first ---
        "emb_centroids": q_emb_centroids,
        "global_rank": q_global_rank,
        "prefix_revenue": q_prefix_revenue,
        "stream_windowed_counts": q_stream_windowed_counts,
        "stream_sessionize": q_stream_sessionize,
        "stream_click_join": q_stream_click_join,
        "boilerplate_removal": q_boilerplate_removal,
        "ingest_m1": q_ingest_m1,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "scrub_pii": q_scrub_pii,
        "text_tokens": q_text_tokens,
        "text_fingerprint": q_text_fingerprint,
        "split_naive": q_split_naive,
    # --- driver-verified more recently, outside the checked prefix ---
        "split_paragraphs": q_split_paragraphs,
        "ann_pq_topk": q_ann_pq_topk,
        "pca_embeddings": q_pca_embeddings,
        "graph_ppr": q_graph_ppr,
        "graph_pagerank_weighted": q_graph_pagerank_weighted,
        "mmr_rerank": q_mmr_rerank,
        "g2_explore": q_g2_explore,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_exact": q_dedup_exact,
        "graph_walks": q_graph_walks,
        "graph_triangles": q_graph_triangles,
        "contamination": q_contamination,
        "dup_spans": q_dup_spans,
        "dedup_groups": q_dedup_groups,
        "incremental_dedup": q_incremental_dedup,
        "golden_records": q_golden_records,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q4": q_tpch_q4,
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "tpch_q10": q_tpch_q10,
        "running_revenue": q_running_revenue,
        "tpch_q13": q_tpch_q13,
        "tpch_q14": q_tpch_q14,
        "tpch_q15": q_tpch_q15,
        "tpch_q17": q_tpch_q17,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "events_windowed": q_events_windowed,
        "gap_fill": q_gap_fill,
        "heavy_hitters": q_heavy_hitters,
        "events_funnel": q_events_funnel,
        "cohort_retention": q_cohort_retention,
        "value_histogram": q_value_histogram,
        "standardize": q_standardize,
        "events_enriched": q_events_enriched,
        "events_json_props": q_events_json_props,
        "sessionization": q_sessionization,
        "click_attribution": q_click_attribution,
        "events_pivot": q_events_pivot,
        "events_melt": q_events_melt,
        "revenue_delta": q_revenue_delta,
        "user_activity": q_user_activity,
        "top_ngrams": q_top_ngrams,
        "text_clean": q_text_clean,
        "text_repetition": q_text_repetition,
        "bm25_topk": q_bm25_topk,
        "hybrid_rrf": q_hybrid_rrf,
        "sales_cube": q_sales_cube,
        "winnow_pairs": q_winnow_pairs,
        "tfidf_keywords": q_tfidf_keywords,
        "pmi_collocations": q_pmi_collocations,
        "classifier_score": q_classifier_score,
        "merge_changes": q_merge_changes,
        "winsorize_value": q_winsorize,
        "max_concurrency": q_max_concurrency,
        "entity_similarity": q_entity_similarity,
        "markov_transitions": q_markov_transitions,
        "basket_lift": q_basket_lift,
        "snapshot_diff": q_snapshot_diff,
        "score_buckets": q_score_buckets,
        "event_mode": q_event_mode,
        "lang_drift": q_lang_drift,
        "profile_events": q_profile_events,
        "epoch_upsample": q_epoch_upsample,
        "rolling_anomaly": q_rolling_anomaly,
        "lm_perplexity": q_lm_perplexity,
        "training_mix": q_training_mix,
        "value_ranks": q_value_ranks,
        "churned_customers": q_churned_customers,
        "length_batches": q_length_batches,
        "negative_samples": q_negative_samples,
        "ewma_value": q_ewma_value,
        "ols_trend": q_ols_trend,
        "corr_matrix": q_corr_matrix,
        "auc_score": q_auc_score,
        "domain_stats": q_domain_stats,
        "ab_welch": q_ab_welch,
        "conversion_chi2": q_conversion_chi2,
        "chi2_keywords": q_chi2_keywords,
        "global_shuffle": q_global_shuffle,
        "ohlc_hourly": q_ohlc_hourly,
        "ks_value": q_ks_value,
        "rfm_segments": q_rfm_segments,
        "revenue_gini": q_revenue_gini,
        "emb_quantize": q_emb_quantize,
        "readability": q_readability,
        "session_paths": q_session_paths,
        "type_entropy": q_type_entropy,
        "attribution_linear": q_attribution_linear,
        "knn_labels": q_knn_labels,
        "lang_psi": q_lang_psi,
        "bm25_ndcg": q_bm25_ndcg,
        "value_cusum": q_value_cusum,
        "lang_source_assoc": q_lang_source_assoc,
        "active_users": q_active_users,
        "dow_profile": q_dow_profile,
        "bm25_recall": q_bm25_recall,
        "value_benford": q_value_benford,
        "corpus_interleave": q_corpus_interleave,
        "value_acf": q_value_acf,
        "privacy_audit": q_privacy_audit,
        "ppmi_terms": q_ppmi_terms,
        "mad_outliers": q_mad_outliers,
        "quality_deciles": q_quality_deciles,
        "rolling_revenue_7d": q_rolling_revenue_7d,
        "weighted_sample": q_weighted_sample,
        "sample_stratified": q_sample_stratified,
        "pack_chunks": q_pack_chunks,
        "bitext_margin": q_bitext_margin,
        "trimmed_value": q_trimmed_value,
        "temperature_sample": q_temperature_sample,
        "uniform_sample_k": q_uniform_sample_k,
        "domain_cap": q_domain_cap,
        "hash_split": q_hash_split,
        "split_leakage": q_split_leakage,
        "pack_bins": q_pack_bins,
        "ann_cosine_topk": q_ann_cosine_topk,
    }


_NORM = r"lower(regexp_replace(trim(text), '\s+', ' ', 'g'))"


def _mmr_oracle_sql(k: int = 10, lam: int = 500_000, n_cand: int = 30, qid: int = 3) -> str:
    """DuckDB replica of q_mmr_rerank: the identical greedy chain
    unrolled into one (pick, max-sim-update) CTE pair per step —
    exact BIGINT arithmetic over the same 6dp-quantized relevance
    (two-stage round, mirroring topk_per_query's rounded score) and
    pairwise similarity (single-stage round, mirroring
    mmr_rerank_quantized); ties by ascending vec_id."""
    other = 1_000_000 - lam
    ctes = [
        f"""q AS MATERIALIZED (
            SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {qid}
        )""",
        """scored AS MATERIALIZED (
            SELECT e.vec_id, list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS raw,
                   e.embedding::DOUBLE[] AS v
            FROM embeddings e CROSS JOIN q
        )""",
        f"""cand AS MATERIALIZED (
            SELECT vec_id, CAST(round(round(raw, 6) * 1e6) AS BIGINT) AS rel, v
            FROM scored
            QUALIFY row_number() OVER (ORDER BY round(raw, 6) DESC, vec_id ASC) <= {n_cand}
        )""",
        """sims AS MATERIALIZED (
            SELECT a.vec_id AS sa, b.vec_id AS sb,
                   CAST(round(list_cosine_similarity(a.v, b.v) * 1e6) AS BIGINT) AS s
            FROM cand a JOIN cand b ON a.vec_id != b.vec_id
        )""",
        f"""p1 AS MATERIALIZED (
            SELECT vec_id, rel, CAST({lam} AS BIGINT) * rel AS sc
            FROM cand ORDER BY sc DESC, vec_id ASC LIMIT 1
        )""",
        """m1 AS MATERIALIZED (
            SELECT c.vec_id, c.rel, s.s AS ms
            FROM cand c JOIN sims s
              ON s.sa = c.vec_id AND s.sb = (SELECT vec_id FROM p1)
        )""",
    ]
    for i in range(2, k + 1):
        ctes.append(f"""p{i} AS MATERIALIZED (
            SELECT vec_id, rel, ms,
                   CAST({lam} AS BIGINT) * rel - CAST({other} AS BIGINT) * ms AS sc
            FROM m{i - 1} ORDER BY sc DESC, vec_id ASC LIMIT 1
        )""")
        if i < k:
            ctes.append(f"""m{i} AS MATERIALIZED (
                SELECT m.vec_id, m.rel, GREATEST(m.ms, s.s) AS ms
                FROM m{i - 1} m JOIN sims s
                  ON s.sa = m.vec_id AND s.sb = (SELECT vec_id FROM p{i})
                WHERE m.vec_id != (SELECT vec_id FROM p{i})
            )""")
    unions = ["SELECT 0 AS query_id, vec_id, 1 AS mmr_rank, sc AS mmr_score_e12 FROM p1"]
    for i in range(2, k + 1):
        unions.append(f"SELECT 0, vec_id, {i}, sc FROM p{i}")
    chain = ",\n        ".join(ctes)
    body = "\n        UNION ALL ".join(unions)
    return f"""
        WITH {chain}
        {body}
        ORDER BY mmr_rank
    """


def _pagerank_oracle_sql(
    iterations: int = 6,
    damping: int = 85,
    scale: int = 10**12,
    seeds: list[str] | None = None,
    weighted: bool = False,
) -> str:
    """DuckDB replica of q_graph_pagerank / q_graph_ppr /
    q_graph_pagerank_weighted: the same integer recurrence unrolled
    into one MATERIALIZED CTE per iteration (recursive CTEs forbid
    aggregation over the recursive reference, so unrolling is the
    portable form; MATERIALIZED because DuckDB re-inlines a plain CTE
    at every reference, turning the 6-round chain into exponential
    re-evaluation — the >80-min sf10 wall VERDICT r8 flagged; each
    round now evaluates once, like Spark's own per-round
    localCheckpoint). Every
    op is exact BIGINT arithmetic — floor division matches Spark's
    `div` on the all-positive domain. With ``seeds``, initial and
    teleport mass go only to the seed set (personalized PageRank);
    with ``weighted``, mass splits proportionally to the shared-fact
    edge weight."""
    if seeds is None:
        r0 = f"({scale} // (SELECT n FROM c))"
        init = f"({r0})::BIGINT"
        base = f"(({100 - damping} * {r0}) // 100)"
    else:
        slist = ", ".join(f"'{s}'" for s in sorted(set(seeds)))
        sids = f"(SELECT v FROM vid WHERE entity IN ({slist}))"
        r0 = f"({scale} // {len(set(seeds))})"
        init = f"(CASE WHEN vertex IN {sids} THEN {r0} ELSE 0 END)::BIGINT"
        base = f"(CASE WHEN v.vertex IN {sids} THEN ({100 - damping} * {r0}) // 100 ELSE 0 END)"
    ctes = [
        f"""pr0 AS MATERIALIZED (
            SELECT vertex, {init} AS rank_scaled FROM verts
        )"""
    ]
    # per-round shape: precompute the per-vertex rate (tiny — |verts|
    # rows) and lead the join with e. Materialized-CTE scans carry no
    # stats in DuckDB 1.0, and the original pr-first shape let the
    # optimizer hash-build on the |2E|-row edge table (observed as a
    # 50+ GB spill at sf10); this shape measured 43 s vs 65 s for
    # 3 rounds at sf3, identical sums.
    for i in range(1, iterations + 1):
        if weighted:
            inner = f"""
                SELECT e.dst, sum((r.rank_scaled * e.w) // r.outdeg) AS s
                FROM e JOIN (SELECT pr.vertex, pr.rank_scaled, d.outdeg
                             FROM pr{i - 1} pr JOIN deg d ON pr.vertex = d.src) r
                  ON e.src = r.vertex
                GROUP BY e.dst"""
        else:
            inner = f"""
                SELECT e.dst, sum(r.rate) AS s
                FROM e JOIN (SELECT pr.vertex, pr.rank_scaled // d.outdeg AS rate
                             FROM pr{i - 1} pr JOIN deg d ON pr.vertex = d.src) r
                  ON e.src = r.vertex
                GROUP BY e.dst"""
        ctes.append(f"""pr{i} AS MATERIALIZED (
            SELECT v.vertex,
                   ({base} + ({damping} * coalesce(s.s, 0)) // 100)::BIGINT
                       AS rank_scaled
            FROM verts v LEFT JOIN ({inner}
            ) s ON v.vertex = s.dst
        )""")
    chain = ",\n        ".join(ctes)
    # integer-keyed rounds (round 9): the sf10 string-keyed chain
    # OOM-killed the box — 240M (VARCHAR src, VARCHAR dst) edge rows
    # materialized next to a live JVM. row_number() OVER (ORDER BY
    # entity) is ORDER-PRESERVING, so int pairs (a.v < b.v) equal the
    # string pairs (a.entity < b.entity) as sets, the vertex set
    # (entities appearing in e) is unchanged, and every round's sums
    # are over identical groups — the final join maps ids back to
    # names. Values bit-identical; memory ~6x smaller.
    if weighted:
        pairs_sql = """
            SELECT a.v AS ea, b.v AS eb, count(*)::BIGINT AS w
            FROM edi a JOIN edi b
              ON a.fact_id = b.fact_id AND a.v < b.v
            GROUP BY 1, 2"""
        e_sql = """
            SELECT ea AS src, eb AS dst, w FROM pairs
            UNION ALL
            SELECT eb AS src, ea AS dst, w FROM pairs"""
        deg_sql = "SELECT src, sum(w)::BIGINT AS outdeg FROM e GROUP BY src"
    else:
        pairs_sql = """
            SELECT DISTINCT a.v AS ea, b.v AS eb
            FROM edi a JOIN edi b
              ON a.fact_id = b.fact_id AND a.v < b.v"""
        e_sql = """
            SELECT ea AS src, eb AS dst FROM pairs
            UNION
            SELECT eb AS src, ea AS dst FROM pairs"""
        deg_sql = "SELECT src, count(*) AS outdeg FROM e GROUP BY src"
    return f"""
        WITH ed AS MATERIALIZED ({_EDGES_SQL}),
        vid AS MATERIALIZED (
            SELECT entity, row_number() OVER (ORDER BY entity) AS v
            FROM (SELECT DISTINCT entity FROM ed)
        ),
        edi AS MATERIALIZED (
            SELECT ed.fact_id, vid.v FROM ed JOIN vid USING (entity)
        ),
        pairs AS MATERIALIZED ({pairs_sql}),
        e AS MATERIALIZED ({e_sql}),
        verts AS MATERIALIZED (SELECT DISTINCT src AS vertex FROM e),
        deg AS MATERIALIZED ({deg_sql}),
        c AS (SELECT count(*) AS n FROM verts),
        {chain}
        SELECT vid.entity AS vertex, rank_scaled
        FROM pr{iterations} p JOIN vid ON p.vertex = vid.v
        ORDER BY rank_scaled DESC, vertex ASC
    """


def _lpa_oracle_sql(iterations: int = 3) -> str:
    """DuckDB replica of q_lpa_communities: the deterministic
    (max count, min label) update unrolled one CTE per round (the same
    unrolling discipline as the PageRank oracle — recursive CTEs can't
    aggregate over the recursive reference)."""
    ctes = ["lp0 AS MATERIALIZED (SELECT vertex, vertex AS label FROM verts)"]
    for i in range(1, iterations + 1):
        ctes.append(f"""lp{i} AS MATERIALIZED (
            SELECT v.vertex, coalesce(p.new_label, v.label) AS label
            FROM lp{i - 1} v LEFT JOIN (
                SELECT dst, min(label) AS new_label FROM (
                    SELECT dst, label, cnt,
                           max(cnt) OVER (PARTITION BY dst) AS mx
                    FROM (SELECT e.dst, l.label, count(*) AS cnt
                          FROM e JOIN lp{i - 1} l ON e.src = l.vertex
                          GROUP BY e.dst, l.label)
                ) WHERE cnt = mx GROUP BY dst
            ) p ON v.vertex = p.dst
        )""")
    chain = ",\n        ".join(ctes)
    return f"""
        WITH ed AS MATERIALIZED ({_EDGES_SQL}),
        pairs AS MATERIALIZED (
            SELECT DISTINCT a.entity AS ea, b.entity AS eb
            FROM ed a JOIN ed b
              ON a.fact_id = b.fact_id AND a.entity < b.entity
        ),
        e AS MATERIALIZED (
            SELECT ea AS src, eb AS dst FROM pairs
            UNION
            SELECT eb AS src, ea AS dst FROM pairs
        ),
        verts AS MATERIALIZED (SELECT DISTINCT src AS vertex FROM e),
        {chain}
        SELECT vertex, label FROM lp{iterations} ORDER BY vertex
    """


def _kmeans_chain_sql(
    k: int, d: int, iterations: int, *, leading: bool = True
) -> tuple[str, str]:
    """Shared DuckDB replica of the fixed-point Lloyd recurrence
    (quantize → unrolled assignment+update CTE pair per round): returns
    (with_prefix, dist_expr) so q_kmeans_clusters and q_semantic_dedup
    compose their own final SELECT over the same exact-BIGINT chain.
    The means use the same sign-wrapped truncating division as the
    Spark side (on the positive domain DuckDB's `//` and Spark/python
    truncation agree, so wrapping negatives through abs removes the
    floor-vs-trunc divergence). ``leading=False`` omits the WITH
    keyword so the chain can be appended to an existing CTE block
    (the corpus_curation_semantic composition)."""
    dist = " + ".join(
        f"(v.ve[{j}] - c.ce[{j}]) * (v.ve[{j}] - c.ce[{j}])"
        for j in range(1, d + 1)
    )
    ctes = [
        f"""c0 AS MATERIALIZED (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
                   ve AS ce
            FROM v ORDER BY vec_id LIMIT {k}
        )"""
    ]
    for i in range(1, iterations + 1):
        prev = f"c{i - 1}"
        ctes.append(f"""a{i} AS MATERIALIZED (
            SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM (SELECT v.vec_id, c.cid, {dist} AS dist
                  FROM v CROSS JOIN {prev} c)
        )""")
        ctes.append(f"""m{i} AS MATERIALIZED (
            SELECT a.cid, dims.dim,
                   CAST(sum(v.ve[dims.dim]) AS BIGINT) AS s,
                   count(*) AS n
            FROM (SELECT vec_id, cid FROM a{i} WHERE rn = 1) a
            JOIN v USING (vec_id)
            CROSS JOIN (SELECT unnest(range(1, {d + 1})) AS dim) dims
            GROUP BY a.cid, dims.dim
        )""")
        ctes.append(f"""c{i} AS MATERIALIZED (
            SELECT c.cid,
                   coalesce(m.ce, c.ce) AS ce
            FROM {prev} c LEFT JOIN (
                SELECT cid,
                       list(CASE WHEN s >= 0 THEN s // n
                                 ELSE -((-s) // n) END ORDER BY dim) AS ce
                FROM m{i} GROUP BY cid
            ) m ON c.cid = m.cid
        )""")
    chain = ",\n        ".join(ctes)
    lead = "WITH " if leading else ""
    prefix = f"""
        {lead}v AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding::DOUBLE[],
                       x -> CAST(round(x * 1000000.0) AS BIGINT)) AS ve
            FROM embeddings
        ),
        {chain},
        assign_final AS MATERIALIZED (
            SELECT vec_id, cid, dist
            FROM (
                SELECT vec_id, cid, dist,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rn
                FROM (SELECT v.vec_id, c.cid, {dist} AS dist
                      FROM v CROSS JOIN c{iterations} c)
            )
            WHERE rn = 1
        )"""
    return prefix, dist


def _semantic_prune_oracle_sql(
    eps_e12: int, k: int = 8, d: int = 64, iterations: int = 3
) -> str:
    """DuckDB replica of q_semantic_prune: shared Lloyd chain → keeper
    per cluster → survivors = keeper OR distance-to-keeper > eps, the
    distance recomputed as the identical unrolled BIGINT sum over the
    two quantized-vector aliases."""
    prefix, _dist = _kmeans_chain_sql(k, d, iterations)
    distk = " + ".join(
        f"(va.ve[{j}] - vk.ve[{j}]) * (va.ve[{j}] - vk.ve[{j}])"
        for j in range(1, d + 1)
    )
    return f"""{prefix},
        keep AS (
            SELECT cid, vec_id AS keeper_id
            FROM (
                SELECT vec_id, cid, dist,
                       row_number() OVER (PARTITION BY cid
                                          ORDER BY dist, vec_id) AS krn
                FROM assign_final
            )
            WHERE krn = 1
        )
        SELECT a.vec_id,
               CAST(a.cid AS INT) AS cluster,
               {distk} AS dist_keeper_e12,
               CASE WHEN a.vec_id = kp.keeper_id THEN 1 ELSE 0 END AS is_keeper
        FROM assign_final a
        JOIN keep kp ON a.cid = kp.cid
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vk ON vk.vec_id = kp.keeper_id
        WHERE a.vec_id = kp.keeper_id OR {distk} > {int(eps_e12)}
        ORDER BY a.vec_id
    """


def _cluster_sample_oracle_sql(
    n_per_cluster: int, k: int = 8, d: int = 64, iterations: int = 3
) -> str:
    """DuckDB replica of q_cluster_sample: shared Lloyd chain → per
    cluster the n smallest salted-md5 keys (hex-string ordering is
    engine-independent, the uniform_sample_k discipline)."""
    prefix, _dist = _kmeans_chain_sql(k, d, iterations)
    return f"""{prefix}
        SELECT vec_id, CAST(cid AS INT) AS cluster, sample_key
        FROM (
            SELECT vec_id, cid,
                   md5('strat|' || vec_id::VARCHAR) AS sample_key,
                   row_number() OVER (
                       PARTITION BY cid
                       ORDER BY md5('strat|' || vec_id::VARCHAR), vec_id
                   ) AS rn
            FROM assign_final
        )
        WHERE rn <= {int(n_per_cluster)}
        ORDER BY cluster, sample_key
    """


def _kmeans_oracle_sql(k: int = 8, d: int = 64, iterations: int = 3) -> str:
    """DuckDB replica of q_kmeans_clusters: the shared Lloyd chain's
    final assignment, one row per vector."""
    prefix, _dist = _kmeans_chain_sql(k, d, iterations)
    return f"""{prefix}
        SELECT vec_id, CAST(cid AS INT) AS cluster, dist AS dist_e12
        FROM assign_final
        ORDER BY vec_id
    """


def _semantic_dedup_oracle_sql(
    k: int = 8, d: int = 64, iterations: int = 3
) -> str:
    """DuckDB replica of q_semantic_dedup: the shared Lloyd chain's
    final assignment reduced to one keeper per cluster — smallest
    (dist, vec_id) — with the member count carried alongside. Every
    quantity is exact BIGINT, so the row set hash-matches Spark."""
    prefix, _dist = _kmeans_chain_sql(k, d, iterations)
    return f"""{prefix}
        SELECT CAST(cid AS INT) AS cluster,
               vec_id AS keeper_id,
               n_members,
               dist AS dist_e12
        FROM (
            SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY cid
                                      ORDER BY dist, vec_id) AS krn,
                   count(*) OVER (PARTITION BY cid) AS n_members
            FROM assign_final
        )
        WHERE krn = 1
        ORDER BY cluster
    """


def _pq_oracle_sql() -> str:
    """DuckDB replica of q_ann_pq_topk: the SAME persisted e6 codebooks
    (hippollm_spark/assets/pq_codebooks_e6.json) inlined as VALUES
    literals; encode = per-(vector, subspace) exact-BIGINT argmin with
    (dist, cid) tie-break; ADC = LUT join + sum. Every step is integer,
    so the top-10 matches Spark bit-for-bit at any sf."""
    from hippollm_spark.operators.similarity import load_pq_codebooks_e6

    art = load_pq_codebooks_e6()
    dsub = art["dsub"]
    rows = []
    for j, book in enumerate(art["codebooks_e6"]):
        for cid, cent in enumerate(book):
            lst = ", ".join(str(int(x)) for x in cent)
            rows.append(f"({j}, {cid}, [{lst}]::BIGINT[])")
    vals = ",\n            ".join(rows)
    dist = " + ".join(
        f"(v.ve[cb.j * {dsub} + {t}] - cb.ce[{t}])"
        f" * (v.ve[cb.j * {dsub} + {t}] - cb.ce[{t}])"
        for t in range(1, dsub + 1)
    )
    qdist = " + ".join(
        f"(q.ve[cb.j * {dsub} + {t}] - cb.ce[{t}])"
        f" * (q.ve[cb.j * {dsub} + {t}] - cb.ce[{t}])"
        for t in range(1, dsub + 1)
    )
    return f"""
        WITH cb(j, cid, ce) AS (VALUES
            {vals}),
        v AS (
            SELECT vec_id,
                   list_transform(embedding::DOUBLE[],
                       x -> CAST(round(x * 1000000.0) AS BIGINT)) AS ve
            FROM embeddings
        ),
        q AS (SELECT ve FROM v WHERE vec_id = 3),
        enc AS (
            SELECT vec_id, j, cid,
                   row_number() OVER (PARTITION BY vec_id, j
                                      ORDER BY dist, cid) AS rn
            FROM (SELECT v.vec_id, cb.j, cb.cid, {dist} AS dist
                  FROM v CROSS JOIN cb)
        ),
        lut AS (
            SELECT cb.j, cb.cid, {qdist} AS d
            FROM cb CROSS JOIN q
        )
        SELECT e.vec_id, CAST(sum(l.d) AS BIGINT) AS dist_e12
        FROM (SELECT vec_id, j, cid FROM enc WHERE rn = 1) e
        JOIN lut l ON e.j = l.j AND e.cid = l.cid
        GROUP BY e.vec_id
        ORDER BY dist_e12, vec_id
        LIMIT 10
    """


def _emb_dup_oracle_sql(threshold: float = 0.35, d: int = 64) -> str:
    """DuckDB replica of q_emb_dup_pairs under the e6 integer
    discipline: same HALF_UP e6 quantization, exact BIGINT dot/norms
    (the fixed-width term expansion the IVF-PQ oracle uses — native
    vectorized arithmetic, no per-pair lambda), the threshold as the
    exact HUGEINT predicate 1e8·dot² ≥ t_e4²·na·nb, and the 6dp cos as
    floor(1e6·q + 0.5)/1e6 — every float op correctly rounded from
    exact integers in the same sequence the Spark block kernel uses,
    so the sf1 44M-row result digests identically (a float-only
    threshold diverged on 433 boundary pairs)."""
    t4sq = int(round(threshold * 10_000)) ** 2
    # UNNEST the vector into per-dimension columns once: the first cut
    # of this oracle computed the dot as a.ve[i]*b.ve[i] terms — 128
    # list_extract calls PER PAIR, ~1.6e11 extracts over the sf1
    # 1.25e9-pair grid (killed after 40 min). Flat column references
    # are direct vector reads; the same rewrite DuckDB's own columnar
    # model wants.
    cols = ",\n                   ".join(f"ve[{i}] AS v{i}" for i in range(1, d + 1))
    dot = " + ".join(f"a.v{i} * b.v{i}" for i in range(1, d + 1))
    # float prescreen (a strict SUPERSET of the exact predicate: the
    # (1 - 1e-9) under-bound can only admit extra boundary pairs, and
    # float error is ~1e-15 relative) keeps the HUGEINT arithmetic off
    # the 1.25e9-pair grid; the exact predicate then decides the ~44M
    # surviving rows — the same screen-then-verify split the Spark
    # block kernel uses.
    return f"""
        WITH e AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding::DOUBLE[],
                       x -> CAST(round(x * 1000000.0) AS BIGINT)) AS ve
            FROM embeddings
        ),
        n AS MATERIALIZED (
            SELECT vec_id,
                   list_sum(list_transform(ve, x -> x * x))::BIGINT AS nrm,
                   {cols}
            FROM e
        ),
        p AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ({dot})::BIGINT AS dot, a.nrm AS na, b.nrm AS nb
            FROM n a JOIN n b ON a.vec_id < b.vec_id
            WHERE a.nrm > 0 AND b.nrm > 0
        ),
        screened AS (
            SELECT * FROM p
            WHERE dot > 0
              AND 100000000.0 * (dot::DOUBLE * dot::DOUBLE)
                  >= {t4sq}.0 * (na::DOUBLE * nb::DOUBLE) * (1.0 - 1e-9)
        )
        SELECT id_a, id_b,
               floor(1000000.0 * (dot::DOUBLE /
                   sqrt((na::HUGEINT * nb::HUGEINT)::DOUBLE)) + 0.5)
                   / 1000000.0 AS cos
        FROM screened
        WHERE 100000000::HUGEINT * (dot::HUGEINT * dot::HUGEINT)
              >= {t4sq}::HUGEINT * (na::HUGEINT * nb::HUGEINT)
    """


def _ivfx_oracle_sql(nprobe: int = 32, k: int = 10) -> str:
    """DuckDB replica of q_v3_knn_indexed from the SAME persisted e6
    coarse centroids: exact-BIGINT list assignment per vector and
    probe selection (both with the (dist, list) tie-break), then the
    v3_knn exact float distance restricted to the probed lists. The
    index table itself never appears — the oracle re-derives the
    assignment from the frozen literals, which is precisely what makes
    the persisted index hash-checkable."""
    from hippollm_spark.operators.similarity import load_ivfpq_e6

    art = load_ivfpq_e6()
    d = art["dsub"] * art["m"]
    cent_rows = []
    for l, ce in enumerate(art["coarse_e6"]):
        lst = ", ".join(str(int(x)) for x in ce)
        cent_rows.append(f"({l}, [{lst}]::BIGINT[])")
    cent_vals = ",\n            ".join(cent_rows)
    qcdist = " + ".join(
        f"(q.ve[{i}] - cent.ce[{i}]) * (q.ve[{i}] - cent.ce[{i}])"
        for i in range(1, d + 1)
    )
    vcdist = " + ".join(
        f"(v.ve[{i}] - cent.ce[{i}]) * (v.ve[{i}] - cent.ce[{i}])"
        for i in range(1, d + 1)
    )
    qvec = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"
    return f"""
        WITH cent(l, ce) AS (VALUES
            {cent_vals}),
        v AS (
            SELECT vec_id, label, embedding,
                   list_transform(embedding::DOUBLE[],
                       x -> CAST(round(x * 1000000.0) AS BIGINT)) AS ve
            FROM embeddings
        ),
        q AS (SELECT ve FROM v WHERE vec_id = 0),
        probed AS (
            SELECT l FROM (
                SELECT cent.l,
                       row_number() OVER (ORDER BY {qcdist}, cent.l) AS rn
                FROM cent CROSS JOIN q
            ) WHERE rn <= {nprobe}
        ),
        assign AS (
            SELECT vec_id, l FROM (
                SELECT v.vec_id, cent.l,
                       row_number() OVER (PARTITION BY v.vec_id
                                          ORDER BY {vcdist}, cent.l) AS rn
                FROM v CROSS JOIN cent
            ) WHERE rn = 1
        )
        SELECT v.vec_id, v.label,
               round(list_distance(v.embedding::DOUBLE[], {qvec}), 6) AS distance
        FROM v
        JOIN assign a USING (vec_id)
        JOIN probed USING (l)
        ORDER BY list_distance(v.embedding::DOUBLE[], {qvec}) ASC, v.vec_id ASC
        LIMIT {k}
    """


def _ivfpq_oracle_sql(
    nprobe: int = 4, k: int = 10, rerank: int | None = None
) -> str:
    """DuckDB replica of q_ann_ivfpq_topk from the SAME persisted e6
    artifacts (hippollm_spark/assets/ivfpq_e6.json): coarse argmin per
    vector with (dist, list) tie-break, probe selection as a
    row_number over centroid distances to the query, residual PQ
    encode over only the probed lists' vectors, per-list LUT join.
    All exact BIGINT — bit-identical to the Spark scan at any sf.
    With ``rerank`` set, the ADC ranking becomes a rerank-deep
    shortlist whose rows are re-scored with the exact integer
    distance (IVFADC-R) — the q_ann_ivfpq_rerank twin."""
    from hippollm_spark.operators.similarity import load_ivfpq_e6

    art = load_ivfpq_e6()
    dsub, d = art["dsub"], art["dsub"] * art["m"]
    cent_rows = []
    for l, ce in enumerate(art["coarse_e6"]):
        lst = ", ".join(str(int(x)) for x in ce)
        cent_rows.append(f"({l}, [{lst}]::BIGINT[])")
    cent_vals = ",\n            ".join(cent_rows)
    cb_rows = []
    for j, book in enumerate(art["codebooks_e6"]):
        for cid, centv in enumerate(book):
            lst = ", ".join(str(int(x)) for x in centv)
            cb_rows.append(f"({j}, {cid}, [{lst}]::BIGINT[])")
    cb_vals = ",\n            ".join(cb_rows)
    qcdist = " + ".join(
        f"(q.ve[{i}] - cent.ce[{i}]) * (q.ve[{i}] - cent.ce[{i}])"
        for i in range(1, d + 1)
    )
    vcdist = " + ".join(
        f"(v.ve[{i}] - cent.ce[{i}]) * (v.ve[{i}] - cent.ce[{i}])"
        for i in range(1, d + 1)
    )
    rdist = " + ".join(
        f"((c.ve[cb.j * {dsub} + {t}] - c.centv[cb.j * {dsub} + {t}]) - cb.ce[{t}])"
        f" * ((c.ve[cb.j * {dsub} + {t}] - c.centv[cb.j * {dsub} + {t}]) - cb.ce[{t}])"
        for t in range(1, dsub + 1)
    )
    qrdist = " + ".join(
        f"((q.ve[cb.j * {dsub} + {t}] - cent.ce[cb.j * {dsub} + {t}]) - cb.ce[{t}])"
        f" * ((q.ve[cb.j * {dsub} + {t}] - cent.ce[cb.j * {dsub} + {t}]) - cb.ce[{t}])"
        for t in range(1, dsub + 1)
    )
    return f"""
        WITH cent(l, ce) AS (VALUES
            {cent_vals}),
        cb(j, cid, ce) AS (VALUES
            {cb_vals}),
        v AS (
            SELECT vec_id,
                   list_transform(embedding::DOUBLE[],
                       x -> CAST(round(x * 1000000.0) AS BIGINT)) AS ve
            FROM embeddings
        ),
        q AS (SELECT ve FROM v WHERE vec_id = 3),
        probed AS (
            SELECT l FROM (
                SELECT cent.l,
                       row_number() OVER (ORDER BY {qcdist}, cent.l) AS rn
                FROM cent CROSS JOIN q
            ) WHERE rn <= {nprobe}
        ),
        assign AS (
            SELECT vec_id, l FROM (
                SELECT v.vec_id, cent.l,
                       row_number() OVER (PARTITION BY v.vec_id
                                          ORDER BY {vcdist}, cent.l) AS rn
                FROM v CROSS JOIN cent
            ) WHERE rn = 1
        ),
        cand AS (
            SELECT v.vec_id, a.l, v.ve, cent.ce AS centv
            FROM v
            JOIN assign a USING (vec_id)
            JOIN probed USING (l)
            JOIN cent ON cent.l = a.l
        ),
        enc AS (
            SELECT vec_id, l, j, cid FROM (
                SELECT c.vec_id, c.l, cb.j, cb.cid,
                       row_number() OVER (PARTITION BY c.vec_id, cb.j
                                          ORDER BY {rdist}, cb.cid) AS rn
                FROM cand c CROSS JOIN cb
            ) WHERE rn = 1
        ),
        lut AS (
            SELECT p.l, cb.j, cb.cid, {qrdist} AS d
            FROM probed p
            JOIN cent ON cent.l = p.l
            CROSS JOIN cb CROSS JOIN q
        )
        SELECT e.vec_id, CAST(sum(lut.d) AS BIGINT) AS dist_e12
        FROM enc e
        JOIN lut ON lut.l = e.l AND lut.j = e.j AND lut.cid = e.cid
        GROUP BY e.vec_id
        ORDER BY dist_e12, vec_id
        LIMIT {k}
    """ if rerank is None else f"""
        WITH cent(l, ce) AS (VALUES
            {cent_vals}),
        cb(j, cid, ce) AS (VALUES
            {cb_vals}),
        v AS (
            SELECT vec_id,
                   list_transform(embedding::DOUBLE[],
                       x -> CAST(round(x * 1000000.0) AS BIGINT)) AS ve
            FROM embeddings
        ),
        q AS (SELECT ve FROM v WHERE vec_id = 3),
        probed AS (
            SELECT l FROM (
                SELECT cent.l,
                       row_number() OVER (ORDER BY {qcdist}, cent.l) AS rn
                FROM cent CROSS JOIN q
            ) WHERE rn <= {nprobe}
        ),
        assign AS (
            SELECT vec_id, l FROM (
                SELECT v.vec_id, cent.l,
                       row_number() OVER (PARTITION BY v.vec_id
                                          ORDER BY {vcdist}, cent.l) AS rn
                FROM v CROSS JOIN cent
            ) WHERE rn = 1
        ),
        cand AS (
            SELECT v.vec_id, a.l, v.ve, cent.ce AS centv
            FROM v
            JOIN assign a USING (vec_id)
            JOIN probed USING (l)
            JOIN cent ON cent.l = a.l
        ),
        enc AS (
            SELECT vec_id, l, j, cid FROM (
                SELECT c.vec_id, c.l, cb.j, cb.cid,
                       row_number() OVER (PARTITION BY c.vec_id, cb.j
                                          ORDER BY {rdist}, cb.cid) AS rn
                FROM cand c CROSS JOIN cb
            ) WHERE rn = 1
        ),
        lut AS (
            SELECT p.l, cb.j, cb.cid, {qrdist} AS d
            FROM probed p
            JOIN cent ON cent.l = p.l
            CROSS JOIN cb CROSS JOIN q
        ),
        short AS (
            SELECT e.vec_id, CAST(sum(lut.d) AS BIGINT) AS adc
            FROM enc e
            JOIN lut ON lut.l = e.l AND lut.j = e.j AND lut.cid = e.cid
            GROUP BY e.vec_id
            ORDER BY adc, vec_id
            LIMIT {int(rerank)}
        )
        SELECT s.vec_id,
               CAST({" + ".join(f"(va.ve[{i}] - q.ve[{i}]) * (va.ve[{i}] - q.ve[{i}])" for i in range(1, d + 1))} AS BIGINT) AS dist_e12
        FROM short s
        JOIN v va ON va.vec_id = s.vec_id
        CROSS JOIN q
        ORDER BY dist_e12, s.vec_id
        LIMIT {k}
    """


def _pca_oracle_sql() -> str:
    """DuckDB replica of q_pca_embeddings: the SAME persisted e6 mean +
    components (hippollm_spark/assets/pca_components_e6.json) inlined
    as literals; proj[pc] = Σ_j (ve[j]−mean[j])·comp[pc][j] in exact
    BIGINT — bit-identical to the Spark int64 matmul at any sf."""
    from hippollm_spark.operators.similarity import load_pca_components_e6

    art = load_pca_components_e6()
    mu = art["mean_e6"]
    rows = []
    for pc, comp in enumerate(art["components_e6"]):
        lst = ", ".join(str(int(x)) for x in comp)
        rows.append(f"({pc}, [{lst}]::BIGINT[])")
    vals = ",\n            ".join(rows)
    proj = " + ".join(
        f"(v.ve[{j + 1}] - ({int(mu[j])})) * c.ce[{j + 1}]"
        for j in range(len(mu))
    )
    return f"""
        WITH comp(pc, ce) AS (VALUES
            {vals}),
        v AS (
            SELECT vec_id, label,
                   list_transform(embedding::DOUBLE[],
                       x -> CAST(round(x * 1000000.0) AS BIGINT)) AS ve
            FROM embeddings
        )
        SELECT v.vec_id, v.label, CAST(c.pc AS INT) AS pc,
               CAST({proj} AS BIGINT) AS proj_e12
        FROM v CROSS JOIN comp c
        ORDER BY vec_id, pc
    """


def _sssp_oracle_sql(rounds: int = 4, seed: str = ENTITY_A) -> str:
    """DuckDB replica of q_graph_sssp: Bellman-Ford relaxations
    unrolled one CTE per round (min over previous-dists ∪ relaxed
    candidates ≡ the Spark full-outer + least). Exact BIGINT costs;
    `//` matches Spark `div` on the positive domain."""
    ctes = [f"d0 AS (SELECT '{seed}' AS vertex, 0::BIGINT AS dist)"]
    for i in range(1, rounds + 1):
        ctes.append(f"""d{i} AS (
            SELECT vertex, min(dist) AS dist FROM (
                SELECT vertex, dist FROM d{i - 1}
                UNION ALL
                SELECT e.dst AS vertex, d.dist + e.w AS dist
                FROM d{i - 1} d JOIN e ON e.src = d.vertex
            ) GROUP BY vertex
        )""")
    chain = ",\n        ".join(ctes)
    return f"""
        WITH ed AS MATERIALIZED ({_EDGES_SQL}),
        pairs AS MATERIALIZED (
            SELECT a.entity AS ea, b.entity AS eb, count(*)::BIGINT AS ww
            FROM ed a JOIN ed b
              ON a.fact_id = b.fact_id AND a.entity < b.entity
            GROUP BY 1, 2
        ),
        e AS MATERIALIZED (
            SELECT ea AS src, eb AS dst, 1000000 // ww AS w FROM pairs
            UNION ALL
            SELECT eb AS src, ea AS dst, 1000000 // ww AS w FROM pairs
        ),
        {chain}
        SELECT vertex, dist FROM d{rounds} ORDER BY dist, vertex
    """


def _zorder_oracle_sql(bits: int = 21) -> str:
    """DuckDB replica of q_zorder_key: identical bit interleave."""
    terms = " + ".join(
        f"(((l_partkey >> {i}) & 1) << {2 * i})"
        f" + (((l_suppkey >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    return f"""
        SELECT l_partkey, l_suppkey, ({terms})::BIGINT AS z
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        ORDER BY z
        LIMIT 100
    """


def _minhash_oracle_sql() -> str:
    """DuckDB replica of q_dedup_minhash: same seed-42 multiply-add
    permutations (inlined as literals), same md5 60-bit shingle hash,
    same 32 bands × 4 rows, same exact-Jaccard verification. HUGEINT
    arithmetic reproduces numpy's uint64 wraparound exactly
    ((h*a + b) mod 2^64; h < 2^60, a < 2^63 → product < 2^123)."""
    from hippollm_spark.operators.dedup import _minhash_params

    a, b = _minhash_params(128, seed=42)
    vals = ", ".join(
        f"({i}, {int(ai)}, {int(bi)})" for i, (ai, bi) in enumerate(zip(a, b))
    )
    return f"""
        {_SHINGLES},
        hs AS (
            SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
            FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
        ),
        perms(i, pa, pb) AS (VALUES {vals}),
        sigrows AS (
            SELECT doc_id, i,
                   min((h::HUGEINT * pa + pb) % 18446744073709551616) AS mv
            FROM hs CROSS JOIN perms
            GROUP BY 1, 2
        ),
        bands AS (
            SELECT doc_id, i // 4 AS band_idx, list(mv ORDER BY i) AS bv
            FROM sigrows GROUP BY 1, 2
        ),
        cands AS (
            SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM bands x JOIN bands y
              ON x.band_idx = y.band_idx AND x.bv = y.bv
             AND x.doc_id < y.doc_id
        ),
        sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh)
        SELECT doc_a, doc_b,
               round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                     / (sa.n + sb.n
                        - len(list_intersect(sa.shingles, sb.shingles))), 6)
                   AS jaccard
        FROM cands
        JOIN sized sa ON sa.doc_id = doc_a
        JOIN sized sb ON sb.doc_id = doc_b
        WHERE round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                    / (sa.n + sb.n
                       - len(list_intersect(sa.shingles, sb.shingles))), 6) >= 0.5
    """
_SHINGLES = f"""
    WITH w AS (
        SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                        ELSE [array_to_string(toks, ' ')] END
               ) AS shingles
        FROM w
    )
"""


BM25_ORACLE_BODY = f"""
            WITH dl AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks,
                       len(string_split({_NORM}, ' ')) AS dl
                FROM documents
            ),
            stats AS (SELECT count(*) AS n, sum(dl) AS sd FROM dl),
            tf AS (
                SELECT doc_id, dl, term, count(*) AS tf
                FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
                WHERE term IN ('hash', 'join', 'vector')
                GROUP BY doc_id, dl, term
            ),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term)
            SELECT doc_id,
                   round(sum(CAST(round(
                       round(ln((n - df + 0.5) / (df + 0.5) + 1.0), 6)
                       * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (sd / n))))
                   , 6) AS DECIMAL(38,10)))::DOUBLE, 6) AS score
            FROM tf JOIN dft USING (term) CROSS JOIN stats
            GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC
            LIMIT 20
        """


def _pct_boundary_cte(name: str, col: str, ps: list[float], src: str = "per_user") -> str:
    """One-row CTE with exact interpolated percentile boundaries
    ``{name}.b1..b{len(ps)}`` of ``src.col`` — the same
    v_lo + (v_hi − v_lo)·frac, pos = 1 + (n−1)·p arithmetic as
    `stats.global_percentile_values` / `exact_percentiles`, spelled
    op-for-op so DuckDB reproduces the Spark boundary bit-for-bit.
    (quantile_cont's internal interpolation can differ by an ulp
    exactly when a boundary lands ON a data value — recency/frequency
    are integers, so that is the common case, and a strict `>`
    comparison at the boundary would flip.)"""
    pos = [
        f"(1.0 + (n - 1) * CAST({p} AS DOUBLE))" for p in ps
    ]
    picks = ",\n                       ".join(
        f"max(CASE WHEN rn = CAST(floor({pos[i]}) AS BIGINT) THEN v END) AS lo{i + 1}, "
        f"max(CASE WHEN rn = CAST(floor({pos[i]}) AS BIGINT) + 1 THEN v END) AS hi{i + 1}, "
        f"any_value({pos[i]} - floor({pos[i]})) AS fr{i + 1}"
        for i in range(len(ps))
    )
    bexprs = ", ".join(
        f"lo{i + 1} + (coalesce(hi{i + 1}, lo{i + 1}) - lo{i + 1}) * fr{i + 1} AS b{i + 1}"
        for i in range(len(ps))
    )
    return f"""{name} AS (
                SELECT {bexprs} FROM (
                    SELECT {picks}
                    FROM (SELECT {col} AS v,
                                 row_number() OVER (ORDER BY {col}) AS rn,
                                 count(*) OVER () AS n
                          FROM {src} WHERE {col} IS NOT NULL)
                )
            )"""


_EVENTS_ALIASED = re.compile(r"FROM events(\s+(?:AS\s+)?(?P<a>[a-z]\w*))")
_EVENTS_BARE = re.compile(r"FROM events\b(?!\))")
_EVENTS_US = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)"


def _events_us_truncated(sql: str) -> str:
    """Rewrite every events-table reference in an oracle to read ts
    µs-TRUNCATED (``ts::TIMESTAMP`` — DuckDB truncates TIMESTAMP_NS
    exactly like Spark's parquet nanos read; verified empirically).

    Round 11, found by the sf3 full sweep: the raw parquet view hands
    DuckDB NANOSECOND timestamps, so any oracle that keys, dedups,
    arg_max-es, or tie-breaks on raw ts can diverge once the data
    contains two events equal at µs but distinct at ns (first
    collision appears at sf3 — gap_fill's per-(user_id, ts) dedup kept
    2 rows in DuckDB where Spark, which can never see sub-µs, kept 1).
    Spark's µs view is the CONTRACT (entry `_events`); this makes the
    oracle see the identical column everywhere instead of patching
    queries one collision at a time."""
    sql = _EVENTS_ALIASED.sub(lambda m: f"FROM {_EVENTS_US}{m.group(1)}", sql)
    return _EVENTS_BARE.sub(f"FROM {_EVENTS_US} events", sql)


def oracle_sql() -> dict[str, str]:
    qvec = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"
    en = "['the','and','of','to','in','is','that','with']"
    es = "['el','la','de','que','los','con','una','por']"
    fr = "['le','la','les','des','est','dans','une','pour']"
    de = "['der','die','das','und','ist','mit','ein','nicht']"
    # Shared CTE block replaying the curation pipeline through the
    # decontaminated `clean` survivor set — composed by BOTH
    # corpus_curation (packing tail over `clean`) and
    # corpus_curation_semantic (Lloyd chain + keeper-anchored
    # epsilon-prune between `clean` and the packing tail).
    curation_prefix = f"""
            WITH RECURSIVE base AS (
                SELECT doc_id, text, lang, length(text) AS n_chars,
                       string_split({_NORM}, ' ') AS toks,
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct
                FROM documents
            ),
            feat AS MATERIALIZED (
                SELECT doc_id, len(toks) AS n_tokens,
                       round(punct / greatest(n_chars, 1)::DOUBLE, 6) AS punct_ratio,
                       round(len(list_filter(toks, t -> list_contains({en}, t)))
                             / greatest(len(toks), 1)::DOUBLE, 6) AS stopword_ratio,
                       round(len(list_distinct(toks))
                             / greatest(len(toks), 1)::DOUBLE, 6) AS uniq_ratio
                FROM base
            ),
            score AS MATERIALIZED (
                SELECT doc_id, n_tokens,
                       (least(n_tokens * 10000, 1000000) * 25
                        + (1000000 - least(CAST(round(punct_ratio * 1000000) AS BIGINT) * 4, 1000000)) * 25
                        + least(CAST(round(stopword_ratio * 1000000) AS BIGINT) * 5, 1000000) * 20
                        + CAST(round(uniq_ratio * 1000000) AS BIGINT) * 30)::BIGINT AS q
                FROM feat
            ),
            lidh AS MATERIALIZED (
                SELECT doc_id,
                       len(list_filter(toks, x -> list_contains({de}, x))) AS h_de,
                       len(list_filter(toks, x -> list_contains({en}, x))) AS h_en,
                       len(list_filter(toks, x -> list_contains({es}, x))) AS h_es,
                       len(list_filter(toks, x -> list_contains({fr}, x))) AS h_fr
                FROM base
            ),
            lid AS MATERIALIZED (
                SELECT doc_id,
                       CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
                            WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                            WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                            WHEN h_es >= h_fr THEN 'es'
                            ELSE 'fr' END AS lang_pred
                FROM lidh
            ),
            keep AS MATERIALIZED (
                SELECT b.doc_id, b.text, b.lang, b.toks, l.lang_pred, s.n_tokens
                FROM base b
                JOIN score s ON s.doc_id = b.doc_id
                JOIN lid l ON l.doc_id = b.doc_id
                WHERE s.q >= 55000000 AND l.lang_pred != 'und'
            ),
            corpus AS (SELECT * FROM keep WHERE doc_id % 20 != 0),
            bench AS (SELECT * FROM keep WHERE doc_id % 20 = 0),
            edwin AS MATERIALIZED (
                SELECT min(doc_id) AS doc_id
                FROM (SELECT doc_id, md5({_NORM}) AS h FROM corpus)
                GROUP BY h
            ),
            surv1 AS (SELECT c.* FROM corpus c JOIN edwin USING (doc_id)),
            shs AS MATERIALIZED (
                SELECT doc_id,
                       list_distinct(
                           CASE WHEN len(toks) >= 3
                                THEN list_transform(range(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                                ELSE [array_to_string(toks, ' ')] END
                       ) AS shingles
                FROM surv1
            ),
            exs AS (SELECT doc_id, unnest(shingles) AS s FROM shs),
            szs AS (SELECT doc_id, len(shingles) AS n FROM shs),
            jp AS MATERIALIZED (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM exs a JOIN exs b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            jpairs AS MATERIALIZED (
                SELECT doc_a, doc_b FROM jp
                JOIN szs na ON na.doc_id = doc_a
                JOIN szs nb ON nb.doc_id = doc_b
                WHERE round(inter::DOUBLE / (na.n + nb.n - inter), 6) >= 0.5
            ),
            ee AS MATERIALIZED (
                SELECT doc_a AS a, doc_b AS b FROM jpairs
                UNION SELECT doc_b, doc_a FROM jpairs
            ),
            reach(a, b) AS (
                SELECT a, b FROM ee
                UNION
                SELECT r.a, e.b FROM reach r JOIN ee e ON r.b = e.a
            ),
            jdrops AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) < a),
            surv2 AS MATERIALIZED (
                SELECT * FROM surv1
                WHERE doc_id NOT IN (SELECT doc_id FROM jdrops)
            ),
            shb AS MATERIALIZED (
                SELECT doc_id,
                       list_distinct(
                           CASE WHEN len(toks) >= 3
                                THEN list_transform(range(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                                ELSE [array_to_string(toks, ' ')] END
                       ) AS shingles
                FROM bench
            ),
            exs2 AS MATERIALIZED (
                SELECT * FROM exs WHERE doc_id IN (SELECT doc_id FROM surv2)
            ),
            exb AS (SELECT doc_id AS bench_id, unnest(shingles) AS s FROM shb),
            szb AS (SELECT doc_id AS bench_id, len(shingles) AS n FROM shb),
            cp AS MATERIALIZED (
                SELECT e.doc_id AS corpus_id, b.bench_id, count(*) AS inter
                FROM exs2 e JOIN exb b USING (s) GROUP BY 1, 2
            ),
            conts AS MATERIALIZED (
                SELECT DISTINCT corpus_id AS doc_id FROM cp
                JOIN szs nc ON nc.doc_id = corpus_id
                JOIN szb nb ON nb.bench_id = cp.bench_id
                WHERE round(inter::DOUBLE / (nc.n + nb.n - inter), 6) >= 0.5
            ),
            clean AS MATERIALIZED (
                SELECT * FROM surv2
                WHERE doc_id NOT IN (SELECT doc_id FROM conts)
            )"""
    packing_tail = """,
            p AS (
                SELECT doc_id, lang, n_tokens,
                       coalesce(sum(n_tokens) OVER (
                           PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS st
                FROM {src}
            )
            SELECT lang, count(*) AS n_docs,
                   sum(n_tokens)::BIGINT AS n_tokens,
                   count(DISTINCT st // 2048)::BIGINT AS n_chunks
            FROM p GROUP BY 1 ORDER BY 1
        """
    chain_core, _ = _kmeans_chain_sql(8, 64, 3, leading=False)
    distk = " + ".join(
        f"(va.ve[{j}] - vk.ve[{j}]) * (va.ve[{j}] - vk.ve[{j}])"
        for j in range(1, 65)
    )
    semantic_ctes = f""",
            {chain_core},
            afc AS MATERIALIZED (
                SELECT a.* FROM assign_final a
                JOIN clean c ON a.vec_id = c.doc_id
            ),
            keepc AS MATERIALIZED (
                SELECT cid, vec_id AS keeper_id
                FROM (
                    SELECT vec_id, cid, dist,
                           row_number() OVER (PARTITION BY cid
                                              ORDER BY dist, vec_id) AS krn
                    FROM afc
                )
                WHERE krn = 1
            ),
            semsurv AS MATERIALIZED (
                SELECT a.vec_id AS doc_id
                FROM afc a
                JOIN keepc kp ON a.cid = kp.cid
                JOIN v va ON va.vec_id = a.vec_id
                JOIN v vk ON vk.vec_id = kp.keeper_id
                WHERE a.vec_id = kp.keeper_id OR {distk} > 1600000000000
            ),
            clean2 AS (
                SELECT * FROM clean
                WHERE doc_id IN (SELECT doc_id FROM semsurv)
            )"""
    out = {
        "trimmed_value": """
            WITH ranked AS (
                SELECT event_type, value,
                       row_number() OVER (PARTITION BY event_type
                            ORDER BY value) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM events WHERE value IS NOT NULL
            ),
            b AS (
                SELECT event_type,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.1 AS DOUBLE)) AS BIGINT) THEN value END) AS lo_l,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.1 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS lo_h,
                       any_value((1.0 + (n - 1) * CAST(0.1 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.1 AS DOUBLE))) AS lo_f,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.9 AS DOUBLE)) AS BIGINT) THEN value END) AS hi_l,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.9 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS hi_h,
                       any_value((1.0 + (n - 1) * CAST(0.9 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.9 AS DOUBLE))) AS hi_f
                FROM ranked GROUP BY event_type
            ),
            bb AS (
                SELECT event_type,
                       lo_l + (coalesce(lo_h, lo_l) - lo_l) * lo_f AS lob,
                       hi_l + (coalesce(hi_h, hi_l) - hi_l) * hi_f AS hib
                FROM b
            )
            SELECT e.event_type,
                   CAST(count(e.value) AS BIGINT) AS n_total,
                   CAST(sum(CASE WHEN e.value >= lob AND e.value <= hib
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   floor(sum(CASE WHEN e.value >= lob AND e.value <= hib
                             THEN CAST(e.value AS DECIMAL(18,6)) END)::DOUBLE
                         / sum(CASE WHEN e.value >= lob AND e.value <= hib
                               THEN 1 ELSE 0 END)
                         * 1000000) / 1000000 AS trimmed_mean
            FROM events e JOIN bb USING (event_type)
            GROUP BY e.event_type ORDER BY e.event_type
        """,
        "uniform_sample_k": """
            SELECT doc_id, lang,
                   md5('sample|' || doc_id::VARCHAR) AS sample_key
            FROM documents
            ORDER BY sample_key, doc_id
            LIMIT 100
        """,
        "stream_windowed_counts": """
            SELECT date_trunc('hour', ts) AS window_start,
                   date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 2)
                       AS sum_value
            FROM events GROUP BY 1, 2, 3
            ORDER BY window_start, event_type
        """,
        "stream_sessionize": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                    >= 1800000000
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sess AS (
                SELECT user_id, ts,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged
            )
            SELECT user_id, min(ts) AS session_start,
                   max(ts) + INTERVAL 30 MINUTE AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM sess GROUP BY user_id, sid
            ORDER BY user_id, session_start
        """,
        "stream_click_join": """
            WITH c AS (
                SELECT user_id, event_id AS click_id, ts AS click_ts
                FROM events WHERE event_type = 'click'
            ),
            p AS (
                SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
                FROM events WHERE event_type = 'purchase'
            )
            SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts,
                   epoch_us(purchase_ts) - epoch_us(click_ts) AS delay_us
            FROM c JOIN p ON c.user_id = p.user_id
             AND purchase_ts >= click_ts
             AND purchase_ts <= click_ts + INTERVAL 1 HOUR
            ORDER BY c.user_id, click_id, purchase_id
        """,
        "domain_cap": """
            WITH ranked AS (
                SELECT doc_id, source,
                       CAST(row_number() OVER (PARTITION BY source
                            ORDER BY md5('cap|' || doc_id::VARCHAR), doc_id)
                            AS INT) AS cap_rank
                FROM documents
            )
            SELECT doc_id, source, cap_rank FROM ranked
            WHERE cap_rank <= 50 ORDER BY source, cap_rank
        """,
        "bitext_margin": """
            WITH src AS (
                SELECT vec_id AS src_id, embedding::DOUBLE[] AS v
                FROM embeddings WHERE vec_id < 400 AND vec_id % 2 = 0
            ),
            tgt AS (
                SELECT vec_id AS tgt_id, embedding::DOUBLE[] AS v
                FROM embeddings WHERE vec_id < 400 AND vec_id % 2 = 1
            ),
            sc AS (
                SELECT src_id, tgt_id,
                       round(list_cosine_similarity(s.v, t.v), 6) AS score
                FROM src s CROSS JOIN tgt t
            ),
            rk AS (
                SELECT src_id, tgt_id, score,
                       row_number() OVER (PARTITION BY src_id
                            ORDER BY score DESC, tgt_id) AS rs,
                       row_number() OVER (PARTITION BY tgt_id
                            ORDER BY score DESC, src_id) AS rt
                FROM sc
            ),
            ms AS (
                SELECT src_id,
                       floor(sum(score::DECIMAL(18,6))::DOUBLE / count(*)
                             * 1000000) / 1000000 AS m
                FROM rk WHERE rs <= 4 GROUP BY src_id
            ),
            mt AS (
                SELECT tgt_id,
                       floor(sum(score::DECIMAL(18,6))::DOUBLE / count(*)
                             * 1000000) / 1000000 AS m
                FROM rk WHERE rt <= 4 GROUP BY tgt_id
            )
            SELECT b.src_id, b.tgt_id, b.score,
                   CASE WHEN (ms.m + mt.m) / 2.0 > 0 THEN
                        floor(b.score / ((ms.m + mt.m) / 2.0) * 1000000)
                        / 1000000 END
                       AS margin
            FROM (SELECT src_id, tgt_id, score FROM rk WHERE rs = 1) b
            JOIN ms USING (src_id) JOIN mt USING (tgt_id)
            ORDER BY src_id
        """,
        "incremental_dedup": f"""
            SELECT doc_b AS doc_id, doc_a AS dup_of, jaccard
            FROM ({_minhash_oracle_sql()})
            WHERE doc_b >= 400
            ORDER BY doc_id, dup_of
        """,
        "prefix_revenue": """
            WITH base AS (
                SELECT ts, event_id,
                       CAST(round(value * 1000000) AS BIGINT) AS value_e6
                FROM events WHERE value IS NOT NULL
            ),
            pref AS (
                SELECT ts, event_id, value_e6,
                       CAST(row_number() OVER (ORDER BY ts, event_id)
                            AS BIGINT) AS pos,
                       CAST(sum(value_e6) OVER (ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_e6
                FROM base
            )
            SELECT pos, ts, event_id, value_e6, running_e6
            FROM pref WHERE pos % 500 = 0 ORDER BY pos
        """,
        "global_rank": """
            SELECT doc_id, length(text) AS n_chars,
                   CAST(row_number() OVER (ORDER BY length(text) DESC, doc_id)
                        AS BIGINT) AS rank
            FROM documents ORDER BY rank
        """,
        "tpch_q1": """
            -- e6 fixed-point discipline: identical IEEE *1e6+0.5,
            -- floor, BIGINT; DuckDB sum(BIGINT) widens to HUGEINT
            -- (exact) = Spark's hi/lo-split long sums recombined
            SELECT l_returnflag, l_linestatus,
                   floor(sum(CAST(floor(l_quantity * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_qty,
                   floor(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_base_price,
                   floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_disc_price,
                   floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_charge,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "tpch_q3": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "tpch_q4": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
              )
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "tpch_q7": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "tpch_q8": """
            WITH base AS (
                SELECT year(o_orderdate) AS o_year,
                       CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT) AS vol,
                       n2.n_name AS supp_nation
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region ON n1.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
                WHERE r_name = 'ASIA'
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate < TIMESTAMP '1998-01-01'
            )
            SELECT o_year,
                   floor(coalesce(sum(CASE WHEN supp_nation = 'NATION_8' THEN vol END), 0)::DOUBLE
                         / sum(vol)::DOUBLE * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
            FROM base GROUP BY o_year ORDER BY o_year
        """,
        "tpch_q9": """
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   floor(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                                  - p_retailprice * l_quantity) * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_type = 'STANDARD'
            GROUP BY 1, 2
            ORDER BY nation, o_year DESC
        """,
        "running_revenue": """
            SELECT o_custkey, o_orderkey, o_orderdate,
                   floor((sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT)) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS running_total
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'MACHINERY')
        """,
        "tpch_q10": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "tpch_q13": """
            SELECT c_count, count(*) AS custdist
            FROM (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer
                LEFT JOIN orders ON c_custkey = o_custkey
                             AND o_orderpriority != '5-LOW'
                GROUP BY c_custkey
            )
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q14": """
            SELECT floor(
                100.0 * coalesce(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT) END), 0)::DOUBLE
                / sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT))::DOUBLE
                * 1000000.0 + 0.5) / 1000000.0 AS promo_revenue
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-09-01'
              AND l_shipdate < TIMESTAMP '1996-10-01'
        """,
        "tpch_q15": """
            WITH rev AS (
                SELECT l_suppkey,
                       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS total
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, floor(total::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total = (SELECT max(total) FROM rev)
            ORDER BY s_suppkey
        """,
        "tpch_q17": """
            WITH li AS (
                SELECT l.* FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey
                WHERE p.p_brand = 'Brand#1'
            ),
            pp AS (
                SELECT l_partkey,
                       sum(CAST(floor(l_quantity * 1000000.0 + 0.5) AS BIGINT)) AS sq,
                       count(*) AS n
                FROM li GROUP BY l_partkey
            )
            SELECT floor(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 7000000.0 * 100.0 + 0.5) / 100.0 AS avg_yearly,
                   count(*) AS n_rows
            FROM li JOIN pp USING (l_partkey)
            WHERE CAST(floor(l_quantity * 1000000.0 + 0.5) AS BIGINT) * 5 * n < sq
        """,
        "tpch_q18": """
            WITH big AS (
                SELECT l_orderkey,
                       sum(CAST(floor(l_quantity * 1000000.0 + 0.5) AS BIGINT)) AS sq
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(CAST(floor(l_quantity * 1000000.0 + 0.5) AS BIGINT)) > 300000000
            )
            SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                   floor(sq::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_qty
            FROM orders
            JOIN big ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 100
        """,
        "tpch_q19": """
            SELECT floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 16 AND 30 AND l_quantity BETWEEN 10 AND 30)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 31 AND 50 AND l_quantity BETWEEN 20 AND 40)
        """,
        "tpch_q22": """
            WITH pos AS (
                SELECT sum(CAST(floor(c_acctbal * 1000000.0 + 0.5) AS BIGINT)) AS s, count(*) AS n
                FROM customer WHERE c_acctbal > 0
            )
            SELECT c_nationkey AS cntrycode, count(*) AS numcust,
                   floor(sum(CAST(floor(c_acctbal * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS totacctbal
            FROM customer, pos
            WHERE CAST(floor(c_acctbal * 1000000.0 + 0.5) AS BIGINT)::HUGEINT * n > s
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01'
              )
            GROUP BY c_nationkey
            ORDER BY cntrycode
        """,
        "tpch_q2": """
            WITH partsupp AS (
                SELECT l_partkey, l_suppkey, min(l_extendedprice) AS ps_supplycost
                FROM lineitem GROUP BY l_partkey, l_suppkey
            ),
            snr AS (
                SELECT s_suppkey, s_name, s_acctbal, n_name
                FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE'
            ),
            cand AS (
                SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost,
                       min(ps_supplycost) OVER (PARTITION BY p_partkey) AS mn
                FROM partsupp
                JOIN part ON l_partkey = p_partkey
                JOIN snr ON l_suppkey = s_suppkey
                WHERE p_type = 'STANDARD' AND p_size <= 10
            )
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                   ps_supplycost AS supplycost
            FROM cand WHERE ps_supplycost = mn
            ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
            LIMIT 100
        """,
        "tpch_q11": """
            WITH per_part AS (
                SELECT l_partkey,
                       sum(CAST(floor(l_extendedprice * l_quantity * 1000000.0 + 0.5) AS BIGINT)) AS v
                FROM lineitem
                WHERE l_suppkey IN (
                    SELECT s_suppkey FROM supplier
                    JOIN nation ON s_nationkey = n_nationkey
                    WHERE n_name = 'NATION_1'
                )
                GROUP BY l_partkey
            )
            SELECT l_partkey AS ps_partkey, floor(v::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS value
            FROM per_part
            WHERE v * 1000 > (SELECT sum(v) FROM per_part)
            ORDER BY value DESC, ps_partkey ASC
        """,
        "tpch_q12": """
            SELECT l_linestatus,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END)::BIGINT AS low_line_count
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            GROUP BY l_linestatus
            ORDER BY l_linestatus
        """,
        "tpch_q16": """
            WITH partsupp AS (
                SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            )
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM partsupp
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand != 'Brand#1'
              AND p_type != 'PROMO'
              AND p_size IN (1, 4, 9, 16, 25, 36, 49)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "tpch_q20": """
            WITH pair AS (
                SELECT l_partkey, l_suppkey,
                       sum(CAST(floor(l_quantity * 1000000.0 + 0.5) AS BIGINT)) AS q
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                  AND l_partkey IN (
                      SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
                  )
                GROUP BY l_partkey, l_suppkey
            ),
            dominant AS (
                SELECT DISTINCT l_suppkey FROM (
                    SELECT l_suppkey, q,
                           sum(q) OVER (PARTITION BY l_partkey) AS tot
                    FROM pair
                ) WHERE q * 2 > tot
            )
            SELECT s_name, s_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
              AND s_suppkey IN (SELECT l_suppkey FROM dominant)
            ORDER BY s_name
        """,
        "tpch_q21": """
            WITH per_pair AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                           THEN 1 ELSE 0 END) AS late
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
                GROUP BY l_orderkey, l_suppkey
            ),
            culprit AS (
                SELECT l_suppkey FROM (
                    SELECT l_suppkey, late,
                           count(*) OVER (PARTITION BY l_orderkey) AS nsupp,
                           sum(late) OVER (PARTITION BY l_orderkey) AS nlate
                    FROM per_pair
                ) WHERE late = 1 AND nsupp > 1 AND nlate = 1
            )
            SELECT s_name, count(*) AS numwait
            FROM culprit
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_1'
            GROUP BY s_name
            ORDER BY numwait DESC, s_name ASC
            LIMIT 100
        """,
        "tpch_q5": """
            SELECT n_name,
                   floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
            GROUP BY n_name
            ORDER BY revenue DESC, n_name ASC
        """,
        "tpch_q6": """
            SELECT floor(sum(CAST(floor(l_extendedprice * l_discount * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "colocated_join": """
            -- layout-independent values: the bucketed co-located join
            -- must equal the plain join bit-for-bit
            SELECT o_orderpriority,
                   count(*) AS n_items,
                   floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "colocated_q18": """
            -- layout-independent values: the bucketed exchange-free
            -- plan must equal the plain q18 bit-for-bit
            WITH big AS (
                SELECT l_orderkey,
                       sum(CAST(floor(l_quantity * 1000000.0 + 0.5) AS BIGINT)) AS sq
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(CAST(floor(l_quantity * 1000000.0 + 0.5) AS BIGINT)) > 300000000
            )
            SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                   floor(sq::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_qty
            FROM orders
            JOIN big ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 100
        """,
        "tpch_rollup": """
            SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                   coalesce(l_linestatus, 'ALL') AS linestatus,
                   count(*) AS n_rows,
                   floor(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_price
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "window_topk": """
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
            FROM orders
            QUALIFY rank <= 3
        """,
        "quantiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                   round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
            FROM lineitem
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "asof_join": """
            WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
            c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
            SELECT p.event_id, p.user_id,
                   (SELECT c.event_id FROM c
                    WHERE c.user_id = p.user_id AND c.ts <= p.ts
                    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_event_id
            FROM p
        """,
        "g2_explore": f"""
            WITH edges AS ({_EDGES_SQL}),
            l1 AS (
                SELECT '{ENTITY_A}' AS src, e2.entity AS dst,
                       count(*) AS n_facts, 1 AS depth
                FROM edges e1 JOIN edges e2 ON e1.fact_id = e2.fact_id
                WHERE e1.entity = '{ENTITY_A}' AND e2.entity <> '{ENTITY_A}'
                GROUP BY e2.entity
            ),
            front AS (SELECT DISTINCT dst FROM l1),
            l2 AS (
                SELECT e1.entity AS src, e2.entity AS dst,
                       count(*) AS n_facts, 2 AS depth
                FROM edges e1
                JOIN front f ON e1.entity = f.dst
                JOIN edges e2 ON e1.fact_id = e2.fact_id
                WHERE e2.entity <> e1.entity
                GROUP BY e1.entity, e2.entity
            ),
            all_l AS (SELECT * FROM l1 UNION ALL SELECT * FROM l2)
            SELECT src, dst, n_facts, depth FROM (
                SELECT *, row_number() OVER (PARTITION BY src, dst ORDER BY depth) AS rk
                FROM all_l
            ) WHERE rk = 1
        """,
        "p1_entity_lookup": f"""
            SELECT p_partkey, p_name, p_brand, p_retailprice
            FROM part WHERE p_name = '{ENTITY_A}' ORDER BY p_partkey
        """,
        "p2_fact_lookup": """
            SELECT o_orderkey AS id, o_custkey, o_totalprice, o_orderstatus
            FROM orders WHERE o_orderkey = 7
        """,
        "p4_union": f"""
            WITH edges AS ({_EDGES_SQL})
            SELECT DISTINCT fact_id FROM edges
            WHERE entity IN ('{ENTITY_A}', '{ENTITY_B}')
        """,
        "p5_intersection": f"""
            WITH edges AS ({_EDGES_SQL})
            SELECT fact_id FROM edges
            WHERE entity IN ('{ENTITY_A}', '{ENTITY_B}')
            GROUP BY fact_id
            HAVING count(DISTINCT entity) = 2
        """,
        "p6_lone_entities": f"""
            WITH edges AS ({_EDGES_SQL})
            SELECT DISTINCT p_name FROM part
            WHERE p_name NOT IN (SELECT entity FROM edges)
        """,
        "m1_upsert_guard": """
            WITH existing AS (SELECT DISTINCT p_name AS name FROM part),
            newbatch AS (
                SELECT DISTINCT p_name AS name FROM part WHERE p_partkey < 100
                UNION
                SELECT s_name AS name FROM supplier
            )
            SELECT name FROM newbatch
            WHERE name NOT IN (SELECT name FROM existing)
        """,
        "g1_neighbours": f"""
            WITH edges AS ({_EDGES_SQL}),
            mine AS (SELECT DISTINCT fact_id FROM edges WHERE entity = '{ENTITY_A}')
            SELECT e.entity AS entity, count(*) AS n_facts,
                   min(e.fact_id) AS min_fact, max(e.fact_id) AS max_fact
            FROM edges e JOIN mine m ON e.fact_id = m.fact_id
            WHERE e.entity <> '{ENTITY_A}'
            GROUP BY e.entity
        """,
        "g3_cooccurrence": f"""
            WITH edges AS ({_EDGES_SQL})
            SELECT a.entity AS entity_a, b.entity AS entity_b,
                   count(*) AS weight, min(a.fact_id) AS min_fact
            FROM edges a JOIN edges b
              ON a.fact_id = b.fact_id AND a.entity < b.entity
            GROUP BY a.entity, b.entity
            HAVING count(*) >= 2
        """,
        "v3_knn": f"""
            SELECT vec_id, label,
                   round(list_distance(embedding::DOUBLE[], {qvec}), 6) AS distance
            FROM embeddings
            ORDER BY list_distance(embedding::DOUBLE[], {qvec}) ASC, vec_id ASC
            LIMIT 10
        """,
        "v4_filtered_knn": f"""
            SELECT vec_id, label,
                   round(list_distance(embedding::DOUBLE[], {qvec}), 6) AS distance
            FROM embeddings
            WHERE label IN (1, 2, 3)
            ORDER BY list_distance(embedding::DOUBLE[], {qvec}) ASC, vec_id ASC
            LIMIT 10
        """,
        "v5_union_knn": f"""
            WITH edges AS ({_EDGES_SQL}),
            cand AS (
                SELECT DISTINCT fact_id FROM edges
                WHERE entity IN ('{ENTITY_A}', '{ENTITY_B}')
            ),
            fv AS (
                SELECT c.fact_id, e.embedding FROM cand c
                JOIN embeddings e ON c.fact_id % 500 = e.vec_id
            ), n AS (SELECT count(*) AS c FROM cand)
            -- k > |candidates| (STRICT, reference storage.py:308-309):
            -- the whole set comes back UNRANKED -> distance NULL; LIMIT
            -- 5 is a no-op there (c < 5). At c == 5 the reference RANKS
            -- (real distances). n counts candidate ids (= len(ids) in
            -- the reference, = cands.count() in knn_facts_with_ids),
            -- not post-embedding-join rows.
            SELECT fact_id,
                   CASE WHEN (SELECT c FROM n) < 5 THEN NULL
                        ELSE round(list_distance(embedding::DOUBLE[], {qvec}), 6)
                   END AS distance
            FROM fv
            ORDER BY list_distance(embedding::DOUBLE[], {qvec}) ASC, fact_id ASC
            LIMIT 5
        """,
        "v6_intersection_knn": f"""
            WITH edges AS ({_EDGES_SQL}),
            cand AS (
                SELECT fact_id FROM edges
                WHERE entity IN ('{ENTITY_A}', '{ENTITY_B}')
                GROUP BY fact_id
                HAVING count(DISTINCT entity) = 2
            ),
            fv AS (
                SELECT c.fact_id, e.embedding FROM cand c
                JOIN embeddings e ON c.fact_id % 500 = e.vec_id
            ), n AS (SELECT count(*) AS c FROM cand)
            -- strict k > |cand| short-circuit; see v5_union_knn note
            SELECT fact_id,
                   CASE WHEN (SELECT c FROM n) < 5 THEN NULL
                        ELSE round(list_distance(embedding::DOUBLE[], {qvec}), 6)
                   END AS distance
            FROM fv
            ORDER BY list_distance(embedding::DOUBLE[], {qvec}) ASC, fact_id ASC
            LIMIT 5
        """,
        "mmr_rerank": _mmr_oracle_sql(),
        "ann_cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id < 3
            ),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS raw
                FROM embeddings e CROSS JOIN q
            )
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, vec_id ASC) AS INT) AS rank,
                   round(raw, 6) AS score
            FROM scored
            QUALIFY rank <= 5
            ORDER BY query_id, rank
        """,
        "emb_dup_pairs": _emb_dup_oracle_sql(0.35),
        "dedup_exact": f"""
            SELECT md5({_NORM}) AS text_hash, count(*) AS n_dups,
                   min(doc_id) AS min_doc_id
            FROM documents
            GROUP BY 1 HAVING count(*) > 1
        """,
        "dedup_jaccard": f"""
            {_SHINGLES},
            ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
            sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
            p AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(inter::DOUBLE / (na.n + nb.n - inter), 6) AS jaccard
            FROM p
            JOIN sizes na ON na.doc_id = doc_a
            JOIN sizes nb ON nb.doc_id = doc_b
            WHERE round(inter::DOUBLE / (na.n + nb.n - inter), 6) >= 0.5
        """,
        "dedup_minhash": _minhash_oracle_sql(),
        "dedup_groups": f"""
            {_SHINGLES.replace("WITH ", "WITH RECURSIVE ", 1)},
            ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
            sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
            p AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT doc_a, doc_b FROM p
                JOIN sizes na ON na.doc_id = doc_a
                JOIN sizes nb ON nb.doc_id = doc_b
                WHERE round(inter::DOUBLE / (na.n + nb.n - inter), 6) >= 0.5
            ),
            ee AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs
            ),
            reach(a, b) AS (
                SELECT a, b FROM ee
                UNION
                SELECT r.a, e.b FROM reach r JOIN ee e ON r.b = e.a
            )
            SELECT a AS doc_id, least(a, min(b)) AS canonical_id
            FROM reach GROUP BY a
            ORDER BY canonical_id, doc_id
        """,
        "boilerplate_removal": f"""
            WITH t AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
            ),
            segs AS (
                SELECT doc_id, i AS seg_idx,
                       array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS seg
                FROM t, unnest(range(0, cast(ceil(len(toks)/10.0) AS BIGINT))) AS u(i)
            ),
            hashed AS (SELECT doc_id, seg_idx, seg, md5(seg) AS h FROM segs),
            hot AS (
                SELECT h FROM hashed GROUP BY h
                HAVING count(DISTINCT doc_id) > 2
            ),
            kept AS (SELECT * FROM hashed WHERE h NOT IN (SELECT h FROM hot)),
            o AS (
                SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text
                FROM kept GROUP BY doc_id
            )
            SELECT doc_id, md5(text) AS clean_md5, length(text) AS n_chars
            FROM o ORDER BY doc_id
        """,
        "contamination": f"""
            {_SHINGLES},
            exc AS (
                SELECT doc_id AS corpus_id, unnest(shingles) AS s
                FROM sh WHERE doc_id % 20 != 0
            ),
            exb AS (
                SELECT doc_id AS bench_id, unnest(shingles) AS s
                FROM sh WHERE doc_id % 20 = 0
            ),
            p AS (
                SELECT corpus_id, bench_id, count(*) AS inter
                FROM exc JOIN exb USING (s) GROUP BY 1, 2
            ),
            sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)
            SELECT corpus_id, bench_id,
                   round(inter::DOUBLE / (nc.n + nb.n - inter), 6) AS jaccard
            FROM p
            JOIN sizes nc ON nc.doc_id = corpus_id
            JOIN sizes nb ON nb.doc_id = bench_id
            WHERE round(inter::DOUBLE / (nc.n + nb.n - inter), 6) >= 0.5
            ORDER BY corpus_id, bench_id
        """,
        "corpus_curation": curation_prefix + packing_tail.format(src="clean"),
        "corpus_curation_semantic": (
            curation_prefix + semantic_ctes + packing_tail.format(src="clean2")
        ),
        "ingest_m1": """
            WITH base AS (
                SELECT c_name AS name,
                       c_name || ' (' || c_mktsegment || ')' AS r,
                       c_custkey % 10 = 0 AS pre
                FROM customer
            ),
            vals AS (
                SELECT name,
                       ((list_reduce(
                           list_transform(range(1, 65),
                             j -> strpos('0123456789abcdef',
                                         substr(sha256(r || i::VARCHAR), j, 1)) - 1),
                           (acc, x) -> (acc * 16 + x) % 2001
                        ) - 1000) / 1000.0)::FLOAT::DOUBLE AS v, i
                FROM base, range(0, 384) t(i)
                WHERE NOT pre
            ),
            sums AS (
                SELECT name,
                       round(list_reduce(list(v ORDER BY i), (a, b) -> a + b), 6)
                           + 0.0 AS emb_sum
                FROM vals GROUP BY name
            )
            SELECT name, emb_sum FROM sums
            UNION ALL
            SELECT name, NULL FROM base WHERE pre
            ORDER BY name
        """,
        "emb_centroids": """
            SELECT label, pos - 1 AS pos,
                   round(sum(val::DECIMAL(38,10))::DOUBLE / count(*), 6) AS c
            FROM (
                SELECT label, unnest(embedding::DOUBLE[]) AS val,
                       generate_subscripts(embedding, 1) AS pos
                FROM embeddings
            )
            GROUP BY label, pos ORDER BY label, pos
        """,
        "split_leakage": f"""
            WITH s AS (
                SELECT md5({_NORM}) AS fp,
                       CASE WHEN b < 8000 THEN 'train'
                            WHEN b < 9000 THEN 'val'
                            ELSE 'test' END AS split
                FROM (
                    SELECT text,
                           ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 15))::BIGINT
                               % 10000 AS b
                    FROM documents
                )
            ),
            per_fp AS (
                SELECT fp,
                       max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
                       max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test,
                       count(*) AS n_docs
                FROM s GROUP BY fp
            )
            SELECT count(*) AS n_distinct_contents,
                   sum(CASE WHEN in_train = 1 AND in_test = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_leaked_contents,
                   sum(CASE WHEN in_train = 1 AND in_test = 1 THEN n_docs ELSE 0 END)::BIGINT
                       AS n_leaked_docs
            FROM per_fp
        """,
        "hash_split": """
            SELECT split, lang, count(*) AS n_docs FROM (
                SELECT lang,
                       CASE WHEN b < 8000 THEN 'train'
                            WHEN b < 9000 THEN 'val'
                            ELSE 'test' END AS split
                FROM (
                    SELECT lang,
                           ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 15))::BIGINT
                               % 10000 AS b
                    FROM documents
                )
            )
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "weighted_sample": """
            WITH r AS (
                SELECT doc_id, lang, n_chars,
                       ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS rh
                FROM documents
            ),
            k AS (
                SELECT doc_id, lang, n_chars,
                       round(-ln((rh + 1.0) / 1152921504606846976.0), 6)
                           / n_chars::DOUBLE AS key
                FROM r
            ),
            rk AS (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (PARTITION BY lang ORDER BY key, doc_id) AS rn
                FROM k
            )
            SELECT doc_id, lang, n_chars FROM rk WHERE rn <= 20
        """,
        "sample_stratified": """
            WITH r AS (
                SELECT doc_id, lang,
                       ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS rh
                FROM documents
            ),
            rk AS (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang ORDER BY rh, doc_id) AS k
                FROM r
            )
            SELECT doc_id, lang FROM rk WHERE k <= 25 ORDER BY lang, doc_id
        """,
        "temperature_sample": """
            WITH sizes AS (
                SELECT lang, count(*)::DOUBLE AS n FROM documents GROUP BY lang
            ),
            z AS (SELECT sum(sqrt(n)) AS z FROM sizes),
            q AS (
                SELECT lang,
                       (floor((1152921504606846976.0 * 200 * sqrt(n) / (z.z * n))
                              / 1048576.0) * 1048576)::BIGINT AS thr
                FROM sizes, z
            ),
            r AS (
                SELECT doc_id, lang,
                       ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS rh
                FROM documents
            )
            SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
            WHERE rh < thr ORDER BY lang, doc_id
        """,
        "pack_chunks": r"""
            WITH t AS (
                SELECT doc_id, lang,
                       CASE WHEN length(regexp_replace(trim(text), '\s+', ' ', 'g')) = 0
                            THEN 0
                            ELSE len(string_split(
                                regexp_replace(trim(text), '\s+', ' ', 'g'), ' '))
                       END AS n_tokens
                FROM documents
            ),
            p AS (
                SELECT doc_id, lang, n_tokens,
                       coalesce(sum(n_tokens) OVER (
                           PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS start_offset
                FROM t
            )
            SELECT lang, (start_offset // 2048)::BIGINT AS chunk_id,
                   count(*) AS n_docs,
                   sum(n_tokens)::BIGINT AS chunk_tokens,
                   min(doc_id) AS first_doc
            FROM p GROUP BY 1, 2 ORDER BY lang, chunk_id
        """,
        "zorder_key": _zorder_oracle_sql(),
        "graph_pagerank": _pagerank_oracle_sql(),
        "graph_ppr": _pagerank_oracle_sql(seeds=[ENTITY_A, ENTITY_B]),
        "graph_pagerank_weighted": _pagerank_oracle_sql(weighted=True),
        "graph_triangles": f"""
            WITH ed AS MATERIALIZED ({_EDGES_SQL}),
            pairs AS (
                SELECT DISTINCT a.entity AS a, b.entity AS b
                FROM ed a JOIN ed b
                  ON a.fact_id = b.fact_id AND a.entity < b.entity
            ),
            deg AS (
                SELECT v, count(*) AS d FROM (
                    SELECT a AS v FROM pairs UNION ALL SELECT b FROM pairs
                ) GROUP BY v
            ),
            w AS (SELECT (sum(d * (d - 1) // 2))::BIGINT AS n_wedges FROM deg),
            t AS (
                SELECT count(*) AS n_triangles
                FROM pairs p1
                JOIN pairs p2 ON p2.a = p1.b
                JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b
            )
            SELECT n_triangles, n_wedges,
                   round(3.0 * n_triangles / greatest(n_wedges, 1), 6) AS clustering
            FROM t CROSS JOIN w
        """,
        "sales_cube": """
            SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                   coalesce(l_linestatus, 'ALL') AS linestatus,
                   coalesce(ship_year, -1) AS ship_year,
                   count(*) AS n_rows,
                   floor(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_price
            FROM (SELECT l_returnflag, l_linestatus,
                         year(l_shipdate) AS ship_year, l_extendedprice
                  FROM lineitem)
            GROUP BY CUBE (l_returnflag, l_linestatus, ship_year)
        """,
        "graph_components": _cc_minlabel_oracle(),
        "graph_components_star": _cc_minlabel_oracle(),
        "dedup_simhash": f"""
            WITH toks AS (
                SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS t
                FROM documents
            ),
            hs AS (
                SELECT doc_id,
                       ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
                FROM toks
            ),
            votes AS (
                SELECT doc_id, j,
                       sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM hs, range(60) r(j)
                GROUP BY 1, 2
            ),
            fp AS (
                SELECT doc_id,
                       sum(CASE WHEN v > 0 THEN 1::BIGINT << j ELSE 0 END) AS simhash
                FROM votes GROUP BY 1
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "text_quality": f"""
            WITH base AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       string_split({_NORM}, ' ') AS toks,
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct
                FROM documents
            ),
            feat AS (
                SELECT doc_id, n_chars,
                       len(toks) AS n_tokens,
                       round((n_chars - (len(toks) - 1)) / len(toks)::DOUBLE, 6) AS avg_token_len,
                       round(punct / greatest(n_chars, 1)::DOUBLE, 6) AS punct_ratio,
                       round(len(list_filter(toks, t -> list_contains({en}, t))) / greatest(len(toks), 1)::DOUBLE, 6) AS stopword_ratio,
                       round(len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE, 6) AS uniq_ratio
                FROM base
            )
            SELECT doc_id, n_chars, n_tokens, avg_token_len, punct_ratio,
                   stopword_ratio, uniq_ratio,
                   (least(n_tokens * 10000, 1000000) * 25
                    + (1000000 - least(CAST(round(punct_ratio * 1000000) AS BIGINT) * 4, 1000000)) * 25
                    + least(CAST(round(stopword_ratio * 1000000) AS BIGINT) * 5, 1000000) * 20
                    + CAST(round(uniq_ratio * 1000000) AS BIGINT) * 30)::BIGINT AS quality_score_e8
            FROM feat
        """,
        "text_langid": f"""
            WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents),
            s AS (
                SELECT doc_id,
                       len(list_filter(toks, x -> list_contains({de}, x))) AS h_de,
                       len(list_filter(toks, x -> list_contains({en}, x))) AS h_en,
                       len(list_filter(toks, x -> list_contains({es}, x))) AS h_es,
                       len(list_filter(toks, x -> list_contains({fr}, x))) AS h_fr
                FROM t
            )
            SELECT doc_id,
                   CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
                        WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                        WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                        WHEN h_es >= h_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM s
        """,
        "scrub_pii": """
            WITH aug AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id
                            || '@mail.example.com via https://ex.org/d' || doc_id
                            || ' or call +1202555' || lpad((doc_id % 1000)::VARCHAR, 4, '0')
                           AS t
                FROM documents
            )
            SELECT doc_id,
                   md5(regexp_replace(regexp_replace(regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       'https?://[^ ]+', '<URL>', 'g'),
                       '\\+[0-9]{8,15}', '<PHONE>', 'g')) AS scrubbed_md5,
                   len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
                   len(regexp_extract_all(t, 'https?://[^ ]+')) AS n_url,
                   len(regexp_extract_all(t, '\\+[0-9]{8,15}')) AS n_phone
            FROM aug ORDER BY doc_id
        """,
        "text_tokens": f"""
            SELECT doc_id,
                   CASE WHEN length(regexp_replace(trim(text), '\\s+', ' ', 'g')) = 0 THEN 0
                        ELSE len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) END AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_pieces
            FROM documents
        """,
        "text_fingerprint": f"""
            SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
        """,
        "split_naive": """
            SELECT doc_id,
                   CAST(pos_start // 50 AS INT) AS chunk_idx,
                   substr(text, pos_start + 1, 50) AS text,
                   CAST(pos_start AS INT) AS pos_start,
                   CAST(least(pos_start + 50, length(text)) AS INT) AS pos_end
            FROM (
                SELECT doc_id, text,
                       unnest(range(0, greatest(length(text), 1), 50)) AS pos_start
                FROM documents
            )
        """,
        "split_paragraphs": f"""
            WITH t AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
            ),
            paras AS (
                SELECT doc_id, i::INT AS chunk_idx,
                       array_to_string(toks[(i*12+1):(i*12+12)], ' ') AS text
                FROM t, unnest(range(0, cast(ceil(len(toks)/12.0) AS BIGINT))) AS u(i)
            ),
            off AS (
                SELECT doc_id, chunk_idx, text,
                       coalesce(sum(length(text) + 2) OVER (
                           PARTITION BY doc_id ORDER BY chunk_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0)::INT AS pos_start
                FROM paras
            )
            SELECT doc_id, chunk_idx, md5(text) AS chunk_md5, pos_start,
                   (pos_start + length(text))::INT AS pos_end
            FROM off ORDER BY doc_id, chunk_idx
        """,
        "events_json_props": """
            SELECT event_type,
                   count(*) AS n_events,
                   count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
                   sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k,
                   min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
                   max(CAST(props->>'$.k' AS BIGINT)) AS max_k
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "events_enriched": """
            SELECT date_trunc('hour', ts) AS hour_ts, c_mktsegment,
                   count(*) AS n_events,
                   floor(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_value
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "events_windowed": """
            SELECT date_trunc('hour', ts) AS hour_ts, event_type,
                   count(*) AS n_events,
                   floor(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_value
            FROM events
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "fuzzy_name_pairs": """
            -- group-by-distinct-name first: levenshtein runs on the
            -- name grid instead of the O(#parts^2) row grid, then the
            -- qualifying name pairs expand back to part keys. Output
            -- is IDENTICAL to the naive row-level cross join
            -- (same-name rows are the np.na = np.nb diagonal, dist 0).
            -- ROUND 9: the name grid itself is now PassJoin-banded,
            -- mirroring Spark's own blocking (dedup.edit_distance_
            -- pairs, k=2): any pair within distance 2 shares one of
            -- the 3 even segments of either string EXACTLY at a
            -- position shifted by <= 2 (pigeonhole: 2 edits cannot
            -- touch all 3 segments). idx = the 3 (L|i|segment) keys
            -- per name; probe = the aligned substrings for every
            -- compatible source length. Lossless (verified row-equal
            -- to the quadratic grid at sf0.01/sf0.1/sf1), and kills
            -- the O(#names^2) levenshtein grid that put the sf10
            -- oracle out of budget (~3e10 comparisons at 250k names).
            WITH names AS MATERIALIZED (SELECT DISTINCT p_name FROM part),
            idx AS MATERIALIZED (
                SELECT p_name AS iname,
                       CASE WHEN len(p_name) <= 4 THEN '~short'
                            ELSE CAST(len(p_name) AS VARCHAR) || '|' || CAST(i AS VARCHAR) || '|' ||
                                 substr(p_name,
                                        i*(len(p_name)//3) + least(i, len(p_name)%3) + 1,
                                        (len(p_name)//3) + CASE WHEN i < (len(p_name)%3) THEN 1 ELSE 0 END)
                       END AS bkey
                FROM names, UNNEST(range(0, 3)) g(i)
                WHERE len(p_name) <= 4
                   OR (len(p_name)//3) + CASE WHEN i < (len(p_name)%3) THEN 1 ELSE 0 END > 0
            ),
            probe AS MATERIALIZED (
                SELECT DISTINCT p_name AS pname,
                       CAST(L AS VARCHAR) || '|' || CAST(i AS VARCHAR) || '|' ||
                       substr(p_name, st + 1, ln) AS bkey
                FROM (
                    SELECT p_name, L, i,
                           (L//3) + CASE WHEN i < (L%3) THEN 1 ELSE 0 END AS ln,
                           i*(L//3) + least(i, L%3) AS p
                    FROM names,
                         UNNEST(range(greatest(5, len(p_name) - 2), len(p_name) + 3)) gl(L),
                         UNNEST(range(0, 3)) gi(i)
                ), UNNEST(range(greatest(0, p - 2), least(len(p_name) - ln, p + 2) + 1)) gs(st)
                WHERE ln > 0
                UNION ALL
                SELECT p_name, '~short' FROM names WHERE len(p_name) <= 6
            ),
            np AS MATERIALIZED (
                -- verify on the RAW key-match rows (duplicates and
                -- all) and DISTINCT only the survivors: levenshtein
                -- is symmetric, so the duplicated evaluations are
                -- cheap relative to hashing the full candidate set
                -- (sf3: 51.5 s vs 207 s cand-DISTINCT + 25 s verify)
                SELECT p_name AS na, p_name AS nb, 0 AS dist FROM names
                UNION ALL
                SELECT DISTINCT least(iname, pname) AS na,
                       greatest(iname, pname) AS nb,
                       CAST(levenshtein(iname, pname) AS INT) AS dist
                FROM idx JOIN probe ON idx.bkey = probe.bkey
                WHERE iname <> pname AND levenshtein(iname, pname) <= 2
            )
            SELECT least(pa.p_partkey, pb.p_partkey) AS id_a,
                   greatest(pa.p_partkey, pb.p_partkey) AS id_b,
                   np.dist AS dist
            FROM np
            JOIN part pa ON pa.p_name = np.na
            JOIN part pb ON pb.p_name = np.nb
            WHERE np.na < np.nb OR pa.p_partkey < pb.p_partkey
        """,
        "value_histogram": """
            WITH b AS (
                SELECT min(value::DOUBLE) AS lo, max(value::DOUBLE) AS hi FROM events
            ),
            binned AS (
                SELECT event_type,
                       least(greatest(CAST(floor((value::DOUBLE - lo) / ((hi - lo) / 20.0)) AS INT), 0), 19) AS bin,
                       lo, (hi - lo) / 20.0 AS w
                FROM events CROSS JOIN b
                WHERE value IS NOT NULL
            )
            SELECT event_type, bin,
                   round(lo + bin * w, 6) AS bin_lo,
                   round(lo + (bin + 1) * w, 6) AS bin_hi,
                   count(*) AS cnt
            FROM binned
            GROUP BY event_type, bin, lo, w
        """,
        "standardize": """
            WITH m AS (
                SELECT event_type, count(*) AS n,
                       sum(CAST(value AS DECIMAL(18,6))) AS s,
                       sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2
                FROM events GROUP BY event_type
            )
            SELECT event_id, e.event_type,
                   CASE WHEN (s2::DOUBLE - s::DOUBLE * (s::DOUBLE / n::DOUBLE))
                             / (n::DOUBLE - 1.0) > 0
                        THEN round((value::DOUBLE - s::DOUBLE / n::DOUBLE)
                             / sqrt((s2::DOUBLE - s::DOUBLE * (s::DOUBLE / n::DOUBLE))
                                    / (n::DOUBLE - 1.0)), 6)
                   END AS value_z
            FROM events e JOIN m ON e.event_type = m.event_type
        """,
        "events_funnel": """
            WITH s1 AS (
                SELECT user_id AS u, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY 1
            ),
            s2 AS (
                SELECT e.user_id AS u, min(e.ts) AS t
                FROM events e JOIN s1 ON e.user_id = s1.u
                WHERE e.event_type = 'click' AND e.ts > s1.t
                GROUP BY 1
            ),
            s3 AS (
                SELECT e.user_id AS u, min(e.ts) AS t
                FROM events e JOIN s2 ON e.user_id = s2.u
                WHERE e.event_type = 'purchase' AND e.ts > s2.t
                GROUP BY 1
            ),
            c AS (
                SELECT 1 AS step_idx, 'view' AS step, (SELECT count(*) FROM s1) AS n_users
                UNION ALL
                SELECT 2, 'click', (SELECT count(*) FROM s2)
                UNION ALL
                SELECT 3, 'purchase', (SELECT count(*) FROM s3)
            )
            SELECT step_idx, step, n_users,
                   round(n_users / (SELECT count(*) FROM s1)::DOUBLE, 6) AS conversion
            FROM c
        """,
        "cohort_retention": """
            WITH act AS (
                SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS p
                FROM events
            ),
            first AS (SELECT u, min(p) AS cohort FROM act GROUP BY 1),
            joined AS (
                SELECT cohort,
                       CAST(date_diff('day', cohort, p) / 7 AS INT) AS period_offset,
                       u
                FROM act JOIN first USING (u)
            ),
            cell AS (
                SELECT cohort, period_offset, count(DISTINCT u) AS n_users
                FROM joined GROUP BY 1, 2
            ),
            sizes AS (
                SELECT cohort, n_users AS sz FROM cell WHERE period_offset = 0
            )
            SELECT cohort::TIMESTAMP AS cohort, period_offset, n_users,
                   round(n_users / sz::DOUBLE, 6) AS retention
            FROM cell JOIN sizes USING (cohort)
        """,
        "heavy_hitters": f"""
            WITH toks AS (
                SELECT unnest(string_split({_NORM}, ' ')) AS item
                FROM documents
            ),
            tot AS (SELECT count(*) AS n FROM toks)
            SELECT item, count(*) AS cnt,
                   round(count(*) / (SELECT n FROM tot)::DOUBLE, 6) AS share
            FROM toks
            GROUP BY item
            HAVING count(*) >= ((SELECT n FROM tot) + 99) // 100
        """,
        "gap_fill": """
            WITH base AS (
                SELECT user_id, ts, max(value) AS value
                FROM events WHERE user_id <= 5 GROUP BY 1, 2
            ),
            per_tick AS (
                SELECT user_id, date_trunc('day', ts) AS tick,
                       count(*) AS n_obs, arg_max(value, ts) AS value
                FROM base GROUP BY 1, 2
            ),
            bounds AS (
                SELECT user_id, min(tick) AS lo, max(tick) AS hi
                FROM per_tick GROUP BY 1
            ),
            ticks AS (
                SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS tick
                FROM bounds
            ),
            joined AS (
                SELECT t.user_id, t.tick,
                       coalesce(p.n_obs, 0)::BIGINT AS n_obs, p.value
                FROM ticks t LEFT JOIN per_tick p
                  ON t.user_id = p.user_id AND t.tick = p.tick
            )
            SELECT user_id, tick,
                   round(last_value(value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY tick
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value,
                   n_obs
            FROM joined
        """,
        "events_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'error') AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup') AS n_signup,
                   count(*) FILTER (event_type = 'view') AS n_view
            FROM events GROUP BY user_id
        """,
        "events_melt": """
            WITH wide AS (
                SELECT user_id,
                       count(*) FILTER (event_type = 'click') AS n_click,
                       count(*) FILTER (event_type = 'error') AS n_error,
                       count(*) FILTER (event_type = 'purchase') AS n_purchase,
                       count(*) FILTER (event_type = 'signup') AS n_signup,
                       count(*) FILTER (event_type = 'view') AS n_view
                FROM events GROUP BY user_id
            )
            SELECT user_id, event_type, n FROM (
                SELECT user_id, 'click' AS event_type, n_click AS n FROM wide
                UNION ALL SELECT user_id, 'error', n_error FROM wide
                UNION ALL SELECT user_id, 'purchase', n_purchase FROM wide
                UNION ALL SELECT user_id, 'signup', n_signup FROM wide
                UNION ALL SELECT user_id, 'view', n_view FROM wide
            ) WHERE n > 0
        """,
        "revenue_delta": """
            WITH daily AS (
                SELECT date_trunc('day', ts) AS day,
                       floor(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue
                FROM events WHERE event_type = 'purchase' GROUP BY 1
            )
            SELECT day, revenue,
                   floor((revenue - lag(revenue) OVER (ORDER BY day)) * 100.0 + 0.5) / 100.0 AS delta
            FROM daily
        """,
        "user_activity": """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events,
                   round(min(value), 2) AS min_value,
                   round(max(value), 2) AS max_value
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "top_ngrams": f"""
            {_SHINGLES}
            SELECT ngram, count(*) AS df FROM (
                SELECT unnest(shingles) AS ngram FROM sh
            ) GROUP BY ngram
            ORDER BY df DESC, ngram ASC
            LIMIT 20
        """,
        "bm25_topk": BM25_ORACLE_BODY,
        "hybrid_rrf": f"""
            WITH dl AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks,
                       len(string_split({_NORM}, ' ')) AS dl
                FROM documents
            ),
            stats AS (SELECT count(*) AS n, sum(dl) AS sd FROM dl),
            tf AS (
                SELECT doc_id, dl, term, count(*) AS tf
                FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
                WHERE term IN ('hash', 'join', 'vector')
                GROUP BY doc_id, dl, term
            ),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
            bm AS (
                SELECT doc_id,
                       round(sum(CAST(round(
                           round(ln((n - df + 0.5) / (df + 0.5) + 1.0), 6)
                           * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (sd / n))))
                       , 6) AS DECIMAL(38,10)))::DOUBLE, 6) AS score
                FROM tf JOIN dft USING (term) CROSS JOIN stats
                GROUP BY doc_id
                ORDER BY score DESC, doc_id ASC
                LIMIT 50
            ),
            lex AS (
                SELECT doc_id,
                       row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
                FROM bm
            ),
            qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 3),
            vs AS (
                SELECT vec_id AS doc_id,
                       list_cosine_similarity(embedding::DOUBLE[], (SELECT v FROM qv)) AS raw
                FROM embeddings
                ORDER BY raw DESC, doc_id ASC
                LIMIT 50
            ),
            vec AS (
                SELECT doc_id,
                       row_number() OVER (ORDER BY raw DESC, doc_id ASC) AS r
                FROM vs
            ),
            fused AS (
                SELECT doc_id, sum(1000000000000000 // (r + 60))::BIGINT AS rrf_scaled
                FROM (SELECT * FROM lex UNION ALL SELECT * FROM vec)
                GROUP BY doc_id
                ORDER BY rrf_scaled DESC, doc_id ASC
                LIMIT 10
            )
            SELECT doc_id, rrf_scaled,
                   CAST(row_number() OVER (ORDER BY rrf_scaled DESC, doc_id ASC) AS INT) AS rank
            FROM fused
        """,
        "text_clean": f"""
            SELECT doc_id,
                   array_to_string(list_filter(string_split({_NORM}, ' '),
                       t -> NOT list_contains(['the','and','of','to','in','is','that','with'], t)), ' ') AS clean_text,
                   len(list_filter(string_split({_NORM}, ' '),
                       t -> NOT list_contains(['the','and','of','to','in','is','that','with'], t))) AS n_kept
            FROM documents
        """,
        "text_repetition": f"""
            WITH t AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
            ),
            g AS (
                SELECT doc_id, toks,
                       CASE WHEN len(toks) >= 2 THEN list_transform(
                            range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                            ELSE [] END AS g2,
                       CASE WHEN len(toks) >= 3 THEN list_transform(
                            range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                            ELSE [] END AS g3,
                       CASE WHEN len(toks) >= 5 THEN list_transform(
                            range(1, len(toks) - 3),
                            i -> array_to_string(toks[i:i+4], ' '))
                            ELSE [] END AS g5
                FROM t
            )
            SELECT doc_id, len(toks) AS n_tokens,
                   round(coalesce(list_max(list_transform(list_distinct(g2),
                         x -> len(list_filter(g2, y -> y = x)))), 0) * 2
                         / greatest(len(toks), 1)::DOUBLE, 6) AS top2_frac,
                   round(coalesce(list_max(list_transform(list_distinct(g3),
                         x -> len(list_filter(g3, y -> y = x)))), 0) * 3
                         / greatest(len(toks), 1)::DOUBLE, 6) AS top3_frac,
                   round((len(g5) - len(list_distinct(g5)))
                         / greatest(len(g5), 1)::DOUBLE, 6) AS dup5_frac
            FROM g
        """,
        "winnow_pairs": f"""
            WITH hashes AS (
                SELECT doc_id,
                       list_transform(
                           range(1, greatest(length({_NORM}) - 7, 1) + 1),
                           i -> ('0x' || substr(md5(substr({_NORM}, i, 8)), 1, 15))::BIGINT
                       ) AS hs
                FROM documents
            ),
            mins AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, greatest(len(hs) - 3, 1) + 1),
                           j -> list_min(hs[j:j+3])
                       )) AS fps
                FROM hashes
            ),
            ex AS (SELECT doc_id, unnest(fps) AS fp FROM mins),
            kept AS (
                SELECT doc_id, fp FROM ex
                QUALIFY count(*) OVER (PARTITION BY fp)
                        <= (SELECT count(*) // 50 FROM documents)
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 20
        """,
        "click_attribution": """
            WITH c AS (
                SELECT user_id, event_id, epoch_us(ts) AS ts_us
                FROM events WHERE event_type = 'click'
            ),
            p AS (
                SELECT user_id, event_id, epoch_us(ts) AS ts_us
                FROM events WHERE event_type = 'purchase'
            )
            SELECT c.user_id, count(*) AS n_pairs,
                   min(p.ts_us - c.ts_us) AS min_delay_us,
                   max(p.ts_us - c.ts_us) AS max_delay_us
            FROM c JOIN p
              ON c.user_id = p.user_id
             AND p.ts_us >= c.ts_us
             AND p.ts_us <= c.ts_us + 3600000000
            GROUP BY c.user_id
            ORDER BY c.user_id
        """,
        "sessionization": """
            WITH flagged AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM flagged GROUP BY user_id ORDER BY user_id
        """,
        "tfidf_keywords": f"""
            WITH t AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM (SELECT doc_id, unnest(toks) AS term FROM t)
                WHERE term <> '' GROUP BY doc_id, term
            ),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
            scored AS (
                SELECT doc_id, term, tf, df,
                       round(tf * round(ln(1.0 + (SELECT n FROM nd) / df), 6), 6)
                           AS score_tfidf
                FROM tf JOIN df USING (term)
            )
            SELECT doc_id, term, tf, df, score_tfidf,
                   CAST(row_number() OVER (PARTITION BY doc_id
                        ORDER BY score_tfidf DESC, term ASC) AS INT) AS rank
            FROM scored
            QUALIFY rank <= 3
        """,
        "pmi_collocations": f"""
            WITH t AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
            ),
            tot AS (
                SELECT CAST(sum(len(toks)) AS BIGINT) AS t_tok,
                       CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS b_bg
                FROM t
            ),
            uni AS (
                SELECT tk AS w, count(*) AS n_w
                FROM (SELECT unnest(toks) AS tk FROM t)
                WHERE tk <> '' GROUP BY tk
            ),
            pairs AS (
                SELECT w1, w2, count(*) AS n_pair
                FROM (
                    SELECT toks[i] AS w1, toks[i + 1] AS w2
                    FROM (SELECT toks, unnest(range(1, len(toks))) AS i
                          FROM t WHERE len(toks) >= 2)
                )
                WHERE w1 <> '' AND w2 <> ''
                GROUP BY w1, w2 HAVING count(*) >= 5
            )
            SELECT w1, w2, n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
                   round(ln((n_pair * (SELECT t_tok FROM tot)::DOUBLE
                                    * (SELECT t_tok FROM tot))
                            / ((SELECT b_bg FROM tot)::DOUBLE
                               * u1.n_w * u2.n_w)), 6) AS pmi
            FROM pairs
            JOIN uni u1 ON u1.w = pairs.w1
            JOIN uni u2 ON u2.w = pairs.w2
            ORDER BY pmi DESC, w1, w2
            LIMIT 15
        """,
        "classifier_score": f"""
            WITH t AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
            ),
            tok AS (
                SELECT doc_id, len(toks) AS n, unnest(toks) AS tk FROM t
            ),
            agg AS (
                SELECT doc_id, any_value(n) AS n,
                       CAST(sum(
                           (('0x' || substr(md5(CAST(
                               (('0x' || substr(md5(tk), 1, 15))::BIGINT % 65536)
                               AS VARCHAR)), 1, 15))::BIGINT % 2000001)
                           - 1000000
                       ) AS BIGINT) AS w_sum
                FROM tok GROUP BY doc_id
            )
            SELECT doc_id, CAST(n AS INT) AS n_tokens, w_sum AS w_sum_e6,
                   floor(w_sum / greatest(n, 1)) / 1000000.0 AS z,
                   floor((1.0 / (1.0 + exp(
                       -(floor(w_sum / greatest(n, 1)) / 1000000.0))))
                       * 1000000.0) / 1000000.0 AS score
            FROM agg
        """,
        "dup_spans": f"""
            WITH t AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
            ),
            g AS (
                SELECT doc_id, i - 1 AS pos,
                       ('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')),
                                       1, 15))::BIGINT AS h
                FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
                      FROM t WHERE len(toks) >= 8)
            ),
            dup AS (
                SELECT h FROM g GROUP BY h HAVING min(doc_id) <> max(doc_id)
            ),
            st AS (SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM dup)),
            cov AS (
                SELECT doc_id,
                       greatest(pos + 8 - greatest(pos,
                           coalesce(max(pos + 8) OVER (PARTITION BY doc_id
                               ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                               -1)), 0) AS c
                FROM st
            ),
            agg AS (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS dup_tokens
                FROM cov GROUP BY doc_id
            )
            SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
                   coalesce(agg.dup_tokens, 0) AS dup_tokens,
                   round(coalesce(agg.dup_tokens, 0)::DOUBLE
                         / greatest(len(t.toks), 1), 6) AS dup_frac
            FROM t LEFT JOIN agg USING (doc_id)
        """,
        "graph_bfs": f"""
            WITH RECURSIVE ed AS ({_EDGES_SQL}),
            pairs AS (
                SELECT DISTINCT a.entity AS ea, b.entity AS eb
                FROM ed a JOIN ed b
                  ON a.fact_id = b.fact_id AND a.entity < b.entity
            ),
            e AS (
                SELECT ea AS src, eb AS dst FROM pairs
                UNION
                SELECT eb AS src, ea AS dst FROM pairs
            ),
            bfs AS (
                SELECT * FROM (VALUES ('{ENTITY_A}', 0), ('{ENTITY_B}', 0))
                    s(vertex, dist)
                UNION
                SELECT e.dst, b.dist + 1
                FROM bfs b JOIN e ON e.src = b.vertex
                WHERE b.dist < 4
            )
            SELECT vertex, CAST(min(dist) AS INT) AS dist
            FROM bfs GROUP BY vertex
            ORDER BY dist, vertex
        """,
        "merge_changes": """
            WITH cust AS (
                SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
            ),
            upserted AS (
                SELECT c_custkey, c_name, c_mktsegment,
                       round(c_acctbal + 100.0, 2) AS c_acctbal
                FROM cust WHERE c_custkey % 5 = 1
                UNION ALL
                SELECT c_custkey + 1000000, 'copy of ' || c_name,
                       c_mktsegment, c_acctbal
                FROM cust WHERE c_custkey % 5 = 1
            ),
            touched AS (
                SELECT c_custkey FROM cust WHERE c_custkey % 5 IN (0, 1)
                UNION ALL
                SELECT c_custkey + 1000000 FROM cust WHERE c_custkey % 5 = 1
            )
            SELECT * FROM cust
            WHERE c_custkey NOT IN (SELECT c_custkey FROM touched)
            UNION ALL
            SELECT * FROM upserted
        """,
        "winsorize_value": """
            WITH b AS (
                SELECT event_type,
                       quantile_cont(value, 0.05) AS lo,
                       quantile_cont(value, 0.95) AS hi
                FROM events GROUP BY event_type
            )
            SELECT e.event_id, e.event_type, e.value,
                   round(least(greatest(e.value, b.lo), b.hi), 6) AS value_w
            FROM events e JOIN b USING (event_type)
        """,
        "entity_similarity": f"""
            WITH ed AS MATERIALIZED ({_EDGES_SQL}),
            pairs AS (
                SELECT a.entity AS entity_a, b.entity AS entity_b,
                       count(*) AS n_shared
                FROM ed a JOIN ed b
                  ON a.fact_id = b.fact_id AND a.entity < b.entity
                GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            deg AS (SELECT entity, count(*) AS deg FROM ed GROUP BY entity)
            SELECT entity_a, entity_b, n_shared,
                   da.deg AS deg_a, db.deg AS deg_b,
                   round(n_shared
                         / (da.deg + db.deg - n_shared)::DOUBLE, 6) AS jaccard
            FROM pairs
            JOIN deg da ON da.entity = pairs.entity_a
            JOIN deg db ON db.entity = pairs.entity_b
        """,
        "lpa_communities": _lpa_oracle_sql(3),
        "kmeans_clusters": _kmeans_oracle_sql(8, 64, 3),
        "semantic_dedup": _semantic_dedup_oracle_sql(8, 64, 3),
        "semantic_prune": _semantic_prune_oracle_sql(1_600_000_000_000, 8, 64, 3),
        "cluster_sample": _cluster_sample_oracle_sql(20, 8, 64, 3),
        "ann_pq_topk": _pq_oracle_sql(),
        "ann_ivfpq_topk": _ivfpq_oracle_sql(32, 10),
        "v3_knn_indexed": _ivfx_oracle_sql(32, 10),
        "ann_ivfpq_rerank": _ivfpq_oracle_sql(64, 10, rerank=100),
        "pca_embeddings": _pca_oracle_sql(),
        "graph_sssp": _sssp_oracle_sql(4),
        "ewma_value": """
            WITH v AS (
                SELECT user_id, ts, event_id,
                       CAST(round(value * 1000000.0) AS BIGINT) AS v6
                FROM events
                WHERE value IS NOT NULL
            ),
            g AS (
                SELECT user_id, list(v6 ORDER BY ts, event_id) AS vs
                FROM v GROUP BY user_id
            )
            SELECT user_id, CAST(len(vs) AS INT) AS n_obs,
                   round(list_reduce(vs, (a, x) ->
                       CASE WHEN (x * 1 + a * 3) >= 0
                            THEN (x * 1 + a * 3) // 4
                            ELSE -((-(x * 1 + a * 3)) // 4) END
                   )::DOUBLE / 1000000.0, 6) AS ewma
            FROM g
        """,
        "length_batches": f"""
            WITH b AS (
                SELECT {", ".join(f"quantile_cont(n_chars, {i / 10}) AS b{i}" for i in range(1, 10))}
                FROM documents
            ),
            bk AS (
                SELECT d.doc_id, d.n_chars,
                       CAST(1 {" ".join(f"+ CASE WHEN d.n_chars > b.b{i} THEN 1 ELSE 0 END" for i in range(1, 10))}
                            AS INT) AS bucket
                FROM documents d CROSS JOIN b
            ),
            rn AS (
                SELECT doc_id, n_chars, bucket,
                       row_number() OVER (PARTITION BY bucket
                           ORDER BY n_chars, doc_id) - 1 AS r
                FROM bk
            )
            SELECT doc_id, n_chars, bucket,
                   bucket::VARCHAR || '-' || (r // 32)::VARCHAR AS batch_id,
                   CAST(r % 32 AS INT) AS pos_in_batch
            FROM rn
        """,
        "negative_samples": """
            WITH n AS (SELECT count(*) AS c FROM embeddings),
            pairs AS (
                SELECT vec_id AS query_id,
                       (vec_id + 1) % (SELECT c FROM n) AS pos_id
                FROM embeddings WHERE vec_id < 50
            ),
            slots AS (
                SELECT query_id, pos_id, CAST(unnest(range(0, 4)) AS INT) AS slot
                FROM pairs
            )
            SELECT query_id, pos_id, slot,
                   CASE WHEN raw = pos_id
                        THEN (raw + 1) % (SELECT c FROM n)
                        ELSE raw END AS neg_id
            FROM (
                SELECT query_id, pos_id, slot,
                       ('0x' || substr(md5(query_id::VARCHAR || ':'
                            || slot::VARCHAR || ':neg'), 1, 15))::BIGINT
                           % (SELECT c FROM n) AS raw
                FROM slots
            )
        """,
        "churned_customers": """
            WITH y94 AS (
                SELECT DISTINCT o_custkey FROM orders
                WHERE year(o_orderdate) = 1996
            ),
            y95 AS (
                SELECT DISTINCT o_custkey FROM orders
                WHERE year(o_orderdate) = 1997
            )
            SELECT o_custkey, 'churned' AS status
            FROM (SELECT o_custkey FROM y94 EXCEPT SELECT o_custkey FROM y95)
            UNION ALL
            SELECT o_custkey, 'retained' AS status
            FROM (SELECT o_custkey FROM y94 INTERSECT SELECT o_custkey FROM y95)
            ORDER BY status, o_custkey
        """,
        "value_ranks": """
            SELECT event_id, event_type, value,
                   round(percent_rank() OVER w, 6) AS pct_rank,
                   round(cume_dist() OVER w, 6) AS cume
            FROM events
            WINDOW w AS (PARTITION BY event_type
                         ORDER BY value NULLS FIRST, event_id)
        """,
        "training_mix": f"""
            WITH base AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       string_split({_NORM}, ' ') AS toks,
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct
                FROM documents
            ),
            feat AS (
                SELECT doc_id,
                       len(toks) AS n_tokens,
                       round(punct / greatest(n_chars, 1)::DOUBLE, 6) AS punct_ratio,
                       round(len(list_filter(toks, t -> list_contains({en}, t))) / greatest(len(toks), 1)::DOUBLE, 6) AS stopword_ratio,
                       round(len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE, 6) AS uniq_ratio
                FROM base
            ),
            scored AS (
                SELECT doc_id,
                       (least(n_tokens * 10000, 1000000) * 25
                        + (1000000 - least(CAST(round(punct_ratio * 1000000) AS BIGINT) * 4, 1000000)) * 25
                        + least(CAST(round(stopword_ratio * 1000000) AS BIGINT) * 5, 1000000) * 20
                        + CAST(round(uniq_ratio * 1000000) AS BIGINT) * 30)::BIGINT AS quality_score_e8
                FROM feat
            ),
            b AS (
                SELECT quantile_cont(quality_score_e8, 0.25) AS b1,
                       quantile_cont(quality_score_e8, 0.5) AS b2,
                       quantile_cont(quality_score_e8, 0.75) AS b3
                FROM scored
            ),
            bk AS (
                SELECT s.doc_id, d.lang, s.quality_score_e8,
                       CAST(1 + CASE WHEN s.quality_score_e8 > b.b1 THEN 1 ELSE 0 END
                              + CASE WHEN s.quality_score_e8 > b.b2 THEN 1 ELSE 0 END
                              + CASE WHEN s.quality_score_e8 > b.b3 THEN 1 ELSE 0 END
                            AS INT) AS bucket
                FROM scored s JOIN documents d USING (doc_id) CROSS JOIN b
            ),
            n AS (
                SELECT doc_id, lang, quality_score_e8, bucket,
                       (CASE bucket WHEN 1 THEN 0 WHEN 2 THEN 1
                                    WHEN 3 THEN 1 ELSE 2 END)
                       + (CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':mix'),
                                     1, 15))::BIGINT % 1000000
                               < (CASE bucket WHEN 1 THEN 250000
                                              WHEN 3 THEN 500000 ELSE 0 END)
                               THEN 1 ELSE 0 END) AS n_copies
                FROM bk
            )
            SELECT doc_id, lang, quality_score_e8, bucket,
                   unnest(range(0, n_copies)) AS copy_idx
            FROM n WHERE n_copies > 0
        """,
        "lm_perplexity": f"""
            WITH t AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
            ),
            bg AS (
                SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
                FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
                      FROM t WHERE len(toks) >= 2)
            ),
            bgc AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY w1, w2),
            uni AS (
                SELECT tk AS w1, count(*) AS c_x
                FROM (SELECT unnest(toks) AS tk FROM t)
                WHERE tk <> '' GROUP BY tk
            ),
            v AS (SELECT count(*) AS vocab FROM uni),
            terms AS (
                SELECT doc_id,
                       round(-ln((c_xy + 1)
                                 / (c_x + (SELECT vocab FROM v))::DOUBLE), 6)
                           AS term
                FROM bg JOIN bgc USING (w1, w2) JOIN uni USING (w1)
            )
            SELECT doc_id, count(*) AS n_bigrams,
                   floor(sum(term::DECIMAL(38,10))::DOUBLE / count(*)
                         * 1000000) / 1000000 AS nll
            FROM terms GROUP BY doc_id
        """,
        "rolling_anomaly": """
            WITH v AS (
                SELECT event_id, user_id, ts, value,
                       CAST(round(value * 1000000.0) AS BIGINT) AS v6
                FROM events
            ),
            s AS (
                SELECT event_id, user_id, value,
                       count(value) OVER w AS n,
                       sum(v6) OVER w AS s1,
                       sum(CAST(v6 AS DECIMAL(19,0))
                           * CAST(v6 AS DECIMAL(19,0))) OVER w AS s2
                FROM v
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
            ),
            calc AS (
                SELECT event_id, user_id, value, n,
                       s1::DOUBLE / (n * 1000000.0) AS mean,
                       (s2::DOUBLE / 1e12
                        - (s1::DOUBLE / 1000000.0)
                          * (s1::DOUBLE / 1000000.0) / n) / (n - 1) AS var
                FROM s
            )
            SELECT event_id, user_id, value,
                   CAST(n AS BIGINT) AS roll_n,
                   CASE WHEN n >= 3 AND var > 0
                        THEN round((value - mean) / sqrt(var), 6) END AS z,
                   coalesce(abs(CASE WHEN n >= 3 AND var > 0
                        THEN round((value - mean) / sqrt(var), 6) END) > 2.5,
                        false) AS is_anomaly
            FROM calc
        """,
        "epoch_upsample": """
            WITH n AS (
                SELECT doc_id, lang,
                       1 + CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':up'),
                                      1, 15))::BIGINT % 1000000 < 300000
                                THEN 1 ELSE 0 END AS n_copies
                FROM documents
            )
            SELECT doc_id, lang, unnest(range(0, n_copies)) AS copy_idx
            FROM n
        """,
        "event_mode": """
            WITH counted AS (
                SELECT user_id, event_type, count(*) AS c
                FROM events GROUP BY user_id, event_type
            ),
            mx AS (
                SELECT user_id, event_type, c,
                       max(c) OVER (PARTITION BY user_id) AS m
                FROM counted
            )
            SELECT user_id, min(event_type) AS mode_value,
                   CAST(max(m) AS BIGINT) AS mode_count
            FROM mx WHERE c = m GROUP BY user_id
        """,
        "lang_drift": """
            WITH by_cell AS (
                SELECT source AS slice, lang AS cat, count(*) AS n_pc
                FROM documents GROUP BY source, lang
            ),
            st AS (
                SELECT slice, CAST(sum(n_pc) AS BIGINT) AS n_p
                FROM by_cell GROUP BY slice
            ),
            gl AS (
                SELECT cat, CAST(sum(n_pc) AS BIGINT) AS n_qc
                FROM by_cell GROUP BY cat
            ),
            nq AS (SELECT count(*) AS n FROM documents),
            grid AS (
                SELECT st.slice, gl.cat, st.n_p, gl.n_qc,
                       coalesce(bc.n_pc, 0) AS n_pc
                FROM st CROSS JOIN gl
                LEFT JOIN by_cell bc
                  ON bc.slice = st.slice AND bc.cat = gl.cat
            ),
            terms AS (
                SELECT slice, n_p,
                       round(
                           CASE WHEN n_pc > 0
                                THEN (n_pc / n_p::DOUBLE)
                                     * ln((n_pc / n_p::DOUBLE)
                                          / (((n_pc / n_p::DOUBLE)
                                              + (n_qc / (SELECT n FROM nq)::DOUBLE)) / 2.0))
                                     / 2.0
                                ELSE 0.0 END
                           + CASE WHEN n_qc > 0
                                THEN (n_qc / (SELECT n FROM nq)::DOUBLE)
                                     * ln((n_qc / (SELECT n FROM nq)::DOUBLE)
                                          / (((n_pc / n_p::DOUBLE)
                                              + (n_qc / (SELECT n FROM nq)::DOUBLE)) / 2.0))
                                     / 2.0
                                ELSE 0.0 END, 6) AS term
                FROM grid
            )
            SELECT slice, max(n_p) AS n_rows,
                   round(sum(term::DECIMAL(38,10))::DOUBLE, 6) AS js_divergence
            FROM terms GROUP BY slice
        """,
        "profile_events": """
            SELECT 'event_id' AS "column", count(*) AS n_rows,
                   CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   count(DISTINCT event_id) AS n_distinct,
                   min(event_id)::DOUBLE AS min_num, max(event_id)::DOUBLE AS max_num,
                   CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
            FROM events
            UNION ALL
            SELECT 'user_id', count(*),
                   CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT user_id),
                   min(user_id)::DOUBLE, max(user_id)::DOUBLE,
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM events
            UNION ALL
            SELECT 'event_type', count(*),
                   CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT event_type),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   min(event_type), max(event_type)
            FROM events
            UNION ALL
            SELECT 'value', count(*),
                   CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   count(DISTINCT value),
                   min(value)::DOUBLE, max(value)::DOUBLE,
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM events
        """,
        "phash_pairs": """
            WITH m AS (
                SELECT doc_id AS media_id,
                       ('0x' || substr(md5(hex(unhex(md5(lang || ':' || source)))),
                                       1, 15))::BIGINT AS phash
                FROM documents
            )
            SELECT x.media_id AS media_a, y.media_id AS media_b,
                   CAST(bit_count(xor(x.phash, y.phash)) AS INT) AS hamming
            FROM m x JOIN m y ON x.media_id < y.media_id
            WHERE bit_count(xor(x.phash, y.phash)) <= 3
            ORDER BY media_a, media_b
        """,
        "score_buckets": """
            -- boundary arithmetic replicates exact_percentiles
            -- op-for-op (quantile_cont's internal interpolation can
            -- differ by an ulp exactly where a boundary lands ON a
            -- data value, flipping the strict >)
            WITH ranked AS (
                SELECT event_type, value,
                       row_number() OVER (PARTITION BY event_type
                            ORDER BY value) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM events WHERE value IS NOT NULL
            ),
            b AS (
                SELECT event_type,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.1 AS DOUBLE)) AS BIGINT) THEN value END) AS lo1,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.1 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS hi1,
                       any_value((1.0 + (n - 1) * CAST(0.1 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.1 AS DOUBLE))) AS fr1,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.2 AS DOUBLE)) AS BIGINT) THEN value END) AS lo2,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.2 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS hi2,
                       any_value((1.0 + (n - 1) * CAST(0.2 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.2 AS DOUBLE))) AS fr2,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.3 AS DOUBLE)) AS BIGINT) THEN value END) AS lo3,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.3 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS hi3,
                       any_value((1.0 + (n - 1) * CAST(0.3 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.3 AS DOUBLE))) AS fr3,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.4 AS DOUBLE)) AS BIGINT) THEN value END) AS lo4,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.4 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS hi4,
                       any_value((1.0 + (n - 1) * CAST(0.4 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.4 AS DOUBLE))) AS fr4,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.5 AS DOUBLE)) AS BIGINT) THEN value END) AS lo5,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.5 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS hi5,
                       any_value((1.0 + (n - 1) * CAST(0.5 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.5 AS DOUBLE))) AS fr5,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.6 AS DOUBLE)) AS BIGINT) THEN value END) AS lo6,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.6 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS hi6,
                       any_value((1.0 + (n - 1) * CAST(0.6 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.6 AS DOUBLE))) AS fr6,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.7 AS DOUBLE)) AS BIGINT) THEN value END) AS lo7,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.7 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS hi7,
                       any_value((1.0 + (n - 1) * CAST(0.7 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.7 AS DOUBLE))) AS fr7,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.8 AS DOUBLE)) AS BIGINT) THEN value END) AS lo8,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.8 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS hi8,
                       any_value((1.0 + (n - 1) * CAST(0.8 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.8 AS DOUBLE))) AS fr8,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.9 AS DOUBLE)) AS BIGINT) THEN value END) AS lo9,
                       max(CASE WHEN rn = CAST(floor(1.0 + (n - 1) * CAST(0.9 AS DOUBLE)) AS BIGINT) + 1 THEN value END) AS hi9,
                       any_value((1.0 + (n - 1) * CAST(0.9 AS DOUBLE)) - floor(1.0 + (n - 1) * CAST(0.9 AS DOUBLE))) AS fr9
                FROM ranked GROUP BY event_type
            )
            SELECT e.event_type, e.event_id, e.value,
                   CAST(1 + CASE WHEN e.value > (b.lo1 + (coalesce(b.hi1, b.lo1) - b.lo1) * b.fr1) THEN 1 ELSE 0 END + CASE WHEN e.value > (b.lo2 + (coalesce(b.hi2, b.lo2) - b.lo2) * b.fr2) THEN 1 ELSE 0 END + CASE WHEN e.value > (b.lo3 + (coalesce(b.hi3, b.lo3) - b.lo3) * b.fr3) THEN 1 ELSE 0 END + CASE WHEN e.value > (b.lo4 + (coalesce(b.hi4, b.lo4) - b.lo4) * b.fr4) THEN 1 ELSE 0 END + CASE WHEN e.value > (b.lo5 + (coalesce(b.hi5, b.lo5) - b.lo5) * b.fr5) THEN 1 ELSE 0 END + CASE WHEN e.value > (b.lo6 + (coalesce(b.hi6, b.lo6) - b.lo6) * b.fr6) THEN 1 ELSE 0 END + CASE WHEN e.value > (b.lo7 + (coalesce(b.hi7, b.lo7) - b.lo7) * b.fr7) THEN 1 ELSE 0 END + CASE WHEN e.value > (b.lo8 + (coalesce(b.hi8, b.lo8) - b.lo8) * b.fr8) THEN 1 ELSE 0 END + CASE WHEN e.value > (b.lo9 + (coalesce(b.hi9, b.lo9) - b.lo9) * b.fr9) THEN 1 ELSE 0 END
                        AS INT) AS bucket
            FROM events e JOIN b USING (event_type)
        """,
        "markov_transitions": """
            WITH pairs AS (
                SELECT from_type, to_type, count(*) AS n_trans FROM (
                    SELECT event_type AS from_type,
                           lead(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS to_type
                    FROM events
                )
                WHERE to_type IS NOT NULL
                GROUP BY from_type, to_type
            ),
            totals AS (
                SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
                FROM pairs GROUP BY from_type
            )
            SELECT p.from_type, p.to_type, p.n_trans, t.n_from,
                   round(p.n_trans / t.n_from::DOUBLE, 6) AS prob
            FROM pairs p JOIN totals t USING (from_type)
        """,
        "basket_lift": f"""
            WITH b AS (SELECT DISTINCT fact_id, entity FROM ({_EDGES_SQL})),
            nb AS (SELECT count(DISTINCT fact_id) AS n FROM b),
            pairs AS (
                SELECT x.entity AS item_a, y.entity AS item_b,
                       count(*) AS n_pair
                FROM b x JOIN b y
                  ON x.fact_id = y.fact_id AND x.entity < y.entity
                GROUP BY 1, 2 HAVING count(*) >= 3
            ),
            freq AS (SELECT entity, count(*) AS n_item FROM b GROUP BY entity)
            SELECT item_a, item_b, n_pair,
                   fa.n_item AS n_a, fb.n_item AS n_b,
                   round((n_pair * (SELECT n FROM nb)::DOUBLE)
                         / (fa.n_item * fb.n_item)::DOUBLE, 6) AS lift
            FROM pairs
            JOIN freq fa ON fa.entity = pairs.item_a
            JOIN freq fb ON fb.entity = pairs.item_b
        """,
        "snapshot_diff": """
            WITH cust AS (
                SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
            ),
            merged AS (
                SELECT c_custkey, c_name, c_mktsegment,
                       round(c_acctbal + 100.0, 2) AS c_acctbal
                FROM cust WHERE c_custkey % 5 = 1
                UNION ALL
                SELECT c_custkey + 1000000, 'copy of ' || c_name,
                       c_mktsegment, c_acctbal
                FROM cust WHERE c_custkey % 5 = 1
                UNION ALL
                SELECT * FROM cust
                WHERE c_custkey % 5 NOT IN (0, 1)
            )
            SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
                   CASE WHEN o.c_custkey IS NULL THEN 'added'
                        WHEN n.c_custkey IS NULL THEN 'removed'
                        WHEN o.c_name IS DISTINCT FROM n.c_name
                             OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                             OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
                             THEN 'changed'
                        ELSE 'same' END AS status,
                   o.c_name AS old_c_name, n.c_name AS new_c_name,
                   o.c_mktsegment AS old_c_mktsegment,
                   n.c_mktsegment AS new_c_mktsegment,
                   o.c_acctbal AS old_c_acctbal, n.c_acctbal AS new_c_acctbal
            FROM cust o FULL OUTER JOIN merged n
              ON o.c_custkey = n.c_custkey
        """,
        "mad_outliers": """
            WITH med AS (
                SELECT event_type, quantile_cont(value, 0.5) AS med
                FROM events GROUP BY event_type
            ),
            devs AS (
                SELECT e.event_id, e.event_type, e.value,
                       abs(e.value - m.med) AS dev0
                FROM events e JOIN med m USING (event_type)
            ),
            mad AS (
                SELECT event_type, quantile_cont(dev0, 0.5) AS mad
                FROM devs GROUP BY event_type
            )
            SELECT d.event_id, d.event_type, d.value,
                   round(d.dev0, 6) AS dev, round(m.mad, 6) AS mad,
                   coalesce(round(d.dev0, 6) > 3.0 * round(m.mad, 6),
                            false) AS is_outlier
            FROM devs d JOIN mad m USING (event_type)
        """,
        "quality_deciles": f"""
            WITH base AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       string_split({_NORM}, ' ') AS toks,
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct
                FROM documents
            ),
            feat AS (
                SELECT doc_id,
                       len(toks) AS n_tokens,
                       round(punct / greatest(n_chars, 1)::DOUBLE, 6) AS punct_ratio,
                       round(len(list_filter(toks, t -> list_contains({en}, t))) / greatest(len(toks), 1)::DOUBLE, 6) AS stopword_ratio,
                       round(len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE, 6) AS uniq_ratio
                FROM base
            ),
            scored AS (
                SELECT doc_id,
                       (least(n_tokens * 10000, 1000000) * 25
                        + (1000000 - least(CAST(round(punct_ratio * 1000000) AS BIGINT) * 4, 1000000)) * 25
                        + least(CAST(round(stopword_ratio * 1000000) AS BIGINT) * 5, 1000000) * 20
                        + CAST(round(uniq_ratio * 1000000) AS BIGINT) * 30)::BIGINT AS quality_score_e8
                FROM feat
            )
            SELECT doc_id, quality_score_e8,
                   CAST(ntile(10) OVER (ORDER BY quality_score_e8 DESC,
                        doc_id ASC) AS INT) AS bucket
            FROM scored
        """,
        "rolling_revenue_7d": """
            WITH daily AS (
                SELECT date_trunc('day', ts) AS day,
                       sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS rev,
                       date_diff('day', DATE '1970-01-01',
                                 date_trunc('day', ts)::DATE) AS day_idx
                FROM events WHERE event_type = 'purchase'
                GROUP BY date_trunc('day', ts)
            )
            SELECT day, floor(rev::DOUBLE / 1000000.0 * 100.0 + 0.5) / 100.0 AS revenue,
                   floor((sum(rev) OVER w)::DOUBLE / 1000000.0
                         / (count(*) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS avg_7d,
                   count(*) OVER w AS n_days
            FROM daily
            WINDOW w AS (ORDER BY day_idx
                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            ORDER BY day
        """,
        "max_concurrency": """
            WITH iv AS (
                SELECT date_trunc('day', ts) AS day,
                       ts AS start_ts,
                       ts + to_seconds(CAST(floor(value * 10) AS BIGINT))
                           AS end_ts
                FROM events
                WHERE event_type = 'view'
                  AND ts IS NOT NULL AND value IS NOT NULL
            ),
            deltas AS (
                SELECT day, start_ts AS ts, 1 AS delta FROM iv
                UNION ALL
                SELECT day, end_ts AS ts, -1 AS delta FROM iv
            ),
            net AS (
                SELECT day, ts, CAST(sum(delta) AS BIGINT) AS net
                FROM deltas GROUP BY day, ts
            ),
            prof AS (
                SELECT day,
                       CAST(sum(net) OVER (PARTITION BY day ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS INT) AS concurrent
                FROM net
            )
            SELECT day, max(concurrent) AS peak
            FROM prof GROUP BY day ORDER BY day
        """,
        "ols_trend": """
            WITH pts AS (
                SELECT event_type,
                       CAST(date_diff('day', DATE '2024-01-01', ts::DATE)
                            AS DECIMAL(19,6)) AS x,
                       CAST(value AS DECIMAL(19,6)) AS y
                FROM events
                WHERE ts IS NOT NULL AND value IS NOT NULL
            ),
            s AS (
                SELECT event_type, count(*) AS n,
                       sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
                       sum(x*x) AS sxx, sum(y*y) AS syy
                FROM pts GROUP BY event_type
            ),
            d AS (
                SELECT event_type, n,
                       n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS covn,
                       n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS varx,
                       n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS vary,
                       n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd
                FROM s
            )
            SELECT event_type, n,
                   round(CASE WHEN varx > 0 THEN covn / varx END, 6) AS slope,
                   round(CASE WHEN varx > 0
                         THEN (syd - (covn / varx) * sxd) / nd END, 6)
                       AS intercept,
                   round(CASE WHEN varx > 0 AND vary > 0
                         THEN (covn * covn) / (varx * vary) END, 6) AS r2
            FROM d ORDER BY event_type
        """,
        "corr_matrix": """
            WITH s AS (
                SELECT count(*) AS n,
                       sum(CAST(l_quantity AS DECIMAL(19,6))) AS s_q,
                       sum(CAST(l_extendedprice AS DECIMAL(19,6))) AS s_p,
                       sum(CAST(l_discount AS DECIMAL(19,6))) AS s_d,
                       sum(CAST(l_quantity AS DECIMAL(19,6))
                           * CAST(l_quantity AS DECIMAL(19,6))) AS s2_q,
                       sum(CAST(l_extendedprice AS DECIMAL(19,6))
                           * CAST(l_extendedprice AS DECIMAL(19,6))) AS s2_p,
                       sum(CAST(l_discount AS DECIMAL(19,6))
                           * CAST(l_discount AS DECIMAL(19,6))) AS s2_d,
                       sum(CAST(l_quantity AS DECIMAL(19,6))
                           * CAST(l_extendedprice AS DECIMAL(19,6))) AS sp_qp,
                       sum(CAST(l_quantity AS DECIMAL(19,6))
                           * CAST(l_discount AS DECIMAL(19,6))) AS sp_qd,
                       sum(CAST(l_extendedprice AS DECIMAL(19,6))
                           * CAST(l_discount AS DECIMAL(19,6))) AS sp_pd
                FROM lineitem
                WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  AND l_discount IS NOT NULL
            ),
            pairs AS (
                SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
                       n::DOUBLE * sp_qp::DOUBLE - s_q::DOUBLE * s_p::DOUBLE AS cov,
                       n::DOUBLE * s2_q::DOUBLE - s_q::DOUBLE * s_q::DOUBLE AS va,
                       n::DOUBLE * s2_p::DOUBLE - s_p::DOUBLE * s_p::DOUBLE AS vb
                FROM s
                UNION ALL
                SELECT 'l_quantity', 'l_discount', n,
                       n::DOUBLE * sp_qd::DOUBLE - s_q::DOUBLE * s_d::DOUBLE,
                       n::DOUBLE * s2_q::DOUBLE - s_q::DOUBLE * s_q::DOUBLE,
                       n::DOUBLE * s2_d::DOUBLE - s_d::DOUBLE * s_d::DOUBLE
                FROM s
                UNION ALL
                SELECT 'l_extendedprice', 'l_discount', n,
                       n::DOUBLE * sp_pd::DOUBLE - s_p::DOUBLE * s_d::DOUBLE,
                       n::DOUBLE * s2_p::DOUBLE - s_p::DOUBLE * s_p::DOUBLE,
                       n::DOUBLE * s2_d::DOUBLE - s_d::DOUBLE * s_d::DOUBLE
                FROM s
            )
            SELECT col_a, col_b, n,
                   round(CASE WHEN va > 0 AND vb > 0
                         THEN cov / sqrt(va * vb) END, 6) AS corr
            FROM pairs ORDER BY col_a, col_b
        """,
        "auc_score": """
            WITH ranked AS (
                SELECT date_trunc('day', ts) AS day,
                       (event_type = 'purchase') AS y,
                       rank() OVER (PARTITION BY date_trunc('day', ts)
                                    ORDER BY value ASC) AS r,
                       count(*) OVER (PARTITION BY date_trunc('day', ts),
                                      value) AS c
                FROM events
                WHERE value IS NOT NULL AND event_type IS NOT NULL
            ),
            a AS (
                SELECT day, count(*) AS n,
                       CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_pos,
                       CAST(sum(CASE WHEN y THEN 2*r + c - 1 END) AS BIGINT)
                           AS s2
                FROM ranked GROUP BY day
            )
            SELECT day, n, n_pos,
                   round(CASE WHEN n_pos > 0 AND n - n_pos > 0
                         THEN (s2 - n_pos*(n_pos+1))::DOUBLE
                              / (2*n_pos*(n - n_pos))::DOUBLE END, 6) AS auc
            FROM a ORDER BY day
        """,
        "golden_records": f"""
            {_SHINGLES.replace("WITH ", "WITH RECURSIVE ", 1)},
            ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
            sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
            p AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT doc_a, doc_b FROM p
                JOIN sizes na ON na.doc_id = doc_a
                JOIN sizes nb ON nb.doc_id = doc_b
                WHERE round(inter::DOUBLE / (na.n + nb.n - inter), 6) >= 0.5
            ),
            ee AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs
            ),
            reach(a, b) AS (
                SELECT a, b FROM ee
                UNION
                SELECT r.a, e.b FROM reach r JOIN ee e ON r.b = e.a
            ),
            groups AS (
                SELECT a AS doc_id, least(a, min(b)) AS group_id
                FROM reach GROUP BY a
            ),
            ranked AS (
                SELECT g.group_id, d.doc_id, d.source, d.n_chars,
                       row_number() OVER (PARTITION BY g.group_id
                           ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn,
                       count(*) OVER (PARTITION BY g.group_id) AS n_members
                FROM documents d JOIN groups g USING (doc_id)
            )
            SELECT group_id, doc_id, source, n_chars, n_members
            FROM ranked WHERE rn = 1 ORDER BY group_id
        """,
        "graph_kcore": f"""
            WITH ed AS MATERIALIZED ({_EDGES_SQL}),
            p AS (
                SELECT DISTINCT a.entity AS a, b.entity AS b
                FROM ed a JOIN ed b
                  ON a.fact_id = b.fact_id AND a.entity < b.entity
            ),
            e0 AS (SELECT a AS src, b AS dst FROM p
                   UNION ALL SELECT b, a FROM p),
            k1 AS (SELECT src FROM e0 GROUP BY src HAVING count(*) >= 3),
            e1 AS (SELECT e.src, e.dst FROM e0 e
                   JOIN k1 s ON e.src = s.src JOIN k1 t ON e.dst = t.src),
            k2 AS (SELECT src FROM e1 GROUP BY src HAVING count(*) >= 3),
            e2 AS (SELECT e.src, e.dst FROM e1 e
                   JOIN k2 s ON e.src = s.src JOIN k2 t ON e.dst = t.src),
            k3 AS (SELECT src FROM e2 GROUP BY src HAVING count(*) >= 3),
            e3 AS (SELECT e.src, e.dst FROM e2 e
                   JOIN k3 s ON e.src = s.src JOIN k3 t ON e.dst = t.src),
            k4 AS (SELECT src FROM e3 GROUP BY src HAVING count(*) >= 3),
            e4 AS (SELECT e.src, e.dst FROM e3 e
                   JOIN k4 s ON e.src = s.src JOIN k4 t ON e.dst = t.src)
            SELECT src AS vertex, count(*) AS degree
            FROM e4 GROUP BY src HAVING count(*) >= 3 ORDER BY vertex
        """,
        "domain_stats": f"""
            WITH base AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       string_split({_NORM}, ' ') AS toks,
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct
                FROM documents
            ),
            feat AS (
                SELECT doc_id, n_chars,
                       len(toks) AS n_tokens,
                       round(punct / greatest(n_chars, 1)::DOUBLE, 6) AS punct_ratio,
                       round(len(list_filter(toks, t -> list_contains({en}, t))) / greatest(len(toks), 1)::DOUBLE, 6) AS stopword_ratio,
                       round(len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE, 6) AS uniq_ratio
                FROM base
            ),
            scored AS (
                SELECT doc_id, n_chars,
                       (least(n_tokens * 10000, 1000000) * 25
                        + (1000000 - least(CAST(round(punct_ratio * 1000000) AS BIGINT) * 4, 1000000)) * 25
                        + least(CAST(round(stopword_ratio * 1000000) AS BIGINT) * 5, 1000000) * 20
                        + CAST(round(uniq_ratio * 1000000) AS BIGINT) * 30)::BIGINT AS q_e8
                FROM feat
            ),
            agg AS (
                SELECT d.source AS domain, count(*) AS n_docs,
                       round((sum(s.q_e8)::DOUBLE / count(*)) / 1e8, 6) AS mean_score,
                       round(sum(CAST(s.n_chars AS DECIMAL(18,6)))::DOUBLE / count(*), 2) AS mean_chars
                FROM scored s JOIN documents d USING (doc_id)
                GROUP BY d.source
            )
            SELECT domain, n_docs, mean_score, mean_chars,
                   (n_docs >= 10 AND mean_score >= 0.55) AS keep
            FROM agg ORDER BY domain
        """,
        "ab_welch": """
            WITH pts AS (
                SELECT date_trunc('day', ts) AS day, event_type,
                       CAST(value AS DECIMAL(19,6)) AS x
                FROM events
                WHERE event_type IN ('view', 'purchase')
                  AND value IS NOT NULL
            ),
            s AS (
                SELECT day,
                       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                       sum(CASE WHEN event_type = 'view' THEN x END) AS sa,
                       sum(CASE WHEN event_type = 'purchase' THEN x END) AS sb,
                       sum(CASE WHEN event_type = 'view' THEN x * x END) AS sa2,
                       sum(CASE WHEN event_type = 'purchase' THEN x * x END) AS sb2
                FROM pts GROUP BY day
            ),
            d AS (
                SELECT day, n_a, n_b,
                       n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
                       sa::DOUBLE AS sad, sb::DOUBLE AS sbd,
                       sa2::DOUBLE AS sa2d, sb2::DOUBLE AS sb2d
                FROM s
            ),
            m AS (
                SELECT day, n_a, n_b, na, nb,
                       sad / na AS mean_a, sbd / nb AS mean_b,
                       (sa2d - sad * (sad / na)) / (na - 1) AS va,
                       (sb2d - sbd * (sbd / nb)) / (nb - 1) AS vb
                FROM d
            ),
            e AS (
                SELECT day, n_a, n_b, na, nb, mean_a, mean_b,
                       va / na AS sea, vb / nb AS seb,
                       va / na + vb / nb AS se2
                FROM m
            )
            SELECT day, n_a, n_b,
                   round(mean_a, 6) AS mean_a,
                   round(mean_b, 6) AS mean_b,
                   round(mean_b - mean_a, 6) AS lift,
                   round(CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0
                         THEN (mean_b - mean_a) / sqrt(se2) END, 6) AS t_stat,
                   round(CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0
                         THEN (se2 * se2)
                              / (sea * sea / (na - 1) + seb * seb / (nb - 1))
                         END, 6) AS dof
            FROM e ORDER BY day
        """,
        "conversion_chi2": """
            WITH cells AS (
                SELECT date_trunc('day', ts) AS day, event_type AS arm,
                       CAST(count(*) AS BIGINT) AS rt,
                       CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS s
                FROM events WHERE (value > 100) IS NOT NULL
                GROUP BY 1, 2
            ),
            tot AS (
                SELECT day, arm, rt, s,
                       CAST(sum(rt) OVER (PARTITION BY day) AS BIGINT) AS n,
                       CAST(sum(s) OVER (PARTITION BY day) AS BIGINT) AS cs,
                       CAST(count(*) OVER (PARTITION BY day) AS BIGINT) AS n_arms
                FROM cells
            ),
            terms AS (
                SELECT day, n, n_arms,
                       CASE WHEN (rt::DOUBLE * cs::DOUBLE / n::DOUBLE) > 0
                             AND (rt::DOUBLE * (n::DOUBLE - cs::DOUBLE) / n::DOUBLE) > 0
                            THEN (s::DOUBLE - rt::DOUBLE * cs::DOUBLE / n::DOUBLE)
                                 * (s::DOUBLE - rt::DOUBLE * cs::DOUBLE / n::DOUBLE)
                                 / (rt::DOUBLE * cs::DOUBLE / n::DOUBLE)
                                 + ((rt::DOUBLE - s::DOUBLE) - rt::DOUBLE * (n::DOUBLE - cs::DOUBLE) / n::DOUBLE)
                                 * ((rt::DOUBLE - s::DOUBLE) - rt::DOUBLE * (n::DOUBLE - cs::DOUBLE) / n::DOUBLE)
                                 / (rt::DOUBLE * (n::DOUBLE - cs::DOUBLE) / n::DOUBLE)
                       END AS term
                FROM tot
            )
            SELECT day, n, n_arms,
                   CASE WHEN count(*) = count(term)
                        THEN sum(round(term, 6)::DECIMAL(28,6))::DOUBLE
                   END AS chi2,
                   CAST(n_arms - 1 AS BIGINT) AS dof
            FROM terms GROUP BY day, n, n_arms ORDER BY day
        """,
        "chi2_keywords": f"""
            WITH t AS (
                SELECT doc_id, lang AS label,
                       list_distinct(string_split({_NORM}, ' ')) AS toks
                FROM documents
            ),
            pres AS (
                SELECT doc_id, label, unnest(toks) AS term FROM t
            ),
            tl AS (
                SELECT term, label, CAST(count(*) AS BIGINT) AS a_
                FROM pres WHERE term <> '' GROUP BY 1, 2
            ),
            tdf AS (
                SELECT term, CAST(sum(a_) AS BIGINT) AS df_term
                FROM tl GROUP BY term HAVING sum(a_) >= 2
            ),
            ln_ AS (
                SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_label
                FROM documents GROUP BY lang
            ),
            n_tot AS (SELECT count(*) AS n FROM documents),
            scored AS (
                SELECT c.label, c.term, c.a_ AS n_with, d.df_term,
                       round(
                         CASE WHEN (c.a_ + (l.n_label - c.a_))::DOUBLE
                                 * ((d.df_term - c.a_) + ((SELECT n FROM n_tot) - l.n_label - d.df_term + c.a_))::DOUBLE
                                 * (c.a_ + (d.df_term - c.a_))::DOUBLE
                                 * ((l.n_label - c.a_) + ((SELECT n FROM n_tot) - l.n_label - d.df_term + c.a_))::DOUBLE > 0
                         THEN (SELECT n FROM n_tot)::DOUBLE
                              * (c.a_::DOUBLE * ((SELECT n FROM n_tot) - l.n_label - d.df_term + c.a_)::DOUBLE
                                 - (l.n_label - c.a_)::DOUBLE * (d.df_term - c.a_)::DOUBLE)
                              * (c.a_::DOUBLE * ((SELECT n FROM n_tot) - l.n_label - d.df_term + c.a_)::DOUBLE
                                 - (l.n_label - c.a_)::DOUBLE * (d.df_term - c.a_)::DOUBLE)
                              / ((c.a_ + (l.n_label - c.a_))::DOUBLE
                                 * ((d.df_term - c.a_) + ((SELECT n FROM n_tot) - l.n_label - d.df_term + c.a_))::DOUBLE
                                 * (c.a_ + (d.df_term - c.a_))::DOUBLE
                                 * ((l.n_label - c.a_) + ((SELECT n FROM n_tot) - l.n_label - d.df_term + c.a_))::DOUBLE)
                         END, 6) AS chi2
                FROM tl c JOIN tdf d USING (term) JOIN ln_ l USING (label)
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY label
                         ORDER BY chi2 DESC, term ASC) AS rank
                FROM scored
            )
            SELECT label, term, n_with, df_term, chi2, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 5 ORDER BY label, rank
        """,
        "global_shuffle": """
            SELECT doc_id,
                   md5('shuffle|' || doc_id::VARCHAR) AS shuffle_key,
                   CAST(row_number() OVER (
                        ORDER BY md5('shuffle|' || doc_id::VARCHAR), doc_id
                   ) AS INT) AS pos
            FROM documents ORDER BY pos
        """,
        "ohlc_hourly": """
            SELECT date_trunc('hour', ts) AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   min_by(value,
                          lpad((epoch_us(ts) + 4611686018427387904)::VARCHAR,
                               20, '0')
                          || lpad((event_id + 4611686018427387904)::VARCHAR,
                                  20, '0')) AS open,
                   max(value) AS high,
                   min(value) AS low,
                   max_by(value,
                          lpad((epoch_us(ts) + 4611686018427387904)::VARCHAR,
                               20, '0')
                          || lpad((event_id + 4611686018427387904)::VARCHAR,
                                  20, '0')) AS close,
                   round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE / count(*), 6)
                       AS mean_value
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL
            GROUP BY 1 ORDER BY bucket
        """,
        "ks_value": """
            WITH pts AS (
                SELECT date_trunc('day', ts) AS day, value AS v,
                       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS da,
                       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS db
                FROM events
                WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
                GROUP BY 1, 2
            ),
            cum AS (
                SELECT day,
                       sum(da) OVER (PARTITION BY day ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS ca,
                       sum(db) OVER (PARTITION BY day ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cb,
                       sum(da) OVER (PARTITION BY day) AS na,
                       sum(db) OVER (PARTITION BY day) AS nb
                FROM pts
            ),
            agg AS (
                SELECT day,
                       CAST(max(na) AS BIGINT) AS n_a,
                       CAST(max(nb) AS BIGINT) AS n_b,
                       CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS dnum
                FROM cum GROUP BY day
            )
            SELECT day, n_a, n_b,
                   round(CASE WHEN n_a > 0 AND n_b > 0
                         THEN dnum::DOUBLE / (n_a * n_b)::DOUBLE END, 6)
                       AS d_stat,
                   round(CASE WHEN n_a > 0 AND n_b > 0
                         THEN sqrt((n_a * n_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                              * (dnum::DOUBLE / (n_a * n_b)::DOUBLE) END, 6)
                       AS ks_scaled
            FROM agg ORDER BY day
        """,
        # threshold-bucket form (matches the windowless 100-TB scoring
        # in behavior.rfm_segments): boundaries = exact interpolated
        # percentiles spelled op-for-op via _pct_boundary_cte (NOT
        # quantile_cont — its interpolation can differ by an ulp when a
        # boundary lands ON a data value, which integer recency/
        # frequency hit routinely, flipping the strict >); score = 1 +
        # #boundaries strictly below; CASE WHEN (not ::INT) so NULL
        # metrics score 1 like Spark's otherwise(0)
        "rfm_segments": f"""
            WITH per_user AS (
                SELECT user_id,
                       date_diff('day', max(ts)::DATE, DATE '2024-02-01')
                           AS recency_days,
                       CAST(count(*) AS BIGINT) AS frequency,
                       round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 2)
                           AS monetary
                FROM events GROUP BY user_id
            ),
            {_pct_boundary_cte("rb", "recency_days", [i / 5 for i in range(1, 5)])},
            {_pct_boundary_cte("fb", "frequency", [i / 5 for i in range(1, 5)])},
            {_pct_boundary_cte("mb", "monetary", [i / 5 for i in range(1, 5)])}
            SELECT user_id, recency_days, frequency, monetary,
                   CAST(6 - (1 {" ".join(f"+ CASE WHEN recency_days > rb.b{i} THEN 1 ELSE 0 END" for i in range(1, 5))})
                        AS INT) AS r_score,
                   CAST(1 {" ".join(f"+ CASE WHEN frequency > fb.b{i} THEN 1 ELSE 0 END" for i in range(1, 5))}
                        AS INT) AS f_score,
                   CAST(1 {" ".join(f"+ CASE WHEN monetary > mb.b{i} THEN 1 ELSE 0 END" for i in range(1, 5))}
                        AS INT) AS m_score,
                   (6 - (1 {" ".join(f"+ CASE WHEN recency_days > rb.b{i} THEN 1 ELSE 0 END" for i in range(1, 5))}))::VARCHAR
                   || (1 {" ".join(f"+ CASE WHEN frequency > fb.b{i} THEN 1 ELSE 0 END" for i in range(1, 5))})::VARCHAR
                   || (1 {" ".join(f"+ CASE WHEN monetary > mb.b{i} THEN 1 ELSE 0 END" for i in range(1, 5))})::VARCHAR
                       AS segment
            FROM per_user CROSS JOIN rb CROSS JOIN fb CROSS JOIN mb
            ORDER BY user_id
        """,
        "revenue_gini": """
            WITH ranked AS (
                SELECT event_type,
                       CAST(value AS DECIMAL(19,6)) AS x,
                       CAST(row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC) AS DECIMAL(18,0)) AS i
                FROM events WHERE value IS NOT NULL
            ),
            agg AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                       sum(x) AS sx, sum(i * x) AS six
                FROM ranked GROUP BY event_type
            )
            SELECT event_type, n,
                   round(sx::DOUBLE, 2) AS total,
                   round(CASE WHEN sx > 0
                         THEN 2.0 * six::DOUBLE / (n::DOUBLE * sx::DOUBLE)
                              - (n::DOUBLE + 1.0) / n::DOUBLE END, 6) AS gini
            FROM agg ORDER BY event_type
        """,
        "emb_quantize": """
            WITH base AS (
                SELECT vec_id, embedding::DOUBLE[] AS v
                FROM embeddings WHERE vec_id < 200
            ),
            scaled AS (
                SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) / 127.0
                           AS q8_scale
                FROM base
            )
            SELECT vec_id, q8_scale,
                   generate_subscripts(v, 1) - 1 AS pos,
                   CASE WHEN q8_scale > 0
                        THEN CAST(floor(unnest(v) / q8_scale + 0.5) AS INT)
                        ELSE 0 END AS code
            FROM scaled ORDER BY vec_id, pos
        """,
        "readability": """
            SELECT doc_id,
                   greatest(len(regexp_extract_all(lower(text), '[^\\s]+')), 1)
                       AS n_words,
                   greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                       AS n_sentences,
                   len(regexp_extract_all(lower(text), '[aeiouy]+'))
                       AS n_syllables,
                   round(206.835
                         - 1.015 * (greatest(len(regexp_extract_all(lower(text), '[^\\s]+')), 1)::DOUBLE
                                    / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::DOUBLE)
                         - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE
                                   / greatest(len(regexp_extract_all(lower(text), '[^\\s]+')), 1)::DOUBLE),
                         6) AS flesch_ease,
                   round(0.39 * (greatest(len(regexp_extract_all(lower(text), '[^\\s]+')), 1)::DOUBLE
                                 / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::DOUBLE)
                         + 11.8 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE
                                   / greatest(len(regexp_extract_all(lower(text), '[^\\s]+')), 1)::DOUBLE)
                         - 15.59, 6) AS fk_grade
            FROM documents ORDER BY doc_id
        """,
        "session_paths": """
            WITH flagged AS (
                SELECT user_id, ts, event_id, event_type,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                    > 1800000000
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sess AS (
                SELECT user_id, ts, event_id, event_type,
                       sum(new_session) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged
            ),
            paths AS (
                SELECT array_to_string(
                           list_slice(
                               list(event_type ORDER BY ts, event_id), 1, 10
                           ), '>') AS path,
                       CAST(least(count(*), 10) AS INT) AS n_steps
                FROM sess GROUP BY user_id, sid
            ),
            counted AS (
                SELECT path, n_steps, CAST(count(*) AS BIGINT) AS n_sessions
                FROM paths GROUP BY path, n_steps
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                           ORDER BY n_sessions DESC, path ASC) AS rank
                FROM counted
            )
            SELECT path, n_steps, n_sessions, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 20 ORDER BY rank
        """,
        "type_entropy": """
            WITH cells AS (
                SELECT date_trunc('day', ts) AS day, event_type,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM events WHERE event_type IS NOT NULL
                GROUP BY 1, 2
            ),
            tot AS (
                SELECT day, event_type, cnt,
                       CAST(sum(cnt) OVER (PARTITION BY day) AS BIGINT) AS n
                FROM cells
            ),
            agg AS (
                SELECT day, max(n) AS n,
                       CAST(count(*) AS BIGINT) AS n_distinct,
                       sum(round(-(cnt::DOUBLE / n::DOUBLE)
                                 * ln(cnt::DOUBLE / n::DOUBLE), 6)
                           ::DECIMAL(28,6)) AS h
                FROM tot GROUP BY day
            )
            SELECT day, n, n_distinct,
                   round(h::DOUBLE, 6) AS entropy,
                   CASE WHEN n_distinct > 1
                        THEN round(h::DOUBLE / ln(n_distinct::DOUBLE), 6)
                        ELSE 0.0 END AS entropy_norm
            FROM agg ORDER BY day
        """,
        "doc_containment": f"""
            {_SHINGLES},
            -- join on the SAME 120-bit two-half md5 digest Spark
            -- joins on (_digest120), so even a digest collision
            -- produces identical counts
            ex AS (SELECT doc_id,
                          ('0x' || substr(md5(s), 1, 15))::BIGINT AS h1,
                          ('0x' || substr(md5(s), 17, 15))::BIGINT AS h2
                   FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
            sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
            p AS (
                SELECT a.doc_id AS doc_inner, b.doc_id AS doc_outer,
                       CAST(count(*) AS BIGINT) AS inter
                FROM ex a JOIN ex b
                  ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id <> b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_inner, doc_outer,
                   CAST(na.n AS INT) AS n_inner, inter,
                   round(inter::DOUBLE / na.n, 6) AS containment
            FROM p JOIN sizes na ON na.doc_id = doc_inner
            WHERE round(inter::DOUBLE / na.n, 6) >= 0.5 AND na.n > 0
            ORDER BY doc_inner, doc_outer
        """,
        "attribution_linear": """
            WITH touches AS (
                SELECT user_id AS u, event_type AS channel, ts AS t_ts
                FROM events WHERE event_type IN ('view', 'click')
            ),
            convs AS (
                SELECT user_id AS u, ts AS c_ts, event_id AS c_id,
                       value AS c_value
                FROM events WHERE event_type = 'purchase'
            ),
            pairs AS (
                SELECT t.channel, t.u, c.c_id, c.c_value
                FROM touches t JOIN convs c
                  ON t.u = c.u AND t.t_ts <= c.c_ts
                 AND t.t_ts >= c.c_ts - INTERVAL 60 MINUTES
            ),
            credited AS (
                SELECT channel, u, c_id,
                       round(c_value / (count(*) OVER (PARTITION BY u, c_id)),
                             6)::DECIMAL(18,6) AS credit
                FROM pairs
            )
            SELECT channel,
                   CAST(count(*) AS BIGINT) AS n_touches,
                   CAST(count(DISTINCT (u, c_id)) AS BIGINT) AS n_conversions,
                   round(sum(credit)::DOUBLE, 6) AS credit
            FROM credited GROUP BY channel ORDER BY channel
        """,
        "knn_labels": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id < 20
            ),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS raw
                FROM embeddings e CROSS JOIN q
            ),
            top AS (
                SELECT query_id, vec_id FROM (
                    SELECT query_id, vec_id,
                           row_number() OVER (PARTITION BY query_id
                               ORDER BY raw DESC, vec_id ASC) AS rank
                    FROM scored
                ) WHERE rank <= 5
            ),
            votes AS (
                SELECT t.query_id, e.label AS lbl,
                       CAST(count(*) AS BIGINT) AS votes
                FROM top t JOIN embeddings e USING (vec_id)
                GROUP BY 1, 2
            ),
            ranked AS (
                SELECT query_id, lbl, votes,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY votes DESC, lbl ASC) AS rn,
                       CAST(sum(votes) OVER (PARTITION BY query_id) AS BIGINT)
                           AS n_neighbors
                FROM votes
            )
            SELECT query_id, lbl AS pred_label, votes, n_neighbors
            FROM ranked WHERE rn = 1 ORDER BY query_id
        """,
        "lang_psi": """
            WITH cells AS (
                SELECT source AS slice, lang AS cat,
                       CAST(count(*) AS BIGINT) AS n_pc
                FROM documents GROUP BY 1, 2
            ),
            st AS (SELECT slice, CAST(sum(n_pc) AS BIGINT) AS n_p
                   FROM cells GROUP BY slice),
            gl AS (SELECT cat, CAST(sum(n_pc) AS BIGINT) AS n_qc
                   FROM cells GROUP BY cat),
            nq AS (SELECT count(*) AS n FROM documents),
            grid AS (
                SELECT st.slice, gl.cat, st.n_p, gl.n_qc,
                       coalesce(c.n_pc, 0) AS n_pc
                FROM st CROSS JOIN gl
                LEFT JOIN cells c ON c.slice = st.slice AND c.cat = gl.cat
            ),
            terms AS (
                SELECT slice, n_p,
                       (greatest(n_pc / n_p::DOUBLE, 1::DOUBLE / 10000::DOUBLE)
                        - greatest(n_qc / (SELECT n FROM nq)::DOUBLE,
                                   1::DOUBLE / 10000::DOUBLE))
                       * ln(greatest(n_pc / n_p::DOUBLE,
                                     1::DOUBLE / 10000::DOUBLE)
                            / greatest(n_qc / (SELECT n FROM nq)::DOUBLE,
                                       1::DOUBLE / 10000::DOUBLE)) AS term
                FROM grid
            )
            SELECT slice, max(n_p) AS n_rows,
                   round(sum(round(term, 6)::DECIMAL(28,6))::DOUBLE, 6) AS psi
            FROM terms GROUP BY slice ORDER BY slice
        """,
        "bm25_ndcg": f"""
            WITH res AS (
                SELECT 1 AS query_id, doc_id,
                       CAST(row_number() OVER (
                            ORDER BY score DESC, doc_id ASC) AS INT) AS rank
                FROM ({BM25_ORACLE_BODY})
            ),
            rel AS (
                SELECT 1 AS query_id, doc_id,
                       len(list_intersect(
                           list_distinct(string_split({_NORM}, ' ')),
                           ['hash', 'join', 'vector'])) AS rel
                FROM documents
                WHERE len(list_intersect(
                          list_distinct(string_split({_NORM}, ' ')),
                          ['hash', 'join', 'vector'])) > 0
            ),
            dcg AS (
                SELECT r.query_id,
                       sum(round((pow(2.0, coalesce(j.rel, 0)::DOUBLE) - 1.0)
                                 / log2(r.rank::DOUBLE + 1.0), 6)
                           ::DECIMAL(28,6)) AS dcg_d
                FROM res r LEFT JOIN rel j
                  ON r.query_id = j.query_id AND r.doc_id = j.doc_id
                GROUP BY r.query_id
            ),
            ideal AS (
                SELECT query_id,
                       sum(round((pow(2.0, rel::DOUBLE) - 1.0)
                                 / log2(irank::DOUBLE + 1.0), 6)
                           ::DECIMAL(28,6)) AS idcg_d
                FROM (
                    SELECT query_id, rel,
                           row_number() OVER (PARTITION BY query_id
                               ORDER BY rel DESC, doc_id ASC) AS irank
                    FROM rel WHERE rel > 0
                ) WHERE irank <= 20
                GROUP BY query_id
            )
            SELECT d.query_id,
                   round(d.dcg_d::DOUBLE, 6) AS dcg,
                   round(i.idcg_d::DOUBLE, 6) AS idcg,
                   round(CASE WHEN i.idcg_d > 0
                         THEN d.dcg_d::DOUBLE / i.idcg_d::DOUBLE END, 6)
                       AS ndcg
            FROM dcg d LEFT JOIN ideal i USING (query_id)
            ORDER BY query_id
        """,
        "graph_hits": """
            WITH e AS MATERIALIZED (
                SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src,
                       's' || l_suppkey::VARCHAR AS dst
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            ),
            v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e),
            h0 AS MATERIALIZED (SELECT vertex, 1000000000000::HUGEINT AS h FROM v),
            a1r AS MATERIALIZED (
                SELECT v.vertex, coalesce(sum(h0.h), 0)::HUGEINT AS a
                FROM v LEFT JOIN e ON e.dst = v.vertex
                LEFT JOIN h0 ON h0.vertex = e.src
                GROUP BY v.vertex
            ),
            a1m AS MATERIALIZED (SELECT max(a) AS m FROM a1r),
            a1 AS MATERIALIZED (
                SELECT vertex,
                       CASE WHEN m > 0 THEN (a * 1000000000000::HUGEINT) // m
                            ELSE 0::HUGEINT END AS a
                FROM a1r, a1m
            ),
            h1r AS MATERIALIZED (
                SELECT v.vertex, coalesce(sum(a1.a), 0)::HUGEINT AS h
                FROM v LEFT JOIN e ON e.src = v.vertex
                LEFT JOIN a1 ON a1.vertex = e.dst
                GROUP BY v.vertex
            ),
            h1m AS MATERIALIZED (SELECT max(h) AS m FROM h1r),
            h1 AS MATERIALIZED (
                SELECT vertex,
                       CASE WHEN m > 0 THEN (h * 1000000000000::HUGEINT) // m
                            ELSE 0::HUGEINT END AS h
                FROM h1r, h1m
            ),            a2r AS MATERIALIZED (
                SELECT v.vertex, coalesce(sum(h1.h), 0)::HUGEINT AS a
                FROM v LEFT JOIN e ON e.dst = v.vertex
                LEFT JOIN h1 ON h1.vertex = e.src
                GROUP BY v.vertex
            ),
            a2m AS MATERIALIZED (SELECT max(a) AS m FROM a2r),
            a2 AS MATERIALIZED (
                SELECT vertex,
                       CASE WHEN m > 0 THEN (a * 1000000000000::HUGEINT) // m
                            ELSE 0::HUGEINT END AS a
                FROM a2r, a2m
            ),
            h2r AS MATERIALIZED (
                SELECT v.vertex, coalesce(sum(a2.a), 0)::HUGEINT AS h
                FROM v LEFT JOIN e ON e.src = v.vertex
                LEFT JOIN a2 ON a2.vertex = e.dst
                GROUP BY v.vertex
            ),
            h2m AS MATERIALIZED (SELECT max(h) AS m FROM h2r),
            h2 AS MATERIALIZED (
                SELECT vertex,
                       CASE WHEN m > 0 THEN (h * 1000000000000::HUGEINT) // m
                            ELSE 0::HUGEINT END AS h
                FROM h2r, h2m
            ),            a3r AS MATERIALIZED (
                SELECT v.vertex, coalesce(sum(h2.h), 0)::HUGEINT AS a
                FROM v LEFT JOIN e ON e.dst = v.vertex
                LEFT JOIN h2 ON h2.vertex = e.src
                GROUP BY v.vertex
            ),
            a3m AS MATERIALIZED (SELECT max(a) AS m FROM a3r),
            a3 AS MATERIALIZED (
                SELECT vertex,
                       CASE WHEN m > 0 THEN (a * 1000000000000::HUGEINT) // m
                            ELSE 0::HUGEINT END AS a
                FROM a3r, a3m
            ),
            h3r AS MATERIALIZED (
                SELECT v.vertex, coalesce(sum(a3.a), 0)::HUGEINT AS h
                FROM v LEFT JOIN e ON e.src = v.vertex
                LEFT JOIN a3 ON a3.vertex = e.dst
                GROUP BY v.vertex
            ),
            h3m AS MATERIALIZED (SELECT max(h) AS m FROM h3r),
            h3 AS MATERIALIZED (
                SELECT vertex,
                       CASE WHEN m > 0 THEN (h * 1000000000000::HUGEINT) // m
                            ELSE 0::HUGEINT END AS h
                FROM h3r, h3m
            )
            SELECT v.vertex,
                   CAST(h3.h AS BIGINT) AS hub_scaled,
                   CAST(a3.a AS BIGINT) AS auth_scaled
            FROM v JOIN h3 ON h3.vertex = v.vertex
            JOIN a3 ON a3.vertex = v.vertex
            ORDER BY v.vertex
        """,
        "value_cusum": """
            WITH base AS (
                SELECT event_type,
                       CAST(round(value * 1000000) AS BIGINT) AS v,
                       CAST(row_number() OVER w AS BIGINT) AS i,
                       sum(CAST(round(value * 1000000) AS BIGINT))
                           OVER (w ROWS UNBOUNDED PRECEDING) AS pre,
                       CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                           OVER (PARTITION BY event_type) AS BIGINT) AS tot,
                       CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                           AS n
                FROM events
                WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
            ),
            dev AS (
                SELECT event_type, i, n,
                       abs(pre - i * (CASE WHEN tot < 0
                           THEN -((abs(tot) - abs(tot) % n) // n)
                           ELSE (abs(tot) - abs(tot) % n) // n END)) AS a
                FROM base
            ),
            mx AS (
                SELECT event_type, max(a) AS m, max(n) AS n_obs FROM dev
                GROUP BY event_type
            )
            SELECT d.event_type, CAST(m.n_obs AS BIGINT) AS n_obs,
                   round(m.m::DOUBLE / 1000000.0, 6) AS cusum_max,
                   CAST(min(d.i) AS INT) AS change_pos
            FROM dev d JOIN mx m
              ON d.event_type = m.event_type AND d.a = m.m
            GROUP BY d.event_type, m.n_obs, m.m
            ORDER BY d.event_type
        """,
        "lang_source_assoc": """
            WITH cells AS (
                SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS o
                FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
                GROUP BY 1, 2
            ),
            rm AS (SELECT a, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY a),
            cm AS (SELECT b, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY b),
            nn AS (SELECT count(*) AS n FROM documents
                   WHERE lang IS NOT NULL AND source IS NOT NULL),
            grid AS (
                SELECT rm.a, cm.b, rm.rt, cm.ct, coalesce(c.o, 0) AS o
                FROM rm CROSS JOIN cm
                LEFT JOIN cells c ON c.a = rm.a AND c.b = cm.b
            ),
            terms AS (
                SELECT a, b,
                       CASE WHEN rt::DOUBLE * ct::DOUBLE
                                 / (SELECT n FROM nn)::DOUBLE > 0
                            THEN (o::DOUBLE - rt::DOUBLE * ct::DOUBLE
                                  / (SELECT n FROM nn)::DOUBLE)
                                 * (o::DOUBLE - rt::DOUBLE * ct::DOUBLE
                                    / (SELECT n FROM nn)::DOUBLE)
                                 / (rt::DOUBLE * ct::DOUBLE
                                    / (SELECT n FROM nn)::DOUBLE)
                       END AS term
                FROM grid
            ),
            agg AS (
                SELECT CAST(count(DISTINCT a) AS BIGINT) AS n_rows_cat,
                       CAST(count(DISTINCT b) AS BIGINT) AS n_cols_cat,
                       count(*) AS cells_n, count(term) AS ok_n,
                       sum(round(term, 6)::DECIMAL(28,6)) AS chi2_d
                FROM terms
            )
            SELECT (SELECT n FROM nn) AS n, n_rows_cat, n_cols_cat,
                   CASE WHEN ok_n = cells_n THEN chi2_d::DOUBLE END AS chi2,
                   (n_rows_cat - 1) * (n_cols_cat - 1) AS dof,
                   round(CASE WHEN ok_n = cells_n
                              AND least(n_rows_cat - 1, n_cols_cat - 1) > 0
                         THEN sqrt(chi2_d::DOUBLE
                              / ((SELECT n FROM nn)::DOUBLE
                                 * least(n_rows_cat - 1,
                                         n_cols_cat - 1)::DOUBLE))
                         END, 6) AS cramers_v
            FROM agg
        """,
        "active_users": """
            WITH ud AS (
                SELECT DISTINCT user_id AS u,
                       date_diff('day', DATE '1970-01-01', ts::DATE) AS d
                FROM events
            ),
            days AS (SELECT DISTINCT d AS day_idx FROM ud),
            dau AS (
                SELECT d AS day_idx,
                       CAST(count(DISTINCT u) AS BIGINT) AS dau
                FROM ud GROUP BY d
            ),
            wau AS (
                SELECT day_idx, CAST(count(DISTINCT u) AS BIGINT) AS wau
                FROM ud JOIN days ON d <= day_idx AND d > day_idx - 7
                GROUP BY day_idx
            ),
            mau AS (
                SELECT day_idx, CAST(count(DISTINCT u) AS BIGINT) AS mau
                FROM ud JOIN days ON d <= day_idx AND d > day_idx - 28
                GROUP BY day_idx
            )
            SELECT (DATE '1970-01-01' + CAST(day_idx AS INT))::TIMESTAMP AS day,
                   dau, wau, mau
            FROM dau JOIN wau USING (day_idx) JOIN mau USING (day_idx)
            ORDER BY day
        """,
        "dow_profile": """
            WITH per AS (
                SELECT CAST(dayofweek(ts) + 1 AS INT) AS bucket,
                       CAST(count(*) AS BIGINT) AS n,
                       sum(CAST(value AS DECIMAL(19,6))) AS s
                FROM events WHERE value IS NOT NULL GROUP BY 1
            ),
            tot AS (
                SELECT sum(s) AS st, CAST(sum(n) AS BIGINT) AS nt FROM per
            )
            SELECT bucket, n,
                   round(s::DOUBLE / n::DOUBLE, 6) AS mean_value,
                   round((s::DOUBLE / n::DOUBLE)
                         / (st::DOUBLE / nt::DOUBLE), 6) AS seasonal_index
            FROM per, tot ORDER BY bucket
        """,
        "bm25_recall": f"""
            WITH res AS (
                SELECT 1 AS query_id, doc_id,
                       CAST(row_number() OVER (
                            ORDER BY score DESC, doc_id ASC) AS INT) AS rank
                FROM ({BM25_ORACLE_BODY})
            ),
            rel AS (
                SELECT 1 AS query_id, doc_id
                FROM documents
                WHERE len(list_intersect(
                          list_distinct(string_split({_NORM}, ' ')),
                          ['hash', 'join', 'vector'])) > 0
            ),
            nrel AS (
                SELECT query_id, CAST(count(*) AS BIGINT) AS nr FROM rel
                GROUP BY query_id
            ),
            j AS (
                SELECT r.query_id, r.rank,
                       CASE WHEN jr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS h
                FROM res r LEFT JOIN rel jr
                  ON r.query_id = jr.query_id AND r.doc_id = jr.doc_id
                WHERE r.rank <= 20
            ),
            agg AS (
                SELECT query_id,
                       CAST(count(*) AS BIGINT) AS n_retrieved,
                       CAST(sum(h) AS BIGINT) AS n_hits,
                       min(CASE WHEN h = 1 THEN rank END) AS frank
                FROM j GROUP BY query_id
            )
            SELECT a.query_id, a.n_retrieved, a.n_hits,
                   round(a.n_hits::DOUBLE / a.n_retrieved::DOUBLE, 6)
                       AS precision_at_k,
                   round(CASE WHEN n.nr > 0
                         THEN a.n_hits::DOUBLE / n.nr::DOUBLE END, 6)
                       AS recall_at_k,
                   round(CASE WHEN a.frank IS NOT NULL
                         THEN 1.0 / a.frank::DOUBLE
                         WHEN n.nr > 0 THEN 0.0 END, 6) AS mrr_at_k
            FROM agg a LEFT JOIN nrel n USING (query_id)
            ORDER BY a.query_id
        """,
        "value_benford": """
            WITH base AS (
                SELECT event_type,
                       CAST(substr(
                           regexp_replace(
                               regexp_replace(
                                   CAST(CAST(abs(value) AS DECIMAL(19,6))
                                        AS VARCHAR),
                                   '[.]', '', 'g'),
                               '^0+', ''),
                           1, 1) AS INT) AS d
                FROM events
                WHERE value IS NOT NULL
                  AND CAST(abs(value) AS DECIMAL(19,6)) > 0
            ),
            totals AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n
                FROM base GROUP BY 1
            ),
            grid AS (
                SELECT t.event_type, t.n, g.d
                FROM totals t CROSS JOIN
                     (SELECT unnest(range(1, 10)) AS d) g
            ),
            cells AS (
                SELECT event_type, d, CAST(count(*) AS BIGINT) AS o
                FROM base GROUP BY 1, 2
            ),
            filled AS (
                -- zero-cell-complete: every (group, digit 1..9) cell,
                -- absent digits contribute the full (0-E)^2/E = E term
                SELECT g.event_type, g.n, g.d, coalesce(c.o, 0) AS o
                FROM grid g LEFT JOIN cells c
                  ON g.event_type IS NOT DISTINCT FROM c.event_type
                 AND g.d = c.d
            )
            SELECT event_type, max(n) AS n,
                   round(sum(round(
                       (o::DOUBLE - n::DOUBLE * log10(1.0 + 1.0 / d::DOUBLE))
                       * (o::DOUBLE - n::DOUBLE * log10(1.0 + 1.0 / d::DOUBLE))
                       / (n::DOUBLE * log10(1.0 + 1.0 / d::DOUBLE)), 6)
                       ::DECIMAL(28,6))::DOUBLE, 6) AS chi2_benford
            FROM filled GROUP BY event_type ORDER BY event_type
        """,
        "corpus_interleave": """
            WITH kept AS (
                SELECT doc_id, lang FROM documents
                WHERE lang IN ('en', 'de', 'fr', 'es')
            ),
            r AS (
                SELECT doc_id, lang,
                       CAST(row_number() OVER (PARTITION BY lang
                            ORDER BY md5('interleave|' || doc_id::VARCHAR),
                                     doc_id) AS INT) AS mix_rank
                FROM kept
            )
            SELECT doc_id, lang, mix_rank,
                   CAST(mix_rank * (CASE lang WHEN 'en' THEN 1 ELSE 3 END)
                        AS BIGINT) AS mix_key
            FROM r ORDER BY mix_key, lang, mix_rank
        """,
        "value_acf": """
            WITH lagged AS (
                SELECT event_type,
                       CAST(value AS DECIMAL(19,6)) AS x,
                       lag(CAST(value AS DECIMAL(19,6)), 1) OVER w AS l1,
                       lag(CAST(value AS DECIMAL(19,6)), 7) OVER w AS l7
                FROM events
                WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
            ),
            s1 AS (
                SELECT event_type, 1 AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
                       sum(x) AS sx, sum(l1) AS sy, sum(x * l1) AS sxy,
                       sum(x * x) AS sxx, sum(l1 * l1) AS syy
                FROM lagged WHERE l1 IS NOT NULL GROUP BY event_type
            ),
            s7 AS (
                SELECT event_type, 7 AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
                       sum(x) AS sx, sum(l7) AS sy, sum(x * l7) AS sxy,
                       sum(x * x) AS sxx, sum(l7 * l7) AS syy
                FROM lagged WHERE l7 IS NOT NULL GROUP BY event_type
            ),
            u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s7)
            SELECT event_type, lag, n_pairs,
                   round(CASE WHEN (n_pairs::DOUBLE * sxx::DOUBLE
                                    - sx::DOUBLE * sx::DOUBLE) > 0
                              AND (n_pairs::DOUBLE * syy::DOUBLE
                                   - sy::DOUBLE * sy::DOUBLE) > 0
                              AND n_pairs > 1
                         THEN (n_pairs::DOUBLE * sxy::DOUBLE
                               - sx::DOUBLE * sy::DOUBLE)
                              / sqrt((n_pairs::DOUBLE * sxx::DOUBLE
                                      - sx::DOUBLE * sx::DOUBLE)
                                     * (n_pairs::DOUBLE * syy::DOUBLE
                                        - sy::DOUBLE * sy::DOUBLE))
                         END, 6) AS acf
            FROM u ORDER BY event_type, lag
        """,
        "graph_walks": f"""
            WITH ed AS MATERIALIZED ({_EDGES_SQL}),
            p AS (
                SELECT DISTINCT a.entity AS a, b.entity AS b
                FROM ed a JOIN ed b
                  ON a.fact_id = b.fact_id AND a.entity < b.entity
            ),
            e AS (SELECT a AS v, b AS n FROM p UNION SELECT b, a FROM p),
            adj AS (
                SELECT v, n,
                       row_number() OVER (PARTITION BY v ORDER BY n) - 1 AS i,
                       count(*) OVER (PARTITION BY v) AS deg
                FROM e
            ),
            verts AS (SELECT v FROM e UNION SELECT n FROM e),
            f0 AS (SELECT v || '#0' AS walk_id, v AS vertex FROM verts),
            f1 AS (
                SELECT f0.walk_id, adj.n AS vertex
                FROM f0 JOIN adj ON adj.v = f0.vertex
                 AND adj.i = ('0x' || substr(md5('walk|0|' || f0.vertex
                              || '|1'), 1, 15))::BIGINT % adj.deg
            ),
            f2 AS (
                SELECT f1.walk_id, adj.n AS vertex
                FROM f1 JOIN adj ON adj.v = f1.vertex
                 AND adj.i = ('0x' || substr(md5('walk|0|' || f1.vertex
                              || '|2'), 1, 15))::BIGINT % adj.deg
            ),
            f3 AS (
                SELECT f2.walk_id, adj.n AS vertex
                FROM f2 JOIN adj ON adj.v = f2.vertex
                 AND adj.i = ('0x' || substr(md5('walk|0|' || f2.vertex
                              || '|3'), 1, 15))::BIGINT % adj.deg
            )
            SELECT walk_id, CAST(step AS INT) AS step, vertex FROM (
                SELECT walk_id, 0 AS step, vertex FROM f0
                UNION ALL SELECT walk_id, 1, vertex FROM f1
                UNION ALL SELECT walk_id, 2, vertex FROM f2
                UNION ALL SELECT walk_id, 3, vertex FROM f3
            ) ORDER BY walk_id, step
        """,
        "privacy_audit": """
            SELECT c_nationkey, c_mktsegment,
                   CAST(count(*) AS BIGINT) AS group_size,
                   CAST(count(DISTINCT CASE WHEN c_acctbal < 0
                        THEN 'neg' ELSE 'pos' END) AS BIGINT) AS n_sensitive,
                   (count(*) < 5) AS k_violation,
                   (count(DISTINCT CASE WHEN c_acctbal < 0
                        THEN 'neg' ELSE 'pos' END) < 2) AS l_violation
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
            ORDER BY c_nationkey, c_mktsegment
        """,
        "ppmi_terms": f"""
            WITH t AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks
                FROM documents
            ),
            toks AS (
                SELECT doc_id, unnest(toks) AS term,
                       generate_subscripts(toks, 1) AS pos
                FROM t
            ),
            toks_ne AS (SELECT * FROM toks WHERE term <> ''),
            vocab AS (
                SELECT term FROM toks_ne GROUP BY term
                ORDER BY count(*) DESC, term ASC LIMIT 50
            ),
            vt AS (
                SELECT tk.doc_id, tk.term, tk.pos
                FROM toks_ne tk JOIN vocab v USING (term)
            ),
            ctx AS (
                SELECT vt.doc_id, vt.term AS term_a,
                       vt.pos + o.o AS pos
                FROM vt CROSS JOIN (
                    SELECT unnest([-2, -1, 1, 2]) AS o
                ) o
            ),
            pairs AS (
                SELECT c.term_a, v2.term AS term_b,
                       CAST(count(*) AS BIGINT) AS n_ab
                FROM ctx c JOIN vt v2
                  ON v2.doc_id = c.doc_id AND v2.pos = c.pos
                GROUP BY 1, 2
            ),
            ma AS (SELECT term_a, CAST(sum(n_ab) AS BIGINT) AS na
                   FROM pairs GROUP BY term_a),
            mb AS (SELECT term_b, CAST(sum(n_ab) AS BIGINT) AS nb
                   FROM pairs GROUP BY term_b),
            tt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS t FROM pairs)
            SELECT p.term_a, p.term_b, p.n_ab,
                   round(greatest(
                       ln(p.n_ab::DOUBLE * (SELECT t FROM tt)::DOUBLE
                          / (ma.na::DOUBLE * mb.nb::DOUBLE)), 0.0), 6)
                       AS ppmi
            FROM pairs p JOIN ma USING (term_a) JOIN mb USING (term_b)
            ORDER BY term_a, term_b
        """,
    }
    return {name: _events_us_truncated(sql) for name, sql in out.items()}
