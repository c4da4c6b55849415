"""Deterministic synthetic-table generator for scale testing beyond
the driver's read-only /root/testdata (sf0.001/0.01/0.1).

Generates ALL ten contract tables at an arbitrary scale factor with
the same SCHEMAS as the driver data and qualitatively similar
structure — planted exact/near duplicates in `documents`, clustered
`embeddings`, multi-language text, a part table whose name cardinality
GROWS with sf (~8 parts per name; the first 64 names keep the driver
fixture's suffix-free color-object form so entity lookups match) — so
every contract query runs
meaningfully and `tools/check_oracle.py <dir> <queries...>` validates
Spark vs DuckDB on the SAME files at sf1+ (the oracle compares the
two engines on identical input; it does not require the driver's
exact rows).

Everything is a pure JVM column expression over spark.range — no
driver-side data, no Python row loops — so sf1 (6M lineitem) generates
in seconds and sf100 would generate the same way on a cluster.

Usage: python tools/gen_sf.py <sf> [out_dir]
  default out_dir = spark-warehouse/sf<sf> (gitignored scratch).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

COLORS = ["red", "blue", "green", "ivory", "plum", "azure", "khaki", "coral"]
OBJECTS = ["widget", "bolt", "ring", "gear", "cog", "pin", "cap", "rod"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "en", "es", "fr", "de", "zh"]  # en-weighted like the driver mix
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "con", "una", "por"],
    "fr": ["le", "la", "les", "des", "est", "dans", "une", "pour"],
    "de": ["der", "die", "das", "und", "ist", "mit", "ein", "nicht"],
    "zh": ["the", "and", "of", "to", "in", "is", "that", "with"],
}
VOCAB_SIZE = 2000  # large enough that shared shingles mean real overlap
# Real words mixed into the hash vocabulary so the lexical-retrieval
# contract queries (bm25_topk searches {hash, join, vector}, the
# ngram/keyword families) return non-vacuous results on generated data.
REAL_WORDS = [
    "hash", "join", "vector", "table", "scan", "spark", "query", "index",
    "merge", "sort", "batch", "window", "filter", "shuffle", "row", "key",
]
EMB_DIM = 64
EMB_CLUSTERS = 10


def _h(col: str, salt: str, m: int):
    """Deterministic uniform int in [0, m) from (column, salt)."""
    return F.pmod(F.xxhash64(F.concat_ws("|", F.col(col).cast("string"), F.lit(salt))), F.lit(m))


def _pick(arr, idx_col):
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (idx_col + 1).cast("int"))


def gen_all(spark, sf: float, out: str) -> None:
    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_supp = max(int(10_000 * sf), 10)
    n_part = max(int(200_000 * sf), 64)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"  {name}: done", file=sys.stderr)

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write(
        spark.createDataFrame(
            [(i, r) for i, r in enumerate(regions)], "r_regionkey int, r_name string"
        ),
        "region",
    )
    write(
        spark.range(25).select(
            F.col("id").cast("int").alias("n_nationkey"),
            F.concat(F.lit("nation"), F.col("id")).alias("n_name"),
            _h("id", "nreg", 5).cast("int").alias("n_regionkey"),
        ),
        "nation",
    )
    write(
        spark.range(n_cust).select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
            _h("id", "cnat", 25).cast("int").alias("c_nationkey"),
            ((_h("id", "cbal", 1_100_000) - 100_000) / 100.0).alias("c_acctbal"),
            _pick(SEGMENTS, _h("id", "cseg", 5)).alias("c_mktsegment"),
        ),
        "customer",
    )
    write(
        spark.range(n_supp).select(
            F.col("id").alias("s_suppkey"),
            F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
            _h("id", "snat", 25).cast("int").alias("s_nationkey"),
            ((_h("id", "sbal", 1_100_000) - 100_000) / 100.0).alias("s_acctbal"),
        ),
        "supplier",
    )
    # p_name cardinality must GROW with sf (real catalogs add names as
    # they add parts): the driver fixture's fixed 64 color-object names
    # made every same-name group Θ(n) docs, so fuzzy_name_pairs' TRUE
    # output was quadratic by construction (627M pairs at sf1 — an
    # adversarial cardinality no real corpus has). Names are bucketed
    # into max(64, n_part/8) groups (~8 parts per name at any sf); the
    # first 64 groups keep the legacy suffix-free names so the entity
    # point lookups ('blue rod') stay non-vacuous, the rest append a
    # ' g<gid>' suffix. Near-pairs arise naturally and stay bounded:
    # two suffixed names are within edit distance 2 iff they share
    # color+object (gid ≡ mod 64) and their gid digits differ by ≤2
    # edits — a small constant per name.
    p_gid = _h("id", "pgrp", max(64, n_part // 8))
    p_base = F.concat(
        _pick(COLORS, F.pmod(p_gid, 8)),
        F.lit(" "),
        _pick(OBJECTS, F.pmod((p_gid / 8).cast("long"), 8)),
    )
    write(
        spark.range(n_part).select(
            F.col("id").alias("p_partkey"),
            F.when(p_gid < 64, p_base)
            .otherwise(F.concat(p_base, F.lit(" g"), p_gid))
            .alias("p_name"),
            F.concat(F.lit("Brand#"), (_h("id", "pbr", 25) + 1)).alias("p_brand"),
            _pick(PTYPES, _h("id", "pty", 5)).alias("p_type"),
            (_h("id", "psz", 50) + 1).cast("int").alias("p_size"),
            ((_h("id", "prp", 99_000) + 1_000) / 100.0).alias("p_retailprice"),
        ),
        "part",
    )
    write(
        spark.range(n_ord).select(
            F.col("id").alias("o_orderkey"),
            _h("id", "ocust", max(n_cust, 1)).alias("o_custkey"),
            _pick(["F", "O", "P"], _h("id", "ost", 3)).alias("o_orderstatus"),
            ((_h("id", "otp", 45_000_000) + 90_000) / 100.0).alias("o_totalprice"),
            F.timestamp_seconds(
                F.lit(789_004_800) + _h("id", "odt", 2400) * 86_400
            ).alias("o_orderdate"),  # 1995-01-02 .. ~2001-07
            _pick(PRIORITIES, _h("id", "opr", 5)).alias("o_orderpriority"),
        ),
        "orders",
    )
    write(
        spark.range(n_li).select(
            _h("id", "lord", max(n_ord, 1)).alias("l_orderkey"),
            _h("id", "lprt", max(n_part, 1)).alias("l_partkey"),
            _h("id", "lsup", max(n_supp, 1)).alias("l_suppkey"),
            (_h("id", "lln", 7) + 1).cast("int").alias("l_linenumber"),
            (_h("id", "lqty", 50) + 1).cast("double").alias("l_quantity"),
            ((_h("id", "lep", 9_900_000) + 100_000) / 100.0).alias("l_extendedprice"),
            (_h("id", "ldis", 11) / 100.0).alias("l_discount"),
            (_h("id", "ltax", 9) / 100.0).alias("l_tax"),
            _pick(["A", "N", "R"], _h("id", "lrf", 3)).alias("l_returnflag"),
            _pick(["F", "O"], _h("id", "lls", 2)).alias("l_linestatus"),
            F.timestamp_seconds(
                F.lit(789_091_200) + _h("id", "lsd", 2500) * 86_400
            ).alias("l_shipdate"),
        ),
        "lineitem",
    )
    write(
        spark.range(n_evt).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1_704_067_200)
                + _h("id", "ets", 30 * 86_400)
                + _h("id", "ems", 1000) / 1000.0
            ).alias("ts"),  # Jan 2024
            _h("id", "eus", max(n_evt // 10, 1)).alias("user_id"),
            _pick(EVENT_TYPES, _h("id", "ety", 5)).alias("event_type"),
            F.when(
                _h("id", "envl", 10) == 0, F.lit(None).cast("double")
            ).otherwise((_h("id", "evl", 100_000) / 100.0)).alias("value"),
            F.concat(F.lit('{"k": '), _h("id", "epr", 100), F.lit("}")).alias(
                "props"
            ),
        ),
        "events",
    )

    # documents: hash-vocab text with per-lang stopwords woven in,
    # planted exact dups (id % 50 == 1 copies id-1) and near dups /
    # containments (id % 50 == 2 is id-2's text plus a tail token)
    vocab = F.array(
        *[F.lit(w) for w in REAL_WORDS],
        *[
            F.concat(F.lit("w"), F.lit(str(i)))
            for i in range(VOCAB_SIZE - len(REAL_WORDS))
        ],
    )
    base_id = (
        F.when(F.col("id") % 50 == 1, F.col("id") - 1)
        .when(F.col("id") % 50 == 2, F.col("id") - 2)
        .otherwise(F.col("id"))
    )
    lang_idx = F.pmod(
        F.xxhash64(F.concat_ws("|", base_id.cast("string"), F.lit("dlang"))),
        F.lit(len(LANGS)),
    )
    n_toks = (
        F.pmod(
            F.xxhash64(F.concat_ws("|", base_id.cast("string"), F.lit("dlen"))),
            F.lit(60),
        )
        + 20
    )
    sw = F.array(
        *[
            F.array(*[F.lit(w) for w in STOPWORDS[lang]])
            for lang in ["en", "en", "es", "fr", "de", "zh"]
        ]
    )
    bid = base_id.cast("string")
    tok = lambda i: F.when(  # noqa: E731 — every 3rd token is a stopword
        i % 3 == F.lit(0),
        F.element_at(
            F.element_at(sw, (lang_idx + 1).cast("int")),
            (F.pmod(F.xxhash64(F.concat_ws("|", bid, F.lit("sw"), i.cast("string"))), F.lit(8)) + 1).cast("int"),
        ),
    ).otherwise(
        F.element_at(
            vocab,
            (F.pmod(F.xxhash64(F.concat_ws("|", bid, F.lit("tk"), i.cast("string"))), F.lit(VOCAB_SIZE)) + 1).cast("int"),
        )
    )
    text = F.array_join(F.transform(F.sequence(F.lit(1), n_toks), tok), " ")
    text = F.when(F.col("id") % 50 == 2, F.concat(text, F.lit(" tailmark"))).otherwise(
        text
    )
    write(
        spark.range(n_doc).select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            _pick(["en", "en", "es", "fr", "de", "zh"], lang_idx).alias("lang"),
            F.concat(F.lit("src"), _h("id", "dsrc", 20)).alias("source"),
            F.length(text).alias("n_chars"),
        ),
        "documents",
    )

    # embeddings: noise-dominated vectors with a MILD cluster bias plus
    # PLANTED duplicates (vec_id % 50 == 1 copies vec_id − 1 exactly,
    # % 50 == 2 perturbs one coordinate of vec_id − 2). The first
    # design (tight blobs: |center| ≫ |noise|) made every same-cluster
    # pair a cosine near-duplicate, so near-dup joins had a TRUE
    # output quadratic in cluster size — 125 M pairs at sf1, an
    # uncollectable oracle check. Realistic corpora have sparse
    # near-dup structure; planted pairs give exactly that while the
    # mild bias keeps k-means/semantic clustering non-trivial.
    ebase = (
        F.when(F.col("id") % 50 == 1, F.col("id") - 1)
        .when(F.col("id") % 50 == 2, F.col("id") - 2)
        .otherwise(F.col("id"))
    )
    label = F.pmod(
        F.xxhash64(F.concat_ws("|", ebase.cast("string"), F.lit("elab"))),
        F.lit(EMB_CLUSTERS),
    )
    dims = F.sequence(F.lit(0), F.lit(EMB_DIM - 1))
    ebid = ebase.cast("string")
    center = lambda j: (  # noqa: E731 — mild bias in [0, 0.5)
        F.pmod(
            F.xxhash64(F.concat_ws("|", label.cast("string"), F.lit("ec"), j.cast("string"))),
            F.lit(500),
        )
        / 1000.0
    )
    noise = lambda j: (  # noqa: E731 — dominant noise in [-1, 1)
        F.pmod(
            F.xxhash64(F.concat_ws("|", ebid, F.lit("en"), j.cast("string"))),
            F.lit(2000),
        )
        / 1000.0
        - 1.0
    )
    perturb = lambda j: F.when(  # noqa: E731 — near-dup: nudge dim 0 only
        (F.col("id") % 50 == 2) & (j == F.lit(0)), F.lit(0.01)
    ).otherwise(F.lit(0.0))
    write(
        spark.range(n_doc).select(
            F.col("id").alias("vec_id"),
            F.transform(
                dims, lambda j: (center(j) + noise(j) + perturb(j)).cast("float")
            ).alias("embedding"),
            label.cast("int").alias("label"),
        ),
        "embeddings",
    )


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, "spark-warehouse", f"sf{sf:g}")
    )
    from hippollm_spark.session import get_spark

    spark = get_spark("gen_sf")
    os.makedirs(out, exist_ok=True)
    gen_all(spark, sf, out)
    print(out)


if __name__ == "__main__":
    main()
