"""Training-mix operators: deterministic stratified sampling, sequence
packing, cross-corpus contamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hippollm_spark.operators import sampling
from hippollm_spark.operators.dedup import cross_jaccard_pairs


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"doc number {i} with some shared filler text tokens", "en" if i % 2 else "fr")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string").cache()


def test_stratified_sample_exact_sizes_and_determinism(corpus):
    s1 = sampling.stratified_sample(corpus, strata_col="lang", n_per_stratum=5)
    s2 = sampling.stratified_sample(corpus, strata_col="lang", n_per_stratum=5)
    ids1 = sorted((r["lang"], r["doc_id"]) for r in s1.collect())
    ids2 = sorted((r["lang"], r["doc_id"]) for r in s2.collect())
    assert ids1 == ids2  # bit-for-bit reproducible
    per = {}
    for lang, _ in ids1:
        per[lang] = per.get(lang, 0) + 1
    assert per == {"en": 5, "fr": 5}


def test_stratified_sample_threshold_windowless(corpus):
    # threshold mode: binomial-sized, but deterministic and subset-stable
    out = sampling.stratified_sample(
        corpus, strata_col="lang", n_per_stratum=10, method="threshold"
    )
    rows = out.collect()
    assert 0 < len(rows) < 40
    again = sampling.stratified_sample(
        corpus, strata_col="lang", n_per_stratum=10, method="threshold"
    )
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_pack_sequences_offsets_and_chunks(spark):
    rows = [(i, "a", 100) for i in range(10)]  # 10 docs x 100 tokens, one shard
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    packed = sampling.pack_sequences(docs, ctx=256, shard_col="lang").collect()
    by_id = {r["doc_id"]: r for r in packed}
    # exclusive running sum: doc i starts at 100*i; chunk = start // 256
    for i in range(10):
        assert by_id[i]["start_offset"] == 100 * i
        assert by_id[i]["chunk_id"] == (100 * i) // 256
    # chunk boundaries: docs 0-2 chunk 0, 3-5 chunk 1, 6-7 chunk 2, 8-9 chunk 3
    assert [by_id[i]["chunk_id"] for i in range(10)] == [0, 0, 0, 1, 1, 1, 2, 2, 3, 3]


def test_pack_sequences_null_token_count_is_zero(spark):
    # A NULL n_tokens row must still get a defined start/chunk (counts
    # as 0 tokens) — regression for the r03 prefix-sum rewrite, which
    # briefly produced NULL start_offset for such rows.
    rows = [(0, "en", 100), (1, "en", None), (2, "en", 50)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    by_id = {
        r["doc_id"]: r
        for r in sampling.pack_sequences(docs, ctx=64, shard_col="lang").collect()
    }
    assert by_id[1]["start_offset"] == 100 and by_id[1]["chunk_id"] == 1
    assert by_id[2]["start_offset"] == 100  # NULL contributed nothing
    assert all(r["start_offset"] is not None for r in by_id.values())


def test_pack_summary_token_conservation(spark):
    rows = [(i, "en" if i % 2 else "fr", 37 + i) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    packed = sampling.pack_sequences(docs, ctx=128, shard_col="lang")
    summ = sampling.pack_summary(packed, shard_col="lang")
    total = summ.agg(F.sum("chunk_tokens"), F.sum("n_docs")).first()
    assert total[0] == sum(37 + i for i in range(30))
    assert total[1] == 30


def test_cross_jaccard_finds_planted_contamination(spark):
    bench = spark.createDataFrame(
        [(1000, "the secret benchmark question about spark shuffles")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the secret benchmark question about spark shuffles"),  # leaked
            (2, "an innocent training document about cooking pasta"),
        ],
        "doc_id long, text string",
    )
    hits = cross_jaccard_pairs(corpus, bench, threshold=0.8).collect()
    assert [(r["corpus_id"], r["bench_id"], r["jaccard"]) for r in hits] == [
        (1, 1000, 1.0)
    ]


def test_curate_corpus_end_to_end(spark):
    """Composed curation pipeline over a corpus with every defect class:
    a low-quality doc, an exact dup, a near-dup chain, and a benchmark
    leak — exactly one clean survivor group must remain."""
    from hippollm_spark.pipelines.curate import curate_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "rests with the dog in the warm sun of the meadow"
    )
    near = good.replace("meadow", "field")
    leak = (
        "the secret benchmark question is about the spark shuffle and "
        "the answer is in the catalyst optimizer with the codegen"
    )
    rows = [
        (1, good, "en", "s", len(good)),
        (2, good, "en", "s", len(good)),            # exact dup of 1
        (3, near, "en", "s", len(near)),            # near-dup of 1
        (5, "x y z", "en", "s", 5),                 # fails quality gate
        (7, leak, "en", "s", len(leak)),            # contaminated vs 20
        (9, "een doc zonder bekende stopwoorden hier", "nl", "s", 40),  # 'und'
        (20, leak, "en", "s", len(leak)),           # benchmark slice (20 % 20 == 0)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = curate_corpus(docs, min_quality_e8=50_000_000).collect()
    # survivors: doc 1 only (2 exact-dropped, 3 near-dropped, 5 quality,
    # 7 decontaminated, 9 language, 20 held out)
    assert len(out) == 1
    assert out[0]["lang"] == "en" and out[0]["n_docs"] == 1
    assert out[0]["n_chunks"] == 1


def test_curate_corpus_semantic_stage(spark):
    """The SemDeDup stage prunes members within eps of their cluster's
    keeper but never the keeper itself; eps=0 keeps everything (every
    non-keeper is farther than 0 unless identical), a huge eps keeps
    exactly one doc per cluster present in the clean set; omitting the
    knob reproduces the plain pipeline; asking for it without
    embeddings raises."""
    import pytest

    from hippollm_spark.pipelines.curate import curate_corpus

    texts = {
        1: "the quick brown fox jumps over the lazy dog in the meadow of the farm",
        3: "the spark catalyst optimizer is the engine that plans the query with the codegen",
        9: "the rain in the north falls on the hills and the rivers run to the sea",
        11: "the cat sleeps with the dog near the fire and the mouse watches the cheese",
    }
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # two tight semantic clusters: {1, 11} near (1,0), {3, 9} near (0,1)
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (11, [1.01, 0.02]),
            (3, [0.0, 1.0]),
            (9, [0.02, 1.01]),
        ],
        "vec_id long, embedding array<float>",
    )
    plain = curate_corpus(docs, min_quality_e8=50_000_000).collect()
    assert plain[0]["n_docs"] == 4

    # eps large enough to swallow each cluster -> one keeper per cluster
    pruned = curate_corpus(
        docs,
        min_quality_e8=50_000_000,
        embeddings=emb,
        semantic_eps_e12=10**10,
        semantic_k=2,
        semantic_iterations=2,
    ).collect()
    assert pruned[0]["n_docs"] == 2

    # eps=0: nothing inside the radius, everything survives
    keep_all = curate_corpus(
        docs,
        min_quality_e8=50_000_000,
        embeddings=emb,
        semantic_eps_e12=0,
        semantic_k=2,
        semantic_iterations=2,
    ).collect()
    assert keep_all[0]["n_docs"] == 4

    with pytest.raises(ValueError, match="embeddings"):
        curate_corpus(docs, semantic_eps_e12=1).collect()


def test_curate_corpus_with_shingle_cap_same_result(spark):
    """The stop-shingle skew guard must not change the outcome when the
    cap is above every real shingle's document frequency."""
    from hippollm_spark.pipelines.curate import curate_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "rests with the dog in the warm sun of the meadow"
    )
    rows = [
        (1, good, "en", "s", len(good)),
        (2, good.replace("meadow", "field"), "en", "s", len(good)),
        (3, "a completely different story about the spark optimizer and the "
            "catalyst engine with many of the tokens", "en", "s", 100),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    base = sorted(
        map(tuple, curate_corpus(docs, min_quality_e8=50_000_000).collect())
    )
    capped = sorted(
        map(
            tuple,
            curate_corpus(
                docs, min_quality_e8=50_000_000, max_shingle_df=10
            ).collect(),
        )
    )
    assert base == capped and len(base) == 1


def test_temperature_sample_flattens_mix(spark):
    # head stratum 'a' is 16x the tail 'b'; tau=0.5 compresses the
    # expected ratio to sqrt(16) = 4x
    rows = [(i, "a") for i in range(1600)] + [(2000 + i, "b") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.temperature_sample(
        docs, strata_col="lang", tau=0.5, total_n=400
    ).collect()
    per = {}
    for r in out:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    # expected: a = 400*40/(40+10) = 320, b = 400*10/50 = 80 (binomial)
    assert 250 < per["a"] < 390
    assert 50 < per["b"] < 100
    assert 2.5 < per["a"] / per["b"] < 6  # flattened from 16x toward 4x
    # deterministic
    again = sampling.temperature_sample(
        docs, strata_col="lang", tau=0.5, total_n=400
    ).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def test_curate_corpus_with_boilerplate_stage(spark):
    """Optional stage 0: shared boilerplate blocks are stripped before
    scoring, so every downstream count reflects the CLEANED text."""
    from hippollm_spark.pipelines.curate import curate_corpus

    boiler = " ".join(f"w{i}" for i in range(10))
    good = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "rests with the dog in the warm sun of the meadow"
    )
    rows = [
        (1, f"{good}", "en", "s", 1),
        (3, f"{boiler} the end", "en", "s", 1),   # boilerplate + 2 tokens
        (5, f"{boiler} the fin", "en", "s", 1),
        (7, f"{boiler} the cut", "en", "s", 1),
        (9, f"{boiler} the tip", "en", "s", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = curate_corpus(
        docs, min_quality_e8=50_000_000, boilerplate_seg_tokens=10
    ).collect()
    # raw corpus = 22 + 4x12 = 70 tokens; after stripping the shared
    # 10-token block from docs 3..9, the summary must count ~32
    # (without the stage the stubs would instead be near-dup collapsed —
    # 10 of their 12 tokens are the shared block — so the cleaned run is
    # the one where all 5 distinct documents survive)
    assert len(out) == 1 and out[0]["n_docs"] == 5
    assert out[0]["n_tokens"] < 40


def test_curate_corpus_minhash_path_same_result(spark):
    """The 100-TB near-dup path (MinHash+LSH pair generation) must
    agree with the exact-Jaccard path on a corpus whose near-dups are
    unambiguous (128-hash signatures on ~0.9-Jaccard pairs collide in
    at least one of 32 bands with probability ~1)."""
    from hippollm_spark.pipelines.curate import curate_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "rests with the dog in the warm sun of the meadow"
    )
    near = good.replace("meadow", "field")
    rows = [
        (1, good, "en", "s", len(good)),
        (2, good, "en", "s", len(good)),
        (3, near, "en", "s", len(near)),
        (21, "the spark engine shuffles data with the sort and the hash "
             "and the merge in the exchange of the plan", "en", "s", 100),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    a = sorted(map(tuple, curate_corpus(docs, min_quality_e8=50_000_000).collect()))
    b = sorted(map(tuple, curate_corpus(
        docs, min_quality_e8=50_000_000, near_dup_method="minhash"
    ).collect()))
    assert a == b
    assert len(a) == 1 and a[0][1] == 2  # docs 1 and 21 survive


def test_hash_split_deterministic_and_partitioned(spark, documents):
    from hippollm_spark.operators.sampling import hash_split

    a = hash_split(documents).select("doc_id", "split").collect()
    b = hash_split(documents.repartition(7)).select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = {}
    for _, s in a:
        counts[s] = counts.get(s, 0) + 1
    n = len(a)
    assert set(counts) == {"train", "val", "test"}
    # uniform hash: within loose tolerance of the 80/10/10 request
    assert abs(counts["train"] / n - 0.8) < 0.05
    assert abs(counts["val"] / n - 0.1) < 0.04
    # a different salt re-rolls membership
    c = hash_split(documents, salt="v2").select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_hash_split_validates_inputs(spark, documents):
    import pytest as _pytest

    from hippollm_spark.operators.sampling import hash_split

    with _pytest.raises(ValueError):
        hash_split(documents, fractions=(0.5, 0.2), labels=("a", "b", "c"))
    with _pytest.raises(ValueError):
        hash_split(documents, fractions=(0.5, 0.2, 0.2), labels=("a", "b", "c"))


def test_weighted_sample_prefers_heavy_weights(spark):
    from pyspark.sql import functions as F

    from hippollm_spark.operators.sampling import weighted_sample

    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 10.0).otherwise(1.0).alias("w"),
    )
    out = weighted_sample(df, "w", n=1000, id_col="doc_id")
    assert out.count() == 1000
    heavy = out.filter("w = 10.0").count()
    # ES inclusion odds ~ proportional to weight: expect ~85-90% heavy
    assert heavy > 750, heavy


def test_weighted_sample_deterministic_and_stable_under_repartition(spark):
    from pyspark.sql import functions as F

    from hippollm_spark.operators.sampling import weighted_sample

    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    a = {r["doc_id"] for r in weighted_sample(df, "w", n=200).collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(17), "w", n=200).collect()
    }
    assert a == b and len(a) == 200


def test_weighted_sample_grouped_matches_window_reference(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hippollm_spark.operators.sampling import rank_hash, weighted_sample

    df = spark.range(3_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") % 5 + 1).cast("double").alias("w"),
    )
    out = weighted_sample(df, "w", n=50, by="lang")
    got = {(r["lang"], r["doc_id"]) for r in out.collect()}
    assert out.columns == ["doc_id", "lang", "w"]
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"0": 50, "1": 50, "2": 50}

    # distributed_rank selection must equal the plain window form
    u = (rank_hash("doc_id").cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    key = F.round(-F.log(u), 6) / F.col("w")
    w = Window.partitionBy("lang").orderBy(F.col("__k__").asc(), F.col("doc_id").asc())
    ref = (
        df.withColumn("__k__", key)
        .withColumn("__rn__", F.row_number().over(w))
        .filter("__rn__ <= 50")
    )
    want = {(r["lang"], r["doc_id"]) for r in ref.collect()}
    assert got == want


def test_upsample_deterministic_and_exact(spark):
    import hashlib

    from hippollm_spark.operators.sampling import upsample

    df = spark.createDataFrame(
        [(i, "t") for i in range(200)], "doc_id long, text string"
    )
    got = upsample(df, 2.3).groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in got}
    for i in range(200):
        h = int(
            hashlib.md5(f"{i}:up".encode()).hexdigest()[:15], 16
        )
        want = 2 + (1 if h % 1_000_000 < 300_000 else 0)
        assert counts[i] == want
    # rerun reproduces exactly
    again = {r["doc_id"]: r["count"]
             for r in upsample(df, 2.3).groupBy("doc_id").count().collect()}
    assert counts == again
    # copy_idx is dense 0..n-1
    rows = upsample(df, 2.3).filter("doc_id = 0").collect()
    assert sorted(r["copy_idx"] for r in rows) == list(range(len(rows)))


def test_upsample_zero_and_per_row_factor(spark):
    from pyspark.sql import functions as F

    from hippollm_spark.operators.sampling import upsample

    df = spark.createDataFrame(
        [(1, "keep"), (2, "drop")], "doc_id long, kind string"
    )
    out = upsample(
        df,
        0.0,
        factor_col=F.when(F.col("kind") == "keep", 2.0).otherwise(0.0),
    ).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert len(out) == 2


def test_length_batches(spark):
    from hippollm_spark.operators.sampling import length_batches

    df = spark.createDataFrame(
        [(i, 10 + i) for i in range(100)], "doc_id long, n_chars long"
    )
    got = length_batches(df, "n_chars", 4, n_buckets=5).collect()
    by_batch: dict = {}
    for r in got:
        by_batch.setdefault(r["batch_id"], []).append(r)
    # every full batch holds 4 rows with near-equal lengths
    for rows in by_batch.values():
        assert len(rows) <= 4
        lens = [r["n_chars"] for r in rows]
        assert max(lens) - min(lens) <= 25  # bounded by bucket spread
        assert sorted(r["pos_in_batch"] for r in rows) == list(range(len(rows)))
    # deterministic
    again = length_batches(df, "n_chars", 4, n_buckets=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_negative_samples(spark):
    import hashlib

    from hippollm_spark.operators.sampling import negative_samples

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], "query_id long, pos_id long"
    )
    got = negative_samples(pairs, 100, k=3).collect()
    assert len(got) == 6
    for r in got:
        assert 0 <= r["neg_id"] < 100
        assert r["neg_id"] != r["pos_id"]
        h = int(
            hashlib.md5(f"{r['query_id']}:{r['slot']}:neg".encode()).hexdigest()[:15],
            16,
        )
        raw = h % 100
        want = (raw + 1) % 100 if raw == r["pos_id"] else raw
        assert r["neg_id"] == want


def test_global_shuffle_deterministic_and_salted(spark):
    from hippollm_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(50)], "doc_id long, text string"
    )
    a = [r["doc_id"] for r in global_shuffle(df).collect()]
    b = [r["doc_id"] for r in global_shuffle(df.repartition(7)).collect()]
    assert a == b  # partitioning-independent
    assert a != sorted(a)  # actually permuted
    c = [r["doc_id"] for r in global_shuffle(df, salt="epoch2").collect()]
    assert c != a  # new salt = new permutation
    assert sorted(c) == sorted(a)


def test_global_shuffle_sharded_concat_matches_global_order(spark):
    from hippollm_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    flat = [r["doc_id"] for r in global_shuffle(df).collect()]
    sharded = global_shuffle(df, shards=8)
    # concatenating shards in shard order reproduces the global order
    parts = sharded.withColumn(
        "pid", F.spark_partition_id()
    ).orderBy("pid", "shuffle_key").collect()
    assert [r["doc_id"] for r in parts] == flat


def test_cap_per_group_deterministic_uniform_cap(spark):
    from hippollm_spark.operators.sampling import cap_per_group

    rows = [(i, "hot" if i < 300 else f"cold{i % 5}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_group(df, "source", 20)
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["hot"]) == 20            # hot domain capped
    for s, rs in by_src.items():
        n_src = 300 if s == "hot" else len([x for x in rows if x[1] == s])
        assert len(rs) == min(20, n_src)
        assert sorted(r["cap_rank"] for r in rs) == list(
            range(1, len(rs) + 1)
        )
    # rerun-identical and partitioning-independent
    again = {
        (r["doc_id"], r["cap_rank"])
        for r in cap_per_group(df.repartition(13), "source", 20).collect()
    }
    first = {(r["doc_id"], r["cap_rank"]) for r in out.collect()}
    assert first == again


def test_pack_bins_ffd_invariants(spark):
    from hippollm_spark.operators.sampling import pack_bins_ffd

    rows = [(i, "en" if i % 2 else "de", (i * 97) % 900 + 50) for i in range(200)]
    rows.append((999, "en", 5000))  # oversized
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = pack_bins_ffd(df, budget=2048).collect()
    by_bin: dict[tuple, int] = {}
    for r in out:
        by_bin[(r["lang"], r["bin_id"])] = by_bin.get((r["lang"], r["bin_id"]), 0) + r["n_tokens"]
    for (lang, b), tot in by_bin.items():
        docs_in_bin = [r for r in out if r["lang"] == lang and r["bin_id"] == b]
        if not any(r["oversized"] for r in docs_in_bin):
            assert tot <= 2048, (lang, b, tot)
        # bin_fill reports the final fill of the doc's bin
        assert all(r["bin_fill"] == tot for r in docs_in_bin)
    big = next(r for r in out if r["doc_id"] == 999)
    assert big["oversized"] and big["bin_fill"] == 5000
    # every doc packed exactly once; deterministic under repartition
    assert len(out) == len(rows)
    again = pack_bins_ffd(df.repartition(7), budget=2048).collect()
    assert sorted((r["doc_id"], r["bin_id"]) for r in out) == sorted(
        (r["doc_id"], r["bin_id"]) for r in again
    )


def test_pack_bins_ffd_beats_naive_order(spark):
    """FFD uses no more bins than first-fit in arrival order on a
    crafted adversarial set."""
    from hippollm_spark.operators.sampling import pack_bins_ffd

    sizes = [1100, 600, 500, 1000, 900, 400, 450, 1048]
    df = spark.createDataFrame(
        [(i, "x", s) for i, s in enumerate(sizes)],
        "doc_id long, lang string, n_tokens long",
    )
    out = pack_bins_ffd(df, budget=2048).collect()
    n_bins = len({r["bin_id"] for r in out})
    assert n_bins <= 3  # FFD: (1100+900)(1048+1000)(600+500+450+400)


def test_uniform_sample_k_exact_and_stable(spark):
    from hippollm_spark.operators.sampling import uniform_sample_k

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(500)], "doc_id long, lang string"
    )
    out = uniform_sample_k(df, 50).collect()
    assert len(out) == 50
    a = sorted(r["doc_id"] for r in out)
    b = sorted(
        r["doc_id"] for r in uniform_sample_k(df.repartition(11), 50).collect()
    )
    assert a == b  # partitioning-independent
    c = sorted(
        r["doc_id"] for r in uniform_sample_k(df, 50, salt="other").collect()
    )
    assert a != c  # re-salting re-rolls the sample
    plan = uniform_sample_k(df, 50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
