"""Structured Streaming: windowed aggregation and session windows over
a finite file source match their batch twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hippollm_spark.streaming import events as SE


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Materialize the ns-typed testdata events as µs-timestamp parquet
    (what a streaming drop folder would contain)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_windowed_counts_stream_matches_batch(spark, event_dir):
    stream = SE.read_event_stream(spark, event_dir, max_files_per_trigger=2)
    agg = SE.windowed_counts(stream, window="1 hour")
    SE.run_to_memory(agg, "win_out", output_mode="complete")
    got = spark.sql(
        "SELECT window_start, event_type, n_events FROM win_out"
    ).collect()

    batch = SE.windowed_counts(spark.read.parquet(event_dir), window="1 hour")
    want = batch.select("window_start", "event_type", "n_events").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0


def test_sessionize_stream_runs(spark, event_dir):
    stream = SE.read_event_stream(spark, event_dir)
    sess = SE.sessionize(stream, gap="30 minutes")
    SE.run_to_memory(sess, "sess_out", output_mode="complete")
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert len(rows) > 0
    # session windows never overlap per user (checked driver-side)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 <= s2, f"overlapping sessions {s1}-{e1} vs {s2}"


def test_sessionize_batch_matches_sessionization_query(spark, event_dir):
    """The streaming session_window on static data agrees with the
    lag+cumsum batch sessionization in the driver contract."""
    ev = spark.read.parquet(event_dir)
    sess = SE.sessionize(ev, gap="30 minutes")
    per_user = (
        sess.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    )
    import __spark_entry__ as E

    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in E.q_sessionization(spark, "/root/testdata/sf0.001").collect()
    }
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in per_user}
    assert got == want


def test_watermark_drops_late_event(spark, tmp_path):
    """Append-mode watermark semantics: an event arriving after the
    watermark has passed its window's end is DROPPED, not merged —
    the late-data contract windowed_counts advertises."""
    drop = str(tmp_path / "drops")
    schema = SE.EVENTS_DDL

    def write_file(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{drop}/{name}")

    import datetime as dt

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    # batch 1: three on-time events in [10:00, 10:10) + one at 11:00 that
    # advances the watermark to 10:50, sealing the first window
    write_file(
        [
            (1, t(10, 0), 1, "click", 1.0, "{}"),
            (2, t(10, 2), 1, "click", 1.0, "{}"),
            (3, t(10, 5), 1, "click", 1.0, "{}"),
            (4, t(11, 0), 1, "click", 1.0, "{}"),
        ],
        "f1",
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{drop}/*")
    )
    agg = SE.windowed_counts(stream, window="10 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    q.processAllAvailable()
    # batch 2: a LATE event for the sealed window (10:02 < watermark
    # 10:50) plus a fresh one to trigger the batch
    write_file(
        [
            (5, t(10, 2), 1, "click", 100.0, "{}"),
            (6, t(11, 5), 1, "click", 1.0, "{}"),
        ],
        "f2",
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # the sealed window holds only the 3 on-time events; the late row
    # (value=100) never entered it
    assert rows[t(10, 0)] == (3, 3.0)


def test_curate_stream_matches_batch_gates(spark, tmp_path):
    """Ingestion-side streaming curation: the stateless gates keep the
    same docs as their batch forms, and the stateful dedup drops the
    later duplicate."""
    import datetime as dt

    from hippollm_spark.streaming.curate_stream import curate_stream

    t0 = dt.datetime(2024, 1, 1, 8, 0)
    good = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "rests with the dog in the warm sun of the meadow"
    )
    rows = [
        (1, good, t0),
        (2, "x y", t0),                                   # fails quality
        (3, good + " mail me a@b.io now please today", t0),
        (4, good, dt.datetime(2024, 1, 1, 9, 0)),          # dup of 1, later ts
    ]
    drop = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, ts timestamp").coalesce(
        1
    ).write.parquet(drop)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(drop)
    )
    out = curate_stream(stream, min_quality_e8=50_000_000, shards=4)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("curated")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"]: r["text"] for r in spark.sql("SELECT * FROM curated").collect()}
    assert sorted(got) == [1, 3]          # 2 gated, 4 deduped
    assert "<EMAIL>" in got[3]            # scrubbed before the gate

    # batch parity for the stateless part (no stateful dedup in batch)
    batch = curate_stream(
        spark.read.parquet(drop), min_quality_e8=50_000_000
    )
    assert sorted(r["doc_id"] for r in batch.collect()) == [1, 3, 4]


def test_curate_stream_repetition_gate(spark, tmp_path):
    """The Gopher repetition filters stay stream-legal inside
    curate_stream and drop the repeated document."""
    import datetime as dt

    from hippollm_spark.streaming.curate_stream import curate_stream

    t0 = dt.datetime(2024, 1, 1, 8, 0)
    good = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "rests with the dog in the warm sun of the meadow"
    )
    loop = "the spark is the spark is " * 8 + "the spark"
    drop = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, good, t0), (2, loop, t0)],
        "doc_id long, text string, ts timestamp",
    ).coalesce(1).write.parquet(drop)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(drop)
    )
    out = curate_stream(
        stream,
        min_quality_e8=0,
        shards=4,
        max_top2_frac=0.5,
        max_dup5_frac=0.2,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("rep_gated")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM rep_gated").collect()}
    assert kept == {1}


def test_segment_revenue_stream_matches_batch(spark, event_dir):
    """Stream-static enrichment join: the broadcast customer dimension
    joined into the stream before the watermarked window aggregation
    gives the same result as the batch twin."""
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    stream = SE.read_event_stream(spark, event_dir, max_files_per_trigger=2)
    agg = SE.segment_windowed_revenue(stream, cust, window="1 hour")
    SE.run_to_memory(agg, "seg_out", output_mode="complete")
    got = spark.sql(
        "SELECT window_start, c_mktsegment, n_events FROM seg_out"
    ).collect()

    batch = SE.segment_windowed_revenue(
        spark.read.parquet(event_dir), cust, window="1 hour"
    )
    want = batch.select("window_start", "c_mktsegment", "n_events").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0
    # every event joins (user ids are a subset of customer keys)
    n_ev = spark.read.parquet(event_dir).count()
    assert sum(r["n_events"] for r in want) == n_ev


def test_click_purchase_join_stream_matches_batch(spark, event_dir):
    """Stream-stream join with event-time bounds: both sides streamed
    from files, matched pairs equal the batch interval join."""
    ev_static = spark.read.parquet(event_dir)
    clicks_b = ev_static.filter(F.col("event_type") == "click")
    purch_b = ev_static.filter(F.col("event_type") == "purchase")
    want = sorted(
        map(
            tuple,
            SE.click_purchase_join(clicks_b, purch_b)
            .select("click_id", "purchase_id", "delay_us")
            .collect(),
        )
    )
    assert len(want) > 0

    ev_s = SE.read_event_stream(spark, event_dir, max_files_per_trigger=2)
    clicks_s = ev_s.filter(F.col("event_type") == "click")
    purch_s = ev_s.filter(F.col("event_type") == "purchase")
    j = SE.click_purchase_join(clicks_s, purch_s)
    SE.run_to_memory(j, "attr_out", output_mode="append")
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT click_id, purchase_id, delay_us FROM attr_out"
            ).collect(),
        )
    )
    assert got == want
    # delays within the declared interval, non-negative
    assert all(0 <= d <= 3_600_000_000 for _, _, d in want)


def test_incremental_rollup_matches_batch(spark, event_dir, tmp_path):
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    stream = SE.read_event_stream(spark, event_dir, max_files_per_trigger=1)
    # file drops are not time-ordered, so a short watermark would
    # late-drop whole windows; parity needs an effectively-infinite one
    q = SE.incremental_rollup(
        stream, rollup, window="1 hour", watermark="3650 days", checkpoint=ckpt
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.read.parquet(rollup)
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect()
    )
    batch = SE.windowed_counts(spark.read.parquet(event_dir), window="1 hour")
    want = batch.select(
        "window_start", "event_type", "n_events", "sum_value"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # partitioned by window date → late data rewrites one partition
    import glob

    assert glob.glob(rollup + "/date=*"), "rollup must be date-partitioned"


def test_ohlc_stream_matches_batch_and_temporal(spark, event_dir):
    from hippollm_spark.operators.temporal import ohlc_bars

    stream = SE.read_event_stream(spark, event_dir, max_files_per_trigger=2)
    bars = SE.ohlc_stream(stream, bucket="1 hour")
    SE.run_to_memory(bars, "ohlc_out", output_mode="complete")
    got = sorted(
        map(tuple, spark.sql(
            "SELECT bucket, n, open, high, low, close, mean_value FROM ohlc_out"
        ).collect())
    )

    static = spark.read.parquet(event_dir)
    want_stream_twin = sorted(
        map(tuple, SE.ohlc_stream(static).select(
            "bucket", "n", "open", "high", "low", "close", "mean_value"
        ).collect())
    )
    assert got == want_stream_twin and len(got) > 0

    # and both agree with the batch temporal operator
    want_batch = sorted(
        map(tuple, ohlc_bars(
            static, "ts", "value", bucket="hour", id_col="event_id"
        ).select("bucket", "n", "open", "high", "low", "close", "mean_value")
        .collect())
    )
    assert got == want_batch


def test_curate_stream_with_index_kills_near_dups_across_batches(spark, tmp_path):
    """Full ingestion loop: micro-batch near-dup dedup against the
    persisted LSH index; survivors append to the index so later
    micro-batches dedup against them."""
    import datetime as dt

    from hippollm_spark.operators.dedup import save_dedup_index
    from hippollm_spark.streaming.curate_stream import curate_stream_with_index

    base = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "rests with the dog in the warm sun of the meadow"
    )
    other = (
        "completely different readable content about spark catalyst "
        "plans and the shuffle exchanges they produce for wide joins"
    )
    # seed index with an EMPTY corpus
    empty = spark.createDataFrame([], "doc_id long, text string")
    save_dedup_index(spark, empty, "stream_idx")

    t0 = dt.datetime(2024, 1, 1, 8, 0)
    drop = str(tmp_path / "docs")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(
        [(1, base, t0), (2, other, t0)], "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(drop)
    spark.createDataFrame(
        [(10, base + " tail", t0), (11, other + " and more", t0)],
        "doc_id long, text string, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(drop)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    out_path = str(tmp_path / "survivors")
    q = curate_stream_with_index(
        stream,
        "stream_idx",
        min_quality_e8=40_000_000,
        shards=4,
        out_path=out_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    ids = sorted(r["doc_id"] for r in spark.read.parquet(out_path).collect())
    # near-dups of earlier survivors are gone regardless of which
    # micro-batch they arrived in
    assert 1 in ids and 2 in ids
    assert 10 not in ids and 11 not in ids
