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
    ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
