"""SCD2 merge emulation and the stateful streaming dedup operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hippollm_spark.operators import scd


def ts(d: int) -> dt.datetime:
    return dt.datetime(2024, 1, d)


def test_scd2_apply_versions(spark):
    snap = spark.createDataFrame(
        [(1, "alice", "NYC", ts(1)), (2, "bob", "LA", ts(1))],
        "id long, name string, city string, effective_ts timestamp",
    )
    dim = scd.scd2_init(snap)
    assert dim.filter("is_current").count() == 2

    changes = spark.createDataFrame(
        [
            (1, "alice", "SF", ts(5)),     # city change → new version
            (2, "bob", "LA", ts(5)),       # no change → untouched
            (3, "carol", "CHI", ts(5)),    # new key → first version
            (1, "alice", "BOS", ts(3)),    # stale change, superseded by ts(5)
        ],
        "id long, name string, city string, effective_ts timestamp",
    )
    out = scd.scd2_apply(dim, changes, key="id").cache()

    assert out.count() == 4  # alice v1+v2, bob v1, carol v1
    alice = {
        (r["city"], r["is_current"]): (r["valid_from"], r["valid_to"])
        for r in out.filter("id = 1").collect()
    }
    assert ("NYC", False) in alice and ("SF", True) in alice
    closed = alice[("NYC", False)]
    assert closed[1] == ts(5)  # closed at the change timestamp
    bob = out.filter("id = 2").collect()
    assert len(bob) == 1 and bob[0]["is_current"] and bob[0]["city"] == "LA"
    carol = out.filter("id = 3").first()
    assert carol["is_current"] and carol["valid_from"] == ts(5)

    # idempotence: applying the same changes again is a no-op
    again = scd.scd2_apply(out, changes, key="id")
    assert again.count() == 4


def test_dedup_stream(spark, tmp_path):
    from hippollm_spark.streaming.stateful import dedup_stream

    drop = tmp_path / "stream"
    drop.mkdir()
    rows1 = [(1, 100, dt.datetime(2024, 1, 1, 0, 0, i)) for i in range(3)] + [
        (1, 200, dt.datetime(2024, 1, 1, 0, 1)),
        (2, 100, dt.datetime(2024, 1, 1, 0, 2)),
    ]
    schema = "user_id long, fingerprint long, ts timestamp"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(str(drop))
    # second file: repeats fingerprints from the first micro-batch
    rows2 = [
        (1, 100, dt.datetime(2024, 1, 1, 0, 5)),   # dup across batches
        (1, 300, dt.datetime(2024, 1, 1, 0, 6)),   # fresh
        (2, 100, dt.datetime(2024, 1, 1, 0, 7)),   # dup for user 2
    ]
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(drop))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    # ttl=None → NoTimeout: with a processing-time TTL the engine keeps
    # scheduling timeout-evaluation batches and processAllAvailable
    # never settles on a finite source
    surviving = dedup_stream(stream, ttl_minutes=None)
    q = (
        surviving.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["user_id"], r["fingerprint"])
        for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    # user 1: fingerprints 100, 200, 300 each once; user 2: 100 once
    assert got == {(1, 100), (1, 200), (1, 300), (2, 100)}
    n = spark.sql("SELECT count(*) c FROM dedup_out").first()["c"]
    assert n == 4  # within-batch AND cross-batch duplicates dropped

def test_funnel_stream_matches_batch_walk(spark, tmp_path):
    from hippollm_spark.operators.behavior import funnel_counts
    from hippollm_spark.streaming.stateful import funnel_stream

    steps = ["view", "click", "purchase"]
    schema = "user_id long, event_type string, ts timestamp"
    rows1 = [
        (1, "view", dt.datetime(2024, 1, 1, 0, 0)),
        (1, "click", dt.datetime(2024, 1, 1, 0, 1)),
        (2, "view", dt.datetime(2024, 1, 1, 0, 2)),
        (3, "click", dt.datetime(2024, 1, 1, 0, 3)),  # no view yet: ignored
        (2, "purchase", dt.datetime(2024, 1, 1, 0, 4)),  # skips click: ignored
    ]
    rows2 = [
        (1, "purchase", dt.datetime(2024, 1, 1, 0, 5)),  # completes funnel
        (2, "click", dt.datetime(2024, 1, 1, 0, 6)),
        (3, "view", dt.datetime(2024, 1, 1, 0, 7)),  # view after click: stage 1
    ]
    drop = tmp_path / "stream"
    drop.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(str(drop))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(drop))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    q = (
        funnel_stream(stream, steps)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    prog = spark.sql("SELECT * FROM funnel_out").collect()
    max_stage: dict = {}
    for r in prog:
        max_stage[r["user_id"]] = max(max_stage.get(r["user_id"], 0), r["step_idx"])
    assert max_stage == {1: 3, 2: 2, 3: 1}

    # parity: per-step user counts == batch walk funnel on the same rows
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts(batch, steps).collect()
    }
    got = {
        k: sum(1 for u in max_stage.values() if u >= k)
        for k in (1, 2, 3)
    }
    assert got == want
