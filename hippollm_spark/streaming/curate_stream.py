"""Ingestion-side streaming curation: the stateless curation gates plus
stateful exact dedup, composed over a document stream.

At 100 TB/day the cheap per-document decisions (PII scrubbing, quality
score, language ID, first-seen dedup) belong at INGESTION — before
anything hits storage — while the corpus-level stages (near-dup
canonicalization, decontamination, packing) run as periodic batch jobs
over what survived. This module is that ingestion side:

    readStream → scrub_pii → quality_gate → dedup_docs_stream → sink

Every gate is a stateless projection/filter (stream-legal by
construction — see textstats.quality_gate); the only state is the
per-shard seen-fingerprint set, sharded by fingerprint so state load
spreads evenly regardless of key skew.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hippollm_spark.operators.textstats import md5_long, quality_gate, scrub_pii

DOC_STATE_SCHEMA = "seen array<long>"
DOC_OUT_SCHEMA = "doc_id long, text string, ts timestamp"


def dedup_docs_stream(
    docs: DataFrame,
    *,
    shards: int = 64,
    max_state: int = 1_000_000,
) -> DataFrame:
    """Streaming first-seen document dedup that passes the DOCUMENT
    through (the event-level ``stateful.dedup_stream`` emits only
    key/fingerprint). Rows are sharded by ``fingerprint % shards`` so
    the seen-set state spreads over ``shards`` groups; within a batch,
    earlier ``ts`` wins. Input needs (doc_id, text, ts)."""

    def _fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        seen: list[int] = list(state.get[0]) if state.exists else []
        seen_set = set(seen)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            keep = []
            # NB: itertuples mangles underscore-prefixed columns — zip
            for doc_id, text, ts, fp in zip(
                pdf["doc_id"], pdf["text"], pdf["ts"], pdf["__fp__"]
            ):
                fp = int(fp)
                if fp not in seen_set:
                    seen_set.add(fp)
                    keep.append((doc_id, text, ts))
            if keep:
                yield pd.DataFrame(keep, columns=["doc_id", "text", "ts"])
        merged = list(seen_set)
        if len(merged) > max_state:
            merged = merged[-max_state:]
        state.update((merged,))

    keyed = docs.withColumn("__fp__", md5_long(F.col("text"))).withColumn(
        "__shard__", F.pmod("__fp__", F.lit(shards))
    )
    return keyed.groupBy("__shard__").applyInPandasWithState(
        _fn,
        DOC_OUT_SCHEMA,
        DOC_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def curate_stream(
    docs: DataFrame,
    *,
    min_quality_e8: int = 55_000_000,
    shards: int = 64,
    scrub: bool = True,
    max_top2_frac: float | None = None,
    max_dup5_frac: float | None = None,
) -> DataFrame:
    """Compose the ingestion-side curation over a (streaming or batch)
    document DataFrame with (doc_id, text, ts): PII scrub → stateless
    quality+language gate (optionally with the Gopher repetition
    filters — still stateless, so still stream-legal) → (streaming
    only) stateful first-seen dedup. On a batch DataFrame the dedup
    stage is skipped — batch corpora get the stronger corpus-level
    ``pipelines.curate.curate_corpus``."""
    out = docs
    if scrub:
        out = out.withColumn("text", scrub_pii(F.col("text")))
    out = quality_gate(
        out,
        min_quality_e8=min_quality_e8,
        max_top2_frac=max_top2_frac,
        max_dup5_frac=max_dup5_frac,
    )
    if out.isStreaming:
        out = dedup_docs_stream(out.select("doc_id", "text", "ts"), shards=shards)
    return out


def curate_stream_with_index(
    docs: DataFrame,
    index_prefix: str,
    *,
    min_quality_e8: int = 55_000_000,
    shards: int = 64,
    scrub: bool = True,
    threshold: float = 0.5,
    checkpoint_dir: str | None = None,
    out_path: str | None = None,
):
    """The full ingestion loop: `curate_stream`'s stateless gates +
    stateful exact dedup, THEN per-micro-batch NEAR-dup dedup against
    the persisted LSH index (`dedup.incremental_dedup`) inside
    ``foreachBatch`` — survivors append to both the output sink and
    the index, so batch N+1 dedups against everything batch N kept.

    This closes the gap the module docstring leaves open: near-dup
    suppression no longer waits for the periodic batch job; the batch
    job is still the canonicalization/decontamination authority, but
    arriving near-exact copies die at ingestion, batch-sized work per
    trigger.

    Returns the StreamingQuery. The index tables must exist
    (`dedup.save_dedup_index`, possibly on an empty corpus).
    """
    from hippollm_spark.operators.dedup import incremental_dedup

    gated = curate_stream(
        docs,
        min_quality_e8=min_quality_e8,
        shards=shards,
        scrub=scrub,
    )

    def _process(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        dups = incremental_dedup(
            spark,
            batch.select("doc_id", "text"),
            index_prefix,
            threshold=threshold,
            update_index=True,
        )
        survivors = batch.join(
            dups.select("doc_id").distinct(), "doc_id", "left_anti"
        )
        if out_path is not None:
            survivors.write.mode("append").parquet(out_path)

    writer = gated.writeStream.foreachBatch(_process).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
