"""Structured action log (reference O1 — log_helpers.py:12-52: every
LLM/db/nlp action logged as ``ACTION:{json}`` to a per-run logfile).

Spark-native version: actions accumulate on the driver as plain
records and materialize as an appendable ``_log`` DataFrame/table —
queryable lineage instead of grep-able text."""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

LOG_DDL = "ts double, action string, detail string"


@dataclass
class ActionLog:
    records: list[tuple[float, str, str]] = field(default_factory=list)

    def log(self, action: str, **detail) -> None:
        self.records.append(
            (time.time(), action, json.dumps(detail, sort_keys=True, default=str))
        )

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.records or [], LOG_DDL)

    def append_to(self, spark: SparkSession, path: str) -> None:
        if self.records:
            self.to_df(spark).write.mode("append").parquet(path)
            self.records.clear()
