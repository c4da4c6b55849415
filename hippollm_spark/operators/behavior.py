"""Behavioral event analytics: funnel conversion and cohort retention.

The reference engine has no event analytics at all (SURVEY.md §2.10);
these are the two queries every 100-TB event store answers daily, so
the engine ships them as first-class operators with oracle-checkable
semantics.

Scale shapes:
- Funnel: one filtered scan per step, each reduced to (user, min_ts)
  BEFORE joining — the joins carry one row per user per step, never raw
  events. Steps chain left-to-right (step k's earliest timestamp must
  strictly follow step k-1's), which is the order-sensitive definition
  (a purchase before ever viewing does not convert).
- Cohort: two aggregates over the same (user, period) projection; the
  shuffle key is user_id both times, so AQE can reuse the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_counts", "cohort_retention"]


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: for each step k, the number of users whose
    earliest step-k event strictly follows their earliest qualifying
    step-(k-1) event. Output: (step_idx INT, step STRING,
    n_users BIGINT, conversion DOUBLE 6dp — fraction of step-1 users).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    reached: DataFrame | None = None
    counts: list[DataFrame] = []
    for idx, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("__ts__")
        )
        if reached is None:
            reached = ev.groupBy("user").agg(F.min("__ts__").alias("t"))
        else:
            reached = (
                ev.join(reached.select("user", F.col("t").alias("__prev__")), "user")
                .filter(F.col("__ts__") > F.col("__prev__"))
                .groupBy("user")
                .agg(F.min("__ts__").alias("t"))
            )
        counts.append(
            reached.agg(F.count("*").alias("n_users")).select(
                F.lit(idx + 1).alias("step_idx"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    first = counts[0].select(F.col("n_users").alias("__n1__"))
    return (
        out.crossJoin(F.broadcast(first))
        .select(
            "step_idx",
            "step",
            "n_users",
            F.round(F.col("n_users") / F.col("__n1__"), 6).alias("conversion"),
        )
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Classic retention triangle: users grouped by first-activity
    period (their cohort); for each (cohort, offset) the number of
    cohort users active ``offset`` periods later. Output:
    (cohort TIMESTAMP, period_offset INT, n_users BIGINT,
    retention DOUBLE 6dp — fraction of the cohort's size).
    """
    divisor = {"week": 7, "day": 1}[period]
    act = events.select(
        F.col(user_col).alias("user"),
        F.date_trunc(period, F.col(ts_col)).alias("p"),
    ).distinct()
    first = act.groupBy("user").agg(F.min("p").alias("cohort"))
    joined = act.join(first, "user").select(
        "cohort",
        (F.datediff(F.col("p"), F.col("cohort")) / divisor)
        .cast("int")
        .alias("period_offset"),
        "user",
    )
    per_cell = joined.groupBy("cohort", "period_offset").agg(
        F.countDistinct("user").alias("n_users")
    )
    sizes = per_cell.filter(F.col("period_offset") == 0).select(
        "cohort", F.col("n_users").alias("__size__")
    )
    return (
        per_cell.join(sizes, "cohort")
        .select(
            "cohort",
            "period_offset",
            "n_users",
            F.round(F.col("n_users") / F.col("__size__"), 6).alias("retention"),
        )
    )
