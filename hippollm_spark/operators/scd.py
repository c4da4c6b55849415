"""CDC / SCD2 (slowly-changing dimension, type 2) without a table
format: the anti-join + union + window emulation of MERGE INTO.

``scd2_apply(current, changes)`` produces the new dimension state:
- rows whose business key is untouched pass through,
- changed keys close their open version (valid_to = change ts) and
  append a new open version,
- new keys open their first version.

At scale this is two hash joins on the business key plus a union — the
same physical work a MERGE in Delta/Iceberg performs, minus the
transactional commit (which the table format would supply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_TS = "9999-12-31 23:59:59"


def scd2_init(snapshot: DataFrame, ts_col: str = "effective_ts") -> DataFrame:
    """Turn a plain snapshot into SCD2 shape: + valid_from / valid_to /
    is_current."""
    return snapshot.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        F.lit(OPEN_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    ).drop(ts_col)


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str = "effective_ts",
) -> DataFrame:
    """Apply a batch of changed rows (one row per key — latest change
    wins if callers pre-deduplicate; enforced here with a window) to an
    SCD2 dimension."""
    from pyspark.sql import Window

    attr_cols = [c for c in changes.columns if c not in (key, ts_col)]

    w = Window.partitionBy(key).orderBy(F.desc(ts_col))
    latest = (
        changes.withColumn("__rn__", F.row_number().over(w))
        .filter("__rn__ = 1")
        .drop("__rn__")
    )

    open_rows = current.filter("is_current")
    closed_rows = current.filter("NOT is_current")

    # keys with an actual attribute change (different values)
    joined = open_rows.alias("c").join(
        latest.alias("n"), on=key, how="inner"
    )
    diff_cond = None
    for a in attr_cols:
        c = F.col(f"c.{a}") != F.col(f"n.{a}")
        c = c | (F.col(f"c.{a}").isNull() != F.col(f"n.{a}").isNull())
        diff_cond = c if diff_cond is None else (diff_cond | c)
    changed_keys = joined.filter(diff_cond).select(F.col(key), F.col(f"n.{ts_col}").alias("__chg_ts__"))

    # close the open version of changed keys
    closing = (
        open_rows.join(F.broadcast(changed_keys), on=key, how="inner")
        .withColumn("valid_to", F.col("__chg_ts__"))
        .withColumn("is_current", F.lit(False))
        .drop("__chg_ts__")
    )
    unchanged_open = open_rows.join(changed_keys.select(key), on=key, how="left_anti")

    # new versions: changed keys + brand-new keys
    new_keys = latest.join(open_rows.select(key), on=key, how="left_anti")
    reopened = latest.join(F.broadcast(changed_keys.select(key)), on=key, how="semi")
    fresh = scd2_init(new_keys.unionByName(reopened), ts_col)

    return closed_rows.unionByName(closing).unionByName(unchanged_open).unionByName(fresh)


def merge_into(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """SCD1 / CDC MERGE semantics without a table format: apply a
    change feed of upserts ('U' — insert or replace) and deletes ('D')
    to a keyed snapshot. The latest change per key wins, ordered by
    ``seq_col`` (a CDC log offset / commit timestamp); ties broken by
    op descending so a same-seq U beats a D deterministically.

    Shape: one window over changes keyed on the business key (the
    change feed is normally ≪ the snapshot), one left-anti join to
    drop superseded/deleted target rows, one union. This is exactly
    the physical work Delta/Iceberg MERGE INTO performs per batch,
    minus the transactional commit; at 100 TB the anti-join is the
    only snapshot-sized operation, and AQE turns it into a broadcast
    anti-join whenever the deduped change set fits.
    """
    from pyspark.sql import Window

    payload = [c for c in changes.columns if c not in (op_col, seq_col)]
    w = Window.partitionBy(key).orderBy(F.desc(seq_col), F.desc(op_col))
    latest = (
        changes.withColumn("__rn__", F.row_number().over(w))
        .filter("__rn__ = 1")
        .drop("__rn__")
    )
    survivors = target.join(latest.select(key), on=key, how="left_anti")
    upserts = latest.filter(F.col(op_col) == "U").select(*payload)
    return survivors.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table: the
    reconciliation report behind every CDC/backfill validation
    ("what did this rebuild change?").

    One full-outer join on the key; each compared column contributes a
    null-safe inequality to the 'changed' verdict (eqNullSafe — NULL
    transitions count as changes). Output keeps both sides' values
    for changed columns downstream inspection and a status column:
    'added' | 'removed' | 'changed' | 'same'.

    At scale this is the one unavoidable snapshot-sized shuffle (both
    sides hash on the key); with bucketed snapshots
    (HippoStore.save_bucketed) the exchange disappears entirely —
    the same contract as the bucketed-join test asserts.
    """
    cols = compare_cols or [c for c in old.columns if c != key]
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")), "full_outer")
    diff_cond = None
    for c in cols:
        neq = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        diff_cond = neq if diff_cond is None else (diff_cond | neq)
    status = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("added"))
        .when(F.col(f"n.{key}").isNull(), F.lit("removed"))
        .when(diff_cond, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    sel = [
        F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
        status.alias("status"),
    ]
    for c in cols:
        sel.append(F.col(f"o.{c}").alias(f"old_{c}"))
        sel.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return joined.select(*sel)
