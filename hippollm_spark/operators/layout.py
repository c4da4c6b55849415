"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional scan pruning.

Parquet pruning is driven by per-row-group min/max statistics. A table
sorted by one column prunes filters on that column only — every row
group spans the full range of every OTHER column. Interleaving the
bits of two columns into one Morton key and range-sorting by it gives
every row group a tight bounding BOX over both columns, so range
predicates on either (or both) prune — the same trick Delta/Iceberg
expose as OPTIMIZE ZORDER BY, here as a plain column expression plus
`repartitionByRange` + `sortWithinPartitions` before write.

At 100 TB this is the difference between scanning one dimension's
matching stripes (and ALL of the other dimension) and scanning only
the intersecting boxes; it costs one range shuffle at write time and
nothing at read time.

The key is exact integer bit arithmetic — engine-portable (the DuckDB
twin computes identical keys with the same shifts), so it is
oracle-checkable like everything else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]


def zorder_key(col_a, col_b, *, bits: int = 21) -> Column:
    """Morton interleave of two non-negative integer columns (values
    must fit in ``bits`` bits; 21+21 = 42 result bits stays well
    inside BIGINT). Even result bits come from ``col_a``, odd bits
    from ``col_b``. Pure JVM bitwise ops — whole-stage codegen, no
    UDF."""
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("long")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by the Morton key of (col_a, col_b):
    range-partition on the key (so files tile the Z-curve) and sort
    within partitions (so row groups inside each file tile it too).
    The key itself is not persisted — it is purely a layout device.

    Both columns are first min/max-normalized to the same ``bits``-bit
    bucket space (one tiny aggregate, broadcast back). This is NOT
    optional: interleaving raw values whose bit widths differ puts all
    of the curve's high bits in the wider column, which degenerates to
    a single-column sort — the narrow column ends up unbounded in
    every file (observed directly in the layout test before the
    normalization was added)."""
    lo_hi = df.agg(
        F.min(col_a).alias("_la"),
        F.max(col_a).alias("_ha"),
        F.min(col_b).alias("_lb"),
        F.max(col_b).alias("_hb"),
    )
    norm_a = F.expr(
        f"(({col_a} - _la) * {1 << bits}) div (_ha - _la + 1)"
    )
    norm_b = F.expr(
        f"(({col_b} - _lb) * {1 << bits}) div (_hb - _lb + 1)"
    )
    (
        df.crossJoin(F.broadcast(lo_hi))
        .withColumn("__z__", zorder_key(norm_a, norm_b, bits=bits))
        .repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__", "_la", "_ha", "_lb", "_hb")
        .write.mode("overwrite")
        .parquet(path)
    )
