"""Storage-layout optimization: Z-order (Morton) clustering for
multi-dimensional data skipping.

At 100 TB the scan planner prunes row groups by min/max column stats;
sorting by ONE column gives perfect skipping on that column and none
on the others. Interleaving the bits of several low-cardinality
dimension keys (the Morton curve) and range-partitioning + sorting by
that single z-value gives every dimension locality proportional to
its bit share — the layout behind Delta's OPTIMIZE ZORDER BY and
Iceberg's sort orders, re-expressed as plain Spark: compute z, then
``repartitionByRange(z).sortWithinPartitions(z)`` before the write.

The z-value is pure integer bit arithmetic — deterministic and
engine-portable (same expression in Spark SQL and DuckDB), so the
layout decision itself is oracle-checkable even though the physical
file placement is not.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_layout"]


def zorder_value(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton interleave of ``len(cols)`` non-negative integer keys,
    ``bits`` bits each (keys are masked to that width first). Bit b of
    dimension d lands at position b*len(cols) + d — the standard
    z-curve. Build is a compile-time loop emitting one OR-chain of
    shift/mask terms: all whole-stage-codegen, no UDF.
    -> long z in [0, 2^(bits*len(cols)))."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 dimensions")
    if bits * n > 62:
        raise ValueError("bits * dims must stay under 63")
    mask = (1 << bits) - 1
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long")
        .bitwiseAND(F.lit(mask))
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(cs):
            # bit b of dim d -> position b*n + d, as mask-test *
            # literal power of two (Spark 4 ANSI rejects Column shift
            # counts; a boolean-cast multiply sidesteps shifts and is
            # identical integer arithmetic in DuckDB)
            term = (
                c.bitwiseAND(F.lit(1 << b)) != 0
            ).cast("long") * F.lit(1 << (b * n + d))
            z = z + term
    return z.cast("long")


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
    z_col: str = "z",
) -> DataFrame:
    """Attach the z-value and return the frame range-partitioned and
    sorted by it — ready for a parquet write whose row-group min/max
    stats prune on EVERY interleaved dimension. One range shuffle
    (sampled boundaries) + local sort, the same cost as any global
    orderBy; downstream writes preserve the order."""
    out = df.withColumn(z_col, zorder_value(list(cols), bits=bits))
    if num_partitions:
        out = out.repartitionByRange(num_partitions, z_col)
    else:
        out = out.repartitionByRange(z_col)
    return out.sortWithinPartitions(z_col)
