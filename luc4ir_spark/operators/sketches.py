"""Deterministic distributed sketches.

Classic streaming sketches (HLL, theta) are engine-specific: Spark's
``approx_count_distinct`` and DuckDB's ``approx_distinct`` use
different hash functions and register layouts, so their estimates can
never be cross-checked value-for-value. The K-Minimum-Values sketch
(Bar-Yossef et al. 2002) over the repo's engine-portable ``mix`` hash
(functions/hashing.py) is different: the k smallest hash values of a
set are a pure function of the input, so BOTH engines compute the
identical sketch and the identical estimate — an approximate
algorithm with an exact oracle.

    u_k  = (k-th smallest distinct hash) / P        (P = 2^31 - 1)
    est  = (k - 1) / u_k  =  (k - 1) * P / h_k      (m >= k)
    est  = m exactly                                 (m <  k)

where m is the number of distinct hash values seen. Standard error is
~1/sqrt(k-2) (~12% at k=64) — the gate also emits the exact distinct
count so the error is visible, not hidden.

Scale shape: one distinct() on (group, hash) — a map-side-combinable
hash aggregate — then a per-group ``row_number() <= k`` that Spark
rewrites to WindowGroupLimit (partial top-k BEFORE the shuffle, so
each mapper forwards at most k rows per group), then one tiny
groupBy. The sketch relation leaving the map side is k rows per group
regardless of input size — the whole point of a sketch at 100 TB.
Sketches for different partitions union and re-rank to merge
(min-of-mins is associative), same as any KMV.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import MIX_P, mix_id_expr

__all__ = ["distinct_kmv_sketch"]


def distinct_kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col`` via the
    K-Minimum-Values sketch over the portable mix hash, plus the kth
    hash itself (the mergeable sketch state) and the sketch fill m.
    -> (group_cols..., m long, kth_hash long — null when m < k,
    est_distinct double).

    Deterministic: identical on any engine that reproduces mix();
    collisions in the 31-bit hash space merge values in BOTH engines
    identically (negligible below ~10^4 distincts per group; raise to
    a wider portable hash before trusting est at 10^6+ distincts)."""
    h = (
        df.select(*group_cols, mix_id_expr(value_col).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    topk = h.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    per = topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.max(F.when(F.col("rn") == k, F.col("_h"))).cast("long")
        .alias("kth_hash"),
    )
    num = float((k - 1) * MIX_P)
    return per.select(
        *group_cols,
        "m",
        "kth_hash",
        F.when(F.col("m") < k, F.col("m").cast("double"))
        .otherwise(F.lit(num) / F.col("kth_hash").cast("double"))
        .alias("est_distinct"),
    )
