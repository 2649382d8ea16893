"""Deterministic, engine-portable hash helpers.

Every hash here must be computable bit-for-bit in three places: a Spark
SQL expression (ANSI mode — no silent int64 overflow, so no raw 64-bit
multiplies), a numpy int64 kernel (the Arrow encode path), and plain
ANSI SQL for the DuckDB oracles. That rules out xxhash64 (JVM-only) and
splitmix64 (64-bit multiplies); the workhorse is the classic
multiplicative hash over the Mersenne prime 2^31-1 with xxhash's prime
constants:

    mix(x) = (A * (x pmod P) + B) pmod P      P = 2^31-1

All intermediates stay < 2^63 (A < 2^32, x pmod P < 2^31 => product
< 2^63), numpy's signed ``%`` with a positive divisor equals Spark's
``pmod``, and the low bits are uniform even for structured id spaces
(sequential ids, stride-k ids, all-even ids) — the failure mode of both
a bare ``pmod(doc_id, shards)`` and low-shift xorshift mixers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MIX_P = 2147483647  # 2^31 - 1
MIX_A = 2654435761  # xxhash PRIME32_1
MIX_B = 2246822519  # xxhash PRIME32_2


def mix_id_expr(col) -> Column:
    """Spark expression: mix(col) as a non-negative int64 < 2^31."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(
        F.lit(MIX_A) * F.pmod(c, F.lit(MIX_P)) + F.lit(MIX_B), F.lit(MIX_P)
    )


def mix_id_np(ids: np.ndarray) -> np.ndarray:
    """numpy twin of ``mix_id_expr`` — bit-identical for any int64 input
    (numpy's ``%`` with a positive divisor floors like Spark's pmod)."""
    x = ids.astype(np.int64, copy=False)
    return (MIX_A * (x % MIX_P) + MIX_B) % MIX_P


def mix_shard_expr(col, shards: int) -> Column:
    """Shard assignment pmod(mix(col), shards) as int."""
    return F.pmod(mix_id_expr(col), F.lit(shards)).cast("int")


def mix_shard_np(ids: np.ndarray, shards: int) -> np.ndarray:
    return mix_id_np(ids) % shards
