"""Utility operators: destemmer, sampling, norm quantization.

- Destemmer (reference: genutils/Destemmer.java:38-71): map a stem back
  to the alphabetically-first vocabulary word with that prefix. The
  reference scans 26 per-letter TreeSets; the relational form is a
  prefix theta-join bucketed by first letter so the join is an
  equi-join plus a cheap startswith filter.
- Samplers (reference: genutils/UniqueSampler.java:6-47): uniform and
  weighted without-replacement sampling as DataFrame ops.
- SmallFloat-style norm quantization (reference delegates to its index
  library, which stores doc length lossily in ONE byte and decodes at
  query time — our exact int64 doc_len is the default; this optional
  mode reproduces 1-byte-style quantization for score-parity studies
  with engines that quantize).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def destem(stems: DataFrame, vocab: DataFrame) -> DataFrame:
    """stems(stem) x vocab(word) -> (stem, word): the alphabetically
    first vocabulary word starting with each stem. Bucketed on the
    first character so Catalyst plans an equi-join (the vocab side
    shuffles once by bucket), then a startswith filter + min."""
    s = stems.select("stem").distinct().withColumn(
        "bucket", F.substring("stem", 1, 1)
    )
    v = vocab.select("word").distinct().withColumn(
        "bucket", F.substring("word", 1, 1)
    )
    return (
        s.join(v, "bucket")
        .filter(F.col("word").startswith(F.col("stem")))
        .groupBy("stem")
        .agg(F.min("word").alias("word"))
    )


def sample_uniform(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """n rows uniformly without replacement (deterministic given seed)."""
    w = Window.orderBy(F.xxhash64(F.lit(seed), F.monotonically_increasing_id()))
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n)
        .drop("_r")
    )


def sample_weighted(
    df: DataFrame, n: int, weight_col: str, seed: int = 42
) -> DataFrame:
    """Weighted sampling without replacement via the exponential-sort
    trick (Efraimidis-Spirakis): key = rand()^(1/w); top-n keys."""
    u = (F.xxhash64(F.lit(seed), F.monotonically_increasing_id())
         .cast("double") / F.lit(float(2**63)) + 1.0) / 2.0
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    w = Window.orderBy(F.desc("_key"))
    return (
        df.withColumn("_key", key)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n)
        .drop("_key", "_r")
    )


def quantize_doc_len(dl: Column, mantissa_bits: int = 4) -> Column:
    """Lossy 1-byte-style length quantization: values are floored to a
    float with ``mantissa_bits`` of mantissa (exact below
    2^(mantissa_bits+1), progressively coarser above) — the shape of a
    SmallFloat-encoded norm. Optional parity mode; default engine path
    keeps exact int64 lengths."""
    bits = F.floor(F.log2(F.greatest(dl.cast("double"), F.lit(1.0))))
    step = F.pow(
        F.lit(2.0), F.greatest(bits - mantissa_bits, F.lit(0).cast("double"))
    )
    return (F.floor(dl.cast("double") / step) * step).cast("long")
