"""Sparse bag-of-tokens similarity kernels.

Re-expresses the reference's DocVector similarity surface (reference:
evaluator/DocVector.java:116-230 — cosine :135-147, idf-weighted cosine
:149-168, jaccard :175-183, BLEU-precision :200-214, ROUGE-recall
:216-230, METEOR :192-197) as pure functions over token lists plus a
row-wise Arrow UDF for DataFrame use, and the char-n-gram BLEU evaluator
of the RCD task (reference: evaluator/RCDEvaluator.java:90-157 —
weighted n/12 average of char-n-gram cosines for n=3..5; golden value
0.16270196 documented at rcd/README.md:23-26).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .analysis import char_ngrams

RCD_NGRAM_RANGE = (3, 5)  # n = 3..5, weights n/12


def cosine(a: list[str], b: list[str]) -> float:
    ca, cb = Counter(a), Counter(b)
    dot = sum(v * cb.get(k, 0) for k, v in ca.items())
    na = math.sqrt(sum(v * v for v in ca.values()))
    nb = math.sqrt(sum(v * v for v in cb.values()))
    return dot / (na * nb) if na > 0 and nb > 0 else 0.0


def idf_cosine(a: list[str], b: list[str], idf: dict[str, float]) -> float:
    """Cosine with tf*idf weights (unknown terms weight 0)."""
    ca = {k: v * idf.get(k, 0.0) for k, v in Counter(a).items()}
    cb = {k: v * idf.get(k, 0.0) for k, v in Counter(b).items()}
    dot = sum(v * cb.get(k, 0.0) for k, v in ca.items())
    na = math.sqrt(sum(v * v for v in ca.values()))
    nb = math.sqrt(sum(v * v for v in cb.values()))
    return dot / (na * nb) if na > 0 and nb > 0 else 0.0


def jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


def _clipped_overlap(pred: Counter, ref: Counter) -> int:
    return sum(min(v, ref.get(k, 0)) for k, v in pred.items())


def bleu_precision(pred: list[str], ref: list[str]) -> float:
    """Modified unigram precision: clipped matches / |pred|."""
    cp = Counter(pred)
    n = sum(cp.values())
    return _clipped_overlap(cp, Counter(ref)) / n if n else 0.0


def rouge_recall(pred: list[str], ref: list[str]) -> float:
    """Clipped matches / |ref| — the recall counterpart."""
    cr = Counter(ref)
    n = sum(cr.values())
    return _clipped_overlap(Counter(pred), cr) / n if n else 0.0


def meteor(pred: list[str], ref: list[str], alpha: float = 9.0) -> float:
    """METEOR F-mean: P*R*(1+alpha) / (R + alpha*P) (harmonic mean
    weighted toward recall, the classic 10PR/(R+9P) with alpha=9)."""
    p = bleu_precision(pred, ref)
    r = rouge_recall(pred, ref)
    if p == 0.0 or r == 0.0:
        return 0.0
    return (1 + alpha) * p * r / (r + alpha * p)


def rcd_char_bleu(pred_text: str, ref_text: str) -> float:
    """Char-n-gram BLEU of the RCD task: sum over n=3..5 of
    (n/12) * cosine(char n-grams)."""
    lo, hi = RCD_NGRAM_RANGE
    total = 0.0
    for n in range(lo, hi + 1):
        total += (n / 12.0) * cosine(
            char_ngrams(pred_text, n), char_ngrams(ref_text, n)
        )
    return total


def rcd_bleu_udf():
    """Row-wise Arrow UDF: (pred string, ref string) -> double."""

    @F.pandas_udf(T.DoubleType())
    def _sim(pred: pd.Series, ref: pd.Series) -> pd.Series:
        return pd.Series(
            [rcd_char_bleu(p or "", r or "") for p, r in zip(pred, ref)]
        )

    return _sim


def rcd_evaluate(pairs, pred_col: str = "pred", ref_col: str = "ref",
                 group_col: str | None = None):
    """RCD evaluation over a DataFrame of (pred, ref[, group]) rows:
    per-row char-n-gram BLEU; with ``group_col``, equivalence groups
    count their best match (the reference merges query-equivalence
    classes, RCDEvaluator.java:107-133); returns the mean as one row
    (the golden-value shape of rcd/README.md)."""
    sim = rcd_bleu_udf()(F.col(pred_col), F.col(ref_col)).alias("sim")
    scored = pairs.select(
        *( [F.col(group_col)] if group_col else [] ), sim
    )
    if group_col:
        scored = scored.groupBy(group_col).agg(F.max("sim").alias("sim"))
    return scored.agg(F.avg("sim").alias("bleu"))


# ---- JVM-side variants for set similarities over token array columns

def jaccard_col(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
