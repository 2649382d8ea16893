"""Distributed BPE tokenizer training + encoding.

The classic byte-pair-encoding trainer (Sennrich et al. 2016, public
algorithm; the reference pipeline stops at analyzer-level tokenization —
this is part of the training-data toolchain layered on top): start from
characters + an end-of-word marker, repeatedly merge the most frequent
adjacent symbol pair.

Spark-first shape: the corpus-sized work is ONE tokenize + groupBy that
collapses 100 TB of text into the distinct-word count table (vocab-sized
— millions of rows, not trillions); every merge iteration then runs on
that small relation only (pair explode + one map-side-combined groupBy +
a driver top-1), exactly the classic trainer's complexity but with each
step distributed. Determinism: ties break (count desc, a asc, b asc) so
the merge list is reproducible on any engine; iteration state is
``localCheckpoint``-ed so the per-step plan stays constant-size.

Encoding (`encode_words`) applies the learned merge list with the
standard greedy loop inside an Arrow-batched pandas UDF — per-word
Python, never per-corpus: encode the distinct-word table once and
broadcast-join the result back to the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_counts(
    docs: DataFrame,
    content_col: str = "content",
) -> DataFrame:
    """Corpus -> (word, cnt): the ONLY corpus-sized stage of BPE
    training. Simple tokenization (lowercase, split on non-[a-z0-9] —
    the engine's ``simple`` analyzer) so oracles can replay it; one
    map-side-combined groupBy, output is vocabulary-sized."""
    toks = F.array_remove(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _with_syms(words: DataFrame) -> DataFrame:
    """(word, cnt) -> (word, cnt, syms): characters + the end marker."""
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
    )
    return words.withColumn(
        "syms", F.concat(chars, F.array(F.lit(END)))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """(cnt, syms) -> (a, b, cnt): adjacent-pair counts weighted by word
    frequency. The generator explodes a LITERAL index sequence and
    element_at's the materialized array column (never the array's
    defining HOF chain — see CLAUDE.md on Generate inlining)."""
    i = F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("i")
    return (
        # single-symbol words have no pairs — and must be filtered, not
        # fed to sequence(1, 0), which Spark evaluates as the DESCENDING
        # [1, 0] rather than an empty array
        seqs.filter(F.size("syms") >= 2)
        .select("cnt", "syms", i)
        .select(
            F.element_at("syms", F.col("i")).alias("a"),
            F.element_at("syms", F.col("i") + 1).alias("b"),
            "cnt",
        )
        .groupBy("a", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def bpe_pair_counts(
    docs: DataFrame, content_col: str = "content"
) -> DataFrame:
    """The trainer's first-iteration statistics: adjacent symbol-pair
    counts over characters + ``</w>``, weighted by word frequency.
    Exposed separately because it is the SQL-replayable core the oracle
    gate checks; ``bpe_train`` iterates it."""
    return _pair_counts(_with_syms(word_counts(docs, content_col)))


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_pair_expr(a: str, b: str):
    """Replace every adjacent (a, b) in ``syms`` with the merged symbol,
    left-to-right non-overlapping — a pure-SQL fold so merge application
    needs no Python at all. The accumulator carries the output array
    plus a skip flag for the right half of a just-merged pair."""
    sa, sb, sm = _sql_str(a), _sql_str(b), _sql_str(a + b)
    # fold over positions: state = (out array, skip-next flag as int)
    return F.expr(
        f"""
        aggregate(
          sequence(1, size(syms)),
          struct(cast(array() as array<string>) as out, 0 as skip),
          (acc, i) -> CASE
            WHEN acc.skip = 1 THEN struct(acc.out as out, 0 as skip)
            WHEN i < size(syms)
                 AND element_at(syms, i) = {sa}
                 AND element_at(syms, i + 1) = {sb}
              THEN struct(
                concat(acc.out, array({sm})) as out,
                1 as skip)
            ELSE struct(
              concat(acc.out, array(element_at(syms, i))) as out,
              0 as skip)
          END,
          acc -> acc.out
        )
        """
    )


def bpe_train(
    words: DataFrame,
    num_merges: int = 32,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a (word, cnt) table.
    Deterministic: each step picks max count, ties broken (a asc,
    b asc). Stops early when the best pair's count < ``min_count``.
    Per step: one vocab-sized pair groupBy + a driver top-1 (the loop is
    inherently iterative — same precedent as the KMeans IVF trainer);
    the evolving symbol table is localCheckpoint-ed so plan size and
    lineage stay constant across iterations."""
    seqs = _with_syms(words).select("cnt", "syms").localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        best = (
            _pair_counts(seqs)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        seqs = seqs.select(
            "cnt", _merge_pair_expr(a, b).alias("syms")
        ).localCheckpoint()
    return merges


def encode_word_py(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy BPE encoder (public algorithm): repeatedly merge
    the best-ranked adjacent pair until none applies."""
    syms = list(word) + [END]
    while len(syms) > 1:
        pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
        ranked = [
            (ranks[p], i) for i, p in enumerate(pairs) if p in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def encode_words(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word[, ...]) -> (word, ..., bpe_tokens, n_bpe_tokens): apply a
    learned merge list. Arrow-batched pandas UDF over the DISTINCT-word
    relation (encode once per word, broadcast-join back to the corpus —
    never per-token Python over corpus rows)."""
    ranks = {tuple(m): r for r, m in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def _enc(col: pd.Series) -> pd.Series:
        return col.map(lambda w: encode_word_py(w, ranks))

    out = words.withColumn("bpe_tokens", _enc(F.col("word")))
    return out.withColumn(
        "n_bpe_tokens", F.size("bpe_tokens").cast("long")
    )
