"""Distributed unigram-LM tokenizer training + encoding.

The unigram language-model tokenizer (Kudo ACL'18; the SentencePiece
``--model_type=unigram`` trainer — public algorithm): treat every
piece as a unigram with probability p(piece), segment each word by the
Viterbi-best decomposition, and fit p by EM over the corpus. The other
major subword family beside BPE (`bpetrain.py`); both share the same
Spark shape:

- The ONLY corpus-sized stage is the tokenize + groupBy that collapses
  the corpus into the distinct-word count table (vocab-sized).
- Candidate pieces come from one substring-grid explode over that
  table (`sp_candidates` — SQL-replayable, the oracle-gated core).
- Each EM iteration runs on the word table only: the E-step Viterbi
  segmentation is an Arrow-batched pandas UDF per DISTINCT word (the
  per-word DP is inherently sequential — the canonical "tiny
  sequential state per key" shape), and the M-step is one
  map-side-combined groupBy over the emitted pieces.

Determinism: the seed inventory and every top-K cut order by
(count/prob DESC, piece ASC); EM arithmetic is plain float64 with a
fixed iteration count, so the trained inventory is reproducible
bit-for-bit (pytest replays it against a pure-Python reference).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpetrain import word_counts


def sp_candidates(
    docs: DataFrame,
    content_col: str = "content",
    max_piece_len: int = 6,
    max_pieces: int | None = None,
) -> DataFrame:
    """Candidate piece inventory: every substring of length
    1..``max_piece_len`` of every corpus word, weighted by
    occurrence (word count × occurrences inside the word) ->
    (piece, cnt[, rank]). With ``max_pieces`` set, keeps the top
    ``max_pieces`` by (cnt DESC, piece ASC) — a deterministic cut
    (single-character pieces are NOT force-kept here; ``sp_train``
    re-adds them to its seed so coverage never breaks).

    Plan shape: the word table is vocab-sized; the substring grid
    explodes TWO literal index sequences (start, length) over the
    materialized word column — never a computed-array HOF chain (see
    CLAUDE.md on Generate inlining) — and one map-side-combined
    groupBy collapses the grid. The optional top-K is a
    TakeOrderedAndProject-sized window over the piece table."""
    pieces = _candidates_from_words(
        word_counts(docs, content_col), max_piece_len
    )
    if max_pieces is None:
        return pieces
    from pyspark.sql import Window

    win = Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
    return (
        pieces.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= int(max_pieces))
        .select("piece", "cnt", "rank")
    )


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Viterbi-best segmentation of one word under piece log-probs —
    the reference DP (public algorithm; also the E-step kernel).
    best[j] = max over piece lengths l of best[j-l] + logp(piece);
    ties prefer the LONGER final piece (deterministic). Characters
    absent from ``logp`` fall back to -1e9 (segmentation always
    exists but is heavily penalized)."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for l in range(1, min(max_piece_len, j) + 1):
            piece = word[j - l : j]
            lp = logp.get(piece)
            if lp is None:
                if l != 1:
                    continue
                lp = -1e9
            cand = best[j - l] + lp
            # strict improvement, or equal score with a longer final
            # piece — the deterministic tie rule
            if cand > best[j] or (cand == best[j] and l > back[j]):
                best[j] = cand
                back[j] = l
    out: list[str] = []
    j = n
    while j > 0:
        l = back[j]
        out.append(word[j - l : j])
        j -= l
    return list(reversed(out))


def _segment_udf(logp: dict[str, float], max_piece_len: int):
    @F.pandas_udf("array<string>")
    def seg(words: pd.Series) -> pd.Series:
        return words.map(
            lambda w: viterbi_segment(w, logp, max_piece_len)
        )

    return seg


def sp_train(
    words: DataFrame,
    num_pieces: int = 200,
    max_piece_len: int = 6,
    em_iters: int = 2,
    seed_size: int = 2000,
) -> list[tuple[str, float]]:
    """Train a unigram-LM piece inventory from a (word, cnt) table:
    seed with the top ``seed_size`` candidate substrings (plus every
    single character, so any word stays segmentable), run ``em_iters``
    rounds of hard EM (Viterbi E-step per distinct word, count
    M-step), then keep the ``num_pieces`` most probable pieces
    (single characters force-kept; ties break piece ASC). Returns
    ``[(piece, prob), ...]`` sorted (prob DESC, piece ASC) —
    driver-sized, like `bpe_train`'s merge list.

    Hard-EM note: full SentencePiece uses lattice forward-backward
    expected counts and a loss-ranked prune schedule; the Viterbi
    (hard) E-step is its standard fast approximation and keeps every
    step exactly replayable in the pure-Python reference test."""
    # seed inventory: candidates + all chars (chars may be outside the
    # top-K; union fixes coverage) — all vocab-sized driver lists
    cand = (
        _candidates_from_words(words, max_piece_len)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(int(seed_size))
        .collect()
    )
    chars = (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word)),"
                    " i -> substr(word, i, 1))"
                )
            ).alias("piece")
        )
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    counts: dict[str, float] = {r["piece"]: float(r["cnt"]) for r in cand}
    for r in chars:
        counts.setdefault(r["piece"], 1.0)
    words = words.select("word", "cnt").localCheckpoint(eager=False)
    for _ in range(int(em_iters)):
        # sorted-key fold: collect() row order is nondeterministic and
        # float sums are fold-order-sensitive — sort before summing so
        # the trained inventory is bit-for-bit reproducible
        total = sum(c for _, c in sorted(counts.items()))
        logp = {p: math.log(c / total) for p, c in counts.items()}
        seg = _segment_udf(logp, max_piece_len)
        stats = (
            words.select("cnt", F.explode(seg(F.col("word"))).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("cnt").cast("double").alias("c"))
            .collect()
        )
        new_counts = {r["piece"]: float(r["c"]) for r in stats}
        # chars must never drop out (coverage); keep a floor count
        for r in chars:
            new_counts.setdefault(r["piece"], 1.0)
        counts = new_counts
    total = sum(c for _, c in sorted(counts.items()))
    char_set = {r["piece"] for r in chars}
    ranked = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )
    kept: list[tuple[str, float]] = []
    for p, c in ranked:
        if len(kept) >= int(num_pieces) and p not in char_set:
            continue
        kept.append((p, c / total))
    kept.sort(key=lambda kv: (-kv[1], kv[0]))
    return kept


def _candidates_from_words(
    words: DataFrame, max_piece_len: int
) -> DataFrame:
    """sp_candidates' grid, starting from an existing word table."""
    i = F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i")
    grid = words.select("word", "cnt", i)
    ln = F.explode(
        F.sequence(
            F.lit(1),
            F.least(
                F.lit(int(max_piece_len)),
                F.length("word") - F.col("i") + 1,
            ),
        )
    ).alias("l")
    return (
        grid.select("word", "cnt", "i", ln)
        .select(
            F.substring(F.col("word"), F.col("i"), F.col("l")).alias(
                "piece"
            ),
            "cnt",
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def sp_encode(
    words: DataFrame,
    pieces: list[tuple[str, float]],
    max_piece_len: int = 6,
) -> DataFrame:
    """Apply a trained inventory: Viterbi-segment every distinct word
    under the final piece log-probs (same Arrow kernel as the E-step;
    encode once per word, broadcast-join back to the corpus — never
    per-token Python over corpus rows) -> (word, ..., sp_tokens,
    n_sp_tokens)."""
    logp = {p: math.log(pr) for p, pr in pieces if pr > 0}
    seg = _segment_udf(logp, max_piece_len)
    out = words.withColumn("sp_tokens", seg(F.col("word")))
    return out.withColumn(
        "n_sp_tokens", F.size("sp_tokens").cast("long")
    )


def wordpiece_vocab(
    words: DataFrame,
    max_piece_len: int = 4,
    min_count: int = 5,
) -> DataFrame:
    """WordPiece piece inventory by ROLE (Schuster & Nakajima
    ICASSP'12; the BERT tokenizer's vocabulary shape): a piece either
    starts a word (root) or continues one (rendered ``##piece``).
    (word, cnt) -> (piece, is_cont) kept when the corpus occurrence
    weight (word count summed over every in-word occurrence in that
    role) reaches ``min_count``; ALL single-character pieces seen in
    the data are force-kept in their observed roles so every word of
    admissible length stays tokenizable — ``[UNK]`` is reserved for
    over-length words, not coverage gaps (a documented divergence
    from HuggingFace, which UNKs coverage gaps; our vocab is closed
    by construction so the gap case cannot arise).

    Plan: one substring-grid explode of two literal index sequences
    over the vocab-sized word table (never a computed-array HOF
    chain), one map-side-combined groupBy."""
    i = F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i")
    grid = words.select("word", "cnt", i)
    ln = F.explode(
        F.sequence(
            F.lit(1),
            F.least(
                F.lit(int(max_piece_len)),
                F.length("word") - F.col("i") + 1,
            ),
        )
    ).alias("l")
    return (
        grid.select("word", "cnt", "i", ln)
        .select(
            F.substring(F.col("word"), F.col("i"), F.col("l")).alias(
                "piece"
            ),
            (F.col("i") > 1).alias("is_cont"),
            "cnt",
        )
        .groupBy("piece", "is_cont")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .filter(
            (F.col("cnt") >= int(min_count)) | (F.length("piece") == 1)
        )
        .select("piece", "is_cont")
    )


def wordpiece_encode(
    words: DataFrame,
    vocab: DataFrame | None = None,
    max_piece_len: int = 4,
    min_count: int = 5,
    max_word_chars: int = 64,
) -> DataFrame:
    """WordPiece greedy longest-match-first encoding of every distinct
    corpus word (the BERT tokenizer's algorithm): at each position
    take the LONGEST vocabulary piece valid in that role, emit it,
    advance. Words longer than ``max_word_chars`` become the single
    ``[UNK]`` token (HuggingFace's max_input_chars_per_word).
    -> (word, n_pieces, encoded) with continuations rendered
    ``##piece`` and pieces space-joined in position order.

    Greedy-as-relations: the per-(word, position) LONGEST match is a
    grid⋈vocab groupBy-max — so the walk from position 0 follows a
    precomputed jump table next(p) = p + bestlen(p), a functional
    graph. The walk is materialized by POINTER DOUBLING: visited
    V_{k+1} = V_k ∪ g_k(V_k), g_{k+1} = g_k ∘ g_k, which reaches every
    position within 2^k − 1 steps after k rounds — so
    ceil(log2(max_word_chars)) self-joins of the vocab-sized jump
    table replace a length-bounded sequential loop. Single-char
    closure (wordpiece_vocab) guarantees next() is total below the
    length cap.

    Scale shape: the only corpus-sized stage is the caller's
    word_counts groupBy; everything here is vocab-sized × O(word_len)
    with O(log max_word_chars) joins — no per-token Python, no
    driver-side iteration over data."""
    import math as _m

    if vocab is None:
        vocab = wordpiece_vocab(
            words, max_piece_len=max_piece_len, min_count=min_count
        )
    w = words.select("word").distinct()
    ok = w.filter(F.length("word") <= int(max_word_chars))
    unk = w.filter(F.length("word") > int(max_word_chars)).select(
        "word",
        F.lit(1).cast("long").alias("n_pieces"),
        F.lit("[UNK]").alias("encoded"),
    )
    i = F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i")
    grid = ok.select("word", i)
    ln = F.explode(
        F.sequence(
            F.lit(1),
            F.least(
                F.lit(int(max_piece_len)),
                F.length("word") - F.col("i") + 1,
            ),
        )
    ).alias("l")
    cand = (
        grid.select("word", "i", ln)
        .select(
            "word",
            (F.col("i") - 1).alias("p"),
            "l",
            F.substring(F.col("word"), F.col("i"), F.col("l")).alias(
                "piece"
            ),
            (F.col("i") > 1).alias("is_cont"),
        )
        .join(vocab, ["piece", "is_cont"], "left_semi")
    )
    best = (
        cand.groupBy("word", "p")
        .agg(F.max("l").alias("bl"))
        .localCheckpoint(eager=False)
    )
    g = best.select("word", "p", (F.col("p") + F.col("bl")).alias("np"))
    visited = ok.select("word", F.lit(0).alias("p"))
    for _ in range(max(1, _m.ceil(_m.log2(max(2, int(max_word_chars)))))):
        visited = (
            visited.unionByName(
                visited.join(g, ["word", "p"]).select(
                    "word", F.col("np").alias("p")
                )
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        g = (
            g.alias("a")
            .join(
                g.alias("b"),
                (F.col("a.word") == F.col("b.word"))
                & (F.col("a.np") == F.col("b.p")),
            )
            .select(
                F.col("a.word").alias("word"),
                F.col("a.p").alias("p"),
                F.col("b.np").alias("np"),
            )
            .localCheckpoint(eager=False)
        )
    pieces = visited.join(best, ["word", "p"]).select(
        "word",
        "p",
        F.when(
            F.col("p") > 0,
            F.concat(
                F.lit("##"),
                F.substring(
                    F.col("word"), F.col("p") + 1, F.col("bl")
                ),
            ),
        )
        .otherwise(
            F.substring(F.col("word"), F.col("p") + 1, F.col("bl"))
        )
        .alias("piece_out"),
    )
    enc = pieces.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_pieces"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("p", "piece_out"))
                ),
                lambda x: x.getField("piece_out"),
            ),
            " ",
        ).alias("encoded"),
    )
    return enc.unionByName(unk)
