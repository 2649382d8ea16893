"""Text analysis for corpus pipelines: language-id heuristic, quality
scoring, token counting, document fingerprinting.

All four are pure JVM-side column expressions (whole-stage codegen, no
UDF), each reproducible in ANSI SQL for the oracle gate. They extend the
reference's analyzer surface (SURVEY §2.2) with the per-document
statistics a training-data pipeline filters on.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.analysis import simple_tokens

# tiny per-language function-word sets for the n-gram/stopword-ratio
# language heuristic (public common function words). The language-id
# oracle SQL is GENERATED from this table (__spark_entry__._langid_sql),
# so widening it keeps the gate in sync automatically; ties break by
# language code ascending on both sides.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "den", "von", "ein"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "une", "dans", "que"],
    "it": ["il", "di", "che", "e", "un", "per", "non", "sono", "con", "della"],
    "nl": ["het", "een", "van", "en", "dat", "op", "te", "niet", "zijn", "voor"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em", "um", "para"],
}


def token_count(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace tokens, word tokens (BPE-ish [a-z0-9]+ pieces), chars."""
    c = F.col(content_col)
    ws = F.size(
        F.array_remove(F.split(F.trim(c), r"\s+"), "")
    ).cast("long")
    words = F.size(simple_tokens(c)).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        words.alias("word_tokens"),
        F.length(c).cast("long").alias("n_chars"),
    )


def _ratio(cnt: Column, total: Column) -> Column:
    return F.when(total > 0, cnt / total.cast("double")).otherwise(F.lit(0.0))


def _quality_cols(c: Column) -> dict[str, Column]:
    """Un-rounded quality signal columns over a content column; shared
    by quality_score and quality_filter so thresholds can't drift from
    the reported metrics."""
    toks = simple_tokens(c)
    n_tok = F.size(toks).cast("double")
    n_char = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("double")
    n_punct = F.length(
        F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}]", "")
    ).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(toks, stop_arr)).cast("double")
    alpha_ratio = _ratio(n_alpha, n_char)
    punct_ratio = _ratio(n_punct, n_char)
    stop_ratio = _ratio(n_stop, F.least(n_tok, F.lit(10.0)))
    mean_wlen = F.when(n_tok > 0, n_alpha / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    score = (
        F.lit(0.3) * len_score
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * stop_ratio
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0)))
    )
    return {
        "n_tok": n_tok,
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "mean_wlen": mean_wlen,
        "quality": score,
    }


def quality_score(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Composite quality heuristics: length, alpha ratio, punctuation
    density, stopword ratio, mean word length; plus a single [0,1] score
    blending them. Filters like score >= 0.5 prune boilerplate/garbage."""
    q = _quality_cols(F.col(content_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        q["n_tok"].cast("long").alias("n_tokens"),
        F.round(q["alpha_ratio"], 4).alias("alpha_ratio"),
        F.round(q["punct_ratio"], 4).alias("punct_ratio"),
        F.round(q["stop_ratio"], 4).alias("stop_ratio"),
        F.round(q["mean_wlen"], 4).alias("mean_word_len"),
        F.round(q["quality"], 4).alias("quality"),
    )


def _lang_best(c: Column) -> Column:
    """Struct (neg_hits, lang, hits) of the winning language for a
    content column: max marker-set intersection, ties by language code
    ascending. Shared by language_id and quality_filter."""
    toks = F.array_distinct(simple_tokens(c))
    hit_cols = []
    for lang in sorted(LANG_MARKERS):
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hit_cols.append(
            F.struct(
                F.size(F.array_intersect(toks, arr)).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax by (hits desc, lang asc): array_max on (hits, reversed-lang)
    # is awkward; sort_array desc on struct gives (max hits, max lang) —
    # so negate the tie field by sorting asc on (-hits, lang)
    return F.sort_array(
        F.array(*[
            F.struct(
                (-h["hits"]).alias("neg_hits"), h["lang"].alias("lang"),
                h["hits"].alias("hits"),
            )
            for h in hit_cols
        ])
    )[0]


def language_id(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    min_hits: int = 1,
) -> DataFrame:
    """Function-word-ratio language guess over LANG_MARKERS: the language
    whose marker set intersects the token set most wins; ties break by
    language code; below ``min_hits`` -> 'und'. A cheap, deterministic
    stand-in for a real langid model, but the Spark shape (token-set
    intersections in codegen, no UDF) is the production shape."""
    best = _lang_best(F.col(content_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["hits"] >= min_hits, best["lang"])
        .otherwise(F.lit("und"))
        .alias("lang_guess"),
        best["hits"].cast("long").alias("marker_hits"),
    )


def doc_fingerprint(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set (bag-of-words identity — catches reshuffled /
    re-wrapped duplicates that exact hashing misses)."""
    toks = F.array_sort(F.array_distinct(simple_tokens(F.col(content_col))))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
    )


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED string array
    == the count of the most frequent element — computed by a single
    codegen fold (no explode, no per-doc groupBy). 0 for empty arrays."""
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = (
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, acc0, step, lambda acc: acc["best"])


def repetition_stats(
    docs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models", §A1.1 quality heuristics): per document,

    - ``dup_line_frac``    — 1 - distinct/total over non-empty lines
      (boilerplate pages repeat nav/footer lines verbatim)
    - ``top_unigram_frac`` — count of the most frequent token / tokens
    - ``top_bigram_frac``  — count of the most frequent word bigram /
      bigram slots (n_tokens - 1); overlap-insensitive and bounded [0,1]

    Filters like ``top_unigram_frac > 0.3`` prune degenerate generated
    or keyword-stuffed text. Everything is a per-doc projection in
    whole-stage codegen: token mode counts come from a sort + one
    aggregate fold over the bounded per-doc array (`_max_run`) — no
    explode, no shuffle, `.explain` shows zero Exchange."""
    r = _repetition_cols(F.col(content_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        r["n_lines"].alias("n_lines"),
        F.round(r["dup_line_frac"], 4).alias("dup_line_frac"),
        F.round(r["top_unigram_frac"], 4).alias("top_unigram_frac"),
        F.round(r["top_bigram_frac"], 4).alias("top_bigram_frac"),
    )


def _repetition_cols(c: Column) -> dict[str, Column]:
    """Un-rounded repetition signal columns; shared by repetition_stats
    and quality_filter."""
    lines = F.array_remove(F.split(c, "\n"), "")
    n_lines = F.size(lines).cast("long")
    dup_lines = (n_lines - F.size(F.array_distinct(lines))).cast("long")

    toks = simple_tokens(c)
    n_toks = F.size(toks).cast("long")
    top_uni = _max_run(F.array_sort(toks))
    bigrams = F.when(
        n_toks >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_bi = _max_run(F.array_sort(bigrams))
    return {
        "n_lines": n_lines,
        "dup_line_frac": _ratio(dup_lines, n_lines),
        "top_unigram_frac": _ratio(top_uni, n_toks),
        "top_bigram_frac": _ratio(top_bi, n_toks - 1),
    }


# PII patterns shared verbatim with the SQL oracle (Java regex and
# DuckDB RE2 agree on these constructs: classes, \d, \b, {n,}, greedy).
# Applied in ORDER — ipv4 before phone, or the phone pattern would
# swallow dotted quads (both engines then disagree-proof by symmetry).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d"),
]


def redact_col(c: Column, token: str = "[PII]") -> Column:
    """The scrubbed-text column alone (all PII_PATTERNS applied in
    order) — for pipelines that need the clean text inline (e.g. the
    streaming ingest path) without the per-category count columns."""
    for _, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


# candidate card-number shape: 13-19 digits, single space/dash
# separators allowed (the form payment PII actually takes in text)
CC_CANDIDATE = r"\b(?:\d[ -]?){12,18}\d\b"


def _luhn_sql_pred() -> str:
    """The Luhn predicate as a SQL snippet over lambda variable ``c``
    (shared shape between the Spark HOF filter and the DuckDB oracle's
    list_filter)."""
    d = "regexp_replace(c, '[^0-9]', '')"
    return (
        f"length({d}) >= 13 AND length({d}) <= 19 AND "
        f"pmod(aggregate(sequence(1, length({d})), 0, (acc, i) -> acc + "
        f"CASE WHEN pmod(length({d}) - i, 2) = 1 THEN "
        f"  CASE WHEN (ascii(substring({d}, i, 1)) - 48) * 2 > 9 "
        f"       THEN (ascii(substring({d}, i, 1)) - 48) * 2 - 9 "
        f"       ELSE (ascii(substring({d}, i, 1)) - 48) * 2 END "
        f"ELSE ascii(substring({d}, i, 1)) - 48 END), 10) = 0"
    )


def redact_credit_cards(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    token: str = "[CC]",
) -> DataFrame:
    """Credit-card PII redaction with Luhn validation (the Presidio /
    scrubadub-style checksum pass): candidate 13-19-digit runs (single
    space/dash separators allowed) are extracted by regex and only
    those passing the Luhn checksum are redacted — a bare regex
    over-matches order ids, unix timestamps, and numeric hashes, which
    is why real hygiene pipelines checksum. -> (doc_id, n_cc, clean)
    with n_cc the count of VALIDATED card numbers replaced by
    ``token``.

    Plan shape: a zero-shuffle codegen projection — candidates via
    regexp_extract_all, the Luhn fold as an aggregate() HOF inside a
    filter() over the candidate array, and the replacement as an
    aggregate() fold of replace() over the validated candidates (so a
    number appearing twice redacts everywhere). No UDF, no join, no
    Exchange — the same map-only hygiene family as redact_pii."""
    cands = F.expr(
        f"regexp_extract_all({content_col}, r'{CC_CANDIDATE}', 0)"
    )
    valid = F.expr(
        f"filter(regexp_extract_all({content_col}, r'{CC_CANDIDATE}', 0),"
        f" c -> {_luhn_sql_pred()})"
    )
    clean = F.expr(
        f"aggregate(filter(regexp_extract_all({content_col},"
        f" r'{CC_CANDIDATE}', 0), c -> {_luhn_sql_pred()}),"
        f" {content_col}, (acc, c) -> replace(acc, c, '{token}'))"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(valid).cast("long").alias("n_cc"),
        clean.alias("clean"),
    )


def redact_pii(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    token: str = "[PII]",
) -> DataFrame:
    """Scrub emails / IPv4 addresses / phone-shaped numbers before a
    corpus is used for training: (doc_id, n_email, n_ipv4, n_phone,
    clean). ``clean`` is the text with every match replaced by ``token``,
    categories applied in PII_PATTERNS order; each category is counted
    on the text AFTER the previous categories were redacted, so a
    dotted quad never double-counts as a phone. Pure
    whole-stage-codegen projection (regexp_count + regexp_replace) —
    no UDF, no shuffle; the per-category counts make drop-vs-redact
    policy decisions auditable downstream."""
    clean = F.col(content_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.regexp_count(clean, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, token)
    return docs.select(
        F.col(id_col).alias("doc_id"), *counts, clean.alias("clean")
    )


def chunk_documents(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into sliding windows of ``chunk_tokens``
    whitespace tokens with ``overlap`` tokens shared between adjacent
    chunks — the standard pre-tokenization step for fixed-context
    training corpora. Emits (doc_id, chunk_idx, n_chunk_tokens,
    chunk_text); empty documents yield no rows; the final chunk is
    short rather than padded. n_chunks = ceil(max(n_tok - overlap, 1)
    / stride) with stride = chunk_tokens - overlap, so every token
    lands in at least one chunk and chunk starts advance uniformly.
    Pure map-side work: per-doc token array + a generated index array
    + explode — no shuffle, scales linearly with corpus bytes."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    c = F.col(content_col)
    toks = F.array_remove(F.split(F.trim(c), r"\s+"), "")
    n_tok = F.size(toks).cast("long")
    n_chunks = F.ceil(
        F.greatest(n_tok - overlap, F.lit(1).cast("long"))
        / F.lit(float(stride))
    ).cast("long")
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        n_tok.alias("_n"),
        n_chunks.alias("_nc"),
    ).filter(F.col("_n") > 0)
    idx = F.explode(F.sequence(F.lit(0).cast("long"), F.col("_nc") - 1))
    chunk = F.slice(
        F.col("_toks"),
        (F.col("chunk_idx") * stride + 1).cast("int"),
        chunk_tokens,
    )
    return (
        per_doc.select("doc_id", "_toks", idx.alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def bigram_cross_entropy(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    lam: float = 0.8,
) -> DataFrame:
    """Per-doc cross-entropy under an interpolated BIGRAM corpus LM —
    the next step up from the unigram CCNet signal
    (indexer.lm_cross_entropy) toward the KenLM-style n-gram perplexity
    filters real pipelines run: p(w2|w1) = lam·c(w1,w2)/c(w1) +
    (1-lam)·c(w2)/T, xent(d) = -Σ tf·ln p / Σ tf over the doc's
    bigrams. The unigram back-off term keeps every probability nonzero
    (any corpus bigram has positive count anyway — the model scores the
    corpus it was counted on, exactly like the CCNet signal).

    Tokenization is the engine's ``simple`` mode so oracles replay it.
    Docs with fewer than 2 tokens have no bigrams and are omitted.

    Plan shape at scale: bigram extraction explodes a LITERAL index
    sequence over the materialized token array (no HOF re-evaluation);
    corpus bigram/unigram tables are vocab²/vocab-bounded aggregations;
    the per-doc relation joins them unhinted so AQE broadcasts while
    they are small. One scalar action for T (same as the unigram LM)."""
    lam = float(lam)
    toks = F.array_remove(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
    )
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    uni = t.select("doc_id", F.explode("tk").alias("w"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    total = float(uni.count())
    # single-symbol docs filtered BEFORE sequence(1, size-1): Spark
    # evaluates sequence(1, 0) as the DESCENDING [1, 0], not empty
    i = F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i")
    bt = (
        t.filter(F.size("tk") >= 2)
        .select("doc_id", "tk", i)
        .select(
            "doc_id",
            F.element_at("tk", F.col("i")).alias("w1"),
            F.element_at("tk", F.col("i") + 1).alias("w2"),
        )
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    c2 = bt.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    p = (
        F.lit(lam) * F.col("c2") / F.col("c_w1")
        + F.lit(1.0 - lam) * F.col("c_w2") / F.lit(total)
    )
    return (
        bt.join(c2, ["w1", "w2"])
        .join(c1.select(F.col("w").alias("w1"), F.col("c").alias("c_w1")), "w1")
        .join(c1.select(F.col("w").alias("w2"), F.col("c").alias("c_w2")), "w2")
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum(F.col("tf") * F.log(p)) / F.sum("tf"), 4
            ).alias("xent_bigram")
        )
    )


def good_turing_counts(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Good-Turing count-of-counts over the corpus UNIGRAMS (Good'53;
    Gale & Sampson'95's simple GT) — the frequency-of-frequencies
    table every classical smoother starts from:

        N_r    = #types occurring exactly r times
        r*     = (r + 1) * N_{r+1} / N_r   (the GT adjusted count;
                 0 when N_{r+1} is empty — the unsmoothed-tail gap
                 Gale-Sampson fix by regression, out of scope here)
        p_unseen mass = N_1 / T  (the leave-one-out estimate)

    -> (r, n_r, r_star, p0) with p0 (the unseen mass) repeated on
    every row for convenience — all integers plus two divisions.

    Plan shape: two map-side-combined aggregates (term counts ->
    count-of-counts); output is O(distinct frequencies) rows."""
    toks = F.array_remove(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
    )
    uni = docs.select(F.explode(toks).alias("w"))
    tc = uni.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("r"))
    nr = tc.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    # one-row aggregates (an agg, not a filter — a corpus with no
    # hapax terms must still yield N_1 = 0, not an empty cross join)
    tot = tc.agg(
        F.sum("r").cast("long").alias("_t"),
        F.coalesce(
            F.sum(F.when(F.col("r") == 1, F.lit(1))), F.lit(0)
        )
        .cast("long")
        .alias("_n1"),
    )
    nxt = nr.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("_n_next")
    )
    base = nr.join(nxt, "r", "left").crossJoin(F.broadcast(tot))
    return base.select(
        "r",
        "n_r",
        F.round(
            F.coalesce(
                (F.col("r") + 1) * F.col("_n_next") / F.col("n_r"),
                F.lit(0.0),
            ),
            4,
        ).alias("r_star"),
        F.round(F.col("_n1") / F.col("_t"), 4).alias("p0"),
    )


def kneser_ney_xent(
    docs: DataFrame,
    discount: float = 0.75,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc cross-entropy under an interpolated Kneser-Ney BIGRAM
    LM (Kneser & Ney ICASSP'95; Chen & Goodman'98 showed it the best
    n-gram smoother — the one KenLM implements):

        p(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
                   + (D * N1+(w1,*)/c(w1)) * p_cont(w2)
        p_cont(w2) = N1+(*,w2) / |distinct bigram types|

    The continuation distribution is KN's insight: "Francisco" is
    frequent but follows only "San", so its continuation probability —
    how many CONTEXTS it completes — is tiny. Self-scored on the
    counting corpus (every doc bigram has c >= 1 > D, so p > 0 without
    an OOV branch), like the CCNet-style signals this extends.
    xent = -Σ tf·ln p / Σ tf over a doc's bigrams; < 2-token docs are
    omitted. -> (doc_id, n_bigrams, xent_kn).

    Plan shape: the bigram type table is counted ONCE and reused for
    c(w1,w2), N1+(w1,*), N1+(*,w2) and the type total — all
    vocab²-bounded aggregates off one explode; per-doc scoring joins
    them unhinted (AQE broadcasts while small)."""
    d_disc = float(discount)
    toks = F.array_remove(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
    )
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    i = F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i")
    bt = (
        t.filter(F.size("tk") >= 2)
        .select("doc_id", "tk", i)
        .select(
            "doc_id",
            F.element_at("tk", F.col("i")).alias("w1"),
            F.element_at("tk", F.col("i") + 1).alias("w2"),
        )
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    c2 = bt.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c2").alias("c_w1"),
        F.count(F.lit(1)).cast("double").alias("n1p_w1"),
    )
    cont = c2.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("n1p_w2")
    )
    n_types = float(c2.count())
    if n_types == 0:
        raise ValueError("kneser_ney_xent: the corpus has no bigrams")
    p = (
        (F.col("c2") - F.lit(d_disc)) / F.col("c_w1")
        + (F.lit(d_disc) * F.col("n1p_w1") / F.col("c_w1"))
        * (F.col("n1p_w2") / F.lit(n_types))
    )
    return (
        bt.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(cont, "w2")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("tf") * F.log(p)) / F.sum("tf"), 4
            ).alias("xent_kn"),
        )
    )


def boilerplate_strip(
    docs: DataFrame,
    stop_terms: tuple,
    min_tokens: int = 3,
    min_stop_frac: tuple = (1, 10),
    content_col: str = "content",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """Heuristic line-level boilerplate stripping — the jusText
    (Pomikálek 2011) / trafilatura line-classification pass of web
    corpus pipelines, the DENSITY complement of `dedup_lines`'
    cross-doc frequency pass: navigation, menus and link lists read as
    short lines with almost no function words, while genuine prose
    carries a steady stopword density. A (trimmed) line is KEPT iff

      n_tokens >= min_tokens  AND
      stop_cnt · den >= num · n_tokens     (min_stop_frac = (num, den))

    — the stopword-density test by integer cross-multiplication, so no
    float boundary exists cross-engine. Duplicated stop tokens count
    (density, not coverage). -> (doc_id, n_lines, n_kept, text_clean)
    with text_clean the kept lines re-joined by ``delim`` in original
    order ('' when every line drops).

    ``stop_terms`` is a function-word list (typically tens to a few
    hundred entries) embedded as a literal array — the apply_vocab
    small-vocabulary rule; a tokenizer-sized vocab does NOT belong
    here.

    Plan shape: lines posexplode from a codegen split (no HOF in the
    generator chain); per-line signals are scan-local projections; the
    ONLY shuffle is the groupBy(doc_id) rebuild with an in-agg array
    sort — the dedup_lines silhouette minus its digest join."""
    num, den = int(min_stop_frac[0]), int(min_stop_frac[1])
    stop_arr = F.array(*[F.lit(s) for s in stop_terms])
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.col(content_col), re.escape(delim), -1)
        ).alias("idx", "raw"),
    ).withColumn("line", F.trim(F.col("raw")))
    toks = F.array_remove(
        F.split(F.lower(F.col("line")), "[^a-z0-9]+"), ""
    )
    sig = lines.select(
        "doc_id",
        "idx",
        "line",
        F.size(toks).alias("_nt"),
        F.size(
            F.filter(toks, lambda t: F.array_contains(stop_arr, t))
        ).alias("_ns"),
    ).select(
        "doc_id",
        "idx",
        "line",
        (
            (F.col("_nt") >= F.lit(min_tokens))
            & (F.col("_ns") * F.lit(den) >= F.lit(num) * F.col("_nt"))
        ).alias("_keep"),
    )
    ordered = F.array_sort(
        F.collect_list(
            F.when(F.col("_keep"), F.struct("idx", "line"))
        )
    )
    return sig.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(ordered, lambda s: s["line"]), delim
        ).alias("text_clean"),
    )


def mlm_mask_plan(
    docs: DataFrame,
    vocab: DataFrame,
    mask_per_10000: int = 1500,
    content_col: str = "content",
    id_col: str = "doc_id",
    mask_token: str = "[MASK]",
) -> DataFrame:
    """BERT masked-LM corruption layout (Devlin et al. NAACL'19) — the
    80/10/10 companion to `mask_spans`' T5 span corruption: ~15% of
    token positions are selected as prediction targets; of those, 80%
    become ``mask_token``, 10% a RANDOM vocabulary token, 10% stay
    verbatim (so the model cannot assume an unmasked token is
    correct). Every draw is the portable mix hash of the (doc,
    position) key — deterministic, seedless, identical on re-runs and
    across engines:

        e1     = pmod(doc_id, P)·1009 + pos
        select = pmod(mix(e1), 10000) < mask_per_10000
        branch = pmod(mix(e1·31 + 17), 10)   (<8 mask, =8 random, =9 keep)
        vid    = pmod(mix(e1·101 + 29), |V|) (the random replacement)

    -> one row per SELECTED position: (doc_id, pos, label, action,
    input_token); ``label`` is the training target.

    Plan shape: positions posexplode from a codegen split (no HOF in
    the generator chain); every decision is a scan-local integer
    projection; the ONLY join is the |V|-row (vid, term) table —
    broadcast — for the 10% random branch. ``vocab`` gets its vid from
    a global row_number over the vocabulary-sized relation (the
    documented small-relation global-window exception)."""
    from ..functions import hashing as hx

    vocab_ids = vocab.select(
        (
            F.row_number().over(Window.orderBy(F.col("term").asc())) - 1
        ).alias("_vid"),
        F.col("term").alias("_vterm"),
    )
    n_vocab = vocab.count()
    if n_vocab == 0:
        raise ValueError("mlm_mask_plan: empty vocabulary")
    toks = F.array_remove(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "label")
    )
    e1 = F.pmod(F.col("doc_id"), F.lit(hx.MIX_P)) * F.lit(1009) + F.col(
        "pos"
    )
    sel = base.select(
        "doc_id",
        "pos",
        "label",
        F.pmod(hx.mix_id_expr(e1), F.lit(10000)).alias("_s"),
        F.pmod(
            hx.mix_id_expr(e1 * F.lit(31) + F.lit(17)), F.lit(10)
        ).alias("_b"),
        F.pmod(
            hx.mix_id_expr(e1 * F.lit(101) + F.lit(29)),
            F.lit(int(n_vocab)),
        ).alias("_vid"),
    ).filter(F.col("_s") < F.lit(int(mask_per_10000)))
    out = sel.join(F.broadcast(vocab_ids), "_vid", "left").select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "label",
        F.when(F.col("_b") < 8, F.lit("mask"))
        .when(F.col("_b") == 8, F.lit("random"))
        .otherwise(F.lit("keep"))
        .alias("action"),
        F.when(F.col("_b") < 8, F.lit(mask_token))
        .when(F.col("_b") == 8, F.col("_vterm"))
        .otherwise(F.col("label"))
        .alias("input_token"),
    )
    return out


def witten_bell_xent(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc cross-entropy under a Witten-Bell interpolated BIGRAM
    LM (Witten & Bell, IEEE Trans. IT 1991, "method C"; the smoothing
    SRILM ships as `-wbdiscount`) — completing the smoothing family
    next to Kneser-Ney, Stupid Backoff and Good-Turing:

        p(w2|w1) = λ(w1)·c(w1w2)/c(w1) + (1−λ(w1))·c(w2)/T
        λ(w1)    = c(w1)/(c(w1) + N1+(w1·))

    The novel-continuation count N1+(w1·) IS the escape mass: a
    context that has produced many distinct successors is likely to
    produce another new one, so it keeps more smoothing weight. Self-
    scored on the counting corpus (every doc bigram has c >= 1, so
    p > 0 without an OOV branch), like the sibling signals.
    xent = −Σ tf·ln p / Σ tf over a doc's bigrams; < 2-token docs are
    omitted. -> (doc_id, n_bigrams, xent_wb).

    Plan shape: identical to `kneser_ney_xent` — ONE literal-index
    explode builds the doc-bigram table; c(w1,w2), the context table
    (c(w1), N1+(w1·)) and the unigram table are vocab²-/vocab-bounded
    aggregates off it, joined back unhinted (AQE broadcasts while
    small); one scalar action for T."""
    toks = F.array_remove(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
    )
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    uni = t.select(F.explode("tk").alias("w2"))
    cu = uni.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("c_u")
    )
    total = float(uni.count())
    if total == 0:
        raise ValueError("witten_bell_xent: the corpus has no tokens")
    i = F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i")
    bt = (
        t.filter(F.size("tk") >= 2)
        .select("doc_id", "tk", i)
        .select(
            "doc_id",
            F.element_at("tk", F.col("i")).alias("w1"),
            F.element_at("tk", F.col("i") + 1).alias("w2"),
        )
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    c2 = bt.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c2").alias("c_w1"),
        F.count(F.lit(1)).cast("double").alias("n1p_w1"),
    )
    lam = F.col("c_w1") / (F.col("c_w1") + F.col("n1p_w1"))
    p = lam * (F.col("c2") / F.col("c_w1")) + (
        F.lit(1.0) - lam
    ) * (F.col("c_u") / F.lit(total))
    return (
        bt.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(cu, "w2")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("tf") * F.log(p)) / F.sum("tf"), 4
            ).alias("xent_wb"),
        )
    )


def stupid_backoff_xent(
    docs: DataFrame,
    lm_docs: DataFrame,
    alpha: float = 0.4,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc cross-entropy under a Stupid Backoff bigram LM (Brants
    et al. EMNLP'07 "Large language models in machine translation" —
    the deliberately unnormalized score Google used at web scale
    because it needs NO discounting statistics, only raw counts):

        S(w2|w1) = c(w1,w2)/c(w1)      if the bigram was seen
                 = alpha * c(w2)/T     else if w2 was seen
                 = alpha^2 / T         else (OOV floor)

    The LM is counted on ``lm_docs`` (an IN-DOMAIN reference subset —
    the cross-domain scoring setup where backoff actually fires, unlike
    the self-scored interpolated ``bigram_cross_entropy``); every doc
    in ``docs`` is scored against it: xent = -Σ tf·ln S / Σ tf over
    the doc's bigrams. Docs with < 2 tokens are omitted.
    -> (doc_id, n_bigrams, xent_sb).

    Plan shape: same as bigram_cross_entropy — LITERAL index-sequence
    bigram explode, vocab/vocab²-bounded count tables left-joined
    (AQE broadcasts while small), one scalar action for T."""
    alpha = float(alpha)
    toks = F.array_remove(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
    )

    def bigrams(df):
        t = df.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
        i = F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i")
        return (
            t.filter(F.size("tk") >= 2)
            .select("doc_id", "tk", i)
            .select(
                "doc_id",
                F.element_at("tk", F.col("i")).alias("w1"),
                F.element_at("tk", F.col("i") + 1).alias("w2"),
            )
        )

    lm_uni = lm_docs.select(F.explode(toks).alias("w"))
    c1 = lm_uni.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    total = float(lm_uni.count())
    if total == 0:
        raise ValueError(
            "stupid_backoff_xent: the LM corpus has no tokens"
        )
    c2 = (
        bigrams(lm_docs)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
    )
    bt = bigrams(docs).groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    joined = (
        bt.join(c2, ["w1", "w2"], "left")
        .join(
            c1.select(F.col("w").alias("w1"), F.col("c").alias("c_w1")),
            "w1",
            "left",
        )
        .join(
            c1.select(F.col("w").alias("w2"), F.col("c").alias("c_w2")),
            "w2",
            "left",
        )
    )
    s = (
        F.when(F.col("c2").isNotNull(), F.col("c2") / F.col("c_w1"))
        .when(
            F.col("c_w2").isNotNull(),
            F.lit(alpha) * F.col("c_w2") / F.lit(total),
        )
        .otherwise(F.lit(alpha * alpha) / F.lit(total))
    )
    return joined.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.round(
            -F.sum(F.col("tf") * F.log(s)) / F.sum("tf"), 4
        ).alias("xent_sb"),
    )


def trigram_cross_entropy(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    lam3: float = 0.6,
    lam2: float = 0.3,
) -> DataFrame:
    """Per-doc cross-entropy under an interpolated TRIGRAM corpus LM —
    one more order up from `bigram_cross_entropy` toward the KenLM
    perplexity filters (Jelinek-Mercer interpolation, the classic
    n-gram smoothing):

      p(w3|w1w2) = λ3·c(w1w2w3)/c(w1w2) + λ2·c(w2w3)/c(w2)
                   + (1−λ3−λ2)·c(w3)/T

    xent(d) = −Σ tf·ln p / Σ tf over the doc's trigrams; the unigram
    floor keeps every probability positive. Docs with fewer than 3
    tokens have no trigrams and are omitted.

    Plan shape: same as the bigram signal — LITERAL index-sequence
    explode over the materialized token array, vocab^k-bounded count
    tables joined unhinted (AQE broadcasts while small), one scalar
    action for T."""
    l3, l2 = float(lam3), float(lam2)
    if l3 < 0.0 or l2 < 0.0 or l3 + l2 >= 1.0:
        # a non-positive unigram floor lets p <= 0 through and the
        # cross-entropies silently go NaN
        raise ValueError(
            "trigram_cross_entropy: need lam3 >= 0, lam2 >= 0 and "
            f"lam3 + lam2 < 1 (got lam3={l3}, lam2={l2})"
        )
    l1 = 1.0 - l3 - l2
    toks = F.array_remove(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
    )
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    uni = t.select("doc_id", F.explode("tk").alias("w"))
    c1 = uni.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    total = float(uni.count())
    ib = F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i")
    bg = (
        t.filter(F.size("tk") >= 2)
        .select("tk", ib)
        .select(
            F.element_at("tk", F.col("i")).alias("w1"),
            F.element_at("tk", F.col("i") + 1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c12"))
    )
    it = F.explode(F.sequence(F.lit(1), F.size("tk") - 2)).alias("i")
    tt = (
        t.filter(F.size("tk") >= 3)
        .select("doc_id", "tk", it)
        .select(
            "doc_id",
            F.element_at("tk", F.col("i")).alias("w1"),
            F.element_at("tk", F.col("i") + 1).alias("w2"),
            F.element_at("tk", F.col("i") + 2).alias("w3"),
        )
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    c3 = tt.groupBy("w1", "w2", "w3").agg(F.sum("tf").alias("c123"))
    p = (
        F.lit(l3) * F.col("c123") / F.col("c12")
        + F.lit(l2) * F.col("c23") / F.col("c_w2")
        + F.lit(l1) * F.col("c_w3") / F.lit(total)
    )
    return (
        tt.join(c3, ["w1", "w2", "w3"])
        .join(bg, ["w1", "w2"])
        .join(
            bg.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("c12").alias("c23"),
            ),
            ["w2", "w3"],
        )
        .join(
            c1.select(F.col("w").alias("w2"), F.col("c").alias("c_w2")),
            "w2",
        )
        .join(
            c1.select(F.col("w").alias("w3"), F.col("c").alias("c_w3")),
            "w3",
        )
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum(F.col("tf") * F.log(p)) / F.sum("tf"), 4
            ).alias("xent_trigram")
        )
    )


def pack_sequences(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    seq_len: int = 1024,
    n_shards: int = 8,
    seed: int = 0,
) -> DataFrame:
    """GPT-style concatenate-and-chunk sequence packing, sharded: the
    layout step a fixed-context training pipeline runs after filtering —
    documents are concatenated in a deterministic shuffled order and
    cut into back-to-back ``seq_len``-token training sequences
    (doc boundaries may split across sequences; no padding waste).

    Determinism + scale come from the same trick as the WAND salt: each
    doc goes to shard ``pmod(mix(doc_id + seed), n_shards)`` and is
    ordered within its shard by ``(mix(doc_id + seed), doc_id)`` — the
    portable mix hash (functions/hashing.py) is the shuffle, so the
    layout is reproducible on any engine and there is NO global sort:
    the only window is per-shard (pick n_shards ≈ cluster parallelism
    and each task sorts ~corpus/n_shards rows; at 100 TB the shards are
    the unit of parallel sequence writing, and sequence ids are
    shard-local by design — global id = (shard, seq)).

    Emits one row per non-empty doc: (doc_id, shard, n_tokens,
    tok_offset = tokens preceding the doc within its shard,
    first_seq / last_seq = the shard-local sequence ids the doc's
    tokens land in). All-integer output, exact on any engine."""
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError("seq_len and n_shards must be positive")
    from pyspark.sql import Window

    from ..functions.hashing import mix_id_expr

    c = F.col(content_col)
    n_tok = F.size(F.array_remove(F.split(F.trim(c), r"\s+"), "")).cast(
        "long"
    )
    key = mix_id_expr(F.col(id_col) + F.lit(int(seed)))
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        key.alias("_key"),
        F.pmod(key, F.lit(int(n_shards))).cast("long").alias("shard"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_key").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return (
        per_doc.withColumn("tok_offset", off)
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            "tok_offset",
            F.expr(f"tok_offset DIV {int(seq_len)}").alias("first_seq"),
            F.expr(
                f"(tok_offset + n_tokens - 1) DIV {int(seq_len)}"
            ).alias("last_seq"),
        )
    )


def corpus_composition(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Corpus-mix report per stratum (source / domain / language shard):
    doc count, token total, mean quality, and each stratum's share of
    the corpus — the dashboard a data-mixing pipeline watches while
    tuning sampling rates. One partial-aggregated groupBy over per-doc
    codegen signals; the share window runs over the already-aggregated
    relation (rows = #strata, i.e. tiny at any corpus size), so the
    only full-data movement is the map-side-combined stratum shuffle."""
    c = F.col(content_col)
    q = _quality_cols(c)
    per_doc = docs.select(
        F.col(stratum_col).alias("stratum"),
        q["n_tok"].cast("long").alias("n_tok"),
        # per-doc 4dp before averaging: the mean is then reproducible
        # from the (rounded) per-doc quality_score output on any engine
        F.round(q["quality"], 4).alias("quality"),
    )
    agg = per_doc.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
    )
    from pyspark.sql import Window

    total = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        "stratum",
        "n_docs",
        "n_tokens",
        "mean_quality",
        F.round(F.col("n_docs") / total, 4).alias("doc_share"),
    )


# Default thresholds for quality_filter, shared with the generated
# oracle SQL (__spark_entry__._quality_filter_sql) so the gate and the
# operator can't drift. Values follow the C4 / Gopher filtering recipes
# scaled to the synthetic corpus (real crawls would raise min_tokens).
QUALITY_FILTER_DEFAULTS: dict[str, object] = {
    "min_tokens": 20,
    "min_quality": 0.7,
    "max_top_unigram": 0.15,
    "max_dup_line": 0.3,
    "allowed_langs": ("en",),
    "min_word_len": 2.0,
    "max_word_len": 12.0,
}


def quality_filter(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    min_quality: float = 0.7,
    max_top_unigram: float = 0.15,
    max_dup_line: float = 0.3,
    allowed_langs: tuple[str, ...] = ("en",),
    min_word_len: float = 2.0,
    max_word_len: float = 12.0,
) -> DataFrame:
    """C4/Gopher-style composite keep/drop verdict: one zero-shuffle
    projection combining the quality, repetition, and language signals
    (Raffel et al. 2020 §2.2; Rae et al. 2021 §A1.1). Emits the signal
    values used, a boolean ``keep``, and ``reasons`` — a comma-joined,
    fixed-order list of failed checks (empty when kept) so drops are
    auditable rather than silent. Thresholds compare the 4dp-rounded
    values (what the sibling operators report), keeping the decision
    reproducible across engines. All three signal families are per-doc
    codegen projections, so the whole filter runs scan-local: no
    shuffle, no UDF — at 100 TB this is a map-only pass."""
    f = quality_filter_cols(
        F.col(content_col),
        min_tokens=min_tokens,
        min_quality=min_quality,
        max_top_unigram=max_top_unigram,
        max_dup_line=max_dup_line,
        allowed_langs=allowed_langs,
        min_word_len=min_word_len,
        max_word_len=max_word_len,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[f[k].alias(k) for k in (
            "n_tokens", "quality", "top_unigram_frac", "dup_line_frac",
            "lang_guess", "mean_word_len", "keep", "reasons",
        )],
    )


def quality_filter_cols(
    c: Column,
    min_tokens: int = 20,
    min_quality: float = 0.7,
    max_top_unigram: float = 0.15,
    max_dup_line: float = 0.3,
    allowed_langs: tuple[str, ...] = ("en",),
    min_word_len: float = 2.0,
    max_word_len: float = 12.0,
) -> dict[str, Column]:
    """The quality_filter verdict as raw columns over a content column,
    for inlining into other plans (the streaming ingest path filters on
    ``keep`` without materializing a second projection)."""
    q = _quality_cols(c)
    r = _repetition_cols(c)
    best = _lang_best(c)
    lang = (
        F.when(best["hits"] >= 1, best["lang"]).otherwise(F.lit("und"))
    )
    n_tokens = q["n_tok"].cast("long")
    quality = F.round(q["quality"], 4)
    top_uni = F.round(r["top_unigram_frac"], 4)
    dup_line = F.round(r["dup_line_frac"], 4)
    mean_wlen = F.round(q["mean_wlen"], 4)
    checks = [
        ("short", n_tokens < F.lit(min_tokens)),
        ("low_quality", quality < F.lit(min_quality)),
        ("repetitive", top_uni > F.lit(max_top_unigram)),
        ("dup_lines", dup_line > F.lit(max_dup_line)),
        ("lang", ~lang.isin(list(allowed_langs))),
        (
            "word_len",
            (mean_wlen < F.lit(min_word_len))
            | (mean_wlen > F.lit(max_word_len)),
        ),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in checks]
    )
    return {
        "n_tokens": n_tokens,
        "quality": quality,
        "top_unigram_frac": top_uni,
        "dup_line_frac": dup_line,
        "lang_guess": lang,
        "mean_word_len": mean_wlen,
        "keep": reasons == "",
        "reasons": reasons,
    }


def top_ngrams(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    n: int = 2,
    k: int = 100,
) -> DataFrame:
    """Corpus-wide top-k positional word n-grams: (ngram, n_docs,
    total_count) ordered by total_count desc, then ngram asc (a total
    order, so top-k is deterministic). The corpus-level boilerplate
    probe that pairs with the per-doc ``repetition_stats`` — ubiquitous
    n-grams surface shared templates/boilerplate and feed stop-shingle
    lists for the dedup df caps.

    Tokens are the simple lowercase [a-z0-9]+ split (the `simple`
    analyzer convention shared with the oracles); n-grams are
    POSITIONAL (every occurrence counts toward total_count, each doc
    counts once toward n_docs). Plan: per-doc gram projection exploded
    via an index sequence, then ONE map-side-combined groupBy and a
    TakeOrderedAndProject top-k — the only shuffle carries partial
    (ngram, doc-partial) aggregates, and the k-row result never
    round-trips the full vocabulary through the driver."""
    if n < 1 or k < 1:
        raise ValueError("n and k must be >= 1")
    c = F.col(content_col)
    toks = F.array_remove(F.split(F.lower(c), "[^a-z0-9]+"), "")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(F.col(id_col).alias("doc_id"), grams.alias("_g"))
    idx = F.when(
        F.size("_g") > 0, F.sequence(F.lit(0), F.size("_g") - 1)
    ).otherwise(F.array().cast("array<int>"))
    exploded = base.select(
        "doc_id", "_g", F.explode(idx).alias("_i")
    ).select(
        "doc_id", F.element_at("_g", F.col("_i") + 1).alias("ngram")
    )
    agg = exploded.groupBy("ngram").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("total_count"),
    )
    return agg.orderBy(
        F.col("total_count").desc(), F.col("ngram").asc()
    ).limit(k)


def vocab_coverage(
    docs: DataFrame,
    content_col: str = "content",
    coverage: float = 0.95,
    min_count: int = 1,
) -> DataFrame:
    """Frequency-ordered vocabulary with cumulative-coverage cutoff:
    the smallest prefix of the count-desc (term asc on ties) token
    vocabulary whose summed counts reach ``coverage`` of the total
    token mass — the vocab-building step before tokenizer training /
    OOV analysis. Emits (rank, term, count, cum_share) for the kept
    prefix; ``min_count`` additionally drops hapax-style noise BEFORE
    coverage is computed (shares are over the filtered mass, matching
    tokenizer-training convention).

    Plan: one map-side-combined groupBy over the token explode, then a
    window cumsum over the count-ordered vocabulary. The window is a
    single global sort of the VOCABULARY relation (not the corpus) —
    distinct terms, Zipf-bounded, orders of magnitude smaller than the
    token stream; the corpus itself is touched by exactly one shuffle
    of partial (term, count) aggregates."""
    if not 0 < coverage <= 1:
        raise ValueError("coverage must be in (0, 1]")
    c = F.col(content_col)
    toks = F.array_remove(F.split(F.lower(c), "[^a-z0-9]+"), "")
    base = docs.select(toks.alias("_t"))
    idx = F.when(
        F.size("_t") > 0, F.sequence(F.lit(0), F.size("_t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    exploded = base.select("_t", F.explode(idx).alias("_i")).select(
        F.element_at("_t", F.col("_i") + 1).alias("term")
    )
    counts = (
        exploded.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    total = Window.partitionBy()
    order = Window.partitionBy().orderBy(
        F.col("count").desc(), F.col("term").asc()
    )
    w = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = counts.select(
        "term",
        "count",
        F.row_number().over(order).cast("long").alias("rank"),
        F.sum("count").over(w).cast("long").alias("_prefix"),
        F.sum("count").over(total).cast("long").alias("_total"),
    )
    # keep every term up to and INCLUDING the first row reaching the
    # coverage target: rows whose PREVIOUS prefix mass was still below
    # it. Integer-domain comparison (prefix - count < coverage * total)
    # so the cutoff is replayable bit-for-bit in any SQL engine.
    return ranked.filter(
        (F.col("_prefix") - F.col("count")).cast("double")
        < F.lit(float(coverage)) * F.col("_total").cast("double")
    ).select(
        "rank",
        "term",
        "count",
        F.round(
            F.col("_prefix") / F.col("_total").cast("double"), 4
        ).alias("cum_share"),
    )


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    bias: float = 0.0,
    threshold: float = 0.5,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Linear text-classifier inference — the fastText-style quality /
    domain classifier pass of large crawl pipelines (CCNet's
    LM+classifier stage, RefinedWeb/DCLM-style quality classifiers),
    with the model supplied as data: ``weights`` is a (term, weight)
    DataFrame (a trained model's vocabulary). Features are per-doc
    relative term frequencies over the ``simple`` token space,
    logit = sum_t tf(t,d)/|d| * w(t) + bias, score = sigmoid(logit),
    keep = logit >= ln(threshold / (1 - threshold)) — the decision is
    taken in the LOGIT domain, where it is exact, instead of through an
    extra exp() rounding step. Zero-token documents yield no row
    (nothing to featurize); documents with no in-vocabulary term score
    sigmoid(bias). -> (doc_id, logit, score, keep).

    Plan shape: tf extraction is the index build's explode +
    map-side-combined groupBy; the model joins as a BROADCAST
    (term, weight) table (vocab-sized, the small side by construction);
    one further map-side-combined groupBy by doc. No UDF, no window,
    no corpus-sized sort — the same two-shuffle silhouette as any
    retrieval scorer, so it rides the engine's proven scaling path."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        simple_tokens(content_col).alias("_toks"),
    ).withColumn("doc_len", F.size("_toks").cast("long"))
    flat = (
        toks.filter(F.col("doc_len") > 0)
        .select("doc_id", "doc_len", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    w = F.broadcast(weights.select("term", "weight"))
    scored = (
        flat.join(w, "term", "left")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(
                    F.col("tf") * F.coalesce(F.col("weight"), F.lit(0.0))
                )
                / F.max("doc_len")
                + F.lit(float(bias))
            ).alias("logit")
        )
    )
    cut = math.log(threshold / (1.0 - threshold))
    return scored.select(
        "doc_id",
        "logit",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit")))).alias("score"),
        (F.col("logit") >= F.lit(cut)).alias("keep"),
    )


def length_buckets(
    docs: DataFrame,
    max_len: int = 65536,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Padding-efficiency report for length-bucketed batching — the
    standard training-pipeline layout when sequences are padded to the
    nearest power-of-two bucket (dynamic batching à la tensor2tensor /
    fairseq `--required-batch-size-multiple` bucketing): every doc is
    assigned bucket_len = smallest power of two >= its simple-token
    count (zero-token docs drop; docs longer than ``max_len`` clamp
    into the top bucket and their counted tokens TRUNCATE to it — the
    usual max-sequence-length cut), and per bucket we report how much
    of the padded tensor is real data:

      efficiency = total_tokens / (n_docs · bucket_len)

    The bucket assignment is a LITERAL CASE chain generated from
    ``max_len`` (all-integer — no log2 float hazard: log2 of a
    power of two is not reliably exact across engines) and the report
    is one map-side-combined groupBy over ~log2(max_len) keys.
    -> (bucket_len, n_docs, total_tokens, total_padding, efficiency)."""
    n = F.size(simple_tokens(content_col)).cast("long")
    bounds = []
    b = 1
    while b < int(max_len):
        bounds.append(b)
        b *= 2
    bounds.append(b)
    nn = F.col("_n")
    bucket = F.lit(int(bounds[-1]))  # clamp: everything above tops out
    for bd in reversed(bounds[:-1]):
        bucket = F.when(nn <= F.lit(bd), F.lit(bd)).otherwise(bucket)
    per_doc = (
        docs.select(F.col(id_col).alias("doc_id"), n.alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            "doc_id",
            F.least(F.col("_n"), F.lit(int(bounds[-1])))
            .cast("long")
            .alias("_n"),
            bucket.cast("long").alias("bucket_len"),
        )
    )
    return (
        per_doc.groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_n").cast("long").alias("total_tokens"),
        )
        .select(
            "bucket_len",
            "n_docs",
            "total_tokens",
            (F.col("n_docs") * F.col("bucket_len") - F.col("total_tokens"))
            .cast("long")
            .alias("total_padding"),
            (
                F.col("total_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket_len")).cast("double")
            ).alias("efficiency"),
        )
    )


def length_batches(
    docs: DataFrame,
    batch_size: int = 8,
    n_shards: int = 4,
    max_len: int = 65536,
    content_col: str = "content",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Dynamic BATCH FORMATION over the length buckets — where
    ``length_buckets`` reports the hypothetical pad-to-bucket cost,
    this operator actually lays out the batches the way fairseq/HF
    dynamic batching does: sequences grouped into fixed-count batches
    of similar length and padded only to the BATCH max, the layout a
    finetuning pipeline materializes.

    Determinism + scale use the pack_sequences trick: shard =
    pmod(mix(doc_id + seed), n_shards) — the portable mix hash IS the
    shuffle — and the only window is per (bucket, shard), ordered by
    (token count DESC, doc_id), so there is NO global sort; pick
    n_shards ~ cluster parallelism. batch_idx = (rank-1) DIV
    batch_size; the final ragged batch of a cell is kept.
    -> (bucket_len, shard, batch_idx, n_seqs, max_tokens, sum_tokens,
    pad_frac) — all integers except pad_frac =
    (n·max − sum)/(n·max), ONE division."""
    if batch_size <= 0 or n_shards <= 0:
        raise ValueError("batch_size and n_shards must be positive")
    from pyspark.sql import Window

    from luc4ir_spark.functions.hashing import mix_id_expr

    n = F.size(simple_tokens(content_col)).cast("long")
    bounds = []
    b = 1
    while b < int(max_len):
        bounds.append(b)
        b *= 2
    bounds.append(b)
    nn = F.col("_n")
    bucket = F.lit(int(bounds[-1]))
    for bd in reversed(bounds[:-1]):
        bucket = F.when(nn <= F.lit(bd), F.lit(bd)).otherwise(bucket)
    per_doc = (
        docs.select(F.col(id_col).alias("doc_id"), n.alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            "doc_id",
            F.least(F.col("_n"), F.lit(int(bounds[-1])))
            .cast("long")
            .alias("_n"),
            bucket.cast("long").alias("bucket_len"),
            F.pmod(
                mix_id_expr(F.col("doc_id") + F.lit(int(seed))),
                F.lit(int(n_shards)),
            )
            .cast("long")
            .alias("shard"),
        )
    )
    w = Window.partitionBy("bucket_len", "shard").orderBy(
        F.col("_n").desc(), F.col("doc_id").asc()
    )
    batched = per_doc.withColumn(
        "batch_idx",
        ((F.row_number().over(w) - 1) / F.lit(int(batch_size)))
        .cast("long"),
    )
    per_batch = batched.groupBy("bucket_len", "shard", "batch_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_seqs"),
        F.max("_n").cast("long").alias("max_tokens"),
        F.sum("_n").cast("long").alias("sum_tokens"),
    )
    denom = F.col("n_seqs") * F.col("max_tokens")
    return per_batch.select(
        "bucket_len",
        "shard",
        "batch_idx",
        "n_seqs",
        "max_tokens",
        "sum_tokens",
        F.round((denom - F.col("sum_tokens")) / denom, 4).alias(
            "pad_frac"
        ),
    )


def train_quality_classifier(
    docs: DataFrame,
    label_col: str = "label",
    content_col: str = "content",
    id_col: str = "doc_id",
    max_iter: int = 20,
    reg_param: float = 0.0,
):
    """Train a linear quality/domain classifier with pyspark.ml and
    emit it in the engine's SERVING format — a (term, weight)
    DataFrame + bias for `classifier_score` — the trained counterpart
    of that operator's model-as-data contract (the same relationship
    `train_ivf_centroids` has to `ivf_cosine_topk`): CountVectorizer
    term-count features (the vocabulary IS the feature index, so
    coefficients map back to terms losslessly) into
    LogisticRegression. Features are raw term counts; the serving side
    divides by doc length, so the learned weights are on the
    relative-frequency scale up to the per-doc length factor the
    optimizer absorbs — for exact parity train-side docs and
    serve-side docs go through the same `simple` tokenizer.

    Returns ``(weights_df, intercept)``. Training is the standard
    distributed LBFGS of spark.ml (treeAggregate gradient passes) —
    sandbox-tested for accuracy in pytest, not oracle-gated: LBFGS
    float reductions are not bit-reproducible across engines, which is
    exactly why the gated classifier uses a data-supplied model."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import CountVectorizer

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).cast("double").alias("label"),
        simple_tokens(content_col).alias("tokens"),
    ).filter(F.size("tokens") > 0)
    cv = CountVectorizer(inputCol="tokens", outputCol="features")
    cv_model = cv.fit(toks)
    feats = cv_model.transform(toks)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=int(max_iter),
        regParam=float(reg_param),
    )
    lr_model = lr.fit(feats)
    coefs = lr_model.coefficients.toArray().tolist()
    vocab = list(cv_model.vocabulary)
    spark = docs.sparkSession
    weights = spark.createDataFrame(
        list(zip(vocab, [float(c) for c in coefs])),
        "term string, weight double",
    )
    return weights, float(lr_model.intercept)


def dsir_select(
    docs: DataFrame,
    n_buckets: int = 16,
    alpha: float = 0.5,
    topn: int = 10,
    target_col: str = "is_target",
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. NeurIPS'23, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by the log importance ratio of a TARGET distribution
    (the in-domain subset flagged by ``target_col``) to the RAW corpus
    distribution, both estimated over hashed unigram buckets, then keep
    the ``topn`` highest-weight documents:

      log w(d) = Σ_t tf(t,d) · [ ln p̂_tgt(b(t)) − ln p̂_raw(b(t)) ]

    with b(t) = md5-60bit(t) mod ``n_buckets`` (the repo's portable
    string hash — identical in Spark `conv` and DuckDB hex-cast) and
    add-``alpha`` smoothing p̂(b) = (cnt_b + α)/(total + α·B). Xie et
    al. sample from softmax weights; the deterministic top-n variant
    here is their "top-k heuristic" baseline (§4.1). Weights are
    rounded to 4dp BEFORE ranking (ties break doc_id ASC) so the keep
    set is engine-stable. -> (doc_id, n_tokens, rank, log_weight).

    Plan shape: one tf explode + map-side-combined groupBy (the index
    build's silhouette), bucket stats are a B-row relation joined back
    as a BROADCAST, and the top-n is orderBy+limit —
    TakeOrderedAndProject (per-partition heaps, driver merges topn
    rows), never a global window over the corpus."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(target_col).cast("boolean").alias("_tgt"),
        simple_tokens(content_col).alias("_toks"),
    )
    flat = (
        toks.select(
            "doc_id", "_tgt", F.explode("_toks").alias("term")
        )
        .groupBy("doc_id", "_tgt", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn(
            "bucket",
            F.pmod(
                F.expr("conv(substr(md5(term), 1, 15), 16, 10)")
                .cast("long"),
                F.lit(int(n_buckets)),
            ),
        )
    )
    bcnt = flat.groupBy("bucket").agg(
        F.sum("tf").cast("long").alias("raw_cnt"),
        F.sum(F.when(F.col("_tgt"), F.col("tf")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tgt_cnt"),
    )
    tot = bcnt.agg(
        F.sum("raw_cnt").cast("long").alias("raw_total"),
        F.sum("tgt_cnt").cast("long").alias("tgt_total"),
    )
    a, ab = float(alpha), float(alpha * n_buckets)
    lr = bcnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log(
                (F.col("tgt_cnt") + F.lit(a))
                / (F.col("tgt_total") + F.lit(ab))
            )
            - F.log(
                (F.col("raw_cnt") + F.lit(a))
                / (F.col("raw_total") + F.lit(ab))
            )
        ).alias("lr"),
    )
    w = (
        flat.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * F.col("lr")), 4).alias(
                "log_weight"
            ),
        )
    )
    sel = w.orderBy(
        F.col("log_weight").desc(), F.col("doc_id").asc()
    ).limit(int(topn))
    rank_w = Window.orderBy(
        F.col("log_weight").desc(), F.col("doc_id").asc()
    )
    return sel.withColumn(
        "rank", F.row_number().over(rank_w).cast("long")
    ).select("doc_id", "n_tokens", "rank", "log_weight")


def centroid_classify(
    docs: DataFrame,
    label_col: str = "source",
    content_col: str = "content",
    id_col: str = "doc_id",
    round_dp: int = 4,
) -> DataFrame:
    """Nearest-centroid (Rocchio) text classification — the classic
    IR classifier (Rocchio'71 as a classifier; Manning, Raghavan &
    Schütze IIR §14.2): each label's centroid is the sum of its
    documents' tf-idf vectors (the MEAN direction — cosine is
    scale-invariant, so the /|class| normalization is skipped), every
    document is assigned the label whose centroid it is most cosine-
    similar to, and the output is the label confusion matrix
    (true_label, pred_label, n_docs). Weights are
    tf · ln(N/df) over the simple token space; similarities are
    rounded to ``round_dp`` BEFORE the argmax (ties break label ASC)
    so the assignment is engine-stable.

    Plan shape: tf extraction is the usual explode + map-side-combined
    groupBy; the centroid matrix is (vocab × labels)-sized — label
    cardinality is small by construction (sources, languages), so it
    broadcasts; the doc-side dot products are ONE postings-shaped join
    against that broadcast followed by a (doc, label) aggregate; the
    argmax is a per-doc WindowGroupLimit. Nothing corpus² anywhere."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("_lbl"),
        simple_tokens(content_col).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    flat = (
        toks.select("doc_id", "_lbl", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "_lbl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dft = flat.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    n_docs = flat.select("doc_id").distinct().count()
    w = flat.join(F.broadcast(dft), "term").select(
        "doc_id",
        "_lbl",
        "term",
        (
            F.col("tf")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        ).alias("wt"),
    ).localCheckpoint(eager=False)
    # ^ consumed three times (doc norms, centroids, dot products)
    dnorm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("dn")
    )
    cent = w.groupBy("_lbl", "term").agg(F.sum("wt").alias("cw"))
    cnorm = cent.groupBy("_lbl").agg(
        F.sqrt(F.sum(F.col("cw") * F.col("cw"))).alias("cn")
    )
    dots = (
        w.select("doc_id", "term", "wt")
        .join(
            F.broadcast(
                cent.select(F.col("_lbl").alias("_cand"), "term", "cw")
            ),
            "term",
        )
        .groupBy("doc_id", "_cand")
        .agg(F.sum(F.col("wt") * F.col("cw")).alias("dot"))
    )
    sims = (
        dots.join(dnorm, "doc_id")
        .join(F.broadcast(cnorm.select(F.col("_lbl").alias("_cand"), "cn")),
              "_cand")
        .select(
            "doc_id",
            "_cand",
            F.round(
                F.col("dot") / (F.col("dn") * F.col("cn")), round_dp
            ).alias("cos"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("cos").desc(), F.col("_cand").asc()
    )
    pred = (
        sims.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("_cand").alias("pred_label"))
    )
    truth = toks.select("doc_id", F.col("_lbl").alias("true_label"))
    return (
        truth.join(pred, "doc_id")
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def naive_bayes_classify(
    docs: DataFrame,
    label_col: str = "source",
    content_col: str = "content",
    id_col: str = "doc_id",
    round_dp: int = 4,
) -> DataFrame:
    """Multinomial naive Bayes text classification with add-one
    (Laplace) smoothing — Lucene's classification module at the
    logical level (classification/SimpleNaiveBayesClassifier.java:
    class-conditional token likelihoods with +1 smoothing over the
    vocabulary, argmax of the summed log-likelihoods; Manning,
    Raghavan & Schütze IIR §13.2): per document d and class c,

        score(d,c) = ln P(c) + Σ_t tf_dt · ln((cf_tc + 1)/(T_c + V))

    where cf_tc is the class-conditional term count, T_c the class
    token total, V the vocabulary size, and P(c) the class's document
    prior. Output is the label confusion matrix (true_label,
    pred_label, n_docs), the same layout as ``centroid_classify``.
    Log-likelihoods are rounded to ``round_dp`` BEFORE the argmax
    (ties break label ASC) so the assignment is engine-stable.

    Plan shape — the SDM-style background decomposition keeps the
    doc×class join postings-sized: terms with cf_tc = 0 contribute
    tf·ln(1) = 0 to the numerator sum, so

        score(d,c) = ln P(c) − len_d·ln(T_c + V)
                     + Σ_{t: cf_tc>0} tf_dt·ln(cf_tc + 1)

    splits into a per-class constant (classes × 1, crossJoin-able), a
    doc-length term, and an overlap sum that is ONE postings-shaped
    join against the broadcast (vocab × labels) class-count table +
    a (doc, class) aggregate. Nothing corpus² anywhere; two scalar
    actions (N, V)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("_lbl"),
        simple_tokens(content_col).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    flat = (
        toks.select("doc_id", "_lbl", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "_lbl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # ^ consumed four times (class counts, vocab, doc lens, overlap)
    ctc = flat.groupBy(F.col("_lbl").alias("_cand"), "term").agg(
        F.sum("tf").cast("long").alias("cf_tc")
    )
    vocab_n = flat.select("term").distinct().count()
    n_docs = toks.count()
    consts = (
        toks.groupBy(F.col("_lbl").alias("_cand"))
        .agg(F.count(F.lit(1)).cast("long").alias("_nc"))
        .join(
            ctc.groupBy("_cand").agg(
                F.sum("cf_tc").cast("long").alias("_tc")
            ),
            "_cand",
        )
        .select(
            "_cand",
            F.log(F.col("_nc") / F.lit(float(n_docs))).alias("_lnp"),
            F.log(F.col("_tc") + F.lit(float(vocab_n))).alias("_lnz"),
        )
    )
    dstat = flat.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("_len")
    )
    overlap = (
        flat.select("doc_id", "term", "tf")
        .join(F.broadcast(ctc), "term")
        .groupBy("doc_id", "_cand")
        .agg(
            F.sum(
                F.col("tf") * F.log(F.col("cf_tc") + F.lit(1.0))
            ).alias("_ov")
        )
    )
    scored = (
        dstat.crossJoin(F.broadcast(consts))
        .join(overlap, ["doc_id", "_cand"], "left")
        .select(
            "doc_id",
            "_cand",
            F.round(
                F.col("_lnp")
                - F.col("_len") * F.col("_lnz")
                + F.coalesce(F.col("_ov"), F.lit(0.0)),
                round_dp,
            ).alias("ll"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("ll").desc(), F.col("_cand").asc()
    )
    pred = (
        scored.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("_cand").alias("pred_label"))
    )
    truth = toks.select("doc_id", F.col("_lbl").alias("true_label"))
    return (
        truth.join(pred, "doc_id")
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def readability(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease scoring — the classic readability signal
    (Flesch 1948; the same heuristic family C4/Gopher-style pipelines
    use as a cheap quality feature):

        206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)

    with the standard cheap proxies: words = ``simple`` tokens,
    sentences = runs of [.!?] (min 1), syllables = vowel-GROUP runs
    ([aeiouy]+) with vowel-less words counting 1. Because the simple
    tokenizer splits on non-alphanumerics, vowel runs cannot span word
    boundaries, so one regexp count over the whole lowered text equals
    the per-word sum — no explode, no UDF; the operator is a pure
    zero-shuffle codegen projection (the one HOF, the vowel-less-word
    filter, evaluates once per row in the same project).
    Zero-token documents yield no row.
    -> (doc_id, n_words, n_sentences, n_syllables long, flesch double).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        simple_tokens(content_col).alias("_t"),
        F.lower(F.col(content_col)).alias("_low"),
    ).filter(F.size("_t") > 0)
    n_words = F.size("_t").cast("long")
    n_sent = F.greatest(
        F.regexp_count("_low", F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    syl = (
        F.regexp_count("_low", F.lit("[aeiouy]+"))
        + F.size(F.filter("_t", lambda t: ~t.rlike("[aeiouy]")))
    ).cast("long")
    out = base.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        syl.alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words") / F.col("n_sentences"))
        - F.lit(84.6) * (F.col("n_syllables") / F.col("n_words"))
    )
    return out.select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        flesch.alias("flesch"),
    )


def classifier_eval(
    preds: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "logit",
    keep_col: str = "keep",
    label_col: str = "label",
    grid_decimals: int | None = None,
) -> DataFrame:
    """Binary-classifier evaluation against a labeled set — the
    held-out-eval step that closes the loop on ``classifier_score``
    (train/apply/EVALUATE, the standard quality-classifier workflow in
    crawl pipelines): confusion counts + precision/recall/F1 at the
    operating point (``keep_col``), and EXACT ROC AUC via the
    Mann-Whitney rank statistic with mid-rank tie handling,

        AUC = (R1 - P(P+1)/2) / (P*N),  R1 = sum of positive mid-ranks

    computed all-integer (mid-ranks are tracked doubled, 2*rank_start +
    group_size - 1, so .5 mid-ranks never touch floats) — the one
    division happens last, making the result fold-order-exact
    cross-engine. Degenerate denominators (no predicted positives, no
    positives/negatives at all) yield 0.0 / 0.5 respectively rather
    than nulls. -> one row (n, n_pos, n_neg, tp, fp, fn, tn long;
    precision, recall, f1, auc double).

    Plan shape: one equi-join on the id, one full aggregate for the
    confusion counts, one map-side-combined groupBy(score) for the tie
    groups, then a single cumulative window over the DISTINCT-score
    relation. Exact AUC fundamentally needs the global score CDF; with
    ``grid_decimals`` set the scores are first rounded to that grid, so
    the windowed relation is grid-bounded (the standard histogram-AUC
    practice at web scale — at 100 TB run grid_decimals=4 and the
    window sees <=20k rows regardless of corpus size)."""
    s = F.col(score_col).cast("double")
    if grid_decimals is not None:
        s = F.round(s, grid_decimals)
    j = preds.select(
        F.col(id_col).alias("_id"),
        s.alias("_s"),
        F.col(keep_col).cast("int").alias("_k"),
    ).join(
        labels.select(
            F.col(id_col).alias("_id"),
            F.col(label_col).cast("int").alias("_y"),
        ),
        "_id",
    )
    conf = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("_y")).cast("long").alias("n_neg"),
        F.sum(F.col("_k") * F.col("_y")).cast("long").alias("tp"),
        F.sum(F.col("_k") * (1 - F.col("_y"))).cast("long").alias("fp"),
        F.sum((1 - F.col("_k")) * F.col("_y")).cast("long").alias("fn"),
        F.sum((1 - F.col("_k")) * (1 - F.col("_y"))).cast("long").alias(
            "tn"
        ),
    )
    groups = j.groupBy("_s").agg(
        F.count(F.lit(1)).cast("long").alias("_c"),
        F.sum("_y").cast("long").alias("_p"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, 0)
    # doubled mid-rank of a tie group = 2*cum - c + 1 (rank_start =
    # cum - c + 1); R1 doubled = sum over groups of p * that — integer
    r2 = (
        groups.withColumn("_cum", F.sum("_c").over(w))
        .agg(
            F.sum(
                F.col("_p") * (2 * F.col("_cum") - F.col("_c") + 1)
            ).cast("long").alias("r2")
        )
    )
    prec_den = F.col("tp") + F.col("fp")
    prec = F.when(prec_den > 0, F.col("tp") / prec_den).otherwise(0.0)
    rec = F.when(
        F.col("n_pos") > 0, F.col("tp") / F.col("n_pos")
    ).otherwise(0.0)
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (
            F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)
        ) / (2.0 * F.col("n_pos") * F.col("n_neg")),
    ).otherwise(0.5)
    out = conf.crossJoin(F.broadcast(r2)).select(
        "n", "n_pos", "n_neg", "tp", "fp", "fn", "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        "r2",
        auc.alias("auc"),
    )
    f1 = F.when(
        F.col("precision") + F.col("recall") > 0,
        2.0 * F.col("precision") * F.col("recall")
        / (F.col("precision") + F.col("recall")),
    ).otherwise(0.0)
    return out.select(
        "n", "n_pos", "n_neg", "tp", "fp", "fn", "tn",
        "precision", "recall", f1.alias("f1"), "auc",
    )


def apply_vocab(
    docs: DataFrame,
    vocab: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    literal_max_terms: int = 10_000,
) -> DataFrame:
    """Vocabulary application with OOV accounting — the step between
    vocab building (``vocab_coverage``) and training-data
    serialization: count how much of each document the tokenizer
    vocabulary actually covers -> (doc_id, n_tokens, n_oov, oov_rate);
    zero-token docs yield no row (nothing to cover). The corpus-level
    OOV rate this aggregates to is the go/no-go signal before
    committing a vocab to a training run.

    Plan shape, auto-switched on vocab size (probed with ONE bounded
    ``limit(literal_max_terms + 1)`` collect, so neither path ever
    pulls an unbounded vocab to the driver):

    - ``<= literal_max_terms`` terms (filter-sized vocabularies, the
      hot path): the vocab becomes a literal array and the operator is
      a ZERO-shuffle projection — no explode, no join, no aggregation;
      per-token membership is an array_contains over the literal.
    - larger (tokenizer-scale vocabularies, e.g. a 100k BPE vocab): a
      literal that size is a plan-size/codegen hazard with O(|vocab|)
      per-token scans, so the twin runs explode + map-side-combined
      (doc, term) tf groupBy + BROADCAST left join against the vocab +
      one groupBy back to docs — the same two-shuffle silhouette as
      ``classifier_score``, hash-probe membership instead of a linear
      literal scan. Both paths return identical rows."""
    probe = vocab.select("term").limit(literal_max_terms + 1).collect()
    toks = simple_tokens(content_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_t")
    ).filter(F.size("_t") > 0)
    if len(probe) <= literal_max_terms:
        terms = sorted({r["term"] for r in probe})
        arr = F.array(*[F.lit(t) for t in terms])
        n_oov = F.size(
            F.filter("_t", lambda t: ~F.array_contains(arr, t))
        ).cast("long")
        return base.select(
            "doc_id",
            F.size("_t").cast("long").alias("n_tokens"),
            n_oov.alias("n_oov"),
            (n_oov / F.size("_t")).alias("oov_rate"),
        )
    flat = (
        base.withColumn("_n", F.size("_t").cast("long"))
        .select("doc_id", "_n", F.explode("_t").alias("term"))
        .groupBy("doc_id", "_n", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    v = F.broadcast(
        vocab.select("term").distinct().withColumn("_inv", F.lit(1))
    )
    agg = (
        flat.join(v, "term", "left")
        .groupBy("doc_id")
        .agg(
            F.max("_n").alias("n_tokens"),
            F.sum(
                F.when(F.col("_inv").isNull(), F.col("tf")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_oov"),
        )
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        (F.col("n_oov") / F.col("n_tokens")).alias("oov_rate"),
    )


def mask_spans(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    span_len: int = 4,
    stride: int = 7,
    mask_denom: int = 3,
    seed: int = 0,
) -> DataFrame:
    """T5-style span-corruption LAYOUT (Raffel et al. JMLR'20 §3.1.4):
    pick deterministic, non-overlapping token spans to mask for a
    denoising objective. Candidate spans start every ``stride`` tokens
    (stride >= span_len guarantees non-overlap) and a candidate is
    masked iff pmod(mix(doc_id * 2^20 + start + seed), mask_denom) == 0
    — the portable mix hash (functions/hashing.py), so the selection is
    reproducible bit-for-bit on any engine and the expected mask rate
    is span_len / (stride * mask_denom) tokens. Tokens are whitespace
    tokens (the same counting rule as pack_sequences /
    sample_token_budget). doc_id must fit 43 bits (the 2^20 packing —
    same convention as duplicate_spans).

    Emits one row per MASKED span: (doc_id, span_start, span_end,
    n_tokens), span_end exclusive — all-integer, exact on any engine.

    Plan shape: per-doc token count is one codegen projection; the
    candidate explode is over an integer ``sequence`` (never a
    token array — tokens are counted, not materialized), so the fan-out
    is n_tokens/stride rows per doc and there is NO shuffle at all."""
    if span_len <= 0 or stride < span_len or mask_denom <= 0:
        raise ValueError(
            "need span_len > 0, stride >= span_len, mask_denom > 0"
        )
    from ..functions.hashing import mix_id_expr

    c = F.col(content_col)
    n_tok = F.size(F.array_remove(F.split(F.trim(c), r"\s+"), "")).cast(
        "long"
    )
    per = docs.select(
        F.col(id_col).alias("doc_id"), n_tok.alias("n_tokens")
    ).filter(F.col("n_tokens") >= span_len)
    cand = per.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.sequence(
                F.lit(0),
                (
                    (F.col("n_tokens") - F.lit(span_len))
                    / F.lit(stride)
                ).cast("long"),
            )
        ).alias("_k"),
    ).withColumn("span_start", F.col("_k") * F.lit(stride))
    keep = (
        F.pmod(
            mix_id_expr(
                F.col("doc_id") * F.lit(1 << 20)
                + F.col("span_start")
                + F.lit(int(seed))
            ),
            F.lit(int(mask_denom)),
        )
        == 0
    )
    return cand.filter(keep).select(
        "doc_id",
        F.col("span_start"),
        (F.col("span_start") + F.lit(span_len)).alias("span_end"),
        "n_tokens",
    )


CHAR_ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def char_entropy(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-level Shannon entropy — the classic gibberish /
    boilerplate quality signal (low entropy = repeated filler, high =
    random noise; used alongside the C4/Gopher rules). Computed over
    lowercase text against a FIXED alphabet (a-z, 0-9, space) with one
    "other" bucket: count(c) = len - len(replace(text, c, '')) — 37
    literal codegen projections per row, NO character explode (a char
    explode is corpus_len rows — the GC storm this repo bans), no HOF,
    no UDF, zero shuffle. -> (doc_id, n_chars_total, entropy) with
    entropy in nats; empty docs are dropped.

    The fixed alphabet is part of the signal's definition (engines and
    locales then agree bit-for-bit); entropy over the full unicode
    alphabet would need a per-doc char histogram — a different cost
    class for ~no added filtering power on web/code text."""
    c = F.lower(F.col(content_col))
    n = F.length(c)
    counts = [
        (n - F.length(F.replace(c, F.lit(ch)))).cast("double")
        for ch in CHAR_ENTROPY_ALPHABET
    ]
    other = (n.cast("double") - sum(counts[1:], counts[0])).alias("_o")
    terms = counts + [other]
    nn = n.cast("double")
    ent = sum(
        (
            F.when(
                cnt > 0, -(cnt / nn) * F.log(cnt / nn)
            ).otherwise(F.lit(0.0))
            for cnt in terms[1:]
        ),
        F.when(
            terms[0] > 0, -(terms[0] / nn) * F.log(terms[0] / nn)
        ).otherwise(F.lit(0.0)),
    )
    return docs.filter(n > 0).select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_chars_total"),
        ent.alias("entropy"),
    )


def stratum_divergence(
    postings: DataFrame,
    doc_strata: DataFrame,
    stratum_col: str = "stratum",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-mix drift monitor: KL(P_stratum || P_corpus) between
    each stratum's unigram LM and the whole-corpus LM, computed from
    the inverted index's flat postings (term, doc_id, tf) — no
    re-tokenization, no token explode. ``doc_strata`` maps doc_id to
    its stratum (source, language, crawl snapshot, ...). Every stratum
    term exists in the corpus LM by construction, so no smoothing is
    needed and KL is finite. -> (stratum, n_terms, kl).

    Plan: ONE postings scan joined to the (broadcastable) stratum map
    feeds a (stratum, term) partial-agg; that compact table — at most
    |strata|·|vocab| rows — is localCheckpoint-ed (three consumers:
    stratum totals, corpus marginals, the KL join; plan dedup would
    otherwise recompute the shuffle per consumer) and everything after
    is vocab-sized. At 100 TB the only corpus-sized work is the first
    scan's map side."""
    strata = doc_strata.select(
        F.col(id_col).alias("doc_id"), F.col(stratum_col).alias("stratum")
    )
    tf_s = (
        postings.join(strata, "doc_id")
        .groupBy("stratum", "term")
        .agg(F.sum("tf").alias("cf_s"))
        .localCheckpoint(eager=False)
    )
    tot_s = tf_s.groupBy("stratum").agg(F.sum("cf_s").alias("t_s"))
    tf_c = tf_s.groupBy("term").agg(F.sum("cf_s").alias("cf"))
    tot = tf_c.agg(F.sum("cf").alias("t"))
    p_s = F.col("cf_s") / F.col("t_s")
    p_c = F.col("cf") / F.col("t")
    return (
        tf_s.join(tf_c, "term")
        .join(F.broadcast(tot_s), "stratum")
        .crossJoin(tot)
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(p_s * F.log(p_s / p_c)).alias("kl"),
        )
    )


def blocklist_filter(
    docs: DataFrame,
    phrases: list[str],
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Banned-phrase screening — the blocklist pass of crawl pipelines
    (NSFW word lists, boilerplate markers, licence strings): per doc,
    how many of the (case-insensitively matched) literal phrases occur
    as substrings, and keep = none did. -> (doc_id, n_hits, keep).

    Plan: one codegen projection — a sum of instr() terms over the
    LITERAL phrase list (no join, no explode, no UDF, zero shuffle);
    cost is |phrases| substring scans per doc, the same work a real
    Aho-Corasick pass does without the automaton constant. Keep the
    list to dozens-to-hundreds of phrases; a lexicon-sized blocklist
    should become a broadcast join against extracted n-grams
    instead."""
    if not phrases:
        raise ValueError("blocklist_filter: empty phrase list")
    low = F.lower(F.col(content_col))
    hits = [
        (F.instr(low, p.lower()) > 0).cast("long") for p in phrases
    ]
    n_hits = hits[0]
    for h in hits[1:]:
        n_hits = n_hits + h
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_hits.alias("n_hits"),
        (n_hits == 0).alias("keep"),
    )


def doc_keywords(
    docs: DataFrame,
    topm: int = 3,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction — the tf·idf term-selection
    heuristic behind tagging / related-terms UIs (and the float-scored
    cousin of `more_like_this`'s integer-keyed selection; Salton &
    Buckley'88 term weighting): each doc keeps its ``topm`` terms by
    tf · ln(N/df), ranked on the 4dp-ROUNDED weight (term-ASC ties) so
    the keep set is engine-stable. -> (doc_id, term, rank, tfidf).

    Plan shape: the index build's tf explode + one broadcast df join +
    a per-doc WindowGroupLimit (partial top-m before the shuffle) —
    never a global sort."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        simple_tokens(content_col).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    flat = (
        toks.select("doc_id", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dft = flat.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    n_docs = toks.count()
    w = flat.join(F.broadcast(dft), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
            4,
        ).alias("tfidf"),
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        w.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= int(topm))
        .select("doc_id", "term", "rank", "tfidf")
    )


def heaps_law(
    docs: DataFrame,
    n_checkpoints: int = 5,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law vocabulary-growth report (V = K·Tᵝ; Heaps'78 /
    Manning-Raghavan-Schütze IIR §5.1.1): at ``n_checkpoints`` doc-id
    prefixes of the corpus (c_k = floor(max_id·k/K) — ingestion-order
    proxy), report cumulative token count T_k, vocabulary size V_k,
    and the local exponent beta_k = ln(V_k/V_{k-1}) / ln(T_k/T_{k-1})
    — the standard sanity check that a corpus' vocabulary grows
    sublinearly (β ≈ 0.4-0.6 for natural text; β near 0 here flags a
    closed synthetic vocabulary, β near 1 flags id-like token noise).

    Plan shape: NO cumulative scan — V_k is counted from each term's
    FIRST-OCCURRENCE doc id (one min-aggregate over the postings,
    vocab-sized) joined against the K-row checkpoint grid, and T_k
    from the doc-length relation the same way; everything after the
    two base aggregates is K-row arithmetic.
    -> (checkpoint, max_doc_id, n_tokens, vocab, beta) — beta NULL at
    the first checkpoint."""
    k_n = int(n_checkpoints)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        simple_tokens(content_col).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    flat = toks.select(
        "doc_id", F.explode("_toks").alias("term")
    )
    fo = flat.groupBy("term").agg(F.min("doc_id").alias("fo"))
    dl = toks.select(
        "doc_id", F.size("_toks").cast("long").alias("dl")
    )
    max_id = dl.agg(F.max("doc_id")).collect()[0][0]
    spark = docs.sparkSession
    grid = spark.createDataFrame(
        [(k, int(max_id) * k // k_n) for k in range(1, k_n + 1)],
        "checkpoint long, max_doc_id long",
    )
    vocab = (
        fo.crossJoin(F.broadcast(grid))
        .filter(F.col("fo") <= F.col("max_doc_id"))
        .groupBy("checkpoint", "max_doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    tokens = (
        dl.crossJoin(F.broadcast(grid))
        .filter(F.col("doc_id") <= F.col("max_doc_id"))
        .groupBy("checkpoint", "max_doc_id")
        .agg(F.sum("dl").cast("long").alias("n_tokens"))
    )
    cur = vocab.join(tokens, ["checkpoint", "max_doc_id"])
    w = Window.orderBy("checkpoint")
    prev_v = F.lag("vocab").over(w)
    prev_t = F.lag("n_tokens").over(w)
    beta = F.when(
        prev_t.isNotNull() & (F.col("n_tokens") != prev_t),
        F.log(F.col("vocab").cast("double") / prev_v.cast("double"))
        / F.log(F.col("n_tokens").cast("double") / prev_t.cast("double")),
    )
    return cur.select(
        "checkpoint", "max_doc_id", "n_tokens", "vocab",
        beta.alias("beta"),
    )


def zipf_law(
    docs: DataFrame,
    top_n: int = 20,
    content_col: str = "content",
) -> DataFrame:
    """Zipf's-law rank-frequency report (cf ∝ rank^s, s ≈ −1 for
    natural text; Zipf'49 / Manning-Raghavan-Schütze IIR §5.1.2) —
    the frequency-side companion of ``heaps_law``: rank the top_n
    terms by collection frequency (cf DESC, term ASC — the
    deterministic cut) and report the LOCAL exponent between adjacent
    ranks, s_k = ln(cf_k/cf_{k−1}) / ln(k/(k−1)). Like heaps_law's
    lag-based beta, the local form needs no corpus-wide float sum —
    each value is one division of two logs, so it is engine-exact —
    where an OLS fit would hang a 4dp rounding on a fold-ordered
    Σ ln·ln. A flat head (synthetic uniform vocab) reads s ≈ 0; token
    noise reads s far below −1.
    -> (rank, term, cf, slope) — slope NULL at rank 1.

    Plan: one map-side-combined groupBy to cf (vocab-sized), one
    TakeOrderedAndProject-sized top_n window, K-row lag arithmetic."""
    toks = docs.select(simple_tokens(content_col).alias("_toks"))
    cf = (
        toks.select(F.explode("_toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cf"))
    )
    w = Window.orderBy(F.col("cf").desc(), F.col("term").asc())
    top = (
        cf.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(top_n))
    )
    wl = Window.orderBy("rank")
    prev_cf = F.lag("cf").over(wl)
    prev_rk = F.lag("rank").over(wl)
    slope = F.when(
        prev_cf.isNotNull(),
        F.log(F.col("cf").cast("double") / prev_cf.cast("double"))
        / F.log(F.col("rank").cast("double") / prev_rk.cast("double")),
    )
    return top.select("rank", "term", "cf", slope.alias("slope"))


def collocations_llr(
    docs: DataFrame,
    topn: int = 20,
    min_count: int = 2,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dunning log-likelihood-ratio collocations (Dunning CL'93,
    "Accurate Methods for the Statistics of Surprise and
    Coincidence") over adjacent simple-token bigrams: each bigram is
    scored by the LLR of w1/w2 dependence from the 2×2 contingency
    table k11 = c(w1 w2), k12 = c(w1 ·) − k11, k21 = c(· w2) − k11,
    k22 = N − k11 − k12 − k21, using the entropy form

      LLR = 2·( Σ xlx(k) − xlx(c1) − xlx(N−c1) − xlx(c2) − xlx(N−c2)
                + xlx(N) ),  xlx(x) = x·ln(x), xlx(0) = 0

    (row/column sums spelled via the marginals c1 = c(w1 ·),
    c2 = c(· w2) — the identical expression the oracle runs). Unlike
    `term_cooccurrence_pmi` (document-level co-occurrence), this is
    SEQUENCE adjacency — the classic collocation / phrase-discovery
    signal. Bigrams below ``min_count`` are not scored (marginals
    still count them). -> (w1, w2, c, rank, llr), the ``topn`` highest
    by 4dp-rounded LLR (ties w1, w2 ASC).

    Scale shape: the bigram table is the vocab²-bounded map-side-
    combined aggregate of `suggest_next_words` (LITERAL index explode
    over the materialized token array); marginals are two more tiny
    aggregates broadcast back; the top-n is orderBy+limit —
    TakeOrderedAndProject, never a global window."""
    toks = F.array_remove(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
    )
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    i = F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i")
    bg = (
        t.filter(F.size("tk") >= 2)
        .select("tk", i)
        .select(
            F.element_at("tk", F.col("i")).alias("w1"),
            F.element_at("tk", F.col("i") + 1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    # ^ consumed four times (marginals x2, total, the scored rows)
    left = bg.groupBy("w1").agg(F.sum("c").cast("long").alias("c1"))
    right = bg.groupBy("w2").agg(F.sum("c").cast("long").alias("c2"))
    tot = bg.agg(F.sum("c").cast("long").alias("n"))

    def xlx(x):
        return F.when(
            x > 0, x.cast("double") * F.log(x.cast("double"))
        ).otherwise(F.lit(0.0))

    j = (
        bg.filter(F.col("c") >= int(min_count))
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
    )
    k11 = F.col("c")
    k12 = F.col("c1") - F.col("c")
    k21 = F.col("c2") - F.col("c")
    k22 = F.col("n") - F.col("c1") - F.col("c2") + F.col("c")
    llr = F.lit(2.0) * (
        xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
        - xlx(F.col("c1")) - xlx(F.col("n") - F.col("c1"))
        - xlx(F.col("c2")) - xlx(F.col("n") - F.col("c2"))
        + xlx(F.col("n"))
    )
    scored = j.select(
        "w1", "w2", "c", F.round(llr, 4).alias("llr")
    )
    sel = scored.orderBy(
        F.col("llr").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(int(topn))
    rw = Window.orderBy(
        F.col("llr").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return sel.withColumn(
        "rank", F.row_number().over(rw).cast("long")
    ).select("w1", "w2", "c", "rank", "llr")


def suggest_next_words(
    docs: DataFrame,
    context_terms: DataFrame | list[str],
    k: int = 3,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Free-text next-word suggestion — Lucene
    ``suggest.analyzing.FreeTextSuggester`` at the bigram order: an
    n-gram LM counted from the corpus suggests the most likely
    continuations of the user's last typed word. For each context word
    w1, the top-k next words by corpus bigram count c(w1, w2), ordered
    (c DESC, w2 ASC) — all-integer ordering, engine-stable with no
    float tie-break. Contexts with no observed bigram yield no rows
    (the real suggester then backs off to the unigram order; callers
    can union a unigram-popularity fallback).

    Tokenization is the engine's ``simple`` mode so oracles replay it.
    -> (w1, w2, c, rank).

    Scale: the bigram table is a vocab²-bounded map-side-combined
    aggregation (same shape as bigram_cross_entropy — the extraction
    explodes a LITERAL index sequence over the materialized token
    array, never a HOF-computed one); the context list is tiny and
    broadcast; per-context top-k is a WindowGroupLimit, never a global
    sort."""
    if isinstance(context_terms, list):
        spark = docs.sparkSession
        ctx = spark.createDataFrame([(w,) for w in context_terms], "w1 string")
    else:
        ctx = context_terms.select(F.col(context_terms.columns[0]).alias("w1"))
    toks = F.array_remove(
        F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
    )
    t = docs.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    i = F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i")
    bg = (
        t.filter(F.size("tk") >= 2)
        .select("tk", i)
        .select(
            F.element_at("tk", F.col("i")).alias("w1"),
            F.element_at("tk", F.col("i") + 1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("w1").orderBy(
        F.col("c").desc(), F.col("w2").asc()
    )
    return (
        bg.join(F.broadcast(ctx), "w1")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select("w1", "w2", "c", "rank")
    )


"""URL canonicalization — the crawl-dedup key every web pipeline
computes before anything touches page bytes (CC dedup keys on
normalized URL first; see also RFC 3986 §6 syntax-based
normalization)."""

# tracking params stripped by normalize_urls: the click-id / campaign
# junk whose presence forks one page into dozens of "distinct" URLs
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid")


def normalize_urls(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """RFC 3986 syntax-based URL normalization plus the standard crawl
    conventions -> (id_col, url_col untouched, url_norm, host):

    - scheme and host lowercased (RFC 3986 §6.2.2.1)
    - fragment removed (never sent to the server)
    - default port stripped (:80 for http, :443 for https)
    - leading ``www.`` stripped from the host (the aggressive variant
      crawl dedup uses — document mirrors collapse)
    - query params: tracking params (``TRACKING_PARAM_PREFIXES``,
      matched by literal prefix — substr, not LIKE, so the underscore
      is not a wildcard) dropped, the rest SORTED bytewise and
      rejoined, empty query dropped entirely
    - empty path becomes ``/``

    Everything is scan-local codegen string work (regexp_extract /
    split / array_sort / HOF filter as a projection — no explode, no
    shuffle, no UDF): at crawl scale this is a free pass over the
    manifest. Malformed URLs (no ``scheme://host``) degrade
    gracefully: url_norm = the fragment-stripped lowercased original,
    host = ''."""
    url = F.col(url_col)
    nofrag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(
        F.regexp_extract(nofrag, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)
    )
    hostport = F.lower(
        F.regexp_extract(
            nofrag, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)", 1
        )
    )
    host = F.when(scheme == "http", F.regexp_replace(hostport, ":80$", "")).otherwise(
        F.when(
            scheme == "https", F.regexp_replace(hostport, ":443$", "")
        ).otherwise(hostport)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(
        nofrag, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    keep_pred = " AND ".join(
        f"substr(x, 1, {len(p)}) <> '{p}'"
        for p in TRACKING_PARAM_PREFIXES
    )
    q = F.array_join(
        F.array_sort(
            F.expr(
                f"filter(split({'_rawq'}, '&'), x -> x <> '' AND {keep_pred})"
            )
        ),
        "&",
    )
    base = df.select(
        F.col(id_col), url.alias(url_col), F.coalesce(rawq, F.lit("")).alias("_rawq")
    )
    out = base.withColumn("_q", q).select(
        id_col,
        url_col,
        F.when(
            hostport == "",
            F.lower(nofrag),
        )
        .otherwise(
            F.concat(
                scheme,
                F.lit("://"),
                host,
                path,
                F.when(F.col("_q") == "", F.lit("")).otherwise(
                    F.concat(F.lit("?"), F.col("_q"))
                ),
            )
        )
        .alias("url_norm"),
        host.alias("host"),
    )
    return out


def host_stats(
    docs: DataFrame,
    host_col: str = "host",
    quality_col: str = "n_chars",
    max_docs_per_host: int = 1000,
) -> DataFrame:
    """Host-level corpus report — the aggregation behind HOST-level
    curation (RefinedWeb curates URL/host before ever reading page
    bytes; over-represented hosts are crawl traps, SEO farms and
    mirror fields): per normalized host (see ``normalize_urls``),
    document count, total/average ``quality_col``, corpus share, and
    the over-cap flag feeding a blocklist review.
    -> (host, n_docs, total_chars, avg_chars, doc_share, over_cap);
    counts/totals integer-exact, the two ratios ONE division each.

    Plan shape: one map-side-combined host groupBy + a broadcast
    1-row total crossJoin. Host counts are heavy-tailed by nature —
    that skew lands in a COUNT (combiner-friendly), never a join."""
    per = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(quality_col).cast("long").alias("total_chars"),
    )
    total = docs.agg(F.count(F.lit(1)).cast("long").alias("_tot"))
    return per.crossJoin(F.broadcast(total)).select(
        "host",
        "n_docs",
        "total_chars",
        F.round(F.col("total_chars") / F.col("n_docs"), 4).alias(
            "avg_chars"
        ),
        F.round(F.col("n_docs") / F.col("_tot"), 4).alias("doc_share"),
        (F.col("n_docs") > int(max_docs_per_host)).alias("over_cap"),
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Robots-exclusion screening of a crawl frontier — RFC 9309 (the
    Robots Exclusion Protocol, Google's published REP semantics) at
    the single-user-agent level: each URL is checked against the
    ``rules`` table (host, directive ∈ {'allow','disallow'},
    path_prefix — one row per Allow/Disallow line of the host's
    robots.txt group for our agent), the matching rule with the
    LONGEST path prefix wins (RFC 9309 §2.2.2 "most specific match"),
    an allow/disallow tie at equal length resolves to ALLOW (§2.2.2:
    the least restrictive rule), and a URL with no matching rule is
    allowed. -> (doc_id, host, path, allowed, matched_prefix,
    directive) with NULL rule columns on the no-match default.

    Plan shape: rules tables are robots.txt-sized (bounded per host),
    so the rule side broadcasts; the match is one host equi-join with
    the startswith residual, then a per-URL bounded window (rules per
    URL ≤ rules per host) picks the winner. Equal-length distinct
    prefixes cannot both match one path, so the (length DESC,
    directive ASC) order is total on matches — deterministic on any
    engine. The frontier side is never shuffled."""
    u = urls.select(
        F.col(id_col).alias("doc_id"),
        F.col(host_col).alias("host"),
        F.col(path_col).alias("path"),
    )
    r = rules.select(
        F.col("host").alias("_rh"), "directive", "path_prefix"
    )
    m = u.join(
        F.broadcast(r),
        (F.col("host") == F.col("_rh"))
        & F.col("path").startswith(F.col("path_prefix")),
        "left",
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.length("path_prefix").desc(), F.col("directive").asc()
    )
    return (
        m.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            "host",
            "path",
            F.when(F.col("directive").isNull(), F.lit(True))
            .otherwise(F.col("directive") == "allow")
            .alias("allowed"),
            F.col("path_prefix").alias("matched_prefix"),
            "directive",
        )
    )


def warc_extract(
    warcs: DataFrame,
    content_col: str = "warc",
    id_col: str = "file_id",
) -> DataFrame:
    """WARC record header extraction (ISO 28500 — the Common Crawl
    container format, THE input shape of a 100 TB web-corpus
    pipeline): split a WARC blob into records on the ``WARC/1.0``
    version line and pull the header fields a corpus loader routes on
    (WARC-Type, WARC-Target-URI, Content-Length) plus the payload
    after the blank line. Like `sitemap_extract`, this is the
    narrow-regex idiom over a machine-generated format, not a general
    parser: header keys are case-normalized by matching both spellings
    upstream of this layer; bodies are returned verbatim.
    -> (file_id, seq, warc_type, target_uri, content_length, body);
    records without a WARC-Type are dropped (spec-invalid).

    Plan shape: one regexp split + posexplode + scan-local regex
    projections; no shuffle. At scale the outer splitter is the
    WARC-aware file reader (binaryFile + gzip member split,
    sources/docparsers.py); this operator is the per-record header
    stage of that pipeline."""
    recs = F.split(F.col(content_col), "WARC/1\\.0\r\n")
    base = warcs.select(
        F.col(id_col).alias("file_id"),
        F.posexplode(recs).alias("_i", "_r"),
    ).filter(F.col("_r") != "")
    hdr = F.regexp_extract
    return base.select(
        "file_id",
        F.col("_i").cast("long").alias("seq"),
        hdr(F.col("_r"), "WARC-Type: ([^\r\n]+)", 1).alias("warc_type"),
        hdr(F.col("_r"), "WARC-Target-URI: ([^\r\n]+)", 1).alias(
            "target_uri"
        ),
        F.nullif(
            hdr(F.col("_r"), "Content-Length: ([0-9]+)", 1), F.lit("")
        )
        .cast("long")
        .alias("content_length"),
        # ^ nullif before the cast: ANSI mode errors on ''::long when
        # the header is absent
        hdr(F.col("_r"), "(?s)\r\n\r\n(.*)$", 1).alias("body"),
    ).filter(F.col("warc_type") != "")


def group_gini(
    df: DataFrame,
    group_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Gini concentration coefficient over group sizes — the
    crawl-balance / source-diversity number corpus reports quote (a
    crawl where one host owns half the documents has a very different
    risk profile from a uniform one; same statistic the economics
    literature uses for income):

        G = (2·Σ_{i=1..n} i·x_(i) − (n+1)·Σx) / (n·Σx)

    over the ASCENDING-sorted group sizes x_(i) — the exact discrete
    formula, all-INTEGER numerator and denominator with ONE division,
    engine-identical (ties in x are rank-order independent: equal
    sizes contribute the same regardless of their i permutation...
    Σ i·x over a tie block is invariant since x is constant there).
    G = 0 uniform, → 1 concentrated. -> ONE row
    (n_groups, total, gini).

    Plan shape: one map-side-combined groupBy(group) + one window
    over the GROUP-CARDINALITY-sized relation (hosts/sources — the
    documented small-relation global-window exception) + one
    aggregate."""
    w = (
        F.count(F.lit(1)).cast("long")
        if weight_col is None
        else F.sum(weight_col).cast("long")
    )
    sizes = df.groupBy(F.col(group_col).alias("_g")).agg(w.alias("_x"))
    ranked = sizes.select(
        "_x",
        F.row_number()
        .over(Window.orderBy(F.col("_x").asc(), F.col("_g").asc()))
        .alias("_i"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("_x").cast("long").alias("total"),
        F.sum(F.col("_i") * F.col("_x")).cast("long").alias("_ix"),
    )
    return agg.select(
        "n_groups",
        "total",
        F.round(
            (
                F.lit(2) * F.col("_ix")
                - (F.col("n_groups") + 1) * F.col("total")
            )
            / (F.col("n_groups") * F.col("total")),
            4,
        ).alias("gini"),
    )


def sitemap_extract(
    sitemaps: DataFrame,
    content_col: str = "xml",
    id_col: str = "sitemap_id",
) -> DataFrame:
    """Sitemap URL-set extraction (sitemaps.org XML protocol — the
    crawl-seed feed every production crawler ingests next to
    robots.txt): pull every ``<loc>`` entry and its optional sibling
    ``<lastmod>`` from sitemap XML blobs. The extraction is a pure
    regex projection (`regexp_extract_all` — identical call in Spark
    and DuckDB), NOT a full XML parse: sitemap files are
    machine-generated flat lists, the narrow-regex idiom the
    reference's TREC SGML parser already established for this shape
    (sources/docparsers.py). lastmod is paired positionally from the
    per-<url> block regex, NULL ('' empty) when absent.
    -> (sitemap_id, seq, url, lastmod) with seq the 1-based position
    in the file (crawl-order preserving).

    Plan shape: one regexp_extract_all + a LITERAL-free posexplode of
    the per-row match array — scan-local; no shuffle at all."""
    blocks = F.expr(
        f"regexp_extract_all({content_col}, "
        "'<url>(.*?)</url>', 1)"
    )
    base = sitemaps.select(
        F.col(id_col).alias("sitemap_id"),
        F.posexplode(blocks).alias("_i", "_b"),
    )
    return base.select(
        "sitemap_id",
        (F.col("_i") + 1).cast("long").alias("seq"),
        F.regexp_extract(F.col("_b"), "<loc>([^<]+)</loc>", 1).alias(
            "url"
        ),
        F.regexp_extract(
            F.col("_b"), "<lastmod>([^<]+)</lastmod>", 1
        ).alias("lastmod"),
    ).filter(F.col("url") != "")


def gazetteer_extract(
    docs: DataFrame,
    entities: tuple,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dictionary (gazetteer) entity annotation — the broadcast-lexicon
    tagging pass of corpus enrichment pipelines (Lucene's Monitor /
    GATE-style gazetteer lookup; the EXTRACTION complement to
    `blocklist_filter`'s boolean screen): for every (doc, entity) hit,
    the mention count and first character offset. Entities may be
    multi-token phrases — this is substring matching on the raw text,
    not token matching.

      n_mentions   = (len(text) − len(replace(text, e, ''))) / len(e)
                     — the repo's length-replace counting trick
                     (`char_entropy`), integer-exact, no regex engine
      first_offset = instr(text, e)   (1-based; == DuckDB strpos,
                     parity verified by the `snippets` gate)

    NOTE: counts are raw substring occurrences (overlapping matches of
    self-overlapping entities are not double-counted by replace —
    'aa' in 'aaa' counts once; the standard gazetteer convention).
    -> (doc_id, entity, n_mentions, first_offset), hit rows only.

    Plan shape: docs × BROADCAST literal entity rows (a gazetteer is
    lexicon-sized), every measure a scan-local codegen projection, no
    shuffle at all past the scan. A 100k-entry gazetteer swaps the
    literal VALUES for a broadcast table — same plan."""
    ent = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(e,) for e in entities], "entity string"
        )
    )
    t = F.col(content_col)
    e = F.col("entity")
    hits = docs.select(
        F.col(id_col).alias("doc_id"), t.alias("_t")
    ).crossJoin(ent)
    return hits.select(
        "doc_id",
        "entity",
        (
            (F.length("_t") - F.length(F.replace(F.col("_t"), e)))
            / F.length(e)
        )
        .cast("long")
        .alias("n_mentions"),
        F.instr(F.col("_t"), e).cast("long").alias("first_offset"),
    ).filter(F.col("n_mentions") > 0)


def crawl_schedule(
    urls: DataFrame,
    host_col: str = "host",
    priority_col: str = "priority",
    id_col: str = "doc_id",
    max_delay: int = 5,
) -> DataFrame:
    """Politeness-constrained crawl-frontier scheduling — the per-host
    queue discipline of production crawlers (Heritrix's one
    outstanding request per queue, Nutch's fetch-list generation; Cho
    & Garcia-Molina's politeness constraint): at most ONE in-flight
    fetch per host, consecutive fetches to a host separated by its
    crawl delay, higher-priority URLs first within each host.

        host_seq   = rank within host by (priority DESC, id ASC)
        delay      = 1 + sid60(host) mod max_delay   (the portable
                     60-bit md5 standing in for robots Crawl-delay)
        fetch_time = (host_seq − 1) · delay

    -> (doc_id, host, host_seq, delay, fetch_time) — all integers,
    engine-exact. The frontier makespan is max(fetch_time) and a
    host's queue length bounds its finish time — the skew report a
    crawl planner reads off this table (aggregate downstream).

    Plan shape: ONE per-host window (partition-parallel — the natural
    frontier key) plus scan-local integer projections; nothing global.
    A pathological single-host frontier makes one partition hot, which
    is the TRUE structure of the problem (that host IS the
    bottleneck), not a plan artifact."""
    sid = F.conv(
        F.substring(F.md5(F.col(host_col)), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(id_col).asc()
    )
    return urls.select(
        F.col(id_col).alias("doc_id"),
        F.col(host_col).alias("host"),
        F.row_number().over(w).cast("long").alias("host_seq"),
        (F.pmod(sid, F.lit(int(max_delay))) + 1).cast("long").alias(
            "delay"
        ),
    ).select(
        "doc_id",
        "host",
        "host_seq",
        "delay",
        ((F.col("host_seq") - 1) * F.col("delay")).cast("long").alias(
            "fetch_time"
        ),
    )


# accent-fold map for normalize_for_dedup: the latin-1/latin-ext
# letters CCNet's unicode normalization folds to ascii; a literal
# translate so any engine replays it byte-for-byte
ACCENT_FROM = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿāēīōūăąćčďęěğıłńňőřśšťůźżž"
ACCENT_TO = "aaaaaaceeeeiiiinooooouuuuyyaeiouaaccdeegilnnorsstuzzz"


def normalize_for_dedup(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's dedup-hash text normalization (Wenzek et al. 2020 —
    text_normalizer.normalize: lowercase, strip accents, map every
    digit to a single class, drop punctuation, squeeze whitespace)
    so near-identical boilerplate hashes identically:

        lower -> accent fold (literal translate) -> digits to '0'
        -> punctuation removed -> whitespace squeezed + trimmed

    -> (doc_id, norm_text, norm_digest) with norm_digest = md5(norm) —
    the key exact/paragraph dedup should group on instead of the raw
    text. Pure codegen projection (translate + three regexp_replace),
    zero shuffles, zero UDFs — the 100 TB cost is one pass."""
    c = F.lower(F.col(content_col))
    c = F.translate(c, ACCENT_FROM, ACCENT_TO)
    c = F.regexp_replace(c, "[0-9]", "0")
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        c.alias("norm_text"),
        F.md5(c).alias("norm_digest"),
    )


def corpus_token_stats(
    docs: DataFrame,
    by: str = "lang",
    content_col: str = "content",
) -> DataFrame:
    """Per-group corpus budget statistics — the numbers a training-mix
    planner needs before sampling (how many tokens does each language
    hold, and how byte-expensive is a token there — the
    bytes-per-token "fertility" that differs wildly across scripts):

        n_docs, n_tokens (simple-mode), n_bytes (UTF-8 octets),
        tokens_per_doc, bytes_per_token

    -> one row per ``by`` value. One codegen projection + one
    map-side-combined groupBy — no UDF, no second pass; at 100 TB this
    is a single scan whose output is |groups| rows."""
    toks = F.size(
        F.array_remove(
            F.split(F.lower(F.col(content_col)), "[^a-z0-9]+"), ""
        )
    ).cast("long")
    agg = docs.groupBy(by).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
        F.sum(F.octet_length(content_col)).cast("long").alias("n_bytes"),
    )
    return agg.select(
        by,
        "n_docs",
        "n_tokens",
        "n_bytes",
        F.round(F.col("n_tokens") / F.col("n_docs"), 4).alias(
            "tokens_per_doc"
        ),
        F.round(F.col("n_bytes") / F.col("n_tokens"), 4).alias(
            "bytes_per_token"
        ),
    )
