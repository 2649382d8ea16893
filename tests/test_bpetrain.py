"""BPE trainer/encoder vs a pure-Python replay of the public algorithm."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from luc4ir_spark.operators import bpetrain as bp


def python_bpe_train(word_cnt: dict[str, int], num_merges: int,
                     min_count: int = 2):
    """Independent reference trainer: dict-of-tuples symbol table."""
    seqs = {w: tuple(list(w) + [bp.END]) for w in word_cnt}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_cnt[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_count:
            break
        merges.append(best)
        a, b = best
        new = {}
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = tuple(out)
        seqs = new
    return merges


CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wide wider widest new low"),
    (3, "the lowest of the low"),
]


@pytest.fixture(scope="module")
def word_cnt():
    c = Counter()
    for _, t in CORPUS:
        c.update(t.lower().split())
    return dict(c)


def test_bpe_train_matches_python(spark, word_cnt):
    docs = spark.createDataFrame(CORPUS, "doc_id long, content string")
    wc = bp.word_counts(docs, content_col="content")
    got_wc = {r["word"]: r["cnt"] for r in wc.collect()}
    assert got_wc == word_cnt
    got = bp.bpe_train(wc, num_merges=10, min_count=2)
    want = python_bpe_train(word_cnt, 10, min_count=2)
    assert got == want and len(got) > 3


def test_bpe_pair_counts_weighted(spark, word_cnt):
    docs = spark.createDataFrame(CORPUS, "doc_id long, content string")
    got = {
        (r["a"], r["b"]): r["cnt"]
        for r in bp.bpe_pair_counts(docs, content_col="content").collect()
    }
    want = Counter()
    for w, c in word_cnt.items():
        syms = list(w) + [bp.END]
        for i in range(len(syms) - 1):
            want[(syms[i], syms[i + 1])] += c
    assert got == dict(want)


def test_merge_pair_expr_nonoverlapping(spark):
    """Left-to-right non-overlapping: 'aaa' under merge (a,a) ->
    ['aa','a','</w>'], exactly like the reference replace loop."""
    df = spark.createDataFrame(
        [(["a", "a", "a", bp.END],)], "syms array<string>"
    )
    out = df.select(bp._merge_pair_expr("a", "a").alias("m")).collect()
    assert out[0]["m"] == ["aa", "a", bp.END]


def test_encode_words_matches_greedy(spark, word_cnt):
    docs = spark.createDataFrame(CORPUS, "doc_id long, content string")
    wc = bp.word_counts(docs, content_col="content")
    merges = bp.bpe_train(wc, num_merges=6, min_count=2)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    got = bp.encode_words(wc, merges).collect()
    assert got
    for r in got:
        assert r["bpe_tokens"] == bp.encode_word_py(r["word"], ranks)
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])


# ---- unigram-LM (SentencePiece-style) trainer ----

def test_sp_candidates_hand_computed(spark):
    """Substring grid weighted by word counts, deterministic rank."""
    from luc4ir_spark.operators import sptrain as sp

    docs = spark.createDataFrame(
        [(0, "ab ab abc")], "doc_id long, content string"
    )
    out = {
        r["piece"]: r["cnt"]
        for r in sp.sp_candidates(docs, max_piece_len=2).collect()
    }
    # ab x2 + abc: a:3, b:3, ab:3, bc:1, c:1
    assert out == {"a": 3, "b": 3, "ab": 3, "bc": 1, "c": 1}
    ranked = sp.sp_candidates(docs, max_piece_len=2, max_pieces=3).collect()
    got = sorted((r["rank"], r["piece"]) for r in ranked)
    # ties at cnt=3 break piece ASC: a, ab, b
    assert got == [(1, "a"), (2, "ab"), (3, "b")]


def test_viterbi_segment_hand_computed():
    """DP picks the max-logp decomposition; equal scores prefer the
    longer final piece; unknown chars fall back penalized."""
    import math as m

    from luc4ir_spark.operators import sptrain as sp

    logp = {p: m.log(v) for p, v in
            {"a": 0.1, "b": 0.1, "ab": 0.3, "abc": 0.2, "c": 0.3}.items()}
    assert sp.viterbi_segment("abc", logp, 3) == ["abc"]
    # without 'abc': ab+c (0.09) beats a+b+c (0.003)
    del logp["abc"]
    assert sp.viterbi_segment("abc", logp, 3) == ["ab", "c"]
    # unknown char: penalized single-char fallback still segments
    assert sp.viterbi_segment("axb", logp, 3) == ["a", "x", "b"]


def test_sp_train_matches_python_replay(spark):
    """The distributed hard-EM trainer equals a pure-Python replay
    bit-for-bit (sorted-key float folds on both sides), and encoding
    round-trips: pieces concatenate back to each word."""
    import math as m
    from collections import Counter

    from luc4ir_spark.operators import sptrain as sp
    from luc4ir_spark.operators.bpetrain import word_counts

    docs = spark.createDataFrame(
        [
            (0, "low lower lowest newer newest"),
            (1, "low low lowest wide wider widest"),
            (2, "banana bandana and and and"),
        ],
        "doc_id long, content string",
    )
    wc_df = word_counts(docs, "content")
    got = sp.sp_train(
        wc_df, num_pieces=20, max_piece_len=4, em_iters=2, seed_size=60
    )

    wc = {r["word"]: r["cnt"] for r in wc_df.collect()}
    chars = {ch for w in wc for ch in w}
    cand = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for l in range(1, min(4, len(w) - i) + 1):
                cand[w[i:i + l]] += c
    top = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:60]
    counts = {p: float(c) for p, c in top}
    for ch in chars:
        counts.setdefault(ch, 1.0)
    for _ in range(2):
        total = sum(c for _, c in sorted(counts.items()))
        logp = {p: m.log(c / total) for p, c in counts.items()}
        new: dict = {}
        for w, c in wc.items():
            for piece in sp.viterbi_segment(w, logp, 4):
                new[piece] = new.get(piece, 0.0) + c
        for ch in chars:
            new.setdefault(ch, 1.0)
        counts = new
    total = sum(c for _, c in sorted(counts.items()))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    exp = []
    for p, c in ranked:
        if len(exp) >= 20 and p not in chars:
            continue
        exp.append((p, c / total))
    exp.sort(key=lambda kv: (-kv[1], kv[0]))
    assert got == exp

    enc = sp.sp_encode(wc_df, got, max_piece_len=4)
    for r in enc.collect():
        assert "".join(r["sp_tokens"]) == r["word"]
        assert r["n_sp_tokens"] == len(r["sp_tokens"])


def test_wordpiece_encode_explicit_vocab(spark):
    from luc4ir_spark.operators import sptrain as sp

    words = spark.createDataFrame(
        [("fast", 3), ("fas", 1), ("superduperword", 1)],
        "word string, cnt long",
    )
    vocab = spark.createDataFrame(
        [
            ("fast", False), ("fa", False), ("f", False),
            ("a", True), ("s", True), ("t", True), ("st", True),
        ],
        "piece string, is_cont boolean",
    )
    got = {
        r["word"]: (r["n_pieces"], r["encoded"])
        for r in sp.wordpiece_encode(
            words, vocab=vocab, max_word_chars=6
        ).collect()
    }
    # greedy longest-match: "fast" is a root piece; "fas" falls back
    # to fa + ##s; the 14-char word trips the length cap
    assert got["fast"] == (1, "fast")
    assert got["fas"] == (2, "fa ##s")
    assert got["superduperword"] == (1, "[UNK]")


def test_wordpiece_derived_vocab_closure(spark):
    from luc4ir_spark.operators import sptrain as sp

    # min_count high enough that ONLY single chars survive the cut:
    # every word still encodes (single-char closure), one char per piece
    words = spark.createDataFrame(
        [("ab", 1), ("ba", 1)], "word string, cnt long"
    )
    got = {
        r["word"]: r["encoded"]
        for r in sp.wordpiece_encode(words, min_count=99).collect()
    }
    assert got == {"ab": "a ##b", "ba": "b ##a"}
