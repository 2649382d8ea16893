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
