"""Verbose-query term selection + hyperbolic rerank."""

import math

import pytest
from pyspark.sql import functions as F

from luc4ir_spark.functions.analysis import AnalyzerConfig
from luc4ir_spark.operators import feedback as fb
from luc4ir_spark.operators import indexer as ix
from luc4ir_spark.operators import qsel
from luc4ir_spark.operators import retrieval as rt

SIMPLE = AnalyzerConfig(mode="simple")
DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry date cherry"),
    (2, "apple apple apple fig"),
    (3, "grape fig date banana"),
    (4, "cherry cherry cherry cherry"),
]


@pytest.fixture(scope="module")
def index(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, content string")
    return ix.build_index(df, ix.IndexConfig(analyzer=SIMPLE))


def test_window_selection_matches_brute_force(spark, index):
    verbose = [
        ("v1", ["banana", "grape", "fig", "cherry", "apple", "banana"]),
        ("v2", ["apple", "cherry"]),  # shorter than window -> keep all
        ("v3", ["zzz", "yyy", "apple", "banana", "xxx"]),  # OOV idf=0
    ]
    qdf = spark.createDataFrame(verbose, "qid string, tokens array<string>")
    got = qsel.select_verbose_query_terms(
        qdf, index.term_stats, index.stats.n_docs, window_size=3
    ).collect()
    by_qid = {}
    for r in got:
        by_qid.setdefault(r["qid"], set()).add(r["term"])

    # brute force
    n = index.stats.n_docs
    dfm = {r["term"]: r["df"] for r in index.term_stats.collect()}
    for qid, toks in verbose:
        if len(toks) < 3:
            exp = set(toks)
        else:
            best, best_s = 0, -1.0
            for p in range(len(toks) - 2):
                s = sum(
                    math.log(n / dfm[t]) if t in dfm else 0.0
                    for t in toks[p : p + 3]
                ) / 3
                if s > best_s + 1e-12:
                    best, best_s = p, s
            exp = set(toks[best : best + 3])
        assert by_qid[qid] == exp, f"{qid}: {by_qid[qid]} != {exp}"


def test_selected_terms_retrieve(spark, index):
    qdf = spark.createDataFrame(
        [("v1", ["grape", "fig", "apple", "cherry", "banana"])],
        "qid string, tokens array<string>",
    )
    qt = qsel.select_verbose_query_terms(
        qdf, index.term_stats, index.stats.n_docs
    )
    run = rt.score_queries(index, qt, k=5)
    assert run.count() > 0


def test_hyperbolic_rerank(spark, index):
    qt = rt.queries_to_terms(spark, [("h1", "apple cherry")], SIMPLE)
    run = rt.score_queries(index, qt, k=10)
    rlm = fb.relevance_model(index, run, num_top_docs=3)
    out = fb.hyperbolic_rerank(index, run, rlm, num_top_docs=3).collect()
    rows = sorted(out, key=lambda r: r["rank"])
    assert len(rows) == 3
    assert [r["rank"] for r in rows] == [1, 2, 3]
    # distances ascend and are finite/non-negative
    scores = [r["score"] for r in rows]
    assert all(s >= 0 for s in scores)
    assert scores == sorted(scores)


def test_query_segmentation_glue(spark):
    """'new york' repeats adjacently (high glue) so it stays one
    segment; 'york pizza' never co-occurs adjacently -> boundary;
    unseen bigrams (OOV word) always split."""
    docs = spark.createDataFrame(
        [
            (1, "new york new york new york city"),
            (2, "pizza oven pizza slice"),
            (3, "new york again and new york"),
        ],
        "doc_id long, content string",
    )
    qq = spark.createDataFrame(
        [("q1", "new york pizza"), ("q2", "qqq new")],
        "qid string, text string",
    )
    got = {
        (r["qid"], r["seg"]): (r["phrase"], r["n_terms"])
        for r in qsel.query_segmentation(docs, qq, threshold=0.0).collect()
    }
    assert got[("q1", 0)] == ("new york", 2)
    assert got[("q1", 1)] == ("pizza", 1)
    # OOV leading token: unseen bigram -> boundary after the first token
    assert got[("q2", 0)] == ("qqq", 1)
    assert got[("q2", 1)] == ("new", 1)
