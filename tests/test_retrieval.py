"""Index build + BM25 retrieval vs a brute-force pure-Python oracle,
on a tiny hand-built corpus with the full english analyzer chain."""

import math

import pytest
from pyspark.sql import functions as F

from luc4ir_spark.functions.analysis import AnalyzerConfig, analyze_text
from luc4ir_spark.operators import indexer as ix
from luc4ir_spark.operators import retrieval as rt

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "sparks fly when the spark engine joins tables quickly"),
    (2, "a lazy developer's guide to spark joins and windows"),
    (3, "quick quick quick repeated terms test document"),
    (4, "completely unrelated content about cooking pasta"),
    (5, "spark spark spark spark heavy term frequency document"),
]
QUERIES = [("q1", "quick spark"), ("q2", "lazy joins"), ("q3", "pasta")]
EN = AnalyzerConfig()


def brute_force_bm25(docs, queries, k1=0.7, b=0.3):
    """Independent oracle: dict-based BM25, same analyzer."""
    toks = {d: analyze_text(t, EN) for d, t in docs}
    n = len(docs)
    dls = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dls.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qtext in queries:
        qterms = analyze_text(qtext, EN)
        scores = {}
        for d, ts in toks.items():
            s = 0.0
            matched = False
            for qt in set(qterms):
                tf = ts.count(qt)
                if tf == 0 or qt not in df:
                    continue
                matched = True
                idf = math.log(1 + (n - df[qt] + 0.5) / (df[qt] + 0.5))
                s += (
                    qterms.count(qt)
                    * idf
                    * tf
                    / (tf + k1 * (1 - b + b * dls[d] / avgdl))
                )
            if matched:
                scores[d] = s
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


@pytest.fixture(scope="module")
def index(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, content string")
    return ix.build_index(df, ix.IndexConfig(analyzer=EN))


def test_doc_stats(index):
    stats = {r["doc_id"]: r["doc_len"] for r in index.doc_stats.collect()}
    for d, t in DOCS:
        assert stats[d] == len(analyze_text(t, EN))


def test_collection_stats(index):
    assert index.stats.n_docs == len(DOCS)
    exp_tot = sum(len(analyze_text(t, EN)) for _, t in DOCS)
    assert index.stats.total_tokens == exp_tot
    assert index.stats.avgdl == pytest.approx(exp_tot / len(DOCS))


def test_term_stats_df(index):
    df_map = {r["term"]: r["df"] for r in index.term_stats.collect()}
    # 'spark'/'sparks' both stem to 'spark' -> docs 1, 2, 5
    assert df_map["spark"] == 3
    assert df_map["quick"] == 2  # docs 0, 3 ('quickly' stems to 'quickli')
    assert "lazi" in df_map  # lazy -> lazi


def test_bm25_matches_brute_force(spark, index):
    oracle = brute_force_bm25(DOCS, QUERIES)
    qt = rt.queries_to_terms(spark, QUERIES, EN)
    run = rt.score_queries(index, qt, k=10).collect()
    got = {}
    for r in sorted(run, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for qid, expected in oracle.items():
        g = got.get(qid, [])
        assert [d for d, _ in g] == [d for d, _ in expected], (
            f"{qid}: rank order {g} != {expected}"
        )
        for (d1, s1), (d2, s2) in zip(g, expected):
            assert s1 == pytest.approx(s2, rel=1e-9)


def test_conjunctive(spark, index):
    qt = rt.queries_to_terms(spark, [("c1", "spark joins")], EN)
    run = rt.score_queries(index, qt, k=10, conjunctive=True).collect()
    got = sorted(r["doc_id"] for r in run)
    # 'spark' stem in docs 1,2,5; 'join' stem in docs 1,2 -> intersection {1,2}
    assert got == [1, 2]


def test_unknown_term_query(spark, index):
    qt = rt.queries_to_terms(spark, [("u1", "zzzmissing")], EN)
    assert rt.score_queries(index, qt, k=10).count() == 0


def test_weighted_terms(spark, index):
    qt = spark.createDataFrame(
        [("w1", "spark", 2.0)], "qid string, term string, weight double"
    )
    run1 = {
        r["doc_id"]: r["score"]
        for r in rt.score_queries(index, qt, k=10).collect()
    }
    qt1 = spark.createDataFrame(
        [("w1", "spark", 1.0)], "qid string, term string, weight double"
    )
    run2 = {
        r["doc_id"]: r["score"]
        for r in rt.score_queries(index, qt1, k=10).collect()
    }
    for d, s in run1.items():
        assert s == pytest.approx(2 * run2[d], rel=1e-12)


def test_trec_run_format(spark, index):
    qt = rt.queries_to_terms(spark, QUERIES, EN)
    run = rt.score_queries(index, qt, k=5)
    trec = rt.to_trec_run(run, "testrun").collect()
    assert all(r["q0"] == "Q0" for r in trec)
    assert all(r["runid"] == "testrun" for r in trec)
    by_qid = {}
    for r in trec:
        by_qid.setdefault(r["qid"], []).append(r["rank"])
    for ranks in by_qid.values():
        assert ranks == list(range(1, len(ranks) + 1))


def test_lm_similarities_run(spark, index):
    qt = rt.queries_to_terms(spark, QUERIES, EN)
    for kind in ("lmdir", "lmjm"):
        run = rt.score_queries(
            index, qt, k=10, sim=rt.Similarity(kind=kind)
        )
        assert run.count() > 0


def test_assign_doc_ids_deterministic(spark):
    df = spark.createDataFrame(
        [(f"r{i%3}", f"p{i}") for i in range(50)], "repo string, path string"
    )
    a = ix.assign_doc_ids(df, ["repo", "path"], num_buckets=8)
    b = ix.assign_doc_ids(df, ["repo", "path"], num_buckets=8)
    ids_a = {(r["repo"], r["path"]): r["doc_id"] for r in a.collect()}
    ids_b = {(r["repo"], r["path"]): r["doc_id"] for r in b.collect()}
    assert ids_a == ids_b
    assert sorted(ids_a.values()) == list(range(50))


def test_rrf_fuse_hand_computed(spark):
    # rrf(d2) = 1/62 + 1/61 beats rrf(d1) = 1/61 beats rrf(d3) = 1/62
    run_a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "qid string, doc_id long, rank long"
    )
    run_b = spark.createDataFrame(
        [("q", 2, 1), ("q", 3, 2)], "qid string, doc_id long, rank long"
    )
    out = rt.rrf_fuse(run_a, run_b).orderBy("rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in out] == [(2, 1), (1, 2), (3, 3)]
    assert out[0]["rrf"] == pytest.approx(1 / 62 + 1 / 61, abs=1e-12)
    assert out[1]["rrf"] == pytest.approx(1 / 61, abs=1e-12)
    assert out[2]["rrf"] == pytest.approx(1 / 62, abs=1e-12)
