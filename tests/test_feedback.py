"""Feedback stack vs pure-Python brute-force oracles on a tiny corpus."""

import math

import pytest
from pyspark.sql import functions as F

from luc4ir_spark.functions.analysis import AnalyzerConfig
from luc4ir_spark.operators import feedback as fb
from luc4ir_spark.operators import indexer as ix
from luc4ir_spark.operators import retrieval as rt

SIMPLE = AnalyzerConfig(mode="simple")
DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry date cherry"),
    (2, "apple apple apple fig"),
    (3, "grape fig date banana"),
    (4, "cherry cherry cherry cherry"),
]
QUERIES = [("f1", "apple cherry"), ("f2", "banana")]
M = 3  # feedback depth


def brute_run(k1=0.7, b=0.3, k=10):
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    dls = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dls.values()) / n
    dfm = {}
    for ts in toks.values():
        for t in set(ts):
            dfm[t] = dfm.get(t, 0) + 1
    run = {}
    for qid, qtext in QUERIES:
        scores = {}
        for d, ts in toks.items():
            s, hit = 0.0, False
            for qt in set(qtext.split()):
                tf = ts.count(qt)
                if tf == 0:
                    continue
                hit = True
                idf = math.log(1 + (n - dfm[qt] + 0.5) / (dfm[qt] + 0.5))
                s += idf * tf / (tf + k1 * (1 - b + b * dls[d] / avgdl))
            if hit:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        run[qid] = ranked
    return run


def brute_rm_cond(run, lam=1.0, m=M):
    toks = {d: t.split() for d, t in DOCS}
    out = {}
    for qid, ranked in run.items():
        top = ranked[:m]
        sum_sim = sum(s for _, s in top)
        # df over the top-doc pool + sumDf
        df_top, sum_df = {}, 0
        for d, _ in top:
            for t in set(toks[d]):
                df_top[t] = df_top.get(t, 0) + 1
        sum_df = sum(df_top.values())
        wt = {}
        for d, sim in top:
            dl = len(toks[d])
            for t in set(toks[d]):
                mix = lam * toks[d].count(t) / dl + (1 - lam) * df_top[t] / sum_df
                wt[t] = wt.get(t, 0.0) + mix * sim / sum_sim
        z = sum(wt.values())
        out[qid] = {t: w / z for t, w in wt.items()}
    return out


@pytest.fixture(scope="module")
def setup(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, content string")
    idx = ix.build_index(df, ix.IndexConfig(analyzer=SIMPLE))
    qt = rt.queries_to_terms(spark, QUERIES, SIMPLE)
    run = rt.score_queries(idx, qt, k=10)
    return idx, qt, run


@pytest.mark.parametrize("lam", [1.0, 0.6])
def test_rm_cond_matches_brute_force(spark, setup, lam):
    idx, qt, run = setup
    oracle = brute_rm_cond(brute_run(), lam=lam)
    got = fb.relevance_model(idx, run, num_top_docs=M, lam=lam)
    rows = got.collect()
    for r in rows:
        assert r["wt"] == pytest.approx(oracle[r["qid"]][r["term"]], rel=1e-9)
    for qid, terms in oracle.items():
        assert len([r for r in rows if r["qid"] == qid]) == len(terms)
    # weights normalized
    sums = {r["qid"]: 0.0 for r in rows}
    for r in rows:
        sums[r["qid"]] += r["wt"]
    for s in sums.values():
        assert s == pytest.approx(1.0)


def test_rm_iid_normalized(spark, setup):
    idx, qt, run = setup
    got = fb.relevance_model(idx, run, num_top_docs=M, variant="rlm_iid")
    sums = (
        got.groupBy("qid").agg(F.sum("wt").alias("s")).collect()
    )
    for r in sums:
        assert r["s"] == pytest.approx(1.0)


def test_kl_rerank_matches_brute_force(spark, setup):
    idx, qt, run = setup
    rlm = fb.relevance_model(idx, run, num_top_docs=M)
    got = fb.kl_divergence_rerank(idx, run, rlm, num_top_docs=M).collect()
    oracle_rm = brute_rm_cond(brute_run())
    toks = {d: t.split() for d, t in DOCS}
    for qid, ranked in brute_run().items():
        kls = {}
        for d, _ in ranked[:M]:
            dl = len(toks[d])
            kl = 0.0
            for w, wt in oracle_rm[qid].items():
                p_wd = max(toks[d].count(w) / dl, fb.KL_EPS)
                kl += wt * math.log(wt / p_wd)
            kls[d] = kl
        exp_order = sorted(kls.items(), key=lambda kv: (kv[1], kv[0]))
        got_q = sorted(
            [(r["rank"], r["doc_id"], r["score"]) for r in got if r["qid"] == qid]
        )
        assert [g[1] for g in got_q] == [d for d, _ in exp_order]
        for (_, _, s), (_, kl) in zip(got_q, exp_order):
            assert s == pytest.approx(kl, rel=1e-9)


def test_expand_query(spark, setup):
    idx, qt, run = setup
    rlm = fb.relevance_model(idx, run, num_top_docs=M)
    exp = fb.expand_query(
        rlm, qt, idx.term_stats, idx.stats.n_docs,
        num_expansion_terms=2, fb_weight=0.2,
    ).collect()
    f1 = [r for r in exp if r["qid"] == "f1"]
    orig = {r["term"]: r["weight"] for r in f1 if r["term"] in ("apple", "cherry")}
    assert orig["apple"] == pytest.approx(0.8 / 2)
    assert orig["cherry"] == pytest.approx(0.8 / 2)
    new = [r for r in f1 if r["term"] not in ("apple", "cherry")]
    assert 0 < len(new) <= 2
    assert all(r["weight"] > 0 for r in new)
    # expanded weighted query is scoreable
    run2 = rt.score_queries(
        idx, spark.createDataFrame(exp), k=5
    )
    assert run2.count() > 0


def test_retrieve_with_feedback_bounded_cached_rdds(spark, setup):
    """The F9 composition may hold a BOUNDED number of small cached
    relations per call (its four run-sized lazy localCheckpoints:
    first pass, feedback top slice, feedback postings join, raw RM
    weights) and must never cache anything corpus-sized or grow
    super-linearly across calls.

    Why not "zero leaked": pyspark's default pin-thread ClientServer
    gateway never sends py4j detach messages, so every JVM object the
    Python side touches stays strongly reachable from the gateway
    object map for the session lifetime — local-checkpoint RDDs are
    therefore session-pinned no matter how the Python refs are dropped
    (verified: the same dropped checkpoint IS cleaned under
    PYSPARK_PIN_THREAD=false, and never cleaned under the default).
    The meaningful invariant is that the pinned state is per-call
    bounded and feedback-sized."""
    import gc

    idx, qt, _ = setup
    gc.collect()
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    n_calls = 3
    for _ in range(n_calls):
        out = fb.retrieve_with_feedback(idx, qt, k=10, num_top_docs=M)
        assert out.count() > 0
    out = None
    gc.collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    leaked = after - before
    assert leaked <= 4 * n_calls, (
        f"super-linear cached-RDD growth: {leaked} new entries "
        f"for {n_calls} calls"
    )
    # and nothing corpus-sized: total cached bytes stay tiny
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    total_mb = sum(i.memSize() + i.diskSize() for i in infos) / 2**20
    assert total_mb < 64, f"cached {total_mb:.1f} MiB — not run-sized"


def test_retrieve_with_feedback_splice(spark, setup):
    """Rerank mode: head = KL-reranked top-M (ascending KL, score=KL),
    tail = first-pass ranks > M unchanged."""
    idx, qt, run = setup
    out = fb.retrieve_with_feedback(idx, qt, k=10, num_top_docs=M)
    got = {(r["qid"], r["doc_id"]): r for r in out.collect()}
    first = {(r["qid"], r["doc_id"]): r for r in run.collect()}
    # same doc set per query; tail rows identical to first pass
    assert set(got) == set(first)
    for key, r in first.items():
        if r["rank"] > M:
            g = got[key]
            assert (g["rank"], g["score"]) == (r["rank"], r["score"])


def test_clarity_and_js(spark, setup):
    idx, qt, run = setup
    rlm = fb.relevance_model(idx, run, num_top_docs=M)
    clarity = fb.query_clarity(rlm, idx.term_stats, idx.stats.total_tokens)
    for r in clarity.collect():
        assert r["clarity"] > -1e-9  # KL >= 0
    js = fb.query_query_similarity(rlm, rlm).collect()
    vals = {(r["qid"], r["qid_b"]): r["js_divergence"] for r in js}
    for (a, b), v in vals.items():
        assert v == pytest.approx(vals[(b, a)], rel=1e-9)  # symmetric
        if a == b:
            assert v == pytest.approx(0.0, abs=1e-12)
        assert v >= -1e-12


def test_diversity_rerank(spark, setup):
    idx, qt, run = setup
    out = fb.diversity_rerank(idx, run, num_rerank=3).collect()
    base = {(r["qid"], r["doc_id"]): r for r in run.collect()}
    by_qid = {}
    for r in out:
        by_qid.setdefault(r["qid"], []).append(r)
    for qid, rows in by_qid.items():
        rows.sort(key=lambda r: r["rank"])
        # permutation of the original docs, ranks 1..n, scores 1/rank
        orig_docs = {d for (q, d) in base if q == qid}
        assert {r["doc_id"] for r in rows} == orig_docs
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        for r in rows:
            assert r["score"] == pytest.approx(1.0 / r["rank"])
        # first selection is the top-scored doc (empty pool -> sim 0)
        top_doc = min(
            ((q, d) for (q, d) in base if q == qid),
            key=lambda kd: base[kd]["rank"],
        )[1]
        assert rows[0]["doc_id"] == top_doc


def test_significant_terms_hand_computed(spark):
    """Feedback set = top-1 doc; sig replayed in pure Python."""
    import math as m

    from luc4ir_spark.operators import feedback as fbm
    from luc4ir_spark.operators import indexer as ixm
    from luc4ir_spark.operators import retrieval as rtm
    from luc4ir_spark.functions.analysis import AnalyzerConfig

    docs = spark.createDataFrame(
        [
            (0, "apple apple banana"),
            (1, "banana cherry cherry cherry"),
            (2, "apple cherry date"),
        ],
        "doc_id long, content string",
    )
    idx = ixm.build_index(
        docs, ixm.IndexConfig(analyzer=AnalyzerConfig(mode="simple")),
        cache=False,
    )
    qt = rtm.queries_to_terms(
        spark, [("q", "apple")], AnalyzerConfig(mode="simple")
    )
    run = rtm.score_queries(idx, qt, k=10)
    out = fbm.significant_terms(idx, run, num_top_docs=1, top_m=5)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    # top-1 doc for 'apple' is doc 0 (tf=2, shortest): fb set
    # {apple: 2, banana: 1}, T_fb=3; corpus cf: apple 3, banana 2,
    # cherry 4, date 1, T=10
    exp = {
        "apple": 2 * m.log((2 / 3) / (3 / 10)),
        "banana": 1 * m.log((1 / 3) / (2 / 10)),
    }
    assert [r["term"] for r in rows] == sorted(
        exp, key=lambda t: -exp[t]
    )
    for r in rows:
        assert r["sig"] == pytest.approx(exp[r["term"]], rel=1e-12)


def test_rm3_interpolate_hand_computed(spark):
    """RM3 mix over the union vocabulary: truncation to top-m, kept
    mass renormalized, lambda split between query MLE and RM terms."""
    import pytest as pt
    from pyspark.sql import functions as F

    from luc4ir_spark.operators import feedback as fb

    rlm = spark.createDataFrame(
        [("q", "a", 0.5), ("q", "b", 0.3), ("q", "c", 0.2)],
        "qid string, term string, wt double",
    )
    qt = spark.createDataFrame(
        [("q", "a", 1.0), ("q", "x", 1.0)],
        "qid string, term string, weight double",
    )
    out = {
        r["term"]: r["weight"]
        for r in fb.rm3_interpolate(
            rlm, qt, num_expansion_terms=2, orig_weight=0.6
        ).collect()
    }
    # kept = {a: .5, b: .3} renormalized -> a .625, b .375; c truncated
    assert out["a"] == pt.approx(0.6 * 0.5 + 0.4 * 0.625, rel=1e-12)
    assert out["b"] == pt.approx(0.4 * 0.375, rel=1e-12)
    assert out["x"] == pt.approx(0.6 * 0.5, rel=1e-12)
    assert "c" not in out
    # the mixture is a probability distribution over the union
    assert sum(out.values()) == pt.approx(1.0, rel=1e-12)


def test_rocchio_expand_hand_computed(spark):
    """alpha*q + beta*centroid with tf-idf doc vectors over the top-k
    pseudo-relevant pool; centroid truncation drops the lightest term."""
    import math

    import pytest as pt
    from pyspark.sql import functions as F

    from luc4ir_spark.functions.analysis import AnalyzerConfig
    from luc4ir_spark.operators import feedback as fb
    from luc4ir_spark.operators import indexer as ixm

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "d d d")],
        "doc_id long, content string",
    )
    idx = ixm.build_index(
        docs, ixm.IndexConfig(analyzer=AnalyzerConfig(mode="simple")),
        cache=False,
    )
    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "qid string, doc_id long, rank long",
    )
    qt = spark.createDataFrame(
        [("q", "a", 1.0)], "qid string, term string, weight double"
    )
    out = {
        r["term"]: r["weight"]
        for r in fb.rocchio_expand(
            idx, run, qt, num_top_docs=2, alpha=1.0, beta=0.5, top_m=2
        ).collect()
    }
    n = 3.0
    idf = {"a": math.log(n / 2), "b": math.log(n / 1), "c": math.log(n / 1)}
    cent = {
        "a": (2 * idf["a"] + 1 * idf["a"]) / 2,  # docs 1 and 2
        "b": (1 * idf["b"]) / 2,
        "c": (1 * idf["c"]) / 2,
    }
    # top_m=2 keeps the two heaviest centroid terms: a and (b or c by
    # value; b == c here so term ASC keeps 'b')
    assert out["a"] == pt.approx(1.0 + 0.5 * cent["a"], rel=1e-12)
    assert out["b"] == pt.approx(0.5 * cent["b"], rel=1e-12)
    assert "c" not in out  # truncated (tie broken by term ASC)
    assert "d" not in out  # doc 3 is outside the pseudo-relevant pool


def test_xquad_rerank_properties(spark):
    """lam=0 degenerates to the BM25 candidate order (gains = 4dp
    relevance); lam=1 forces aspect coverage — the first two picks
    jointly contain BOTH query terms even though the two best BM25
    docs only cover one."""
    docs = spark.createDataFrame(
        [(1, "aa aa aa"), (2, "aa aa"), (3, "bb")],
        "doc_id long, content string",
    )
    idx = ix.build_index(docs, ix.IndexConfig(analyzer=SIMPLE))
    qt = rt.queries_to_terms(spark, [("x1", "aa bb")], SIMPLE)
    base = [
        r["doc_id"]
        for r in rt.score_queries(idx, qt, k=3)
        .orderBy("rank")
        .collect()
    ]
    lam0 = (
        fb.xquad_rerank(idx, qt, k_cands=3, k_out=3, lam=0.0)
        .orderBy("rank")
        .collect()
    )
    assert [r["doc_id"] for r in lam0] == base
    assert all(
        lam0[i]["xquad"] >= lam0[i + 1]["xquad"] for i in range(2)
    )
    lam1 = (
        fb.xquad_rerank(idx, qt, k_cands=3, k_out=2, lam=1.0)
        .orderBy("rank")
        .collect()
    )
    texts = {1: {"aa"}, 2: {"aa"}, 3: {"bb"}}
    covered = set()
    for r in lam1:
        covered |= texts[r["doc_id"]]
    assert covered == {"aa", "bb"}


def test_pm2_rerank_properties(spark):
    """PM-2 proportionality: with two aspects and docs each covering
    only one, the first two picks cover BOTH aspects (the Sainte-Laguë
    quotient halves the served aspect's claim after every seat), and
    the pick schedule returns exactly k_out ranked rows per query."""
    docs = spark.createDataFrame(
        [(1, "aa aa aa"), (2, "aa aa"), (3, "bb")],
        "doc_id long, content string",
    )
    idx = ix.build_index(docs, ix.IndexConfig(analyzer=SIMPLE))
    qt = rt.queries_to_terms(spark, [("x1", "aa bb")], SIMPLE)
    out = (
        fb.pm2_rerank(idx, qt, k_cands=3, k_out=3, lam=0.5)
        .orderBy("rank")
        .collect()
    )
    assert [r["rank"] for r in out] == [1, 2, 3]
    texts = {1: {"aa"}, 2: {"aa"}, 3: {"bb"}}
    covered = set()
    for r in out[:2]:
        covered |= texts[r["doc_id"]]
    assert covered == {"aa", "bb"}
    # scores are the 4dp-rounded selection gains, strictly positive
    assert all(r["pm2"] > 0 for r in out)


def test_bo1_expand_hand_computed(spark):
    """Bo1 weights replayed in pure Python: lambda = cf/N,
    w = tf_x*log2((1+lam)/lam) + log2(1+lam) over the top-2 pool;
    terms outside the pool are absent; top_m truncates."""
    import math

    import pytest as pt

    from luc4ir_spark.functions.analysis import AnalyzerConfig
    from luc4ir_spark.operators import feedback as fb
    from luc4ir_spark.operators import indexer as ixm

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "d d d")],
        "doc_id long, content string",
    )
    idx = ixm.build_index(
        docs, ixm.IndexConfig(analyzer=AnalyzerConfig(mode="simple")),
        cache=False,
    )
    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "qid string, doc_id long, rank long",
    )
    out = {
        r["term"]: (r["tf_x"], r["weight"])
        for r in fb.bo1_expand(idx, run, num_top_docs=2, top_m=10).collect()
    }
    n = 3.0
    cf = {"a": 3, "b": 1, "c": 1}
    tfx = {"a": 3, "b": 1, "c": 1}
    log2 = math.log(2.0)
    for t in ("a", "b", "c"):
        lam = cf[t] / n
        want = (
            tfx[t] * math.log((1 + lam) / lam) / log2
            + math.log(1 + lam) / log2
        )
        assert out[t][0] == tfx[t]
        assert out[t][1] == pt.approx(want, rel=1e-12), t
    assert "d" not in out
    # rarer term with equal pool tf outranks the common one: b/c
    # (cf=1) weigh more per occurrence than a (cf=3) would at tf_x=1
    top1 = fb.bo1_expand(idx, run, num_top_docs=2, top_m=1).collect()
    assert top1[0]["term"] == "a"  # tf_x=3 dominates here
