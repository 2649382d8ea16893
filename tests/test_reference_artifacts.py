"""Parity against the reference's OWN committed artifacts (read-only at
/root/reference): its real TREC run file, qrels, topic XML and stop
list must flow through our sources and evaluator. Skipped cleanly when
the reference tree is absent."""

import os

import pytest
from pyspark.sql import functions as F

from luc4ir_spark.functions.analysis import AnalyzerConfig, analyze_text
from luc4ir_spark.functions.stopwords import load_stopwords
from luc4ir_spark.operators import evaluation as ev
from luc4ir_spark.sources import trec

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


def test_read_reference_run_file(spark):
    """res.txt: the reference's committed LM run (49,085 rows, standard
    6-col layout; top-1 documented in BASELINE.md)."""
    run = trec.read_run(spark, f"{REF}/res.txt")
    assert run.count() == 49085
    top1 = run.filter((F.col("qid") == "401") & (F.col("rank") == 1)).collect()
    assert len(top1) == 1
    assert top1[0]["docid"] == "LA022790-0091"
    assert top1[0]["score"] == pytest.approx(12.253519)
    assert top1[0]["q0"] == "Q0" and top1[0]["runid"] == "lm"
    # ranks are 1..n contiguous per qid
    per_q = run.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx"),
        F.min("rank").alias("mn"),
    )
    bad = per_q.filter(
        (F.col("mx") != F.col("n")) | (F.col("mn") != 1)
    ).count()
    assert bad == 0


def test_evaluate_reference_run_against_reference_qrels(spark):
    """Full-circle: OUR evaluator over the reference's real run x real
    TREC-8 qrels produces sane, reproducible metrics."""
    run = trec.read_run(spark, f"{REF}/res.txt")
    qrels = trec.read_qrels(spark, f"{REF}/data/qrels/qrels.trec8.adhoc")
    assert qrels.count() == 86830
    assert qrels.filter(F.col("rel") > 0).count() == 4728  # BASELINE.md
    m = ev.evaluate(run, qrels, p_at=5, ndcg_at=10).collect()[0]
    # the committed res.txt covers the trec8 topic range
    assert m["num_queries"] == run.select("qid").distinct().count()
    assert 0.0 < m["map"] < 1.0
    assert 0.0 < m["mrr"] <= 1.0
    assert 0.0 < m["recall"] <= 1.0
    # determinism: second evaluation gives identical macro numbers
    m2 = ev.evaluate(run, qrels, p_at=5, ndcg_at=10).collect()[0]
    assert m.asDict() == m2.asDict()


def test_parse_reference_topics(spark):
    df = trec.read_trec_topics(spark, f"{REF}/data/topics/topics.401-450.xml")
    rows = {r["qid"]: r for r in df.collect()}
    assert len(rows) == 50
    assert set(rows) == {str(i) for i in range(401, 451)}
    t401 = rows["401"]
    assert t401["title"] == "foreign minorities, Germany"
    assert "integration" in t401["desc"]
    assert "relevant" in t401["narr"].lower()


def test_reference_stopfile_contract():
    """The reference's 571-word stop list loads through our stop-file
    contract and drives the analyzer chain."""
    stops = load_stopwords(f"{REF}/stop.txt")
    # 571 lines, but 'would' is listed twice -> 570 distinct words
    assert len(stops) == 570
    assert "the" in stops
    cfg = AnalyzerConfig(mode="english", stopwords=stops)
    toks = analyze_text("the foreign minorities in Germany", cfg)
    assert "the" not in toks and "in" not in toks
    assert "foreign" in toks or "germani" in toks  # stems survive


def _load_rcd_inputs():
    """eval.sh's derivation of the pred/rel pairs: pred fields
    whitespace-joined + lowercased (awk), rel = column 2 of the rel
    file, pairing by line position; equiv groups = whitespace-split
    lines of equiv.txt."""
    preds, rels = {}, {}
    with open(f"{REF}/rcd/nqc.tsv") as fh:
        for line in fh:
            f = line.split()
            preds[f[0]] = " ".join(f[1:]).lower()
    with open(f"{REF}/rcd/task1_test.rel") as fh:
        for line in fh:
            p = line.rstrip("\n").split("\t")
            rels[p[0]] = p[1]
    with open(f"{REF}/rcd/equiv.txt") as fh:
        groups = [line.split() for line in fh if line.strip()]
    return {k: (preds[k], rels[k]) for k in preds}, groups


def test_rcd_reference_eval_pinned_value():
    """Char-n-gram BLEU over the reference's OWN committed RCD data
    (rcd/nqc.tsv x task1_test.rel x equiv.txt), replicating
    RCDEvaluator.java:90-157 end-to-end including float32 accumulation
    in HashMap iteration order. Asserted bit-for-bit against
    RCD_PINNED_BLEU.

    The README's published 0.16270196 (rcd/README.md:23-26) is NOT
    reproducible from the committed data: rcd/pred_rel.txt — an
    intermediate of an earlier eval.sh run — records query 43's rel
    text as 'lords of hell alastor azazel' while task1_test.rel now
    says 'of hell! Alastor! Azazel!', i.e. the ground truth drifted
    after the README was written. A grid over stop sets (none /
    classic 33), tokenization variants, and both rel variants spans
    0.163..0.185 and brackets but never hits the published value."""
    import numpy as np

    from luc4ir_spark.functions.docvector import (
        RCD_PINNED_BLEU,
        rcd_reference_eval,
    )

    pred_rel, groups = _load_rcd_inputs()
    assert len(pred_rel) == 25 and len(groups) == 35
    got = rcd_reference_eval(pred_rel, groups)
    assert got == np.float32(RCD_PINNED_BLEU)


def test_rcd_spark_operator_matches_reference_eval(spark):
    """The distributed double-precision rcd_evaluate (group-concat
    semantics) agrees with the float32 reference evaluator on the real
    RCD data to float32 noise."""
    from luc4ir_spark.functions.analysis import AnalyzerConfig, analyze_text
    from luc4ir_spark.functions.docvector import (
        RCD_PINNED_BLEU,
        rcd_evaluate,
    )

    pred_rel, groups = _load_rcd_inputs()
    cfg = AnalyzerConfig(mode="standard", stopwords=frozenset())

    def an(s):
        return " ".join(analyze_text(s, cfg))

    rows, order = [], {}
    for gi, g in enumerate(groups):
        if any(q not in pred_rel for q in g):
            continue
        for pos, q in enumerate(g):
            # double-analyzed like the reference (merge re-analyzes)
            rows.append((gi, pos, an(pred_rel[q][0]), an(pred_rel[q][1])))
    df = spark.createDataFrame(
        rows, "grp int, pos int, pred string, ref string"
    )
    got = rcd_evaluate(
        df, pred_col="pred", ref_col="ref", group_col="grp",
        order_col="pos",
    ).collect()[0]["bleu"]
    assert got == pytest.approx(RCD_PINNED_BLEU, abs=5e-7)


def test_reference_topics_retrievable_pipeline(spark):
    """Topics -> analyzed query terms with the reference stop list:
    every title yields a usable term set (the avg-title-length anchor in
    BASELINE.md is ~2.7 terms)."""
    stops = load_stopwords(f"{REF}/stop.txt")
    cfg = AnalyzerConfig(mode="english", stopwords=stops)
    df = trec.read_trec_topics(spark, f"{REF}/data/topics/topics.401-450.xml")
    lens = [
        len(analyze_text(r["title"], cfg)) for r in df.collect()
    ]
    assert all(n >= 1 for n in lens)
    avg = sum(lens) / len(lens)
    assert 2.0 <= avg <= 3.5  # reference anchor: 2.676 terms/title
