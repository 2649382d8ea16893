"""Doc parsers, destemmer, samplers, quantization, DocVector kernels,
RCD char-n-gram BLEU."""

import gzip
import math
import tarfile

import pytest
from pyspark.sql import functions as F

from luc4ir_spark.functions import docvector as dv
from luc4ir_spark.operators import utilsops as uo
from luc4ir_spark.sources import docparsers as dp

SGML = b"""<DOC>
<DOCNO> FT911-1 </DOCNO>
<HEADLINE>Some headline</HEADLINE>
<TEXT>First document body text.</TEXT>
</DOC>
<DOC>
<DOCNO>FT911-2</DOCNO>
<TEXT>Second document, more text here.</TEXT>
</DOC>
"""


def test_trec_sgml_parser(spark, tmp_path):
    d = tmp_path / "coll" / "sub"
    d.mkdir(parents=True)
    (d / "file1.sgml").write_bytes(SGML)
    with gzip.open(d / "file2.sgml.gz", "wb") as fh:
        fh.write(SGML.replace(b"FT911", b"FT912"))
    df = dp.read_trec_sgml(spark, str(tmp_path / "coll"))
    rows = {r["docid"]: r["content"] for r in df.collect()}
    assert set(rows) == {"FT911-1", "FT911-2", "FT912-1", "FT912-2"}
    assert "First document body text." in rows["FT911-1"]
    assert "headline" in rows["FT911-1"].lower()
    assert "<" not in rows["FT911-1"]  # tags stripped


def test_tar_gz_source(spark, tmp_path):
    coll = tmp_path / "arch"
    coll.mkdir()
    f1 = tmp_path / "a.sgml"
    f1.write_bytes(SGML)
    f2 = tmp_path / "plain.txt"
    f2.write_text("plain text doc")
    hidden = tmp_path / ".hidden"
    hidden.write_text("should be skipped")
    with tarfile.open(coll / "c.tar.gz", "w:gz") as tf:
        tf.add(f1, arcname="docs/a.sgml")
        tf.add(f2, arcname="docs/plain.txt")
        tf.add(hidden, arcname="docs/.hidden")
    df = dp.read_tar_gz(spark, str(coll))
    rows = {r["docid"]: r["content"] for r in df.collect()}
    assert "FT911-1" in rows and "FT911-2" in rows
    assert rows["docs/plain.txt"] == "plain text doc"
    assert not any(".hidden" in k for k in rows)


def test_annotated_lines(spark, tmp_path):
    d = tmp_path / "anno"
    d.mkdir()
    (d / "f.txt").write_text(
        "<pno>W1</pno>\nline one\nline two</p>\n"
        "<pno>W2</pno>\nonly line</p>\n"
    )
    df = dp.read_annotated_lines(spark, str(d))
    rows = {r["docid"]: r["content"] for r in df.collect()}
    assert rows == {"W1": "line one line two", "W2": "only line"}


def test_tsv_docs(spark, tmp_path):
    p = tmp_path / "docs.tsv"
    p.write_text("d1\tfirst text\nd2\tsecond text\n")
    df = dp.read_tsv_docs(spark, str(p))
    rows = {r["docid"]: r["content"] for r in df.collect()}
    assert rows == {"d1": "first text", "d2": "second text"}


def test_destemmer(spark):
    # reference probe: babi -> babies (alphabetically-first match wins)
    stems = spark.createDataFrame(
        [("babi",), ("comput",), ("zzz",)], "stem string"
    )
    vocab = spark.createDataFrame(
        [("baby",), ("babies",), ("computers",), ("computing",), ("cat",)],
        "word string",
    )
    out = {r["stem"]: r["word"] for r in uo.destem(stems, vocab).collect()}
    assert out == {"babi": "babies", "comput": "computers"}  # zzz: no match


def test_samplers(spark):
    df = spark.range(100).withColumn("w", (F.col("id") + 1).cast("double"))
    s1 = uo.sample_uniform(df, 10, seed=1)
    assert s1.count() == 10
    assert s1.select("id").distinct().count() == 10
    a = sorted(r["id"] for r in uo.sample_uniform(df, 10, seed=1).collect())
    b = sorted(r["id"] for r in uo.sample_uniform(df, 10, seed=1).collect())
    assert a == b  # deterministic
    # ...including across partition layouts (keys hash row CONTENT, not
    # monotonically_increasing_id)
    c = sorted(
        r["id"]
        for r in uo.sample_uniform(df.repartition(7), 10, seed=1).collect()
    )
    assert a == c
    s2 = uo.sample_weighted(df, 20, "w", id_col="id", seed=3)
    assert s2.count() == 20
    # plan shape: distributed top-n for both samplers
    for sample in (uo.sample_uniform(df, 10, seed=1),
                   uo.sample_weighted(df, 20, "w", id_col="id", seed=3)):
        plan = sample._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
    # the uniform sampler is windowless; the weighted sampler's rank
    # window is AFTER the limit, so it only ever sees the n survivors
    plan_u = (
        uo.sample_uniform(df, 10, seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan_u


def test_consistent_hash_assign_invariants(spark):
    """The Karger guarantee on a real ring: adding a node moves docs
    ONLY onto the new node (no old->old movement), everything else
    stays put; assignments replay exactly in pure Python."""
    import hashlib

    def pts(n):
        return [
            (f"n{i}",
             int(hashlib.md5(f"n{i}".encode()).hexdigest()[:15], 16))
            for i in range(n)
        ]

    docs = spark.range(300).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["node_id"]
         for r in uo.consistent_hash_assign(docs, pts(3)).collect()}
    b = {r["doc_id"]: r["node_id"]
         for r in uo.consistent_hash_assign(docs, pts(4)).collect()}
    span = 1 << 60

    def expect(d, points):
        pos = int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % span
        return min(
            (p if p >= pos else p + span, n) for n, p in points
        )[1]

    for d in range(300):
        assert a[d] == expect(d, pts(3))
        assert b[d] == expect(d, pts(4))
        if a[d] != b[d]:
            assert b[d] == "n3"  # movers land ONLY on the new node
    moved = sum(1 for d in range(300) if a[d] != b[d])
    assert 0 < moved < 300  # the ring actually redistributes some


def test_quantize_doc_len(spark):
    df = spark.createDataFrame(
        [(v,) for v in [0, 1, 17, 31, 32, 100, 1000, 123456]], "dl long"
    )
    out = {
        r["dl"]: r["q"]
        for r in df.select(
            "dl", uo.quantize_doc_len(F.col("dl")).alias("q")
        ).collect()
    }
    for v in (0, 1, 17, 31):
        assert out[v] == v  # exact below 2^(m+1)
    for v in (100, 1000, 123456):
        assert out[v] <= v
        assert (v - out[v]) / v < 1 / 16  # coarse but bounded error
    # monotone
    vals = [out[k] for k in sorted(out)]
    assert vals == sorted(vals)


def test_docvector_kernels():
    a = ["x", "x", "y"]
    b = ["x", "y", "z"]
    assert dv.cosine(a, a) == pytest.approx(1.0)
    exp = (2 * 1 + 1 * 1) / (math.sqrt(5) * math.sqrt(3))
    assert dv.cosine(a, b) == pytest.approx(exp)
    assert dv.jaccard(a, b) == pytest.approx(2 / 3)
    assert dv.bleu_precision(a, b) == pytest.approx(2 / 3)  # x clipped to 1
    assert dv.rouge_recall(a, b) == pytest.approx(2 / 3)
    m = dv.meteor(a, b)
    assert 0 < m <= 1
    assert dv.meteor(a, a) == pytest.approx(1.0)
    idf = {"x": 0.1, "y": 2.0, "z": 2.0}
    assert dv.idf_cosine(a, b, idf) < dv.cosine(a, b)  # x down-weighted...
    assert dv.idf_cosine(a, a, idf) == pytest.approx(1.0)


def test_rcd_char_bleu():
    assert dv.rcd_char_bleu("same text", "same text") == pytest.approx(
        (3 + 4 + 5) / 12.0
    )
    assert dv.rcd_char_bleu("abcdef", "uvwxyz") == 0.0
    mid = dv.rcd_char_bleu("the quick brown fox", "the quick red fox")
    assert 0 < mid < 1


def test_rcd_evaluate(spark):
    pairs = spark.createDataFrame(
        [
            ("g1", 0, "identical span", "identical span"),
            ("g1", 1, "totally different", "different totally"),
            ("g2", 0, "abcabc", "zzzzzz"),
        ],
        "grp string, pos int, pred string, ref string",
    )
    # grouped: members CONCATENATE in pos order (reference merge
    # semantics, RCDEvaluator.java:107-133), g2 shares no n-gram -> 0
    out = dv.rcd_evaluate(
        pairs, group_col="grp", order_col="pos"
    ).collect()[0]
    g1 = dv.rcd_char_bleu(
        "identical span totally different", "identical span different totally"
    )
    assert out["bleu"] == pytest.approx(g1 / 2.0, abs=1e-9)
    # ungrouped: plain per-row mean
    flat = dv.rcd_evaluate(pairs.drop("grp", "pos")).collect()[0]
    exp = (
        dv.rcd_char_bleu("identical span", "identical span")
        + dv.rcd_char_bleu("totally different", "different totally")
        + 0.0
    ) / 3.0
    assert flat["bleu"] == pytest.approx(exp, abs=1e-9)


def test_sample_hash_stratified(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    rates = {"en": 0.5, "de": 0.1}
    got = uo.sample_hash_stratified(df, rates, "lang", seed=3)
    counts = {
        r["lang"]: r["n"]
        for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # Bernoulli-by-hash: expected 500/100, allow generous slack
    assert 380 <= counts["en"] <= 620
    assert 55 <= counts["de"] <= 145
    # deterministic across partition layouts
    a = sorted(r["doc_id"] for r in got.collect())
    b = sorted(
        r["doc_id"]
        for r in uo.sample_hash_stratified(
            df.repartition(7), rates, "lang", seed=3
        ).collect()
    )
    assert a == b
    # consistency: raising a rate yields a superset (same seed)
    bigger = sorted(
        r["doc_id"]
        for r in uo.sample_hash_stratified(
            df, {"en": 0.8, "de": 0.3}, "lang", seed=3
        ).collect()
    )
    assert set(a) <= set(bigger)
    # unknown strata fall back to default_rate (0.0 -> dropped)
    other = df.withColumn("lang", F.lit("zz"))
    assert uo.sample_hash_stratified(other, rates, "lang", seed=3).count() == 0
    # scan-local: a pure filter, no shuffle
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_composition(spark):
    from luc4ir_spark.operators import textstats as ts_mod

    docs = spark.createDataFrame(
        [
            (1, "the cat sat", "a"),
            (2, "dogs bark loudly at night", "a"),
            (3, "x", "b"),
            (4, "more words here now", "b"),
        ],
        "doc_id long, content string, source string",
    )
    out = {
        r["stratum"]: r
        for r in ts_mod.corpus_composition(docs).collect()
    }
    assert out["a"]["n_docs"] == 2 and out["b"]["n_docs"] == 2
    assert out["a"]["n_tokens"] == 3 + 5
    assert out["b"]["n_tokens"] == 1 + 4
    assert out["a"]["doc_share"] == 0.5
    # mean matches the rounded per-doc quality_score output
    q = {
        r["doc_id"]: r["quality"]
        for r in ts_mod.quality_score(docs).collect()
    }
    assert out["a"]["mean_quality"] == round((q[1] + q[2]) / 2, 4)


def test_rendezvous_assign_invariants(spark):
    """The HRW guarantee: adding a node moves docs ONLY onto the new
    node; assignments replay exactly in pure Python via the mix hash."""
    from luc4ir_spark.functions.hashing import MIX_A, MIX_B, MIX_P
    from luc4ir_spark.operators import utilsops as ut

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    nodes4 = [("n0", 11), ("n1", 22), ("n2", 33), ("n3", 44)]
    nodes5 = nodes4 + [("n4", 55)]

    def py_assign(doc_id, nodes):
        best = max(
            ((MIX_A * ((doc_id * (1 << 20) + s) % MIX_P) + MIX_B)
             % MIX_P, n)
            for n, s in nodes
        )
        return best[1]

    a4 = {r["doc_id"]: r["node_id"]
          for r in ut.rendezvous_assign(docs, nodes4).collect()}
    a5 = {r["doc_id"]: r["node_id"]
          for r in ut.rendezvous_assign(docs, nodes5).collect()}
    for d in range(200):
        assert a4[d] == py_assign(d, nodes4)
        assert a5[d] == py_assign(d, nodes5)
        if a5[d] != a4[d]:
            assert a5[d] == "n4"  # only the new node steals
    assert any(a5[d] == "n4" for d in range(200))
    # every node owns something (binomial-even load, n=200, k=4)
    assert {a4[d] for d in range(200)} == {"n0", "n1", "n2", "n3"}
