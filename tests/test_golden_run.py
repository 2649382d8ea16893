"""Golden end-to-end regression (FIXTURES.md §4, mirroring the
reference's committed res.txt pattern): a committed TREC run over the
deterministic synthetic corpus must be reproduced BYTE-IDENTICALLY by a
fresh build + retrieval — any tokenizer, scoring, ranking, id-
assignment or formatting drift fails this test."""

import os

from pyspark.sql import functions as F

from luc4ir_spark.functions.analysis import AnalyzerConfig
from luc4ir_spark.operators import indexer as ix
from luc4ir_spark.operators import retrieval as rt
from luc4ir_spark.sources import trec
from luc4ir_spark.sources.corpus import synth_corpus

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "run_tiny.txt")

QUERIES = [
    (str(400 + i), t)
    for i, t in enumerate(
        [
            "import license", "public static void", "the quick data",
            "comput station", "user's snake_case", "uniq_7",
            "return value function", "zzz missing term",
            "package final class", "stream of tokens",
        ]
    )
]


def test_golden_run_reproduced(spark, tmp_path):
    docs = synth_corpus(spark, 200, seed=42)
    docs = ix.assign_doc_ids(docs, ["repo", "path", "commit"], num_buckets=16)
    docs = docs.withColumn(
        "docid_str",
        F.concat_ws(
            "", F.col("repo"), F.lit(":"), F.col("path"), F.lit("@"),
            F.col("commit"),
        ),
    )
    cfg = ix.IndexConfig(analyzer=AnalyzerConfig())
    idx = ix.build_index(docs, cfg)
    qt = rt.queries_to_terms(spark, QUERIES, cfg.analyzer)
    run = rt.score_queries(idx, qt, k=10)
    trec_run = rt.to_trec_run(run, "golden", docs.select("doc_id", "docid_str"))
    out = str(tmp_path / "run.txt")
    trec.write_run(trec_run, out)
    got = open(out).read()
    want = open(GOLDEN).read()
    assert got == want, "golden TREC run drifted (byte comparison failed)"
