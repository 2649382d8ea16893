"""ORCAS preparation joins reproduce the reference's loop semantics
(orcas/OrcasQueryPairPreparator.java:28-87,
OrcasQueryDocPreparator.java:29-58) on a tiny fixture."""

import pytest
from pyspark.sql import functions as F

from luc4ir_spark.operators import orcas


@pytest.fixture(scope="module")
def fixture(spark):
    qid_query = spark.createDataFrame(
        [
            ("q1", "How to COOK rice?"),
            ("q2", "spark joins"),
            ("q3", "unused query"),
            ("q4", "cooking rice"),
            # analyzes identically to q1's query -> duplicate map key,
            # resolved deterministically to max(qid)
            ("q9", "how to cook RICE"),
        ],
        "qid string, query string",
    )
    subset = spark.createDataFrame(
        [("how to cook rice!",), ("spark joins",), ("cooking rice",)],
        "query string",
    )
    pairs = spark.createDataFrame(
        [
            ("How to cook rice", "spark joins", 1.0),      # both in subset
            ("how to cook rice", "cooking rice", 0.0),     # both in subset
            ("spark joins", "unused query", 1.0),          # q2 side not in subset
            ("how to cook rice", "never seen", 1.0),       # unmapped side
            ("spark joins", "SPARK JOINS", 1.0),           # self-pair: same qid
        ],
        "q1 string, q2 string, label double",
    )
    return qid_query, subset, pairs


def test_prepare_query_pairs(spark, fixture):
    qid_query, subset, pairs = fixture
    out = orcas.prepare_query_pairs(pairs, qid_query, subset).collect()
    got = sorted(
        (r["qid1"], r["query1"], r["qid2"], r["query2"], r["label"])
        for r in out
    )
    # duplicate analyzed query ("how to cook rice") maps to max(q1, q9)=q9
    assert got == [
        ("q9", "how to cook rice", "q2", "spark joins", 1.0),
        ("q9", "how to cook rice", "q4", "cooking rice", 0.0),
    ]


def test_prepare_query_pairs_drops_self_pairs(spark, fixture):
    qid_query, subset, pairs = fixture
    out = orcas.prepare_query_pairs(pairs, qid_query, subset)
    self_pairs = out.filter(F.col("qid1") == F.col("qid2")).count()
    assert self_pairs == 0


def test_prepare_query_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "The Quick! Brown fox."),
            (2, "second DOC text"),
            (3, "never fetched"),
        ],
        "doc_id long, content string",
    )
    ids = spark.createDataFrame(
        [(" 1 ",), ("2",), ("99",)], "docid string"
    )  # 99 missing from the corpus -> dropped (searcher returns null)
    out = {
        r["docid"]: r["content"]
        for r in orcas.prepare_query_docs(ids, docs).collect()
    }
    assert out == {
        "1": "the quick brown fox",
        "2": "second doc text",
    }
    # unanalyzed passthrough mode
    raw = {
        r["docid"]: r["content"]
        for r in orcas.prepare_query_docs(ids, docs, cfg=None).collect()
    }
    assert raw["1"] == "The Quick! Brown fox."
