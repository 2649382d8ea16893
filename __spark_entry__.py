"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full-pass BM25 top-k over the sf0.001
``documents`` table (index build + multi-query scoring in one job).

``queries()`` / ``oracle_sql()`` — one pair per SQL-expressible operator
from SURVEY.md §2; the oracle-gated paths use the engine's ``simple``
analyzer mode (lowercase, split on non-[a-z0-9]) so the DuckDB SQL
reproduces tokenization exactly. The full Lucene-style analyzer chain
(possessive/stop/Porter) is covered by pytest brute-force oracles instead
(tests/), since Porter stemming is not expressible in ANSI SQL.

All floats are rounded to 4 decimals on BOTH sides before comparison;
all integer outputs are cast to 64-bit on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from luc4ir_spark.functions.analysis import AnalyzerConfig
from luc4ir_spark.operators import indexer as ix
from luc4ir_spark.operators import retrieval as rt
from luc4ir_spark.operators import wand as wd

SIMPLE = AnalyzerConfig(mode="simple")
K1, B = rt.BM25_K1_DEFAULT, rt.BM25_B_DEFAULT

# fixed query set over the synthetic corpus vocabulary
QUERY_SET: list[tuple[str, str]] = [
    ("q1", "spark join window"),
    ("q2", "stream hash"),
    ("q3", "merge filter table"),
    ("q4", "zzznotaterm spark"),  # unknown-term path: df=0 terms drop out
]
TOPK = 10

# ---------------------------------------------------------------- SQL CTEs

# tokenization must match luc4ir_spark.functions.analysis.simple_tokens
_TOKS = (
    "toks AS (SELECT doc_id, unnest(list_filter("
    "regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))"
    " AS term FROM documents)"
)
_TF = (
    "tf AS (SELECT term, doc_id, count(*)::BIGINT AS tf"
    " FROM toks GROUP BY 1, 2)"
)
_DL = (
    "dl AS (SELECT doc_id, count(*)::BIGINT AS doc_len"
    " FROM toks GROUP BY 1)"
)
_DFT = "dft AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY 1)"
_STATS = (
    "stats AS (SELECT count(*)::BIGINT AS n_docs,"
    " avg(doc_len) AS avgdl, sum(doc_len)::BIGINT AS total_tokens FROM dl)"
)


def _values_queries() -> str:
    rows = []
    for qid, text in QUERY_SET:
        for t in text.lower().split():
            rows.append(f"('{qid}', '{t}')")
    return "q(qid, term) AS (VALUES " + ", ".join(rows) + ")"


def _bm25_sql(conjunctive: bool) -> str:
    # MUST semantics: every query term (known or not) must match, so a
    # query containing an out-of-vocabulary term returns nothing — same as
    # the engine's n_matched == n_terms filter in score_queries().
    having = (
        "HAVING count(*) = (SELECT count(*) FROM q q2 WHERE q2.qid = q.qid)"
        if conjunctive
        else ""
    )
    return f"""
WITH {_TOKS}, {_TF}, {_DL}, {_DFT}, {_STATS}, {_values_queries()},
scored AS (
  SELECT q.qid, tf.doc_id,
         sum( ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / s.avgdl)) ) AS s_raw
  FROM q
  JOIN dft USING (term)
  JOIN tf  USING (term)
  JOIN dl  ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id, s.n_docs, s.avgdl
  {having}
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY s_raw DESC, doc_id ASC)::BIGINT AS rank,
         round(s_raw, 4) AS score
  FROM scored
)
SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= {TOPK}
"""


# ---------------------------------------------------------------- helpers


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _index(spark: SparkSession, sf_dir: str) -> ix.InvertedIndex:
    cfg = ix.IndexConfig(analyzer=SIMPLE)
    return ix.build_index(
        _docs(spark, sf_dir), cfg, id_col="doc_id", content_col="text",
        cache=False,
    )


def _bm25_run(spark: SparkSession, sf_dir: str, conjunctive: bool) -> DataFrame:
    idx = _index(spark, sf_dir)
    qt = rt.queries_to_terms(spark, QUERY_SET, SIMPLE)
    run = rt.score_queries(idx, qt, k=TOPK, conjunctive=conjunctive)
    return run.select(
        "qid",
        "doc_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("score", 4).alias("score"),
    )


# ---------------------------------------------------------------- contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k batch retrieval on sf0.001."""
    return _bm25_run(spark, "/root/testdata/sf0.001", conjunctive=False)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def doc_stats(spark, sf):
        idx = _index(spark, sf)
        return idx.doc_stats.select("doc_id", "doc_len")

    def term_stats(spark, sf):
        return _index(spark, sf).term_stats.select("term", "df", "cf")

    def tf_postings(spark, sf):
        return _index(spark, sf).postings.select(
            "term", "doc_id", F.col("tf").cast("long").alias("tf")
        )

    def collection_stats(spark, sf):
        s = _index(spark, sf).stats
        return spark.createDataFrame(
            [(s.n_docs, round(s.avgdl, 4), s.vocab_size, s.total_tokens)],
            "n_docs long, avgdl double, vocab_size long, total_tokens long",
        )

    def idf_dump(spark, sf):
        idx = _index(spark, sf)
        return ix.idf_dump(idx).select("term", F.round("idf", 4).alias("idf"))

    def bm25_topk(spark, sf):
        return _bm25_run(spark, sf, conjunctive=False)

    def bm25_conjunctive(spark, sf):
        return _bm25_run(spark, sf, conjunctive=True)

    def bm25_topk_wand(spark, sf):
        # block-max WAND over delta+varbyte compressed postings; must be
        # rank- and score-identical to the exhaustive bm25_topk, so it
        # shares that SQL oracle.
        idx = _index(spark, sf)
        qt = rt.queries_to_terms(spark, QUERY_SET, SIMPLE)
        run = wd.score_queries_wand(idx, qt, k=TOPK)
        return run.select(
            "qid", "doc_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("score", 4).alias("score"),
        )

    def index_to_tsv(spark, sf):
        # reference: retriever/IndexToTsvConverter.java:33-55
        return _docs(spark, sf).select(
            F.col("doc_id"), F.col("text").alias("content")
        )

    def doc_lookup(spark, sf):
        # reference: retriever/DocViewer.java:46-49 — fetch docs by id
        return _docs(spark, sf).filter(
            F.col("doc_id").isin([3, 7, 11])
        ).select("doc_id", "lang", "n_chars")

    return {
        "doc_stats": doc_stats,
        "term_stats": term_stats,
        "tf_postings": tf_postings,
        "collection_stats": collection_stats,
        "idf_dump": idf_dump,
        "bm25_topk": bm25_topk,
        "bm25_conjunctive": bm25_conjunctive,
        "bm25_topk_wand": bm25_topk_wand,
        "index_to_tsv": index_to_tsv,
        "doc_lookup": doc_lookup,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_stats": f"WITH {_TOKS}, {_DL} SELECT doc_id, doc_len FROM dl",
        "term_stats": (
            f"WITH {_TOKS}, {_TF}, {_DFT} SELECT term, df, cf FROM dft"
        ),
        "tf_postings": f"WITH {_TOKS}, {_TF} SELECT term, doc_id, tf FROM tf",
        "collection_stats": (
            f"WITH {_TOKS}, {_TF}, {_DL}, {_DFT}, {_STATS} "
            "SELECT s.n_docs, round(s.avgdl, 4) AS avgdl, "
            "(SELECT count(*)::BIGINT FROM dft) AS vocab_size, "
            "s.total_tokens FROM stats s"
        ),
        "idf_dump": (
            f"WITH {_TOKS}, {_TF}, {_DL}, {_DFT}, {_STATS} "
            "SELECT term, round(ln(s.n_docs / df), 4) AS idf "
            "FROM dft CROSS JOIN stats s"
        ),
        "bm25_topk": _bm25_sql(conjunctive=False),
        "bm25_conjunctive": _bm25_sql(conjunctive=True),
        "bm25_topk_wand": _bm25_sql(conjunctive=False),
        "index_to_tsv": "SELECT doc_id, text AS content FROM documents",
        "doc_lookup": (
            "SELECT doc_id, lang, n_chars FROM documents"
            " WHERE doc_id IN (3, 7, 11)"
        ),
    }
