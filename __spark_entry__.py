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
from luc4ir_spark.operators import evaluation as ev
from luc4ir_spark.operators import feedback as fb
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


def _pseudo_qrels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic judgments: for query qN, every doc with
    (doc_id + N) % 3 == 0 is judged; rel=1 iff (doc_id + N) % 6 == 0.
    Purely arithmetic so the DuckDB oracle reproduces it exactly."""
    qids = spark.createDataFrame(
        [(qid,) for qid, _ in QUERY_SET], "qid string"
    ).withColumn("qn", F.substring("qid", 2, 10).cast("long"))
    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .crossJoin(qids)
        .filter((F.col("doc_id") + F.col("qn")) % 3 == 0)
        .select(
            "qid",
            F.col("doc_id").cast("string").alias("docid"),
            F.when((F.col("doc_id") + F.col("qn")) % 6 == 0, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("rel"),
        )
    )


_QRELS_SQL = (
    "qrels AS (SELECT qn.qid, d.doc_id AS docid,"
    " CASE WHEN (d.doc_id + qn.qn) % 6 = 0 THEN 1.0 ELSE 0.0 END AS rel"
    " FROM (SELECT DISTINCT qid, CAST(substr(qid, 2) AS BIGINT) AS qn FROM q) qn"
    " CROSS JOIN documents d WHERE (d.doc_id + qn.qn) % 3 = 0)"
)

_EVAL_SQL = f"""
WITH {_TOKS}, {_TF}, {_DL}, {_DFT}, {_STATS}, {_values_queries()},
scored AS (
  SELECT q.qid, tf.doc_id,
         sum( ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / s.avgdl)) ) AS s_raw
  FROM q JOIN dft USING (term) JOIN tf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id, s.n_docs, s.avgdl
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY s_raw DESC, doc_id ASC)::BIGINT AS rank
  FROM scored
),
run AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= {TOPK}),
{_QRELS_SQL},
joined AS (
  SELECT r.qid, r.doc_id, r.rank, coalesce(qr.rel, 0.0) AS rel,
         CASE WHEN coalesce(qr.rel, 0.0) >= 1.0 THEN 1.0 ELSE 0.0 END AS is_rel
  FROM run r LEFT JOIN qrels qr
    ON r.qid = qr.qid AND r.doc_id = CAST(qr.docid AS BIGINT)
),
win AS (
  SELECT *,
         sum(is_rel) OVER (PARTITION BY qid ORDER BY rank) AS cum_rel,
         rel / log2(rank + 1) AS gain,
         row_number() OVER (PARTITION BY qid ORDER BY rel DESC, rank ASC) AS ideal_rank
  FROM joined
),
win2 AS (SELECT *, rel / log2(ideal_rank + 1) AS ideal_gain FROM win),
totals AS (SELECT qid, count(*)::BIGINT AS num_rel FROM qrels WHERE rel >= 1.0 GROUP BY qid),
perq AS (
  SELECT qid, count(*)::BIGINT AS num_ret, sum(is_rel)::BIGINT AS num_rel_ret,
         min(CASE WHEN is_rel > 0 THEN rank END) AS frr,
         sum(CASE WHEN is_rel > 0 THEN cum_rel / rank END) AS ap_num,
         sum(CASE WHEN rank <= 5 THEN is_rel ELSE 0.0 END) AS p_num,
         sum(CASE WHEN rank <= 10 THEN gain ELSE 0.0 END) AS dcg,
         sum(CASE WHEN ideal_rank <= 10 THEN ideal_gain ELSE 0.0 END) AS idcg
  FROM win2 GROUP BY qid
)
SELECT p.qid, p.num_ret, coalesce(t.num_rel, 0)::BIGINT AS num_rel, p.num_rel_ret,
       round(CASE WHEN coalesce(t.num_rel, 0) > 0 THEN p.num_rel_ret / t.num_rel ELSE 0.0 END, 4) AS recall,
       round(CASE WHEN frr IS NOT NULL THEN 1.0 / frr ELSE 0.0 END, 4) AS rr,
       round(CASE WHEN coalesce(t.num_rel, 0) > 0 THEN coalesce(ap_num, 0.0) / t.num_rel ELSE 0.0 END, 4) AS ap,
       round(p_num / 5.0, 4) AS p_at_5,
       round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 4) AS ndcg
FROM perq p LEFT JOIN totals t USING (qid)
"""


FDBK_DOCS = 3  # feedback depth for the oracle-gated RM/KL queries

_BM25_RUN_CTES = f"""{_TOKS}, {_TF}, {_DL}, {_DFT}, {_STATS}, {_values_queries()},
scored AS (
  SELECT q.qid, tf.doc_id,
         sum( ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / s.avgdl)) ) AS s_raw
  FROM q JOIN dft USING (term) JOIN tf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id, s.n_docs, s.avgdl
),
ranked AS (
  SELECT qid, doc_id, s_raw AS score,
         row_number() OVER (PARTITION BY qid ORDER BY s_raw DESC, doc_id ASC)::BIGINT AS rank
  FROM scored
),
topm AS (SELECT qid, doc_id, score FROM ranked WHERE rank <= {FDBK_DOCS}),
sims AS (SELECT qid, sum(score) AS sum_sim FROM topm GROUP BY qid),
rm_raw AS (
  SELECT t.qid, tf.term,
         sum( (tf.tf / dl.doc_len) * t.score / s.sum_sim ) AS wt_raw
  FROM topm t
  JOIN tf ON tf.doc_id = t.doc_id
  JOIN dl ON dl.doc_id = t.doc_id
  JOIN sims s ON s.qid = t.qid
  GROUP BY 1, 2
),
rm_z AS (SELECT qid, sum(wt_raw) AS z FROM rm_raw GROUP BY qid),
rm AS (
  SELECT r.qid, r.term, r.wt_raw / z.z AS wt
  FROM rm_raw r JOIN rm_z z USING (qid)
)"""

_RM_SQL = f"""
WITH {_BM25_RUN_CTES}
SELECT qid, term, round(wt, 4) AS wt FROM rm
"""

_KL_SQL = f"""
WITH {_BM25_RUN_CTES},
kl AS (
  SELECT rm.qid, t.doc_id,
         sum( rm.wt * ln(rm.wt / greatest(
             coalesce(tf2.tf / dl2.doc_len, 0.0), 0.0001)) ) AS kl
  FROM rm
  JOIN topm t ON rm.qid = t.qid
  JOIN dl dl2 ON dl2.doc_id = t.doc_id
  LEFT JOIN tf tf2 ON tf2.term = rm.term AND tf2.doc_id = t.doc_id
  GROUP BY 1, 2
)
SELECT qid, doc_id,
       row_number() OVER (PARTITION BY qid ORDER BY kl ASC, doc_id ASC)::BIGINT AS rank,
       round(kl, 4) AS score
FROM kl
"""


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

    def eval_metrics(spark, sf):
        # run = bm25 top-10 per query; judgments = deterministic pseudo
        # qrels; per-query recall/RR/AP/P@5/nDCG as DataFrame aggregates
        # (reference: evaluator/* — AllRetrievedResults.java:58-118)
        idx = _index(spark, sf)
        qt = rt.queries_to_terms(spark, QUERY_SET, SIMPLE)
        run = rt.score_queries(idx, qt, k=TOPK).withColumn(
            "docid", F.col("doc_id").cast("string")
        )
        qrels = _pseudo_qrels(spark, sf)
        pq = ev.per_query_metrics(run, qrels, p_at=5, ndcg_at=10)
        return pq.select(
            "qid",
            "num_ret",
            "num_rel",
            "num_rel_ret",
            F.round("recall", 4).alias("recall"),
            F.round("rr", 4).alias("rr"),
            F.round("ap", 4).alias("ap"),
            F.round("p_at_5", 4).alias("p_at_5"),
            F.round("ndcg", 4).alias("ndcg"),
        )

    def rm_weights(spark, sf):
        # RM-conditional relevance model over bm25 top-3 (fdbk.lambda=1
        # default; reference feedback/RelevanceModelConditional.java:24-48)
        idx = _index(spark, sf)
        qt = rt.queries_to_terms(spark, QUERY_SET, SIMPLE)
        run = rt.score_queries(idx, qt, k=TOPK)
        rlm = fb.relevance_model(idx, run, num_top_docs=FDBK_DOCS, lam=1.0)
        return rlm.select("qid", "term", F.round("wt", 4).alias("wt"))

    def kl_rerank(spark, sf):
        # KL-divergence rerank of the feedback docs (reference
        # feedback/KLDivReranker.java:25-52; ascending KL)
        idx = _index(spark, sf)
        qt = rt.queries_to_terms(spark, QUERY_SET, SIMPLE)
        run = rt.score_queries(idx, qt, k=TOPK)
        rlm = fb.relevance_model(idx, run, num_top_docs=FDBK_DOCS, lam=1.0)
        out = fb.kl_divergence_rerank(idx, run, rlm, num_top_docs=FDBK_DOCS)
        return out.select(
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
        "eval_metrics": eval_metrics,
        "rm_weights": rm_weights,
        "kl_rerank": kl_rerank,
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
        "eval_metrics": _EVAL_SQL,
        "rm_weights": _RM_SQL,
        "kl_rerank": _KL_SQL,
        "index_to_tsv": "SELECT doc_id, text AS content FROM documents",
        "doc_lookup": (
            "SELECT doc_id, lang, n_chars FROM documents"
            " WHERE doc_id IN (3, 7, 11)"
        ),
    }
