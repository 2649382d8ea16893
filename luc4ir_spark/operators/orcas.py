"""ORCAS click-log preparation joins.

Re-expresses the reference's two driver-side ORCAS preparators as
DataFrame joins (the reference streams files through HashMaps on one
machine — at the real ORCAS scale, ~18 M queries / 10 M pairs, these
are exactly the joins Spark distributes):

- ``prepare_query_pairs`` (reference: orcas/OrcasQueryPairPreparator.
  java:28-87): labeled query pairs (q1, q2, label) are analyzed,
  filtered to a query subset, mapped to qids through a qid<->query map,
  and emitted as (qid1, query1, qid2, query2, label) rows, dropping
  pairs with any unmapped side or with qid1 == qid2.
- ``prepare_query_docs`` (reference: orcas/OrcasQueryDocPreparator.
  java:29-58): a doc-id list joined back to the corpus to fetch the
  analyzed content per id, ids missing from the corpus silently dropped
  (the reference's searcher returns null -> skip).

Analysis matches the reference's ``new StandardAnalyzer()`` (Lucene >=
7: word tokens, lowercase, empty stop set) by default and runs inside
the Arrow-vectorized analyzer UDF, so the only data movement is the
joins themselves (query maps are usually the small, broadcastable
side).

Deterministic divergence note: the reference's HashMap keeps the LAST
file line when two qid_query lines analyze to the same query string;
a distributed read has no line order, so we keep the MAX qid of the
duplicates (deterministic under any partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import AnalyzerConfig, tokens_udf

STANDARD_NO_STOP = AnalyzerConfig(mode="standard", stopwords=frozenset())


def analyzed_col(col, cfg: AnalyzerConfig = STANDARD_NO_STOP):
    """StandardAnalyzer-equivalent 'analyze to string': tokens joined by
    single spaces (reference: TrecDocIndexer.analyze, :355-378)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(tokens_udf(cfg)(c), " ")


def _qid_map(qid_query: DataFrame, cfg: AnalyzerConfig) -> DataFrame:
    """(qid, query) -> (pp, qid): analyzed query -> qid, duplicates
    resolved to max(qid) (see module docstring)."""
    return (
        qid_query.select(
            analyzed_col("query", cfg).alias("pp"), F.col("qid")
        )
        .groupBy("pp")
        .agg(F.max("qid").alias("qid"))
    )


def prepare_query_pairs(
    labeled_pairs: DataFrame,
    qid_query: DataFrame,
    query_subset: DataFrame,
    cfg: AnalyzerConfig = STANDARD_NO_STOP,
    broadcast_maps: bool = True,
) -> DataFrame:
    """labeled_pairs(q1, q2, label) x qid_query(qid, query) x
    query_subset(query) -> (qid1, query1, qid2, query2, label).

    Both pair sides must appear in the analyzed query subset AND map to
    a qid; self-pairs (qid1 == qid2) are dropped — the reference's
    makeSubset loop, as three joins. ``broadcast_maps``: hint the map /
    subset sides as broadcast (right for the usual
    small-subset-vs-huge-pair-log shape; disable when the qid map
    itself is corpus-sized and the shuffle join is the correct plan)."""
    from ..deploy import ensure_package_on_executors

    ensure_package_on_executors(labeled_pairs.sparkSession)
    qmap = _qid_map(qid_query, cfg)
    subset = query_subset.select(
        analyzed_col("query", cfg).alias("pp")
    ).distinct()
    if broadcast_maps:
        qmap, subset = F.broadcast(qmap), F.broadcast(subset)

    pairs = labeled_pairs.select(
        analyzed_col("q1", cfg).alias("pp1"),
        analyzed_col("q2", cfg).alias("pp2"),
        "label",
    )
    sub1 = subset.select(F.col("pp").alias("pp1"))
    sub2 = subset.select(F.col("pp").alias("pp2"))
    map1 = qmap.select(F.col("pp").alias("pp1"), F.col("qid").alias("qid1"))
    map2 = qmap.select(F.col("pp").alias("pp2"), F.col("qid").alias("qid2"))
    return (
        pairs.join(sub1, "pp1", "left_semi")
        .join(sub2, "pp2", "left_semi")
        .join(map1, "pp1")
        .join(map2, "pp2")
        .filter(F.col("qid1") != F.col("qid2"))
        .select(
            "qid1",
            F.col("pp1").alias("query1"),
            "qid2",
            F.col("pp2").alias("query2"),
            "label",
        )
    )


def prepare_query_docs(
    doc_ids: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    cfg: AnalyzerConfig | None = STANDARD_NO_STOP,
) -> DataFrame:
    """doc_ids(docid) x corpus -> (docid, content): fetch each listed
    document's (analyzed) content; ids absent from the corpus are
    dropped. ``cfg=None`` returns the stored content unanalyzed."""
    if cfg is not None:
        from ..deploy import ensure_package_on_executors

        ensure_package_on_executors(docs.sparkSession)
    ids = doc_ids.select(F.trim(F.col("docid")).alias("docid")).distinct()
    content = (
        analyzed_col(content_col, cfg) if cfg is not None
        else F.col(content_col)
    )
    side = docs.select(
        F.col(id_col).cast("string").alias("docid"), content.alias("content")
    )
    return ids.join(side, "docid").select("docid", "content")
