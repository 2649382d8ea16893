"""Verbose-query term selection: max-avg-idf sliding window.

Re-expresses the reference's query selector (reference:
qsel/QuerySelector.java:69-96 + qsel/IdfWindowScoringFunction.java:20-34,
used by retriever/VerboseQueryRetriever.java:37-52): slide a fixed-size
window over the analyzed verbose query (desc field), score each window
by the mean idf of its terms, and keep the argmax window as the reduced
query.

Spark shape: posexplode the term arrays, broadcast-join df stats
(query-side is tiny), frame-window average, per-qid argmax — one pass
for ALL queries instead of the reference's per-query loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_verbose_query_terms(
    query_tokens: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    window_size: int = 3,
) -> DataFrame:
    """query_tokens: (qid, tokens array<string>) -> (qid, term, weight=1.0)
    — the terms of the best window, ready for retrieval.score_queries.

    Out-of-vocabulary terms contribute idf 0 (they cannot match anyway).
    Queries shorter than the window keep all their terms. Ties break on
    the earliest window start (the reference keeps the first maximum).
    """
    pos = query_tokens.select(
        "qid", F.posexplode("tokens").alias("pos", "term")
    )
    idf = F.log(F.lit(float(n_docs)) / F.col("df"))
    with_idf = pos.join(
        F.broadcast(term_stats.select("term", "df")), "term", "left"
    ).withColumn("idf", F.coalesce(idf, F.lit(0.0)))

    frame = (
        Window.partitionBy("qid")
        .orderBy("pos")
        .rowsBetween(0, window_size - 1)
    )
    n_terms = Window.partitionBy("qid")
    scored = (
        with_idf.withColumn("win_score", F.avg("idf").over(frame))
        .withColumn("win_len", F.count(F.lit(1)).over(frame))
        .withColumn("n", F.count(F.lit(1)).over(n_terms))
    )
    # eligible window starts: full windows, or pos 0 for short queries
    eligible = scored.filter(
        (F.col("win_len") == window_size)
        | ((F.col("n") < window_size) & (F.col("pos") == 0))
    )
    pick = Window.partitionBy("qid").orderBy(
        F.col("win_score").desc(), F.col("pos").asc()
    )
    best = (
        eligible.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("pos").alias("start"))
    )
    return (
        pos.join(F.broadcast(best), "qid")
        .filter(
            (F.col("pos") >= F.col("start"))
            & (F.col("pos") < F.col("start") + window_size)
        )
        .select("qid", "term", F.lit(1.0).alias("weight"))
        .distinct()
    )
