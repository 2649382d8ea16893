"""Federated search: resource (collection/shard) selection.

At 100 TB the index is many shards/collections, and a broker that
scores EVERY shard for every query wastes the fleet — resource
selection ranks shards by how likely they are to hold relevant
documents and the broker fans out only to the top few. CORI (Callan,
Lu & Croft, SIGIR'95 "Searching distributed collections with inference
networks") is the canonical algorithm: a shard is scored like a
"document" whose tf is the shard's document frequency of the term.

Everything here derives from index-level statistics (per-shard df,
shard sizes) — the corpus is touched once to map docs to shards; no
document content moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cori_collection_scores", "cori_merge_runs"]


def cori_collection_scores(
    postings: DataFrame,
    doc_shards: DataFrame,
    query_terms: DataFrame,
    b: float = 0.4,
    k_cori: float = 50.0,
    k_cw: float = 150.0,
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """CORI resource ranking -> (qid, shard, belief, rank).

    For query term t and shard s (Callan'95, the standard constants
    b=0.4, 50, 150):

        T = df_s / (df_s + 50 + 150 * cw_s / avg_cw)
        I = ln((|C| + 0.5) / cf_t) / ln(|C| + 1)
        belief(q, s) = sum over q's terms of  b + (1 - b) * T * I

    where df_s = shard document frequency, cw_s = shard token count,
    avg_cw = mean shard token count, cf_t = number of shards containing
    t, |C| = number of shards. Terms absent from a shard contribute the
    b floor (belief is a sum over ALL query terms, so shards are
    comparable across different term subsets); terms absent from EVERY
    shard contribute the constant b to each and never reorder.

    Plan shape: postings join the (doc_id, shard) map on doc_id (both
    doc-keyed — co-partitioned when the map is bucketed like the
    index), collapse immediately to (term, shard, df_s) — shard-count
    × vocab sized — and everything after is statistics-sized: the
    query side and the per-shard/per-term tables broadcast. Ranks tie
    (belief DESC, shard ASC), 4dp-rounded belief."""
    shards = doc_shards.select(
        F.col(id_col).alias("doc_id"), F.col(shard_col).alias("shard")
    )
    # per-(term, shard) document frequency: postings are distinct per
    # (term, doc) already, so a count is df
    tsh = (
        postings.select("term", "doc_id", "doc_len")
        .join(shards, "doc_id")
        .groupBy("term", "shard")
        .agg(F.count(F.lit(1)).cast("long").alias("df_s"))
    )
    # shard sizes from the SAME postings scan shape: sum of doc_len
    # over distinct docs per shard
    doc_lens = postings.select("doc_id", "doc_len").distinct()
    cw = (
        doc_lens.join(shards, "doc_id")
        .groupBy("shard")
        .agg(F.sum("doc_len").cast("long").alias("cw_s"))
    )
    n_shards = cw.agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.avg("cw_s").alias("avg_cw"),
    )
    cf = tsh.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("cf_t")
    )
    qt = query_terms.select("qid", "term").distinct()
    # per (qid, term, shard) T*I for PRESENT terms
    present = (
        qt.join(tsh, "term")
        .join(F.broadcast(cf), "term")
        .join(F.broadcast(cw), "shard")
        .crossJoin(F.broadcast(n_shards))
    )
    t_part = F.col("df_s") / (
        F.col("df_s")
        + F.lit(float(k_cori))
        + F.lit(float(k_cw)) * F.col("cw_s") / F.col("avg_cw")
    )
    i_part = F.log(
        (F.col("n_c") + F.lit(0.5)) / F.col("cf_t")
    ) / F.log(F.col("n_c") + F.lit(1.0))
    contrib = present.select(
        "qid",
        "shard",
        (F.lit(1.0 - float(b)) * t_part * i_part).alias("_c"),
    )
    # belief = n_query_terms * b + sum of present contributions —
    # absent terms contribute the b floor without being materialized
    n_q = qt.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("_nq")
    )
    per = (
        contrib.groupBy("qid", "shard")
        .agg(F.sum("_c").alias("_sum"))
        .join(F.broadcast(n_q), "qid")
    )
    # shards with NO present term still score nq*b: outer-complete via
    # the (qid × shard) frame
    frame = n_q.crossJoin(cw.select("shard"))
    belief = (
        frame.join(per.select("qid", "shard", "_sum"), ["qid", "shard"], "left")
        .select(
            "qid",
            "shard",
            (
                F.col("_nq") * F.lit(float(b))
                + F.coalesce(F.col("_sum"), F.lit(0.0))
            ).alias("_belief"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("_belief").desc(), F.col("shard").asc()
    )
    return belief.select(
        "qid",
        "shard",
        F.round("_belief", 4).alias("belief"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def cori_merge_runs(
    shard_runs: DataFrame,
    beliefs: DataFrame,
    b: float = 0.4,
    k: int = 10,
) -> DataFrame:
    """CORI result MERGING (Callan'95; the weighted-scores merge every
    federated-search textbook pairs with CORI selection): per-shard
    scores are incomparable — each shard computed idf/avgdl from its
    OWN documents — so the broker rescales every shard-local score by
    the shard's query belief before interleaving:

        C'' = (C - C_min) / (C_max - C_min)   per query (min-max)
        D'  = (D + b * D * C'') / (1 + b)

    A query whose beliefs are uniform (or a single shard) gets C'' = 0
    everywhere — pure interleave by raw score, no spurious reorder.

    Inputs: ``shard_runs`` (shard, qid, doc_id, score — shard-local),
    ``beliefs`` (qid, shard, belief) from ``cori_collection_scores``.
    -> (qid, doc_id, shard, merged, rank), top ``k`` per query, ties
    (merged DESC, doc_id ASC).

    Plan shape: run-sized only — one per-qid min/max window over the
    shard-count-sized belief table (broadcast), one equi-join on
    (qid, shard), one per-qid WindowGroupLimit top-k."""
    wq = Window.partitionBy("qid")
    nb = beliefs.select(
        "qid",
        "shard",
        "belief",
        F.min("belief").over(wq).alias("_lo"),
        F.max("belief").over(wq).alias("_hi"),
    ).select(
        "qid",
        "shard",
        F.when(
            F.col("_hi") > F.col("_lo"),
            (F.col("belief") - F.col("_lo"))
            / (F.col("_hi") - F.col("_lo")),
        )
        .otherwise(F.lit(0.0))
        .alias("_bn"),
    )
    j = shard_runs.join(F.broadcast(nb), ["qid", "shard"])
    merged = (
        F.col("score")
        + F.lit(float(b)) * F.col("score") * F.col("_bn")
    ) / F.lit(1.0 + float(b))
    w = Window.partitionBy("qid").orderBy(
        F.col("_m").desc(), F.col("doc_id").asc()
    )
    return (
        j.select("qid", "doc_id", "shard", merged.alias("_m"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select(
            "qid",
            "doc_id",
            "shard",
            F.round("_m", 4).alias("merged"),
            "rank",
        )
    )


def redde_collection_scores(
    sample_run: DataFrame,
    doc_shards: DataFrame,
    sample_ids: DataFrame,
    n_top: int = 20,
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """ReDDE resource ranking (Si & Callan SIGIR'03 "Relevant document
    distribution estimation method for resource selection") — the
    SAMPLE-based alternative to CORI's statistics model: retrieve on a
    small CENTRALIZED sample of all shards, and estimate each shard's
    relevant-document count by scaling its hits in the sample top-n_top
    back up by its sampling rate:

        est_rel(s) = |top-n_top hits from s| * N_s / n_s

    (N_s = shard size, n_s = sampled docs from s). Works when shard
    contents defy summary statistics — the reason TREC federated tracks
    baseline on it. -> (qid, shard, n_top_hits, est_rel, rank); the
    estimate is one integer product and ONE division, engine-exact.

    Inputs: ``sample_run`` (qid, doc_id, rank) from the sample index,
    ``doc_shards`` (doc_id, shard) for the FULL corpus, ``sample_ids``
    (doc_id) — the sampled subset. Shards whose sample caught no top
    docs score 0 and still appear (the broker must see them ranked).

    Plan shape: N_s / n_s are two shard-count-sized aggregates off the
    doc->shard map; the run is query-sized; every join after the map
    aggregation broadcasts."""
    shards = doc_shards.select(
        F.col(id_col).alias("doc_id"), F.col(shard_col).alias("shard")
    )
    n_full = shards.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_s_full")
    )
    n_samp = (
        shards.join(
            sample_ids.select(F.col(id_col).alias("doc_id")), "doc_id"
        )
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_s_samp"))
    )
    hits = (
        sample_run.filter(F.col("rank") <= int(n_top))
        .join(shards, "doc_id")
        .groupBy("qid", "shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_top_hits"))
    )
    qids = sample_run.select("qid").distinct()
    frame = qids.crossJoin(
        F.broadcast(n_full.join(n_samp, "shard", "left"))
    )
    est = frame.join(hits, ["qid", "shard"], "left").select(
        "qid",
        "shard",
        F.coalesce(F.col("n_top_hits"), F.lit(0))
        .cast("long")
        .alias("n_top_hits"),
        F.when(
            F.col("n_s_samp").isNull() | (F.col("n_s_samp") == 0),
            F.lit(0.0),
        )
        .otherwise(
            (
                F.coalesce(F.col("n_top_hits"), F.lit(0))
                * F.col("n_s_full")
            )
            / F.col("n_s_samp")
        )
        .alias("_est"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("_est").desc(), F.col("shard").asc()
    )
    return est.select(
        "qid",
        "shard",
        "n_top_hits",
        F.round("_est", 4).alias("est_rel"),
        F.row_number().over(w).cast("long").alias("rank"),
    )
