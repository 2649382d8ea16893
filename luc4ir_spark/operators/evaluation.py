"""IR evaluation as DataFrame aggregates over run × qrels.

Replaces the reference's per-query accumulator loops (reference:
evaluator/AllRetrievedResults.java:58-118, evaluator/RetrievedResults.
java:49-156) with one distributed pass: a broadcast-friendly left join
run ⟕ qrels on (qid, docid) followed by window aggregates. At a million
queries this is a single shuffle by qid; the reference's approach is a
driver-side HashMap.

Metrics (per query + macro average):
- recall            numRelRet / totalRel          (RetrievedResults.java:145-156)
- RR / MRR          1 / first relevant rank; the reference's loop lacks
                    a break so it returns 1/LAST relevant rank
                    (RetrievedResults.java:49-57) — we implement the
                    correct first-rank MRR by default and keep the quirk
                    behind ``quirk_last_rel=True`` for parity studies
- AP / MAP          Σ_relevant (numRelSeen@rank / rank) / totalRel
                    (RetrievedResults.java:59-77)
- P@k               relevant in top k / k         (RetrievedResults.java:133-143)
- DCG / nDCG@k      DCG = Σ rel/log2(rank+1); ideal list built from the
                    RETRIEVED list's rel>0 docs sorted by rel desc (the
                    reference's "ret" mode, RetrievedResults.java:79-131)
                    or from ALL judged docs (standard mode)
- RR histogram      5 buckets over (0,1] + bucket 0 for no-hit
                    (AllRetrievedResults.java:70-88)

Binary vs graded: ``rel_threshold`` binarizes rel >= t as relevant for
recall/RR/AP/P@k (the reference's evaluate.graded switch); nDCG uses the
graded rel values.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def join_run_qrels(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """E1: attach rel to each run row (0 when unjudged). qrels is almost
    always the small side -> broadcast hash join, no shuffle of the run."""
    q = qrels.select("qid", "docid", "rel")
    return run.join(F.broadcast(q), ["qid", "docid"], "left").withColumn(
        "rel", F.coalesce(F.col("rel"), F.lit(0.0))
    )


def per_query_metrics(
    run: DataFrame,
    qrels: DataFrame,
    p_at: int = 5,
    ndcg_at: int = 10,
    rel_threshold: float = 1.0,
    ideal_from_retrieved: bool = True,
    quirk_last_rel: bool = False,
) -> DataFrame:
    """-> (qid, num_ret, num_rel, num_rel_ret, recall, rr, ap, p_at_k,
    dcg, ndcg) — one row per query in the run."""
    judged = join_run_qrels(run, qrels)
    is_rel = (F.col("rel") >= rel_threshold).cast("double")
    judged = judged.withColumn("is_rel", is_rel)

    w_rank = Window.partitionBy("qid").orderBy("rank")
    judged = judged.withColumn(
        "cum_rel", F.sum("is_rel").over(w_rank)
    ).withColumn(
        "gain",
        F.col("rel") / F.log2(F.col("rank").cast("double") + F.lit(1.0)),
    )

    # ideal ranking for nDCG ("ret" mode): retrieved docs by rel desc
    w_ideal = Window.partitionBy("qid").orderBy(
        F.col("rel").desc(), F.col("rank").asc()
    )
    judged = judged.withColumn(
        "ideal_rank", F.row_number().over(w_ideal)
    ).withColumn(
        "ideal_gain",
        F.col("rel")
        / F.log2(F.col("ideal_rank").cast("double") + F.lit(1.0)),
    )

    rel_rank_agg = (
        F.max(F.when(F.col("is_rel") > 0, F.col("rank")))
        if quirk_last_rel
        else F.min(F.when(F.col("is_rel") > 0, F.col("rank")))
    )

    per_q = judged.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("num_ret"),
        F.sum("is_rel").cast("long").alias("num_rel_ret"),
        rel_rank_agg.alias("first_rel_rank"),
        F.sum(
            F.when(
                F.col("is_rel") > 0,
                F.col("cum_rel") / F.col("rank").cast("double"),
            )
        ).alias("ap_num"),
        F.sum(
            F.when(F.col("rank") <= p_at, F.col("is_rel")).otherwise(0.0)
        ).alias("p_num"),
        F.sum(
            F.when(F.col("rank") <= ndcg_at, F.col("gain")).otherwise(0.0)
        ).alias("dcg"),
        F.sum(
            F.when(
                F.col("ideal_rank") <= ndcg_at, F.col("ideal_gain")
            ).otherwise(0.0)
        ).alias("idcg"),
    )

    totals = qrels.filter(F.col("rel") >= rel_threshold).groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("num_rel")
    )
    if not ideal_from_retrieved:
        # standard nDCG: ideal from ALL judged docs (graded), not just
        # the retrieved ones
        w_all = Window.partitionBy("qid").orderBy(F.col("rel").desc())
        ideal_all = (
            qrels.filter(F.col("rel") > 0)
            .withColumn("irank", F.row_number().over(w_all))
            .filter(F.col("irank") <= ndcg_at)
            .groupBy("qid")
            .agg(
                F.sum(
                    F.col("rel")
                    / F.log2(F.col("irank").cast("double") + F.lit(1.0))
                ).alias("idcg_all")
            )
        )
        per_q = per_q.join(F.broadcast(ideal_all), "qid", "left").withColumn(
            "idcg", F.coalesce(F.col("idcg_all"), F.lit(0.0))
        ).drop("idcg_all")

    return (
        per_q.join(F.broadcast(totals), "qid", "left")
        .withColumn("num_rel", F.coalesce(F.col("num_rel"), F.lit(0)))
        .select(
            "qid",
            "num_ret",
            "num_rel",
            "num_rel_ret",
            F.when(
                F.col("num_rel") > 0,
                F.col("num_rel_ret") / F.col("num_rel").cast("double"),
            ).otherwise(F.lit(0.0)).alias("recall"),
            F.when(
                F.col("first_rel_rank").isNotNull(),
                F.lit(1.0) / F.col("first_rel_rank").cast("double"),
            ).otherwise(F.lit(0.0)).alias("rr"),
            F.when(
                F.col("num_rel") > 0,
                F.coalesce(F.col("ap_num"), F.lit(0.0))
                / F.col("num_rel").cast("double"),
            ).otherwise(F.lit(0.0)).alias("ap"),
            (F.col("p_num") / F.lit(float(p_at))).alias(f"p_at_{p_at}"),
            F.col("dcg"),
            F.when(
                F.col("idcg") > 0, F.col("dcg") / F.col("idcg")
            ).otherwise(F.lit(0.0)).alias("ndcg"),
        )
    )


def macro_metrics(per_query: DataFrame, p_at: int = 5) -> DataFrame:
    """Macro averages over queries (reference prints these:
    AllRetrievedResults.java:105-118)."""
    return per_query.agg(
        F.count(F.lit(1)).cast("long").alias("num_queries"),
        F.avg("recall").alias("recall"),
        F.avg("rr").alias("mrr"),
        F.avg("ap").alias("map"),
        F.avg(f"p_at_{p_at}").alias(f"avg_p_at_{p_at}"),
        F.avg("ndcg").alias("avg_ndcg"),
    )


def macro_metrics_extended(
    per_query: DataFrame,
    success_at: int = 5,
    gmap_eps: float = 1e-5,
) -> DataFrame:
    """The macro averages trec_eval adds beyond the reference's
    printout: GMAP (geometric MAP, Robertson's log-average with the
    standard ε floor so zero-AP topics don't zero the product) and
    Success@k (fraction of queries with a relevant doc in the top k —
    rr ≥ 1/k exactly when the first relevant rank ≤ k, and both sides
    compute 1/k as the same IEEE double, so the comparison is exact).
    Input: ``per_query_metrics`` output. One scalar aggregate."""
    succ = (
        F.col("rr") >= F.lit(1.0) / F.lit(float(success_at))
    ).cast("double")
    return per_query.agg(
        F.count(F.lit(1)).cast("long").alias("num_queries"),
        F.avg("rr").alias("mrr"),
        F.avg("ap").alias("map"),
        F.exp(
            F.avg(F.log(F.col("ap") + F.lit(float(gmap_eps))))
        ).alias("gmap"),
        F.avg(succ).alias(f"success_at_{success_at}"),
    )


def evaluate(
    run: DataFrame, qrels: DataFrame, p_at: int = 5, ndcg_at: int = 10,
    **kw,
) -> DataFrame:
    return macro_metrics(
        per_query_metrics(run, qrels, p_at=p_at, ndcg_at=ndcg_at, **kw),
        p_at=p_at,
    )


def rr_histogram(per_query: DataFrame, n_bins: int = 5) -> DataFrame:
    """Bucket counts of RR (reference: AllRetrievedResults.java:70-88):
    bucket 0 = no relevant found; otherwise ceil(rr * n_bins) in 1..n."""
    bucket = F.when(F.col("rr") <= 0, F.lit(0)).otherwise(
        F.least(
            F.ceil(F.col("rr") * n_bins).cast("int"), F.lit(n_bins)
        )
    )
    return (
        per_query.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("bucket")
    )


def extended_metrics(
    run: DataFrame,
    qrels: DataFrame,
    err_at: int = 10,
    rbp_p: float = 0.8,
    rel_threshold: float = 1.0,
    gmax: float = 1.0,
) -> DataFrame:
    """Extended per-query metrics beyond the reference's evaluator —
    the rest of the standard trec_eval / IR-eval family:

    - ``bpref`` (Buckley & Voorhees SIGIR'04, trec_eval's formula):
      (1/R) * Σ over retrieved RELEVANT docs of
      (1 - min(n_above, min(R, N)) / min(R, N)) where n_above counts
      the retrieved judged-NONRELEVANT docs ranked above, R / N are
      the qrels' total relevant / judged-nonrelevant counts. When a
      query has no judged nonrelevant docs (min(R,N)=0) every
      contribution is 1 (trec_eval's degenerate case); R=0 => 0.0.
    - ``err`` (Expected Reciprocal Rank, Chapelle et al. CIKM'09) over
      the top ``err_at``: Σ (R_r / r) * Π_{i<r} (1 - R_i) with
      R_i = (2^rel - 1) / 2^gmax; the cascade product is computed as
      exp of a windowed ln-sum (1 - R_i >= 2^-gmax > 0 always).
    - ``rbp`` (Rank-Biased Precision, Moffat & Zobel TOIS'08) with
      persistence ``rbp_p`` over the whole run:
      (1 - p) * Σ is_rel * p^(rank-1).
    - ``judged_frac``: fraction of run rows judged at all (rel present
      in qrels, any grade) — the pool-coverage diagnostic read next to
      bpref.

    One broadcast qrels join + two rank windows + one groupBy — the
    run side is never shuffled except by qid for the windows, same
    shape as per_query_metrics."""
    q = qrels.select("qid", "docid", "rel")
    j = run.join(F.broadcast(q), ["qid", "docid"], "left").withColumn(
        "judged", F.col("rel").isNotNull().cast("double")
    ).withColumn("rel", F.coalesce(F.col("rel"), F.lit(0.0)))
    is_rel = (F.col("rel") >= rel_threshold).cast("double")
    is_nonrel_j = (
        (F.col("judged") > 0) & (F.col("rel") < rel_threshold)
    ).cast("double")
    j = j.withColumn("is_rel", is_rel).withColumn("is_nrj", is_nonrel_j)

    w_prev = (
        Window.partitionBy("qid")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # ERR cascade: stop-probability R_i per rank, survival product as
    # exp(windowed ln-sum over the STRICTLY preceding ranks)
    r_i = (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)) / F.lit(
        float(2.0**gmax)
    )
    j = (
        j.withColumn("r_i", r_i)
        .withColumn(
            "survive",
            F.exp(
                F.coalesce(
                    F.sum(F.log(F.lit(1.0) - F.col("r_i"))).over(w_prev),
                    F.lit(0.0),
                )
            ),
        )
        .withColumn(
            "n_above", F.coalesce(F.sum("is_nrj").over(w_prev), F.lit(0.0))
        )
    )

    totals = (
        q.groupBy("qid")
        .agg(
            F.sum(
                (F.col("rel") >= rel_threshold).cast("double")
            ).cast("long").alias("n_rel"),
            F.sum(
                (F.col("rel") < rel_threshold).cast("double")
            ).cast("long").alias("n_nonrel"),
        )
    )
    j = j.join(F.broadcast(totals), "qid", "left").withColumn(
        "min_rn", F.least(F.col("n_rel"), F.col("n_nonrel")).cast("double")
    )
    bpref_contrib = F.when(
        F.col("is_rel") > 0,
        F.when(
            F.col("min_rn") > 0,
            F.lit(1.0)
            - F.least(F.col("n_above"), F.col("min_rn")) / F.col("min_rn"),
        ).otherwise(F.lit(1.0)),
    ).otherwise(F.lit(0.0))

    per_q = j.groupBy("qid").agg(
        F.max("n_rel").alias("_R"),
        F.sum(bpref_contrib).alias("_bp_num"),
        F.sum(
            F.when(
                F.col("rank") <= err_at,
                F.col("r_i")
                / F.col("rank").cast("double")
                * F.col("survive"),
            ).otherwise(F.lit(0.0))
        ).alias("err"),
        F.sum(
            F.col("is_rel")
            * F.pow(F.lit(float(rbp_p)), F.col("rank").cast("double") - 1)
        ).alias("_rbp_sum"),
        F.avg("judged").alias("judged_frac"),
    )
    return per_q.select(
        "qid",
        F.when(
            F.col("_R") > 0, F.col("_bp_num") / F.col("_R").cast("double")
        ).otherwise(F.lit(0.0)).alias("bpref"),
        "err",
        (F.lit(1.0 - float(rbp_p)) * F.col("_rbp_sum")).alias("rbp"),
        "judged_frac",
    )


def alpha_ndcg(
    run: DataFrame,
    aspect_qrels: DataFrame,
    k: int = 5,
    alpha: float = 0.5,
) -> DataFrame:
    """α-nDCG@k (Clarke et al. SIGIR'08, "Novelty and diversity in
    information retrieval evaluation") — the diversity-aware nDCG that
    pairs with ``xquad_rerank`` / ``pm2_rerank``. Aspect judgments are
    binary rows (qid, docid, aspect); the gain of the doc at rank r is

      G(r) = Σ_a J(d_r, a) · (1−α)^{C_a(r−1)}

    with C_a(r−1) = how many earlier-ranked docs already covered
    aspect a, so redundant coverage decays geometrically. DCG@k uses
    the standard log2(r+1) discount (spelled ln/ln2 — the cross-engine
    float convention); the IDEAL gain is the usual greedy
    approximation (computing the true ideal is NP-hard, Clarke §5):
    k unrolled steps picking argmax marginal gain over the judged
    docs, gains rounded to 4dp BEFORE each argmax (docid ASC ties) and
    the ROUNDED gain accumulated — the engine-stable greedy
    convention shared with xquad/pm2. α defaults to 0.5 so (1−α)^n is
    an exact dyadic on both engines.

    -> (qid, dcg, idcg, alpha_ndcg) for every qid with idcg > 0.

    Scale shape: the system side is one broadcast qrels join + one
    per-(qid, aspect) window over run×aspect rows (run-sized); the
    ideal greedy loops k times over the judged-doc relation
    (qrels-sized, never corpus-sized) with localCheckpointed state."""
    ar = aspect_qrels.select("qid", "docid", "aspect").distinct()
    ln2 = F.log(F.lit(2.0))
    # ---- system DCG over the top-k run
    j = (
        run.filter(F.col("rank") <= int(k))
        .select("qid", "docid", "rank")
        .join(F.broadcast(ar), ["qid", "docid"])
    )
    w_prev = (
        Window.partitionBy("qid", "aspect")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = j.withColumn(
        "_prior", F.coalesce(F.count(F.lit(1)).over(w_prev), F.lit(0))
    )
    dcg = (
        j.groupBy("qid", "rank")
        .agg(
            F.sum(
                F.pow(F.lit(1.0 - float(alpha)), F.col("_prior"))
            ).alias("_g")
        )
        .groupBy("qid")
        .agg(
            F.sum(
                F.col("_g")
                / (F.log(F.col("rank").cast("double") + F.lit(1.0)) / ln2)
            ).alias("dcg")
        )
    )
    # ---- ideal DCG: k-step greedy unroll over the judged docs
    remaining = ar.select("qid", "docid").distinct()
    cnt = ar.select("qid", "aspect").distinct().withColumn(
        "c", F.lit(0)
    )
    ideal_parts = []
    for step in range(1, int(k) + 1):
        marg = (
            remaining.join(ar, ["qid", "docid"])
            .join(cnt, ["qid", "aspect"])
            .groupBy("qid", "docid")
            .agg(
                F.round(
                    F.sum(F.pow(F.lit(1.0 - float(alpha)), F.col("c"))),
                    4,
                ).alias("g")
            )
        )
        wd = Window.partitionBy("qid").orderBy(
            F.col("g").desc(), F.col("docid").asc()
        )
        pick = (
            marg.withColumn("_rn", F.row_number().over(wd))
            .filter(F.col("_rn") == 1)
            .select("qid", "docid", F.col("g").alias("g"))
            .localCheckpoint(eager=False)
        )
        ideal_parts.append(
            pick.select(
                "qid",
                (
                    F.col("g")
                    / (F.log(F.lit(float(step) + 1.0)) / ln2)
                ).alias("_ig"),
            )
        )
        remaining = remaining.join(
            pick.select("qid", "docid"), ["qid", "docid"], "left_anti"
        ).localCheckpoint(eager=False)
        picked_aspects = ar.join(
            pick.select("qid", "docid"), ["qid", "docid"], "left_semi"
        ).select("qid", "aspect", F.lit(1).alias("_inc"))
        cnt = (
            cnt.join(picked_aspects, ["qid", "aspect"], "left")
            .select(
                "qid", "aspect",
                (F.col("c") + F.coalesce(F.col("_inc"), F.lit(0))).alias(
                    "c"
                ),
            )
            .localCheckpoint(eager=False)
        )
    ig = ideal_parts[0]
    for p in ideal_parts[1:]:
        ig = ig.unionByName(p)
    idcg = ig.groupBy("qid").agg(F.sum("_ig").alias("idcg"))
    return (
        idcg.filter(F.col("idcg") > 0)
        .join(dcg, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("dcg"), F.lit(0.0)).alias("dcg"),
            "idcg",
            (
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
            ).alias("alpha_ndcg"),
        )
    )


def intent_aware_metrics(
    run: DataFrame,
    aspect_qrels: DataFrame,
    k: int = 10,
    gmax: float = 1.0,
) -> DataFrame:
    """Intent-aware diversity metrics over binary per-aspect
    judgments (qid, docid, aspect):

    - ``err_ia`` (ERR-IA, Chapelle et al. CIKM'09 §7.2 / TREC Web
      diversity track): the plain ERR cascade computed per aspect —
      stop-probability R = (2^1 − 1)/2^gmax at every rank whose doc
      covers the aspect — averaged UNIFORMLY over the query's judged
      aspects (aspects the top-k never covers contribute 0, but stay
      in the denominator).
    - ``s_recall`` (subtopic recall@k, Zhai et al. SIGIR'03): the
      fraction of the query's aspects covered at least once in the
      top k.

    -> (qid, n_aspects, err_ia, s_recall). With gmax=1 the per-rank
    stop probability is the exact dyadic 0.5, so the cascade product
    0.5^prior is fold-order-safe; only the final /rank divisions are
    inexact (the shared 4dp convention absorbs them).

    Scale shape: one broadcast qrels join + one per-(qid, aspect)
    window over run×aspect rows — run-sized, no greedy loop (ERR-IA
    needs no ideal ranking, unlike alpha_ndcg)."""
    ar = aspect_qrels.select("qid", "docid", "aspect").distinct()
    n_aspects = ar.groupBy("qid").agg(
        F.countDistinct("aspect").cast("long").alias("n_aspects")
    )
    r_stop = (2.0**1.0 - 1.0) / (2.0 ** float(gmax))
    j = (
        run.filter(F.col("rank") <= int(k))
        .select("qid", "docid", "rank")
        .join(F.broadcast(ar), ["qid", "docid"])
    )
    w_prev = (
        Window.partitionBy("qid", "aspect")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = j.withColumn(
        "_prior", F.coalesce(F.count(F.lit(1)).over(w_prev), F.lit(0))
    )
    per_aspect = j.groupBy("qid", "aspect").agg(
        F.sum(
            F.lit(r_stop)
            * F.pow(F.lit(1.0 - r_stop), F.col("_prior"))
            / F.col("rank").cast("double")
        ).alias("_err_a")
    )
    agg = per_aspect.groupBy("qid").agg(
        F.sum("_err_a").alias("_err_sum"),
        F.countDistinct("aspect").cast("long").alias("_covered"),
    )
    return (
        n_aspects.join(agg, "qid", "left")
        .select(
            "qid",
            "n_aspects",
            (
                F.coalesce(F.col("_err_sum"), F.lit(0.0))
                / F.col("n_aspects").cast("double")
            ).alias("err_ia"),
            (
                F.coalesce(F.col("_covered"), F.lit(0)).cast("double")
                / F.col("n_aspects").cast("double")
            ).alias("s_recall"),
        )
    )


def iprec_at_recall(
    run: DataFrame,
    qrels: DataFrame,
    n_levels: int = 11,
    rel_threshold: float = 1.0,
) -> DataFrame:
    """trec_eval's ``iprec_at_recall_0.00 .. 1.00`` — 11-point
    interpolated precision (the recall-precision curve behind the
    classic PR plots; complements the reference evaluator's
    AP/recall/P@k family, reference: evaluator/RetrievedResults.java
    computes AP from the same cum_rel/rank quantities).

    For each query and recall level r = l/(n_levels-1):
    ``iprec(r) = max over ranks k with recall(k) >= r of prec(k)``
    where prec(k) = cum_rel(k)/k, recall(k) = cum_rel(k)/R. This is
    trec_eval's backward interpolation: at level 0.0 it is the max
    precision anywhere in the run; levels unreached by the run get 0;
    queries with R = 0 get 0 at every level.

    Float parity note: the level threshold test is done in pure
    integer arithmetic — ``(n_levels-1)*cum_rel >= l*R`` — so no
    engine can disagree on a boundary (cum_rel is an integer-valued
    sum of 0/1, R and l are ints).

    Shape at scale: one broadcast qrels join, one rank window per qid,
    an 11x multiply against a LITERAL level array (explode of a
    literal sequence — never a computed array), then a map-side
    combinable groupBy(qid, level) max. Run rows per query are top-k
    bounded, so the multiplied relation is k*n_levels rows per query.
    -> (qid, level, recall_level, iprec)."""
    denom = n_levels - 1
    judged = join_run_qrels(run, qrels).withColumn(
        "is_rel", (F.col("rel") >= rel_threshold).cast("double")
    )
    w_rank = Window.partitionBy("qid").orderBy("rank")
    judged = judged.withColumn(
        "cum_rel", F.sum("is_rel").over(w_rank).cast("long")
    ).withColumn(
        "prec", F.col("cum_rel") / F.col("rank").cast("double")
    )
    totals = (
        qrels.filter(F.col("rel") >= rel_threshold)
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rel"))
    )
    judged = judged.join(F.broadcast(totals), "qid", "left").withColumn(
        "n_rel", F.coalesce(F.col("n_rel"), F.lit(0)).cast("long")
    )
    lv = judged.withColumn(
        "level", F.explode(F.sequence(F.lit(0), F.lit(denom)))
    )
    reach = (F.lit(denom) * F.col("cum_rel")) >= (
        F.col("level") * F.col("n_rel")
    )
    per = lv.groupBy("qid", "level").agg(
        F.max(
            F.when((F.col("n_rel") > 0) & reach, F.col("prec"))
        ).alias("_mx")
    )
    return per.select(
        "qid",
        F.col("level").cast("long").alias("level"),
        (F.col("level") / F.lit(float(denom))).alias("recall_level"),
        F.coalesce(F.col("_mx"), F.lit(0.0)).alias("iprec"),
    )


def r_precision(
    run: DataFrame,
    qrels: DataFrame,
    rel_threshold: float = 1.0,
) -> DataFrame:
    """trec_eval's ``Rprec``: precision at rank R where R is the
    query's total relevant count — the point where precision equals
    recall. ``Rprec = |relevant in top R| / R``; R = 0 (or R larger
    than the run) degenerates exactly as trec_eval: counts only what
    was retrieved, R = 0 gives 0.

    One broadcast qrels join + one map-side-combinable groupBy — the
    rank <= R cut is a per-row predicate, no window needed.
    -> (qid, n_rel, rprec)."""
    judged = join_run_qrels(run, qrels).withColumn(
        "is_rel", (F.col("rel") >= rel_threshold).cast("double")
    )
    totals = (
        qrels.filter(F.col("rel") >= rel_threshold)
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rel"))
    )
    j = judged.join(F.broadcast(totals), "qid", "left").withColumn(
        "n_rel", F.coalesce(F.col("n_rel"), F.lit(0)).cast("long")
    )
    per = j.groupBy("qid").agg(
        F.max("n_rel").alias("n_rel"),
        F.sum(
            F.when(F.col("rank") <= F.col("n_rel"), F.col("is_rel"))
            .otherwise(F.lit(0.0))
        ).cast("long").alias("_hits"),
    )
    return per.select(
        "qid",
        "n_rel",
        F.when(
            F.col("n_rel") > 0,
            F.col("_hits") / F.col("n_rel").cast("double"),
        ).otherwise(F.lit(0.0)).alias("rprec"),
    )


def paired_ttest(
    per_query_a: DataFrame,
    per_query_b: DataFrame,
    metric_col: str = "ap",
    qid_col: str = "qid",
) -> DataFrame:
    """Paired Student's t over per-query metric deltas — the standard
    IR significance test between two systems (the comparison trec_eval
    users run; Smucker, Allan & Carterette CIKM'07 recommend the paired
    t over sign/Wilcoxon for IR metrics). Input: two per-query metric
    tables (``per_query_metrics`` output); queries are paired on qid
    (inner join — topics absent from either run drop out, as trec_eval
    does). -> one row (n, mean_diff, sd_diff, t_stat) with
    t = mean(d) / (sd(d) / sqrt(n)); t_stat is NULL when the paired
    deltas have zero variance or n < 2 (identical runs), rather than a
    division-by-zero poison value. Reduction is one scalar aggregate —
    per-query tables are topics-sized, so this is driver-trivial at
    any corpus scale."""
    a = per_query_a.select(
        F.col(qid_col).alias("qid"), F.col(metric_col).alias("_ma")
    )
    b = per_query_b.select(
        F.col(qid_col).alias("qid"), F.col(metric_col).alias("_mb")
    )
    d = a.join(b, "qid").select((F.col("_ma") - F.col("_mb")).alias("d"))
    agg = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("d").alias("mean_diff"),
        F.stddev_samp("d").alias("sd_diff"),
    )
    return agg.select(
        "n",
        "mean_diff",
        "sd_diff",
        F.when(
            (F.col("n") >= 2) & (F.col("sd_diff") > 0),
            F.col("mean_diff") / (F.col("sd_diff") / F.sqrt(F.col("n"))),
        ).alias("t_stat"),
    )


def wilcoxon_signed_rank(
    per_query_a: DataFrame,
    per_query_b: DataFrame,
    metric_col: str = "ap",
    qid_col: str = "qid",
    round_dp: int = 4,
) -> DataFrame:
    """Wilcoxon signed-rank statistic over paired per-query metric
    deltas — the other classic IR significance test next to the paired
    t (`paired_ttest`); nonparametric, so robust to AP's skew. Standard
    treatment: zero deltas are DISCARDED, |deltas| are ranked ascending
    with AVERAGE ranks for ties, and W+ / W- are the rank sums of the
    positive / negative sides. Deltas are rounded to ``round_dp``
    BEFORE the zero-filter and ranking so tie groups are stable across
    engines (two APs within 5e-5 tie instead of depending on float
    fold order). -> one row (n, w_plus, w_minus). The global rank
    window runs over topics-sized data (thousands of rows at most) —
    driver-trivial at any corpus scale, same as `paired_ttest`."""
    a = per_query_a.select(
        F.col(qid_col).alias("qid"), F.col(metric_col).alias("_ma")
    )
    b = per_query_b.select(
        F.col(qid_col).alias("qid"), F.col(metric_col).alias("_mb")
    )
    d = (
        a.join(b, "qid")
        .select(F.round(F.col("_ma") - F.col("_mb"), round_dp).alias("d"))
        .filter(F.col("d") != 0)
        .withColumn("absd", F.abs(F.col("d")))
    )
    # average rank for a tie group = rank() + (|group| - 1)/2
    d = (
        d.withColumn("r", F.rank().over(Window.orderBy("absd")))
        .withColumn(
            "nt", F.count(F.lit(1)).over(Window.partitionBy("absd"))
        )
        .withColumn("avg_rank", F.col("r") + (F.col("nt") - F.lit(1)) / 2.0)
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("d") > 0, F.col("avg_rank")).otherwise(0.0)
        ).alias("w_plus"),
        F.sum(
            F.when(F.col("d") < 0, F.col("avg_rank")).otherwise(0.0)
        ).alias("w_minus"),
    )


def friedman_test(
    per_query_runs: list,
    metric_col: str = "ap",
    qid_col: str = "qid",
    round_dp: int = 4,
) -> DataFrame:
    """Friedman rank test across k >= 3 systems on a per-query metric —
    the standard multi-system significance test when the paired t /
    Wilcoxon two-system tests don't apply (trec_eval users compare many
    runs at once; Demšar JMLR'06 recommends Friedman for exactly this).
    Input: ``[(system_name, per_query_metrics_df), ...]``. Queries are
    blocks: only qids present in ALL k systems are kept (the paired
    analogue of the t-test's inner join). Within each query the k
    systems are ranked ASCENDING on the metric (best system -> highest
    mean rank) with AVERAGE ranks for ties; metrics are rounded to
    ``round_dp`` BEFORE ranking so tie groups are stable across engines
    (same convention as `wilcoxon_signed_rank`). The statistic is the
    classic (tie-uncorrected) chi^2_F = 12/(n·k·(k+1)) · Σ_j R_j² −
    3·n·(k+1), where R_j is system j's rank sum over the n common
    queries. -> one row per system (system, n_queries, rank_sum,
    mean_rank, chi2_f; chi2_f repeated on every row). All windows and
    aggregates run over topics×k-sized data — driver-trivial at any
    corpus scale. Ranks are multiples of 0.5, so every sum here is
    exact in float64 and the statistic is fold-order independent."""
    k = len(per_query_runs)
    if k < 3:
        # k = 2 degenerates to a sign-test-shaped statistic for which
        # the chi^2_F reference distribution is unreliable — use
        # wilcoxon_signed_rank / paired_ttest for two systems
        raise ValueError("friedman_test needs >= 3 systems")
    tagged = None
    for name, df in per_query_runs:
        t = df.select(
            F.lit(name).alias("system"),
            F.col(qid_col).alias("qid"),
            F.round(F.col(metric_col), round_dp).alias("_m"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    common = (
        tagged.withColumn(
            "_k", F.count(F.lit(1)).over(Window.partitionBy("qid"))
        )
        .filter(F.col("_k") == k)
        .drop("_k")
    )
    ranked = (
        common.withColumn(
            "_r",
            F.rank().over(Window.partitionBy("qid").orderBy("_m")),
        )
        .withColumn(
            "_nt",
            F.count(F.lit(1)).over(Window.partitionBy("qid", "_m")),
        )
        .withColumn(
            "avg_rank", F.col("_r") + (F.col("_nt") - F.lit(1)) / 2.0
        )
    )
    per_sys = ranked.groupBy("system").agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("avg_rank").alias("rank_sum"),
    )
    tot = per_sys.agg(
        F.max("n_queries").cast("double").alias("_n"),
        F.sum(F.col("rank_sum") * F.col("rank_sum")).alias("_ssum"),
    )
    # chi2 spelled EXACTLY as the oracle does (12·ssum/(n·k(k+1)) −
    # 3(k+1)·n) so both engines run the same float64 expression shape.
    chi2 = (
        F.lit(12.0) * F.col("_ssum")
        / (F.col("_n") * F.lit(float(k * (k + 1))))
        - F.lit(float(3 * (k + 1))) * F.col("_n")
    )
    return (
        per_sys.crossJoin(F.broadcast(tot))
        .select(
            "system",
            "n_queries",
            "rank_sum",
            (F.col("rank_sum") / F.col("n_queries").cast("double")).alias(
                "mean_rank"
            ),
            chi2.alias("chi2_f"),
        )
    )


def condensed_ap(
    run: DataFrame,
    qrels: DataFrame,
    qid_col: str = "qid",
    docid_col: str = "docid",
    rel_col: str = "rel",
) -> DataFrame:
    """Condensed-list AP (AP' in Sakai SIGIR'07, "Alternatives to
    Bpref"): remove UNJUDGED documents from the ranking entirely and
    compute plain AP over the judged-only condensed list — the other
    standard incomplete-judgment treatment next to bpref and infAP
    (and Sakai's experiments prefer it to bpref). R = the query's
    judged-relevant total; queries with R = 0 yield no row.
    -> (qid, n_judged_ret, ap_condensed).

    Plan shape: one broadcast qrels join, a per-qid re-rank window
    over the judged survivors (run-depth bounded), and the usual
    cumulative-precision aggregate."""
    j = run.select(
        "qid", F.col("rank").cast("long").alias("rank"), docid_col
    ).join(
        F.broadcast(
            qrels.select(
                F.col(qid_col).alias("qid"),
                F.col(docid_col).alias(docid_col),
                F.col(rel_col).alias("_rel"),
            )
        ),
        ["qid", docid_col],
    )
    w = Window.partitionBy("qid").orderBy("rank")
    c = j.withColumn(
        "crank", F.row_number().over(w).cast("long")
    ).withColumn(
        "_is_rel", (F.col("_rel") >= 1.0).cast("long")
    )
    cum = Window.partitionBy("qid").orderBy("crank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = c.withColumn("_cumrel", F.sum("_is_rel").over(cum))
    per = c.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_judged_ret"),
        F.sum(
            F.when(
                F.col("_is_rel") == 1,
                F.col("_cumrel").cast("double") / F.col("crank"),
            ).otherwise(F.lit(0.0))
        ).alias("_psum"),
    )
    r_tot = (
        qrels.filter(F.col(rel_col) >= 1.0)
        .groupBy(F.col(qid_col).alias("qid"))
        .agg(F.count(F.lit(1)).cast("long").alias("_r"))
    )
    return r_tot.join(per, "qid", "left").select(
        "qid",
        F.coalesce(F.col("n_judged_ret"), F.lit(0))
        .cast("long")
        .alias("n_judged_ret"),
        (
            F.coalesce(F.col("_psum"), F.lit(0.0))
            / F.col("_r").cast("double")
        ).alias("ap_condensed"),
    )


def inferred_ap(
    run: DataFrame,
    sampled_qrels: DataFrame,
    eps: float = 0.00001,
    qid_col: str = "qid",
    docid_col: str = "docid",
    rel_col: str = "rel",
) -> DataFrame:
    """Inferred AP (Yilmaz & Aslam CIKM'06, trec_eval's infAP): the
    unbiased AP estimator when only a RANDOM SAMPLE of the judgment
    pool is assessed — the standard answer to judging cost at depth.
    For each retrieved sampled-relevant doc at rank k, the expected
    precision above it is estimated from the sampled docs within the
    top k−1 (s judged, r relevant):

      E[prec@k] = 1/k + (s/k) · (r + ε)/(s + 2ε)

    (the algebraic form of the paper's ((k−1)/k)·(s/(k−1))·… that
    needs no k=1 special case — at k=1 s=0 and the second term is 0),
    and infAP = Σ E[prec@k] / R over the query's R sampled-relevant
    docs (retrieved or not). Queries with R=0 yield no row, as
    trec_eval does. -> (qid, r_sampled, n_sampled_ret, inf_ap).

    Plan shape: one broadcast qrels join + per-qid cumulative windows
    over run-depth-sized data — the AP silhouette exactly."""
    j = run.select(
        "qid", F.col("rank").cast("long").alias("rank"), docid_col
    ).join(
        F.broadcast(
            sampled_qrels.select(
                F.col(qid_col).alias("qid"),
                F.col(docid_col).alias(docid_col),
                F.col(rel_col).alias("_rel"),
            )
        ),
        ["qid", docid_col],
        "left",
    ).select(
        "qid",
        "rank",
        F.col("_rel").isNotNull().cast("long").alias("_judged"),
        (F.coalesce(F.col("_rel"), F.lit(0.0)) >= 1.0)
        .cast("long")
        .alias("_is_rel"),
    )
    above = (
        Window.partitionBy("qid")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = j.withColumn(
        "_s", F.coalesce(F.sum("_judged").over(above), F.lit(0))
    ).withColumn(
        "_r", F.coalesce(F.sum("_is_rel").over(above), F.lit(0))
    )
    e = float(eps)
    term = F.lit(1.0) / F.col("rank") + (
        F.col("_s").cast("double") / F.col("rank")
    ) * (
        (F.col("_r").cast("double") + F.lit(e))
        / (F.col("_s").cast("double") + F.lit(2.0 * e))
    )
    per_q = (
        w.filter((F.col("_judged") == 1) & (F.col("_is_rel") == 1))
        .groupBy("qid")
        .agg(
            F.sum(term).alias("_tsum"),
            F.count(F.lit(1)).cast("long").alias("n_sampled_ret"),
        )
    )
    r_tot = (
        sampled_qrels.filter(F.col(rel_col) >= 1.0)
        .groupBy(F.col(qid_col).alias("qid"))
        .agg(F.count(F.lit(1)).cast("long").alias("r_sampled"))
    )
    return (
        r_tot.join(per_q, "qid", "left")
        .select(
            "qid",
            "r_sampled",
            F.coalesce(F.col("n_sampled_ret"), F.lit(0))
            .cast("long")
            .alias("n_sampled_ret"),
            (
                F.coalesce(F.col("_tsum"), F.lit(0.0))
                / F.col("r_sampled").cast("double")
            ).alias("inf_ap"),
        )
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins — the standard classifier calibration
    report (Niculescu-Mizil & Caruana ICML'05; DeGroot-Fienberg
    calibration): rows with probability scores in [0, 1] and binary
    labels are bucketed into ``n_bins`` equal-width bins
    (bin = min(floor(score·B), B−1) so score 1.0 lands in the top
    bin), and each bin reports count, positives, mean predicted score
    and observed positive rate — well-calibrated means the last two
    match per bin. -> (bin, n, n_pos, mean_score, pos_rate).

    One map-side-combined groupBy over at most B keys — corpus-scale
    trivial. The floor binning is engine-safe whenever the scores are
    the identical float64 on both engines (true for this repo's
    bit-exact classifier logits)."""
    b = F.least(
        F.floor(F.col(score_col) * F.lit(int(n_bins))),
        F.lit(int(n_bins) - 1),
    ).cast("long")
    g = scored.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(label_col).cast("long")).cast("long").alias("n_pos"),
        F.avg(F.col(score_col)).alias("mean_score"),
    )
    return g.select(
        "bin",
        "n",
        "n_pos",
        "mean_score",
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
            "pos_rate"
        ),
    )


def expected_search_length(
    run: DataFrame,
    qrels: DataFrame,
    n_rel_target: int = 2,
) -> DataFrame:
    """Expected search length (Cooper, JASIS 1968 — the oldest
    user-effort metric: how many NON-relevant documents does a user
    wade through before collecting j relevant ones): for each query
    and each target j <= ``n_rel_target``,

        esl@j = rank of the j-th relevant document − j

    (NULL when the run never surfaces j relevant docs — the honest
    infinite-effort case). All-INTEGER: ranks and relevance flags
    only, no floats anywhere. -> (qid, j, rank_of_jth, esl).

    Plan shape: one (qid, docid) qrels join + a per-qid cumulative
    relevant counter window over run-sized relations; the j table is
    a literal broadcast."""
    j = run.select(
        "qid", "docid", F.col("rank").cast("long").alias("rank")
    ).join(
        qrels.select(
            "qid", "docid", (F.col("rel") >= 1.0).alias("_r")
        ),
        ["qid", "docid"],
        "left",
    )
    w = Window.partitionBy("qid").orderBy("rank")
    cum = j.withColumn(
        "_cum",
        F.sum(F.coalesce(F.col("_r"), F.lit(False)).cast("long")).over(
            w
        ),
    )
    firsts = (
        cum.filter(
            F.coalesce(F.col("_r"), F.lit(False))
            & (F.col("_cum") <= int(n_rel_target))
        )
        .select("qid", F.col("_cum").alias("j"), "rank")
        .groupBy("qid", "j")
        .agg(F.min("rank").alias("rank_of_jth"))
    )
    spark = run.sparkSession
    targets = spark.createDataFrame(
        [(t,) for t in range(1, int(n_rel_target) + 1)], "j long"
    )
    spine = (
        run.select("qid").distinct().crossJoin(F.broadcast(targets))
    )
    return spine.join(firsts, ["qid", "j"], "left").select(
        "qid",
        "j",
        "rank_of_jth",
        (F.col("rank_of_jth") - F.col("j")).cast("long").alias("esl"),
    )


def pool_depth_curve(
    runs: list,
    qrels: DataFrame,
    max_depth: int = 10,
) -> DataFrame:
    """Judged coverage vs pooling depth — the assessment-budget curve
    behind TREC pool-depth decisions (Zobel SIGIR'98's pooling
    adequacy analysis): for each depth k, the union pool of the runs'
    top-k (docs by their MIN rank across runs) and what fraction of
    it the qrels actually judged. A flattening curve says deeper
    pooling buys no new judged mass; a falling one quantifies the
    unjudged-docs hazard for every metric downstream.
    -> (qid, depth, n_pool, n_judged, judged_frac), depth 1..max_depth,
    frac = ONE division.

    Plan shape: run union + min-rank collapse (run-sized), a
    broadcast literal depth table theta-joined on rank <= depth
    (fan-out <= max_depth per pooled doc), judged flag from one
    (qid, docid) qrels join. Corpus never touched."""
    u = None
    for r in runs:
        s = r.select(
            "qid", F.col("docid"), F.col("rank").cast("long").alias("rank")
        )
        u = s if u is None else u.unionByName(s)
    pooled = u.groupBy("qid", "docid").agg(
        F.min("rank").alias("_r")
    )
    judged = qrels.select("qid", "docid").distinct().withColumn(
        "_j", F.lit(1)
    )
    flagged = pooled.join(judged, ["qid", "docid"], "left").select(
        "qid", "_r", F.coalesce("_j", F.lit(0)).alias("_j")
    )
    spark = qrels.sparkSession
    depths = spark.createDataFrame(
        [(d,) for d in range(1, int(max_depth) + 1)], "depth long"
    )
    j = flagged.join(
        F.broadcast(depths), F.col("_r") <= F.col("depth")
    )
    return (
        j.groupBy("qid", "depth")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pool"),
            F.sum("_j").cast("long").alias("n_judged"),
        )
        .select(
            "qid",
            "depth",
            "n_pool",
            "n_judged",
            F.round(F.col("n_judged") / F.col("n_pool"), 4).alias(
                "judged_frac"
            ),
        )
    )


def run_diff(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query diff between two runs' top-k — the regression report
    an engine change ships with (the operational complement of the
    rank-correlation family: tau tells you HOW MUCH moved, this tells
    you WHAT): common docs, docs only one side retrieves, and the
    mean |rank shift| over the common set.

        n_common / n_only_a / n_only_b : integer set counts
        avg_rank_shift = Σ|rank_a − rank_b| / n_common  (ONE division;
                         NULL when nothing is common)

    -> one row per qid present in EITHER run: (qid, n_common,
    n_only_a, n_only_b, avg_rank_shift).

    Plan shape: one (qid, doc_id) full-outer join of two run-sized
    relations + one groupBy(qid). Corpus never touched."""
    a = run_a.filter(F.col("rank") <= int(k)).select(
        "qid", "doc_id", F.col("rank").alias("_ra")
    )
    b = run_b.filter(F.col("rank") <= int(k)).select(
        "qid", "doc_id", F.col("rank").alias("_rb")
    )
    j = a.join(b, ["qid", "doc_id"], "full_outer")
    per = j.groupBy("qid").agg(
        F.sum(
            (F.col("_ra").isNotNull() & F.col("_rb").isNotNull()).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n_common"),
        F.sum(F.col("_rb").isNull().cast("long"))
        .cast("long")
        .alias("n_only_a"),
        F.sum(F.col("_ra").isNull().cast("long"))
        .cast("long")
        .alias("n_only_b"),
        F.sum(
            F.when(
                F.col("_ra").isNotNull() & F.col("_rb").isNotNull(),
                F.abs(F.col("_ra") - F.col("_rb")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("_shift"),
    )
    return per.select(
        "qid",
        "n_common",
        "n_only_a",
        "n_only_b",
        F.when(
            F.col("n_common") > 0,
            F.round(F.col("_shift") / F.col("n_common"), 4),
        ).alias("avg_rank_shift"),
    )


def assessor_agreement(
    j1: DataFrame,
    j2: DataFrame,
    qid_col: str = "qid",
    docid_col: str = "docid",
    rel_col: str = "rel",
) -> DataFrame:
    """Cohen's kappa between two assessors' binary judgments over the
    same pool (Cohen, Educ. Psychol. Meas. 1960) — the agreement
    number behind TREC's assessor-consistency studies (Voorhees, IPM
    2000, showed system RANKINGS survive assessor disagreement; this
    is the statistic those studies report):

        po    = n_agree / n
        pe    = (a1·b1 + a0·b0) / n²      (chance agreement from the
                                           marginals)
        kappa = (n_agree·n − a1·b1 − a0·b0) / (n² − a1·b1 − a0·b0)

    Judgments binarize at rel >= 1 (the graded-to-binary convention of
    `per_query_metrics`). Every quantity is an integer aggregate and
    each output is ONE division of exact integers — engine-identical.
    kappa is NULL when pe = 1 (both assessors constant — undefined).
    -> ONE row (n, n_agree, po, pe, kappa).

    Plan shape: one (qid, docid) equi-join of two pool-sized
    relations + one global aggregate. Docs only enter through the
    judgment pool — corpus scale is irrelevant here."""
    a = j1.select(
        F.col(qid_col).alias("qid"),
        F.col(docid_col).alias("docid"),
        (F.col(rel_col) >= 1.0).cast("long").alias("_ra"),
    )
    b = j2.select(
        F.col(qid_col).alias("qid"),
        F.col(docid_col).alias("docid"),
        (F.col(rel_col) >= 1.0).cast("long").alias("_rb"),
    )
    t = a.join(b, ["qid", "docid"]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("_ra") == F.col("_rb")).cast("long"))
        .cast("long")
        .alias("n_agree"),
        F.sum("_ra").cast("long").alias("_a1"),
        F.sum("_rb").cast("long").alias("_b1"),
    )
    chance = F.col("_a1") * F.col("_b1") + (
        F.col("n") - F.col("_a1")
    ) * (F.col("n") - F.col("_b1"))
    denom = F.col("n") * F.col("n") - chance
    return t.select(
        "n",
        "n_agree",
        F.round(F.col("n_agree") / F.col("n"), 4).alias("po"),
        F.round(chance / (F.col("n") * F.col("n")), 4).alias("pe"),
        F.when(
            denom > 0,
            F.round((F.col("n_agree") * F.col("n") - chance) / denom, 4),
        ).alias("kappa"),
    )


def randomization_propensity(
    impressions: DataFrame,
    pos_col: str = "pos",
    click_col: str = "clicked",
) -> DataFrame:
    """Position-bias (examination-propensity) estimation from a
    RANDOMIZED impression log — the result-randomization /
    RandTopN estimator of unbiased LTR (Joachims, Swaminathan &
    Schnabel WSDM'17 §5; Wang et al. WSDM'18 compare it against the
    EM route `pbm_click_model` implements): when documents are
    assigned to positions independently of relevance (an intervention
    — or this repo's mix-hash assignment, which IS position-random by
    construction), average CTR at position p factorizes as
    γ_p · E[rel], so the propensity RATIO needs no model at all:

        γ_p / γ_1 = CTR_p / CTR_1
                  = (clicks_p · imps_1) / (imps_p · clicks_1)

    — exact integer cross products with ONE division (engine-stable;
    NULL when position 1 recorded no clicks). -> one row per position:
    (pos, n_impressions, n_clicks, ctr, gamma_ratio), position-1 ratio
    exactly 1.0.

    Plan shape: one map-side-combined groupBy(pos) over the raw log +
    a broadcast one-row join for the anchor position. Complements the
    EM model as its assumption-free calibration check."""
    per = impressions.groupBy(
        F.col(pos_col).cast("long").alias("pos")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_impressions"),
        F.sum(F.col(click_col).cast("long")).cast("long").alias(
            "n_clicks"
        ),
    )
    anchor = per.filter(F.col("pos") == 1).select(
        F.col("n_impressions").alias("_i1"),
        F.col("n_clicks").alias("_c1"),
    )
    return per.crossJoin(F.broadcast(anchor)).select(
        "pos",
        "n_impressions",
        "n_clicks",
        F.round(F.col("n_clicks") / F.col("n_impressions"), 4).alias(
            "ctr"
        ),
        F.when(
            F.col("_c1") > 0,
            F.round(
                (F.col("n_clicks") * F.col("_i1"))
                / (F.col("n_impressions") * F.col("_c1")),
                4,
            ),
        ).alias("gamma_ratio"),
    )


def pbm_click_model(
    impressions: DataFrame,
    n_iter: int = 2,
    qid_col: str = "qid",
    doc_col: str = "doc_id",
    pos_col: str = "pos",
    click_col: str = "clicked",
) -> tuple:
    """Position-Based Model click debiasing via EM (Craswell et al.
    WSDM'08 propose PBM; Chuklin, Markov & de Rijke's "Click Models
    for Web Search" ch. 4 gives the EM updates). P(click) = γ_pos ·
    r_(q,d); both start at 0.5 and alternate:

      E-step (unclicked): P(E|C=0) = γ(1−r)/(1−γr),
                          P(R|C=0) = r(1−γ)/(1−γr);  clicked ⇒ both 1
      M-step: γ_pos = Σ n·P(E) / Σ n over impressions at pos,
              r_qd  = Σ n·P(R) / Σ n over impressions of (q,d)

    The input log is first collapsed to (pos, qid, doc, clicked) combos
    with integer counts — the EM statistics are identical and each
    iteration then joins/aggregates combo-sized data, not the raw log
    (at 100 TB the log collapses by the dedup factor of repeated
    impressions; the per-iteration shuffle keys are pos — tiny,
    broadcast — and (q,d) — the natural partition key). The combo
    relation and each iteration's γ/r are localCheckpoint'ed
    (GC-scoped) so the loop's plan stays linear instead of doubling
    per iteration. Returns ``(gamma_df, rel_df)``:
    gamma_df = (pos, n_impressions, n_clicks, gamma),
    rel_df = (qid, doc, n_impressions, n_clicks, rel)."""
    c = impressions.select(
        F.col(pos_col).cast("long").alias("pos"),
        F.col(qid_col).alias("qid"),
        F.col(doc_col).alias("doc"),
        F.col(click_col).cast("boolean").alias("clicked"),
    )
    combos = (
        c.groupBy("pos", "qid", "doc", "clicked")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    gamma = combos.select("pos").distinct().withColumn("g", F.lit(0.5))
    rel = (
        combos.select("qid", "doc").distinct().withColumn("r", F.lit(0.5))
    )
    for _ in range(int(n_iter)):
        denom = F.lit(1.0) - F.col("g") * F.col("r")
        j = (
            combos.join(F.broadcast(gamma), "pos")
            .join(rel, ["qid", "doc"])
            .withColumn(
                "_pe",
                F.when(F.col("clicked"), F.lit(1.0)).otherwise(
                    F.col("g") * (F.lit(1.0) - F.col("r")) / denom
                ),
            )
            .withColumn(
                "_pr",
                F.when(F.col("clicked"), F.lit(1.0)).otherwise(
                    F.col("r") * (F.lit(1.0) - F.col("g")) / denom
                ),
            )
        )
        gamma = (
            j.groupBy("pos")
            .agg(
                (
                    F.sum(F.col("n") * F.col("_pe")) / F.sum("n")
                ).alias("g")
            )
            .localCheckpoint(eager=False)
        )
        rel = (
            j.groupBy("qid", "doc")
            .agg(
                (
                    F.sum(F.col("n") * F.col("_pr")) / F.sum("n")
                ).alias("r")
            )
            .localCheckpoint(eager=False)
        )
    pos_counts = combos.groupBy("pos").agg(
        F.sum("n").cast("long").alias("n_impressions"),
        F.sum(F.when(F.col("clicked"), F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_clicks"),
    )
    qd_counts = combos.groupBy("qid", "doc").agg(
        F.sum("n").cast("long").alias("n_impressions"),
        F.sum(F.when(F.col("clicked"), F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_clicks"),
    )
    gamma_df = pos_counts.join(gamma, "pos").select(
        "pos", "n_impressions", "n_clicks", F.col("g").alias("gamma")
    )
    rel_df = qd_counts.join(rel, ["qid", "doc"]).select(
        "qid", "doc", "n_impressions", "n_clicks",
        F.col("r").alias("rel"),
    )
    return gamma_df, rel_df


def cascade_click_model(
    impressions: DataFrame,
    serp_col: str = "serp_id",
    doc_col: str = "doc_id",
    pos_col: str = "pos",
    click_col: str = "clicked",
) -> DataFrame:
    """Cascade click model (Craswell et al. WSDM'08 §2.4) — the
    closed-form counterpart of ``pbm_click_model``: the user scans a
    SERP top-down, clicks the first attractive result and stops, so a
    result is EXAMINED iff no higher-ranked result in the same SERP was
    clicked. The MLE needs no EM: attractiveness(d) = clicks(d) /
    examinations(d) over the per-SERP first-click geometry.

    Conventions (PyClick's CM training): only the FIRST click of a SERP
    is the cascade click (later clicks violate the model and are
    ignored); a clickless SERP examined every shown position.
    -> (doc_id, n_exam, n_clicks, attractiveness), integers + ONE
    division (engine-portable like the PBM gate's statistics).

    Plan shape: one per-SERP min-click-pos aggregate (map-side
    combined), joined back LEFT so clickless SERPs keep all rows, then
    one per-doc aggregate. The log is scanned once; shuffle keys are
    serp_id then doc_id — both natural partitions, no skew beyond the
    data's own hot docs."""
    c = impressions.select(
        F.col(serp_col).alias("serp_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(pos_col).cast("long").alias("pos"),
        F.col(click_col).cast("boolean").alias("clicked"),
    )
    first_click = (
        c.filter(F.col("clicked"))
        .groupBy("serp_id")
        .agg(F.min("pos").alias("_fc"))
    )
    examined = c.join(first_click, "serp_id", "left").filter(
        F.col("_fc").isNull() | (F.col("pos") <= F.col("_fc"))
    )
    return (
        examined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exam"),
            F.sum(
                F.when(
                    F.col("clicked") & (F.col("pos") == F.col("_fc")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_clicks"),
        )
        .select(
            "doc_id",
            "n_exam",
            "n_clicks",
            F.round(F.col("n_clicks") / F.col("n_exam"), 4).alias(
                "attractiveness"
            ),
        )
    )


def rbo_weights(k: int, p: float) -> list[float]:
    """Per-first-shared-depth RBO weights: a doc whose LATER rank
    across the two lists is m contributes Σ_{d=m..k} (1-p)·p^(d-1)/d
    to depth-k RBO. Computed once driver-side; the engine applies them
    as k literals, so both engines share the exact doubles."""
    return [
        sum((1 - p) * p ** (d - 1) / d for d in range(m, k + 1))
        for m in range(1, k + 1)
    ]


def rank_rbo(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
) -> DataFrame:
    """Rank-Biased Overlap at depth k (Webber, Moffat & Zobel
    TOIS'10's prefix partial sum — the RBO_MIN form, no extrapolation):

        RBO@k = (1-p) Σ_{d=1..k} p^(d-1) · |A_{1..d} ∩ B_{1..d}| / d

    computed per shared doc: with m = max(rank_A, rank_B), the doc is
    inside both prefixes for every depth d ≥ m, so its total weight is
    the closed per-m literal from ``rbo_weights`` — one equi-join on
    the two (queries × k) runs, one literal-array lookup, one groupBy;
    queries present in both runs but sharing nothing score 0.0.
    Top-weighted (p→0) ≈ rank-1 agreement; p→1 ≈ plain overlap — the
    graded companion to ``rank_correlation``'s Kendall tau (tau needs
    ≥2 shared docs and ignores depth)."""
    if not 0 < p < 1:
        raise ValueError("rank_rbo: p must be in (0, 1)")
    w = rbo_weights(k, p)
    w_arr = F.array(*[F.lit(x) for x in w])
    a = run_a.filter(F.col("rank") <= k).select(
        "qid", "doc_id", F.col("rank").alias("_ra")
    )
    b = run_b.filter(F.col("rank") <= k).select(
        "qid", "doc_id", F.col("rank").alias("_rb")
    )
    shared = a.join(b, ["qid", "doc_id"]).select(
        "qid",
        F.element_at(
            w_arr, F.greatest("_ra", "_rb").cast("int")
        ).alias("_w"),
    )
    qids = a.select("qid").distinct().join(
        b.select("qid").distinct(), "qid", "left_semi"
    )
    sums = shared.groupBy("qid").agg(F.sum("_w").alias("rbo"))
    return qids.join(sums, "qid", "left").select(
        "qid", F.coalesce(F.col("rbo"), F.lit(0.0)).alias("rbo")
    )


def interleave_team_draft(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    seed: int = 0,
) -> DataFrame:
    """Team-draft interleaving (Radlinski, Kurup & Joachims CIKM'08) —
    the standard online A/B ranking comparison: per query, repeated
    rounds where a coin decides which system drafts first, then each
    system appends its highest-ranked not-yet-picked doc; clicks on
    team-A docs are votes for A. The coin is DETERMINISTIC here:
    mix(qn * 2^20 + round + seed) & 1 with qn the query's integer id
    (functions/hashing.py mix — reproducible across engines and runs,
    exactly like the repo's samplers). -> (qid, pos, doc_id, team),
    pos 1-based, team in {'a','b'}, ≤ k rows per query.

    Plan shape: the interleave is inherently sequential PER QUERY, so
    it runs as applyInPandas over (qid) groups — each group is ≤ 2k
    rows (runs are queries × k, corpus-independent), the canonical
    "tiny sequential state per key" Spark shape. Queries must be
    present in both runs (inner semantics, as the method requires two
    rankings)."""
    from ..functions.hashing import MIX_A, MIX_B, MIX_P

    a = run_a.select(
        "qid", "doc_id", F.col("rank").alias("r")
    ).withColumn("_side", F.lit("a"))
    b = run_b.select(
        "qid", "doc_id", F.col("rank").alias("r")
    ).withColumn("_side", F.lit("b"))
    both = a.unionByName(b)
    qids = a.select("qid").distinct().join(
        b.select("qid").distinct(), "qid", "left_semi"
    )
    both = both.join(F.broadcast(qids), "qid", "left_semi")

    def draft(pdf):
        qid = pdf["qid"].iloc[0]
        digits = "".join(ch for ch in str(qid) if ch.isdigit())
        qn = int(digits) if digits else 0
        la = [
            int(d)
            for _, d in sorted(
                zip(pdf[pdf["_side"] == "a"]["r"],
                    pdf[pdf["_side"] == "a"]["doc_id"])
            )
        ]
        lb = [
            int(d)
            for _, d in sorted(
                zip(pdf[pdf["_side"] == "b"]["r"],
                    pdf[pdf["_side"] == "b"]["doc_id"])
            )
        ]
        picked: set[int] = set()
        out: list[tuple[str, int, int, str]] = []
        rnd = 0
        while len(out) < k:
            coin = (
                (MIX_A * ((qn * (1 << 20) + rnd + seed) % MIX_P) + MIX_B)
                % MIX_P
            ) & 1
            order = ("a", "b") if coin == 0 else ("b", "a")
            progressed = False
            for team in order:
                lst = la if team == "a" else lb
                nxt = next((d for d in lst if d not in picked), None)
                if nxt is None or len(out) >= k:
                    continue
                picked.add(nxt)
                out.append((qid, len(out) + 1, nxt, team))
                progressed = True
            if not progressed:
                break
            rnd += 1
        import pandas as pd

        return pd.DataFrame(
            out, columns=["qid", "pos", "doc_id", "team"]
        )

    return both.groupBy("qid").applyInPandas(
        draft, "qid string, pos long, doc_id long, team string"
    )


def interleave_credit(
    interleaved: DataFrame, clicks: DataFrame
) -> DataFrame:
    """Team-draft credit assignment (the second half of Radlinski,
    Kurup & Joachims CIKM'08): given an interleaved list
    (``interleave_team_draft`` output: qid, pos, doc_id, team) and a
    click log (qid, doc_id), count per query how many clicks landed on
    each team's contributions and call the per-query winner ->
    (qid, clicks_a, clicks_b, winner) with winner in {'a','b','tie'}.
    Every interleaved query yields a row (no clicks = 0/0 tie), so
    win rates aggregate directly. Duplicate click events count
    multiply (the standard per-impression credit; pre-distinct the log
    for per-doc credit).

    Plan shape: one equi-join of the interleaved list (queries × k
    rows) against the click log on (qid, doc_id) + one
    map-side-combined groupBy — both relations are run-sized, never
    corpus-sized."""
    hits = (
        interleaved.select("qid", "doc_id", "team")
        .join(clicks.select("qid", "doc_id"), ["qid", "doc_id"])
        .groupBy("qid")
        .agg(
            F.sum(F.when(F.col("team") == "a", 1).otherwise(0))
            .cast("long")
            .alias("clicks_a"),
            F.sum(F.when(F.col("team") == "b", 1).otherwise(0))
            .cast("long")
            .alias("clicks_b"),
        )
    )
    base = interleaved.select("qid").distinct()
    out = base.join(hits, "qid", "left").select(
        "qid",
        F.coalesce("clicks_a", F.lit(0)).cast("long").alias("clicks_a"),
        F.coalesce("clicks_b", F.lit(0)).cast("long").alias("clicks_b"),
    )
    return out.select(
        "qid",
        "clicks_a",
        "clicks_b",
        F.when(F.col("clicks_a") > F.col("clicks_b"), F.lit("a"))
        .when(F.col("clicks_b") > F.col("clicks_a"), F.lit("b"))
        .otherwise(F.lit("tie"))
        .alias("winner"),
    )


def sign_test(
    outcomes: DataFrame,
    winner_col: str = "winner",
    a_label: str = "a",
    b_label: str = "b",
) -> DataFrame:
    """Exact binomial sign test over per-query winners — the standard
    significance call on interleaving outcomes (Radlinski & Craswell's
    analysis of team-draft credit; also the classic paired sign test
    when metric deltas are reduced to win/loss): ties drop, and under
    H0 each non-tie query is a fair coin. -> ONE row (n_queries, n_a,
    n_b, n_tie, p_value) with the DOUBLED-TAIL two-sided convention
    p = min(1, 2·P(X <= min(n_a, n_b))), X ~ Binomial(n_a + n_b, 1/2);
    m = 0 (all ties) reports p = 1.

    Exactness: C(m, j)/2^m is a dyadic rational, and the fold computes
    C(m, j) as a quotient of two integer-valued double products —
    exact in IEEE while m! stays under 2^52 (m <= 17; the practical
    interleaving experiment sizes the gate exercises — document
    rounding applies beyond). The whole statistic is one global agg
    over a topics-sized relation + a one-row projection with nested
    HOF folds; nothing touches corpus-scale data."""
    w = F.col(winner_col)
    agg = outcomes.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(F.when(w == a_label, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(w == b_label, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(
            F.when((w != a_label) & (w != b_label), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_tie"),
    )
    # C(m, j) = prod_{i=1..j}(m - j + i) / j! — both products integer-
    # valued doubles; j = 0 guarded (Spark sequence(1, 0) DESCENDS)
    comb = (
        "CASE WHEN j = 0 THEN 1.0D ELSE "
        "aggregate(sequence(1, j), 1.0D,"
        " (accn, i) -> accn * (n_a + n_b - j + i)) / "
        "aggregate(sequence(1, j), 1.0D, (accd, i) -> accd * i) END"
    )
    p = F.expr(
        "CASE WHEN n_a + n_b = 0 THEN 1.0D ELSE least(1.0D, "
        "2.0D * aggregate(sequence(0, least(n_a, n_b)), 0.0D, "
        f"(acc, j) -> acc + ({comb}) / power(2.0D, n_a + n_b)) ) END"
    )
    return agg.select(
        "n_queries", "n_a", "n_b", "n_tie", p.alias("p_value")
    )


def mcnemar_test(
    pairs: DataFrame,
    correct_a_col: str = "correct_a",
    correct_b_col: str = "correct_b",
) -> DataFrame:
    """McNemar's paired test over per-item correctness of two
    classifiers (McNemar, Psychometrika 1947; THE recommended test for
    comparing two classifiers on one test set — Dietterich, Neural
    Computation 1998): only the DISCORDANT items carry signal — b =
    #(A right, B wrong), c = #(A wrong, B right) — and under H0 each
    discordant item is a fair coin. -> ONE row (n, n_both, n_neither,
    n_a_only, n_b_only, chi2_cc, p_value):

      chi2_cc = max(|b−c|−1, 0)² / (b+c)   (continuity-corrected;
                0 when b+c = 0 or |b−c| <= 1)
      p_value = exact binomial doubled tail, delegated to the
                `sign_test` machinery (McNemar's exact test IS the
                sign test over discordant pairs) — dyadic-exact for
                b+c <= 17, document rounding beyond (sign_test
                docstring). NULL when b+c > 100: past that the
                factorial products overflow double range (inf/inf →
                NaN silently clamped by least()) and the exact tail
                is the wrong tool anyway — read chi2_cc against
                χ²(1), the standard large-sample route.

    Exactness: the 2×2 cells are integer aggregates; chi2's numerator
    is an integer square and the statistic is ONE division, so both
    engines agree bit-for-bit. One global agg over an eval-set-sized
    relation; nothing touches corpus-scale data."""
    ca = F.col(correct_a_col)
    cb = F.col(correct_b_col)
    winners = pairs.select(
        F.when(ca & ~cb, F.lit("a"))
        .when(~ca & cb, F.lit("b"))
        .otherwise(F.lit("tie"))
        .alias("winner")
    )
    s = sign_test(winners).select(
        F.col("n_queries").alias("n"),
        F.col("n_a").alias("n_a_only"),
        F.col("n_b").alias("n_b_only"),
        "p_value",
    )
    cells = pairs.agg(
        F.sum(F.when(ca & cb, 1).otherwise(0))
        .cast("long")
        .alias("n_both"),
        F.sum(F.when(~ca & ~cb, 1).otherwise(0))
        .cast("long")
        .alias("n_neither"),
    )
    bc = F.col("n_a_only") + F.col("n_b_only")
    num = F.greatest(
        F.abs(F.col("n_a_only") - F.col("n_b_only")) - 1, F.lit(0)
    )
    return s.crossJoin(cells).select(
        "n",
        "n_both",
        "n_neither",
        "n_a_only",
        "n_b_only",
        F.when(bc == 0, F.lit(0.0))
        .otherwise(F.round((num * num) / bc, 4))
        .alias("chi2_cc"),
        F.when(bc > 100, F.lit(None).cast("double"))
        .otherwise(F.col("p_value"))
        .alias("p_value"),
    )


def ips_utility(
    run: DataFrame,
    clicks: DataFrame,
    gamma: DataFrame,
    weight: str = "dcg",
) -> DataFrame:
    """Counterfactual (offline) evaluation of a NEW ranking from a
    logged click stream — the inverse-propensity-scoring estimator of
    unbiased learning-to-rank (Joachims, Swaminathan & Schnabel
    WSDM'17): every logged click at presented position p counts
    λ(rank_new) / γ_p, so clicks that examination bias made unlikely
    (deep positions, small γ) are up-weighted and the estimate is
    unbiased under the position-based model. ``clicks`` carries the
    LOGGED (qid, doc_id, pos) click events; ``gamma`` the (pos, gamma)
    examination propensities (e.g. ``pbm_click_model``'s gamma_df);
    ``run`` the new ranking (qid, doc_id, rank). λ = 1/log2(rank+1)
    (``weight='dcg'``) or 1/rank (``'rr'``); clicked docs the new
    ranking does not retrieve contribute 0. -> (qid, n_clicks,
    ips_utility, snips_utility) per query — macro-average downstream
    as needed. ``snips_utility`` is the self-normalized estimator
    (Swaminathan & Joachims NeurIPS'15): the same weighted sum divided
    by the query's total importance mass Σ 1/γ, trading the tiny bias
    for much lower variance when propensities are small. log2 is
    spelled ln/ln 2 so oracles replay it bit-for-bit.

    Plan shape: one (qid, doc_id) equi-join of two run-sized
    relations + a broadcast join on pos (positions are a handful of
    values) + one map-side-combined groupBy. Corpus never touched."""
    if weight == "dcg":
        lam = F.lit(1.0) / (
            F.log(F.col("rank").cast("double") + 1.0) / math.log(2.0)
        )
    elif weight == "rr":
        lam = F.lit(1.0) / F.col("rank").cast("double")
    else:
        raise ValueError("ips_utility: weight must be 'dcg' or 'rr'")
    c = clicks.select("qid", "doc_id", F.col("pos").cast("long").alias("pos"))
    g = F.broadcast(
        gamma.select(
            F.col("pos").cast("long").alias("pos"),
            F.col("gamma").cast("double").alias("_g"),
        )
    )
    j = (
        c.join(g, "pos")
        .join(run.select("qid", "doc_id", "rank"), ["qid", "doc_id"], "left")
        .withColumn(
            "_u",
            F.when(F.col("rank").isNotNull(), lam / F.col("_g")).otherwise(
                F.lit(0.0)
            ),
        )
    )
    return j.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks"),
        F.sum("_u").alias("ips_utility"),
        (
            F.sum("_u") / F.sum(F.lit(1.0) / F.col("_g"))
        ).alias("snips_utility"),
    )


def pool_runs(runs: DataFrame, depth: int = 100) -> DataFrame:
    """TREC judging-pool construction (the standard workflow behind the
    reference's qrels files: union of every run's top-``depth`` hits per
    topic, deduplicated, with provenance): ``runs`` carries
    (run_id, qid, doc_id, rank) for any number of runs stacked
    vertically. -> (qid, doc_id, n_runs, best_rank) — how many runs
    retrieved the doc inside the pool depth and the best rank any run
    gave it. All-integer output, exact on any engine.

    Plan shape: one rank filter (pushes into each run's scan) + one
    map-side-combined (qid, doc_id) groupBy — pool size is bounded by
    runs × topics × depth regardless of corpus size."""
    return (
        runs.filter(F.col("rank") <= int(depth))
        .groupBy("qid", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_runs"),
            F.min("rank").cast("long").alias("best_rank"),
        )
    )


def rank_correlation(run_a: DataFrame, run_b: DataFrame) -> DataFrame:
    """Per-query Kendall tau between two runs over their SHARED
    retrieved documents (the standard run-similarity diagnostic when
    comparing system variants, e.g. the reference's baseline-vs-feedback
    runs): for each qid, over docs in both runs, tau = (C - D) /
    (n(n-1)/2) counting concordant/discordant rank pairs. Ranks are
    distinct integers (no ties), so tau is an exact rational — engine-
    portable. Queries with fewer than 2 shared docs are omitted.

    Plan shape: one (qid, doc_id) equi-join of two run-sized relations,
    then a per-qid pair self-join — bounded by k² per query, never
    corpus-sized — and a map-side-combined groupBy."""
    a = run_a.select("qid", "doc_id", F.col("rank").alias("rank_a"))
    b = run_b.select("qid", "doc_id", F.col("rank").alias("rank_b"))
    shared = a.join(b, ["qid", "doc_id"])
    l = shared.alias("l")
    r = shared.alias("r")
    pairs = l.join(
        r,
        (F.col("l.qid") == F.col("r.qid"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    ).select(
        F.col("l.qid").alias("qid"),
        (
            F.signum(F.col("l.rank_a") - F.col("r.rank_a"))
            * F.signum(F.col("l.rank_b") - F.col("r.rank_b"))
        ).alias("s"),
    )
    n_shared = shared.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    return (
        pairs.groupBy("qid")
        .agg(F.sum("s").alias("cd"))
        .join(n_shared, "qid")
        .filter(F.col("n_common") >= 2)
        .select(
            "qid",
            "n_common",
            F.round(
                F.col("cd")
                / (F.col("n_common") * (F.col("n_common") - 1) / 2.0),
                4,
            ).alias("tau"),
        )
    )


def spearman_rho(run_a: DataFrame, run_b: DataFrame) -> DataFrame:
    """Per-query Spearman rank correlation between two runs over their
    SHARED retrieved documents — the footrule-family companion to
    ``rank_correlation``'s Kendall tau (both are standard when
    comparing system variants; Spearman weights displacement
    quadratically where tau counts inversions): within each qid the
    shared docs are re-ranked 1..n per run by their original ranks
    (row_number — original ranks are distinct, so there are no ties
    and no tie-correction term), d_i = ra_i - rb_i, and
    rho = 1 - 6·Σd² / (n(n²-1)).

    Float discipline: Σd² and n(n²-1) are exact BIGINTs, so rho is
    ONE double division and one subtraction — bit-identical on any
    engine. Queries with fewer than 2 shared docs are omitted.

    Plan shape: one (qid, doc_id) equi-join of two run-sized
    relations, two per-qid rank windows (run-sized), one map-side-
    combined groupBy. No pair self-join — Spearman is O(n log n)
    where Kendall's pair count is O(n²)."""
    a = run_a.select("qid", "doc_id", F.col("rank").alias("_ra0"))
    b = run_b.select("qid", "doc_id", F.col("rank").alias("_rb0"))
    shared = a.join(b, ["qid", "doc_id"])
    wa = Window.partitionBy("qid").orderBy("_ra0")
    wb = Window.partitionBy("qid").orderBy("_rb0")
    dens = shared.select(
        "qid",
        F.row_number().over(wa).cast("long").alias("_ra"),
        F.row_number().over(wb).cast("long").alias("_rb"),
    )
    d = (F.col("_ra") - F.col("_rb"))
    return (
        dens.groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum(d * d).cast("long").alias("_sd2"),
        )
        .filter(F.col("n_common") >= 2)
        .select(
            "qid",
            "n_common",
            F.round(
                F.lit(1.0)
                - (F.lit(6.0) * F.col("_sd2"))
                / (
                    F.col("n_common")
                    * (F.col("n_common") * F.col("n_common") - 1)
                ).cast("double"),
                4,
            ).alias("rho"),
        )
    )


def tau_ap(
    run_ref: DataFrame, run_obs: DataFrame, max_k: int = 32
) -> DataFrame:
    """Per-query AP rank correlation tau_AP (Yilmaz, Aslam & Robertson,
    SIGIR'08 "A new rank correlation coefficient for information
    retrieval") — the TOP-WEIGHTED alternative to Kendall's tau
    (``rank_correlation``): swaps near rank 1 cost more than swaps deep
    in the list, mirroring how AP weights precision. Over the docs BOTH
    runs retrieve (ranks densified to 1..n per run within the shared
    set; the observed side truncated to its top ``max_k``), with rb the
    observed and ra the reference rank,
    C(i) = #{j : rb_j < rb_i and ra_j < ra_i} and
    tau_AP = (2/(n-1)) * sum_{i: rb_i>=2} C(i)/(rb_i - 1) - 1.

    Float discipline (the repo's scaled-BIGINT convention): the terms
    C/(i-1) are non-dyadic, so a naive double sum is fold-order
    sensitive. Every term is instead scaled by L = lcm(1..max_k-1):
    S = sum C_i * (L DIV (rb_i - 1)) is an exact BIGINT (each rb_i - 1
    divides L), and tau_AP = 2*S/(L*(n-1)) - 1 is ONE double division —
    bit-identical on any engine. max_k <= 32 keeps S <= 31*lcm(1..31)
    ~ 2.2e15 < 2^53, so even the final doubles are exact. Queries with
    fewer than 2 shared docs are omitted.

    Plan shape: one (qid, doc_id) equi-join of two run-sized relations,
    two per-qid rank windows, a per-qid pair self-join bounded by k^2
    per query (never corpus-sized), one map-side-combined groupBy."""
    if not 2 <= int(max_k) <= 32:
        raise ValueError("tau_ap: need 2 <= max_k <= 32 (int64 bound)")
    scale = math.lcm(*range(1, int(max_k)))
    a = run_ref.select("qid", "doc_id", F.col("rank").alias("_ra0"))
    b = run_obs.select("qid", "doc_id", F.col("rank").alias("_rb0"))
    shared = a.join(b, ["qid", "doc_id"])
    wb = Window.partitionBy("qid").orderBy("_rb0")
    kept = (
        shared.withColumn("rb", F.row_number().over(wb))
        .filter(F.col("rb") <= int(max_k))
    )
    wa = Window.partitionBy("qid").orderBy("_ra0")
    d = kept.select(
        "qid",
        "doc_id",
        F.row_number().over(wa).alias("ra"),
        F.col("rb"),
    )
    l, r = d.alias("l"), d.alias("r")
    # pair rows: r is the item at observed rank rb_i >= 2, l any item
    # ranked above it; every i has exactly rb_i - 1 pair rows, so the
    # qid groupBy below sees the full inner sum without a per-i pass
    pairs = l.join(
        r,
        (F.col("l.qid") == F.col("r.qid"))
        & (F.col("l.rb") < F.col("r.rb")),
    ).select(
        F.col("l.qid").alias("qid"),
        (
            F.when(F.col("l.ra") < F.col("r.ra"), F.lit(1)).otherwise(
                F.lit(0)
            )
            * F.expr(f"{scale} DIV (r.rb - 1)")
        ).alias("s"),
    )
    n_shared = d.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    return (
        pairs.groupBy("qid")
        .agg(F.sum("s").cast("long").alias("ssum"))
        .join(n_shared, "qid")
        .filter(F.col("n_common") >= 2)
        .select(
            "qid",
            "n_common",
            F.round(
                F.lit(2.0)
                * F.col("ssum")
                / (F.lit(float(scale)) * (F.col("n_common") - 1))
                - F.lit(1.0),
                4,
            ).alias("tau_ap"),
        )
    )


def risk_metric(
    per_query_a: DataFrame,
    per_query_b: DataFrame,
    metric_col: str = "ap",
    qid_col: str = "qid",
    alpha: float = 1.0,
    round_dp: int | None = None,
) -> DataFrame:
    """Risk-sensitive utility URisk (Wang, Bennett & Collins-Thompson
    SIGIR'12; the TREC Web track risk-sensitive task measure): with
    per-query deltas d = m_a - m_b against the baseline system b,
    URisk_alpha = (1/n)·(Σ_{d>0} d − (1+alpha)·Σ_{d<0} |d|) — losses
    against the baseline are penalized (1+alpha)×. Deltas stay RAW by
    default: identical runs give a bitwise-exact d = 0 on any engine,
    and differing runs give |d| ≫ ulp, so raw classification is
    cross-engine stable — whereas PRE-rounding deltas to a 1e-4 grid
    makes Σd/n land exactly on 4dp halfway points (a structural
    boundary the round-3 classifier gate hit with its n/1000 weight
    grid; observed here at sf0.001). Pass ``round_dp`` only when the
    inputs themselves are noisy. -> one row (n, n_wins, n_losses,
    urisk); topics-sized scalar reduction."""
    a = per_query_a.select(
        F.col(qid_col).alias("qid"), F.col(metric_col).alias("_ma")
    )
    b = per_query_b.select(
        F.col(qid_col).alias("qid"), F.col(metric_col).alias("_mb")
    )
    delta = F.col("_ma") - F.col("_mb")
    if round_dp is not None:
        delta = F.round(delta, round_dp)
    d = a.join(b, "qid").select(delta.alias("d"))
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("d") > 0).cast("long")).alias("n_wins"),
        F.sum((F.col("d") < 0).cast("long")).alias("n_losses"),
        (
            (
                F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(0.0))
                - F.lit(1.0 + alpha)
                * F.sum(
                    F.when(F.col("d") < 0, -F.col("d")).otherwise(0.0)
                )
            )
            / F.count(F.lit(1))
        ).alias("urisk"),
    )


def bootstrap_ci(
    per_query: DataFrame,
    metric_col: str = "ap",
    qid_col: str = "qid",
    n_boot: int = 200,
    seed: int = 0,
    ci: float = 0.95,
) -> DataFrame:
    """DETERMINISTIC bootstrap confidence interval for a macro metric
    (the bootstrap family Sakai SIGIR'06 recommends for IR
    significance): ``n_boot`` resamples-with-replacement of the topic
    set, each draw picked by the engine-portable mix hash — no RNG
    state, replayable in plain SQL, identical on any cluster size.
    Draw i (0 ≤ i < n_boot·n) selects topic index
    ``pmod(mix(seed + i), n)`` for resample ``i DIV n``; the CI is the
    (1±ci)/2 linear-interpolation quantiles of the resampled means.
    -> one row (n, n_boot, mean, ci_lo, ci_hi).

    The topic count is a driver-side count (topics-sized metadata);
    the draw table is n_boot·n rows — trivially small next to any run.
    """
    from ..functions.hashing import mix_id_expr

    vals = per_query.select(
        F.col(qid_col).alias("qid"), F.col(metric_col).alias("m")
    )
    n = vals.count()
    if n == 0:
        raise ValueError("bootstrap_ci: empty per-query table")
    idxd = vals.withColumn(
        "idx",
        F.row_number().over(Window.orderBy("qid")).cast("long") - 1,
    ).select("idx", "m")
    spark = per_query.sparkSession
    draws = spark.range(int(n_boot) * n).select(
        F.expr(f"id DIV {n}").alias("bid"),
        F.pmod(
            mix_id_expr(F.col("id") + F.lit(int(seed))), F.lit(n)
        ).alias("idx"),
    )
    means = (
        draws.join(F.broadcast(idxd), "idx")
        .groupBy("bid")
        .agg(F.avg("m").alias("mean_b"))
    )
    alpha = (1.0 - ci) / 2.0
    overall = idxd.agg(F.avg("m").alias("mean"))
    return (
        means.agg(
            F.percentile(F.col("mean_b"), F.lit(alpha)).alias("ci_lo"),
            F.percentile(F.col("mean_b"), F.lit(1.0 - alpha)).alias(
                "ci_hi"
            ),
        )
        .crossJoin(overall)
        .select(
            F.lit(n).cast("long").alias("n"),
            F.lit(int(n_boot)).cast("long").alias("n_boot"),
            "mean", "ci_lo", "ci_hi",
        )
    )


def bootstrap_paired_test(
    per_a: DataFrame,
    per_b: DataFrame,
    metric_col: str = "ap",
    qid_col: str = "qid",
    n_boot: int = 200,
    seed: int = 0,
    scale: int = 10000,
) -> DataFrame:
    """Deterministic PAIRED bootstrap significance test for run A vs
    run B (the resampling complement to paired_ttest / wilcoxon):
    resample the per-topic metric DELTAS with replacement using the
    same engine-portable mix-hash draw stream as ``bootstrap_ci`` and
    report how often a resampled total is <= 0 —
    ``p_le0 = (#{b : S*_b <= 0} + 1) / (n_boot + 1)`` (the add-one
    conservative estimator, Davison & Hinkley 1997). Small p = the
    improvement survives topic resampling.

    Float discipline: deltas are rounded to the 1/scale grid and kept
    as SCALED INTEGERS, so every resample statistic is a BIGINT sum —
    fold-order-exact, no engine can disagree on the S*_b <= 0
    comparison (the same pre-rounding the wilcoxon gate applies
    before ranking). -> one row (n, n_boot, sum_obs, n_le0, p_le0).
    """
    from ..functions.hashing import mix_id_expr

    a = per_a.select(F.col(qid_col).alias("qid"),
                     F.col(metric_col).alias("ma"))
    b = per_b.select(F.col(qid_col).alias("qid"),
                     F.col(metric_col).alias("mb"))
    d = a.join(b, "qid").select(
        "qid",
        F.round((F.col("ma") - F.col("mb")) * scale, 0).cast("long")
        .alias("ds"),
    )
    n = d.count()
    if n == 0:
        raise ValueError("bootstrap_paired_test: no common topics")
    idxd = d.withColumn(
        "idx", F.row_number().over(Window.orderBy("qid")).cast("long") - 1
    ).select("idx", "ds")
    spark = per_a.sparkSession
    draws = spark.range(int(n_boot) * n).select(
        F.expr(f"id DIV {n}").alias("bid"),
        F.pmod(
            mix_id_expr(F.col("id") + F.lit(int(seed))), F.lit(n)
        ).alias("idx"),
    )
    sums = (
        draws.join(F.broadcast(idxd), "idx")
        .groupBy("bid")
        .agg(F.sum("ds").cast("long").alias("s"))
    )
    obs = idxd.agg(F.sum("ds").cast("long").alias("sum_obs"))
    return (
        sums.agg(
            F.sum((F.col("s") <= 0).cast("long")).alias("n_le0")
        )
        .crossJoin(obs)
        .select(
            F.lit(n).cast("long").alias("n"),
            F.lit(int(n_boot)).cast("long").alias("n_boot"),
            "sum_obs",
            "n_le0",
            (
                (F.col("n_le0") + 1).cast("double")
                / F.lit(float(n_boot + 1))
            ).alias("p_le0"),
        )
    )


def permutation_test(
    per_a: DataFrame,
    per_b: DataFrame,
    metric_col: str = "ap",
    qid_col: str = "qid",
    n_perm: int = 200,
    seed: int = 0,
    scale: int = 10000,
) -> DataFrame:
    """Deterministic Fisher RANDOMIZATION test for run A vs run B
    (Smucker, Allan & Carterette CIKM'07 — the recommended paired
    significance test for IR): under H0 the per-topic assignment of
    the two systems is exchangeable, so each permutation flips the
    SIGN of every topic's delta independently; the two-sided p-value
    counts permutations whose |sum of signed deltas| >= |observed| —
    ``p_two = (#{p : |S*_p| >= |S_obs|} + 1) / (n_perm + 1)`` (add-one
    conservative estimator, same convention as bootstrap_paired_test).

    Determinism: sign for (permutation p, topic j) is the parity of
    the engine-portable mix hash of the flat draw index p*n + j + seed
    (no RNG state, replayable in SQL). Deltas are rounded to the
    1/scale grid and kept as SCALED INTEGERS so every permutation
    statistic is a BIGINT sum — fold-order-exact, the |S*| >= |S_obs|
    comparison cannot disagree across engines.
    -> one row (n, n_perm, sum_obs, n_ge, p_two).
    """
    from ..functions.hashing import mix_id_expr

    a = per_a.select(F.col(qid_col).alias("qid"),
                     F.col(metric_col).alias("ma"))
    b = per_b.select(F.col(qid_col).alias("qid"),
                     F.col(metric_col).alias("mb"))
    d = a.join(b, "qid").select(
        "qid",
        F.round((F.col("ma") - F.col("mb")) * scale, 0).cast("long")
        .alias("ds"),
    )
    n = d.count()
    if n == 0:
        raise ValueError("permutation_test: no common topics")
    idxd = d.withColumn(
        "idx", F.row_number().over(Window.orderBy("qid")).cast("long") - 1
    ).select("idx", "ds")
    spark = per_a.sparkSession
    # each permutation visits every topic exactly once (idx = id % n);
    # the mix parity of the FLAT index supplies the sign flip
    draws = spark.range(int(n_perm) * n).select(
        F.expr(f"id DIV {n}").alias("pid"),
        F.pmod(F.col("id"), F.lit(n)).alias("idx"),
        F.when(
            F.pmod(
                mix_id_expr(F.col("id") + F.lit(int(seed))), F.lit(2)
            ) == 0,
            F.lit(1),
        ).otherwise(F.lit(-1)).cast("long").alias("sgn"),
    )
    sums = (
        draws.join(F.broadcast(idxd), "idx")
        .groupBy("pid")
        .agg(F.sum(F.col("sgn") * F.col("ds")).cast("long").alias("s"))
    )
    obs = idxd.agg(F.sum("ds").cast("long").alias("sum_obs"))
    return (
        sums.crossJoin(obs)
        .agg(
            F.sum(
                (F.abs(F.col("s")) >= F.abs(F.col("sum_obs")))
                .cast("long")
            ).alias("n_ge"),
            F.first("sum_obs").alias("sum_obs"),
        )
        .select(
            F.lit(n).cast("long").alias("n"),
            F.lit(int(n_perm)).cast("long").alias("n_perm"),
            "sum_obs",
            "n_ge",
            (
                (F.col("n_ge") + 1).cast("double")
                / F.lit(float(n_perm + 1))
            ).alias("p_two"),
        )
    )


def q_measure(
    run: DataFrame,
    qrels: DataFrame,
    beta: float = 1.0,
    rel_threshold: float = 1.0,
) -> DataFrame:
    """Sakai's Q-measure (Sakai, SIGIR'04 / NTCIR) per query — the
    graded-relevance cousin of AP that stays discriminative deep in
    the ranking: at each rank r holding a relevant document, the
    blended ratio

        BR(r) = (C(r) + beta*cg(r)) / (r + beta*cig(r))

    where C(r) = relevant retrieved up to r, cg(r) = cumulative gain,
    cig(r) = cumulative IDEAL gain (capped at the total gain once the
    ideal list is exhausted); Q = (1/R) * sum of BR over relevant
    ranks. With binary gains Q-measure = 2C(r)/(r + min(r, R))
    averaged — close to AP but length-aware. beta=1 is the standard
    setting.

    Determinism: every cumulative quantity is a window running sum in
    an explicit total order (rank; ideal = gain DESC, docid ASC), so
    the float fold order is identical cross-engine.
    -> (qid, num_rel, q_measure).

    Scale: two hit/qrels-sized window passes and one broadcastable
    per-qid totals join — no global sort, no driver loop."""
    rel = qrels.filter(F.col("rel") >= F.lit(float(rel_threshold))).select(
        "qid", "docid", F.col("rel").alias("gain")
    )
    wi = Window.partitionBy("qid").orderBy(
        F.col("gain").desc(), F.col("docid").asc()
    )
    ideal = rel.select(
        "qid",
        F.row_number().over(wi).cast("long").alias("irank"),
        F.sum("gain")
        .over(wi.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cig"),
    )
    totals = rel.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("num_rel"),
        F.sum("gain").alias("total_gain"),
    )
    wr = Window.partitionBy("qid").orderBy("rank")
    cum = Window.partitionBy("qid").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    j = (
        run.select("qid", "docid", "rank")
        .join(rel, ["qid", "docid"], "left")
        .withColumn(
            "c_r",
            F.sum(F.col("gain").isNotNull().cast("long")).over(cum),
        )
        .withColumn("cg", F.sum(F.coalesce("gain", F.lit(0.0))).over(cum))
    )
    j = (
        j.join(
            ideal.select(
                "qid", F.col("irank").alias("rank"), F.col("cig")
            ),
            ["qid", "rank"],
            "left",
        )
        .join(totals, "qid")
        .withColumn("cig_r", F.coalesce("cig", "total_gain"))
    )
    br = (
        (F.col("c_r") + F.lit(float(beta)) * F.col("cg"))
        / (F.col("rank") + F.lit(float(beta)) * F.col("cig_r"))
    )
    return (
        j.groupBy("qid", "num_rel")
        .agg(
            (
                F.sum(F.when(F.col("gain").isNotNull(), br).otherwise(0.0))
                / F.col("num_rel")
            ).alias("q_measure")
        )
        .select("qid", "num_rel", "q_measure")
    )
