"""Similarity search over an embedding column (array<float>).

Two paths:
- ``cosine_topk``: exact brute-force — query set broadcast against the
  corpus, dot products via JVM-side higher-order functions (zip_with +
  aggregate, no Python), per-query top-k window. The correctness
  baseline; O(|queries| × |corpus|) but embarrassingly parallel and
  shuffle-free until the final per-query k-merge.
- ``lsh_cosine_topk``: random-hyperplane LSH — sign-bit bucket key from
  a fixed seeded plane matrix; candidates = same-bucket (multi-probe:
  optionally same bucket in any of several independent tables); exact
  cosine re-rank inside buckets. The 100 TB path: the corpus join
  becomes an equi-join on bucket keys.

Norms are precomputed per row so the scan projects (id, vec, norm) once.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# bucket-geometry defaults for the hyperplane-LSH operators. 2^n_planes
# is the bucket count per table, so a FIXED n_planes is a sandbox
# constant: 8 planes = 256 buckets means ~4M vectors/bucket at 10^9
# rows — near-quadratic self-joins without any degenerate data. Derive
# the plane count from the corpus size instead (see derive_n_planes),
# the same auto-derivation idea as wand.derive_num_salt_shards.
DEFAULT_TARGET_BUCKET_SIZE = 1024
MIN_PLANES = 8
MAX_PLANES = 30  # 2^30 buckets; bucket keys stay well inside int64
DEFAULT_MAX_BUCKET_SIZE = 100_000


def derive_n_planes(
    corpus_count: int,
    target_bucket_size: int = DEFAULT_TARGET_BUCKET_SIZE,
    min_planes: int = MIN_PLANES,
    max_planes: int = MAX_PLANES,
) -> int:
    """Size the hyperplane count from the corpus: the smallest n with
    expected occupancy corpus_count / 2^n <= target_bucket_size, clamped
    to [min_planes, max_planes]. 10^6 vectors at the 1024 target -> 10
    planes; 10^9 -> 20. More planes = smaller buckets = cheaper bucket
    self-joins but lower per-table recall — callers wanting recall back
    raise n_tables (recall = 1 - (1-p)^tables) rather than shrinking
    planes."""
    if corpus_count <= 0:
        return min_planes
    need = math.ceil(
        math.log2(max(1.0, corpus_count / float(target_bucket_size)))
    )
    return max(min_planes, min(max_planes, need))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "norm"
) -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn("_vd", v).withColumn(
        out_col, F.sqrt(_dot(F.col("_vd"), F.col("_vd")))
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the 4× memory/IO cut a
    100 TB embedding store takes before ANN (FAISS SQ8 / the standard
    int8 rescale): scale = max|x| / 127, q_i = round(x_i / scale) ∈
    [-127, 127]; the dequantized vector is q_i·scale. Per-vector
    scales keep outlier dimensions from crushing the rest. Zero
    vectors quantize with scale 1/127 (all-zero q). Pure codegen
    projections, zero shuffle. -> (vec_id, qvec array<long>,
    scale double)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ma = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = (
        F.when(ma == 0.0, F.lit(1.0)).otherwise(ma) / F.lit(127.0)
    )
    out = df.select(
        F.col(id_col).alias("vec_id"), v.alias("_v"), scale.alias("scale")
    )
    return out.select(
        "vec_id",
        F.transform(
            "_v", lambda x: F.round(x / F.col("scale")).cast("long")
        ).alias("qvec"),
        "scale",
    )


def kmeans_step_quantized(
    qcorpus: DataFrame,
    n_centroids: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    q_col: str = "qvec",
) -> DataFrame:
    """One EXACT Lloyd/k-means iteration over int8-quantized codes —
    the oracle-able counterpart of ``train_ivf_centroids`` (whose
    float Lloyd loop is explicitly NOT SQL-replayable): on integer
    codes the distances, argmin assignments and centroid sums are all
    int64 arithmetic — bit-reproducible on any engine and immune to
    fold order — and the per-dim mean is the single division. This is
    the IVF training step a quantized pipeline can run with a full
    audit trail. Seeds = the codes of the ``n_centroids`` LOWEST ids
    (collected driver-side: K×dim literals, the same budget as the
    IVF searcher's literal centroids). Ties go to the lower centroid
    id (strict-less argmin).
    -> (cid, dim, n_assigned, mean_code) — K×dim rows.

    Plan shape: one corpus scan with a generated K×dim-term integer
    expression (codegen — no HOFs, no UDF), a LITERAL dim-sequence
    explode over the materialized code column, one map-side-combined
    (cid, dim) groupBy."""
    if n_centroids <= 0 or dim <= 0:
        raise ValueError("kmeans_step_quantized: bad n_centroids/dim")
    seed_rows = (
        qcorpus.select(F.col(id_col).alias("_id"), F.col(q_col))
        .orderBy("_id")
        .limit(int(n_centroids))
        .collect()
    )
    if len(seed_rows) < n_centroids:
        raise ValueError("kmeans_step_quantized: fewer vectors than K")
    seeds = [list(r[q_col]) for r in seed_rows]

    def d2(seed):
        total = None
        for i, s in enumerate(seed[: int(dim)]):
            diff = F.element_at(F.col(q_col), i + 1) - F.lit(int(s))
            term = diff * diff
            total = term if total is None else total + term
        return total

    # Materialize the K distances as named columns in a FIRST projection,
    # then argmin over attribute references in a SECOND select. The naive
    # nested F.when chain embeds the full prior best_d tree (itself
    # containing every earlier dim-term d2 sum) twice per iteration, so
    # the expression tree grows ~2^K·dim — janino rejects the generated
    # method and Spark silently falls back to INTERPRETED evaluation.
    # Two projections keep every d2 computed exactly once and the argmin
    # linear in K; CollapseProject leaves them separate because each _dk
    # is a non-cheap expression referenced more than once above.
    dists = qcorpus.select(
        F.col(q_col).alias("_q"),
        *[d2(seeds[k]).alias(f"_d{k}") for k in range(int(n_centroids))],
    )
    dcols = [F.col(f"_d{k}") for k in range(int(n_centroids))]
    best_d = F.least(*dcols) if len(dcols) > 1 else dcols[0]
    # first (lowest) cid attaining the minimum == strict-less argmin
    expr = None
    for k in range(int(n_centroids)):
        cond = dcols[k] == best_d
        expr = (
            F.when(cond, F.lit(k))
            if expr is None
            else expr.when(cond, F.lit(k))
        )
    assigned = dists.select(
        F.col("_q"), expr.cast("long").alias("cid")
    )
    i = F.explode(
        F.sequence(F.lit(1), F.lit(int(dim)))
    ).alias("dim")
    flat = assigned.select("cid", "_q", i).select(
        "cid",
        "dim",
        F.element_at("_q", F.col("dim")).cast("long").alias("_code"),
    )
    return (
        flat.groupBy("cid", F.col("dim").cast("long").alias("dim"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assigned"),
            F.round(F.sum("_code") / F.count(F.lit(1)), 4).alias(
                "mean_code"
            ),
        )
    )


def cluster_quality_quantized(
    qcorpus: DataFrame,
    n_centroids: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    q_col: str = "qvec",
) -> DataFrame:
    """Integer-exact cluster-quality diagnostics for the quantized
    Lloyd assignment (``kmeans_step_quantized``'s audit companion —
    a silhouette-LITE over centroid distances, Kaufman & Rousseeuw's
    a/b intuition without the all-pairs cost): per vector, a = d² to
    the OWN (argmin) centroid and b = d² to the best OTHER centroid;
    per cluster report exact-integer averages of both and how many
    members are strictly separated (b > a).
    -> (cid, n, avg_own_d2, avg_other_d2, n_separated) — integer sums,
    one division each; no float folds anywhere.

    Same seed rule as the Lloyd step (lowest-id codes as literals),
    same single-scan codegen plan, one map-side-combined groupBy."""
    if n_centroids < 2 or dim <= 0:
        raise ValueError(
            "cluster_quality_quantized: need n_centroids >= 2"
        )
    seed_rows = (
        qcorpus.select(F.col(id_col).alias("_id"), F.col(q_col))
        .orderBy("_id")
        .limit(int(n_centroids))
        .collect()
    )
    if len(seed_rows) < n_centroids:
        raise ValueError(
            "cluster_quality_quantized: fewer vectors than K"
        )
    seeds = [list(r[q_col]) for r in seed_rows]

    def d2(seed):
        total = None
        for i, s in enumerate(seed[: int(dim)]):
            diff = F.element_at(F.col(q_col), i + 1) - F.lit(int(s))
            term = diff * diff
            total = term if total is None else total + term
        return total

    # Materialize the K distances once in a FIRST projection, then do
    # the best / second-best tracking over attribute references in a
    # SECOND select (same codegen-blowup fix as kmeans_step_quantized:
    # the naive rolling-when form duplicates the full prior best_d tree
    # per iteration, ~2^K·dim terms, janino fails and Spark falls back
    # to interpreted evaluation). Semantics are unchanged: best = the
    # LOWEST cid attaining the minimum d2 (strict-less argmin), second
    # = the minimum d2 over every OTHER centroid (ties at the minimum
    # make second == best_d, exactly as the rolling form did).
    dists = qcorpus.select(
        *[d2(seeds[k]).alias(f"_d{k}") for k in range(int(n_centroids))]
    )
    dcols = [F.col(f"_d{k}") for k in range(int(n_centroids))]
    best_d = F.least(*dcols)
    best_c = None
    for k in range(int(n_centroids)):
        cond = dcols[k] == best_d
        best_c = (
            F.when(cond, F.lit(k))
            if best_c is None
            else best_c.when(cond, F.lit(k))
        )
    # least() skips NULLs, so NULL-ing out the owner column yields the
    # minimum over the remaining K-1 centroids
    second_d = F.least(
        *[
            F.when(best_c == F.lit(k), F.lit(None)).otherwise(dcols[k])
            for k in range(int(n_centroids))
        ]
    )
    per = dists.select(
        best_c.cast("long").alias("cid"),
        best_d.cast("long").alias("_a"),
        second_d.cast("long").alias("_b"),
    )
    return per.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("_a") / F.count(F.lit(1)), 4).alias("avg_own_d2"),
        F.round(F.sum("_b") / F.count(F.lit(1)), 4).alias(
            "avg_other_d2"
        ),
        F.sum(
            F.when(F.col("_b") > F.col("_a"), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("n_separated"),
    )


def dequantize_col(qvec, scale):
    """qvec·scale -> array<double> (the approximate vector)."""
    return F.transform(qvec, lambda x: x * scale)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, rank, cosine).
    ``queries``: (query_id, embedding). Query side is broadcast; ties
    break cosine desc then vec_id asc. Self-matches (same id) are NOT
    excluded — filter upstream if undesired."""
    c = with_norm(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col)),
        vec_col,
    ).select("vec_id", F.col("_vd").alias("cv"), F.col("norm").alias("cn"))
    q = with_norm(
        queries.select(F.col("query_id"), F.col(vec_col)), vec_col
    ).select("query_id", F.col("_vd").alias("qv"), F.col("norm").alias("qn"))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine")
    )


def jl_project(
    corpus: DataFrame,
    dim_in: int,
    dim_out: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with a DETERMINISTIC
    Rademacher (±1) matrix (Achlioptas JCSS'03 showed ±1 entries give
    the JL guarantee; the sketch every embedding pipeline runs before
    LSH/clustering when 64-1536 dims are 8x more than the distance
    structure needs): y_j = (1/sqrt(dim_out)) * Σ_i x_i · s_ij with
    s_ij = +1 iff mix(i·dim_out + j + seed) is odd — the portable mix
    hash IS the random matrix, so any engine reproduces the projection
    bit-for-bit and nothing is stored.

    Float discipline: each output is an EXPLICIT left-associated
    element_at sum (generated, never a HOF fold — zip_with/aggregate
    are CodegenFallback AND their NamedLambdaVariable ids defeat plan
    reuse), so the fold order is pinned and identical in the SQL
    replay. -> (vec_id, y0..y{dim_out-1}).

    Scale shape: pure scan-local projection — zero shuffle, zero UDF;
    the generated expression is dim_in·dim_out terms (512 at 64->8),
    well inside codegen limits; for 1536->64 switch to the Arrow
    kernel path (a pandas_udf matmul) — same semantics, documented
    here so the choice is explicit."""
    from ..functions.hashing import MIX_A, MIX_B, MIX_P

    if dim_out <= 0 or dim_in <= 0:
        raise ValueError("jl_project: dims must be positive")
    inv = 1.0 / math.sqrt(float(dim_out))
    cols = [F.col(id_col).alias("vec_id")]
    for j in range(int(dim_out)):
        total = None
        for i in range(int(dim_in)):
            sign = (
                1
                if (MIX_A * ((i * dim_out + j + seed) % MIX_P) + MIX_B)
                % MIX_P
                % 2
                == 1
                else -1
            )
            term = F.element_at(F.col(vec_col), i + 1).cast("double")
            term = term if sign > 0 else -term
            total = term if total is None else total + term
        cols.append((total * F.lit(inv)).alias(f"y{j}"))
    return corpus.select(*cols)


def mutual_nn_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mutual nearest-neighbor pairs: (a, b, cosine) with a < b where
    each vector is the other's EXACT cosine top-1 (self excluded, ties
    to the smaller id). Mutual NN is the reciprocal-rank filter bitext
    mining is built on (Artetxe & Schwenk TACL'19 margin-score mutual
    candidates) and the high-precision end of embedding dedup — a
    one-directional NN pair is often asymmetric hubness noise; a
    mutual one rarely is.

    Both directions of a pair compute the SAME double (zip_with
    multiplies elementwise before the ordered fold, so dot(a,b) ==
    dot(b,a) bitwise) — the reported cosine is the a->b row's.

    Scale shape: this is the brute-force verification path (broadcast
    one side, like ``cosine_topk``); at corpus scale feed the NN step
    from LSH/IVF candidates instead and keep only the mutual filter.
    The NN relation is localCheckpoint'ed (GC-scoped) before the
    mutual self-join — the HOF lambdas in the dot product defeat plan
    dedup canonicalization otherwise and the whole scoring subtree
    runs once per join side (the CLAUDE.md exprId pathology)."""
    c = with_norm(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col)),
        vec_col,
    ).select(
        "vec_id", F.col("_vd").alias("v"), F.col("norm").alias("n")
    )
    q = c.select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("n").alias("qn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "cosine",
            _dot(F.col("v"), F.col("qv")) / (F.col("n") * F.col("qn")),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    nn = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("qid", F.col("vec_id").alias("tid"), "cosine")
        .localCheckpoint(eager=False)
    )
    l, r = nn.alias("l"), nn.alias("r")
    return l.join(
        r,
        (F.col("l.tid") == F.col("r.qid"))
        & (F.col("r.tid") == F.col("l.qid"))
        & (F.col("l.qid") < F.col("l.tid")),
    ).select(
        F.col("l.qid").alias("a"),
        F.col("l.tid").alias("b"),
        F.col("l.cosine").alias("cosine"),
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cosine) for all
    pairs with cosine >= threshold, a < b.

    Brute-force all-pairs via a block-nested join (each side bucketed
    into ``block_size`` ranges so one task compares two bounded blocks,
    never the whole matrix). This is the small-n / verification path:
    total work is O(n^2) regardless of blocking. The DEFAULT entry point
    for corpus-scale near-dup detection is ``lsh_near_dup_pairs`` —
    hyperplane-bucket candidates + exact-cosine verify, sub-quadratic."""
    c = with_norm(
        corpus.select(F.col(id_col).alias("vid"), F.col(vec_col)), vec_col
    ).select("vid", F.col("_vd").alias("v"), F.col("norm").alias("n"))
    c = c.withColumn("blk", (F.col("vid") / block_size).cast("long"))
    a = c.select(
        F.col("vid").alias("a"), F.col("v").alias("va"),
        F.col("n").alias("na"), F.col("blk").alias("blk_a"),
    )
    b = c.select(
        F.col("vid").alias("b"), F.col("v").alias("vb"),
        F.col("n").alias("nb"), F.col("blk").alias("blk_b"),
    )
    pairs = a.join(b, F.col("blk_a") <= F.col("blk_b")).filter(
        F.col("a") < F.col("b")
    )
    return (
        pairs.withColumn(
            "cosine",
            _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def lsh_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    log=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at corpus scale:
    (a, b, cosine) with cosine >= threshold, a < b.

    Candidates = pairs sharing a random-hyperplane sign bucket in ANY of
    ``n_tables`` independent tables (one alias self-join on the
    (table, bucket) key — work is sum of squared bucket sizes, not
    corpus^2); each pair is considered exactly once, in its FIRST
    colliding table (a conjunction of element_at bucket comparisons —
    no union + DISTINCT shuffle), and every candidate is VERIFIED with
    the exact cosine computed inline in the joined row (an explicit
    element_at sum with the same fold order as zip_with/aggregate, but
    codegen-able), so reported values are exact. A true pair is missed
    only if its vectors disagree on >= 1 of ``n_planes`` sign bits in
    EVERY table; for cosine >= threshold the per-table agreement
    probability is (1 - arccos(threshold)/pi)^n_planes, so recall =
    1 - (1 - p)^n_tables (>= 99 % at the 0.95/8/4 setting). Buckets are
    deterministic (seeded plane literals), so a SQL oracle can replay
    candidate generation exactly. ``log``: optional callable reporting
    the candidate-pair count (the sub-quadratic evidence). Passing
    ``log`` switches to diagnostics mode: the keyed bucket relation and
    the candidate rows are each materialized ONCE via GC-scoped local
    checkpoints (dropped automatically when the result DataFrame goes
    away) so the evidence counts and the verify share scans; without
    ``log`` the operator is a single lazy plan whose only non-lazy step
    is the derive count when ``n_planes=None``.

    ``n_planes=None`` (default) derives the plane count from the corpus
    size via ``derive_n_planes`` (one scalar count() action) so bucket
    occupancy tracks the corpus instead of a fixed 2^8 = 256 buckets;
    pin an explicit value for oracle replay. ``max_bucket_size`` (ON by
    default) drops oversized hyperplane buckets — a large
    exact-duplicate vector class lands its whole membership in one
    bucket per table, turning that bucket's self-join quadratic — from
    CANDIDATE generation: a pair whose FIRST colliding table bucket is
    oversized is dropped (a degenerate class shares every table's
    bucket, so its first table is always the dropped one), with the
    drop count reported via ``log``; compose with exact dedup upstream
    when such classes are expected.

    Use ``cosine_near_dup_pairs`` (brute force) only for small corpora
    or as a recall check."""
    c = with_norm(
        corpus.select(F.col(id_col).alias("vid"), F.col(vec_col)), vec_col
    ).select("vid", F.col("_vd").alias("v"), F.col("norm").alias("n"))
    if n_planes is None:
        n_planes = derive_n_planes(c.count())
        if log is not None:
            log(f"lsh_near_dup_pairs: derived n_planes={n_planes}")
    tables = [_planes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    # all tables' bucket keys in one per-row array; the table index is
    # exploded from a LITERAL array (a Generate over the computed array
    # would re-evaluate the n_tables * n_planes interpreted plane dots
    # per output row), and the ONE shuffle on (tbl, bucket) both
    # co-partitions the self-join and shares the bucket projection
    # between the cap window and both join sides
    bkts_arr = F.array(*[_bucket_expr("v", p) for p in tables])
    keyed = (
        c.select("vid", "v", "n", bkts_arr.alias("_bkts"))
        .select(
            "vid",
            "v",
            "n",
            "_bkts",
            F.explode(
                F.array(*[F.lit(t) for t in range(n_tables)])
            ).alias("tbl"),
        )
        .withColumn("bucket", F.element_at("_bkts", F.col("tbl") + 1))
        .repartition("tbl", "bucket")
    )
    # Lazy local checkpoint BEFORE the self-join fan-out (always, not
    # just on the diagnostics path): plan dedup gives the join's right
    # side fresh exprIds and the hyperplane-projection HOF lambdas then
    # defeat ReuseExchange/AQE stage-reuse canonicalization, so both
    # sides would re-run the full bucket projection (measured: two full
    # map stages). _windowed_bucket_chunks checkpoints internally and
    # computes the cap count plus the balanced chunk index in ONE
    # (tbl, bucket) window pass; the chunk-pair join spreads a flooded
    # bucket's quadratic verify work over its chunk pairs instead of
    # the bucket's single owning task (dedup.PAIR_CHUNK_ROWS note).
    from .dedup import _balanced_pair_sides, _windowed_bucket_chunks

    keyed = _windowed_bucket_chunks(
        keyed, ["tbl", "bucket"], "vid", max_bucket_size, log,
        "lsh_near_dup_pairs",
        drop_msg=(
            f"lsh_near_dup_pairs: max_bucket_size={max_bucket_size} "
            f"dropped {{n_dropped}} buckets across {n_tables} tables"
        ),
    )
    # "merge" hint keeps AQE from building one side as a
    # BroadcastExchange (which can never reuse the shuffle exchange)
    L, R, on = _balanced_pair_sides(keyed, ["tbl", "bucket"])
    # first-collision dedup: emit each pair only from the lowest table
    # index where the two vectors share a bucket — replaces the
    # n_tables-way union + DISTINCT shuffle; a pair whose first
    # colliding table bucket is capped is dropped (the cap semantics)
    first_hit = F.lit(True)
    for t in range(n_tables - 1):
        first_hit = first_hit & (
            (F.col("l.tbl") <= t)
            | (
                F.element_at(F.col("l._bkts"), t + 1)
                != F.element_at(F.col("r._bkts"), t + 1)
            )
        )
    cand = (
        L.hint("merge")
        .join(R.hint("merge"), on=on)
        .filter(F.col("l.vid") < F.col("r.vid"))
        .filter(first_hit)
    )
    if log is not None:
        # materialize the candidate rows once so the evidence count and
        # the verify below share the join (the production log=None path
        # stays a single lazy plan with no extra actions); LAZY
        # checkpoint — the count() is the materializing action, so
        # diagnostics cost one job here instead of two
        cand = cand.localCheckpoint(eager=False)
        log(f"lsh_near_dup_pairs: {cand.count()} candidate pairs")
    # verify INLINE in the joined row (replaces two corpus joins): the
    # dot product is an explicit element_at sum — same left-to-right
    # fold order as the zip_with/aggregate form bit for bit, but
    # codegen-able (the HOF form is interpreted and the threshold
    # filter, pushed into the join condition, evaluates it per
    # candidate)
    dot = None
    for i in range(1, dim + 1):
        term = F.element_at(F.col("l.v"), i) * F.element_at(F.col("r.v"), i)
        dot = term if dot is None else dot + term
    return (
        cand.withColumn(
            "cosine", dot / (F.col("l.n") * F.col("r.n"))
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("l.vid").alias("a"),
            F.col("r.vid").alias("b"),
            "cosine",
        )
    )


def derive_n_clusters(
    corpus_count: int,
    target_cluster_size: int = 4096,
    min_clusters: int = 8,
) -> int:
    """Size the semantic-dedup cluster count from the corpus: enough
    clusters that the expected membership stays near
    ``target_cluster_size`` (the within-cluster pair scan is quadratic
    in membership, so cluster count — like the hyperplane count in
    ``derive_n_planes`` — must grow with the corpus, never sit at a
    sandbox constant). 10^9 vectors at the 4096 target -> ~244k
    clusters."""
    if corpus_count <= 0:
        return min_clusters
    return max(min_clusters, math.ceil(corpus_count / target_cluster_size))


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    centroids: list[tuple[int, list[float], float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    log=None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embeddings, compare pairs only
    WITHIN a cluster, and drop every vector that has a lower-id
    same-cluster neighbor with cosine >= threshold. Returns the KEPT
    rows -> (vec_id, cluster_id).

    Clustering: each vector goes to its highest-cosine centroid (ties:
    lowest centroid id). ``centroids`` is a list of (cid, vector, norm)
    — pass ``train_ivf_centroids`` output for quality clusters; when
    None, the ``n_clusters`` lowest-id corpus vectors are used (a
    deterministic, engine-replayable seeding — the DuckDB oracle
    recomputes the same centroids from the table). Zero-norm vectors
    are unsupported (same caveat as every cosine operator here).

    Plan shape at scale: centroid scores are LITERAL dot products — an
    explicit element_at sum per centroid folded left-to-right (bit-
    identical to DuckDB's list_dot_product), argmax via
    array_position(scores, array_max(scores)) — so assignment is a
    zero-shuffle, fully codegen projection (no N x K row blow-up, no
    HOF lambdas). That caps the practical literal-centroid count at a
    few hundred; beyond that, cluster hierarchically (assign to coarse
    literal centroids, recurse within). The within-cluster pair scan is
    the lsh_near_dup_pairs shape: one repartition on cluster_id, a lazy
    local checkpoint before the self-join fan-out (plan dedup would
    otherwise re-run the scan per side), merge-hinted alias self-join,
    and the exact cosine verified inline. ``max_cluster_size`` (ON by
    default) exempts degenerate clusters from pair generation — their
    members are all KEPT, with the drop logged — because a mega-cluster
    (every vector near one centroid) is quadratic; ``n_clusters=None``
    (default) derives K from the corpus via ``derive_n_clusters`` so
    healthy clusters stay bounded — pin an explicit K for oracle
    replay."""
    c = with_norm(
        corpus.select(F.col(id_col).alias("vid"), F.col(vec_col)), vec_col
    ).select("vid", F.col("_vd").alias("v"), F.col("norm").alias("n"))
    if centroids is None:
        if n_clusters is None:
            # size K from the corpus (one scalar count action) — a
            # fixed K is a sandbox constant: the within-cluster pair
            # scan is quadratic in membership, so K must grow with the
            # corpus exactly like derive_n_planes grows the LSH bucket
            # count. Pin an explicit K for oracle replay.
            n_clusters = derive_n_clusters(c.count())
            if log is not None:
                log(f"semantic_dedup: derived n_clusters={n_clusters}")
        rows = c.orderBy("vid").limit(n_clusters).collect()
        centroids = [(r["vid"], list(r["v"]), float(r["n"])) for r in rows]
    centroids = sorted(centroids, key=lambda t: t[0])
    dim = len(centroids[0][1])

    def lit_dot(cv: list[float]):
        dot = None
        for i, x in enumerate(cv):
            term = F.element_at(F.col("v"), i + 1) * F.lit(float(x))
            dot = term if dot is None else dot + term
        return dot

    scores = F.array(
        *[lit_dot(cv) / (F.col("n") * F.lit(cn)) for _, cv, cn in centroids]
    )
    cids = F.array(*[F.lit(int(cid)) for cid, _, _ in centroids])
    # argmax: first index of the max score == lowest centroid id on ties
    idx = F.array_position(scores, F.array_max(scores)).cast("int")
    asg = c.withColumn("cluster_id", F.element_at(cids, idx).cast("long"))
    keyed = asg.repartition("cluster_id")
    if max_cluster_size is not None:
        wb = Window.partitionBy("cluster_id")
        keyed = keyed.withColumn("_cn", F.count(F.lit(1)).over(wb))
        keyed = keyed.localCheckpoint(eager=False)
        if log is not None:
            n_over = (
                keyed.filter(F.col("_cn") > max_cluster_size)
                .select("cluster_id")
                .distinct()
                .count()
            )
            log(
                f"semantic_dedup: max_cluster_size={max_cluster_size} "
                f"exempted {n_over} oversized clusters from pair scan"
            )
    else:
        keyed = keyed.withColumn("_cn", F.lit(0)).localCheckpoint(
            eager=False
        )
    small = (
        keyed.filter(F.col("_cn") <= max_cluster_size)
        if max_cluster_size is not None
        else keyed
    )
    # balanced chunk-pair enumeration (dedup.PAIR_CHUNK_ROWS note): a
    # whole cluster's quadratic pair scan otherwise runs in the one
    # task owning its partition (the 4096-vector target is ~8M cosine
    # evaluations serial); the row_number window rides the existing
    # cluster_id partitioning of the checkpointed relation, so this
    # adds a per-partition sort, no exchange
    from .dedup import PAIR_CHUNK_ROWS, PAIR_MAX_CHUNKS, _balanced_pair_sides

    wr = Window.partitionBy("cluster_id").orderBy("vid")
    chunked = (
        small.withColumn("_rn", F.row_number().over(wr))
        .withColumn(
            "_c",
            F.greatest(
                F.lit(int(PAIR_CHUNK_ROWS)),
                F.expr(
                    f"(_cn + {int(PAIR_MAX_CHUNKS) - 1}) div "
                    f"{int(PAIR_MAX_CHUNKS)}"
                ),
            ),
        )
        .withColumn("_ci", F.expr("(_rn - 1) div _c"))
        .withColumn("_k", F.expr("(_cn + _c - 1) div _c"))
        .drop("_cn", "_rn", "_c")
    )
    L, R, on = _balanced_pair_sides(chunked, ["cluster_id"])
    dot = None
    for i in range(1, dim + 1):
        term = F.element_at(F.col("l.v"), i) * F.element_at(F.col("r.v"), i)
        dot = term if dot is None else dot + term
    dropped = (
        L.hint("merge")
        .join(R.hint("merge"), on=on)
        .filter(F.col("l.vid") < F.col("r.vid"))
        .withColumn("cosine", dot / (F.col("l.n") * F.col("r.n")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("r.vid").alias("vid"))
        .distinct()
    )
    return keyed.join(dropped, "vid", "left_anti").select(
        F.col("vid").alias("vec_id"), "cluster_id"
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer
    partitions the corpus into centroid-owned lists; each query probes
    only its ``n_probe`` nearest centroids' lists and exact-reranks the
    candidates. Returns (query_id, vec_id, rank, cosine).

    The scale shape: assignment is corpus x broadcast(centroids) with a
    max_by aggregate (map-side, one shuffle by vector id); search is an
    equi-join on cluster id — each query touches ~n_probe/n_centroids
    of the corpus instead of all of it.

    ``centroids``: (centroid_id, vector) DataFrame. Default: the
    ``n_centroids`` lowest-id corpus vectors — DETERMINISTIC (and
    SQL-replayable for the oracle) but not data-adaptive; production
    plugs k-means centroids (e.g. pyspark.ml KMeans) into the same
    plumbing. Ties everywhere break toward the smaller id."""
    c = with_norm(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col)), vec_col
    ).select(
        "vec_id", F.col("_vd").alias("v"), F.col("norm").alias("n")
    ).localCheckpoint(eager=False)
    # ^ lazy checkpoint: assign() consumes the normalized corpus twice
    # (centroid scoring + the cluster join-back) and HOF lambda exprIds
    # defeat plan-level sharing (see lsh_near_dup_pairs) — one
    # materialization instead of a second full-corpus norm pass
    if centroids is None:
        cent = (
            c.orderBy("vec_id")
            .limit(n_centroids)
            .select(
                F.col("vec_id").alias("cid"),
                F.col("v").alias("cv"),
                F.col("n").alias("cn"),
            )
        )
    else:
        cent = with_norm(
            centroids.select(
                F.col("centroid_id").alias("cid"), F.col(vec_col)
            ),
            vec_col,
        ).select("cid", F.col("_vd").alias("cv"), F.col("norm").alias("cn"))

    def assign(side: DataFrame, id_name: str) -> DataFrame:
        scored = side.crossJoin(F.broadcast(cent)).withColumn(
            "ccos",
            _dot(F.col("v"), F.col("cv")) / (F.col("n") * F.col("cn")),
        )
        # argmax by (cosine desc, cid asc) via an order-embedding struct
        best = scored.groupBy(id_name).agg(
            F.max(
                F.struct(
                    F.col("ccos").alias("s"),
                    (-F.col("cid")).alias("negcid"),
                )
            ).alias("b")
        )
        return side.join(
            best.select(id_name, (-F.col("b.negcid")).alias("cluster")),
            id_name,
        )

    corpus_assigned = assign(c, "vec_id")
    q = with_norm(
        queries.select("query_id", F.col(vec_col)), vec_col
    ).select("query_id", F.col("_vd").alias("v"), F.col("norm").alias("n"))
    q_scored = q.crossJoin(F.broadcast(cent)).withColumn(
        "ccos", _dot(F.col("v"), F.col("cv")) / (F.col("n") * F.col("cn"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cid").asc()
    )
    probes = (
        q_scored.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select(
            "query_id",
            F.col("v").alias("qv"),
            F.col("n").alias("qn"),
            F.col("cid").alias("cluster"),
        )
    )
    cands = corpus_assigned.join(F.broadcast(probes), "cluster").withColumn(
        "cosine", _dot(F.col("v"), F.col("qv")) / (F.col("n") * F.col("qn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine")
    )


def _sub_l2sq(a, b, start: int, dsub: int):
    """Squared L2 distance between two array columns over the slice
    [start, start+dsub) (1-based), spelled as an EXPLICIT left-
    associated element_at sum — whole-stage-codegen friendly (no HOF
    lambdas, see the repo's CodegenFallback notes) and bit-identical
    to the oracle's generated (a[i]-b[i])*(a[i]-b[i]) + ... chain."""
    expr = None
    for i in range(dsub):
        d = F.element_at(a, start + i) - F.element_at(b, start + i)
        t = d * d
        expr = t if expr is None else expr + t
    return expr


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m_sub: int = 4,
    n_codes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jégou, Douze & Schmid, TPAMI'11, "Product Quantization for
    Nearest Neighbor Search"): the vector is split into ``m_sub``
    subvectors, each encoded as the id of its nearest codebook
    centroid (squared-L2), so a corpus vector becomes m_sub small
    integers — the representation that makes 10⁹-vector search
    memory-feasible. Queries stay un-quantized (ADC): per query one
    (m_sub × n_codes) distance table is computed, and the approximate
    distance of a corpus vector is the sum of its codes' table
    entries.

    Codebook: the ``n_codes`` lowest-id corpus vectors' subvectors —
    DETERMINISTIC (SQL-replayable for the oracle) but not
    data-adaptive, exactly like `ivf_cosine_topk`'s default; a
    per-subspace k-means codebook (`train_ivf_centroids` on sliced
    inputs) plugs into the same plumbing.

    Scale shape: encode = corpus × BROADCAST codebook with per-
    subspace min(struct(dist, cid)) aggregates — map-side combinable,
    one shuffle by vector id, ties break to the smaller cid; the codes
    table is m_sub integers per vector (the ~dim·4/m_sub-fold
    compression is the point); search = m_sub BROADCAST hash joins of
    the codes table against the per-query distance tables (Q·n_codes
    rows each) and a per-query WindowGroupLimit top-k. The approximate
    distance is an explicit left-associated m_sub-term sum — no
    fold-order ambiguity — and is rounded to 4dp BEFORE ranking
    (vec_id tie-break) so the result set is engine-stable.
    -> (query_id, vec_id, rank, adist)."""
    if int(dim) % int(m_sub) != 0:
        # PQ conventionally requires even subspaces; silently dropping
        # the trailing dim % m_sub dimensions from every distance
        # would be a quiet accuracy bug
        raise ValueError(
            f"pq_adc_topk: dim={dim} not divisible by m_sub={m_sub}"
        )
    dsub = int(dim) // int(m_sub)
    to_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    c = corpus.select(
        F.col(id_col).alias("vec_id"), to_d.alias("v")
    ).localCheckpoint(eager=False)
    # ^ consumed twice (codebook head + encode scan); HOF exprIds in
    # the cast chain defeat plan-level reuse without it
    book = (
        c.orderBy("vec_id")
        .limit(int(n_codes))
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    enc = c.crossJoin(F.broadcast(book))
    aggs = [
        F.min(
            F.struct(
                _sub_l2sq(
                    F.col("v"), F.col("cv"), m * dsub + 1, dsub
                ).alias("d"),
                F.col("cid").alias("cid"),
            )
        ).alias(f"_a{m}")
        for m in range(m_sub)
    ]
    codes = (
        enc.groupBy("vec_id")
        .agg(*aggs)
        .select(
            "vec_id",
            *[F.col(f"_a{m}.cid").alias(f"c{m}") for m in range(m_sub)],
        )
    )
    qd = queries.select(
        F.col(query_id_col).alias("query_id"), to_d.alias("qv")
    ).localCheckpoint(eager=False)
    dtab = qd.crossJoin(F.broadcast(book)).select(
        "query_id",
        "cid",
        *[
            _sub_l2sq(F.col("qv"), F.col("cv"), m * dsub + 1, dsub)
            .alias(f"t{m}")
            for m in range(m_sub)
        ],
    )
    out = codes.crossJoin(F.broadcast(qd.select("query_id")))
    for m in range(m_sub):
        dm = dtab.select(
            "query_id", F.col("cid").alias(f"c{m}"), f"t{m}"
        )
        out = out.join(F.broadcast(dm), ["query_id", f"c{m}"])
    adist = None
    for m in range(m_sub):
        tm = F.col(f"t{m}")
        adist = tm if adist is None else adist + tm
    scored = out.withColumn("_ad", F.round(adist, 4))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_ad").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.col("_ad").alias("adist"))
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    sample_fraction: float | None = None,
    max_iter: int = 20,
    vec_col: str = "embedding",
) -> DataFrame:
    """Train data-adaptive IVF centroids with pyspark.ml KMeans ->
    (centroid_id, embedding array<double>) ready for
    ``ivf_cosine_topk(centroids=...)``.

    The scale shape: fit on a bounded sample (``sample_fraction``; at
    10^9 vectors you train on ~10^6), then assignment/search reuse the
    broadcast-centroid plumbing — training cost is decoupled from
    corpus size. Deterministic for a fixed seed + input, but NOT
    SQL-replayable (Lloyd iterations), so the oracle gate keeps the
    deterministic lowest-id centroids and this trainer is covered by a
    recall-vs-exact pytest."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # L2-normalize before fitting: euclidean k-means on unit vectors is
    # spherical k-means, matching the cosine metric the searcher uses
    # (training on raw norms misplaces centroids for cosine Voronoi cells)
    unit = with_norm(corpus.select(F.col(vec_col)), vec_col).select(
        F.transform(
            F.col("_vd"), lambda x: x / F.col("norm")
        ).alias("unit")
    )
    feat = unit.select(array_to_vector(F.col("unit")).alias("features"))
    if sample_fraction is not None:
        feat = feat.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feat)
    spark = corpus.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(
        rows, "centroid_id int, embedding array<double>"
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_expr(vec_col, planes: list[list[float]]):
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col(vec_col), plane) >= 0, 1).otherwise(0)
        bits.append((bit * (2**i)).cast("long"))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    n_tables: int = 2,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    log=None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign buckets, ``n_tables``
    independent tables unioned for recall, exact cosine re-rank within
    candidates. Returns (query_id, vec_id, rank, cosine).

    ``n_planes=None`` derives the plane count from the corpus size
    (``derive_n_planes``); pin an explicit value for oracle replay.
    ``max_bucket_size`` (ON by default) drops oversized CORPUS-side
    buckets per table from candidate generation (a degenerate
    duplicate-vector class would otherwise fan every matching query out
    to the whole class) — recall-only effect, logged via ``log``; each
    (query, vector) pair is considered exactly once, in its FIRST
    matching table, and is dropped when that table's corpus bucket is
    oversized (the uniform cap semantics of the LSH operator family).

    Plan shape — the corpus is NEVER shuffled: all tables' bucket keys
    come from ONE corpus scan (bucket array + literal table-index
    explode, map-side), the cap joins back a tiny aggregated
    (table, bucket, count) relation, queries broadcast with their own
    bucket arrays, first-collision table dedup is an inline element_at
    conjunction over the two bucket arrays (replacing the
    dropDuplicates shuffle of candidate+vector payloads), and the only
    shuffle of candidate rows is the final per-query top-k window."""
    c = with_norm(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col)), vec_col
    ).select("vec_id", F.col("_vd").alias("cv"), F.col("norm").alias("cn"))
    q = with_norm(
        queries.select("query_id", F.col(vec_col)), vec_col
    ).select("query_id", F.col("_vd").alias("qv"), F.col("norm").alias("qn"))
    if n_planes is None:
        n_planes = derive_n_planes(c.count())
        if log is not None:
            log(f"lsh_cosine_topk: derived n_planes={n_planes}")
    tables = [_planes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    ckeyed = (
        c.select(
            "vec_id",
            "cv",
            "cn",
            F.array(*[_bucket_expr("cv", p) for p in tables]).alias("_cb"),
        )
        .select(
            "vec_id",
            "cv",
            "cn",
            "_cb",
            F.explode(
                F.array(*[F.lit(t) for t in range(n_tables)])
            ).alias("table"),
        )
        .withColumn("bucket", F.element_at("_cb", F.col("table") + 1))
        # lazy checkpoint: the bucket projection (n_tables × n_planes
        # dot products per vector) fans out to the cap aggregation AND
        # the candidate join; HOF lambda exprIds defeat plan-level
        # sharing, so without this it re-evaluates per consumer. Still
        # zero shuffles on the corpus side.
        .localCheckpoint(eager=False)
    )
    if max_bucket_size is not None:
        bsz = ckeyed.groupBy("table", "bucket").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        if log is not None:
            n_dropped = bsz.filter(F.col("_bn") > max_bucket_size).count()
            log(
                f"lsh_cosine_topk: max_bucket_size={max_bucket_size} dropped "
                f"{n_dropped} corpus buckets across {n_tables} tables"
            )
        # the aggregated relation is tiny (distinct buckets) — AQE
        # broadcasts it back; the corpus side stays un-shuffled
        ckeyed = ckeyed.join(
            bsz.filter(F.col("_bn") <= max_bucket_size), ["table", "bucket"]
        ).select("vec_id", "cv", "cn", "_cb", "table", "bucket")
    qkeyed = (
        q.select(
            "query_id",
            "qv",
            "qn",
            F.array(*[_bucket_expr("qv", p) for p in tables]).alias("_qb"),
        )
        .select(
            "query_id",
            "qv",
            "qn",
            "_qb",
            F.explode(
                F.array(*[F.lit(t) for t in range(n_tables)])
            ).alias("table"),
        )
        .withColumn("bucket", F.element_at("_qb", F.col("table") + 1))
    )
    # first-collision table dedup: emit the (query, vector) candidate
    # only from the lowest table where the bucket keys agree
    first_hit = F.lit(True)
    for t in range(n_tables - 1):
        first_hit = first_hit & (
            (F.col("table") <= t)
            | (F.element_at("_cb", t + 1) != F.element_at("_qb", t + 1))
        )
    cands = (
        ckeyed.join(F.broadcast(qkeyed), ["table", "bucket"])
        .filter(first_hit)
        .select("query_id", "vec_id", "cv", "cn", "qv", "qn")
    )
    scored = cands.withColumn(
        "cosine",
        _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine")
    )


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    log=None,
) -> DataFrame:
    """Multi-probe LSH top-k (Lv, Josephson, Wang, Charikar & Li
    VLDB'07): instead of buying recall with MORE TABLES (each one a
    full extra corpus bucket pass + memory), the QUERY probes
    neighboring buckets of a SINGLE table — its own signature plus
    every Hamming-distance-1 perturbation. This engine probes all
    ``n_planes`` single-bit flips (a superset of the paper's
    margin-ordered probe sequence — exhaustive at distance 1), then
    exact-cosine re-ranks the candidates.
    -> (query_id, vec_id, rank, cosine).

    Plan shape: ONE corpus bucket pass (vs n_tables passes), bucket
    cap identical to ``lsh_cosine_topk``; the (n_planes + 1)x fan-out
    lands entirely on the broadcast QUERY side, and each corpus vector
    has one bucket so a (query, vector) pair matches at most one probe
    — no candidate dedup shuffle. At 100 TB this is the memory-lean
    recall knob: probes scale the small side, never the corpus."""
    planes = _planes(dim, n_planes, seed)
    c = with_norm(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col)),
        vec_col,
    ).select(
        "vec_id", F.col("_vd").alias("cv"), F.col("norm").alias("cn")
    )
    ckeyed = c.withColumn(
        "bucket", _bucket_expr("cv", planes)
    ).localCheckpoint(eager=False)
    if max_bucket_size is not None:
        bsz = ckeyed.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        if log is not None:
            n_dropped = bsz.filter(
                F.col("_bn") > max_bucket_size
            ).count()
            log(
                f"lsh_multiprobe_topk: max_bucket_size="
                f"{max_bucket_size} dropped {n_dropped} corpus buckets"
            )
        # the cap relation is <= 2^n_planes rows — broadcast statically
        # (lsh_cosine_topk leaves this to AQE; here the single table
        # makes the bound a compile-time fact)
        ckeyed = ckeyed.join(
            F.broadcast(bsz.filter(F.col("_bn") <= max_bucket_size)),
            "bucket",
        ).select("vec_id", "cv", "cn", "bucket")
    q = with_norm(
        queries.select("query_id", F.col(vec_col)), vec_col
    ).select(
        "query_id", F.col("_vd").alias("qv"), F.col("norm").alias("qn")
    )
    probes = (
        q.withColumn("qb", _bucket_expr("qv", planes))
        .select(
            "query_id", "qv", "qn", "qb",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(n_planes)))
            ).alias("i"),
        )
        .withColumn(
            "bucket",
            F.when(F.col("i") == 0, F.col("qb")).otherwise(
                F.expr("qb ^ shiftleft(1, i - 1)").cast("long")
            ),
        )
        .select("query_id", "qv", "qn", "bucket")
    )
    cands = ckeyed.join(F.broadcast(probes), "bucket").select(
        "query_id", "vec_id", "cv", "cn", "qv", "qn"
    )
    scored = cands.withColumn(
        "cosine",
        _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "cosine")
    )


def ann_recall_report(
    approx_run: DataFrame,
    exact_run: DataFrame,
) -> DataFrame:
    """Recall@k of an approximate ANN run against the exact top-k —
    the calibration number every ANN deployment tracks (the twin of
    ``dedup.lsh_recall_report`` for the vector side). Both inputs are
    (query_id, vec_id, rank, ...) runs of the same k.
    -> one row (n_exact, n_approx, n_hit, recall); recall =
    |approx ∩ exact| / |exact|. Run-sized relations only."""
    a = approx_run.select("query_id", "vec_id")
    e = exact_run.select("query_id", "vec_id")
    n_e = e.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    n_a = a.agg(F.count(F.lit(1)).cast("long").alias("n_approx"))
    n_h = e.join(a, ["query_id", "vec_id"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    return (
        n_e.crossJoin(n_a)
        .crossJoin(n_h)
        .select(
            "n_exact",
            "n_approx",
            "n_hit",
            F.round(
                F.col("n_hit") * F.lit(1.0) / F.col("n_exact"), 4
            ).alias("recall"),
        )
    )


def maxsim_topk(
    query_tokens: DataFrame,
    doc_tokens: DataFrame,
    k: int = 5,
    qid_col: str = "qid",
    group_col: str = "group_id",
    vec_col: str = "vec",
) -> DataFrame:
    """ColBERT-style late-interaction scoring (Khattab & Zaharia,
    SIGIR'20): queries and documents are BAGS of token vectors and

        score(q, d) = Σ_{i ∈ q} max_{j ∈ d} cos(q_i, d_j)

    — each query token votes for its best-matching document token
    (MaxSim), votes sum. The multi-vector retrieval family's
    representative next to the single-vector ANN suite.

    Float parity: cosine = zip_with/aggregate dot over double arrays
    divided by the two norms — DuckDB's list_dot_product matches that
    fold bit-for-bit (verified repo-wide, see CLAUDE.md); max over
    identical doubles is exact, and the outer sum runs over the
    query's FEW tokens (the per-(qid, tok) maxima are aggregated in a
    deterministic small set — at the gate's 2 tokens the sum is
    order-exact).

    Scale shape: this is the EXACT all-pairs verification path — the
    query side broadcasts (queries × their tokens are request-sized)
    and the corpus token table is scanned once; at 10⁹ token vectors
    feed per-query-token ANN candidates (`lsh_bucket_topk` /
    `ivf_cosine_topk`) into the same MaxSim aggregate instead of the
    full scan — identical aggregation, pruned pairs (the ColBERT
    PLAID recipe). -> (qid, group_id, rank, score), 4dp, group ties
    ASC."""
    qt = query_tokens.select(
        F.col(qid_col).alias("qid"),
        F.col("tok_id").alias("_qt"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "_qv"
        ),
    ).withColumn("_qn", F.sqrt(_dot(F.col("_qv"), F.col("_qv"))))
    dt = doc_tokens.select(
        F.col(group_col).alias("group_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "_dv"
        ),
    ).withColumn("_dn", F.sqrt(_dot(F.col("_dv"), F.col("_dv"))))
    pairs = dt.crossJoin(F.broadcast(qt)).select(
        "qid",
        "_qt",
        "group_id",
        (
            _dot(F.col("_qv"), F.col("_dv"))
            / (F.col("_qn") * F.col("_dn"))
        ).alias("_cos"),
    )
    best = pairs.groupBy("qid", "_qt", "group_id").agg(
        F.max("_cos").alias("_m")
    )
    scored = best.groupBy("qid", "group_id").agg(
        F.sum("_m").alias("_s")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("_s").desc(), F.col("group_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select(
            "qid", "group_id", "rank", F.round("_s", 4).alias("score")
        )
    )
