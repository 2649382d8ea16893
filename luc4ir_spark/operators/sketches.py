"""Deterministic distributed sketches.

Classic streaming sketches (HLL, theta) are engine-specific: Spark's
``approx_count_distinct`` and DuckDB's ``approx_distinct`` use
different hash functions and register layouts, so their estimates can
never be cross-checked value-for-value. The K-Minimum-Values sketch
(Bar-Yossef et al. 2002) over the repo's engine-portable ``mix`` hash
(functions/hashing.py) is different: the k smallest hash values of a
set are a pure function of the input, so BOTH engines compute the
identical sketch and the identical estimate — an approximate
algorithm with an exact oracle.

    u_k  = (k-th smallest distinct hash) / P        (P = 2^31 - 1)
    est  = (k - 1) / u_k  =  (k - 1) * P / h_k      (m >= k)
    est  = m exactly                                 (m <  k)

where m is the number of distinct hash values seen. Standard error is
~1/sqrt(k-2) (~12% at k=64) — the gate also emits the exact distinct
count so the error is visible, not hidden.

Scale shape: one distinct() on (group, hash) — a map-side-combinable
hash aggregate — then a per-group ``row_number() <= k`` that Spark
rewrites to WindowGroupLimit (partial top-k BEFORE the shuffle, so
each mapper forwards at most k rows per group), then one tiny
groupBy. The sketch relation leaving the map side is k rows per group
regardless of input size — the whole point of a sketch at 100 TB.
Sketches for different partitions union and re-rank to merge
(min-of-mins is associative), same as any KMV.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import MIX_P, mix_id_expr

__all__ = [
    "distinct_kmv_sketch",
    "kmv_set_ops",
    "countmin_sketch",
    "countmin_estimate",
    "bloom_filter_bits",
    "bloom_might_contain",
]


def distinct_kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col`` via the
    K-Minimum-Values sketch over the portable mix hash, plus the kth
    hash itself (the mergeable sketch state) and the sketch fill m.
    -> (group_cols..., m long, kth_hash long — null when m < k,
    est_distinct double).

    Deterministic: identical on any engine that reproduces mix();
    collisions in the 31-bit hash space merge values in BOTH engines
    identically (negligible below ~10^4 distincts per group; raise to
    a wider portable hash before trusting est at 10^6+ distincts)."""
    h = (
        df.select(*group_cols, mix_id_expr(value_col).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    topk = h.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    per = topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.max(F.when(F.col("rn") == k, F.col("_h"))).cast("long")
        .alias("kth_hash"),
    )
    num = float((k - 1) * MIX_P)
    return per.select(
        *group_cols,
        "m",
        "kth_hash",
        F.when(F.col("m") < k, F.col("m").cast("double"))
        .otherwise(F.lit(num) / F.col("kth_hash").cast("double"))
        .alias("est_distinct"),
    )


CMS_SALT = 982451653  # second hash stream offset (prime)


_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    """Flajolet et al.'s bias-correction constant: tabulated for small
    m, 0.7213/(1 + 1.079/m) for m >= 128. Emitted as a literal into
    both engines so the estimate arithmetic is shared exactly."""
    return _HLL_ALPHA.get(int(m), 0.7213 / (1.0 + 1.079 / m))


def hll_distinct(
    df,
    key_col: str,
    group_col: str | None = None,
    m: int = 64,
    w: int = 48,
):
    """HyperLogLog distinct-count estimation (Flajolet, Fusy, Gandouet
    & Meunier, AofA'07) — engine-portable like every sketch here: the
    hash is the repo's md5-60bit string id, so both engines build the
    IDENTICAL register file.

        tid  = first 60 bits of md5(key)
        j    = tid mod m                    (register)
        h2   = tid div m                    (rank stream)
        ρ    = position of the LOWEST set bit of h2 within w bits
               (+1-based; h2 with no set bit in w bits → w+1) —
               Flajolet's ρ applied LSB-first, valid for any uniform
               hash direction, and computable as an all-integer
               literal CASE chain (no float log2)
        M_j  = max ρ over keys landing in register j

    Estimate: E = α_m·m² / (Σ_present 2^(−M_j) + V), where V = number
    of never-hit registers (each contributes 2⁻⁰ = 1), with the
    small-range correction E ≤ 2.5m ∧ V > 0 → m·ln(m/V) (linear
    counting). -> one row per group:
    (group?, n_registers, v_zero, est_distinct).

    Scale shape: one map-side-combined max-aggregate to (group, j) —
    at most m rows per group leave the mappers regardless of input
    size — then one tiny per-group reduction. Merging shard sketches =
    max per register (HLL is a lattice), the same union-then-max this
    plan already performs."""
    rho_src = F.col("_h2")
    rho = F.lit(int(w) + 1)
    for i in range(int(w), 0, -1):
        rho = F.when(
            F.pmod(rho_src, F.lit(1 << i)) == F.lit(1 << (i - 1)),
            F.lit(i),
        ).otherwise(rho)
    keyed = df.select(
        *([F.col(group_col).alias("_g")] if group_col else []),
        F.expr(f"conv(substr(md5({key_col}), 1, 15), 16, 10)")
        .cast("long")
        .alias("_tid"),
    ).select(
        *(["_g"] if group_col else []),
        F.pmod(F.col("_tid"), F.lit(int(m))).cast("long").alias("_j"),
        F.expr(f"_tid div {int(m)}").alias("_h2"),
    )
    regs = keyed.withColumn("_rho", rho.cast("long")).groupBy(
        *(["_g"] if group_col else []), "_j"
    ).agg(F.max("_rho").alias("_mj"))
    per = regs.groupBy(*(["_g"] if group_col else [])).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("_mj"))).alias("_rsum"),
    )
    mf = float(m)
    alpha = float(hll_alpha(m))
    v = (F.lit(int(m)) - F.col("n_registers")).cast("long")
    e_raw = F.lit(alpha * mf * mf) / (
        F.col("_rsum") + v.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * mf)) & (v > 0),
        F.lit(mf) * F.log(F.lit(mf) / v.cast("double")),
    ).otherwise(e_raw)
    cols = ([F.col("_g").alias(group_col)] if group_col else []) + [
        "n_registers",
        v.alias("v_zero"),
        est.alias("est_distinct"),
    ]
    return per.select(*cols)


def countmin_sketch(
    key_counts: DataFrame,
    key_col: str,
    count_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) of
    weighted key counts over engine-portable hashing: cell (r, c)
    holds the summed counts of every key hashing to column c in row r,
    with the rows derived by Kirsch-Mitzenmacher double hashing
    (h1 + r*h2 — the standard Bloom/CMS derandomization):

        tid = first 60 bits of md5(key)      (the portable shingle id)
        h1  = mix(tid),  h2 = 1 + mix(tid + CMS_SALT) % (width - 1)
        col(r) = (h1 + r*h2) % width

    ``key_counts`` is already per-key (key, count) — e.g. the index's
    term_stats (term, cf); sketching raw rows is one groupBy upstream.
    -> (r, c, total) for non-empty cells; the point estimate of a key
    is min over r of its cell — an upper bound on the true count,
    exact when the key collides with nothing in some row.

    All-integer and RNG-free, so the sketch is bit-identical on any
    engine reproducing md5 + mix. Scale: the input is key-cardinality
    sized (vocab, not corpus), the depth explode is a literal
    sequence, and the cell table is at most depth*width rows — a
    constant — built by one map-side-combined groupBy. Merging
    sketches of corpus shards = summing cell tables (CMS is linear)."""
    tid = F.expr(f"conv(substr(md5({key_col}), 1, 15), 16, 10)").cast(
        "long"
    )
    keyed = key_counts.select(
        mix_id_expr(tid).alias("_h1"),
        (
            F.lit(1)
            + F.pmod(
                mix_id_expr(tid + F.lit(CMS_SALT)), F.lit(width - 1)
            )
        ).cast("long").alias("_h2"),
        F.col(count_col).cast("long").alias("_cnt"),
    )
    rows = keyed.select(
        "_h1", "_h2", "_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    )
    return (
        rows.select(
            F.col("r").cast("long").alias("r"),
            F.pmod(
                F.col("_h1") + F.col("r") * F.col("_h2"), F.lit(width)
            ).cast("long").alias("c"),
            "_cnt",
        )
        .groupBy("r", "c")
        .agg(F.sum("_cnt").cast("long").alias("total"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point estimates from a ``countmin_sketch``: for each probe key,
    min over rows of its cell total (absent cell = 0 — the key was
    never counted there). -> (key, est long). The CMS guarantee:
    est >= true count, with overshoot bounded by the column
    collisions."""
    tid = F.expr(f"conv(substr(md5({key_col}), 1, 15), 16, 10)").cast(
        "long"
    )
    p = probes.select(
        F.col(key_col).alias("key"),
        mix_id_expr(tid).alias("_h1"),
        (
            F.lit(1)
            + F.pmod(
                mix_id_expr(tid + F.lit(CMS_SALT)), F.lit(width - 1)
            )
        ).cast("long").alias("_h2"),
    ).select(
        "key", "_h1", "_h2",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).select(
        "key",
        F.col("r").cast("long").alias("r"),
        F.pmod(
            F.col("_h1") + F.col("r") * F.col("_h2"), F.lit(width)
        ).cast("long").alias("c"),
    )
    return (
        p.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce("total", F.lit(0))).cast("long").alias("est")
        )
    )


def bloom_filter_bits(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1024,
    k_hashes: int = 4,
) -> DataFrame:
    """Engine-portable Bloom filter (Bloom 1970) built as a relation:
    the set of SET bit positions, with the k probe positions per key
    derived by the same Kirsch-Mitzenmacher double hashing as
    ``countmin_sketch`` (h1 + i*h2 over the md5-60bit key id — K-M '06
    proves two hashes suffice). -> (bit long), distinct.

    Why a relation and not a bitmap blob: the bit set IS the mergeable
    sketch (union across shards = UNION of bit rows), it broadcast-
    joins directly as a semi-join pre-filter — the Bloom-pushdown
    pattern Spark applies to shuffle joins — and it is bit-identical
    on any engine reproducing md5 + mix, so an approximate structure
    gets an exact oracle. m_bits/8 bytes as a bitmap; |bits| rows
    here — both tiny next to the corpus."""
    tid = F.expr(f"conv(substr(md5({key_col}), 1, 15), 16, 10)").cast(
        "long"
    )
    keyed = keys.select(
        mix_id_expr(tid).alias("_h1"),
        (
            F.lit(1)
            + F.pmod(
                mix_id_expr(tid + F.lit(CMS_SALT)), F.lit(m_bits - 1)
            )
        ).cast("long").alias("_h2"),
    )
    return (
        keyed.select(
            "_h1", "_h2",
            F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias(
                "i"
            ),
        )
        .select(
            F.pmod(
                F.col("_h1") + F.col("i") * F.col("_h2"), F.lit(m_bits)
            ).cast("long").alias("bit")
        )
        .distinct()
    )


def bloom_might_contain(
    bits: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 1024,
    k_hashes: int = 4,
) -> DataFrame:
    """Membership probe against ``bloom_filter_bits`` output: a key
    MIGHT be in the set iff all k of its bit positions are set (no
    false negatives; false-positive rate ~ (1 - e^(-kn/m))^k).
    -> (key, might_contain boolean). The probe side joins the tiny
    broadcast bit relation — the exact shape of a Bloom-pushdown
    pre-filter ahead of an expensive join."""
    tid = F.expr(f"conv(substr(md5({key_col}), 1, 15), 16, 10)").cast(
        "long"
    )
    p = probes.select(
        F.col(key_col).alias("key"),
        mix_id_expr(tid).alias("_h1"),
        (
            F.lit(1)
            + F.pmod(
                mix_id_expr(tid + F.lit(CMS_SALT)), F.lit(m_bits - 1)
            )
        ).cast("long").alias("_h2"),
    ).select(
        "key",
        F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("i"),
        "_h1", "_h2",
    ).select(
        "key",
        F.pmod(
            F.col("_h1") + F.col("i") * F.col("_h2"), F.lit(m_bits)
        ).cast("long").alias("bit"),
    )
    hit = (
        p.join(
            F.broadcast(
                bits.select(F.col("bit"), F.lit(1).alias("_set"))
            ),
            "bit",
            "left",
        )
        .groupBy("key")
        .agg(
            (
                F.sum(F.coalesce("_set", F.lit(0)))
                == F.lit(int(k_hashes))
            ).alias("might_contain")
        )
    )
    return hit


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Set-operation cardinality estimation from two KMV sketches —
    the theta-sketch framework (Dasgupta, Lang, Rhodes & Thaler; the
    algorithm behind Apache DataSketches' union/intersection
    estimates), over the portable mix hash so the whole computation is
    engine-exact:

        θ        = min(θ_A, θ_B)  — each θ is the set's k-th smallest
                   distinct hash (P when the set holds < k distincts:
                   the sketch IS the set)
        retained = each sketch's hashes < θ  — an exact θ/P-rate
                   sample of the set
        est_∩    = |retained_A ∩ retained_B| · P / θ
        est_∪    = |retained_A ∪ retained_B| · P / θ
        jaccard  = |∩ retained| / |∪ retained|

    Every count is an integer; each estimate is ONE division — both
    engines agree bit-for-bit. Exact cardinalities ride along (cheap
    here; at scale drop them — the sketches are the point) so
    approximation error is visible, not hidden.
    -> ONE row: (m_a, m_b, theta_hash, n_common, n_union,
    est_intersection, est_union, est_jaccard, exact_intersection,
    exact_union).

    Scale shape: per set, one distinct + WindowGroupLimit bottom-k (at
    most k rows leave the mappers); the set algebra then runs on
    <= 2k rows. Sketch merging is the same min-k union this performs
    — shard sketches combine associatively."""
    def sketch(df):
        h = df.select(mix_id_expr(value_col).alias("_h")).distinct()
        w = Window.orderBy("_h")
        return h.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= k
        )
    sa = sketch(a).localCheckpoint(eager=False)
    sb = sketch(b).localCheckpoint(eager=False)
    ta = sa.agg(
        F.count(F.lit(1)).cast("long").alias("m_a"),
        F.coalesce(
            F.max(F.when(F.col("rn") == k, F.col("_h"))), F.lit(MIX_P)
        ).cast("long").alias("_tha"),
    )
    tb = sb.agg(
        F.count(F.lit(1)).cast("long").alias("m_b"),
        F.coalesce(
            F.max(F.when(F.col("rn") == k, F.col("_h"))), F.lit(MIX_P)
        ).cast("long").alias("_thb"),
    )
    th = ta.crossJoin(tb).withColumn(
        "theta_hash", F.least("_tha", "_thb")
    )
    ra = sa.select("_h").crossJoin(F.broadcast(th.select("theta_hash")))
    ra = ra.filter(F.col("_h") < F.col("theta_hash")).select("_h")
    rb = sb.select("_h").crossJoin(F.broadcast(th.select("theta_hash")))
    rb = rb.filter(F.col("_h") < F.col("theta_hash")).select("_h")
    common = ra.join(rb, "_h").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    uni = ra.unionAll(rb).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_union")
    )
    ha = a.select(mix_id_expr(value_col).alias("_h")).distinct()
    hb = b.select(mix_id_expr(value_col).alias("_h")).distinct()
    ex_i = ha.join(hb, "_h").agg(
        F.count(F.lit(1)).cast("long").alias("exact_intersection")
    )
    ex_u = ha.unionAll(hb).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("exact_union")
    )
    out = (
        th.crossJoin(F.broadcast(common))
        .crossJoin(F.broadcast(uni))
        .crossJoin(F.broadcast(ex_i))
        .crossJoin(F.broadcast(ex_u))
    )
    p = float(MIX_P)
    return out.select(
        "m_a",
        "m_b",
        "theta_hash",
        "n_common",
        "n_union",
        F.round(
            F.col("n_common") * F.lit(p) / F.col("theta_hash"), 4
        ).alias("est_intersection"),
        F.round(
            F.col("n_union") * F.lit(p) / F.col("theta_hash"), 4
        ).alias("est_union"),
        F.when(F.col("n_union") > 0,
               F.round(F.col("n_common") / F.col("n_union"), 4))
        .otherwise(F.lit(0.0))
        .alias("est_jaccard"),
        "exact_intersection",
        "exact_union",
    )
