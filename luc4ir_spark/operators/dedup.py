"""Deduplication operators for large-scale corpus pipelines.

Beyond the reference's IR core: the operations a 100 TB training-data
pipeline runs over the same corpus table. All are pure DataFrame
compositions (no Python in the hot path) designed around bounded shuffle
fan-out:

- exact:    hash-groupBy on a content digest — one shuffle on the digest
- n-gram/token Jaccard: inverted join on shingles with a df cap so
  ubiquitous shingles don't explode the candidate-pair join (the same
  skew concern as high-df terms in the index build)
- MinHash + LSH: signature = min over k permutation hashes of the
  shingle-id set; banding buckets candidates so the pair join touches
  only same-bucket docs; candidates verified with exact Jaccard
- SimHash: per-bit weighted majority over shingle hashes -> 64-bit
  fingerprint; near-dups = small Hamming distance

Determinism: shingle ids are the first 60 bits of md5(shingle) — a
pure projection (no shuffle, no vocabulary-sized sort) that any SQL
engine reproduces bit-for-bit (``('0x' || substr(md5(s),1,15))::BIGINT``
in DuckDB) — and permutation hashes are (a*(x mod p) + b) mod p with
fixed seeds, so the DuckDB oracle can replay every stage exactly.
A legacy ``id_mode="rank"`` (dense_rank over the sorted vocabulary)
exists for tests/debugging only: its global unpartitioned window
funnels the whole shingle vocabulary through one reducer and must never
run at scale. 60-bit ids collide with probability ~n^2/2^61 (~0.04 %
at a 10^6-shingle vocabulary); a collision merges two shingles for
every doc identically, only marginally perturbing similarity estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MERSENNE_P = 2147483647  # 2^31 - 1

# fixed (a, b) parameter table for permutation hashes, seed=42-ish;
# generated once, embedded as literals so SQL oracles can embed them too
MINHASH_PARAMS: list[tuple[int, int]] = [
    (1203077, 52512857), (442549, 102051253), (730087, 21053237),
    (105331, 183270443), (1909177, 8033339), (238727, 66050159),
    (1047169, 31109963), (691529, 141274129), (333791, 9102337),
    (1823017, 54129829), (563779, 77232917), (1300237, 3034303),
    (879203, 118092013), (207023, 90014591), (1556683, 47038369),
    (412081, 160034479),
]


def tokens_or_shingles(
    docs: DataFrame,
    tokens_col: str = "tokens",
    shingle_size: int = 1,
) -> DataFrame:
    """(doc_id, tokens) -> distinct (doc_id, shingle) rows.
    shingle_size=1 -> token set; >1 -> word n-gram shingle set."""
    if shingle_size <= 1:
        sh = F.explode(tokens_col).alias("shingle")
    else:
        n = shingle_size
        # guard: a doc shorter than the shingle size yields NO shingles.
        # An unguarded F.sequence(0, size - n) infers step -1 when
        # size < n and the descending index range makes F.slice throw
        # (INVALID_PARAMETER_VALUE.START) — one empty doc would kill the
        # whole job.
        grams = F.when(
            F.size(tokens_col) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tokens_col) - n),
                lambda i: F.array_join(F.slice(tokens_col, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        sh = F.explode(grams).alias("shingle")
    return docs.select("doc_id", sh).distinct()


def exact_duplicates(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    max_ids_per_group: int | None = 1000,
    num_salt_shards: int = 16,
) -> DataFrame:
    """Exact dedup on a content digest -> (digest, n_docs, doc_ids,
    keep_doc_id) for groups with more than one member. One hash-shuffle;
    digest grouping beats grouping on raw content (shuffle carries 32
    bytes/row, not documents).

    ``max_ids_per_group`` bounds the ``doc_ids`` sample per digest (a
    degenerate boilerplate document duplicated 10^9 times must not
    materialize a 10^9-element aggregation buffer on one reducer);
    ``n_docs`` and ``keep_doc_id`` stay exact for every group. ``None``
    collects all ids (small-corpus convenience).

    The sample is taken in two salted stages so even a degenerate digest
    never funnels its whole group through one reducer's sort: stage 1
    keeps the ``max_ids_per_group`` smallest ids per
    (digest, mix(doc_id) % num_salt_shards) — each reducer sees at most
    group/S rows — and stage 2 merges the <= S * max survivors per
    digest (a bounded group by construction). The union of per-salt
    smallest-m sets contains the global smallest m, so the final sample
    is identical to the unsalted single-sort result."""
    from ..functions.hashing import mix_shard_expr

    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(content_col)).alias("digest"),
    )
    if max_ids_per_group is None:
        kept = hashed
    else:
        salted = hashed.withColumn(
            "_salt", mix_shard_expr("doc_id", num_salt_shards)
        )
        w1 = Window.partitionBy("digest", "_salt").orderBy("doc_id")
        partial = (
            salted.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= max_ids_per_group)
            .drop("_rn", "_salt")
        )
        w2 = Window.partitionBy("digest").orderBy("doc_id")
        kept = (
            partial.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= max_ids_per_group)
            .drop("_rn")
        )
    groups = hashed.groupBy("digest").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("keep_doc_id"),
    )
    ids = kept.groupBy("digest").agg(
        F.sort_array(F.collect_list("doc_id")).alias("doc_ids")
    )
    return (
        groups.join(ids, "digest")
        .filter(F.col("n_docs") > 1)
        .select("digest", "n_docs", "doc_ids", "keep_doc_id")
    )


def shingle_ids(shingles: DataFrame, id_mode: str = "hash") -> DataFrame:
    """Assign deterministic integer ids to shingles.

    ``id_mode="hash"`` (default, the scale path): first 60 bits of
    md5(shingle) — a stateless projection, no shuffle, no vocabulary
    materialization; DuckDB replays it as
    ``('0x' || substr(md5(shingle), 1, 15))::BIGINT``.

    ``id_mode="rank"`` (tests/debugging ONLY): dense_rank over the
    sorted distinct vocabulary — a single-reducer global sort that does
    not survive a billion-shingle corpus."""
    if id_mode == "hash":
        return shingles.withColumn(
            "shingle_id",
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long"),
        )
    if id_mode != "rank":
        raise ValueError(f"unknown id_mode: {id_mode}")
    vocab = shingles.select("shingle").distinct()
    w = Window.orderBy("shingle")
    ids = vocab.withColumn(
        "shingle_id", F.dense_rank().over(w).cast("long")
    )
    return shingles.join(ids, "shingle")


def _perm_hash(a, b, sid):
    """(a * (sid mod p) + b) mod p — reduce BEFORE multiplying so 60-bit
    hash ids cannot overflow int64 under ANSI mode (a < 2^21, sid mod p
    < 2^31 -> product < 2^52)."""
    return (a * (sid % F.lit(MERSENNE_P)) + b) % F.lit(MERSENNE_P)


DEFAULT_MAX_SHINGLE_DF = 10_000


def jaccard_pairs(
    docs: DataFrame,
    tokens_col: str = "tokens",
    shingle_size: int = 1,
    threshold: float = 0.5,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    log=None,
) -> DataFrame:
    """All-pairs token/n-gram Jaccard >= threshold via inverted join.

    ``max_shingle_df`` (skew guard, ON by default — a stop-shingle in
    every doc would square the corpus) bounds CANDIDATE generation only:
    pairs are proposed by shingles with df <= cap, then verified against
    the FULL shingle sets, so every reported jaccard value is exact. A
    true pair is missed only if every shingle it shares has df > cap —
    at a high-threshold dedup setting such a pair shares many shingles
    and the chance all of them are corpus-wide stop-shingles is
    negligible; raise the cap (or pass None for the exact-but-quadratic
    -in-the-worst-key path) if the corpus says otherwise.

    ``log``: optional callable; when set (and the cap is active) a small
    extra aggregation reports how many distinct shingles the cap
    dropped — never silently truncate coverage."""
    sh = tokens_or_shingles(docs, tokens_col, shingle_size)
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("set_size")
    )
    if max_shingle_df is None:
        cand_sh = sh
    else:
        dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
        if log is not None:
            n_dropped = dfc.filter(
                F.col("sdf") > max_shingle_df
            ).count()
            log(
                f"jaccard_pairs: max_shingle_df={max_shingle_df} dropped "
                f"{n_dropped} distinct shingles from candidate generation"
            )
        cand_sh = sh.join(
            dfc.filter(F.col("sdf") <= max_shingle_df), "shingle"
        ).select("doc_id", "shingle")
    a = cand_sh.select(F.col("doc_id").alias("a"), "shingle")
    b = cand_sh.select(F.col("doc_id").alias("b"), "shingle")
    if max_shingle_df is None:
        # single-pass: the inverted join already sees every shared shingle
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("common"))
        )
    else:
        # candidates from capped shingles; intersection counted over the
        # FULL sets so the cap cannot bias the reported values
        cands = (
            a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        fa = sh.select(F.col("doc_id").alias("a"), "shingle")
        fb = sh.select(F.col("doc_id").alias("b"), "shingle")
        inter = (
            cands.join(fa, "a")
            .join(fb, ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("common"))
        )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.col("size_a") + F.col("size_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _hash_params_df(spark, num_hashes: int) -> DataFrame:
    params = MINHASH_PARAMS[:num_hashes]
    if num_hashes > len(MINHASH_PARAMS):
        raise ValueError(f"at most {len(MINHASH_PARAMS)} hashes supported")
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(params)],
        "hash_id int, a long, b long",
    )


def minhash_signatures(
    docs: DataFrame,
    tokens_col: str = "tokens",
    num_hashes: int = 8,
    shingle_size: int = 1,
) -> DataFrame:
    """-> (doc_id, hash_id, min_hash): MinHash signature rows.
    h_i(x) = (a_i * (shingle_id mod p) + b_i) mod p, per-doc min."""
    sh = shingle_ids(tokens_or_shingles(docs, tokens_col, shingle_size))
    spark = docs.sparkSession
    params = _hash_params_df(spark, num_hashes)
    return (
        sh.crossJoin(F.broadcast(params))
        .withColumn(
            "h", _perm_hash(F.col("a"), F.col("b"), F.col("shingle_id"))
        )
        .groupBy("doc_id", "hash_id")
        .agg(F.min("h").alias("min_hash"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    tokens_col: str = "tokens",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_size: int = 1,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band the signature (num_hashes /
    band_size bands), bucket-join docs agreeing on a full band, then
    VERIFY candidates with exact Jaccard >= threshold. The bucket join
    replaces the quadratic all-pairs with |docs per identical band
    bucket| fan-out."""
    sig = minhash_signatures(docs, tokens_col, num_hashes, shingle_size)
    banded = sig.withColumn(
        "band", (F.col("hash_id") / band_size).cast("int")
    )
    band_key = banded.groupBy("doc_id", "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("hash_id", "min_hash"))
                ),
                lambda s: s["min_hash"].cast("string"),
            ),
            "_",
        ).alias("bucket")
    )
    l = band_key.select(F.col("doc_id").alias("a"), "band", "bucket")
    r = band_key.select(F.col("doc_id").alias("b"), "band", "bucket")
    cands = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # verify candidates with exact Jaccard (join back to shingle sets)
    sh = tokens_or_shingles(docs, tokens_col, shingle_size)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    sa = sh.select(F.col("doc_id").alias("a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cands.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    za = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("size_a"))
    zb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("size_b"))
    return (
        inter.join(za, "a")
        .join(zb, "b")
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.col("size_a") + F.col("size_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _md5_hash64(col):
    """Full-width 64-bit deterministic hash of a string column, built
    from two 32-bit md5 halves with overflow-free arithmetic (ANSI-safe;
    DuckDB replays it as
    ``(CASE WHEN hi >= 2^31 THEN hi - 2^32 ELSE hi END) * 2^32 + lo``
    over ``('0x'||substr(md5(x), off, 8))::BIGINT`` halves — verified
    bit-identical)."""
    lo = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    hi = F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("long")
    hi_signed = hi - F.when(hi >= F.lit(2**31), F.lit(2**32)).otherwise(
        F.lit(0)
    )
    return hi_signed * F.lit(2**32) + lo


def simhash(
    docs: DataFrame,
    tokens_col: str = "tokens",
    num_bits: int = 64,
    hash_a: int = 1203077,
    hash_b: int = 52512857,
) -> DataFrame:
    """-> (doc_id, simhash): per-bit weighted majority fingerprint.
    Each distinct shingle votes tf=1 per bit of its hash; bit set iff
    the +1/-1 vote sum is positive. Near-dups share most bits.

    ``num_bits > 32`` (the 64-bit default) hashes the shingle string
    with the full-width md5-derived hash (the 31-bit permutation hash
    would leave bits 31+ permanently unset); <= 32 keeps the legacy
    (a * sid + b) mod p construction over 60-bit shingle ids."""
    if num_bits > 32:
        sh = tokens_or_shingles(docs, tokens_col, 1)
        hashed = sh.withColumn("h", _md5_hash64("shingle"))
    else:
        sh = shingle_ids(tokens_or_shingles(docs, tokens_col, 1))
        hashed = sh.withColumn(
            "h", _perm_hash(F.lit(hash_a), F.lit(hash_b), F.col("shingle_id"))
        )
    bits = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(num_bits - 1))).alias("bit"),
        "h",
    ).withColumn(
        # (h >> bit) & 1 — mask, not % 2: an arithmetic shift of a
        # negative 64-bit hash yields a negative value whose % 2 is -1
        "vote",
        F.when(F.expr("(shiftright(h, bit) & 1) = 1"), 1).otherwise(-1),
    )
    per_bit = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    # shiftleft(1, 63) wraps to -2^63 (bit ops are exempt from ANSI
    # overflow checks) — exactly the signed bit pattern we want; each
    # power appears at most once per doc so the sum cannot overflow
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


DEFAULT_MAX_BUCKET_SIZE = 100_000


def simhash_pairs(
    sim: DataFrame,
    max_hamming: int = 3,
    num_bits: int = 64,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    log=None,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance -> (a, b, hamming).
    Candidate generation buckets on bit-chunks (pigeonhole: distance
    <= d -> some chunk of d+1 chunks matches exactly), then verifies
    the true distance with bit_count(xor).

    Scale shape: with the 64-bit default and max_hamming=3 each of the
    4 chunks has 16 bits -> 65,536 distinct bucket values per chunk, so
    the per-bucket self-join is ~(n / 65,536)^2 instead of the old
    32-bit (n / 256)^2. ``max_bucket_size`` (ON by default) drops
    pathological buckets — a chunk value shared by half the corpus
    (e.g. a boilerplate prefix forcing a constant chunk) — from
    CANDIDATE generation only; reported pairs are always verified
    exact. ``log``: optional callable reporting how many buckets the
    cap dropped — never silently truncate coverage."""
    n_chunks = max_hamming + 1
    chunk_bits = max(1, num_bits // n_chunks)
    mask = (1 << chunk_bits) - 1
    chunks = sim.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("chunk"),
    ).withColumn(
        # arithmetic shift then low-bit mask == logical shift extract
        # (identical in DuckDB, whose >> is also arithmetic)
        "chunk_val",
        F.expr(f"shiftright(simhash, chunk * {chunk_bits}) & {mask}"),
    )
    if max_bucket_size is not None:
        bsz = chunks.groupBy("chunk", "chunk_val").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        if log is not None:
            n_dropped = bsz.filter(F.col("_bn") > max_bucket_size).count()
            log(
                f"simhash_pairs: max_bucket_size={max_bucket_size} dropped "
                f"{n_dropped} pigeonhole buckets from candidate generation"
            )
        chunks = chunks.join(
            bsz.filter(F.col("_bn") <= max_bucket_size),
            ["chunk", "chunk_val"],
        ).select("doc_id", "simhash", "chunk", "chunk_val")
    l = chunks.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("ha"),
        "chunk", "chunk_val",
    )
    r = chunks.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("hb"),
        "chunk", "chunk_val",
    )
    cands = (
        l.join(r, ["chunk", "chunk_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    return cands.withColumn(
        "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    ).filter(F.col("hamming") <= max_hamming).select("a", "b", "hamming")
