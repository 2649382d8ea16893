"""Storage-layout optimization: Z-order (Morton) clustering for
multi-dimensional data skipping.

At 100 TB the scan planner prunes row groups by min/max column stats;
sorting by ONE column gives perfect skipping on that column and none
on the others. Interleaving the bits of several low-cardinality
dimension keys (the Morton curve) and range-partitioning + sorting by
that single z-value gives every dimension locality proportional to
its bit share — the layout behind Delta's OPTIMIZE ZORDER BY and
Iceberg's sort orders, re-expressed as plain Spark: compute z, then
``repartitionByRange(z).sortWithinPartitions(z)`` before the write.

The z-value is pure integer bit arithmetic — deterministic and
engine-portable (same expression in Spark SQL and DuckDB), so the
layout decision itself is oracle-checkable even though the physical
file placement is not.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_value",
    "zorder_layout",
    "docvalues_report",
    "postings_encoding_report",
]


def zorder_value(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton interleave of ``len(cols)`` non-negative integer keys,
    ``bits`` bits each (keys are masked to that width first). Bit b of
    dimension d lands at position b*len(cols) + d — the standard
    z-curve. Build is a compile-time loop emitting one OR-chain of
    shift/mask terms: all whole-stage-codegen, no UDF.
    -> long z in [0, 2^(bits*len(cols)))."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 dimensions")
    if bits * n > 62:
        raise ValueError("bits * dims must stay under 63")
    mask = (1 << bits) - 1
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long")
        .bitwiseAND(F.lit(mask))
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(cs):
            # bit b of dim d -> position b*n + d, as mask-test *
            # literal power of two (Spark 4 ANSI rejects Column shift
            # counts; a boolean-cast multiply sidesteps shifts and is
            # identical integer arithmetic in DuckDB)
            term = (
                c.bitwiseAND(F.lit(1 << b)) != 0
            ).cast("long") * F.lit(1 << (b * n + d))
            z = z + term
    return z.cast("long")


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
    z_col: str = "z",
) -> DataFrame:
    """Attach the z-value and return the frame range-partitioned and
    sorted by it — ready for a parquet write whose row-group min/max
    stats prune on EVERY interleaved dimension. One range shuffle
    (sampled boundaries) + local sort, the same cost as any global
    orderBy; downstream writes preserve the order."""
    out = df.withColumn(z_col, zorder_value(list(cols), bits=bits))
    if num_partitions:
        out = out.repartitionByRange(num_partitions, z_col)
    else:
        out = out.repartitionByRange(z_col)
    return out.sortWithinPartitions(z_col)


def docvalues_report(
    docs: DataFrame, columns: list[str], max_bits: int = 20
) -> DataFrame:
    """Columnar (DocValues) encoding selection — the sizing pass
    behind Lucene's SortedDocValues-vs-BinaryDocValues choice and
    every columnar format's dictionary-encoding heuristic (Parquet
    dictionary pages, Lucene90DocValuesFormat's TABLE_COMPRESSED
    threshold): per string column, compare storing raw bytes per doc
    against a dictionary (distinct values' bytes) plus bit-packed
    per-doc ordinals.

      bits_per_value = smallest b with 2^b >= n_distinct (0 for a
                       constant column) — an all-integer CASE chain,
                       never log2 floats cross-engine
      raw_bytes      = sum(octet_length(col))
      dict_bytes     = sum(octet_length(distinct values))
                       + ceil(n_docs * bits / 8)
      encoding       = 'dict' when dict_bytes < raw_bytes else 'raw'

    -> one row per column: (col_name, n_docs, n_distinct,
    bits_per_value, raw_bytes, dict_bytes, encoding). All integers.

    Plan shape: per column, one scan-level aggregate (count + exact
    distinct + byte sum) and one distinct-values byte sum — both
    map-side combinable; rows united. NULLs count 0 bytes and do not
    join the dictionary (the usual missing-ordinal slot)."""
    parts = []
    for c in columns:
        base = docs.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
            F.coalesce(F.sum(F.octet_length(F.col(c))), F.lit(0))
            .cast("long")
            .alias("raw_bytes"),
        )
        dict_b = (
            docs.select(F.col(c).alias("_v"))
            .filter(F.col("_v").isNotNull())
            .distinct()
            .agg(
                F.coalesce(F.sum(F.octet_length(F.col("_v"))), F.lit(0))
                .cast("long")
                .alias("_db")
            )
        )
        nd = F.col("n_distinct")
        bits = F.lit(int(max_bits))
        for b in range(int(max_bits) - 1, -1, -1):
            bits = F.when(nd <= F.lit(1 << b), F.lit(b)).otherwise(bits)
        row = base.crossJoin(F.broadcast(dict_b)).select(
            F.lit(c).alias("col_name"),
            "n_docs",
            "n_distinct",
            bits.cast("long").alias("bits_per_value"),
            "raw_bytes",
            (
                F.col("_db")
                + F.floor(
                    (F.col("n_docs") * bits + F.lit(7)) / F.lit(8)
                ).cast("long")
            ).alias("dict_bytes"),
        )
        parts.append(row)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "encoding",
        F.when(F.col("dict_bytes") < F.col("raw_bytes"), F.lit("dict"))
        .otherwise(F.lit("raw")),
    )


def postings_encoding_report(
    postings: DataFrame,
    term_col: str = "term",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-term postings encoding selection — the sizing pass behind a
    posting-list format choice (Lucene's FOR/varbyte .doc blocks,
    Elias-Fano in its newer `IndexedDISI`-era formats, and Roaring's
    array-vs-bitmap container pick): for each term's sorted doc-id
    list, compare three layouts byte for byte and pick the smallest.

      varbyte_bytes = Σ vb(gap) — first id ABSOLUTE, then deltas (the
                      engine codec's convention, operators/codec.py);
                      vb(v) = #7-bit groups, an all-integer CASE chain
      ef_bytes      = ceil((n·l + n + (U >> l)) / 8) — classic
                      Elias-Fano (Vigna WSDM'13 quasi-succinct
                      indices): l = max(0, floor(log2(U div n))) low
                      bits per doc plus the unary upper-bit stream
      bitmap_bytes  = ceil(U / 8) — the dense bitset
      best          = argmin with ties varbyte < elias_fano < bitmap

    with U = max doc_id + 1 the term's local universe. Every quantity
    is integer arithmetic (both log-like values are literal CASE
    chains — never float log2 cross-engine), so the report is exactly
    engine-portable. -> (term, df, universe, varbyte_bytes, ef_bytes,
    bitmap_bytes, best).

    Scale shape: one per-term window (lag) over the postings for the
    gaps — partition-parallel by term, the same silhouette as the
    codec writer itself — then one map-side-combined groupBy(term).
    The skew caveat is the codec's (a stopword's window is its df);
    at 100 TB the salted-shard layout (wand.py) bounds it, and this
    report runs per (term, salt) there unchanged."""
    from pyspark.sql import Window

    p = postings.select(
        F.col(term_col).alias("term"),
        F.col(id_col).cast("long").alias("_id"),
    )
    w = Window.partitionBy("term").orderBy("_id")
    delta = F.when(
        F.lag("_id").over(w).isNull(), F.col("_id")
    ).otherwise(F.col("_id") - F.lag("_id").over(w))
    # varbyte length: v < 2^7 -> 1, v < 2^14 -> 2, ...; the ELSE 9
    # covers [2^56, 2^63) — a 2^63 literal would overflow long —
    # and v = 0 takes the first branch
    vb = F.lit(9)
    for k in range(8, 0, -1):
        vb = F.when(F.col("_d") < F.lit(1 << (7 * k)), F.lit(k)).otherwise(vb)
    per = (
        p.select("term", "_id", delta.alias("_d"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            (F.max("_id") + 1).cast("long").alias("universe"),
            F.sum(vb).cast("long").alias("varbyte_bytes"),
        )
    )
    q = F.expr("universe DIV df")
    lg = F.lit(62)
    for i in range(62, 0, -1):
        lg = F.when(q < F.lit(1 << i), F.lit(i - 1)).otherwise(lg)
    sized = per.select(
        "term",
        "df",
        "universe",
        "varbyte_bytes",
        lg.cast("long").alias("_l"),
    ).select(
        "term",
        "df",
        "universe",
        "varbyte_bytes",
        F.expr(
            "(df * _l + df + shiftright(universe, cast(_l as int)) + 7)"
            " DIV 8"
        )
        .cast("long")
        .alias("ef_bytes"),
        F.expr("(universe + 7) DIV 8").cast("long").alias("bitmap_bytes"),
    )
    return sized.withColumn(
        "best",
        F.when(
            (F.col("varbyte_bytes") <= F.col("ef_bytes"))
            & (F.col("varbyte_bytes") <= F.col("bitmap_bytes")),
            F.lit("varbyte"),
        )
        .when(F.col("ef_bytes") <= F.col("bitmap_bytes"), F.lit("elias_fano"))
        .otherwise(F.lit("bitmap")),
    )


def term_dict_frontcoding_report(
    term_stats: DataFrame,
    term_col: str = "term",
    max_prefix: int = 16,
) -> DataFrame:
    """Term-dictionary front-coding sizing — the prefix compression
    behind Lucene's BlockTree terms dictionary (shared-prefix blocks)
    and every sorted-string-table format (RocksDB/LevelDB key prefix
    compression): in sorted order each term stores one prefix-length
    byte plus only the suffix after its common prefix with the
    PREVIOUS term.

      prefix_len    = |common prefix with prev|, capped at
                      ``max_prefix`` (a 1-byte length field's world;
                      the cap only makes the estimate conservative)
      encoded_bytes = 1 + (term_bytes − prefix_len)

    The common-prefix length is Σ_{i=1..max_prefix}
    [substr(term,1,i) = substr(prev,1,i)] — a literal unrolled chain,
    exact because prefix equality is monotone in i; identical
    expression on both engines, no UDF. -> (term, term_bytes,
    prefix_len, encoded_bytes); the dictionary totals and savings
    fraction are one aggregate downstream.

    Plan shape: ONE global window ordered by term — the vocabulary is
    dictionary-sized, the repo's documented small-relation
    global-window exception (the same exception the real BlockTree
    writer enjoys: the term dict is written single-threaded per
    segment); everything else is scan-local."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("term").asc())
    t = term_stats.select(F.col(term_col).alias("term"))
    prev = F.lag("term").over(w)
    plen = F.lit(0)
    for i in range(1, int(max_prefix) + 1):
        plen = plen + (
            F.substring(F.col("term"), 1, i) == F.substring(prev, 1, i)
        ).cast("int")
    return (
        t.withColumn("_prev", prev)
        .select(
            "term",
            F.octet_length("term").cast("long").alias("term_bytes"),
            F.when(F.col("_prev").isNull(), F.lit(0))
            .otherwise(plen)
            .cast("long")
            .alias("prefix_len"),
        )
        .select(
            "term",
            "term_bytes",
            "prefix_len",
            (F.lit(1) + F.col("term_bytes") - F.col("prefix_len"))
            .cast("long")
            .alias("encoded_bytes"),
        )
    )


def scan_pruning_report(
    df: DataFrame,
    value_col: str,
    file_col: str,
    lo: int,
    hi: int,
) -> DataFrame:
    """Zone-map (min/max) data-skipping simulation — the pruning math
    of Parquet row-group statistics, Iceberg manifest file ranges and
    Delta data skipping, made checkable: given a file assignment
    (``file_col``) and a range predicate ``lo <= value <= hi``, a file
    is PRUNED exactly when ``vmax < lo OR vmin > hi``. The report
    carries the correctness invariant alongside the decision —
    ``n_matching`` (rows actually in range) MUST be 0 in every pruned
    file — so the oracle checks the skipping logic, not just the
    stats. -> (file_id, n_rows, vmin, vmax, n_matching, pruned).

    The interesting quantity downstream is the pruned fraction under
    different LAYOUTS: a range/z-order-clustered assignment
    (`zorder_layout`) prunes most files; a hash layout prunes none —
    the measurable argument for clustering before the write at 100 TB,
    where every non-pruned file is a scan task.

    Plan shape: ONE map-side-combined groupBy(file) over the scan;
    all decisions are integer comparisons."""
    v = F.col(value_col).cast("long")
    per = df.groupBy(F.col(file_col).alias("file_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.sum(
            ((v >= F.lit(int(lo))) & (v <= F.lit(int(hi)))).cast("long")
        )
        .cast("long")
        .alias("n_matching"),
    )
    return per.withColumn(
        "pruned",
        (F.col("vmax") < F.lit(int(lo)))
        | (F.col("vmin") > F.lit(int(hi))),
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    partition_col: str = "partition",
    file_col: str = "file_id",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Small-file compaction planning — the grouping pass of Iceberg's
    rewrite_data_files / Delta OPTIMIZE (and Lucene's size-tiered
    merge selection at the spirit level): within each partition,
    assign files to merge groups of ~``target_bytes`` by deterministic
    bin-fill — files in (size DESC, file_id ASC) order, a file joins
    group floor(running_bytes_before / target). Already-target-sized
    files land first and occupy whole groups by themselves; the small-
    file tail packs together — the behavior a rewrite job wants.

    -> (partition, file_id, size_bytes, group_id, group_seq) — all
    integers, engine-exact (the bin-fill is a prefix-sum rule, not a
    solver; optimal packing is a bin-packing problem and compaction
    only needs 'roughly target-sized groups').

    Plan shape: ONE per-partition window (prefix sum + row_number) —
    the partition is the natural parallelism unit exactly as in the
    real table-maintenance job; group totals are one aggregate
    downstream."""
    from pyspark.sql import Window

    w = Window.partitionBy(partition_col).orderBy(
        F.col(size_col).desc(), F.col(file_col).asc()
    )
    cum_before = F.coalesce(
        F.sum(size_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return files.select(
        F.col(partition_col).alias("partition"),
        F.col(file_col).alias("file_id"),
        F.col(size_col).cast("long").alias("size_bytes"),
        F.floor(cum_before / F.lit(int(target_bytes)))
        .cast("long")
        .alias("group_id"),
        F.row_number().over(w).cast("long").alias("group_seq"),
    )


def cache_plan(
    term_costs: DataFrame,
    budget_bytes: int,
    term_col: str = "term",
    bytes_col: str = "bytes",
    freq_col: str = "qfreq",
) -> DataFrame:
    """Hot posting-list cache planning — the value-density greedy
    behind every term-cache / tiered-storage budget decision (keep the
    posting lists the query log hits most, per byte): terms sort by an
    all-INTEGER density key floor(qfreq·10⁶ / bytes) (the fixed-point
    ratio — never a float ratio in an ORDER BY) and fill the byte
    budget by prefix: a term is cached when the cumulative bytes
    THROUGH it stay within budget (first-fit by density; a huge
    low-density list simply doesn't fit — later smaller terms may
    still enter, which plain prefix-cut forgoes: documented greedy
    simplification, the knapsack is not relational).
    -> (term, bytes, qfreq, density_key, cum_bytes, cached).

    Plan shape: one global window over the VOCAB-sized relation (the
    documented exception); everything else scan-local integers."""
    from pyspark.sql import Window

    t = term_costs.select(
        F.col(term_col).alias("term"),
        F.col(bytes_col).cast("long").alias("bytes"),
        F.col(freq_col).cast("long").alias("qfreq"),
    ).withColumn(
        "density_key",
        F.expr("div(qfreq * 1000000, bytes)").cast("long"),
    )
    w = Window.orderBy(
        F.col("density_key").desc(), F.col("term").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t.withColumn(
        "cum_bytes", F.sum("bytes").over(w).cast("long")
    ).withColumn(
        "cached", F.col("cum_bytes") <= F.lit(int(budget_bytes))
    )
