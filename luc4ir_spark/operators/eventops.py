"""Event-time operators over an append-only event log.

The reference is a static-corpus IR engine with no notion of event
time; a 100 TB training-data pipeline, however, ingests click/impression
logs continuously, and these are the two batch-verifiable primitives
that pipeline needs (their Structured Streaming twins share the same
expressions — `F.window` is the streaming tumbling window operator, and
the sessionize expression is what `applyInPandasWithState` would
maintain incrementally):

- ``tumbling_window_stats``: per (time bucket, event_type) counts and
  value aggregates. One hash shuffle on a low-cardinality composite key
  with map-side partial aggregation — the same plan at any scale.
- ``sessionize``: gaps-and-islands sessionization per user: a lag
  window PARTITIONED BY user_id (never a global window — per-user
  partitions bound every sort), a running flag sum to number sessions,
  then a per-session aggregate.

Both are deterministic and replayed exactly by the DuckDB oracle: event
times are compared as INTEGER microseconds via timezone-free calendar
arithmetic (`timestampdiff(MICROSECOND, epoch, ts)` == DuckDB
`epoch_us(ts)` for naive timestamps) — no float epochs, no session-
timezone dependence, no ANSI cast restrictions on TIMESTAMP_NTZ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(ts_col: str) -> Column:
    """Timezone-free microseconds since 1970-01-01 00:00:00 for a
    TIMESTAMP_NTZ (or TIMESTAMP) column — pure calendar arithmetic,
    allowed under ANSI mode where a direct numeric cast is not."""
    return F.expr(
        f"timestampdiff(MICROSECOND,"
        f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )


def tumbling_window_stats(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """-> (window_start timestamp, event_type, n_events, sum_value,
    avg_value) per tumbling window. `F.window` is the exact expression
    a `readStream` variant would use with a watermark."""
    win = F.window(F.col(ts_col), window)
    return (
        events.groupBy(win.alias("w"), F.col(type_col).alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Gaps-and-islands sessions: a new session starts when a user's
    inter-event gap exceeds ``gap_seconds``. -> (user_id, session_id,
    n_events, start_us, end_us, sum_value) with session bounds as exact
    integer microseconds; session ids are 1-based per user in time
    order. All windows are partitioned by user (bounded per-user sorts,
    no global window); ties broken by event id."""
    gap_us = int(gap_seconds * 1_000_000)
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        epoch_us(ts_col).alias("t_us"),
        F.col(value_col).alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("t_us").over(w)
    flagged = base.withColumn(
        "ns",
        (prev.isNull() | ((F.col("t_us") - prev) > F.lit(gap_us)))
        .cast("int"),
    )
    with_sid = flagged.withColumn(
        "session_id", F.sum("ns").over(run).cast("long")
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("t_us").alias("start_us"),
            F.max("t_us").alias("end_us"),
            F.sum("value").alias("sum_value"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention matrix — the classic event-analytics rollup: a
    user's cohort is their first active DAY; each (cohort, day-offset)
    cell counts the distinct cohort users active that many days later.
    -> (cohort_day 'yyyy-MM-dd', day_offset, n_users).

    Plan: one distinct (user, day) projection, a per-user min (both
    map-side-combinable), one broadcastable first-day join back, and
    the final count agg — two shuffles total, all keyed on user/cohort
    (never event-sized after the first distinct). At 100 TB the
    distinct is the only event-volume pass."""
    day = F.date_trunc("day", F.col(ts_col))
    per = (
        events.select(F.col(user_col).alias("u"), day.alias("d"))
        .distinct()
    )
    first = per.groupBy("u").agg(F.min("d").alias("c"))
    return (
        per.join(first, "u")
        .select(
            F.date_format("c", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("d").cast("date"), F.col("c").cast("date"))
            .cast("long")
            .alias("day_offset"),
            "u",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("u").cast("long").alias("n_users"))
    )


def json_prop_stats(
    events: DataFrame,
    prop: str = "k",
    props_col: str = "props",
    group_col: str = "event_type",
) -> DataFrame:
    """Semi-structured event properties: extract ``$.prop`` from the
    JSON string column with the JVM json path evaluator (no UDF, no
    schema inference pass) and aggregate per group. -> (group, n,
    p_sum, p_avg). The extraction is a pure codegen projection — the
    standard way to keep rarely-read JSON baggage out of the parquet
    schema while still aggregating over it at scan speed."""
    v = F.get_json_object(F.col(props_col), f"$.{prop}").cast("long")
    return events.select(
        F.col(group_col).alias("grp"), v.alias("_v")
    ).groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_v").alias("p_sum"),
        F.avg("_v").alias("p_avg"),
    )


def attribution_pairs(
    events: DataFrame,
    window_seconds: float = 600.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    click_type: str = "click",
    view_type: str = "view",
) -> DataFrame:
    """Click-through attribution candidates: every (click, view) pair
    by the same user where the view happened AT OR BEFORE the click
    and within ``window_seconds`` of it — the batch twin of the
    Structured Streaming stream-stream interval join
    (streaming/attribution_stream.py). -> (user_id, click_id,
    view_id, click_us, view_us), integer microseconds.

    Plan: a per-user equi-join with a time-range residual — per-user
    event counts bound the fan-out, so the shuffle key is the user id,
    never time; a skewed mega-user would be handled by the same salting
    pattern as the index build (not needed at gate scale)."""
    win_us = int(window_seconds * 1_000_000)
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("etype"),
        epoch_us(ts_col).alias("t_us"),
    )
    clicks = base.filter(F.col("etype") == click_type).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("t_us").alias("click_us"),
    )
    views = base.filter(F.col("etype") == view_type).select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("t_us").alias("view_us"),
    )
    return clicks.join(views, "user_id").filter(
        (F.col("view_us") <= F.col("click_us"))
        & (F.col("click_us") - F.col("view_us") <= F.lit(win_us))
    ).select("user_id", "click_id", "view_id", "click_us", "view_us")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time_us: str,
    right_time_us: str,
    payload_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """Point-in-time (backward as-of) join: for every left row, attach
    the payload of the single right row with the same ``key`` and the
    greatest ``right_time_us`` <= ``left_time_us`` — the lookup a
    feature store / training-label join needs for point-in-time
    correctness, and an operator Spark has no built-in for.
    ``tolerance_us`` bounds the lookback (a match older than the
    tolerance is nulled out, pandas.merge_asof semantics).

    Both time columns must be INTEGER microseconds (``epoch_us``) —
    integer ordering is engine-exact and avoids ANSI timestamp-cast
    rules. Right-side (key, time) ties must be resolved upstream
    (dedupe to one row per key+time): the carry picks an arbitrary
    member of a surviving tie.

    Plan shape — the scalable re-expression: UNION the two relations
    with a side tag, ONE window per key ordered by (time, side) with
    right rows sorting before left rows at equal times (so an
    exactly-simultaneous right row matches the <=), and carry the
    last non-null payload forward (``F.last ignorenulls`` over
    unboundedPreceding). One shuffle + one sort, both partitioned by
    key — no range join, no per-left-row subquery, no cartesian
    fan-out; skewed keys cost what any per-key window costs and can
    be salted upstream if a single user dominates.

    -> left rows + payload_cols (+ ``asof_time_us`` of the matched
    right row; all null when nothing qualifies)."""
    l2 = (
        left.withColumn("_t", F.col(left_time_us).cast("long"))
        .withColumn("_side", F.lit(0))
    )
    r2 = (
        right.select(
            key,
            F.col(right_time_us).cast("long").alias("_t"),
            *payload_cols,
        )
        .withColumn("_side", F.lit(1))
        .withColumn("_rt", F.col("_t"))
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(c, ignorenulls=True).over(w).alias(f"_c_{c}")
        for c in payload_cols
    ]
    u = u.select(
        "*", F.last("_rt", ignorenulls=True).over(w).alias("_c_rt"), *carried
    ).filter(F.col("_side") == 0)
    ok = F.col("_c_rt").isNotNull()
    if tolerance_us is not None:
        ok = ok & (F.col("_t") - F.col("_c_rt") <= int(tolerance_us))
    keep = [c for c in left.columns]
    return u.select(
        *keep,
        *[
            F.when(ok, F.col(f"_c_{c}")).alias(c)
            for c in payload_cols
        ],
        F.when(ok, F.col("_c_rt")).alias("asof_time_us"),
    )


def hypertable_rollup(
    events: DataFrame,
    dims: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Multi-granularity continuous-aggregate rollup over an event
    hypertable (the TimescaleDB rollup / Druid granularity-cascade
    shape): ONE Catalyst rollup pass emits every prefix level of
    (dims..., day, hour) — per-hour leaves, per-day subtotals,
    per-dim totals and the grand total — instead of four separate
    scans. Rollup is a single shuffle whose partial aggregation
    happens map-side for all levels at once; at 100 TB this is the
    difference between one pass and one pass per granularity.

    Aggregates: event count and the value sum in integer CENTS
    (round(value*100) per row, summed as BIGINT) — an integer sum is
    fold-order-exact across engines and partitionings, where a double
    sum of the raw values could flip a 4dp rounding boundary under a
    different reduce order. NULL subtotal keys are coalesced to -1
    (times) / '(all)' (dims): event times are never null, so the
    sentinel is unambiguous.
    -> (dims..., day_us, hour_us, n, sum_value_cents)."""
    dims = list(dims or [])
    base = events.select(
        *dims,
        epoch_us(f"date_trunc('DAY', {ts_col})").alias("day_us"),
        epoch_us(f"date_trunc('HOUR', {ts_col})").alias("hour_us"),
        F.round(F.col(value_col) * 100, 0).cast("long").alias("_cents"),
    )
    out = base.rollup(*dims, "day_us", "hour_us").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_cents").cast("long").alias("sum_value_cents"),
    )
    return out.select(
        *[F.coalesce(F.col(d), F.lit("(all)")).alias(d) for d in dims],
        F.coalesce(F.col("day_us"), F.lit(-1)).cast("long").alias("day_us"),
        F.coalesce(F.col("hour_us"), F.lit(-1)).cast("long")
        .alias("hour_us"),
        "n",
        "sum_value_cents",
    )


def hopping_window_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hopping (sliding) event-time windows — ``F.window`` with a
    slide shorter than the width, so each event lands in
    width/slide overlapping windows (the Flink/KSQL HOPPING window;
    the streaming twin is the same expression under a watermark).
    -> (window_start, event_type, n_events, sum_value) per window.

    Plan: Spark's TimeWindow generator expands each row into its
    width/slide window replicas BEFORE the hash aggregation — a
    constant fan-out (2x here), map-side combined, one shuffle on
    (window, type): the same shape as the tumbling operator."""
    win = F.window(F.col(ts_col), window, slide)
    return (
        events.groupBy(win.alias("w"), F.col(type_col).alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis (the product-analytics staple —
    Amplitude/Mixpanel funnels, ClickHouse ``windowFunnel`` without
    the horizon): how many users performed step 1, then step 2 at or
    after it, then step 3 ... Greedy-earliest matching is exact here:
    an in-order chain exists iff the chain of earliest qualifying
    times exists. Ties (same timestamp, different step types) count —
    the chain condition is >= .
    -> (step, event_type, n_users), step 1-based; n_users is weakly
    decreasing.

    Plan: one filtered min-aggregation per step (k tiny), each joined
    user-on-user against the previous frontier — every relation is
    |users| rows after the first agg; no windows over the raw log, no
    per-user event buffers."""
    if not steps:
        raise ValueError("funnel_counts: empty steps")
    spark = events.sparkSession
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        epoch_us(ts_col).alias("us"),
    )
    frontier = None
    counts = []
    for i, step in enumerate(steps):
        cur = ev.filter(F.col("t") == step)
        if frontier is not None:
            cur = cur.join(frontier, "u").filter(
                F.col("us") >= F.col("_m")
            )
        frontier = cur.groupBy("u").agg(F.min("us").alias("_m"))
        counts.append(
            frontier.agg(
                F.count(F.lit(1)).cast("long").alias("n_users")
            ).select(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(step).alias("event_type"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over each user's
    time-ordered event stream — the "user paths" analytics primitive
    (what follows what): -> (src, dst, n_transitions). Ordering within
    a user is (event time, event_id) so same-instant events have a
    deterministic, engine-stable order.

    Plan: ONE lead() window partitioned by user (the shuffle is by
    user — the same key sessionize already shuffles on) + a map-side
    combined pair count; output is |type|^2-bounded."""
    w = Window.partitionBy(user_col).orderBy(
        epoch_us(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = events.select(
        F.col(type_col).alias("src"),
        F.lead(type_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )


def event_paths(
    events: DataFrame,
    length: int = 3,
    top_n: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-N behavioral paths of ``length`` consecutive events — the
    higher-order extension of `event_transitions`' first-order pairs
    (path/flow analysis: which 3-step journeys dominate; the flow
    diagrams product analytics draws): each user's time-ordered
    stream slides a length-k window via k−1 stacked lead()s over ONE
    user-partitioned window spec (one shuffle, the sessionize key),
    paths join with '>' into a key, counts rank by (n DESC, path ASC
    — all-integer-and-string, engine-stable). -> (path, n_paths,
    rank), rank <= top_n.

    Output is |type|^length-bounded BEFORE the top-n cut — at high
    type cardinality cap the alphabet upstream (the n-gram vocab
    argument); the final ordering runs over that bounded relation."""
    w = Window.partitionBy(user_col).orderBy(
        epoch_us(ts_col).asc(), F.col(id_col).asc()
    )
    cols = [F.col(type_col)]
    for i in range(1, int(length)):
        cols.append(F.lead(type_col, i).over(w))
    path = F.concat_ws(">", *cols)
    steps = events.select(
        path.alias("path"), cols[-1].alias("_last")
    ).filter(F.col("_last").isNotNull())
    counts = steps.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    rw = Window.orderBy(F.col("n_paths").desc(), F.col("path").asc())
    return (
        counts.withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= int(top_n))
        .select("path", "n_paths", "rank")
    )


def event_lift(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Market-basket association metrics over per-user event baskets
    (Agrawal, Imieliński & Swami SIGMOD'93): for every unordered
    event-type pair (a < b), the co-occurrence support, the a→b
    confidence, and the lift

      lift(a,b) = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)

    computed as ONE division of exact integer products — no float
    folds anywhere. lift > 1 = the types co-occur more than
    independence predicts. -> (type_a, type_b, n_ab, support,
    conf_a_b, lift).

    Plan shape: one distinct() to (user, type) baskets — map-side
    combinable — then a per-user self-join whose fan-out is bounded
    by (types-per-user choose 2), type-cardinality-sized aggregates,
    and a broadcast of the tiny per-type counts. The raw log is
    scanned once."""
    basket = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
    ).distinct()
    n_users = basket.select("user_id").distinct().count()
    per_type = basket.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    a = basket.select("user_id", F.col("etype").alias("type_a"))
    b = basket.select("user_id", F.col("etype").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    na = per_type.select(
        F.col("etype").alias("type_a"), F.col("n_t").alias("n_a")
    )
    nb = per_type.select(
        F.col("etype").alias("type_b"), F.col("n_t").alias("n_b")
    )
    n = F.lit(int(n_users)).cast("long")
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_ab",
            (F.col("n_ab").cast("double") / n.cast("double")).alias(
                "support"
            ),
            (
                F.col("n_ab").cast("double")
                / F.col("n_a").cast("double")
            ).alias("conf_a_b"),
            (
                (F.col("n_ab") * n).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


def k_anonymity_report(
    events: DataFrame,
    k: int = 5,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """k-anonymity audit over derived user profiles (Sweeney'02): the
    quasi-identifier is (activity bucket, dominant event type) — the
    kind of coarse behavioural profile an "anonymized" analytics
    export leaks — and every profile combination shared by fewer than
    ``k`` users is re-identification risk. Activity buckets are powers
    of two (the all-integer CASE chain, no log floats); the dominant
    type is max(count, type) with ties to the LATER type name
    (lexicographic struct max — deterministic on both engines).
    -> (activity_bucket, top_type, n_users, at_risk).

    Plan shape: two map-side-combined aggregates (user×type counts →
    user profiles) + one profile-cardinality-sized rollup. The raw log
    is scanned once."""
    prof = _user_type_profiles(events, user_col, type_col)
    combos = prof.select(
        _activity_bucket(F.col("_n")).cast("long").alias(
            "activity_bucket"
        ),
        F.col("_m.t").alias("top_type"),
    ).groupBy("activity_bucket", "top_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    return combos.withColumn(
        "at_risk", F.col("n_users") < F.lit(int(k))
    )


def _user_type_profiles(
    events: DataFrame, user_col: str, type_col: str
) -> DataFrame:
    """(user_id, _n total events, _m = max(struct(count, type))) — the
    shared profile derivation of the privacy audits; two map-side-
    combined aggregates, the raw log scanned once."""
    ut = events.groupBy(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return ut.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("_n"),
        F.max(
            F.struct(F.col("c").alias("c"), F.col("etype").alias("t"))
        ).alias("_m"),
    )


def _activity_bucket(n):
    """Power-of-two activity bucket as an all-integer CASE chain
    (never log2 floats cross-engine)."""
    bucket = F.lit(1 << 20)
    for bd in [1 << i for i in range(20)][::-1]:
        bucket = F.when(n <= F.lit(bd), F.lit(bd)).otherwise(bucket)
    return bucket


def l_diversity_report(
    events: DataFrame,
    l: int = 3,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. ICDE'06) —
    the attribute-disclosure complement of ``k_anonymity_report``: a
    class of users sharing a quasi-identifier can be k-anonymous yet
    still leak if (nearly) all of them share the same SENSITIVE value.
    Here the QI equivalence class is the power-of-two activity bucket
    and the sensitive attribute is the user's dominant event type (the
    same derivations as the k-audit, so the two reports describe the
    same release); a class exhibiting fewer than ``l`` distinct
    sensitive values is flagged. Distinct (not entropy) l-diversity
    keeps every output column integer-exact.
    -> (activity_bucket, n_users, n_sensitive, at_risk).

    Plan shape: the shared two-aggregate profile derivation, then one
    profile-sized exact distinct aggregate. The raw log is scanned
    once."""
    prof = _user_type_profiles(events, user_col, type_col)
    classes = prof.select(
        _activity_bucket(F.col("_n")).cast("long").alias(
            "activity_bucket"
        ),
        F.col("_m.t").alias("_sens"),
    ).groupBy("activity_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count_distinct(F.col("_sens")).cast("long").alias(
            "n_sensitive"
        ),
    )
    return classes.withColumn(
        "at_risk", F.col("n_sensitive") < F.lit(int(l))
    )


def t_closeness_report(
    events: DataFrame,
    t: tuple = (3, 10),
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian ICDE'07) — the
    distribution-disclosure complement of ``l_diversity_report``: a
    class can hold l distinct sensitive values yet still leak if its
    sensitive-value DISTRIBUTION deviates from the global one (the
    classic "99% cancer in this class" failure l-diversity misses).
    Same QI classes (power-of-two activity bucket) and sensitive
    attribute (dominant event type) as the k/l audits, so the three
    reports describe one release. For a categorical attribute the
    distance is total variation: tvd = ½ Σ_v |p_v − q_v| over the
    GLOBAL domain (class-absent values contribute their global mass).

    Exactness: with class size g, global size N, class counts n_cv and
    global counts N_v, each term is |n_cv·N − N_v·g| / (g·N) — the
    numerators are BIGINTs, summed exactly; tvd is ONE division by
    2·g·N, and the flag compares S·t_den > 2·g·N·t_num by integer
    cross-multiplication (``t`` is the rational (num, den)) so no
    float boundary can flip it cross-engine.
    -> (activity_bucket, n_users, tvd, at_risk).

    Plan shape: the shared two-aggregate profile derivation, then
    class×domain grid joins over bucket-count × type-count sized
    relations (both tiny; AQE broadcasts) and one grid-sized
    aggregate. The raw log is scanned once."""
    tn, td = int(t[0]), int(t[1])
    prof = _user_type_profiles(events, user_col, type_col)
    cls = prof.select(
        _activity_bucket(F.col("_n")).cast("long").alias(
            "activity_bucket"
        ),
        F.col("_m.t").alias("_sens"),
    )
    cls = cls.localCheckpoint(eager=False)
    # ^ feeds three aggregates below; one profile-sized materialization
    ncv = cls.groupBy("activity_bucket", "_sens").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    g = cls.groupBy("activity_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    qv = cls.groupBy("_sens").agg(
        F.count(F.lit(1)).cast("long").alias("_nv")
    )
    tot = cls.agg(F.count(F.lit(1)).cast("long").alias("_nn"))
    grid = (
        g.crossJoin(F.broadcast(qv))
        .join(ncv, ["activity_bucket", "_sens"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "activity_bucket",
            "n_users",
            "_nn",
            F.abs(
                F.coalesce(F.col("_c"), F.lit(0)) * F.col("_nn")
                - F.col("_nv") * F.col("n_users")
            ).alias("_num"),
        )
    )
    per = grid.groupBy("activity_bucket", "n_users", "_nn").agg(
        F.sum("_num").cast("long").alias("_s")
    )
    return per.select(
        "activity_bucket",
        "n_users",
        F.round(
            F.col("_s") / (2.0 * F.col("n_users") * F.col("_nn")), 4
        ).alias("tvd"),
        (
            F.col("_s") * F.lit(td)
            > F.lit(2 * tn) * F.col("n_users") * F.col("_nn")
        ).alias("at_risk"),
    )


def weekday_seasonality(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Day-of-week seasonality profile + exact chi² uniformity test —
    the first diagnostic every event pipeline runs on a new log (is
    traffic actually weekly-periodic, or is the collector dropping
    weekends?). Counts per ISO weekday plus Pearson's chi² against
    the uniform 7-day null, computed EXACTLY:

        chi² = Σ_d (o_d − n/7)² / (n/7)  =  Σ_d (7·o_d − n)² / (7·n)

    — the numerator is a sum of integer squares, the statistic ONE
    division (engine-identical; compare against χ²(6) downstream).
    Missing weekdays count o_d = 0 (the 7-row spine is literal).
    -> 7 rows (weekday 1-7 Mon-Sun, n_events, share, chi2 — the
    statistic repeated per row, the repo's one-statistic convention).

    Plan shape: one map-side-combined groupBy over the raw log + a
    broadcast 7-row spine join; weekday from the epoch-day integer
    ((day + 3) mod 7 + 1 — 1970-01-01 was a Thursday), no timezone,
    no locale-dependent date formatting."""
    # integer epoch-day; Thursday anchor makes Monday = 1
    day = F.floor(epoch_us(ts_col) / F.lit(86_400_000_000)).cast(
        "long"
    )
    wd = (F.pmod(day + 3, F.lit(7)) + 1).cast("long")
    per = events.select(wd.alias("weekday")).groupBy("weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    spine = events.sparkSession.createDataFrame(
        [(d,) for d in range(1, 8)], "weekday long"
    )
    full = spine.join(per, "weekday", "left").select(
        "weekday",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )
    tot = full.agg(F.sum("n_events").cast("long").alias("_n"))
    num = full.crossJoin(F.broadcast(tot)).select(
        "weekday",
        "n_events",
        "_n",
        (
            (F.lit(7) * F.col("n_events") - F.col("_n"))
            * (F.lit(7) * F.col("n_events") - F.col("_n"))
        ).alias("_sq"),
    )
    chi = num.agg(
        F.sum("_sq").cast("long").alias("_chin"),
        F.max("_n").alias("_n2"),
    )
    return (
        num.crossJoin(F.broadcast(chi))
        .select(
            "weekday",
            "n_events",
            F.round(F.col("n_events") / F.col("_n"), 4).alias("share"),
            F.round(F.col("_chin") / (F.lit(7) * F.col("_n2")), 4).alias(
                "chi2"
            ),
        )
    )


def conversion_ztest(
    events: DataFrame,
    variant_col: str = "variant",
    user_col: str = "user_id",
    convert_col: str = "converted",
) -> DataFrame:
    """Two-proportion pooled z-test between two experiment arms — the
    A/B readout every product analytics pipeline ships (the classic
    normal-approximation test; for the per-query IR analogue see
    `sign_test`/`permutation_test`): per-user conversion flags are
    aggregated per variant and

        z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),
        p̂ = (c_a + c_b)/(n_a + n_b)

    Arithmetic parity: every input to the float expression is an
    exact integer ratio (single divisions), IEEE sqrt is correctly
    rounded, and the expression SHAPE is mirrored in the oracle — so
    both engines produce the identical double. NULL z when either arm
    is empty or p̂ ∈ {0, 1} (zero variance). -> ONE row
    (n_a, n_b, conv_a, conv_b, p_a, p_b, z).

    Plan shape: one (user, variant) pre-aggregate over the raw log +
    one two-row reduction. ``events`` must carry per-user variant and
    conversion columns (derive upstream; assignment hygiene — one
    variant per user — is the caller's contract)."""
    per = events.groupBy(
        F.col(user_col).alias("_u"), F.col(variant_col).alias("_v")
    ).agg(
        F.max(F.col(convert_col).cast("long")).alias("_c")
    )
    t = per.agg(
        F.sum((F.col("_v") == "a").cast("long")).cast("long").alias(
            "n_a"
        ),
        F.sum((F.col("_v") == "b").cast("long")).cast("long").alias(
            "n_b"
        ),
        F.sum(F.when(F.col("_v") == "a", F.col("_c")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("_v") == "b", F.col("_c")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    pa = F.col("conv_a") / F.col("n_a")
    pb = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    denom = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") > 0)
        & (
            F.col("conv_a") + F.col("conv_b")
            < F.col("n_a") + F.col("n_b")
        )
    )
    return t.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(pa, 4).alias("p_a"),
        F.round(pb, 4).alias("p_b"),
        F.when(ok, F.round((pa - pb) / denom, 4)).alias("z"),
    )


def burst_report(
    events: DataFrame,
    threshold: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user burst/abuse report — the rate-limit audit every
    public-facing log pipeline runs (scraper and credential-stuffing
    traffic shows up as per-minute bursts long before volume totals
    move): bucket events into (user, minute) cells, then per user
    report the peak minute, how many minutes exceeded ``threshold``
    events, and the flag. -> (user_id, n_events, peak_minute_events,
    n_bursty_minutes, flagged) — all integers.

    Plan shape: one map-side-combined (user, minute) groupBy over the
    raw log, one user-sized rollup. The minute key is integer epoch
    division — no timestamp formatting, no timezone."""
    # integer DIV, not float division + floor — a float quotient can
    # round up across an exact minute boundary
    cells = (
        events.select(
            F.col(user_col).alias("user_id"),
            epoch_us(ts_col).alias("_t"),
        )
        .select("user_id", F.expr("_t DIV 60000000").alias("_m"))
        .groupBy("user_id", "_m")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per = cells.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.max("c").cast("long").alias("peak_minute_events"),
        F.sum(
            F.when(F.col("c") > int(threshold), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("n_bursty_minutes"),
    )
    return per.withColumn(
        "flagged", F.col("n_bursty_minutes") > 0
    )


def query_volume_curve(
    log_df: DataFrame, query_col: str = "query"
) -> DataFrame:
    """Head/torso/tail query-volume curve — the first chart of every
    search-analytics stack (cache sizing, head-query optimization,
    tail-spell-correction budgets all read off it): distinct queries
    ranked by volume with the CUMULATIVE share of total volume at each
    rank. -> (rank, query, n, cum_n, cum_share); counts and cumsums are
    exact integers, the share is ONE division per row.

    Plan shape: one map-side-combined query groupBy, then a GLOBAL
    ordered window over the DISTINCT-QUERY-sized relation (the
    vocab-sized-global-window convention — the raw log never enters a
    window) + a broadcast 1-row total."""
    counts = log_df.groupBy(
        F.col(query_col).alias("query")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = counts.agg(F.sum("n").cast("long").alias("_t"))
    w = Window.orderBy(F.col("n").desc(), F.col("query").asc())
    cum = (
        counts.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .withColumn(
            "cum_n",
            F.sum("n")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .crossJoin(F.broadcast(total))
    )
    return cum.select(
        "rank",
        "query",
        "n",
        "cum_n",
        F.round(F.col("cum_n") / F.col("_t"), 4).alias("cum_share"),
    )


def sat_clicks(
    events: DataFrame,
    threshold_us: int = 30_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    click_type: str = "click",
    id_col: str = "event_id",
) -> DataFrame:
    """SAT-click classification (Fox et al. TOIS'05 established dwell
    time as THE implicit satisfaction signal; the industry convention
    is dwell >= 30 s or last-action-of-session => satisfied): for every
    click, dwell = time to the user's NEXT event of ANY type (the
    proxy for how long they stayed on the clicked result); a click
    with no successor is terminal and counts satisfied.
    -> (user_id, event_id, dwell_us, satisfied); dwell_us = -1 for
    terminal clicks (kept integer instead of NULL so downstream
    aggregates never trip on three-valued logic).

    Plan shape: ONE user-partitioned window (ordered by event time,
    event_id tie-break) computes the successor timestamp over the full
    log, then the click filter cuts the relation down — lead() must see
    non-click successors, so the filter cannot be pushed below the
    window. Shuffle key = user_id, the log's natural partition."""
    w = Window.partitionBy(user_col).orderBy(
        F.col("_t").asc(), F.col(id_col).asc()
    )
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("_ty"),
        epoch_us(ts_col).alias("_t"),
    ).withColumn("_nxt", F.lead("_t").over(w))
    clicks = base.filter(F.col("_ty") == click_type)
    dwell = F.when(F.col("_nxt").isNull(), F.lit(-1).cast("long")).otherwise(
        (F.col("_nxt") - F.col("_t")).cast("long")
    )
    return clicks.select(
        "user_id",
        "event_id",
        dwell.alias("dwell_us"),
        (
            F.col("_nxt").isNull()
            | ((F.col("_nxt") - F.col("_t")) >= F.lit(int(threshold_us)))
        ).alias("satisfied"),
    )


def session_abandonment(
    events: DataFrame,
    convert_types: tuple = ("click", "purchase"),
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Session abandonment rate — the funnel-health headline metric:
    sessions (the same gaps-and-islands definition as `sessionize`)
    containing NO conversion-type event are abandoned. -> one row
    (n_sessions, n_converted, n_abandoned, abandonment_rate); the rate
    is one division of exact integers.

    Plan shape: identical to `sessionize` — per-user windows only
    (bounded per-user sorts, never global), then a sessions-sized
    aggregate and a scalar reduction."""
    gap_us = int(gap_seconds * 1_000_000)
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        epoch_us(ts_col).alias("t_us"),
        F.col(type_col).alias("etype"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("t_us").over(w)
    sess = base.withColumn(
        "ns",
        (prev.isNull() | ((F.col("t_us") - prev) > F.lit(gap_us)))
        .cast("int"),
    ).withColumn("session_id", F.sum("ns").over(run).cast("long"))
    per = sess.groupBy("user_id", "session_id").agg(
        F.max(
            F.col("etype").isin(list(convert_types)).cast("int")
        ).alias("_conv")
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("_conv").cast("long").alias("n_converted"),
        (F.count(F.lit(1)) - F.sum("_conv"))
        .cast("long")
        .alias("n_abandoned"),
        (
            (F.count(F.lit(1)) - F.sum("_conv")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("abandonment_rate"),
    )


def funnel_latency(
    events: DataFrame,
    first_type: str = "view",
    then_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert report for one funnel edge: per user, the
    latency from the FIRST ``first_type`` event to the first
    ``then_type`` at-or-after it (greedy-earliest, the same convention
    as `funnel_counts`); users who never convert count in n_users
    only. One summary row: (n_users, n_converted, mean_latency_us,
    median_latency_us) — integer-microsecond latencies, so the mean is
    one division of exact integers and the median is the interpolated
    percentile both engines share (Spark `percentile` == DuckDB
    quantile_cont).

    Plan shape: two map-side-combined per-user min-aggregates over a
    filtered scan + one scalar reduction — no window over raw
    events."""
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        epoch_us(ts_col).alias("t_us"),
    )
    first = base.filter(F.col("etype") == first_type).groupBy(
        "user_id"
    ).agg(F.min("t_us").alias("t0"))
    conv = (
        base.filter(F.col("etype") == then_type)
        .join(first, "user_id")
        .filter(F.col("t_us") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min(F.col("t_us") - F.col("t0")).alias("lat_us"))
    )
    joined = first.join(conv, "user_id", "left")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("lat_us").cast("long").alias("n_converted"),
        (
            F.sum("lat_us").cast("double")
            / F.count("lat_us").cast("double")
        ).alias("mean_latency_us"),
        F.expr("percentile(lat_us, 0.5)").alias("median_latency_us"),
    )


def rfm_report(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM user segmentation (recency / frequency / monetary, the
    classic marketing-analytics scoring; Hughes' "Strategic Database
    Marketing" popularized it): per user, days since last event
    (relative to the log's max day), event count, and value total in
    integer cents; each dimension scored 1-5 by QUINTILE with 5 =
    best (most recent / most frequent / highest spend), rfm =
    100·R + 10·F + M.

    Scale shape: scores come from BROADCAST quantile boundaries (one
    tiny percentile aggregate over the per-user relation, then four
    integer comparisons per row) — NOT a global ntile window, which
    would be a single-reducer sort over every user; the only
    corpus-sized work is the per-user groupBy. Boundaries are exact
    interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont on these integer inputs); a metric exactly ON a
    boundary does not pass it (strict comparison) on either engine.
    -> (user_id, recency_days, frequency, monetary_cents, r_score,
    f_score, m_score, rfm)."""
    day_idx = F.expr(
        f"timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" date_trunc('DAY', {ts_col}))"
    ).cast("long")
    base = events.select(
        F.col(user_col).alias("user_id"),
        day_idx.alias("_d"),
        F.round(F.col(value_col) * 100, 0).cast("long").alias("_cents"),
    )
    mx = base.agg(F.max("_d").alias("_maxd"))
    pu = (
        base.groupBy("user_id")
        .agg(
            F.max("_d").alias("_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum("_cents").cast("long").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            (F.col("_maxd") - F.col("_last")).cast("long").alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
        .localCheckpoint(eager=False)
    )
    # ^ consumed twice: the boundary aggregate and the scored output
    qs = "array(0.2, 0.4, 0.6, 0.8)"
    bounds = pu.agg(
        F.expr(f"percentile(recency_days, {qs})").alias("_br"),
        F.expr(f"percentile(frequency, {qs})").alias("_bf"),
        F.expr(f"percentile(monetary_cents, {qs})").alias("_bm"),
    )

    def score(col, barr, lower_better: bool):
        e = F.lit(1).cast("long")
        for i in range(1, 5):
            b = F.element_at(F.col(barr), i)
            hit = (F.col(col) < b) if lower_better else (F.col(col) > b)
            e = e + F.when(hit, 1).otherwise(0)
        return e.cast("long")

    out = pu.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        score("recency_days", "_br", True).alias("r_score"),
        score("frequency", "_bf", False).alias("f_score"),
        score("monetary_cents", "_bm", False).alias("m_score"),
    )
    return out.withColumn(
        "rfm",
        (
            F.col("r_score") * 100
            + F.col("f_score") * 10
            + F.col("m_score")
        ).cast("long"),
    )


def event_anomaly(
    events: DataFrame,
    window_days: int = 7,
    z_threshold: float = 2.0,
    min_history: int = 4,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Trailing z-score anomaly detection over daily event counts —
    the classic ops-metrics spike/drop detector: each (type, day) is
    scored against the PRECEDING ``window_days`` days' mean and sample
    stddev (the current day is excluded from its own baseline), and
    days with |z| > ``z_threshold`` are flagged. Days with fewer than
    ``min_history`` baseline observations or zero baseline variance
    yield no row (cold start / constant series are not anomalies).
    Operates on OBSERVED days; zero-fill silent days upstream with
    `event_ewma`'s densified grid when absent days should count.
    -> (event_type, day_us, n_events, z) for flagged days only.

    Plan shape: one map-side-combined groupBy to daily counts (the
    only pass over the raw log); the rolling window runs on the
    |types| × |days| relation partitioned by type — tiny, bounded,
    never the raw events."""
    day_idx = F.expr(
        f"timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" date_trunc('DAY', {ts_col}))"
    ).cast("long")
    daily = (
        events.select(
            F.col(type_col).alias("event_type"),
            day_idx.alias("day_idx"),
        )
        .groupBy("event_type", "day_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(-int(window_days), -1)
    )
    scored = daily.select(
        "event_type",
        "day_idx",
        "x",
        F.avg("x").over(wd).alias("_m"),
        F.stddev_samp("x").over(wd).alias("_s"),
        F.count("x").over(wd).alias("_c"),
    ).filter(
        (F.col("_c") >= int(min_history))
        & F.col("_s").isNotNull()
        & (F.col("_s") > 0)
    )
    out = scored.select(
        "event_type",
        (F.col("day_idx") * F.lit(86400000000)).cast("long").alias(
            "day_us"
        ),
        F.col("x").alias("n_events"),
        ((F.col("x") - F.col("_m")) / F.col("_s")).alias("z"),
    )
    return out.filter(F.abs(F.col("z")) > F.lit(float(z_threshold)))


def event_ewma(
    events: DataFrame,
    window_days: int = 8,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type EWMA of DAILY event counts with alpha = 1/2 and a
    truncated kernel — the trend-smoothing signal behind anomaly/
    trending detectors over event logs:

        ewma_n = sum_{j<W} 2^(W-1-j) * x_{n-j} / sum_{j<W} 2^(W-1-j)

    over the DENSIFIED day grid (missing days count 0 — a silent day
    decays the average; at the series head the kernel renormalizes
    over the days that exist). With alpha = 1/2 the kernel weights are
    the integers 2^(W-1-j), so numerator and denominator stay
    all-integer and the single final division is fold-order-exact
    cross-engine. W = ``window_days`` truncates the tail (weight below
    2^-W is noise anyway); the kernel unrolls into W lag() terms — no
    self-join.

    Plan shape: one map-side-combined groupBy to daily counts (the
    only pass over the raw log); everything after runs on the
    |types| x |days| relation — a broadcast bounds crossJoin +
    sequence() explode for the grid, then a single per-type window.
    -> (event_type, day_us long, n_events long, ewma double)."""
    w_len = int(window_days)
    day_idx = F.expr(
        f"timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" date_trunc('DAY', {ts_col}))"
    ).cast("long")
    daily = (
        events.select(
            F.col(type_col).alias("event_type"),
            day_idx.alias("day_idx"),
        )
        .groupBy("event_type", "day_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bounds = daily.agg(
        F.min("day_idx").alias("d0"), F.max("day_idx").alias("d1")
    )
    grid = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias(
                "day_idx"
            ),
        )
    )
    dense = grid.join(daily, ["event_type", "day_idx"], "left").select(
        "event_type",
        "day_idx",
        F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("day_idx")
    num = F.col("x") * F.lit(1 << (w_len - 1))
    den = F.lit(1 << (w_len - 1)).cast("long")
    for j in range(1, w_len):
        lx = F.lag("x", j).over(w)
        wt = 1 << (w_len - 1 - j)
        num = num + F.coalesce(lx, F.lit(0)) * F.lit(wt)
        den = den + F.when(lx.isNull(), F.lit(0)).otherwise(F.lit(wt))
    out = dense.select(
        "event_type",
        (F.col("day_idx") * F.lit(86_400_000_000)).cast("long").alias(
            "day_us"
        ),
        F.col("x").alias("n_events"),
        num.cast("long").alias("_num"),
        den.cast("long").alias("_den"),
    )
    return out.select(
        "event_type", "day_us", "n_events",
        (F.col("_num") / F.col("_den")).alias("ewma"),
    )
