"""Structured Streaming windowed event aggregation + sessionization.

The streaming twins of ``operators.eventops``:

- ``start_windowed_event_counts`` == ``tumbling_window_stats``: a
  streaming query maintains tumbling event-time windows with a
  WATERMARK for late data; APPEND mode emits each (window, event_type)
  row exactly once — when the watermark passes the window end and the
  window can no longer change. Until then the window stays in the state
  store (the newest windows are intentionally absent from the sink;
  they flush on a later trigger once newer events advance the
  watermark).

- ``start_sessionize_stream`` == ``sessionize``: a custom stateful
  operator via ``applyInPandasWithState``. Per-user state is ONE open
  session (sid counter + 4 aggregates — constant bytes per user, never
  an event buffer); a session closes either when a later event exceeds
  the gap (emitted immediately — final, because any event that could
  still extend it would be later than the closer's timestamp minus the
  gap and therefore in the new session) or when the EVENT-TIME TIMEOUT
  fires: the watermark passing last_event + gap proves no in-watermark
  event can extend the session. Emitted rows match the batch operator
  exactly (same integer-microsecond bounds, same 1-based per-user
  session numbering) provided each user's events arrive event-time-
  ordered ACROSS micro-batches; within a batch any order is fine (the
  kernel sorts). Late events older than the watermark are dropped by
  the engine — the standard streaming trade: bounded state for bounded
  lateness.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long,"
    " event_type string, value double"
)


def start_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    schema: str = EVENT_SCHEMA,
):
    """Start the streaming query: parquet event files in ``input_dir``
    -> finalized per-(window, event_type) aggregate rows appended under
    ``out_dir/windows``. Returns the StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    # watermarks are only defined on TIMESTAMP (an instant); a
    # TIMESTAMP_NTZ event time is interpreted in the session timezone
    # (consistent within the session — batch comparisons must apply the
    # same cast)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "windows"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long,"
    " start_us long, end_us long, sum_value double"
)
# next_sid keeps the per-user 1-based numbering across session closes
# (batch parity); n_events == 0 <=> no open session
SESSION_STATE_SCHEMA = (
    "next_sid long, n_events long, start_us long, end_us long,"
    " sum_value double"
)


def _session_kernel(gap_us: int):
    """applyInPandasWithState update function for gaps-and-islands
    sessionization. State per user: the one open session. Emits each
    CLOSED session exactly once."""

    def update(key, pdfs: Iterator[pd.DataFrame], state):
        user_id = int(key[0])
        if state.exists:
            next_sid, n_ev, start_us, end_us, sum_v = state.get
        else:
            next_sid, n_ev, start_us, end_us, sum_v = 1, 0, 0, 0, 0.0
        closed: list[tuple] = []
        if state.hasTimedOut:
            # watermark passed end_us + gap: the open session is final
            if n_ev > 0:
                closed.append(
                    (user_id, next_sid, n_ev, start_us, end_us, sum_v)
                )
                next_sid += 1
            state.update((next_sid, 0, 0, 0, 0.0))
            # no timeout re-armed: the next event for this user re-arms
        else:
            parts = []
            for pdf in pdfs:
                if len(pdf):
                    t_us = (
                        pdf["ts"]
                        .astype("datetime64[ns]")
                        .astype("int64")
                        // 1000
                    )
                    parts.append(
                        pd.DataFrame(
                            {
                                "t": t_us,
                                "eid": pdf["event_id"],
                                "v": pdf["value"],
                            }
                        )
                    )
            if parts:
                ev = pd.concat(parts).sort_values(["t", "eid"])
                for t, v in zip(ev["t"].tolist(), ev["v"].tolist()):
                    if n_ev == 0:
                        n_ev, start_us, end_us, sum_v = 1, t, t, float(v)
                    elif t - end_us > gap_us:
                        closed.append(
                            (user_id, next_sid, n_ev, start_us, end_us,
                             sum_v)
                        )
                        next_sid += 1
                        n_ev, start_us, end_us, sum_v = 1, t, t, float(v)
                    else:
                        n_ev += 1
                        end_us = max(end_us, t)
                        sum_v += float(v)
                state.update((next_sid, n_ev, start_us, end_us, sum_v))
                if n_ev > 0:
                    # fire once the watermark proves no extender can come;
                    # must be strictly above the current watermark
                    to_ms = (end_us + gap_us) // 1000 + 1
                    state.setTimeoutTimestamp(
                        max(to_ms, state.getCurrentWatermarkMs() + 1)
                    )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_id", "n_events",
                    "start_us", "end_us", "sum_value",
                ],
            )

    return update


def start_sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    gap_seconds: float = 1800.0,
    watermark: str = "2 hours",
    schema: str = EVENT_SCHEMA,
):
    """Start the streaming sessionizer: parquet event files in
    ``input_dir`` -> finalized (user_id, session_id, n_events, start_us,
    end_us, sum_value) rows appended under ``out_dir/sessions``. Open
    sessions stay in the state store until the watermark passes their
    end + gap. Returns the StreamingQuery."""
    gap_us = int(gap_seconds * 1_000_000)
    stream = spark.readStream.schema(schema).parquet(input_dir)
    # same NTZ -> instant cast as the windowed twin (watermarks are only
    # defined on TIMESTAMP); session tz is UTC so the pandas-side int64
    # microseconds equal the batch operator's timezone-free epoch_us
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_kernel(gap_us),
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            "EventTimeTimeout",
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option(
            "checkpointLocation", os.path.join(out_dir, "_checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )


def start_windowed_distinct_users(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    schema: str = EVENT_SCHEMA,
):
    """Streaming per-(window, event_type) DISTINCT-user counts —
    the audience-size twin of ``start_windowed_event_counts``: the
    distinct set rides the watermarked window aggregate as a
    ``collect_set(user_id)`` whose SIZE is emitted on window close
    (exact, hence batch-replayable — unlike approx_count_distinct's
    engine-internal HLL++ sketch, which has no cross-engine oracle).
    State per open window is the distinct-user set itself: bounded by
    the window's audience, dropped at watermark — the documented
    trade against sketch-bounded memory; switch to HLL state when
    per-window audiences outgrow executors (the batch `hll_distinct`
    operator holds the register layout). Returns the StreamingQuery;
    rows append under ``out_dir/windows``."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.size(F.collect_set("user_id")).cast("long").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "windows"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def start_enriched_window_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    dim: "pyspark.sql.DataFrame",
    window: str = "1 hour",
    watermark: str = "2 hours",
    schema: str = EVENT_SCHEMA,
    dim_key: str = "user_id",
    dim_col: str = "cohort",
):
    """Stream-STATIC join enrichment + windowed aggregation — the one
    Structured Streaming join class the other streams here don't
    exercise (attribution_stream covers stream-stream; this is the
    slowly-changing-dimension lookup every event pipeline runs): each
    micro-batch of events joins the static ``dim`` table (planner
    broadcasts it — the join is STATELESS, re-planned per batch, so a
    dim refresh between restarts is picked up), then the stateful
    watermarked tumbling-window aggregate counts per (window, dim
    value). APPEND mode: a window row is emitted exactly once, when
    the watermark closes it. Events missing from the dim keep NULL →
    '(unknown)' — the standard late-dimension convention, made
    explicit so the batch oracle can replay it.
    -> finalized rows under ``out_dir/windows``; returns the query."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    enriched = stream.join(
        F.broadcast(dim.select(dim_key, dim_col)), dim_key, "left"
    ).withColumn(
        dim_col, F.coalesce(F.col(dim_col), F.lit("(unknown)"))
    )
    agg = (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), dim_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            dim_col,
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "windows"))
        .option(
            "checkpointLocation", os.path.join(out_dir, "_checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )
