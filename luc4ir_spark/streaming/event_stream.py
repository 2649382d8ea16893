"""Structured Streaming windowed event aggregation.

The streaming twin of ``operators.eventops.tumbling_window_stats``:
event files land in a directory, a streaming query maintains tumbling
event-time windows with a WATERMARK for late data, and APPEND mode
emits each (window, event_type) row exactly once — when the watermark
passes the window end and the window can no longer change. Until then
the window stays in the state store (so the newest windows are
intentionally absent from the sink; they flush on a later trigger once
newer events advance the watermark).

Late events older than the watermark are dropped by the engine — the
standard streaming trade: bounded state for bounded lateness.
"""

from __future__ import annotations

import os

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
