"""Streaming twin of ``operators.eventops.attribution_pairs``: a
stream-stream INTERVAL JOIN — the one Structured Streaming join class
the other streams here don't exercise. Clicks and views arrive on the
same event stream; each click joins every view by the same user within
the lookback window. Inner stream-stream joins emit matches EAGERLY
(no watermark wait); the watermark only bounds join STATE, so the
replay gate pins a span-covering watermark — a production deployment
sets it to the real lateness bound and lets old view state expire.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.eventops import epoch_us

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def start_attribution_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    window_seconds: float = 600.0,
    watermark: str = "40 days",
    schema: str = EVENT_SCHEMA,
    click_type: str = "click",
    view_type: str = "view",
):
    """Parquet event files in ``input_dir`` -> attribution pairs
    appended under ``out_dir/pairs``. availableNow trigger; join state
    (and cross-micro-batch matching) persists in the checkpoint, so
    clicks in a later wave still meet views from an earlier one."""
    ev = spark.readStream.schema(schema).parquet(input_dir)
    # microsecond interval so fractional windows match the batch twin
    win_us = int(window_seconds * 1_000_000)
    clicks = (
        ev.filter(F.col("event_type") == click_type)
        .select(
            F.col("user_id").alias("cu"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", watermark)
    )
    views = (
        ev.filter(F.col("event_type") == view_type)
        .select(
            F.col("user_id").alias("vu"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("vts"),
        )
        .withWatermark("vts", watermark)
    )
    joined = clicks.join(
        views,
        F.expr(
            f"cu = vu AND vts <= cts"
            f" AND cts <= vts + INTERVAL {win_us} MICROSECOND"
        ),
    ).select(
        F.col("cu").alias("user_id"),
        "click_id",
        "view_id",
        epoch_us("cts").alias("click_us"),
        epoch_us("vts").alias("view_us"),
    )
    return (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "pairs"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def read_attribution_pairs(spark: SparkSession, out_dir: str):
    return spark.read.parquet(os.path.join(out_dir, "pairs")).select(
        "user_id", "click_id", "view_id", "click_us", "view_us"
    )
