"""Streaming windowed aggregation == batch tumbling_window_stats for
every watermark-finalized window; unfinalized windows are withheld."""

import os
from datetime import datetime

from pyspark.sql import functions as F

from luc4ir_spark.operators.eventops import tumbling_window_stats
from luc4ir_spark.streaming.event_stream import (
    EVENT_SCHEMA,
    start_windowed_event_counts,
)


def _write(spark, rows, path):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streamed_windows_match_batch(spark, tmp_path):
    in_dir = str(tmp_path / "incoming")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    wave1 = [
        (0, datetime(2024, 1, 1, 0, 10), 1, "click", 1.0),
        (1, datetime(2024, 1, 1, 0, 40), 2, "view", 2.0),
        (2, datetime(2024, 1, 1, 1, 15), 1, "click", 3.0),
        (3, datetime(2024, 1, 1, 2, 30), 3, "view", 4.0),
    ]
    wave2 = [
        (4, datetime(2024, 1, 1, 5, 5), 1, "click", 5.0),
        (5, datetime(2024, 1, 1, 5, 45), 2, "click", 6.0),
    ]
    # sentinel far in the future: advances the watermark past every
    # real window so they all finalize; its OWN window must be withheld
    sentinel = [(99, datetime(2024, 1, 5, 0, 0), 9, "sentinel", 0.0)]

    for wave in (wave1, wave2, sentinel):
        _write(spark, wave, in_dir)
        q = start_windowed_event_counts(
            spark, in_dir, out_dir, window="1 hour", watermark="2 hours"
        )
        q.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(out_dir, "windows"))
    got = {
        (str(r["window_start"]), r["event_type"]): (
            r["n_events"], r["sum_value"]
        )
        for r in streamed.collect()
    }
    # batch truth over the real events only (same NTZ->instant cast the
    # streaming path applies for the watermark)
    batch_df = spark.createDataFrame(wave1 + wave2, EVENT_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    exp = {
        (str(r["window_start"]), r["event_type"]): (
            r["n_events"], r["sum_value"]
        )
        for r in tumbling_window_stats(batch_df, "1 hour").collect()
    }
    assert got == exp
    # watermark semantics: the sentinel's window is still open -> absent
    assert not any(k[1] == "sentinel" for k in got)
