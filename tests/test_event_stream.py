"""Streaming windowed aggregation == batch tumbling_window_stats for
every watermark-finalized window; unfinalized windows are withheld.
Streaming sessionization == batch sessionize for every watermark-
finalized session; open sessions are withheld."""

import os
from datetime import datetime

from pyspark.sql import functions as F

from luc4ir_spark.operators.eventops import sessionize, tumbling_window_stats
from luc4ir_spark.streaming.event_stream import (
    EVENT_SCHEMA,
    start_sessionize_stream,
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


def test_streamed_sessions_match_batch(spark, tmp_path):
    """Three data waves (per-user event-time ordered across waves, mixed
    within), then sentinel waves to advance the watermark: every real
    session flushes via gap-close or event-time timeout and matches the
    batch operator row-for-row; the sentinel user's open session is
    withheld."""
    in_dir = str(tmp_path / "incoming")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    d = datetime
    # user 1: two sessions (gap at 02:00); user 2: one long session
    # (40-min steps < 45-min gap); user 3: single-event session
    wave1 = [
        (10, d(2024, 1, 1, 0, 0), 1, "click", 1.0),
        (11, d(2024, 1, 1, 0, 20), 1, "click", 2.0),
        (20, d(2024, 1, 1, 0, 5), 2, "view", 1.5),
        (21, d(2024, 1, 1, 0, 45), 2, "view", 2.5),
    ]
    wave2 = [
        (12, d(2024, 1, 1, 2, 0), 1, "click", 3.0),
        (22, d(2024, 1, 1, 1, 25), 2, "view", 3.5),
        (30, d(2024, 1, 1, 1, 0), 3, "buy", 9.0),
    ]
    wave3 = [
        (13, d(2024, 1, 1, 2, 10), 1, "click", 4.0),
        (23, d(2024, 1, 1, 2, 5), 2, "view", 4.5),
    ]
    # two sentinel waves (DISTINCT users, so neither sentinel session
    # ever closes): the first advances the watermark past every real
    # session's end + gap; the second's non-empty batch lets the
    # event-time timeouts actually fire under availableNow
    sent1 = [(90, d(2024, 1, 2, 0, 0), 9, "sentinel", 0.0)]
    sent2 = [(91, d(2024, 1, 3, 0, 0), 8, "sentinel", 0.0)]

    for wave in (wave1, wave2, wave3, sent1, sent2):
        _write(spark, wave, in_dir)
        q = start_sessionize_stream(
            spark, in_dir, out_dir,
            gap_seconds=2700.0, watermark="30 minutes",
        )
        q.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(out_dir, "sessions"))
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["start_us"], r["end_us"], r["sum_value"]
        )
        for r in streamed.collect()
    }
    # batch truth includes sent1: user 9's single-event session is
    # genuinely final once sent2 pushes the watermark past its end + gap
    # (the engine's no-data micro-batch fires the event-time timeout)
    batch_df = spark.createDataFrame(
        wave1 + wave2 + wave3 + sent1, EVENT_SCHEMA
    )
    exp = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["start_us"], r["end_us"], r["sum_value"]
        )
        for r in sessionize(batch_df, gap_seconds=2700.0).collect()
    }
    assert got == exp
    # the LAST sentinel's session cannot finalize -> withheld
    assert not any(u == 8 for (u, _) in got)


def test_streamed_dedup_matches_batch(spark, tmp_path):
    from luc4ir_spark.operators.dedup import exact_duplicates
    from luc4ir_spark.streaming.dedup_stream import (
        DOC_SCHEMA,
        start_dedup_stream,
    )

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "docs_out")
    os.makedirs(in_dir)

    # dupes only ACROSS waves (within-wave survivor choice is
    # arbitrary, see dedup_stream docstring) -> first-wins is
    # deterministic: the wave-1 doc_id survives
    wave1 = [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon")]
    wave2 = [(4, "alpha beta"), (5, "zeta"), (6, "gamma delta")]
    for wave in (wave1, wave2):
        spark.createDataFrame(wave, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q = start_dedup_stream(spark, in_dir, out_dir)
        q.awaitTermination(120)

    kept = {
        r["digest"]: r["doc_id"]
        for r in spark.read.parquet(os.path.join(out_dir, "kept")).collect()
    }
    # one survivor per distinct digest; the wave-1 member wins
    assert sorted(kept.values()) == [1, 2, 3, 5]

    # batch twin agrees: each dup group's keep_doc_id is the survivor
    all_docs = spark.createDataFrame(wave1 + wave2, DOC_SCHEMA)
    groups = {
        r["digest"]: r["keep_doc_id"]
        for r in exact_duplicates(all_docs).collect()
    }
    for digest, keep in groups.items():
        assert kept[digest] == keep

    # restart with the same checkpoint: seen-set resumes, a replayed
    # duplicate is NOT re-emitted
    spark.createDataFrame([(7, "alpha beta"), (8, "eta")], DOC_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(in_dir)
    q = start_dedup_stream(spark, in_dir, out_dir)
    q.awaitTermination(120)
    kept2 = {
        r["digest"]: r["doc_id"]
        for r in spark.read.parquet(os.path.join(out_dir, "kept")).collect()
    }
    assert sorted(kept2.values()) == [1, 2, 3, 5, 8]


def test_streamed_hygiene_matches_batch(spark, tmp_path):
    from luc4ir_spark.operators import textstats as ts
    from luc4ir_spark.operators.dedup import exact_duplicates
    from luc4ir_spark.streaming.dedup_stream import (
        DOC_SCHEMA,
        start_hygiene_stream,
    )

    g = ("the quick brown fox jumps over a lazy dog and it was of great "
         "joy to all present in that big field for sure; birds sang "
         "while children played games near old oak trees")
    g1 = g + " contact bob@example.com today"
    g2 = g.replace("quick", "swift").replace("fox", "hare")
    g3 = g.replace("brown", "golden").replace("dog", "wolf")
    wave1 = [(1, g1), (2, "x y"), (3, g2)]
    wave2 = [(4, g1), (5, "spam " * 40), (6, g3)]

    in_dir = str(tmp_path / "hyg_in")
    out_dir = str(tmp_path / "hyg_out")
    os.makedirs(in_dir)
    for wave in (wave1, wave2):
        spark.createDataFrame(wave, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q = start_hygiene_stream(spark, in_dir, out_dir)
        q.awaitTermination(120)

    kept = {
        r["doc_id"]: r["clean"]
        for r in spark.read.parquet(os.path.join(out_dir, "kept")).collect()
    }
    # 2/5 fail the quality gate, 4 is a cross-wave dup of 1
    assert sorted(kept) == [1, 3, 6]
    assert "[PII]" in kept[1] and "bob@example.com" not in kept[1]

    # batch twin: exact-dup survivors ∩ quality keep, then redact
    all_docs = spark.createDataFrame(wave1 + wave2, DOC_SCHEMA)
    dup_losers = {
        d
        for r in exact_duplicates(all_docs).collect()
        for d in r["doc_ids"]
        if d != r["keep_doc_id"]
    }
    verdicts = {
        r["doc_id"]: r["keep"]
        for r in ts.quality_filter(all_docs).collect()
    }
    batch_clean = {
        r["doc_id"]: r["clean"] for r in ts.redact_pii(all_docs).collect()
    }
    batch_kept = {
        d: batch_clean[d]
        for d, keep in verdicts.items()
        if keep and d not in dup_losers
    }
    assert batch_kept == kept


def test_percolate_stream_equals_batch(spark, tmp_path):
    """Streamed percolate over two waves == batch percolate over the
    union (stateless matching, exactly-once layout)."""
    from luc4ir_spark.operators import retrieval as rt
    from luc4ir_spark.streaming.percolate_stream import (
        read_percolate_matches,
        start_percolate_stream,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    qt = spark.createDataFrame(
        [("a", "spark"), ("a", "join"), ("b", "pasta")],
        "qid string, term string",
    )
    w1 = spark.createDataFrame(
        [(0, "spark join window"), (1, "pasta bowl")],
        "doc_id long, content string",
    )
    w2 = spark.createDataFrame(
        [(2, "spark join again"), (3, "nothing")],
        "doc_id long, content string",
    )
    for wave in (w1, w2):
        wave.write.mode("append").parquet(in_dir)
        q = start_percolate_stream(spark, in_dir, out_dir, qt)
        q.awaitTermination(300)
    got = {
        (r["doc_id"], r["qid"], r["n_matched"])
        for r in read_percolate_matches(spark, out_dir).collect()
    }
    batch = {
        (r["doc_id"], r["qid"], r["n_matched"])
        for r in rt.percolate(
            w1.unionByName(w2), qt, mode="all"
        ).collect()
    }
    assert got == batch == {(0, "a", 2), (1, "b", 1), (2, "a", 2)}


def test_attribution_stream_equals_batch(spark, tmp_path):
    """Stream-stream interval join across two waves == the batch
    attribution pairs (cross-wave matches require checkpointed join
    state: the wave-2 click meets the wave-1 view)."""
    from luc4ir_spark.operators import eventops as eo
    from luc4ir_spark.streaming.attribution_stream import (
        read_attribution_pairs,
        start_attribution_stream,
    )

    rows = [
        (1, "2024-01-01 10:00:00", 7, "view"),
        (2, "2024-01-01 10:05:00", 7, "click"),   # pairs with 1
        (3, "2024-01-01 12:00:00", 7, "click"),   # outside 10-min window
        (4, "2024-01-01 10:02:00", 8, "view"),
        (5, "2024-01-01 10:03:00", 8, "view"),
        (6, "2024-01-01 10:08:00", 8, "click"),   # pairs with 4 AND 5
        (7, "2024-01-01 09:59:00", 9, "click"),   # view after click: no
        (8, "2024-01-01 10:01:00", 9, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type",
        F.lit(0.0).alias("value"), F.lit("{}").alias("props"),
    )
    batch = {
        (r["click_id"], r["view_id"])
        for r in eo.attribution_pairs(ev, window_seconds=600).collect()
    }
    assert batch == {(2, 1), (6, 4), (6, 5)}

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    # wave 1: views (+ the no-match click); wave 2: the clicks
    ev.filter(F.col("event_id").isin(1, 4, 5, 7)).write.mode(
        "append"
    ).parquet(in_dir)
    q = start_attribution_stream(spark, in_dir, out_dir, window_seconds=600)
    q.awaitTermination(300)
    ev.filter(F.col("event_id").isin(2, 3, 6, 8)).write.mode(
        "append"
    ).parquet(in_dir)
    q = start_attribution_stream(spark, in_dir, out_dir, window_seconds=600)
    q.awaitTermination(300)
    streamed = {
        (r["click_id"], r["view_id"])
        for r in read_attribution_pairs(spark, out_dir).collect()
    }
    assert streamed == batch


def test_streamed_distinct_users_match_batch(spark, tmp_path):
    from luc4ir_spark.streaming.event_stream import (
        start_windowed_distinct_users,
    )

    in_dir = str(tmp_path / "incoming_du")
    out_dir = str(tmp_path / "out_du")
    os.makedirs(in_dir)
    wave1 = [
        (0, datetime(2024, 1, 1, 0, 10), 1, "click", 1.0),
        (1, datetime(2024, 1, 1, 0, 40), 1, "click", 2.0),  # same user
        (2, datetime(2024, 1, 1, 0, 50), 2, "click", 3.0),
        (3, datetime(2024, 1, 1, 1, 15), 3, "view", 4.0),
    ]
    sentinel = [(99, datetime(2024, 1, 5, 0, 0), 9, "sentinel", 0.0)]
    for wave in (wave1, sentinel):
        _write(spark, wave, in_dir)
        q = start_windowed_distinct_users(
            spark, in_dir, out_dir, window="1 hour", watermark="2 hours"
        )
        q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): (
            r["n_events"], r["n_users"]
        )
        for r in spark.read.parquet(
            os.path.join(out_dir, "windows")
        ).collect()
    }
    # hour 0 'click': 3 events, 2 distinct users; hour 1 'view': 1/1
    assert [v for k, v in got.items() if k[1] == "click"] == [(3, 2)]
    assert [v for k, v in got.items() if k[1] == "view"] == [(1, 1)]
    assert not any(k[1] == "sentinel" for k in got)


def test_streamed_enrichment_matches_batch(spark, tmp_path):
    """Stream-static join: a user->cohort dim broadcast into the
    stream; dim-absent users land in '(unknown)'; finalized windows
    equal the batch join+aggregate over the same events."""
    from luc4ir_spark.streaming.event_stream import (
        start_enriched_window_counts,
    )

    in_dir = str(tmp_path / "inc")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, cohort string"
    )
    wave1 = [
        (0, datetime(2024, 1, 1, 0, 10), 1, "click", 1.0),
        (1, datetime(2024, 1, 1, 0, 40), 2, "view", 2.0),
        (2, datetime(2024, 1, 1, 0, 50), 9, "view", 4.0),  # no dim row
        (3, datetime(2024, 1, 1, 1, 20), 1, "click", 8.0),
        (9, datetime(2030, 1, 1), -1, "sentinel", 0.0),
    ]
    _write(spark, wave1, in_dir)
    q = start_enriched_window_counts(
        spark, in_dir, out_dir, dim, window="1 hour",
        watermark="2 hours",
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"].isoformat(), r["cohort"]):
            (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(
            os.path.join(out_dir, "windows")
        ).collect()
    }
    assert got[("2024-01-01T00:00:00", "gold")] == (1, 1.0)
    assert got[("2024-01-01T00:00:00", "silver")] == (1, 2.0)
    assert got[("2024-01-01T00:00:00", "(unknown)")] == (1, 4.0)
    assert got[("2024-01-01T01:00:00", "gold")] == (1, 8.0)
    # the sentinel's own window is still open -> withheld
    assert all(not k[0].startswith("2030") for k in got)
