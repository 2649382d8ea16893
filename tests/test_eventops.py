"""Event-time operators: hand-computed tumbling windows and sessions."""

from datetime import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from luc4ir_spark.operators import eventops as eo


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap > 600 s between e2 and e3)
        (0, datetime(2024, 1, 1, 0, 0, 0), 1, "click", 1.0),
        (1, datetime(2024, 1, 1, 0, 5, 0), 1, "view", 2.0),
        (2, datetime(2024, 1, 1, 0, 9, 59), 1, "click", 3.0),
        (3, datetime(2024, 1, 1, 1, 0, 0), 1, "click", 4.0),
        # user 2: one session spanning an hour boundary
        (4, datetime(2024, 1, 1, 0, 58, 0), 2, "view", 5.0),
        (5, datetime(2024, 1, 1, 1, 2, 0), 2, "view", 6.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
              " event_type string, value double"
    )


def test_tumbling_window_stats(spark, events):
    out = {
        (str(r["window_start"]), r["event_type"]): (
            r["n_events"], r["sum_value"]
        )
        for r in eo.tumbling_window_stats(events, "1 hour").collect()
    }
    assert out[("2024-01-01 00:00:00", "click")] == (2, 4.0)
    assert out[("2024-01-01 00:00:00", "view")] == (2, 7.0)
    assert out[("2024-01-01 01:00:00", "click")] == (1, 4.0)
    assert out[("2024-01-01 01:00:00", "view")] == (1, 6.0)


def test_sessionize(spark, events):
    out = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["start_us"], r["end_us"], r["sum_value"]
        )
        for r in eo.sessionize(events, gap_seconds=600.0).collect()
    }
    base = 1_704_067_200_000_000  # 2024-01-01 00:00:00 in us
    # user 1: events at 0/300/599 s form one session; 3600 s a new one
    assert out[(1, 1)] == (3, base, base + 599_000_000, 6.0)
    assert out[(1, 2)] == (1, base + 3_600_000_000, base + 3_600_000_000, 4.0)
    # user 2: 240 s gap stays one session across the hour boundary
    assert out[(2, 1)] == (2, base + 3_480_000_000, base + 3_720_000_000, 11.0)
    # windows are per-user partitioned (no global window in the plan)
    plan = (
        eo.sessionize(events)._jdf.queryExecution().executedPlan().toString()
    )
    assert "No Partition Defined" not in plan


def test_retention_cohorts_hand_computed(spark):
    from luc4ir_spark.operators import eventops as eo

    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-02 09:00:00"),
        (1, "2024-01-04 23:00:00"),
        (2, "2024-01-02 01:00:00"), (2, "2024-01-02 02:00:00"),
        (3, "2024-01-01 05:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in eo.retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,   # users 1, 3
        ("2024-01-01", 1): 1,   # user 1 back next day
        ("2024-01-01", 3): 1,   # user 1 back on day 4
        ("2024-01-02", 0): 1,   # user 2 (same-day repeat counts once)
    }


def test_json_prop_stats_hand_computed(spark):
    from luc4ir_spark.operators import eventops as eo

    ev = spark.createDataFrame(
        [
            ("click", '{"k": 3}'), ("click", '{"k": 5}'),
            ("view", '{"k": 10}'), ("view", '{"other": 1}'),
        ],
        "event_type string, props string",
    )
    got = {
        r["grp"]: (r["n"], r["p_sum"], r["p_avg"])
        for r in eo.json_prop_stats(ev, prop="k").collect()
    }
    assert got["click"] == (2, 8, 4.0)
    # missing key -> NULL, excluded from sum/avg but counted in n
    assert got["view"] == (2, 10, 10.0)


def test_asof_join_hand_computed(spark):
    from luc4ir_spark.operators import eventops as eo

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 50), (4, 20, 100)],
        "lid long, user_id long, t_us long",
    )
    right = spark.createDataFrame(
        [(11, 10, 100), (12, 10, 200), (13, 30, 90)],
        "rid long, user_id long, r_us long",
    )
    out = {
        r["lid"]: (r["rid"], r["asof_time_us"])
        for r in eo.asof_join(
            left,
            right.select("user_id", "r_us", "rid"),
            key="user_id",
            left_time_us="t_us",
            right_time_us="r_us",
            payload_cols=["rid"],
        ).collect()
    }
    assert out[1] == (11, 100)   # simultaneous right row matches (<=)
    assert out[2] == (12, 200)   # latest of the two earlier views
    assert out[3] == (None, None)  # nothing at-or-before t=50
    assert out[4] == (None, None)  # key with no right rows at all


def test_asof_join_tolerance(spark):
    from luc4ir_spark.operators import eventops as eo

    left = spark.createDataFrame(
        [(1, 5, 1000), (2, 5, 1500)], "lid long, user_id long, t_us long"
    )
    right = spark.createDataFrame(
        [(9, 5, 900)], "rid long, user_id long, r_us long"
    )
    out = {
        r["lid"]: r["rid"]
        for r in eo.asof_join(
            left,
            right.select("user_id", "r_us", "rid"),
            key="user_id",
            left_time_us="t_us",
            right_time_us="r_us",
            payload_cols=["rid"],
            tolerance_us=200,
        ).collect()
    }
    assert out[1] == 9      # 100 us old, inside the 200 us tolerance
    assert out[2] is None   # 600 us old -> nulled, not the next older


def test_hypertable_rollup_levels(spark):
    from luc4ir_spark.operators import eventops as eo

    rows = [
        (1, "2024-01-01 10:15:00", "click", 1.234),
        (2, "2024-01-01 10:45:00", "click", 2.001),
        (3, "2024-01-01 11:00:00", "view", 0.5),
        (4, "2024-01-02 09:00:00", "click", -1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r["event_type"], r["day_us"], r["hour_us"]): (
            r["n"], r["sum_value_cents"]
        )
        for r in eo.hypertable_rollup(ev, dims=["event_type"]).collect()
    }
    day1 = 1704067200000000  # 2024-01-01 in us
    h10 = day1 + 10 * 3600 * 1000000
    # leaf, day subtotal, type total, grand total all present
    assert out[("click", day1, h10)] == (2, 123 + 200)
    assert out[("click", day1, -1)] == (2, 323)
    assert out[("click", -1, -1)] == (3, 323 - 100)
    assert out[("(all)", -1, -1)] == (4, 323 - 100 + 50)
    # one rollup pass: 4 levels x keys, no duplicate cells
    assert len(out) == len(
        set(out)
    ) and sum(1 for k in out if k[1] == -1 and k[2] == -1) == 3  # 2 types + grand


@settings(max_examples=8, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)),
        min_size=1, max_size=12,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)),
        min_size=0, max_size=12,
    ),
    tol=st.one_of(st.none(), st.integers(1, 15)),
)
def test_asof_join_matches_pandas_merge_asof(spark, lefts, rights, tol):
    import pandas as pd

    from luc4ir_spark.operators import eventops as eo

    # pandas merge_asof requires unique-per-time right rows for a
    # deterministic compare; dedupe (key, t) keeping one rid
    rmap = {}
    for i, (k, t) in enumerate(rights):
        rmap[(k, t)] = 100 + i
    rrows = [(k, t, rid) for (k, t), rid in sorted(rmap.items())]
    lrows = [(i, k, t) for i, (k, t) in enumerate(lefts)]
    ldf = spark.createDataFrame(lrows, "lid long, user_id long, t_us long")
    if rrows:
        rdf = spark.createDataFrame(
            rrows, "user_id long, r_us long, rid long"
        )
    else:
        rdf = spark.createDataFrame(
            [], "user_id long, r_us long, rid long"
        )
    got = {
        r["lid"]: r["rid"]
        for r in eo.asof_join(
            ldf, rdf, key="user_id", left_time_us="t_us",
            right_time_us="r_us", payload_cols=["rid"],
            tolerance_us=tol,
        ).collect()
    }
    lp = pd.DataFrame(lrows, columns=["lid", "user_id", "t_us"]).sort_values(
        "t_us", kind="stable"
    )
    rp = (
        pd.DataFrame(rrows, columns=["user_id", "r_us", "rid"])
        .astype({"user_id": "int64", "r_us": "int64", "rid": "int64"})
        .sort_values("r_us", kind="stable")
    )
    merged = pd.merge_asof(
        lp, rp, left_on="t_us", right_on="r_us", by="user_id",
        direction="backward",
        tolerance=None if tol is None else tol,
    )
    want = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in merged.itertuples()
    }
    assert got == want


def test_hopping_window_stats_hand_computed(spark):
    """1h/30min hopping: each event lands in exactly two windows; the
    per-window tallies match a hand replication."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from luc4ir_spark.operators import eventops as eo

    rows = [
        (1, datetime(2024, 1, 1, 0, 10), "a", 1.0),
        (2, datetime(2024, 1, 1, 0, 40), "a", 2.0),
        (3, datetime(2024, 1, 1, 1, 5), "b", 4.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {
        (str(r["window_start"]), r["event_type"]):
            (r["n_events"], r["sum_value"])
        for r in eo.hopping_window_stats(
            ev, window="1 hour", slide="30 minutes"
        ).collect()
    }
    # event@00:10 -> windows starting 23:30(prev day) and 00:00
    # event@00:40 -> 00:00 and 00:30; event@01:05 -> 00:30 and 01:00
    assert out[("2024-01-01 00:00:00", "a")] == (2, 3.0)
    assert out[("2023-12-31 23:30:00", "a")] == (1, 1.0)
    assert out[("2024-01-01 00:30:00", "a")] == (1, 2.0)
    assert out[("2024-01-01 00:30:00", "b")] == (1, 4.0)
    assert out[("2024-01-01 01:00:00", "b")] == (1, 4.0)
    assert sum(v[0] for v in out.values()) == 2 * len(rows)


def test_funnel_counts_hand_computed(spark):
    """Order matters: a user with click BEFORE view converts step 1
    only; ties at the same timestamp count; counts weakly decrease."""
    from datetime import datetime

    from luc4ir_spark.operators import eventops as eo

    t0 = datetime(2024, 1, 1, 0, 0)
    t1 = datetime(2024, 1, 1, 0, 5)
    t2 = datetime(2024, 1, 1, 0, 9)
    rows = [
        # u1 converts fully in order
        (1, t0, 1, "view"), (2, t1, 1, "click"), (3, t2, 1, "buy"),
        # u2: click before view -> stops at step 1
        (4, t0, 2, "click"), (5, t1, 2, "view"),
        # u3: view+click at the SAME instant -> tie counts (>=)
        (6, t0, 3, "view"), (7, t0, 3, "click"),
        # u4 never views
        (8, t0, 4, "buy"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["step"]: (r["event_type"], r["n_users"])
        for r in eo.funnel_counts(
            ev, steps=["view", "click", "buy"]
        ).collect()
    }
    assert out[1] == ("view", 3)   # u1, u2, u3
    assert out[2] == ("click", 2)  # u1, u3 (u2's click precedes view)
    assert out[3] == ("buy", 1)    # u1


def test_event_transitions_hand_computed(spark):
    """Transitions follow each user's (ts, event_id) order; cross-user
    sequences never mix."""
    from datetime import datetime

    from luc4ir_spark.operators import eventops as eo

    t = [datetime(2024, 1, 1, 0, m) for m in range(5)]
    rows = [
        (1, t[0], 1, "a"), (2, t[1], 1, "b"), (3, t[2], 1, "a"),
        (4, t[0], 2, "b"), (5, t[0], 2, "c"),  # same instant: id order
        (6, t[3], 2, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r["src"], r["dst"]): r["n_transitions"]
        for r in eo.event_transitions(ev).collect()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1,
                   ("c", "a"): 1}


def test_k_anonymity_report_hand_computed(spark):
    """Profiles: u1/u2 both (bucket 2, top 'b' — tie a=b=1 resolves to
    the LATER type); u3 (bucket 4, top 'a'). k=2: the shared combo is
    safe, the singleton is at risk."""
    rows = [
        (0, datetime(2024, 1, 1, 1), 1, "a"),
        (1, datetime(2024, 1, 1, 2), 1, "b"),
        (2, datetime(2024, 1, 1, 1), 2, "a"),
        (3, datetime(2024, 1, 1, 2), 2, "b"),
        (4, datetime(2024, 1, 1, 1), 3, "a"),
        (5, datetime(2024, 1, 1, 2), 3, "a"),
        (6, datetime(2024, 1, 1, 3), 3, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["activity_bucket"], r["top_type"]): r
        for r in eo.k_anonymity_report(ev, k=2).collect()
    }
    assert set(out) == {(2, "b"), (4, "a")}
    assert out[(2, "b")]["n_users"] == 2
    assert out[(2, "b")]["at_risk"] is False
    assert out[(4, "a")]["n_users"] == 1
    assert out[(4, "a")]["at_risk"] is True


def test_burst_report_hand_computed(spark):
    """u1: 3 events in one minute (> threshold 2) + 1 elsewhere ->
    flagged, peak 3, one bursty minute; u2: spread out -> clean.
    A minute boundary (59.9s vs 60s) splits cells correctly."""
    rows = [
        (0, datetime(2024, 1, 1, 0, 0, 1), 1, "view"),
        (1, datetime(2024, 1, 1, 0, 0, 30), 1, "view"),
        (2, datetime(2024, 1, 1, 0, 0, 59), 1, "view"),
        (3, datetime(2024, 1, 1, 0, 1, 0), 1, "view"),   # next minute
        (4, datetime(2024, 1, 1, 1, 0, 0), 2, "view"),
        (5, datetime(2024, 1, 1, 2, 0, 0), 2, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["user_id"]: (r["n_events"], r["peak_minute_events"],
                       r["n_bursty_minutes"], r["flagged"])
        for r in eo.burst_report(ev, threshold=2).collect()
    }
    assert got == {1: (4, 3, 1, True), 2: (2, 1, 0, False)}


def test_query_volume_curve_hand_computed(spark):
    """a×3, b×2, c×1 -> ranks 1..3, cum shares 0.5, 5/6, 1.0; tie
    ordering by query name."""
    lg = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("b",), ("c",)],
        "query string",
    )
    got = {
        r["rank"]: (r["query"], r["n"], r["cum_n"], r["cum_share"])
        for r in eo.query_volume_curve(lg).collect()
    }
    assert got == {
        1: ("a", 3, 3, 0.5),
        2: ("b", 2, 5, round(5 / 6, 4)),
        3: ("c", 1, 6, 1.0),
    }


def test_sat_clicks_hand_computed(spark):
    """u1: click at :00 followed at :10 (10 s dwell -> unsatisfied),
    click at :10 followed 40 s later by a non-click (satisfied — the
    successor may be ANY event type), terminal click (satisfied,
    dwell -1). u2: single terminal click."""
    rows = [
        (0, datetime(2024, 1, 1, 0, 0, 0), 1, "click"),
        (1, datetime(2024, 1, 1, 0, 0, 10), 1, "click"),
        (2, datetime(2024, 1, 1, 0, 0, 50), 1, "view"),
        (3, datetime(2024, 1, 1, 0, 1, 0), 1, "click"),
        (4, datetime(2024, 1, 1, 9, 0, 0), 2, "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["event_id"]: (r["dwell_us"], r["satisfied"])
        for r in eo.sat_clicks(ev).collect()
    }
    assert got == {
        0: (10_000_000, False),
        1: (40_000_000, True),
        3: (-1, True),
        4: (-1, True),
    }


def test_l_diversity_report_hand_computed(spark):
    """Bucket 2 holds u1 (top 'b') and u2 (top 'b') — one distinct
    sensitive value, flagged at l=2 even though it IS 2-anonymous;
    bucket 4 holds u3 (top 'a') and u4 (top 'c') — two distinct values,
    diverse."""
    rows = [
        (0, datetime(2024, 1, 1, 1), 1, "a"),
        (1, datetime(2024, 1, 1, 2), 1, "b"),
        (2, datetime(2024, 1, 1, 1), 2, "a"),
        (3, datetime(2024, 1, 1, 2), 2, "b"),
        (4, datetime(2024, 1, 1, 1), 3, "a"),
        (5, datetime(2024, 1, 1, 2), 3, "a"),
        (6, datetime(2024, 1, 1, 3), 3, "b"),
        (7, datetime(2024, 1, 1, 1), 4, "c"),
        (8, datetime(2024, 1, 1, 2), 4, "c"),
        (9, datetime(2024, 1, 1, 3), 4, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["activity_bucket"]: r
        for r in eo.l_diversity_report(ev, l=2).collect()
    }
    assert set(out) == {2, 4}
    assert out[2]["n_users"] == 2
    assert out[2]["n_sensitive"] == 1
    assert out[2]["at_risk"] is True
    assert out[4]["n_users"] == 2
    assert out[4]["n_sensitive"] == 2
    assert out[4]["at_risk"] is False


def test_session_abandonment_hand_computed(spark):
    """u1: one session with a click (converted) + a second session
    (gap > 30 min) with views only (abandoned); u2: one purchase-only
    session (converted). 3 sessions, 1 abandoned -> rate 1/3."""
    rows = [
        (0, datetime(2024, 1, 1, 10, 0), 1, "view"),
        (1, datetime(2024, 1, 1, 10, 5), 1, "click"),
        (2, datetime(2024, 1, 1, 12, 0), 1, "view"),   # new session
        (3, datetime(2024, 1, 1, 12, 10), 1, "view"),
        (4, datetime(2024, 1, 1, 9, 0), 2, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = eo.session_abandonment(ev).collect()[0]
    assert r["n_sessions"] == 3
    assert r["n_converted"] == 2
    assert r["n_abandoned"] == 1
    assert r["abandonment_rate"] == pytest.approx(1 / 3)


def test_event_lift_hand_computed(spark):
    """4 users: {a,b}, {a,b}, {a}, {c}. n_a=3 n_b=2 n_c=1 n_ab=2 ->
    support 0.5, conf(a->b) 2/3, lift 2·4/(3·2) = 4/3; duplicate
    events per user collapse; (a,c) never co-occur -> no row."""
    rows = [
        (0, datetime(2024, 1, 1, 1), 1, "a"),
        (1, datetime(2024, 1, 1, 2), 1, "a"),  # dup type, same user
        (2, datetime(2024, 1, 1, 3), 1, "b"),
        (3, datetime(2024, 1, 1, 1), 2, "a"),
        (4, datetime(2024, 1, 1, 2), 2, "b"),
        (5, datetime(2024, 1, 1, 1), 3, "a"),
        (6, datetime(2024, 1, 1, 1), 4, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {(r["type_a"], r["type_b"]): r
           for r in eo.event_lift(ev).collect()}
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert r["n_ab"] == 2
    assert r["support"] == pytest.approx(0.5)
    assert r["conf_a_b"] == pytest.approx(2 / 3)
    assert r["lift"] == pytest.approx(4 / 3)


def test_rfm_report_hand_computed(spark):
    """5 users with metrics 1..5 on every dimension: interpolated
    quintile boundaries over [1..5] are (1.8, 2.6, 3.4, 4.2), so user
    u scores exactly u on R (recency 5-u days), F (u events) and M
    (10u cents) -> rfm = 111·u."""
    rows = []
    eid = 0
    for u in range(1, 6):
        for k in range(u):  # u events, all on day u-1, value 0.10
            rows.append((eid, datetime(2024, 1, u, 1 + k), u, 0.10))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {r["user_id"]: r for r in eo.rfm_report(ev).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for u in range(1, 6):
        r = out[u]
        assert r["recency_days"] == 5 - u
        assert r["frequency"] == u
        assert r["monetary_cents"] == 10 * u
        assert (r["r_score"], r["f_score"], r["m_score"]) == (u, u, u)
        assert r["rfm"] == 111 * u


def test_event_anomaly_hand_computed(spark):
    """Day 5 of type a spikes to 10 against baseline {4,5,6,5,5}
    (mean 5, sd sqrt(0.5)) -> z = 5/sqrt(0.5) ~= 7.0711 flagged; the
    in-band days are not; type b spikes over a CONSTANT baseline
    (sd 0) and must be skipped, not flagged or divided by zero."""
    import math

    a_counts = [4, 5, 6, 5, 5, 10]
    b_counts = [3, 3, 3, 3, 3, 9]
    rows = []
    eid = 0
    for day, (na, nb) in enumerate(zip(a_counts, b_counts)):
        for k in range(na):
            rows.append((eid, datetime(2024, 1, 1 + day, 1 + k), "a"))
            eid += 1
        for k in range(nb):
            rows.append((eid, datetime(2024, 1, 1 + day, 1 + k), "b"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = eo.event_anomaly(
        ev, window_days=7, z_threshold=2.0, min_history=4
    ).collect()
    assert len(out) == 1
    r = out[0]
    us = 86_400_000_000
    d5 = (datetime(2024, 1, 6) - datetime(1970, 1, 1)).days * us
    assert r["event_type"] == "a"
    assert r["day_us"] == d5
    assert r["n_events"] == 10
    assert r["z"] == pytest.approx(5 / math.sqrt(0.5), rel=1e-9)


def test_event_ewma_hand_computed(spark):
    """W=3 kernel (weights 4,2,1): head renormalization over the days
    that exist, a silent (densified) day counting 0, and a second type
    windowed independently."""
    rows = [
        # type a: day0 -> 2 events, day1 -> 1, day2 -> none, day3 -> 4
        (1, datetime(2024, 1, 1, 10), "a"),
        (2, datetime(2024, 1, 1, 11), "a"),
        (3, datetime(2024, 1, 2, 9), "a"),
        (4, datetime(2024, 1, 4, 9), "a"),
        (5, datetime(2024, 1, 4, 10), "a"),
        (6, datetime(2024, 1, 4, 11), "a"),
        (7, datetime(2024, 1, 4, 12), "a"),
        # type b: only day1 -> grid densifies days 0..3 with zeros
        (8, datetime(2024, 1, 2, 9), "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = eo.event_ewma(ev, window_days=3)
    us = 86_400_000_000
    d0 = (datetime(2024, 1, 1) - datetime(1970, 1, 1)).days * us
    got = {
        (r["event_type"], r["day_us"]): (r["n_events"], r["ewma"])
        for r in out.collect()
    }
    # type a: day0 ewma = 2*4/4 = 2.0 (head: only weight 4 exists);
    # day1 = (1*4 + 2*2)/(4+2) = 8/6; day2 = (0*4+1*2+2*1)/7 = 4/7;
    # day3 = (4*4+0*2+1*1)/7 = 17/7
    assert got[("a", d0)] == (2, pytest.approx(2.0))
    assert got[("a", d0 + us)] == (1, pytest.approx(8 / 6, rel=1e-12))
    assert got[("a", d0 + 2 * us)] == (0, pytest.approx(4 / 7, rel=1e-12))
    assert got[("a", d0 + 3 * us)] == (4, pytest.approx(17 / 7, rel=1e-12))
    # type b rides the same global grid: 4 rows; day0 exists as a
    # densified zero, so day1's kernel renormalizes over weights 4+2
    assert got[("b", d0)] == (0, pytest.approx(0.0))
    assert got[("b", d0 + us)] == (1, pytest.approx(4 / 6, rel=1e-12))
    assert got[("b", d0 + 2 * us)] == (0, pytest.approx(2 / 7, rel=1e-12))
    assert len(got) == 8


def test_t_closeness_report_hand_computed(spark):
    """Same release as the l-diversity test: bucket 2 = {u1:'b',
    u2:'b'}, bucket 4 = {u3:'a', u4:'c'}; global sens counts b=2,
    a=1, c=1 over N=4. Bucket 2 (g=2): terms |2*4-2*2|/(2*4)=4,
    |0-1*2|=2, |0-1*2|=2 -> S=8, tvd=8/(2*2*4)=0.5. Bucket 4: b term
    |0-2*2|=4, a |1*4-1*2|=2, c |1*4-1*2|=2 -> S=8, tvd=0.5. At
    t=(2,5)=0.4 both flag; at t=(1,2)=0.5 neither (strict >)."""
    from datetime import datetime

    rows = [
        (0, datetime(2024, 1, 1, 1), 1, "a"),
        (1, datetime(2024, 1, 1, 2), 1, "b"),
        (2, datetime(2024, 1, 1, 1), 2, "a"),
        (3, datetime(2024, 1, 1, 2), 2, "b"),
        (4, datetime(2024, 1, 1, 1), 3, "a"),
        (5, datetime(2024, 1, 1, 2), 3, "a"),
        (6, datetime(2024, 1, 1, 3), 3, "b"),
        (7, datetime(2024, 1, 1, 1), 4, "c"),
        (8, datetime(2024, 1, 1, 2), 4, "c"),
        (9, datetime(2024, 1, 1, 3), 4, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["activity_bucket"]: r
        for r in eo.t_closeness_report(ev, t=(2, 5)).collect()
    }
    assert set(out) == {2, 4}
    assert out[2]["n_users"] == 2 and out[2]["tvd"] == 0.5
    assert out[4]["n_users"] == 2 and out[4]["tvd"] == 0.5
    assert out[2]["at_risk"] is True and out[4]["at_risk"] is True
    # strict inequality: tvd == t does not flag
    out2 = {
        r["activity_bucket"]: r["at_risk"]
        for r in eo.t_closeness_report(ev, t=(1, 2)).collect()
    }
    assert out2 == {2: False, 4: False}


def test_conversion_ztest_hand_computed(spark):
    """Arms: a = 4 users 3 converted, b = 4 users 1 converted.
    p_a=0.75, p_b=0.25, pooled 0.5 -> z = 0.5/sqrt(0.25*0.5) ~
    1.4142. Multi-event users collapse to one flag; zero-variance
    and empty-arm corners go NULL."""
    import math

    import pytest as pt

    rows = []
    for u in range(4):
        rows += [(u, "a", u < 3), (u, "a", False)]  # dup events
    for u in range(10, 14):
        rows.append((u, "b", u == 10))
    ev = spark.createDataFrame(
        rows, "user_id long, variant string, converted boolean"
    )
    r = eo.conversion_ztest(ev).collect()[0]
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (4, 4, 3, 1)
    assert r["p_a"] == 0.75 and r["p_b"] == 0.25
    want = 0.5 / math.sqrt(0.5 * 0.5 * (0.25 + 0.25))
    assert r["z"] == pt.approx(round(want, 4), abs=1e-4)
    allconv = spark.createDataFrame(
        [(1, "a", True), (2, "b", True)],
        "user_id long, variant string, converted boolean",
    )
    assert eo.conversion_ztest(allconv).collect()[0]["z"] is None


def test_weekday_seasonality_hand_computed(spark):
    """14 events on a Monday, 7 on the following Tuesday: weekday
    counts (14, 7, 0 x 5), n=21, chi2 = sum((7*o - 21)^2)/(7*21) =
    (77^2 + 28^2 + 5*21^2)/147 = (5929 + 784 + 2205)/147 ~ 60.667.
    2024-01-01 was a Monday."""
    from datetime import datetime

    rows = [(i, datetime(2024, 1, 1, i % 24)) for i in range(14)]
    rows += [(100 + i, datetime(2024, 1, 2, i)) for i in range(7)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {
        r["weekday"]: r for r in eo.weekday_seasonality(ev).collect()
    }
    assert len(got) == 7
    assert got[1]["n_events"] == 14 and got[2]["n_events"] == 7
    assert all(got[d]["n_events"] == 0 for d in range(3, 8))
    assert got[1]["share"] == round(14 / 21, 4)
    want = (77**2 + 28**2 + 5 * 21**2) / (7 * 21)
    assert got[1]["chi2"] == round(want, 4)
    # uniform log -> chi2 == 0
    uni = spark.createDataFrame(
        [(d, datetime(2024, 1, 1 + d)) for d in range(7)],
        "event_id long, ts timestamp",
    )
    assert eo.weekday_seasonality(uni).collect()[0]["chi2"] == 0.0


def test_event_paths_hand_computed(spark):
    """u1: a,b,c,b -> paths a>b>c, b>c>b; u2: a,b,c -> a>b>c. Counts
    {a>b>c: 2, b>c>b: 1}; paths never cross users; rank by count then
    path; top_n cuts."""
    from datetime import datetime

    rows = [
        (0, datetime(2024, 1, 1, 0), 1, "a"),
        (1, datetime(2024, 1, 1, 1), 1, "b"),
        (2, datetime(2024, 1, 1, 2), 1, "c"),
        (3, datetime(2024, 1, 1, 3), 1, "b"),
        (4, datetime(2024, 1, 1, 0), 2, "a"),
        (5, datetime(2024, 1, 1, 1), 2, "b"),
        (6, datetime(2024, 1, 1, 2), 2, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["path"]: (r["n_paths"], r["rank"])
        for r in eo.event_paths(ev, length=3, top_n=20).collect()
    }
    assert got == {"a>b>c": (2, 1), "b>c>b": (1, 2)}
    top1 = eo.event_paths(ev, length=3, top_n=1).collect()
    assert len(top1) == 1 and top1[0]["path"] == "a>b>c"
