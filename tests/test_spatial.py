"""Grid-partitioned spatial search (operators/spatial.py) vs a
brute-force Python replay."""

import pytest
from pyspark.sql import functions as F

from luc4ir_spark.operators import spatial as spat


@pytest.fixture(scope="module")
def points(spark):
    # deterministic scatter incl. cell-boundary and exact-radius cases
    rows = [(i, (i * 37) % 100, (i * 61 + 13) % 100) for i in range(200)]
    return rows, spark.createDataFrame(rows, "doc_id long, x long, y long")


def _brute(rows, qx, qy, r):
    hits = [
        (d, (x - qx) ** 2 + (y - qy) ** 2)
        for d, x, y in rows
        if (x - qx) ** 2 + (y - qy) ** 2 <= r * r
    ]
    hits.sort(key=lambda t: (t[1], t[0]))
    return [(d, d2, i + 1) for i, (d, d2) in enumerate(hits)]


def test_radius_join_matches_brute_force(spark, points):
    rows, pts = points
    qs = spark.createDataFrame(
        [("a", 50, 50), ("b", 0, 0), ("c", 99, 99)],
        "qid string, qx long, qy long",
    )
    got = spat.grid_radius_join(pts, qs, radius=17).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(
            (r["doc_id"], r["dist2"], r["rank"])
        )
    for qid, (qx, qy) in {"a": (50, 50), "b": (0, 0), "c": (99, 99)}.items():
        want = _brute(rows, qx, qy, 17)
        assert sorted(by_q.get(qid, [])) == sorted(want), qid


def test_radius_boundary_inclusive_and_neighbor_cell(spark):
    # one point exactly at distance r (inclusive), one in a NEIGHBOR
    # grid cell but within r, one just outside r
    pts = spark.createDataFrame(
        [(1, 10, 0), (2, 9, 11), (3, 10, 11)],
        "doc_id long, x long, y long",
    )
    qs = spark.createDataFrame([("q", 0, 0)], "qid string, qx long, qy long")
    got = {
        r["doc_id"]: (r["dist2"], r["rank"])
        for r in spat.grid_radius_join(pts, qs, radius=10).collect()
    }
    assert got == {1: (100, 1)}
    # widen: doc 2 at dist2 202 enters at r=15 (cells are 15-wide now,
    # doc sits in the same cell ring), doc 3 at 221 too
    got15 = {
        r["doc_id"]: r["rank"]
        for r in spat.grid_radius_join(pts, qs, radius=15).collect()
    }
    assert got15 == {1: 1, 2: 2, 3: 3}


def test_radius_join_broadcasts_queries(spark, points):
    _, pts = points
    qs = spark.createDataFrame([("q", 5, 5)], "qid string, qx long, qy long")
    df = spat.grid_radius_join(pts, qs, radius=9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_bbox_filter(spark, points):
    rows, pts = points
    got = sorted(
        r["doc_id"]
        for r in spat.bbox_filter(pts, 10, 40, 20, 60).collect()
    )
    want = sorted(
        d for d, x, y in rows if 10 <= x <= 40 and 20 <= y <= 60
    )
    assert got == want


def test_radius_validation(spark, points):
    _, pts = points
    qs = spark.createDataFrame([("q", 0, 0)], "qid string, qx long, qy long")
    with pytest.raises(ValueError):
        spat.grid_radius_join(pts, qs, radius=0)
