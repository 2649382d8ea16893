"""Grid-partitioned spatial point search on an integer coordinate grid.

Reference scope: Lucene's spatial point-query family —
``LatLonPoint.newBoxQuery`` / ``newDistanceQuery`` plus the
distance-sorted collector (lucene/sandbox LatLonPointDistanceQuery) —
re-expressed the way distributed spatial engines (GeoSpark/Sedona,
"Spatial Partitioning Techniques in SpatialHadoop", VLDB'15) do it: a
uniform GRID partitioning whose cell side equals the query radius, so a
radius-r search touches exactly the 3x3 cell neighborhood of the query
point and the candidate join is a plain equi-join on cell ids that
Catalyst can broadcast/shuffle like any other key.

Coordinates are NON-NEGATIVE integers (a projected/quantized grid — the
same move Lucene itself makes internally: LatLonPoint stores lat/lon
quantized to int32 ticks, and BKD range/distance queries run on those
integer ticks). Squared euclidean distance over integer ticks is exact
int64 arithmetic, which keeps every output column engine-portable
(no haversine ulp drift; at 100 TB the quantization error is the same
1-tick bound Lucene documents).

Scale shape: the point side is scanned ONCE in place — the cell id is a
zero-shuffle codegen projection, the query side (query-set-sized)
explodes to 9 literal neighbor offsets and BROADCASTS, the per-row
verify is one integer expression, and the only window is per-qid over
radius-bounded candidates. No corpus shuffle, no all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["grid_radius_join", "bbox_filter"]


def bbox_filter(
    points: DataFrame,
    x_min: int,
    x_max: int,
    y_min: int,
    y_max: int,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Bounding-box query (LatLonPoint.newBoxQuery parity): inclusive
    integer box filter — a pure scan-local predicate Catalyst pushes
    into the source when points come from parquet."""
    return points.filter(
        (F.col(x_col) >= int(x_min))
        & (F.col(x_col) <= int(x_max))
        & (F.col(y_col) >= int(y_min))
        & (F.col(y_col) <= int(y_max))
    )


def grid_radius_join(
    points: DataFrame,
    queries: DataFrame,
    radius: int,
    id_col: str = "doc_id",
    x_col: str = "x",
    y_col: str = "y",
    qid_col: str = "qid",
    qx_col: str = "qx",
    qy_col: str = "qy",
) -> DataFrame:
    """Radius search with a distance-sorted collector
    (LatLonPoint.newDistanceQuery + sort-by-distance parity): for every
    query point, all points within euclidean distance ``radius``
    (inclusive), ranked by distance -> (qid, doc_id, dist2, rank), all
    integers (dist2 is the SQUARED distance — exact int64; taking the
    root would only add float noise to an already-monotone key).

    Correctness of the grid prune: cells have side ``radius``, so any
    point within distance radius of q satisfies |px-qx| <= radius and
    therefore lies in a cell whose index differs from q's by at most 1
    per axis — the 3x3 neighborhood is a superset of every true hit,
    and the exact integer dist2 filter removes the corner residue.
    Coordinates must be non-negative (integer DIV truncates toward
    zero, which only matches floor-grid semantics for >= 0; Lucene's
    tick space is shifted non-negative the same way).

    Ties: ranked by (dist2, doc_id) — deterministic on any engine."""
    r = int(radius)
    if r <= 0:
        raise ValueError("grid_radius_join: radius must be a positive int")
    pts = points.select(
        F.col(id_col).alias("doc_id"),
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
    ).select(
        "doc_id",
        "px",
        "py",
        F.expr(f"px DIV {r}").alias("cx"),
        F.expr(f"py DIV {r}").alias("cy"),
    )
    # 9 literal neighbor offsets: a LITERAL array explode (never a
    # computed-array explode — see the HOF-inlining note in CLAUDE.md)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    cells = (
        queries.select(
            F.col(qid_col).alias("qid"),
            F.col(qx_col).cast("long").alias("qx"),
            F.col(qy_col).cast("long").alias("qy"),
        )
        .select("qid", "qx", "qy", F.explode(offsets).alias("o"))
        .select(
            "qid",
            "qx",
            "qy",
            (F.expr(f"qx DIV {r}") + F.col("o.dx")).alias("cx"),
            (F.expr(f"qy DIV {r}") + F.col("o.dy")).alias("cy"),
        )
    )
    dist2 = (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx")) + (
        F.col("py") - F.col("qy")
    ) * (F.col("py") - F.col("qy"))
    cand = (
        pts.join(F.broadcast(cells), ["cx", "cy"])
        .select("qid", "doc_id", dist2.cast("long").alias("dist2"))
        .filter(F.col("dist2") <= r * r)
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("dist2").asc(), F.col("doc_id").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w).cast("long"))
