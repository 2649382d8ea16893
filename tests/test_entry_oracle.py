"""Replicates the driver's correctness gate locally: run every
``queries()`` entry at sf0.001 and compare against its ``oracle_sql()``
via DuckDB (row count + sorted columns + values)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.conftest import SF_TINY, assert_frames_match

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_TINY, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"qid", "doc_id", "rank", "score"}


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_frames_match(q(spark, SF_TINY), duck.sql(sql), name)


def test_every_oracle_has_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_.keys()) <= set(qs.keys())
