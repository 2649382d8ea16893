"""Streaming twin of ``operators.retrieval.percolate``: continuous
alerting — every arriving document is matched against the registered
query set as it lands (the Lucene Monitor / ES percolator deployment
shape: saved searches fire on the ingest stream).

Percolation is PER-DOCUMENT — a doc's matches depend only on its own
content and the (static, broadcast) query registry — so matching each
micro-batch independently with the batch operator is exact: no
watermark, no streaming state at all. ``foreachBatch`` + the
``batch_id``-partitioned parquet layout (shared with
``incremental_index``) turns at-least-once replays into exactly-once
results: a replayed batch dynamically overwrites its own partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .incremental_index import _write_batch_partition

DOC_SCHEMA = "doc_id long, content string"


def start_percolate_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    query_terms: DataFrame,
    schema: str = DOC_SCHEMA,
    mode: str = "all",
    min_should_match: int = 1,
):
    """Parquet doc files in ``input_dir`` -> (doc_id, qid, n_matched)
    alert rows under ``out_dir/matches`` (batch_id-partitioned).
    Returns the StreamingQuery (availableNow — drains and stops;
    restart with the same checkpoint to continue)."""
    from ..operators.retrieval import percolate

    stream = spark.readStream.schema(schema).parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = percolate(
            batch_df,
            query_terms,
            mode=mode,
            min_should_match=min_should_match,
            content_col="content",
        )
        _write_batch_partition(
            out, os.path.join(out_dir, "matches"), batch_id
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option(
            "checkpointLocation", os.path.join(out_dir, "_checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )


def read_percolate_matches(spark: SparkSession, out_dir: str) -> DataFrame:
    """All alert rows flushed so far (batch_id partitions unioned)."""
    return spark.read.parquet(os.path.join(out_dir, "matches")).select(
        "doc_id", "qid", "n_matched"
    )
