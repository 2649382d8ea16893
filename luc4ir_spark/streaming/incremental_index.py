"""Structured Streaming incremental index maintenance.

The reference is strictly batch (no streaming anywhere; SURVEY §2.9).
This module adds the streaming ingest a living corpus needs: new
document files land in a directory, a Structured Streaming query
tokenizes each micro-batch and APPENDS its postings/doc-stat rows to the
index tables via ``foreachBatch`` (exactly-once per batch id on the
parquet sink through Spark's streaming checkpoint).

Append-only postings are sound because (term, doc_id) pairs from new
docs never collide with old ones (doc ids are unique); term-level
statistics (df/cf/N/avgdl) are recomputed lazily at query time from the
union — the same "segments + merge-on-read" shape Lucene uses, with the
streaming micro-batch as the segment."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.analysis import AnalyzerConfig
from ..operators.indexer import (
    CollectionStats,
    IndexConfig,
    InvertedIndex,
    build_flat_postings,
    build_term_stats,
    tokenize,
)

DOC_SCHEMA = "doc_id long, content string"


def start_incremental_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    cfg: IndexConfig | None = None,
    id_col: str = "doc_id",
    content_col: str = "content",
    schema: str = DOC_SCHEMA,
):
    """Start the streaming query: parquet files arriving in ``input_dir``
    are incrementally tokenized into ``index_dir/{postings,doc_stats}``.
    Returns the StreamingQuery (caller manages lifecycle)."""
    cfg = cfg or IndexConfig()
    stream = (
        spark.readStream.schema(schema).parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        toks = tokenize(batch_df, cfg.analyzer, id_col, content_col)
        flat = build_flat_postings(toks)
        flat.write.mode("append").parquet(
            os.path.join(index_dir, "postings")
        )
        ds = toks.select(
            "doc_id", F.size("tokens").cast("long").alias("doc_len")
        )
        ds.write.mode("append").parquet(os.path.join(index_dir, "doc_stats"))

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(index_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def open_incremental_index(
    spark: SparkSession, index_dir: str, cfg: IndexConfig | None = None
) -> InvertedIndex:
    """Open the streaming-maintained tables as a queryable index;
    term/collection stats recomputed from the current union (merge-on-
    read)."""
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    doc_stats = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
    term_stats = build_term_stats(postings)
    row = doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("tot")
    ).collect()[0]
    vocab = term_stats.count()
    return InvertedIndex(
        doc_stats=doc_stats,
        postings=postings,
        term_stats=term_stats,
        stats=CollectionStats(
            n_docs=int(row["n"] or 0),
            total_tokens=int(row["tot"] or 0),
            vocab_size=int(vocab),
        ),
        config=cfg or IndexConfig(),
    )
