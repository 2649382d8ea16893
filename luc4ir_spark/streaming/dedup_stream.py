"""Streaming twin of ``operators.dedup.exact_duplicates``: exact
first-wins dedup over a document stream.

A training-data ingest pipeline dedups WHILE ingesting — each arriving
document is kept iff its content digest has never been seen before.
Structured Streaming's ``dropDuplicates`` on the digest keeps exactly
that seen-set in the state store: one entry per DISTINCT digest (16-byte
md5 key + offsets — the minimum any exact streaming dedup must hold;
with the RocksDB state store provider this scales past executor memory).
The corpus itself is never buffered, and append mode emits every kept
doc exactly once.

First-wins semantics across micro-batches: a digest's survivor is the
first arrival (earlier micro-batch wins). Within one micro-batch the
survivor among same-digest rows is an arbitrary member of that batch —
same digest, byte-identical content, so WHICH doc_id survives is
metadata, not data. The batch twin (``exact_duplicates``'s
``keep_doc_id = min(doc_id)``) makes the same "any one representative"
choice deterministically; the streamed == batch test aligns the two by
making cross-wave dupes the only dupes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, content string"


def start_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str = DOC_SCHEMA,
):
    """Start the streaming dedup: parquet doc files in ``input_dir`` ->
    kept (doc_id, digest) rows appended under ``out_dir/kept``. Returns
    the StreamingQuery (availableNow trigger — drains what is present,
    then stops; restart with the same checkpoint to resume the seen-set
    exactly where it left off)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = (
        stream.withColumn("digest", F.md5("content"))
        .dropDuplicates(["digest"])
        .select("doc_id", "digest")
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "kept"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
