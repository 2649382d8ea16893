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


def start_hygiene_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str = DOC_SCHEMA,
):
    """Full ingest-time hygiene in one stream: exact dedup (stateful
    first-wins on the content digest, as above) -> C4/Gopher quality
    gate -> PII scrub, emitting (doc_id, digest, reasons='', clean)
    rows for documents that survive everything. The filter and scrub
    are STATELESS codegen projections (textstats.quality_filter_cols /
    redact_col), so the only streaming state remains the dedup digest
    set — quality thresholds can change between restarts without state
    migration. Same-digest docs have identical content, hence identical
    verdicts, so dedup-then-filter equals filter-then-dedup and the
    batch twin (exact-dup survivors ∩ quality_filter(keep) + redact) is
    well-defined regardless of arrival order."""
    from ..operators import textstats as ts

    stream = spark.readStream.schema(schema).parquet(input_dir)
    f = ts.quality_filter_cols(F.col("content"))
    kept = (
        stream.withColumn("digest", F.md5("content"))
        .dropDuplicates(["digest"])
        .where(f["keep"])
        .select(
            "doc_id",
            "digest",
            ts.redact_col(F.col("content")).alias("clean"),
        )
    )
    return (
        kept.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "kept"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
