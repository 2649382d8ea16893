#!/usr/bin/env python
"""Cluster entry point: the LLM-training-data hygiene pipeline as one
spark-submit job — exact dedup -> quality filter -> PII scrub ->
(optional) per-stratum sampling -> (optional) chunking — with a
per-stage row-count manifest.

Submit:

    cd <repo-root>
    spark-submit \\
      --py-files $(python -m luc4ir_spark.deploy) \\
      scripts/run_pipeline_job.py \\
      --input  /data/raw_docs_parquet \\   # (doc_id, content[, stratum])
      --output /data/clean_parquet \\
      --stratum-col source --rate web=0.5 --rate wiki=1.0 \\
      --chunk-tokens 512 --chunk-overlap 64

Every stage is the library operator the correctness gate verifies
(dedup.exact_duplicates survivors, textstats.quality_filter,
textstats.redact_col, utilsops.sample_hash_stratified,
textstats.chunk_documents); this script only composes and counts. The
stage counts cost one action per ENABLED stage — pass --no-manifest to
run the whole pipeline as a single lazy write (the 100 TB mode).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--stratum-col", default=None,
                    help="enable per-stratum sampling on this column")
    ap.add_argument("--rate", action="append", default=[],
                    metavar="STRATUM=RATE",
                    help="per-stratum keep rate (repeatable)")
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk-tokens", type=int, default=0,
                    help="> 0 enables sliding-window chunking")
    ap.add_argument("--chunk-overlap", type=int, default=0)
    ap.add_argument("--no-quality", action="store_true")
    ap.add_argument("--no-pii", action="store_true")
    ap.add_argument("--no-manifest", action="store_true",
                    help="skip per-stage counts (single lazy write)")
    args = ap.parse_args()

    from luc4ir_spark.operators import textstats as ts
    from luc4ir_spark.operators import utilsops as ut
    from luc4ir_spark.session import get_spark

    spark = get_spark(app_name="luc4ir_pipeline_job")
    t0 = time.time()
    counts: dict[str, int] = {}

    def stage(name: str, df):
        if not args.no_manifest:
            counts[name] = df.count()
        return df

    docs = stage("input", spark.read.parquet(args.input))
    cc = args.content_col

    # 1. exact dedup: first-wins per content digest (the batch twin of
    # streaming/dedup_stream.py) — keep min(id) per digest
    w_digest = F.md5(F.col(cc))
    kept_ids = (
        docs.select(F.col(args.id_col).alias("_id"), w_digest.alias("_d"))
        .groupBy("_d")
        .agg(F.min("_id").alias("_id"))
        .select("_id")
    )
    docs = stage(
        "dedup",
        docs.join(
            kept_ids, docs[args.id_col] == kept_ids["_id"], "left_semi"
        ),
    )

    # 2. C4/Gopher composite quality gate
    if not args.no_quality:
        cols = ts.quality_filter_cols(F.col(cc))
        docs = stage("quality", docs.where(cols["keep"]))

    # 3. PII scrub (staged regex chain, textstats.PII_PATTERNS order)
    if not args.no_pii:
        docs = docs.withColumn(cc, ts.redact_col(F.col(cc)))

    # 4. per-stratum deterministic Bernoulli sampling
    if args.stratum_col:
        rates = {}
        for spec in args.rate:
            k, _, v = spec.partition("=")
            rates[k] = float(v)
        docs = stage(
            "sample",
            ut.sample_hash_stratified(
                docs, rates, stratum_col=args.stratum_col,
                id_col=args.id_col, seed=args.seed,
                default_rate=args.default_rate,
            ),
        )

    # 5. sliding-window chunking
    if args.chunk_tokens > 0:
        docs = stage(
            "chunks",
            ts.chunk_documents(
                docs, content_col=cc, id_col=args.id_col,
                chunk_tokens=args.chunk_tokens,
                overlap=args.chunk_overlap,
            ),
        )

    docs.write.mode("overwrite").parquet(args.output)

    manifest = {
        "output": args.output,
        "stages": counts,
        "wall_s": round(time.time() - t0, 1),
    }
    if not args.no_manifest:
        # write through Spark so the sidecar lands next to the output
        # on ANY filesystem (HDFS/S3/local), not just a local dir
        spark.createDataFrame(
            [(json.dumps(manifest),)], "value string"
        ).coalesce(1).write.mode("overwrite").text(
            os.path.join(args.output, "_pipeline_manifest")
        )
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
