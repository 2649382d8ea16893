#!/usr/bin/env python
"""Block-max WAND vs exhaustive scoring in the DISK-RESIDENT regime.

BENCH/BASELINE.md §3b measured the hot-cache case (postings persisted in
memory), where codegen'd exhaustive scoring wins. This harness measures
the regime WAND is designed for: postings NOT cached — every query batch
re-reads its index from parquet. Two effects matter there:

1. storage: the delta+varbyte blob table is a fraction of the flat
   postings' size, so the scan moves far fewer bytes;
2. lazy decode: WAND touches only blocks whose upper bound can beat the
   current heap floor.

Prints one JSON line with table sizes and min-of-reps timings for both
paths at two query mixes (high-df worst case; Zipf realistic mix).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="/tmp/wand_disk_bench")
    args = ap.parse_args()

    from luc4ir_spark.functions.analysis import AnalyzerConfig
    from luc4ir_spark.operators import indexer as ix
    from luc4ir_spark.operators import retrieval as rt
    from luc4ir_spark.operators import wand as wd
    from luc4ir_spark.session import get_spark
    from luc4ir_spark.sources.corpus import (
        HIGH_DF_TOKENS,
        build_vocab,
        synth_corpus,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mem = os.environ.get("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name="wand_disk_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch"
        },
    )
    cfg = ix.IndexConfig(analyzer=AnalyzerConfig(mode="simple"))
    flat_dir = os.path.join(args.out, "flat")
    blob_dir = os.path.join(args.out, "blobs")
    if not os.path.exists(os.path.join(args.out, "_built")):
        docs = synth_corpus(spark, args.docs, seed=42).withColumn(
            "doc_id", F.xxhash64(F.concat_ws("|", "repo", "path", "commit"))
        )
        idx = ix.build_index(docs, cfg)
        idx.postings.write.mode("overwrite").parquet(flat_dir)
        wd.build_compressed_postings(idx).write.mode("overwrite").parquet(
            blob_dir
        )
        idx.term_stats.write.mode("overwrite").parquet(
            os.path.join(args.out, "terms")
        )
        with open(os.path.join(args.out, "stats.json"), "w") as fh:
            json.dump(
                {
                    "n_docs": idx.stats.n_docs,
                    "total_tokens": idx.stats.total_tokens,
                    "vocab_size": idx.stats.vocab_size,
                },
                fh,
            )
        open(os.path.join(args.out, "_built"), "w").write("ok")
        for df in (idx.postings, idx.term_stats):
            df.unpersist()

    stats = json.load(open(os.path.join(args.out, "stats.json")))
    cstats = ix.CollectionStats(**stats)
    term_stats = spark.read.parquet(os.path.join(args.out, "terms"))

    # two query mixes, 50 queries each; vocab is Zipf-ranked, so index
    # position ~ document frequency rank
    vocab = build_vocab(5000)
    mixes = {
        "worst_high_df": [
            (f"h{i}", " ".join(HIGH_DF_TOKENS[i % 10: i % 10 + 3]))
            for i in range(50)
        ],
        "zipf_mix": [
            (
                f"z{i}",
                f"{HIGH_DF_TOKENS[i % 10]}"
                f" {vocab[50 + (i * 13) % 400]}"
                f" {vocab[800 + (i * 31) % 2000]}",
            )
            for i in range(50)
        ],
    }

    timings: dict[str, dict[str, float]] = {}
    for mix_name, queries in mixes.items():
        qt = rt.queries_to_terms(
            spark, queries, cfg.analyzer
        ).persist()
        qt.count()
        t_ex, t_wd = [], []
        for _ in range(args.reps):
            # fresh reads every rep: nothing persisted, plan re-scans
            flat = spark.read.parquet(flat_dir)
            idx = ix.InvertedIndex(
                doc_stats=None, postings=flat, term_stats=term_stats,
                stats=cstats, config=cfg,
            )
            t0 = time.time()
            rt.score_queries(idx, qt, k=args.k).count()
            t_ex.append(time.time() - t0)

            idx.blobs = spark.read.parquet(blob_dir)
            t0 = time.time()
            wd.score_queries_wand(idx, qt, k=args.k).count()
            t_wd.append(time.time() - t0)
        timings[mix_name] = {
            "exhaustive_min_s": round(min(t_ex), 3),
            "wand_min_s": round(min(t_wd), 3),
            "exhaustive_all": [round(t, 2) for t in t_ex],
            "wand_all": [round(t, 2) for t in t_wd],
        }
        qt.unpersist()

    print(json.dumps({
        "metric": "wand_disk_regime",
        "docs": stats["n_docs"],
        "flat_postings_bytes": dir_bytes(flat_dir),
        "blob_bytes": dir_bytes(blob_dir),
        "k": args.k,
        "mixes": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
