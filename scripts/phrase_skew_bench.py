#!/usr/bin/env python
"""Stopword-led phrase micro-benchmark — evidence for the
rarest-term seeding (Lucene ExactPhraseMatcher lead-with-cheapest).

Builds a skewed positional index: every document contains the
stopwords 'and'/'the'; only --rare-docs documents contain 'zebra',
and those documents contain the phrase "and the zebra". The query is
the stopword-led exact phrase ["and", "the", "zebra"].

Why THREE terms with two stopwords: with a 2-term phrase, AQE
broadcasts the rare cell under either order and both plans stream the
big cell exactly once — the orders tie. With two stopwords first,
phrase order must join and×the (every document matches), computing
the per-row position intersection over a CORPUS-SIZED intermediate
and carrying it into the next join, before the rare term finally
prunes; the rarest-first order keeps every intermediate at
df('zebra') rows. Both orders return identical rows (the
start-position intersection is order-independent); this script times
the shipped df-ordered walk against a phrase-order walk forced
through the _dfs override, interleaved within each rep so VM drift
hits both equally, and reports minima + the calibration probes.

Writes BENCH/phrase_skew_r5.json (or --out).
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def calibrate() -> float:
    t0 = time.time()
    x = 0
    while time.time() - t0 < 1.0:
        x += 1
    return round(x / 1e6, 2)


def calibrate_alloc(mb: int = 256) -> float:
    import numpy as np

    t0 = time.time()
    np.ones(mb * 131_072, dtype=np.int64)
    return round(mb / (time.time() - t0), 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240_000)
    ap.add_argument("--rare-docs", type=int, default=50)
    ap.add_argument("--stopword-tf", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH", "phrase_skew_r5.json")
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from luc4ir_spark.operators import indexer as ix
    from luc4ir_spark.operators import retrieval as rt
    from luc4ir_spark.session import get_spark

    out: dict = {
        "docs": args.docs,
        "rare_docs": args.rare_docs,
        "reps": args.reps,
        "cpus": args.cpus,
        "calib_m_iters_pre": calibrate(),
        "calib_alloc_mb_s_pre": calibrate_alloc(),
    }

    spark = get_spark(
        app_name="phrase_skew_bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    # every doc: "and the w<k> " x --stopword-tf (realistic stopword
    # densities — the per-row position arrays the naive walk
    # intersects over the corpus-sized intermediate); rare docs end
    # with "and the zebra runs" so the phrase exists only there
    body = F.repeat(
        F.concat(
            F.lit("and the w"), (F.col("id") % 5000).cast("string"),
            F.lit(" "),
        ),
        args.stopword_tf,
    )
    base = spark.range(args.docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            body,
            F.when(
                F.col("id") < args.rare_docs, F.lit("and the zebra runs")
            ).otherwise(F.lit("and the filler walks")),
        ).alias("text"),
    )
    toks = base.select(
        "doc_id",
        F.array_remove(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), ""
        ).alias("tokens"),
    )
    pos = ix.build_positional_postings(toks).persist()
    n_cells = pos.count()  # materialized outside every timed window
    out["positional_cells"] = n_cells

    phrase = ["and", "the", "zebra"]
    # forcing phrase order through _dfs: fake dfs ascending in phrase
    # position so the constraint sort reproduces the naive walk
    PHRASE_ORDER_DFS = {"and": 1, "the": 2, "zebra": 3}

    def run(dfs) -> int:
        return rt.phrase_query(pos, phrase, _dfs=dfs).count()

    variants = {
        "rare_seed": {
            "and": args.docs, "the": args.docs, "zebra": args.rare_docs
        },
        "phrase_order_seed": PHRASE_ORDER_DFS,
    }
    times: dict = {v: [] for v in variants}
    rows: dict = {}
    # warm both paths
    for name, dfs in variants.items():
        rows[name] = run(dfs)
    for rep in range(args.reps):
        for name, dfs in variants.items():
            t0 = time.time()
            rows[name] = run(dfs)
            times[name].append(round(time.time() - t0, 3))
        print(f"rep {rep}: {json.dumps(times)}", flush=True)

    assert rows["rare_seed"] == rows["phrase_order_seed"], rows
    out["result_rows"] = rows["rare_seed"]
    for name, ts in times.items():
        out[f"{name}_min_sec"] = min(ts)
        out[f"{name}_median_sec"] = round(statistics.median(ts), 3)
        out[f"{name}_reps"] = ts
    out["rare_seed_speedup_on_min"] = round(
        out["phrase_order_seed_min_sec"] / out["rare_seed_min_sec"], 2
    )
    out["calib_m_iters_post"] = calibrate()
    out["calib_alloc_mb_s_post"] = calibrate_alloc()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
