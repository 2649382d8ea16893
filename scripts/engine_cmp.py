#!/usr/bin/env python
"""SQL-vs-Arrow engine comparison for the two per-doc fingerprint
kernels (MinHash permutation minima, SimHash bit-majority).

Both operators compute bit-identical values through two engines:
"sql" (JVM higher-order array expressions — interpreted, zero Python)
and "arrow" (one vectorized numpy kernel per Arrow batch — pays the
Arrow transfer of the shingle-id arrays). Which wins depends on
num_hashes/num_bits vs serialization cost, so measure, don't guess:
this script times both at --docs (default 60k) with --reps
interleaved repetitions and reports per-engine minima + medians, plus
a value-equality cross-check (xor + count over the full output) and
the standard calibration probes so an unhealthy VM window is visible
in the recorded JSON.

Writes BENCH/engine_cmp_r4.json (or --out).
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
    ap.add_argument("--docs", type=int, default=60_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--num-hashes", type=int, default=16)
    ap.add_argument("--num-bits", type=int, default=64)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH", "engine_cmp_r4.json")
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from luc4ir_spark.operators import dedup as dd
    from luc4ir_spark.session import get_spark
    from luc4ir_spark.sources.corpus import synth_corpus

    out: dict = {
        "docs": args.docs,
        "reps": args.reps,
        "cpus": args.cpus,
        "num_hashes": args.num_hashes,
        "num_bits": args.num_bits,
        "calib_m_iters_pre": calibrate(),
        "calib_alloc_mb_s_pre": calibrate_alloc(),
    }

    spark = get_spark(
        app_name="engine_cmp",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    docs = synth_corpus(spark, args.docs, seed=42, num_partitions=64)
    tok = (
        docs.withColumn(
            "doc_id",
            F.xxhash64(F.concat_ws("|", "repo", "path", "commit")),
        )
        .select(
            "doc_id",
            F.array_remove(
                F.split(F.lower(F.col("content")), r"[^a-z0-9_']+"), ""
            ).alias("tokens"),
        )
        .persist()
    )
    tok.count()  # corpus materialized outside every timed window

    def run_minhash() -> tuple:
        r = (
            dd.minhash_signatures(tok, num_hashes=args.num_hashes)
            .agg(
                F.bit_xor("min_hash").alias("x"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        return (r["x"], r["n"])

    def run_simhash() -> tuple:
        r = (
            dd.simhash(tok, num_bits=args.num_bits)
            .agg(
                F.bit_xor("simhash").alias("x"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        return (r["x"], r["n"])

    kernels = {"minhash": run_minhash, "simhash": run_simhash}
    engines = ("sql", "arrow")

    # warm both paths (python-worker fork + Arrow codepath init)
    for eng in engines:
        dd.MINHASH_MINIMA_ENGINE = eng
        dd.SIMHASH_ENGINE = eng
        dd.minhash_signatures(tok.limit(500), num_hashes=4).count()
        dd.simhash(tok.limit(500), num_bits=8).count()

    times: dict = {k: {e: [] for e in engines} for k in kernels}
    checks: dict = {k: {} for k in kernels}
    # interleave engines within each rep so VM drift hits both equally
    for rep in range(args.reps):
        for kname, fn in kernels.items():
            for eng in engines:
                dd.MINHASH_MINIMA_ENGINE = eng
                dd.SIMHASH_ENGINE = eng
                t0 = time.time()
                val = fn()
                times[kname][eng].append(round(time.time() - t0, 3))
                checks[kname][eng] = val
        print(
            f"rep {rep}: "
            + json.dumps({k: times[k] for k in kernels}),
            flush=True,
        )

    for kname in kernels:
        vals = set(checks[kname].values())
        out[f"{kname}_values_identical"] = len(vals) == 1
        out[f"{kname}_rows"] = checks[kname]["sql"][1]
        for eng in engines:
            ts = times[kname][eng]
            out[f"{kname}_{eng}_min_sec"] = min(ts)
            out[f"{kname}_{eng}_median_sec"] = round(
                statistics.median(ts), 3
            )
            out[f"{kname}_{eng}_reps"] = ts
        out[f"{kname}_arrow_speedup_on_min"] = round(
            out[f"{kname}_sql_min_sec"] / out[f"{kname}_arrow_min_sec"], 2
        )

    out["calib_m_iters_post"] = calibrate()
    out["calib_alloc_mb_s_post"] = calibrate_alloc()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
