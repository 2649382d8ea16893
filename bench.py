#!/usr/bin/env python
"""Benchmark harness: headline engine operations at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "extra": {...}}

Each workload runs $SPARK_GRAFT_REPS times (default 2); "queries" and
"value" report per-workload MINIMA (noise-robust on this time-shared
VM — interference only inflates wall time), with every rep's time, the
medians, and two single-core calibration probes recorded under "extra"
so an externally-inflated run is attributable from the JSON alone.

Workloads (all end-to-end actions, cold plans):
  index_build_simple   tokenize+postings+stats, JVM-only tokenizer
  index_build_english  same with the Porter/stop Arrow-UDF analyzer
  compress_postings    delta+varbyte blob build (salted)
  bm25_batch           50 queries x k=1000, exhaustive DataFrame path
  wand_batch           same 50 queries over compressed blobs (WAND)
  eval_metrics         run x pseudo-qrels metric aggregates
  minhash_lsh          MinHash-LSH near-dup pairs over the corpus
  ann_topk             50-query exact cosine top-10 over embeddings
  near_dup_lsh         hyperplane-bucketed embedding near-dup pairs
  textstats            quality + lang-id + fingerprint full pass
  phrase_batch         compressed positional build + phrase/proximity/
                       unordered-window queries
  clean_pipeline       quality-filter + PII scrub + repetition stats
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from luc4ir_spark.functions.analysis import AnalyzerConfig
from luc4ir_spark.operators import annsearch as ann
from luc4ir_spark.operators import dedup as dd
from luc4ir_spark.operators import evaluation as ev
from luc4ir_spark.operators import indexer as ix
from luc4ir_spark.operators import retrieval as rt
from luc4ir_spark.operators import textstats as tstat
from luc4ir_spark.operators import wand as wd
from luc4ir_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# min-of-reps: this VM time-shares CPU with external tenants (2-4x
# wall-time variance on identical jobs — BENCH/BASELINE.md §0), so each
# workload runs REPS times and the reported per-query number is the MIN
# (interference only ever inflates wall time). All rep times + medians
# land in extra for attribution.
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
K = 1000
N_QUERIES = 50


def calibrate() -> float:
    """1-second single-core burn (millions of iterations) — how fast
    THIS moment's CPU is, so externally-inflated runs are identifiable
    in the recorded JSON (same probe as scripts/scaling_bench.py)."""
    t0 = time.time()
    x = 0
    while time.time() - t0 < 1.0:
        x += 1
    return round(x / 1e6, 2)


def calibrate_alloc(mb: int = 256) -> float:
    """Touch ``mb`` MiB of freshly-allocated pages; returns MiB/s. The
    CPU burn above is blind to the host's page-backing collapse mode
    (observed 2026-08-18: ~35 MiB/s vs healthy multi-GiB/s while the
    CPU probe read clean) — a window with a low value here invalidates
    every Spark timing taken in it."""
    import numpy as np

    t0 = time.time()
    np.ones(mb * 131_072, dtype=np.int64)
    return round(mb / (time.time() - t0), 1)

BASE_TERMS = [
    "spark", "join", "window", "stream", "hash", "table", "merge",
    "filter", "sort", "query", "data", "batch", "row", "scan", "agg",
    "value", "key", "fast", "slow", "part", "line", "order", "small",
    "big", "column", "customer",
]


def make_queries(n: int) -> list[tuple[str, str]]:
    out = []
    for i in range(n):
        terms = [
            BASE_TERMS[(i * 3 + j) % len(BASE_TERMS)]
            for j in range(2 + (i % 3))
        ]
        out.append((f"b{i}", " ".join(terms)))
    return out


def main() -> None:
    mem = os.environ.get("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name="luc4ir_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        # pinned pre-touched heap: G1 heap-growth dynamics otherwise add
        # 2-3x run-to-run variance at high thread counts
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch"
        },
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs = docs.persist()
    n_docs = docs.count()
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    emb = emb.persist()
    emb.count()

    timings: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    extra: dict[str, object] = {"n_docs": n_docs, "cpus": CPUS}
    extra["reps"] = REPS
    extra["calib_m_iters_pre"] = calibrate()
    extra["calib_alloc_mb_s_pre"] = calibrate_alloc()

    def timed(name: str, fn, cleanup=None):
        """Run ``fn`` REPS times; record min (headline) + all times.
        ``cleanup(prev_result)`` runs between reps so workloads that
        persist state don't accumulate cached copies; the LAST rep's
        result (and its persisted state) is returned for downstream
        workloads."""
        res = None
        times = []
        for i in range(REPS):
            if i and cleanup is not None:
                cleanup(res)
            t0 = time.time()
            res = fn()
            times.append(round(time.time() - t0, 3))
        rep_times[name] = times
        timings[name] = min(times)
        return res

    simple_cfg = ix.IndexConfig(analyzer=AnalyzerConfig(mode="simple"))
    english_cfg = ix.IndexConfig(analyzer=AnalyzerConfig(mode="english"))

    # ---- index builds
    def build_simple():
        idx = ix.build_index(docs, simple_cfg, content_col="text")
        idx.postings.count()
        return idx

    def drop_index(prev):
        prev.postings.unpersist()
        prev.term_stats.unpersist()

    idx = timed("index_build_simple", build_simple, cleanup=drop_index)
    extra["index_docs_per_sec"] = round(
        n_docs / timings["index_build_simple"], 1
    )
    extra["n_postings"] = idx.postings.count()

    def build_english():
        e = ix.build_index(docs, english_cfg, content_col="text", cache=False)
        return e.postings.count()

    timed("index_build_english", build_english)

    # ---- compression
    def compress():
        idx.blobs = wd.build_compressed_postings(idx)
        idx.blobs = idx.blobs.persist()
        return idx.blobs.count()

    timed("compress_postings", compress, cleanup=lambda _: idx.blobs.unpersist())

    # ---- retrieval
    queries = make_queries(N_QUERIES)
    qt = rt.queries_to_terms(
        spark, queries, AnalyzerConfig(mode="simple")
    ).persist()
    qt.count()

    run_holder = {}

    def bm25_batch():
        run = rt.score_queries(idx, qt, k=K)
        run = run.persist()
        n = run.count()
        run_holder["run"] = run
        return n

    timed(
        "bm25_batch",
        bm25_batch,
        cleanup=lambda _: run_holder["run"].unpersist(),
    )
    extra["bm25_queries_per_sec"] = round(
        N_QUERIES / timings["bm25_batch"], 2
    )

    def wand_batch():
        return wd.score_queries_wand(idx, qt, k=K).count()

    timed("wand_batch", wand_batch)

    # ---- evaluation
    def eval_metrics():
        run = run_holder["run"].withColumn(
            "docid", F.col("doc_id").cast("string")
        )
        qrels = run.select(
            "qid", "docid",
            F.when(F.col("doc_id") % 6 == 0, 1.0).otherwise(0.0).alias("rel"),
        )
        return ev.per_query_metrics(run, qrels).count()

    timed("eval_metrics", eval_metrics)

    # ---- pipeline ops
    tokens = docs.select(
        "doc_id",
        F.array_remove(F.split(F.lower("text"), "[^a-z0-9]+"), "").alias(
            "tokens"
        ),
    )

    def minhash_lsh():
        # the synthetic corpus has a ~31-term vocabulary, so it genuinely
        # contains ~190k >=0.95-Jaccard pairs at sf0.1 — wide bands
        # (2 bands of 8) keep the candidate set near the true pair set
        return dd.minhash_lsh_pairs(
            tokens, num_hashes=16, band_size=8, threshold=0.95
        ).count()

    timed("minhash_lsh", minhash_lsh)

    def ann_topk():
        q = emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ann.cosine_topk(emb, q, k=10).count()

    timed("ann_topk", ann_topk)

    def near_dup_lsh():
        # sub-quadratic embedding near-dup path: bucket candidates +
        # exact verify; candidate count recorded as scale evidence
        cand_counter = []
        n = ann.lsh_near_dup_pairs(
            emb, threshold=0.9, log=lambda m: cand_counter.append(m)
        ).count()
        extra["near_dup_lsh_log"] = cand_counter
        return n

    timed("near_dup_lsh", near_dup_lsh)

    def textstats():
        a = tstat.quality_score(docs, content_col="text").count()
        b = tstat.language_id(docs, content_col="text").count()
        c = tstat.doc_fingerprint(docs, content_col="text").count()
        return a + b + c

    timed("textstats", textstats)

    def phrase_batch():
        # positional family end-to-end: build the compressed positional
        # index (.pos delta+varbyte streams) and answer an exact phrase
        # + an ordered-proximity + an unordered-window query over it
        toks = ix.tokenize(
            docs, AnalyzerConfig(mode="simple"),
            id_col="doc_id", content_col="text",
        )
        pos = ix.build_positional_postings(toks).persist()
        try:
            cpos = ix.compress_positional_postings(pos).persist()
            try:
                cpos.count()
                a = rt.phrase_query_compressed(
                    cpos, ["slow", "hash", "batch"]
                ).count()
                b = rt.phrase_query_compressed(
                    cpos, ["slow", "hash", "batch"], window=6
                ).count()
                c = rt.unordered_window_query(
                    pos, ["slow", "hash", "batch"], window=6
                ).count()
                return a + b + c
            finally:
                cpos.unpersist()
        finally:
            pos.unpersist()

    timed("phrase_batch", phrase_batch)

    def clean_pipeline():
        # the round-4 hygiene surface in one pass: composite C4/Gopher
        # keep/drop verdict, PII scrub, and repetition stats — each a
        # scan-local zero-shuffle projection, so this times the
        # map-only corpus-cleaning cost per 5k docs
        a = tstat.quality_filter(docs, content_col="text").count()
        b = tstat.redact_pii(docs, content_col="text").count()
        c = tstat.repetition_stats(docs, content_col="text").count()
        return a + b + c

    timed("clean_pipeline", clean_pipeline)

    def link_graph():
        # round-5 graph surface in one pass: integer-exact PageRank
        # (3 iters), neighborhood link prediction (common/Jaccard/RA)
        # and the ordered-edge triangle count over the deterministic
        # 3-out-regular synthetic graph on this SF's doc ids
        from luc4ir_spark.operators import graph as gr

        ids = docs.select("doc_id")
        n = ids.count()
        edges = gr.synthetic_link_graph(ids, n)
        a = gr.pagerank_regular_exact(
            ids, edges, n, n_iter=3, id_col="doc_id"
        ).count()
        b = gr.link_prediction_pairs(edges, min_common=2).count()
        c = gr.triangle_count(edges).count()
        return a + b + c

    timed("link_graph", link_graph)

    extra["calib_m_iters_post"] = calibrate()
    extra["calib_alloc_mb_s_post"] = calibrate_alloc()
    extra["queries_all_reps"] = rep_times
    extra["queries_median"] = {
        n: round(statistics.median(ts), 3) for n, ts in rep_times.items()
    }
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: object = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "engine_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
