#!/usr/bin/env python
"""Cluster entry point: retrieve from an EXISTING index (+ optional
relevance-feedback re-retrieval) and evaluate against qrels.

The reference drives this workflow with retrieve_trecd45.sh: a
properties file selecting index / query file / qrels / feedback switch,
producing res.txt and evaluator output (reference:
retriever/TrecDocRetriever.java:181-225, feedback re-retrieval at
feedback/RelevanceModelConditional.java, evaluator/*). Here the same
knobs are CLI flags and the work is one distributed pass:

    spark-submit --py-files $(python -m luc4ir_spark.deploy) \\
      scripts/run_retrieve_job.py \\
      --index /data/index_out --queries /data/queries.tsv \\
      --run-out /data/res.txt --qrels /data/qrels.txt \\
      --sim lmjm --lam 0.4 --feedback --k 1000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True, help="qid \\t text TSV")
    ap.add_argument("--run-out", default=None)
    ap.add_argument("--qrels", default=None)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--sim", default="bm25",
                    choices=["bm25", "lmdir", "lmjm"])
    ap.add_argument("--k1", type=float, default=0.7)
    ap.add_argument("--b", type=float, default=0.3)
    ap.add_argument("--mu", type=float, default=2000.0)
    ap.add_argument("--lam", type=float, default=0.4)
    ap.add_argument("--analyzer", default="english",
                    choices=["english", "standard", "simple", "whitespace"])
    ap.add_argument("--stopfile", default=None)
    ap.add_argument("--wand", action="store_true")
    ap.add_argument("--feedback", action="store_true",
                    help="RLM expansion + re-retrieval (reference fdbk=true)")
    ap.add_argument("--fdbk-docs", type=int, default=10)
    ap.add_argument("--fdbk-terms", type=int, default=20)
    ap.add_argument("--fb-weight", type=float, default=0.2)
    ap.add_argument("--run-name", default="luc4ir_spark")
    args = ap.parse_args()

    from luc4ir_spark.functions.analysis import make_config
    from luc4ir_spark.operators import evaluation as ev
    from luc4ir_spark.operators import feedback as fb
    from luc4ir_spark.operators import retrieval as rt
    from luc4ir_spark.operators.indexer import IndexConfig
    from luc4ir_spark.plans.checkpoints import read_index
    from luc4ir_spark.session import get_spark
    from luc4ir_spark.sources import trec

    spark = SparkSession.getActiveSession() or get_spark("luc4ir_retrieve")
    acfg = make_config(mode=args.analyzer, stopwords=args.stopfile)
    idx = read_index(spark, args.index, IndexConfig(analyzer=acfg))
    qrows = trec.read_tsv_queries(spark, args.queries).collect()
    qt = rt.queries_to_terms(
        spark, [(r["qid"], r["title"]) for r in qrows], acfg
    )
    sim = rt.Similarity(
        kind=args.sim, k1=args.k1, b=args.b, mu=args.mu, lam=args.lam
    )

    t0 = time.time()
    if args.feedback:
        run = fb.retrieve_with_feedback(
            idx, qt, k=args.k, sim=sim,
            num_top_docs=args.fdbk_docs,
            expand=True,
            num_expansion_terms=args.fdbk_terms,
            fb_weight=args.fb_weight,
        )
    elif args.wand:
        from luc4ir_spark.operators.wand import score_queries_wand

        run = score_queries_wand(idx, qt, k=args.k, sim=sim)
    else:
        run = rt.score_queries(idx, qt, k=args.k, sim=sim)
    run = run.persist()
    n = run.count()
    print(json.dumps({
        "stage": "retrieve", "rows": n,
        "seconds": round(time.time() - t0, 2),
    }))

    if args.run_out:
        trec.write_run(rt.to_trec_run(run, args.run_name), args.run_out)

    if args.qrels:
        qrels = trec.read_qrels(spark, args.qrels)
        m = ev.evaluate(
            run.withColumn("docid", run.doc_id.cast("string")),
            qrels, p_at=5, ndcg_at=10,
        ).collect()[0]
        print(json.dumps({
            "stage": "evaluate",
            **{k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in m.asDict().items()},
        }))


if __name__ == "__main__":
    main()
