"""luc4ir_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the query and data-processing capabilities of the reference
IR toolkit (gdebasis/luc4ir, Lucene-based, single-threaded Java) as an
idiomatic, cluster-scale Apache Spark application:

- inverted-index build: tokenize -> (term, doc_id, tf) -> term-partitioned,
  delta+varbyte-compressed posting lists with per-block impact (max-tf)
  metadata and explicit salting for skewed high-df terms
  (``operators/indexer.py``, ``functions/codec.py``)
- BM25 / LM top-k retrieval: broadcast query-term semi-join, vectorized
  scoring, per-query top-k; block-max WAND pruning over compressed blobs
  (``operators/retrieval.py``, ``operators/wand.py``)
- TREC ecosystem: topics/qrels/run-file sources + sinks
  (``sources/trec.py``)
- IR evaluation: recall / MRR / MAP / P@k / nDCG as DataFrame aggregates
  (``operators/evaluation.py``)
- pseudo-relevance feedback: RM1/RM-conditional, KL rerank, query
  expansion, greedy diversity rerank (``operators/feedback.py``)
- large-scale training-data pipeline ops: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), ANN similarity search, text quality &
  language-id, multimodal column plumbing (``operators/dedup.py``,
  ``operators/annsearch.py``, ``operators/textstats.py``,
  ``operators/multimodal.py``)
- resumable builds: per-partition checkpoint manifests with lineage +
  per-stage metrics (``plans/checkpoints.py``)

Everything is DataFrame-first: Catalyst handles pushdown, partial
aggregation, AQE skew mitigation; custom kernels are Arrow-vectorized
pandas UDFs (no per-row Python).
"""

__version__ = "0.1.0"
