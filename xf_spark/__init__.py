"""xf_spark — a PySpark-native distributed inverted-index + BM25 engine.

A from-scratch reimplementation of the query/data-processing
capabilities of the reference engine (micahstubbs/xf: Tantivy + SQLite
+ hash-embedding vector index over conversation archives), re-expressed
Spark-first: DataFrame/SQL logical plans, vectorized Arrow/pandas UDFs
on the hot paths, explicit term/doc-shard partitioning with skew
handling, and deterministic, partition-invariant scoring.

Subpackages
-----------
- ``functions`` — tokenizer / canonicalizer / hash-embedder primitives
  (pure-Python cores shared by the Spark UDFs and the NumPy oracle).
- ``index`` — distributed inverted-index builder: posting-list
  construction, delta+varint block compression, block-max metadata,
  per-partition manifest (checkpoint/resume), metrics.
- ``query`` — query parser, BM25 scoring (DataFrame path and
  block-max-WAND segment path), semantic cosine top-k, RRF hybrid.
- ``analytics`` — the stats/aggregation surface (daily/hourly
  histograms, engagement analogs, gaps) as Spark SQL.
- ``ops`` — large-scale training-data operators: dedup (exact, MinHash
  LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search
  (brute force + IVF), text analysis, thread-graph reconstruction,
  multimodal column plumbing.
- ``streaming`` — Structured Streaming ingestion: incremental
  versioned index appends via foreachBatch, watermarked windowed
  stats, stateful per-conversation totals.
- ``sources`` — archive readers and the Iceberg-identifier/parquet
  table seam.

Entry points: ``xf_spark.engine.XfIndex`` (build / open / append /
search / msearch / stats), ``python -m xf_spark`` (CLI).
"""

__version__ = "0.1.0"
