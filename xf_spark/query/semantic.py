"""Semantic search: deterministic hash embeddings + cosine top-k.

Reimplements the reference's vector path (vector.rs:853-905 brute-force
top-k over FNV-1a hash embeddings, hash_embedder.rs:69-131) Spark-first:

- embedding build: canonicalize + FNV-1a embed in ONE vectorized
  pandas UDF pass -> (doc_id, vec float32[384]) DataFrame (persistable
  as parquet — the analog of the f16 vector.idx file, with Iceberg/
  parquet atomicity replacing the tmp-rename dance vector.rs:267-393);
- query: broadcast the query vector, per-partition NumPy matmul
  partial top-k (mapInPandas), global (score desc, doc_id asc) merge —
  exactly the reference's chunked thread-local-heap shape
  (vector.rs:913-993) in Spark's partial/final idiom.

Scores are partition-invariant: cosine of L2-normalized vectors, no
corpus statistics involved.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from xf_spark.functions.hash_embed import DIM, hash_embed
from xf_spark.functions.textcore import canonicalize_for_embedding
from xf_spark.functions.udfs import hash_embed_udf


def build_embeddings(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, vec array<float>[384])."""
    return docs.select("doc_id", hash_embed_udf(F.col("text")).alias("vec"))


def embed_query(query: str) -> np.ndarray:
    return hash_embed(canonicalize_for_embedding(query or ""))


TOPK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def semantic_topk(
    embeddings: DataFrame,
    query: str,
    limit: int = 20,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Cosine top-k of ``query`` against (doc_id, vec) embeddings.

    Partial top-k per partition in NumPy (one matmul per Arrow batch),
    then a k-sized global merge — no full-score shuffle. ``doc_filter``
    (a doc_id DataFrame) applies BEFORE top-k via left_semi join, the
    pre-scoring type filter of vector.rs:180-203."""
    q = embed_query(query)
    src = embeddings
    if doc_filter is not None:
        src = src.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
    spark = embeddings.sparkSession
    qb = spark.sparkContext.broadcast(q.astype(np.float64))
    k = limit

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qv = qb.value
        best_ids = np.empty(0, dtype=np.int64)
        best_sc = np.empty(0, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            sc = mat @ qv  # vectors are L2-normalized: dot == cosine
            ids = pdf["doc_id"].to_numpy(np.int64)
            all_ids = np.concatenate([best_ids, ids])
            all_sc = np.concatenate([best_sc, sc])
            order = np.lexsort((all_ids, -all_sc))[:k]
            best_ids, best_sc = all_ids[order], all_sc[order]
        if len(best_ids):
            yield pd.DataFrame({"doc_id": best_ids, "score": best_sc})

    partials = src.mapInPandas(partial, schema=TOPK_SCHEMA)
    return partials.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
