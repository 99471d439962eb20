"""Similarity search over embedding columns (array<float>).

Two paths, same results where they overlap:
- ``brute_force_topk`` — exact cosine top-k: broadcast query vector,
  JVM-side zip_with/aggregate arithmetic, TakeOrdered top-k. The
  baseline and the verifier.
- ``ivf_topk`` — IVF-style approximate path for scale: k-means-lite
  centroids (one sampled driver-side Lloyd pass, deterministic seed),
  vectors partitioned by nearest centroid; a query probes only the
  ``n_probe`` nearest cells. At 100 TB the cell assignment is the
  partition key, so a probe reads a bounded slice of the corpus.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(
            _dot(F.col(vec_col), q)
            / (F.sqrt(_dot(F.col(vec_col), F.col(vec_col))) * F.sqrt(_dot(q, q))),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def train_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    sample: int = 2048,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Driver-side Lloyd iterations on a deterministic sample — the
    coarse quantizer. At real scale swap the sample for a distributed
    k-means; the cell-assignment/probe machinery below is unchanged."""
    rows = embeddings.select(vec_col).limit(sample).collect()
    X = np.array([r[vec_col] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def assign_cells(
    embeddings: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add a ``cell`` column (argmax cosine vs centroids). This is the
    partitioning key for the at-rest layout (write partitionBy cell)."""
    spark = embeddings.sparkSession
    cb = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf(T.IntegerType())
    def cell_of(vecs: pd.Series) -> pd.Series:
        C = cb.value

        def one(v):
            x = np.asarray(v, dtype=np.float64)
            x /= max(np.linalg.norm(x), 1e-12)
            return int(np.argmax(C @ x))

        return vecs.map(one)

    return embeddings.withColumn("cell", cell_of(F.col(vec_col)))


def ivf_topk(
    celled: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k probing the n_probe nearest cells.

    The cell filter is a partition-prunable predicate; scoring runs as
    a NumPy matmul partial top-k per partition + k-sized merge."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(centroids @ qn))[:n_probe].tolist()
    spark = celled.sparkSession
    qb = spark.sparkContext.broadcast(qn)

    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qv = qb.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
            sc = (mat @ qv) / norms
            ids = pdf[id_col].to_numpy(np.int64)
            order = np.lexsort((ids, -sc))[:k]
            yield pd.DataFrame({"_id": ids[order], "cosine": np.round(sc[order], 6)})

    partials = (
        celled.where(F.col("cell").isin(probe))
        .select(F.col(id_col), F.col(vec_col))
        .mapInPandas(partial, schema=schema)
    )
    return (
        partials.orderBy(F.desc("cosine"), F.asc("_id"))
        .limit(k)
        .withColumnRenamed("_id", id_col)
    )
