"""Similarity search over embedding columns (array<float>).

Two paths, same results where they overlap:
- ``brute_force_topk`` — exact cosine top-k: broadcast query vector,
  JVM-side zip_with/aggregate arithmetic, TakeOrdered top-k. The
  baseline and the verifier.
- ``ivf_topk`` — IVF-style approximate path for scale: distributed
  Lloyd k-means over a uniform deterministic sample (partial-aggregate
  iterations, no row collect), vectors partitioned by nearest
  centroid; a query probes only the ``n_probe`` nearest cells. At
  100 TB the cell assignment is the partition key, so a probe reads a
  bounded slice of the corpus.
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
    import math

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # query norm is a constant: compute it once on the driver instead
    # of folding the literal array per scanned row; floor the product
    # so a zero-norm vector scores 0.0 instead of raising
    # DIVIDE_BY_ZERO under ANSI mode (ivf_topk floors the same way)
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    scored = embeddings.select(
        F.col(id_col),
        F.round(
            _dot(F.col(vec_col), q)
            / F.greatest(
                F.sqrt(_dot(F.col(vec_col), F.col(vec_col))) * F.lit(qnorm),
                F.lit(1e-12),
            ),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def train_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    sample: int = 65536,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd k-means — the coarse quantizer.

    Round-2 rewrite (round-1 trained on ``limit(2048).collect()``: a
    first-partitions sample, unrepresentative at scale):

    - UNIFORM deterministic sample: ``sample(fraction, seed)`` sized to
      ~``sample`` rows (cached for the iteration loop) — every
      partition contributes, not the first few;
    - init: the ``n_cells`` rows with the smallest content hash
      (bottom-k sampling — deterministic, order-independent, one
      TakeOrdered job);
    - Lloyd steps: per-partition partial (cell -> count, vec sum)
      aggregates via mapInPandas; the driver combines the tiny
      (#partitions x n_cells x dim) partials. No row ever collects —
      the driver sees only aggregate matrices, so the same code path
      holds at 10^12 vectors (where each pass is one scan of the
      cached sample)."""
    spark = embeddings.sparkSession
    n = embeddings.count()
    if n == 0:
        raise ValueError("cannot train centroids on an empty table")
    frac = min(1.0, (sample * 1.2) / n)  # 1.2x: sample() is binomial
    S = embeddings.select(F.col(vec_col).alias("v"))
    if frac < 1.0:
        S = S.sample(fraction=frac, seed=seed)
    S = S.cache()
    try:
        k = min(n_cells, S.count())
        if k == 0:
            # binomial sample() can return 0 rows when `sample` is tiny
            # relative to n (P ~ e^-1.2*sample) — fall back to a bounded
            # deterministic slice so init below never sees an empty set
            S.unpersist()
            S = embeddings.select(F.col(vec_col).alias("v")).limit(
                max(n_cells, sample)
            ).cache()
            k = min(n_cells, S.count())
        init_rows = (
            S.withColumn("_h", F.sha2(F.to_json(F.col("v")), 256))
            .orderBy("_h")
            .limit(k)
            .collect()
        )
        cent = np.array([r["v"] for r in init_rows], dtype=np.float64)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)

        dim = cent.shape[1]
        part_schema = T.StructType(
            [
                T.StructField("cell", T.IntegerType()),
                T.StructField("cnt", T.LongType()),
                T.StructField("vsum", T.ArrayType(T.DoubleType())),
            ]
        )
        for _ in range(iters):
            cb = spark.sparkContext.broadcast(cent)

            def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                C = cb.value
                acc_cnt = np.zeros(len(C), dtype=np.int64)
                acc_sum = np.zeros((len(C), C.shape[1]), dtype=np.float64)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                    X /= np.maximum(
                        np.linalg.norm(X, axis=1, keepdims=True), 1e-12
                    )
                    assign = np.argmax(X @ C.T, axis=1)
                    np.add.at(acc_cnt, assign, 1)
                    np.add.at(acc_sum, assign, X)
                hit = np.nonzero(acc_cnt)[0]
                if len(hit):
                    yield pd.DataFrame(
                        {
                            "cell": hit.astype(np.int32),
                            "cnt": acc_cnt[hit],
                            "vsum": list(acc_sum[hit]),
                        }
                    )

            try:
                parts = S.mapInPandas(partial, schema=part_schema).toPandas()
            finally:
                # one broadcast per iteration would otherwise pin
                # n_cells x dim float64 on driver+executors for the
                # session's lifetime
                cb.destroy()
            cnt = np.zeros(len(cent), dtype=np.int64)
            vsum = np.zeros((len(cent), dim), dtype=np.float64)
            for _, r in parts.iterrows():
                cnt[int(r["cell"])] += int(r["cnt"])
                vsum[int(r["cell"])] += np.asarray(r["vsum"], dtype=np.float64)
            nz = cnt > 0
            means = vsum[nz] / cnt[nz, None]
            cent[nz] = means / np.maximum(
                np.linalg.norm(means, axis=1, keepdims=True), 1e-12
            )
            # empty cells keep their previous centroid (standard Lloyd)
    finally:
        S.unpersist()
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
        # batched: one (rows x dim) @ (dim x n_cells) matmul per Arrow
        # batch — cell assignment runs over EVERY embedding at
        # build/append time, so a per-row Python loop here would be the
        # dominant cost of the IVF layout build
        C = cb.value
        if not len(vecs):
            return pd.Series([], dtype="int32")
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(X @ C.T, axis=1).astype(np.int32))

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
            col = pdf[vec_col].to_numpy()
            if isinstance(col[0], (bytes, bytearray)):
                # f16-at-rest layout (vec16 binary column)
                mat = (
                    np.frombuffer(b"".join(col), dtype=np.float16)
                    .astype(np.float64)
                    .reshape(len(col), -1)
                )
            else:
                mat = np.stack(col).astype(np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
            # round BEFORE the per-partition cut: the pinned tiebreak is
            # (rounded score desc, id asc) — cutting on raw scores could
            # evict a smaller id that ties after rounding, diverging
            # from brute_force_topk inside the probed cells
            sc = np.round((mat @ qv) / norms, 6)
            ids = pdf[id_col].to_numpy(np.int64)
            order = np.lexsort((ids, -sc))[:k]
            yield pd.DataFrame({"_id": ids[order], "cosine": sc[order]})

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


def knn_graph(
    embeddings: DataFrame,
    k: int = 3,
    queries: DataFrame | None = None,
    n_cells: int = 8,
    n_probe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 5,
) -> DataFrame:
    """k-nearest-neighbor join: for every query vector, its top-``k``
    cosine neighbors in ``embeddings`` (self excluded by id). With
    ``queries=None`` this is the kNN GRAPH of the table — the
    substrate for SemDeDup-style pruning, graph clustering, and
    connectivity curation. Emits ``(vec_id, nb_id, rank, cosine)``.

    Scale shape: corpus vectors are IVF-celled (same distributed Lloyd
    quantizer as ``ivf_topk``); each query probes its ``n_probe``
    nearest cells (``None`` = all cells = EXACT, the oracle mode). The
    per-cell work is one cogrouped NumPy matmul of (queries probing
    the cell) x (cell members) — never an all-pairs crossJoin; shuffle
    keys are the cell id then the query id, and per-cell memory is
    bounded by the quantizer's cell balance. Cosine is rounded to
    ``round_dp`` BEFORE every top-k cut with ties broken by neighbor
    id, so per-cell cuts, the global merge, and a SQL replay agree
    exactly.
    """
    cent = train_centroids(embeddings, n_cells=n_cells, vec_col=vec_col)
    probe = len(cent) if n_probe is None else min(n_probe, len(cent))
    celled = assign_cells(embeddings, cent, vec_col=vec_col).select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv"), "cell"
    )
    q = queries if queries is not None else embeddings
    spark = q.sparkSession
    cb = spark.sparkContext.broadcast(cent)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        C = cb.value
        if not len(vecs):
            return pd.Series([], dtype=object)
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        top = np.argsort(-sims, axis=1)[:, :probe]
        return pd.Series([row.astype("int32") for row in top])

    qp = q.select(
        F.col(id_col).alias("_qid"),
        F.col(vec_col).alias("_qv"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )

    out_schema = T.StructType(
        [
            T.StructField("_qid", T.LongType()),
            T.StructField("nb_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def per_cell(qdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qdf) or not len(cdf):
            return pd.DataFrame({"_qid": [], "nb_id": [], "cosine": []}).astype(
                {"_qid": "int64", "nb_id": "int64", "cosine": "float64"}
            )
        Q = np.stack(qdf["_qv"].to_numpy()).astype(np.float64)
        Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        C = np.stack(cdf["_cv"].to_numpy()).astype(np.float64)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        sims = np.round(Q @ C.T, round_dp)
        qids = qdf["_qid"].to_numpy(np.int64)
        cids = cdf["_cid"].to_numpy(np.int64)
        out_q, out_n, out_s = [], [], []
        for r in range(len(qids)):
            row = sims[r]
            mask = cids != qids[r]
            ids, sc = cids[mask], row[mask]
            # rounded-score desc, neighbor id asc — the pinned order
            order = np.lexsort((ids, -sc))[:k]
            out_q.append(np.full(len(order), qids[r], dtype=np.int64))
            out_n.append(ids[order])
            out_s.append(sc[order])
        return pd.DataFrame(
            {
                "_qid": np.concatenate(out_q),
                "nb_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_s),
            }
        )

    partials = (
        qp.groupBy("cell")
        .cogroup(celled.groupBy("cell"))
        .applyInPandas(lambda qdf, cdf: per_cell(qdf, cdf), schema=out_schema)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_qid").orderBy(F.desc("cosine"), F.asc("nb_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(id_col),
            "nb_id",
            F.col("rank").cast("long").alias("rank"),
            "cosine",
        )
    )
