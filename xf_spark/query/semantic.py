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


# -- f16-at-rest storage (vector.rs:312: the reference stores vectors
#    as f16, 2 bytes/dim — half the bytes at rest AND on the wire).
#    Opt-in via XfIndex.build(vec_format="f16"); scoring decodes the
#    QUANTIZED values into float64, so all serving paths (distributed,
#    pinned, IVF) agree bit-for-bit with each other.

@F.pandas_udf(T.BinaryType())
def encode_f16_udf(vecs: pd.Series) -> pd.Series:
    return vecs.map(
        lambda v: np.asarray(v, dtype=np.float32).astype(np.float16).tobytes()
    )


@F.pandas_udf(T.ArrayType(T.FloatType()))
def decode_f16_udf(bufs: pd.Series) -> pd.Series:
    return bufs.map(
        lambda b: np.frombuffer(b, dtype=np.float16).astype(np.float32).tolist()
    )


def _binary_batch_to_matrix(arr, n_rows: int) -> np.ndarray:
    """Arrow BinaryArray of f16 buffers -> float64 (n, dim) matrix.
    Zero-copy view over the values buffer when the layout allows
    (no nulls, uniform width); bytes-join fallback otherwise."""
    bufs = arr.buffers()
    try:
        offsets = np.frombuffer(bufs[1], dtype=np.int32)[
            arr.offset : arr.offset + n_rows + 1
        ]
        widths = np.diff(offsets)
        if bufs[0] is None and len(widths) and widths.min() == widths.max():
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            flat = data[offsets[0] : offsets[-1]].view(np.float16)
            return flat.astype(np.float64).reshape(n_rows, -1)
    except (TypeError, ValueError):
        pass
    joined = b"".join(arr.to_pylist())
    return (
        np.frombuffer(joined, dtype=np.float16).astype(np.float64).reshape(n_rows, -1)
    )


def embed_query(query: str) -> np.ndarray:
    return hash_embed(canonicalize_for_embedding(query or ""))


def topk_ids_scores(ids: np.ndarray, sc: np.ndarray, k: int):
    """EXACT (score desc, doc_id asc) top-k without a full sort:
    np.partition finds the k-th score, the candidate set (>= k-th,
    including boundary ties) is lexsorted — O(n + c log c) instead of
    O(n log n); a pathological tie plateau falls back to the full
    lexsort so determinism never depends on the fast path."""
    if k <= 0:
        return ids[:0], sc[:0]
    n = len(ids)
    if k >= n:
        order = np.lexsort((ids, -sc))
        return ids[order], sc[order]
    kth = np.partition(sc, n - k)[n - k]  # k-th largest score
    cand = np.nonzero(sc >= kth)[0]
    if len(cand) > 4 * k + 1024:  # massive tie plateau: exact fallback
        order = np.lexsort((ids, -sc))[:k]
        return ids[order], sc[order]
    sub = np.lexsort((ids[cand], -sc[cand]))[:k]
    pick = cand[sub]
    return ids[pick], sc[pick]


# Provable f32-vs-f64 dot-product divergence bound for unit vectors:
# dim * eps32 * sum|q_i v_i| <= 384 * 1.2e-7 * 1 ~= 4.6e-5 per side,
# 9.2e-5 through the order statistic; 1.2e-4 adds 30% slack.
_F32_MARGIN = np.float32(1.2e-4)


def pinned_topk(ids: np.ndarray, mat: np.ndarray, q: np.ndarray, k: int):
    """Exact (float64-semantics) top-k over a coordinator-pinned matrix.

    When ``mat`` is float32 — the memory-efficient pin; the at-rest
    vectors ARE float32 (f16 under ``vec_format="f16"``), so an f32 pin
    loses no information — the full matmul runs in f32 (HALF the DRAM
    traffic, which is the dominant cost of a pinned query), then a
    provably sufficient candidate set is rescored in f64.

    Exactness argument: with unit vectors, the f32-accumulated dot
    differs from the f64 dot of the same values by at most
    ``dim * eps32 * sum|q_i v_i| <= 384 * 1.2e-7`` (Cauchy-Schwarz)
    ~= 4.6e-5.  Order statistics are 1-Lipschitz under sup-norm
    perturbation, so every true f64 top-k member has f32 score
    >= (f32 k-th largest) - 2*4.6e-5 = kth32 - 9.2e-5.  _F32_MARGIN
    (1.2e-4, 1.3x the bound) keeps them all in the candidate set —
    and stays TIGHT: on hash-embedded corpora the bulk of the score
    distribution is dense (at scale 1.0, a 1e-3 margin swept in ALL
    66k unique vectors for off-topic queries; 1.2e-4 keeps the
    rescore set ~10x smaller); the f64 rescore + lexsorted tiebreak then
    returns the same ranks as the full-f64 matmul, with scores equal up
    to BLAS accumulation-order ULP noise (<1e-12, the same tolerance
    class as the distributed path's per-Arrow-batch matmuls)."""
    q = np.asarray(q, dtype=np.float64)
    if k <= 0:
        return ids[:0], np.empty(0, np.float64)
    if mat.dtype != np.float32:
        return topk_ids_scores(ids, mat @ q, k)
    sc32 = mat @ q.astype(np.float32)
    n = len(ids)
    if k < n:
        kth = np.partition(sc32, n - k)[n - k]
        cand = np.nonzero(sc32 >= kth - _F32_MARGIN)[0]
    else:
        cand = np.arange(n)
    sc = mat[cand].astype(np.float64) @ q
    return topk_ids_scores(ids[cand], sc, k)


class PinnedVectors:
    """Coordinator-pinned embedding store, deduplicated by exact vector.

    Real transcript corpora (and the reference's own archives) contain
    large classes of turns whose canonicalized text embeds to the SAME
    vector — templated turns, and every low-signal/empty text that hits
    hash_embed's uniform fallback (measured: 93% of the synthetic sf0.1
    corpus collapses into one vector).  Scoring per doc then wastes a
    full-matrix matmul on duplicates AND turns the top-k boundary into
    a plateau of exact score ties whose provably-exact resolution must
    touch every tied row.

    Pinning the UNIQUE vectors once (u x dim f32) with doc_ids grouped
    per unique (sorted ascending — the global tiebreak order) fixes
    both: a query scores u rows instead of n_docs, and a tie plateau is
    ONE unique whose top-k expansion takes its k smallest doc_ids by
    construction.  Results are exactly the distributed float64 path's:
    identical f32 vectors have identical f64 dots, and the candidate
    uniques are rescored in f64 per ``pinned_topk``'s margin argument
    (doc-count-weighted order statistics, same Lipschitz bound).
    """

    __slots__ = ("uniq", "doc_ids", "offsets", "counts", "n_docs", "_uniq64")

    def __init__(self, ids: np.ndarray, mat: np.ndarray):
        self._uniq64 = None
        mat = np.ascontiguousarray(mat, dtype=np.float32)
        ids = np.asarray(ids, dtype=np.int64)
        void = mat.view(np.dtype((np.void, mat.shape[1] * 4))).ravel()
        uniq_void, inv = np.unique(void, return_inverse=True)
        self.uniq = (
            uniq_void.view(np.float32)
            .reshape(len(uniq_void), mat.shape[1])
            .copy()
        )
        order = np.lexsort((ids, inv))  # group by unique, ids asc within
        self.doc_ids = ids[order]
        self.offsets = np.searchsorted(
            inv[order], np.arange(len(uniq_void) + 1)
        )
        self.counts = np.diff(self.offsets)
        self.n_docs = len(ids)

    def topk(self, q: np.ndarray, k: int, sc32: np.ndarray | None = None):
        """Exact (f64-semantics, (score desc, doc_id asc)) top-k.
        ``sc32`` optionally supplies this query's precomputed f32
        unique-score column (the batched-msearch path runs ONE gemm
        for the whole query block and feeds columns here)."""
        q64 = np.asarray(q, dtype=np.float64)
        if sc32 is None:
            sc32 = self.uniq @ q64.astype(np.float32)
        u = len(sc32)
        k = min(k, self.n_docs)
        if k <= 0 or u == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # doc-count-weighted k-th largest f32 score: the k-th best DOC
        # lies within the top-k uniques (each unique holds >=1 doc)
        if k < u:
            top_u = np.argpartition(-sc32, k - 1)[:k]
            top_u = top_u[np.argsort(-sc32[top_u], kind="stable")]
        else:
            top_u = np.argsort(-sc32, kind="stable")
        csum = np.cumsum(self.counts[top_u])
        pos = int(np.searchsorted(csum, k))
        kth32 = sc32[top_u[min(pos, len(top_u) - 1)]]
        cand = np.nonzero(sc32 >= kth32 - _F32_MARGIN)[0]
        # f64 rescore of candidate uniques (pinned_topk margin bound).
        # Degenerate embedding geometry (a query vector near the
        # corpus's dominant direction — e.g. the hash-embed fallback)
        # can put MOST uniques inside the margin band; fancy-indexing +
        # astype then copies ~u*dim*12 bytes per query (measured 128 ms
        # at u=66k). Above u/4 candidates, rescore through a lazily
        # cached f64 shadow of the unique matrix instead: one dgemv,
        # zero copies (+2x pin RAM, built only when first needed).
        if len(cand) > len(sc32) // 4:
            if self._uniq64 is None:
                self._uniq64 = self.uniq.astype(np.float64)
            sc64 = (self._uniq64 @ q64)[cand]
        else:
            sc64 = self.uniq[cand].astype(np.float64) @ q64
        # with exact f64 scores in hand, shrink to the minimal score-
        # descending prefix of uniques whose doc counts cover k, plus
        # every unique EXACTLY tied with the boundary score (the doc_id
        # tiebreak crosses uniques only at exact equality) — a dense
        # candidate band then expands ~k rows instead of cand*k
        if len(cand) > 1:
            ordu = np.argsort(-sc64, kind="stable")
            csum64 = np.cumsum(np.minimum(self.counts[cand][ordu], k))
            cut = int(np.searchsorted(csum64, k))
            cut = min(cut, len(ordu) - 1)
            boundary = sc64[ordu[cut]]
            keep = np.union1d(ordu[: cut + 1], np.nonzero(sc64 == boundary)[0])
            cand, sc64 = cand[keep], sc64[keep]
        # expand: per candidate unique, at most its k smallest doc_ids
        # can reach the global top-k (ids ascend within a group)
        take = np.minimum(self.counts[cand], k)
        tot = int(take.sum())
        starts = self.offsets[cand]
        base = np.repeat(starts, take)
        local = np.arange(tot) - np.repeat(np.cumsum(take) - take, take)
        exp_ids = self.doc_ids[base + local]
        exp_sc = np.repeat(sc64, take)
        return topk_ids_scores(exp_ids, exp_sc, k)

    def score_block(self, Q: np.ndarray) -> np.ndarray:
        """(B, dim) query block -> (u, B) f32 scores: one sgemm."""
        return self.uniq @ np.asarray(Q, dtype=np.float32).T

    def vector_of(self, doc_id: int) -> np.ndarray | None:
        """The pinned f32 vector of one doc (None if absent). One
        linear id scan + one offset bisect — NumPy-vectorized, no
        per-row Python; serves more_like_this's query-vector lookup
        without a cluster job."""
        pos = np.nonzero(self.doc_ids == np.int64(doc_id))[0]
        if len(pos) == 0:
            return None
        g = int(np.searchsorted(self.offsets, int(pos[0]), side="right")) - 1
        return self.uniq[g]


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
    qvec: np.ndarray | None = None,
) -> DataFrame:
    """Cosine top-k of ``query`` against (doc_id, vec) embeddings.

    Partial top-k per partition in NumPy (one matmul per Arrow batch),
    then a k-sized global merge — no full-score shuffle. ``doc_filter``
    (a doc_id DataFrame) applies BEFORE top-k via left_semi join, the
    pre-scoring type filter of vector.rs:180-203. ``qvec`` supplies a
    ready query vector (the more_like_this path queries by an EXISTING
    doc's embedding) and skips text embedding."""
    q = qvec if qvec is not None else embed_query(query)
    src = embeddings
    if doc_filter is not None:
        src = src.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
    spark = embeddings.sparkSession
    qb = spark.sparkContext.broadcast(q.astype(np.float64))
    k = limit
    f16 = "vec16" in embeddings.columns
    vcol = "vec16" if f16 else "vec"

    def partial(batches) -> Iterator:
        """mapInArrow body: the vec list-column flattens ZERO-COPY to a
        contiguous float buffer -> one reshape + one matmul per batch.
        (The pandas route materialized 155k python-object rows of
        np arrays and re-stacked them per query — measured as the
        dominant cost of a semantic query, not the matmul.)
        f16-at-rest: the binary column views as float16 zero-copy and
        upcasts once — half the scan bytes of the float32 layout."""
        import pyarrow as pa

        qv = qb.value
        best_ids = np.empty(0, dtype=np.int64)
        best_sc = np.empty(0, dtype=np.float64)
        for b in batches:
            if b.num_rows == 0:
                continue
            vec_col = b.column(b.schema.get_field_index(vcol))
            if f16:
                mat = _binary_batch_to_matrix(vec_col, b.num_rows)
            else:
                flat = vec_col.flatten()
                mat = np.asarray(flat, dtype=np.float64).reshape(b.num_rows, -1)
            sc = mat @ qv  # vectors are L2-normalized: dot == cosine
            ids = np.asarray(
                b.column(b.schema.get_field_index("doc_id")), dtype=np.int64
            )
            all_ids = np.concatenate([best_ids, ids])
            all_sc = np.concatenate([best_sc, sc])
            order = np.lexsort((all_ids, -all_sc))[:k]
            best_ids, best_sc = all_ids[order], all_sc[order]
        if len(best_ids):
            yield pa.RecordBatch.from_pydict(
                {"doc_id": best_ids, "score": best_sc}
            )

    partials = src.select("doc_id", vcol).mapInArrow(partial, schema=TOPK_SCHEMA)
    return partials.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)


MTOPK_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def semantic_topk_many(
    embeddings: DataFrame, queries: list[str], limit: int = 20
) -> dict[str, list[tuple[int, float]]]:
    """Batched distributed semantic top-k: ONE scan of the embedding
    table scores the whole query block ((rows x dim) @ (dim x B) per
    Arrow batch), partial top-k per (partition, query), k-sized merge
    on the driver. This is the msearch path for the UNPINNED regime
    (vectors over pin_vectors_mb — the guaranteed state at 10^12
    turns): B queries cost one cluster pass instead of B.

    Results are identical to per-query ``semantic_topk`` (same f64
    math, same (score desc, doc_id asc) order)."""
    distinct = list(dict.fromkeys(queries))
    if not distinct:
        return {}
    Q = np.stack([embed_query(q) for q in distinct]).astype(np.float64)
    spark = embeddings.sparkSession
    qb = spark.sparkContext.broadcast(Q)
    k = limit
    f16 = "vec16" in embeddings.columns
    vcol = "vec16" if f16 else "vec"
    nq = len(distinct)

    def partial(batches) -> Iterator:
        import pyarrow as pa

        QT = qb.value.T  # (dim, B)
        best = [
            (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
            for _ in range(nq)
        ]
        for b in batches:
            if b.num_rows == 0:
                continue
            vec_col = b.column(b.schema.get_field_index(vcol))
            if f16:
                mat = _binary_batch_to_matrix(vec_col, b.num_rows)
            else:
                flat = vec_col.flatten()
                mat = np.asarray(flat, dtype=np.float64).reshape(b.num_rows, -1)
            sc = mat @ QT  # (rows, B)
            ids = np.asarray(
                b.column(b.schema.get_field_index("doc_id")), dtype=np.int64
            )
            for j in range(nq):
                bi, bs = best[j]
                all_ids = np.concatenate([bi, ids])
                all_sc = np.concatenate([bs, sc[:, j]])
                order = np.lexsort((all_ids, -all_sc))[:k]
                best[j] = (all_ids[order], all_sc[order])
        out_q = []
        out_i = []
        out_s = []
        for j in range(nq):
            bi, bs = best[j]
            if len(bi):
                out_q.append(np.full(len(bi), j, dtype=np.int32))
                out_i.append(bi)
                out_s.append(bs)
        if out_q:
            yield pa.RecordBatch.from_pydict(
                {
                    "qid": np.concatenate(out_q),
                    "doc_id": np.concatenate(out_i),
                    "score": np.concatenate(out_s),
                }
            )

    rows = (
        embeddings.select("doc_id", vcol)
        .mapInArrow(partial, schema=MTOPK_SCHEMA)
        .collect()
    )  # <= B * n_partitions * k rows by construction
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    out: dict[str, list[tuple[int, float]]] = {}
    for j, q in enumerate(distinct):
        hits = by_q.get(j, [])
        hits.sort(key=lambda t: (-t[1], t[0]))
        out[q] = hits[:k]
    return out
