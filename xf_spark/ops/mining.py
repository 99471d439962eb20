"""Hard-negative mining for retrieval/reranker training data.

The standard contrastive-training recipe (DPR, Karpukhin et al. 2020;
SBERT mining): for each training query, take the top-ranked BM25
documents that are NOT the query's labeled positives — lexically
confusable yet wrong, the "hard" negatives that make the bi-encoder
actually learn. The reference engine has no analog; this composes the
repo's batched serving path into the training-data pipeline.

Scale shape: queries stream through ``SegmentIndex.search_many`` in
batches — ONE bucket-pruned postings scan + decode per batch serves
every member (the msearch amortization), so mining cost is
O(|Q| / batch) jobs, not O(|Q|). Results are (qid, doc_id)-shaped:
n_neg rows per query, never match-set-sized.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MINED_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ]
)


def mine_hard_negatives(
    ix,
    queries: Iterable[tuple],
    n_neg: int = 5,
    batch_size: int = 64,
) -> DataFrame:
    """(qid, doc_id, score, rank) — the top ``n_neg`` BM25 hits per
    query EXCLUDING its positives, rank 1..n_neg in (score desc,
    doc_id asc) order.

    ``ix``: a SegmentIndex (or anything with ``search_many``/spark).
    ``queries``: (qid, query_text, positive_ids) triples; positives
    may be any iterable of doc ids (empty for none). Query texts are
    deduplicated per batch — two qids sharing a text pay one
    evaluation. Each batch asks for ``n_neg + max(|positives|)``
    hits, the bound that guarantees n_neg survivors after exclusion
    (fewer survive only when the corpus itself has fewer matches)."""
    import pandas as pd

    qs = [(str(q), str(t), frozenset(int(d) for d in p)) for q, t, p in queries]
    rows_qid: list = []
    rows_doc: list = []
    rows_sc: list = []
    rows_rank: list = []
    for i in range(0, len(qs), batch_size):
        batch = qs[i : i + batch_size]
        depth = n_neg + max((len(p) for _, _, p in batch), default=0)
        texts = sorted({t for _, t, _ in batch})
        res = ix.search_many(texts, limit=depth)
        for qid, text, pos in batch:
            rank = 0
            for doc_id, score in res.get(text, []):
                if int(doc_id) in pos:
                    continue
                rank += 1
                if rank > n_neg:
                    break
                rows_qid.append(qid)
                rows_doc.append(int(doc_id))
                rows_sc.append(float(score))
                rows_rank.append(rank)
    spark = ix.spark
    if not rows_qid:
        from xf_spark.query.segment_search import empty_local

        return empty_local(spark, MINED_SCHEMA)
    import numpy as np

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "qid": rows_qid,
                "doc_id": np.asarray(rows_doc, dtype=np.int64),
                "score": np.asarray(rows_sc, dtype=np.float64),
                "rank": np.asarray(rows_rank, dtype=np.int32),
            }
        ),
        schema=MINED_SCHEMA,
    )
