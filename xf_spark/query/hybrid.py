"""Hybrid search: Reciprocal Rank Fusion of lexical + semantic lists.

Parity with the reference's hybrid.rs:136-213 pinned semantics
(FIXTURES.md §4):
- K = 60; fused score = sum over lists of 1/(K + rank + 1), rank
  0-based within each list;
- candidate multiplier 3: each source fetches 3*(limit+offset);
- tiebreaks: score desc -> present-in-both-lists first -> doc_id asc.

Spark shape (SURVEY.md §3.3): two ranked DataFrames -> row_number
windows -> full outer join on doc_id -> RRF expression -> orderBy with
the exact tiebreaks -> offset/limit. The inputs are k-sized (top-k
results), so every step here is broadcast-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

RRF_K = 60
CANDIDATE_MULTIPLIER = 3


def candidate_count(limit: int, offset: int = 0) -> int:
    return CANDIDATE_MULTIPLIER * (limit + offset)


def rrf_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    limit: int,
    offset: int = 0,
) -> DataFrame:
    """Fuse two (doc_id, score) DataFrames (already in rank order
    semantics: rank = row_number over (score desc, doc_id asc)).
    Returns (doc_id, score[, in_both]) — score is the RRF score."""
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = lexical.select(
        "doc_id", (F.row_number().over(w) - 1).alias("lex_rank")
    )
    sem = semantic.select(
        "doc_id", (F.row_number().over(w) - 1).alias("sem_rank")
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.when(
                F.col("lex_rank").isNotNull(),
                1.0 / (F.lit(RRF_K) + F.col("lex_rank") + 1),
            ).otherwise(0.0)
            + F.when(
                F.col("sem_rank").isNotNull(),
                1.0 / (F.lit(RRF_K) + F.col("sem_rank") + 1),
            ).otherwise(0.0)
        ).alias("score"),
        (F.col("lex_rank").isNotNull() & F.col("sem_rank").isNotNull())
        .cast("int")
        .alias("in_both"),
    )
    ranked = fused.orderBy(
        F.desc("score"), F.desc("in_both"), F.asc("doc_id")
    )
    if offset:
        ranked = ranked.offset(offset)
    return ranked.limit(limit).select("doc_id", "score")


def hybrid_search(
    lexical_engine,
    embeddings: DataFrame,
    query: str,
    limit: int = 20,
    offset: int = 0,
    doc_filter: DataFrame | None = None,
    semantic_override: DataFrame | None = None,
    semantic_query: str | None = None,
    **search_kw,
) -> DataFrame:
    """Full hybrid flow (main.rs:1302-1380): both sources fetch
    3x(limit+offset) candidates, RRF-fuse, paginate. ``doc_filter``
    (doc_id DataFrame) constrains the semantic branch to the same
    filtered doc set as the lexical filters in ``search_kw``.
    ``semantic_override`` replaces the distributed semantic fetch
    (e.g. the coordinator-pinned matrix path) — must already be the
    top-3x(limit+offset) (doc_id, score) candidates.
    ``semantic_query`` is the text the semantic branch embeds when it
    differs from ``query`` (e.g. type:/role: filter atoms stripped —
    they are predicates, not semantic content)."""
    from xf_spark.query.semantic import semantic_topk

    n = candidate_count(limit, offset)
    lex = lexical_engine.search(query, limit=n, **search_kw)
    sem = (
        semantic_override
        if semantic_override is not None
        else semantic_topk(
            embeddings,
            semantic_query if semantic_query is not None else query,
            limit=n,
            doc_filter=doc_filter,
        )
    )
    # fusion inputs are k-sized (<= 3*(limit+offset) rows/side): fuse
    # driver-side — the window/join/orderBy DataFrame plan costs 3-4
    # Spark jobs of pure scheduling on ~hundreds of rows. This is the
    # search-coordinator shape at any scale: rank lists are small BY
    # CONSTRUCTION. (rrf_fuse stays as the distributed form and as the
    # independent implementation the differential tests compare.)
    lex_rows = [(r["doc_id"], r["score"]) for r in lex.collect()]
    sem_rows = [(r["doc_id"], r["score"]) for r in sem.collect()]
    fused = _rrf_fuse_local(lex_rows, sem_rows, limit=limit, offset=offset)
    spark = embeddings.sparkSession
    import numpy as np
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    # Arrow local relation — the list-backed form costs ~250ms per
    # materialization in local mode (measured)
    from xf_spark.query.segment_search import arrow_local

    return arrow_local(
        spark, schema,
        {
            "doc_id": np.asarray([d for d, _ in fused], dtype=np.int64),
            "score": np.asarray([s for _, s in fused], dtype=np.float64),
        },
    )


def rrf_explain_local(
    lex: list, sem: list, limit: int, offset: int = 0
) -> list[tuple]:
    """Fusion breakdown (the hybrid analog of the BM25 ``explain``):
    for each of the top-``limit`` fused docs, the 0-based rank it held
    in each source list (None when absent) and each source's RRF
    contribution 1/(K + rank + 1) — contributions sum to the fused
    score. Same pinned semantics and tiebreaks as _rrf_fuse_local
    (rank by (score desc, doc_id asc), K=60, score desc / in-both /
    doc_id asc).

    Returns rows (doc_id, lex_rank, sem_rank, contrib_lex,
    contrib_sem, score) in fused order."""

    def ranks(rows):
        order = sorted(rows, key=lambda kv: (-kv[1], kv[0]))
        return {d: i for i, (d, _s) in enumerate(order)}

    rl, rs = ranks(lex), ranks(sem)
    fused = []
    for d in set(rl) | set(rs):
        cl = 1.0 / (RRF_K + rl[d] + 1) if d in rl else 0.0
        cs = 1.0 / (RRF_K + rs[d] + 1) if d in rs else 0.0
        fused.append(
            (
                int(d),
                rl.get(d),
                rs.get(d),
                cl,
                cs,
                cl + cs,
                1 if (d in rl and d in rs) else 0,
            )
        )
    fused.sort(key=lambda r: (-r[5], -r[6], r[0]))
    return [r[:6] for r in fused[offset : offset + limit]]


def _rrf_fuse_local(
    lex: list, sem: list, limit: int, offset: int = 0
) -> list[tuple[int, float]]:
    """NumPy RRF over rank-ordered (doc_id, score) lists — same pinned
    semantics as rrf_fuse (rank by (score desc, doc_id asc), K=60,
    tiebreak score desc / in-both / doc_id asc). Implemented
    independently of xf_spark.oracle so the oracle differentials stay
    meaningful."""
    import numpy as np

    def ranks(rows):
        order = sorted(rows, key=lambda kv: (-kv[1], kv[0]))
        return {d: i for i, (d, _s) in enumerate(order)}

    rl, rs = ranks(lex), ranks(sem)
    docs = sorted(set(rl) | set(rs))
    if not docs:
        return []
    score = np.zeros(len(docs))
    in_both = np.zeros(len(docs), dtype=np.int64)
    for i, d in enumerate(docs):
        s = 0.0
        if d in rl:
            s += 1.0 / (RRF_K + rl[d] + 1)
        if d in rs:
            s += 1.0 / (RRF_K + rs[d] + 1)
        score[i] = s
        in_both[i] = 1 if (d in rl and d in rs) else 0
    ids = np.asarray(docs, dtype=np.int64)
    order = np.lexsort((ids, -in_both, -score))
    sel = order[offset : offset + limit]
    return [(int(ids[i]), float(score[i])) for i in sel]
