"""Index build facade: transcripts -> queryable BM25Engine.

Two forms:
- ``build_engine`` — in-session DataFrame index (postings cached in
  memory); the correctness path and the base for small/medium corpora.
- the persisted segment index (see ``segments.py``) — the at-rest,
  compressed, resumable artifact for the 100 TB path.

Build shape (one tokenize pass, no token-level shuffle):
  docs -> doc_postings UDF -> explode -> postings [cache]
  term_df = postings.groupBy(term).count  [cache]   (tiny: vocab-sized)
  stats   = (N from docs.count, avgdl from sum(tf)/N)
Queries then resolve idf from the cached vocab table — they never
rescan the postings to learn document frequencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from xf_spark.index.docs import prepare_docs
from xf_spark.index.postings import (
    build_postings,
    build_prefix_postings,
    corpus_stats_from_postings,
    term_df,
)
from xf_spark.query.bm25 import BM25Engine


def build_engine(
    transcripts: DataFrame,
    with_positions: bool = True,
    with_prefix: bool = True,
    cache: bool = True,
) -> BM25Engine:
    """Build the in-session index over the input_hint-shaped table."""
    docs = prepare_docs(transcripts)
    _ordered = getattr(docs, "_ordered_cache", None)
    if cache:
        docs = docs.cache()
    n_docs = docs.count()
    if cache and _ordered is not None:
        # docs is cached + materialized: the intermediate sorted-text
        # cache (docID partition-stability anchor) is no longer needed.
        # With cache=False it MUST stay — every downstream action
        # re-plans, and only the cached range partitioning keeps
        # doc_ids stable (AQE resampling hazard, see index/docs.py).
        _ordered.unpersist()

    postings = build_postings(docs, with_positions=with_positions)
    if cache:
        postings = postings.cache()
    vocab = term_df(postings)
    if cache:
        vocab = vocab.cache()
        vocab.count()  # materializes vocab AND postings in one pass

    prefix = prefix_vocab = None
    if with_prefix:
        prefix = build_prefix_postings(docs)
        prefix_vocab = term_df(prefix)
        if cache:
            prefix = prefix.cache()
            prefix_vocab = prefix_vocab.cache()
            prefix_vocab.count()

    stats = corpus_stats_from_postings(postings, n_docs)
    return BM25Engine(
        docs=docs,
        postings=postings,
        stats=stats,
        prefix_postings=prefix,
        vocab=vocab,
        prefix_vocab=prefix_vocab,
    )
