"""Index build facade: transcripts -> queryable BM25Engine.

Two forms:
- ``build_engine`` — in-session DataFrame index (postings cached in
  memory); the correctness path and the base for small/medium corpora.
- the persisted segment index (see ``segments.py``) — the at-rest,
  compressed, resumable artifact for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from xf_spark.index.docs import prepare_docs
from xf_spark.index.postings import (
    build_postings,
    build_prefix_postings,
    corpus_stats,
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
    if cache:
        docs = docs.cache()
    postings = build_postings(docs, with_positions=with_positions)
    prefix = build_prefix_postings(docs) if with_prefix else None
    if cache:
        postings = postings.cache()
        postings.count()  # materialize once; queries reuse
        if prefix is not None:
            prefix = prefix.cache()
    stats = corpus_stats(docs)
    return BM25Engine(docs=docs, postings=postings, stats=stats, prefix_postings=prefix)
