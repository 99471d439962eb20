"""Per-document term vectors — the Elasticsearch ``_termvectors`` UX.

For ONE document: every text-field term with its tf, positions, df,
idf, and BM25 contribution (what the doc would add to a query naming
that term). The debugging/feature-extraction companion to ``explain``:
explain breaks a QUERY's top-k down per term, term_vectors breaks a
DOCUMENT down per term.

Scale shape: one predicate-pushed docs lookup (doc_id equality reaches
the parquet scan), re-analysis with the index tokenizer on the driver
(a document is KB-sized — this is Lucene's own re-analysis path when
vectors aren't stored), df resolution through the memoized
``term_dfs`` vocabulary lookup for the doc's <= |doc| distinct terms,
and a local-relation result. No shuffle, nothing corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from xf_spark.functions.textcore import tokenize
from xf_spark.oracle import bm25_idf, bm25_tf_part

TERM_VECTORS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.LongType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
        T.StructField("df", T.LongType()),
        T.StructField("idf", T.DoubleType()),
        T.StructField("contrib", T.DoubleType()),
    ]
)

def term_vectors(ix, doc_id: int) -> DataFrame:
    """(term, tf, positions, df, idf, contrib) for one document of a
    SegmentIndex, ordered (contrib desc, term asc). ``contrib`` is the
    doc's BM25 leg for that term — idf(t) * tf(K1+1)/(tf + K1(1-b+b·
    dl/avgdl)) — i.e. exactly what a single-term query on ``t`` would
    score this doc. Raises KeyError for an unknown doc_id."""
    if ix.docs is None:
        raise ValueError("term_vectors requires a docs table")
    from pyspark.sql import functions as F

    rows = ix.docs.where(F.col("doc_id") == int(doc_id)).select("text").collect()
    if not rows:
        raise KeyError(f"doc_id {doc_id} not found")
    toks = tokenize(rows[0]["text"] or "")
    if not toks:
        from xf_spark.query.segment_search import empty_local

        return empty_local(ix.spark, TERM_VECTORS_SCHEMA)
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)
    dl = float(len(toks))
    avgdl = ix.meta["avgdl"]
    n = ix.meta["n_docs"]
    dfs = ix.term_dfs(set(pos), "text")
    recs = []
    for t, plist in pos.items():
        df = int(dfs.get(t, 0))
        # the PINNED scoring arithmetic (oracle.py) — contrib must
        # equal a single-term query's score for this doc
        idf = bm25_idf(n, df) if df else 0.0
        contrib = idf * bm25_tf_part(float(len(plist)), dl, avgdl)
        recs.append((t, len(plist), plist, df, idf, contrib))
    recs.sort(key=lambda r: (-r[5], r[0]))
    return ix.spark.createDataFrame(
        pd.DataFrame(
            {
                "term": [r[0] for r in recs],
                "tf": np.asarray([r[1] for r in recs], dtype=np.int64),
                "positions": [r[2] for r in recs],
                "df": np.asarray([r[3] for r in recs], dtype=np.int64),
                "idf": np.asarray([r[4] for r in recs], dtype=np.float64),
                "contrib": np.asarray([r[5] for r in recs], dtype=np.float64),
            }
        ),
        schema=TERM_VECTORS_SCHEMA,
    )
