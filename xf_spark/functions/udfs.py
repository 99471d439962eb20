"""Vectorized pandas/Arrow UDFs wrapping the textcore primitives.

Every hot-path text operation is a pandas UDF over Arrow batches (the
BASELINE.json input_hint mandates no per-row Python UDFs). The cores
live in ``textcore``/``hash_embed`` and are shared with the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from xf_spark.functions.hash_embed import hash_embed
from xf_spark.functions.textcore import (
    canonicalize_for_embedding,
    generate_prefixes,
    tokenize,
)


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: tokenize(t or ""))


# Per-doc posting aggregation INSIDE the UDF: emits (term, tf, positions)
# structs per document. This is map-side combine taken to its limit —
# the (term, doc) pairs never shuffle at token granularity; only
# per-doc aggregates leave the scan stage. At 10^12 turns this removes
# the single biggest shuffle of the build (SURVEY.md §3.1).
_POSTING_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("tf", T.IntegerType()),
            T.StructField("positions", T.ArrayType(T.IntegerType())),
        ]
    )
)


@pandas_udf(_POSTING_STRUCT)
def doc_postings_udf(texts: pd.Series) -> pd.Series:
    def one(text):
        acc: dict = {}
        for pos, t in enumerate(tokenize(text or "")):
            acc.setdefault(t, []).append(pos)
        # sorted by term: deterministic output order
        return [(t, len(ps), ps) for t, ps in sorted(acc.items())]

    return texts.map(one)


@pandas_udf(
    T.ArrayType(
        T.StructType(
            [
                T.StructField("term", T.StringType()),
                T.StructField("tf", T.IntegerType()),
            ]
        )
    )
)
def doc_prefix_postings_udf(texts: pd.Series) -> pd.Series:
    """Per-doc (prefix_term, tf) aggregates (edge n-grams,
    search.rs:1103-1134)."""

    def one(text):
        acc: dict = {}
        for p in generate_prefixes(text or ""):
            acc[p] = acc.get(p, 0) + 1
        return sorted(acc.items())

    return texts.map(one)


@pandas_udf(T.ArrayType(T.StringType()))
def prefixes_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: generate_prefixes(t or ""))


@pandas_udf(T.StringType())
def canonicalize_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: canonicalize_for_embedding(t or ""))


@pandas_udf(T.ArrayType(T.FloatType()))
def hash_embed_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hash_embed(canonicalize_for_embedding(t or "")).tolist())
