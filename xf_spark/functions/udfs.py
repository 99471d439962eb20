"""Vectorized pandas/Arrow UDFs wrapping the textcore primitives.

Every hot-path text operation is a pandas UDF over Arrow batches (the
BASELINE.json input_hint mandates no per-row Python UDFs). The cores
live in ``textcore``/``hash_embed`` and are shared with the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

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


# Flat both-fields variant: ONE text pass emits text-field postings
# (terms/tfs/positions as parallel flat arrays — no structs, so the
# Arrow->pandas round-trip stays zero-copy-ish) AND prefix-field
# postings. This is the build's only tokenize pass.
_FLAT_STRUCT = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("pos_lens", T.ArrayType(T.IntegerType())),
        T.StructField("pos_flat", T.ArrayType(T.IntegerType())),
        T.StructField("p_terms", T.ArrayType(T.StringType())),
        T.StructField("p_tfs", T.ArrayType(T.IntegerType())),
        T.StructField("dl", T.IntegerType()),
    ]
)


@pandas_udf(_FLAT_STRUCT)
def doc_flat_postings_udf(texts: pd.Series) -> pd.DataFrame:
    terms_o, tfs_o, plens_o, pflat_o, pt_o, ptf_o, dl_o = [], [], [], [], [], [], []
    for text in texts:
        text = text or ""
        acc: dict = {}
        toks = tokenize(text)
        for pos, t in enumerate(toks):
            acc.setdefault(t, []).append(pos)
        items = sorted(acc.items())
        terms_o.append([t for t, _ in items])
        tfs_o.append([len(ps) for _, ps in items])
        plens_o.append([len(ps) for _, ps in items])
        pflat_o.append([p for _, ps in items for p in ps])
        pacc: dict = {}
        for p in generate_prefixes(text):
            pacc[p] = pacc.get(p, 0) + 1
        pitems = sorted(pacc.items())
        pt_o.append([t for t, _ in pitems])
        ptf_o.append([c for _, c in pitems])
        dl_o.append(len(toks))
    return pd.DataFrame(
        {
            "terms": terms_o,
            "tfs": tfs_o,
            "pos_lens": plens_o,
            "pos_flat": pflat_o,
            "p_terms": pt_o,
            "p_tfs": ptf_o,
            "dl": dl_o,
        }
    )


@pandas_udf(T.ArrayType(T.StringType()))
def prefixes_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: generate_prefixes(t or ""))


@pandas_udf(T.StringType())
def canonicalize_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: canonicalize_for_embedding(t or ""))


@pandas_udf(T.ArrayType(T.FloatType()))
def hash_embed_udf(texts: pd.Series) -> pd.Series:
    from xf_spark.functions.hash_embed import hash_embed_batch

    canon = [canonicalize_for_embedding(t or "") for t in texts]
    mat = hash_embed_batch(canon)
    return pd.Series(list(mat))
