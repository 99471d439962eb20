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


@pandas_udf(T.ArrayType(T.StringType()))
def prefixes_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: generate_prefixes(t or ""))


@pandas_udf(T.StringType())
def canonicalize_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: canonicalize_for_embedding(t or ""))


@pandas_udf(T.ArrayType(T.FloatType()))
def hash_embed_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hash_embed(canonicalize_for_embedding(t or "")).tolist())
