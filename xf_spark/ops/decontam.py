"""Decontamination: flag / drop corpus rows that share token n-grams
with a reference (eval / test) set.

The published training-data hygiene op (GPT-3 appendix C, PaLM,
Llama: 13-gram overlap decontamination): a corpus document sharing at
least ``min_overlap`` distinct n-grams of tokens with any held-out
document is contaminated and must not be trained on. Beyond the
reference repo's surface — a first-class 100 TB pipeline op here,
composed with the same tokenizer the index uses
(functions/textcore.py, the Tantivy "default" chain).

Scale shape (the part that matters at 100 TB):

- The corpus side explodes to DISTINCT-per-doc n-grams with one
  vectorized pandas UDF + ``explode`` — narrow, no shuffle.
- The reference side is typically tiny (an eval set of 1e3–1e6
  grams), so its distinct grams BROADCAST: the contamination join is
  map-side, and corpus gram rows never shuffle. The only wide
  exchange is ``groupBy(doc_id)`` over the (rare) matches — bounded
  by contaminated mass, not corpus size.
- With ``broadcast_ref=False`` (a huge reference set) the join
  degrades to a hash-partitioned inner join keyed on the gram string
  — still linear in corpus grams, no self-join anywhere, and Zipf
  skew is impossible because each side contributes a gram at most
  once per doc (ref side exactly once overall).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xf_spark.functions.textcore import tokenize


def _ngrams_udf(n: int):
    """Vectorized: text -> sorted DISTINCT n-grams of engine tokens,
    joined with single spaces (the portable key the DuckDB oracle
    reproduces with array_to_string over the same split class)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def grams(texts: pd.Series) -> pd.Series:
        def one(t):
            toks = tokenize(t or "")
            if len(toks) < n:
                return []
            return sorted(
                {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            )

        return texts.map(one)

    return grams


def doc_ngrams(
    docs: DataFrame, n: int = 13, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, gram) — one row per DISTINCT n-gram per document."""
    return docs.select(
        id_col, F.explode(_ngrams_udf(n)(F.col(text_col))).alias("gram")
    )


def contamination_overlap(
    corpus: DataFrame,
    ref: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_ref: bool = True,
) -> DataFrame:
    """(id_col, n_overlap) for every corpus doc sharing >= 1 distinct
    token n-gram with ANY reference doc. ``ref`` needs only
    ``text_col``. Docs shorter than ``n`` tokens produce no grams and
    can never be flagged (mirrors the published n-gram rule)."""
    ref_grams = doc_ngrams(
        ref.select(F.monotonically_increasing_id().alias("_rid"),
                   F.col(text_col)),
        n, text_col, "_rid",
    ).select("gram").distinct()
    if broadcast_ref:
        ref_grams = F.broadcast(ref_grams)
    return (
        doc_ngrams(corpus, n, text_col, id_col)
        .join(ref_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )


def decontaminate(
    corpus: DataFrame,
    ref: DataFrame,
    n: int = 13,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_ref: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Drop contaminated rows. Returns ``(kept, flagged)`` where
    ``flagged`` is the (id, n_overlap) frame of dropped docs and
    ``kept`` is ``corpus`` minus those ids (left_anti — corpus rows
    and columns otherwise untouched)."""
    flagged = contamination_overlap(
        corpus, ref, n=n, text_col=text_col, id_col=id_col,
        broadcast_ref=broadcast_ref,
    ).where(F.col("n_overlap") >= int(min_overlap))
    kept = corpus.join(
        F.broadcast(flagged.select(id_col)) if broadcast_ref
        else flagged.select(id_col),
        id_col,
        "left_anti",
    )
    return kept, flagged
