"""Tantivy byte-parity scoring — the reference CLI's exact lexical
semantics, re-expressed over the engine's postings DataFrames.

The reference searches bare terms over TWO default fields — ``text``
and ``text_prefix`` (QueryParser::for_index with both fields,
search.rs:542-548) — so a term's score is the SUM of two BM25 legs:

- text leg: tf from the text field, fieldnorm = quantized text token
  count (Lucene SmallFloat table, ``functions/fieldnorm.py``).
- prefix leg: the prefix field is indexed with IndexRecordOption::
  Basic (search.rs:233) — no stored frequencies, so tf == 1 — and its
  fieldnorm is the quantized PREFIX-token count (the edge-n-gram
  stream is its own field with its own lengths).

Each leg's weight follows Tantivy 0.22 Bm25Weight: idf = ln(1 +
(N - df + 0.5)/(df + 0.5)), weight = idf * (k1 + 1), tf_factor =
tf / (tf + k1*(1 - b + b*fieldnorm/average_fieldnorm)) — ALL in
float32 (Tantivy's Score type), with average_fieldnorm =
total_num_tokens / total_num_docs.

Measured parity (tests/test_reference_golden.py): over the
regenerated full perf corpus, this reproduces the reference's golden
'machine' score 5.232151 to within 1e-3 relative. The residual is
pinned to one semantic ambiguity that cannot be settled offline:
whether Tantivy's ``total_num_tokens`` on this index is the exact
token sum (our default; gives 5.237318) or the fieldnorm-quantized
sum a segment merge produces (id_to_fieldnorm of each stored byte,
tantivy index merger; gives 5.227131) — the golden sits between the
two, and both brackets are asserted in the test. ``prefix_totals=
"quantized"`` switches the average to the merged-segment semantics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from xf_spark.query.bm25 import B, K1, BM25Engine

_f32 = np.float32

def _memo(engine) -> dict:
    """Per-engine memo stored ON the engine instance (engines are
    immutable after build). A module-level dict keyed by id(engine)
    would outlive the engine: CPython reuses ids after GC, so a new
    engine could silently inherit a dead engine's cached stats and
    cached DataFrames (wrong scores + pinned cluster memory). Instance
    storage dies with the engine."""
    return engine.__dict__.setdefault("_tantivy_parity_memo", {})


@dataclass(frozen=True)
class TwoFieldStats:
    n_docs: int
    total_text_tokens: int        # exact sum of text-field lengths
    total_prefix_tokens: int      # exact sum of prefix-field lengths
    total_text_tokens_q: int      # sums of SmallFloat-quantized lengths
    total_prefix_tokens_q: int


def _prefix_doclens(engine: BM25Engine) -> DataFrame:
    """(doc_id, pdl): the prefix FIELD's own token count per doc —
    one narrow aggregate over prefix postings, cached."""
    memo = _memo(engine)
    if "pdl" not in memo:
        memo["pdl"] = (
            engine.prefix_postings.groupBy("doc_id")
            .agg(F.sum("tf").alias("pdl"))
            .cache()
        )
    return memo["pdl"]


def two_field_stats(engine: BM25Engine) -> TwoFieldStats:
    """Per-field totals for average_fieldnorm, exact AND quantized
    (two aggregates, memoized per engine)."""
    memo = _memo(engine)
    if "stats" not in memo:
        from xf_spark.functions.fieldnorm import quantize_col

        tl = (
            engine.postings.select("doc_id", "dl")
            .dropDuplicates(["doc_id"])
            .agg(
                F.sum("dl").alias("t"),
                F.sum(quantize_col(F.col("dl"))).alias("tq"),
            )
            .first()
        )
        pl = _prefix_doclens(engine).agg(
            F.sum("pdl").alias("p"),
            F.sum(quantize_col(F.col("pdl"))).alias("pq"),
        ).first()
        memo["stats"] = TwoFieldStats(
            n_docs=engine.stats.n_docs,
            total_text_tokens=int(tl["t"] or 0),
            total_prefix_tokens=int(pl["p"] or 0),
            total_text_tokens_q=int(tl["tq"] or 0),
            total_prefix_tokens_q=int(pl["pq"] or 0),
        )
    return memo["stats"]


def _bm25_weight_f32(n_docs: int, df: int):
    """Tantivy Bm25Weight pieces in f32: (weight, idf)."""
    x = (_f32(n_docs - df) + _f32(0.5)) / (_f32(df) + _f32(0.5))
    idf = _f32(np.log1p(_f32(x)))
    return idf * _f32(K1 + 1.0), idf


def tantivy_term_topk(
    engine: BM25Engine,
    term: str,
    limit: int = 20,
    prefix_totals: str = "exact",
) -> DataFrame:
    """Top-k for a single bare term under the reference CLI's exact
    semantics — see :func:`tantivy_query_topk`."""
    return tantivy_query_topk(engine, [term], limit, prefix_totals)


def tantivy_query_topk(
    engine: BM25Engine,
    terms: list[str],
    limit: int = 20,
    prefix_totals: str = "exact",
) -> DataFrame:
    """Top-k for a bare-term query (one or more terms) under the
    reference CLI's exact semantics: Tantivy's QueryParser turns each
    term into a Should pair of TermQueries over text and text_prefix,
    so a doc's score is the f32 sum of up to 2·len(terms) BM25 legs,
    each with its own per-field df/average-fieldnorm and quantized
    per-doc norm. Summation order is pinned (query term order, text
    leg before prefix leg) so scores are reproducible bit-for-bit.

    -> (doc_id, score) ordered (score desc, doc_id asc). ``score`` is
    the f32 value widened to double (bit-exact: every f32 is a
    double). ``prefix_totals``: "exact" | "quantized" — which
    total_num_tokens semantics the average fieldnorm uses (see module
    docstring)."""
    if engine.prefix_postings is None:
        raise ValueError("two-field scoring requires prefix postings")
    uniq = list(dict.fromkeys(terms))  # preserve query order
    st = two_field_stats(engine)
    dfs_t = engine._term_dfs(uniq)
    dfs_p = engine._term_dfs(uniq, prefix=True)
    if not any(dfs_t.get(t) or dfs_p.get(t) for t in uniq):
        return engine._empty_scored()
    n = st.n_docs
    if prefix_totals == "quantized":
        tot_t, tot_p = st.total_text_tokens_q, st.total_prefix_tokens_q
    else:
        tot_t, tot_p = st.total_text_tokens, st.total_prefix_tokens
    avg_t = _f32(tot_t) / _f32(n)
    avg_p = _f32(tot_p) / _f32(n)
    # per-(term-slot, field) f32 weights, indexed 2*i (text) / 2*i+1
    # (prefix) — the pinned summation order
    weights = np.zeros(2 * len(uniq), dtype=np.float32)
    for i, t in enumerate(uniq):
        if dfs_t.get(t):
            weights[2 * i] = _bm25_weight_f32(n, dfs_t[t])[0]
        if dfs_p.get(t):
            weights[2 * i + 1] = _bm25_weight_f32(n, dfs_p[t])[0]
    slot = {t: i for i, t in enumerate(uniq)}
    slot_col = F.create_map(
        *[x for t, i in slot.items() for x in (F.lit(t), F.lit(i))]
    )

    # one scan per field, tagged with the term slot; prefix rows carry
    # the prefix-field doc length
    tleg = engine.postings.where(F.col("term").isin(uniq)).select(
        "doc_id",
        (slot_col[F.col("term")] * 2).alias("leg"),
        F.col("tf").cast("long").alias("tf"),
        F.col("dl").cast("long").alias("fn"),
    )
    pleg = (
        engine.prefix_postings.where(F.col("term").isin(uniq))
        .select("doc_id", (slot_col[F.col("term")] * 2 + 1).alias("leg"))
        .join(_prefix_doclens(engine), "doc_id")
        .select(
            "doc_id", "leg", F.lit(1).cast("long").alias("tf"),
            F.col("pdl").cast("long").alias("fn"),
        )
    )
    legs = tleg.unionByName(pleg)
    per_doc = legs.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("leg", "tf", "fn"))
        ).alias("legs")
    )

    wb = weights
    avg_by_parity = (avg_t, avg_p)

    @F.pandas_udf(T.DoubleType())
    def f32_sum(leg_lists: pd.Series) -> pd.Series:
        from xf_spark.functions.fieldnorm import quantize_lengths

        out = np.empty(len(leg_lists), dtype=np.float64)
        for i, legs_ in enumerate(leg_lists):
            acc = _f32(0.0)
            for row in legs_:
                leg, tf, fn = row["leg"], row["tf"], row["fn"]
                avg = avg_by_parity[leg & 1]
                fnq = _f32(int(quantize_lengths(np.array([fn]))[0]))
                norm = _f32(K1) * (_f32(1.0 - B) + _f32(B) * fnq / avg)
                tf32 = _f32(tf)
                acc = _f32(acc + wb[leg] * (tf32 / (tf32 + norm)))
            out[i] = float(acc)
        return pd.Series(out)

    return (
        per_doc.select("doc_id", f32_sum("legs").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(limit)
    )
