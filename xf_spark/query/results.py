"""Result-shaping operators: context expansion, snippets, sorts,
point/batch lookups, export.

Mirrors the reference's post-search surface (SURVEY.md §2.3/2.6/2.7).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from xf_spark.query.parser import parse_query, query_terms


def conversation_context(docs: DataFrame, hits: DataFrame) -> DataFrame:
    """Expand matched turns to their FULL conversations, carrying a
    per-turn match flag — the DM conversation-context analog
    (build_dm_context main.rs:1570-1631; ordering parity with
    storage.rs:1360-1387 ORDER BY created_at, id == (ts, turn_idx)).

    The per-turn text-equality-under-stable-ordering invariant rides on
    this path: output is every turn of every matched conversation, in
    (conv_id, turn_idx) order, text untouched."""
    matched_convs = (
        docs.join(F.broadcast(hits.select("doc_id")), "doc_id", "left_semi")
        .select("conv_id")
        .distinct()
    )
    flags = hits.select("doc_id", F.lit(True).alias("is_match"))
    return (
        docs.join(F.broadcast(matched_convs), "conv_id", "left_semi")
        .join(F.broadcast(flags), "doc_id", "left")
        .withColumn("is_match", F.coalesce("is_match", F.lit(False)))
        .orderBy("conv_id", "turn_idx")
    )


def get_by_id(docs: DataFrame, conv_id: str, turn_idx: int) -> DataFrame:
    """Point lookup (get_by_id_impl, search.rs:748-823)."""
    return docs.where(
        (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
    ).limit(1)


def get_by_ids(docs: DataFrame, ids: list[tuple[str, int]]) -> DataFrame:
    """Batch lookup aligned to input order (get_by_ids,
    search.rs:683-746: Vec<Option<...>> — one row PER REQUEST in
    request order, doc columns null for missing ids).

    Plan note: the preserved (left) side of a left-outer join can
    never be the broadcast build side, so broadcasting the tiny
    request frame is impossible — but broadcasting the RIGHT side is
    fine (BuildRight). Prune docs down to the requested conv_ids
    (pushed to the parquet scan; bounded by the request, times the
    turns-per-conversation bound the context expansion already
    assumes) and left-join req against broadcast(pruned): one scan,
    one narrow join, misses surface as null rows for free. A None
    conv_id in the request simply never matches — a miss row, not an
    error."""
    spark = docs.sparkSession
    from xf_spark.query.segment_search import arrow_local

    req = arrow_local(
        spark, "conv_id string, turn_idx int, req_order long",
        {
            "conv_id": [c for c, _ in ids],
            "turn_idx": [t for _, t in ids],
            "req_order": list(range(len(ids))),
        },
    )
    convs = sorted({c for c, _ in ids if c is not None})
    pruned = docs.where(F.col("conv_id").isin(convs)) if convs else docs.where(
        F.lit(False)
    )
    doc_extra = [c for c in docs.columns if c not in ("conv_id", "turn_idx")]
    return (
        req.join(F.broadcast(pruned), ["conv_id", "turn_idx"], "left")
        .select("conv_id", "turn_idx", "req_order", *doc_extra)
        .orderBy("req_order")
    )


# ---------------------------------------------------------------------------
# Sort orders (apply_search_sort, main.rs:1844-1880)
# ---------------------------------------------------------------------------

def apply_sort(results: DataFrame, order: str = "relevance") -> DataFrame:
    """relevance: (score desc, doc_id asc) — the engine order.
    date: ts asc, tie score desc. date_desc: ts desc, tie score desc.
    engagement: text length desc (fav+rt analog; transcripts have no
    engagement counters), tie ts desc."""
    if order == "relevance":
        return results.orderBy(F.desc("score"), F.asc("doc_id"))
    if order == "date":
        return results.orderBy(F.asc("ts"), F.desc("score"), F.asc("doc_id"))
    if order == "date_desc":
        return results.orderBy(F.desc("ts"), F.desc("score"), F.asc("doc_id"))
    if order == "engagement":
        return results.orderBy(
            F.desc(F.length("text")), F.desc("ts"), F.asc("doc_id")
        )
    raise ValueError(f"unknown sort order: {order}")


# ---------------------------------------------------------------------------
# Snippets / highlights (SnippetGenerator analog, search.rs:582-586)
# ---------------------------------------------------------------------------

SNIPPET_MAX_CHARS = 150


def add_snippets(hydrated: DataFrame, query: str) -> DataFrame:
    """Add a ``snippet`` column: the first query-term window of the
    text with matches wrapped in <b>..</b>. Runs only on the final
    top-k rows (cheap by construction — post-hoc, never in the scoring
    path)."""
    terms = sorted(query_terms(parse_query(query)))
    if not terms:
        return hydrated.withColumn(
            "snippet", F.substring("text", 1, SNIPPET_MAX_CHARS)
        )
    # token boundary = "not adjacent to a token character", where the
    # tokenizer's token class is \w minus underscore ([\W_]+ splits) —
    # regex \b would treat '_' as a word char and miss 'conv' inside
    # 'conv_id' even though the index tokenizes it as a hit
    pattern = re.compile(
        r"(?<![^\W_])("
        + "|".join(re.escape(t) for t in terms)
        + r")(?![^\W_])",
        re.IGNORECASE,
    )

    @F.pandas_udf(T.StringType())
    def snip(texts: pd.Series) -> pd.Series:
        def one(text):
            text = text or ""
            m = pattern.search(text)
            if not m:
                return text[:SNIPPET_MAX_CHARS]
            start = max(0, m.start() - SNIPPET_MAX_CHARS // 3)
            window = text[start : start + SNIPPET_MAX_CHARS]
            out = pattern.sub(lambda g: f"<b>{g.group(0)}</b>", window)
            return ("..." if start > 0 else "") + out

        return texts.map(one)

    return hydrated.withColumn("snippet", snip(F.col("text")))


# ---------------------------------------------------------------------------
# Export (cmd_export, main.rs:2757-2939)
# ---------------------------------------------------------------------------

def export_results(df: DataFrame, path: str, fmt: str = "json") -> None:
    """json (lines) / csv / parquet export of any result DataFrame."""
    writer = df.coalesce(1).write.mode("overwrite")
    if fmt in ("json", "jsonl"):
        writer.json(path)
    elif fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unknown export format: {fmt}")
