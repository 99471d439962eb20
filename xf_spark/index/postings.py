"""Posting-list construction as DataFrame transformations.

Pipeline (the Spark re-expression of the reference's index build,
search.rs:356-511, per SURVEY.md §3.1):

    docs(doc_id, text)
      -> tokenize (vectorized Arrow UDF)
      -> posexplode(tokens)                    # (doc_id, pos, term)
      -> groupBy(term, doc_id)                 # shuffle on (term, doc_id)
         .agg(tf = count, positions = sort_array(collect_list(pos)))

Scale notes:
- the groupBy key is (term, doc_id), NOT bare term — head terms
  ("the", "to") spread across reducers by doc_id, so Zipf skew does
  not concentrate on one task at this stage. The bare-term grouping
  (where skew WOULD bite) happens only in the segment builder, which
  shards by doc-range first (see segments.py).
- ``sort_array(collect_list(...))`` pins position order regardless of
  shuffle arrival order — determinism under any parallelism.
- partial aggregation (map-side combine) applies to the count; the
  positions list has no combiner, but per-(term,doc) position lists
  are bounded by document length, not corpus size.
- ``positions`` are optional: phrase support costs ~3x postings bytes
  (SURVEY.md §7.7), so builders that don't need phrases skip them.

Corpus statistics are GLOBAL (single agg over docs / postings), never
per-partition — the partition-invariance pin that makes N-vs-4N runs
rank-identical (SURVEY.md §7.0).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from xf_spark.functions.udfs import prefixes_udf, tokenize_udf


@dataclass(frozen=True)
class CorpusStats:
    """Global BM25 statistics (the 'single-segment' semantics)."""

    n_docs: int
    avgdl: float


def tokenized_docs(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text, ...) -> (doc_id, tokens array<string>, dl int)."""
    return docs.select(
        "doc_id",
        tokenize_udf(F.col("text")).alias("tokens"),
    ).withColumn("dl", F.size("tokens"))


def build_postings(docs: DataFrame, with_positions: bool = True) -> DataFrame:
    """-> postings(term, doc_id, tf int, dl int[, positions array<int>]).

    ``dl`` (document token count) is denormalized into every posting
    row: +4 bytes/posting buys query-time scoring WITHOUT a
    doc-lengths join — at 100 TB that join would shuffle the whole
    postings table on doc_id."""
    toks = tokenized_docs(docs)
    exploded = toks.select("doc_id", "dl", F.posexplode("tokens").alias("pos", "term"))
    aggs = [F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl")]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return exploded.groupBy("term", "doc_id").agg(*aggs)


def build_prefix_postings(docs: DataFrame) -> DataFrame:
    """Edge-n-gram prefix field postings (search.rs:229-235,1103-1134).

    No positions (the reference indexes the prefix field with Basic
    record option — frequencies only, search.rs:233). ``dl`` is the
    TEXT-field token count (pinned scoring convention shared with the
    oracle: prefix idf comes from the prefix field's own df, tf/dl
    normalization from the text field)."""
    pref = docs.select(
        "doc_id",
        F.size(tokenize_udf(F.col("text"))).alias("dl"),
        F.explode(prefixes_udf(F.col("text"))).alias("term"),
    )
    return pref.groupBy("term", "doc_id").agg(
        F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl")
    )


def doc_lengths(docs: DataFrame) -> DataFrame:
    """-> (doc_id, dl) — exact token counts (pinned: no fieldnorm
    quantization, SURVEY.md §7.0)."""
    return tokenized_docs(docs).select("doc_id", "dl")


def corpus_stats(docs: DataFrame) -> CorpusStats:
    """One global aggregate: N and avgdl over ALL docs (empty docs
    count toward both, dl = 0)."""
    row = doc_lengths(docs).agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n = int(row["n"] or 0)
    return CorpusStats(n_docs=n, avgdl=float(row["avgdl"] or 0.0))


def term_df(postings: DataFrame) -> DataFrame:
    """-> (term, df long): document frequency per term. One count-only
    shuffle on term; safe under Zipf because count has a map-side
    combiner (each mapper emits one partial count per distinct term)."""
    return postings.groupBy("term").agg(F.count("*").alias("df"))
