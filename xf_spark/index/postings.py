"""Posting-list construction as DataFrame transformations.

Pipeline (the Spark re-expression of the reference's index build,
search.rs:356-511, per SURVEY.md §3.1):

    docs(doc_id, text)
      -> doc_postings UDF (vectorized Arrow; per-doc term aggregation
         INSIDE the scan stage — (term, tf, positions) structs)
      -> explode                               # NO shuffle
      -> postings(term, doc_id, tf, dl, positions)

Scale notes:
- per-doc aggregation in the UDF is map-side combine taken to its
  limit: token-granularity rows never shuffle. The only build shuffles
  are the tiny term-df aggregate and the segment-build repartition by
  (term-bucket, doc-shard) — where head-term skew is handled by the
  doc-shard component of the key (see segments.py).
- positions emitted in document order — deterministic under any
  parallelism.
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
    postings table on doc_id. No shuffle here at all: per-doc term
    aggregation happens inside the Arrow UDF, then explodes."""
    from xf_spark.functions.udfs import doc_postings_udf

    per_doc = docs.select(
        "doc_id", doc_postings_udf(F.col("text")).alias("plist")
    ).withColumn("dl", F.aggregate("plist", F.lit(0), lambda a, x: a + x["tf"]))
    cols = [
        "doc_id",
        "dl",
        F.col("p.term").alias("term"),
        F.col("p.tf").alias("tf"),
    ]
    if with_positions:
        cols.append(F.col("p.positions").alias("positions"))
    return per_doc.select("doc_id", "dl", F.explode("plist").alias("p")).select(*cols)


def build_prefix_postings(docs: DataFrame) -> DataFrame:
    """Edge-n-gram prefix field postings (search.rs:229-235,1103-1134).

    No positions (the reference indexes the prefix field with Basic
    record option — frequencies only, search.rs:233). ``dl`` is the
    TEXT-field token count (pinned scoring convention shared with the
    oracle: prefix idf comes from the prefix field's own df, tf/dl
    normalization from the text field)."""
    from xf_spark.functions.udfs import doc_prefix_postings_udf

    per_doc = docs.select(
        "doc_id",
        F.size(tokenize_udf(F.col("text"))).alias("dl"),
        doc_prefix_postings_udf(F.col("text")).alias("plist"),
    )
    return per_doc.select("doc_id", "dl", F.explode("plist").alias("p")).select(
        "doc_id",
        "dl",
        F.col("p.term").alias("term"),
        F.col("p.tf").alias("tf"),
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


def corpus_stats_from_postings(postings: DataFrame, n_docs: int) -> CorpusStats:
    """Stats from an already-built postings table (avoids re-tokenizing
    the corpus): avgdl = sum(tf) / N. Empty docs contribute 0 tokens
    and are counted via ``n_docs`` (total docs, not docs-with-terms)."""
    row = postings.agg(F.sum("tf").alias("total")).first()
    total = int(row["total"] or 0)
    return CorpusStats(n_docs=n_docs, avgdl=(total / n_docs) if n_docs else 0.0)


def term_df(postings: DataFrame) -> DataFrame:
    """-> (term, df long): document frequency per term. One count-only
    shuffle on term; safe under Zipf because count has a map-side
    combiner (each mapper emits one partial count per distinct term)."""
    return postings.groupBy("term").agg(F.count("*").alias("df"))
