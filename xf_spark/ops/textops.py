"""Text-analysis operators for training-data pipelines.

Language ID (n-gram/charset heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and rolling-hash document
fingerprinting. Built-ins where possible; one vectorized pandas UDF
where not. Each has a DuckDB-expressible oracle or a deterministic
pure-Python mirror for tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

EN_STOPWORDS = [
    "the", "a", "of", "and", "to", "in", "is", "for", "on", "with",
    "that", "it", "you", "are", "this",
]

# BPE-ish pre-tokenizer (GPT-2-style contractions + word/number/punct
# classes, public knowledge), used for token counting only.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID via charset ratios (pure built-ins):
    cjk / arabic / cyrillic when those scripts dominate, else 'en' for
    ascii-alpha-dominant text, else 'other'. A real pipeline swaps in
    fastText/CLD3 behind the same column contract."""
    total = F.greatest(F.length(text_col), F.lit(1))
    n_cjk = F.length(F.regexp_replace(text_col, r"[^一-鿿぀-ヿ]", ""))
    n_ar = F.length(F.regexp_replace(text_col, r"[^؀-ۿ]", ""))
    n_cy = F.length(F.regexp_replace(text_col, r"[^Ѐ-ӿ]", ""))
    n_lat = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    return docs.withColumn(
        "lang_guess",
        F.when(n_cjk / total > 0.25, "cjk")
        .when(n_ar / total > 0.25, "ar")
        .when(n_cy / total > 0.25, "ru")
        .when(n_lat / total > 0.4, "en")
        .otherwise("other"),
    )


def _ws_token_count(text_col: str):
    """Whitespace token count ('' -> 0) — the ONE definition shared by
    quality_scores and token_counts so composing them cannot produce
    two divergent n_ws_tokens columns."""
    trimmed = F.trim(F.col(text_col))
    return F.when(F.length(trimmed) == 0, 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + composite score (all JVM-side):
    token count, mean token length, stopword ratio, punctuation
    ratio, uppercase ratio, digit ratio. Composite: heuristic blend
    in [0, 1], higher = more prose-like."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = _ws_token_count(text_col)
    total = F.greatest(F.length(text_col), F.lit(1))
    punct_ratio = F.length(F.regexp_replace(text_col, r"[^!-/:-@\[-`{-~]", "")) / total
    upper_ratio = F.length(F.regexp_replace(text_col, r"[^A-Z]", "")) / total
    digit_ratio = F.length(F.regexp_replace(text_col, r"[^0-9]", "")) / total
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    lower_toks = F.transform(toks, lambda t: F.lower(t))
    stop_ratio = F.size(F.array_intersect(lower_toks, stop)) / F.greatest(
        F.size(F.array_distinct(lower_toks)), F.lit(1)
    )
    score = (
        F.least(n_tok / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(3.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.2
        + (F.lit(1.0) - F.least(digit_ratio * F.lit(4.0), F.lit(1.0))) * 0.1
    )
    cols = ["*"]
    if "n_ws_tokens" not in docs.columns:  # composable with token_counts
        cols.append(n_tok.cast("long").alias("n_ws_tokens"))
    return docs.select(
        *cols,
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts (JVM regexp, no UDF)."""
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
    cols = ["*"]
    if "n_ws_tokens" not in docs.columns:  # composable with quality_scores
        cols.append(_ws_token_count(text_col).cast("long").alias("n_ws_tokens"))
    return docs.select(
        *cols,
        bpe.cast("long").alias("n_bpe_tokens"),
    )


FP_WINDOW = 8
FP_BASE = 1_000_003
FP_MOD = (1 << 61) - 1


def rolling_fingerprints(text: str) -> list[int]:
    """Winnowing-style fingerprints: rolling polynomial hash over
    token windows, keep window minima (document fingerprinting for
    copy detection; deterministic, pure python — shared with tests)."""
    from xf_spark.functions.textcore import tokenize

    toks = tokenize(text or "")
    if len(toks) < FP_WINDOW:
        toks = toks + [""] * (FP_WINDOW - len(toks)) if toks else []
    if not toks:
        return []
    import hashlib

    th = [
        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) for t in toks
    ]
    hashes = []
    for i in range(len(th) - FP_WINDOW + 1):
        h = 0
        for j in range(FP_WINDOW):
            h = (h * FP_BASE + th[i + j]) % FP_MOD
        hashes.append(h)
    # winnow: min of each 4-window, deduped, sorted
    out = set()
    W = 4
    for i in range(max(1, len(hashes) - W + 1)):
        out.add(min(hashes[i : i + W]))
    return sorted(out)


@F.pandas_udf(T.ArrayType(T.LongType()))
def fingerprints_udf(texts: pd.Series) -> pd.Series:
    return texts.map(rolling_fingerprints)


def fingerprint_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("fingerprints", fingerprints_udf(F.col(text_col)))


def fingerprint_overlap_pairs(
    docs: DataFrame,
    min_common: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = 2000,
    log_dropped: bool = True,
) -> DataFrame:
    """Copy-detection candidate pairs: explode fingerprints ->
    self-join on fingerprint -> pairs with >= min_common shared
    fingerprints. Same bucket-join shape as the other dedup ops,
    including the hot-bucket guard: a fingerprint shared by m docs
    emits m^2 pairs, so a boilerplate window (one hash, the whole
    duplicate class) is exactly the quadratic exposure the LSH
    families cap. ``max_bucket`` follows ``dedup.LSH_MAX_BUCKET``
    semantics (None = exact / quadratic-risk behavior)."""
    from xf_spark.ops.dedup import _cap_hot_buckets

    fp = fingerprint_docs(docs, text_col).select(
        id_col, F.explode("fingerprints").alias("fp")
    ).distinct()
    fp = _cap_hot_buckets(fp, ["fp"], max_bucket, log_dropped, "fingerprint")
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
        .orderBy("id_a", "id_b")
    )


def tfidf_keywords(
    docs: DataFrame,
    top_n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction: top-``top_n`` terms by tf-idf.

    -> (doc_id, term, tfidf, rank), rank 1..top_n per doc, ordered
    deterministically (tfidf desc, term asc within a doc). Uses the
    engine tokenizer (split / RemoveLong40 / lower) and the smooth
    sklearn-style idf ``ln((1+N)/(1+df)) + 1`` so a corpus-wide term
    still scores > 0 (replayed verbatim in the DuckDB oracle).

    Scale shape: ONE tokenize pass (the same Arrow UDF as the index
    build — no per-row Python), per-(doc, term) tf comes out of the
    UDF pre-aggregated (no shuffle), df is a term-keyed partial
    aggregate (vocabulary-sized output), and the final rank is a
    window partitioned by doc_id — per-partition state is one doc's
    terms, so no skew beyond the longest document. The df join is
    vocabulary-sized per side; AQE picks broadcast when it fits."""
    from xf_spark.index.postings import build_postings

    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    n_docs = base.count()
    postings = build_postings(base, with_positions=False)
    dfs = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = postings.join(dfs, "term").select(
        "doc_id",
        "term",
        (
            F.col("tf").cast("double")
            * (
                F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df")))
                + F.lit(1.0)
            )
        ).alias("tfidf_raw"),
    )
    from pyspark.sql import Window

    # rank on the ROUNDED score: double log/product arithmetic can
    # differ in the last ulp across engines, and rank must be
    # reproducible (near-ties resolve identically everywhere; exact
    # 6-dp ties break on term asc)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("tfidf_raw", 6)), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            "doc_id",
            "term",
            F.round("tfidf_raw", 6).alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
