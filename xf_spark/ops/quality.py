"""Rule-based document quality filters: the Gopher rules and the C4
line-level cleanup.

These complement ``textops.quality_scores`` (a continuous composite
score) with the two published KEEP/DROP rule sets a pretraining
pipeline actually runs (both public):

- Gopher rules (Rae et al. 2021, appendix A1.1): word-count bounds,
  mean-word-length bounds, symbol-to-word ratio, bullet / ellipsis
  line fractions, alphabetic-word fraction, required-stopword count.
- C4 line filtering (Raffel et al. 2020, section 2.2): keep only
  lines that end in terminal punctuation and have >= 5 words, drop
  "javascript" lines, drop pages containing "lorem ipsum" or "{" or
  with too few surviving lines.

100 TB shape: both are PURE NARROW projections — every signal is a
JVM built-in expression over the row's own tokens/lines (split /
filter / transform / aggregate), zero shuffle, zero Python, and the
whole filter fuses into one whole-stage-codegen stage with whatever
scan feeds it. Each has an exact DuckDB list-lambda replay in
``entry_oracles.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# the words Gopher requires at least two of (public rule set)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

BULLET_PREFIXES = ("-", "*", "•")  # '-', '*', '•'


def _ws_tokens(text_col: str) -> Column:
    trimmed = F.trim(F.col(text_col))
    return F.when(
        F.length(trimmed) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))


def _nonempty_lines(text_col: str) -> Column:
    return F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_frac: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher rule signals + the keep verdict.

    Emits ``(doc_id, n_words, mean_word_len, symbol_frac, bullet_frac,
    ellipsis_frac, alpha_frac, n_stop_hits, keep)``. All fractions are
    rounded to 6 dp (half-away-from-zero, matching DuckDB ROUND);
    ``keep`` is the conjunction of the published thresholds, every one
    of which is a parameter so corpora with different token statistics
    can re-tune without forking the op.
    """
    toks = _ws_tokens(text_col)
    lines = _nonempty_lines(text_col)
    n_words = F.size(toks)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    char_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = char_sum / nw
    symbol_frac = (
        F.size(
            F.filter(
                toks,
                lambda t: F.contains(t, F.lit("#"))
                | F.contains(t, F.lit("..."))
                | F.contains(t, F.lit("…")),
            )
        )
        / nw
    )
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / nw
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda s: F.substring(s, 1, 1).isin(*BULLET_PREFIXES),
            )
        )
        / n_lines
    )
    ellipsis_frac = (
        F.size(
            F.filter(
                lines,
                lambda s: F.endswith(s, F.lit("..."))
                | F.endswith(s, F.lit("…")),
            )
        )
        / n_lines
    )
    stop = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, lambda t: F.lower(t))), stop
        )
    )
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_frac, 6).alias("symbol_frac"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.cast("long").alias("n_stop_hits"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_frac") <= max_symbol_frac)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("n_stop_hits") >= min_stop_hits)
    )
    return sig.withColumn("keep", keep)


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 line-level cleanup + page verdict.

    Line rule (applied to trimmed non-empty lines): keep iff the line
    ends in terminal punctuation (``. ! ? "``), has at least
    ``min_line_words`` whitespace words, and does not mention
    "javascript" (case-insensitive). Page rule: keep iff at least
    ``min_kept_lines`` lines survive AND the page contains neither
    "lorem ipsum" (case-insensitive) nor a curly brace.

    Emits ``(doc_id, n_lines, n_kept_lines, keep, clean_text)`` where
    ``clean_text`` re-joins the surviving lines with newlines (empty
    string when none survive).
    """
    lines = _nonempty_lines(text_col)
    terminal = lambda s: (  # noqa: E731 — tiny predicate, used once
        F.endswith(s, F.lit("."))
        | F.endswith(s, F.lit("!"))
        | F.endswith(s, F.lit("?"))
        | F.endswith(s, F.lit('"'))
    )
    kept_lines = F.filter(
        lines,
        lambda s: terminal(s)
        & (F.size(F.split(s, r"\s+")) >= min_line_words)
        & ~F.contains(F.lower(s), F.lit("javascript")),
    )
    lt = F.lower(F.col(text_col))
    page_ok = (
        (F.size(kept_lines) >= min_kept_lines)
        & ~F.contains(lt, F.lit("lorem ipsum"))
        & ~F.contains(lt, F.lit("{"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept_lines).cast("long").alias("n_kept_lines"),
        page_ok.alias("keep"),
        F.array_join(kept_lines, "\n").alias("clean_text"),
    )
