"""Training-data pipeline operators: PII redaction, repetition
filtering, deterministic mixture sampling, and sequence packing.

These extend the dedup/quality/decontam family (reference analog: the
curation chain around lib.rs:290-425) with the remaining ops a
pretraining data pipeline runs over a 100 TB corpus. All are
expressed with built-in JVM functions (no Python in the hot path);
the only shuffles are keyed aggregations, and the one op that needs a
global order (sequence packing) uses a two-pass distributed prefix
sum instead of a single-partition window.

Each op has an exact DuckDB replay in ``entry_oracles.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from xf_spark.ops.textops import _ws_token_count

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to the regex subset that Java (Spark) and RE2
# (DuckDB oracle) evaluate identically: char classes and bounded
# repeats only — no lookaround, no backrefs, and no \b (Java's \b is
# Unicode-aware, RE2's is ASCII-only, so they disagree next to CJK
# text). Applied in a fixed order on the progressively-redacted text
# so the categories cannot double-count (IPs are redacted before
# phones; greedy \d{9,} consumes whole digit runs, so no \b needed).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_PHONE = r"\(?\d{3}\)?[ -]\d{3}[ -]\d{4}"
PII_LONG_DIGITS = r"\d{9,}"

PII_STAGES = [
    ("n_emails", PII_EMAIL, "<EMAIL>"),
    ("n_ips", PII_IPV4, "<IP>"),
    ("n_phones", PII_PHONE, "<PHONE>"),
    ("n_long_ids", PII_LONG_DIGITS, "<ID>"),
]


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone numbers / long digit runs and
    count each category. Adds ``n_emails, n_ips, n_phones,
    n_long_ids, clean_text``.

    100 TB shape: a pure narrow map — four regexp passes fused into
    one whole-stage-codegen projection, zero shuffle, and the
    patterns push no data to the driver. A real pipeline swaps in an
    NER model behind the same column contract (counts + clean_text).
    """
    t = F.col(text_col)
    counts = []
    for name, pat, token in PII_STAGES:
        counts.append(F.regexp_count(t, F.lit(pat)).cast("long").alias(name))
        t = F.regexp_replace(t, pat, token)
    return docs.select("*", *counts, t.alias("clean_text"))


# ---------------------------------------------------------------------------
# Repetition / boilerplate stats (Gopher-style repetition rules)
# ---------------------------------------------------------------------------


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals (Gopher repetition rules,
    Rae et al. 2021, public):

    - ``dup_line_frac``: fraction of non-empty trimmed lines that are
      duplicates of another line (1 - distinct/total; 0 when no lines);
    - ``top_bigram_frac``: occurrences of the most frequent word
      2-gram / total 2-grams (0 when fewer than 2 tokens).

    100 TB shape: the line metric is a pure narrow projection
    (split + array_distinct, no shuffle). The bigram metric explodes
    to (doc, gram) and partially aggregates before the shuffle — the
    shuffle key is (doc_id, gram), so skew is bounded by the longest
    single document, not by corpus-wide gram frequency.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    line_part = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.size(lines) == 0, F.lit(0.0))
        .otherwise(
            (F.size(lines) - F.size(F.array_distinct(lines)))
            / F.size(lines).cast("double")
        )
        .alias("dup_line_frac"),
    )

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>"))
        .otherwise(toks)
        .alias("toks"),
    )
    grams = base.where(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.concat_ws(" ", F.element_at("toks", i + 1), F.element_at("toks", i + 2)),
            )
        ).alias("gram"),
        (F.size("toks") - 1).alias("n_grams"),
    )
    top = (
        grams.groupBy("doc_id", "gram", "n_grams")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n_grams")
        .agg(F.max("c").alias("mx"))
        .select("doc_id", (F.col("mx") / F.col("n_grams").cast("double")).alias("top_bigram_frac"))
    )
    return (
        line_part.join(top, "doc_id", "left")
        .select(
            "doc_id",
            F.round("dup_line_frac", 6).alias("dup_line_frac"),
            F.round(F.coalesce("top_bigram_frac", F.lit(0.0)), 6).alias("top_bigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic mixture sampling
# ---------------------------------------------------------------------------

SAMPLE_DENOM = 10_000


def _content_hash_bp(text_col: str):
    """Uniform hash of the document text into [0, SAMPLE_DENOM):
    first 8 hex chars of md5 → int. md5 of the UTF-8 bytes is
    engine-independent, so the keep decision is reproducible across
    Spark, the DuckDB oracle, and any future backfill run — the
    property that matters when a sample must be extended, not
    re-drawn, at 100 TB."""
    return (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("long")
        % SAMPLE_DENOM
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic stratified downsampling: keep a document iff
    md5(text) mod 10000 < rate[stratum] * 10000. Used to rebalance a
    training mixture (e.g. downsample the dominant language) without
    an RNG — same input, same sample, on any cluster size.

    100 TB shape: a narrow filter (no shuffle, no sampling pass);
    the per-stratum rate table is a literal CASE expression, not a
    join."""
    rate = F.lit(int(round(default_rate * SAMPLE_DENOM)))
    for stratum, r in sorted(rates.items()):
        rate = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(r * SAMPLE_DENOM)))
        ).otherwise(rate)
    return docs.where(_content_hash_bp(text_col) < rate)


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------


def pack_chunks(
    docs: DataFrame,
    seq_len: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: concatenate all documents'
    tokens in ``id_col`` order and split every ``seq_len`` tokens —
    the standard pretraining packing layout. Returns per-doc
    ``(doc_id, n_ws_tokens, start_off, chunk_first, chunk_last)``
    where ``start_off`` is the doc's global token offset.

    100 TB shape: the global prefix sum is TWO keyed passes, never a
    single-partition window — docs hash into ``n_buckets``
    deterministic id-range buckets; pass 1 aggregates one token-sum
    row per bucket (O(n_buckets) to the driver, where the running
    offsets are computed and broadcast back); pass 2 is a window
    partitioned BY BUCKET, so every partition cumsums independently.
    At 10^12 docs raise ``n_buckets`` (10^4 bucket rows on the driver
    is still nothing); the work per pass stays fully parallel. The
    bucket key derives from ``id_col`` arithmetic — no sampled range
    partitioner, so the plan is deterministic across jobs (AQE
    re-sampling cannot move a row between passes).
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        _ws_token_count(text_col).cast("long").alias("n_ws_tokens"),
    )
    hi = tok.agg(F.max("doc_id").alias("m")).first()["m"]
    if hi is None:
        return tok.select(
            "doc_id",
            "n_ws_tokens",
            F.lit(None).cast("long").alias("start_off"),
            F.lit(None).cast("long").alias("chunk_first"),
            F.lit(None).cast("long").alias("chunk_last"),
        )
    width = max(1, int(hi) // n_buckets + 1)
    tok = tok.withColumn("bkt", F.expr(f"doc_id div {width}"))
    bucket_sums = (
        tok.groupBy("bkt").agg(F.sum("n_ws_tokens").alias("s")).orderBy("bkt").collect()
    )
    running = 0
    offsets = []
    for row in bucket_sums:
        offsets.append((row["bkt"], running))
        running += row["s"]
    spark = docs.sparkSession
    off = spark.createDataFrame(offsets, "bkt long, bkt_off long")
    w = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tok.join(F.broadcast(off), "bkt")
        .withColumn(
            "start_off",
            F.col("bkt_off") + F.sum("n_ws_tokens").over(w) - F.col("n_ws_tokens"),
        )
        .withColumn("chunk_first", F.expr(f"start_off div {seq_len}"))
        .withColumn(
            "chunk_last",
            F.expr(f"(start_off + greatest(n_ws_tokens, 1L) - 1) div {seq_len}"),
        )
        .select("doc_id", "n_ws_tokens", "start_off", "chunk_first", "chunk_last")
    )


def chunk_split(
    docs: DataFrame,
    chunk_tokens: int = 256,
    stride: int = 192,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style overlapping token-window chunking: one output row per
    (doc, window) with the window re-joined as text. Windows start
    every ``stride`` tokens and span ``chunk_tokens``; the final
    window is the (possibly short) tail. Zero-token docs emit no
    chunks.

    100 TB shape: a pure narrow explode — tokens never leave their
    row, no shuffle, and output size is input size x (chunk/stride)
    overlap factor. The companion corpus-level op is ``pack_chunks``
    (global concat-and-chunk); this one is per-document.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>"))
        .otherwise(toks)
        .alias("toks"),
    ).where(F.size("toks") > 0)
    n = F.size("toks")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.expr(f"(size(toks) - {chunk_tokens} + {stride} - 1) div {stride}")
    )
    return (
        base.select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.slice(
                "toks", F.col("chunk_idx") * stride + 1, chunk_tokens
            ).alias("w"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("w").alias("n_chunk_tokens"),
            F.concat_ws(" ", "w").alias("chunk_text"),
        )
    )


def unigram_logprob_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-LM fluency scoring (the in-container stand-in for
    CCNet/Gopher perplexity filtering, public): train a unigram LM on
    the corpus itself (MLE over lowercased whitespace tokens), then
    score every document by its mean token log-likelihood — gibberish
    and off-distribution docs score low. Emits
    ``(doc_id, n_tokens, avg_logprob)``; zero-token docs emit nothing.

    100 TB shape: the LM "training" is one partially-aggregated
    groupBy(token); the scoring join is keyed on token (Zipf-heavy,
    but the frequency side is ONE ROW per term, so AQE's skew split
    handles the head), and the per-doc mean shuffles k-row partials
    by doc_id. No Python, no driver materialization of the vocab.
    A real pipeline swaps the unigram table for KenLM scores behind
    the same (doc_id, n_tokens, avg_logprob) contract.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ut = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    )
    freq = ut.groupBy("tok").agg(F.count("*").alias("c"))
    n_total = F.lit(float(ut.count()))
    return (
        ut.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / n_total)), 6).alias("avg_logprob"),
        )
    )


def pack_summary(packed: DataFrame, seq_len: int = 2048) -> DataFrame:
    """One-row packing report over ``pack_chunks`` output: doc and
    token totals, number of ``seq_len`` chunks, how many docs straddle
    a chunk boundary, and the fill ratio of the final chunk."""
    agg = packed.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("n_ws_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(
            F.sum((F.col("chunk_last") > F.col("chunk_first")).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("n_straddling"),
    )
    n_chunks = F.when(
        F.col("n_tokens") > 0, F.expr(f"(n_tokens + {seq_len} - 1) div {seq_len}")
    ).otherwise(F.lit(0))
    return agg.withColumn("n_chunks", n_chunks.cast("long")).withColumn(
        "last_fill",
        F.when(
            F.col("n_chunks") > 0,
            F.round(
                (F.col("n_tokens") - (F.col("n_chunks") - 1) * seq_len)
                / F.lit(float(seq_len)),
                6,
            ),
        ).otherwise(F.lit(0.0)),
    )


def train_val_split(
    df: DataFrame,
    val_frac: float = 0.1,
    group_col: str = "conv_id",
    seed: str = "xfsplit",
) -> DataFrame:
    """Deterministic, group-aware train/val split: adds a ``split``
    column ('train' | 'val'); every row of a group gets the same
    value, so conversation context can never leak across the split —
    the contamination guard `decontam` checks after the fact, this
    enforces by construction.

    Mechanics: the first 4 hex chars of md5(seed || group) compare
    lexicographically against the fraction's hex cut — identical
    strings and ordering in Spark and DuckDB, so the oracle replays it
    exactly; granularity 1/65536.

    100 TB shape: a pure narrow projection (md5 + substring +
    compare) — zero shuffle, no RNG state, stable under resume,
    re-partitioning, and engine version changes."""
    if not 0.0 <= val_frac <= 1.0:
        raise ValueError(f"val_frac must be in [0, 1], got {val_frac}")
    cut_i = round(val_frac * 0x10000)
    if cut_i >= 0x10000:
        return df.withColumn("split", F.lit("val"))
    h = F.substring(
        F.md5(F.concat(F.lit(seed), F.col(group_col).cast("string"))), 1, 4
    )
    return df.withColumn(
        "split",
        F.when(h < F.lit(format(cut_i, "04x")), F.lit("val")).otherwise(
            F.lit("train")
        ),
    )


def render_conversations(
    transcripts: DataFrame, sep: str = "\n\n", role_sep: str = ": "
) -> DataFrame:
    """SFT-prep chat rendering: one row per conversation with the
    turns concatenated in turn order as ``role: text`` blocks —
    (conv_id, n_turns, rendered). The string form a fine-tuning
    pipeline tokenizes; swap the template by changing the separators
    or mapping roles upstream.

    100 TB shape: ONE partial-aggregating groupBy on conv_id (the
    same key the doc store is range-partitioned by, so the shuffle is
    narrow); ordering comes from sort_array over (turn_idx, ...)
    structs — no window, no per-row Python. Conversation length bounds
    the per-group state like conversations_grouped."""
    ordered = F.sort_array(
        F.collect_list(F.struct("turn_idx", "role", "text"))
    )
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.array_join(
            F.transform(
                ordered,
                lambda s: F.concat(s.role, F.lit(role_sep), s.text),
            ),
            sep,
        ).alias("rendered"),
    )


# ---------------------------------------------------------------------------
# DSIR: data selection with importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024


def _ws_gram_buckets(text_col: str, n_buckets: int):
    """Hashed unigram+bigram bag over lowercased whitespace tokens.
    Bucket = first-8-hex of md5(gram) mod n_buckets — the repo's
    engine-portable hash (replays in DuckDB as
    ``('0x' || substr(md5(g),1,8))::BIGINT``). Returns an int-array
    column; empty/whitespace-only text yields an empty array."""
    toks_raw = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(toks_raw)
    n = F.size(toks)
    bis = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(toks, bis),
        lambda g: (
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).cast("int"),
    )


def dsir_log_ratios(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The DSIR bucket table: ``log p_target(b) - log q_raw(b)`` over
    hashed n-gram buckets, Laplace-(+1)-smoothed. ``target_pred`` is a
    boolean Column selecting the target-domain rows of ``docs`` (the
    raw distribution is estimated over ALL rows).

    100 TB shape: ONE exploded (bucket)-keyed partial aggregation
    computes both distributions (the target counts ride as a
    conditional sum — no second corpus scan); the result is n_buckets
    rows, broadcastable by construction. The two normalizers are a
    single-row agg collect (k-bounded driver traffic).
    """
    b = docs.select(
        F.explode(_ws_gram_buckets(text_col, n_buckets)).alias("bucket"),
        target_pred.alias("is_target"),
    )
    agg = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
        F.count("*").alias("cq"),
    )
    tot = agg.agg(
        F.sum("ct").alias("nt"), F.sum("cq").alias("nq")
    ).collect()[0]
    nt = float((tot["nt"] or 0) + n_buckets)
    nq = float((tot["nq"] or 0) + n_buckets)
    return agg.select(
        "bucket",
        (
            F.log((F.col("ct") + 1) / F.lit(nt))
            - F.log((F.col("cq") + 1) / F.lit(nq))
        ).alias("log_ratio"),
    )


def dsir_weights(
    docs: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document DSIR importance weight: ``log_w = sum over the
    doc's hashed grams of log_ratio[bucket]`` (the log of the
    n-gram-LM likelihood ratio target/raw). High log_w = looks like
    the target domain. Emits ``(doc_id, n_grams, log_w)`` (log_w
    rounded 6dp); zero-gram docs emit nothing.

    100 TB shape: scoring joins the exploded grams against the
    BROADCAST n_buckets-row ratio table (map-side, no shuffle), then
    one partial-aggregated groupBy(doc_id). Two corpus scans total —
    inherent to DSIR (estimate, then score).
    """
    ratios = dsir_log_ratios(docs, target_pred, text_col, n_buckets)
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_ws_gram_buckets(text_col, n_buckets)).alias("bucket"),
    )
    return (
        grams.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.round(F.sum("log_ratio"), 6).alias("log_w"),
        )
    )


def dsir_sample(
    docs: DataFrame,
    target_pred,
    k: int = 100,
    seed: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Gumbel-top-k importance resampling over the DSIR weights: the
    paper's without-replacement sampler. key = log_w + Gumbel(u) with
    ``u = (first-8-hex of md5(seed || doc_id) + 0.5) / 2^32`` — RNG-
    free, so the selection is reproducible across engines and cluster
    sizes (same property as mixture_sample). Returns the k selected
    rows ``(doc_id, n_grams, log_w, gumbel_key)``.

    100 TB shape: the key is a narrow projection over the weights
    frame; selection is a TakeOrdered top-k (per-partition heaps, one
    k-row merge), never a global sort.
    """
    w = dsir_weights(docs, target_pred, id_col, text_col, n_buckets)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    key = F.round(F.col("log_w") + -F.log(-F.log(u)), 6)
    return (
        w.select("doc_id", "n_grams", "log_w", key.alias("gumbel_key"))
        .orderBy(F.desc("gumbel_key"), "doc_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Token-budget sampling
# ---------------------------------------------------------------------------

def sample_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    seed: str = "42",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select a deterministic pseudo-random subset of documents whose
    whitespace-token counts fill ``budget_tokens``: docs are ordered
    by md5(seed || id) (an RNG-free shuffle — same input, same sample,
    any cluster size) and a doc is kept iff the token mass BEFORE it
    in that order is still under the budget (so the budget is always
    reached, overshooting by at most one document). This is how a
    training run takes "exactly ~N tokens of X" from a larger corpus.
    Emits ``(doc_id, n_tokens)``.

    100 TB shape: a global cumulative sum is NOT a global window.
    Rows hash into 4096 key-prefix buckets; one small agg computes
    per-bucket token sums; the driver turns the (4096-row) bucket
    cumsum into broadcast offsets; the exact within-bucket cumsum is a
    window PARTITIONED BY bucket — one bounded shuffle, no
    single-partition stage, same answer as the sequential scan.
    """
    n_tok = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))).alias("key"),
    ).withColumn("bucket", F.substring("key", 1, 3))
    bsums = {
        r["bucket"]: r["s"]
        for r in keyed.groupBy("bucket").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(bsums):
        offsets[b] = acc
        acc += bsums[b]
    spark = docs.sparkSession
    off = spark.createDataFrame(
        [(b, int(o)) for b, o in offsets.items()], "bucket string, off long"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy("key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        keyed.join(F.broadcast(off), "bucket")
        .withColumn(
            "_cum_before",
            F.col("off") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .where(F.col("_cum_before") < F.lit(int(budget_tokens)))
        .select("doc_id", "n_tokens")
    )
