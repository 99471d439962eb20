"""Deterministic synthetic transcripts table (seed 42).

Produces the BASELINE.json ``input_hint`` schema — an Iceberg-shaped
(locally parquet) table of multi-turn conversation/agent transcripts:

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp)

Mirrors the *shape* of the reference's deterministic perf corpus
(scripts/generate_perf_corpus.py, seed 42: english text pools with
rust/ML/search/coffee themes, unicode strings incl. CJK/RTL/emoji,
hashtags/mentions, plus markdown/code snippets and low-signal turns to
exercise the canonicalization pipeline, canonicalize.rs:64-79). Scale
0.01 lands near the reference corpus size (17,500 records,
corpus_manifest.json).

Generation is pure NumPy with a fixed seed: the same (scale) always
produces byte-identical rows, so goldens and N-vs-4N runs are stable.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42
BASE_TURNS = 1_750_000  # scale 1.0 => ~1.75M turns; 0.01 => 17,500
MEAN_TURNS_PER_CONV = 20  # xf DM corpus: 2,000 msgs / 100 convs
END_TS = pd.Timestamp("2026-01-01T12:00:00Z").value // 10**9  # unix secs
SPAN_SECONDS = 5 * 365 * 24 * 3600

# Text pools — same themes as generate_perf_corpus.py:37-67.
SENTENCES = [
    "Just finished implementing a new feature in Rust, the borrow checker is getting easier",
    "Machine learning models are fascinating when you understand the underlying mathematics",
    "The coffee this morning hits different when you have a productive coding session",
    "Debugging async code requires patience and a good understanding of the runtime",
    "Data visualization can reveal patterns that raw numbers completely hide from view",
    "Working on search algorithms today, BM25 ranking is surprisingly elegant",
    "The new language model performs well on reasoning tasks but struggles with arithmetic",
    "Vector embeddings capture semantic similarity in ways keyword matching never could",
    "Refactoring legacy code is like archaeology, every layer tells a story",
    "Performance optimization matters most when you measure before you change anything",
    "The compiler errors in Rust are actually helpful once you learn to read them",
    "Distributed systems fail in ways that single machines never prepare you for",
    "A good test suite is the best documentation a codebase can have",
    "Stress testing the indexing pipeline revealed a subtle race condition",
    "Programming languages are tools, pick the right one for the job at hand",
]
UNICODE_STRINGS = [
    "Unicode test: café naïve résumé — accents work fine \U0001f389",
    "日本語のテキストも検索できます",
    "النص العربي يعمل أيضا",
    "中文搜索测试内容",
    "Family: \U0001f468‍\U0001f469‍\U0001f467‍\U0001f466 emoji with ZWJ sequences",
]
HASHTAGS = ["#rustlang", "#MachineLearning", "#coding", "#opensource", "#DataScience"]
MENTIONS = ["@rustlang", "@github", "@openai"]
MARKDOWN_SNIPPETS = [
    "Here is **bold** and *italic* text with a [link](https://example.com) and `inline code`.",
    "## Heading\n\n- bullet one\n- bullet two\n\n> a blockquote line",
    "```python\nfor i in range(10):\n    print(i * i)\n```\nThat loop squares numbers.",
    "1. first step\n2. second step\n3. third step with #rustlang tag",
]
LOW_SIGNAL_TURNS = ["ok", "thanks", "lol", "nice", "+1", "yes", "done"]
TOOL_NAMES = [
    "bash", "python", "search_web", "read_file",
    "write_file", "sql_query", "fetch_url", "calculator",
]
TOOL_OUTPUT_TEMPLATES = [
    "Command exited with status {n}; wrote {m} lines to output",
    "Query returned {n} rows in {m} ms",
    "Fetched {n} bytes from endpoint, cache {m} hit ratio",
    "Found {n} matches across {m} files",
]


def _compose_texts(rng: np.random.Generator, n: int) -> list[str]:
    """Vector-ish text composition: choose a category per turn, then
    fill from pools. Categories mirror the reference corpus mix."""
    cat = rng.choice(
        ["sent", "sent2", "unicode", "tagged", "markdown", "low", "empty"],
        size=n,
        p=[0.42, 0.20, 0.06, 0.14, 0.10, 0.06, 0.02],
    )
    si = rng.integers(0, len(SENTENCES), size=(n, 2))
    ui = rng.integers(0, len(UNICODE_STRINGS), size=n)
    hi = rng.integers(0, len(HASHTAGS), size=n)
    mi = rng.integers(0, len(MENTIONS), size=n)
    mdi = rng.integers(0, len(MARKDOWN_SNIPPETS), size=n)
    li = rng.integers(0, len(LOW_SIGNAL_TURNS), size=n)
    out = []
    for i in range(n):
        c = cat[i]
        if c == "sent":
            out.append(SENTENCES[si[i, 0]])
        elif c == "sent2":
            out.append(SENTENCES[si[i, 0]] + ". " + SENTENCES[si[i, 1]])
        elif c == "unicode":
            out.append(UNICODE_STRINGS[ui[i]])
        elif c == "tagged":
            out.append(f"{SENTENCES[si[i, 0]]} {HASHTAGS[hi[i]]} {MENTIONS[mi[i]]}")
        elif c == "markdown":
            out.append(MARKDOWN_SNIPPETS[mdi[i]])
        elif c == "low":
            out.append(LOW_SIGNAL_TURNS[li[i]])
        else:
            out.append("")
    return out


def generate_transcripts_pdf(scale: float = 0.001, seed: int = SEED) -> pd.DataFrame:
    """Generate the transcripts table as a pandas DataFrame."""
    rng = np.random.default_rng(seed)
    target_turns = max(10, int(round(BASE_TURNS * scale)))
    n_convs = max(2, int(round(target_turns / MEAN_TURNS_PER_CONV)))

    # turns per conversation: 2..40, geometric-ish (mean ~= 20)
    lens = 2 + np.minimum(rng.geometric(1.0 / (MEAN_TURNS_PER_CONV - 2), size=n_convs), 38)
    n = int(lens.sum())

    conv_ord = np.repeat(np.arange(n_convs), lens)
    conv_ids = np.array(
        [f"conv{5_000_000_000_000 + i:013d}" for i in range(n_convs)], dtype=object
    )
    starts = np.zeros(n_convs, dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    turn_idx = np.arange(n, dtype=np.int64) - starts[conv_ord]

    # roles: alternate user/assistant, ~10% of turns become tool turns
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_mask = rng.random(n) < 0.10
    role[tool_mask] = "tool"

    tool = np.full(n, "", dtype=object)
    tool_picks = rng.integers(0, len(TOOL_NAMES), size=n)
    tool[tool_mask] = np.array(TOOL_NAMES, dtype=object)[tool_picks[tool_mask]]

    texts = np.array(_compose_texts(rng, n), dtype=object)
    # tool turns get structured tool-output text instead
    ti = rng.integers(0, len(TOOL_OUTPUT_TEMPLATES), size=n)
    tn = rng.integers(0, 500, size=n)
    tm = rng.integers(0, 100, size=n)
    tool_rows = np.nonzero(tool_mask)[0]
    for i in tool_rows:
        texts[i] = TOOL_OUTPUT_TEMPLATES[ti[i]].format(n=int(tn[i]), m=int(tm[i]))

    # timestamps: conversation start uniform over the 5y span, turns
    # strictly increasing with 1..600s gaps
    conv_start = rng.integers(END_TS - SPAN_SECONDS, END_TS - 24 * 3600, size=n_convs)
    gaps = rng.integers(1, 600, size=n)
    gap_cum = np.cumsum(gaps)
    ts = conv_start[conv_ord] + gap_cum - gap_cum[starts[conv_ord]] + gaps[starts[conv_ord]]

    return pd.DataFrame(
        {
            "conv_id": conv_ids[conv_ord],
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": pd.to_datetime(ts, unit="s"),
        }
    )


ZIPF_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
    "na", "pe", "qi", "ro", "su", "ta", "ve", "wi", "xo", "yu",
    "zan", "ber", "cil", "dor", "fen", "gam", "hol", "jin", "kur", "lem",
    "mon", "nep", "quil", "rost", "sarn", "tev", "vash", "wex", "yor", "zub",
]


def zipf_vocab(vocab_size: int) -> np.ndarray:
    """Deterministic vocabulary of exactly ``vocab_size`` DISTINCT
    terms with a realistic shape: each term is the syllable spelling of
    its index in base len(ZIPF_SYLLABLES) (bijective, so unique by
    construction), which yields 2-8-char terms sharing long prefixes —
    the regime where the sorted vocab artifact's range pruning matters
    and a hash-bucketed segments scan does not."""
    base = len(ZIPF_SYLLABLES)
    syl = np.array(ZIPF_SYLLABLES, dtype=object)
    idx = np.arange(vocab_size, dtype=np.int64)
    terms = syl[idx % base].copy()
    rest = idx // base
    while (rest > 0).any():
        mask = rest > 0
        terms[mask] = syl[rest[mask] % base] + terms[mask]
        rest = rest // base
    return terms


def generate_zipf_transcripts_pdf(
    n_turns: int = 200_000,
    vocab_size: int = 120_000,
    seed: int = SEED,
    zipf_a: float = 1.2,
    mean_tokens: int = 24,
) -> pd.DataFrame:
    """High-cardinality-vocabulary variant of the transcripts table
    (same schema). The seed-42 english corpus has only ~711 distinct
    terms, so the vocab artifact, wildcard/fuzzy expansion caps, and
    head-term build salting are exercised in a toy regime there; this
    table draws every token from a ``vocab_size``-term dictionary under
    a Zipf(``zipf_a``) rank distribution — a heavy head (the rank-1
    term appears in a large fraction of turns: real head-term skew for
    the (term, shard) salted build key) and a ~100k-term tail (real
    dictionary-scan asymptotics for multiterm expansion)."""
    rng = np.random.default_rng(seed)
    vocab = zipf_vocab(vocab_size)

    n_convs = max(2, n_turns // MEAN_TURNS_PER_CONV)
    lens = 2 + np.minimum(
        rng.geometric(1.0 / (MEAN_TURNS_PER_CONV - 2), size=n_convs), 38
    )
    n = int(lens.sum())

    conv_ord = np.repeat(np.arange(n_convs), lens)
    conv_ids = np.array(
        [f"zipf{7_000_000_000_000 + i:013d}" for i in range(n_convs)],
        dtype=object,
    )
    starts = np.zeros(n_convs, dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    turn_idx = np.arange(n, dtype=np.int64) - starts[conv_ord]

    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)

    # token ranks: numpy Zipf is unbounded — resample the overflow tail
    # into the in-vocab range (uniform over the tail half) so every
    # token is a dictionary member and the head keeps its Zipf mass
    tokens_per_turn = 4 + np.minimum(
        rng.geometric(1.0 / (mean_tokens - 4), size=n), 120
    )
    total = int(tokens_per_turn.sum())
    ranks = rng.zipf(zipf_a, size=total)
    over = ranks > vocab_size
    n_over = int(over.sum())
    if n_over:
        ranks[over] = rng.integers(vocab_size // 2, vocab_size, size=n_over) + 1
    words = vocab[ranks - 1]
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tokens_per_turn, out=bounds[1:])
    texts = np.array(
        [" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(n)],
        dtype=object,
    )

    conv_start = rng.integers(END_TS - SPAN_SECONDS, END_TS - 24 * 3600, size=n_convs)
    gaps = rng.integers(1, 600, size=n)
    gap_cum = np.cumsum(gaps)
    ts = conv_start[conv_ord] + gap_cum - gap_cum[starts[conv_ord]] + gaps[starts[conv_ord]]

    return pd.DataFrame(
        {
            "conv_id": conv_ids[conv_ord],
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": texts,
            "tool": np.full(n, "", dtype=object),
            "ts": pd.to_datetime(ts, unit="s"),
        }
    )


def ensure_zipf_parquet(
    n_turns: int = 200_000,
    vocab_size: int = 120_000,
    root: str | None = None,
) -> str:
    """Materialize (once) the zipf-vocabulary table; return path."""
    base = os.path.dirname(transcripts_parquet_path(1.0, root))
    path = os.path.join(
        base, f"zipf_transcripts_{n_turns}t_{vocab_size}v.parquet"
    )
    if not os.path.exists(path):
        pdf = generate_zipf_transcripts_pdf(n_turns, vocab_size)
        os.makedirs(base, exist_ok=True)
        tmp = path + ".tmp"
        pdf.to_parquet(
            tmp,
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
            row_group_size=16384,
        )
        os.replace(tmp, path)
    return path


def transcripts_parquet_path(scale: float, root: str | None = None) -> str:
    if root is None:
        root = os.environ.get("XF_SPARK_FIXTURES_DIR")
    if root is None:
        # repo checkout: fixtures/ next to the package; when deployed as
        # a --py-files zip, __file__ is inside the archive — fall back
        # to a per-user tmp dir (fixtures are deterministic, seed 42,
        # so any materialization location yields identical bytes)
        candidate = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")
        parent = os.path.dirname(candidate)
        root = candidate if os.path.isdir(parent) else "/tmp/xf_spark_fixtures"
    return os.path.join(root, f"transcripts_sf{scale}.parquet")


def ensure_transcripts_parquet(scale: float, root: str | None = None) -> str:
    """Materialize (once) the deterministic table as parquet; return path."""
    path = transcripts_parquet_path(scale, root)
    if not os.path.exists(path):
        pdf = generate_transcripts_pdf(scale)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        # microsecond timestamps: Spark rejects parquet TIMESTAMP(NANOS);
        # small row groups: Spark parallelizes a single file only at
        # row-group boundaries — one big row group = a serial scan
        pdf.to_parquet(
            tmp,
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
            row_group_size=16384,
        )
        os.replace(tmp, path)  # atomic, mirrors vector.rs:267-393 tmp-rename
    return path


def load_transcripts(spark, scale: float = 0.001, root: str | None = None):
    """Load the deterministic transcripts table as a Spark DataFrame."""
    return spark.read.parquet(ensure_transcripts_parquet(scale, root))
