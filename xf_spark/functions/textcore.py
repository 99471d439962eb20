"""Text-analysis cores with Tantivy-parity semantics.

These pure-Python functions are the single source of truth for
tokenization semantics: the Spark pandas UDFs (``xf_spark.functions.
udfs``), the NumPy oracle (``xf_spark.oracle``), and the tests all call
the same code, so the engine cannot drift from its oracle.

Pinned semantics (public Tantivy 0.22 "default" tokenizer chain,
selected by the reference at search.rs:223, plus the reference's own
prefix generator at search.rs:1103-1134 and canonicalization pipeline
at canonicalize.rs:64-79):

- tokenize: split on any non-alphanumeric char (Unicode-aware), drop
  raw tokens whose UTF-8 encoding is >= 40 bytes (RemoveLongFilter
  runs BEFORE lowercasing), lowercase. No stemming, no stop words.
- prefixes: for each word of the ORIGINAL text (split on
  non-alphanumeric, >= 2 chars, first 100 words, lowercased), emit all
  character prefixes of length 2..=min(15, len(word)).
- canonicalize: NFC normalize -> strip markdown -> collapse long code
  blocks to 20 head + 10 tail lines -> collapse whitespace -> drop
  low-signal strings -> truncate to 2000 chars.
"""

from __future__ import annotations

import re
import unicodedata

# Python ``\w`` = Unicode letters + digits + underscore; subtracting the
# underscore leaves Unicode alphanumerics — the same split class as
# Rust's ``char::is_alphanumeric`` used by Tantivy's SimpleTokenizer.
_SPLIT_RE = re.compile(r"[\W_]+", re.UNICODE)

MAX_TOKEN_BYTES = 40  # RemoveLongFilter(40): tokens >= 40 bytes dropped
PREFIX_MIN_WORD = 2
PREFIX_MAX_LEN = 15
PREFIX_MAX_WORDS = 100


def split_words(text: str) -> list[str]:
    """Split on non-alphanumeric runs; no casing, no length filter."""
    return [w for w in _SPLIT_RE.split(text) if w]


def tokenize(text: str) -> list[str]:
    """Tantivy "default" chain: split -> RemoveLong(40 bytes) -> lower."""
    if not text:
        return []
    out = []
    for w in _SPLIT_RE.split(text):
        if w and len(w.encode("utf-8")) < MAX_TOKEN_BYTES:
            out.append(w.lower())
    return out


def generate_prefixes(text: str) -> list[str]:
    """Edge n-grams per the reference's generate_prefixes
    (search.rs:1103-1134): first 100 words, words >= 2 chars, all
    lowercase char-prefixes of length 2..=min(15, len)."""
    if not text:
        return []
    out: list[str] = []
    words = 0
    for w in _SPLIT_RE.split(text):
        if len(w) < PREFIX_MIN_WORD:
            continue
        words += 1
        if words > PREFIX_MAX_WORDS:
            break
        lw = w.lower()
        for plen in range(2, min(PREFIX_MAX_LEN, len(lw)) + 1):
            out.append(lw[:plen])
    return out


# ---------------------------------------------------------------------------
# Canonicalization pipeline (reference: canonicalize.rs:64-79)
# ---------------------------------------------------------------------------

# Low-signal strings dropped entirely (canonicalize.rs:38-57).
LOW_SIGNAL = {
    "ok", "okay", "thanks", "thank you", "yes", "no", "yep", "nope",
    "lol", "lmao", "nice", "cool", "great", "awesome", "sure", "done",
    "+1", "this", "same", "agreed", "exactly",
}

CODE_HEAD_LINES = 20
CODE_TAIL_LINES = 10
CANON_MAX_CHARS = 2000

_CODE_BLOCK_RE = re.compile(r"```.*?```", re.DOTALL)
_MD_PATTERNS = [
    (re.compile(r"!\[([^\]]*)\]\([^)]*\)"), r"\1"),   # images
    (re.compile(r"\[([^\]]*)\]\([^)]*\)"), r"\1"),    # links
    (re.compile(r"(\*\*|__)(.*?)\1", re.DOTALL), r"\2"),  # bold
    (re.compile(r"(\*|_)(.*?)\1", re.DOTALL), r"\2"),     # italic
    (re.compile(r"`([^`]*)`"), r"\1"),                 # inline code
    (re.compile(r"^#{1,6}\s+", re.MULTILINE), ""),     # headers
    (re.compile(r"^>\s?", re.MULTILINE), ""),          # blockquotes
    (re.compile(r"^\s*[-*+]\s+", re.MULTILINE), ""),   # bullet lists
    (re.compile(r"^\s*\d+\.\s+", re.MULTILINE), ""),   # numbered lists
]
_WS_RE = re.compile(r"\s+")


def _collapse_code_block(match: re.Match) -> str:
    body = match.group(0).strip("`").strip("\n")
    lines = body.split("\n")
    if len(lines) <= CODE_HEAD_LINES + CODE_TAIL_LINES:
        return body
    return "\n".join(lines[:CODE_HEAD_LINES] + ["..."] + lines[-CODE_TAIL_LINES:])


# every char that can TRIGGER one of _MD_PATTERNS must be here, or the
# fast path and the full chain canonicalize the same structure
# differently ('+' bullets were missing — embedding divergence)
_MD_CHARS = set("*_`#>[]!-+0123456789")


def canonicalize_for_embedding(text: str) -> str:
    """NFC -> collapse code blocks (20 head + 10 tail) -> strip markdown
    -> collapse whitespace -> drop low-signal -> truncate 2000 chars.
    Returns "" for dropped (low-signal / empty) inputs."""
    if not text:
        return ""
    s = unicodedata.normalize("NFC", text)
    # fast path: the 10-regex markdown chain only runs when markdown
    # trigger characters are present (hot loop: most turns are plain)
    if any(c in _MD_CHARS for c in s):
        s = _CODE_BLOCK_RE.sub(_collapse_code_block, s)
        for pat, repl in _MD_PATTERNS:
            s = pat.sub(repl, s)
    s = _WS_RE.sub(" ", s).strip()
    if s.lower() in LOW_SIGNAL:
        return ""
    return s[:CANON_MAX_CHARS]
