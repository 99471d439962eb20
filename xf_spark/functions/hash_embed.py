"""FNV-1a hash embedder — deterministic 384-dim text embeddings.

Parity with the reference's hash_embedder.rs:69-131 (pinned in
FIXTURES.md §4): per token, ``h = fnv1a64(token_utf8)``; dimension
index ``h % 384``; sign from bit 63 — MSB set => -1.0, cleared =>
+1.0, matching the reference; accumulate over tokens; L2-normalize.
Empty token list -> uniform normalized vector (every component
1/sqrt(384)).

Embedding tokenizer (hash_embedder.rs:79-85): lowercase, split on
non-alphanumeric, keep tokens whose UTF-8 encoding is >= 2 BYTES
(byte length, not characters: a single 3-byte CJK character is kept,
matching the reference's ``token.len() >= 2`` over &str bytes).
"""

from __future__ import annotations

import numpy as np

from xf_spark.functions.textcore import _SPLIT_RE

DIM = 384


def embed_tokens(text: str) -> list[str]:
    """Embedding tokenizer: lowercase, split non-alnum, UTF-8 byte
    length >= 2 (Rust ``str::len`` counts bytes — a 1-char CJK token
    is 3 bytes and must be embedded; only 1-byte ASCII singles drop)."""
    if not text:
        return []
    return [
        t
        for t in _SPLIT_RE.split(text.lower())
        if len(t) >= 2 or (t and len(t.encode("utf-8")) >= 2)
    ]


def fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _token_idx_sign(token: str, _cache: dict = {}) -> tuple[int, float]:
    """Memoized token -> (dim index, sign). The token vocabulary is
    Zipfian, so a process-wide cache turns the per-byte FNV loop into a
    dict hit on the hot path (same idea as the reference's content-hash
    embedding reuse, lib.rs:334-346)."""
    hit = _cache.get(token)
    if hit is None:
        h = fnv1a64(token.encode("utf-8"))
        hit = (int(h % DIM), -1.0 if (h >> 63) & 1 else 1.0)
        if len(_cache) < 2_000_000:
            _cache[token] = hit
    return hit


def hash_embed(text: str) -> np.ndarray:
    """Embed one string -> float32[384], L2-normalized."""
    vec = np.zeros(DIM, dtype=np.float64)
    for t in embed_tokens(text):
        idx, sign = _token_idx_sign(t)
        vec[idx] += sign
    norm = float(np.linalg.norm(vec))
    if norm == 0.0:
        # empty-token fallback: uniform normalized vector
        vec[:] = 1.0
        norm = float(np.linalg.norm(vec))
    return (vec / norm).astype(np.float32)


def hash_embed_batch(texts: list[str]) -> np.ndarray:
    """Vectorized batch embed -> float32[n, 384].

    One np.add.at scatter for the whole batch (token -> (idx, sign)
    memoized), one vectorized normalize — identical output to
    hash_embed per row (tested), ~10x faster than row-at-a-time."""
    n = len(texts)
    out = np.zeros((n, DIM), dtype=np.float64)
    rows: list[int] = []
    cols: list[int] = []
    signs: list[float] = []
    for i, t in enumerate(texts):
        for tok in embed_tokens(t or ""):
            idx, sign = _token_idx_sign(tok)
            rows.append(i)
            cols.append(idx)
            signs.append(sign)
    if rows:
        np.add.at(
            out,
            (np.asarray(rows, dtype=np.int64), np.asarray(cols, dtype=np.int64)),
            np.asarray(signs, dtype=np.float64),
        )
    norms = np.linalg.norm(out, axis=1)
    empty = norms == 0.0
    if empty.any():
        out[empty] = 1.0  # uniform fallback
        norms[empty] = np.sqrt(DIM)
    return (out / norms[:, None]).astype(np.float32)
