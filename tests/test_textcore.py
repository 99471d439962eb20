"""Unit fixtures pinned in FIXTURES.md §4 (tokenizer / prefixes /
canonicalize / hash embedder), mirroring the reference's unit tests
(search.rs:1179-1246, hash_embedder.rs:146-305, canonicalize.rs:322+)."""

from __future__ import annotations

import numpy as np

from xf_spark.functions.hash_embed import (
    DIM,
    embed_tokens,
    fnv1a64,
    hash_embed,
)
from xf_spark.functions.textcore import (
    canonicalize_for_embedding,
    generate_prefixes,
    tokenize,
)


class TestTokenize:
    def test_basic_lower_split(self):
        assert tokenize("Hello, World! Rust-lang") == ["hello", "world", "rust", "lang"]

    def test_empty_and_punct(self):
        assert tokenize("") == []
        assert tokenize("!!! --- ...") == []

    def test_numbers_kept(self):
        assert tokenize("py3 2024 v1.2.3") == ["py3", "2024", "v1", "2", "3"]

    def test_long_token_dropped_40_bytes(self):
        tok39 = "a" * 39
        tok40 = "a" * 40
        assert tokenize(f"{tok39} {tok40} ok") == [tok39, "ok"]

    def test_long_token_bytes_not_chars(self):
        # 14 CJK chars = 42 utf-8 bytes -> dropped; 13 = 39 bytes -> kept
        keep = "日" * 13
        drop = "日" * 14
        assert tokenize(f"{keep} {drop}") == [keep]

    def test_unicode_alnum(self):
        assert tokenize("café naïve") == ["café", "naïve"]
        assert tokenize("日本語のテキスト") == ["日本語のテキスト"]

    def test_underscore_splits(self):
        # underscore is NOT alphanumeric (Rust char::is_alphanumeric)
        assert tokenize("snake_case") == ["snake", "case"]


class TestPrefixes:
    def test_hello_world_fixture(self):
        # search.rs:1180-1201 fixture
        got = generate_prefixes("hello,world")
        assert got == [
            "he", "hel", "hell", "hello",
            "wo", "wor", "worl", "world",
        ]

    def test_15_char_cap(self):
        # search.rs:1222-1229: supercalifragilisticexpialidocious capped at 15
        got = generate_prefixes("supercalifragilisticexpialidocious")
        assert got[0] == "su"
        assert got[-1] == "supercalifragil"
        assert len(got[-1]) == 15
        assert len(got) == 14  # lengths 2..15

    def test_short_words_skipped(self):
        assert generate_prefixes("a I ok") == ["ok"]

    def test_first_100_words_only(self):
        text = " ".join(f"word{i:03d}" for i in range(150))
        got = generate_prefixes(text)
        # 100 words x prefixes(7-char word: len 2..7 = 6 each)
        assert len(got) == 100 * 6
        assert "word099"[:2] in got
        assert not any(g.startswith("word100") for g in got)

    def test_lowercased(self):
        assert generate_prefixes("HELLO") == ["he", "hel", "hell", "hello"]


class TestCanonicalize:
    def test_nfc_composed_decomposed_equal(self):
        composed = "café"
        decomposed = "café"
        assert canonicalize_for_embedding(composed) == canonicalize_for_embedding(
            decomposed
        )

    def test_markdown_stripped(self):
        s = "Here is **bold** and *italic* and a [link](https://x.com) and `code`."
        out = canonicalize_for_embedding(s)
        assert "**" not in out and "](" not in out and "`" not in out
        assert "bold" in out and "link" in out

    def test_low_signal_dropped(self):
        assert canonicalize_for_embedding("ok") == ""
        assert canonicalize_for_embedding("Thanks") == ""
        assert canonicalize_for_embedding("+1") == ""

    def test_truncation_2000(self):
        assert len(canonicalize_for_embedding("x" * 5000)) == 2000

    def test_code_block_collapse_20_10(self):
        lines = "\n".join(f"line{i}" for i in range(50))
        out = canonicalize_for_embedding(f"```\n{lines}\n```")
        assert "line0" in out and "line19" in out
        assert "line25" not in out
        assert "line40" in out and "line49" in out
        assert "..." in out

    def test_whitespace_collapsed(self):
        assert canonicalize_for_embedding("a\n\n  b\t c") == "a b c"


class TestHashEmbedder:
    def test_fnv1a_known_vectors(self):
        # public FNV-1a 64 test vectors
        assert fnv1a64(b"") == 0xCBF29CE484222325
        assert fnv1a64(b"a") == 0xAF63DC4C8601EC8C
        assert fnv1a64(b"foobar") == 0x85944171F73967E8

    def test_deterministic(self):
        v1 = hash_embed("rust programming language")
        v2 = hash_embed("rust programming language")
        assert np.array_equal(v1, v2)

    def test_dim_and_norm(self):
        v = hash_embed("hello world")
        assert v.shape == (DIM,)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5

    def test_case_insensitive(self):
        assert np.array_equal(hash_embed("Rust Lang"), hash_embed("rust lang"))

    def test_empty_fallback_uniform(self):
        v = hash_embed("")
        assert np.allclose(v, v[0])
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5

    def test_embed_tokens_min_len_2(self):
        assert embed_tokens("a bc d ef") == ["bc", "ef"]

    def test_embed_tokens_byte_length_keeps_cjk_singles(self):
        # reference filters on UTF-8 BYTE length: a single CJK char is
        # 3 bytes and embeds; a single ASCII char (1 byte) drops
        assert embed_tokens("机 x 器") == ["机", "器"]

    def test_unicode(self):
        v = hash_embed("日本語 テキスト")
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
