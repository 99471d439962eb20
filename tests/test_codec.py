"""Round-trip + property tests for the delta+varint posting codec."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xf_spark.index.codec import (
    decode_doc_ids,
    decode_positions,
    decode_tfs,
    encode_doc_ids,
    encode_positions,
    encode_tfs,
    varint_decode,
    varint_encode,
)


class TestVarint:
    def test_empty(self):
        assert varint_encode(np.array([], dtype=np.uint64)) == b""
        assert len(varint_decode(b"")) == 0

    def test_known_encodings(self):
        assert varint_encode(np.array([0])) == b"\x00"
        assert varint_encode(np.array([127])) == b"\x7f"
        assert varint_encode(np.array([128])) == b"\x80\x01"
        assert varint_encode(np.array([300])) == b"\xac\x02"

    def test_roundtrip_boundaries(self):
        vals = np.array(
            [0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**63, 2**64 - 1],
            dtype=np.uint64,
        )
        got = varint_decode(varint_encode(vals))
        assert np.array_equal(got, vals)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
    def test_roundtrip_property(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        assert np.array_equal(varint_decode(varint_encode(arr)), arr)


class TestDocIds:
    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=10**12), min_size=1, max_size=300, unique=True
        )
    )
    def test_roundtrip_property(self, ids):
        arr = np.array(sorted(ids), dtype=np.int64)
        assert np.array_equal(decode_doc_ids(encode_doc_ids(arr)), arr)

    def test_compression_wins(self):
        # dense ids compress ~8x vs raw int64
        ids = np.arange(10_000, dtype=np.int64) + 5_000_000
        enc = encode_doc_ids(ids)
        assert len(enc) < 10_000 * 2  # mostly 1-byte gaps + header


class TestTfsPositions:
    def test_tfs_roundtrip(self):
        tfs = np.array([1, 2, 1, 300, 5], dtype=np.int64)
        assert np.array_equal(decode_tfs(encode_tfs(tfs)), tfs)

    def test_positions_roundtrip(self):
        lists = [[0, 3, 9], [5], [], [1, 2, 3, 4], [100000]]
        got = decode_positions(encode_positions(lists), len(lists))
        assert [list(g) for g in got] == lists

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=10000), max_size=30, unique=True
            ).map(sorted),
            max_size=20,
        )
    )
    def test_positions_property(self, lists):
        got = decode_positions(encode_positions(lists), len(lists))
        assert [list(g) for g in got] == [list(l) for l in lists]


class TestSplitPositionsBytes:
    """Byte-level doc-boundary splitting used by index compaction:
    fragments must concatenate back to the original stream AND each
    fragment must decode to exactly its doc sub-range."""

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=100000), max_size=20, unique=True
            ).map(sorted),
            min_size=1,
            max_size=25,
        ),
        st.data(),
    )
    def test_split_property(self, lists, data):
        from xf_spark.index.codec import split_positions_bytes

        enc = encode_positions(lists)
        n = len(lists)
        n_cuts = data.draw(st.integers(min_value=0, max_value=4))
        inner = sorted(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=n),
                    min_size=n_cuts,
                    max_size=n_cuts,
                )
            )
        )
        cuts = [0] + inner + [n]
        frags = split_positions_bytes(enc, n, cuts)
        assert b"".join(frags) == enc
        for i in range(len(cuts) - 1):
            lo, hi = cuts[i], cuts[i + 1]
            got = decode_positions(frags[i], hi - lo)
            assert [list(g) for g in got] == [list(l) for l in lists[lo:hi]]

    def test_empty_stream(self):
        from xf_spark.index.codec import split_positions_bytes

        assert split_positions_bytes(b"", 0, [0, 0]) == [b""]
        assert split_positions_bytes(b"", 5, [0, 2, 5]) == [b"", b""]
