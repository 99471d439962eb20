"""Tantivy/Lucene fieldnorm quantization (opt-in norm table).

Tantivy stores each document's per-field token count ("fieldnorm") as
a single byte, using the exact scheme of Lucene's ``SmallFloat``
(``intToByte4``/``byte4ToInt``): values below 24 are exact; beyond
that, a 4-bit-mantissa floating representation over ``value - 24``.
The resulting 256-entry decode table is identity through 39, then
geometric (40, 42, 44, ... 54, 56, 60, ... — 8 steps per octave).
Reference: the Rust engine scores through this table (Tantivy 0.22
``fieldnorm/code.rs``, invoked from search.rs:579); this module is a
from-scratch reimplementation of the public Lucene algorithm.

The repo's default scoring pins EXACT doc lengths (SURVEY.md §7.0) —
this table is the opt-in ``norms="tantivy"`` path for byte-parity
work against Tantivy-scored fixtures.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

# Lucene SmallFloat: NUM_FREE_VALUES = 255 - longToInt4(Integer.MAX_VALUE)
_NUM_FREE = 24
_MANTISSA_BITS = 3  # stored bits; +1 implicit leading bit = 4-bit mantissa


def _long_to_int4(i: int) -> int:
    nb = i.bit_length()
    if nb < 4:
        return i  # subnormal
    shift = nb - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def _int4_to_long(e: int) -> int:
    bits = e & 0x07
    shift = (e >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def fieldnorm_to_id(fieldnorm: int) -> int:
    """Exact token count -> one-byte norm id (round-down)."""
    if fieldnorm < _NUM_FREE:
        return fieldnorm
    return min(255, _NUM_FREE + _long_to_int4(fieldnorm - _NUM_FREE))


def id_to_fieldnorm(norm_id: int) -> int:
    """One-byte norm id -> decoded token count."""
    if norm_id < _NUM_FREE:
        return norm_id
    return _NUM_FREE + _int4_to_long(norm_id - _NUM_FREE)


# The 256-entry decode table (FIELD_NORMS_TABLE analog).
FIELD_NORMS_TABLE: tuple[int, ...] = tuple(id_to_fieldnorm(i) for i in range(256))


def quantize_length(dl: int) -> int:
    """decode(encode(dl)) — the stored-then-read fieldnorm."""
    return id_to_fieldnorm(fieldnorm_to_id(dl))


def quantize_lengths(dls: np.ndarray) -> np.ndarray:
    """Vectorized decode(encode(.)) over an int array."""
    arr = np.asarray(dls, dtype=np.int64)
    out = arr.copy()
    big = arr >= _NUM_FREE
    if big.any():
        e = arr[big] - _NUM_FREE
        # bit_length via log2 on positives; e == 0 stays 0
        nb = np.zeros_like(e)
        pos = e > 0
        nb[pos] = np.floor(np.log2(e[pos])).astype(np.int64) + 1
        shift = np.maximum(0, nb - 4)
        # 4-significant-bit truncation: (e >> s) << s keeps the
        # implicit leading bit plus 3 stored bits; saturate at the
        # 255th table entry like the one-byte id does (the scalar
        # path's min(255, ...) — matters only for ~2e9-token docs)
        out[big] = np.minimum(
            _NUM_FREE + ((e >> shift) << shift), FIELD_NORMS_TABLE[-1]
        )
    return out


def quantize_col(dl: Column) -> Column:
    """The same quantization as a pure-Catalyst column expression
    (whole-stage codegen; no UDF): keeps scoring JVM-side when the
    engine runs with norms="tantivy"."""
    e = (dl - F.lit(_NUM_FREE)).cast("long")
    nb = F.floor(F.log2(e.cast("double"))).cast("long") + F.lit(1)
    shift = F.greatest(F.lit(0).cast("long"), nb - F.lit(4))
    # (e >> s) << s without a variable-shift builtin: clear the low
    # s bits via modulo with 2^s (s <= 59 here, pow stays exact)
    p = F.pow(F.lit(2.0), shift.cast("double")).cast("long")
    # saturate at the 255th table entry (the one-byte id ceiling)
    dec = F.least(
        F.lit(_NUM_FREE) + (e - e % p), F.lit(int(FIELD_NORMS_TABLE[-1]))
    )
    return F.when(dl < F.lit(_NUM_FREE), dl.cast("long")).otherwise(
        F.when(e <= F.lit(0), F.lit(_NUM_FREE).cast("long")).otherwise(dec)
    )
