"""Zipf-vocabulary fixture generator (round-5): determinism, vocabulary
uniqueness, schema parity with the transcripts table, and the head-term
skew the (term, shard) salted build key is exercised by."""

from __future__ import annotations

import numpy as np

from xf_spark.transcripts import (
    generate_transcripts_pdf,
    generate_zipf_transcripts_pdf,
    zipf_vocab,
)


def test_vocab_unique_and_shaped():
    v = zipf_vocab(120_000)
    assert len(v) == 120_000
    assert len(set(v)) == 120_000  # bijective base-syllable spelling
    lens = np.array([len(t) for t in v])
    assert lens.min() >= 2 and lens.max() <= 16
    # shared prefixes exist (the range-pruning regime): many terms
    # share the first syllable ("wex" = high-order digit 37, so its
    # 3-syllable block only materializes once vocab > 37*40^2)
    assert sum(1 for t in v if t.startswith("wex")) > 100


def test_deterministic():
    a = generate_zipf_transcripts_pdf(5_000, 50_000)
    b = generate_zipf_transcripts_pdf(5_000, 50_000)
    assert a.equals(b)


def test_schema_matches_transcripts_table():
    z = generate_zipf_transcripts_pdf(2_000, 20_000)
    t = generate_transcripts_pdf(0.001)
    assert list(z.columns) == list(t.columns)
    assert z["turn_idx"].dtype == t["turn_idx"].dtype
    assert str(z["ts"].dtype) == str(t["ts"].dtype)
    # per-conversation turn ordering invariant (input_hint)
    g = z.groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    assert g.apply(lambda s: (s.diff().dropna() == 1).all()).all()


def test_head_term_skew_and_tail_cardinality():
    z = generate_zipf_transcripts_pdf(10_000, 100_000)
    toks = z["text"].str.split().explode()
    counts = toks.value_counts()
    # Zipf head: rank-1 term carries >10% of all tokens
    assert counts.iloc[0] / len(toks) > 0.10
    # heavy tail: tens of thousands of distinct dictionary terms even
    # in a 10k-turn sample
    assert counts.size > 20_000
    # every token is a dictionary member
    vocab = set(zipf_vocab(100_000))
    assert set(counts.index[:1000]).issubset(vocab)
