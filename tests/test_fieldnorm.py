"""Lucene SmallFloat fieldnorm table (functions/fieldnorm.py) and the
opt-in norms="tantivy" engine path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xf_spark.functions.fieldnorm import (
    FIELD_NORMS_TABLE,
    fieldnorm_to_id,
    id_to_fieldnorm,
    quantize_col,
    quantize_length,
    quantize_lengths,
)


def test_table_shape():
    assert len(FIELD_NORMS_TABLE) == 256
    # identity through 39, then the geometric tail (Lucene byte4)
    assert FIELD_NORMS_TABLE[:41] == tuple(range(40)) + (40,)
    assert FIELD_NORMS_TABLE[41:49] == (42, 44, 46, 48, 50, 52, 54, 56)
    # strictly increasing
    assert all(a < b for a, b in zip(FIELD_NORMS_TABLE, FIELD_NORMS_TABLE[1:]))


def test_roundtrip_idempotent_and_floor():
    for d in list(range(0, 3000)) + [10**6, 10**9]:
        q = quantize_length(d)
        # round-down to a representable value, idempotent
        assert q <= d
        assert quantize_length(q) == q
        assert id_to_fieldnorm(fieldnorm_to_id(d)) == q
    # exact on every table entry
    for v in FIELD_NORMS_TABLE:
        assert quantize_length(v) == v


def test_vectorized_matches_scalar():
    xs = np.arange(0, 200_000)
    v = quantize_lengths(xs)
    assert v[0] == 0 and v[39] == 39 and v[41] == 40
    idx = np.random.RandomState(7).randint(0, 200_000, size=500)
    for i in idx:
        assert v[i] == quantize_length(int(i))
    # one-byte-id saturation: both paths clamp at the 255th entry
    big = np.array([10**12, 2**40, FIELD_NORMS_TABLE[-1] + 1])
    assert list(quantize_lengths(big)) == [
        quantize_length(int(x)) for x in big
    ] == [FIELD_NORMS_TABLE[-1]] * 3


def test_quantize_col_matches_scalar(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("dl"))
    rows = df.select("dl", quantize_col(F.col("dl")).alias("q")).collect()
    assert all(r["q"] == quantize_length(r["dl"]) for r in rows)


def test_engine_norms_tantivy_quantizes_scores(spark):
    """norms="tantivy" changes scores exactly as quantized dl does:
    docs over the identity range (dl < 40 here vs a long doc)."""
    from xf_spark.index.postings import build_postings, corpus_stats
    from xf_spark.query.bm25 import K1, B, BM25Engine, idf_for

    rows = [
        (0, "alpha " + "filler " * 2),             # short: dl identity
        (1, "alpha " + "pad%d " % 0 * 1),
        (2, "alpha " + " ".join(f"w{i}" for i in range(60))),  # dl 61 -> 60
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_postings(docs, with_positions=False)
    stats = corpus_stats(docs)
    exact = {
        r["doc_id"]: r["score"]
        for r in BM25Engine(docs=docs, postings=postings, stats=stats)
        .search("alpha", limit=10).collect()
    }
    quant = {
        r["doc_id"]: r["score"]
        for r in BM25Engine(
            docs=docs, postings=postings, stats=stats, norms="tantivy"
        ).search("alpha", limit=10).collect()
    }
    # short docs (dl < 40): identical; long doc: quantized dl 61 -> 60
    assert quant[0] == pytest.approx(exact[0], rel=1e-12)
    assert quant[1] == pytest.approx(exact[1], rel=1e-12)
    idf = idf_for(stats.n_docs, 3)
    dl = 61
    want_exact = idf * 1 * (K1 + 1) / (1 + K1 * (1 - B + B * dl / stats.avgdl))
    want_quant = idf * 1 * (K1 + 1) / (1 + K1 * (1 - B + B * 60 / stats.avgdl))
    assert exact[2] == pytest.approx(want_exact, rel=1e-9)
    assert quant[2] == pytest.approx(want_quant, rel=1e-9)
    assert quant[2] > exact[2]


def test_tantivy_query_topk_matches_pure_python(spark):
    """Two-field f32 scoring isomorphism: engine vs a from-scratch
    pure-Python replay (tokenize + prefixes + SmallFloat + f32) on a
    synthetic corpus, single- and multi-term."""
    from xf_spark.functions.textcore import generate_prefixes, tokenize
    from xf_spark.index.builder import build_engine
    from xf_spark.query.tantivy_parity import tantivy_query_topk

    texts = [
        "alpha beta gamma delta",
        "alpha alpha beta " + " ".join(f"w{i}" for i in range(40)),
        "alphabet soup beta",          # 'alphabet' prefix-matches 'alpha'
        "gamma delta epsilon",
        "alpha " + "x " * 60,
        "beta beta beta alphabetical", # prefix leg via 'alphabetical'
    ]
    rows = [
        (f"c{i}", 0, "user", t, "", None) for i, t in enumerate(texts)
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    eng = build_engine(tr)
    # map doc_id -> text via the engine's own doc store
    id_text = {r["doc_id"]: r["text"] for r in eng.docs.collect()}

    f32 = np.float32
    n = len(texts)
    toks = {d: tokenize(t) for d, t in id_text.items()}
    prefs = {d: generate_prefixes(t) for d, t in id_text.items()}
    tot_t = sum(len(v) for v in toks.values())
    tot_p = sum(len(v) for v in prefs.values())

    def leg(tf, fn, df, tot):
        x = (f32(n - df) + f32(0.5)) / (f32(df) + f32(0.5))
        idf = f32(np.log1p(f32(x)))
        avg = f32(tot) / f32(n)
        norm = f32(1.2) * (f32(0.25) + f32(0.75) * f32(quantize_length(fn)) / avg)
        return (idf * f32(2.2)) * (f32(tf) / (f32(tf) + norm))

    def expected(terms):
        uniq = list(dict.fromkeys(terms))
        out = {}
        for d in id_text:
            acc = f32(0.0)
            for t in uniq:
                df_t = sum(1 for v in toks.values() if t in v)
                df_p = sum(1 for v in prefs.values() if t in v)
                tf = toks[d].count(t)
                if tf and df_t:
                    acc = f32(acc + leg(tf, len(toks[d]), df_t, tot_t))
                if t in prefs[d] and df_p:
                    acc = f32(acc + leg(1, len(prefs[d]), df_p, tot_p))
            if acc > 0:
                out[d] = float(acc)
        return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))

    for terms in (["alpha"], ["alpha", "beta"], ["gamma", "alpha", "zzz"]):
        got = [
            (r["doc_id"], r["score"])
            for r in tantivy_query_topk(eng, terms, limit=10).collect()
        ]
        want = expected(terms)[:10]
        assert got == want, (terms, got, want)
