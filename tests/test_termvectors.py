"""term_vectors: per-document term stats vs a pure-Python replay over
the shared tokenizer + the oracle's df/idf arithmetic; the contrib
column must equal what a single-term search scores that doc."""

from __future__ import annotations

import math

import pytest

from xf_spark.index.builder import build_engine
from xf_spark.index.segments import build_segment_index
from xf_spark.functions.textcore import tokenize
from xf_spark.oracle import OracleIndex
from xf_spark.query.segment_search import SegmentIndex
from xf_spark.query.termvectors import term_vectors
from xf_spark.transcripts import load_transcripts

SCALE = 0.001


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tvidx"))
    tr = load_transcripts(spark, SCALE)
    eng = build_engine(tr)
    build_segment_index(
        eng.postings, n_docs=eng.stats.n_docs, avgdl=eng.stats.avgdl,
        path=path, prefix_postings=eng.prefix_postings,
        n_shards=4, n_buckets=16, slices=2,
    )
    ix = SegmentIndex.load(spark, path, docs=eng.docs)
    rows = eng.docs.select("doc_id", "text").collect()
    oracle = OracleIndex.build([(r["doc_id"], r["text"]) for r in rows])
    texts = {r["doc_id"]: r["text"] for r in rows}
    return ix, oracle, texts


def test_matches_python_replay(built):
    ix, oracle, texts = built
    for doc_id in sorted(texts)[:5]:
        got = {
            r["term"]: (r["tf"], list(r["positions"]), r["df"],
                        round(r["idf"], 9), round(r["contrib"], 9))
            for r in term_vectors(ix, doc_id).collect()
        }
        toks = tokenize(texts[doc_id])
        dl = float(len(toks))
        for t in set(toks):
            plist = [i for i, w in enumerate(toks) if w == t]
            df = len(oracle.postings.get(t, {}))
            idf = math.log(1 + (oracle.n_docs - df + 0.5) / (df + 0.5))
            tf = float(len(plist))
            contrib = idf * tf * 2.2 / (
                tf + 1.2 * (0.25 + 0.75 * dl / oracle.avgdl)
            )
            assert got[t] == (
                len(plist), plist, df, round(idf, 9), round(contrib, 9)
            ), (doc_id, t)
        assert set(got) == set(toks)


def test_contrib_equals_single_term_search(built):
    """contrib for term t on doc d == the score a single-term search
    on t gives d (the column's defining contract)."""
    ix, oracle, texts = built
    doc_id = sorted(texts)[0]
    rows = term_vectors(ix, doc_id).collect()
    assert rows
    # ordered by contrib desc
    contribs = [r["contrib"] for r in rows]
    assert contribs == sorted(contribs, reverse=True)
    for r in rows[:3]:
        scored = dict(oracle.search(r["term"], limit=10**9))
        assert abs(scored[doc_id] - r["contrib"]) < 1e-9, r["term"]


def test_unknown_doc_raises(built):
    ix, _, _ = built
    with pytest.raises(KeyError):
        term_vectors(ix, 10**12)
