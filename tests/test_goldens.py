"""Golden-output isomorphism: the SPARK engine must reproduce the
committed oracle-generated goldens exactly (ranks) / at 1e-6 (scores)
— the analog of scripts/verify_isomorphism.sh over
tests/fixtures/golden_outputs/."""

from __future__ import annotations

import json
import os

import pytest

from xf_spark.index.builder import build_engine
from xf_spark.query.hybrid import hybrid_search
from xf_spark.query.semantic import build_embeddings, semantic_topk
from xf_spark.transcripts import load_transcripts

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures", "golden")
SCALE = 0.001
LEXICAL = {
    "lexical_machine": "machine",
    "lexical_rust": "rust",
    "phrase_ml": '"machine learning"',
    "bool_and": "rust AND async",
    "bool_not": "python NOT snake",
    "prefix": "progr*",
}


def _load(name):
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def built(spark):
    transcripts = load_transcripts(spark, SCALE)
    engine = build_engine(transcripts)
    embeddings = build_embeddings(engine.docs).cache()
    key = {
        r["doc_id"]: (r["conv_id"], r["turn_idx"], r["text"])
        for r in engine.docs.select("doc_id", "conv_id", "turn_idx", "text").collect()
    }
    return engine, embeddings, key


@pytest.mark.parametrize("name", sorted(LEXICAL), ids=sorted(LEXICAL))
def test_lexical_goldens(built, name):
    engine, _, key = built
    want = _load(name)
    got = engine.search(LEXICAL[name], limit=20).collect()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        conv, idx, text = key[g["doc_id"]]
        assert [conv, idx] == w["doc_id"], name
        assert abs(g["score"] - w["score"]) <= 1e-5, (name, g["doc_id"])
        assert text == w["text"], name  # per-turn text equality


def test_semantic_golden(built):
    engine, embeddings, key = built
    want = _load("semantic_stress")
    got = semantic_topk(embeddings, "stress", limit=20).collect()
    for g, w in zip(got, want):
        conv, idx, _ = key[g["doc_id"]]
        assert [conv, idx] == w["doc_id"]
        assert abs(g["score"] - w["score"]) <= 1e-4


def test_hybrid_golden(built):
    engine, embeddings, key = built
    want = _load("hybrid_rust")
    got = hybrid_search(engine, embeddings, "rust", limit=20).collect()
    for g, w in zip(got, want):
        conv, idx, _ = key[g["doc_id"]]
        assert [conv, idx] == w["doc_id"]
        assert abs(g["score"] - w["score"]) <= 1e-6
