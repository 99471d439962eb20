"""f16-at-rest embeddings (vector.rs:312 analog, opt-in via
XfIndex.build(vec_format="f16")): ~2x smaller store, all semantic
serving paths (distributed / pinned / IVF) agree with a NumPy oracle
computed from the SAME quantized values."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from xf_spark.engine import XfIndex
from xf_spark.query.semantic import embed_query
from xf_spark.transcripts import load_transcripts

SCALE = 0.001


def _dir_bytes(path):
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    tr = load_transcripts(spark, SCALE)
    p32 = str(tmp_path_factory.mktemp("f") / "f32")
    p16 = str(tmp_path_factory.mktemp("f") / "f16")
    ix32 = XfIndex.build(tr, p32, slices=1)
    ix16 = XfIndex.build(tr, p16, slices=1, vec_format="f16")
    return ix32, ix16


@pytest.fixture(scope="module")
def quantized(pair):
    """(ids, float64 matrix of the f16-quantized vectors)."""
    _, ix16 = pair
    pdf = ix16.embeddings.select("doc_id", "vec16").toPandas()
    ids = pdf["doc_id"].to_numpy(np.int64)
    mat = (
        np.frombuffer(b"".join(pdf["vec16"]), dtype=np.float16)
        .astype(np.float64)
        .reshape(len(ids), -1)
    )
    order = np.argsort(ids)
    return ids[order], mat[order]


def test_f16_halves_logical_scan_bytes(pair):
    """The f16 layout is exactly 2 bytes/dim on the wire and in the
    decode path (vs 4 for the float32 list). MEASURED NOTE: on this
    synthetic hash-embed data the f32 list column compresses BETTER on
    disk (each vector holds few distinct values k/||v||, so parquet
    dictionary+RLE crushes it — measured 138 KB f32 vs 253 KB f16 at
    sf0.001); real-world dense embeddings are high-entropy, where the
    2x logical ratio carries to disk. Hence vec_format stays opt-in."""
    from xf_spark.functions.hash_embed import DIM

    ix32, ix16 = pair
    n = ix16.embeddings.count()
    blob_bytes = ix16.embeddings.select(
        F.sum(F.length("vec16")).alias("b")
    ).first()["b"]
    assert blob_bytes == n * DIM * 2  # exactly half of the 4B/dim list
    assert "vec16" in ix16.embeddings.columns
    assert ix32.embeddings.count() == n


def test_distributed_semantic_matches_quantized_oracle(pair, quantized):
    _, ix16 = pair
    ids, mat = quantized
    q = embed_query("stress").astype(np.float64)
    sc = mat @ q
    order = np.lexsort((ids, -sc))[:20]
    want = [(int(ids[i]), round(float(sc[i]), 9)) for i in order]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in ix16.search("stress", mode="semantic", limit=20).collect()
    ]
    assert got == want


def test_pinned_equals_distributed_f16(pair):
    _, ix16 = pair
    dist = [(r["doc_id"], round(r["score"], 9)) for r in
            ix16.search("stress", mode="semantic", limit=20).collect()]
    ix16.cache(pin_vectors_mb=512)
    assert ix16._pinned_vecs is not None
    pinned = [(r["doc_id"], round(r["score"], 9)) for r in
              ix16.search("stress", mode="semantic", limit=20).collect()]
    assert pinned == dist
    # hybrid over the pinned f16 matrix serves too
    assert ix16.search("rust", mode="hybrid", limit=10).count() == 10


def test_ivf_f16_full_probe_matches_quantized_oracle(spark, tmp_path, quantized):
    from xf_spark.ops.similarity import ivf_topk

    tr = load_transcripts(spark, SCALE)
    ix = XfIndex.build(
        tr, str(tmp_path / "a16"), slices=1, ann_cells=4, vec_format="f16"
    )
    cent = ix._centroids()
    assert cent is not None and "vec16" in ix.embeddings.columns
    ids, mat = quantized
    q = embed_query("stress").astype(np.float64)
    # ivf renormalizes the quantized vectors before scoring
    matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    qn = q / max(np.linalg.norm(q), 1e-12)
    sc = np.round(matn @ qn, 6)
    order = np.lexsort((ids, -sc))[:10]
    want = [int(ids[i]) for i in order]
    got = [
        r["doc_id"]
        for r in ivf_topk(
            ix.embeddings, cent, [float(x) for x in embed_query("stress")],
            k=10, n_probe=4, id_col="doc_id", vec_col="vec16",
        ).collect()
    ]
    assert got == want
    # and the engine's ann path serves from the f16 store
    assert ix.search("stress", mode="semantic", ann=True, limit=5).count() == 5


def test_append_extends_f16_store(pair):
    _, ix16 = pair
    before = ix16.embeddings.count()
    extra = ix16.docs.select(
        F.concat(F.lit("zz16_"), "conv_id").alias("conv_id"), "turn_idx",
        "role", "text", "tool", "ts",
    ).limit(10)
    ix = ix16.append(extra)
    assert "vec16" in ix.embeddings.columns
    assert ix.embeddings.count() == before + 10
    assert ix.search("stress", mode="semantic", limit=5).count() == 5
