"""Tests: content-hash incremental embeddings, bulk append, doctor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xf_spark.doctor import run_doctor
from xf_spark.engine import XfIndex
from xf_spark.index.incremental import (
    append_transcripts,
    content_hashes,
    incremental_embeddings,
)
from xf_spark.oracle import OracleIndex
from xf_spark.transcripts import load_transcripts

SCALE = 0.001


@pytest.fixture(scope="module")
def xfidx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docidx"))
    tr = load_transcripts(spark, SCALE)
    return XfIndex.build(tr, path, n_shards=4, n_buckets=16, slices=2), path, tr


class TestIncrementalEmbeddings:
    def test_full_then_incremental_skip(self, spark, xfidx):
        ix, _, _ = xfidx
        docs = ix.docs.select("doc_id", "text")
        full = incremental_embeddings(docs).cache()
        n = full.count()
        assert n == docs.count()
        # re-run with existing: every hash known -> all rows reused,
        # and the vectors are identical
        again = incremental_embeddings(docs, existing=full)
        assert again.count() == n
        diff = (
            full.alias("a")
            .join(again.alias("b"), "doc_id")
            .where(F.col("a.vec") != F.col("b.vec"))
            .count()
        )
        assert diff == 0

    def test_only_novel_content_embedded(self, spark, xfidx):
        ix, _, _ = xfidx
        docs = ix.docs.select("doc_id", "text").limit(50).cache()
        existing = incremental_embeddings(docs).cache()
        new_docs = spark.createDataFrame(
            [(9999, "a brand new never seen sentence xylophone")],
            "doc_id long, text string",
        )
        both = docs.unionByName(new_docs)
        out = incremental_embeddings(both, existing=existing)
        assert out.count() == 51
        assert out.where(F.col("doc_id") == 9999).count() == 1

    def test_identical_content_shares_hash(self, spark):
        docs = spark.createDataFrame(
            [(0, "same text here"), (1, "same text here"), (2, "other text")],
            "doc_id long, text string",
        )
        h = content_hashes(docs).collect()
        by_id = {r["doc_id"]: r["chash"] for r in h}
        assert by_id[0] == by_id[1] != by_id[2]


class TestAppend:
    def test_append_builds_new_version(self, spark, xfidx, tmp_path_factory):
        ix, path, tr = xfidx
        new_path = str(tmp_path_factory.mktemp("appended"))
        new = spark.createDataFrame(
            [("convZZZ", 0, "user", "zebra quagga unique terms", "", None)],
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )
        ix2 = append_transcripts(
            spark, path, new, new_path, n_shards=4, n_buckets=16, slices=1,
            with_embeddings=False,
        )
        assert ix2.docs.count() == ix.docs.count() + 1
        hits = ix2.search("zebra", mode="lexical", limit=5).collect()
        assert len(hits) == 1 and hits[0]["conv_id"] == "convZZZ"
        # stats recomputed: scores remain oracle-identical on new corpus
        rows = ix2.docs.select("doc_id", "text").collect()
        oracle = OracleIndex.build([(r["doc_id"], r["text"]) for r in rows])
        got = [r["doc_id"] for r in ix2.search("machine", mode="lexical", limit=10).collect()]
        want = [d for d, _ in oracle.search("machine", limit=10)]
        assert got == want


class TestDoctor:
    def test_healthy_index(self, spark, xfidx):
        _, path, _ = xfidx
        checks = run_doctor(spark, path)
        report = {c.name: c for c in checks}
        assert report["meta"].ok
        assert report["segments"].ok
        assert report["doc_count"].ok
        assert report["doc_ids_dense"].ok
        assert report["manifest"].ok
        assert report["sample_query"].ok
        assert report["embeddings"].ok
        assert all(c.ok for c in checks)

    def test_detects_missing_meta(self, spark, tmp_path):
        checks = run_doctor(spark, str(tmp_path))
        assert not checks[0].ok

    def test_ivf_quantizer_check(self, spark, tmp_path):
        import os

        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        path = str(tmp_path / "ivfdx")
        tr = load_transcripts(spark, 0.001)
        XfIndex.build(tr, path, ann_cells=4, slices=1)
        report = {c.name: c for c in run_doctor(spark, path)}
        assert report["ivf_quantizer"].ok, report["ivf_quantizer"].detail
        # the unrepairable corruption append() refuses: cell-partitioned
        # store, quantizer gone
        os.remove(os.path.join(path, "centroids.json"))
        report = {c.name: c for c in run_doctor(spark, path)}
        assert not report["ivf_quantizer"].ok
