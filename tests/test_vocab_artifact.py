"""Sorted vocabulary artifact (SegmentIndex._vocab_df): lazily built,
term-ordered, reused across loads, invalidated by append/purge."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from xf_spark.engine import XfIndex


def _mk_transcripts(spark, rows):
    return spark.createDataFrame(
        [
            (f"c{i//4}", i % 4, "user" if i % 2 else "assistant", t, "", None)
            for i, t in enumerate(rows)
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    texts = [
        f"alpha beta gamma term{i} terra{i % 3} testing tested"
        for i in range(40)
    ]
    tr = _mk_transcripts(spark, texts)
    path = str(tmp_path_factory.mktemp("vocab_ix") / "ix")
    return XfIndex.build(tr, path, with_embeddings=False, n_shards=4,
                         n_buckets=8, slices=1)


def test_artifact_created_sorted_and_marked(ix):
    # first dictionary expansion triggers the lazy build (mid-pattern
    # wildcard: a trailing star is a prefix query over the edge-ngram
    # field and never touches the dictionary)
    hits = ix.segment_index.search("te*ed", limit=10)
    assert hits.count() > 0
    vdir = os.path.join(ix.path, "vocab")
    assert os.path.isdir(vdir)
    with open(os.path.join(vdir, "_VOCAB_META.json")) as f:
        marker = json.load(f)
    assert marker["n_docs"] == ix.segment_index.meta["n_docs"]
    # one row per term, globally consistent dfs, sorted within files
    spark = ix.spark
    v = spark.read.parquet(vdir)
    assert v.groupBy("term").count().where(F.col("count") > 1).count() == 0
    import pyarrow.parquet as pq

    for f in os.listdir(vdir):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(vdir, f), columns=["term"])
            terms = t.column("term").to_pylist()
            assert terms == sorted(terms)


def test_artifact_df_matches_segments_aggregate(ix):
    ix.segment_index.complete("te", limit=5).collect()  # ensure built
    spark = ix.spark
    v = {
        r["term"]: r["df"]
        for r in spark.read.parquet(os.path.join(ix.path, "vocab")).collect()
    }
    seg = {
        r["term"]: int(r["df"])
        for r in ix.segment_index._segments.where(F.col("field") == "text")
        .groupBy("term")
        .agg(F.sum("n_docs").alias("df"))
        .collect()
    }
    assert v == seg


def test_append_invalidates_and_rebuilds(ix, spark):
    before = {r["term"] for r in ix.segment_index.complete("zz", 5).collect()}
    assert "zzznew" not in before
    delta = spark.createDataFrame(
        [("zconv", 0, "user", "zzznew zzznew appended text here", "", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    ix.append(delta)
    assert ix.segment_index.meta["n_docs"] == 41  # 40 built + 1 appended
    # freshness key (n_docs/total_tokens) changed -> artifact rebuilt
    after = {r["term"] for r in ix.segment_index.complete("zz", 5).collect()}
    assert "zzznew" in after
    with open(os.path.join(ix.path, "vocab", "_VOCAB_META.json")) as f:
        marker = json.load(f)
    assert marker["n_docs"] == ix.segment_index.meta["n_docs"]
    # fuzzy expansion resolves the appended term from the new artifact
    variants = ix.segment_index.fuzzy_variants("zzznew")
    assert "zzznew" in variants
