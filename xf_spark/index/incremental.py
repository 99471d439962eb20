"""Incremental maintenance: content-hash embedding skip + doc append.

The reference's incremental surface (generate_embeddings,
lib.rs:213-465): gather docs -> canonicalize -> content-hash -> skip
unchanged (doc, hash) pairs -> reuse any existing embedding with the
same hash -> embed only genuinely new content. Spark shape: two
anti/semi joins on 32-byte digests + a distinct-by-hash embed of the
novel remainder — the classic dedup-compute-fanout.

Index-side incremental, three tiers:

1. ``segments.build_index(resume=True)`` — manifest-resume of a
   crashed/partial BUILD (re-runs only missing slices).
2. ``segments.append_index`` / ``XfIndex.append`` — TRUE incremental
   append: only the delta is tokenized/encoded (new slice, offset
   shards); global stats update in meta and the block-max WAND bounds
   of old slices are avgdl-ratio-corrected at load (provable upper
   bound, so WAND stays exact). O(delta) per append.
3. ``append_transcripts`` (below) — the conservative full-rebuild
   version cutover (union -> new version dir), matching the
   reference's re-index-on-change behavior (README.md:1315). Use it
   when a clean re-layout is wanted; use tier 2 for routine appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from xf_spark.functions.udfs import canonicalize_udf, hash_embed_udf


def content_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, chash): sha256 of the canonicalized text
    (content_hash, canonicalize.rs:83-88)."""
    return docs.select(
        "doc_id", F.sha2(canonicalize_udf(F.col("text")), 256).alias("chash")
    )


def incremental_embeddings(
    docs: DataFrame, existing: DataFrame | None = None
) -> DataFrame:
    """-> (doc_id, chash, vec). With ``existing`` (same schema), only
    novel content hashes are embedded:

    1. unchanged (doc_id, chash) rows pass through untouched;
    2. docs whose hash matches ANY existing hash reuse that embedding
       (join on chash — embeddings are a pure function of content);
    3. the remaining DISTINCT hashes are embedded once and fanned back
       out to their docs.

    Only digests and 384-float vectors shuffle; text is read once."""
    hashed = docs.select(
        "doc_id",
        F.sha2(canonicalize_udf(F.col("text")), 256).alias("chash"),
        "text",
    )
    if existing is None:
        return hashed.select(
            "doc_id", "chash", hash_embed_udf(F.col("text")).alias("vec")
        )

    known = existing.select("chash", "vec").dropDuplicates(["chash"])
    reused = hashed.join(known, "chash").select("doc_id", "chash", "vec")
    novel = hashed.join(known.select("chash"), "chash", "left_anti")
    # embed each novel hash ONCE, fan back out to its docs
    novel_unique = novel.dropDuplicates(["chash"]).select(
        "chash", hash_embed_udf(F.col("text")).alias("vec")
    )
    embedded = novel.select("doc_id", "chash").join(novel_unique, "chash").select(
        "doc_id", "chash", "vec"
    )
    return reused.unionByName(embedded)


def append_transcripts(
    spark,
    old_path: str,
    new_transcripts: DataFrame,
    new_path: str,
    **build_kw,
):
    """Bulk append: union the stored docs with new turns and build a
    fresh index VERSION at ``new_path`` (stats change on append — see
    module docstring). Returns the new XfIndex. Old version stays
    readable until dropped (Iceberg-snapshot-style cutover)."""
    import os

    from xf_spark.engine import XfIndex

    old_docs = spark.read.parquet(os.path.join(old_path, "docs")).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    unioned = old_docs.unionByName(
        new_transcripts.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    ).dropDuplicates(["conv_id", "turn_idx"])
    return XfIndex.build(unioned, new_path, **build_kw)
