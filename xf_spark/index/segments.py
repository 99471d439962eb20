"""Persisted segment index: compressed posting lists + manifest.

The at-rest artifact mandated by the north rule: term-grouped,
doc-range-sharded posting lists with delta+varint block compression,
block-max metadata for WAND, per-slice build checkpoints with lineage
and metrics, and bucket-partitioned layout for query-time partition
pruning.

Layout under ``<path>/``:
  segments/field=<text|prefix>/bucket=<i>/*.parquet
      one row per (term, shard): compressed doc_ids/tfs/positions +
      per-block skip metadata (last doc id, max tf_part, byte offsets)
  vocab/field=<f>/bucket=<i>/*.parquet   (term, df, cf) global stats
  manifest/*.parquet                      one row per completed slice
  meta.json                               n_docs, avgdl, shards, ...

Design for 10^12 turns:
- **Doc-range sharding** is the partitioning axis that makes every
  query embarrassingly parallel: each doc's postings for ALL terms
  land in the same shard, so AND/OR/NOT/phrase evaluate shard-locally
  and the global answer is a k-sized merge of per-shard top-ks (the
  two-phase heap shape of the reference, vector.rs:913-993).
- **Head-term skew**: the build groupBy key is (term, shard) — a
  Zipf-head term's postings split across all shards by construction,
  bounding any single reducer at ~df/n_shards. This is the explicit
  salting the north rule asks for, with doc-range as the salt so the
  merge stage is a concatenation, not a re-sort.
- **Partition pruning**: terms hash (crc32) into buckets = parquet
  partitions; a query touches only its terms' buckets, and parquet
  row-group stats on the sorted ``term`` column prune within a bucket.
- **Resume**: the build runs in ``slices`` independent jobs (bucket
  ranges); each completed slice appends a manifest row (lineage:
  input fingerprint, counts, bytes, wall time, skew ratio). A re-run
  anti-joins the manifest and re-executes only missing slices —
  the generalization of the reference's content-hash incremental skip
  (lib.rs:334-346).

BM25 note: block_max stores max *tf_part* (the idf-free factor, which
depends only on tf/dl/avgdl); idf multiplies at query time, so block
bounds survive vocabulary growth without rewrite.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from xf_spark.index.codec import (
    BLOCK,
    decode_doc_ids,
    encode_doc_ids,
    encode_positions,
    encode_tfs,
    split_positions_bytes,
    varint_decode,
    varint_encode,
)

K1 = 1.2
B = 0.75

# At-rest parquet codec for the index stores (segments / docs /
# embeddings). zstd over the varint-packed posting binaries measured
# 32% smaller than snappy at sf0.1 (10.69 -> 7.23 MB segments) with
# cold-query latency at parity — at 100 TB the at-rest bytes are a
# first-order cost and zstd decode is not on the warm path at all
# (term-LRU serves decoded arrays).
PARQUET_CODEC = "zstd"


def term_bucket(term: str, n_buckets: int) -> int:
    return zlib.crc32(term.encode("utf-8")) % n_buckets


SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("doc_ids_bin", T.BinaryType()),
        T.StructField("tfs_bin", T.BinaryType()),
        T.StructField("dls_bin", T.BinaryType()),
        T.StructField("positions_bin", T.BinaryType()),
        T.StructField("block_last_doc", T.ArrayType(T.LongType())),
        T.StructField("block_max_tfpart", T.ArrayType(T.DoubleType())),
        T.StructField("block_doc_off", T.ArrayType(T.IntegerType())),
        T.StructField("block_tf_off", T.ArrayType(T.IntegerType())),
        T.StructField("bytes", T.LongType()),
    ]
)


def _encode_bucket_shard(
    pdf: pd.DataFrame, avgdl: float, with_positions: bool
) -> pd.DataFrame:
    """One (field, bucket, shard) group -> one compressed segment row
    PER TERM.

    Grouping at bucket granularity (not per-term) keeps the number of
    Spark/Arrow group invocations at fields x n_buckets x n_shards
    regardless of vocabulary size — per-term pandas-group overhead at
    vocab x shards granularity made the build anti-scale (measured:
    32-core build slower than 8-core before this change)."""
    field = pdf["field"].iloc[0]
    shard = int(pdf["shard"].iloc[0])
    bucket = int(pdf["bucket"].iloc[0])
    wp = with_positions and field == "text"

    # numpy-first: ONE lexsort of the whole group by (term, doc_id),
    # then contiguous slices per term — pandas groupby splitting cost
    # at vocab granularity dominated the build before this (measured)
    terms_sorted, term_codes = np.unique(
        pdf["term"].to_numpy(), return_inverse=True
    )
    doc_ids = pdf["doc_id"].to_numpy().astype(np.int64)
    order = np.lexsort((doc_ids, term_codes))
    tc = term_codes[order]
    ids = doc_ids[order]
    tfs = pdf["tf"].to_numpy().astype(np.int64)[order]
    dls = pdf["dl"].to_numpy().astype(np.int64)[order]
    pos_arr = pdf["positions"].to_numpy()[order] if wp else None

    starts = np.concatenate(([0], np.flatnonzero(np.diff(tc)) + 1, [len(tc)]))
    out_rows = []
    for ti in range(len(terms_sorted)):
        s, e = int(starts[ti]), int(starts[ti + 1])
        row = _encode_term(
            str(terms_sorted[ti]),
            shard,
            bucket,
            ids[s:e],
            tfs[s:e],
            dls[s:e],
            pos_arr[s:e] if wp else None,
            avgdl,
        )
        row["field"] = field
        out_rows.append(row)
    return pd.DataFrame(out_rows)


def _encode_term(
    term: str,
    shard: int,
    bucket: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls_i: np.ndarray,
    pos_lists,
    avgdl: float,
) -> dict:
    """One term's postings within a shard -> one compressed segment row.

    Inputs pre-sorted by doc_id. Delta encoding restarts at each block
    boundary so blocks decode independently via the stored byte
    offsets (skip decoding)."""
    dls = dls_i.astype(np.float64)
    tf_part = tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))

    n = len(doc_ids)
    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    block_last: list[int] = []
    block_max: list[float] = []
    doc_off = [0]
    tf_off = [0]
    for s in range(0, n, BLOCK):
        e = min(s + BLOCK, n)
        ids = doc_ids[s:e]
        gaps = np.empty(e - s, dtype=np.uint64)
        gaps[0] = np.uint64(ids[0])  # delta restart per block
        if e - s > 1:
            gaps[1:] = np.diff(ids).astype(np.uint64)
        doc_chunks.append(varint_encode(gaps))
        tf_chunks.append(encode_tfs(tfs[s:e]))
        block_last.append(int(ids[-1]))
        block_max.append(float(tf_part[s:e].max()))
        doc_off.append(doc_off[-1] + len(doc_chunks[-1]))
        tf_off.append(tf_off[-1] + len(tf_chunks[-1]))

    pos_bin = b""
    if pos_lists is not None:
        pos_bin = encode_positions(list(pos_lists))

    doc_bin = b"".join(doc_chunks)
    tf_bin = b"".join(tf_chunks)
    dls_bin = encode_tfs(dls_i)  # doc lengths, varint (needed for tf_part)
    return {
        "term": term,
        "shard": shard,
        "bucket": bucket,
        "n_docs": n,
        "doc_ids_bin": doc_bin,
        "tfs_bin": tf_bin,
        "dls_bin": dls_bin,
        "positions_bin": pos_bin,
        "block_last_doc": block_last,
        "block_max_tfpart": block_max,
        "block_doc_off": doc_off,
        "block_tf_off": tf_off,
        "bytes": len(doc_bin) + len(tf_bin) + len(dls_bin) + len(pos_bin),
    }


def _one_arg(fn):
    """applyInPandas requires a 1-arg signature; wrap a closure."""

    def wrapper(pdf):
        return fn(pdf)

    return wrapper


@dataclass
class BuildMetrics:
    slice_id: int
    field: str
    n_rows: int
    n_postings: int
    bytes: int
    wall_sec: float
    skew_ratio: float


def build_segment_index(
    postings: DataFrame,
    n_docs: int,
    avgdl: float,
    path: str,
    prefix_postings: DataFrame | None = None,
    n_shards: int = 8,
    n_buckets: int = 64,
    slices: int = 4,
    with_positions: bool = True,
    resume: bool = True,
) -> list[BuildMetrics]:
    """Build (or resume) the segment index at ``path``.

    Returns per-slice metrics. A slice owns ``n_buckets/slices``
    buckets; completed slices are recorded in the manifest and skipped
    on re-run."""
    src = postings.withColumn("field", F.lit("text"))
    if "positions" not in src.columns:
        # postings built with with_positions=False carry no positions
        # column: there is nothing to encode, and passing the null-cast
        # placeholder into encode_positions would crash (len(None))
        with_positions = False
        src = src.withColumn("positions", F.lit(None).cast("array<int>"))
    src = src.select("field", "term", "doc_id", "tf", "dl", "positions")
    if prefix_postings is not None:
        pp = prefix_postings.withColumn("field", F.lit("prefix")).withColumn(
            "positions", F.lit(None).cast("array<int>")
        )
        src = src.unionByName(
            pp.select("field", "term", "doc_id", "tf", "dl", "positions")
        )
    return _build_from_tagged(
        src,
        n_docs=n_docs,
        avgdl=avgdl,
        path=path,
        n_shards=n_shards,
        n_buckets=n_buckets,
        slices=slices,
        with_positions=with_positions,
        resume=resume,
    )


def _build_from_tagged(
    src: DataFrame,
    n_docs: int,
    avgdl: float,
    path: str,
    n_shards: int,
    n_buckets: int,
    slices: int,
    with_positions: bool,
    resume: bool,
) -> list[BuildMetrics]:
    """Shared build body over a field-tagged postings DataFrame
    (field, term, doc_id, tf, dl, positions)."""
    spark = src.sparkSession
    os.makedirs(path, exist_ok=True)
    meta = {
        "n_docs": int(n_docs),
        "avgdl": float(avgdl),
        "n_shards": int(n_shards),
        "n_buckets": int(n_buckets),
        "with_positions": bool(with_positions),
        "block": BLOCK,
    }
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        with open(meta_path, "w") as f:
            json.dump(meta, f)

    manifest_path = os.path.join(path, "manifest")
    done: set[tuple[str, int]] = set()
    if resume and os.path.isdir(manifest_path):
        for r in spark.read.parquet(manifest_path).collect():
            done.add((r["field"], r["slice_id"]))

    # shard by doc range: dense doc_ids 0..N-1 -> contiguous ranges
    sharded = src.withColumn(
        "shard",
        F.least(
            (F.col("doc_id") * n_shards / F.lit(n_docs)).cast("int"),
            F.lit(n_shards - 1),
        ),
    ).withColumn("bucket", (F.crc32(F.col("term")) % n_buckets).cast("int"))

    all_metrics: list[BuildMetrics] = []
    per_slice = max(1, math.ceil(n_buckets / slices))
    out = os.path.join(path, "segments")
    for s in range(slices):
        if ("all", s) in done:
            continue
        lo, hi = s * per_slice, min((s + 1) * per_slice, n_buckets)
        if lo >= hi:
            continue
        t0 = time.time()
        part = sharded.where((F.col("bucket") >= lo) & (F.col("bucket") < hi))

        def encode(pdf: pd.DataFrame, _a=avgdl, _wp=with_positions):
            return _encode_bucket_shard(pdf, _a, _wp)

        seg = part.groupBy("field", "bucket", "shard").applyInPandas(
            _one_arg(encode), schema=SEGMENT_SCHEMA
        )
        # dynamic partition overwrite: a slice owns a disjoint bucket
        # range, so a crash between this write and the manifest row
        # below re-runs the slice and REPLACES its own (field, bucket)
        # partitions instead of appending a duplicate copy of every
        # posting row (mode("append") silently doubled n_docs/df on
        # resume — the same hazard build_index fixes with per-slice
        # overwrite subdirs)
        (
            seg.repartition("field", "bucket")
            .sortWithinPartitions("term", "shard")
            .write.partitionBy("field", "bucket")
            .option("partitionOverwriteMode", "dynamic")
            .option("compression", PARQUET_CODEC)
            .mode("overwrite")
            .parquet(out)
        )
        # slice metrics from the written files (lineage)
        written = spark.read.parquet(out).where(
            (F.col("bucket") >= lo) & (F.col("bucket") < hi)
        )
        row = written.agg(
            F.count("*").alias("rows"),
            F.sum("n_docs").alias("postings"),
            F.sum("bytes").alias("bytes"),
            F.max("n_docs").alias("max_seg"),
            F.expr("percentile(n_docs, 0.5)").alias("med_seg"),
        ).first()
        m = BuildMetrics(
            slice_id=s,
            field="all",
            n_rows=int(row["rows"] or 0),
            n_postings=int(row["postings"] or 0),
            bytes=int(row["bytes"] or 0),
            wall_sec=time.time() - t0,
            skew_ratio=float((row["max_seg"] or 0) / max(row["med_seg"] or 1, 1)),
        )
        all_metrics.append(m)
        mrow = spark.createDataFrame(
            [
                (
                    "all",
                    s,
                    lo,
                    hi,
                    m.n_rows,
                    m.n_postings,
                    m.bytes,
                    m.wall_sec,
                    m.skew_ratio,
                    float(m.n_postings / m.wall_sec) if m.wall_sec else 0.0,
                )
            ],
            "field string, slice_id int, bucket_lo int, bucket_hi int, "
            "n_rows long, n_postings long, bytes long, wall_sec double, "
            "skew_ratio double, postings_per_sec double",
        )
        mrow.write.mode("append").parquet(manifest_path)
    return all_metrics


def _encode_field_arrays(
    field: str,
    shard: int,
    terms: np.ndarray,
    doc_rep: np.ndarray,
    tf_rep: np.ndarray,
    dl_rep: np.ndarray,
    pos_lens: np.ndarray | None,
    pos_flat: np.ndarray | None,
    avgdl: float,
    n_buckets: int,
) -> list[dict]:
    """Encode one field's postings for one shard, given flat posting
    arrays (term/doc/tf/dl aligned). Pure NumPy: one unique + one
    lexsort + contiguous per-term slices."""
    from xf_spark.index.codec import encode_positions_flat, reorder_segments

    if len(terms) == 0:
        return []
    # hash-based factorize + vocab-sized sort beats np.unique's O(n log n)
    # object-string sort on multi-million-posting shards (measured)
    raw_codes, raw_uniq = pd.factorize(terms, sort=False)
    uorder = np.argsort(raw_uniq)
    rank = np.empty(len(uorder), dtype=np.int64)
    rank[uorder] = np.arange(len(uorder))
    uniq = raw_uniq[uorder]
    codes = rank[raw_codes]
    order = np.lexsort((doc_rep, codes))
    tc = codes[order]
    ids = doc_rep[order]
    tfs = tf_rep[order]
    dls = dl_rep[order]
    if pos_lens is not None:
        pos_lens, pos_flat = reorder_segments(pos_lens, pos_flat, order)
        pstarts = np.zeros(len(pos_lens) + 1, dtype=np.int64)
        np.cumsum(pos_lens, out=pstarts[1:])
    starts = np.concatenate(([0], np.flatnonzero(np.diff(tc)) + 1, [len(tc)]))
    out = []
    for ti in range(len(uniq)):
        s, e = int(starts[ti]), int(starts[ti + 1])
        term = str(uniq[ti])
        row = _encode_term(
            term, shard, term_bucket(term, n_buckets),
            ids[s:e], tfs[s:e], dls[s:e], None, avgdl,
        )
        if pos_lens is not None:
            row["positions_bin"] = encode_positions_flat(
                pos_lens[s:e], pos_flat[pstarts[s] : pstarts[e]]
            )
            row["bytes"] += len(row["positions_bin"])
        row["field"] = field
        out.append(row)
    return out


def _encode_partition_batches(
    batch_iter, avgdl, n_buckets, with_positions, shard_base=0
):
    """mapInPandas body: one partition == one shard (the docID range
    sort already co-located each doc range). Accumulates the
    partition's per-doc flat postings and encodes every (field, term)
    posting list — a narrow stage, nothing shuffles.

    ``shard_base`` offsets shard ids for APPENDED slices so they never
    collide with existing shards (per-shard evaluation requires every
    doc's postings in exactly one shard group)."""
    from pyspark import TaskContext

    shard = shard_base + TaskContext.get().partitionId()
    cols: dict[str, list] = {
        k: []
        for k in ("doc_id", "dl", "terms", "tfs", "pos_lens", "pos_flat", "p_terms", "p_tfs")
    }
    for pdf in batch_iter:
        for k in cols:
            cols[k].append(pdf[k].to_numpy())
    if not cols["doc_id"]:
        return
    doc_id = np.concatenate(cols["doc_id"]).astype(np.int64)
    dl = np.concatenate(cols["dl"]).astype(np.int64)
    obj = {k: np.concatenate(cols[k]) for k in ("terms", "tfs", "pos_lens", "pos_flat", "p_terms", "p_tfs")}

    rows: list[dict] = []
    # text field
    t_counts = np.fromiter(
        (len(x) for x in obj["terms"]), dtype=np.int64, count=len(doc_id)
    )
    if t_counts.sum():
        terms = np.concatenate(obj["terms"])
        tf_rep = np.concatenate(obj["tfs"]).astype(np.int64)
        doc_rep = np.repeat(doc_id, t_counts)
        dl_rep = np.repeat(dl, t_counts)
        if with_positions:
            pos_lens = np.concatenate(obj["pos_lens"]).astype(np.int64)
            pf = [x for x in obj["pos_flat"] if len(x)]
            pos_flat = (
                np.concatenate(pf).astype(np.int64) if pf else np.empty(0, np.int64)
            )
        else:
            pos_lens = pos_flat = None
        rows.extend(
            _encode_field_arrays(
                "text", shard, terms, doc_rep, tf_rep, dl_rep,
                pos_lens, pos_flat, avgdl, n_buckets,
            )
        )
    # prefix field (tf-only, dl = text-field dl)
    p_counts = np.fromiter(
        (len(x) for x in obj["p_terms"]), dtype=np.int64, count=len(doc_id)
    )
    if p_counts.sum():
        pterms = np.concatenate(obj["p_terms"])
        ptf_rep = np.concatenate(obj["p_tfs"]).astype(np.int64)
        pdoc_rep = np.repeat(doc_id, p_counts)
        pdl_rep = np.repeat(dl, p_counts)
        rows.extend(
            _encode_field_arrays(
                "prefix", shard, pterms, pdoc_rep, ptf_rep, pdl_rep,
                None, None, avgdl, n_buckets,
            )
        )
    if rows:
        out = pd.DataFrame(rows)
        yield out[[f.name for f in SEGMENT_SCHEMA.fields]]


def build_index(
    transcripts: DataFrame,
    path: str,
    n_shards: int = 64,
    n_buckets: int = 64,
    slices: int = 2,
    with_positions: bool = True,
    resume: bool = True,
):
    """Fused end-to-end build with ONE wide shuffle total:

    transcripts -> range-shuffle on (conv_id, turn_idx) [the docID
    sort — the build's only wide exchange] -> fused docID+tokenize
    mapInPandas -> cache -> encode mapInPandas DIRECTLY on the cached
    partitions (shard == partition id: the docID sort already
    doc-range-partitioned the data, so posting lists are complete per
    partition by construction and the encode is a narrow stage).

    Shard boundaries follow the range sampler, so the segment LAYOUT
    can vary between runs; query RESULTS are invariant (scores carry
    global stats; shard is only a grouping key). Head-term skew is
    still bounded: a Zipf-head term splits across all n_shards
    partitions by doc range exactly as before.

    Returns (docs DataFrame, CorpusStats, metrics).
    Resume granularity: ``slices`` shard ranges, manifest-checked."""
    from xf_spark.index.docs import prepare_docs_tokenized
    from xf_spark.index.postings import CorpusStats

    spark = transcripts.sparkSession
    # ONE pass: docID assignment + tokenization fused (docs.py)
    full = prepare_docs_tokenized(transcripts, num_partitions=n_shards).cache()
    # persist the doc->shard map (shard == partition id of the cached
    # doc-range partitioning, the same id _encode_partition_batches
    # uses): filtered queries evaluate role/ts predicates SHARD-LOCALLY
    # by cogrouping segments with this column, keeping per-shard top-k
    # output at k instead of the full match set (the round-1
    # filtered-search scale-killer).
    docs = full.withColumn("shard", F.spark_partition_id()).drop(
        "terms", "tfs", "pos_lens", "pos_flat", "p_terms", "p_tfs", "dl"
    )
    per_doc = full.select(
        "doc_id", "terms", "tfs", "pos_lens", "pos_flat", "p_terms", "p_tfs", "dl"
    )
    row = per_doc.agg(F.count("*").alias("n"), F.sum("dl").alias("total")).first()
    n_docs = int(row["n"] or 0)
    avgdl = (int(row["total"] or 0) / n_docs) if n_docs else 0.0
    # `full` materialized — release the intermediate sorted-text cache
    _ordered = getattr(full, "_ordered_cache", None)
    if _ordered is not None:
        _ordered.unpersist()
    os.makedirs(path, exist_ok=True)
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        with open(meta_path, "w") as f:
            json.dump(
                {
                    "n_docs": n_docs,
                    # one past the highest assigned doc_id. Equals
                    # n_docs until a drop-compaction punches holes in
                    # the id space; appends MUST base new ids here,
                    # not on the (post-drop smaller) n_docs count
                    "doc_id_bound": n_docs,
                    "avgdl": avgdl,
                    "total_tokens": int(row["total"] or 0),
                    "n_shards": n_shards,
                    "n_buckets": n_buckets,
                    "with_positions": with_positions,
                    "block": BLOCK,
                    # incremental-append bookkeeping: shard/slice id
                    # allocation + per-slice encode-time avgdl (block
                    # maxima were computed with it; query-time bounds
                    # scale by max(1, avgdl_now/avgdl_enc))
                    "next_shard": n_shards,
                    "next_slice": slices,
                    "slice_avgdl": {},
                },
                f,
            )
    manifest_path = os.path.join(path, "manifest")
    done: set[int] = set()
    if resume and os.path.isdir(manifest_path):
        for r in spark.read.parquet(manifest_path).collect():
            done.add(r["slice_id"])

    out = os.path.join(path, "segments")
    per_slice = max(1, math.ceil(n_shards / slices))
    all_metrics: list[BuildMetrics] = []
    for s in range(slices):
        if s in done:
            continue
        lo, hi = s * per_slice, min((s + 1) * per_slice, n_shards)
        if lo >= hi:
            continue
        t0 = time.time()
        # shard == partition id: encode runs as a NARROW stage over the
        # cached doc-range partitions — no shuffle, no sampling pass
        part = per_doc.where(F.spark_partition_id().between(lo, hi - 1))

        def run(batches, _a=avgdl, _nb=n_buckets, _wp=with_positions):
            return _encode_partition_batches(batches, _a, _nb, _wp)

        seg = part.mapInPandas(run, schema=SEGMENT_SCHEMA)
        # per-slice subdirectory + overwrite => resume is IDEMPOTENT:
        # a slice that wrote files but crashed before its manifest
        # append is fully replaced, never duplicated (duplicated
        # posting lists would silently inflate df and corrupt scores).
        # partition by field only: partitionBy(field,bucket) produced
        # tasks x fields x buckets tiny files; term-sorted row groups
        # give the same pruning via parquet min/max stats
        out_slice = os.path.join(out, f"slice={s}")
        # lineage metrics ride the write action itself (observe):
        # no re-read of the written segments — at 10^12 scale that
        # re-scan would cost as much as the write
        from pyspark.sql import Observation

        obs = Observation(f"slice_{s}_metrics")
        seg = seg.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_docs").alias("postings"),
            F.sum("bytes").alias("bytes"),
            F.max("n_docs").alias("max_seg"),
            F.expr("percentile(n_docs, 0.5)").alias("med_seg"),
        )
        seg.write.partitionBy("field").option(
            "compression", PARQUET_CODEC
        ).mode("overwrite").parquet(out_slice)
        row = obs.get
        m = BuildMetrics(
            slice_id=s,
            field="all",
            n_rows=int(row["rows"] or 0),
            n_postings=int(row["postings"] or 0),
            bytes=int(row["bytes"] or 0),
            wall_sec=time.time() - t0,
            skew_ratio=float((row["max_seg"] or 0) / max(row["med_seg"] or 1, 1)),
        )
        all_metrics.append(m)
        spark.createDataFrame(
            [
                (
                    "all", s, lo, hi, m.n_rows, m.n_postings, m.bytes,
                    m.wall_sec, m.skew_ratio,
                    float(m.n_postings / m.wall_sec) if m.wall_sec else 0.0,
                )
            ],
            "field string, slice_id int, shard_lo int, shard_hi int, "
            "n_rows long, n_postings long, bytes long, wall_sec double, "
            "skew_ratio double, postings_per_sec double",
        ).write.mode("append").parquet(manifest_path)
    # keep `full` cached: docs (hydration) and future queries share it
    return docs, CorpusStats(n_docs, avgdl), all_metrics


def _doc_len_udf():
    """tokenize-length pandas UDF — the SAME tokenizer the encode
    used, shared by reconcile_meta (torn-append repair) and
    compact_index (exact post-drop avgdl): the two accountings must
    never diverge."""
    from xf_spark.functions.textcore import tokenize

    @F.pandas_udf("int")
    def _dl(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len(tokenize(t or "")))

    return _dl


def reconcile_meta(spark, path: str) -> bool:
    """Repair meta.json after a crash in append_index's commit window
    (segments + docs delta written, meta replace never ran).

    Without this, re-running the append is a silent no-op: the dedup
    anti-join matches the already-written docs, m == 0, and the index
    permanently serves STALE global stats (n_docs/avgdl/df shift BM25
    scores corpus-wide). The orphan rows are identifiable as
    doc_id >= meta.n_docs; their dl is recomputed with the same
    tokenizer the encode used, so the repaired stats equal what the
    crashed append would have committed. Returns True if repaired."""
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    docs_path = os.path.join(path, "docs")
    if not os.path.isdir(docs_path):
        return False
    docs = spark.read.parquet(docs_path)
    _dl = _doc_len_udf()
    id_base = int(meta.get("doc_id_bound", meta["n_docs"]))
    row = (
        docs.where(F.col("doc_id") >= id_base)
        .agg(F.count("*").alias("m"), F.sum(_dl(F.col("text"))).alias("tok"))
        .first()
    )
    m = int(row["m"] or 0)
    if m == 0:
        return False
    new_tokens = int(row["tok"] or 0)
    old_total = int(meta.get("total_tokens", round(meta["avgdl"] * meta["n_docs"])))
    n_docs_new = meta["n_docs"] + m
    avgdl_new = (old_total + new_tokens) / n_docs_new

    slice_id = int(meta.get("next_slice", 10**6))
    shard_base = int(meta.get("next_shard", meta["n_shards"]))
    slice_avgdl = {str(k): v for k, v in (meta.get("slice_avgdl") or {}).items()}
    seg_root = os.path.join(path, "segments")
    orphan_exists = os.path.isdir(os.path.join(seg_root, f"slice={slice_id}"))
    if orphan_exists:
        # replicate the crashed append's bookkeeping: pre-existing
        # slices were encoded at the PRE-append avgdl; the orphan slice
        # at avgdl_new (== post-repair meta.avgdl, scale 1 on load)
        for entry in os.listdir(seg_root):
            if entry.startswith("slice="):
                s = entry.split("=", 1)[1]
                if s != str(slice_id) and s not in slice_avgdl:
                    slice_avgdl[s] = meta["avgdl"]
    meta.update(
        n_docs=n_docs_new,
        doc_id_bound=id_base + m,
        avgdl=avgdl_new,
        total_tokens=old_total + new_tokens,
        slice_avgdl=slice_avgdl,
    )
    if orphan_exists:
        meta.update(next_shard=shard_base + meta["n_shards"], next_slice=slice_id + 1)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return True


def append_index(
    new_transcripts: DataFrame,
    path: str,
    dedup: bool = True,
    dedup_range: tuple[str, str] | None = None,
    meta_extra: dict | None = None,
):
    """INCREMENTAL append: index only the new turns; existing segments
    are never rewritten.

    Why this is sound (and where the reference instead re-indexes
    fully, README.md:1315):

    - postings (term, doc_id, tf, positions) of existing docs do not
      change on append — only the GLOBAL stats (N, avgdl, df) do;
    - exact scores are computed at query time from raw tf/dl + the
      CURRENT meta stats, so old segments score correctly unchanged;
    - per-term df = sum of segment-row ``n_docs`` across slices, so an
      appended slice updates df by existing;
    - the only precomputed stat is the block-max WAND bound
      tf_part(tf, dl, avgdl_enc). tf_part is increasing in avgdl and
      tf_part(avgdl_new) <= tf_part(avgdl_enc) * (avgdl_new/avgdl_enc)
      (the ratio (D + m/a_old)/(D + m/a_new) is maximized as D->0), so
      scaling old bounds by max(1, avgdl_now/avgdl_enc) keeps them
      valid upper bounds — WAND stays exact, only pruning loosens
      fractionally. ``slice_avgdl`` in meta records each slice's
      encode-time avgdl; SegmentIndex.load applies the factor.

    New docs get doc_ids offset past the existing corpus (their shard
    ids offset past existing shards), so doc ranges stay disjoint and
    per-shard evaluation composes. Duplicate (conv_id, turn_idx) rows
    are dropped against the stored docs table.

    At 10^12 turns this is the difference between a bounded delta job
    and re-tokenizing a petabyte per append.

    Returns (n_appended, new CorpusStats)."""
    from xf_spark.index.docs import prepare_docs_tokenized
    from xf_spark.index.postings import CorpusStats

    spark = new_transcripts.sparkSession
    meta_path = os.path.join(path, "meta.json")
    # finish any compaction interrupted mid-commit, then heal a torn
    # previous append (docs/segments ahead of meta): otherwise this
    # run's dedup anti-join silently no-ops against the orphan rows and
    # stale global stats serve forever
    if recover_compaction(path):
        refresh_index_paths(spark, path)
    reconcile_meta(spark, path)
    with open(meta_path) as f:
        meta = json.load(f)
    docs_path = os.path.join(path, "docs")
    if not os.path.isdir(docs_path):
        raise ValueError("append requires the index's docs table (XfIndex.build)")
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    fresh = new_transcripts.select(*cols)
    if dedup:
        # the anti-join scans the stored docs' 2-column projection —
        # O(corpus) but columnar; bulk loaders with known-new deltas
        # pass dedup=False to skip it (streaming keeps it on as the
        # exactly-once backstop for replayed micro-batches).
        # ``dedup_range`` = the delta's (min, max) conv_id: duplicates
        # can only exist inside it, so the corpus scan takes a pushed
        # range predicate — with conv-sorted docs parquet that prunes
        # to the row groups the delta could touch, O(delta-shaped)
        # instead of O(corpus) (the sync_iceberg daily-delta path)
        old_docs = spark.read.parquet(docs_path)
        if dedup_range is not None:
            lo, hi = dedup_range
            old_docs = old_docs.where(
                (F.col("conv_id") >= lo) & (F.col("conv_id") <= hi)
            )
        fresh = fresh.join(
            old_docs.select("conv_id", "turn_idx"),
            ["conv_id", "turn_idx"],
            "left_anti",
        )

    tokenized = prepare_docs_tokenized(fresh, num_partitions=meta["n_shards"])
    # grab the release handle BEFORE chaining (withColumn returns a new
    # DataFrame without the attribute) — otherwise every append leaks
    # one cached copy of the delta's text into the block manager, and
    # under stream_index that compounds per micro-batch
    _ordered = getattr(tokenized, "_ordered_cache", None)
    # id base = one past the highest EVER-assigned doc_id — after a
    # drop-compaction n_docs (a count) is smaller than the id ceiling,
    # and basing on it would collide new ids with surviving docs
    id_base = int(meta.get("doc_id_bound", meta["n_docs"]))
    full = tokenized.withColumn(
        "doc_id", F.col("doc_id") + F.lit(id_base)
    ).cache()
    row = full.agg(F.count("*").alias("n"), F.sum("dl").alias("total")).first()
    if _ordered is not None:  # `full` materialized — drop the intermediate
        _ordered.unpersist()
    m = int(row["n"] or 0)
    if m == 0:
        full.unpersist()
        if meta_extra:
            # an all-duplicates delta still advances caller state
            # (e.g. the synced Iceberg snapshot id) atomically
            meta.update(meta_extra)
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, meta_path)
        return 0, CorpusStats(meta["n_docs"], meta["avgdl"])
    new_tokens = int(row["total"] or 0)
    old_total = int(meta.get("total_tokens", round(meta["avgdl"] * meta["n_docs"])))
    n_docs_new = meta["n_docs"] + m
    avgdl_new = (old_total + new_tokens) / n_docs_new

    shard_base = int(meta.get("next_shard", meta["n_shards"]))
    slice_id = int(meta.get("next_slice", 10**6))
    per_doc = full.select(
        "doc_id", "dl", "terms", "tfs", "pos_lens", "pos_flat", "p_terms", "p_tfs"
    )
    wp = meta.get("with_positions", True)
    nb = meta["n_buckets"]

    def run(batches, _a=avgdl_new, _nb=nb, _wp=wp, _sb=shard_base):
        return _encode_partition_batches(batches, _a, _nb, _wp, shard_base=_sb)

    t0 = time.time()
    seg = per_doc.mapInPandas(run, schema=SEGMENT_SCHEMA)
    from pyspark.sql import Observation

    obs = Observation(f"append_{slice_id}_metrics")
    seg = seg.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_docs").alias("postings"),
        F.sum("bytes").alias("bytes"),
        F.max("n_docs").alias("max_seg"),
        F.expr("percentile(n_docs, 0.5)").alias("med_seg"),
    )
    out_slice = os.path.join(path, "segments", f"slice={slice_id}")
    # overwrite => rerunning a crashed append replaces its orphan
    # slice instead of duplicating postings
    seg.write.partitionBy("field").option(
        "compression", PARQUET_CODEC
    ).mode("overwrite").parquet(out_slice)
    orow = obs.get

    # docs first, meta last (tmp+rename): doctor's meta/docs count
    # check detects a crash between the two
    docs_delta = full.select("doc_id", *cols)
    # shard column (see build_index): appended docs live in shards
    # shard_base + partition id — only written when the existing store
    # already carries the column (mixed parquet schemas don't merge)
    if "shard" in spark.read.parquet(docs_path).columns:
        docs_delta = full.withColumn(
            "shard", (F.lit(shard_base) + F.spark_partition_id()).cast("int")
        ).select("doc_id", "shard", *cols)
    docs_delta.write.mode("append").option(
        "compression", PARQUET_CODEC
    ).parquet(docs_path)

    slice_avgdl = {str(k): v for k, v in (meta.get("slice_avgdl") or {}).items()}
    for entry in os.listdir(os.path.join(path, "segments")):
        if entry.startswith("slice="):
            s = entry.split("=", 1)[1]
            if s != str(slice_id) and s not in slice_avgdl:
                slice_avgdl[s] = meta["avgdl"]  # encoded at pre-append avgdl
    meta.update(
        n_docs=n_docs_new,
        doc_id_bound=id_base + m,
        avgdl=avgdl_new,
        total_tokens=old_total + new_tokens,
        next_shard=shard_base + meta["n_shards"],
        next_slice=slice_id + 1,
        slice_avgdl=slice_avgdl,
    )
    if meta_extra:
        # rides the SAME atomic rename as the stats commit: the caller's
        # state (synced snapshot id) and the appended rows become
        # visible together or not at all
        meta.update(meta_extra)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)

    wall = time.time() - t0
    spark.createDataFrame(
        [
            (
                "all", slice_id, shard_base, shard_base + meta["n_shards"],
                int(orow["rows"] or 0), int(orow["postings"] or 0),
                int(orow["bytes"] or 0), wall,
                float((orow["max_seg"] or 0) / max(orow["med_seg"] or 1, 1)),
                float((orow["postings"] or 0) / wall) if wall else 0.0,
            )
        ],
        "field string, slice_id int, shard_lo int, shard_hi int, "
        "n_rows long, n_postings long, bytes long, wall_sec double, "
        "skew_ratio double, postings_per_sec double",
    ).write.mode("append").parquet(os.path.join(path, "manifest"))
    full.unpersist()
    return m, CorpusStats(n_docs_new, avgdl_new)


# ---------------------------------------------------------------------------
# Slice compaction
# ---------------------------------------------------------------------------

# Intermediate rows shuffled by compaction: one posting-list FRAGMENT
# per (term, old slice/shard, new shard) intersection. Binary payloads
# are plain varint streams (no block metadata — blocks are rebuilt at
# merge time with the current avgdl).
FRAG_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("ids_bin", T.BinaryType()),
        T.StructField("tfs_bin", T.BinaryType()),
        T.StructField("dls_bin", T.BinaryType()),
        T.StructField("pos_bin", T.BinaryType()),
    ]
)

_COMPACT_MARKER = "compact.commit.json"


def recover_compaction(path: str) -> bool:
    """Roll an interrupted ``compact_index`` forward or back.

    The commit point is the marker file (written only after the
    compacted segments + manifest are fully on disk): no marker means
    the old index is untouched — drop any half-written tmp dirs; a
    marker means the compacted data is complete — finish the dir swap,
    install the meta recorded in the marker, and clean up. Every step
    is an idempotent rename/replace, so this is safe to call at every
    load/append/doctor entry (and the happy-path commit calls it too —
    commit and recovery are the same code). Pure file ops, no Spark.

    Returns True if a marker-committed compaction was (re)applied."""
    marker = os.path.join(path, _COMPACT_MARKER)
    # every store a compaction may rewrite: segments + manifest always;
    # docs + embeddings when a drop list physically purges documents
    stores = ("segments", "manifest", "docs", "embeddings")
    if not os.path.exists(marker):
        # died before the commit point: the old index is intact and
        # authoritative. tmp dirs are garbage; a *.pre-compact without
        # a marker can only mean the crash hit after meta was replaced
        # but before cleanup (marker removal precedes cleanup), so the
        # old copy is dead weight either way.
        for name in stores:
            for suffix in (".compact-tmp", ".pre-compact"):
                p = os.path.join(path, name + suffix)
                if os.path.isdir(p):
                    shutil.rmtree(p)
        return False
    with open(marker) as f:
        new_meta = json.load(f)
    for name in stores:
        live = os.path.join(path, name)
        pre = live + ".pre-compact"
        tmp = live + ".compact-tmp"
        if os.path.isdir(tmp):
            if os.path.isdir(live) and not os.path.isdir(pre):
                os.rename(live, pre)
            if not os.path.isdir(live):
                os.rename(tmp, live)
    meta_path = os.path.join(path, "meta.json")
    t = meta_path + ".tmp"
    with open(t, "w") as f:
        json.dump(new_meta, f)
    os.replace(t, meta_path)
    os.remove(marker)
    for name in stores:
        p = os.path.join(path, name + ".pre-compact")
        if os.path.isdir(p):
            shutil.rmtree(p)
    return True


def segment_shard_bounds(seg: DataFrame) -> list[tuple[int, int]]:
    """Per-shard (max doc_id, shard) pairs, sorted by bound — the
    doc-range upper bounds implied by the segments' own block metadata
    (shards hold contiguous disjoint docID ranges by construction).
    One tiny agg over segment metadata; rows = number of shards."""
    rows = (
        seg.groupBy("shard")
        .agg(F.max(F.element_at("block_last_doc", -1)).alias("hi"))
        .collect()
    )
    return sorted((int(r["hi"]), int(r["shard"])) for r in rows)


def shard_expr_for_bounds(bounds: list[tuple[int, int]], id_col: str = "doc_id"):
    """doc_id -> shard Column for ``segment_shard_bounds`` output.

    A doc WITH postings satisfies prev_shard_hi < doc_id <=
    own_shard_hi, so "count bounds strictly below doc_id" indexes its
    shard exactly; docs with no postings can never be hits/candidates,
    so their clamped assignment is harmless. Array-literal searchsorted
    — fine up to thousands of shards; beyond that a broadcast range
    join would replace it."""
    his = [h for h, _ in bounds]
    shards = [s for _, s in bounds]
    idx = F.size(
        F.filter(
            F.array(*[F.lit(h) for h in his]),
            lambda h: h < F.col(id_col),
        )
    )
    return F.element_at(
        F.array(*[F.lit(s) for s in shards]),
        F.least(idx + F.lit(1), F.lit(len(shards))),
    )


def _row_frag_tuples(r, S: int, bound: int, drop_ids) -> list[tuple]:
    """One segment row -> per-(new shard, kept run) fragment tuples in
    FRAG_SCHEMA order. ``drop_ids`` is a SORTED int64 array (or None):
    postings of dropped docs are excised; positions bytes are sliced at
    doc boundaries, never decoded."""
    n = int(r.n_docs)
    if n == 0:
        return []
    off = np.asarray(r.block_doc_off, dtype=np.int64)
    ids = np.empty(n, dtype=np.int64)
    p = 0
    doc_bytes = np.frombuffer(r.doc_ids_bin, dtype=np.uint8)
    for bi in range(len(off) - 1):
        chunk = varint_decode(doc_bytes[off[bi] : off[bi + 1]])
        ids[p : p + len(chunk)] = np.cumsum(chunk.astype(np.int64))
        p += len(chunk)
    shard_of = (ids * S) // bound
    keep = None
    if drop_ids is not None and len(drop_ids):
        pos = np.searchsorted(drop_ids, ids)
        pos_c = np.minimum(pos, len(drop_ids) - 1)
        keep = ~((pos < len(drop_ids)) & (drop_ids[pos_c] == ids))
        if not keep.any():
            return []
        chg = (
            np.flatnonzero(
                (shard_of[1:] != shard_of[:-1]) | (keep[1:] != keep[:-1])
            )
            + 1
        )
    else:
        chg = np.flatnonzero(np.diff(shard_of)) + 1
    cuts = np.concatenate(([0], chg, [n]))
    tfs = varint_decode(r.tfs_bin)
    dls = varint_decode(r.dls_bin)
    pos_bin = r.positions_bin or b""
    pos_frags = split_positions_bytes(pos_bin, n, cuts) if len(pos_bin) else None
    out = []
    for fi in range(len(cuts) - 1):
        s, e = int(cuts[fi]), int(cuts[fi + 1])
        if keep is not None and not keep[s]:
            continue
        out.append(
            (
                r.field,
                r.term,
                int(r.bucket),
                int(shard_of[s]),
                int(ids[s]),
                e - s,
                encode_doc_ids(ids[s:e]),
                varint_encode(tfs[s:e]),
                varint_encode(dls[s:e]),
                pos_frags[fi] if pos_frags is not None else b"",
            )
        )
    return out


def refresh_index_paths(spark: SparkSession, path: str) -> None:
    """Invalidate Spark's shared FileStatusCache for every store a
    compaction may have swapped in place. Without this, a DataFrame
    created via spark.read.parquet(<same path>) after the swap can
    reuse a CACHED file listing and fail with FILE_NOT_EXIST on the
    replaced part files (found by test_purge_preserves_ivf_cell_layout
    — the path-based analog of REFRESH TABLE)."""
    for name in ("segments", "manifest", "docs", "embeddings"):
        p = os.path.join(path, name)
        if os.path.isdir(p):
            try:
                spark.catalog.refreshByPath(p)
            except Exception:  # noqa: BLE001 — cache invalidation is
                pass  # best-effort; a cold cache needs nothing


def compact_index(
    spark: SparkSession,
    path: str,
    target_shards: int | None = None,
    drop: DataFrame | None = None,
    drop_col: str = "doc_id",
):
    """Merge ALL slices into one slice re-sharded to ``target_shards``
    contiguous doc-id ranges, optionally PURGING a drop list of docs.

    Why an index under streaming append needs this: every
    ``append_index`` adds a fresh slice with its own shard range, so
    after k micro-batches a common term has rows in up to (k+1) *
    n_shards shards — per-query work (segment rows touched, tasks
    scheduled, WAND bound looseness from the per-slice avgdl scaling)
    grows linearly with append count. Compaction restores the
    just-built shape: one slice, ``target_shards`` shards, block-max
    bounds re-encoded EXACTLY at the current avgdl. This is the
    LSM-style segment merge the reference sidesteps by re-indexing the
    whole archive on change (README.md:1315) — at 10^12 turns a full
    re-index is a petabyte re-tokenize; this merge is O(index bytes).

    ``drop`` (a DataFrame of doc ids, e.g. the doc_id != keep_id rows
    of ops.dedup.near_dup_groups) physically removes those documents:
    their postings are excised during the merge, the docs + embeddings
    stores are rewritten without them, and the global BM25 stats
    (n_docs / avgdl / total_tokens / per-term df) come out exactly as
    a fresh build over the survivors would produce — this is the
    enforcement half of cluster-level dedup, without a rebuild.
    Surviving doc_ids are PRESERVED (the id space gains holes);
    ``meta.doc_id_bound`` keeps the append id base collision-free.

    Scale shape: without a drop list, stage 1 is a NARROW decode+split
    of each segment row into per-new-shard fragments (positions split
    at BYTE level — per-doc streams are self-contained). With a drop
    list, stage 1 cogroups segments with the drop ids by OLD shard
    (the drop set shuffles once, partitioned by the same doc ranges
    the postings already live in — never collected to the driver, so a
    50%-of-corpus dedup drop list is fine). Stage 2 is ONE shuffle
    keyed (field, bucket, new_shard) — the same key granularity and
    skew bound as the build encode. Nothing reads the corpus text
    except a token-count agg over the DROPPED rows (O(|drop|), needed
    for exact avgdl).

    Durability: all rewritten stores land in ``*.compact-tmp`` dirs,
    then a marker file (the new meta) commits the swap; crashes in any
    window roll forward or back via ``recover_compaction`` (called at
    every load/append/doctor). The stored docs ``shard`` column
    becomes stale and ``meta.docs_shard_stale`` records that —
    filtered queries then derive shard from segment block metadata.

    Returns (n_slices_before, BuildMetrics) — or (n, None) when there
    is nothing to do."""
    state: dict = {}
    try:
        return _compact_index_run(spark, path, target_shards, drop, drop_col, state)
    except BaseException:
        # release the cached drop-id set on ANY failure (a failed merge
        # or rewrite would otherwise pin it in executor storage for the
        # session's lifetime)
        df = state.get("drop_ids_df")
        if df is not None:
            df.unpersist()
        raise


def _compact_index_run(
    spark: SparkSession,
    path: str,
    target_shards: int | None,
    drop: DataFrame | None,
    drop_col: str,
    _state: dict,
):
    if recover_compaction(path):
        # rolling forward a sibling's pending commit swaps stores in
        # place; drop the cached file listings before the reads below
        # (same invalidation every other recover site performs)
        refresh_index_paths(spark, path)
    # heal a torn append BEFORE trusting meta (review finding): with
    # stale meta, orphan doc ids >= doc_id_bound would map to shard ids
    # >= S while next_shard resets to S — the following append would
    # reuse those shard ids for a different doc range, breaking the
    # contiguous-disjoint-shard invariant filtered queries rely on
    # (append_index heals the same state for the same reason)
    reconcile_meta(spark, path)
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    n_docs = int(meta["n_docs"])
    avgdl = float(meta["avgdl"])
    bound = int(meta.get("doc_id_bound", n_docs))
    S = int(target_shards or meta["n_shards"])
    seg_root = os.path.join(path, "segments")
    slice_dirs = [d for d in os.listdir(seg_root) if d.startswith("slice=")]
    if n_docs == 0 or (
        drop is None
        and len(slice_dirs) == 1
        and target_shards is None
        and not (meta.get("slice_avgdl") or {})
    ):
        return len(slice_dirs), None

    seg = spark.read.parquet(seg_root)
    old_total = int(meta.get("total_tokens", round(avgdl * n_docs)))
    n_docs_new, total_new, avgdl_enc = n_docs, old_total, avgdl
    drop_ids_df = None
    docs_path = os.path.join(path, "docs")
    if drop is not None:
        # materialized once: the drop set feeds four jobs (stats agg,
        # cogroup split, docs rewrite, embeddings rewrite) — caching
        # avoids re-deriving it and pins ONE id set even if the source
        # frame is non-deterministic or reads files this compaction is
        # about to replace
        if not os.path.isdir(docs_path):
            raise ValueError("drop-compaction requires the index's docs table")
        drop_ids_df = (
            drop.select(F.col(drop_col).cast("long").alias("doc_id"))
            .where(F.col("doc_id").isNotNull())
            .distinct()
            .cache()
        )
        _state["drop_ids_df"] = drop_ids_df
        drop_ids_df.count()
        docs_df = spark.read.parquet(docs_path)
        _dl = _doc_len_udf()
        # exact post-drop stats need the dropped docs' token counts —
        # same tokenizer the encode used (cf. reconcile_meta); the agg
        # touches only the dropped rows' text
        srow = (
            docs_df.join(drop_ids_df, "doc_id", "left_semi")
            .agg(F.count("*").alias("m"), F.sum(_dl(F.col("text"))).alias("tok"))
            .first()
        )
        m_drop = int(srow["m"] or 0)
        if m_drop == 0:
            drop_ids_df.unpersist()
            drop_ids_df = None  # nothing matches: plain compaction
            _state["drop_ids_df"] = None
            if (
                len(slice_dirs) == 1
                and target_shards is None
                and not (meta.get("slice_avgdl") or {})
            ):
                # without the drop there is nothing to do (same early
                # exit as the drop-less call) — skip the full merge
                return len(slice_dirs), None
        else:
            n_docs_new = n_docs - m_drop
            if n_docs_new <= 0:
                raise ValueError("drop list would empty the index")
            total_new = old_total - int(srow["tok"] or 0)
            avgdl_enc = total_new / n_docs_new

    t0 = time.time()
    if drop_ids_df is None:

        def split_rows(batches, _S=S, _b=bound):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    rows.extend(_row_frag_tuples(r, _S, _b, None))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in FRAG_SCHEMA.fields]
                    )

        frag = seg.mapInPandas(split_rows, schema=FRAG_SCHEMA)
    else:
        # route each drop id to the OLD shard whose doc range holds it
        # (bounds from segment metadata), then cogroup: the drop set
        # stays distributed and shuffles exactly once
        bounds = segment_shard_bounds(seg)
        drop_sharded = drop_ids_df.select(
            shard_expr_for_bounds(bounds).cast("int").alias("shard"), "doc_id"
        )

        _S, _b = S, bound  # closure vars: cogroup applyInPandas
        # inspects the function arity to decide key-passing, so the
        # function must take exactly (left, right)

        def split_cg(seg_pdf: pd.DataFrame, drop_pdf: pd.DataFrame):
            drop_ids = np.sort(drop_pdf["doc_id"].to_numpy(np.int64))
            rows = []
            for r in seg_pdf.itertuples(index=False):
                rows.extend(_row_frag_tuples(r, _S, _b, drop_ids))
            if not rows:
                return pd.DataFrame(
                    {f.name: pd.Series(dtype=object) for f in FRAG_SCHEMA.fields}
                )
            return pd.DataFrame(rows, columns=[f.name for f in FRAG_SCHEMA.fields])

        frag = (
            seg.groupBy("shard")
            .cogroup(drop_sharded.groupBy("shard"))
            .applyInPandas(split_cg, schema=FRAG_SCHEMA)
        )

    def merge_group(pdf: pd.DataFrame, _a=avgdl_enc) -> pd.DataFrame:
        field = pdf["field"].iloc[0]
        shard = int(pdf["shard"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        pdf = pdf.sort_values(["term", "first_doc"], kind="stable")
        t_arr = pdf["term"].to_numpy()
        change = np.flatnonzero(t_arr[1:] != t_arr[:-1]) + 1
        starts = np.concatenate(([0], change, [len(t_arr)]))
        ids_col = pdf["ids_bin"].to_numpy()
        tfs_col = pdf["tfs_bin"].to_numpy()
        dls_col = pdf["dls_bin"].to_numpy()
        pos_col = pdf["pos_bin"].to_numpy()
        out = []
        for gi in range(len(starts) - 1):
            s, e = int(starts[gi]), int(starts[gi + 1])
            ids = np.concatenate([decode_doc_ids(ids_col[j]) for j in range(s, e)])
            tfs = np.concatenate(
                [varint_decode(tfs_col[j]).astype(np.int64) for j in range(s, e)]
            )
            dls = np.concatenate(
                [varint_decode(dls_col[j]).astype(np.int64) for j in range(s, e)]
            )
            row = _encode_term(str(t_arr[s]), shard, bucket, ids, tfs, dls, None, _a)
            # positions pass through at byte level: fragments are
            # per-doc self-contained streams in doc order
            pos_join = b"".join(pos_col[s:e])
            if pos_join:
                row["positions_bin"] = pos_join
                row["bytes"] += len(pos_join)
            row["field"] = field
            out.append(row)
        return pd.DataFrame(out)

    merged = frag.groupBy("field", "bucket", "shard").applyInPandas(
        _one_arg(merge_group), schema=SEGMENT_SCHEMA
    )
    from pyspark.sql import Observation

    obs = Observation("compact_metrics")
    merged = merged.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_docs").alias("postings"),
        F.sum("bytes").alias("bytes"),
        F.max("n_docs").alias("max_seg"),
        F.expr("percentile(n_docs, 0.5)").alias("med_seg"),
    )
    tmp_seg = os.path.join(path, "segments.compact-tmp")
    if os.path.isdir(tmp_seg):
        shutil.rmtree(tmp_seg)
    merged.write.partitionBy("field").option(
        "compression", PARQUET_CODEC
    ).mode("overwrite").parquet(os.path.join(tmp_seg, "slice=0"))
    row = obs.get
    if drop_ids_df is not None:
        # rewrite the doc store without the dropped rows (columnar
        # anti-join scan; this IS the physical delete) and the
        # embeddings store if present (IVF cell layout preserved —
        # the coarse quantizer is unaffected by deletions)
        docs_df.join(drop_ids_df, "doc_id", "left_anti").write.mode(
            "overwrite"
        ).option("compression", PARQUET_CODEC).parquet(
            os.path.join(path, "docs.compact-tmp")
        )
        emb_path = os.path.join(path, "embeddings")
        if os.path.isdir(emb_path):
            emb = spark.read.parquet(emb_path)
            w = emb.join(drop_ids_df, "doc_id", "left_anti").write.mode(
                "overwrite"
            ).option("compression", PARQUET_CODEC)
            if "cell" in emb.columns:
                w = w.partitionBy("cell")
            w.parquet(os.path.join(path, "embeddings.compact-tmp"))
    wall = time.time() - t0
    m = BuildMetrics(
        slice_id=0,
        field="all",
        n_rows=int(row["rows"] or 0),
        n_postings=int(row["postings"] or 0),
        bytes=int(row["bytes"] or 0),
        wall_sec=wall,
        skew_ratio=float((row["max_seg"] or 0) / max(row["med_seg"] or 1, 1)),
    )
    man_tmp = os.path.join(path, "manifest.compact-tmp")
    spark.createDataFrame(
        [
            (
                "all", 0, 0, S, m.n_rows, m.n_postings, m.bytes, m.wall_sec,
                m.skew_ratio,
                float(m.n_postings / m.wall_sec) if m.wall_sec else 0.0,
            )
        ],
        "field string, slice_id int, shard_lo int, shard_hi int, "
        "n_rows long, n_postings long, bytes long, wall_sec double, "
        "skew_ratio double, postings_per_sec double",
    ).write.mode("overwrite").parquet(man_tmp)

    new_meta = dict(meta)
    new_meta.update(
        n_docs=n_docs_new,
        # id ceiling is unchanged by drops (survivors keep their ids);
        # appends base new ids here, never on the shrunken count
        doc_id_bound=bound,
        avgdl=avgdl_enc,
        total_tokens=total_new,
        n_shards=S,
        next_shard=S,
        next_slice=1,
        # the compacted slice is encoded at the (post-drop) current
        # avgdl: exact block bounds. EMPTY dict (missing entry = scale
        # 1.0 on load, same as a fresh build) — a non-empty entry would
        # defeat the nothing-to-do early exit and make every repeat
        # compact() redo the full merge (review finding)
        slice_avgdl={},
        # the docs parquet's stored shard column (if any) reflects the
        # pre-compaction layout; filtered queries must derive shard
        # from the segments instead (exact; _shard_for_docs)
        docs_shard_stale=True,
    )
    marker = os.path.join(path, _COMPACT_MARKER)
    with open(marker + ".tmp", "w") as f:
        json.dump(new_meta, f)
    os.replace(marker + ".tmp", marker)
    # commit == roll forward; identical to crash recovery from here
    recover_compaction(path)
    refresh_index_paths(spark, path)
    if drop_ids_df is not None:
        drop_ids_df.unpersist()
    return len(slice_dirs), m
