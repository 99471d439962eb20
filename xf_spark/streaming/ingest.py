"""Structured Streaming ingestion for the transcript engine.

The reference is a batch archive engine (README.md:1311) — streaming
is the Spark-native extension of its incremental surface
(lib.rs:213-465): new transcript files land in a directory, micro-
batches flow through the SAME append path the batch engine uses, and
windowed/stateful aggregations run with watermarks for late turns.

Design points (all exercised by tests):

- **file source + checkpoint = resumable exactly-once ingestion**:
  the file source tracks processed files in the checkpoint, so a
  restarted stream (same checkpointLocation) picks up ONLY unseen
  files — the streaming analog of the segment build's manifest resume.
- **foreachBatch -> append_transcripts**: each micro-batch builds a
  new index VERSION dir (global BM25 stats change on append; an
  in-place posting append would serve stale scores — see
  index/incremental.py). A `CURRENT` pointer file is updated
  atomically (tmp+rename, the reference's vector.rs:267-393 pattern).
- **watermark + window aggregation**: turns/minute/role with late-data
  tolerance — the streaming stats surface.
- **applyInPandasWithState**: per-conversation running turn totals —
  custom stateful operator; state survives stream restarts via the
  state store (tested: two availableNow runs, second sees first's
  counts).

At scale: one micro-batch == one bounded batch job; the index-version
cutover keeps queries consistent while a batch is in flight, and the
state store shards by conv_id across executors.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def transcript_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """readStream over a directory of transcript parquet files
    (input_hint schema). maxFilesPerTrigger bounds micro-batch size so
    a backlog replays as several bounded jobs, not one giant one."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def _link_tree(src: str, dst: str) -> None:
    """Hard-link every file of ``src`` into ``dst`` (immutable-file
    snapshot share; meta.json is later replaced via tmp+rename so the
    linked inode of the old version is never mutated)."""
    for root_, _dirs, files in os.walk(src):
        rel = os.path.relpath(root_, src)
        os.makedirs(os.path.join(dst, rel) if rel != "." else dst, exist_ok=True)
        for f in files:
            s = os.path.join(root_, f)
            d = os.path.join(dst, rel, f) if rel != "." else os.path.join(dst, f)
            if not os.path.exists(d):
                os.link(s, d)


def current_index_path(index_root: str) -> str | None:
    ptr = os.path.join(index_root, "CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return f.read().strip() or None


def _set_current(index_root: str, version_dir: str) -> None:
    ptr = os.path.join(index_root, "CURRENT")
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(version_dir)
    os.replace(tmp, ptr)  # atomic cutover


def stream_index(
    spark: SparkSession,
    input_dir: str,
    index_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    compact_every: int = 0,
    max_files_per_trigger: int = 16,
    **build_kw,
):
    """Stream transcript files into versioned index builds.

    Each micro-batch unions with the CURRENT version's doc store and
    writes index_root/v{epoch}; readers follow the CURRENT pointer.
    Returns the StreamingQuery (await with .awaitTermination()).

    ``compact_every > 0`` caps slice growth: whenever a new version
    accumulates that many slices, the slices merge into one via
    ``XfIndex.compact`` BEFORE the CURRENT cutover — the LSM
    compaction policy that keeps per-query segment-row counts bounded
    under indefinite micro-batch ingest (amortized O(index/N) extra
    write per batch). Safe with hard-linked version sharing: compaction
    writes fresh files and unlinks only this version's dir entries, so
    prior versions keep serving their own links unchanged."""
    os.makedirs(index_root, exist_ok=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from xf_spark.engine import XfIndex

        cur = current_index_path(index_root)
        new_dir = os.path.join(index_root, f"v{batch_id}")
        if cur == new_dir:
            # foreachBatch is at-least-once: a crash between
            # _set_current and the checkpoint commit replays this
            # batch with CURRENT already pointing at v{batch_id} (the
            # same collision happens when a reset checkpoint restarts
            # batch ids over an existing root). NEVER rmtree the live
            # version — retry under a fresh suffix; the append's
            # dedup anti-join is the exactly-once backstop, so a pure
            # replay adds zero rows and genuinely new data still
            # lands.
            r = 1
            while os.path.join(index_root, f"v{batch_id}_r{r}") == cur:
                r += 1
            new_dir = os.path.join(index_root, f"v{batch_id}_r{r}")
        if cur is None:
            XfIndex.build(batch_df, new_dir, **build_kw)
        else:
            # snapshot-isolated INCREMENTAL append: hard-link the
            # current version's immutable files (segments slices, docs
            # parquet — the Iceberg manifest-reuse pattern on a local
            # FS), then index ONLY the micro-batch delta into a new
            # slice. Cost per batch is O(delta), not O(corpus); the
            # old version keeps serving unchanged.
            import shutil as _sh

            _sh.rmtree(new_dir, ignore_errors=True)  # crashed attempt
            _link_tree(cur, new_dir)
            ix = XfIndex.open(spark, new_dir).append(batch_df)
            if compact_every > 0:
                seg_root = os.path.join(new_dir, "segments")
                n_slices = sum(
                    1 for d in os.listdir(seg_root) if d.startswith("slice=")
                )
                if n_slices >= compact_every:
                    ix.compact()
        _set_current(index_root, new_dir)

    writer = (
        transcript_stream(spark, input_dir, max_files_per_trigger)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_iceberg(
    spark: SparkSession,
    input_dir: str,
    table_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    query_id: str | None = None,
    partition_by: list[tuple[str, str]] | None = None,
    max_files_per_trigger: int = 16,
):
    """Stream transcript files into an Iceberg table, exactly-once.

    foreachBatch is at-least-once: a crash between the table commit and
    the checkpoint write replays the batch with the SAME batch_id. The
    sink records (query-id, batch-id) in every snapshot's summary and
    skips batches at or below the highest committed id — the upstream
    Iceberg Spark sink's replay-dedup protocol. Combined with the file
    source's checkpointed file ledger, every input row lands in exactly
    one snapshot. Each micro-batch is one atomic snapshot commit, so a
    concurrent ``XfIndex.sync_iceberg`` (manifest-diff index
    maintenance) only ever sees whole batches.

    ``query_id`` defaults to a stable hash of (table, checkpoint) — a
    restart with the same checkpoint resumes the same ledger; a NEW
    checkpoint (batch ids restart at 0) gets a new query id so its
    batches are not mistaken for replays. batch-id monotonicity within
    one query id is Spark's contract for a given checkpoint."""
    import hashlib

    from xf_spark.sources import iceberg as ice

    qid = query_id or hashlib.md5(
        f"{os.path.abspath(table_root)}|{os.path.abspath(checkpoint_dir)}"
        .encode()
    ).hexdigest()[:16]

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = ice.last_streaming_batch(table_root, qid)
        if last is not None and batch_id <= last:
            return  # replayed batch: already a committed snapshot
        ice.write_iceberg(
            batch_df,
            table_root,
            partition_by=partition_by,
            extra_summary={
                "streaming-query-id": qid,
                "streaming-batch-id": str(batch_id),
            },
        )

    writer = (
        transcript_stream(spark, input_dir, max_files_per_trigger)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def prune_versions(index_root: str, keep: int = 2) -> list[str]:
    """Garbage-collect old index version dirs under ``index_root``.

    Keeps the CURRENT version plus the ``keep - 1`` most recent others
    (by mtime). Safe with the hard-link slice sharing: removing a
    version dir only unlinks ITS directory entries — inodes shared
    with surviving versions keep their other links, so retained
    versions serve unchanged, and disk space is reclaimed exactly for
    files no surviving version references. The streaming analog of
    expiring old table snapshots.

    Returns the list of removed version dirs."""
    import shutil as _sh

    cur = current_index_path(index_root)
    if cur is None:
        return []  # no committed version: nothing is provably stale
    # CURRENT stores whatever spelling stream_index was launched with;
    # compare resolved paths so a relative/absolute or symlinked
    # invocation can never classify the live version as prunable
    cur_real = os.path.realpath(cur)
    if not os.path.isdir(cur_real):
        return []  # dangling pointer: refuse to prune anything
    cur_mtime = os.path.getmtime(cur_real)
    versions = sorted(
        (
            os.path.join(index_root, d)
            for d in os.listdir(index_root)
            if d.startswith("v") and os.path.isdir(os.path.join(index_root, d))
        ),
        key=os.path.getmtime,
        reverse=True,
    )
    keep_set = {cur_real}
    for v in versions:  # newest-first; fill up to `keep` total
        if len(keep_set) >= max(keep, 1):
            break
        keep_set.add(os.path.realpath(v))
    removed = []
    for v in versions:
        if os.path.realpath(v) in keep_set:
            continue
        if os.path.getmtime(v) > cur_mtime:
            # newer than the committed version: a build may be writing
            # it right now (CURRENT flips only after the batch commits)
            continue
        _sh.rmtree(v)
        removed.append(v)
    return removed


def turns_per_window(
    stream_df: DataFrame, window: str = "1 minute", watermark: str = "10 minutes"
) -> DataFrame:
    """Windowed turn counts per role with late-data tolerance — attach
    to writeStream in append mode (watermark closes windows)."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )


_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("total_turns", T.LongType()),
        T.StructField("last_turn_idx", T.IntegerType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.LongType()),
        T.StructField("last_idx", T.IntegerType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, last_idx = state.get if state.exists else (0, -1)
    for pdf in pdfs:
        total += len(pdf)
        if len(pdf):
            last_idx = max(last_idx, int(pdf["turn_idx"].max()))
    state.update((total, last_idx))
    yield pd.DataFrame(
        {"conv_id": [key[0]], "total_turns": [total], "last_turn_idx": [last_idx]}
    )


def conversation_turn_totals(stream_df: DataFrame) -> DataFrame:
    """Running per-conversation turn totals — custom stateful operator
    via applyInPandasWithState. State (total, last_idx) persists in the
    state store across micro-batches AND stream restarts."""
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _update_totals,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
