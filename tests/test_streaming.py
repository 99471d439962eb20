"""Structured Streaming ingestion: resumable file-source indexing,
watermarked window aggregation, stateful per-conversation totals
surviving a stream restart."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from xf_spark.streaming import (
    conversation_turn_totals,
    current_index_path,
    stream_index,
    transcript_stream,
    turns_per_window,
)


def _write_batch(input_dir: str, name: str, rows: list[tuple]) -> None:
    os.makedirs(input_dir, exist_ok=True)
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(
        os.path.join(input_dir, name),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )


def _rows(conv: str, start: int, n: int, base_min: int) -> list[tuple]:
    return [
        (
            conv,
            start + i,
            "user" if (start + i) % 2 == 0 else "assistant",
            f"turn {start + i} about spark indexing in {conv}",
            "",
            f"2025-03-01 10:{base_min + i:02d}:00",
        )
        for i in range(n)
    ]


class TestStreamIndex:
    def test_resumable_versioned_builds(self, spark, tmp_path):
        inp, root, ckpt = (
            str(tmp_path / "in"),
            str(tmp_path / "idx"),
            str(tmp_path / "ckpt"),
        )
        _write_batch(inp, "a.parquet", _rows("s1", 0, 4, 0) + _rows("s2", 0, 2, 10))

        q = stream_index(spark, inp, root, ckpt, slices=1)
        q.awaitTermination()
        cur1 = current_index_path(root)
        assert cur1 and os.path.isdir(cur1)

        from xf_spark.engine import XfIndex

        ix1 = XfIndex.open(spark, cur1)
        assert ix1.docs.count() == 6
        assert ix1.search("indexing", limit=10).count() > 0

        # second run, same checkpoint: ONLY the new file is processed,
        # and the new version contains the union
        _write_batch(inp, "b.parquet", _rows("s3", 0, 3, 20))
        q = stream_index(spark, inp, root, ckpt, slices=1)
        q.awaitTermination()
        cur2 = current_index_path(root)
        assert cur2 != cur1
        ix2 = XfIndex.open(spark, cur2)
        assert ix2.docs.count() == 9
        # old version still readable (snapshot-style cutover)
        assert XfIndex.open(spark, cur1).docs.count() == 6

    def test_batch_replay_never_deletes_live_version(self, spark, tmp_path):
        """foreachBatch is at-least-once: a replay whose version id
        collides with CURRENT (crash between cutover and checkpoint
        commit, or a reset checkpoint) must NOT rmtree the live
        version — it retries under a suffix and dedup makes the
        replayed rows a no-op."""
        import shutil

        inp, root, ckpt = (
            str(tmp_path / "in"),
            str(tmp_path / "idx"),
            str(tmp_path / "ckpt"),
        )
        _write_batch(inp, "a.parquet", _rows("r1", 0, 4, 0))
        stream_index(spark, inp, root, ckpt, slices=1).awaitTermination()
        cur = current_index_path(root)
        from xf_spark.engine import XfIndex

        assert XfIndex.open(spark, cur).docs.count() == 4

        # simulate the replay: reset the checkpoint so batch ids
        # restart at 0 and the replayed batch's version id == CURRENT
        shutil.rmtree(ckpt)
        stream_index(spark, inp, root, ckpt, slices=1).awaitTermination()
        cur2 = current_index_path(root)
        assert cur2 and os.path.isdir(cur2)
        ix = XfIndex.open(spark, cur2)
        assert ix.docs.count() == 4  # dedup: replay adds nothing
        assert ix.search("indexing", limit=10).count() > 0

    def test_no_new_files_is_noop(self, spark, tmp_path):
        inp, root, ckpt = (
            str(tmp_path / "in"),
            str(tmp_path / "idx"),
            str(tmp_path / "ckpt"),
        )
        _write_batch(inp, "a.parquet", _rows("n1", 0, 3, 0))
        stream_index(spark, inp, root, ckpt, slices=1).awaitTermination()
        cur = current_index_path(root)
        stream_index(spark, inp, root, ckpt, slices=1).awaitTermination()
        assert current_index_path(root) == cur  # pointer untouched


class TestWindowedAggregation:
    def test_append_mode_emits_closed_windows(self, spark, tmp_path):
        inp = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        # batch 1: turns at 10:00-10:03; batch 2: a turn at 11:00
        # advances the watermark past the 10:0x windows, closing them
        _write_batch(inp, "a.parquet", _rows("w1", 0, 4, 0))
        _write_batch(
            inp,
            "b.parquet",
            [("w2", 0, "user", "late watermark pusher", "", "2025-03-01 11:00:00")],
        )

        agg = turns_per_window(
            transcript_stream(spark, inp, max_files_per_trigger=1),
            window="1 minute",
            watermark="0 seconds",
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.sql(
            "SELECT role, sum(n_turns) AS n FROM win_counts GROUP BY role ORDER BY role"
        ).collect()
        got = {r["role"]: r["n"] for r in out}
        # the four 10:0x turns (2 user / 2 assistant) are in closed
        # windows; the 11:00 turn's window is still open -> not emitted
        assert got == {"assistant": 2, "user": 2}


class TestStatefulTotals:
    def test_state_survives_restart(self, spark, tmp_path):
        inp = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        _write_batch(inp, "a.parquet", _rows("c1", 0, 3, 0) + _rows("c2", 0, 1, 10))

        out_dir = str(tmp_path / "out")

        def run(_name):
            # foreachBatch sink: supports checkpoint recovery (the
            # memory sink does not), mirroring stream_index's shape
            def sink(df, _bid):
                df.write.mode("append").parquet(out_dir)

            q = (
                conversation_turn_totals(transcript_stream(spark, inp))
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            rows = spark.read.parquet(out_dir).collect()
            latest: dict = {}
            for r in rows:  # totals are monotone; keep the max
                cur = latest.get(r["conv_id"])
                if cur is None or r["total_turns"] > cur[0]:
                    latest[r["conv_id"]] = (r["total_turns"], r["last_turn_idx"])
            return latest

        first = run("totals1")
        assert first == {"c1": (3, 2), "c2": (1, 0)}

        # restart with NEW data: totals must include the first run's
        # counts (state restored from the state store, not recomputed)
        _write_batch(inp, "b.parquet", _rows("c1", 3, 2, 20))
        second = run("totals2")
        assert second["c1"] == (5, 4)


class TestStreamAutoCompact:
    def test_compact_every_bounds_slices_and_keeps_old_versions(
        self, spark, tmp_path
    ):
        """compact_every=2: versions never accumulate more than 2
        slices; results survive compaction; PRIOR versions (hard-link
        sharers) keep serving their own files unchanged."""
        from xf_spark.engine import XfIndex
        from xf_spark.streaming.ingest import current_index_path, stream_index

        inp, root, ckpt = (
            str(tmp_path / "in"),
            str(tmp_path / "idx"),
            str(tmp_path / "ckpt"),
        )
        _write_batch(inp, "a.parquet", _rows("c1", 0, 4, 0))
        stream_index(spark, inp, root, ckpt, slices=1, compact_every=2).awaitTermination()
        cur1 = current_index_path(root)

        _write_batch(inp, "b.parquet", _rows("c2", 0, 3, 10))
        _write_batch(inp, "c.parquet", _rows("c3", 0, 3, 20))
        stream_index(spark, inp, root, ckpt, slices=1, compact_every=2).awaitTermination()
        cur2 = current_index_path(root)
        assert cur2 != cur1

        def n_slices(p):
            seg = os.path.join(p, "segments")
            return sum(1 for d in os.listdir(seg) if d.startswith("slice="))

        # every appended version was compacted down at the threshold
        assert n_slices(cur2) <= 2
        ix = XfIndex.open(spark, cur2)
        assert ix.docs.count() == 10
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.segment_index.search("indexing", limit=10).collect()
        ]
        exact = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.segment_index.search(
                "indexing", limit=10, exhaustive=True
            ).collect()
        ]
        assert got == exact and len(got) > 0
        # the first version still serves from its own hard links
        assert XfIndex.open(spark, cur1).docs.count() == 4


class TestPruneVersions:
    def test_prune_keeps_current_and_reclaims_old(self, spark, tmp_path):
        """Three versions -> prune(keep=2): oldest removed, CURRENT
        plus one predecessor survive and still serve (hard-linked
        slices keep their inodes through the sibling's removal)."""
        from xf_spark.engine import XfIndex
        from xf_spark.streaming.ingest import (
            current_index_path,
            prune_versions,
            stream_index,
        )

        inp, root, ckpt = (
            str(tmp_path / "in"),
            str(tmp_path / "idx"),
            str(tmp_path / "ckpt"),
        )
        for i, name in enumerate(["a", "b", "c"]):
            _write_batch(inp, f"{name}.parquet", _rows(f"p{i}", 0, 3, i * 10))
            stream_index(spark, inp, root, ckpt, slices=1).awaitTermination()
        versions = [d for d in os.listdir(root) if d.startswith("v")]
        assert len(versions) == 3
        cur = current_index_path(root)

        removed = prune_versions(root, keep=2)
        assert len(removed) == 1 and cur not in removed
        left = [d for d in os.listdir(root) if d.startswith("v")]
        assert len(left) == 2
        ix = XfIndex.open(spark, cur)
        assert ix.docs.count() == 9
        assert ix.segment_index.search("indexing", limit=5).count() == 5

        # keep=1: only CURRENT survives, still serving
        removed = prune_versions(root, keep=1)
        assert len(removed) == 1
        assert [os.path.join(root, d) for d in os.listdir(root) if d.startswith("v")] == [cur]
        assert XfIndex.open(spark, cur).docs.count() == 9


class TestPruneVersionsSafety:
    """prune_versions must never classify the live (or in-progress)
    version as prunable — pure file-op tests (no Spark)."""

    @staticmethod
    def _mk_root(tmp_path, n=3):
        import time as _t

        root = tmp_path / "idx"
        root.mkdir()
        dirs = []
        now = _t.time()
        for i in range(1, n + 1):
            d = root / f"v{i}"
            d.mkdir()
            (d / "meta.json").write_text("{}")
            os.utime(d, (now - 100 * (n - i), now - 100 * (n - i)))
            dirs.append(str(d))
        return str(root), dirs

    def test_relative_root_spelling_never_removes_current(self, tmp_path):
        """CURRENT stores an absolute path; invoking prune with a
        relative root must still recognize it (review finding: raw
        string comparison rmtree'd the live version)."""
        from xf_spark.streaming.ingest import prune_versions

        root, dirs = self._mk_root(tmp_path, n=3)
        (tmp_path / "idx" / "CURRENT").write_text(os.path.abspath(dirs[-1]))
        old_cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            removed = prune_versions("idx", keep=1)
            removed_real = {os.path.realpath(r) for r in removed}
        finally:
            os.chdir(old_cwd)
        assert os.path.isdir(dirs[-1])  # live version survives
        assert removed_real == {os.path.realpath(d) for d in dirs[:-1]}

    def test_in_progress_version_newer_than_current_is_skipped(self, tmp_path):
        """A dir newer than CURRENT may be a build mid-write (CURRENT
        flips only after the batch commits) — prune must leave it."""
        from xf_spark.streaming.ingest import prune_versions

        root, dirs = self._mk_root(tmp_path, n=3)
        (tmp_path / "idx" / "CURRENT").write_text(dirs[1])  # v2 is live
        removed = prune_versions(root, keep=1)
        assert os.path.isdir(dirs[1])  # live
        assert os.path.isdir(dirs[2])  # in-progress (newer than CURRENT)
        assert removed == [dirs[0]]

    def test_no_current_prunes_nothing(self, tmp_path):
        from xf_spark.streaming.ingest import prune_versions

        root, dirs = self._mk_root(tmp_path, n=2)
        assert prune_versions(root, keep=1) == []
        assert all(os.path.isdir(d) for d in dirs)

    def test_dangling_current_prunes_nothing(self, tmp_path):
        from xf_spark.streaming.ingest import prune_versions

        root, dirs = self._mk_root(tmp_path, n=2)
        (tmp_path / "idx" / "CURRENT").write_text(str(tmp_path / "idx" / "v9"))
        assert prune_versions(root, keep=1) == []
        assert all(os.path.isdir(d) for d in dirs)


class TestStreamToIceberg:
    """Exactly-once streaming commits into the Iceberg table layer:
    one snapshot per micro-batch, checkpointed resume processes only
    new files, and a replayed batch id (wiped checkpoint, same query
    id) is skipped via the snapshot-summary ledger."""

    def _count(self, spark, table):
        from xf_spark.sources import iceberg as ice

        return ice.read_iceberg(spark, table).count()

    def test_exactly_once_commits_and_resume(self, spark, tmp_path):
        from xf_spark.sources import iceberg as ice
        from xf_spark.streaming import stream_to_iceberg

        inp, table, ckpt = (
            str(tmp_path / "in"),
            str(tmp_path / "tbl"),
            str(tmp_path / "ckpt"),
        )
        _write_batch(inp, "a.parquet", _rows("s1", 0, 4, 0))
        _write_batch(inp, "b.parquet", _rows("s2", 0, 3, 10))
        q = stream_to_iceberg(
            spark, inp, table, ckpt, max_files_per_trigger=1
        )
        q.awaitTermination()
        assert self._count(spark, table) == 7
        meta = ice.load_metadata(table)
        snaps = meta["snapshots"]
        assert len(snaps) == 2  # one atomic snapshot per micro-batch
        assert all(
            "streaming-batch-id" in s["summary"] for s in snaps
        )

        # resume with the same checkpoint: nothing new -> no snapshot
        q = stream_to_iceberg(
            spark, inp, table, ckpt, max_files_per_trigger=1
        )
        q.awaitTermination()
        assert len(ice.load_metadata(table)["snapshots"]) == 2

        # a new file -> exactly one more snapshot, delta rows only
        _write_batch(inp, "c.parquet", _rows("s3", 0, 2, 20))
        q = stream_to_iceberg(
            spark, inp, table, ckpt, max_files_per_trigger=1
        )
        q.awaitTermination()
        assert self._count(spark, table) == 9
        assert len(ice.load_metadata(table)["snapshots"]) == 3

    def test_replayed_batch_ids_are_skipped(self, spark, tmp_path):
        import shutil

        from xf_spark.sources import iceberg as ice
        from xf_spark.streaming import stream_to_iceberg

        inp, table, ckpt = (
            str(tmp_path / "in"),
            str(tmp_path / "tbl"),
            str(tmp_path / "ckpt"),
        )
        _write_batch(inp, "a.parquet", _rows("s1", 0, 4, 0))
        _write_batch(inp, "b.parquet", _rows("s2", 0, 3, 10))
        stream_to_iceberg(
            spark, inp, table, ckpt, max_files_per_trigger=1
        ).awaitTermination()
        assert self._count(spark, table) == 7
        assert ice.last_streaming_batch(
            table, ice.load_metadata(table)["snapshots"][0]["summary"][
                "streaming-query-id"
            ]
        ) == 1

        # wipe the checkpoint: the file source replays EVERY file with
        # batch ids restarting at 0 — same table+checkpoint paths mean
        # the same query id, so the ledger classifies them as replays
        shutil.rmtree(ckpt)
        stream_to_iceberg(
            spark, inp, table, ckpt, max_files_per_trigger=1
        ).awaitTermination()
        assert self._count(spark, table) == 7  # no duplicate rows
        assert len(ice.load_metadata(table)["snapshots"]) == 2

    def test_stream_feeds_snapshot_sync_index(self, spark, tmp_path):
        from xf_spark.engine import XfIndex
        from xf_spark.streaming import stream_to_iceberg

        inp, table, ckpt = (
            str(tmp_path / "in"),
            str(tmp_path / "tbl"),
            str(tmp_path / "ckpt"),
        )
        _write_batch(inp, "a.parquet", _rows("s1", 0, 6, 0))
        stream_to_iceberg(spark, inp, table, ckpt).awaitTermination()
        ix = XfIndex.build_iceberg(
            spark, table, str(tmp_path / "ix"), with_embeddings=False
        )
        _write_batch(inp, "b.parquet", _rows("s2", 0, 4, 10))
        stream_to_iceberg(spark, inp, table, ckpt).awaitTermination()
        assert ix.sync_iceberg(table) == 4
        assert ix.docs.count() == 10
        assert ix.search("indexing", mode="lexical", limit=20).count() == 10
