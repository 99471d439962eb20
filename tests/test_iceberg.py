"""Pure-Python Iceberg v2 layer: Avro codec round-trips, snapshot
commits, time travel, partition pruning, and the load_table seam.

The layer is spec-derived (https://iceberg.apache.org/spec/); these
tests pin the properties a real lakehouse relies on: read-your-commit,
snapshot isolation under append/overwrite, manifest+file pruning that
never changes results (only the file list), and loud failures on the
unsupported surface (delete manifests)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from xf_spark.sources import iceberg as ice
from xf_spark.sources.avro_codec import read_avro_file, write_avro_file
from xf_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Avro codec
# ---------------------------------------------------------------------------

AVRO_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": ["null", "long"]},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "d", "type": "double"},
        {
            "name": "arr",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "int"}],
                },
            },
        },
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ],
}


def _avro_rows(n):
    return [
        {
            "s": f"row-{i} é漢",
            "n": None if i % 3 == 0 else i * 12345678901,
            "b": i % 2 == 0,
            "raw": bytes([i % 256, 0, 255]),
            "d": i / 7.0,
            "arr": [{"x": i}, {"x": -i}],
            "m": {"a": i, "b": -i},
        }
        for i in range(n)
    ]


class TestAvroCodec:
    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_roundtrip(self, tmp_path, codec):
        rows = _avro_rows(257)
        p = str(tmp_path / "t.avro")
        write_avro_file(p, AVRO_SCHEMA, rows, codec=codec)
        schema, got = read_avro_file(p)
        assert schema == AVRO_SCHEMA
        assert got == rows

    def test_empty_file(self, tmp_path):
        p = str(tmp_path / "e.avro")
        write_avro_file(p, AVRO_SCHEMA, [])
        _, got = read_avro_file(p)
        assert got == []

    def test_negative_varints(self, tmp_path):
        schema = {
            "type": "record",
            "name": "n",
            "fields": [{"name": "v", "type": "long"}],
        }
        rows = [{"v": v} for v in (0, -1, 1, -(2**62), 2**62, 63, -64)]
        p = str(tmp_path / "n.avro")
        write_avro_file(p, schema, rows)
        assert read_avro_file(p)[1] == rows


# ---------------------------------------------------------------------------
# Iceberg table commits
# ---------------------------------------------------------------------------


def _turns(spark, n, start_day=0, id_start=0):
    return spark.range(id_start, id_start + n).select(
        F.concat(F.lit("c"), (F.col("id") / 10).cast("long").cast("string"))
        .alias("conv_id"),
        (F.col("id") % 10).cast("int").alias("turn_idx"),
        F.when(F.col("id") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.concat(
            F.lit("turn text "),
            F.col("id").cast("string"),
            F.when(F.col("id") % 7 == 0, " machine learning").otherwise(""),
            F.when(F.col("id") % 5 == 0, " spark index build").otherwise(""),
        ).alias("text"),
        F.lit("").alias("tool"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(days=F.lit(start_day) + F.col("id") % 6)
        ).alias("ts"),
    )


def _sorted_rows(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["ts"])
        for r in df.collect()
    )


class TestIcebergTable:
    def test_roundtrip_unpartitioned(self, spark, tmp_path):
        root = str(tmp_path / "t1")
        df = _turns(spark, 100)
        snap = ice.write_iceberg(df, root)
        assert snap == 1
        got = ice.read_iceberg(spark, root)
        assert got.columns == df.columns
        assert _sorted_rows(got) == _sorted_rows(df)

    def test_append_and_time_travel(self, spark, tmp_path):
        root = str(tmp_path / "t2")
        s1 = ice.write_iceberg(_turns(spark, 40), root)
        s2 = ice.write_iceberg(_turns(spark, 25, start_day=50), root)
        assert (s1, s2) == (1, 2)
        assert ice.read_iceberg(spark, root).count() == 65
        assert ice.read_iceberg(spark, root, snapshot_id=s1).count() == 40
        # snapshot lineage recorded
        meta = ice.load_metadata(root)
        snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
        assert snaps[s2]["parent-snapshot-id"] == s1
        assert meta["current-snapshot-id"] == s2

    def test_overwrite_replaces(self, spark, tmp_path):
        root = str(tmp_path / "t3")
        ice.write_iceberg(_turns(spark, 40), root)
        ice.write_iceberg(_turns(spark, 7), root, mode="overwrite")
        assert ice.read_iceberg(spark, root).count() == 7
        # old snapshot still time-travelable
        assert ice.read_iceberg(spark, root, snapshot_id=1).count() == 40

    def test_day_partition_pruning(self, spark, tmp_path):
        root = str(tmp_path / "t4")
        df = _turns(spark, 120)  # ts spans 6 distinct days
        ice.write_iceberg(df, root, partition_by=[("ts", "day")])
        all_files = ice.plan_files(root)
        d0 = ice.day_value("2024-01-02")
        pruned = ice.plan_files(
            root, partition_filter={"ts_day": (d0, d0 + 1)}
        )
        assert 0 < len(pruned) < len(all_files)
        got = ice.read_iceberg(
            spark, root, partition_filter={"ts_day": (d0, d0 + 1)}
        )
        want = df.where(
            F.col("ts").cast("date").isin(["2024-01-02", "2024-01-03"])
        )
        assert _sorted_rows(got) == _sorted_rows(want)
        # pruning is metadata-only: partition values in manifests
        assert all(
            d0 <= f["partition"]["ts_day"] <= d0 + 1 for f in pruned
        )

    def test_manifest_summary_pruning_skips_manifests(self, spark, tmp_path):
        root = str(tmp_path / "t5")
        ice.write_iceberg(
            _turns(spark, 30), root, partition_by=[("ts", "day")]
        )
        ice.write_iceberg(
            _turns(spark, 30, start_day=100),
            root,
            partition_by=[("ts", "day")],
        )
        meta = ice.load_metadata(root)
        snap = [
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        ][0]
        _, manifests = read_avro_file(snap["manifest-list"])
        assert len(manifests) == 2
        # range that only commit 2 covers -> files all from commit 2
        d = ice.day_value("2024-01-01") + 100
        files = ice.plan_files(root, partition_filter={"ts_day": (d, None)})
        assert files and all(
            f["partition"]["ts_day"] >= d for f in files
        )

    def test_empty_snapshot_and_missing_snapshot(self, spark, tmp_path):
        root = str(tmp_path / "t6")
        ice.write_iceberg(_turns(spark, 5), root)
        with pytest.raises(ValueError, match="snapshot 999"):
            ice.read_iceberg(spark, root, snapshot_id=999)

    def test_schema_mismatch_rejected(self, spark, tmp_path):
        root = str(tmp_path / "t7")
        ice.write_iceberg(_turns(spark, 5), root)
        with pytest.raises(ValueError, match="schema mismatch"):
            ice.write_iceberg(
                _turns(spark, 5).withColumnRenamed("tool", "tools"), root
            )

    def test_delete_manifest_fails_loudly(self, spark, tmp_path):
        root = str(tmp_path / "t8")
        ice.write_iceberg(_turns(spark, 5), root)
        meta = ice.load_metadata(root)
        snap = meta["snapshots"][-1]
        schema, manifests = read_avro_file(snap["manifest-list"])
        manifests[0]["content"] = 1  # pretend it's a delete manifest
        write_avro_file(snap["manifest-list"], schema, manifests)
        with pytest.raises(NotImplementedError, match="delete manifests"):
            ice.plan_files(root)

    def test_relocatable(self, spark, tmp_path):
        """Table read from a moved directory (paths re-anchored)."""
        root = str(tmp_path / "orig")
        ice.write_iceberg(_turns(spark, 12), root)
        moved = str(tmp_path / "moved")
        os.rename(root, moved)
        assert ice.read_iceberg(spark, moved).count() == 12

    def test_load_table_seam(self, spark, tmp_path):
        """tables.load_table routes Iceberg dirs through this layer,
        including snapshot_id time travel on a path ref."""
        root = str(tmp_path / "seam")
        ice.write_iceberg(_turns(spark, 20), root)
        ice.write_iceberg(_turns(spark, 5), root)
        assert load_table(spark, root).count() == 25
        assert load_table(spark, root, snapshot_id=1).count() == 20

    def test_partition_transforms(self, spark, tmp_path):
        df = _turns(spark, 60)
        for transform, field in [
            ("month", "ts_month"),
            ("year", "ts_year"),
        ]:
            root = str(tmp_path / f"tr_{transform}")
            ice.write_iceberg(df, root, partition_by=[("ts", transform)])
            got = ice.read_iceberg(spark, root)
            assert _sorted_rows(got) == _sorted_rows(df)
        root = str(tmp_path / "tr_ident")
        ice.write_iceberg(df, root, partition_by=[("role", "identity")])
        files = ice.plan_files(
            root, partition_filter={"role": ("user", "user")}
        )
        assert files
        got = ice.read_iceberg(
            spark, root, partition_filter={"role": ("user", "user")}
        )
        assert _sorted_rows(got) == _sorted_rows(df.where("role = 'user'"))

    def test_append_inherits_partition_spec(self, spark, tmp_path):
        root = str(tmp_path / "t9")
        ice.write_iceberg(
            _turns(spark, 30), root, partition_by=[("ts", "day")]
        )
        # second append: partition_by omitted -> inherited from the table
        ice.write_iceberg(_turns(spark, 30, start_day=10), root)
        files = ice.plan_files(root)
        assert all(f["partition"].get("ts_day") is not None for f in files)

    def test_metadata_is_valid_v2_json(self, spark, tmp_path):
        root = str(tmp_path / "t10")
        ice.write_iceberg(_turns(spark, 5), root)
        with open(ice.current_metadata_path(root)) as fh:
            meta = json.load(fh)
        for key in (
            "format-version",
            "table-uuid",
            "last-sequence-number",
            "schemas",
            "partition-specs",
            "current-snapshot-id",
            "snapshots",
        ):
            assert key in meta
        assert meta["format-version"] == 2
        snap = meta["snapshots"][0]
        assert {"snapshot-id", "sequence-number", "manifest-list"} <= set(
            snap
        )

    def test_partition_spec_evolution(self, spark, tmp_path):
        """An append under a DIFFERENT partition_by evolves the spec
        (new spec-id, all specs retained) instead of re-meaning
        spec-id 0 under the carried manifests' feet — old manifests
        keep pruning under the spec they were written with."""
        root = str(tmp_path / "t_evo")
        df1 = _turns(spark, 60)
        ice.write_iceberg(df1, root, partition_by=[("ts", "day")])
        df2 = _turns(spark, 40, start_day=50)
        ice.write_iceberg(
            df2, root, partition_by=[("conv_id", "truncate[4]")]
        )
        meta = ice.load_metadata(root)
        specs = {s["spec-id"] for s in meta["partition-specs"]}
        assert specs == {0, 1}
        assert meta["default-spec-id"] == 1
        # partition field-ids never collide across specs
        fids = [
            pf["field-id"]
            for s in meta["partition-specs"]
            for pf in s["fields"]
        ]
        assert len(fids) == len(set(fids))
        # full read sees both commits
        got = ice.read_iceberg(spark, root)
        assert _sorted_rows(got) == _sorted_rows(df1.unionByName(df2))
        # pruning on the ORIGINAL spec's field still resolves the
        # carried manifests correctly: spec-0 files outside the day are
        # pruned; spec-1 files have no ts_day value, so (correct
        # conservative Iceberg planning) they survive — pruning narrows
        # the file list, the reader's residual filter finishes the job
        d0 = ice.day_value("2024-01-02")
        files = ice.plan_files(root, partition_filter={"ts_day": (d0, d0)})
        assert files
        for f in files:
            if "ts_day" in f["partition"]:
                assert f["partition"]["ts_day"] == d0
        pruned = ice.read_iceberg(
            spark, root, partition_filter={"ts_day": (d0, d0)}
        ).where(F.col("ts").cast("date") == "2024-01-02")
        want = df1.unionByName(df2).where(
            F.col("ts").cast("date") == "2024-01-02"
        )
        assert _sorted_rows(pruned) == _sorted_rows(want)
        # a third commit matching the FIRST spec reuses spec-id 0
        ice.write_iceberg(
            _turns(spark, 10, start_day=90), root,
            partition_by=[("ts", "day")],
        )
        meta3 = ice.load_metadata(root)
        assert {s["spec-id"] for s in meta3["partition-specs"]} == {0, 1}
        assert meta3["default-spec-id"] == 0

    def test_identity_date_partition_commit(self, spark, tmp_path):
        """Identity partitioning on a DATE column: Spark writes ISO
        dirs; the inventory must encode them as int days-since-epoch
        (the Iceberg date partition encoding), not crash."""
        root = str(tmp_path / "t_identdate")
        df = spark.range(30).select(
            F.col("id").cast("long").alias("id"),
            F.date_add(
                F.lit("2024-01-01").cast("date"), (F.col("id") % 3).cast("int")
            ).alias("d"),
        )
        ice.write_iceberg(df, root, partition_by=[("d", "identity")])
        got = ice.read_iceberg(spark, root)
        assert got.count() == 30
        d1 = ice.day_value("2024-01-02")
        files = ice.plan_files(root, partition_filter={"d": (d1, d1)})
        assert files
        pruned = ice.read_iceberg(
            spark, root, partition_filter={"d": (d1, d1)}
        )
        assert pruned.count() == df.where("d = '2024-01-02'").count()

    def test_append_reordered_columns_keeps_schema_ids(self, spark, tmp_path):
        """Appending the same columns in a different DataFrame order
        must not re-derive field ids (partition source-ids would
        silently re-point); type mismatches are refused loudly."""
        root = str(tmp_path / "t_reorder")
        df = _turns(spark, 20)
        ice.write_iceberg(df, root, partition_by=[("ts", "day")])
        schema_before = ice.load_metadata(root)["schemas"]
        ice.write_iceberg(
            _turns(spark, 10, start_day=30).select(df.columns[::-1]), root
        )
        meta = ice.load_metadata(root)
        assert meta["schemas"] == schema_before
        assert ice.read_iceberg(spark, root).count() == 30
        bad = _turns(spark, 5).withColumn(
            "turn_idx", F.col("turn_idx").cast("long")
        )
        with pytest.raises(ValueError, match="type mismatch"):
            ice.write_iceberg(bad, root)


# ---------------------------------------------------------------------------
# snapshot-diff index maintenance
# ---------------------------------------------------------------------------


class TestSnapshotChanges:
    def test_diff_append_and_overwrite(self, spark, tmp_path):
        root = str(tmp_path / "diff")
        ice.write_iceberg(_turns(spark, 30), root)
        ice.write_iceberg(_turns(spark, 20, id_start=800), root)
        added, removed = ice.snapshot_changes(root, 1, 2)
        assert removed == []
        assert sum(f["record_count"] for f in added) == 20
        # from empty -> everything is added
        added_all, _ = ice.snapshot_changes(root, None, 2)
        assert sum(f["record_count"] for f in added_all) == 50
        ice.write_iceberg(_turns(spark, 5), root, mode="overwrite")
        added3, removed3 = ice.snapshot_changes(root, 2, 3)
        assert removed3  # overwrite removed the old files
        assert sum(f["record_count"] for f in added3) == 5


class TestIcebergSnapshotSync:
    """Index maintenance from Iceberg snapshots: sync appends exactly
    the delta files and lands rank-identical to a full rebuild over
    the whole table (the same soundness bar as XfIndex.append)."""

    QUERIES = ["machine", "spark AND index", '"machine learning"', "text"]

    def _hits(self, ix, q):
        return [
            (r["conv_id"], r["turn_idx"], round(r["score"], 9))
            for r in ix.search(q, mode="lexical", limit=30).collect()
        ]

    def test_build_sync_equals_full_rebuild(self, spark, tmp_path):
        from xf_spark.engine import XfIndex

        table = str(tmp_path / "tbl")
        ice.write_iceberg(_turns(spark, 80), table)
        ix = XfIndex.build_iceberg(
            spark, table, str(tmp_path / "inc"), with_embeddings=False
        )
        assert ix.sync_iceberg(table) == 0  # already current
        # new commit: conv ids sort after the base so doc_ids coincide
        ice.write_iceberg(_turns(spark, 40, id_start=800), table)
        assert ix.sync_iceberg(table) == 40
        assert ix.sync_iceberg(table) == 0  # idempotent once synced
        full = XfIndex.build(
            ice.read_iceberg(spark, table),
            str(tmp_path / "full"),
            with_embeddings=False,
        )
        for q in self.QUERIES:
            assert self._hits(ix, q) == self._hits(full, q), q

    def test_unsynced_index_rejects_sync(self, spark, tmp_path):
        from xf_spark.engine import XfIndex

        table = str(tmp_path / "tbl2")
        ice.write_iceberg(_turns(spark, 20), table)
        ix = XfIndex.build(
            ice.read_iceberg(spark, table),
            str(tmp_path / "plain"),
            with_embeddings=False,
        )
        with pytest.raises(ValueError, match="build_iceberg"):
            ix.sync_iceberg(table)

    def test_overwrite_commit_demands_rebuild(self, spark, tmp_path):
        from xf_spark.engine import XfIndex

        table = str(tmp_path / "tbl3")
        ice.write_iceberg(_turns(spark, 20), table)
        ix = XfIndex.build_iceberg(
            spark, table, str(tmp_path / "inc3"), with_embeddings=False
        )
        ice.write_iceberg(_turns(spark, 5), table, mode="overwrite")
        with pytest.raises(ValueError, match="rebuild"):
            ix.sync_iceberg(table)


# ---------------------------------------------------------------------------
# table maintenance: expire snapshots, orphan cleanup
# ---------------------------------------------------------------------------


class TestExpireSnapshots:
    def test_append_history_expiry_keeps_shared_data(self, spark, tmp_path):
        root = str(tmp_path / "tbl")
        ice.write_iceberg(_turns(spark, 20), root)
        ice.write_iceberg(_turns(spark, 10, id_start=800), root)
        ice.write_iceberg(_turns(spark, 5, id_start=900), root)

        expired = ice.expire_snapshots(root, keep_last=1)
        assert expired == [1, 2]
        # current read unchanged: append manifests are CARRIED, so the
        # retained snapshot still reaches every data file
        assert ice.read_iceberg(spark, root).count() == 35
        # time travel to an expired snapshot stops resolving
        with pytest.raises(ValueError, match="not found"):
            ice.read_iceberg(spark, root, snapshot_id=1)
        # idempotent
        assert ice.expire_snapshots(root, keep_last=1) == []

    def test_overwrite_expiry_reclaims_dead_data(self, spark, tmp_path):
        import glob

        root = str(tmp_path / "tbl2")
        ice.write_iceberg(_turns(spark, 20), root)
        ice.write_iceberg(_turns(spark, 5), root, mode="overwrite")
        n_parquet_before = len(
            glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                      recursive=True)
        )
        assert ice.expire_snapshots(root, keep_last=1) == [1]
        n_parquet_after = len(
            glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                      recursive=True)
        )
        # the pre-overwrite files are unreachable from the survivor
        assert n_parquet_after < n_parquet_before
        assert ice.read_iceberg(spark, root).count() == 5

    def test_expired_sync_basis_demands_rebuild(self, spark, tmp_path):
        from xf_spark.engine import XfIndex

        table = str(tmp_path / "tbl3")
        ice.write_iceberg(_turns(spark, 20), table)
        ix = XfIndex.build_iceberg(
            spark, table, str(tmp_path / "ix3"), with_embeddings=False
        )
        ice.write_iceberg(_turns(spark, 5, id_start=800), table)
        ice.write_iceberg(_turns(spark, 5, id_start=900), table)
        ice.expire_snapshots(table, keep_last=1)
        with pytest.raises(ValueError, match="rebuild"):
            ix.sync_iceberg(table)


class TestRemoveOrphans:
    def test_crashed_commit_dir_is_reclaimed(self, spark, tmp_path):
        root = str(tmp_path / "tbl")
        ice.write_iceberg(_turns(spark, 20), root)
        # simulate a crashed commit attempt: data written, never
        # referenced by any manifest
        orphan = os.path.join(root, "data", "commit-00002-deadbeef")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
            f.write(b"not a real parquet")

        listed = ice.remove_orphan_files(root, dry_run=True)
        assert listed == [orphan]
        assert os.path.isdir(orphan)  # dry run touches nothing

        removed = ice.remove_orphan_files(root)
        assert removed == [orphan]
        assert not os.path.exists(orphan)
        # live data untouched; table still reads
        assert ice.read_iceberg(spark, root).count() == 20
        assert ice.remove_orphan_files(root) == []


class TestCheckTable:
    def test_healthy_table(self, spark, tmp_path):
        root = str(tmp_path / "tbl")
        ice.write_iceberg(_turns(spark, 20), root)
        ice.write_iceberg(_turns(spark, 10, id_start=800), root)
        rep = ice.check_table(root)
        assert rep["ok"] and rep["errors"] == []
        assert rep["snapshots"] == 2 and rep["rows"] == 30

    def test_detects_missing_file_and_orphan(self, spark, tmp_path):
        import glob

        root = str(tmp_path / "tbl2")
        ice.write_iceberg(_turns(spark, 20), root)
        victim = glob.glob(
            os.path.join(root, "data", "**", "*.parquet"), recursive=True
        )[0]
        os.remove(victim)
        orphan = os.path.join(root, "data", "commit-00009-dead")
        os.makedirs(orphan)
        open(os.path.join(orphan, "x.parquet"), "wb").write(b"junk")
        rep = ice.check_table(root)
        assert not rep["ok"]
        assert any("missing data file" in e for e in rep["errors"])
        assert rep["orphans"] == [orphan]

    def test_not_a_table(self, tmp_path):
        rep = ice.check_table(str(tmp_path / "nope"))
        assert not rep["ok"] and rep["errors"]


class TestTableOpSequences:
    """Property test: any sequence of append/overwrite/expire/orphan
    ops leaves the table readable with exactly the model's row count,
    time travel working for every retained snapshot, and a clean
    check_table audit."""

    def test_random_op_sequences(self, spark, tmp_path):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        op = st.one_of(
            st.tuples(st.just("append"), st.integers(1, 4)),
            st.tuples(st.just("overwrite"), st.integers(1, 4)),
            st.tuples(st.just("expire"), st.integers(1, 2)),
            st.tuples(st.just("orphans"), st.just(0)),
        )
        counter = [0]

        @settings(
            max_examples=8, deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(ops=st.lists(op, min_size=1, max_size=5))
        def run(ops):
            counter[0] += 1
            root = str(tmp_path / f"t{counter[0]}")
            ice.write_iceberg(_turns(spark, 2), root)
            live = {}  # snapshot_id -> cumulative expected rows
            sid, total = 1, 2
            live[sid] = total
            next_id = 100
            for kind, arg in ops:
                if kind == "append":
                    ice.write_iceberg(
                        _turns(spark, arg, id_start=next_id * 10), root
                    )
                    next_id += 1
                    total += arg
                    sid += 1
                    live[sid] = total
                elif kind == "overwrite":
                    ice.write_iceberg(
                        _turns(spark, arg, id_start=next_id * 10), root,
                        mode="overwrite",
                    )
                    next_id += 1
                    total = arg
                    sid += 1
                    live[sid] = total
                elif kind == "expire":
                    expired = ice.expire_snapshots(root, keep_last=arg)
                    for e in expired:
                        live.pop(e, None)
                else:
                    ice.remove_orphan_files(root)
                assert ice.read_iceberg(spark, root).count() == total
            for s, n in live.items():
                assert ice.read_iceberg(
                    spark, root, snapshot_id=s
                ).count() == n
            rep = ice.check_table(root)
            assert rep["ok"], rep["errors"]

        run()


class TestSyncCrashWindows:
    def test_torn_sync_heals_without_duplicates(self, spark, tmp_path):
        """Simulate the one remaining sync crash window: slice + docs
        delta written, the atomic meta rename (stats + synced snapshot
        id) lost. The retry must reconcile the orphan rows, dedup the
        replayed delta (conv-range-bounded backstop), commit the
        snapshot id, and land rank-identical to a full rebuild."""
        from xf_spark.engine import XfIndex

        table = str(tmp_path / "tbl")
        ice.write_iceberg(_turns(spark, 60), table)
        path = str(tmp_path / "ix")
        ix = XfIndex.build_iceberg(
            spark, table, path, with_embeddings=False
        )
        ice.write_iceberg(_turns(spark, 20, id_start=800), table)

        meta_before = open(os.path.join(path, "meta.json")).read()
        assert ix.sync_iceberg(table) == 20
        # crash simulation: the meta rename never happened
        with open(os.path.join(path, "meta.json"), "w") as f:
            f.write(meta_before)

        ix2 = XfIndex.open(spark, path)
        ix2.sync_iceberg(table)  # heals: reconcile + dedup + state
        assert ix2.docs.count() == 80
        assert ix2.docs.select("conv_id", "turn_idx").distinct().count() == 80
        assert ix2.sync_iceberg(table) == 0  # state committed

        full = XfIndex.build(
            ice.read_iceberg(spark, table), str(tmp_path / "full"),
            with_embeddings=False,
        )
        for q in ["machine", '"machine learning"', "text"]:
            a = [(r["conv_id"], r["turn_idx"], round(r["score"], 9))
                 for r in ix2.search(q, mode="lexical", limit=30).collect()]
            b = [(r["conv_id"], r["turn_idx"], round(r["score"], 9))
                 for r in full.search(q, mode="lexical", limit=30).collect()]
            assert a == b, q
