"""Pure-Python Apache Iceberg v2 table layer (HadoopTables-style layout).

The north rule targets *Iceberg tables* of transcripts. The usual route
is the Iceberg runtime jar + a Spark catalog; this sandbox has neither,
so this module implements the table format itself from the PUBLIC spec
(https://iceberg.apache.org/spec/) on the METADATA plane only:

- read: resolve current (or time-travel) snapshot from the table
  metadata JSON, decode the snapshot's manifest list + manifests
  (Avro, via ``sources/avro_codec.py``), prune by partition summaries
  and per-file partition values, and hand the surviving parquet file
  list to Spark's native reader — pushdown and column pruning still
  happen in the JVM scan, exactly as with the real runtime.
- write: Spark writes the parquet data files; this module then commits
  them — manifest Avro + manifest-list Avro + next ``vN.metadata.json``
  + atomic ``version-hint.text`` swap (the HadoopTables commit
  protocol: last rename wins; multi-writer safety needs a catalog,
  same as upstream).

Scale shape: planning cost is O(#manifests + #files-after-pruning) on
the driver — identical to Iceberg's own planning model. Partition
summaries in the manifest list let a day-partitioned query skip whole
manifests before a single file footer is opened; row data never flows
through Python.

What is NOT supported (fails loudly, never silently wrong):
- delete manifests / row-level deletes (v2 merge-on-read),
- non-parquet data files,
- transforms beyond identity / day / month / year / bucket[N] /
  truncate[N] (the reference pipeline partitions by day(ts)).
"""

from __future__ import annotations

import json
import os
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xf_spark.sources.avro_codec import read_avro_file, write_avro_file

# ---------------------------------------------------------------------------
# Avro schemas for manifests (field-id properties per the Iceberg spec)
# ---------------------------------------------------------------------------


def _partition_record_schema(
    spec_fields: list[dict], kinds: list[str]
) -> dict:
    """Avro record type for the partition tuple of a given spec."""
    fields = []
    for pf, kind in zip(spec_fields, kinds):
        fields.append(
            {
                "name": pf["name"],
                "type": ["null", kind],
                "field-id": pf["field-id"],
                "default": None,
            }
        )
    return {"type": "record", "name": "r102", "fields": fields}


# primitive "kind" of a partition value: the Avro type it serializes as
_PRIM_KIND = {
    "string": "string",
    "long": "long",
    "int": "int",
    "date": "int",
}


def _result_kinds(
    spec_fields: list[dict], ice_fields: list[dict]
) -> list[str]:
    """Avro value type per partition field. Temporal/bucket transforms
    produce int (days/months/years since epoch, bucket ordinal);
    identity/truncate inherit the SOURCE column type — restricted to
    string/int/long/date sources (partition keys with other types are
    an anti-pattern the writer rejects rather than mis-encodes)."""
    by_id = {f["id"]: f for f in ice_fields}
    kinds = []
    for pf in spec_fields:
        t = pf["transform"]
        if t in ("day", "month", "year") or t.startswith("bucket["):
            kinds.append("int")
            continue
        if t.startswith("truncate["):
            kinds.append("string")
            continue
        src_type = by_id[pf["source-id"]]["type"]
        kind = _PRIM_KIND.get(src_type)
        if kind is None:
            raise ValueError(
                f"identity partitioning on {src_type!r} column "
                f"{by_id[pf['source-id']]['name']!r} is not supported"
            )
        kinds.append(kind)
    return kinds


def _manifest_entry_schema(spec_fields: list[dict], kinds: list[str]) -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "field-id": 1,
                "default": None,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "field-id": 3,
                "default": None,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "field-id": 4,
                "default": None,
            },
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {
                            "name": "file_path",
                            "type": "string",
                            "field-id": 100,
                        },
                        {
                            "name": "file_format",
                            "type": "string",
                            "field-id": 101,
                        },
                        {
                            "name": "partition",
                            "type": _partition_record_schema(
                                spec_fields, kinds
                            ),
                            "field-id": 102,
                        },
                        {
                            "name": "record_count",
                            "type": "long",
                            "field-id": 103,
                        },
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                    ],
                },
            },
        ],
    }


_FIELD_SUMMARY = {
    "type": "record",
    "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {
            "name": "contains_nan",
            "type": ["null", "boolean"],
            "field-id": 518,
            "default": None,
        },
        {
            "name": "lower_bound",
            "type": ["null", "bytes"],
            "field-id": 510,
            "default": None,
        },
        {
            "name": "upper_bound",
            "type": ["null", "bytes"],
            "field-id": 511,
            "default": None,
        },
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            "name": "partitions",
            "type": ["null", {"type": "array", "items": _FIELD_SUMMARY}],
            "field-id": 507,
            "default": None,
        },
    ],
}

# ---------------------------------------------------------------------------
# single-value binary serialization for partition bounds (spec appendix D)
# ---------------------------------------------------------------------------


def _bound_bytes(kind: str, value) -> bytes:
    if value is None:
        return b""
    if kind == "int":
        return struct.pack("<i", int(value))
    if kind == "long":
        return struct.pack("<q", int(value))
    return str(value).encode("utf-8")


def _bound_value(kind: str, data: bytes | None):
    if not data:
        return None
    if kind == "int":
        return struct.unpack("<i", data)[0]
    if kind == "long":
        return struct.unpack("<q", data)[0]
    return data.decode("utf-8")


# ---------------------------------------------------------------------------
# schema mapping Spark <-> Iceberg (names; field-ids assigned positionally)
# ---------------------------------------------------------------------------

_SPARK_TO_ICE = {
    T.StringType(): "string",
    T.LongType(): "long",
    T.IntegerType(): "int",
    T.DoubleType(): "double",
    T.FloatType(): "float",
    T.BooleanType(): "boolean",
    T.BinaryType(): "binary",
    T.TimestampType(): "timestamptz",
    T.DateType(): "date",
}
_ICE_TO_SPARK = {v: k for k, v in _SPARK_TO_ICE.items()}
# Iceberg `timestamp` is zoneless — exactly Spark's TIMESTAMP_NTZ;
# mapped after the dict inversion so TimestampType keeps timestamptz
_SPARK_TO_ICE[T.TimestampNTZType()] = "timestamp"
_ICE_TO_SPARK["timestamp"] = T.TimestampNTZType()


def _iceberg_schema(df_schema: T.StructType) -> dict:
    fields = []
    for i, f in enumerate(df_schema.fields, start=1):
        ice = _SPARK_TO_ICE.get(f.dataType)
        if ice is None:
            raise ValueError(
                f"unsupported column type for Iceberg table: "
                f"{f.name}: {f.dataType.simpleString()}"
            )
        fields.append(
            {
                "id": i,
                "name": f.name,
                "required": False,
                "type": ice,
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def spark_schema(table_meta: dict) -> T.StructType:
    """Spark StructType for the table's current Iceberg schema."""
    sid = table_meta.get("current-schema-id", 0)
    schema = next(
        s for s in table_meta["schemas"] if s.get("schema-id", 0) == sid
    )
    out = []
    for f in schema["fields"]:
        spark_t = _ICE_TO_SPARK.get(f["type"])
        if spark_t is None:
            raise ValueError(f"unsupported Iceberg type: {f['type']}")
        out.append(T.StructField(f["name"], spark_t, True))
    return T.StructType(out)


# ---------------------------------------------------------------------------
# partition transforms (write-side derivation; Spark expressions)
# ---------------------------------------------------------------------------

_EPOCH = "1970-01-01"


def _transform_col(source: str, transform: str) -> F.Column:
    c = F.col(source)
    if transform == "identity":
        return c
    if transform == "day":
        return F.datediff(c.cast("date"), F.lit(_EPOCH).cast("date"))
    if transform == "month":
        return (F.year(c) - 1970) * 12 + F.month(c) - 1
    if transform == "year":
        return F.year(c) - 1970
    if transform.startswith("bucket["):
        n = int(transform[7:-1])
        # spec: murmur3 bucket; we are writer+reader so a pinned
        # deterministic hash keeps pruning exact end-to-end. Documented
        # divergence: external Iceberg readers must not assume murmur3
        # bucket compatibility with tables written here.
        return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")
    if transform.startswith("truncate["):
        n = int(transform[9:-1])
        return F.substring(c.cast("string"), 1, n)
    raise ValueError(f"unsupported partition transform: {transform}")


def _partition_field_name(source: str, transform: str) -> str:
    if transform == "identity":
        return source
    base = transform.split("[", 1)[0]
    return f"{source}_{base}"


def day_value(date_str: str) -> int:
    """days-since-epoch for a YYYY-MM-DD string (day-transform value)."""
    import datetime as dt

    return (dt.date.fromisoformat(date_str) - dt.date(1970, 1, 1)).days


# ---------------------------------------------------------------------------
# metadata resolution
# ---------------------------------------------------------------------------


def is_iceberg_table(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "metadata"))


def _metadata_dir(root: str) -> str:
    return os.path.join(root, "metadata")


def current_metadata_path(root: str) -> str:
    mdir = _metadata_dir(root)
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = int(fh.read().strip())
        p = os.path.join(mdir, f"v{v}.metadata.json")
        if os.path.exists(p):
            return p
    versions = [
        f
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".metadata.json")
    ]
    if not versions:
        raise FileNotFoundError(f"no Iceberg metadata under {mdir}")
    latest = max(versions, key=lambda f: int(f[1:].split(".", 1)[0]))
    return os.path.join(mdir, latest)


def load_metadata(root: str) -> dict:
    with open(current_metadata_path(root)) as fh:
        return json.load(fh)


def _resolve_snapshot(meta: dict, snapshot_id: int | None) -> dict | None:
    snaps = meta.get("snapshots", [])
    if snapshot_id is not None:
        for s in snaps:
            if s["snapshot-id"] == snapshot_id:
                return s
        raise ValueError(f"snapshot {snapshot_id} not found")
    cur = meta.get("current-snapshot-id", -1)
    if cur in (-1, None):
        return None
    return next(s for s in snaps if s["snapshot-id"] == cur)


def _spec_fields(meta: dict, spec_id: int) -> list[dict]:
    spec = next(
        s
        for s in meta.get("partition-specs", [{"spec-id": 0, "fields": []}])
        if s["spec-id"] == spec_id
    )
    return spec["fields"]


# ---------------------------------------------------------------------------
# planning (read path)
# ---------------------------------------------------------------------------


def plan_files(
    root: str,
    snapshot_id: int | None = None,
    partition_filter: dict[str, tuple] | None = None,
) -> list[dict]:
    """Resolve the snapshot's live data files, pruned by partition.

    ``partition_filter`` maps partition FIELD name (e.g. ``ts_day``) to
    an inclusive ``(lo, hi)`` range over the TRANSFORMED value (use
    ``day_value()`` for day fields; either bound may be None). Pruning
    happens twice, exactly like Iceberg planning: manifest-list field
    summaries skip whole manifests, then per-file partition tuples skip
    files. Returns dicts: file_path, record_count, partition.
    """
    meta = load_metadata(root)
    snap = _resolve_snapshot(meta, snapshot_id)
    if snap is None:
        return []
    mlist_path = _relocate(snap["manifest-list"], meta, root)
    _, manifests = read_avro_file(mlist_path)
    out: list[dict] = []
    for mf in manifests:
        if mf.get("content", 0) == 1:
            raise NotImplementedError(
                "delete manifests (row-level deletes) are not supported "
                "by the pure-Python Iceberg reader"
            )
        spec_fields = _spec_fields(meta, mf.get("partition_spec_id", 0))
        kinds = _result_kinds(spec_fields, _current_ice_fields(meta))
        if partition_filter and not _manifest_may_match(
            mf, spec_fields, kinds, partition_filter
        ):
            continue
        _, entries = read_avro_file(_relocate(mf["manifest_path"], meta, root))
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            df_ = e["data_file"]
            if df_["file_format"].upper() != "PARQUET":
                raise NotImplementedError(
                    f"non-parquet data file: {df_['file_path']}"
                )
            part = df_.get("partition") or {}
            if partition_filter and not _file_matches(
                part, partition_filter
            ):
                continue
            out.append(
                {
                    "file_path": _relocate(df_["file_path"], meta, root),
                    "record_count": df_["record_count"],
                    "partition": part,
                }
            )
    return out


def _relocate(path: str, meta: dict, root: str) -> str:
    """Map a metadata-recorded absolute path onto the table's actual
    location (tables are relocatable: paths are rewritten relative to
    the recorded table location, per the spec's location semantics)."""
    loc = meta.get("location", root).rstrip("/")
    path = path.split("file://", 1)[-1]
    if path.startswith(loc + "/"):
        return os.path.join(root, path[len(loc) + 1 :])
    return path


def _current_ice_fields(meta: dict) -> list[dict]:
    sid = meta.get("current-schema-id", 0)
    return next(
        s for s in meta["schemas"] if s.get("schema-id", 0) == sid
    )["fields"]


def _manifest_may_match(
    mf: dict,
    spec_fields: list[dict],
    kinds: list[str],
    flt: dict[str, tuple],
) -> bool:
    summaries = mf.get("partitions")
    if not summaries:
        return True
    for pf, kind, summ in zip(spec_fields, kinds, summaries):
        rng = flt.get(pf["name"])
        if rng is None:
            continue
        lo, hi = rng
        s_lo = _bound_value(kind, summ.get("lower_bound"))
        s_hi = _bound_value(kind, summ.get("upper_bound"))
        if summ.get("contains_null") and s_lo is None:
            continue  # null-only summary: cannot prune on range
        if hi is not None and s_lo is not None and s_lo > hi:
            return False
        if lo is not None and s_hi is not None and s_hi < lo:
            return False
    return True


def _file_matches(part: dict, flt: dict[str, tuple]) -> bool:
    for name, (lo, hi) in flt.items():
        if name not in part:
            continue
        v = part[name]
        if v is None:
            continue
        if lo is not None and v < lo:
            return False
        if hi is not None and v > hi:
            return False
    return True


def read_iceberg(
    spark: SparkSession,
    root: str,
    snapshot_id: int | None = None,
    partition_filter: dict[str, tuple] | None = None,
) -> DataFrame:
    """Snapshot-consistent DataFrame over the table's live files.

    The file list is resolved from manifests (metadata plane, driver);
    the scan itself is Spark's native parquet source, so predicate
    pushdown / column pruning / vectorized decode all still apply."""
    meta = load_metadata(root)
    schema = spark_schema(meta)
    files = plan_files(root, snapshot_id, partition_filter)
    if not files:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(
        *[f["file_path"] for f in files]
    )
    return df.select(*[f.name for f in schema.fields])


def snapshot_changes(
    root: str,
    from_snapshot_id: int | None,
    to_snapshot_id: int | None = None,
) -> tuple[list[dict], list[str]]:
    """File-level diff between two snapshots: (added_files, removed_paths).

    ``from_snapshot_id=None`` means "empty table" (everything in the
    target snapshot is added). This is the primitive behind
    snapshot-driven index maintenance: appends show up as added files
    only; an overwrite also REMOVES files, which an incremental
    consumer must treat as a rebuild signal. Metadata-plane only —
    O(#files), no row data touched."""
    new_files = {
        f["file_path"]: f for f in plan_files(root, to_snapshot_id)
    }
    old_paths = (
        {f["file_path"] for f in plan_files(root, from_snapshot_id)}
        if from_snapshot_id is not None
        else set()
    )
    added = [f for p, f in sorted(new_files.items()) if p not in old_paths]
    removed = sorted(old_paths - set(new_files))
    return added, removed


def current_snapshot_id(root: str) -> int | None:
    meta = load_metadata(root)
    snap = _resolve_snapshot(meta, None)
    return None if snap is None else snap["snapshot-id"]


def last_streaming_batch(root: str, query_id: str) -> int | None:
    """Highest streaming batch id this query has committed to the
    table, read from snapshot summaries — the idempotence ledger for
    exactly-once foreachBatch sinks (the upstream Iceberg Spark sink
    records the same query-id/epoch pair for replay dedup). Returns
    None for a missing table or a query that never committed."""
    try:
        meta = load_metadata(root)
    except FileNotFoundError:
        return None
    best = None
    for s in meta.get("snapshots", []):
        smry = s.get("summary", {})
        if smry.get("streaming-query-id") != query_id:
            continue
        b = int(smry.get("streaming-batch-id", -1))
        if b >= 0 and (best is None or b > best):
            best = b
    return best


# ---------------------------------------------------------------------------
# commit (write path)
# ---------------------------------------------------------------------------


def write_iceberg(
    df: DataFrame,
    root: str,
    mode: str = "append",
    partition_by: list[tuple[str, str]] | None = None,
    extra_summary: dict[str, str] | None = None,
) -> int:
    """Commit ``df`` to the table at ``root``; returns the snapshot id.

    ``mode``: ``append`` (new snapshot adds files, prior manifests are
    carried forward in the new manifest list) or ``overwrite`` (new
    snapshot references only the new files — the logical REPLACE).
    ``partition_by``: ``[(source_col, transform)]`` with transforms
    identity/day/month/year/bucket[N]/truncate[N]; files are written
    partitioned and the commit records per-manifest partition-range
    summaries so reads can prune.

    Commit protocol = HadoopTables: write vN+1 metadata, then atomically
    swap version-hint.text. Single-writer semantics, like upstream
    HadoopTables without a lock manager.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    os.makedirs(_metadata_dir(root), exist_ok=True)

    try:
        meta = load_metadata(root)
        version = int(
            os.path.basename(current_metadata_path(root))[1:].split(".")[0]
        )
        if partition_by is None:
            meta_spec = _spec_fields(meta, meta.get("default-spec-id", 0))
            partition_by = [
                (_source_name(meta, pf["source-id"]), pf["transform"])
                for pf in meta_spec
            ]
    except FileNotFoundError:
        meta = None
        version = 0
        partition_by = partition_by or []

    ice_schema = _iceberg_schema(df.schema)
    if meta is not None:
        # commits against an existing table REUSE its schema (stable
        # field ids — re-deriving ids from the DataFrame's column order
        # would silently re-point partition source-ids); names AND
        # types must match exactly
        existing_schema = next(
            s
            for s in meta["schemas"]
            if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
        )
        ours = {f["name"]: f["type"] for f in ice_schema["fields"]}
        theirs = {f["name"]: f["type"] for f in existing_schema["fields"]}
        if set(ours) != set(theirs):
            raise ValueError(
                f"schema mismatch with existing table: {sorted(ours)} "
                f"vs {sorted(theirs)}"
            )
        wrong = sorted(n for n in ours if ours[n] != theirs[n])
        if wrong:
            raise ValueError(
                f"column type mismatch with existing table: {wrong}"
            )
        ice_schema = existing_schema
    col_ids = {f["name"]: f["id"] for f in ice_schema["fields"]}
    for src, _transform in partition_by:
        if src not in col_ids:
            raise ValueError(f"partition source column missing: {src}")

    # ---- partition-spec resolution (Iceberg spec evolution) --------------
    # Every spec the table has EVER written under stays in the metadata
    # with its own spec-id; each manifest records the spec-id it was
    # written under, and plan_files resolves per-manifest. A commit
    # whose partition_by matches an existing spec reuses that spec-id;
    # a genuinely new layout gets spec-id = max+1 with partition
    # field-ids continuing from last-partition-id (never re-meaning an
    # old spec's fields — the bug this replaces re-wrote spec-id 0 and
    # left carried manifests resolving against the wrong spec).
    existing_specs = list((meta or {}).get("partition-specs", []))
    sig = list(partition_by)
    spec_id = None
    spec_fields: list[dict] = []
    for s in existing_specs:
        s_sig = [
            (_source_name(meta, pf["source-id"]), pf["transform"])
            for pf in s["fields"]
        ]
        if s_sig == sig:
            spec_id = s["spec-id"]
            spec_fields = s["fields"]
            break
    if spec_id is None:
        next_fid = (meta or {}).get("last-partition-id", 999) + 1
        spec_fields = [
            {
                "name": _partition_field_name(src, transform),
                "transform": transform,
                "source-id": col_ids[src],
                "field-id": next_fid + i,
            }
            for i, (src, transform) in enumerate(partition_by)
        ]
        spec_id = (
            max((s["spec-id"] for s in existing_specs), default=-1) + 1
        )
        all_specs = existing_specs + [
            {"spec-id": spec_id, "fields": spec_fields}
        ]
    else:
        all_specs = existing_specs
    last_partition_id = max(
        (pf["field-id"] for s in all_specs for pf in s["fields"]),
        default=999,
    )

    seq = (meta.get("last-sequence-number", 0) if meta else 0) + 1
    snapshot_id = seq  # deterministic, unique within the table
    commit_uuid = uuid.uuid4().hex

    # ---- data files: Spark writes, we inventory --------------------------
    # the commit uuid in the path makes a retried commit (crash after
    # the parquet write, before the version-hint swap) land in a FRESH
    # dir instead of tripping errorifexists on the orphan; unreferenced
    # orphan dirs are invisible to readers (manifests are the source of
    # truth) and reclaimable by table maintenance
    data_dir = os.path.join(
        root, "data", f"commit-{snapshot_id:05d}-{commit_uuid[:8]}"
    )
    part_cols = [
        f"_p_{pf['name']}" for pf in spec_fields
    ]
    out_df = df
    for pf, pcol in zip(spec_fields, part_cols):
        src = _source_name_from_ids(col_ids, pf["source-id"])
        out_df = out_df.withColumn(
            pcol, _transform_col(src, pf["transform"])
        )
    writer = out_df.write.mode("errorifexists")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(data_dir)

    kinds = _result_kinds(spec_fields, ice_schema["fields"])
    files = _inventory_parquet(data_dir, spec_fields, part_cols, kinds)

    # ---- manifest ---------------------------------------------------------
    mdir = _metadata_dir(root)
    manifest_path = os.path.join(mdir, f"{commit_uuid}-m0.avro")
    entries = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0,
                "file_path": f["file_path"],
                "file_format": "PARQUET",
                "partition": f["partition"],
                "record_count": f["record_count"],
                "file_size_in_bytes": f["file_size_in_bytes"],
            },
        }
        for f in files
    ]
    write_avro_file(
        manifest_path,
        _manifest_entry_schema(spec_fields, kinds),
        entries,
        metadata={
            "schema": json.dumps(ice_schema).encode(),
            "partition-spec": json.dumps(spec_fields).encode(),
            "partition-spec-id": str(spec_id).encode(),
            "format-version": b"2",
            "content": b"data",
        },
    )

    new_manifest = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": spec_id,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(f["record_count"] for f in files),
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": _summaries(files, spec_fields, kinds),
    }
    carried: list[dict] = []
    if mode == "append" and meta is not None:
        prev = _resolve_snapshot(meta, None)
        if prev is not None:
            _, carried = read_avro_file(
                _relocate(prev["manifest-list"], meta, root)
            )

    mlist_path = os.path.join(
        mdir, f"snap-{snapshot_id}-1-{commit_uuid}.avro"
    )
    write_avro_file(
        mlist_path,
        _MANIFEST_FILE_SCHEMA,
        [new_manifest] + carried,
        metadata={
            "format-version": b"2",
            "snapshot-id": str(snapshot_id).encode(),
            "sequence-number": str(seq).encode(),
        },
    )

    # ---- table metadata ----------------------------------------------------
    import time

    now_ms = int(time.time() * 1000)
    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "summary": {
            "operation": "append" if mode == "append" else "overwrite",
            **(extra_summary or {}),
        },
        "manifest-list": mlist_path,
        "schema-id": 0,
    }
    if meta is not None and meta.get("current-snapshot-id", -1) not in (
        -1,
        None,
    ):
        snapshot["parent-snapshot-id"] = meta["current-snapshot-id"]

    new_meta = {
        "format-version": 2,
        "table-uuid": (meta or {}).get("table-uuid", str(uuid.uuid4())),
        "location": (meta or {}).get("location", root),
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": len(ice_schema["fields"]),
        "current-schema-id": 0,
        "schemas": [ice_schema],
        "default-spec-id": spec_id,
        "partition-specs": all_specs,
        "last-partition-id": last_partition_id,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": snapshot_id,
        "snapshots": ((meta or {}).get("snapshots", [])) + [snapshot],
        "snapshot-log": ((meta or {}).get("snapshot-log", []))
        + [{"timestamp-ms": now_ms, "snapshot-id": snapshot_id}],
        "metadata-log": [],
    }
    new_version = version + 1
    meta_path = os.path.join(mdir, f"v{new_version}.metadata.json")
    tmp = f"{meta_path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(new_meta, fh, indent=1)
    os.replace(tmp, meta_path)
    hint_tmp = os.path.join(mdir, f"version-hint.tmp-{os.getpid()}")
    with open(hint_tmp, "w") as fh:
        fh.write(str(new_version))
    os.replace(hint_tmp, os.path.join(mdir, "version-hint.text"))
    return snapshot_id


# ---------------------------------------------------------------------------
# table maintenance (expire snapshots, orphan cleanup)
# ---------------------------------------------------------------------------


def _snapshot_reachable(
    meta: dict, root: str, snapshot_ids: list[int]
) -> tuple[set[str], set[str]]:
    """(metadata avro paths, data file paths) reachable from the given
    snapshots — both as realpaths. Metadata-plane only: O(#files)."""
    avro: set[str] = set()
    data: set[str] = set()
    for sid in snapshot_ids:
        snap = _resolve_snapshot(meta, sid)
        mlist = _relocate(snap["manifest-list"], meta, root)
        avro.add(os.path.realpath(mlist))
        _, manifests = read_avro_file(mlist)
        for mf in manifests:
            avro.add(
                os.path.realpath(_relocate(mf["manifest_path"], meta, root))
            )
        for f in plan_files(root, sid):
            data.add(os.path.realpath(f["file_path"]))
    return avro, data


def expire_snapshots(root: str, keep_last: int = 1) -> list[int]:
    """Expire all but the most recent ``keep_last`` snapshots (the
    current snapshot is always retained): a new metadata version is
    committed with the expired snapshots removed from ``snapshots`` /
    ``snapshot-log``, then manifest-list/manifest avro files and DATA
    files reachable ONLY from expired snapshots are deleted. Time
    travel to an expired snapshot stops resolving — exactly upstream
    ``expireSnapshots`` semantics. Metadata-plane planning throughout
    (no row data read). Returns the expired snapshot ids."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    meta = load_metadata(root)
    snaps = sorted(meta.get("snapshots", []), key=lambda s: s["sequence-number"])
    if len(snaps) <= keep_last:
        return []
    cur = meta.get("current-snapshot-id")
    keep = {s["snapshot-id"] for s in snaps[-keep_last:]}
    if cur is not None and cur != -1:
        keep.add(cur)
    expired = [s["snapshot-id"] for s in snaps if s["snapshot-id"] not in keep]
    if not expired:
        return []

    keep_avro, keep_data = _snapshot_reachable(meta, root, sorted(keep))
    exp_avro, exp_data = _snapshot_reachable(meta, root, expired)

    # commit the pruned metadata FIRST (readers of the new version can
    # never see the doomed files), then delete; a crash in between
    # leaves unreferenced files for remove_orphan_files to reclaim
    new_meta = dict(meta)
    new_meta["snapshots"] = [
        s for s in meta.get("snapshots", []) if s["snapshot-id"] in keep
    ]
    new_meta["snapshot-log"] = [
        e
        for e in meta.get("snapshot-log", [])
        if e["snapshot-id"] in keep
    ]
    mdir = _metadata_dir(root)
    version = int(
        os.path.basename(current_metadata_path(root))[1:].split(".")[0]
    )
    meta_path = os.path.join(mdir, f"v{version + 1}.metadata.json")
    tmp = f"{meta_path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(new_meta, fh, indent=1)
    os.replace(tmp, meta_path)
    hint_tmp = os.path.join(mdir, f"version-hint.tmp-{os.getpid()}")
    with open(hint_tmp, "w") as fh:
        fh.write(str(version + 1))
    os.replace(hint_tmp, os.path.join(mdir, "version-hint.text"))

    for p in sorted((exp_avro - keep_avro) | (exp_data - keep_data)):
        try:
            os.remove(p)
        except FileNotFoundError:
            pass
    return expired


def remove_orphan_files(root: str, dry_run: bool = False) -> list[str]:
    """Delete data directories no snapshot references (crashed commit
    attempts — the write path gives every attempt a unique
    ``commit-NNNNN-<uuid>`` dir, so a retry never collides and the
    orphan is exactly the whole abandoned dir). Conservative contract:
    a dir is removed only when NONE of its files are reachable from ANY
    retained snapshot; partially-referenced dirs are left untouched.
    Single-writer table semantics (HadoopTables without a lock manager):
    run this only while no commit is in flight. Returns removed dirs."""
    meta = load_metadata(root)
    sids = [s["snapshot-id"] for s in meta.get("snapshots", [])]
    _avro, reachable = _snapshot_reachable(meta, root, sids)
    data_root = os.path.join(root, "data")
    removed: list[str] = []
    if not os.path.isdir(data_root):
        return removed
    for dirpath, _dirs, files in os.walk(data_root):
        live = [
            f
            for f in files
            if os.path.realpath(os.path.join(dirpath, f)) in reachable
        ]
        payload = [f for f in files if f.endswith(".parquet")]
        if payload and not live:
            removed.append(dirpath)
    for d in sorted(removed, reverse=True):
        if not dry_run:
            import shutil as _sh

            _sh.rmtree(d, ignore_errors=True)
    return removed


def check_table(root: str) -> dict:
    """Metadata/file consistency audit (the `table doctor` command):

    - version-hint resolves to a readable metadata file
    - the current snapshot and every retained snapshot resolve, their
      manifest lists and manifests are readable
    - every live data file exists, and its parquet footer row count
      equals the manifest's record_count (footer-only read — no data
      pages touched, O(#files) like the rest of the metadata plane)
    - orphan data dirs are reported (not removed)

    Returns {"ok": bool, "snapshots": n, "files": n, "rows": n,
    "errors": [...], "orphans": [...]}."""
    import pyarrow.parquet as pq

    errors: list[str] = []
    try:
        meta = load_metadata(root)
    except (FileNotFoundError, ValueError, json.JSONDecodeError) as e:
        return {
            "ok": False, "snapshots": 0, "files": 0, "rows": 0,
            "errors": [f"metadata unreadable: {e}"], "orphans": [],
        }
    snaps = meta.get("snapshots", [])
    n_files = 0
    n_rows = 0
    seen: set[str] = set()
    for s in snaps:
        sid = s["snapshot-id"]
        try:
            files = plan_files(root, sid)
        except Exception as e:  # unreadable manifest chain
            errors.append(f"snapshot {sid}: plan failed: {e}")
            continue
        for f in files:
            p = os.path.realpath(f["file_path"])
            if p in seen:
                continue
            seen.add(p)
            n_files += 1
            if not os.path.exists(p):
                errors.append(f"snapshot {sid}: missing data file {p}")
                continue
            try:
                actual = pq.ParquetFile(p).metadata.num_rows
            except Exception as e:
                errors.append(f"{p}: unreadable parquet footer: {e}")
                continue
            if actual != f["record_count"]:
                errors.append(
                    f"{p}: manifest record_count {f['record_count']} "
                    f"!= parquet footer {actual}"
                )
            else:
                n_rows += actual
    orphans = remove_orphan_files(root, dry_run=True)
    return {
        "ok": not errors,
        "snapshots": len(snaps),
        "files": n_files,
        "rows": n_rows,
        "errors": errors,
        "orphans": orphans,
    }


def _source_name(meta: dict, source_id: int) -> str:
    for s in meta["schemas"]:
        for f in s["fields"]:
            if f["id"] == source_id:
                return f["name"]
    raise ValueError(f"source column id {source_id} not in schema")


def _source_name_from_ids(col_ids: dict[str, int], source_id: int) -> str:
    for name, cid in col_ids.items():
        if cid == source_id:
            return name
    raise ValueError(f"source column id {source_id} not in schema")


def _int_part_value(v: str) -> int:
    """Hive-dir string -> int partition value. Identity partitioning on
    a DATE column writes ISO 'YYYY-MM-DD' dirs (Spark renders the date
    value); the Iceberg encoding for a date partition value is int
    days-since-epoch — convert rather than crash the commit inventory."""
    try:
        return int(v)
    except ValueError:
        return day_value(v)


def _inventory_parquet(
    data_dir: str,
    spec_fields: list[dict],
    part_cols: list[str],
    kinds: list[str],
) -> list[dict]:
    """Walk Spark's output, reading partition values from the hive-style
    directory names and record counts from the parquet footers (pyarrow
    metadata read — footer only, not row data)."""
    import pyarrow.parquet as pq

    out = []
    for dirpath, _dirnames, filenames in os.walk(data_dir):
        rel = os.path.relpath(dirpath, data_dir)
        part_vals: dict[str, object] = {}
        if rel != ".":
            for seg in rel.split(os.sep):
                if "=" not in seg:
                    continue
                k, v = seg.split("=", 1)
                if k in part_cols:
                    idx = part_cols.index(k)
                    pf = spec_fields[idx]
                    from urllib.parse import unquote

                    part_vals[pf["name"]] = (
                        None
                        if v == "__HIVE_DEFAULT_PARTITION__"
                        else _int_part_value(unquote(v))
                        if kinds[idx] in ("int", "long")
                        else unquote(v)
                    )
        for fn in sorted(filenames):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(dirpath, fn)
            n = pq.ParquetFile(fp).metadata.num_rows
            out.append(
                {
                    "file_path": fp,
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(fp),
                    "partition": {
                        pf["name"]: part_vals.get(pf["name"])
                        for pf in spec_fields
                    },
                }
            )
    if not out:
        raise ValueError(f"commit produced no data files under {data_dir}")
    return out


def _summaries(files: list[dict], spec_fields: list[dict], kinds: list[str]):
    if not spec_fields:
        return None
    out = []
    for pf, kind in zip(spec_fields, kinds):
        vals = [f["partition"].get(pf["name"]) for f in files]
        non_null = [v for v in vals if v is not None]
        out.append(
            {
                "contains_null": any(v is None for v in vals),
                "contains_nan": None,
                "lower_bound": _bound_bytes(kind, min(non_null))
                if non_null
                else None,
                "upper_bound": _bound_bytes(kind, max(non_null))
                if non_null
                else None,
            }
        )
    return out
