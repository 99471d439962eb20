"""Table source/sink resolution: Iceberg identifiers or parquet paths.

The north rule targets Iceberg tables of transcripts. Iceberg support
in Spark is a catalog + a runtime jar away (`spark.sql.catalog.* =
org.apache.iceberg.spark.SparkCatalog`); the ENGINE is source-agnostic
because every operator takes a DataFrame. This module is the single
seam where a table reference becomes a DataFrame:

- ``db.table`` / ``catalog.db.table`` identifiers -> the session
  catalog (Iceberg when configured — snapshot isolation, hidden
  partitioning, time travel via ``snapshot_id``);
- a path whose directory contains ``metadata/`` -> an Iceberg table
  read through the pure-Python metadata layer (``sources/iceberg.py``:
  snapshot resolution, manifest pruning, time travel — no runtime jar
  needed; the data scan is still Spark's native parquet source);
- everything else -> a parquet path (the test fixtures mirror the
  table layout).

Readers get pushdown/pruning either way: both the Iceberg source and
the parquet source implement SupportsPushDownFilters — the plan-shape
tests in tests/test_plans.py pin that the engine's predicates actually
reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def is_table_identifier(ref: str) -> bool:
    """Heuristic: catalog identifiers have dots and no path separators;
    anything resembling a filesystem path is read as parquet."""
    return (
        "/" not in ref
        and "\\" not in ref
        and "." in ref
        and not ref.endswith(".parquet")
    )


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog class is on the JVM classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def load_table(
    spark: SparkSession, ref: str, snapshot_id: int | None = None
) -> DataFrame:
    """Resolve ``ref`` to a DataFrame.

    Identifier -> catalog table (Iceberg when the catalog is Iceberg;
    ``snapshot_id`` selects a snapshot for time travel). Path ->
    parquet directory/file."""
    if is_table_identifier(ref):
        if snapshot_id is not None:
            return (
                spark.read.option("snapshot-id", str(snapshot_id))
                .format("iceberg")
                .load(ref)
            )
        return spark.table(ref)
    from xf_spark.sources import iceberg as ice

    if ice.is_iceberg_table(ref):
        return ice.read_iceberg(spark, ref, snapshot_id=snapshot_id)
    if snapshot_id is not None:
        raise ValueError("snapshot_id requires an Iceberg table")
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append") -> None:
    """Write to an identifier (catalog/Iceberg: ``writeTo`` v2 path —
    atomic snapshot commit) or a parquet path (directory overwrite /
    append)."""
    if is_table_identifier(ref):
        writer = df.writeTo(ref)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(ref)


def load_transcript_table(spark: SparkSession, ref: str, **kw) -> DataFrame:
    """Transcript loader used by the CLI/facade: any source shape, one
    pinned column contract (BASELINE.json input_hint)."""
    df = load_table(spark, ref, **kw)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"transcript table {ref!r} missing columns: {missing}")
    return df.select(*cols)
