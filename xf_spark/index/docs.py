"""Document preparation: stable, dense, deterministic doc IDs.

The engine's docID invariant (SURVEY.md §7.0, mirroring the
reference's sorted vector file vector.rs:306-310 and the
``ORDER BY created_at, id`` conversation ordering storage.rs:1360-1387):

    doc_id = dense global rank over (conv_id, turn_idx)

computed WITHOUT a single-partition global window. The scalable shape:

1. range-repartition + sort within partitions on the ordering key —
   a total order across ordered disjoint partitions;
2. one cheap pass counts rows per partition (count-only aggregate);
3. the driver prefix-sums the counts (O(#partitions), tiny) and
   broadcasts the offsets;
4. a mapInPandas pass assigns doc_id = offset[pid] + local_row.

This is the classic zipWithIndex-on-sorted-data pattern: two scans, no
shuffle beyond the range partitioning, no driver collect of data rows —
it holds at 10^12 rows where a ``row_number() OVER (ORDER BY ...)``
window (one reducer) would not.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _ordered_with_offsets(
    df: DataFrame, order_cols: list[str], num_partitions: int | None
):
    """Shared core of the docID machinery: range-repartition + sort
    within partitions, MATERIALIZE, count rows per partition, driver
    prefix-sum -> (ordered_cached_df, broadcast{pid: offset}).

    The cache is LOAD-BEARING for correctness, not a performance
    tweak: the counts job and the assign job MUST see the same
    partition boundaries, and a re-executed repartitionByRange
    re-samples (AQE re-plans per action) — without materialization
    the two jobs can disagree and silently shift doc_ids (observed:
    off-by-one dl corruption at partition boundaries). Callers must
    unpersist the returned frame (exposed as ``_ordered_cache`` on
    their output) once downstream state is materialized."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .cache()
    )
    # pass 1: per-partition row counts (count-only, no data movement)
    counts = (
        ordered.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    bc = ordered.sparkSession.sparkContext.broadcast(offsets)
    return ordered, bc


def assign_doc_ids(
    df: DataFrame,
    order_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` plus a dense int64 ``doc_id`` column ranking rows
    by ``order_cols`` (default: conv_id, turn_idx). Deterministic for
    any partition count as long as the ordering key is unique."""
    order_cols = order_cols or ["conv_id", "turn_idx"]
    ordered, bc = _ordered_with_offsets(df, order_cols, num_partitions)

    from pyspark.sql import types as T

    schema = T.StructType(
        list(ordered.schema.fields) + [T.StructField("doc_id", T.LongType())]
    )

    def add_ids(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        local = bc.value.get(pid, 0)
        for pdf in pdf_iter:
            n = len(pdf)
            pdf = pdf.copy()
            pdf["doc_id"] = range(local, local + n)
            local += n
            yield pdf

    out = ordered.mapInPandas(add_ids, schema=schema)
    # release handle for the intermediate sorted cache (see
    # prepare_docs_tokenized) — consumers unpersist after materializing
    out._ordered_cache = ordered
    return out


def prepare_docs_tokenized(
    transcripts: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Single-pass docID assignment + tokenization: the mapInPandas
    that assigns doc_id also emits the per-doc flat posting arrays for
    both index fields (terms/tfs/positions + prefix terms/tfs + dl).
    One scan, one cacheable output — the build's pre-phase collapses
    from two UDF passes to one."""
    from xf_spark.functions.hash_embed import DIM  # noqa: F401 (keep import graph warm)
    from xf_spark.functions.textcore import generate_prefixes, tokenize

    ordered, bc = _ordered_with_offsets(
        transcripts, ["conv_id", "turn_idx"], num_partitions
    )

    from pyspark.sql import types as T

    schema = T.StructType(
        list(ordered.schema.fields)
        + [
            T.StructField("doc_id", T.LongType()),
            T.StructField("terms", T.ArrayType(T.StringType())),
            T.StructField("tfs", T.ArrayType(T.IntegerType())),
            T.StructField("pos_lens", T.ArrayType(T.IntegerType())),
            T.StructField("pos_flat", T.ArrayType(T.IntegerType())),
            T.StructField("p_terms", T.ArrayType(T.StringType())),
            T.StructField("p_tfs", T.ArrayType(T.IntegerType())),
            T.StructField("dl", T.IntegerType()),
        ]
    )

    def assign_and_tokenize(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        local = bc.value.get(pid, 0)
        for pdf in pdf_iter:
            n = len(pdf)
            pdf = pdf.copy()
            pdf["doc_id"] = range(local, local + n)
            local += n
            cols = {k: [] for k in ("terms", "tfs", "pos_lens", "pos_flat", "p_terms", "p_tfs", "dl")}
            for text in pdf["text"]:
                text = text or ""
                acc_t: dict = {}
                toks = tokenize(text)
                for pos, t in enumerate(toks):
                    acc_t.setdefault(t, []).append(pos)
                items = sorted(acc_t.items())
                cols["terms"].append([t for t, _ in items])
                cols["tfs"].append([len(ps) for _, ps in items])
                cols["pos_lens"].append([len(ps) for _, ps in items])
                cols["pos_flat"].append([p for _, ps in items for p in ps])
                acc_p: dict = {}
                for p in generate_prefixes(text):
                    acc_p[p] = acc_p.get(p, 0) + 1
                pitems = sorted(acc_p.items())
                cols["p_terms"].append([t for t, _ in pitems])
                cols["p_tfs"].append([c for _, c in pitems])
                cols["dl"].append(len(toks))
            for k, v in cols.items():
                pdf[k] = v
            yield pdf

    out = ordered.mapInPandas(assign_and_tokenize, schema=schema)
    # expose the intermediate cache for release after downstream
    # materialization (two full text copies = memory pressure)
    out._ordered_cache = ordered
    return out


def prepare_docs(transcripts: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Transcripts -> unified doc table with stable doc_id.

    Output: (doc_id long, conv_id, turn_idx, role, text, tool, ts) —
    the analog of the reference's unified Tantivy doc space
    (search.rs:213-247): one searchable doc per turn, role as the
    doc-type filter field, ts as the FAST range/sort field."""
    return assign_doc_ids(transcripts, ["conv_id", "turn_idx"], num_partitions)
