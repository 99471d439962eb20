"""Measure what slice compaction buys at query time.

Builds an index over the first chunk of the synthetic transcript
fixture at $SPARK_GRAFT_SCALE (default 0.01), appends the rest in K
micro-batch-sized deltas (simulating streaming ingest), then measures
cold + warm query
latency and segment-row fanout on the multi-slice index vs after
`XfIndex.compact()`. Also reports compaction wall time and the purge
variant (drop = exact-dup losers).

Usage: python scripts/bench_compact.py [K_APPENDS]
Prints one JSON line. Numbers on this host carry ±2-3x contention
noise (BENCH.md) — per-query values are min-of-N.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["machine", '"machine learning"', "rust AND async", "progr*"]
N_REPS = 5


def _time_queries(ix):
    """min-of-N latency per query; cold = first run after load (term
    cache empty), warm = subsequent runs (driver NumPy path)."""
    out_cold, out_warm = {}, {}
    for q in QUERIES:
        times = []
        for _ in range(N_REPS):
            t0 = time.time()
            ix.segment_index.search(q, limit=20).collect()
            times.append(time.time() - t0)
        out_cold[q] = round(times[0], 4)
        out_warm[q] = round(min(times[1:]), 4)
    return out_cold, out_warm


def main():
    k_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    scale = float(os.environ.get("SPARK_GRAFT_SCALE", "0.01"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    from pyspark.sql import functions as F

    from xf_spark.engine import XfIndex
    from xf_spark.session import get_spark
    from xf_spark.transcripts import load_transcripts

    spark = get_spark("bench_compact", cores=cpus, shuffle_partitions=max(8, cpus))
    tr = load_transcripts(spark, scale)
    convs = [r[0] for r in tr.select("conv_id").distinct().orderBy("conv_id").collect()]
    n_parts = k_appends + 1
    bounds = [convs[i * len(convs) // n_parts] for i in range(1, n_parts)]
    root = tempfile.mkdtemp(prefix="bcx_")
    path = os.path.join(root, "idx")

    t0 = time.time()
    first = tr.where(F.col("conv_id") < bounds[0])
    ix = XfIndex.build(first, path, with_embeddings=False, slices=1)
    for i in range(k_appends):
        lo = bounds[i]
        hi = bounds[i + 1] if i + 1 < len(bounds) else None
        delta = tr.where(
            (F.col("conv_id") >= lo)
            & ((F.col("conv_id") < hi) if hi else F.lit(True))
        )
        ix = ix.append(delta, dedup=False)
    build_sec = time.time() - t0
    meta = ix.segment_index.meta
    seg = ix.segment_index._segments
    rows_multi = seg.count()
    n_slices = int(meta["next_slice"])

    ix_multi = XfIndex.open(spark, path)  # fresh caches
    cold_m, warm_m = _time_queries(ix_multi)

    t0 = time.time()
    ix = ix.compact()
    compact_sec = time.time() - t0
    rows_comp = ix.segment_index._segments.count()

    ix_comp = XfIndex.open(spark, path)
    cold_c, warm_c = _time_queries(ix_comp)

    # purge variant: drop exact-duplicate losers
    from xf_spark.ops.dedup import exact_dedup

    keep = exact_dedup(ix.docs.select("doc_id", "text"))
    drop = ix.docs.select("doc_id").join(keep.select("doc_id"), "doc_id", "left_anti")
    n_drop = drop.count()
    t0 = time.time()
    ix = ix.compact(drop=drop)
    purge_sec = time.time() - t0

    print(
        json.dumps(
            {
                "scale": scale,
                "turns": meta["n_docs"],
                "k_appends": k_appends,
                "build_plus_appends_sec": round(build_sec, 2),
                "slices_before": n_slices,
                "segment_rows_before": rows_multi,
                "segment_rows_after": rows_comp,
                "compact_sec": round(compact_sec, 2),
                "cold_ms_multi": {q: round(v * 1000, 1) for q, v in cold_m.items()},
                "cold_ms_compacted": {q: round(v * 1000, 1) for q, v in cold_c.items()},
                "warm_ms_multi": {q: round(v * 1000, 1) for q, v in warm_m.items()},
                "warm_ms_compacted": {q: round(v * 1000, 1) for q, v in warm_c.items()},
                "purge_n_dropped": n_drop,
                "purge_sec": round(purge_sec, 2),
                "n_docs_after_purge": ix.segment_index.meta["n_docs"],
            }
        )
    )
    import shutil

    shutil.rmtree(root)


if __name__ == "__main__":
    main()
