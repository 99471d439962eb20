"""Streaming-ingest throughput bench (SURVEY.md §2.13 evidence).

Splits the seed-42 transcripts fixture into N parquet drops, streams
them through `stream_index` (availableNow micro-batches, versioned
cutover, checkpointed resume), and reports end-to-end ingest
throughput plus a post-ingest query sanity check against a flat
build. Prints one JSON line.

Usage: python scripts/bench_streaming.py [--scale 0.1] [--batches 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if HERE not in sys.path:
    sys.path.insert(0, HERE)
os.environ["PYTHONPATH"] = HERE + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--compact-every", type=int, default=4)
    ap.add_argument(
        "--max-files-per-trigger", type=int, default=1,
        help="micro-batch size in file drops: 1 = every drop is its own "
        "checkpointed batch+cutover (max freshness, max fixed cost); "
        "larger = the operating point a throughput-focused user picks",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from xf_spark.query.segment_search import SegmentIndex
    from xf_spark.session import get_spark, quiet_stop
    from xf_spark.streaming.ingest import current_index_path, stream_index
    from xf_spark.transcripts import ensure_transcripts_parquet

    fixture = ensure_transcripts_parquet(args.scale)
    tmp = tempfile.mkdtemp(prefix="xf_stream_bench_")
    in_dir = os.path.join(tmp, "in")
    root = os.path.join(tmp, "root")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(in_dir)
    spark = get_spark("streambench", cores=args.cores,
                      shuffle_partitions=args.cores)
    try:
        tr = spark.read.parquet(fixture)
        n = tr.count()
        # N file drops: the stream discovers one file per micro-batch
        # trigger group (availableNow drains them all)
        convs = tr.select(
            (F.crc32(F.col("conv_id")) % args.batches).alias("b"), "*"
        )
        for b in range(args.batches):
            (
                convs.where(F.col("b") == b).drop("b")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(tmp, f"stage{b}"))
            )
            for f in os.listdir(os.path.join(tmp, f"stage{b}")):
                if f.endswith(".parquet"):
                    os.rename(
                        os.path.join(tmp, f"stage{b}", f),
                        os.path.join(in_dir, f"drop{b}.parquet"),
                    )
        t0 = time.time()
        q = stream_index(
            spark, in_dir, root, ckpt,
            available_now=True,
            compact_every=args.compact_every,
            max_files_per_trigger=args.max_files_per_trigger,
            with_embeddings=False, n_shards=16, n_buckets=16, slices=1,
        )
        q.awaitTermination()
        wall = time.time() - t0
        cur = current_index_path(root)
        ix = SegmentIndex.load(spark, cur)
        hits = ix.search("machine", limit=20).collect()
        versions = sorted(
            d for d in os.listdir(root) if d.startswith("v")
        )
        print(json.dumps({
            "scale": args.scale,
            "turns": n,
            "batches": args.batches,
            "max_files_per_trigger": args.max_files_per_trigger,
            "compact_every": args.compact_every,
            "ingest_sec": round(wall, 2),
            "turns_per_sec": round(n / wall, 1),
            "n_versions": len(versions),
            "indexed_docs": int(ix.meta["n_docs"]),
            "query_ok": len(hits) == 20,
        }))
    finally:
        quiet_stop(spark)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
