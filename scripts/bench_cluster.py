"""N-vs-4N EXECUTOR scaling evidence via spark-submit --py-files.

The north rule specifies: "runs via spark-submit --py-files on a
multi-executor cluster at two cluster sizes (N and 4N executors) with
throughput scaling efficiency >= 0.8". This sandbox has no real
cluster, but Spark's local-cluster master gives REAL multi-executor
deployments — separate executor JVMs, real netty shuffle, broadcast
serialization, python workers per executor — on one box. This script
runs the SAME index build at local-cluster[1,C] and local-cluster[4,C]
(1 vs 4 executors, C = $XF_CLUSTER_CORES_PER cores each, default 2 so
the 4N side stays inside this host's DRAM-bandwidth regime) and
reports throughput at both plus the scaling efficiency.

Caveat (measured, see BENCH.md): this host's DRAM bandwidth saturates
at ~8 concurrent memory-heavy streams, so 16 total cores is already
past the single-box memory-bandwidth knee — a real 4-node cluster has
4 memory controllers and scales better than this proxy.

Usage:  python scripts/bench_cluster.py            # parent: runs both
        (internal)  spark-submit ... bench_cluster.py --inner
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE = float(os.environ.get("XF_CLUSTER_SCALE", "0.25"))
# Efficiency is scale-sensitive on the HI side: the build carries a
# roughly constant ~10 s of driver-side stages (range-partitioner
# sampling, per-slice commit, meta writes) that more executors cannot
# shrink — at scale 0.25 that is ~25% of the 4-executor wall clock and
# caps measured efficiency near 0.75 even when the parallel fraction
# scales perfectly. Larger XF_CLUSTER_SCALE amortizes it (Amdahl), at
# the cost of a longer lo-side run.
RUNS = 1  # one timed build per submit; the parent interleaves
# lo/hi rounds and takes best-of-2 per side (variance handling)


def inner() -> None:
    import shutil

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("xf_cluster_bench").getOrCreate()
    from xf_spark.functions.udfs import tokenize_udf
    from xf_spark.index.segments import build_index
    from xf_spark.transcripts import ensure_transcripts_parquet

    fixture = ensure_transcripts_parquet(SCALE)
    tr = spark.read.parquet(fixture)
    n = tr.count()
    # warm: registers executors + spools python workers outside timing
    tr.limit(2000).select(tokenize_udf(F.col("text"))).count()
    execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    best = None
    out_dir = tempfile.mkdtemp(prefix="xf_cluster_seg_")
    for _ in range(RUNS):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        build_index(tr, out_dir, n_shards=64, n_buckets=64, slices=2)
        sec = time.time() - t0
        best = sec if best is None else min(best, sec)
    # rank-identity evidence: the north rule's top-k must not depend on
    # the executor count, so each side reports its full top-20 (doc_id,
    # score) lists and the parent asserts byte-equality across 1-vs-4
    # executor deployments (global-stats scoring + pinned tiebreaks
    # make this exact, not approximate — tested in local mode, proven
    # here on REAL executor JVMs with real shuffle)
    from xf_spark.query.segment_search import SegmentIndex

    ix = SegmentIndex.load(spark, out_dir)
    topk = {
        q: [
            [int(r["doc_id"]), round(float(r["score"]), 9)]
            for r in ix.search(q, limit=20).collect()
        ]
        for q in ("machine", "rust AND async", '"machine learning"', "progr*")
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    print(
        "XF_CLUSTER_RESULT "
        + json.dumps(
            {
                "executors": execs,
                "turns": n,
                "build_sec": round(best, 2),
                "turns_per_sec": round(n / best, 1),
                "topk": topk,
            }
        )
    )
    spark.stop()


def run_one(n_executors: int, cores: int, zip_path: str) -> dict:
    import pyspark

    spark_home = os.path.dirname(pyspark.__file__)
    env = dict(os.environ)
    env["XF_SPARK_FIXTURES_DIR"] = os.path.join(REPO, "fixtures")
    env.setdefault("SPARK_HOME", spark_home)
    cmd = [
        os.path.join(spark_home, "bin", "spark-submit"),
        "--master",
        f"local-cluster[{n_executors},{cores},4096]",
        # mirror xf_spark.session.get_spark's pinned tuning (the inner
        # session is built by spark-submit, not the factory): scan
        # splitting so a single fixture file parallelizes, Arrow UDFs,
        # AQE, UTC
        "--conf",
        f"spark.sql.shuffle.partitions={max(2 * n_executors * cores, 4)}",
        "--conf",
        "spark.driver.memory=4g",
        "--conf",
        "spark.sql.files.maxPartitionBytes=262144",
        "--conf",
        "spark.sql.files.openCostInBytes=65536",
        "--conf",
        "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf",
        "spark.sql.adaptive.enabled=true",
        "--conf",
        "spark.sql.adaptive.coalescePartitions.enabled=true",
        "--conf",
        "spark.sql.session.timeZone=UTC",
        "--py-files",
        zip_path,
        os.path.abspath(__file__),
        "--inner",
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=900, cwd=REPO
    )
    for line in out.stdout.splitlines():
        if line.startswith("XF_CLUSTER_RESULT "):
            return json.loads(line[len("XF_CLUSTER_RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
    raise RuntimeError(f"no result from local-cluster[{n_executors},{cores}]")


CORES_PER = int(os.environ.get('XF_CLUSTER_CORES_PER', '2'))


def main() -> None:
    zip_path = os.path.join(tempfile.gettempdir(), "xf_spark_cluster.zip")
    pkg = os.path.join(REPO, "xf_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    # 2 cores/executor: 1x2 vs 4x2 = 2 vs 8 total cores — inside the
    # regime this host can physically scale (DRAM saturates at ~8
    # memory-heavy streams; 4x4=16 cores measured eff 0.57 purely from
    # the bandwidth wall, see BENCH.md). INTERLEAVED best-of-2 per
    # side: host contention windows span minutes, so sequential
    # lo-then-hi lets one side eat a window the other misses
    # (observed ratios 0.70 and 1.10 on identical binaries).
    lo = hi = None
    for _ in range(2):
        os.system("sync")
        lo1 = run_one(1, CORES_PER, zip_path)
        os.system("sync")
        hi1 = run_one(4, CORES_PER, zip_path)
        if lo is None or lo1["turns_per_sec"] > lo["turns_per_sec"]:
            lo = lo1
        if hi is None or hi1["turns_per_sec"] > hi["turns_per_sec"]:
            hi = hi1
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / 4.0
    rank_identical = lo.pop("topk") == hi.pop("topk")
    if not rank_identical:
        raise SystemExit(
            "rank-identity violated between 1 and 4 executors — "
            "top-k lists differ"
        )
    print(
        json.dumps(
            {
                "metric": "index build throughput, N vs 4N executors "
                "(spark-submit --py-files, local-cluster)",
                "scale": SCALE,
                "lo": lo,
                "hi": hi,
                "speedup": round(hi["turns_per_sec"] / lo["turns_per_sec"], 3),
                "efficiency": round(eff, 3),
                "rank_identical_topk": rank_identical,
            }
        )
    )


if __name__ == "__main__":
    if "--inner" in sys.argv:
        inner()
    else:
        main()
