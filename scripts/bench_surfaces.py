"""Scale-1.0 bench for the round-3/4 query surfaces (VERDICT item 7).

Builds a lexical-only segment index over the deterministic seed-42
transcripts at --scale (default 1.0 = 1,571,669 turns), then measures
warm p50 for the aggregation / pagination / ranking-extension
surfaces, plus the sorted-vocab-artifact first-hit story (novel
wildcard via the artifact vs the segments-table fallback scan).

Usage: python scripts/bench_surfaces.py [--scale 1.0] [--cores 32]
Prints one JSON line.
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

RUNS = 5


def p50(fn, runs: int = RUNS) -> float:
    fn()  # warm
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(sorted(ts)[runs // 2], 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--build-cores", type=int, default=16)
    args = ap.parse_args()

    from xf_spark.engine import XfIndex
    from xf_spark.query.percolate import percolate
    from xf_spark.session import get_spark, quiet_stop
    from xf_spark.transcripts import ensure_transcripts_parquet

    fixture = ensure_transcripts_parquet(args.scale)
    tmp = tempfile.mkdtemp(prefix="xf_surface_bench_")
    path = os.path.join(tmp, "ix")
    out: dict = {"scale": args.scale}
    spark = get_spark(
        "surfbench", cores=args.cores, shuffle_partitions=args.cores
    )
    try:
        tr = spark.read.parquet(fixture)
        n = tr.count()
        out["turns"] = n
        t0 = time.time()
        fx = XfIndex.build(
            tr, path, with_embeddings=False, n_shards=64, n_buckets=64,
            slices=2,
        )
        out["build_sec"] = round(time.time() - t0, 2)
        fx = fx.cache(pin_docs_mb=8192, warm_top_terms=64)
        ix = fx.segment_index

        out["facet_role_p50"] = p50(
            lambda: fx.facet_counts("machine", facet="role").collect()
        )
        out["facet_day_p50"] = p50(
            lambda: fx.facet_counts("machine", facet="date:day").collect()
        )
        out["facets_multi_p50"] = p50(
            lambda: fx.facet_counts_multi(
                "machine", facets=["role", "date:month"]
            )
        )
        out["facet_top_hits_p50"] = p50(
            lambda: fx.facet_top_hits("machine", facet="role", k=3).collect()
        )
        out["collapse_p50"] = p50(
            lambda: fx.search_collapsed(
                "machine", limit=20, hydrate=False
            ).collect()
        )
        out["count_p50"] = p50(lambda: fx.count_matches("machine"))
        out["significant_terms_p50"] = p50(
            lambda: fx.significant_terms("machine", limit=10).collect()
        )

        # search_after: page 1 then the cursor page (the pagination
        # replay shape — page 2 strictly after page 1's last hit)
        page1 = ix.search("machine", limit=20).collect()
        cursor = (float(page1[-1]["score"]), int(page1[-1]["doc_id"]))
        out["search_after_p50"] = p50(
            lambda: ix.search("machine", limit=20, after=cursor).collect()
        )

        out["rescore_p50"] = p50(
            lambda: ix.search_rescored(
                "machine", '"machine learning"', window=100, weight=2.0,
                limit=20,
            ).collect()
        )
        out["decay_p50"] = p50(
            lambda: ix.search_decayed(
                "machine", half_life_days=90.0, limit=20
            ).collect()
        )

        # percolate throughput: 5 registered alerts over the whole
        # corpus in one shuffle-free pass
        alerts = [
            ("q1", '"machine learning"'),
            ("q2", "rust AND async"),
            ("q3", "python NOT snake"),
            ("q4", "ma?hine"),
            ("q5", "data stream"),
        ]
        docs = fx.docs
        percolate(docs, alerts).count()  # warm
        t0 = time.time()
        percolate(docs, alerts).count()
        out["percolate_docs_per_s"] = round(n / (time.time() - t0), 1)

        # sorted-vocab artifact: build cost, then FIRST-HIT latency for
        # novel dictionary patterns via the artifact vs the segments-
        # table fallback scan (what every first hit paid before round 4)
        t0 = time.time()
        v = ix._vocab_df()
        n_terms = v.count()
        out["vocab_build_sec"] = round(time.time() - t0, 2)
        out["vocab_terms"] = n_terms

        from pyspark.sql import functions as F

        def novel_wildcard(pat, lit):
            from xf_spark.query.parser import wildcard_to_like

            return (
                ix._vocab_df()
                .where(
                    F.col("term").startswith(lit)
                    & F.col("term").like(wildcard_to_like(pat))
                )
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(50)
                .collect()
            )

        def fallback_wildcard(pat, lit):
            from xf_spark.query.parser import wildcard_to_like

            return (
                ix._segments.where(
                    (F.col("field") == "text")
                    & F.col("term").startswith(lit)
                    & F.col("term").like(wildcard_to_like(pat))
                )
                .groupBy("term")
                .agg(F.sum("n_docs").alias("df"))
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(50)
                .collect()
            )

        out["wildcard_artifact_p50"] = p50(
            lambda: novel_wildcard("te*m", "te")
        )
        out["wildcard_fallback_p50"] = p50(
            lambda: fallback_wildcard("te*m", "te")
        )
        # end-to-end first hit: novel pattern through the full search
        # path (expansion + decode + top-k), artifact already built
        t0 = time.time()
        ix.search("ma?hines", limit=20).collect()
        out["wildcard_first_hit_e2e_sec"] = round(time.time() - t0, 4)

        print(json.dumps(out))
    finally:
        quiet_stop(spark)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
