"""High-cardinality vocabulary benchmark (round-4 VERDICT item #4).

The seed-42 english corpus has ~711 distinct terms, so the sorted
vocabulary artifact, the wildcard/fuzzy expansion caps, and head-term
build salting are all exercised in a toy regime by the main bench.
This script runs the same surfaces over the deterministic
zipf-vocabulary table (120k distinct dictionary terms, Zipf(1.2) token
ranks — the rank-1 term alone carries ~18% of all tokens):

1. BUILD over ~200k turns / ~4.8M tokens: turns/sec + the per-slice
   head-term skew ratio the salted (term, shard) key is about.
2. Vocabulary artifact build time (one distributed aggregate,
   persisted term-sorted).
3. Multiterm expansion first-hit latency, artifact vs fallback —
   the SAME novel leaves resolved on two fresh index instances, one
   reading the sorted artifact (parquet min/max range pruning), one
   forced onto the segments-aggregate fallback path (read-only index
   dir, the honest degraded mode). The asymptotic claim in
   segment_search._vocab_df's docstring is graded on this gap.

Prints one JSON line; run: python scripts/bench_zipf_vocab.py
"""

from __future__ import annotations

import json
import os
import shutil
import stat
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if HERE not in sys.path:
    sys.path.insert(0, HERE)
os.environ["PYTHONPATH"] = HERE + os.pathsep + os.environ.get("PYTHONPATH", "")

N_TURNS = 400_000
# 12M-term dictionary: at 120k terms (and still at 1.2M) BOTH
# expansion paths sat on the ~0.1-0.3s local job floor and the
# artifact's range pruning could not show above it; at 12M the
# fallback's per-call O(segments-metadata) scan+aggregate is real work
# while the artifact scan stays range-pruned — the regime the
# asymptotic claim is about. The script also records the scan-volume
# asymmetry (segments metadata rows vs artifact rows vs matched rows)
# so the asymptotic argument is quantitative even where sandbox wall
# time sits near the job floor.
VOCAB = 12_000_000

# novel leaves resolved on BOTH sides (memo is per instance, so each
# fresh index re-resolves them — identical selectivity, fair compare)
WILDCARD_LEAVES = [
    ("wildcard", "wexz*"),
    ("wildcard", "sarn*m?n"),
    ("pprefix", "quilro"),
]
FUZZY_TERMS = ["wexzanba", "cesarnzub", "monpex", "quilrost"]


def _expansion_once(ix) -> tuple:
    """One first-hit expansion sample: clear the per-instance memos so
    the sample pays the dictionary scan, then time the wildcard batch
    and the fuzzy batch."""
    ix._multiterm_memo.clear()
    ix._fuzzy_memo.clear()
    s = time.time()
    got = ix._multiterm_variants(WILDCARD_LEAVES)
    w = time.time() - s
    n_wild = sum(len(v) for v in got.values())
    s = time.time()
    fv = ix.fuzzy_variants_many(set(FUZZY_TERMS))
    f = time.time() - s
    n_fuzz = sum(len(v) for v in fv.values())
    return w, n_wild, f, n_fuzz


def main():
    from xf_spark.index.segments import build_index
    from xf_spark.query.segment_search import SegmentIndex
    from xf_spark.session import get_spark, quiet_stop
    from xf_spark.transcripts import ensure_zipf_parquet

    fixture = ensure_zipf_parquet(N_TURNS, VOCAB)
    spark = get_spark("zipfbench", cores=16, shuffle_partitions=16)
    tmp = tempfile.mkdtemp(prefix="xf_zipf_")
    seg = os.path.join(tmp, "idx")
    try:
        transcripts = spark.read.parquet(fixture)
        n_turns = transcripts.count()
        # warm workers outside the timed window (same as bench.py)
        from pyspark.sql import functions as F

        from xf_spark.functions.udfs import tokenize_udf

        transcripts.limit(2000).select(tokenize_udf(F.col("text"))).count()

        t0 = time.time()
        docs, _stats, metrics = build_index(
            transcripts, seg, n_shards=64, n_buckets=64, slices=2
        )
        build_sec = time.time() - t0
        docs.write.mode("overwrite").parquet(os.path.join(seg, "docs"))
        skew = max(m.skew_ratio for m in metrics)
        n_postings = sum(m.n_postings for m in metrics)

        docs_df = spark.read.parquet(os.path.join(seg, "docs"))
        ix = SegmentIndex.load(spark, seg, docs=docs_df).cache()

        # vocabulary artifact: build (one aggregate + sorted write)
        t0 = time.time()
        n_vocab = ix._vocab_df().count()
        vocab_build_sec = time.time() - t0
        # scan-volume asymmetry: what each expansion path must touch.
        # fallback = every (term, shard, field) metadata row of the
        # index; artifact = one row per text term, and a startswith
        # leaf prunes to the matching term RANGE via parquet min/max
        n_meta_rows = ix._segments.count()
        n_matched = (
            ix._vocab_df().where(F.col("term").startswith("wexz")).count()
        )

        # fallback instance: vocab artifact removed and the index dir
        # made read-only so _vocab_df's rebuild write fails and it
        # PERMANENTLY caches the segments aggregate on the instance
        # (the honest degraded path, not a monkeypatch). NOT .cache()d:
        # at the 10^12-turn target the segments table cannot be
        # RAM-resident, and the sandbox-sized .cache() would hide
        # exactly the full-metadata scan the artifact exists to avoid.
        shutil.rmtree(os.path.join(seg, "vocab"), ignore_errors=True)
        mode = os.stat(seg).st_mode
        os.chmod(seg, stat.S_IRUSR | stat.S_IXUSR)
        try:
            ix2 = SegmentIndex.load(spark, seg, docs=docs_df)
            ix2._vocab_df()  # write fails -> instance pinned to fallback
        finally:
            os.chmod(seg, mode)
        # rebuild + re-persist the artifact for the artifact-side
        # instance (the dir removal above invalidated its lazy scan)
        ix._vocab_cache = None
        ix._vocab_df().count()

        # INTERLEAVED per-side min (the bench.py scaling estimator —
        # measuring one side completely and then the other let a host
        # contention window land entirely on one side: observed 2.7x
        # "speedup" in one run and 0.8x in the next on identical code).
        # Each round takes one artifact sample then one fallback
        # sample; per-side min across rounds is the floor.
        art = {"wildcard_first_hit_sec": None, "fuzzy_first_hit_sec": None}
        fb = {"wildcard_first_hit_sec": None, "fuzzy_first_hit_sec": None}
        res = {"artifact": None, "fallback": None}
        probes = {
            "artifact": ix._vocab_df().where(
                F.col("term").startswith("wexz")
            ),
            "fallback": ix2._vocab_df().where(
                F.col("term").startswith("wexz")
            ),
        }
        for p in probes.values():
            p.collect()  # warm
        for _ in range(4):
            for side, engine, acc in (
                ("artifact", ix, art), ("fallback", ix2, fb),
            ):
                w, n_wild, f, n_fuzz = _expansion_once(engine)
                if acc["wildcard_first_hit_sec"] is None:
                    acc["wildcard_first_hit_sec"] = w
                    acc["fuzzy_first_hit_sec"] = f
                else:
                    acc["wildcard_first_hit_sec"] = min(
                        acc["wildcard_first_hit_sec"], w
                    )
                    acc["fuzzy_first_hit_sec"] = min(
                        acc["fuzzy_first_hit_sec"], f
                    )
                acc["wildcard_expansions"] = n_wild
                acc["fuzzy_expansions"] = n_fuzz
                # isolated DICTIONARY RESOLUTION (the asymptotic claim,
                # undiluted by the shared LIKE/levenshtein/rank
                # expansion compute): the (term, df) rows for one
                # prefix range off each representation
                s = time.time()
                probes[side].collect()
                dt = time.time() - s
                res[side] = dt if res[side] is None else min(res[side], dt)
        for acc in (art, fb):
            acc["wildcard_first_hit_sec"] = round(
                acc["wildcard_first_hit_sec"], 4
            )
            acc["fuzzy_first_hit_sec"] = round(acc["fuzzy_first_hit_sec"], 4)
        res = {k: round(v, 4) for k, v in res.items()}

        out = {
            "metric": "zipf-vocab build skew + multiterm expansion, "
                      "artifact vs fallback (interleaved min-of-4 first hits)",
            "fixture": {
                "turns": n_turns,
                "vocab_size": VOCAB,
                "distinct_terms_indexed": n_vocab,
                "n_postings": n_postings,
            },
            "scan_volume": {
                "fallback_segment_metadata_rows": n_meta_rows,
                "artifact_rows": n_vocab,
                "artifact_matched_rows_wexz": n_matched,
            },
            "build": {
                "build_sec": round(build_sec, 2),
                "turns_per_sec": round(n_turns / build_sec, 1),
                # postings/sec is the cross-corpus-comparable figure:
                # high-cardinality turns carry many more postings
                # (long distinct terms explode the edge-n-gram prefix
                # field), so turns/sec alone understates the build
                "postings_per_sec": round(n_postings / build_sec, 1),
                "head_term_skew_ratio": round(skew, 3),
            },
            "vocab_artifact_build_sec": round(vocab_build_sec, 2),
            "artifact": art,
            "fallback": fb,
            "speedup": {
                "wildcard": round(
                    fb["wildcard_first_hit_sec"]
                    / max(art["wildcard_first_hit_sec"], 1e-9), 2
                ),
                "fuzzy": round(
                    fb["fuzzy_first_hit_sec"]
                    / max(art["fuzzy_first_hit_sec"], 1e-9), 2
                ),
            },
            "dictionary_resolution": {
                "artifact_sec": res["artifact"],
                "fallback_sec": res["fallback"],
                "speedup": round(
                    res["fallback"] / max(res["artifact"], 1e-9), 2
                ),
            },
        }
        # expansion results must be identical on both paths
        assert art["wildcard_expansions"] == fb["wildcard_expansions"]
        assert art["fuzzy_expansions"] == fb["fuzzy_expansions"]
        sys.stdout.flush()
        print(json.dumps(out), flush=True)
    finally:
        try:
            os.chmod(seg, stat.S_IRWXU)
        except OSError:
            pass
        shutil.rmtree(tmp, ignore_errors=True)
        quiet_stop(spark)


if __name__ == "__main__":
    main()
