"""Doctor: index health checks (the reference's doctor.rs:561-775 +
search.rs:827-1060 + storage.rs:823-1240 surface, re-expressed as
job-level assertions over the index artifact).

Each check returns (name, ok, detail); ``run_doctor`` prints a report
and returns overall health. Used by `python -m xf_spark doctor`.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession, functions as F


@dataclass
class Check:
    name: str
    ok: bool
    detail: str


def run_doctor(
    spark: SparkSession,
    path: str,
    sample_query: str = "the",
    repair: bool = False,
) -> list[Check]:
    """``repair=True`` additionally heals what it safely can: a docs
    store ahead of meta (torn append commit window) is reconciled via
    segments.reconcile_meta instead of only being reported."""
    checks: list[Check] = []

    # 0. finish (or discard) a compaction interrupted mid-commit — the
    # marker protocol is idempotent, so this is safe to run every time
    try:
        from xf_spark.index.segments import recover_compaction, refresh_index_paths

        if recover_compaction(path):
            refresh_index_paths(spark, path)
            checks.append(
                Check("compaction_recovered", True, "marker-committed compaction applied")
            )
    except Exception as e:  # noqa: BLE001
        checks.append(Check("compaction_recovered", False, str(e)))

    # 1. meta present + well-formed (index dir/version check analog)
    meta_path = os.path.join(path, "meta.json")
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        need = {"n_docs", "avgdl", "n_shards", "n_buckets", "block"}
        missing = need - set(meta)
        checks.append(Check("meta", not missing, f"missing={sorted(missing)}" if missing else str(meta)))
    except Exception as e:  # noqa: BLE001
        checks.append(Check("meta", False, str(e)))
        return checks

    # 2. segments readable + postings accounting
    try:
        seg = spark.read.parquet(os.path.join(path, "segments"))
        row = seg.where(F.col("field") == "text").agg(
            F.sum("n_docs").alias("postings"),
            F.count("*").alias("rows"),
            F.sum("bytes").alias("bytes"),
        ).first()
        checks.append(
            Check(
                "segments",
                (row["postings"] or 0) > 0,
                f"text postings={row['postings']} rows={row['rows']} bytes={row['bytes']}",
            )
        )
    except Exception as e:  # noqa: BLE001
        checks.append(Check("segments", False, str(e)))
        return checks

    # 3. docs store vs meta doc count (doc-count-consistency analog)
    docs = None
    try:
        docs = spark.read.parquet(os.path.join(path, "docs"))
        n = docs.count()
        if n > meta["n_docs"] and repair:
            from xf_spark.index.segments import reconcile_meta

            if reconcile_meta(spark, path):
                with open(meta_path) as f:
                    meta = json.load(f)
                checks.append(
                    Check(
                        "doc_count_repaired",
                        n == meta["n_docs"],
                        f"torn append healed: meta.n_docs -> {meta['n_docs']}",
                    )
                )
        checks.append(
            Check("doc_count", n == meta["n_docs"], f"docs={n} meta={meta['n_docs']}")
        )
        ids = docs.agg(F.min("doc_id"), F.max("doc_id"), F.countDistinct("doc_id")).first()
        bound = int(meta.get("doc_id_bound", meta["n_docs"]))
        if bound == meta["n_docs"]:
            # never purged: ids must be exactly dense 0..n-1
            ok = ids[0] == 0 and ids[1] == n - 1 and ids[2] == n
            name = "doc_ids_dense"
        else:
            # drop-compaction punched holes by design: ids must be
            # unique and live inside [0, doc_id_bound)
            ok = ids[0] >= 0 and ids[1] < bound and ids[2] == n
            name = "doc_ids_unique_bounded"
        checks.append(
            Check(name, ok, f"min={ids[0]} max={ids[1]} distinct={ids[2]} bound={bound}")
        )
    except Exception as e:  # noqa: BLE001
        checks.append(Check("doc_count", False, str(e)))

    # 4. avgdl consistency: sum(tf) over text field / n_docs == meta.avgdl
    try:
        total = seg.where(F.col("field") == "text").agg(F.sum("n_docs")).first()[0]
        # sum(n_docs) counts postings, not tokens; recompute tokens from tfs
        # cheaply via the stored per-segment byte of truth: sum(tf) needs
        # decode — approximate with postings>=tokens lower bound instead:
        ok = abs(meta["avgdl"]) > 0 and (total or 0) <= meta["avgdl"] * meta["n_docs"] + 1
        checks.append(
            Check("avgdl_bound", ok, f"text postings={total} <= tokens={meta['avgdl'] * meta['n_docs']:.0f}")
        )
    except Exception as e:  # noqa: BLE001
        checks.append(Check("avgdl_bound", False, str(e)))

    # 5. manifest completeness (resume ledger)
    try:
        man = spark.read.parquet(os.path.join(path, "manifest"))
        slices = sorted(r["slice_id"] for r in man.select("slice_id").distinct().collect())
        checks.append(Check("manifest", len(slices) > 0, f"slices={slices}"))
    except Exception as e:  # noqa: BLE001
        checks.append(Check("manifest", False, str(e)))

    # 6. sample query round-trip (runtime check, doctor.rs:561-775)
    try:
        from xf_spark.query.segment_search import SegmentIndex

        if docs is None:
            raise RuntimeError("docs store unreadable (see doc_count)")
        ix = SegmentIndex.load(spark, path, docs=docs)
        import time

        t0 = time.time()
        hits = ix.search(sample_query, limit=5).collect()
        ms = (time.time() - t0) * 1000
        checks.append(
            Check("sample_query", True, f"{sample_query!r}: {len(hits)} hits in {ms:.0f}ms")
        )
        # perf-budget grade (perf.rs:131-178 analog): WARM repeat —
        # the serving-path number the budgets are calibrated against
        from xf_spark import perf as _perf

        t1 = time.time()
        ix.search(sample_query, limit=5).collect()
        grade = _perf.record("search_simple", time.time() - t1)
        checks.append(
            Check(
                "perf_budget",
                grade != "critical",
                f"warm search_simple: {_perf.LAST['search_simple'][0]:.0f}ms "
                f"grade={grade}",
            )
        )
    except Exception as e:  # noqa: BLE001
        checks.append(Check("sample_query", False, str(e)))

    # 7. embeddings (if present): dimension + count
    emb_path = os.path.join(path, "embeddings")
    if os.path.isdir(emb_path):
        dim = None
        try:
            emb = spark.read.parquet(emb_path)
            n_emb = emb.count()
            if "vec16" in emb.columns:
                dim = len(emb.select("vec16").first()["vec16"]) // 2
            else:
                dim = len(emb.select("vec").first()["vec"])
            checks.append(
                Check(
                    "embeddings",
                    n_emb == meta["n_docs"] and dim == 384,
                    f"n={n_emb} dim={dim}",
                )
            )
        except Exception as e:  # noqa: BLE001
            checks.append(Check("embeddings", False, str(e)))

        # 8. IVF layout invariant: a cell-partitioned store without a
        # loadable quantizer is unrepairable-by-append (engine.append
        # refuses it; see XfIndex.append) — surface it here first.
        try:
            import json as _json

            cpath = os.path.join(path, "centroids.json")
            if "cell" in emb.columns:
                if not os.path.isfile(cpath):
                    checks.append(
                        Check(
                            "ivf_quantizer",
                            False,
                            "embeddings are cell-partitioned but "
                            "centroids.json is missing",
                        )
                    )
                else:
                    with open(cpath) as f:
                        cent = _json.load(f)
                    n_cells = len(cent)
                    cdim = len(cent[0]) if n_cells else 0
                    max_cell = emb.selectExpr("max(cell) m").first()["m"]
                    # dim is None when check 7 couldn't read a vector —
                    # verify what IS verifiable rather than NameError
                    ok = (
                        (dim is None or cdim == dim)
                        and max_cell is not None
                        and int(max_cell) < n_cells
                    )
                    checks.append(
                        Check(
                            "ivf_quantizer",
                            ok,
                            f"n_cells={n_cells} dim={cdim} max_cell={max_cell}",
                        )
                    )
            elif os.path.isfile(cpath):
                # the inverse corruption: a quantizer next to a FLAT
                # store (crashed ann build resumed with ann_cells=0 on
                # an older binary) — append() would cell-assign new
                # rows into a store with no cell directories
                checks.append(
                    Check(
                        "ivf_quantizer",
                        False,
                        "centroids.json present but embeddings are not "
                        "cell-partitioned — delete the stale quantizer "
                        "or rebuild with ann_cells",
                    )
                )
        except Exception as e:  # noqa: BLE001
            checks.append(Check("ivf_quantizer", False, str(e)))

    return checks


def format_report(checks: list[Check]) -> str:
    lines = []
    for c in checks:
        lines.append(f"[{'OK' if c.ok else 'FAIL'}] {c.name}: {c.detail}")
    healthy = all(c.ok for c in checks)
    lines.append(f"overall: {'HEALTHY' if healthy else 'UNHEALTHY'}")
    return "\n".join(lines)
