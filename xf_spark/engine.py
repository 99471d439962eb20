"""XfIndex — the unified engine facade (the `xf` CLI surface as a
library: index once, then lexical / semantic / hybrid search, stats,
context, snippets — SURVEY.md §3).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from xf_spark.index.segments import PARQUET_CODEC, build_index
from xf_spark.query.dates import parse_date_flexible
from xf_spark.query.hybrid import hybrid_search
from xf_spark.query.results import add_snippets, apply_sort, conversation_context
from xf_spark.query.segment_search import SegmentIndex
from xf_spark.query.semantic import build_embeddings, semantic_topk


def _norm_roles(roles):
    """Lowercase/trim a caller roles filter (stored roles are
    lowercase per the input_hint contract); an all-blank filter is a
    refused misconfiguration, not an implicit match-all."""
    if not roles:
        return None
    norm = [r.strip().lower() for r in roles if r.strip()]
    if not norm:
        raise ValueError(f"roles filter has no usable names: {roles!r}")
    return norm


def _parquet_complete(path: str) -> bool:
    """A parquet store counts as written only when the committer's
    _SUCCESS marker landed — a directory alone may be a crashed
    mid-job write (the dir and _temporary/ appear at job START), and
    treating it as complete would serve a truncated store."""
    return os.path.isdir(path) and os.path.isfile(os.path.join(path, "_SUCCESS"))


def _release(df) -> None:
    """Best-effort unpersist of a possibly-cached DataFrame (replaced
    references would otherwise stay pinned in the block manager for
    the session's lifetime)."""
    try:
        if df is not None and df.is_cached:
            df.unpersist()
    except Exception:  # noqa: BLE001 — cache release must never fail a swap
        pass


@dataclass
class XfIndex:
    """A built index: segment files + docs table + embeddings."""

    spark: SparkSession
    path: str
    segment_index: SegmentIndex
    docs: DataFrame
    embeddings: DataFrame | None = None

    # -- build / open -------------------------------------------------------

    @classmethod
    def build(
        cls,
        transcripts: DataFrame,
        path: str,
        with_embeddings: bool = True,
        ann_cells: int = 0,
        vec_format: str = "f32",
        **build_kw,
    ) -> "XfIndex":
        """Full build (cmd_index analog, main.rs:766-1079): segment
        index + docs parquet + embeddings parquet, all under ``path``.
        Resumable per slice via the manifest.

        ``ann_cells > 0`` additionally trains an IVF coarse quantizer
        and stores per-doc cell assignments (embeddings parquet is
        written partitionBy(cell) so a probe prunes partitions) plus
        ``centroids.json`` — the scale path for semantic serving:
        a query scans n_probe/n_cells of the corpus instead of all of
        it. Exact brute force stays the default query mode.

        ``vec_format="f16"`` stores vectors as binary float16 — the
        reference's at-rest layout (vector.rs:312), ~2x smaller on disk
        and on the scan path; scores are computed from the QUANTIZED
        values (as the reference does), so ranks may differ from f32 at
        ~1e-3 relative score precision."""
        import json as _json

        if vec_format not in ("f32", "f16"):
            raise ValueError(f"vec_format must be f32|f16, got {vec_format!r}")
        spark = transcripts.sparkSession
        docs, stats, _metrics = build_index(transcripts, path, **build_kw)
        docs_path = os.path.join(path, "docs")
        if not _parquet_complete(docs_path):
            docs.write.mode("overwrite").option(
                "compression", PARQUET_CODEC
            ).parquet(docs_path)
        emb = None
        if with_embeddings:
            from xf_spark.query.semantic import encode_f16_udf

            emb_path = os.path.join(path, "embeddings")
            if not _parquet_complete(emb_path):
                emb_df = build_embeddings(docs)
                cached_emb = None
                part_cols = []
                if ann_cells <= 0:
                    # a crashed ann build resumed with ann_cells=0
                    # would otherwise leave a stale quantizer next to a
                    # FLAT store — append() would then cell-assign new
                    # rows into a store with no cell directories,
                    # corrupting the layout
                    stale = os.path.join(path, "centroids.json")
                    if os.path.isfile(stale):
                        os.remove(stale)
                if ann_cells > 0:
                    from xf_spark.ops.similarity import assign_cells, train_centroids

                    cached_emb = emb_df = emb_df.cache()
                    cent = train_centroids(
                        emb_df, n_cells=ann_cells, vec_col="vec"
                    )
                    emb_df = assign_cells(emb_df, cent, vec_col="vec")
                    part_cols = ["cell"]
                    # commit centroids BEFORE the cell-partitioned
                    # parquet write: a crash between the two leaves an
                    # incomplete emb dir (no _SUCCESS) that resume
                    # rebuilds wholesale; the reverse order could leave
                    # a complete cell-partitioned store with no
                    # quantizer, which nothing can repair
                    tmp = os.path.join(path, "centroids.json.tmp")
                    with open(tmp, "w") as f:
                        _json.dump(cent.tolist(), f)
                    os.replace(tmp, os.path.join(path, "centroids.json"))
                if vec_format == "f16":
                    emb_df = emb_df.select(
                        "doc_id",
                        encode_f16_udf(F.col("vec")).alias("vec16"),
                        *part_cols,
                    )
                w = emb_df.write.mode("overwrite").option(
                    "compression", PARQUET_CODEC
                )
                if part_cols:
                    w = w.partitionBy(*part_cols)
                w.parquet(emb_path)
                _release(cached_emb)
            emb = spark.read.parquet(emb_path)
        docs_df = spark.read.parquet(docs_path)
        seg = SegmentIndex.load(spark, path, docs=docs_df)
        return cls(
            spark=spark, path=path, segment_index=seg, docs=docs_df, embeddings=emb
        )

    def _centroids(self):
        # memoized: the file is immutable between (re)builds, and the
        # ann serving path calls this per query — re-parsing n_cells x
        # DIM floats of JSON per request is pure overhead. append()/
        # compact() drop the memo alongside the serving pins.
        if self._centroids_cache is not None:
            return self._centroids_cache
        import json as _json

        p = os.path.join(self.path, "centroids.json")
        if not os.path.exists(p):
            return None
        import numpy as np

        with open(p) as f:
            self._centroids_cache = np.asarray(_json.load(f), dtype=np.float64)
        return self._centroids_cache

    def append(
        self,
        new_transcripts: DataFrame,
        dedup: bool = True,
        dedup_range: tuple[str, str] | None = None,
        meta_extra: dict | None = None,
    ) -> "XfIndex":
        """INCREMENTAL append: tokenizes/encodes ONLY the new turns into
        a fresh segment slice (existing segments untouched — see
        segments.append_index for the stats-soundness argument),
        appends the docs delta, updates global stats, and extends the
        embeddings store for the new docs. Returns self, reloaded.

        ``dedup_range``/``meta_extra`` pass through to ``append_index``
        (conv_id-bounded dedup scan; state committed atomically with
        the stats rename — the sync_iceberg contract)."""
        from xf_spark.index.segments import append_index

        # pre-append id ceiling (NOT n_docs: after a drop-compaction the
        # count is smaller than the highest id + 1)
        meta0 = self.segment_index.meta
        old_n = int(meta0.get("doc_id_bound", meta0["n_docs"]))
        n_added, _stats = append_index(
            new_transcripts, self.path, dedup=dedup,
            dedup_range=dedup_range, meta_extra=meta_extra,
        )
        docs = self.spark.read.parquet(os.path.join(self.path, "docs"))
        if self.embeddings is not None:
            emb_path = os.path.join(self.path, "embeddings")
            n_docs_total = docs.count()
            n_vecs = self.spark.read.parquet(emb_path).count()
        if self.embeddings is not None and n_vecs < n_docs_total:
            # normal append: exactly the new id range is missing — a
            # pure range filter, no join. Any OTHER shortfall is a
            # crash-window hole (an earlier append committed the
            # lexical index, then died before extending the embeddings
            # store; n_added==0 on the retry because the docs dedup'd
            # away) — heal it by embedding the anti-join complement.
            if n_vecs + n_added == n_docs_total:
                new_docs = docs.where(F.col("doc_id") >= old_n)
            else:
                new_docs = docs.join(
                    self.spark.read.parquet(emb_path).select("doc_id"),
                    "doc_id",
                    "left_anti",
                )
            emb_new = build_embeddings(new_docs)
            cent = self._centroids()
            part_cols = []
            if cent is None and "cell" in self.embeddings.columns:
                raise ValueError(
                    "embeddings store is cell-partitioned but "
                    "centroids.json is missing — restore it or rebuild "
                    "the index (appending cell-less rows would corrupt "
                    "the partitioned layout)"
                )
            if cent is not None:
                # IVF layout: new docs get cells from the EXISTING
                # quantizer (centroids are append-stable; retrain is a
                # rebuild-level decision)
                from xf_spark.ops.similarity import assign_cells

                emb_new = assign_cells(emb_new, cent, vec_col="vec")
                part_cols = ["cell"]
            if "vec16" in self.embeddings.columns:
                from xf_spark.query.semantic import encode_f16_udf

                emb_new = emb_new.select(
                    "doc_id", encode_f16_udf(F.col("vec")).alias("vec16"), *part_cols
                )
            w = emb_new.write.mode("append").option("compression", PARQUET_CODEC)
            if part_cols:
                w = w.partitionBy(*part_cols)
            w.parquet(emb_path)
            _release(self.embeddings)
            self.embeddings = self.spark.read.parquet(emb_path)
        _release(self.docs)
        self.docs = docs
        _release(getattr(self.segment_index, "_segments", None))
        self.segment_index = SegmentIndex.load(self.spark, self.path, docs=docs)
        # pinned serving state predates the append — drop it (a stale
        # matrix/doc store would silently miss the appended docs); the
        # caller re-pins via cache(pin_vectors_mb=/pin_docs_mb=)
        self._pinned_vecs = None
        self._pinned_docs = None
        self._centroids_cache = None
        return self

    @classmethod
    def build_iceberg(
        cls, spark: SparkSession, table_root: str, path: str, **build_kw
    ) -> "XfIndex":
        """Build from an Iceberg transcripts table and record the
        indexed snapshot, so later ``sync_iceberg`` calls can index
        only the files new commits added (snapshot-diff maintenance:
        at 10^12 turns a daily delta is the only thing you can afford
        to tokenize — the diff is resolved from manifests, O(#files),
        before any row is read)."""
        from xf_spark.sources import iceberg as ice
        from xf_spark.sources.tables import load_transcript_table

        snap_id = ice.current_snapshot_id(table_root)
        if snap_id is None:
            raise ValueError(f"Iceberg table has no snapshot: {table_root}")
        ix = cls.build(load_transcript_table(spark, table_root), path, **build_kw)
        ix._write_iceberg_sync(snap_id)
        return ix

    def _write_iceberg_sync(self, snapshot_id: int) -> None:
        """Record the synced snapshot id in meta.json (tmp+rename).
        Used where no append carries it (initial build, empty commits);
        a sync WITH rows commits the id atomically inside the append's
        own stats rename instead (meta_extra)."""
        import json as _json

        meta_path = os.path.join(self.path, "meta.json")
        with open(meta_path) as f:
            meta = _json.load(f)
        meta["iceberg_sync"] = {"snapshot_id": snapshot_id}
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        os.replace(tmp, meta_path)
        if self.segment_index is not None:
            self.segment_index.meta["iceberg_sync"] = {
                "snapshot_id": snapshot_id
            }

    def _last_iceberg_sync(self) -> int | None:
        import json as _json

        state = self.segment_index.meta.get("iceberg_sync")
        if state:
            return state["snapshot_id"]
        # legacy location (pre meta.json state): sidecar file
        try:
            with open(os.path.join(self.path, "iceberg_sync.json")) as f:
                return _json.load(f)["snapshot_id"]
        except FileNotFoundError:
            return None

    def sync_iceberg(self, table_root: str, dedup: bool = True) -> int:
        """Catch the index up to the table's current Iceberg snapshot.

        Appends ONLY the data files added since the last synced
        snapshot (manifest diff — no full-table scan). Returns the
        number of rows in the appended files (manifest record counts,
        exact).

        Scale contract (10^12-turn daily delta): every job here is
        delta-sized. The dedup backstop's corpus scan takes the delta's
        (min, max) conv_id as a pushed parquet range predicate
        (``dedup_range``), so it reads the row groups the delta could
        collide with, not the corpus; the synced snapshot id commits
        ATOMICALLY with the append's stats rename (``meta_extra``), so
        a completed sync is never re-appended. The remaining
        crash window (docs written, meta rename lost) is healed by
        reconcile_meta roll-forward + this dedup backstop.

        Overwrite/delete commits remove files; an incremental lexical
        index cannot un-index rows, so that case raises with a rebuild
        hint rather than serving stale turns silently."""
        from xf_spark.sources import iceberg as ice

        last = self._last_iceberg_sync()
        if last is None:
            raise ValueError(
                "index was not built from an Iceberg snapshot — build "
                "with XfIndex.build_iceberg(...) to enable sync"
            )
        cur = ice.current_snapshot_id(table_root)
        if cur == last:
            return 0
        try:
            added, removed = ice.snapshot_changes(table_root, last, cur)
        except ValueError as e:
            raise ValueError(
                f"last synced snapshot {last} is gone from the table "
                f"(expire_snapshots?) — the delta basis is lost; rebuild "
                f"with build_iceberg()"
            ) from e
        if removed:
            raise ValueError(
                f"snapshot {cur} removed {len(removed)} data file(s) "
                f"(overwrite/delete commit) — an incremental index "
                f"cannot drop rows; rebuild with build_iceberg()"
            )
        if added:
            meta = ice.load_metadata(table_root)
            schema = ice.spark_schema(meta)
            cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            delta = self.spark.read.schema(schema).parquet(
                *[f["file_path"] for f in added]
            ).select(*cols)
            rng = None
            if dedup:
                # one delta-sized job bounds the backstop's corpus scan
                b = delta.agg(
                    F.min("conv_id").alias("lo"), F.max("conv_id").alias("hi")
                ).first()
                if b["lo"] is not None:
                    rng = (b["lo"], b["hi"])
            self.append(
                delta,
                dedup=dedup,
                dedup_range=rng,
                meta_extra={"iceberg_sync": {"snapshot_id": cur}},
            )
        else:
            self._write_iceberg_sync(cur)
        return sum(f["record_count"] for f in added)

    def compact(
        self,
        target_shards: int | None = None,
        drop: DataFrame | None = None,
    ) -> "XfIndex":
        """Merge accumulated append slices into one re-sharded slice
        (segments.compact_index): O(index bytes), never re-reads the
        corpus text, and doc_ids are PRESERVED — so the docs store,
        the embeddings/IVF layout, and any driver-pinned vectors stay
        valid (a rebuild re-assigns doc_ids and invalidates all of
        them). Query results are identical before/after (tested);
        WAND block bounds come out EXACT at the current avgdl instead
        of per-slice-scaled. Serving state tied to the segment layout
        (term cache, warm prefetch, pinned doc attrs) is rebuilt —
        call cache(...) again to re-warm.

        ``drop`` (DataFrame with a doc_id column — e.g. the
        doc_id != keep_id rows of ops.dedup.near_dup_groups) purges
        those documents physically: postings excised, docs +
        embeddings stores rewritten, BM25 stats exactly as a rebuild
        over the survivors. Pins are dropped (they may hold purged
        docs); re-pin via cache(...)."""
        from xf_spark.index.segments import compact_index

        _release(self.segment_index._segments)
        compact_index(self.spark, self.path, target_shards=target_shards, drop=drop)
        _release(self.docs)
        self.docs = self.spark.read.parquet(os.path.join(self.path, "docs"))
        self.segment_index = SegmentIndex.load(self.spark, self.path, docs=self.docs)
        if drop is not None:
            emb_path = os.path.join(self.path, "embeddings")
            if os.path.isdir(emb_path):
                _release(self.embeddings)
                self.embeddings = self.spark.read.parquet(emb_path)
            # pinned serving state may hold purged docs — drop it
            self._pinned_vecs = None
            self._pinned_docs = None
            self._centroids_cache = None
        return self

    def dedup(
        self,
        method: str = "exact",
        threshold: float = 0.8,
        max_hamming: int = 3,
        dry_run: bool = False,
    ) -> dict:
        """In-place index deduplication: detect duplicate documents
        over THIS index's doc store, keep one representative per
        duplicate class (min doc_id), and purge the losers via
        drop-compaction — the index-level analog of the reference's
        embed-dedup reuse chain (lib.rs:290-425), with the training-
        data keep/drop semantics of ops.dedup.near_dup_groups.

        methods: ``exact`` (content hash), ``minhash`` (shingle
        Jaccard >= threshold, LSH-bucketed, hot-bucket capped),
        ``simhash`` (hamming <= max_hamming), ``embedding`` (cosine >=
        threshold over THIS index's own embedding store via hyperplane
        LSH — the direct analog of the reference's embed-dedup reuse
        chain, which keys on the embedding layer; requires
        with_embeddings=True). For near-dup methods on a corpus with
        many EXACT copies, run ``dedup("exact")`` first — identical
        texts flood the LSH buckets the cap then drops.

        ``dry_run=True`` reports without modifying the index. Returns
        {method, n_docs_before, n_dropped, n_docs_after, applied}."""
        from xf_spark.ops.dedup import (
            embedding_near_dup_pairs,
            exact_dedup,
            minhash_dedup_pairs,
            near_dup_groups,
            simhash_candidates,
        )

        docs = self.docs.select("doc_id", "text")
        if method == "exact":
            keep = exact_dedup(docs)
            losers = docs.select("doc_id").join(
                keep.select("doc_id"), "doc_id", "left_anti"
            )
        elif method in ("minhash", "simhash", "embedding"):
            if method == "minhash":
                pairs = minhash_dedup_pairs(docs, threshold=threshold)
            elif method == "simhash":
                pairs = simhash_candidates(docs, max_hamming=max_hamming)
            else:
                if self.embeddings is None:
                    raise ValueError(
                        "dedup('embedding') requires embeddings "
                        "(build with with_embeddings=True)"
                    )
                emb = self.embeddings
                if "vec16" in emb.columns:
                    from xf_spark.query.semantic import decode_f16_udf

                    emb = emb.select(
                        "doc_id", decode_f16_udf(F.col("vec16")).alias("vec")
                    )
                # `threshold` is the COSINE floor here (vs Jaccard for
                # minhash) — callers typically want it tighter, e.g.
                # 0.95+, since hash embeddings cluster paraphrases
                pairs = embedding_near_dup_pairs(
                    emb.select("doc_id", "vec"),
                    threshold=threshold,
                    id_col="doc_id",
                    vec_col="vec",
                )
            groups = near_dup_groups(docs, pairs)
            losers = groups.where(F.col("doc_id") != F.col("keep_id")).select(
                "doc_id"
            )
        else:
            raise ValueError(
                f"method must be exact|minhash|simhash|embedding, got {method!r}"
            )
        n0 = int(self.segment_index.meta["n_docs"])
        # the loser set's lineage is the expensive half (LSH self-join +
        # connected components); cache it so the count and compaction's
        # own materialization don't each run it end-to-end
        losers = losers.cache()
        try:
            n_drop = losers.count()
            report = {
                "method": method,
                "n_docs_before": n0,
                "n_dropped": n_drop,
                "n_docs_after": n0 - n_drop,
                "applied": False,
            }
            if dry_run or n_drop == 0:
                return report
            self.compact(drop=losers)
        finally:
            losers.unpersist()
        report["n_docs_after"] = int(self.segment_index.meta["n_docs"])
        report["applied"] = True
        return report

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "XfIndex":
        # recovery FIRST: a marker-committed drop-compaction swaps the
        # docs/embeddings dirs, so reading them before SegmentIndex.load
        # triggers the roll-forward would capture file listings the
        # recovery is about to delete (review finding; load's own call
        # then no-ops)
        from xf_spark.index.segments import recover_compaction, refresh_index_paths

        if recover_compaction(path):
            refresh_index_paths(spark, path)
        docs = spark.read.parquet(os.path.join(path, "docs"))
        seg = SegmentIndex.load(spark, path, docs=docs)
        emb_path = os.path.join(path, "embeddings")
        emb = spark.read.parquet(emb_path) if os.path.isdir(emb_path) else None
        return cls(spark=spark, path=path, segment_index=seg, docs=docs, embeddings=emb)

    def cache(
        self,
        coalesce_to: int = 16,
        pin_vectors_mb: int = 0,
        pin_docs_mb: int = 0,
        warm_top_terms: int = 0,
    ) -> "XfIndex":
        """Cache the serving state. ``pin_vectors_mb`` > 0 additionally
        pins the embedding matrix coordinator-side as ONE NumPy array
        when it fits the budget — the analog of the reference holding
        vector.idx fully in RAM (vector.rs:267-393): an exact semantic
        query becomes a single local matmul instead of a cluster scan.
        ``pin_docs_mb`` > 0 likewise pins the doc store driver-side
        (the reference's in-process SQLite analog): hydration becomes a
        dict lookup and a warm query runs ZERO Spark jobs end-to-end.
        At 10^12 turns both budgets are exceeded and the distributed
        paths serve instead (results identical, tested)."""
        self.segment_index.cache(
            coalesce_to=coalesce_to, warm_top_terms=warm_top_terms
        )
        self.docs = self.docs.cache()
        self.docs.count()
        if self.embeddings is not None:
            if self._centroids() is not None and not pin_vectors_mb:
                # IVF layout, no pin requested: ann=True serving relies
                # on the parquet scan pruning cell DIRECTORIES — a
                # coalesced cache replaces that with a full cached scan
                # + row filter (measured at 1.57 M turns: probe-4 got
                # SLOWER cached, 4.4 s vs 3.7 s at-rest, while holding
                # GBs of block-manager memory). Leave the store at rest.
                # Exact (ann=False) queries on this config scan the
                # small per-cell files instead of a cache — measured NOT
                # slower at 1.57 M turns (9.0 s at rest vs 11.3 s
                # cached); callers wanting cached exact serving on an
                # IVF index pass pin_vectors_mb (pins beat both).
                pass
            else:
                # coalesce before caching: the cell-partitioned layout
                # is hundreds of small files, and a cached scan visits
                # every cached partition (~5 ms scheduling each)
                self.embeddings = self.embeddings.coalesce(coalesce_to).cache()
                n_vec = self.embeddings.count()
            if pin_vectors_mb:
                import numpy as np

                from xf_spark.functions.hash_embed import DIM

                # the matrix pins as float32 — the at-rest vectors ARE
                # f32 (f16 under vec_format="f16"), so nothing is lost;
                # scoring runs the matmul in f32 and rescores a provably
                # sufficient candidate set in f64 (semantic.pinned_topk),
                # rank-identical to the distributed f64 path (scores
                # within ULP-level accumulation noise) at half the
                # resident bytes and half the per-query DRAM traffic.
                # Budget against 4 B/dim resident + ~equal transient
                # during the Arrow collect.
                est_mb = n_vec * DIM * 4 / 1e6
                if est_mb <= pin_vectors_mb:
                    # Arrow transfer (toPandas), not Row collect: the
                    # transient driver copy is ~the matrix itself, not
                    # a per-Row python object per vector
                    if "vec16" in self.embeddings.columns:
                        pdf = self.embeddings.select("doc_id", "vec16").toPandas()
                        ids = pdf["doc_id"].to_numpy(np.int64)
                        mat = (
                            np.frombuffer(
                                b"".join(pdf["vec16"]), dtype=np.float16
                            )
                            .astype(np.float32)
                            .reshape(len(ids), -1)
                        )
                    else:
                        pdf = self.embeddings.select("doc_id", "vec").toPandas()
                        ids = pdf["doc_id"].to_numpy(np.int64)
                        mat = np.array(pdf["vec"].tolist(), dtype=np.float32)
                    from xf_spark.query.semantic import PinnedVectors

                    # dedupe identical vectors at pin time: scoring runs
                    # over the unique matrix, tie plateaus (templated /
                    # low-signal turns sharing one embedding) expand by
                    # doc_id order instead of being rescored row-by-row
                    self._pinned_vecs = PinnedVectors(ids, mat)
        if pin_docs_mb:
            # admission estimate for the driver dict-of-tuples store:
            # UTF-8 bytes of EVERY string column (octet_length, not
            # character length — multibyte text is the norm) plus a
            # measured per-row constant for the Python objects (tuple +
            # dict entry + str/int/datetime headers ≈ 450 B/row; a
            # char-count + 96 B estimate under-counted several-fold on
            # short-text corpora)
            str_cols = [
                f.name
                for f in self.docs.schema.fields
                if isinstance(f.dataType, T.StringType)
            ]
            est = self.docs.agg(
                F.count("*").alias("n"),
                F.sum(
                    sum(
                        (F.coalesce(F.octet_length(c), F.lit(0)) for c in str_cols),
                        F.lit(0),
                    )
                ).alias("sbytes"),
            ).first()
            est_mb = (int(est["sbytes"] or 0) + int(est["n"]) * 450) / 1e6
            if est_mb <= pin_docs_mb:
                cols = ["doc_id"] + [
                    c for c in self.docs.columns if c != "doc_id"
                ]
                rows = self.docs.collect()
                self._pinned_docs = (
                    cols,
                    {
                        r["doc_id"]: tuple(r[c] for c in cols)
                        for r in rows
                    },
                )
                if {"role", "ts"} <= set(cols):
                    # same collected rows also pin (doc_id -> role, ts)
                    # on the segment index: warm FILTERED queries then
                    # resolve the allowed-id set in NumPy — zero Spark
                    # jobs, like the unfiltered fast path
                    self.segment_index.pin_doc_attrs(
                        [r["doc_id"] for r in rows],
                        [r["role"] for r in rows],
                        [r["ts"] for r in rows],
                    )
                if "conv_id" in cols:
                    # and (doc_id -> conv_id) for collapsed search:
                    # warm best-per-conversation queries run zero
                    # Spark jobs too
                    self.segment_index.pin_doc_groups(
                        [r["doc_id"] for r in rows],
                        [r["conv_id"] for r in rows],
                    )
        return self

    _pinned_vecs = None
    _pinned_docs = None
    _centroids_cache = None

    def _pinned_semantic(self, query: str, k: int):
        """Exact top-k over the coordinator-pinned matrix; returns a
        local-relation DataFrame or None when not pinned."""
        if self._pinned_vecs is None:
            return None
        import numpy as np

        from xf_spark.query.semantic import embed_query

        top_ids, top_sc = self._pinned_vecs.topk(embed_query(query), k)
        from xf_spark.query.segment_search import arrow_local

        return arrow_local(
            self.spark, "doc_id long, score double",
            {"doc_id": top_ids, "score": top_sc},
        )

    def _vector_for(self, doc_id: int):
        """One doc's embedding as float64 (None if absent): pinned
        matrix lookup when cached (no cluster job), else a single
        doc_id-pruned scan of the embeddings store."""
        import numpy as np

        if self._pinned_vecs is not None:
            v = self._pinned_vecs.vector_of(doc_id)
            if v is not None:
                return np.asarray(v, dtype=np.float64)
        vcol = "vec16" if "vec16" in self.embeddings.columns else "vec"
        row = (
            self.embeddings.where(F.col("doc_id") == int(doc_id))
            .select(vcol)
            .first()
        )
        if row is None:
            return None
        if vcol == "vec16":
            return np.frombuffer(row[0], dtype=np.float16).astype(np.float64)
        return np.asarray(row[0], dtype=np.float64)

    def more_like_this(
        self,
        conv_id: str,
        turn_idx: int,
        limit: int = 10,
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        sort: str = "relevance",
    ) -> DataFrame:
        """Similar-turns query (beyond the reference CLI surface):
        rank the corpus by cosine similarity to an EXISTING turn's
        embedding, excluding the turn itself. Serving mirrors semantic
        mode exactly: pinned-matrix top-k when cached (zero cluster
        jobs past the id lookup), else the distributed partial-top-k
        scan; role/date filters apply BEFORE scoring via the shared
        ``_doc_filter`` predicate."""
        if self.embeddings is None:
            raise ValueError("index built without embeddings")
        row = (
            self.docs.where(
                (F.col("conv_id") == conv_id)
                & (F.col("turn_idx") == int(turn_idx))
            )
            .select("doc_id")
            .first()
        )
        if row is None:
            raise KeyError(f"no such turn: ({conv_id!r}, {turn_idx})")
        target = int(row["doc_id"])
        qv = self._vector_for(target)
        if qv is None:
            raise KeyError(f"no embedding for turn ({conv_id!r}, {turn_idx})")
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        flt = self._doc_filter(roles=roles, since=since_dt, until=until_dt)
        # +1: the target itself ranks first (cosine 1.0) unless the
        # filter already excludes it
        if flt is None and self._pinned_vecs is not None:
            from xf_spark.query.segment_search import arrow_local

            ids, sc = self._pinned_vecs.topk(qv, limit + 1)
            keep = ids != target
            hits = arrow_local(
                self.spark, "doc_id long, score double",
                {"doc_id": ids[keep][:limit], "score": sc[keep][:limit]},
            )
        else:
            hits = (
                semantic_topk(
                    self.embeddings,
                    query="",
                    qvec=qv,
                    limit=limit + 1,
                    doc_filter=flt,
                )
                .where(F.col("doc_id") != target)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(limit)
            )
        hydrated, presorted = self._hydrate(hits, sort)
        return hydrated if presorted else apply_sort(hydrated, sort)

    # -- search (cmd_search analog, main.rs:1082-1490) ----------------------

    def search(
        self,
        query: str,
        mode: str = "hybrid",
        limit: int = 20,
        offset: int = 0,
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        sort: str = "relevance",
        snippets: bool = False,
        context: bool = False,
        ann: bool = False,
        n_probe: int = 4,
        fuzzy: bool = False,
        after: tuple | None = None,
        synonyms: dict | None = None,
        min_should_match: int = 1,
    ) -> DataFrame:
        """Mode dispatch lexical | semantic | hybrid (aliases bm25 |
        vector | rrf, hybrid.rs:51-85); natural-language since/until;
        post sort; optional snippets / conversation context.

        ``after=(score, doc_id)`` (lexical mode only): cursor
        pagination — the next page strictly after the cursor in
        (score desc, doc_id asc) order; every page stays k-bounded
        where offset pagination costs O(offset + limit).

        ``fuzzy=True`` (the reference's `search.fuzzy` knob,
        config.rs:75-76) expands each lexical term to its
        edit-distance-1 vocabulary neighbors before scoring — applies
        to the lexical branch (and hybrid's lexical side); semantic
        search is typo-tolerant by construction.

        ``ann=True`` (semantic or hybrid mode, index built with
        ``ann_cells``) probes the ``n_probe`` nearest IVF cells instead
        of scanning every vector — approximate, partition-pruned; in
        hybrid mode only the semantic branch changes (lexical + RRF
        fusion identical). Filters fall back to the exact path."""
        mode_n = {"bm25": "lexical", "vector": "semantic", "rrf": "hybrid"}.get(
            mode, mode
        )
        if after is not None and mode_n != "lexical":
            raise ValueError("after (cursor pagination) is lexical-only")
        if synonyms and mode_n != "lexical":
            raise ValueError(
                "synonyms apply to lexical mode (the semantic branch is "
                "synonym-tolerant by embedding construction)"
            )
        if min_should_match > 1 and mode_n != "lexical":
            raise ValueError(
                "min_should_match counts lexical should clauses — "
                "lexical mode only"
            )
        if (
            mode_n in ("lexical", "semantic", "hybrid")
            and not context
            and not ann
            and after is None
            and offset == 0
            and sort == "relevance"
            and roles is None
            and since is None
            and until is None
            and synonyms is None
            and min_should_match <= 1
            and query.strip()
            and not (
                mode_n in ("semantic", "hybrid") and self.embeddings is None
            )
        ):
            # rows fast path: serve via the msearch machinery (driver
            # -side WAND / pinned matmul / local RRF — identical
            # results, tested) and hydrate the ranked pairs directly.
            # The DataFrame route materializes 2-3 intermediate local
            # relations per query (lexical hits, fused hits, hydrated
            # rows) at ~10-30 ms of Arrow round-trip EACH; this path
            # pays exactly one. Filters/offset/ann/context keep the
            # DataFrame route (they need distributed plans or
            # different output shapes).
            from xf_spark.query.parser import parse_query_extract

            # loud parse errors, same as the DataFrame route — msearch
            # isolates unparseable BATCH members as empty results, but
            # the single-query facade must raise (e.g. `NOT type:x`)
            parse_query_extract(query)
            pairs = self.msearch([query], limit=limit, mode=mode_n, fuzzy=fuzzy)[
                query
            ]
            out = self._hydrate_rows(pairs)
            if snippets:
                out = add_snippets(out, query)
            return out
        hits = self._search_hits(
            query,
            mode=mode,
            limit=limit,
            offset=offset,
            roles=roles,
            since=since,
            until=until,
            ann=ann,
            n_probe=n_probe,
            fuzzy=fuzzy,
            after=after,
            synonyms=synonyms,
            min_should_match=min_should_match,
        )
        if context:
            # conversation-context view: a different output SHAPE
            # (every turn of each matched conversation, in
            # (conv_id, turn_idx) order — the ordering-parity
            # contract). It REPLACES hydration/sort/snippets, which
            # only apply to flat hit rows — so skip that work rather
            # than building and discarding it.
            return conversation_context(self.docs, hits)
        hydrated, presorted = self._hydrate(hits, sort)
        out = hydrated if presorted else apply_sort(hydrated, sort)
        if snippets:
            out = add_snippets(out, query)
        return out

    def facet_counts(
        self,
        query: str,
        facet: str = "role",
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
        limit: int | None = None,
    ) -> DataFrame:
        """Facet aggregation over the lexical match set (Lucene facet-
        collector analog): (value, n_docs) per value of a docs column
        or a ``date:{year|month|day|hour}`` ts histogram. Accepts the
        same natural-language since/until as search."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        return self.segment_index.facet_counts(
            query,
            facet=facet,
            roles=roles,
            since=since_dt,
            until=until_dt,
            fuzzy=fuzzy,
            limit=limit,
        )

    def facet_top_hits(
        self,
        query: str,
        facet: str = "role",
        k: int = 3,
        limit: int | None = None,
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """Per-bucket top hits (Elasticsearch terms + top_hits): for
        each facet value over the lexical match set, the bucket count
        and its top ``k`` hits. Accepts the same natural-language
        since/until as search; ``limit`` bounds buckets."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        return self.segment_index.facet_top_hits(
            query,
            facet=facet,
            k=k,
            limit=limit,
            roles=roles,
            since=since_dt,
            until=until_dt,
            fuzzy=fuzzy,
        )

    def search_rescored(
        self,
        query: str,
        rescore: str,
        limit: int = 20,
        window: int = 100,
        weight: float = 2.0,
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """ES-style two-phase rescoring over the lexical index:
        primary top-``window``, then ``rescore`` (typically a phrase /
        proximity query) evaluated only on that window and folded in
        as primary + weight * secondary."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        return self.segment_index.search_rescored(
            query,
            rescore,
            limit=limit,
            window=window,
            weight=weight,
            roles=roles,
            since=since_dt,
            until=until_dt,
            fuzzy=fuzzy,
        )

    def search_decayed(
        self,
        query: str,
        half_life_days: float = 30.0,
        limit: int = 20,
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """Recency-decayed lexical ranking (ES function_score exp
        decay): BM25 * 0.5^(age_days / half_life), anchored at the
        corpus's newest ts (deterministic, replayable)."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        return self.segment_index.search_decayed(
            query,
            half_life_days=half_life_days,
            limit=limit,
            roles=roles,
            since=since_dt,
            until=until_dt,
            fuzzy=fuzzy,
        )

    def search_demoted(
        self,
        query: str,
        negative: str,
        factor: float = 0.5,
        limit: int = 20,
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """Boosting-query demotion (Lucene BoostingQuery): docs
        matching ``negative`` stay findable at score * factor."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        return self.segment_index.search_demoted(
            query,
            negative,
            factor=factor,
            limit=limit,
            roles=roles,
            since=since_dt,
            until=until_dt,
            fuzzy=fuzzy,
        )

    def match_stats(
        self,
        query: str,
        col: str = "text_len",
        percentiles: tuple = (0.5, 0.9, 0.99),
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
        approx: bool = False,
        approx_accuracy: int = 10_000,
    ) -> DataFrame:
        """Numeric stats + exact percentiles over the lexical match
        set (ES stats/percentiles aggregation analog); same
        natural-language since/until as search. ``approx=True`` uses
        the mergeable approx_percentile sketch (100-TB path) with the
        same output schema."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        return self.segment_index.match_stats(
            query,
            col=col,
            percentiles=percentiles,
            approx=approx,
            approx_accuracy=approx_accuracy,
            roles=roles,
            since=since_dt,
            until=until_dt,
            fuzzy=fuzzy,
        )

    def facet_counts_multi(
        self,
        query: str,
        facets: list[str] = ("role",),
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
        limit: int | None = None,
    ) -> DataFrame:
        """Several facets from one match-set resolution:
        (facet, value, n_docs), limit per facet."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        return self.segment_index.facet_counts_multi(
            query,
            facets=facets,
            roles=roles,
            since=since_dt,
            until=until_dt,
            fuzzy=fuzzy,
            limit=limit,
        )

    def count_matches(
        self,
        query: str,
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
    ) -> int:
        """Match-set size (Elasticsearch ``_count`` analog) with
        natural-language since/until — a pure aggregation: one count
        row per shard, never a top-k fanout."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        return self.segment_index.count_matches(
            query, roles=roles, since=since_dt, until=until_dt, fuzzy=fuzzy
        )

    def suggest(self, query: str) -> str | None:
        """Did-you-mean correction for misspelled query terms (highest
        -df edit-distance-1 neighbor per unknown term); None when
        nothing to correct."""
        return self.segment_index.suggest(query)

    def explain(
        self,
        query: str,
        limit: int = 20,
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
    ):
        """BM25 score breakdown for the top-``limit`` hits (the
        Lucene/Tantivy ``explain`` analog): one row per (doc, matched
        term leaf) — tf, df, idf, contribution, total score. Phrase
        queries are refused (positional scores are not per-term sums)."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        return self.segment_index.explain(
            query, limit=limit, roles=roles, since=since_dt,
            until=until_dt, fuzzy=fuzzy,
        )

    def complete(self, prefix: str, limit: int = 10):
        """Term autocomplete over the index vocabulary (Lucene
        suggester UX): terms starting with the analyzed ``prefix``,
        ranked df desc / term asc — (term, df) rows."""
        return self.segment_index.complete(prefix, limit=limit)

    def explain_hybrid(self, query: str, limit: int = 20):
        """Fusion breakdown for a hybrid query (the RRF analog of
        ``explain``): per fused top-``limit`` doc, its 0-based rank in
        the lexical and semantic candidate lists (null when absent)
        and each source's 1/(K+rank+1) contribution — contributions
        sum to the fused score. Candidate fetch is identical to the
        hybrid serving path (3x multiplier, pinned matrix when warm).
        Query-embedded role filters are refused here: the breakdown
        mirrors the UNFILTERED fusion the plain hybrid mode runs."""
        from xf_spark.query.parser import parse_query_extract
        from xf_spark.query.hybrid import candidate_count, rrf_explain_local

        _, qroles = parse_query_extract(query)
        if qroles:
            raise ValueError(
                "explain_hybrid does not take query-embedded filters"
            )
        n = candidate_count(limit)
        lex = self.segment_index.search_many([query], limit=n)[query]
        if self._pinned_vecs is not None:
            sem = self._pinned_topk_block([query], n)[query]
        else:
            if self.embeddings is None:
                raise ValueError(
                    "hybrid explain requires embeddings "
                    "(build with with_embeddings=True)"
                )
            from xf_spark.query.semantic import semantic_topk_many

            sem = semantic_topk_many(self.embeddings, [query], limit=n)[
                query
            ]
        rows = rrf_explain_local(lex, sem, limit=limit)
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("lex_rank", T.LongType()),
                T.StructField("sem_rank", T.LongType()),
                T.StructField("contrib_lex", T.DoubleType()),
                T.StructField("contrib_sem", T.DoubleType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        if not rows:
            from xf_spark.query.segment_search import empty_local

            return empty_local(self.spark, schema)
        # list-backed local relation: lex/sem_rank are nullable longs
        # (None when a doc is in only one list) — a pandas round-trip
        # would coerce them to NaN floats; this is a debug surface, the
        # extra materialization cost is irrelevant
        return self.spark.createDataFrame(rows, schema=schema)

    def significant_terms(
        self,
        query: str,
        limit: int = 20,
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
        min_count: int = 2,
        sample_fraction: float | None = None,
    ) -> DataFrame:
        """Terms over-represented in the match set vs the corpus
        (Elasticsearch significant_terms analog), lift-scored; accepts
        natural-language since/until. ``sample_fraction`` opts into the
        Horvitz-Thompson sampled foreground (100-TB path) — exact when
        None."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        return self.segment_index.significant_terms(
            query,
            limit=limit,
            roles=roles,
            since=since_dt,
            until=until_dt,
            fuzzy=fuzzy,
            min_count=min_count,
            sample_fraction=sample_fraction,
        )

    def search_collapsed(
        self,
        query: str,
        limit: int = 20,
        group_col: str = "conv_id",
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        fuzzy: bool = False,
        hydrate: bool = True,
    ) -> DataFrame:
        """Field collapsing: the best-matching turn of each of the
        top-``limit`` conversations (Elasticsearch collapse analog).
        ``hydrate=True`` joins the k-row result back to the doc store
        (broadcast of the hits, never the docs)."""
        roles = _norm_roles(roles)
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        hits = self.segment_index.search_collapsed(
            query,
            limit=limit,
            group_col=group_col,
            roles=roles,
            since=since_dt,
            until=until_dt,
            fuzzy=fuzzy,
        )
        if not hydrate:
            return hits
        return (
            self.docs.drop(group_col, "shard")
            .join(F.broadcast(hits), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def _search_hits(
        self,
        query: str,
        mode: str = "hybrid",
        limit: int = 20,
        offset: int = 0,
        roles: list[str] | None = None,
        since: str | None = None,
        until: str | None = None,
        ann: bool = False,
        n_probe: int = 4,
        fuzzy: bool = False,
        after: tuple | None = None,
        synonyms: dict | None = None,
        min_should_match: int = 1,
    ) -> DataFrame:
        """search() up to the ranked (doc_id, score) hits — no
        hydration/sort/snippets. msearch's filtered members use this
        directly: the batch contract returns (doc_id, score) tuples,
        so fetching doc text only to drop it would be pure waste."""
        since_dt = parse_date_flexible(since) if since else None
        until_dt = parse_date_flexible(until, end=True) if until else None
        # roles are stored lowercase (input_hint contract) and the query
        # parser lowercases `role:` filters — normalize caller input the
        # same way so `--roles Assistant` intersects, not silently-empty
        roles = _norm_roles(roles)
        mode = {"bm25": "lexical", "vector": "semantic", "rrf": "hybrid"}.get(
            mode, mode
        )
        sem_query = query
        if mode in ("semantic", "hybrid"):
            from xf_spark.query.parser import parse_query_extract, strip_type_filters

            # query-embedded type:/role: filters constrain the semantic
            # branch too (they used to filter only the lexical list —
            # and the raw 'role:...' token was even hash-embedded into
            # the query vector); the kwarg and query filters AND, as on
            # the lexical path
            _, qroles = parse_query_extract(query)  # also rejects NOT type:
            if qroles:
                sem_query = strip_type_filters(query)
                roles = (
                    sorted(set(roles) & set(qroles))
                    if roles
                    else sorted(set(qroles))
                )
        common = dict(roles=roles, since=since_dt, until=until_dt)
        if roles is not None and not roles:
            # contradictory kwarg ∩ query role filters match nothing —
            # but surface mode misconfiguration first: an empty result
            # must not mask 'index built without embeddings'
            if mode in ("semantic", "hybrid") and self.embeddings is None:
                raise ValueError("index built without embeddings")
            if mode not in ("lexical", "semantic", "hybrid"):
                raise ValueError(f"unknown mode {mode}")
            from xf_spark.query.segment_search import empty_local

            hits = empty_local(self.spark, "doc_id long, score double")
        elif mode == "lexical":
            hits = self.segment_index.search(
                query, limit=limit, offset=offset, fuzzy=fuzzy, after=after,
                synonyms=synonyms, min_should_match=min_should_match,
                **common
            )
        elif mode == "semantic":
            if self.embeddings is None:
                raise ValueError("index built without embeddings")
            flt = self._doc_filter(**common)
            pinned = (
                self._pinned_semantic(sem_query, limit + offset)
                if (flt is None and not ann)
                else None
            )
            cent = self._centroids() if ann else None
            if pinned is not None:
                hits = pinned
            elif cent is not None and flt is None:
                from xf_spark.ops.similarity import ivf_topk
                from xf_spark.query.semantic import embed_query

                hits = ivf_topk(
                    self.embeddings,
                    cent,
                    [float(x) for x in embed_query(sem_query)],
                    k=limit + offset,
                    n_probe=n_probe,
                    id_col="doc_id",
                    vec_col=(
                        "vec16"
                        if "vec16" in self.embeddings.columns
                        else "vec"
                    ),
                ).withColumnRenamed("cosine", "score")
            else:
                hits = semantic_topk(
                    self.embeddings,
                    sem_query,
                    limit=limit + offset,
                    doc_filter=flt,
                )
            if offset:
                hits = hits.offset(offset).limit(limit)
        elif mode == "hybrid":
            if self.embeddings is None:
                raise ValueError("index built without embeddings")
            from xf_spark.query.hybrid import candidate_count

            flt = self._doc_filter(**common)
            sem_override = (
                self._pinned_semantic(sem_query, candidate_count(limit, offset))
                if (flt is None and not ann)
                else None
            )
            if sem_override is None and ann and flt is None:
                # IVF semantic branch for hybrid: without it, an
                # unpinned hybrid query full-scans every vector even on
                # an index built with ann_cells — the one path where
                # the 100 TB scan cost can't be pinned away. Lexical
                # branch and RRF fusion are unchanged; n_probe ==
                # n_cells reproduces the exact hybrid result (tested).
                cent = self._centroids()
                if cent is not None:
                    from xf_spark.ops.similarity import ivf_topk
                    from xf_spark.query.semantic import embed_query

                    sem_override = ivf_topk(
                        self.embeddings,
                        cent,
                        [float(x) for x in embed_query(sem_query)],
                        k=candidate_count(limit, offset),
                        n_probe=n_probe,
                        id_col="doc_id",
                        vec_col=(
                            "vec16"
                            if "vec16" in self.embeddings.columns
                            else "vec"
                        ),
                    ).withColumnRenamed("cosine", "score")
            hits = hybrid_search(
                self.segment_index,
                self.embeddings,
                query,
                limit=limit,
                offset=offset,
                doc_filter=flt,
                semantic_override=sem_override,
                semantic_query=sem_query,
                fuzzy=fuzzy,
                **common,
            )
        else:
            raise ValueError(f"unknown mode {mode}")
        return hits

    def _hydrate(self, hits: DataFrame, sort: str = "relevance"):
        """k-row hits -> (full doc rows + score, presorted flag).

        When the hits are already a LOCAL relation (the warm serving
        paths: term-LRU lexical, pinned semantic, hybrid fusion) AND
        the requested sort is relevance, the doc texts are fetched with
        ONE bounded job (`doc_id IN (...)` over the cached docs) and
        assembled driver-side IN HITS ORDER — hits are already ranked
        (score desc, doc_id asc), so no DataFrame orderBy runs at all
        (an orderBy over even a 100-row local relation costs ~0.7 s of
        shuffle scheduling, measured). Non-relevance sorts and
        distributed hits keep the broadcast-join + orderBy shape (the
        k-row side broadcasts, never docs)."""
        try:
            is_local = hits.isLocal()
        except Exception:  # noqa: BLE001 — streaming/unsupported plans
            is_local = False
        if not is_local or sort != "relevance":
            return self.docs.join(F.broadcast(hits), "doc_id"), False
        rows = hits.collect()  # local relation: no cluster job
        if not rows:
            return self.docs.join(F.broadcast(hits), "doc_id"), False
        return (
            self._hydrate_rows(
                [(r["doc_id"], float(r["score"])) for r in rows]
            ),
            True,
        )

    def _hydrate_rows(self, pairs: list[tuple[int, float]]) -> DataFrame:
        """Driver-side hydration of ranked (doc_id, score) pairs into
        ONE local relation (the single Arrow round-trip of a warm
        query). Pairs are already in relevance order; row order is
        preserved, so no DataFrame orderBy runs."""
        from pyspark.sql import types as T

        cols = ["doc_id"] + [c for c in self.docs.columns if c != "doc_id"]
        if self._pinned_docs is not None:
            # pinned doc store: pure dict lookups, zero Spark jobs
            pcols, store = self._pinned_docs
            data = [
                store[d] + (float(s),) for d, s in pairs if d in store
            ]
            cols = pcols
        else:
            score_ids = [d for d, _s in pairs]
            got = {
                r["doc_id"]: r
                for r in self.docs.where(
                    F.col("doc_id").isin(score_ids)
                ).collect()
            }
            data = [
                tuple(got[d][c] for c in cols) + (float(s),)
                for d, s in pairs
                if d in got
            ]
        schema = T.StructType(
            [self.docs.schema[c] for c in cols]
            + [T.StructField("score", T.DoubleType())]
        )
        if not data:
            from xf_spark.query.segment_search import empty_local

            return empty_local(self.spark, schema)
        import pandas as pd

        from xf_spark.query.segment_search import arrow_local

        # Arrow local relation: the list-backed form costs ~250 ms of
        # per-row pickle plan evaluation on collect (measured)
        pdf = pd.DataFrame(data, columns=cols + ["score"])
        return arrow_local(self.spark, schema, pdf)

    def _pinned_topk_block(
        self, queries: list[str], k: int
    ) -> dict[str, list[tuple[int, float]]]:
        """Semantic top-k for a query block against the pinned matrix:
        ONE sgemm for the batch, per-query exact top-k."""
        import numpy as np

        from xf_spark.query.semantic import embed_query

        pv = self._pinned_vecs
        Q = np.stack([embed_query(q) for q in queries])
        # one sgemm for the batch; transpose to C-contiguous per-query
        # rows before the per-query top-k
        scores = np.ascontiguousarray(pv.score_block(Q).T)
        out = {}
        for j, q in enumerate(queries):
            ids, sc = pv.topk(Q[j], k, sc32=scores[j])
            out[q] = list(zip(ids.tolist(), sc.tolist()))
        return out

    def msearch(
        self,
        queries: list[str],
        limit: int = 20,
        mode: str = "lexical",
        fuzzy: bool = False,
    ) -> dict[str, list[tuple[int, float]]]:
        """Batched multi-search — the serving path for query streams.
        The result is keyed by query string, so duplicate batch
        members collapse and each DISTINCT query is evaluated once.

        lexical: one pruned segment scan + one decode for the batch
        (segment_search.search_many; heavy members batch through one
        distributed job).
        semantic: ONE matmul of the whole query-vector block against
        the coordinator-pinned embedding matrix when pinned, else ONE
        distributed scan scoring the whole block (semantic_topk_many —
        the 10^12-turn regime, where vectors exceed pin_vectors_mb).
        hybrid: lexical batch + semantic batch (as above) + per-query
        k-sized RRF fusion."""
        distinct = list(dict.fromkeys(queries))
        # same alias map as search(): the two facade entry points must
        # agree on valid mode values
        mode = {"bm25": "lexical", "vector": "semantic", "rrf": "hybrid"}.get(
            mode, mode
        )
        if mode == "lexical":
            return self.segment_index.search_many(
                distinct, limit=limit, fuzzy=fuzzy
            )
        if mode not in ("semantic", "hybrid"):
            raise ValueError(
                f"msearch mode must be lexical|semantic|hybrid, got {mode!r}"
            )
        from xf_spark.query.hybrid import _rrf_fuse_local, candidate_count
        from xf_spark.query.semantic import semantic_topk_many

        if self._pinned_vecs is None and self.embeddings is None:
            raise ValueError(
                f"msearch mode={mode!r} requires embeddings "
                "(build with with_embeddings=True)"
            )
        # members carrying query-embedded type:/role: filters can't ride
        # the block paths (no per-query doc filter there) — they take
        # the filtered single-query path, same as search_many's
        # treatment on the lexical side; unparseable members isolate as
        # empty results instead of poisoning the batch (same contract)
        from xf_spark.query.parser import parse_query_extract

        plain: list[str] = []
        role_filtered: list[str] = []
        rejected: list[str] = []
        for q in distinct:
            try:
                _, qroles = parse_query_extract(q)
            except ValueError:
                rejected.append(q)
                continue
            (role_filtered if qroles else plain).append(q)
        if rejected:
            import logging

            logging.getLogger(__name__).warning(
                "msearch: %d unparseable batch member(s) served as "
                "empty results: %s", len(rejected), rejected[:5],
            )
        out: dict[str, list[tuple[int, float]]] = {q: [] for q in rejected}
        for q in role_filtered:
            out[q] = [
                (r["doc_id"], r["score"])
                for r in self._search_hits(
                    q, mode=mode, limit=limit, fuzzy=fuzzy
                ).collect()
            ]
        if mode == "semantic":
            if plain:
                if self._pinned_vecs is not None:
                    out.update(self._pinned_topk_block(plain, limit))
                else:
                    out.update(
                        semantic_topk_many(self.embeddings, plain, limit=limit)
                    )
            return out

        if plain:
            n = candidate_count(limit)
            lex_all = self.segment_index.search_many(
                plain, limit=n, fuzzy=fuzzy
            )
            if self._pinned_vecs is not None:
                sem_all = self._pinned_topk_block(plain, n)
            else:
                # pin absent (uncached, or over pin_vectors_mb budget —
                # the guaranteed state at 10^12 turns): ONE distributed
                # scan scores the whole block. Identical results, no
                # per-query cluster pass (round 3; was a job per query).
                sem_all = semantic_topk_many(self.embeddings, plain, limit=n)
            out.update(
                {
                    q: _rrf_fuse_local(lex_all[q], sem_all[q], limit=limit)
                    for q in plain
                }
            )
        return out

    def _doc_filter(self, roles=None, since=None, until=None):
        if not roles and since is None and until is None:
            return None
        from xf_spark.query.segment_search import _attr_cond

        # same predicate the lexical path pushes down — one definition,
        # so filter semantics can never diverge between branches
        return self.docs.where(_attr_cond(roles, since, until)).select("doc_id")

    # -- stats (cmd stats analog) -------------------------------------------

    def stats(self, detailed: bool = False) -> dict:
        from xf_spark.analytics import stats as S

        def _typed(prefix):
            return F.sum(
                F.col("conv_id").startswith(prefix).cast("long")
            )

        basic = self.docs.agg(
            F.count("*").alias("n_turns"),
            F.countDistinct("conv_id").alias("n_conversations"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            # per-doc-type counts in the SAME scan (StorageStats,
            # main.rs:2100-2126) — zero on non-archive corpora
            _typed("tweet_").alias("tweets"),
            _typed("like_").alias("likes"),
            _typed("dm_").alias("dm_messages"),
            F.countDistinct(
                F.when(F.col("conv_id").startswith("dm_"), F.col("conv_id"))
            ).alias("dm_conversations"),
            _typed("grok_").alias("grok_messages"),
        ).first()
        out = {k: basic[k] for k in basic.asDict()}
        out["doc_types"] = {
            k: out.pop(k)
            for k in (
                "tweets", "likes", "dm_messages", "dm_conversations",
                "grok_messages",
            )
        }
        if detailed:
            out["activity"] = S.activity_summary(self.docs).first().asDict()
            out["daily"] = [r.asDict() for r in S.daily_counts(self.docs).collect()]
            out["hourly"] = [
                r.asDict() for r in S.hourly_distribution(self.docs).collect()
            ]
            out["tools"] = [r.asDict() for r in S.top_tools(self.docs).collect()]
            out["length_histogram"] = [
                r.asDict() for r in S.length_histogram(self.docs).collect()
            ]
        return out
