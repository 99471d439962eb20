"""Incremental segment append: index only the delta, never rewrite
existing segments — results must be rank- and score-identical to a
full rebuild over the union, and WAND must stay exact under the
avgdl-corrected block bounds."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from xf_spark.engine import XfIndex
from xf_spark.transcripts import load_transcripts

QUERIES = [
    ("machine", 30),
    ("rust async patterns", 30),
    ('"machine learning"', 20),
    ("rust AND async", 20),
    ("python NOT snake", 20),
    ("progr*", 20),
]


def _split(tr, frac=0.7):
    convs = [r[0] for r in tr.select("conv_id").distinct().orderBy("conv_id").collect()]
    cut = convs[int(len(convs) * frac)]
    return tr.where(F.col("conv_id") < cut), tr.where(F.col("conv_id") >= cut)


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    """(incrementally-appended index, full-rebuild index) over the
    same corpus; the append half sorts AFTER the base half so doc_ids
    coincide and results can be compared verbatim."""
    tr = load_transcripts(spark, 0.001)
    part1, part2 = _split(tr)
    inc_path = str(tmp_path_factory.mktemp("apx") / "inc")
    full_path = str(tmp_path_factory.mktemp("apx") / "full")
    inc = XfIndex.build(part1, inc_path, with_embeddings=False, slices=1)
    inc = inc.append(part2)
    full = XfIndex.build(tr, full_path, with_embeddings=False, slices=1)
    return inc, full


class TestIncrementalAppend:
    def test_stats_match_full_rebuild(self, pair):
        inc, full = pair
        mi, mf = inc.segment_index.meta, full.segment_index.meta
        assert mi["n_docs"] == mf["n_docs"]
        assert abs(mi["avgdl"] - mf["avgdl"]) < 1e-9
        assert mi["slice_avgdl"]  # old slices recorded their encode avgdl

    @pytest.mark.parametrize("query,limit", QUERIES, ids=[q for q, _ in QUERIES])
    def test_results_identical_to_full_rebuild(self, pair, query, limit):
        inc, full = pair
        got = [(r["doc_id"], round(r["score"], 9)) for r in
               inc.segment_index.search(query, limit=limit).collect()]
        want = [(r["doc_id"], round(r["score"], 9)) for r in
                full.segment_index.search(query, limit=limit).collect()]
        assert got == want and len(want) > 0

    @pytest.mark.parametrize("query,limit", QUERIES, ids=[q for q, _ in QUERIES])
    def test_wand_exact_under_scaled_bounds(self, pair, query, limit):
        """The load-bearing pin: appended indexes serve corrected
        block-max bounds; WAND pruning must still return exactly the
        exhaustive answer."""
        inc, _ = pair
        fast = [(r["doc_id"], round(r["score"], 9)) for r in
                inc.segment_index.search(query, limit=limit).collect()]
        slow = [(r["doc_id"], round(r["score"], 9)) for r in
                inc.segment_index.search(query, limit=limit, exhaustive=True).collect()]
        assert fast == slow

    def test_append_is_deduped_noop(self, spark, pair):
        inc, _ = pair
        before = inc.segment_index.meta["n_docs"]
        docs = inc.docs.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        inc2 = inc.append(docs.limit(50))  # all already present
        assert inc2.segment_index.meta["n_docs"] == before

    def test_interleaved_append_same_scores(self, spark, tmp_path):
        """Appending convs that interleave the existing ordering: doc
        ids diverge from a full rebuild, but per-turn BM25 scores and
        the ranked (conv_id, turn_idx) sets must not."""
        tr = load_transcripts(spark, 0.001)
        odd = tr.where(F.crc32("conv_id") % 2 == 1)
        even = tr.where(F.crc32("conv_id") % 2 == 0)
        inc = XfIndex.build(odd, str(tmp_path / "i"), with_embeddings=False, slices=1)
        inc = inc.append(even)
        full = XfIndex.build(tr, str(tmp_path / "f"), with_embeddings=False, slices=1)
        for query in ("machine", '"machine learning"'):
            got = [
                (r["conv_id"], r["turn_idx"], round(r["score"], 6))
                for r in inc.search(query, mode="lexical", limit=25).collect()
            ]
            want = [
                (r["conv_id"], r["turn_idx"], round(r["score"], 6))
                for r in full.search(query, mode="lexical", limit=25).collect()
            ]
            assert len(got) == len(want) > 0
            # scores are a pure function of content -> multisets match;
            # WHICH tie members sit at the boundary depends on doc_id
            # assignment order, which legitimately differs here
            assert sorted(s for _, _, s in got) == sorted(s for _, _, s in want)
            cut = min(s for _, _, s in want)
            assert {(c, t) for c, t, s in got if s > cut} == {
                (c, t) for c, t, s in want if s > cut
            }


class TestTornAppendRepair:
    """Round-2 fix (ADVICE): a crash between the docs-delta write and
    the meta replace must not leave stale global stats forever — a
    rerun (or doctor --repair) reconciles meta from the orphan rows."""

    def _torn(self, spark, tmp_path, name):
        tr = load_transcripts(spark, 0.001)
        part1, part2 = _split(tr)
        path = str(tmp_path / name)
        ix = XfIndex.build(part1, path, with_embeddings=False, slices=1)
        meta_path = os.path.join(path, "meta.json")
        with open(meta_path) as f:
            stale = f.read()
        ix.append(part2)
        with open(meta_path) as f:
            committed = json.load(f)
        # simulate the crash: segments + docs committed, meta rolled back
        with open(meta_path, "w") as f:
            f.write(stale)
        return path, part2, committed, meta_path

    def test_rerun_repairs_meta_and_serves_exact(self, spark, tmp_path):
        from xf_spark.index.segments import append_index

        path, part2, committed, meta_path = self._torn(spark, tmp_path, "torn1")
        n, stats = append_index(part2, path)
        assert n == 0  # the delta is already on disk — no re-encode
        with open(meta_path) as f:
            repaired = json.load(f)
        assert repaired["n_docs"] == committed["n_docs"]
        assert abs(repaired["avgdl"] - committed["avgdl"]) < 1e-9
        assert repaired["total_tokens"] == committed["total_tokens"]
        assert repaired["next_slice"] == committed["next_slice"]
        assert repaired["next_shard"] == committed["next_shard"]
        assert repaired["slice_avgdl"] == committed["slice_avgdl"]
        assert stats.n_docs == committed["n_docs"]
        ix = XfIndex.open(spark, path)
        fast = [(r["doc_id"], round(r["score"], 9)) for r in
                ix.segment_index.search("machine", limit=20).collect()]
        slow = [(r["doc_id"], round(r["score"], 9)) for r in
                ix.segment_index.search("machine", limit=20, exhaustive=True).collect()]
        assert fast == slow and fast

    def test_doctor_repair_flag_heals(self, spark, tmp_path):
        from xf_spark.doctor import run_doctor

        path, _, committed, meta_path = self._torn(spark, tmp_path, "torn2")
        checks = run_doctor(spark, path, sample_query="machine", repair=True)
        bad = [c.name for c in checks if not c.ok]
        assert not bad, bad
        with open(meta_path) as f:
            repaired = json.load(f)
        assert repaired["n_docs"] == committed["n_docs"]


class TestAppendOperational:
    def test_doctor_passes_on_appended_index(self, spark, pair):
        from xf_spark.doctor import run_doctor

        inc, _ = pair
        checks = run_doctor(spark, inc.path, sample_query="machine")
        bad = [c.name for c in checks if not c.ok]
        assert not bad, f"doctor failed on appended index: {bad}"

    def test_dedup_false_skips_antijoin(self, spark, tmp_path):
        from pyspark.sql import functions as F

        tr = load_transcripts(spark, 0.001)
        p1, p2 = _split(tr)
        ix = XfIndex.build(p1, str(tmp_path / "i"), with_embeddings=False, slices=1)
        n1 = ix.segment_index.meta["n_docs"]
        ix = ix.append(p2, dedup=False)
        assert ix.segment_index.meta["n_docs"] == n1 + p2.count()


class TestCrashWindows:
    """Resume/heal behavior for the build and append crash windows
    (review findings: a dir without _SUCCESS was treated as a complete
    write; an embeddings hole after a mid-append crash was permanent
    because the retry dedups to n_added == 0)."""

    def test_build_rewrites_incomplete_docs_store(self, spark, tmp_path):
        tr = load_transcripts(spark, 0.001)
        path = str(tmp_path / "bi")
        ix = XfIndex.build(tr, path, with_embeddings=False, slices=1)
        n = ix.docs.count()
        docs_path = os.path.join(path, "docs")
        # simulate a crashed mid-job write: dir exists, no _SUCCESS,
        # data files incomplete
        os.remove(os.path.join(docs_path, "_SUCCESS"))
        for f in os.listdir(docs_path):
            if f.endswith(".parquet"):
                os.remove(os.path.join(docs_path, f))
        ix2 = XfIndex.build(tr, path, with_embeddings=False, slices=1)
        assert ix2.docs.count() == n

    def test_append_backfills_embedding_hole(self, spark, tmp_path):
        import shutil

        tr = load_transcripts(spark, 0.001)
        part1, part2 = _split(tr)
        path = str(tmp_path / "ih")
        ix = XfIndex.build(part1, path, slices=1)
        emb_path = os.path.join(path, "embeddings")
        backup = str(tmp_path / "emb_backup")
        shutil.copytree(emb_path, backup)
        ix.append(part2)
        n_docs = ix.docs.count()
        assert ix.embeddings.count() == n_docs
        want = [(r["doc_id"], round(r["score"], 9)) for r in
                ix.search("machine", mode="semantic", limit=10).collect()]
        # wind the embeddings store back: the state after a crash
        # between the lexical commit and the embeddings extension
        shutil.rmtree(emb_path)
        shutil.copytree(backup, emb_path)
        ix2 = XfIndex.open(spark, path)
        assert ix2.embeddings.count() < n_docs
        # the retry dedups every doc away (n_added == 0) — the heal
        # must backfill the hole anyway
        ix2.append(part2)
        assert ix2.embeddings.count() == n_docs
        got = [(r["doc_id"], round(r["score"], 9)) for r in
               ix2.search("machine", mode="semantic", limit=10).collect()]
        assert got == want


class TestLifecycleFuzz:
    """Seeded random append/compact interleavings must serve verbatim
    what one full build over the same corpus serves — the composed
    lifecycle, not just each op in isolation (append and compact are
    individually pinned above / in test_compact.py; a sequence
    exercises slice-count, avgdl-correction, and shard-derivation
    states none of the single-op tests reach)."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        tr = load_transcripts(spark, 0.001)
        convs = [
            r[0]
            for r in tr.select("conv_id").distinct().orderBy("conv_id").collect()
        ]
        cuts = [convs[len(convs) * i // 4] for i in (1, 2, 3)]
        parts = [
            tr.where(F.col("conv_id") < cuts[0]),
            tr.where((F.col("conv_id") >= cuts[0]) & (F.col("conv_id") < cuts[1])),
            tr.where((F.col("conv_id") >= cuts[1]) & (F.col("conv_id") < cuts[2])),
            tr.where(F.col("conv_id") >= cuts[2]),
        ]
        return tr, parts

    @pytest.fixture(scope="class")
    def full(self, spark, corpus, tmp_path_factory):
        tr, _ = corpus
        return XfIndex.build(
            tr, str(tmp_path_factory.mktemp("lf") / "full"),
            with_embeddings=False, slices=1,
        )

    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_lifecycle_equals_rebuild(
        self, spark, corpus, full, tmp_path, seed
    ):
        import random

        rng = random.Random(seed)
        _, parts = corpus
        ix = XfIndex.build(
            parts[0], str(tmp_path / f"s{seed}"),
            with_embeddings=False, slices=1,
        )
        for p in parts[1:]:
            ix = ix.append(p)
            if rng.random() < 0.5:
                ix = ix.compact()
        if rng.random() < 0.5:
            ix = ix.compact()
        for query, limit in QUERIES:
            got = [(r["doc_id"], round(r["score"], 9)) for r in
                   ix.segment_index.search(query, limit=limit).collect()]
            want = [(r["doc_id"], round(r["score"], 9)) for r in
                    full.segment_index.search(query, limit=limit).collect()]
            assert got == want and len(want) > 0, (seed, query)
        assert ix.docs.count() == full.docs.count()

    @pytest.mark.parametrize("seed", [2, 3])
    def test_lifecycle_with_purge_equals_survivor_rebuild(
        self, spark, corpus, tmp_path, seed
    ):
        """Random append/compact sequence ending in a compact(drop=…)
        purge must serve what a flat rebuild over the SURVIVORS
        serves: identical global stats and identical ranked
        (conv_id, turn_idx, score) lists. doc_ids differ by design —
        the purge preserves ids (holes), the rebuild re-densifies —
        but dense re-rank preserves relative order, so the hydrated
        rank lists must match verbatim."""
        import random

        rng = random.Random(seed)
        _, parts = corpus
        ix = XfIndex.build(
            parts[0], str(tmp_path / f"p{seed}"),
            with_embeddings=False, slices=1,
        )
        for p in parts[1:]:
            ix = ix.append(p)
            if rng.random() < 0.5:
                ix = ix.compact()
        mod = rng.randrange(3, 7)
        rem = rng.randrange(mod)
        # materialize the dropped keys BEFORE compacting: a DataFrame
        # whose plan reads pre-swap files cannot be evaluated after
        # the store swap (FileStatusCache trap, see segments.py)
        dropped = ix.docs.where(F.col("doc_id") % mod == rem).select(
            "conv_id", "turn_idx"
        ).collect()
        assert 0 < len(dropped) < ix.docs.count()
        drop = ix.docs.where(F.col("doc_id") % mod == rem).select("doc_id")
        ix = ix.compact(drop=drop)

        spark_keys = spark.createDataFrame(
            [(r["conv_id"], r["turn_idx"]) for r in dropped],
            "conv_id string, turn_idx int",
        )
        tr, _ = corpus
        survivors = tr.join(spark_keys, ["conv_id", "turn_idx"], "left_anti")
        rebuilt = XfIndex.build(
            survivors, str(tmp_path / f"r{seed}"),
            with_embeddings=False, slices=1,
        )
        mi, mr = ix.segment_index.meta, rebuilt.segment_index.meta
        assert mi["n_docs"] == mr["n_docs"]
        assert abs(mi["avgdl"] - mr["avgdl"]) < 1e-9
        assert mi["total_tokens"] == mr["total_tokens"]

        def ranked(index, query, limit):
            # the hydration join does not preserve hit order; re-sort
            # by the engine tiebreak (score desc, doc_id asc) — dense
            # re-rank preserves relative doc_id order, so the two
            # indexes' sequences are comparable verbatim
            hits = index.segment_index.search(query, limit=limit)
            return [
                (r["conv_id"], r["turn_idx"], round(r["score"], 9))
                for r in hits.join(index.docs, "doc_id")
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .select("conv_id", "turn_idx", "score")
                .collect()
            ]

        for query, limit in QUERIES:
            got = ranked(ix, query, limit)
            want = ranked(rebuilt, query, limit)
            assert got == want and len(want) > 0, (seed, query)


class TestDedupRange:
    """The conv-range-bounded dedup backstop (sync_iceberg's scale
    contract): the anti-join scans ONLY the given conv_id range of the
    stored docs, so at 10^12 turns a daily delta never pays a corpus
    scan. Pinned behaviorally from both sides: duplicates inside the
    range are dropped, duplicates outside it are NOT seen (misuse
    demonstrates the scan really is bounded)."""

    def test_range_bounds_the_backstop_scan(self, spark, tmp_path):
        tr = load_transcripts(spark, 0.001)
        base, delta = _split(tr)
        path = str(tmp_path / "ix")
        ix = XfIndex.build(base, path, with_embeddings=False,
                           n_shards=4, slices=1)

        # replayed delta WITH the correct range: all duplicates caught
        b = delta.agg(F.min("conv_id").alias("lo"),
                      F.max("conv_id").alias("hi")).first()
        ix = ix.append(delta, dedup=True, dedup_range=(b["lo"], b["hi"]))
        n1 = ix.docs.count()
        ix = ix.append(delta, dedup=True, dedup_range=(b["lo"], b["hi"]))
        assert ix.docs.count() == n1  # replay added nothing

        # a range that EXCLUDES the duplicates: the bounded scan cannot
        # see them, so they append — proof the filter reaches the scan
        some_base = base.limit(20)
        ix = ix.append(
            some_base, dedup=True,
            dedup_range=("zzzz", "zzzz"),  # empty scope
        )
        assert ix.docs.count() == n1 + 20

    def test_meta_extra_commits_with_stats(self, spark, tmp_path):
        tr = load_transcripts(spark, 0.001)
        base, delta = _split(tr)
        path = str(tmp_path / "ix2")
        ix = XfIndex.build(base, path, with_embeddings=False,
                           n_shards=4, slices=1)
        ix = ix.append(delta, meta_extra={"iceberg_sync": {"snapshot_id": 7}})
        assert ix.segment_index.meta["iceberg_sync"] == {"snapshot_id": 7}
        # all-duplicate replay (m == 0) still advances caller state
        ix = ix.append(delta, meta_extra={"iceberg_sync": {"snapshot_id": 8}})
        assert json.load(open(os.path.join(path, "meta.json")))[
            "iceberg_sync"
        ] == {"snapshot_id": 8}
