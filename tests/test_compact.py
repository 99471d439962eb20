"""Slice compaction (segments.compact_index): merging appended slices
into one re-sharded slice must preserve every query result verbatim
(doc_ids are preserved by design), keep WAND exact under the freshly
re-encoded block bounds, serve filtered queries correctly despite the
now-stale stored docs.shard column, compose with further appends, and
survive a crash in any commit window via the marker protocol."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from xf_spark.engine import XfIndex
from xf_spark.index import segments as segmod
from xf_spark.index.segments import compact_index, recover_compaction
from xf_spark.transcripts import load_transcripts

QUERIES = [
    ("machine", 30),
    ('"machine learning"', 20),
    ("rust AND async", 20),
    ("python NOT snake", 20),
    ("progr*", 20),
]


def _thirds(tr):
    convs = [r[0] for r in tr.select("conv_id").distinct().orderBy("conv_id").collect()]
    c1, c2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    return (
        tr.where(F.col("conv_id") < c1),
        tr.where((F.col("conv_id") >= c1) & (F.col("conv_id") < c2)),
        tr.where(F.col("conv_id") >= c2),
    )


def _topk(ix, query, limit, **kw):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in ix.segment_index.search(query, limit=limit, **kw).collect()
    ]


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    """(multi-slice appended index, byte-identical copy compacted):
    the copy guarantees identical doc_ids, so results compare
    verbatim. Two appends -> three slices, three shard ranges."""
    tr = load_transcripts(spark, 0.001)
    p1, p2, p3 = _thirds(tr)
    root = tmp_path_factory.mktemp("cpx")
    plain_path = str(root / "plain")
    plain = XfIndex.build(p1, plain_path, with_embeddings=False, slices=1)
    plain = plain.append(p2).append(p3)
    comp_path = str(root / "comp")
    shutil.copytree(plain_path, comp_path)
    comp = XfIndex.open(spark, comp_path).compact()
    return plain, comp


class TestCompaction:
    def test_single_slice_and_exact_bounds(self, pair):
        plain, comp = pair
        seg_root = os.path.join(comp.path, "segments")
        assert sorted(
            d for d in os.listdir(seg_root) if d.startswith("slice=")
        ) == ["slice=0"]
        meta = comp.segment_index.meta
        assert meta["next_slice"] == 1
        # compacted slice encoded at the current avgdl -> scale 1.0,
        # recorded as an EMPTY slice_avgdl (same as a fresh build) so
        # a repeat compact() recognizes there is nothing to do
        assert meta["slice_avgdl"] == {}
        assert meta["docs_shard_stale"] is True
        n_slices, m = compact_index(comp.spark, comp.path)
        assert n_slices == 1 and m is None  # idempotent no-op
        # global stats untouched by compaction
        pm = plain.segment_index.meta
        assert meta["n_docs"] == pm["n_docs"]
        assert abs(meta["avgdl"] - pm["avgdl"]) < 1e-12
        # no tmp/marker litter after commit
        assert not os.path.exists(os.path.join(comp.path, "compact.commit.json"))
        assert not os.path.isdir(os.path.join(comp.path, "segments.pre-compact"))

    @pytest.mark.parametrize("query,limit", QUERIES, ids=[q for q, _ in QUERIES])
    def test_results_identical(self, pair, query, limit):
        plain, comp = pair
        got, want = _topk(comp, query, limit), _topk(plain, query, limit)
        assert got == want and len(want) > 0

    @pytest.mark.parametrize("query,limit", QUERIES, ids=[q for q, _ in QUERIES])
    def test_wand_exact_post_compact(self, pair, query, limit):
        _, comp = pair
        assert _topk(comp, query, limit) == _topk(
            comp, query, limit, exhaustive=True
        )

    def test_filtered_identical_despite_stale_docs_shard(self, pair):
        """The copied docs parquet still carries the PRE-compaction
        shard column; meta.docs_shard_stale must route the filtered
        cogroup through the segment-derived shard expression. Force
        the distributed path (the driver fast path never consults
        shard at all)."""
        plain, comp = pair
        old_p, old_c = (
            plain.segment_index.driver_topk_threshold,
            comp.segment_index.driver_topk_threshold,
        )
        plain.segment_index.driver_topk_threshold = 0
        comp.segment_index.driver_topk_threshold = 0
        try:
            for kw in (
                {"roles": ["user"]},
                {"roles": ["assistant"], "since": "2024-01-01"},
            ):
                got = _topk(comp, "machine", 25, **kw)
                want = _topk(plain, "machine", 25, **kw)
                assert got == want and len(want) > 0
        finally:
            plain.segment_index.driver_topk_threshold = old_p
            comp.segment_index.driver_topk_threshold = old_c

    def test_term_dfs_preserved(self, pair):
        plain, comp = pair
        terms = {"machine", "learning", "rust", "python"}
        assert comp.segment_index.term_dfs(terms, "text") == plain.segment_index.term_dfs(
            terms, "text"
        )

    def test_append_after_compact_matches_plain(self, spark, tmp_path):
        """compact -> append must serve identically to append on the
        never-compacted twin (doc_ids align by construction)."""
        tr = load_transcripts(spark, 0.001)
        p1, p2, p3 = _thirds(tr)
        plain_path = str(tmp_path / "plain2")
        plain = XfIndex.build(p1, plain_path, with_embeddings=False, slices=1)
        plain = plain.append(p2)
        comp_path = str(tmp_path / "comp2")
        shutil.copytree(plain_path, comp_path)
        comp = XfIndex.open(spark, comp_path).compact()
        plain = plain.append(p3)
        comp = comp.append(p3)
        for query, limit in QUERIES:
            got, want = _topk(comp, query, limit), _topk(plain, query, limit)
            assert got == want and len(want) > 0
            assert _topk(comp, query, limit, exhaustive=True) == got

    def test_doctor_green_post_compact(self, spark, pair):
        from xf_spark.doctor import run_doctor

        _, comp = pair
        checks = run_doctor(spark, comp.path)
        bad = [c for c in checks if not c.ok]
        assert not bad, bad

    def test_noop_on_freshly_built_single_slice(self, spark, tmp_path):
        tr = load_transcripts(spark, 0.001)
        p1, _, _ = _thirds(tr)
        path = str(tmp_path / "fresh")
        XfIndex.build(p1, path, with_embeddings=False, slices=1)
        n_before, m = compact_index(spark, path)
        assert n_before == 1 and m is None


class TestCompactionRecovery:
    def _build_two_slice(self, spark, tmp_path, name):
        tr = load_transcripts(spark, 0.001)
        p1, p2, _ = _thirds(tr)
        path = str(tmp_path / name)
        ix = XfIndex.build(p1, path, with_embeddings=False, slices=1)
        return ix.append(p2), path

    def test_tmp_without_marker_is_rolled_back(self, spark, tmp_path):
        """Crash BEFORE the marker write: old index stays authoritative
        and the garbage tmp dirs are dropped at next load."""
        ix, path = self._build_two_slice(spark, tmp_path, "rb")
        want = _topk(ix, "machine", 20)
        os.makedirs(os.path.join(path, "segments.compact-tmp", "slice=0"))
        assert recover_compaction(path) is False
        assert not os.path.isdir(os.path.join(path, "segments.compact-tmp"))
        ix2 = XfIndex.open(spark, path)
        assert _topk(ix2, "machine", 20) == want
        # still two slices — nothing was committed
        assert len(
            [d for d in os.listdir(os.path.join(path, "segments")) if d.startswith("slice=")]
        ) == 2

    def test_marker_committed_compaction_rolls_forward(
        self, spark, tmp_path, monkeypatch
    ):
        """Crash AFTER the marker write but before the dir swap: the
        next load must finish the commit and serve the compacted
        index with identical results."""
        ix, path = self._build_two_slice(spark, tmp_path, "rf")
        want = _topk(ix, "machine", 20)
        want_f = _topk(ix, '"machine learning"', 20)
        # let compact_index run fully but suppress its final commit
        # (the internal recover_compaction call), leaving the exact
        # pre-swap crash state: tmp dirs + marker + old segments/meta
        real = segmod.recover_compaction
        calls = {"n": 0}

        def flaky(p):
            calls["n"] += 1
            if calls["n"] == 1:  # the entry-cleanup call
                return real(p)
            return False  # the commit call "crashes"

        monkeypatch.setattr(segmod, "recover_compaction", flaky)
        compact_index(spark, path)
        monkeypatch.setattr(segmod, "recover_compaction", real)
        assert os.path.exists(os.path.join(path, "compact.commit.json"))
        assert os.path.isdir(os.path.join(path, "segments.compact-tmp"))
        with open(os.path.join(path, "meta.json")) as f:
            assert "docs_shard_stale" not in json.load(f)  # old meta intact
        # next open finishes the commit
        ix2 = XfIndex.open(spark, path)
        meta = ix2.segment_index.meta
        assert meta["docs_shard_stale"] is True and meta["next_slice"] == 1
        assert not os.path.exists(os.path.join(path, "compact.commit.json"))
        assert _topk(ix2, "machine", 20) == want
        assert _topk(ix2, '"machine learning"', 20) == want_f

    def test_mid_swap_crash_restores_then_commits(self, spark, tmp_path, monkeypatch):
        """Crash BETWEEN the two renames (segments gone, pre-compact +
        tmp both present, marker present): recovery must still land on
        the committed state."""
        ix, path = self._build_two_slice(spark, tmp_path, "ms")
        want = _topk(ix, "machine", 20)
        real = segmod.recover_compaction
        calls = {"n": 0}

        def flaky(p):
            calls["n"] += 1
            return real(p) if calls["n"] == 1 else False

        monkeypatch.setattr(segmod, "recover_compaction", flaky)
        compact_index(spark, path)
        monkeypatch.setattr(segmod, "recover_compaction", real)
        # manufacture the mid-swap window: first rename done, second not
        os.rename(
            os.path.join(path, "segments"),
            os.path.join(path, "segments.pre-compact"),
        )
        ix2 = XfIndex.open(spark, path)
        assert _topk(ix2, "machine", 20) == want
        assert ix2.segment_index.meta["next_slice"] == 1


class TestDropCompaction:
    """compact(drop=...) = physical dedup purge: postings excised,
    docs/embeddings rewritten, and the global BM25 stats must come out
    EXACTLY as a fresh build over the survivors (that is the
    correctness contract — scores are pure content functions, so the
    ranked sets must agree with a rebuild modulo doc_id assignment)."""

    @pytest.fixture(scope="class")
    def dropped(self, spark, tmp_path_factory):
        tr = load_transcripts(spark, 0.001)
        p1, p2, _ = _thirds(tr)
        root = tmp_path_factory.mktemp("dropx")
        path = str(root / "purged")
        ix = XfIndex.build(p1, path, with_embeddings=True, slices=1)
        ix = ix.append(p2)
        # content-defined drop set (every 3rd conversation) so the
        # survivor corpus is reconstructible for the rebuild twin
        pred = F.crc32("conv_id") % 3 == 0
        drop = ix.docs.where(pred).select("doc_id")
        n_drop = drop.count()
        ix = ix.compact(drop=drop)
        surv = tr.join(
            p1.union(p2).where(pred).select("conv_id").distinct(),
            "conv_id",
            "left_anti",
        ).join(p1.union(p2).select("conv_id").distinct(), "conv_id", "left_semi")
        rb = XfIndex.build(
            surv, str(root / "rebuild"), with_embeddings=False, slices=1
        )
        return ix, rb, n_drop

    def test_stats_equal_rebuild(self, dropped):
        ix, rb, n_drop = dropped
        mi, mr = ix.segment_index.meta, rb.segment_index.meta
        assert n_drop > 0
        assert mi["n_docs"] == mr["n_docs"]
        assert abs(mi["avgdl"] - mr["avgdl"]) < 1e-9
        assert mi["total_tokens"] == mr["total_tokens"]
        # id ceiling unchanged: survivors keep their original ids
        assert mi["doc_id_bound"] == mi["n_docs"] + n_drop

    def test_term_dfs_equal_rebuild(self, dropped):
        ix, rb, _ = dropped
        terms = {"machine", "learning", "rust", "python", "the"}
        assert ix.segment_index.term_dfs(terms, "text") == rb.segment_index.term_dfs(
            terms, "text"
        )

    @pytest.mark.parametrize("query", ["machine", '"machine learning"', "rust AND async"])
    def test_scores_equal_rebuild(self, dropped, query):
        ix, rb, _ = dropped
        got = [
            (r["conv_id"], r["turn_idx"], round(r["score"], 6))
            for r in ix.search(query, mode="lexical", limit=25).collect()
        ]
        want = [
            (r["conv_id"], r["turn_idx"], round(r["score"], 6))
            for r in rb.search(query, mode="lexical", limit=25).collect()
        ]
        assert len(got) == len(want) > 0
        assert sorted(s for _, _, s in got) == sorted(s for _, _, s in want)
        cut = min(s for _, _, s in want)
        assert {(c, t) for c, t, s in got if s > cut} == {
            (c, t) for c, t, s in want if s > cut
        }

    def test_wand_exact_post_drop(self, dropped):
        ix, _, _ = dropped
        for query, limit in QUERIES:
            assert _topk(ix, query, limit) == _topk(ix, query, limit, exhaustive=True)

    def test_docs_and_embeddings_physically_purged(self, spark, dropped):
        ix, rb, n_drop = dropped
        n = ix.segment_index.meta["n_docs"]
        assert ix.docs.count() == n
        assert ix.docs.where(F.crc32("conv_id") % 3 == 0).count() == 0
        assert ix.embeddings is not None and ix.embeddings.count() == n
        # semantic serving still works over the purged store
        hits = ix.search("machine learning models", mode="semantic", limit=5)
        assert hits.count() == 5

    def test_append_after_drop_no_id_collision(self, spark, dropped, tmp_path):
        import shutil as _sh

        ix, _, _ = dropped
        src = ix.path
        path = str(tmp_path / "ap")
        _sh.copytree(src, path)
        ix2 = XfIndex.open(spark, path)
        tr = load_transcripts(spark, 0.001)
        _, _, p3 = _thirds(tr)
        bound = ix2.segment_index.meta["doc_id_bound"]
        n_before = ix2.segment_index.meta["n_docs"]
        ix2 = ix2.append(p3)
        m = ix2.segment_index.meta
        added = m["n_docs"] - n_before
        assert added > 0
        assert m["doc_id_bound"] == bound + added
        # appended ids start at the old ceiling — no collision with
        # surviving ids, and the id space stays unique
        new_ids = ix2.docs.select("doc_id")
        assert new_ids.distinct().count() == new_ids.count() == m["n_docs"]
        assert ix2.docs.agg(F.max("doc_id")).first()[0] == m["doc_id_bound"] - 1
        for query, limit in QUERIES[:2]:
            assert _topk(ix2, query, limit) == _topk(
                ix2, query, limit, exhaustive=True
            )

    def test_drop_of_absent_ids_is_plain_compaction(self, spark, tmp_path):
        tr = load_transcripts(spark, 0.001)
        p1, p2, _ = _thirds(tr)
        path = str(tmp_path / "na")
        ix = XfIndex.build(p1, path, with_embeddings=False, slices=1).append(p2)
        before = _topk(ix, "machine", 20)
        n = ix.segment_index.meta["n_docs"]
        drop = spark.range(10).select((F.col("id") + 10_000_000).alias("doc_id"))
        ix = ix.compact(drop=drop)
        assert ix.segment_index.meta["n_docs"] == n
        assert _topk(ix, "machine", 20) == before


class TestDropWithIvf:
    def test_purge_preserves_ivf_cell_layout(self, spark, tmp_path):
        """Drop-compaction on an IVF index: the embeddings rewrite must
        keep the cell partitioning and the existing quantizer, and
        full-probe ANN must still equal the exact scan over the
        purged corpus."""
        tr = load_transcripts(spark, 0.001)
        path = str(tmp_path / "annp")
        ix = XfIndex.build(tr, path, ann_cells=8, slices=1)
        drop = ix.docs.where(F.crc32("conv_id") % 4 == 0).select("doc_id")
        # materialize BEFORE the purge: a lazy frame over the pre-swap
        # doc files cannot be evaluated after the rewrite (standard
        # in-place-rewrite semantics; prior versions of the STORE stay
        # readable via stream_index's hard-linked version dirs, but a
        # pre-swap DataFrame plan does not)
        dropped = {r["doc_id"] for r in drop.collect()}
        n_drop = len(dropped)
        assert n_drop > 0
        ix = ix.compact(drop=drop)
        n = ix.segment_index.meta["n_docs"]
        assert ix.embeddings.count() == n
        assert "cell" in ix.embeddings.columns
        # quantizer untouched (centroids.json survives the rewrite)
        assert os.path.exists(os.path.join(path, "centroids.json"))
        exact = [r["doc_id"] for r in
                 ix.search("stress", mode="semantic", limit=10).collect()]
        full_probe = [r["doc_id"] for r in
                      ix.search("stress", mode="semantic", ann=True,
                                n_probe=8, limit=10).collect()]
        assert full_probe == exact and len(exact) == 10
        # no purged doc can surface
        assert not (set(exact) & dropped)
        # doctor agrees the purged index is consistent (docs count,
        # embeddings count, stats accounting all post-purge)
        from xf_spark.doctor import run_doctor

        bad = [c for c in run_doctor(spark, path) if not c.ok]
        assert not bad, bad


class TestIndexDedup:
    """XfIndex.dedup: detect -> group -> purge, in place."""

    def test_exact_dedup_purges_and_is_idempotent(self, spark, tmp_path):
        tr = load_transcripts(spark, 0.001)
        path = str(tmp_path / "dd")
        ix = XfIndex.build(tr, path, with_embeddings=False, slices=1)
        n0 = ix.segment_index.meta["n_docs"]

        dry = ix.dedup("exact", dry_run=True)
        assert dry["applied"] is False and dry["n_dropped"] > 0
        assert ix.segment_index.meta["n_docs"] == n0  # untouched

        rep = ix.dedup("exact")
        assert rep["applied"] is True
        assert rep["n_docs_after"] == n0 - rep["n_dropped"]
        assert ix.segment_index.meta["n_docs"] == rep["n_docs_after"]
        # no two surviving docs share a content hash
        dups = (
            ix.docs.groupBy(F.sha2(F.col("text"), 256))
            .count()
            .where(F.col("count") > 1)
            .count()
        )
        assert dups == 0
        # second pass finds nothing
        rep2 = ix.dedup("exact")
        assert rep2["n_dropped"] == 0 and rep2["applied"] is False
        # index still serves exactly
        for query, limit in QUERIES[:3]:
            got = _topk(ix, query, limit)
            assert got == _topk(ix, query, limit, exhaustive=True)
            assert len(got) > 0

    def test_minhash_dedup_converges(self, spark, tmp_path):
        """exact pass first (doc-recommended), then minhash: the
        surviving corpus must yield zero further near-dup pairs at the
        same threshold (closure property)."""
        from xf_spark.ops.dedup import minhash_dedup_pairs

        tr = load_transcripts(spark, 0.001)
        path = str(tmp_path / "mh")
        ix = XfIndex.build(tr, path, with_embeddings=False, slices=1)
        ix.dedup("exact")
        rep = ix.dedup("minhash", threshold=0.8)
        if rep["applied"]:
            assert ix.segment_index.meta["n_docs"] == rep["n_docs_after"]
        left = minhash_dedup_pairs(
            ix.docs.select("doc_id", "text"), threshold=0.8
        ).count()
        assert left == 0
        got = _topk(ix, "machine", 10)
        assert got == _topk(ix, "machine", 10, exhaustive=True) and len(got) > 0

    def test_embedding_dedup_over_own_store(self, spark, tmp_path):
        """dedup('embedding'): the index's OWN embedding store drives
        the hyperplane-LSH chain (the reference's embed-dedup analog);
        post-purge the store and docs stay aligned and queries serve
        exactly. Requires embeddings (error without)."""
        import pytest as _pytest

        from xf_spark.ops.dedup import embedding_near_dup_pairs

        tr = load_transcripts(spark, 0.001)
        path = str(tmp_path / "ed")
        ix = XfIndex.build(tr, path, with_embeddings=True, slices=1)
        ix.dedup("exact")
        rep = ix.dedup("embedding", threshold=0.98)
        assert rep["method"] == "embedding"
        if rep["applied"]:
            assert ix.segment_index.meta["n_docs"] == rep["n_docs_after"]
            assert ix.embeddings.count() == rep["n_docs_after"]
            # convergence at the same threshold
            left = embedding_near_dup_pairs(
                ix.embeddings.select("doc_id", "vec"),
                threshold=0.98, id_col="doc_id", vec_col="vec",
            ).count()
            assert left == 0
        got = _topk(ix, "machine", 10)
        assert got == _topk(ix, "machine", 10, exhaustive=True) and len(got) > 0
        # semantic path still serves post-purge
        assert ix.search("stress", mode="semantic", limit=5).count() == 5

        noemb = XfIndex.build(
            load_transcripts(spark, 0.001), str(tmp_path / "ne"),
            with_embeddings=False, slices=1,
        )
        with _pytest.raises(ValueError, match="embedding"):
            noemb.dedup("embedding")


class TestReviewFindings:
    """Regression pins for the round-3 compaction review findings."""

    def test_open_rolls_forward_drop_compaction_before_reading_docs(
        self, spark, tmp_path, monkeypatch
    ):
        """A marker-committed DROP compaction pending at open(): the
        docs dir swap happens during recovery, so open must recover
        BEFORE creating the docs DataFrame — otherwise its plan holds
        the pre-swap file listing that recovery deletes."""
        tr = load_transcripts(spark, 0.001)
        path = str(tmp_path / "odc")
        ix = XfIndex.build(tr, path, with_embeddings=False, slices=1)
        drop = ix.docs.where(F.crc32("conv_id") % 3 == 0).select("doc_id")
        n_drop = drop.count()
        n0 = ix.segment_index.meta["n_docs"]
        real = segmod.recover_compaction
        calls = {"n": 0}

        def flaky(p):
            calls["n"] += 1
            return real(p) if calls["n"] == 1 else False

        monkeypatch.setattr(segmod, "recover_compaction", flaky)
        compact_index(spark, path, drop=drop)
        monkeypatch.setattr(segmod, "recover_compaction", real)
        assert os.path.exists(os.path.join(path, "compact.commit.json"))
        ix2 = XfIndex.open(spark, path)
        assert ix2.docs.count() == n0 - n_drop  # evaluable post-swap
        assert ix2.segment_index.meta["n_docs"] == n0 - n_drop
        got = _topk(ix2, "machine", 10)
        assert got == _topk(ix2, "machine", 10, exhaustive=True) and len(got) > 0

    def test_compact_heals_torn_append_first(self, spark, tmp_path):
        """Compacting an index whose last append tore (docs/segments
        committed, meta rolled back) must reconcile meta first:
        otherwise orphan ids >= doc_id_bound map to shard ids >= S
        while next_shard resets to S, and the next append collides."""
        tr = load_transcripts(spark, 0.001)
        p1, p2, p3 = _thirds(tr)
        path = str(tmp_path / "tca")
        ix = XfIndex.build(p1, path, with_embeddings=False, slices=1)
        meta_path = os.path.join(path, "meta.json")
        with open(meta_path) as f:
            stale = f.read()
        ix.append(p2)
        with open(meta_path) as f:
            committed = json.load(f)
        with open(meta_path, "w") as f:  # simulate the torn window
            f.write(stale)

        compact_index(spark, path)
        with open(meta_path) as f:
            meta = json.load(f)
        assert meta["n_docs"] == committed["n_docs"]
        assert abs(meta["avgdl"] - committed["avgdl"]) < 1e-9
        # every shard id produced by the merge is < n_shards
        seg = spark.read.parquet(os.path.join(path, "segments"))
        max_shard = seg.agg(F.max("shard")).first()[0]
        assert max_shard < meta["n_shards"]
        # append after the healed compaction stays collision-free + exact
        ix2 = XfIndex.open(spark, path).append(p3)
        ids = ix2.docs.select("doc_id")
        assert ids.distinct().count() == ids.count() == ix2.segment_index.meta["n_docs"]
        for query, limit in QUERIES[:3]:
            got = _topk(ix2, query, limit)
            assert got == _topk(ix2, query, limit, exhaustive=True)
            assert len(got) > 0


class TestReshard:
    def test_compact_to_different_shard_count(self, spark, tmp_path):
        """target_shards != the build layout: results stay verbatim
        identical (shard count is physical layout, not semantics) and
        meta/next_shard bookkeeping follows the new count."""
        tr = load_transcripts(spark, 0.001)
        p1, p2, _ = _thirds(tr)
        plain_path = str(tmp_path / "rs_plain")
        plain = XfIndex.build(
            p1, plain_path, with_embeddings=False, slices=1
        ).append(p2)
        comp_path = str(tmp_path / "rs_comp")
        shutil.copytree(plain_path, comp_path)
        comp = XfIndex.open(spark, comp_path).compact(target_shards=7)
        meta = comp.segment_index.meta
        assert meta["n_shards"] == 7 and meta["next_shard"] == 7
        seg = spark.read.parquet(os.path.join(comp_path, "segments"))
        shards = {r["shard"] for r in seg.select("shard").distinct().collect()}
        assert shards <= set(range(7)) and len(shards) > 1
        for query, limit in QUERIES:
            got, want = _topk(comp, query, limit), _topk(plain, query, limit)
            assert got == want and len(want) > 0
        # filtered through the re-derived shard mapping too
        comp.segment_index.driver_topk_threshold = 0
        plain.segment_index.driver_topk_threshold = 0
        assert _topk(comp, "machine", 25, roles=["user"]) == _topk(
            plain, "machine", 25, roles=["user"]
        )


class TestFragmentMathProperty:
    """Pure-NumPy property test of the compaction split kernel
    (_row_frag_tuples): for random posting rows, random shard counts,
    and random drop sets, the emitted fragments must reassemble into
    exactly the kept postings, routed to shard = doc_id*S//bound,
    with positions surviving the byte-level split."""

    def _run(self, doc_ids, tfs, dls, pos_lists, S, bound, drop):
        from collections import namedtuple

        import numpy as np

        from xf_spark.index.codec import decode_doc_ids, decode_positions, varint_decode
        from xf_spark.index.segments import _encode_term, _row_frag_tuples

        enc = _encode_term(
            "t", 0, 0,
            np.asarray(doc_ids, dtype=np.int64),
            np.asarray(tfs, dtype=np.int64),
            np.asarray(dls, dtype=np.int64),
            pos_lists,
            10.0,
        )
        Row = namedtuple(
            "Row",
            "field term bucket n_docs block_doc_off doc_ids_bin tfs_bin "
            "dls_bin positions_bin",
        )
        r = Row(
            "text", "t", 0, enc["n_docs"], enc["block_doc_off"],
            enc["doc_ids_bin"], enc["tfs_bin"], enc["dls_bin"],
            enc["positions_bin"],
        )
        drop_arr = (
            np.asarray(sorted(drop), dtype=np.int64) if drop is not None else None
        )
        frags = _row_frag_tuples(r, S, bound, drop_arr)

        keep = [i for i, d in enumerate(doc_ids) if drop is None or d not in drop]
        exp_ids = [doc_ids[i] for i in keep]
        exp_tfs = [tfs[i] for i in keep]
        exp_dls = [dls[i] for i in keep]
        exp_pos = [list(pos_lists[i]) for i in keep] if pos_lists else None
        exp_shard = [d * S // bound for d in exp_ids]

        got_ids, got_tfs, got_dls, got_shard, got_pos = [], [], [], [], []
        for (
            _f, _t, _b, shard, first, n, ids_bin, tfs_bin, dls_bin, pos_bin
        ) in frags:
            ids = list(decode_doc_ids(ids_bin))
            assert first == ids[0] and n == len(ids)
            assert all(d * S // bound == shard for d in ids)
            got_ids += ids
            got_tfs += list(varint_decode(tfs_bin).astype(int))
            got_dls += list(varint_decode(dls_bin).astype(int))
            got_shard += [shard] * n
            if pos_bin:
                got_pos += [list(p) for p in decode_positions(pos_bin, n)]
        assert got_ids == exp_ids
        assert got_tfs == exp_tfs
        assert got_dls == exp_dls
        assert got_shard == exp_shard
        if exp_pos is not None:
            assert got_pos == exp_pos

    def test_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=150, deadline=None)
        @given(st.data())
        def run(data):
            bound = data.draw(st.integers(min_value=1, max_value=2000))
            n = data.draw(st.integers(min_value=1, max_value=min(bound, 300)))
            ids = sorted(
                data.draw(
                    st.sets(
                        st.integers(min_value=0, max_value=bound - 1),
                        min_size=n, max_size=n,
                    )
                )
            )
            tfs = [data.draw(st.integers(min_value=1, max_value=500)) for _ in ids]
            dls = [data.draw(st.integers(min_value=1, max_value=3000)) for _ in ids]
            with_pos = data.draw(st.booleans())
            pos = (
                [
                    sorted(
                        data.draw(
                            st.sets(st.integers(min_value=0, max_value=4000), max_size=5)
                        )
                    )
                    for _ in ids
                ]
                if with_pos
                else None
            )
            S = data.draw(st.integers(min_value=1, max_value=64))
            drop = data.draw(
                st.one_of(
                    st.none(),
                    st.sets(st.sampled_from(ids), max_size=len(ids)),
                    st.sets(st.integers(min_value=0, max_value=bound - 1), max_size=20),
                )
            )
            if drop is not None and set(ids) <= set(drop):
                drop = set(list(drop)[:-1]) - {ids[0]}  # keep at least one
            self._run(ids, tfs, dls, pos, S, bound, drop)

        run()


class TestDropNoOp:
    def test_stale_drop_list_is_noop_on_compacted_index(self, pair):
        """Re-running compact --drop with ids already purged (or never
        present) must take the nothing-to-do exit, not rewrite the
        whole index (review finding: the early exit used to be checked
        only before m_drop was known)."""
        plain, comp = pair
        spark = comp.spark
        man_path = os.path.join(comp.path, "manifest")
        mtimes_before = {
            f: os.path.getmtime(os.path.join(man_path, f))
            for f in os.listdir(man_path)
        }
        ghost = spark.createDataFrame([(10**9,), (10**9 + 1,)], "doc_id long")
        n_slices, m = compact_index(spark, comp.path, drop=ghost)
        assert n_slices == 1 and m is None  # no-op, nothing rewritten
        mtimes_after = {
            f: os.path.getmtime(os.path.join(man_path, f))
            for f in os.listdir(man_path)
        }
        assert mtimes_after == mtimes_before
        # still serves identically
        got = _topk(comp, "machine", 10)
        want = _topk(plain, "machine", 10)
        assert got == want and len(want) > 0
