"""Segment index tests: build -> persisted artifact -> WAND query path
rank-identical to the oracle; resume skips completed slices; WAND ==
exhaustive on adversarial synthetic postings."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from xf_spark.index.builder import build_engine
from xf_spark.index.segments import build_segment_index
from xf_spark.oracle import OracleIndex
from xf_spark.query.segment_search import SegmentIndex, _or_exhaustive, _topk, wand_or_topk
from xf_spark.transcripts import load_transcripts

SCALE = 0.001
TOL = 1e-6

QUERIES = [
    ("machine", 20),
    ("machine", 100),
    ("rust async patterns", 20),
    ('"machine learning"', 20),
    ("rust AND async", 20),
    ("python NOT snake", 20),
    ("progr*", 20),
    ("rust rust", 20),
    # round-3 query-language extensions: sloppy phrase + boosts ride
    # the same rank-identity gate (oracle shares the grammar)
    ('"machine learning"~2', 20),
    ('"coding rustlang"~3', 50),
    ("machine^2 OR rust", 20),
    ('"machine learning"^1.5', 20),
    # dictionary-resolved atoms: wildcard / ~d fuzzy / phrase-prefix
    ("ma?hine", 20),
    ("mach*ne rust", 20),
    ("*earning", 20),
    ("machne~2", 50),
    ('"machine lear*"', 20),
    ("rust NOT lear*ng", 20),
    ('"machine learning"~~3', 50),
    ('"learning machine"~~2', 20),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("segidx"))
    transcripts = load_transcripts(spark, SCALE)
    eng = build_engine(transcripts)
    metrics = build_segment_index(
        eng.postings,
        n_docs=eng.stats.n_docs,
        avgdl=eng.stats.avgdl,
        path=path,
        prefix_postings=eng.prefix_postings,
        n_shards=4,
        n_buckets=16,
        slices=3,
    )
    ix = SegmentIndex.load(spark, path, docs=eng.docs)
    rows = eng.docs.select("doc_id", "text").collect()
    oracle = OracleIndex.build([(r["doc_id"], r["text"]) for r in rows])
    return ix, oracle, metrics, path


@pytest.mark.parametrize("query,limit", QUERIES, ids=[f"{q}@{k}" for q, k in QUERIES])
def test_segment_search_vs_oracle(built, query, limit):
    ix, oracle, _, _ = built
    got = [(r["doc_id"], r["score"]) for r in ix.search(query, limit=limit).collect()]
    want = oracle.search(query, limit=limit)
    assert [d for d, _ in got] == [d for d, _ in want], f"rank mismatch: {query}"
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), (query, gd, gs, ws)


def test_wand_equals_exhaustive_spark(built):
    ix, _, _, _ = built
    for q in ["machine", "rust async programming the a", "progr*"]:
        w = [(r["doc_id"], round(r["score"], 9)) for r in ix.search(q, limit=50).collect()]
        e = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search(q, limit=50, exhaustive=True).collect()
        ]
        assert w == e, q


def test_build_metrics_and_manifest(built, spark):
    ix, _, metrics, path = built
    assert metrics, "no slices built"
    assert all(m.n_postings > 0 for m in metrics if m.field == "text")
    man = spark.read.parquet(os.path.join(path, "manifest"))
    assert man.count() == len(metrics)
    cols = set(man.columns)
    assert {"field", "slice_id", "n_postings", "bytes", "wall_sec",
            "skew_ratio", "postings_per_sec"} <= cols


def test_resume_skips_completed(built, spark):
    ix, _, metrics, path = built
    eng_docs_count = ix.meta["n_docs"]
    # a re-run with the same manifest must do zero new slices
    from xf_spark.index.postings import build_postings
    # reuse any postings df — it will not be touched if all slices done
    again = build_segment_index(
        spark.createDataFrame([], "term string, doc_id long, tf int, dl int, positions array<int>"),
        n_docs=eng_docs_count,
        avgdl=ix.meta["avgdl"],
        path=path,
        prefix_postings=None,
        n_shards=4,
        n_buckets=16,
        slices=3,
    )
    assert again == []  # every slice already in the manifest


def test_resume_replays_slice_without_duplicating(spark, tmp_path):
    """Crash between a slice's segment write and its manifest row ->
    the re-run must REPLACE that slice's partitions (dynamic
    overwrite), not append a second copy of every posting (which
    silently doubled df/n_docs)."""
    path = str(tmp_path / "rs")
    transcripts = load_transcripts(spark, SCALE)
    eng = build_engine(transcripts)
    kw = dict(
        n_docs=eng.stats.n_docs, avgdl=eng.stats.avgdl, path=path,
        prefix_postings=eng.prefix_postings, n_shards=4, n_buckets=16,
        slices=3,
    )
    build_segment_index(eng.postings, **kw)
    ix = SegmentIndex.load(spark, path, docs=eng.docs)
    want = ix.search_local("machine", limit=20)
    df_want = ix.term_dfs({"machine"}, "text")

    # simulate the crash: drop slice 1's manifest row (its segments
    # stay on disk), then resume — slice 1 re-runs
    man_path = f"{path}/manifest"
    man = spark.read.parquet(man_path).where("slice_id <> 1").toPandas()
    import shutil
    shutil.rmtree(man_path)
    spark.createDataFrame(man).write.parquet(man_path)
    metrics = build_segment_index(eng.postings, **kw)
    assert [m.slice_id for m in metrics] == [1]

    ix2 = SegmentIndex.load(spark, path, docs=eng.docs)
    assert ix2.term_dfs({"machine"}, "text") == df_want  # not doubled
    assert ix2.search_local("machine", limit=20) == want


def test_build_without_positions_column(spark, tmp_path):
    """postings built with with_positions=False (no positions column)
    must build cleanly — nothing to encode, not a len(None) crash."""
    from xf_spark.index.postings import build_postings

    path = str(tmp_path / "np")
    transcripts = load_transcripts(spark, SCALE)
    eng = build_engine(transcripts, with_positions=False, with_prefix=False)
    assert "positions" not in eng.postings.columns
    build_segment_index(
        eng.postings, n_docs=eng.stats.n_docs, avgdl=eng.stats.avgdl,
        path=path, n_shards=2, n_buckets=8, slices=1,
    )
    ix = SegmentIndex.load(spark, path, docs=eng.docs)
    assert ix.search_local("machine", limit=5)


def test_filters_pre_topk(built):
    ix, oracle, _, _ = built
    got = [r["doc_id"] for r in ix.search("rust", limit=10, roles=["assistant"]).collect()]
    assert got  # nonempty
    # scores stay global: same docs must rank as in unfiltered list order
    full = [d for d, _ in oracle.search("rust", limit=10**6)]
    want = [d for d in full if d in set(got) or True]  # order check below
    pos = {d: i for i, d in enumerate(full)}
    assert got == sorted(got, key=lambda d: pos[d])


class TestFusedBuild:
    """The one-pass build (build_index) must agree with the oracle and
    preserve docID/text alignment (regression: two jobs re-sampling
    range boundaries independently silently shifted doc_ids)."""

    @pytest.fixture(scope="class")
    def fused(self, spark, tmp_path_factory):
        from xf_spark.index.segments import build_index

        path = str(tmp_path_factory.mktemp("fusedidx"))
        tr = load_transcripts(spark, SCALE)
        docs, stats, metrics = build_index(
            tr, path, n_shards=4, n_buckets=16, slices=2
        )
        ix = SegmentIndex.load(spark, path, docs=docs)
        rows = docs.select("doc_id", "text").collect()
        oracle = OracleIndex.build([(r["doc_id"], r["text"]) for r in rows])
        return ix, oracle, docs

    @pytest.mark.parametrize(
        "query,limit", QUERIES, ids=[f"fused-{q}@{k}" for q, k in QUERIES]
    )
    def test_fused_vs_oracle(self, fused, query, limit):
        ix, oracle, _ = fused
        got = [
            (r["doc_id"], r["score"]) for r in ix.search(query, limit=limit).collect()
        ]
        want = oracle.search(query, limit=limit)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), (query, gd)

    def test_docid_text_dl_alignment(self, fused, spark):
        """Segment-stored doc lengths must equal tokenize(docs.text) for
        the SAME doc_id — the invariant the resampling bug violated."""
        from pyspark.sql import functions as F

        from xf_spark.functions.textcore import tokenize
        from xf_spark.query.segment_search import _decode_row

        ix, _, docs = fused
        texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
        rows = (
            ix._segments.where((F.col("field") == "text") & (F.col("term") == "machine"))
            .collect()
        )
        assert rows
        for r in rows:
            d = _decode_row(r.asDict())
            for doc_id, dl in zip(d["ids"], d["dls"]):
                assert int(dl) == len(tokenize(texts[int(doc_id)])), int(doc_id)


class TestFilteredShardLocal:
    """Round-2 filtered-search fix: role/ts predicates resolve INSIDE
    the shard (cogroup with the docs shard column), so per-shard output
    stays k-bounded — the round-1 full-match-set scatter is gone."""

    FILTER_QUERIES = [
        ("machine", dict(roles=["assistant"])),
        ("rust async patterns", dict(since="2023-06-01 00:00:00")),
        ('"machine learning"', dict(roles=["user"], since="2023-03-01 00:00:00")),
        ("the", dict(roles=["assistant"])),  # head term + filter (the killer case)
    ]

    @pytest.fixture(scope="class")
    def fx(self, spark, tmp_path_factory):
        from xf_spark.index.segments import build_index

        path = str(tmp_path_factory.mktemp("filtidx"))
        tr = load_transcripts(spark, SCALE)
        docs, stats, _ = build_index(tr, path, n_shards=4, n_buckets=16, slices=2)
        docs = docs.cache()
        ix = SegmentIndex.load(spark, path, docs=docs)
        rows = docs.select("doc_id", "text", "role", "ts").collect()
        oracle = OracleIndex.build([(r["doc_id"], r["text"]) for r in rows])
        attrs = {r["doc_id"]: (r["role"], r["ts"]) for r in rows}
        return ix, oracle, attrs

    def _allowed(self, attrs, roles=None, since=None, until=None):
        import pandas as pd  # noqa: F401

        def ok(role, ts):
            if roles and role not in roles:
                return False
            if since is not None and str(ts) < since:
                return False
            if until is not None and str(ts) > until:
                return False
            return True

        return {d for d, (role, ts) in attrs.items() if ok(role, ts)}

    def test_docs_carry_shard_matching_segments(self, fx):
        ix, _, _ = fx
        assert "shard" in ix.docs.columns
        seg_shards = {
            r["shard"] for r in ix._segments.select("shard").distinct().collect()
        }
        doc_shards = {
            r["shard"] for r in ix.docs.select("shard").distinct().collect()
        }
        assert seg_shards <= doc_shards

    @pytest.mark.parametrize(
        "query,kw", FILTER_QUERIES, ids=[q for q, _ in FILTER_QUERIES]
    )
    def test_filtered_matches_oracle_both_paths(self, fx, query, kw):
        ix, oracle, attrs = fx
        allowed = self._allowed(attrs, **kw)
        full = oracle.search(query, limit=10**6)
        want = [d for d, _ in full if d in allowed][:10]
        # driver fast path (default threshold covers this corpus)
        got_driver = [
            r["doc_id"] for r in ix.search(query, limit=10, **kw).collect()
        ]
        assert got_driver == want, f"driver path: {query}"
        # distributed cogroup path (threshold 0 forces it)
        old = ix.driver_topk_threshold
        ix.driver_topk_threshold = 0
        try:
            got_dist = [
                r["doc_id"] for r in ix.search(query, limit=10, **kw).collect()
            ]
        finally:
            ix.driver_topk_threshold = old
        assert got_dist == want, f"distributed path: {query}"

    def test_query_embedded_type_filter_equals_roles_kwarg(self, fx):
        ix, _, _ = fx
        via_kwarg = [
            r["doc_id"]
            for r in ix.search("machine", limit=10, roles=["assistant"]).collect()
        ]
        via_query = [
            r["doc_id"]
            for r in ix.search("type:assistant machine", limit=10).collect()
        ]
        assert via_query == via_kwarg and via_kwarg
        # contradictory intersection matches nothing
        assert (
            ix.search("type:assistant machine", limit=10, roles=["user"]).count()
            == 0
        )
        # filter-only query = match-all within the type
        n_assist = ix.docs.where("role = 'assistant'").count()
        assert ix.search("type:assistant", limit=10**6).count() == n_assist

    def test_legacy_docs_without_shard_column(self, fx):
        """A docs parquet predating the shard column takes the SAME
        k-bounded cogroup path: the doc_id->shard map derives from the
        segments' block metadata (the old fallback scattered EVERY
        match per shard via k = 1<<62 — retired in round 3)."""
        ix, oracle, attrs = fx
        legacy = SegmentIndex.load(
            ix.spark, ix.path, docs=ix.docs.drop("shard")
        )
        legacy.driver_topk_threshold = 0  # force the distributed path
        allowed = self._allowed(attrs, roles=["assistant"])
        want = [d for d, _ in oracle.search("the", limit=10**6) if d in allowed][:10]
        got = [
            r["doc_id"]
            for r in legacy.search("the", limit=10, roles=["assistant"]).collect()
        ]
        assert got == want
        # derived bounds must reproduce the build's own shard mapping
        # for every doc that has postings (drop dl=0 docs: blank text)
        derived = ix.docs.drop("shard").select(
            "doc_id", legacy._shard_for_docs().alias("shard")
        )
        mismatch = (
            ix.docs.select("doc_id", "shard")
            .where(F.length("text") > 0)
            .join(derived.withColumnRenamed("shard", "shard2"), "doc_id")
            .where(F.col("shard") != F.col("shard2"))
            .count()
        )
        assert mismatch == 0

    def test_filtered_requires_docs(self, fx):
        ix, _, _ = fx
        import pytest

        bare = SegmentIndex.load(ix.spark, ix.path, docs=None)
        with pytest.raises(ValueError, match="docs table"):
            bare.search("machine", limit=10, roles=["assistant"]).collect()

    def test_per_shard_output_is_k_bounded(self, fx):
        """The pre-merge cogroup output must hold <= k rows PER SHARD
        even for a head term + filter — the scatter this fix removes."""
        from pyspark.sql import functions as F

        from xf_spark.query.parser import parse_query
        from xf_spark.query.segment_search import idf_for

        ix, _, _ = fx
        term = "the"
        k_page = 10
        n = ix.meta["n_docs"]
        idfs = {
            ("text", t): idf_for(n, df)
            for t, df in ix.term_dfs({term}, "text").items()
        }
        seg = ix._segments.where(
            (F.col("field") == "text") & (F.col("term") == term)
        )
        scored = ix._scored_filtered_distributed(
            seg, parse_query(term), idfs, ix.meta["avgdl"], k_page, False,
            ["assistant"], None, None,
        )
        n_shards = ix._segments.select("shard").distinct().count()
        assert scored.count() <= k_page * n_shards


class TestWandUnit:
    def _mk_term(self, rng, n_docs, df, max_tf):
        ids = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        sc = rng.uniform(0.1, max_tf, size=df)
        # fake blocks of 128
        bl, bm = [], []
        for s in range(0, df, 128):
            e = min(s + 128, df)
            bl.append(int(ids[e - 1]))
            bm.append(float(sc[s:e].max()))
        return (ids, sc, np.asarray(bl, dtype=np.int64), np.asarray(bm))

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_wand_vs_exhaustive_random(self, seed):
        rng = np.random.default_rng(seed)
        terms = [
            self._mk_term(rng, 200_000, int(df), mt)
            for df, mt in [(50_000, 2.0), (20_000, 3.0), (500, 8.0), (120_000, 1.0)]
        ]
        for k in (10, 100):
            wi, ws = wand_or_topk(terms, k)
            ei, es = _topk(*_or_exhaustive([(t[0], t[1]) for t in terms]), k)
            assert np.array_equal(wi, ei)
            assert np.allclose(ws, es, atol=1e-12)

    def test_wand_skips_windows(self):
        # construct heavy skew: one hot block should let WAND stop early
        rng = np.random.default_rng(7)
        terms = [self._mk_term(rng, 1_000_000, 300_000, 1.0)]
        ids, sc = wand_or_topk(terms, 10)
        ei, es = _topk(terms[0][0], terms[0][1], 10)
        assert np.array_equal(ids, ei)


class TestHeadTermSkew:
    """North-rule pin: head-term skew is handled by the (term, shard)
    layout — a term occurring in EVERY doc is split across doc-shards
    with balanced posting-list sizes, so no single reducer ever owns a
    stop word's full posting list."""

    def test_universal_term_is_sharded_and_balanced(self, spark, tmp_path):
        import pandas as pd

        n = 4000
        pdf = pd.DataFrame(
            {
                "conv_id": [f"c{i // 20:05d}" for i in range(n)],
                "turn_idx": pd.array([i % 20 for i in range(n)], dtype="int32"),
                "role": ["user"] * n,
                # 'the' in every doc (head term); filler varies
                "text": [f"the filler{i % 97} word{i % 31}" for i in range(n)],
                "tool": [""] * n,
                "ts": pd.to_datetime(["2025-01-01"] * n),
            }
        )
        src = str(tmp_path / "skew_src")
        pdf.to_parquet(
            src, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True, row_group_size=512,
        )
        from xf_spark.index.segments import build_index

        out = str(tmp_path / "skew_idx")
        docs, stats, metrics = build_index(
            spark.read.parquet(src), out, n_shards=8, slices=1
        )
        seg = spark.read.parquet(os.path.join(out, "segments"))
        the_rows = seg.where("field = 'text' AND term = 'the'").collect()
        shard_sizes = sorted(r["n_docs"] for r in the_rows)
        assert len(the_rows) >= 4  # split across shards, not one reducer
        assert sum(shard_sizes) == n
        # balanced: largest shard within 2x of the mean
        mean = sum(shard_sizes) / len(shard_sizes)
        assert shard_sizes[-1] <= 2 * mean


class TestTermCache:
    """Round-2 serving floor: warm repeat queries run ZERO Spark jobs —
    decoded postings live in a bounded driver LRU (the analog of the
    reference's in-process mmap'd index)."""

    def test_warm_query_never_touches_segments(self, built):
        ix, oracle, _, _ = built
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search("machine", limit=10).collect()
        ]
        want_ph = [
            r["doc_id"]
            for r in ix.search('"machine learning"', limit=10).collect()
        ]
        orig = ix._segments
        ix._segments = None  # any scan would blow up
        try:
            got = [
                (r["doc_id"], round(r["score"], 9))
                for r in ix.search("machine", limit=10).collect()
            ]
            got_ph = [
                r["doc_id"]
                for r in ix.search('"machine learning"', limit=10).collect()
            ]
        finally:
            ix._segments = orig
        assert got == want and got
        assert got_ph == want_ph and got_ph

    def test_warm_top_terms_prefetch(self, spark, tmp_path):
        from xf_spark.index.segments import build_index

        path = str(tmp_path / "warmidx")
        tr = load_transcripts(spark, SCALE)
        docs, _s, _m = build_index(tr, path, n_shards=4, n_buckets=16, slices=1)
        ix = SegmentIndex.load(spark, path, docs=docs).cache(warm_top_terms=10)
        assert len(ix._term_cache) >= 10
        # a FIRST query on a prefetched term must not scan segments
        term = next(t for (f, t) in ix._term_cache if f == "text")
        orig = ix._segments
        ix._segments = None
        try:
            got = ix.search(term, limit=5).collect()
        finally:
            ix._segments = orig
        assert got

    def test_cache_capacity_zero_still_correct(self, spark, tmp_path):
        from xf_spark.index.segments import build_index

        path = str(tmp_path / "nocache")
        tr = load_transcripts(spark, SCALE)
        docs, _s, _m = build_index(tr, path, n_shards=4, n_buckets=16, slices=1)
        ix = SegmentIndex.load(spark, path, docs=docs)
        ix.term_cache_mb = 0  # every entry oversized: serve uncached
        a = [r["doc_id"] for r in ix.search("machine", limit=10).collect()]
        b = [r["doc_id"] for r in ix.search("machine", limit=10).collect()]
        assert a == b and a
        assert ix._term_cache == {} and ix._term_cache_bytes == 0


def test_phrase_vectorized_equals_scalar_fallback(spark, built, monkeypatch):
    """The int64-key vectorized adjacency and the scalar per-doc
    fallback must be rank- and score-identical; force the fallback by
    shrinking the key base below any real position."""
    from xf_spark.query import segment_search as ss

    ix, _oracle, _m, _p = built
    want = [(r["doc_id"], r["score"]) for r in
            ix.search('"machine learning"', limit=50).collect()]
    monkeypatch.setattr(ss, "_POS_B", 2)  # every doc falls back
    got = [(r["doc_id"], r["score"]) for r in
           ix.search('"machine learning"', limit=50).collect()]
    assert got == want and len(want) > 0


def test_search_many_matches_single_queries(built):
    """Batched msearch == per-query search, rank- and score-identical."""
    ix, _oracle, _m, _p = built
    queries = ["machine", "rust async patterns", '"machine learning"',
               "rust AND async", "python NOT snake", "progr*", "zzz_absent",
               # field-filtered queries take the single-query fallback
               # path inside search_many (segment_search.py) — must
               # still be rank/score-identical to search()
               "role:assistant machine", "type:user rust"]
    batch = ix.search_many(queries, limit=20)
    for q in queries:
        single = ix.search_local(q, limit=20)
        got = [(d, round(s, 9)) for d, s in batch[q]]
        want = [(d, round(s, 9)) for d, s in single]
        assert got == want, q


def test_search_many_isolates_unparseable_member(built):
    """A batch member the parser rejects (NOT on a field filter) gets
    an empty result; the rest of the batch is served normally. The
    single-query path still raises."""
    ix, _oracle, _m, _p = built
    batch = ix.search_many(
        ["machine", "rust NOT type:assistant", "rust"], limit=10
    )
    assert batch["rust NOT type:assistant"] == []
    assert batch["machine"] == ix.search_local("machine", limit=10)
    assert batch["rust"] == ix.search_local("rust", limit=10)
    with pytest.raises(ValueError):
        ix.search_local("rust NOT type:assistant", limit=10)


def test_limit_zero_returns_empty_everywhere(built):
    """limit=0 -> 0 rows, never an error (np.partition kth bound —
    regression: kth(=n) out of bounds when k=0 reached _topk)."""
    ix, _oracle, _m, _p = built
    for q in ["machine", '"machine learning"', "rust AND async", "progr*",
              "rust async patterns"]:
        assert ix.search_local(q, limit=0) == [], q
        assert ix.search(q, limit=0).count() == 0, q
    batch = ix.search_many(["machine", "rust async patterns"], limit=0)
    assert all(v == [] for v in batch.values())


def test_randomized_query_sweep_vs_oracle(built):
    """40 seeded random queries assembled from the real corpus
    vocabulary — bare terms, implicit OR, AND, NOT, random phrases
    (mostly non-adjacent: empty results must agree too), prefixes, and
    absent terms — the segment engine must be rank- and score-identical
    to the NumPy oracle through every routing tier (term LRU, bucket
    pruning, driver/distributed threshold)."""
    import random

    ix, oracle, _m, _p = built
    rng = random.Random(1234)
    vocab = sorted(t for t in oracle.postings if t.isalnum() and len(t) > 1)
    common = sorted(vocab, key=lambda t: (-len(oracle.postings[t]), t))[:50]
    queries = []
    for _ in range(38):
        kind = rng.randrange(6)
        if kind == 0:
            queries.append(rng.choice(vocab))
        elif kind == 1:
            queries.append(" ".join(rng.sample(vocab, rng.randint(2, 4))))
        elif kind == 2:
            queries.append(" AND ".join(rng.sample(common, 2)))
        elif kind == 3:
            a, b = rng.sample(common, 2)
            queries.append(f"{a} NOT {b}")
        elif kind == 4:
            queries.append(f'"{rng.choice(common)} {rng.choice(vocab)}"')
        else:
            t = rng.choice(vocab)
            queries.append(t[: max(2, len(t) // 2)] + "*")
    queries += ["zzzz_nope", f"zzzz_nope AND {common[0]}"]
    for q in queries:
        got = [(r["doc_id"], r["score"]) for r in
               ix.search(q, limit=20).collect()]
        want = oracle.search(q, limit=20)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_wd, ws) in zip(got, want):
            assert abs(gs - ws) <= 1e-9 * max(1.0, abs(ws)), (q, gd, gs, ws)


def test_search_many_respects_driver_topk_threshold(built):
    """A batch member whose terms exceed driver_topk_threshold must NOT
    be decoded on the coordinator — heavy members batch through ONE
    distributed job (_search_many_distributed; role-filtered heavy
    members through the filtered cogroup batch, round 3),
    rank/score-identical to the default route."""
    ix, _oracle, _m, _p = built
    queries = ["machine", "rust async patterns", '"machine learning"',
               "python NOT snake", "progr*", "zzz_absent",
               "role:assistant machine", "type:user the"]
    want = {q: ix.search_many([q], limit=20)[q] for q in queries}
    dfs = ix.term_dfs({"machine", "rust", "async", "patterns", "python", "snake"}, "text")
    saved = ix.driver_topk_threshold
    try:
        # threshold below 'machine': it must fall back; the others'
        # routing depends on their own totals — results identical
        ix.driver_topk_threshold = dfs["machine"] - 1
        mixed = ix.search_many(queries, limit=20)
        assert {q: [(d, round(s, 9)) for d, s in mixed[q]] for q in queries} \
            == {q: [(d, round(s, 9)) for d, s in want[q]] for q in queries}
        # threshold 0: every member distributed
        ix.driver_topk_threshold = 0
        alldist = ix.search_many(queries, limit=20)
        assert {q: [(d, round(s, 9)) for d, s in alldist[q]] for q in queries} \
            == {q: [(d, round(s, 9)) for d, s in want[q]] for q in queries}
    finally:
        ix.driver_topk_threshold = saved


def test_filtered_driver_path_pinned_attrs(built):
    """With pinned doc attributes, a warm filtered query resolves its
    allowed-id set in NumPy: results identical to the Spark semi-join
    resolution, and the docs DataFrame is never touched (zero Spark
    jobs — asserted by poisoning the docs handle)."""
    ix, _oracle, _m, _p = built
    rows = ix.docs.select("doc_id", "role", "ts").collect()
    ts_mid = sorted(r["ts"] for r in rows)[len(rows) // 2]
    cases = [
        dict(roles=["user"]),
        dict(roles=["assistant"], since=ts_mid),
        dict(until=ts_mid),
    ]
    want = [
        [(r["doc_id"], round(r["score"], 9)) for r in
         ix.search("machine", limit=20, **c).collect()]
        for c in cases
    ]
    assert all(want) and ix._pinned_attrs is None
    ix.pin_doc_attrs(
        [r["doc_id"] for r in rows],
        [r["role"] for r in rows],
        [r["ts"] for r in rows],
    )
    saved = ix.docs

    class _Poison:
        def __getattr__(self, name):
            raise AssertionError(f"pinned filtered path touched docs.{name}")

    ix.docs = _Poison()
    try:
        got = [
            [(r["doc_id"], round(r["score"], 9)) for r in
             ix.search("machine", limit=20, **c).collect()]
            for c in cases
        ]
    finally:
        ix.docs = saved
        ix._pinned_attrs = None
    assert got == want


def test_near_randomized_encode_decode_isomorphism():
    """Near (sloppy-phrase) twin of the phrase randomized test: 25
    seeded mini-corpora, real codec encode -> vectorized near DP
    (eval_plan_on_data) vs a brute-force Python forward DP — covers
    K=2 and K=3 phrases, slop 1..4, duplicate terms, and the
    boost/msm node algebra on the same data."""
    import math
    import random

    import pandas as pd

    from xf_spark.index.segments import _encode_term
    from xf_spark.query.segment_search import build_term_data, eval_plan_on_data

    K1, B = 1.2, 0.75
    rng = random.Random(7)

    def brute_near(toks, terms, slop):
        pos = {t: [i for i, w in enumerate(toks) if w == t] for t in set(terms)}
        if any(not pos[t] for t in terms):
            return False
        reach = list(pos[terms[0]])
        for t in terms[1:]:
            reach = [
                q for q in pos[t] if any(1 <= q - r <= slop + 1 for r in reach)
            ]
            if not reach:
                return False
        return True

    for case in range(25):
        n_docs = rng.randint(1, 40)
        vocab = ["aa", "bb", "cc", "dd"]
        docs = {
            d: [vocab[rng.randrange(len(vocab))] for _ in range(rng.randint(0, 30))]
            for d in range(n_docs)
        }
        total = sum(len(t) for t in docs.values())
        avgdl = total / n_docs if n_docs else 0.0
        rows, df_by_term = [], {}
        for t in vocab:
            ids, tfs, dls, pos = [], [], [], []
            for d in sorted(docs):
                p = [i for i, w in enumerate(docs[d]) if w == t]
                if p:
                    ids.append(d)
                    tfs.append(len(p))
                    dls.append(len(docs[d]))
                    pos.append(np.asarray(p, dtype=np.int64))
            if not ids:
                continue
            df_by_term[t] = len(ids)
            row = _encode_term(
                t, 0, 0,
                np.asarray(ids, dtype=np.int64),
                np.asarray(tfs, dtype=np.int64),
                np.asarray(dls, dtype=np.int64),
                pos, avgdl,
            )
            row["field"] = "text"
            rows.append(row)
        if not rows:
            continue
        pdf = pd.DataFrame(rows)
        data = build_term_data(pdf)
        idfs = {
            ("text", t): math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
            for t, df in df_by_term.items()
        }

        k_terms = 3 if rng.random() < 0.4 else 2
        terms = [vocab[rng.randrange(len(vocab))] for _ in range(k_terms)]
        slop = rng.randint(1, 4)

        out = eval_plan_on_data(data, ("near", terms, slop), idfs, avgdl, 100)
        got = {int(d): round(float(s), 9) for d, s in zip(out["doc_id"], out["score"])}
        want = {}
        for d, toks in docs.items():
            if brute_near(toks, terms, slop):
                s = 0.0
                for t in terms:
                    tf = float(toks.count(t))
                    dl = float(len(toks))
                    s += idfs.get(("text", t), 0.0) * tf * (K1 + 1.0) / (
                        tf + K1 * (1.0 - B + B * dl / avgdl)
                    )
                want[d] = round(s, 9)
        assert got == want, f"case {case} near{terms}~{slop}: {got} != {want}"

        # boost algebra: boost(node, w) == w * node, on a term leaf
        t0 = terms[0]
        base = eval_plan_on_data(data, ("term", t0), idfs, avgdl, 100)
        boosted = eval_plan_on_data(
            data, ("boost", ("term", t0), 2.5), idfs, avgdl, 100
        )
        assert list(boosted["doc_id"]) == list(base["doc_id"])
        assert np.allclose(boosted["score"], 2.5 * base["score"])

        # msm: m-of-n over all vocab terms vs brute-force count
        present = sorted(df_by_term)
        if len(present) >= 2:
            m = rng.randint(2, len(present))
            node = ("msm", [("term", t) for t in present], m)
            out = eval_plan_on_data(data, node, idfs, avgdl, 1000)
            got_ids = {int(d) for d in out["doc_id"]}
            want_ids = {
                d
                for d, toks in docs.items()
                if sum(t in toks for t in present) >= m
            }
            assert got_ids == want_ids, f"case {case} msm{m}: {got_ids} != {want_ids}"


def test_window_randomized_encode_decode_isomorphism():
    """Window (unordered proximity) twin of the near randomized test:
    seeded mini-corpora, real codec encode -> ev_window
    (eval_plan_on_data) vs a brute-force minimal-cover check."""
    import math
    import random

    import pandas as pd

    from xf_spark.index.segments import _encode_term
    from xf_spark.oracle import min_cover_span
    from xf_spark.query.segment_search import build_term_data, eval_plan_on_data

    K1, B = 1.2, 0.75
    rng = random.Random(13)

    for case in range(25):
        n_docs = rng.randint(1, 40)
        vocab = ["aa", "bb", "cc", "dd"]
        docs = {
            d: [vocab[rng.randrange(len(vocab))] for _ in range(rng.randint(0, 30))]
            for d in range(n_docs)
        }
        total = sum(len(t) for t in docs.values())
        avgdl = total / n_docs if n_docs else 0.0
        rows, df_by_term = [], {}
        for t in vocab:
            ids, tfs, dls, pos = [], [], [], []
            for d in sorted(docs):
                p = [i for i, w in enumerate(docs[d]) if w == t]
                if p:
                    ids.append(d)
                    tfs.append(len(p))
                    dls.append(len(docs[d]))
                    pos.append(np.asarray(p, dtype=np.int64))
            if not ids:
                continue
            df_by_term[t] = len(ids)
            row = _encode_term(
                t, 0, 0,
                np.asarray(ids, dtype=np.int64),
                np.asarray(tfs, dtype=np.int64),
                np.asarray(dls, dtype=np.int64),
                pos, avgdl,
            )
            row["field"] = "text"
            rows.append(row)
        if not rows:
            continue
        pdf = pd.DataFrame(rows)
        data = build_term_data(pdf)
        idfs = {
            ("text", t): math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
            for t, df in df_by_term.items()
        }

        k_terms = 3 if rng.random() < 0.4 else 2
        terms = sorted(set(
            vocab[rng.randrange(len(vocab))] for _ in range(k_terms)
        ))
        gaps = rng.randint(0, 5)
        span = len(terms) - 1 + gaps

        out = eval_plan_on_data(
            dict(data), ("window", terms, gaps), idfs, avgdl, 100
        )
        got = {
            int(d): round(float(s), 9)
            for d, s in zip(out["doc_id"], out["score"])
        }
        want = {}
        for d, toks in docs.items():
            plists = [
                [i for i, w in enumerate(toks) if w == t] for t in terms
            ]
            best = min_cover_span(plists)
            if best is not None and best <= span:
                s = 0.0
                for t in terms:
                    tf = float(toks.count(t))
                    dl = float(len(toks))
                    s += idfs.get(("text", t), 0.0) * tf * (K1 + 1.0) / (
                        tf + K1 * (1.0 - B + B * dl / avgdl)
                    )
                want[d] = round(s, 9)
        assert got == want, f"case {case} window{terms}~~{gaps}"


def test_near_scalar_fallback_matches_vectorized(monkeypatch):
    """Forcing the key bound low (positions + slop >= _POS_B) drops
    ev_near to the per-candidate scalar DP — results must be identical
    to the vectorized path on the same encoded postings."""
    import math
    import random

    import pandas as pd

    import xf_spark.query.segment_search as ss
    from xf_spark.index.segments import _encode_term
    from xf_spark.query.segment_search import build_term_data, eval_plan_on_data

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc"]
    docs = {
        d: [vocab[rng.randrange(3)] for _ in range(rng.randint(5, 30))]
        for d in range(30)
    }
    avgdl = sum(len(t) for t in docs.values()) / len(docs)
    rows, df_by_term = [], {}
    for t in vocab:
        ids, tfs, dls, pos = [], [], [], []
        for d in sorted(docs):
            p = [i for i, w in enumerate(docs[d]) if w == t]
            if p:
                ids.append(d)
                tfs.append(len(p))
                dls.append(len(docs[d]))
                pos.append(np.asarray(p, dtype=np.int64))
        df_by_term[t] = len(ids)
        rows.append(
            dict(
                _encode_term(
                    t, 0, 0,
                    np.asarray(ids, dtype=np.int64),
                    np.asarray(tfs, dtype=np.int64),
                    np.asarray(dls, dtype=np.int64),
                    pos, avgdl,
                ),
                field="text",
            )
        )
    data = build_term_data(pd.DataFrame(rows))
    idfs = {
        ("text", t): math.log(1 + (30 - df + 0.5) / (df + 0.5))
        for t, df in df_by_term.items()
    }
    plan = ("near", ["aa", "bb"], 2)
    vec = eval_plan_on_data(dict(data), plan, idfs, avgdl, 100)
    assert len(vec) > 0  # the fixture must actually match something
    monkeypatch.setattr(ss, "_POS_B", 8)  # max dl is 30 -> forces scalar
    # fresh data dict: the _pos memo is fine to share, keys are not cached
    scal = eval_plan_on_data(dict(data), plan, idfs, avgdl, 100)
    assert list(vec["doc_id"]) == list(scal["doc_id"])
    assert np.allclose(vec["score"], scal["score"])


def test_segment_synonyms(built):
    """SegmentIndex.search(synonyms=...) == oracle with the same map;
    multi-word synonyms act as phrases."""
    ix, oracle, _, _ = built
    syn = {"ml": ["machine learning", "ai"], "rust": ["rustlang"]}
    for q in ("ml", "rust systems", "ml AND rust"):
        got = [
            (r["doc_id"], r["score"])
            for r in ix.search(q, limit=25, synonyms=syn).collect()
        ]
        want = oracle.search(q, limit=25, synonyms=syn)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), (q, gd, gs, ws)


def test_segment_multiterm_msearch(built):
    """Dictionary-resolved atoms through the batch path: search_many
    results == per-query oracle, and the expansion memo serves
    repeated leaves without extra scans."""
    ix, oracle, _, _ = built
    qs = ["ma?hine", "machne~2", '"machine lear*"', "ma?hine rust"]
    res = ix.search_many(qs, limit=15)
    for q in qs:
        got = [(d, round(s, 9)) for d, s in res[q]]
        want = [(d, round(s, 9)) for d, s in oracle.search(q, limit=15)]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), (q, gd, gs, ws)
    assert ("wildcard", "ma?hine") in ix._multiterm_memo
    assert ("fuzzy", "machne", 2) in ix._multiterm_memo
    assert ("pprefix", "lear") in ix._multiterm_memo


def test_segment_min_should_match(built):
    """SegmentIndex.search(min_should_match=2) == oracle msm plan."""
    from xf_spark.query.parser import apply_min_should_match, parse_query

    ix, oracle, _, _ = built
    q = "rust machine language"
    got = [
        (r["doc_id"], r["score"])
        for r in ix.search(q, limit=20, min_should_match=2).collect()
    ]
    scored = oracle._eval(apply_min_should_match(parse_query(q), 2))
    want = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), (gd, gs, ws)


def test_phrase_randomized_encode_decode_isomorphism():
    """20 seeded random mini-corpora, pure in-process: postings encoded
    with the real codec (_encode_term), decoded + phrase-evaluated by
    the vectorized path (eval_plan_on_data), compared against a
    brute-force Python adjacency + BM25 recomputation. Catches codec/
    position-framing/key-collision bugs on shapes the fixture corpus
    never produces (adjacent duplicate terms, singleton docs, empty
    overlaps)."""
    import math
    import random

    import pandas as pd

    from xf_spark.index.segments import _encode_term
    from xf_spark.query.segment_search import build_term_data, eval_plan_on_data

    K1, B = 1.2, 0.75
    rng = random.Random(42)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for case in range(20):
        n_docs = rng.randint(1, 40)
        docs = {
            d: [vocab[rng.randrange(len(vocab))] for _ in range(rng.randint(0, 30))]
            for d in range(n_docs)
        }
        total = sum(len(t) for t in docs.values())
        avgdl = total / n_docs if n_docs else 0.0
        # per-term postings
        rows = []
        df_by_term = {}
        for t in vocab:
            ids, tfs, dls, pos = [], [], [], []
            for d in sorted(docs):
                p = [i for i, w in enumerate(docs[d]) if w == t]
                if p:
                    ids.append(d)
                    tfs.append(len(p))
                    dls.append(len(docs[d]))
                    pos.append(np.asarray(p, dtype=np.int64))
            if not ids:
                continue
            df_by_term[t] = len(ids)
            row = _encode_term(
                t, 0, 0,
                np.asarray(ids, dtype=np.int64),
                np.asarray(tfs, dtype=np.int64),
                np.asarray(dls, dtype=np.int64),
                pos, avgdl,
            )
            row["field"] = "text"
            rows.append(row)
        if not rows:
            continue
        pdf = pd.DataFrame(rows)
        data = build_term_data(pdf)

        t1, t2 = rng.sample(vocab, 2) if rng.random() < 0.7 else ("aa", "aa")
        phrase = [t1, t2]
        idfs = {
            ("text", t): math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
            for t, df in df_by_term.items()
        }
        out = eval_plan_on_data(data, ("phrase", phrase), idfs, avgdl, 100)
        got = {int(d): round(float(s), 9) for d, s in zip(out["doc_id"], out["score"])}

        want = {}
        for d, toks in docs.items():
            if any(
                toks[i] == t1 and toks[i + 1] == t2 for i in range(len(toks) - 1)
            ):
                s = 0.0
                for t in phrase:
                    tf = float(toks.count(t))
                    dl = float(len(toks))
                    s += idfs[("text", t)] * tf * (K1 + 1.0) / (
                        tf + K1 * (1.0 - B + B * dl / avgdl)
                    )
                want[d] = round(s, 9)
        assert got == want, f"case {case}: {got} != {want}"


def test_search_many_chunks_union_decode(built):
    """The coordinator decode is bounded per CHUNK, not just per member:
    with the threshold squeezed to the largest single member, the batch
    must split into multiple chunks and still match per-query results
    exactly (review finding: the union of N just-under-threshold members
    was decoded at once — N x the documented bound)."""
    ix, _oracle, _m, _p = built
    queries = ["machine", "rust", "python", "async", "learning", "model"]
    want = {q: ix.search_local(q, limit=10) for q in queries}
    dfs = ix.term_dfs(set(queries), "text")
    old = ix.driver_topk_threshold
    ix.driver_topk_threshold = max(dfs.values()) + 1
    try:
        batch = ix.search_many(queries, limit=10)
    finally:
        ix.driver_topk_threshold = old
    for q in queries:
        got = [(d, round(s, 9)) for d, s in batch[q]]
        exp = [(d, round(s, 9)) for d, s in want[q]]
        assert got == exp, q


def test_search_many_fuzz_equals_per_query(built):
    """Batch-path fuzz: random operator compositions through
    search_many must equal per-query search_local exactly — the batch
    machinery (plan chunking, shared term decode, LRU reuse, heavy-
    member routing) must be invisible to results."""
    import random

    ix, oracle, _m, _p = built
    rng = random.Random(20260818)
    by_df = sorted(oracle.postings.items(), key=lambda kv: -len(kv[1]))
    head = [t for t, _ in by_df[:20]]
    tail = [t for t, _ in by_df[-20:]]

    def atom():
        r = rng.random()
        if r < 0.55:
            return rng.choice(rng.choice([head, tail, ["zzqx", "!!!"]]))
        if r < 0.8:
            return f'"{rng.choice(head)} {rng.choice(head + tail)}"'
        w = rng.choice(head)
        return w[: max(2, len(w) // 2)] + "*"

    queries = []
    for _ in range(32):
        parts = [atom()]
        for _ in range(rng.randint(0, 2)):
            op = rng.choice(["", "AND", "OR", "NOT"])
            parts.append(f"{op} {atom()}" if op else atom())
        queries.append(" ".join(parts))
    queries = list(dict.fromkeys(queries))

    for i in range(0, len(queries), 16):
        chunk = queries[i : i + 16]
        batch = ix.search_many(chunk, limit=20)
        for q in chunk:
            got = [(d, round(s, 9)) for d, s in batch[q]]
            want = [(d, round(s, 9)) for d, s in ix.search_local(q, limit=20)]
            assert got == want, q


class TestFuzzy:
    """fuzzy=True — edit-distance-1 term expansion over the segment
    vocabulary (the reference's `search.fuzzy` knob, config.rs:75)."""

    def test_variants_include_exact_and_neighbors(self, built):
        ix, _, _, _ = built
        variants = ix.fuzzy_variants("machine")
        assert "machine" in variants
        # every variant is within edit distance 1 (and distinct)
        assert len(variants) == len(set(variants))
        for v in variants:
            assert _lev(v, "machine") <= 1, v

    def test_fuzzy_typo_equals_or_of_variants(self, built):
        ix, oracle, _, _ = built
        typo = "machin"  # 'machine' minus the trailing 'e'
        variants = ix.fuzzy_variants(typo)
        assert "machine" in variants  # the typo resolves to the real term
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search(typo, limit=20, fuzzy=True).collect()
        ]
        want = [
            (d, round(s, 9))
            for d, s in oracle.search(" ".join(variants), limit=20)
        ]
        assert got == want

    def test_fuzzy_off_typo_matches_nothing(self, built):
        ix, _, _, _ = built
        assert ix.search("machin", limit=20).count() == 0

    def test_short_term_unexpanded(self, built):
        ix, _, _, _ = built
        assert ix.fuzzy_variants("ml") == ["ml"]

    def test_unknown_term_without_neighbors_unchanged(self, built):
        ix, _, _, _ = built
        assert ix.fuzzy_variants("zzqqxxyyzz") == ["zzqqxxyyzz"]
        assert ix.search("zzqqxxyyzz", limit=5, fuzzy=True).count() == 0

    def test_phrase_left_exact(self, built):
        ix, _, _, _ = built
        a = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search('"machine learning"', limit=20, fuzzy=True).collect()
        ]
        b = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search('"machine learning"', limit=20).collect()
        ]
        assert a == b

    def test_memoized(self, built):
        ix, _, _, _ = built
        v1 = ix.fuzzy_variants("machine")
        assert ix._fuzzy_memo["machine"] is v1
        assert ix.fuzzy_variants("machine") is v1

    def test_fuzzy_with_boolean_and_filters(self, built):
        ix, oracle, _, _ = built
        # expansion composes with NOT: both sides expand
        left = ix.fuzzy_variants("rust")
        excl = ix.fuzzy_variants("machin")
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search("rust NOT machin", limit=20, fuzzy=True).collect()
        ]
        # left-assoc fold: "l1 l2 NOT e1 NOT e2" == (OR(l..) minus all e)
        want = [
            (d, round(s, 9))
            for d, s in oracle.search(
                " ".join(left) + " NOT " + " NOT ".join(excl), limit=20
            )
        ]
        assert got == want


def _lev(a: str, b: str) -> int:
    import numpy as np

    d = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        prev = d.copy()
        d[0] = i
        for j, cb in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
    return int(d[-1])


def test_search_many_fuzzy_equals_per_query(built):
    """Batched fuzzy == per-query fuzzy; the batch primes the variant
    memo for every member's terms in ONE vocabulary scan."""
    ix, _, _, _ = built
    ix._fuzzy_memo.clear()
    qs = ["machin", "rust NOT machin", "ml", "zzqqxxyyzz"]
    batch = ix.search_many(qs, limit=20, fuzzy=True)
    assert {"machin", "rust", "ml", "zzqqxxyyzz"} <= set(ix._fuzzy_memo)
    for q in qs:
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search(q, limit=20, fuzzy=True).collect()
        ]
        got = [(d, round(s, 9)) for d, s in batch[q]]
        assert got == want, q
    # non-fuzzy batch unchanged by the fuzzy plumbing
    plain = ix.search_many(["machin"], limit=20)
    assert plain["machin"] == []


def test_search_rescored(built):
    """Two-phase rescoring: engine == oracle replay; phrase-matching
    docs jump docs that only match the bag of words; the distributed
    (over-threshold) secondary path returns identical rows."""
    ix, oracle, _, _ = built
    q, rq = "machine learning", '"machine learning"'
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in ix.search_rescored(q, rq, limit=20, window=100).collect()
    ]
    want = [
        (d, round(s, 9))
        for d, s in oracle.search_rescored(q, rq, limit=20, window=100)
    ]
    assert got == want
    # rescore actually reorders: the top doc matches the phrase
    phrase_ids = {d for d, _ in oracle.search(rq, limit=10**9)}
    assert got[0][0] in phrase_ids
    # distributed secondary path (threshold forced to 0) is identical
    old = ix.driver_topk_threshold
    try:
        ix.driver_topk_threshold = 0
        slow = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search_rescored(q, rq, limit=20, window=100).collect()
        ]
    finally:
        ix.driver_topk_threshold = old
    assert slow == got
    with pytest.raises(ValueError, match="window"):
        ix.search_rescored(q, rq, limit=50, window=10)


def test_search_rescored_bm25_twin(built):
    ix, _oracle, _, _ = built
    from xf_spark.transcripts import load_transcripts
    # the bm25 twin built over the same corpus must agree
    spark = ix.spark
    from xf_spark.index.builder import build_engine

    eng = build_engine(load_transcripts(spark, SCALE))
    q, rq = "machine learning", '"machine learning"'
    a = [
        (r["doc_id"], round(r["score"], 9))
        for r in ix.search_rescored(q, rq, limit=15).collect()
    ]
    b = [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.search_rescored(q, rq, limit=15).collect()
    ]
    assert a == b


def test_mine_hard_negatives(built):
    """Hard-negative mining == per-query oracle ranking minus the
    labeled positives; batching (batch_size=2) and shared query texts
    change nothing."""
    from xf_spark.ops.mining import mine_hard_negatives

    ix, oracle, _, _ = built
    specs = []
    for qid, text in [
        ("q0", "machine learning"),
        ("q1", "rust async"),
        ("q2", "machine learning"),  # shared text, different positives
        ("q3", "python"),
    ]:
        ranked = oracle.search(text, limit=3)
        pos = {d for d, _ in ranked[: (2 if qid == "q2" else 1)]}
        specs.append((qid, text, pos))
    out = mine_hard_negatives(ix, specs, n_neg=5, batch_size=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )
    for qid, text, pos in specs:
        ranked = [
            (d, round(s, 9))
            for d, s in oracle.search(text, limit=5 + len(pos))
            if d not in pos
        ][:5]
        want = [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
        assert sorted(got[qid]) == want, qid
        assert all(d not in pos for _, d, _ in got[qid])
