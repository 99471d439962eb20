"""Differential tests: semantic cosine top-k and RRF hybrid vs the
NumPy oracle (the reference's recompute pattern, tests/cli_e2e.rs
expected_semantic_results / expected_hybrid_scores)."""

from __future__ import annotations

import pytest

from xf_spark.index.builder import build_engine
from xf_spark.oracle import OracleIndex
from xf_spark.query.hybrid import candidate_count, hybrid_search, rrf_fuse
from xf_spark.query.semantic import build_embeddings, semantic_topk
from xf_spark.transcripts import load_transcripts

SCALE = 0.001
TOL = 1e-6


@pytest.fixture(scope="module")
def built(spark):
    transcripts = load_transcripts(spark, SCALE)
    engine = build_engine(transcripts)
    embeddings = build_embeddings(engine.docs).cache()
    embeddings.count()
    rows = engine.docs.select("doc_id", "text").collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    oracle = OracleIndex.build(list(texts.items()))
    return engine, embeddings, texts, oracle


@pytest.mark.parametrize("query,limit", [
    ("stress", 20), ("rust", 100), ("machine learning", 20),
    ("日本語", 10), ("", 5),
])
def test_semantic_vs_oracle(built, query, limit):
    _, embeddings, texts, oracle = built
    got = [
        (r["doc_id"], r["score"])
        for r in semantic_topk(embeddings, query, limit=limit).collect()
    ]
    want = oracle.semantic_topk(query, texts, limit=limit)
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (gd, gs), (_, ws) in zip(got, want):
        # engine stores float32 vectors; oracle computes in float32 too
        assert abs(gs - ws) <= 1e-5 * max(1.0, abs(ws)), (query, gd, gs, ws)


def test_semantic_limit_zero(built):
    """limit=0 -> 0 rows through both numpy topk kernels (regression:
    np.partition kth(=n) out of bounds when k=0)."""
    import numpy as np

    from xf_spark.query.semantic import topk_ids_scores

    _, embeddings, _, _ = built
    assert semantic_topk(embeddings, "machine", limit=0).count() == 0
    ids = np.arange(5, dtype=np.int64)
    sc = np.linspace(0, 1, 5)
    out_ids, out_sc = topk_ids_scores(ids, sc, 0)
    assert len(out_ids) == 0 and len(out_sc) == 0


@pytest.mark.parametrize("query,limit", [("rust", 20), ("machine", 10)])
def test_hybrid_vs_oracle(built, query, limit):
    engine, embeddings, texts, oracle = built
    got = [
        (r["doc_id"], r["score"])
        for r in hybrid_search(engine, embeddings, query, limit=limit).collect()
    ]
    n = candidate_count(limit)
    lex = oracle.search(query, limit=n)
    sem = oracle.semantic_topk(query, texts, limit=n)
    want = oracle.rrf_fuse(lex, sem, limit=limit)
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= TOL, (query, gd, gs, ws)


def test_rrf_spot_value(spark):
    # doc at rank 0 in both lists -> 2/61 (hybrid.rs:375-384)
    lex = spark.createDataFrame([(7, 5.0)], "doc_id long, score double")
    sem = spark.createDataFrame([(7, 0.9)], "doc_id long, score double")
    fused = rrf_fuse(lex, sem, limit=10).collect()
    assert len(fused) == 1
    assert abs(fused[0]["score"] - 2.0 / 61.0) < 1e-12


def test_hybrid_offset_pagination(built):
    engine, embeddings, texts, oracle = built
    full = hybrid_search(engine, embeddings, "rust", limit=20).collect()
    page = hybrid_search(engine, embeddings, "rust", limit=5, offset=5).collect()
    # offset changes candidate_count (3*(limit+offset)), so recompute
    n = candidate_count(5, 5)
    lex = oracle.search("rust", limit=n)
    sem = oracle.semantic_topk("rust", texts, limit=n)
    want = oracle.rrf_fuse(lex, sem, limit=5, offset=5)
    assert [r["doc_id"] for r in page] == [d for d, _ in want]


def test_rrf_randomized_isomorphism(spark):
    """25 seeded random cases: DataFrame rrf_fuse vs the pure-Python
    oracle, bit-exact ranks and scores at 1e-12 — the reference's
    randomized optimized-vs-legacy sweep (hybrid.rs:543-580, LCG seed
    42)."""
    from xf_spark import oracle as om

    state = 42  # LCG, same constants as the reference sweep

    def rnd(n):
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**64
        return state % n

    for case in range(25):
        n_lex, n_sem = 1 + rnd(30), 1 + rnd(30)
        pool = list(range(60))
        lex = [(pool[rnd(60)], float(rnd(1000)) / 10.0) for _ in range(n_lex)]
        sem = [(pool[rnd(60)], float(rnd(1000)) / 1000.0) for _ in range(n_sem)]
        # dedup doc_ids, then rank-order (score desc, doc_id asc) —
        # the oracle takes rank-ordered lists; the DataFrame side
        # derives ranks with the same window
        lex = sorted({d: s for d, s in lex}.items(), key=lambda kv: (-kv[1], kv[0]))
        sem = sorted({d: s for d, s in sem}.items(), key=lambda kv: (-kv[1], kv[0]))
        limit = 1 + rnd(20)
        offset = rnd(4)

        ldf = spark.createDataFrame(lex, "doc_id long, score double")
        sdf = spark.createDataFrame(sem, "doc_id long, score double")
        got = [
            (r["doc_id"], r["score"])
            for r in rrf_fuse(ldf, sdf, limit=limit, offset=offset).collect()
        ]
        want = om.OracleIndex.rrf_fuse(lex, sem, limit=limit, offset=offset)
        assert [d for d, _ in got] == [d for d, _ in want], f"case {case}"
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-12, (case, gd, gs, ws)


class TestIvfServing:
    """XfIndex ann mode: IVF-pruned semantic serving."""

    @pytest.fixture(scope="class")
    def ann_ix(self, spark, tmp_path_factory):
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        path = str(tmp_path_factory.mktemp("annix") / "idx")
        tr = load_transcripts(spark, 0.001)
        return XfIndex.build(tr, path, ann_cells=8, slices=1)

    def test_full_probe_equals_exact(self, ann_ix):
        exact = [r["doc_id"] for r in
                 ann_ix.search("stress", mode="semantic", limit=10).collect()]
        full_probe = [r["doc_id"] for r in
                      ann_ix.search("stress", mode="semantic", ann=True,
                                    n_probe=8, limit=10).collect()]
        assert full_probe == exact and len(exact) == 10

    def test_narrow_probe_recall_sentence_query(self, ann_ix):
        # IVF's workload is sentence/paragraph probes (document
        # clusters form along dominant sentence directions; a single
        # word's direction is orthogonal to them — word queries belong
        # to the lexical path). Sentence probe: high recall at 2/8.
        q = "Machine learning models are fascinating when you understand the mathematics"
        exact = [r["doc_id"] for r in
                 ann_ix.search(q, mode="semantic", limit=10).collect()]
        approx = [r["doc_id"] for r in
                  ann_ix.search(q, mode="semantic", ann=True,
                                n_probe=2, limit=10).collect()]
        assert len(set(approx) & set(exact)) >= 8

    def test_filters_fall_back_to_exact(self, ann_ix):
        rows = ann_ix.search("stress", mode="semantic", ann=True,
                             roles=["user"], limit=10).collect()
        assert rows and all(r["role"] == "user" for r in rows)

    def test_hybrid_full_probe_equals_exact(self, ann_ix):
        # hybrid ann: only the semantic branch switches to IVF, so a
        # full probe must reproduce the exact hybrid ranking bit-for-bit
        q = "Machine learning models are fascinating when you understand the mathematics"
        exact = [(r["doc_id"], round(r["score"], 9)) for r in
                 ann_ix.search(q, mode="hybrid", limit=10).collect()]
        full_probe = [(r["doc_id"], round(r["score"], 9)) for r in
                      ann_ix.search(q, mode="hybrid", ann=True,
                                    n_probe=8, limit=10).collect()]
        assert full_probe == exact and len(exact) == 10

    def test_hybrid_ann_filters_fall_back_to_exact(self, ann_ix):
        rows = ann_ix.search("stress", mode="hybrid", ann=True,
                             roles=["user"], limit=10).collect()
        assert rows and all(r["role"] == "user" for r in rows)

    def test_append_preserves_cell_layout(self, spark, ann_ix, tmp_path):
        from pyspark.sql import functions as F

        extra = ann_ix.docs.select(
            F.concat(F.lit("zz_"), "conv_id").alias("conv_id"), "turn_idx",
            "role", "text", "tool", "ts",
        ).limit(40)
        before = ann_ix.embeddings.count()
        ix2 = ann_ix.append(extra)
        assert "cell" in ix2.embeddings.columns
        assert ix2.embeddings.count() == before + 40
        assert ix2.search("stress", mode="semantic", ann=True, limit=5).count() == 5


class TestExplainHybrid:
    def test_breakdown_matches_hybrid_and_sums(self, spark, tmp_path):
        """explain_hybrid's fused (doc_id, score) must equal hybrid
        search's top-k; contributions sum to the fused score; ranks
        are null exactly when the doc is missing from that list; the
        pinned-vector path yields the identical breakdown."""
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(tr, str(tmp_path / "hx"), slices=1)
        rows = ix.explain_hybrid("machine learning", limit=15).collect()
        assert rows
        hybrid = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search(
                "machine learning", mode="hybrid", limit=15
            ).select("doc_id", "score").collect()
        ]
        assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == hybrid
        for r in rows:
            assert r["contrib_lex"] + r["contrib_sem"] == pytest.approx(
                r["score"], abs=1e-12
            )
            assert (r["lex_rank"] is None) == (r["contrib_lex"] == 0.0)
            assert (r["sem_rank"] is None) == (r["contrib_sem"] == 0.0)
        ix.cache(pin_vectors_mb=512)
        assert ix._pinned_vecs is not None
        pinned = [tuple(r) for r in
                  ix.explain_hybrid("machine learning", limit=15).collect()]
        assert pinned == [tuple(r) for r in rows]
        with pytest.raises(ValueError):
            ix.explain_hybrid("role:user machine")


class TestPinnedVectors:
    def test_pinned_equals_distributed(self, spark, tmp_path):
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(tr, str(tmp_path / "i"), slices=1)
        dist = [(r["doc_id"], round(r["score"], 9)) for r in
                ix.search("stress", mode="semantic", limit=20).collect()]
        ix.cache(pin_vectors_mb=512)
        assert ix._pinned_vecs is not None
        pinned = [(r["doc_id"], round(r["score"], 9)) for r in
                  ix.search("stress", mode="semantic", limit=20).collect()]
        assert pinned == dist
        # filters bypass the pinned path but stay correct
        rows = ix.search("stress", mode="semantic", roles=["user"], limit=10).collect()
        assert rows and all(r["role"] == "user" for r in rows)

    def test_budget_exceeded_stays_distributed(self, spark, tmp_path):
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(tr, str(tmp_path / "j"), slices=1)
        ix.cache(pin_vectors_mb=1)  # 1512 docs * 384 * 4B > 1 MB
        assert ix._pinned_vecs is None
        assert ix.search("stress", mode="semantic", limit=5).count() == 5

    def test_append_invalidates_pinned_matrix(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(tr, str(tmp_path / "k"), slices=1)
        ix.cache(pin_vectors_mb=512)
        assert ix._pinned_vecs is not None
        extra = ix.docs.select(
            F.concat(F.lit("zz_"), "conv_id").alias("conv_id"), "turn_idx",
            "role", "text", "tool", "ts",
        ).limit(10)
        ix = ix.append(extra)
        assert ix._pinned_vecs is None  # stale matrix must not serve
        assert ix.search("stress", mode="semantic", limit=5).count() == 5

    def test_pinned_hybrid_equals_distributed(self, spark, tmp_path):
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(tr, str(tmp_path / "m"), slices=1)
        want = [(r["doc_id"], round(r["score"], 9)) for r in
                ix.search("rust", mode="hybrid", limit=20).collect()]
        ix.cache(pin_vectors_mb=512)
        got = [(r["doc_id"], round(r["score"], 9)) for r in
               ix.search("rust", mode="hybrid", limit=20).collect()]
        assert got == want and len(want) == 20

    def test_topk_ids_scores_exact(self):
        """Partition-based top-k must equal the full lexsort exactly,
        including tie plateaus (the pinned/msearch fast path)."""
        import numpy as np

        from xf_spark.query.semantic import topk_ids_scores

        rng = np.random.default_rng(7)
        for n, k in [(5000, 60), (100, 20), (50, 100)]:
            ids = rng.permutation(n).astype(np.int64)
            sc = rng.standard_normal(n)
            got = topk_ids_scores(ids, sc, k)
            order = np.lexsort((ids, -sc))[:k]
            assert np.array_equal(got[0], ids[order])
            assert np.allclose(got[1], sc[order])
        ids = np.arange(10000, dtype=np.int64)
        sc = np.zeros(10000)
        sc[:5] = 1.0  # massive plateau -> exact fallback
        got = topk_ids_scores(ids, sc, 50)
        order = np.lexsort((ids, -sc))[:50]
        assert np.array_equal(got[0], ids[order])

    def test_pinned_topk_f32_matches_full_f64(self):
        """The f32-matmul + f64-candidate-rescore path must equal the
        full float64 matmul: identical ranks, scores within BLAS
        accumulation-order ULP noise (<1e-12 — same tolerance class as
        the distributed path's per-Arrow-batch matmuls), including
        near-tie clusters and a uniform-vector plateau (hash_embed's
        empty-text fallback embeds many docs to the SAME vector)."""
        import numpy as np

        from xf_spark.query.semantic import pinned_topk, topk_ids_scores

        rng = np.random.default_rng(11)
        for n, k in [(5000, 100), (300, 20), (50, 80)]:
            mat = rng.standard_normal((n, 384))
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            mat32 = mat.astype(np.float32)
            # plateau: rows 0..24 share one vector (uniform fallback)
            mat32[: min(25, n)] = mat32[0]
            ids = rng.permutation(n).astype(np.int64)
            q = rng.standard_normal(384)
            q = (q / np.linalg.norm(q)).astype(np.float32)
            want = topk_ids_scores(
                ids, mat32.astype(np.float64) @ q.astype(np.float64), k
            )
            got = pinned_topk(ids, mat32, q, k)
            assert np.array_equal(got[0], want[0])
            assert np.allclose(got[1], want[1], rtol=0, atol=1e-12)

    def test_pinned_vectors_dedup_topk_exact(self):
        """PinnedVectors (unique-vector dedup + grouped-id expansion)
        must reproduce the per-doc float64 row-wise-dot top-k exactly on
        corpora with heavy duplicate-vector plateaus (the shape
        templated/low-signal transcripts produce).  The reference uses
        per-row np.dot rather than one big gemv: BLAS gemv is not
        row-deterministic (bit-identical rows at different positions of
        one call measured to differ by 1 ULP), while row-wise ddot is
        content-deterministic — the same canonical semantics
        PinnedVectors implements (identical vectors -> one score).
        The batched score_block column path must agree with the
        single-query path exactly."""
        import numpy as np

        from xf_spark.query.semantic import PinnedVectors, topk_ids_scores

        rng = np.random.default_rng(23)
        for n, n_uniq, k in [(4000, 37, 100), (500, 500, 20), (900, 3, 50)]:
            base = rng.standard_normal((n_uniq, 384))
            base /= np.linalg.norm(base, axis=1, keepdims=True)
            assign = rng.integers(0, n_uniq, n)
            mat32 = base[assign].astype(np.float32)
            ids = rng.permutation(n).astype(np.int64) * 7  # sparse ids
            pv = PinnedVectors(ids, mat32)
            assert len(pv.uniq) <= n_uniq + 1
            for _ in range(3):
                q = rng.standard_normal(384)
                q = (q / np.linalg.norm(q)).astype(np.float32)
                A64, q64 = mat32.astype(np.float64), q.astype(np.float64)
                ref = np.array([np.dot(r, q64) for r in A64])
                want = topk_ids_scores(ids, ref, k)
                got = pv.topk(q, k)
                assert np.array_equal(got[0], want[0])
                assert np.allclose(got[1], want[1], rtol=0, atol=1e-12)
                col = pv.score_block(q[None, :])[:, 0]
                got2 = pv.topk(q, k, sc32=col)
                assert np.array_equal(got2[0], got[0])

    def test_pinned_docs_hydration_identical(self, spark, tmp_path):
        """pin_docs_mb: hydration from the driver-pinned doc store must
        match the broadcast-join path row-for-row; over-budget or
        post-append the pin drops and the join path serves."""
        from pyspark.sql import functions as F

        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(tr, str(tmp_path / "pd"), slices=1)
        want = [
            (r["doc_id"], r["conv_id"], r["text"], round(r["score"], 9))
            for r in ix.search("machine", mode="lexical", limit=20).collect()
        ]
        ix.cache(pin_docs_mb=512)
        assert ix._pinned_docs is not None
        got = [
            (r["doc_id"], r["conv_id"], r["text"], round(r["score"], 9))
            for r in ix.search("machine", mode="lexical", limit=20).collect()
        ]
        assert got == want and got
        # over-budget: pin refused, results unchanged
        ix._pinned_docs = None
        ix.cache(pin_docs_mb=0)
        assert ix._pinned_docs is None
        # append invalidates the pinned store
        ix.cache(pin_docs_mb=512)
        extra = ix.docs.select(
            F.concat(F.lit("zzpd_"), "conv_id").alias("conv_id"), "turn_idx",
            "role", "text", "tool", "ts",
        ).limit(5)
        ix = ix.append(extra)
        assert ix._pinned_docs is None

    def test_hybrid_msearch_equals_per_query(self, spark, tmp_path):
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(tr, str(tmp_path / "n"), slices=1).cache(
            pin_vectors_mb=512
        )
        queries = ["rust", "machine", '"machine learning"']
        batch = ix.msearch(queries, limit=15, mode="hybrid")
        for q in queries:
            single = [(r["doc_id"], round(r["score"], 9)) for r in
                      ix.search(q, mode="hybrid", limit=15)
                      .select("doc_id", "score").collect()]
            got = [(d, round(s, 9)) for d, s in batch[q]]
            # engine.search returns hydrated rows ordered by score/doc
            single.sort(key=lambda t: (-t[1], t[0]))
            got.sort(key=lambda t: (-t[1], t[0]))
            assert got == single, q

    def test_semantic_msearch_both_tiers(self, spark, tmp_path):
        """msearch(mode="semantic"): the unpinned tier scores the whole
        query block in ONE distributed scan (semantic_topk_many, round
        3), the pinned tier in one sgemm — both rank/score-identical to
        per-query search(mode="semantic")."""
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(tr, str(tmp_path / "sm"), slices=1)
        queries = ["rust", "machine", "learning", "rust"]  # dup collapses
        want = {}
        for q in set(queries):
            rows = [(r["doc_id"], round(r["score"], 9)) for r in
                    ix.search(q, mode="semantic", limit=10)
                    .select("doc_id", "score").collect()]
            want[q] = rows
        assert ix._pinned_vecs is None
        unpinned = ix.msearch(queries, limit=10, mode="semantic")
        assert set(unpinned) == set(want)
        for q in want:
            assert [(d, round(s, 9)) for d, s in unpinned[q]] == want[q], q
        ix.cache(pin_vectors_mb=512)
        assert ix._pinned_vecs is not None
        pinned = ix.msearch(queries, limit=10, mode="semantic")
        for q in want:
            assert [(d, round(s, 9)) for d, s in pinned[q]] == want[q], q

    def test_hybrid_msearch_unpinned_falls_back_distributed(
        self, spark, tmp_path
    ):
        """Without the vector pin (the guaranteed state once the corpus
        exceeds pin_vectors_mb) hybrid msearch must still serve —
        per-query distributed hybrid, identical results to search()."""
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(tr, str(tmp_path / "o"), slices=1)
        assert ix._pinned_vecs is None
        batch = ix.msearch(["rust", "machine"], limit=10, mode="hybrid")
        for q in ("rust", "machine"):
            single = [(r["doc_id"], round(r["score"], 9)) for r in
                      ix.search(q, mode="hybrid", limit=10)
                      .select("doc_id", "score").collect()]
            got = [(d, round(s, 9)) for d, s in batch[q]]
            single.sort(key=lambda t: (-t[1], t[0]))
            got.sort(key=lambda t: (-t[1], t[0]))
            assert got == single and len(got) == 10, q


class TestQueryRoleFilters:
    """Query-embedded type:/role: filters must constrain EVERY branch
    (review finding: they used to filter only the lexical list, and the
    raw 'role:...' token was hash-embedded into the query vector)."""

    @pytest.fixture(scope="class")
    def ix(self, spark, tmp_path_factory):
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        path = str(tmp_path_factory.mktemp("qrf") / "idx")
        tr = load_transcripts(spark, 0.001)
        return XfIndex.build(tr, path, slices=1)

    def test_semantic_query_role_equals_kwarg(self, ix):
        a = [(r["doc_id"], round(r["score"], 9)) for r in
             ix.search("role:assistant stress", mode="semantic", limit=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in
             ix.search("stress", mode="semantic", roles=["assistant"], limit=10).collect()]
        assert a == b and len(a) == 10
        rows = ix.search("role:assistant stress", mode="semantic", limit=10).collect()
        assert all(r["role"] == "assistant" for r in rows)

    def test_hybrid_query_role_equals_kwarg(self, ix):
        a = [(r["doc_id"], round(r["score"], 9)) for r in
             ix.search("role:assistant stress", mode="hybrid", limit=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in
             ix.search("stress", mode="hybrid", roles=["assistant"], limit=10).collect()]
        assert a == b and len(a) == 10

    def test_contradictory_filters_match_nothing(self, ix):
        for mode in ("lexical", "semantic", "hybrid"):
            n = ix.search(
                "role:assistant stress", mode=mode, roles=["user"], limit=10
            ).count()
            assert n == 0, mode

    def test_pinned_path_honors_query_role(self, ix):
        ix.cache(pin_vectors_mb=512)
        assert ix._pinned_vecs is not None
        rows = ix.search("role:user stress", mode="semantic", limit=10).collect()
        assert rows and all(r["role"] == "user" for r in rows)

    def test_blank_roles_rejected(self, ix):
        with pytest.raises(ValueError, match="roles"):
            ix.search("stress", roles=[" "])

    def test_msearch_honors_query_role(self, ix):
        # role-filtered members take the single-query path; plain
        # members ride the block paths — both keyed in one result
        for mode in ("semantic", "hybrid"):
            batch = ix.msearch(["role:user stress", "stress"], limit=10, mode=mode)
            single = [(r["doc_id"], round(r["score"], 9)) for r in
                      ix.search("role:user stress", mode=mode, limit=10)
                      .select("doc_id", "score").collect()]
            got = [(d, round(s, 9)) for d, s in batch["role:user stress"]]
            assert got == single and len(got) == 10, mode
            assert len(batch["stress"]) == 10, mode
        # unparseable member isolates as empty, rest served
        batch = ix.msearch(["rust NOT type:assistant", "stress"],
                           limit=5, mode="semantic")
        assert batch["rust NOT type:assistant"] == []
        assert len(batch["stress"]) == 5

    def test_semantic_operator_spelling_equivalent(self, ix):
        # 'stress AND role:assistant' must embed the same query vector
        # as the kwarg form — the absorbed AND must not leak into the
        # embedded text (review finding)
        a = [(r["doc_id"], round(r["score"], 9)) for r in
             ix.search("stress AND role:assistant", mode="semantic", limit=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in
             ix.search("stress", mode="semantic", roles=["assistant"], limit=10).collect()]
        assert a == b and len(a) == 10

    def test_missing_embeddings_not_masked_by_contradiction(self, spark, tmp_path):
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        lex = XfIndex.build(tr, str(tmp_path / "lexonly"),
                            with_embeddings=False, slices=1)
        with pytest.raises(ValueError, match="without embeddings"):
            lex.search("stress role:user", mode="semantic",
                       roles=["assistant"], limit=5)

    def test_msearch_fuzz_equals_per_query(self, ix):
        """Batched semantic/hybrid msearch — mixed plain and
        role-filtered members in one batch — must equal per-query
        search exactly (the filtered members route through
        _search_hits, the plain ones through the block paths)."""
        import random

        rng = random.Random(20260818)
        words = ["stress", "machine", "rust", "python", "async",
                 "learning", "model", "data"]
        queries = []
        for _ in range(12):
            q = " ".join(rng.sample(words, rng.randint(1, 3)))
            if rng.random() < 0.4:
                q += rng.choice([" role:assistant", " type:user"])
            queries.append(q)
        queries = list(dict.fromkeys(queries))
        for mode in ("semantic", "hybrid"):
            batch = ix.msearch(queries, limit=10, mode=mode)
            for q in queries:
                got = [(d, round(s, 9)) for d, s in batch[q]]
                want = [(r["doc_id"], round(r["score"], 9)) for r in
                        ix.search(q, mode=mode, limit=10).collect()]
                assert got == want, (mode, q)

    def test_msearch_hybrid_fuzzy_equals_per_query(self, ix):
        """fuzzy=True flows through msearch's lexical branches (block
        path AND role-filtered members); semantic scoring is unchanged
        (typo-tolerant by construction)."""
        queries = ["machin learning", "rust machin role:assistant"]
        batch = ix.msearch(queries, limit=10, mode="hybrid", fuzzy=True)
        for q in queries:
            got = [(d, round(s, 9)) for d, s in batch[q]]
            want = [(r["doc_id"], round(r["score"], 9)) for r in
                    ix.search(q, mode="hybrid", limit=10, fuzzy=True).collect()]
            assert got == want, q
        # and the typo really matters on the lexical side (the fused
        # hybrid ranks can coincide when the semantic branch dominates,
        # so the meaningful contrast is the lexical branch itself)
        lex_fuzzy = ix.msearch(["machin"], limit=10, fuzzy=True)["machin"]
        lex_plain = ix.msearch(["machin"], limit=10)["machin"]
        assert lex_plain == [] and len(lex_fuzzy) > 0


class TestMoreLikeThis:
    """XfIndex.more_like_this: similar-turns by the target's own
    embedding. Because the engine hash-embeds the stored text, the
    NumPy oracle's semantic_topk queried WITH the target's text is
    the exact expected ranking (same canonicalize -> hash_embed)."""

    @pytest.fixture(scope="class")
    def mlt(self, spark, tmp_path_factory):
        from xf_spark.engine import XfIndex

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(
            tr, str(tmp_path_factory.mktemp("mlt") / "i"), slices=1
        )
        rows = ix.docs.select(
            "doc_id", "conv_id", "turn_idx", "role", "text"
        ).collect()
        texts = {r["doc_id"]: r["text"] for r in rows}
        meta = {r["doc_id"]: r for r in rows}
        oracle = OracleIndex.build(list(texts.items()))
        return ix, texts, meta, oracle

    @staticmethod
    def _want(oracle, texts, target, k, doc_filter=None):
        ranked = oracle.semantic_topk(
            texts[target] or "", texts, limit=k + 1, doc_filter=doc_filter
        )
        return [(d, s) for d, s in ranked if d != target][:k]

    def test_distributed_matches_oracle(self, mlt):
        ix, texts, meta, oracle = mlt
        t = meta[7]
        got = [
            (r["doc_id"], r["score"])
            for r in ix.more_like_this(t["conv_id"], t["turn_idx"], limit=15)
            .select("doc_id", "score").collect()
        ]
        want = self._want(oracle, texts, 7, 15)
        assert [d for d, _ in got] == [d for d, _ in want]
        assert all(d != 7 for d, _ in got)
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= 1e-5 * max(1.0, abs(ws)), (gd, gs, ws)

    def test_pinned_equals_distributed(self, mlt):
        ix, texts, meta, _ = mlt
        t = meta[42]
        dist = [(r["doc_id"], round(r["score"], 9)) for r in
                ix.more_like_this(t["conv_id"], t["turn_idx"], limit=12)
                .select("doc_id", "score").collect()]
        ix.cache(pin_vectors_mb=512)
        assert ix._pinned_vecs is not None
        pinned = [(r["doc_id"], round(r["score"], 9)) for r in
                  ix.more_like_this(t["conv_id"], t["turn_idx"], limit=12)
                  .select("doc_id", "score").collect()]
        assert pinned == dist

    def test_role_filter(self, mlt):
        ix, texts, meta, oracle = mlt
        t = meta[7]
        got = ix.more_like_this(
            t["conv_id"], t["turn_idx"], limit=10, roles=["user"]
        ).collect()
        assert got and all(r["role"] == "user" for r in got)
        users = {d for d, m in meta.items() if m["role"] == "user"}
        want = self._want(oracle, texts, 7, 10, doc_filter=lambda d: d in users)
        assert [r["doc_id"] for r in got] == [d for d, _ in want]

    def test_missing_turn_raises(self, mlt):
        ix, *_ = mlt
        with pytest.raises(KeyError):
            ix.more_like_this("no_such_conv", 0)

    def test_no_embeddings_raises(self, spark, tmp_path):
        from xf_spark.engine import XfIndex

        tr = load_transcripts(spark, 0.001)
        ix = XfIndex.build(
            tr, str(tmp_path / "ne"), slices=1, with_embeddings=False
        )
        with pytest.raises(ValueError):
            ix.more_like_this("conv5000000000000", 0)


class TestSynonymsFacade:
    """XfIndex-level synonyms knob: lexical passthrough + loud
    rejection on the semantic/hybrid modes."""

    @pytest.fixture(scope="class")
    def syn_ix(self, spark, tmp_path_factory):
        from xf_spark.engine import XfIndex
        from xf_spark.transcripts import load_transcripts

        path = str(tmp_path_factory.mktemp("synix") / "idx")
        return XfIndex.build(load_transcripts(spark, 0.001), path, slices=1)

    def test_lexical_passthrough(self, syn_ix):
        syn = {"ml": ["machine learning", "ai"]}
        got = [
            (r["doc_id"], round(r["score"], 6))
            for r in syn_ix.search(
                "ml", mode="lexical", limit=15, synonyms=syn
            ).collect()
        ]
        want = [
            (r["doc_id"], round(r["score"], 6))
            for r in syn_ix.segment_index.search(
                "ml", limit=15, synonyms=syn
            ).collect()
        ]
        assert got and [d for d, _ in got] == [d for d, _ in want]

    def test_non_lexical_rejected(self, syn_ix):
        for mode in ("semantic", "hybrid"):
            with pytest.raises(ValueError, match="synonyms"):
                syn_ix.search(
                    "ml", mode=mode, limit=5, synonyms={"ml": ["ai"]}
                )

    def test_wildcard_rides_fast_path(self, syn_ix):
        # dictionary-resolved atoms through the XfIndex rows fast path
        # == the SegmentIndex DataFrame route
        a = [
            (r["doc_id"], round(r["score"], 6))
            for r in syn_ix.search("ma?hine", mode="lexical", limit=10).collect()
        ]
        b = [
            (r["doc_id"], round(r["score"], 6))
            for r in syn_ix.segment_index.search("ma?hine", limit=10).collect()
        ]
        assert a and a == b
