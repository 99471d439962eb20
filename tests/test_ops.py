"""Tests for the training-data ops: dedup family, similarity, text
analysis, multimodal plumbing — each verified against brute-force or
pure-Python recomputation on the driver's documents/embeddings tables."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from xf_spark.ops import dedup as D
from xf_spark.ops import similarity as SIM
from xf_spark.ops import textops as TX
from xf_spark.ops.multimodal import extract_features, frame_sample_plan, synth_media

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


class TestExactDedup:
    def test_keeps_min_id_per_text(self, documents):
        out = D.exact_dedup(documents).collect()
        rows = documents.collect()
        first_by_text = {}
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            first_by_text.setdefault(r["text"], r["doc_id"])
        assert sorted(r["doc_id"] for r in out) == sorted(first_by_text.values())


class TestMinHash:
    def test_signature_deterministic(self):
        a = D.minhash_signature("the quick brown fox jumps over the lazy dog")
        b = D.minhash_signature("the quick brown fox jumps over the lazy dog")
        assert a == b and len(a) == D.N_HASHES

    def test_identical_texts_share_all_bands(self, spark):
        df = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon zeta"),
             (1, "alpha beta gamma delta epsilon zeta"),
             (2, "completely different words entirely here now")],
            "doc_id long, text string",
        )
        pairs = D.minhash_lsh_candidates(df).collect()
        assert (0, 1) in {(r["id_a"], r["id_b"]) for r in pairs}

    def test_lsh_verified_jaccard_vs_bruteforce(self, spark):
        texts = [
            "one two three four five six seven eight nine ten",
            "one two three four five six seven eight nine eleven",  # near-dup
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "one two three four five six seven eight nine ten",  # exact dup
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.minhash_dedup_pairs(df, threshold=0.5).collect()
        }
        # brute-force shingle jaccard
        sh = [D._shingles(t) for t in texts]
        for i, j in itertools.combinations(range(len(texts)), 2):
            jac = len(sh[i] & sh[j]) / len(sh[i] | sh[j])
            if jac >= 0.5:
                assert (i, j) in got, (i, j, jac)
                assert abs(got[(i, j)] - round(jac, 6)) < 1e-9


class TestLshHotBucketCap:
    """Round-2 guard: a boilerplate-heavy bucket must not go quadratic.
    500 copies of one doc = ~125k candidate pairs uncapped; with the
    cap the hot bucket is excluded and only the distinct near-dups
    survive candidate generation."""

    def _df(self, spark):
        boiler = "standard disclaimer text repeated across every document body"
        rows = [(i, boiler) for i in range(500)]
        rows += [
            (1000, "one two three four five six seven eight nine ten"),
            (1001, "one two three four five six seven eight nine eleven"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hot_bucket_dropped_distinct_pairs_kept(self, spark):
        df = self._df(spark)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in D.minhash_lsh_candidates(df, max_bucket=50).collect()
        }
        assert (1000, 1001) in pairs
        # no pair from the capped boilerplate bucket survives
        assert not any(a < 500 and b < 500 for a, b in pairs)
        # and the candidate set is tiny, not ~125k
        assert len(pairs) < 100

    def test_uncapped_is_quadratic_baseline(self, spark):
        # sanity: the cap is what prevents the blowup
        df = self._df(spark)
        n = D.minhash_lsh_candidates(df, max_bucket=None).count()
        assert n >= 500 * 499 / 2


class TestSimHashHotBucketCap:
    """Round-3: the quadratic guard minhash got in round 2, applied to
    the simhash 4-block join — one boilerplate class sharing a simhash
    value must not generate ~m^2/2 candidate pairs."""

    def _df(self, spark):
        boiler = "standard disclaimer text repeated across every document body"
        rows = [(i, boiler) for i in range(500)]
        rows += [
            (1000, "one two three four five six seven eight nine ten"),
            (1001, "one two three four five six seven eight nine ten"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hot_bucket_dropped_distinct_pairs_kept(self, spark):
        df = self._df(spark)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in D.simhash_candidates(df, max_bucket=50).collect()
        }
        assert (1000, 1001) in pairs  # 2-doc bucket survives
        assert not any(a < 500 and b < 500 for a, b in pairs)
        assert len(pairs) < 100

    def test_uncapped_is_quadratic_baseline(self, spark):
        df = self._df(spark)
        n = D.simhash_candidates(df, max_bucket=None).count()
        assert n >= 500 * 499 / 2


class TestHyperplaneHotBucketCap:
    """Round-3: same guard for the hyperplane-LSH sketch join — the
    repo's own measurement (93% of sf0.1 docs canonicalize to ONE
    fallback embedding) makes this the worst skew of the three
    families."""

    def _df(self, spark):
        rng = np.random.default_rng(7)
        v = [float(x) for x in rng.standard_normal(16)]
        neg = [-x for x in v]  # complementary sketch: never in v's bucket
        near = [x * 1.001 for x in neg]
        rows = [(i, v) for i in range(500)]
        rows += [(1000, neg), (1001, near)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_hot_bucket_dropped_distinct_pairs_kept(self, spark):
        df = self._df(spark)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in D.embedding_near_dup_pairs(
                df, threshold=0.99, n_planes=4, max_bucket=50
            ).collect()
        }
        assert (1000, 1001) in pairs
        assert not any(a < 500 and b < 500 for a, b in pairs)
        assert len(pairs) < 100

    def test_uncapped_is_quadratic_baseline(self, spark):
        df = self._df(spark)
        n = D.embedding_near_dup_pairs(
            df, threshold=0.99, n_planes=4, max_bucket=None
        ).count()
        assert n >= 500 * 499 / 2


class TestNearDupGroups:
    def test_chain_components_and_singletons(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
        )
        docs = spark.createDataFrame(
            [(i,) for i in [1, 2, 3, 5, 7, 8]], "doc_id long"
        )
        got = {
            r["doc_id"]: r["keep_id"]
            for r in D.near_dup_groups(docs, pairs).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 8: 7}

    def test_long_path_converges(self, spark):
        # path graph 0-1-...-19: pointer jumping must converge well
        # inside max_rounds (O(log n), not O(diameter))
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(19)], "id_a long, id_b long"
        )
        comp = {
            r["node"]: r["comp"]
            for r in D.connected_components(pairs, max_rounds=8).collect()
        }
        assert set(comp.values()) == {0}
        assert len(comp) == 20

    def test_empty_pairs_all_self(self, spark):
        docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        got = {
            r["doc_id"]: r["keep_id"]
            for r in D.near_dup_groups(docs, pairs).collect()
        }
        assert got == {1: 1, 2: 2}

    def test_priority_keep_highest_tie_min_id(self, spark):
        # comp {1,2,3}: 3 has the max priority -> everyone keeps 3;
        # comp {7,8}: tie -> min id 7; singleton 5 keeps itself
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
        )
        docs = spark.createDataFrame(
            [(1, 10), (2, 11), (3, 25), (5, 1), (7, 4), (8, 4)],
            "doc_id long, n_tokens long",
        )
        got = {
            r["doc_id"]: r["keep_id"]
            for r in D.near_dup_groups(
                docs, pairs, priority_col="n_tokens"
            ).collect()
        }
        assert got == {1: 3, 2: 3, 3: 3, 5: 5, 7: 7, 8: 7}


class TestSimHashBatch:
    def test_batch_equals_scalar(self):
        texts = [
            "the quick brown fox", "", "a",
            "machine learning rocks rocks rocks",
            "unicode 机器 学习 text", "the the the",
        ]
        assert list(D.simhash_batch(texts)) == [D.simhash(t) for t in texts]


class TestSimHash:
    def test_identical_zero_hamming(self, spark):
        # one differing token out of 40: tiny simhash perturbation ->
        # within the 4-block trick's recall guarantee (hamming <= 3)
        base = " ".join(f"token{i:02d}" for i in range(40))
        near = base.replace("token39", "token99")
        df = spark.createDataFrame(
            [(0, base), (1, base), (2, near), (3, "entirely different words here")],
            "doc_id long, text string",
        )
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
               D.simhash_candidates(df, max_hamming=24).collect()}
        assert got[(0, 1)] == 0
        assert (0, 3) not in got and (1, 3) not in got
        # python-side ground truth for the near pair
        h = bin(D.simhash(base) ^ D.simhash(near)).count("1")
        if h <= 24 and (0, 2) in got:
            assert got[(0, 2)] == h

    def test_simhash_matches_python(self, documents):
        rows = documents.limit(5).collect()
        from pyspark.sql import functions as F

        df = documents.limit(5).select(
            "doc_id", D.simhash_udf(F.col("text")).alias("sh")
        ).collect()
        got = {r["doc_id"]: r["sh"] for r in df}
        for r in rows:
            assert got[r["doc_id"]] == D.simhash(r["text"])


class TestEmbeddingNearDup:
    def test_finds_identical_vectors(self, spark):
        v = [float(x) for x in np.random.default_rng(0).standard_normal(16)]
        v2 = [x * 1.001 for x in v]  # same direction
        other = [float(x) for x in np.random.default_rng(9).standard_normal(16)]
        df = spark.createDataFrame(
            [(0, v), (1, v2), (2, other)], "vec_id long, embedding array<float>"
        )
        pairs = D.embedding_near_dup_pairs(df, threshold=0.99, n_planes=4).collect()
        keys = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 1) in keys
        assert all(r["cosine"] >= 0.99 for r in pairs)

    def test_cosine_rounding_half_away_from_zero(self):
        # the rounded value feeds the >= threshold cut, so the kernel
        # must round like Spark F.round / DuckDB ROUND (half away from
        # zero), not numpy's default half-to-even
        import pandas as pd

        fn = D._cosine_pairs_udf.func
        # parallel vectors scaled so cos*1e6 lands exactly on x.5
        a = pd.Series([[1.0, 0.0], [1.0, 0.0]])
        b = pd.Series([[1.0, 0.0], [-1.0, 0.0]])
        out = fn(a, b).tolist()
        assert out == [1.0, -1.0]
        scaled = np.array([0.9999985, -0.9999985])  # *1e6 = ±999998.5
        got = np.sign(scaled) * np.floor(np.abs(scaled) * 1e6 + 0.5) / 1e6
        assert got.tolist() == [0.999999, -0.999999]  # away from zero
        assert np.round(scaled, 6).tolist() == [0.999998, -0.999998]  # banker's differs


class TestSemDeDup:
    # two orthogonal centroids; cluster 0 = x-axis family, cluster 1 =
    # y-axis family
    C = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])

    def _df(self, spark, rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    def test_duplicates_collapse_keep_farthest(self, spark):
        # 0 and 1 are the same direction (dup pair); 1 sits farther
        # from centroid 0 than 0 does -> keep rule picks... both have
        # identical cent_sim (same direction), so tiebreak keeps min
        # id. 2 is a distinct x-family doc with LOWER cent_sim than
        # any dup member but not a duplicate -> stays its own keeper.
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [2.0, 0.0, 0.0, 0.0]),       # same direction as 0
            (2, [0.8, 0.0, 0.6, 0.0]),       # x-family, not a dup of 0/1
            (3, [0.0, 1.0, 0.0, 0.0]),       # y-family singleton
        ]
        got = {
            r["vec_id"]: (r["cell"], r["keep_id"])
            for r in D.semdedup(self._df(spark, rows), self.C, tau=0.95).collect()
        }
        assert got == {0: (0, 0), 1: (0, 0), 2: (0, 2), 3: (1, 3)}

    def test_keep_rule_prefers_low_cent_sim(self, spark):
        # duplicate pair straddling cent_sim: 1 is slightly off-axis
        # (lower cosine to centroid 0) but still >= tau-similar to 0;
        # the SemDeDup keep rule retains the LOW-cent_sim member (1)
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.1, 0.0, 0.0]),
        ]
        got = {
            r["vec_id"]: r["keep_id"]
            for r in D.semdedup(self._df(spark, rows), self.C, tau=0.99).collect()
        }
        assert got == {0: 1, 1: 1}

    def test_transitive_component_single_keeper(self, spark):
        # chain a~b, b~c where a!~c directly: connected components must
        # still assign ONE keeper to all three
        a = np.array([1.0, 0.0, 0.0, 0.0])
        rot = np.array([np.cos(0.25), np.sin(0.25), 0.0, 0.0])
        rot2 = np.array([np.cos(0.5), np.sin(0.5), 0.0, 0.0])
        # cos(a,rot)=cos(.25)~.969, cos(rot,rot2)=cos(.25), cos(a,rot2)=cos(.5)~.878
        rows = [(0, a), (1, rot), (2, rot2)]
        out = D.semdedup(self._df(spark, rows), self.C, tau=0.95).collect()
        keeps = {r["keep_id"] for r in out}
        assert len(keeps) == 1, f"chain must form one component: {out}"
        # keeper = farthest from centroid = rot2 (lowest cent_sim)
        assert keeps == {2}

    def test_max_cell_passthrough(self, spark):
        # a cell above max_cell passes through undeduped (quadratic
        # guard), others still dedup
        rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)]  # 5 dups, cell 0
        rows += [(10, [0.0, 1.0, 0.0, 0.0]), (11, [0.0, 2.0, 0.0, 0.0])]
        got = {
            r["vec_id"]: r["keep_id"]
            for r in D.semdedup(
                self._df(spark, rows), self.C, tau=0.95,
                max_cell=4, log_dropped=False,
            ).collect()
        }
        assert all(got[i] == i for i in range(5)), "hot cell must pass through"
        assert got[10] == 10 and got[11] == 10, "cold cell still dedups"

    def test_idempotent_on_kept_rows(self, spark, embeddings):
        # components are maximal -> rerunning semdedup on the kept set
        # drops nothing (the paper's fixed-point property)
        from pyspark.sql import functions as F

        emb = embeddings.select("vec_id", "embedding")
        Cfull = np.array(
            [r["embedding"] for r in
             emb.where("vec_id < 4").orderBy("vec_id").collect()],
            dtype=np.float64,
        )
        first = D.semdedup(emb, Cfull, tau=0.35).cache()
        kept_ids = {r["vec_id"] for r in first.where("vec_id = keep_id").collect()}
        assert 0 < len(kept_ids) < first.count()
        kept = emb.where(F.col("vec_id").isin(list(kept_ids)))
        second = D.semdedup(kept, Cfull, tau=0.35)
        assert second.where("vec_id != keep_id").count() == 0
        first.unpersist()


class TestSimilarity:
    def test_brute_force_matches_numpy(self, embeddings):
        rows = embeddings.collect()
        q = rows[0]["embedding"]
        got = SIM.brute_force_topk(embeddings, q, k=5).collect()
        X = np.array([r["embedding"] for r in rows], dtype=np.float64)
        qv = np.array(q, dtype=np.float64)
        cos = (X @ qv) / (np.linalg.norm(X, axis=1) * np.linalg.norm(qv))
        ids = np.array([r["vec_id"] for r in rows])
        order = np.lexsort((ids, -np.round(cos, 6)))[:5]
        assert [r["vec_id"] for r in got] == ids[order].tolist()

    def test_ivf_recall_vs_brute(self, embeddings):
        rows = embeddings.collect()
        q = rows[3]["embedding"]
        cent = SIM.train_centroids(embeddings, n_cells=8, sample=256)
        celled = SIM.assign_cells(embeddings, cent).cache()
        approx = set(
            r["vec_id"] for r in SIM.ivf_topk(celled, cent, q, k=10, n_probe=4).collect()
        )
        exact = set(r["vec_id"] for r in SIM.brute_force_topk(embeddings, q, k=10).collect())
        # recall@10 with half the cells probed should be high
        assert len(approx & exact) >= 6

    def test_ivf_recall_at_100_probe_4_of_32_sf01(self, spark):
        """Distributed quantizer (round-2): recall@100 with 4/32 probes
        at sf0.1. The driver's synthetic embeddings are nearly
        unclustered (within-label mean cosine ~0.07), so absolute
        recall is data-capped ~0.3 for ANY quantizer (measured: the
        round-1 first-partitions quantizer scored the same); the pin is
        >= 2x the random-probe baseline (4/32 = 0.125) and stability
        across queries."""
        emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        cent = SIM.train_centroids(emb, n_cells=32, sample=4096)
        assert cent.shape == (32, 64)
        celled = SIM.assign_cells(emb, cent).cache()
        recalls = []
        for qid in (3, 123, 999):
            q = emb.where(f"vec_id = {qid}").first()["embedding"]
            approx = {
                r["vec_id"]
                for r in SIM.ivf_topk(celled, cent, q, k=100, n_probe=4).collect()
            }
            exact = {
                r["vec_id"]
                for r in SIM.brute_force_topk(emb, q, k=100).collect()
            }
            recalls.append(len(approx & exact) / 100)
        assert min(recalls) >= 0.25, recalls  # 2x the 0.125 random baseline

    def test_ivf_full_probe_equals_brute(self, embeddings):
        rows = embeddings.collect()
        q = rows[7]["embedding"]
        cent = SIM.train_centroids(embeddings, n_cells=4, sample=256)
        celled = SIM.assign_cells(embeddings, cent)
        approx = [r["vec_id"] for r in SIM.ivf_topk(celled, cent, q, k=10, n_probe=4).collect()]
        exact = [r["vec_id"] for r in SIM.brute_force_topk(embeddings, q, k=10).collect()]
        assert approx == exact  # probing ALL cells == exact

    def test_zero_norm_vector_scores_zero_not_crash(self, spark):
        # ANSI mode (Spark 4 default) raises DIVIDE_BY_ZERO on an
        # unguarded cosine denominator; a zero-norm embedding (or query)
        # must score 0.0 and sort last, matching ivf_topk's floor
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.6, 0.8])],
            "vec_id long, embedding array<float>",
        )
        got = SIM.brute_force_topk(emb, [1.0, 0.0], k=3).collect()
        assert [r["vec_id"] for r in got] == [0, 2, 1]
        assert got[0]["cosine"] == 1.0
        assert got[2]["cosine"] == 0.0  # zero-norm row: floored, not NULL/crash
        # zero query vector: every score 0.0, doc_id-asc tiebreak
        got = SIM.brute_force_topk(emb, [0.0, 0.0], k=3).collect()
        assert [r["vec_id"] for r in got] == [0, 1, 2]
        assert all(r["cosine"] == 0.0 for r in got)

    def test_train_centroids_tiny_sample_never_empty(self, embeddings):
        # sample=1 on a larger table: Bernoulli sampling returns 0 rows
        # with high probability — the fallback slice must keep init
        # non-empty instead of crashing on an empty centroid array
        cent = SIM.train_centroids(embeddings, n_cells=4, sample=1)
        assert cent.shape[0] >= 1 and np.isfinite(cent).all()


class TestTextOps:
    def test_lang_id(self, spark):
        df = spark.createDataFrame(
            [(0, "the quick brown fox and the lazy dog run fast"),
             (1, "日本語のテキストです漢字がたくさんあります"),
             (2, "النص العربي هنا"),
             (3, "Русский текст здесь"),
             (4, "12345 67890 !!!")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["lang_guess"] for r in TX.lang_id(df).collect()}
        assert got[0] == "en" and got[1] == "cjk" and got[2] == "ar"
        assert got[3] == "ru" and got[4] == "other"

    def test_quality_scores_ranges(self, documents):
        out = TX.quality_scores(documents.limit(50)).collect()
        for r in out:
            assert 0 <= r["quality"] <= 1.0001
            assert r["n_ws_tokens"] > 0

    def test_token_counts(self, spark):
        df = spark.createDataFrame(
            [(0, "hello world"), (1, "don't stop 123!"), (2, "")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"]) for r in
               TX.token_counts(df).collect()}
        assert got[0] == (2, 2)
        assert got[1][0] == 3 and got[1][1] >= 4  # don|'t| stop| 123|!
        assert got[2][0] == 0

    def test_quality_and_token_counts_compose(self, spark):
        # both ops emit n_ws_tokens from the ONE shared definition; the
        # second op must not add a duplicate (ambiguous) column
        df = spark.createDataFrame(
            [(0, "hello world"), (1, "")], "doc_id long, text string"
        )
        both = TX.token_counts(TX.quality_scores(df))
        assert both.columns.count("n_ws_tokens") == 1
        rows = {r["doc_id"]: r for r in both.collect()}
        assert rows[0]["n_ws_tokens"] == 2 and rows[1]["n_ws_tokens"] == 0
        rev = TX.quality_scores(TX.token_counts(df))
        assert rev.columns.count("n_ws_tokens") == 1
        rev.collect()  # no AnalysisException

    def test_fingerprints_deterministic_and_copy_detect(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        df = spark.createDataFrame(
            [(0, base), (1, base + " with a tiny suffix appended"), (2, "entirely unrelated content words only")],
            "doc_id long, text string",
        )
        assert TX.rolling_fingerprints(base) == TX.rolling_fingerprints(base)
        pairs = TX.fingerprint_overlap_pairs(df, min_common=1).collect()
        keys = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 1) in keys and (0, 2) not in keys


class TestMultimodal:
    def test_feature_extraction_shapes(self, spark):
        # decode="fake" pinned: synth payloads are random bytes, not
        # image files (the real Pillow path is tested separately)
        media = synth_media(spark, n=12)
        feats = extract_features(media, feature_dim=16, decode="fake").collect()
        assert len(feats) == 12
        for r in feats:
            assert len(r["feature"]) == 16
            assert r["n_bytes"] > 0
            norm = float(np.linalg.norm(r["feature"]))
            assert abs(norm - 1.0) < 1e-3

    def test_deterministic(self, spark):
        media = synth_media(spark, n=6)
        a = {r["media_id"]: r["feature"]
             for r in extract_features(media, decode="fake").collect()}
        b = {r["media_id"]: r["feature"]
             for r in extract_features(media, decode="fake").collect()}
        assert a == b

    def test_real_decode_with_pillow(self, spark):
        # extras-gated: runs wherever Pillow is installed; the decode
        # must round-trip a real PNG's pixel values
        PIL = pytest.importorskip("PIL.Image")
        import io

        from xf_spark.ops.multimodal import _decode_image

        arr = (np.arange(8 * 8 * 3, dtype=np.uint8)).reshape(8, 8, 3)
        buf = io.BytesIO()
        PIL.fromarray(arr).save(buf, format="PNG")
        got = _decode_image(buf.getvalue(), 8, 8, mode="real")
        assert np.array_equal(got, arr)

    def test_auto_decode_falls_back_on_non_image_payload(self, monkeypatch):
        # auto mode on a Pillow-equipped host must NOT crash on a
        # payload that isn't a decodable image (the synthetic corpus,
        # or a corrupt row in a real one) — it falls back per row to
        # the deterministic fake. Simulated Pillow: open() rejects the
        # buffer the way PIL.UnidentifiedImageError would.
        from xf_spark.ops import multimodal

        class _FakePIL:
            @staticmethod
            def open(_buf):
                raise ValueError("cannot identify image file")

        monkeypatch.setattr(multimodal, "_PILImage", _FakePIL)
        got = multimodal._decode_image(b"not an image", 4, 4, mode="auto")
        want = multimodal._decode_image(b"not an image", 4, 4, mode="fake")
        assert np.array_equal(got, want)
        # mode="real" still surfaces the decode error
        with pytest.raises(ValueError):
            multimodal._decode_image(b"not an image", 4, 4, mode="real")

    def test_real_decode_requires_pillow(self):
        from xf_spark.ops import multimodal

        if multimodal._PILImage is None:
            with pytest.raises(NotImplementedError):
                multimodal._decode_image(b"xx", 4, 4, mode="real")

    def test_frame_sample_plan(self, spark):
        media = synth_media(spark, n=9)
        plan = frame_sample_plan(media, every_ms=1000).collect()
        vids = {r["media_id"]: r for r in media.where("kind='video'").collect()}
        import collections

        per = collections.Counter(r["media_id"] for r in plan)
        for mid, n in per.items():
            dur = vids[mid]["meta"]["duration_ms"]
            assert n == (dur - 1) // 1000 + 1


class TestThreadReconstruction:
    """get_thread vs the reference recursive-CTE semantics
    (storage.rs:1518-1562): ancestors -> root -> descendants."""

    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "id long, parent_id long, ts long")

    def test_branching_thread(self, spark):
        # 1 <- 2 <- 3 ; 1 <- 4 (branch) ; 9 isolated
        edges = self._edges(
            spark,
            [(1, None, 10), (2, 1, 20), (3, 2, 30), (4, 1, 40), (9, None, 90)],
        )
        from xf_spark.ops.graph import get_thread

        got = [r["id"] for r in get_thread(edges, 3, order_col="ts").collect()]
        assert got == [1, 2, 3, 4]
        # from a leaf on the other branch: same thread
        got = [r["id"] for r in get_thread(edges, 4, order_col="ts").collect()]
        assert got == [1, 2, 3, 4]

    def test_orphan_parent_is_root(self, spark):
        # 5's parent 99 is absent from the table -> 5 is the root
        edges = self._edges(spark, [(5, 99, 10), (6, 5, 20)])
        from xf_spark.ops.graph import get_thread

        got = [r["id"] for r in get_thread(edges, 6, order_col="ts").collect()]
        assert got == [5, 6]

    def test_depth_cap(self, spark):
        # chain 0 <- 1 <- ... <- 12, cap depth at 3: ancestors stop
        rows = [(i, i - 1 if i else None, i) for i in range(13)]
        edges = self._edges(spark, rows)
        from xf_spark.ops.graph import ancestor_ids

        anc = ancestor_ids(edges, 12, max_depth=3)
        assert [a[0] for a in anc] == [12, 11, 10, 9]

    def test_isolated_node(self, spark):
        edges = self._edges(spark, [(1, None, 10), (2, 1, 20)])
        from xf_spark.ops.graph import get_thread

        got = [r["id"] for r in get_thread(edges, 999, order_col="ts").collect()]
        assert got == []


class TestCurateCorpus:
    """curate_corpus composes the oracled ops; these pin the report
    arithmetic and the keep-set semantics per stage combination (the
    driver entries curate_report / curate_kept_sample replay the
    quality+exact chain in SQL)."""

    def test_exact_chain_report_consistent(self, documents):
        from xf_spark.ops.curate import curate_corpus

        kept, report = curate_corpus(documents, min_quality=0.6)
        r = report.collect()[0]
        assert r["n_input"] == documents.count()
        assert (
            r["n_input"] - r["n_quality_dropped"] - r["n_dup_dropped"]
            == r["n_kept"]
        )
        assert r["n_kept"] == kept.count()
        assert 0 < r["n_kept"] < r["n_input"]
        assert kept.columns == documents.columns

    def test_no_gate_no_dedup_is_identity(self, documents):
        from xf_spark.ops.curate import curate_corpus

        kept, report = curate_corpus(documents, dedup=None)
        r = report.collect()[0]
        assert r["n_quality_dropped"] == 0 and r["n_dup_dropped"] == 0
        assert r["n_kept"] == documents.count() == kept.count()

    def test_minhash_chain_keeps_component_minima(self, spark):
        from xf_spark.ops.curate import curate_corpus

        base = "the quick brown fox jumps over the lazy dog " * 6
        rows = [
            (0, base),
            (1, base + "alpha"),          # near-dup of 0
            (2, base + "alpha beta"),     # near-dup of 0 and 1
            (3, "completely different text about rust and spark " * 6),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        kept, report = curate_corpus(docs, dedup="minhash", dedup_threshold=0.7)
        ids = sorted(r["doc_id"] for r in kept.collect())
        assert ids == [0, 3]
        r = report.collect()[0]
        assert r["n_dup_dropped"] == 2 and r["n_quality_dropped"] == 0

    def test_unknown_method_raises(self, documents):
        from xf_spark.ops.curate import curate_corpus

        with pytest.raises(ValueError):
            curate_corpus(documents, dedup="fuzzy")


class TestDecontaminate:
    """ops/decontam.py: n-gram eval-set decontamination vs a pure-
    Python recomputation (the driver entries decontam_overlap /
    decontam_report add the DuckDB third-engine replay)."""

    @staticmethod
    def _py_overlap(corpus_rows, ref_rows, n):
        from xf_spark.functions.textcore import tokenize

        def grams(t):
            toks = tokenize(t or "")
            return {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }

        ref = set()
        for _, t in ref_rows:
            ref |= grams(t)
        return {
            d: len(grams(t) & ref)
            for d, t in corpus_rows
            if grams(t) & ref
        }

    def test_overlap_matches_python(self, documents):
        from xf_spark.ops.decontam import contamination_overlap

        docs = documents.select("doc_id", "text")
        corpus = docs.where("doc_id % 5 != 0")
        ref = docs.where("doc_id % 5 == 0")
        got = {
            r["doc_id"]: r["n_overlap"]
            for r in contamination_overlap(corpus, ref, n=8).collect()
        }
        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        want = self._py_overlap(
            [x for x in rows if x[0] % 5 != 0],
            [x for x in rows if x[0] % 5 == 0],
            8,
        )
        assert got == want and got  # nonempty on the synthetic corpus

    def test_broadcast_and_shuffle_paths_agree(self, documents):
        from xf_spark.ops.decontam import contamination_overlap

        docs = documents.select("doc_id", "text").where("doc_id < 150")
        corpus = docs.where("doc_id % 3 != 0")
        ref = docs.where("doc_id % 3 == 0")
        a = contamination_overlap(corpus, ref, n=5, broadcast_ref=True)
        b = contamination_overlap(corpus, ref, n=5, broadcast_ref=False)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_decontaminate_partitions_corpus(self, documents):
        from xf_spark.ops.decontam import decontaminate

        docs = documents.select("doc_id", "text")
        corpus = docs.where("doc_id % 5 != 0")
        ref = docs.where("doc_id % 5 == 0")
        kept, flagged = decontaminate(corpus, ref, n=8)
        n_c, n_k, n_f = corpus.count(), kept.count(), flagged.count()
        assert n_f > 0 and n_k + n_f == n_c
        kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        assert kept_ids.isdisjoint(
            {r["doc_id"] for r in flagged.select("doc_id").collect()}
        )
        assert kept.columns == corpus.columns

    def test_min_overlap_threshold(self, documents):
        from xf_spark.ops.decontam import contamination_overlap, decontaminate

        docs = documents.select("doc_id", "text")
        corpus = docs.where("doc_id % 5 != 0")
        ref = docs.where("doc_id % 5 == 0")
        ov = {
            r["doc_id"]: r["n_overlap"]
            for r in contamination_overlap(corpus, ref, n=8).collect()
        }
        hi = max(ov.values())
        _, flagged = decontaminate(corpus, ref, n=8, min_overlap=hi)
        got = {r["doc_id"] for r in flagged.collect()}
        assert got == {d for d, c in ov.items() if c >= hi} and got

    def test_short_docs_never_flagged(self, spark):
        from xf_spark.ops.decontam import decontaminate

        rows = [(0, "alpha beta gamma"), (1, "alpha beta gamma delta")]
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        ref = spark.createDataFrame(
            [(9, "alpha beta gamma delta epsilon")],
            "doc_id long, text string",
        )
        kept, flagged = decontaminate(corpus, ref, n=5)
        assert flagged.count() == 0 and kept.count() == 2


class TestDuplicateWindowSpans:
    """ops/dedup.py::duplicate_window_spans — ExactSubstr-style stats
    (the driver entry dup_span_report adds the DuckDB replay); these
    pin the span-union arithmetic against a pure-Python model."""

    @staticmethod
    def _rows(df):
        return {
            r["doc_id"]: (r["n_tokens"], r["n_dup_windows"], r["dup_tokens"])
            for r in df.collect()
        }

    def test_cross_doc_overlapping_union(self, spark):
        # two docs share a 25-token run -> 6 windows each (win=20),
        # overlapping; union per doc = 25 tokens, not 6*20.
        shared = " ".join(f"s{i}" for i in range(25))
        rows = [
            (0, shared + " " + " ".join(f"a{i}" for i in range(10))),
            (1, shared + " " + " ".join(f"b{i}" for i in range(10))),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = self._rows(D.duplicate_window_spans(docs, win=20))
        assert got == {0: (35, 6, 25), 1: (35, 6, 25)}

    def test_within_doc_repeat_disjoint_spans(self, spark):
        # block A (20) + 20 distinct fillers + block A again: the two
        # A-windows share a hash; spans [0,20) and [40,60) -> 40.
        a = " ".join(f"x{i}" for i in range(20))
        filler = " ".join(f"f{i}" for i in range(20))
        docs = spark.createDataFrame(
            [(7, f"{a} {filler} {a}")], "doc_id long, text string"
        )
        got = self._rows(D.duplicate_window_spans(docs, win=20))
        assert got == {7: (60, 2, 40)}

    def test_unique_and_short_docs_zero(self, spark):
        rows = [
            (0, " ".join(f"u{i}" for i in range(30))),   # unique, long
            (1, "too short to window"),                   # < win tokens
            (2, ""),                                      # empty
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = self._rows(D.duplicate_window_spans(docs, win=20))
        assert got == {0: (30, 0, 0), 1: (4, 0, 0), 2: (0, 0, 0)}

    def test_matches_python_model_on_documents(self, documents):
        import collections

        win = 10
        docs = documents.select("doc_id", "text").where("doc_id % 3 = 0")
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        counts = collections.Counter()
        wins = {}
        for d, t in texts.items():
            toks = t.strip().lower().split() if t.strip() else []
            ws = [
                " ".join(toks[i : i + win])
                for i in range(len(toks) - win + 1)
            ]
            wins[d] = (len(toks), ws)
            counts.update(ws)
        want = {}
        for d, (n, ws) in wins.items():
            pos = [i for i, w in enumerate(ws) if counts[w] >= 2]
            union = 0
            for i, p in enumerate(pos):
                union += win if i == 0 else min(win, p - pos[i - 1])
            want[d] = (n, len(pos), union)
        got = self._rows(D.duplicate_window_spans(docs, win=win))
        assert got == want


class TestExciseDuplicateSpans:
    """ops/dedup.py::excise_duplicate_spans — the actual ExactSubstr
    cut (driver entry dup_span_excise adds the DuckDB replay)."""

    def test_within_doc_repeat_cut(self, spark):
        a = " ".join(f"x{i}" for i in range(20))
        filler = " ".join(f"f{i}" for i in range(20))
        docs = spark.createDataFrame(
            [(7, f"{a} {filler} {a}")], "doc_id long, text string"
        )
        r = D.excise_duplicate_spans(docs, win=20).collect()[0]
        assert (r["n_tokens"], r["n_kept"]) == (60, 20)
        assert r["text_clean"] == filler

    def test_case_preserved_hash_case_folded(self, spark):
        # duplicate detected across case variants (hash lowercases),
        # but surviving tokens keep their original case
        shared = " ".join(f"S{i}" for i in range(20))
        rows = [
            (0, shared + " KeepMe extra tail tokens here now"),
            (1, shared.lower() + " other tail"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text_clean"]
            for r in D.excise_duplicate_spans(docs, win=20).collect()
        }
        assert got[0] == "KeepMe extra tail tokens here now"
        assert got[1] == "other tail"

    def test_report_excise_invariant_on_documents(self, documents):
        # union-of-dup-windows size == tokens removed by the cut
        docs = documents.select("doc_id", "text")
        rep = {
            r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
            for r in D.duplicate_window_spans(docs, win=10).collect()
        }
        cut = {
            r["doc_id"]: (r["n_tokens"], r["n_kept"])
            for r in D.excise_duplicate_spans(docs, win=10).collect()
        }
        assert rep.keys() == cut.keys()
        for d, (n, dup) in rep.items():
            cn, kept = cut[d]
            assert cn == n and n - kept == dup, d
        assert any(dup > 0 for _, dup in rep.values())


class TestKnnGraph:
    """ops/similarity.py::knn_graph — IVF-celled cogroup kNN join
    (driver entry knn_graph_full_probe adds the DuckDB cross-join
    replay of the exact mode)."""

    @staticmethod
    def _brute(vecs, qids, k):
        ids = sorted(vecs)
        want = {}
        for qid in qids:
            q = np.asarray(vecs[qid], dtype=np.float64)
            q /= max(np.linalg.norm(q), 1e-12)
            scored = []
            for i in ids:
                if i == qid:
                    continue
                v = np.asarray(vecs[i], dtype=np.float64)
                v /= max(np.linalg.norm(v), 1e-12)
                scored.append((round(float(q @ v), 5), i))
            scored.sort(key=lambda t: (-t[0], t[1]))
            want[qid] = [i for _, i in scored[:k]]
        return want

    def test_full_probe_matches_brute_force(self, embeddings):
        vecs = {
            r["vec_id"]: r["embedding"]
            for r in embeddings.select("vec_id", "embedding").collect()
        }
        got = {}
        res = SIM.knn_graph(
            embeddings.select("vec_id", "embedding"), k=3, n_cells=4
        ).collect()
        for r in sorted(res, key=lambda r: (r["vec_id"], r["rank"])):
            got.setdefault(r["vec_id"], []).append(r["nb_id"])
        assert got == self._brute(vecs, sorted(vecs), 3)

    def test_probe_subset_recall(self, embeddings):
        emb = embeddings.select("vec_id", "embedding")
        vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
        exact = self._brute(vecs, sorted(vecs), 3)
        res = SIM.knn_graph(emb, k=3, n_cells=4, n_probe=2).collect()
        got = {}
        for r in res:
            got.setdefault(r["vec_id"], set()).add(r["nb_id"])
        hits = sum(
            len(got.get(q, set()) & set(nbs)) for q, nbs in exact.items()
        )
        total = sum(len(nbs) for nbs in exact.values())
        # 2 of 4 cells probed: clustered data keeps most true
        # neighbors in the query's nearest cells
        assert hits / total >= 0.6

    def test_duplicate_vector_tiebreak(self, spark):
        # three identical vectors: cosine 1.0 ties -> neighbor id asc
        rows = [
            (0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0]),
            (3, [0.0, 1.0]),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        res = SIM.knn_graph(emb, k=2, n_cells=2).collect()
        got = {
            (r["vec_id"], r["rank"]): r["nb_id"]
            for r in res
        }
        assert got[(0, 1)] == 1 and got[(0, 2)] == 2
        assert got[(1, 1)] == 0 and got[(1, 2)] == 2
        assert got[(2, 1)] == 0 and got[(2, 2)] == 1


class TestFingerprintHotBucketCap:
    """Round-3: the same quadratic guard for the winnowed-fingerprint
    self-join — one boilerplate window shared by m docs is one hot
    fingerprint bucket emitting ~m^2/2 pairs uncapped."""

    def _df(self, spark):
        boiler = (
            "standard disclaimer text repeated across every document "
            "body for compliance reasons"
        )
        distinct = (
            "one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen"
        )
        rows = [(i, boiler) for i in range(500)]
        rows += [(1000, distinct), (1001, distinct)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hot_fingerprint_dropped_distinct_pairs_kept(self, spark):
        df = self._df(spark)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in TX.fingerprint_overlap_pairs(
                df, min_common=1, max_bucket=50
            ).collect()
        }
        assert (1000, 1001) in pairs
        assert not any(a < 500 and b < 500 for a, b in pairs)
        assert len(pairs) < 100

    def test_uncapped_is_quadratic_baseline(self, spark):
        df = self._df(spark)
        n = (
            TX.fingerprint_overlap_pairs(df, min_common=1, max_bucket=None)
            .count()
        )
        assert n >= 500 * 499 / 2
