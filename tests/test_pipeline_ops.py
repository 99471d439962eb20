"""Unit tests for ops/pipeline.py: PII redaction, repetition stats,
deterministic mixture sampling, and sequence packing — hand-computed
expectations plus the properties that matter at scale (determinism,
sample monotonicity, bucket-count invariance of the prefix sum)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xf_spark.ops.pipeline import (
    chunk_split,
    mixture_sample,
    pack_chunks,
    pack_summary,
    pii_redact,
    repetition_stats,
    unigram_logprob_scores,
)


class TestPiiRedact:
    def test_counts_and_redaction(self, spark):
        df = spark.createDataFrame(
            [
                (0, "mail a@b.com or x.y+z@sub.example.org then 10.0.0.1 "
                    "call 415-555-1234 acct 123456789"),
                (1, "no pii here"),
                (2, ""),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in pii_redact(df).collect()}
        r0 = rows[0]
        assert (r0["n_emails"], r0["n_ips"], r0["n_phones"], r0["n_long_ids"]) == (
            2, 1, 1, 1,
        )
        assert r0["clean_text"] == (
            "mail <EMAIL> or <EMAIL> then <IP> call <PHONE> acct <ID>"
        )
        assert rows[1]["clean_text"] == "no pii here"
        assert rows[2]["n_emails"] == 0 and rows[2]["clean_text"] == ""

    def test_ip_redacted_before_phone_cannot_double_count(self, spark):
        df = spark.createDataFrame([(0, "server 192.168.100.200 up")],
                                   "doc_id long, text string")
        r = pii_redact(df).first()
        assert r["n_ips"] == 1 and r["n_phones"] == 0
        assert "<IP>" in r["clean_text"]


class TestRepetitionStats:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [
                (0, "a b a b a b"),          # grams: 3x 'a b', 2x 'b a' of 5
                (1, "x\nx\n y \nz"),          # 4 lines, 3 distinct
                (2, "single"),                # <2 tokens
                (3, ""),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
        assert rows[0]["top_bigram_frac"] == pytest.approx(0.6)
        assert rows[0]["dup_line_frac"] == 0.0
        assert rows[1]["dup_line_frac"] == pytest.approx(0.25)
        assert rows[2]["top_bigram_frac"] == 0.0
        assert rows[3]["dup_line_frac"] == 0.0
        assert rows[3]["top_bigram_frac"] == 0.0


class TestMixtureSample:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "fr", f"text number {i}") for i in range(200)],
            "doc_id long, lang string, text string",
        )

    def test_rate_one_keeps_all_rate_zero_drops_stratum(self, spark):
        docs = self._docs(spark)
        assert mixture_sample(docs, rates={}).count() == 200
        kept = mixture_sample(docs, rates={"en": 0.0}).select("lang").distinct().collect()
        assert [r["lang"] for r in kept] == ["fr"]

    def test_deterministic_and_monotone(self, spark):
        docs = self._docs(spark)
        k30 = {r["doc_id"] for r in mixture_sample(docs, rates={"en": 0.3, "fr": 0.3}).collect()}
        k30b = {r["doc_id"] for r in mixture_sample(docs, rates={"en": 0.3, "fr": 0.3}).collect()}
        k60 = {r["doc_id"] for r in mixture_sample(docs, rates={"en": 0.6, "fr": 0.6}).collect()}
        assert k30 == k30b          # no RNG anywhere
        assert k30 <= k60           # raising a rate only ADDS docs
        assert 0 < len(k30) < len(k60) < 200


PACK_DOCS = [
    (0, "a b c"),        # 3 tokens
    (1, ""),             # 0
    (2, "a b c d e"),    # 5
    (3, "x y"),          # 2
    (4, "p q r s"),      # 4
]


class TestPackChunks:
    def test_hand_computed_spans(self, spark):
        docs = spark.createDataFrame(PACK_DOCS, "doc_id long, text string")
        out = {r["doc_id"]: r for r in pack_chunks(docs, seq_len=4, n_buckets=3).collect()}
        assert [out[i]["start_off"] for i in range(5)] == [0, 3, 3, 8, 10]
        assert [out[i]["chunk_first"] for i in range(5)] == [0, 0, 0, 2, 2]
        assert [out[i]["chunk_last"] for i in range(5)] == [0, 0, 1, 2, 3]

    def test_bucket_count_invariance(self, spark):
        # the two-pass prefix sum must not depend on how ids bucket
        docs = spark.createDataFrame(
            [(i * 7 % 97, f"tok {'x ' * (i % 5)}") for i in range(60)],
            "doc_id long, text string",
        ).dropDuplicates(["doc_id"])
        a = sorted(pack_chunks(docs, seq_len=8, n_buckets=2).collect())
        b = sorted(pack_chunks(docs, seq_len=8, n_buckets=17).collect())
        assert a == b

    def test_summary(self, spark):
        docs = spark.createDataFrame(PACK_DOCS, "doc_id long, text string")
        s = pack_summary(pack_chunks(docs, seq_len=4, n_buckets=3), seq_len=4).first()
        assert (s["n_docs"], s["n_tokens"], s["n_chunks"]) == (5, 14, 4)
        assert s["n_straddling"] == 2   # docs 2 and 4 cross a boundary
        assert s["last_fill"] == pytest.approx(0.5)

    def test_empty_input(self, spark):
        docs = spark.createDataFrame([], "doc_id long, text string")
        assert pack_chunks(docs, seq_len=4).count() == 0
        s = pack_summary(pack_chunks(docs, seq_len=4), seq_len=4).first()
        assert (s["n_docs"], s["n_tokens"], s["n_chunks"], s["last_fill"]) == (
            0, 0, 0, 0.0,
        )


class TestChunkSplit:
    def test_hand_computed_windows(self, spark):
        text = " ".join(f"t{i}" for i in range(10))
        docs = spark.createDataFrame([(0, text), (1, "a"), (2, "")],
                                     "doc_id long, text string")
        out = chunk_split(docs, chunk_tokens=4, stride=3).collect()
        by_doc = {}
        for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
            by_doc.setdefault(r["doc_id"], []).append(r)
        # 10 tokens, chunk 4 stride 3 -> windows at 0,3,6 (last = 4 toks)
        assert [r["chunk_text"] for r in by_doc[0]] == [
            "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
        ]
        assert [r["n_chunk_tokens"] for r in by_doc[0]] == [4, 4, 4]
        assert [r["chunk_text"] for r in by_doc[1]] == ["a"]
        assert 2 not in by_doc  # zero-token docs emit nothing

    def test_short_tail_window(self, spark):
        text = " ".join(f"t{i}" for i in range(11))
        docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
        out = sorted(chunk_split(docs, chunk_tokens=4, stride=3).collect(),
                     key=lambda r: r["chunk_idx"])
        assert [r["n_chunk_tokens"] for r in out] == [4, 4, 4, 2]
        assert out[-1]["chunk_text"] == "t9 t10"

    def test_every_token_covered(self, spark):
        docs = spark.createDataFrame(
            [(i, " ".join(f"w{j}" for j in range(1 + i * 7 % 23))) for i in range(12)],
            "doc_id long, text string",
        )
        out = chunk_split(docs, chunk_tokens=5, stride=4).collect()
        seen = {}
        for r in out:
            seen.setdefault(r["doc_id"], set()).update(r["chunk_text"].split(" "))
        for i in range(12):
            n = 1 + i * 7 % 23
            assert seen[i] == {f"w{j}" for j in range(n)}

    def test_is_shuffle_free(self, spark):
        docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        plan = chunk_split(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_invalid_params_raise(self, spark):
        docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_split(docs, chunk_tokens=0)
        with pytest.raises(ValueError):
            chunk_split(docs, stride=0)


class TestUnigramLogprob:
    def test_hand_computed(self, spark):
        import math

        docs = spark.createDataFrame(
            [(0, "a A b"), (1, "b c"), (2, "   ")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in unigram_logprob_scores(docs).collect()}
        # N=5; c(a)=2 (case-folded), c(b)=2, c(c)=1
        assert rows[0]["n_tokens"] == 3
        assert rows[0]["avg_logprob"] == pytest.approx(math.log(0.4), abs=1e-6)
        assert rows[1]["avg_logprob"] == pytest.approx(
            (math.log(0.4) + math.log(0.2)) / 2, abs=1e-6
        )
        assert 2 not in rows  # whitespace-only docs emit nothing

    def test_gibberish_scores_below_common_prose(self, spark):
        common = "the cat sat on the mat and the dog sat too"
        docs = spark.createDataFrame(
            [(i, common) for i in range(20)] + [(99, "zxqv wkjh qqpt zxqv")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob_scores(docs).collect()}
        assert rows[99] < rows[0]


class TestRandomizedDifferential:
    """Seeded randomized sweep: pack_chunks and chunk_split vs
    pure-Python models over irregular corpora (sparse ids, empty and
    whitespace-only docs, multi-space separators) — one Spark round
    trip per op, not per example."""

    def _random_docs(self, rng, n):
        rows = []
        used = set()
        for _ in range(n):
            did = rng.randrange(0, 10_000)
            if did in used:
                continue
            used.add(did)
            k = rng.randrange(0, 12)
            sep = "  " if rng.random() < 0.2 else " "
            text = sep.join(f"w{rng.randrange(0, 9)}" for _ in range(k))
            if rng.random() < 0.1:
                text = "   "
            rows.append((did, text))
        return rows

    def test_pack_chunks_matches_python_model(self, spark):
        import random

        rng = random.Random(421)
        rows = self._random_docs(rng, 120)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in pack_chunks(docs, seq_len=7, n_buckets=5).collect()}
        off = 0
        for did, text in sorted(rows):
            n = len(text.split()) if text.strip() else 0
            r = got[did]
            assert (r["n_ws_tokens"], r["start_off"]) == (n, off), did
            assert r["chunk_first"] == off // 7
            assert r["chunk_last"] == (off + max(n, 1) - 1) // 7
            off += n

    def test_chunk_split_matches_python_model(self, spark):
        import random

        rng = random.Random(97)
        rows = self._random_docs(rng, 80)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in chunk_split(docs, chunk_tokens=5, stride=3).collect():
            got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = (
                r["n_chunk_tokens"], r["chunk_text"],
            )
        for did, text in rows:
            toks = text.split() if text.strip() else []
            if not toks:
                assert did not in got
                continue
            n = len(toks)
            n_chunks = 1 if n <= 5 else 1 + -(-(n - 5) // 3)
            assert set(got[did]) == set(range(n_chunks)), did
            for i in range(n_chunks):
                w = toks[i * 3 : i * 3 + 5]
                assert got[did][i] == (len(w), " ".join(w)), (did, i)


class TestPlanShapes:
    """The narrow ops must stay narrow: no Exchange in the physical
    plan means zero shuffle at any corpus size."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_pii_redact_is_shuffle_free(self, spark):
        docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        assert "Exchange" not in self._plan(pii_redact(docs))

    def test_mixture_sample_is_shuffle_free(self, spark):
        docs = spark.createDataFrame(
            [(0, "en", "x")], "doc_id long, lang string, text string"
        )
        assert "Exchange" not in self._plan(mixture_sample(docs, rates={"en": 0.5}))

    def test_pack_chunks_shuffles_only_by_bucket(self, spark):
        docs = spark.createDataFrame(PACK_DOCS, "doc_id long, text string")
        plan = self._plan(pack_chunks(docs, seq_len=4, n_buckets=3))
        # exactly one shuffle (hashpartitioning on bkt for the window);
        # the bucket-offset side arrives via broadcast, not exchange
        assert plan.count("Exchange hashpartitioning") == 1
        assert "BroadcastExchange" in plan


class TestTrainValSplit:
    """train_val_split: deterministic, group-aware, leakage-safe."""

    def test_group_atomic_and_deterministic(self, spark):
        from xf_spark.ops.pipeline import train_val_split
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        out = train_val_split(tr, val_frac=0.25)
        # leakage-safe: one split value per conversation
        leaks = (
            out.groupBy("conv_id")
            .agg(F.countDistinct("split").alias("k"))
            .where(F.col("k") > 1)
            .count()
        )
        assert leaks == 0
        # deterministic: re-running yields the identical assignment
        a = {r["conv_id"]: r["split"] for r in
             out.select("conv_id", "split").distinct().collect()}
        b = {r["conv_id"]: r["split"] for r in
             train_val_split(tr, val_frac=0.25)
             .select("conv_id", "split").distinct().collect()}
        assert a == b
        # fraction lands near the target at the GROUP level
        n_val = sum(1 for s in a.values() if s == "val")
        assert 0.1 < n_val / len(a) < 0.4
        # a different seed reshuffles membership
        c = {r["conv_id"]: r["split"] for r in
             train_val_split(tr, val_frac=0.25, seed="other")
             .select("conv_id", "split").distinct().collect()}
        assert a != c

    def test_edges_and_validation(self, spark):
        import pytest as _pytest

        from xf_spark.ops.pipeline import train_val_split
        from xf_spark.transcripts import load_transcripts

        tr = load_transcripts(spark, 0.001)
        assert train_val_split(tr, 0.0).where(F.col("split") == "val").count() == 0
        assert train_val_split(tr, 1.0).where(F.col("split") == "train").count() == 0
        with _pytest.raises(ValueError):
            train_val_split(tr, 1.5)


def test_render_conversations_order_and_template(spark):
    from xf_spark.ops.pipeline import render_conversations

    rows = [
        ("c1", 1, "assistant", "world"),
        ("c1", 0, "user", "hello"),
        ("c2", 0, "user", "solo"),
    ]
    tr = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])
    out = {r["conv_id"]: r for r in render_conversations(tr).collect()}
    assert out["c1"]["rendered"] == "user: hello\n\nassistant: world"
    assert out["c1"]["n_turns"] == 2
    assert out["c2"]["rendered"] == "user: solo"
    custom = {r["conv_id"]: r["rendered"] for r in
              render_conversations(tr, sep=" | ", role_sep="> ").collect()}
    assert custom["c1"] == "user> hello | assistant> world"


class TestDsir:
    """DSIR importance resampling vs a pure-Python replay of the
    hashed-bucket LM ratio chain."""

    def _docs(self, spark):
        rows = [
            # target domain: "alpha beta" style
            (0, "alpha beta gamma", "tgt"),
            (1, "alpha beta beta", "tgt"),
            # raw-only domain
            (2, "delta epsilon zeta", "raw"),
            (3, "delta epsilon", "raw"),
            # mixed: shares target grams
            (4, "alpha beta delta", "raw"),
            (5, "   ", "raw"),  # zero grams -> no weight row
        ]
        return spark.createDataFrame(rows, ["doc_id", "text", "source"])

    @staticmethod
    def _py_weights(rows, pred, n_buckets):
        import hashlib
        import math
        import re
        from collections import Counter

        def grams(t):
            t = t.strip().lower()
            if not t:
                return []
            toks = re.split(r"\s+", t)
            return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

        ct, cq = Counter(), Counter()
        for did, text, src in rows:
            for g in grams(text):
                b = bucket(g)
                cq[b] += 1
                if pred(src):
                    ct[b] += 1
        nt = sum(ct.values()) + n_buckets
        nq = sum(cq.values()) + n_buckets
        lr = {
            b: math.log((ct.get(b, 0) + 1) / nt) - math.log((cq[b] + 1) / nq)
            for b in cq
        }
        out = {}
        for did, text, src in rows:
            gs = grams(text)
            if gs:
                out[did] = (len(gs), round(sum(lr[bucket(g)] for g in gs), 6))
        return out

    def test_weights_match_python(self, spark):
        from xf_spark.ops.pipeline import DSIR_BUCKETS, dsir_weights

        docs = self._docs(spark)
        got = {
            r["doc_id"]: (r["n_grams"], r["log_w"])
            for r in dsir_weights(docs, F.col("source") == "tgt").collect()
        }
        rows = [(r["doc_id"], r["text"], r["source"]) for r in docs.collect()]
        want = self._py_weights(rows, lambda s: s == "tgt", DSIR_BUCKETS)
        assert set(got) == set(want)
        for did in want:
            assert got[did][0] == want[did][0]
            assert abs(got[did][1] - want[did][1]) < 1e-9, did

    def test_target_docs_score_higher(self, spark):
        from xf_spark.ops.pipeline import dsir_weights

        docs = self._docs(spark)
        w = {
            r["doc_id"]: r["log_w"]
            for r in dsir_weights(docs, F.col("source") == "tgt").collect()
        }
        # pure target docs outrank pure raw docs; the mixed doc sits
        # between
        assert min(w[0], w[1]) > w[4] > max(w[2], w[3])
        assert 5 not in w  # whitespace-only doc emits nothing

    def test_sample_is_deterministic_topk(self, spark):
        from xf_spark.ops.pipeline import dsir_sample

        docs = self._docs(spark)
        pred = F.col("source") == "tgt"
        a = [(r["doc_id"], r["gumbel_key"]) for r in dsir_sample(docs, pred, k=3).collect()]
        b = [(r["doc_id"], r["gumbel_key"]) for r in dsir_sample(docs, pred, k=3).collect()]
        assert a == b and len(a) == 3
        keys = [k for _, k in a]
        assert keys == sorted(keys, reverse=True)
        # different seed -> (almost surely) different selection order
        c = [r["doc_id"] for r in dsir_sample(docs, pred, k=3, seed="other").collect()]
        assert set(c) <= {0, 1, 2, 3, 4}


class TestSampleTokenBudget:
    """ops/pipeline.py::sample_token_budget (driver entry
    token_budget_sample adds the global-window DuckDB replay)."""

    @staticmethod
    def _docs(spark):
        rows = [(i, " ".join(f"t{i}_{j}" for j in range(5 + i % 7))) for i in range(60)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_minimal_prefix_covers_budget(self, spark):
        import hashlib

        from xf_spark.ops.pipeline import sample_token_budget

        docs = self._docs(spark)
        kept = sample_token_budget(docs, budget_tokens=100).collect()
        total = sum(r["n_tokens"] for r in kept)
        assert total >= 100  # budget reached
        # dropping the LAST doc in md5 order leaves the prefix under
        # budget (the sample is the minimal covering prefix)
        last = max(
            kept,
            key=lambda r: hashlib.md5(f"42{r['doc_id']}".encode()).hexdigest(),
        )
        assert total - last["n_tokens"] < 100

    def test_budget_extremes(self, spark):
        from xf_spark.ops.pipeline import sample_token_budget

        docs = self._docs(spark)
        assert sample_token_budget(docs, 0).count() == 0
        assert sample_token_budget(docs, 10**9).count() == 60

    def test_partition_invariant(self, spark):
        from xf_spark.ops.pipeline import sample_token_budget

        docs = self._docs(spark)
        a = {r["doc_id"] for r in sample_token_budget(docs.repartition(1), 150).collect()}
        b = {r["doc_id"] for r in sample_token_budget(docs.repartition(16), 150).collect()}
        assert a == b and 0 < len(a) < 60

    def test_matches_sequential_model(self, spark):
        import hashlib

        from xf_spark.ops.pipeline import sample_token_budget

        docs = self._docs(spark)
        rows = docs.collect()
        order = sorted(
            rows,
            key=lambda r: (hashlib.md5(f"42{r['doc_id']}".encode()).hexdigest(), r["doc_id"]),
        )
        want, cum = set(), 0
        for r in order:
            n = len(r["text"].split())
            if cum < 200:
                want.add(r["doc_id"])
            cum += n
        got = {r["doc_id"] for r in sample_token_budget(docs, 200).collect()}
        assert got == want


class TestGopherRules:
    def test_signals_and_verdict(self, spark):
        good = "the cat sat to be of and that have with " + " ".join(
            f"word{i} nice" for i in range(30)
        )
        df = spark.createDataFrame(
            [
                (0, good),                                  # passes everything
                (1, "tiny doc"),                            # too few words
                (2, "## " * 40 + "the be to of"),           # symbol + alpha fail
                (3, ""),                                    # empty
                (4, "\n".join("- bullet line" for _ in range(10))
                    + "\nthe be to of and " + "filler " * 60),  # bullet frac
            ],
            "doc_id long, text string",
        )
        from xf_spark.ops.quality import gopher_rules

        out = {
            r["doc_id"]: r
            for r in gopher_rules(df, min_words=20).collect()
        }
        assert out[0]["keep"] is True
        assert out[0]["n_stop_hits"] == 8
        assert out[1]["keep"] is False and out[1]["n_words"] == 2
        assert out[2]["keep"] is False
        assert out[2]["symbol_frac"] > 0.1
        assert out[3]["n_words"] == 0 and out[3]["keep"] is False
        # doc 4: 10 of 11 non-empty lines are bullets -> frac > 0.9
        assert out[4]["bullet_frac"] > 0.9 and out[4]["keep"] is False

    def test_mean_word_len_and_ellipsis(self, spark):
        df = spark.createDataFrame(
            [(0, "aa bb cc\nwell this trails off...\nanother line here...")],
            "doc_id long, text string",
        )
        from xf_spark.ops.quality import gopher_rules

        r = gopher_rules(df).collect()[0]
        # 10 ws tokens: 3 + 4 + 3 (newlines are whitespace to the splitter)
        assert r["n_words"] == 10
        # 2 of 3 non-empty lines end with '...'
        assert abs(r["ellipsis_frac"] - round(2 / 3, 6)) < 1e-9


class TestC4LineFilter:
    def test_line_and_page_rules(self, spark):
        from xf_spark.ops.quality import c4_line_filter

        df = spark.createDataFrame(
            [
                (0, "This sentence is long enough to keep.\n"
                    "Another excellent sentence survives here too!\n"
                    "no terminal punctuation on this line\n"
                    "short.\n"
                    "Please enable JavaScript to continue browsing now."),
                (1, "Fine first sentence stays right here.\n"
                    "Second good one is also kept around.\n"
                    "lorem ipsum dolor sit amet consectetur adipiscing elit."),
                (2, "Only one keepable sentence lives in this doc."),
                (3, "A brace { ruins this page entirely now.\n"
                    "Even though both lines would otherwise be kept."),
                (4, ""),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in c4_line_filter(df, min_kept_lines=2).collect()}
        # doc 0: keeps lines 1+2 (javascript line dropped, short dropped,
        # unterminated dropped)
        assert out[0]["n_lines"] == 5 and out[0]["n_kept_lines"] == 2
        assert out[0]["keep"] is True
        assert out[0]["clean_text"] == (
            "This sentence is long enough to keep.\n"
            "Another excellent sentence survives here too!"
        )
        # doc 1: 3 kept lines but page contains lorem ipsum
        assert out[1]["n_kept_lines"] == 3 and out[1]["keep"] is False
        # doc 2: only 1 kept line < min_kept_lines
        assert out[2]["n_kept_lines"] == 1 and out[2]["keep"] is False
        # doc 3: '{' in page
        assert out[3]["keep"] is False
        # doc 4: empty
        assert out[4]["n_lines"] == 0 and out[4]["keep"] is False
        assert out[4]["clean_text"] == ""
