"""Differential tests: Spark BM25 engine vs pure-NumPy oracle on the
deterministic transcripts table (seed 42, scale 0.001) — the keystone
rank-identity gate (ranks exact, scores 1e-6), mirroring the
reference's recompute-the-answer e2e pattern (tests/cli_e2e.rs:181-292)
over the reference query set (FIXTURES.md §2)."""

from __future__ import annotations

import datetime as dt

import pytest

from xf_spark.index.builder import build_engine
from xf_spark.oracle import OracleIndex
from xf_spark.transcripts import load_transcripts

SCALE = 0.001
TOL = 1e-6

QUERY_SET = [
    ("lexical_machine", "machine", 20),
    ("lexical_machine_100", "machine", 100),
    ("lexical_rust", "rust", 20),
    ("multi_term_or", "rust async patterns", 20),
    ("phrase_ml", '"machine learning"', 20),
    ("bool_and", "rust AND async", 20),
    ("bool_not", "python NOT snake", 20),
    ("prefix", "progr*", 20),
    ("empty_matchall", "", 20),
    ("unicode_cjk", "日本語のテキストも検索できます", 20),
    # beyond-reference query-language extensions (round 3): sloppy
    # phrase, boosted atoms — same rank-identity gate
    ("near_ml_slop2", '"machine learning"~2', 20),
    ("near_ml_slop5", '"machine learning"~5', 100),
    ("near_widening", '"coding rustlang"~3', 50),
    ("boost_or", "machine^2 OR rust", 20),
    ("boost_phrase", '"machine learning"^1.5', 20),
    ("boost_fractional", "machine^0.5 rust", 20),
    # dictionary-resolved atoms (round 3): wildcard, ~d fuzzy syntax,
    # phrase-prefix — engine expands via Spark vocabulary scans, the
    # oracle via fnmatch/Levenshtein over its postings keys; ranks and
    # scores must still match exactly
    ("wildcard_mid", "ma?hine", 20),
    ("wildcard_star", "mach*ne rust", 20),
    ("wildcard_leading", "*earning", 20),
    ("fuzzy_syntax_d1", "machne~1", 20),
    ("fuzzy_syntax_d2", "machne~2", 50),
    ("fuzzy_syntax_bare", "machinz~", 20),
    ("phrase_prefix", '"machine lear*"', 20),
    ("wildcard_boosted", "te?t^2 OR rust", 20),
    ("wildcard_not", "rust NOT lear*ng", 20),
    # unordered window proximity (ES intervals all_of analog)
    ("window_gap3", '"machine learning"~~3', 50),
    ("window_reversed", '"learning machine"~~3', 50),
    ("window_tight", '"coding rustlang"~~0', 50),
]


@pytest.fixture(scope="module")
def built(spark):
    transcripts = load_transcripts(spark, SCALE)
    engine = build_engine(transcripts)
    rows = engine.docs.select("doc_id", "text", "role", "ts").collect()
    oracle = OracleIndex.build([(r["doc_id"], r["text"]) for r in rows])
    attrs = {r["doc_id"]: (r["role"], r["ts"]) for r in rows}
    return engine, oracle, attrs


def _ranks_and_scores(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("name,query,limit", QUERY_SET, ids=[q[0] for q in QUERY_SET])
def test_rank_identity(built, name, query, limit):
    engine, oracle, _ = built
    got = _ranks_and_scores(engine.search(query, limit=limit))
    want = oracle.search(query, limit=limit)
    assert [d for d, _ in got] == [d for d, _ in want], f"rank mismatch for {name}"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), (name, gd, gs, ws)


def test_role_filter(built):
    engine, oracle, attrs = built
    got = _ranks_and_scores(engine.search("rust", limit=20, roles=["assistant"]))
    want = oracle.search(
        "rust", limit=20, doc_filter=lambda d: attrs[d][0] == "assistant"
    )
    assert [d for d, _ in got] == [d for d, _ in want]


def test_date_filter(built):
    engine, oracle, attrs = built
    since = dt.datetime(2023, 1, 1)
    until = dt.datetime(2025, 1, 1)
    got = _ranks_and_scores(
        engine.search("rust", limit=20, since=since, until=until)
    )
    want = oracle.search(
        "rust", limit=20, doc_filter=lambda d: since <= attrs[d][1] <= until
    )
    assert [d for d, _ in got] == [d for d, _ in want]


def test_offset_pagination(built):
    engine, oracle, _ = built
    full = oracle.search("rust", limit=30)
    page = _ranks_and_scores(engine.search("rust", limit=10, offset=10))
    assert [d for d, _ in page] == [d for d, _ in full[10:20]]


def test_min_should_match(built):
    """msm=2 over a 3-term OR: rank-identity vs the oracle evaluating
    the rewritten ("msm", ...) plan; every msm hit matches >= 2 terms
    and scores exactly its matching-terms sum."""
    from xf_spark.query.parser import apply_min_should_match, parse_query

    engine, oracle, _ = built
    q = "rust async machine"
    plan = apply_min_should_match(parse_query(q), 2)
    scored = oracle._eval(plan)
    want = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = _ranks_and_scores(engine.search(q, limit=20, min_should_match=2))
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), (gd, gs, ws)
    # msm=2 hits are a strict subset of the plain OR's match set, and
    # every hit matches >= 2 of the terms
    per_term = {t: oracle._eval(("term", t)) for t in q.split()}
    for d, _s in got:
        assert sum(d in p for p in per_term.values()) >= 2


def test_min_should_match_unsatisfiable(built):
    engine, oracle, _ = built
    assert engine.search("rust", limit=20, min_should_match=2).count() == 0
    assert (
        engine.search("rust async", limit=20, min_should_match=3).count() == 0
    )
    with pytest.raises(ValueError, match="min_should_match"):
        engine.search("rust AND async", limit=20, min_should_match=2)


def test_near_slop_zero_equals_phrase(built):
    engine, _, _ = built
    a = _ranks_and_scores(engine.search('"machine learning"~0', limit=50))
    b = _ranks_and_scores(engine.search('"machine learning"', limit=50))
    assert a == b


def test_near_widens_phrase(built):
    """Slop matches are a superset of exact-phrase matches, and grow
    monotonically with slop."""
    engine, _, _ = built
    phrase = {d for d, _ in _ranks_and_scores(engine.search('"coding rustlang"', limit=1000))}
    near2 = {d for d, _ in _ranks_and_scores(engine.search('"coding rustlang"~2', limit=1000))}
    near5 = {d for d, _ in _ranks_and_scores(engine.search('"coding rustlang"~5', limit=1000))}
    assert phrase <= near2 <= near5
    assert len(near2) > len(phrase)  # fixture corpus has non-adjacent pairs


def test_synonyms_expand_match_set(built):
    """Query-time synonyms: rank-identity vs the oracle with the same
    map, the synonym-expanded match set is a superset of the plain
    one, and a multi-word synonym behaves as a PHRASE (matches its
    exact-phrase result set)."""
    engine, oracle, _ = built
    syn = {"ml": ["machine learning", "ai"], "rust": ["rustlang"]}
    for q in ("ml", "rust systems", "ml AND rust"):
        got = _ranks_and_scores(engine.search(q, limit=30, synonyms=syn))
        want = oracle.search(q, limit=30, synonyms=syn)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), (q, gd, gs, ws)
    plain = {d for d, _ in _ranks_and_scores(engine.search("rust", limit=1000))}
    wide = {
        d
        for d, _ in _ranks_and_scores(
            engine.search("rust", limit=1000, synonyms=syn)
        )
    }
    assert plain <= wide
    # 'ml' is absent from the corpus: with the multi-word synonym the
    # match set IS the exact-phrase match set
    ml = {
        d
        for d, _ in _ranks_and_scores(engine.search("ml", limit=1000, synonyms=syn))
        }
    phrase = {
        d
        for d, _ in _ranks_and_scores(engine.search('"machine learning"', limit=1000))
    }
    ai = {d for d, _ in _ranks_and_scores(engine.search("ai", limit=1000))}
    assert ml == phrase | ai


def test_wildcard_is_dictionary_or(built):
    """A wildcard's result equals the explicit OR of its dictionary
    expansions (the top-terms rewrite contract)."""
    engine, oracle, _ = built
    exps = oracle._dictionary_expand("wildcard", "ma?hine")
    assert exps  # fixture corpus must actually match
    explicit = " OR ".join(exps)
    a = _ranks_and_scores(engine.search("ma?hine", limit=30))
    b = _ranks_and_scores(engine.search(explicit, limit=30))
    assert a == b


def test_fuzzy_syntax_matches_knob(built):
    """term~1 on a single-term query == fuzzy=True on the same query
    (same d=1 vocabulary expansion, same ranking)."""
    engine, _, _ = built
    a = _ranks_and_scores(engine.search("machne~1", limit=30))
    b = _ranks_and_scores(engine.search("machne", limit=30, fuzzy=True))
    assert a == b


def test_fuzzy_distance_validation(built):
    engine, _, _ = built
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fuzzy distance"):
        engine.search("machne~3", limit=5)
    # ~0 is the exact term
    a = _ranks_and_scores(engine.search("machine~0", limit=20))
    b = _ranks_and_scores(engine.search("machine", limit=20))
    assert a == b


def test_window_vs_near_semantics(built):
    """Unordered window vs ordered near on the same pair: the window
    match set contains the in-order near set (same span budget:
    near slop s covers spans up to s+1... window gaps G covers spans
    up to 1+G for two terms), is order-insensitive, and grows with
    G."""
    engine, _, _ = built
    near = {
        d
        for d, _ in _ranks_and_scores(
            engine.search('"machine learning"~2', limit=1000)
        )
    }
    win = {
        d
        for d, _ in _ranks_and_scores(
            engine.search('"machine learning"~~2', limit=1000)
        )
    }
    win_rev = {
        d
        for d, _ in _ranks_and_scores(
            engine.search('"learning machine"~~2', limit=1000)
        )
    }
    win5 = {
        d
        for d, _ in _ranks_and_scores(
            engine.search('"machine learning"~~5', limit=1000)
        )
    }
    # ordered slop-2 allows consecutive gaps in [1,3] -> span <= 3 ==
    # window gaps 2 span bound for two terms; unordered additionally
    # matches reversed occurrences
    assert near <= win
    assert win == win_rev  # order-insensitive
    assert win <= win5


def test_boost_scales_scores(built):
    engine, _, _ = built
    base = dict(_ranks_and_scores(engine.search("machine", limit=50)))
    boosted = dict(_ranks_and_scores(engine.search("machine^2", limit=50)))
    assert set(base) == set(boosted)
    for d, s in base.items():
        assert abs(boosted[d] - 2.0 * s) <= TOL * max(1.0, abs(s))


def test_hydration_preserves_turn_text(built):
    """Per-row invariant (BASELINE.json input_hint): per-turn text
    equality under stable (conv_id, turn_idx) ordering, end-to-end."""
    engine, _, _ = built
    rows = engine.search_hydrated("machine", limit=10).collect()
    base = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in engine.docs.select("conv_id", "turn_idx", "text").collect()
    }
    assert rows
    for r in rows:
        assert r["text"] == base[(r["conv_id"], r["turn_idx"])]


def test_doc_ids_dense_and_ordered(built):
    engine, _, _ = built
    rows = engine.docs.select("doc_id", "conv_id", "turn_idx").collect()
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [r["doc_id"] for r in rows] == list(range(len(rows)))


def test_doc_ids_invariant_under_parallelism(spark):
    """N-vs-4N proxy at the docID layer: partition count must not
    change the assignment."""
    transcripts = load_transcripts(spark, SCALE)
    from xf_spark.index.docs import assign_doc_ids

    a = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_doc_ids(transcripts, num_partitions=2).collect()
    }
    b = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_doc_ids(transcripts, num_partitions=8).collect()
    }
    assert a == b


class TestGrammarFuzz:
    """Randomized query-grammar differential: compose queries from
    corpus words (head + tail + absent), phrases, AND/OR/NOT, prefixes,
    noise tokens and random casing — engine and NumPy oracle must rank
    identically on every one. The fixed QUERY_SET above pins the
    reference queries; this pins the COMPOSITION space (operator
    nesting x tokenizer edge cases x WAND pruning interactions)."""

    N_QUERIES = 120

    def _vocab(self, oracle):
        by_df = sorted(
            oracle.postings.items(), key=lambda kv: -len(kv[1])
        )
        head = [t for t, _ in by_df[:30]]
        tail = [t for t, _ in by_df[-30:]]
        return head, tail

    def test_random_compositions_rank_identical(self, built):
        import random

        engine, oracle, _ = built
        rng = random.Random(20260818)
        head, tail = self._vocab(oracle)
        absent = ["zzqx", "notaword9", "qqqq"]
        noise = ["!!!", "---", "...", "42", "日本"]

        def word():
            pool = rng.choice([head, head, tail, absent, noise])
            w = rng.choice(pool)
            return w.upper() if rng.random() < 0.2 else w

        def atom():
            r = rng.random()
            if r < 0.60:
                return word()
            if r < 0.80:
                return f'"{word()} {word()}"'
            w = rng.choice(head)
            return w[: max(2, len(w) // 2)] + "*"

        checked = 0
        for _ in range(self.N_QUERIES):
            parts = [atom()]
            for _ in range(rng.randint(0, 3)):
                op = rng.choice(["", "", "AND", "OR", "NOT"])
                parts.append(f"{op} {atom()}" if op else atom())
            q = " ".join(parts)
            limit = rng.choice([1, 5, 20, 100])
            got = _ranks_and_scores(engine.search(q, limit=limit))
            want = oracle.search(q, limit=limit)
            assert [d for d, _ in got] == [d for d, _ in want], (q, limit)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), (q, gd, gs, ws)
            checked += 1
        assert checked == self.N_QUERIES


class TestFilterFuzz:
    """Randomized role/date filter windows on randomized queries: the
    filtered serving path (pre-top-k predicate) must rank identically
    to the oracle's post-hoc doc_filter over the full corpus."""

    def test_random_filtered_queries(self, built):
        import random

        engine, oracle, attrs = built
        rng = random.Random(20260818)
        by_df = sorted(oracle.postings.items(), key=lambda kv: -len(kv[1]))
        head = [t for t, _ in by_df[:25]]
        roles_all = sorted({v[0] for v in attrs.values()})
        ts_all = sorted(v[1] for v in attrs.values())

        for _ in range(25):
            q = " ".join(rng.sample(head, rng.randint(1, 3)))
            roles = rng.sample(roles_all, rng.randint(1, len(roles_all))) \
                if rng.random() < 0.6 else None
            since = until = None
            if rng.random() < 0.6:
                a, b = sorted(rng.sample(range(len(ts_all)), 2))
                since, until = ts_all[a], ts_all[b]

            def ok(d):
                r, t = attrs[d]
                if roles is not None and r not in roles:
                    return False
                if since is not None and not (since <= t <= until):
                    return False
                return True

            got = _ranks_and_scores(
                engine.search(q, limit=20, roles=roles, since=since, until=until)
            )
            want = oracle.search(q, limit=20, doc_filter=ok)
            assert [d for d, _ in got] == [d for d, _ in want], (q, roles, since, until)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), (q, gd)


def test_fuzzy_typo_equals_or_of_variants(built):
    """fuzzy=True on the DataFrame-plan engine: the typo expands to its
    distance-1 vocabulary neighbors and scores exactly like the
    explicit OR of those variants (same contract as the segment path,
    TestFuzzy in test_segments.py)."""
    engine, oracle, _ = built
    variants = engine.fuzzy_variants("machin")
    assert "machine" in variants
    got = _ranks_and_scores(engine.search("machin", limit=20, fuzzy=True))
    want = oracle.search(" ".join(variants), limit=20)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < TOL
    # memoized; off by default the typo matches nothing
    assert engine.fuzzy_variants("machin") is variants
    assert engine.search("machin", limit=20).count() == 0
