"""Query-parser AST tests + oracle behavior (self-consistency layer:
the oracle is itself pinned by these, then the engine is pinned to the
oracle by the differential tests)."""

from __future__ import annotations

import math

from xf_spark.oracle import CANDIDATE_MULTIPLIER, RRF_K, OracleIndex, bm25_idf
from xf_spark.query.parser import parse_query, prefix_terms, query_terms


class TestParser:
    def test_empty_matchall(self):
        assert parse_query("") == ("all",)
        assert parse_query("   ") == ("all",)

    def test_single_term_lowercased(self):
        assert parse_query("Rust") == ("term", "rust")

    def test_implicit_or(self):
        assert parse_query("rust async") == ("or", [("term", "rust"), ("term", "async")])

    def test_and(self):
        assert parse_query("rust AND async") == (
            "and",
            [("term", "rust"), ("term", "async")],
        )

    def test_not(self):
        assert parse_query("python NOT snake") == (
            "not",
            ("term", "python"),
            ("term", "snake"),
        )

    def test_phrase(self):
        assert parse_query('"machine learning"') == ("phrase", ["machine", "learning"])

    def test_single_word_phrase_is_term(self):
        assert parse_query('"machine"') == ("term", "machine")

    def test_prefix(self):
        assert parse_query("progr*") == ("prefix", "progr")

    def test_multi_token_word_is_phrase(self):
        assert parse_query("don't") == ("phrase", ["don", "t"])

    def test_three_way_and_flattened(self):
        assert parse_query("a1 AND b1 AND c1") == (
            "and",
            [("term", "a1"), ("term", "b1"), ("term", "c1")],
        )

    def test_unparseable_is_match_nothing(self):
        # punctuation-only / all-dropped tokens -> empty boolean query,
        # NOT match-all (match-all fires only on the empty string)
        assert parse_query("!!! ---") == ("none",)
        assert parse_query("日" * 14) == ("none",)  # 42 bytes, RemoveLong
        assert parse_query("AND AND OR") == ("none",)

    def test_leading_operator_skipped(self):
        assert parse_query("AND rust") == ("term", "rust")

    def test_field_type_becomes_role_filter(self):
        from xf_spark.query.parser import parse_query_extract

        ast, roles = parse_query_extract("type:assistant rust")
        assert ast == ("term", "rust") and roles == ["assistant"]
        ast, roles = parse_query_extract("role:User")
        assert ast == ("all",) and roles == ["user"]  # filter-only => match-all
        ast, roles = parse_query_extract('type:"assistant" text:"machine learning"')
        assert ast == ("phrase", ["machine", "learning"])
        assert roles == ["assistant"]

    def test_field_text_is_default_field(self):
        from xf_spark.query.parser import parse_query_extract

        ast, roles = parse_query_extract("text:rust* AND spark")
        assert ast == ("and", [("prefix", "rust"), ("term", "spark")])
        assert roles is None

    def test_not_before_field_filter_rejected(self):
        # `rust NOT type:assistant` used to restrict TO assistant AND
        # leak the dangling NOT onto the next atom — reject instead
        import pytest

        from xf_spark.query.parser import parse_query_extract

        with pytest.raises(ValueError, match="negated field filters"):
            parse_query_extract("rust NOT type:assistant")
        with pytest.raises(ValueError, match="negated field filters"):
            parse_query_extract("rust NOT type:assistant spark")

    def test_field_filter_absorbs_pending_and_or(self):
        # the filter ANDs with the scored query by construction, so a
        # pending AND/OR is consumed — it must NOT bind the next atom
        from xf_spark.query.parser import parse_query_extract

        ast, roles = parse_query_extract("rust AND type:assistant spark")
        assert ast == ("or", [("term", "rust"), ("term", "spark")])
        assert roles == ["assistant"]
        ast, roles = parse_query_extract("rust OR role:user spark")
        assert ast == ("or", [("term", "rust"), ("term", "spark")])
        assert roles == ["user"]

    def test_unknown_field_tokenizes_as_before(self):
        # no such field -> colon splits into a tokenized phrase (the
        # pre-field-syntax behavior, kept for unknown prefixes)
        assert parse_query("foo:bar") == ("phrase", ["foo", "bar"])

    def test_term_extraction(self):
        node = parse_query('rust AND "machine learning" NOT progr*')
        assert query_terms(node) == {"rust", "machine", "learning"}
        assert prefix_terms(node) == {"progr"}

    def test_dissolved_atom_dissolves_its_operator(self):
        # 'rust NOT !!! tokio': the NOT operand tokenizes to nothing,
        # so the operator must NOT leak onto the next atom (tokio was
        # silently excluded before the fix)
        assert parse_query("rust NOT !!! tokio") == (
            "or",
            [("term", "rust"), ("term", "tokio")],
        )
        assert parse_query("rust AND --- tokio") == (
            "or",
            [("term", "rust"), ("term", "tokio")],
        )

    def test_multi_token_prefix_keeps_leading_terms(self):
        # 'foo-bar*' tokenizes to [foo, bar]: foo stays a required
        # term, only the last token carries the prefix semantics
        assert parse_query("foo-bar*") == (
            "and",
            [("term", "foo"), ("prefix", "bar")],
        )
        node = parse_query("foo-bar*")
        assert query_terms(node) == {"foo"}
        assert prefix_terms(node) == {"bar"}

    def test_not_excluded_terms_survive_pruning(self):
        # query_terms INCLUDES the NOT operand deliberately: the
        # excluded side's postings must survive partition pruning
        node = parse_query("rust NOT snake")
        assert query_terms(node) == {"rust", "snake"}

    def test_sloppy_phrase(self):
        assert parse_query('"hash join"~2') == ("near", ["hash", "join"], 2)
        # ~0 is exact adjacency == a plain phrase node
        assert parse_query('"hash join"~0') == ("phrase", ["hash", "join"])
        # single surviving token: slop is meaningless -> plain term
        assert parse_query('"hash"~3') == ("term", "hash")
        assert query_terms(parse_query('"a b"~1')) == {"a", "b"}

    def test_boost(self):
        assert parse_query("rust^2") == ("boost", ("term", "rust"), 2.0)
        assert parse_query("rust^2.5") == ("boost", ("term", "rust"), 2.5)
        # ^1 is the identity and unwraps
        assert parse_query("rust^1") == ("term", "rust")
        assert parse_query('"hash join"^1.5') == (
            "boost",
            ("phrase", ["hash", "join"]),
            1.5,
        )
        assert parse_query('"hash join"~2^1.5') == (
            "boost",
            ("near", ["hash", "join"], 2),
            1.5,
        )
        assert parse_query("spark^2 OR join") == (
            "or",
            [("boost", ("term", "spark"), 2.0), ("term", "join")],
        )
        assert query_terms(parse_query("spark^2 OR join")) == {"spark", "join"}
        import pytest

        with pytest.raises(ValueError, match="boost"):
            parse_query("rust^0")

    def test_boost_on_field_default(self):
        assert parse_query("text:rust^2") == ("boost", ("term", "rust"), 2.0)

    def test_non_numeric_caret_is_not_boost(self):
        # 'a^b' has no numeric weight -> tokenizes as before (phrase
        # of the alnum runs), no behavior change for old queries
        assert parse_query("a^b") == ("phrase", ["a", "b"])

    def test_min_should_match_rewrite(self):
        from xf_spark.query.parser import apply_min_should_match

        plan = parse_query("a b c")
        assert apply_min_should_match(plan, 1) == plan
        assert apply_min_should_match(plan, 2) == (
            "msm",
            [("term", "a"), ("term", "b"), ("term", "c")],
            2,
        )
        # more required clauses than present -> matches nothing
        assert apply_min_should_match(plan, 4) == ("none",)
        assert apply_min_should_match(parse_query("a"), 2) == ("none",)
        import pytest

        with pytest.raises(ValueError, match="min_should_match"):
            apply_min_should_match(parse_query("a AND b"), 2)
        with pytest.raises(ValueError, match="min_should_match"):
            apply_min_should_match(parse_query(""), 2)

    def test_window_atoms(self):
        assert parse_query('"hash join"~~2') == (
            "window",
            ["hash", "join"],
            2,
        )
        # order-insensitive by construction: terms are sorted
        assert parse_query('"join hash"~~2') == parse_query('"hash join"~~2')
        # duplicates collapse; single distinct term -> plain term
        assert parse_query('"hash hash"~~3') == ("term", "hash")
        assert parse_query('"a b c"~~0') == ("window", ["a", "b", "c"], 0)
        assert parse_query('"hash join"~~1^2') == (
            "boost",
            ("window", ["hash", "join"], 1),
            2.0,
        )
        import pytest

        with pytest.raises(ValueError, match="window proximity"):
            parse_query('"hash jo*"~~2')
        assert query_terms(parse_query('"a b"~~1')) == {"a", "b"}

    def test_review_fixes_round3(self):
        """Pinned outcomes of the round-3 self-review findings."""
        import pytest

        # underscore is a LIKE metacharacter and never appears in a
        # token — not a wildcard atom, falls back to tokenization
        assert parse_query("v?_tor") == ("phrase", ["v", "tor"])
        # multi-digit fuzzy distances reach the loud error, they do
        # not silently re-tokenize into a phrase with the digits
        with pytest.raises(ValueError, match="fuzzy distance"):
            parse_query("machne~12")
        # a DETACHED trailing * inside quotes is punctuation — the
        # previous word must not silently become a prefix
        assert parse_query('"machine learning *"') == (
            "phrase",
            ["machine", "learning"],
        )
        assert parse_query('"machine *"') == ("term", "machine")
        assert parse_query('"machine learning *"~2') == (
            "near",
            ["machine", "learning"],
            2,
        )

    def test_min_cover_span(self):
        from xf_spark.oracle import min_cover_span

        assert min_cover_span([[0], [1]]) == 1
        assert min_cover_span([[0, 10], [12], [11]]) == 2
        assert min_cover_span([[5], []]) is None
        assert min_cover_span([[3], [3]]) == 0  # same position allowed
        assert min_cover_span([[0, 7], [2, 9], [4]]) == 4

    def test_wildcard_atoms(self):
        assert parse_query("te*m") == ("wildcard", "te*m")
        assert parse_query("t?st") == ("wildcard", "t?st")
        assert parse_query("*ing") == ("wildcard", "*ing")
        assert parse_query("TE*M") == ("wildcard", "te*m")  # analyzed
        # a lone trailing * stays the (cheaper) prefix-field node
        assert parse_query("te*") == ("prefix", "te")
        # wildcard-only / no literal char -> dissolves like punctuation
        assert parse_query("*") == ("none",)
        assert parse_query("?*?") == ("none",)
        # non-word chars around wildcards: not a wildcard atom, falls
        # back to plain tokenization (unchanged old behavior)
        assert parse_query("a-b*c!") == ("phrase", ["a", "b", "c"])
        assert parse_query("te?t^2") == ("boost", ("wildcard", "te?t"), 2.0)
        assert parse_query("rust NOT te*m") == (
            "not",
            ("term", "rust"),
            ("wildcard", "te*m"),
        )

    def test_fuzzy_atoms(self):
        assert parse_query("machne~") == ("fuzzy", "machne", 1)
        assert parse_query("machne~1") == ("fuzzy", "machne", 1)
        assert parse_query("machne~2") == ("fuzzy", "machne", 2)
        assert parse_query("machne~0") == ("term", "machne")
        assert parse_query("MACHNE~1") == ("fuzzy", "machne", 1)
        assert parse_query("machne~1^2") == (
            "boost",
            ("fuzzy", "machne", 1),
            2.0,
        )
        import pytest

        with pytest.raises(ValueError, match="fuzzy distance"):
            parse_query("machne~3")
        # a base that analyzes to several tokens is NOT a fuzzy atom:
        # the ~ reads as punctuation (old behavior preserved)
        assert parse_query("foo~bar") == ("phrase", ["foo", "bar"])

    def test_phrase_prefix_atoms(self):
        assert parse_query('"machine lear*"') == (
            "phrase_prefix",
            ["machine"],
            "lear",
        )
        assert parse_query('"a b lear*"') == (
            "phrase_prefix",
            ["a", "b"],
            "lear",
        )
        # single word + * inside quotes: just a prefix atom
        assert parse_query('"lear*"') == ("prefix", "lear")
        import pytest

        with pytest.raises(ValueError, match="phrase-prefix"):
            parse_query('"machine lear*"~2')

    def test_expand_multiterm_plan(self):
        from xf_spark.query.parser import (
            expand_multiterm_plan,
            multiterm_leaves,
        )

        plan = parse_query("te*m OR machne~2 OR rust")
        leaves = multiterm_leaves(plan)
        assert leaves == {("wildcard", "te*m"), ("fuzzy", "machne", 2)}
        got = expand_multiterm_plan(
            plan,
            {
                ("wildcard", "te*m"): ["term", "team"],
                ("fuzzy", "machne", 2): ["machine"],
            },
        )
        # expansions splice into the parent OR (WAND stays reachable)
        assert got == (
            "or",
            [
                ("term", "term"),
                ("term", "team"),
                ("term", "machine"),
                ("term", "rust"),
            ],
        )
        # no dictionary match: wildcard -> none; fuzzy -> exact term
        got = expand_multiterm_plan(
            plan,
            {("wildcard", "te*m"): [], ("fuzzy", "machne", 2): []},
        )
        assert got == ("or", [("term", "machne"), ("term", "rust")])
        # phrase_prefix -> OR of exact phrases
        pp = parse_query('"machine lear*"')
        got = expand_multiterm_plan(
            pp, {("pprefix", "lear"): ["learning", "learner"]}
        )
        assert got == (
            "or",
            [
                ("phrase", ["machine", "learning"]),
                ("phrase", ["machine", "learner"]),
            ],
        )
        assert expand_multiterm_plan(pp, {("pprefix", "lear"): []}) == ("none",)

    def test_expand_synonyms_plan(self):
        from xf_spark.query.parser import expand_synonyms_plan

        plan = parse_query("ml rust")
        got = expand_synonyms_plan(
            plan, {"ml": ["machine learning", "ai"], "rust": ["rustlang"]}
        )
        assert got == (
            "or",
            [
                ("term", "ml"),
                ("phrase", ["machine", "learning"]),
                ("term", "ai"),
                ("term", "rust"),
                ("term", "rustlang"),
            ],
        )
        # keys are analyzed; duplicate synonyms dedup; empty map no-op
        assert expand_synonyms_plan(plan, {}) == plan
        assert expand_synonyms_plan(
            parse_query("ml"), {"ML": ["ai", "ai", "ml"]}
        ) == ("or", [("term", "ml"), ("term", "ai")])
        import pytest

        with pytest.raises(ValueError, match="synonym keys"):
            expand_synonyms_plan(plan, {"machine learning": ["ml"]})

    def test_msm_fuzzy_expansion_counts_clauses(self):
        from xf_spark.query.parser import (
            apply_min_should_match,
            expand_fuzzy_plan,
        )

        plan = apply_min_should_match(parse_query("cat dog"), 2)
        expanded = expand_fuzzy_plan(plan, lambda t: [t, t + "s"])
        # each clause became an OR of its variants, but the clause
        # COUNT (and the m bar) is unchanged
        assert expanded[0] == "msm" and expanded[2] == 2
        assert [c[0] for c in expanded[1]] == ["or", "or"]


DOCS = [
    (0, "rust is a systems programming language"),
    (1, "machine learning with rust and python"),
    (2, "python snake handling for beginners"),
    (3, "async rust programming patterns rust rust"),
    (4, "machine learning machine learning deep dive"),
    (5, "coffee break"),
    (6, ""),
]


class TestOracle:
    def setup_method(self):
        self.ix = OracleIndex.build(DOCS)

    def test_stats(self):
        assert self.ix.n_docs == 7
        total = sum(self.ix.doc_len.values())
        assert math.isclose(self.ix.avgdl, total / 7)

    def test_idf_formula(self):
        assert math.isclose(bm25_idf(7, 3), math.log(1 + (7 - 3 + 0.5) / 3.5))

    def test_single_term_ranking(self):
        hits = self.ix.search("rust", limit=10)
        ids = [d for d, _ in hits]
        # doc 3 has tf=3 -> highest
        assert ids[0] == 3
        assert set(ids) == {0, 1, 3}
        scores = [s for _, s in hits]
        assert scores == sorted(scores, reverse=True)

    def test_and(self):
        hits = self.ix.search("rust AND python", limit=10)
        assert [d for d, _ in hits] == [1]

    def test_not(self):
        hits = self.ix.search("python NOT snake", limit=10)
        assert [d for d, _ in hits] == [1]

    def test_or_scores_sum(self):
        both = dict(self.ix.search("rust python", limit=10))
        rust = dict(self.ix.search("rust", limit=10))
        python = dict(self.ix.search("python", limit=10))
        assert math.isclose(both[1], rust[1] + python[1], rel_tol=1e-12)

    def test_phrase(self):
        hits = self.ix.search('"machine learning"', limit=10)
        assert set(d for d, _ in hits) == {1, 4}
        # no adjacency -> no match
        assert self.ix.search('"learning machine"', limit=10) == [
            (4, self.ix.search('"learning machine"', limit=10)[0][1])
        ] or set(
            d for d, _ in self.ix.search('"learning machine"', limit=10)
        ) == {4}

    def test_phrase_adjacency_strict(self):
        ix = OracleIndex.build([(0, "alpha beta"), (1, "alpha gamma beta")])
        assert [d for d, _ in ix.search('"alpha beta"', limit=10)] == [0]

    def test_prefix(self):
        hits = self.ix.search("progr*", limit=10)
        assert set(d for d, _ in hits) == {0, 3}

    def test_matchall(self):
        hits = self.ix.search("", limit=100)
        assert [d for d, _ in hits] == [0, 1, 2, 3, 4, 5, 6]
        assert all(s == 1.0 for _, s in hits)

    def test_limit_and_tiebreak(self):
        hits = self.ix.search("", limit=3)
        assert [d for d, _ in hits] == [0, 1, 2]

    def test_filter_pre_topk(self):
        hits = self.ix.search("rust", limit=1, doc_filter=lambda d: d != 3)
        assert hits[0][0] != 3

    def test_rrf_spot_value(self):
        # doc at rank 0 in both lists scores 2/61 (hybrid.rs:375-384)
        fused = OracleIndex.rrf_fuse([(7, 5.0)], [(7, 0.9)], limit=10)
        assert math.isclose(fused[0][1], 2.0 / 61.0)
        assert RRF_K == 60 and CANDIDATE_MULTIPLIER == 3

    def test_rrf_in_both_tiebreak(self):
        # a in both at ranks 0,1; b only lexical rank 1, c only sem rank 0
        lex = [(1, 9.0), (2, 8.0)]
        sem = [(3, 0.9), (1, 0.8)]
        fused = OracleIndex.rrf_fuse(lex, sem, limit=10)
        assert fused[0][0] == 1  # 1/61 + 1/62 beats single-list scores


class TestParserFuzz:
    """Hypothesis fuzz: the parser must be total and deterministic on
    arbitrary input (the reference CLI accepts any argv string), and
    every plan it emits must be walkable by query_terms/prefix_terms
    and evaluable as a match-nothing/match-all/scored query without
    raising."""

    def test_parser_total_and_deterministic(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from xf_spark.query.parser import parse_query_extract

        alphabet = st.characters(
            codec="utf-8", exclude_categories=("Cs",)  # no lone surrogates
        )

        @given(st.text(alphabet=alphabet, max_size=80))
        @settings(max_examples=500, deadline=None)
        def run(q):
            plan, roles = parse_query_extract(q)
            assert parse_query_extract(q) == (plan, roles)
            if plan is not None:
                terms = query_terms(plan)
                prefixes = prefix_terms(plan)
                assert all(isinstance(t, str) and t for t in terms)
                assert all(isinstance(t, str) and t for t in prefixes)
            if roles is not None:
                assert roles and all(isinstance(r, str) for r in roles)

        run()

    def test_operator_soup_matches_nothing_or_parses(self):
        from xf_spark.query.parser import parse_query_extract

        for q in ["AND AND OR", "NOT", '"" ""', "***", "role:", 'a:"b',
                  "AND rust", "rust AND", "NOT NOT rust", '"unterminated']:
            plan, roles = parse_query_extract(q)  # must not raise
            assert plan is None or isinstance(plan, tuple)


class TestStripTypeFilters:
    """strip_type_filters must dissolve the operator bound to a
    removed filter atom exactly as parse_query_extract does — a
    leftover AND/OR would be hash-embedded into the semantic query
    vector (review finding)."""

    def _strip(self, q):
        from xf_spark.query.parser import strip_type_filters

        return strip_type_filters(q)

    def test_preceding_operator_dissolves(self):
        assert self._strip("stress AND role:assistant") == "stress"
        assert self._strip("stress OR type:user") == "stress"

    def test_leading_filter_drops_dangling_operator(self):
        assert self._strip("role:assistant AND stress") == "stress"
        assert self._strip("role:assistant stress") == "stress"

    def test_interior_filter_keeps_outer_operator(self):
        # the AND after the dissolved (OR role:) pair binds the
        # remaining terms, same as the parsed AST
        assert self._strip("stress OR role:assistant AND rust") == "stress AND rust"

    def test_plain_atoms_untouched(self):
        assert self._strip('a "b c" d*') == 'a "b c" d*'
