"""Facet aggregation + field collapsing + tf-idf keywords.

Facet counts and collapsed search are verified against a pure-Python
recomputation over the collected corpus (shared tokenizer), and the
driver / distributed / pinned serving paths are pinned identical to
each other; tfidf_keywords against a hand-rolled replay.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from xf_spark.functions.textcore import tokenize
from xf_spark.index.builder import build_engine
from xf_spark.index.segments import build_segment_index
from xf_spark.oracle import OracleIndex
from xf_spark.query.segment_search import SegmentIndex
from xf_spark.transcripts import load_transcripts

SCALE = 0.001
TOL = 1e-9


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("facetidx"))
    transcripts = load_transcripts(spark, SCALE)
    eng = build_engine(transcripts)
    build_segment_index(
        eng.postings,
        n_docs=eng.stats.n_docs,
        avgdl=eng.stats.avgdl,
        path=path,
        prefix_postings=eng.prefix_postings,
        n_shards=4,
        n_buckets=16,
        slices=2,
    )
    ix = SegmentIndex.load(spark, path, docs=eng.docs)
    rows = eng.docs.select(
        "doc_id", "conv_id", "role", "text", "ts"
    ).collect()
    oracle = OracleIndex.build([(r["doc_id"], r["text"]) for r in rows])
    meta = {
        r["doc_id"]: (r["conv_id"], r["role"], r["ts"], r["text"])
        for r in rows
    }
    return ix, eng, oracle, meta


def _matching_ids(meta, oracle, query):
    """Full match set via the python oracle (limit = corpus size)."""
    return [d for d, _ in oracle.search(query, limit=len(meta) + 1)]


def _facet_rows(df):
    return {(r["value"], r["n_docs"]) for r in df.collect()}


def test_facet_role_vs_python(built):
    ix, _, oracle, meta = built
    got = _facet_rows(ix.facet_counts("machine", facet="role"))
    want = Counter(meta[d][1] for d in _matching_ids(meta, oracle, "machine"))
    assert got == {(k, v) for k, v in want.items()}


def test_facet_boolean_and_phrase(built):
    ix, _, oracle, meta = built
    for q in ("rust AND async", '"machine learning"', "python NOT snake"):
        got = _facet_rows(ix.facet_counts(q, facet="role"))
        want = Counter(meta[d][1] for d in _matching_ids(meta, oracle, q))
        assert got == {(k, v) for k, v in want.items()}, q


def test_facet_date_month_vs_python(built):
    ix, _, oracle, meta = built
    got = _facet_rows(ix.facet_counts("machine", facet="date:month"))
    want = Counter(
        meta[d][2].strftime("%Y-%m")
        for d in _matching_ids(meta, oracle, "machine")
    )
    assert got == {(k, v) for k, v in want.items()}


def test_facet_filtered(built):
    ix, _, oracle, meta = built
    got = _facet_rows(
        ix.facet_counts("machine", facet="date:year", roles=["assistant"])
    )
    want = Counter(
        meta[d][2].strftime("%Y")
        for d in _matching_ids(meta, oracle, "machine")
        if meta[d][1] == "assistant"
    )
    assert got == {(k, v) for k, v in want.items()}


def test_facet_paths_identical(built):
    """driver fast path == distributed cogroup path == pinned path."""
    ix, _, _, meta = built
    base = _facet_rows(ix.facet_counts("machine", facet="role"))
    old = ix.driver_topk_threshold
    try:
        ix.driver_topk_threshold = 0  # force distributed
        assert _facet_rows(ix.facet_counts("machine", facet="role")) == base
    finally:
        ix.driver_topk_threshold = old
    # pinned-attrs zero-job path
    ids = sorted(meta)
    ix.pin_doc_attrs(
        ids, [meta[d][1] for d in ids], [meta[d][2] for d in ids]
    )
    try:
        assert _facet_rows(ix.facet_counts("machine", facet="role")) == base
    finally:
        ix._pinned_attrs = None


def test_facet_match_all_and_contradiction(built):
    ix, _, _, meta = built
    got = _facet_rows(ix.facet_counts("", facet="role"))
    want = Counter(v[1] for v in meta.values())
    assert got == {(k, v) for k, v in want.items()}
    # contradictory role intersection matches nothing
    assert (
        ix.facet_counts("role:assistant machine", roles=["user"]).count() == 0
    )


def test_facet_limit_and_order(built):
    ix, _, _, _ = built
    rows = ix.facet_counts("machine", facet="role").collect()
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    top1 = ix.facet_counts("machine", facet="role", limit=1).collect()
    assert len(top1) == 1 and top1[0]["n_docs"] == counts[0]


def _python_collapse(meta, oracle, query, limit):
    pairs = oracle.search(query, limit=len(meta) + 1)  # (score desc, id asc)
    best, seen = [], set()
    for d, s in pairs:
        g = meta[d][0]
        if g not in seen:
            seen.add(g)
            best.append((g, d, s))
        if len(best) == limit:
            break
    return best


def test_collapse_vs_python(built):
    ix, _, oracle, meta = built
    want = _python_collapse(meta, oracle, "machine", 10)
    got = [
        (r["conv_id"], r["doc_id"], r["score"])
        for r in ix.search_collapsed("machine", limit=10).collect()
    ]
    assert [(g, d) for g, d, _ in got] == [(g, d) for g, d, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-6)


def test_collapse_pinned_path_identical(built):
    ix, _, oracle, meta = built
    base = [
        (r["conv_id"], r["doc_id"])
        for r in ix.search_collapsed("machine", limit=10).collect()
    ]
    ids = sorted(meta)
    ix.pin_doc_groups(ids, [meta[d][0] for d in ids])
    try:
        pinned = [
            (r["conv_id"], r["doc_id"])
            for r in ix.search_collapsed("machine", limit=10).collect()
        ]
        assert pinned == base
    finally:
        ix._pinned_groups = None


def test_collapse_filtered_and_boolean(built):
    ix, _, oracle, meta = built
    got = [
        (r["conv_id"], r["doc_id"])
        for r in ix.search_collapsed(
            "rust AND async", limit=5, roles=["assistant"]
        ).collect()
    ]
    pairs = oracle.search("rust AND async", limit=len(meta) + 1)
    best, seen = [], set()
    for d, s in pairs:
        if meta[d][1] != "assistant":
            continue
        g = meta[d][0]
        if g not in seen:
            seen.add(g)
            best.append((g, d))
        if len(best) == 5:
            break
    assert got == best


def test_collapse_one_row_per_group(built):
    ix, _, _, _ = built
    rows = ix.search_collapsed("machine", limit=50).collect()
    groups = [r["conv_id"] for r in rows]
    assert len(groups) == len(set(groups))


def test_bm25_engine_twins_match_segment_paths(built):
    ix, eng, _, _ = built
    seg_f = _facet_rows(ix.facet_counts("machine", facet="role"))
    df_f = _facet_rows(eng.facet_counts("machine", facet="role"))
    assert seg_f == df_f
    seg_c = [
        (r["conv_id"], r["doc_id"])
        for r in ix.search_collapsed("machine", limit=10).collect()
    ]
    df_c = [
        (r["conv_id"], r["doc_id"])
        for r in eng.search_collapsed("machine", limit=10).collect()
    ]
    assert seg_c == df_c


def test_tfidf_keywords(spark):
    from xf_spark.ops.textops import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (0, "apple banana apple cherry"),
            (1, "banana banana date"),
            (2, "cherry date elder fig"),
        ],
        ["doc_id", "text"],
    )
    got = defaultdict(list)
    for r in tfidf_keywords(docs, top_n=2).collect():
        got[r["doc_id"]].append((r["rank"], r["term"], r["tfidf"]))
    texts = {
        0: "apple banana apple cherry",
        1: "banana banana date",
        2: "cherry date elder fig",
    }
    dfs = Counter()
    for t in texts.values():
        dfs.update(set(tokenize(t)))
    n = len(texts)
    for did, t in texts.items():
        tf = Counter(tokenize(t))
        scored = sorted(
            (
                (
                    -tf[w] * (math.log((1.0 + n) / (1.0 + dfs[w])) + 1.0),
                    w,
                )
                for w in tf
            ),
        )[:2]
        want = [
            (i + 1, w, round(-s, 6)) for i, (s, w) in enumerate(scored)
        ]
        assert sorted(got[did]) == want, did


# ---------------------------------------------------------------------------
# count_matches + search_after cursor pagination
# ---------------------------------------------------------------------------

def test_count_matches_vs_python(built):
    ix, eng, oracle, meta = built
    for q in ("machine", "rust AND async", '"machine learning"', "progr*"):
        want = len(_matching_ids(meta, oracle, q))
        assert ix.count_matches(q) == want, q
        assert eng.count_matches(q) == want, q
    # filtered
    want = sum(
        1
        for d in _matching_ids(meta, oracle, "machine")
        if meta[d][1] == "assistant"
    )
    assert ix.count_matches("machine", roles=["assistant"]) == want
    # match-all
    assert ix.count_matches("") == len(meta)
    # contradiction
    assert ix.count_matches("role:assistant machine", roles=["user"]) == 0


def test_count_matches_paths_identical(built):
    ix, _, _, _ = built
    base = ix.count_matches("machine")
    basef = ix.count_matches("machine", roles=["user"])
    old = ix.driver_topk_threshold
    try:
        ix.driver_topk_threshold = 0
        assert ix.count_matches("machine") == base
        assert ix.count_matches("machine", roles=["user"]) == basef
    finally:
        ix.driver_topk_threshold = old


def _pages_by_cursor(ix, query, page, n_pages, **kw):
    out, after = [], None
    for _ in range(n_pages):
        rows = ix.search(query, limit=page, after=after, **kw).collect()
        if not rows:
            break
        out.extend((r["doc_id"], r["score"]) for r in rows)
        after = (rows[-1]["score"], rows[-1]["doc_id"])
    return out


def test_search_after_pages_equal_single_topk(built):
    ix, _, oracle, meta = built
    for q in ("machine", "rust async patterns", '"machine learning"'):
        paged = _pages_by_cursor(ix, q, 5, 5)
        whole = [
            (r["doc_id"], r["score"])
            for r in ix.search(q, limit=25).collect()
        ]
        assert paged == whole, q


def test_search_after_distributed_and_filtered(built):
    ix, _, _, _ = built
    whole = [
        (r["doc_id"], r["score"])
        for r in ix.search("machine", limit=20, roles=["user"]).collect()
    ]
    paged = _pages_by_cursor(ix, "machine", 4, 5, roles=["user"])
    assert paged == whole
    old = ix.driver_topk_threshold
    try:
        ix.driver_topk_threshold = 0  # distributed WAND path
        paged_d = _pages_by_cursor(ix, "machine", 4, 5, roles=["user"])
        assert paged_d == whole
        paged_u = _pages_by_cursor(ix, "machine", 5, 4)
        whole_u = [
            (r["doc_id"], r["score"])
            for r in ix.search("machine", limit=20).collect()
        ]
        assert paged_u == whole_u
    finally:
        ix.driver_topk_threshold = old


def test_search_after_match_all_pages(built):
    """Match-all (and filter-only) queries must honor the cursor too —
    score is constant 1.0, so pages advance purely on doc_id and a
    dropped cursor would loop the first page forever."""
    ix, _, _, meta = built
    whole = [
        (r["doc_id"], r["score"])
        for r in ix.search("", limit=12).collect()
    ]
    paged = _pages_by_cursor(ix, "", 4, 3)
    assert paged == whole
    assert len(set(d for d, _ in paged)) == len(paged)
    # filter-only query (match-all + role filter)
    whole_f = [
        (r["doc_id"], r["score"])
        for r in ix.search("", limit=12, roles=["user"]).collect()
    ]
    paged_f = _pages_by_cursor(ix, "", 4, 3, roles=["user"])
    assert paged_f == whole_f


def test_collapse_other_column_ignores_conv_pins(built):
    """pin_doc_groups pins (doc_id -> conv_id); collapsing by a
    DIFFERENT column must take the distributed path, not serve conv_id
    values under the other column's name."""
    ix, _, _, meta = built
    base = [
        (r["role"], r["doc_id"])
        for r in ix.search_collapsed(
            "machine", limit=10, group_col="role"
        ).collect()
    ]
    ids = sorted(meta)
    ix.pin_doc_groups(ids, [meta[d][0] for d in ids])  # conv_id pins
    try:
        got = [
            (r["role"], r["doc_id"])
            for r in ix.search_collapsed(
                "machine", limit=10, group_col="role"
            ).collect()
        ]
        assert got == base
        # and the values really are roles, not conv ids
        assert all(g in ("user", "assistant", "tool") for g, _ in got)
    finally:
        ix._pinned_groups = None
        ix._pinned_groups_col = None


def test_msearch_filtered_member_keeps_fuzzy(built):
    """A role-filtered batch member under the driver threshold is
    re-dispatched through search(); fuzzy (and exhaustive) must ride
    along — a typo'd term would otherwise silently return []."""
    ix, _, _, _ = built
    q = "role:user machin"  # 'machin' = edit-distance-1 of 'machine'
    got = ix.search_many([q], limit=10, fuzzy=True)[q]
    want = [
        (r["doc_id"], r["score"])
        for r in ix.search(q, limit=10, fuzzy=True).collect()
    ]
    assert got == want
    assert got, "fuzzy expansion dropped on the filtered member"
    # and without fuzzy the typo matches nothing (guards the fixture)
    assert ix.search_many([q], limit=10)[q] == []


# ---------------------------------------------------------------------------
# explain (score breakdown)
# ---------------------------------------------------------------------------

def _explain_rows(df):
    return [
        (
            r["doc_id"], r["term"], r["field"], r["tf"], r["df"],
            round(r["idf"], 9), round(r["contrib"], 9), round(r["score"], 9),
        )
        for r in df.collect()
    ]


def test_explain_paths_identical_and_sums_to_score(built):
    ix, eng, _, _ = built
    for q in ("machine", "rust async", "rust AND async", "python NOT snake",
              "progr* machine", '"machine learning"'):
        seg = _explain_rows(ix.explain(q, limit=8))
        twin = _explain_rows(eng.explain(q, limit=8))
        assert seg == twin, q
        assert seg, q
        # per-doc contributions sum to the doc's total score
        by_doc: dict = {}
        for d, _t, _f, _tf, _df, _idf, contrib, score in seg:
            by_doc.setdefault(d, [0.0, score])[0] += contrib
        for d, (s, total) in by_doc.items():
            # contribs were rounded to 9 dp individually; the sum can
            # drift half an ulp per term off the rounded total
            assert s == pytest.approx(total, abs=1e-8), (q, d)
        # NOT-excluded terms never appear as contribution rows
        if "NOT" in q:
            assert all(t != "snake" for _, t, *_ in seg)


def test_explain_filtered_fuzzy_and_refusals(built):
    ix, eng, _, meta = built
    rows = _explain_rows(ix.explain("machine", limit=6, roles=["user"]))
    assert rows == _explain_rows(eng.explain("machine", limit=6, roles=["user"]))
    assert all(meta[d][1] == "user" for d, *_ in rows)
    # fuzzy: the typo'd leaf expands to vocabulary variants
    frows = _explain_rows(ix.explain("machin", limit=6, fuzzy=True))
    assert frows and all(t != "machin" for _, t, *_ in frows)
    assert frows == _explain_rows(eng.explain("machin", limit=6, fuzzy=True))
    # refusals: phrase nested in a larger plan (a doc can reach the
    # top-k without the adjacency) and match-all (no score)
    with pytest.raises(ValueError):
        ix.explain('rust "machine learning"')
    with pytest.raises(ValueError):
        eng.explain('rust "machine learning"')
    with pytest.raises(ValueError):
        ix.explain("")


def test_explain_repeated_term_doubles_idf(built):
    ix, _, _, _ = built
    one = {d: c for d, _t, _f, _tf, _df, _i, c, _s
           in _explain_rows(ix.explain("machine", limit=5))}
    two = {d: c for d, _t, _f, _tf, _df, _i, c, _s
           in _explain_rows(ix.explain("machine machine", limit=5))}
    for d in set(one) & set(two):
        assert two[d] == pytest.approx(2 * one[d], rel=1e-9)


def test_complete_vs_python(built):
    """Autocomplete: both engine paths equal a pure-Python df count
    over the collected corpus (df desc, term asc); malformed prefixes
    are refused."""
    ix, eng, _, meta = built
    df_count: Counter = Counter()
    for _d, (_conv, _role, _ts, text) in meta.items():
        for t in set(tokenize(text)):
            df_count[t] += 1
    want = sorted(
        ((t, c) for t, c in df_count.items() if t.startswith("ma")),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got_ix = [(r["term"], r["df"]) for r in ix.complete("ma").collect()]
    got_eng = [(r["term"], r["df"]) for r in eng.complete("ma").collect()]
    assert got_ix == want
    assert got_eng == want
    for bad in ("two words", "!!!"):
        with pytest.raises(ValueError):
            ix.complete(bad)
        with pytest.raises(ValueError):
            eng.complete(bad)


def test_search_after_validation_and_bm25_twin(built):
    ix, eng, _, _ = built
    with pytest.raises(ValueError):
        ix.search("machine", limit=5, offset=5, after=(1.0, 0))
    whole = [
        (r["doc_id"], r["score"])
        for r in eng.search("machine", limit=15).collect()
    ]
    out, after = [], None
    for _ in range(3):
        rows = eng.search("machine", limit=5, after=after).collect()
        out.extend((r["doc_id"], r["score"]) for r in rows)
        after = (rows[-1]["score"], rows[-1]["doc_id"])
    assert out == whole


# ---------------------------------------------------------------------------
# significant_terms
# ---------------------------------------------------------------------------

def _python_significant(meta, oracle, query, limit, min_count):
    matched = _matching_ids(meta, oracle, query)
    total = len(matched)
    fg = Counter(t for d in matched for t in set(tokenize(meta[d][3])))
    dfs = Counter(t for d in meta for t in set(tokenize(meta[d][3])))
    n = len(meta)
    rows = [
        (t, c, dfs[t], (c / total) / (dfs[t] / n))
        for t, c in fg.items()
        if c >= min_count
    ]
    rows.sort(key=lambda r: (-round(r[3], 6), r[0]))
    return rows[:limit]


def test_significant_terms_vs_python(built):
    ix, _, oracle, meta = built
    want = _python_significant(meta, oracle, "merge", 15, 2)
    got = [
        (r["term"], r["n_match"], r["df"], r["lift"])
        for r in ix.significant_terms("merge", limit=15).collect()
    ]
    assert [(t, m, d) for t, m, d, _ in got] == [
        (t, m, d) for t, m, d, _ in want
    ]
    for (_, _, _, a), (_, _, _, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-5)


def test_significant_terms_paths_and_twin(built):
    ix, eng, _, _ = built
    base = [
        (r["term"], r["n_match"], r["df"])
        for r in ix.significant_terms("merge", limit=10).collect()
    ]
    old = ix.driver_topk_threshold
    try:
        ix.driver_topk_threshold = 0  # distributed match-set feeder
        assert [
            (r["term"], r["n_match"], r["df"])
            for r in ix.significant_terms("merge", limit=10).collect()
        ] == base
    finally:
        ix.driver_topk_threshold = old
    assert [
        (r["term"], r["n_match"], r["df"])
        for r in eng.significant_terms("merge", limit=10).collect()
    ] == base


def test_significant_terms_filtered(built):
    ix, _, oracle, meta = built
    got = [
        (r["term"], r["n_match"])
        for r in ix.significant_terms(
            "merge", limit=10, roles=["user"]
        ).collect()
    ]
    matched = [
        d for d in _matching_ids(meta, oracle, "merge")
        if meta[d][1] == "user"
    ]
    fg = Counter(t for d in matched for t in set(tokenize(meta[d][3])))
    assert all(fg[t] == m for t, m in got)


# ---------------------------------------------------------------------------
# did-you-mean suggest
# ---------------------------------------------------------------------------

def test_suggest(built):
    ix, eng, _, meta = built
    # vocabulary neighbor: 'machina' is nobody's term, distance 1
    # from 'machine' (the fixture corpus's flagship word)
    got = ix.suggest("machina AND learning")
    assert got is not None and "machine" in got and "learning" in got
    assert eng.suggest("machina AND learning") == got
    # every term known -> nothing to correct
    assert ix.suggest("machine learning") is None
    # no neighbor within distance 1 -> None
    assert ix.suggest("zzzzqqqq") is None
    # match-all / empty -> None
    assert ix.suggest("") is None
    # replacement is word-bounded and case-insensitive
    got2 = ix.suggest("MACHINA")
    assert got2 == "machine"


def test_facet_counts_multi(built):
    ix, _, oracle, meta = built
    rows = ix.facet_counts_multi(
        "machine", facets=["role", "date:year"]
    ).collect()
    got = {(r["facet"], r["value"], r["n_docs"]) for r in rows}
    matched = _matching_ids(meta, oracle, "machine")
    want = {("role", k, v) for k, v in Counter(meta[d][1] for d in matched).items()}
    want |= {
        ("date:year", k, v)
        for k, v in Counter(
            meta[d][2].strftime("%Y") for d in matched
        ).items()
    }
    assert got == want
    # per-facet limit
    top = ix.facet_counts_multi(
        "machine", facets=["role", "date:year"], limit=1
    ).collect()
    assert len(top) == 2 and {r["facet"] for r in top} == {"role", "date:year"}
    # single-facet agreement with facet_counts
    single = _facet_rows(ix.facet_counts("machine", facet="role"))
    multi = {
        (r["value"], r["n_docs"])
        for r in ix.facet_counts_multi("machine", facets=["role"]).collect()
    }
    assert single == multi


def _top_hits_want(meta, oracle, query, k, roles=None):
    """Pure-Python replay of facet_top_hits over role: full scored
    match set -> per-role count + top-k by (score desc, doc_id)."""
    scored = oracle.search(query, limit=len(meta) + 1)
    if roles:
        scored = [(d, s) for d, s in scored if meta[d][1] in roles]
    buckets = defaultdict(list)
    for d, s in scored:
        buckets[meta[d][1]].append((d, s))
    out = []
    for v, docs in buckets.items():
        docs = sorted(docs, key=lambda t: (-t[1], t[0]))
        for rank, (d, s) in enumerate(docs[:k], 1):
            out.append((v, len(docs), rank, d, round(s, 9)))
    return sorted(out, key=lambda t: (-t[1], t[0], t[2]))


class TestFacetTopHits:
    QUERIES = ["machine", "rust async", '"machine learning"', "ma?hine"]

    def test_segment_matches_python_replay(self, built):
        ix, _eng, oracle, meta = built
        for q in self.QUERIES:
            got = [
                (r["value"], r["n_docs"], r["rank"], r["doc_id"],
                 round(r["score"], 9))
                for r in ix.facet_top_hits(q, facet="role", k=3).collect()
            ]
            want = _top_hits_want(meta, oracle, q, 3)
            assert got == want, q

    def test_bm25_twin_matches(self, built):
        ix, eng, _oracle, _meta = built
        for q in self.QUERIES:
            a = [
                (r["value"], r["n_docs"], r["rank"], r["doc_id"],
                 round(r["score"], 9))
                for r in ix.facet_top_hits(q, facet="role", k=2).collect()
            ]
            b = [
                (r["value"], r["n_docs"], r["rank"], r["doc_id"],
                 round(r["score"], 9))
                for r in eng.facet_top_hits(q, facet="role", k=2).collect()
            ]
            assert a == b, q

    def test_role_filter_and_bucket_limit(self, built):
        ix, _eng, oracle, meta = built
        got = [
            (r["value"], r["n_docs"], r["rank"], r["doc_id"],
             round(r["score"], 9))
            for r in ix.facet_top_hits(
                "machine", facet="role", k=2, roles=["assistant"]
            ).collect()
        ]
        want = _top_hits_want(meta, oracle, "machine", 2, roles={"assistant"})
        assert got == want
        # bucket limit: only the biggest bucket survives
        lim = ix.facet_top_hits("machine", facet="role", k=2, limit=1).collect()
        full = ix.facet_top_hits("machine", facet="role", k=2).collect()
        assert {r["value"] for r in lim} == {full[0]["value"]}

    def test_match_all_and_validation(self, built):
        ix, _eng, _oracle, meta = built
        rows = ix.facet_top_hits("", facet="role", k=1).collect()
        # match-all: every role bucket, counts sum to corpus size
        assert sum(r["n_docs"] for r in rows) == len(meta)
        assert all(r["rank"] == 1 and r["score"] == 1.0 for r in rows)
        with pytest.raises(ValueError, match="k must be"):
            ix.facet_top_hits("machine", k=0)

    def test_date_facet_buckets(self, built):
        ix, _eng, oracle, meta = built
        rows = ix.facet_top_hits("machine", facet="date:year", k=1).collect()
        scored = oracle.search("machine", limit=len(meta) + 1)
        years = Counter(str(meta[d][2].year) for d, _ in scored)
        assert {(r["value"], r["n_docs"]) for r in rows} == set(years.items())


class TestMatchStats:
    def test_segment_matches_python_replay(self, built):
        ix, _eng, oracle, meta = built
        import numpy as np

        for q in ("machine", "rust async", "ma?hine"):
            row = ix.match_stats(q, col="text_len").collect()[0]
            ids = _matching_ids(meta, oracle, q)
            lens = np.array([float(len(meta[d][3])) for d in ids])
            assert row["n"] == len(ids)
            assert row["min"] == lens.min() and row["max"] == lens.max()
            assert abs(row["avg"] - lens.mean()) < 1e-9
            assert row["sum"] == lens.sum()
            for p, name in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
                want = float(
                    np.percentile(lens, p * 100, method="linear")
                )
                assert abs(row[name] - want) < 1e-9, (q, name)

    def test_bm25_twin_and_filters(self, built):
        ix, eng, _oracle, _meta = built
        a = ix.match_stats(
            "machine", col="turn_idx", roles=["assistant"]
        ).collect()[0]
        b = eng.match_stats(
            "machine", col="turn_idx", roles=["assistant"]
        ).collect()[0]
        assert a.asDict() == b.asDict()
        assert a["n"] > 0

    def test_no_match_is_zero_row(self, built):
        ix, _eng, _oracle, _meta = built
        row = ix.match_stats("zzzznoterm").collect()[0]
        assert row["n"] == 0 and row["min"] is None and row["sum"] is None


def test_top_hits_driver_equals_distributed(built):
    """The driver fast path and the distributed cogroup path must
    return identical top-hits rows (the repo's serving-parity pin);
    with pinned attrs the driver path runs zero Spark jobs for role
    facets."""
    ix, _eng, _oracle, _meta = built

    def rows(q, **kw):
        return [
            (r["value"], r["n_docs"], r["rank"], r["doc_id"],
             round(r["score"], 9))
            for r in ix.facet_top_hits(q, **kw).collect()
        ]

    for q, kw in [
        ("machine", dict(facet="role", k=3)),
        ("machine", dict(facet="date:year", k=2, limit=2)),
        ("rust async", dict(facet="role", k=2, roles=["user"])),
    ]:
        fast = rows(q, **kw)
        old = ix.driver_topk_threshold
        try:
            ix.driver_topk_threshold = 0  # force distributed
            slow = rows(q, **kw)
        finally:
            ix.driver_topk_threshold = old
        assert fast == slow, (q, kw)


class TestSearchDecayed:
    def _want(self, meta, oracle, q, hl, limit):
        import math

        scored = oracle.search(q, limit=len(meta) + 1)
        ref = max(m[2] for m in meta.values() if m[2] is not None)
        out = []
        for d, s in scored:
            ts = meta[d][2]
            if ts is None:
                f = 0.0
            else:
                f = 0.5 ** (((ref - ts).total_seconds() / 86400.0) / hl)
            out.append((d, s * f))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return [(d, round(s, 9)) for d, s in out[:limit]]

    def test_segment_matches_python_replay(self, built):
        ix, _eng, oracle, meta = built
        for q, hl in [("machine", 30.0), ("rust async", 365.0)]:
            got = [
                (r["doc_id"], round(r["score"], 9))
                for r in ix.search_decayed(q, half_life_days=hl).collect()
            ]
            assert got == self._want(meta, oracle, q, hl, 20), (q, hl)
        # recency actually reorders vs plain BM25
        plain = [r["doc_id"] for r in ix.search("machine", limit=20).collect()]
        dec = [r["doc_id"] for r in ix.search_decayed("machine").collect()]
        assert plain != dec

    def test_bm25_twin_and_distributed(self, built):
        ix, eng, _oracle, _meta = built
        a = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search_decayed("machine", half_life_days=90).collect()
        ]
        b = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.search_decayed("machine", half_life_days=90).collect()
        ]
        assert a == b
        old = ix.driver_topk_threshold
        try:
            ix.driver_topk_threshold = 0
            c = [
                (r["doc_id"], round(r["score"], 9))
                for r in ix.search_decayed(
                    "machine", half_life_days=90
                ).collect()
            ]
        finally:
            ix.driver_topk_threshold = old
        assert a == c

    def test_validation(self, built):
        ix, _eng, _oracle, _meta = built
        with pytest.raises(ValueError, match="half_life"):
            ix.search_decayed("machine", half_life_days=0)
        with pytest.raises(ValueError, match="scored query"):
            ix.search_decayed("")


def test_decay_rescore_matchall_guards(built):
    """Round-3 review fix: the twins must agree that match-all has no
    BM25 leg to decay/rescore — both raise, neither silently scores."""
    ix, eng, _oracle, _meta = built
    with pytest.raises(ValueError, match="scored query"):
        ix.search_decayed("")
    with pytest.raises(ValueError, match="scored query"):
        eng.search_decayed("")
    with pytest.raises(ValueError, match="rescore requires"):
        ix.search_rescored("machine", "")
    with pytest.raises(ValueError, match="rescore requires"):
        eng.search_rescored("machine", "")


class TestSearchDemoted:
    def test_segment_matches_oracle(self, built):
        ix, _eng, oracle, _meta = built
        for q, neg, f in [
            ("machine", '"machine learning"', 0.3),
            ("rust async", "python", 0.5),
        ]:
            got = [
                (r["doc_id"], round(r["score"], 9))
                for r in ix.search_demoted(q, neg, factor=f, limit=20).collect()
            ]
            want = [
                (d, round(s, 9))
                for d, s in oracle.search_demoted(q, neg, factor=f, limit=20)
            ]
            assert got == want, (q, neg)
        # demoted docs stay findable (unlike NOT) at score * factor
        plain = {
            r["doc_id"]: r["score"]
            for r in ix.search("machine", limit=1000).collect()
        }
        dem = {
            r["doc_id"]: r["score"]
            for r in ix.search_demoted(
                "machine", "rust", factor=0.25, limit=1000
            ).collect()
        }
        neg_ids = {d for d, _ in oracle.search("rust", limit=10**9)}
        both = set(plain) & neg_ids
        assert both  # fixture must exercise the demotion
        for d in both:
            assert abs(dem[d] - 0.25 * plain[d]) < 1e-9
        for d in set(plain) - neg_ids:
            assert abs(dem[d] - plain[d]) < 1e-9

    def test_bm25_twin_and_distributed(self, built):
        ix, eng, _oracle, _meta = built
        a = [
            (r["doc_id"], round(r["score"], 9))
            for r in ix.search_demoted("machine", "rust", factor=0.4).collect()
        ]
        b = [
            (r["doc_id"], round(r["score"], 9))
            for r in eng.search_demoted("machine", "rust", factor=0.4).collect()
        ]
        assert a == b
        old = ix.driver_topk_threshold
        try:
            ix.driver_topk_threshold = 0
            c = [
                (r["doc_id"], round(r["score"], 9))
                for r in ix.search_demoted(
                    "machine", "rust", factor=0.4
                ).collect()
            ]
        finally:
            ix.driver_topk_threshold = old
        assert a == c

    def test_validation(self, built):
        ix, eng, _oracle, _meta = built
        for e in (ix, eng):
            with pytest.raises(ValueError, match="scored query|negative"):
                e.search_demoted("machine", "")
        with pytest.raises(ValueError, match="factor"):
            ix.search_demoted("machine", "rust", factor=0)
