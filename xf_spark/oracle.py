"""Pure-Python/NumPy oracle: in-memory inverted index + exact BM25.

The differential-testing keystone (modeled on the reference's
tests/cli_e2e.rs:197-292, which *recomputes* expected semantic/hybrid
results through an independent code path): every Spark query result is
compared against this oracle — ranks exact, scores at 1e-6.

Pinned scoring semantics (FIXTURES.md §4, README.md:995-1000):
- BM25: k1 = 1.2, b = 0.75,
  idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  tfp(t,d) = tf (k1+1) / (tf + k1 (1 - b + b |d|/avgdl))
  score(d) = sum over query terms of idf * tfp
- GLOBAL stats (N, avgdl, df) — never per-partition/segment. This is
  the deliberate divergence from Tantivy's per-segment scoring that
  makes N-vs-4N executor runs rank-identical.
- |d| = exact token count (we pin exact lengths, not Tantivy's
  256-entry fieldnorm quantization; documented in SURVEY.md §7.0).
- Tiebreak everywhere: (score desc, doc_id asc).
- Tokenizer identical to the engine: xf_spark.functions.textcore.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np

from xf_spark.functions.hash_embed import hash_embed
from xf_spark.functions.textcore import canonicalize_for_embedding, generate_prefixes, tokenize

K1 = 1.2
B = 0.75
RRF_K = 60
CANDIDATE_MULTIPLIER = 3


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def min_cover_span(plists) -> int | None:
    """Minimal window covering one position from EACH list (the
    classic merged-events sliding window): returns min over windows of
    (max(p) - min(p)), or None when some list is empty. Shared by the
    oracle, the BM25 twin's UDF, the segment evaluator, and percolate
    — one definition of the ("window", terms, gaps) semantics."""
    if any(not len(p) for p in plists):
        return None
    events = sorted(
        (int(p), i) for i, pl in enumerate(plists) for p in pl
    )
    k = len(plists)
    count = [0] * k
    have = 0
    left = 0
    best = None
    for r, (pr, tr) in enumerate(events):
        count[tr] += 1
        if count[tr] == 1:
            have += 1
        while have == k:
            w = pr - events[left][0]
            if best is None or w < best:
                best = w
            tl = events[left][1]
            count[tl] -= 1
            if count[tl] == 0:
                have -= 1
            left += 1
    return best


def _levenshtein(a: str, b: str, cutoff: int) -> int:
    """Plain Levenshtein distance (insert/delete/substitute, cost 1 —
    the F.levenshtein / DuckDB levenshtein() definition), early-exited
    to cutoff+1 when every value in a DP row exceeds the cutoff."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        if min(cur) > cutoff:
            return cutoff + 1
        prev = cur
    return prev[-1]


def bm25_tf_part(tf: float, dl: float, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


@dataclass
class OracleIndex:
    """In-memory inverted index over (doc_id, text) with prefix field."""

    doc_ids: list = field(default_factory=list)
    doc_len: dict = field(default_factory=dict)        # doc_id -> token count
    postings: dict = field(default_factory=dict)       # term -> {doc_id: [positions]}
    prefix_postings: dict = field(default_factory=dict)  # prefix term -> {doc_id: tf}
    meta: dict = field(default_factory=dict)           # doc_id -> metadata dict
    n_docs: int = 0
    avgdl: float = 0.0

    @classmethod
    def build(cls, rows) -> "OracleIndex":
        """rows: iterable of (doc_id, text) or (doc_id, text, meta)."""
        ix = cls()
        total_len = 0
        for row in rows:
            doc_id, text = row[0], row[1]
            meta = row[2] if len(row) > 2 else {}
            toks = tokenize(text or "")
            ix.doc_ids.append(doc_id)
            ix.doc_len[doc_id] = len(toks)
            ix.meta[doc_id] = meta
            total_len += len(toks)
            for pos, t in enumerate(toks):
                ix.postings.setdefault(t, {}).setdefault(doc_id, []).append(pos)
            for p in generate_prefixes(text or ""):
                d = ix.prefix_postings.setdefault(p, {})
                d[doc_id] = d.get(doc_id, 0) + 1
        ix.n_docs = len(ix.doc_ids)
        ix.avgdl = (total_len / ix.n_docs) if ix.n_docs else 0.0
        return ix

    # -- scoring ----------------------------------------------------------

    def _term_scores(self, term: str, prefix: bool = False) -> dict:
        """doc_id -> BM25 contribution of one term (0 if absent)."""
        plist = (self.prefix_postings if prefix else self.postings).get(term)
        if not plist:
            return {}
        df = len(plist)
        idf = bm25_idf(self.n_docs, df)
        out = {}
        for doc_id, positions in plist.items():
            tf = positions if isinstance(positions, int) else len(positions)
            out[doc_id] = idf * bm25_tf_part(tf, self.doc_len[doc_id], self.avgdl)
        return out

    def search(
        self,
        query: str,
        limit: int = 20,
        doc_filter=None,
        synonyms: dict | None = None,
    ) -> list[tuple]:
        """Query language parity with the reference QueryParser subset
        (README.md:1384-1390): bare terms (OR... Tantivy default is OR
        across terms with BM25 sum — we pin sum-over-matching-terms,
        docs matching any term), "quoted phrases", AND / OR / NOT,
        trailing-* prefix. Returns [(doc_id, score)] sorted by
        (score desc, doc_id asc), truncated to limit.

        doc_filter: optional predicate doc_id -> bool applied BEFORE
        top-k (the engine filters pre-top-k; no adaptive refetch).
        """
        from xf_spark.query.parser import parse_query  # shared grammar

        plan = parse_query(query)
        if synonyms:
            from xf_spark.query.parser import expand_synonyms_plan

            plan = expand_synonyms_plan(plan, synonyms)
        scored = self._eval(plan)
        if doc_filter is not None:
            scored = {d: s for d, s in scored.items() if doc_filter(d)}
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:limit]

    def _eval(self, node) -> dict:
        """Evaluate a parsed query node -> {doc_id: score}."""
        kind = node[0]
        if kind == "all":
            return {d: 1.0 for d in self.doc_ids}
        if kind == "none":
            return {}
        if kind == "term":
            return self._term_scores(node[1])
        if kind == "prefix":
            return self._term_scores(node[1], prefix=True)
        if kind == "phrase":
            return self._phrase_scores(node[1])
        if kind == "near":
            return self._near_scores(node[1], node[2])
        if kind == "window":
            return self._window_scores(node[1], node[2])
        if kind == "wildcard":
            exps = self._dictionary_expand("wildcard", node[1])
            if not exps:
                return {}
            return self._eval(("or", [("term", t) for t in exps]))
        if kind == "fuzzy":
            exps = self._dictionary_expand("fuzzy", node[1], node[2])
            if not exps:
                exps = [node[1]]
            return self._eval(("or", [("term", t) for t in exps]))
        if kind == "phrase_prefix":
            exps = self._dictionary_expand("pprefix", node[2])
            if not exps:
                return {}
            return self._eval(
                ("or", [("phrase", list(node[1]) + [e]) for e in exps])
            )
        if kind == "boost":
            return {d: s * node[2] for d, s in self._eval(node[1]).items()}
        if kind == "msm":
            parts = [self._eval(c) for c in node[1]]
            m = node[2]
            out: dict = {}
            counts: dict = {}
            for p in parts:
                for d, s in p.items():
                    out[d] = out.get(d, 0.0) + s
                    counts[d] = counts.get(d, 0) + 1
            return {d: s for d, s in out.items() if counts[d] >= m}
        if kind == "and":
            parts = [self._eval(c) for c in node[1]]
            if not parts:
                return {}
            docs = set(parts[0])
            for p in parts[1:]:
                docs &= set(p)
            return {d: sum(p.get(d, 0.0) for p in parts) for d in docs}
        if kind == "or":
            parts = [self._eval(c) for c in node[1]]
            out: dict = {}
            for p in parts:
                for d, s in p.items():
                    out[d] = out.get(d, 0.0) + s
            return out
        if kind == "not":
            base = self._eval(node[1])
            excl = set(self._eval(node[2]))
            return {d: s for d, s in base.items() if d not in excl}
        raise ValueError(f"unknown node {kind}")

    def _phrase_scores(self, terms: list[str]) -> dict:
        """Exact-adjacency phrase match on positions; score = sum of the
        member terms' BM25 contributions (Tantivy PhraseQuery scores
        with the phrase frequency; we pin sum-of-term-scores for docs
        where the phrase occurs — engine and oracle share this pin)."""
        if not terms:
            return {}
        plists = [self.postings.get(t, {}) for t in terms]
        cand = set(plists[0])
        for p in plists[1:]:
            cand &= set(p)
        # hoisted: _term_scores walks the term's full posting list, so
        # computing it per-candidate would be quadratic in hot phrases
        per_term = {t: self._term_scores(t) for t in set(terms)}
        out = {}
        for d in cand:
            first = plists[0][d]
            rest = [set(p[d]) for p in plists[1:]]
            if any(all((pos + i + 1) in rest[i] for i in range(len(rest))) for pos in first):
                out[d] = sum(per_term[t].get(d, 0.0) for t in terms)
        return out

    def _dictionary_expand(self, kind: str, arg: str, d: int = 1) -> list:
        """Term-dictionary expansion for wildcard / ~d fuzzy / phrase-
        prefix atoms — the same contract as the engines'
        _multiterm_variants: matching vocabulary terms ranked
        (df desc, term asc), capped at MULTITERM_MAX_EXPANSIONS.
        Distances are plain Levenshtein (matching Spark's F.levenshtein
        and DuckDB's levenshtein())."""
        from xf_spark.query.parser import MULTITERM_MAX_EXPANSIONS
        from xf_spark.query.segment_search import FUZZY_MIN_LEN

        if kind == "wildcard":
            import fnmatch

            rx = re.compile(fnmatch.translate(arg))
            match = lambda t: rx.match(t) is not None  # noqa: E731
        elif kind == "fuzzy":
            if len(arg) < FUZZY_MIN_LEN:
                return [arg]
            match = lambda t: (
                abs(len(t) - len(arg)) <= d
                and _levenshtein(t, arg, d) <= d
            )  # noqa: E731
        else:  # pprefix
            match = lambda t: t.startswith(arg)  # noqa: E731
        ranked = sorted(
            ((-len(plist), t) for t, plist in self.postings.items() if match(t)),
        )
        return [t for _, t in ranked[:MULTITERM_MAX_EXPANSIONS]]

    def _window_scores(self, terms: list[str], gaps: int) -> dict:
        """Unordered window ("a b"~~gaps): every DISTINCT term occurs
        within a token window spanning <= len(terms)-1+gaps, any
        order (min_cover_span semantics); scored like phrase (summed
        per-term BM25)."""
        if not terms:
            return {}
        span = len(terms) - 1 + gaps
        plists = [self.postings.get(t, {}) for t in terms]
        cand = set(plists[0])
        for p in plists[1:]:
            cand &= set(p)
        per_term = {t: self._term_scores(t) for t in set(terms)}
        out = {}
        for d in cand:
            best = min_cover_span([p[d] for p in plists])
            if best is not None and best <= span:
                out[d] = sum(per_term[t].get(d, 0.0) for t in terms)
        return out

    def _near_scores(self, terms: list[str], slop: int) -> dict:
        """Ordered proximity ("a b"~slop): terms in query order with at
        most ``slop`` intervening tokens between CONSECUTIVE members.
        Forward DP over positions: reach_0 = positions(t0); reach_i =
        {q in positions(ti) : exists p in reach_{i-1}, 1 <= q-p <=
        slop+1}. Scoring identical to phrase (summed per-term BM25)."""
        if not terms:
            return {}
        plists = [self.postings.get(t, {}) for t in terms]
        cand = set(plists[0])
        for p in plists[1:]:
            cand &= set(p)
        per_term = {t: self._term_scores(t) for t in set(terms)}
        out = {}
        for d in cand:
            reach = list(plists[0][d])
            for p in plists[1:]:
                nxt = p[d]
                reach = [
                    q for q in nxt
                    if any(1 <= q - r <= slop + 1 for r in reach)
                ]
                if not reach:
                    break
            if reach:
                out[d] = sum(per_term[t].get(d, 0.0) for t in terms)
        return out

    def search_rescored(
        self,
        query: str,
        rescore: str,
        limit: int = 20,
        window: int = 100,
        weight: float = 2.0,
    ) -> list[tuple]:
        """Two-phase rescoring replay (same contract as the engines):
        primary top-window, secondary evaluated on those docs only,
        combined = primary + weight * secondary."""
        from xf_spark.query.parser import parse_query

        prim = self.search(query, limit=window)
        sec = self._eval(parse_query(rescore))
        combined = [
            (d, s + weight * sec.get(d, 0.0)) for d, s in prim
        ]
        combined.sort(key=lambda kv: (-kv[1], kv[0]))
        return combined[:limit]

    def search_demoted(
        self,
        query: str,
        negative: str,
        factor: float = 0.5,
        limit: int = 20,
    ) -> list[tuple]:
        """Boosting-query demotion replay: docs matching ``negative``
        keep their match at score * factor."""
        from xf_spark.query.parser import parse_query

        neg = set(self._eval(parse_query(negative)))
        out = [
            (d, s * (factor if d in neg else 1.0))
            for d, s in self._eval(parse_query(query)).items()
        ]
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:limit]

    # -- semantic / hybrid ------------------------------------------------

    def semantic_topk(self, query: str, texts: dict, limit: int = 20, doc_filter=None):
        """Brute-force cosine top-k over hash embeddings of ``texts``
        (doc_id -> raw text). Mirrors vector.rs:853-905: dot product of
        L2-normalized vectors, sort (score desc, doc_id asc)."""
        q = hash_embed(canonicalize_for_embedding(query))
        items = [
            (d, t) for d, t in texts.items() if doc_filter is None or doc_filter(d)
        ]
        scores = []
        for d, t in items:
            v = hash_embed(canonicalize_for_embedding(t or ""))
            scores.append((d, float(np.dot(q, v))))
        scores.sort(key=lambda kv: (-kv[1], kv[0]))
        return scores[:limit]

    @staticmethod
    def rrf_fuse(lexical: list, semantic: list, limit: int, offset: int = 0):
        """Reciprocal Rank Fusion, parity with hybrid.rs:136-202:
        score(d) = sum over lists of 1/(60 + rank + 1); tiebreaks
        score desc -> in-both first -> doc_id asc."""
        ranks_lex = {d: r for r, (d, _s) in enumerate(lexical)}
        ranks_sem = {d: r for r, (d, _s) in enumerate(semantic)}
        all_docs = set(ranks_lex) | set(ranks_sem)
        fused = []
        for d in all_docs:
            s = 0.0
            if d in ranks_lex:
                s += 1.0 / (RRF_K + ranks_lex[d] + 1)
            if d in ranks_sem:
                s += 1.0 / (RRF_K + ranks_sem[d] + 1)
            in_both = 1 if (d in ranks_lex and d in ranks_sem) else 0
            fused.append((d, s, in_both))
        fused.sort(key=lambda t: (-t[1], -t[2], t[0]))
        return [(d, s) for d, s, _ in fused[offset : offset + limit]]
