"""Percolate — reverse search (the Elasticsearch percolator UX).

Register queries once, then ask for each incoming document WHICH
queries match it: the alerting/routing primitive for streaming ingest
(ES percolate queries; Lucene MemoryIndex-per-doc matching). The
reference has no analog — this is a beyond-reference operator, but the
query grammar is exactly the engine's (`xf_spark.query.parser`), so a
registered alert means the same thing as the search box.

Semantics (membership, not scoring — the ES percolator default):
- every classic node matches per the search engine's contract: terms,
  phrase adjacency, "a b"~slop ordered proximity, AND/OR/NOT,
  min-should-match, boosts (weight irrelevant to membership),
  prefix via the edge-n-gram contract (`generate_prefixes`: first 100
  words, 2..15-char prefixes — so percolate(q) membership ==
  search(q) membership, including its documented length bounds);
- dictionary-resolved atoms (wildcard / ~d fuzzy / phrase-prefix)
  evaluate against the DOCUMENT'S OWN terms — a single doc is its own
  vocabulary, so no MULTITERM_MAX_EXPANSIONS cap applies (pinned
  divergence from search, where a hot dictionary could overflow the
  cap; per-doc there is nothing to cap);
- `type:`/`role:` query filters match against ``role_col``.

Scale shape (the 100 TB contract): queries are parsed ONCE on the
driver and shipped in the task closure (a query table is kilobytes);
documents stream through ONE mapInPandas pass — no shuffle, no join,
no index. Per doc: one tokenize, then a conjunctive REQUIRED-TERM
prefilter (the Lucene percolator's term-extraction pruning) skips
every query whose must-appear terms are absent, so the full AST walk
runs only for candidate (doc, query) pairs. Cost is linear in corpus
size and embarrassingly parallel — the ideal shape for alerting over
a firehose partition-by-partition.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from xf_spark.functions.textcore import generate_prefixes, tokenize
from xf_spark.query.parser import parse_query_extract


def required_terms(node) -> set[str]:
    """Terms that MUST appear in a matching doc (the conjunctive
    prefilter): exact for term/phrase/near/AND chains, conservative
    (intersection) for OR/msm, empty for dictionary atoms and prefix
    (they have no fixed term). A NOT's exclusion branch contributes
    nothing — it can only remove matches."""
    kind = node[0]
    if kind == "term":
        return {node[1]}
    if kind in ("phrase", "near", "window"):
        return set(node[1])
    if kind == "phrase_prefix":
        return set(node[1])  # the fixed members
    if kind == "and":
        out: set[str] = set()
        for c in node[1]:
            out |= required_terms(c)
        return out
    if kind == "or":
        sets = [required_terms(c) for c in node[1]]
        out = sets[0] if sets else set()
        for s in sets[1:]:
            out &= s
        return out
    if kind == "msm":
        # m-of-n: a term is required only if it is required by MORE
        # than n-m clauses (dropping all clauses containing it still
        # leaves < m matchable clauses). Conservative: full
        # intersection, as for OR.
        sets = [required_terms(c) for c in node[1]]
        out = sets[0] if sets else set()
        for s in sets[1:]:
            out &= s
        return out
    if kind == "not":
        return required_terms(node[1])
    if kind == "boost":
        return required_terms(node[1])
    return set()


def _wildcard_rx(pat: str):
    """Compiled wildcard matcher, memoized per process — the hot loop
    evaluates registered queries against EVERY streamed doc, and
    re-running fnmatch.translate + re.compile per (doc, query) relies
    on re's evictable 512-entry cache. Registered patterns are a
    small driver-side set, so the memo is bounded."""
    rx = _WILDCARD_RX.get(pat)
    if rx is None:
        import fnmatch
        import re as _re

        rx = _WILDCARD_RX[pat] = _re.compile(fnmatch.translate(pat))
    return rx


_WILDCARD_RX: dict = {}


def _match_node(node, toks: list, tokset: set, prefixes, text: str) -> bool:
    """Evaluate one AST node against one tokenized doc. ``prefixes``
    is a lazy holder: [set] or [] (built on first prefix-node hit)."""
    kind = node[0]
    if kind == "all":
        return True
    if kind == "none":
        return False
    if kind == "term":
        return node[1] in tokset
    if kind == "prefix":
        if not prefixes:
            prefixes.append(set(generate_prefixes(text)))
        return node[1] in prefixes[0]
    if kind in ("phrase", "near"):
        terms = node[1]
        if any(t not in tokset for t in terms):
            return False
        slop = node[2] if kind == "near" else 0
        pos = {t: [i for i, w in enumerate(toks) if w == t] for t in set(terms)}
        reach = pos[terms[0]]
        for t in terms[1:]:
            reach = [
                q for q in pos[t] if any(1 <= q - r <= slop + 1 for r in reach)
            ]
            if not reach:
                return False
        return True
    if kind == "window":
        from xf_spark.oracle import min_cover_span

        wterms = node[1]
        if any(t not in tokset for t in wterms):
            return False
        plists = [
            [i for i, w in enumerate(toks) if w == t] for t in wterms
        ]
        best = min_cover_span(plists)
        return best is not None and best <= len(wterms) - 1 + node[2]
    if kind == "phrase_prefix":
        fixed, pfx = node[1], node[2]
        if any(t not in tokset for t in fixed):
            return False
        pos = {t: [i for i, w in enumerate(toks) if w == t] for t in set(fixed)}
        reach = pos[fixed[0]]
        for t in fixed[1:]:
            reach = [q for q in pos[t] if (q - 1) in set(reach)]
            if not reach:
                return False
        return any(
            r + 1 < len(toks) and toks[r + 1].startswith(pfx) for r in reach
        )
    if kind == "wildcard":
        return any(_wildcard_rx(node[1]).match(t) for t in tokset)
    if kind == "fuzzy":
        from xf_spark.oracle import _levenshtein
        from xf_spark.query.segment_search import FUZZY_MIN_LEN

        t0, d = node[1], node[2]
        if len(t0) < FUZZY_MIN_LEN:
            return t0 in tokset  # AUTO clamp, as in search
        return any(
            abs(len(t) - len(t0)) <= d and _levenshtein(t, t0, d) <= d
            for t in tokset
        )
    if kind == "and":
        return all(_match_node(c, toks, tokset, prefixes, text) for c in node[1])
    if kind == "or":
        return any(_match_node(c, toks, tokset, prefixes, text) for c in node[1])
    if kind == "msm":
        m = node[2]
        n = 0
        for c in node[1]:
            if _match_node(c, toks, tokset, prefixes, text):
                n += 1
                if n >= m:
                    return True
        return False
    if kind == "not":
        return _match_node(
            node[1], toks, tokset, prefixes, text
        ) and not _match_node(node[2], toks, tokset, prefixes, text)
    if kind == "boost":
        return _match_node(node[1], toks, tokset, prefixes, text)
    raise ValueError(f"unknown node {kind}")


def matches_doc(query_or_plan, text: str, role: str | None = None) -> bool:
    """Single-doc membership (the MemoryIndex-per-doc view): parse (or
    accept a pre-parsed (plan, roles) pair) and evaluate against one
    text. Used by the mapInPandas kernel and directly testable."""
    if isinstance(query_or_plan, str):
        plan, qroles = parse_query_extract(query_or_plan)
    else:
        plan, qroles = query_or_plan
    if qroles and (role is None or role.lower() not in qroles):
        return False
    toks = tokenize(text)
    return _match_node(plan, toks, set(toks), [], text)


PERCOLATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("qid", T.StringType()),
    ]
)


def percolate(
    docs: DataFrame,
    queries: Iterable[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    role_col: str | None = None,
) -> DataFrame:
    """(doc_id, qid) for every registered query that matches each doc.

    ``queries``: (qid, query string) pairs — parsed ONCE here on the
    driver (malformed queries raise immediately, naming the qid), then
    shipped in the closure. A query carrying ``type:``/``role:``
    filters requires ``role_col``.

    One mapInPandas pass over ``docs`` — no shuffle; per-partition
    cost = tokenize + prefilter + candidate AST walks (see module
    docstring). Output is unordered (order by (doc_id, qid) at the
    sink if determinism is needed)."""
    parsed: list[tuple[str, tuple, frozenset | None, frozenset]] = []
    for qid, q in queries:
        try:
            plan, qroles = parse_query_extract(q)
        except ValueError as e:
            raise ValueError(f"percolate query {qid!r}: {e}") from e
        if qroles and role_col is None:
            raise ValueError(
                f"percolate query {qid!r} filters on role — pass role_col"
            )
        parsed.append(
            (
                qid,
                plan,
                frozenset(qroles) if qroles else None,
                frozenset(required_terms(plan)),
            )
        )

    cols = [id_col, text_col] + ([role_col] if role_col else [])
    src = docs.select(*cols)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out_ids, out_qids = [], []
            texts = pdf[text_col]
            ids = pdf[id_col]
            roles = pdf[role_col] if role_col else None
            for i in range(len(pdf)):
                text = texts.iat[i] or ""
                toks = tokenize(text)
                tokset = set(toks)
                prefixes: list = []  # lazy per-doc prefix set
                role = roles.iat[i] if roles is not None else None
                for qid, plan, qroles, req in parsed:
                    if qroles is not None and (
                        role is None or role.lower() not in qroles
                    ):
                        continue
                    if not req <= tokset:
                        continue
                    if _match_node(plan, toks, tokset, prefixes, text):
                        out_ids.append(int(ids.iat[i]))
                        out_qids.append(qid)
            yield pd.DataFrame({"doc_id": out_ids, "qid": out_qids})

    return src.mapInPandas(run, schema=PERCOLATE_SCHEMA)
