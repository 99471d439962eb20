"""Query-string parser — the reference's query language as an AST.

Grammar (parity with the reference's Tantivy QueryParser subset,
README.md:1384-1390 and search.rs:534-576):

- bare terms: ``rust async`` — implicit OR; BM25 scores sum over
  matching terms (docs matching any term qualify).
- quoted phrase: ``"machine learning"`` — exact positional adjacency
  (phrase queries use the positions-bearing text field only,
  search.rs:541-546).
- boolean: ``a AND b``, ``a OR b``, ``a NOT b`` (left-associative
  fold; NOT excludes the right operand's matches from the left's).
- prefix: ``progr*`` — matched against the edge-n-gram prefix field
  (search.rs:229-235); prefix terms are 2..15 chars by construction.
- empty string: match-all (search.rs:532-537). A NON-empty query whose
  tokens are all dropped by analysis (punctuation-only, or a single
  >=40-byte token removed by the RemoveLongFilter) matches NOTHING —
  Tantivy yields an empty boolean query there, and xf's match-all
  special case fires only on the empty *string* before parsing.
- field-specific: ``type:assistant text:rust`` (README.md:1384-1390).
  ``text:`` is the default field (the prefix is stripped);
  ``type:``/``role:`` become a doc-type FILTER AND-ed with the scored
  query — pinned divergence from Tantivy's should-clause scoring of
  the type field (the engine stores role as a doc attribute, not an
  indexed field; the reference's own doc_types path is likewise a
  Must filter, search.rs:554-576). A query that is ONLY field filters
  (``type:assistant``) matches all docs of that type. A field filter
  absorbs a pending AND/OR (the filter ANDs with the scored query by
  construction); ``NOT type:...`` is rejected with ValueError — the
  filter model has no negated-role representation, and silently
  restricting TO the role would invert intent.

Pinned divergence from Tantivy (documented per SURVEY.md §7.0): bare
terms search the ``text`` field only; the prefix field is reached only
via trailing ``*``. (Tantivy's QueryParser ORs both fields; the
dual-field score sum depends on Tantivy-internal per-field stats we
deliberately don't replicate. Engine and oracle share THIS grammar, so
they cannot diverge from each other.)

Beyond-reference extensions (Lucene/Tantivy query-language staples the
reference's parser subset lacks; each is oracled independently):

- sloppy phrase: ``"hash join"~2`` — ordered proximity: the terms
  appear in query order with at most ``slop`` intervening tokens
  between CONSECUTIVE members (slop 0 == exact phrase; ``~0`` parses
  to a plain phrase node). Scoring matches phrase scoring (summed
  per-term BM25 over matching docs).
- boost: ``spark^2`` / ``"hash join"^1.5`` — multiplies the atom's
  score contribution by the (positive) weight. ``^1`` is the
  identity and unwraps at parse time.
- minimum-should-match is an API knob (``min_should_match=m`` on the
  search surfaces), not query syntax — it rewrites a root OR into an
  ("msm", children, m) node: docs matching >= m of the OR's clauses,
  scored over their MATCHING clauses only (Lucene BooleanQuery
  setMinimumNumberShouldMatch semantics).

AST nodes (plain tuples, picklable into Spark closures):
  ("all",) | ("none",) | ("term", t) | ("prefix", p)
  | ("phrase", [t...]) | ("near", [t...], slop) | ("and", [n...])
  | ("or", [n...]) | ("not", base, excl) | ("boost", node, w)
  | ("msm", [n...], m)
"""

from __future__ import annotations

import re

from xf_spark.functions.textcore import tokenize

_TOKEN_RE = re.compile(
    r'\w+:"[^"]*"|"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?|\S+'
)
# trailing ^W boost on any atom (quoted or bare); W = positive decimal
_BOOST_RE = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$", re.DOTALL)
# "..."~N sloppy-phrase suffix (after any boost has been stripped)
_SLOP_RE = re.compile(r'^("[^"]*")~(\d+)$', re.DOTALL)


def _atom(raw: str):
    """One non-operator token -> AST node (or None if it tokenizes to
    nothing, e.g. punctuation-only). Trailing ``^W`` wraps the atom in
    a boost node; ``"..."~N`` builds a sloppy phrase."""
    bm = _BOOST_RE.match(raw)
    boost = None
    if bm:
        w = float(bm[2])
        if w <= 0:
            raise ValueError(f"boost must be positive: {raw!r}")
        raw, boost = bm[1], w
    node = _atom_base(raw)
    if node is None:
        return None
    if boost is not None and boost != 1.0:
        node = ("boost", node, boost)
    return node


def _atom_base(raw: str):
    sm = _SLOP_RE.match(raw)
    if sm:
        terms = tokenize(sm[1][1:-1])
        slop = int(sm[2])
        if not terms:
            return None
        if len(terms) == 1:
            return ("term", terms[0])
        if slop == 0:
            return ("phrase", terms)
        return ("near", terms, slop)
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        terms = tokenize(raw[1:-1])
        if not terms:
            return None
        if len(terms) == 1:
            return ("term", terms[0])
        return ("phrase", terms)
    if raw.endswith("*") and len(raw) > 1:
        terms = tokenize(raw[:-1])
        if not terms:
            return None
        if len(terms) == 1:
            return ("prefix", terms[0])
        # one input word splitting into several tokens ("foo-bar*"):
        # the leading tokens stay required terms; only the last carries
        # the trailing-* prefix semantics. Dropping the head would match
        # every doc with a bar-prefixed word regardless of foo.
        return ("and", [("term", t) for t in terms[:-1]] + [("prefix", terms[-1])])
    terms = tokenize(raw)
    if not terms:
        return None
    if len(terms) == 1:
        return ("term", terms[0])
    # one input word splitting into several tokens ("don't") — pinned
    # to a phrase, matching Tantivy's tokenized-word behavior
    return ("phrase", terms)


_FIELD_RE = re.compile(r"^(\w+):(.+)$", re.DOTALL)
_TYPE_FIELDS = ("type", "role")


def parse_query(query: str):
    """Parse a query string into the AST; "" -> ("all",). Field
    filters (type:/role:) are extracted and dropped — use
    parse_query_extract when the caller can apply them."""
    return parse_query_extract(query)[0]


def parse_query_extract(query: str):
    """Parse into (AST, roles|None): type:/role: atoms become the
    returned doc-type filter list; text: prefixes are stripped."""
    query = (query or "").strip()
    if not query:
        return ("all",), None

    raws = _TOKEN_RE.findall(query)
    acc = None
    qroles: list[str] = []
    pending_op = None  # "AND" | "OR" | "NOT" | None (None => implicit OR)
    for raw in raws:
        if raw in ("AND", "OR", "NOT"):
            # leading / dangling operators are syntax noise, not terms
            if acc is not None:
                pending_op = raw
            elif raw == "NOT":
                # a LEADING Not has no term operand to bind, but if the
                # next atom is a field filter it still reads as intent
                # to exclude that role -- remember it so the filter
                # branch can reject instead of silently inverting
                pending_op = "NOT"
            continue
        fm = _FIELD_RE.match(raw)
        if fm and fm[1].lower() in _TYPE_FIELDS:
            # the filter consumes any pending operator: a NOT would
            # silently invert intent (restrict TO the role AND leak the
            # dangling NOT onto the next atom) -> reject; AND/OR are
            # absorbed by the filter's implicit AND semantics.
            if pending_op == "NOT":
                raise ValueError(
                    f"negated field filters are not supported: NOT {raw!r} "
                    "(role filters AND with the query; use --roles to "
                    "select the roles you want instead)"
                )
            pending_op = None
            val = fm[2].strip('"')
            if val:
                qroles.append(val.lower())
            continue
        if fm and fm[1].lower() == "text":
            raw = fm[2]
        node = _atom(raw)
        if node is None:
            # the operand dissolved (punctuation-only / over-long token):
            # its operator dissolves with it — leaving pending_op set
            # would misapply the NOT/AND to the NEXT unrelated atom
            # ('rust NOT !!! tokio' must not exclude tokio)
            pending_op = None
            continue
        if acc is None:
            acc = node
        elif pending_op == "AND":
            if acc[0] == "and":
                acc = ("and", acc[1] + [node])
            else:
                acc = ("and", [acc, node])
        elif pending_op == "NOT":
            acc = ("not", acc, node)
        else:  # explicit OR or implicit juxtaposition
            if acc[0] == "or":
                acc = ("or", acc[1] + [node])
            else:
                acc = ("or", [acc, node])
        pending_op = None
    if acc is None:
        # only field filters -> match-all within the filter;
        # otherwise non-empty input with no usable atoms -> empty query
        acc = ("all",) if qroles else ("none",)
    return acc, (qroles or None)


def apply_min_should_match(plan, m: int):
    """Rewrite a parsed plan for ``min_should_match=m`` (Lucene
    BooleanQuery setMinimumNumberShouldMatch semantics): a root OR's
    clauses become m-of-n should clauses; a single-clause plan with
    m > 1 can never satisfy the bar (-> none); AND/NOT/match-all roots
    have no should clauses to count — refused loudly rather than
    silently ignored."""
    if m <= 1:
        return plan
    kind = plan[0]
    if kind == "or":
        return ("none",) if m > len(plan[1]) else ("msm", plan[1], m)
    if kind in ("term", "prefix", "phrase", "near", "boost"):
        return ("none",)
    if kind == "none":
        return plan
    raise ValueError(
        f"min_should_match={m} requires an OR query (should clauses); "
        f"got a {kind!r} root"
    )


def strip_type_filters(query: str) -> str:
    """The raw query text with type:/role: atoms removed — what the
    semantic branch should EMBED when the query carries a doc-type
    filter (the filter is a predicate, not semantic content; embedding
    the literal token 'role:assistant' pollutes the query vector).
    Purely textual: validation, incl. the NOT-filter rejection, is
    parse_query_extract's job — call it first."""
    raws = _TOKEN_RE.findall((query or "").strip())
    kept = []
    i = 0
    while i < len(raws):
        raw = raws[i]
        fm = _FIELD_RE.match(raw)
        if fm and fm[1].lower() in _TYPE_FIELDS:
            # the operator bound to a dissolved filter atom dissolves
            # with it (mirrors parse_query_extract): drop a preceding
            # AND/OR; with none, a following operator was dangling
            # (leading-operator skip) — drop that instead. Leaving it
            # would hash-embed the literal word 'and'/'or' into the
            # query vector — the pollution this function removes.
            if kept and kept[-1] in ("AND", "OR"):
                kept.pop()
            elif i + 1 < len(raws) and raws[i + 1] in ("AND", "OR", "NOT"):
                i += 1
            i += 1
            continue
        kept.append(raw)
        i += 1
    return " ".join(kept)


def query_terms(node) -> set[str]:
    """All text-field terms referenced by the AST (for postings
    partition pruning); excludes prefix terms. NOT-excluded terms are
    INCLUDED deliberately: the excluded operand's postings must survive
    partition pruning or the NOT filter would see no postings to
    subtract (segment_search relies on this — do not "fix" it)."""
    kind = node[0]
    if kind == "term":
        return {node[1]}
    if kind in ("phrase", "near"):
        return set(node[1])
    if kind in ("and", "or", "msm"):
        out: set[str] = set()
        for c in node[1]:
            out |= query_terms(c)
        return out
    if kind == "not":
        return query_terms(node[1]) | query_terms(node[2])
    if kind == "boost":
        return query_terms(node[1])
    return set()


def prefix_terms(node) -> set[str]:
    kind = node[0]
    if kind == "prefix":
        return {node[1]}
    if kind in ("and", "or", "msm"):
        out: set[str] = set()
        for c in node[1]:
            out |= prefix_terms(c)
        return out
    if kind == "not":
        return prefix_terms(node[1]) | prefix_terms(node[2])
    if kind == "boost":
        return prefix_terms(node[1])
    return set()


def fuzzy_term_leaves(node) -> set[str]:
    """The term leaves expand_fuzzy_plan would rewrite — phrase and
    prefix words excluded (they stay exact), unlike query_terms. Used
    to prime the batched variant lookup with exactly the needed set."""
    kind = node[0]
    if kind == "term":
        return {node[1]}
    if kind in ("and", "or", "msm"):
        out: set[str] = set()
        for c in node[1]:
            out |= fuzzy_term_leaves(c)
        return out
    if kind == "not":
        return fuzzy_term_leaves(node[1]) | fuzzy_term_leaves(node[2])
    if kind == "boost":
        return fuzzy_term_leaves(node[1])
    return set()


def term_leaf_counts(node):
    """(Counter of text-term leaves, Counter of prefix leaves) in the
    SCORED part of a plan — multiplicity preserved ('rust rust' is two
    should-clauses whose idf doubles, matching search()); a NOT's
    exclusion branch contributes nothing (it only removes docs).
    Raises on phrase nodes: a positional score is not a per-term sum,
    so explain() refuses rather than fabricating a breakdown."""
    from collections import Counter

    kind = node[0]
    if kind == "term":
        return Counter({node[1]: 1}), Counter()
    if kind == "prefix":
        return Counter(), Counter({node[1]: 1})
    if kind in ("phrase", "near"):
        raise ValueError(
            "explain does not support phrases nested in a larger plan "
            "(a doc can reach the top-k without the adjacency, so "
            "member-term rows would overstate its score); a pure "
            "phrase query IS supported"
        )
    if kind == "msm":
        raise ValueError(
            "explain does not support min_should_match plans (a doc's "
            "score sums only its MATCHING clauses, so flat member-term "
            "rows would overstate it)"
        )
    if kind in ("and", "or"):
        t, p = Counter(), Counter()
        for c in node[1]:
            ct, cp = term_leaf_counts(c)
            t += ct
            p += cp
        return t, p
    if kind == "not":
        return term_leaf_counts(node[1])
    if kind == "boost":
        # boost w == w should-copies of the child: scale its leaf
        # multiplicities (explain's math multiplies idf*tf by count,
        # which is exactly the boost semantics)
        t, p = term_leaf_counts(node[1])
        w = node[2]
        return (
            Counter({k: v * w for k, v in t.items()}),
            Counter({k: v * w for k, v in p.items()}),
        )
    return Counter(), Counter()  # all / none


def expand_fuzzy_plan(plan, variants_fn):
    """Rewrite for fuzzy matching (the reference's `search.fuzzy` knob,
    config.rs:75): each ("term", t) leaf becomes an OR over the
    distance-1 vocabulary neighbors ``variants_fn(t)`` returns, each
    variant scored with its OWN idf (Lucene FuzzyQuery rewrite).
    Phrases and prefix leaves stay exact — positional adjacency over a
    variant cross-product is quadratic noise, and prefix already
    matches a term family. Expanded leaves splice into a parent OR:
    nested ORs score identically (sum over matching terms) but would
    fall off the root WAND fast path."""
    kind = plan[0]
    if kind == "term":
        variants = variants_fn(plan[1])
        if variants == [plan[1]]:
            return plan
        return ("or", [("term", v) for v in variants])
    if kind == "or":
        out = []
        for c in plan[1]:
            e = expand_fuzzy_plan(c, variants_fn)
            if e[0] == "or":
                out.extend(e[1])
            else:
                out.append(e)
        return ("or", out)
    if kind == "and":
        return ("and", [expand_fuzzy_plan(c, variants_fn) for c in plan[1]])
    if kind == "not":
        return (
            "not",
            expand_fuzzy_plan(plan[1], variants_fn),
            expand_fuzzy_plan(plan[2], variants_fn),
        )
    if kind == "boost":
        return ("boost", expand_fuzzy_plan(plan[1], variants_fn), plan[2])
    if kind == "msm":
        # each CLAUSE expands independently; the m-of-n count is over
        # clauses, so a clause becoming an OR of variants still counts
        # as one (matches iff any variant matches)
        return (
            "msm",
            [expand_fuzzy_plan(c, variants_fn) for c in plan[1]],
            plan[2],
        )
    return plan
