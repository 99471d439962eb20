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
- wildcard term: ``te*m`` / ``t?st`` / ``*ing`` — ``*`` = any run,
  ``?`` = one char (Lucene WildcardQuery). Resolved at search time
  against the term dictionary: the MULTITERM_MAX_EXPANSIONS
  highest-df matching terms (df desc, term asc — the fuzzy ranking)
  become an OR, each scored with its own idf. A bare trailing ``*``
  with no other wildcard stays a ("prefix",) node (the edge-n-gram
  field is cheaper than a dictionary scan).
- fuzzy term: ``machne~`` / ``machne~1`` / ``machne~2`` — Levenshtein
  distance d vocabulary neighbors (Lucene FuzzyQuery syntax; the
  fuzzy=True knob is the query-wide d=1 equivalent). Bare ``~``
  pins d=1 — the knob's distance — not Lucene's default 2; ``~0``
  unwraps to the exact term; d > 2 is rejected (as in Lucene).
  Terms shorter than FUZZY_MIN_LEN stay exact (AUTO clamping).
- unordered window: ``"a b"~~G`` — every DISTINCT term occurs within
  a token window spanning <= n_terms-1+G, in ANY order (the ES
  intervals ``all_of(ordered=false, max_gaps=G)`` analog; minimal
  cover via the merged-events sliding window). ``~N`` (one tilde)
  stays the ORDERED proximity above; duplicate words collapse.
  Scoring matches phrase scoring.
- phrase prefix: ``"machine lear*"`` — match_phrase_prefix: the last
  word is a dictionary prefix; the atom expands to an OR of exact
  phrases, one per expansion (capped, df desc). OR-of-phrase scoring
  applies: a doc matching several expansions sums them.

The three dictionary-resolved atoms parse to UNRESOLVED nodes
(("wildcard", pat) | ("fuzzy", t, d) | ("phrase_prefix", fixed, pfx));
every engine rewrites them with expand_multiterm_plan + its own
vocabulary before evaluation, so downstream operators only ever see
the classic node kinds. Expansion is one term-dictionary scan per
novel leaf (the same cost class as Lucene's FST automaton walk),
memoized per index lifetime, and the cap bounds downstream cost.

AST nodes (plain tuples, picklable into Spark closures):
  ("all",) | ("none",) | ("term", t) | ("prefix", p)
  | ("phrase", [t...]) | ("near", [t...], slop) | ("and", [n...])
  | ("or", [n...]) | ("not", base, excl) | ("boost", node, w)
  | ("msm", [n...], m) | ("wildcard", pat) | ("fuzzy", t, d)
  | ("phrase_prefix", [fixed...], pfx) | ("window", [t...], gaps)
"""

from __future__ import annotations

import re

from xf_spark.functions.textcore import tokenize

_TOKEN_RE = re.compile(
    r'\w+:"[^"]*"|"[^"]*"(?:~~?\d+)?(?:\^\d+(?:\.\d+)?)?|\S+'
)
# trailing ^W boost on any atom (quoted or bare); W = positive decimal
_BOOST_RE = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$", re.DOTALL)
# "..."~N sloppy-phrase suffix (after any boost has been stripped)
_SLOP_RE = re.compile(r'^("[^"]*")~(\d+)$', re.DOTALL)
# "..."~~G unordered-window suffix: all terms within a window with at
# most G total gaps, ANY order (ES intervals all_of max_gaps analog)
_WSLOP_RE = re.compile(r'^("[^"]*")~~(\d+)$', re.DOTALL)
# bare-term ~d fuzzy suffix: base~ | base~N (after boost strip); N is
# validated in _atom_base — multi-digit distances must reach the
# loud ValueError, not silently re-tokenize
_FUZZY_RE = re.compile(r"^([^\s\"~]+)~(\d*)$", re.DOTALL)

# dictionary-expansion cap shared by wildcard / fuzzy / phrase-prefix
# atoms across every engine AND the oracles (Lucene FuzzyQuery's
# maxExpansions default) — ranking is always (df desc, term asc)
MULTITERM_MAX_EXPANSIONS = 50


def wildcard_to_like(pat: str) -> str:
    """Wildcard pattern -> SQL LIKE pattern (``*``->%, ``?``->_).
    Pattern chars are restricted to alphanumerics + wildcards at parse
    time, so no LIKE metacharacter escaping is needed."""
    return pat.replace("*", "%").replace("?", "_")


def wildcard_literal_prefix(pat: str) -> str:
    """The literal run before the first wildcard char — a pushdown-
    friendly startswith predicate for dictionary scans ('' when the
    pattern leads with a wildcard)."""
    for i, c in enumerate(pat):
        if c in "*?":
            return pat[:i]
    return pat


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
    wm = _WSLOP_RE.match(raw)
    if wm:
        inner = wm[1][1:-1].strip()
        if inner.endswith("*") and len(inner) >= 2 and not inner[-2].isspace():
            raise ValueError(
                f"window proximity and phrase-prefix cannot combine: {raw!r}"
            )
        # unordered window over the DISTINCT terms (duplicate words
        # collapse — the window covers each distinct term once)
        terms = sorted(set(tokenize(inner)))
        if not terms:
            return None
        if len(terms) == 1:
            return ("term", terms[0])
        return ("window", terms, int(wm[2]))
    sm = _SLOP_RE.match(raw)
    if sm:
        inner = sm[1][1:-1].strip()
        if inner.endswith("*") and len(inner) >= 2 and not inner[-2].isspace():
            raise ValueError(
                f"slop and phrase-prefix cannot combine: {raw!r}"
            )
        terms = tokenize(inner)
        slop = int(sm[2])
        if not terms:
            return None
        if len(terms) == 1:
            return ("term", terms[0])
        if slop == 0:
            return ("phrase", terms)
        return ("near", terms, slop)
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        inner = raw[1:-1].strip()
        if inner.endswith("*") and len(inner) >= 2 and not inner[-2].isspace():
            # match_phrase_prefix: the * is ATTACHED to the last word
            # ("machine lear*"); a detached star ("machine learning *")
            # is punctuation and dissolves in tokenization below —
            # converting the previous word into a prefix would silently
            # widen the phrase
            terms = tokenize(inner[:-1])
            if not terms:
                return None
            if len(terms) == 1:
                return ("prefix", terms[0])
            return ("phrase_prefix", terms[:-1], terms[-1])
        terms = tokenize(inner)
        if not terms:
            return None
        if len(terms) == 1:
            return ("term", terms[0])
        return ("phrase", terms)
    fz = _FUZZY_RE.match(raw)
    if fz:
        terms = tokenize(fz[1])
        if len(terms) == 1:
            d = int(fz[2]) if fz[2] else 1
            if d > 2:
                raise ValueError(
                    f"fuzzy distance above 2 is not supported: {raw!r}"
                )
            return ("term", terms[0]) if d == 0 else ("fuzzy", terms[0], d)
        # the base splits into several tokens ("foo-bar~1") or none:
        # no single dictionary term to fuzz — fall through to the
        # plain tokenization of the whole atom (the ~ is punctuation)
    lowered = raw.lower()
    if (
        ("?" in lowered or "*" in lowered[:-1])
        # alphanumerics + wildcards ONLY — '_' is excluded because the
        # tokenizer splits on it (no term can contain one) AND it is a
        # LIKE metacharacter: admitting it would make the SQL-LIKE
        # engines match where the fnmatch oracle/percolate cannot
        and re.fullmatch(r"(?:[^\W_]|[*?])+", lowered)
        and re.search(r"\w", lowered.replace("*", "").replace("?", ""))
    ):
        return ("wildcard", lowered)
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
    if kind in ("phrase", "near", "window"):
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
    if kind in ("phrase", "near", "window"):
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


def multiterm_leaves(node) -> set:
    """The dictionary-resolved leaves in a plan, as hashable keys:
    ("wildcard", pat) | ("fuzzy", term, d) | ("pprefix", pfx). Engines
    resolve each key against their vocabulary ONCE (batched, memoized)
    and feed the result to expand_multiterm_plan."""
    kind = node[0]
    if kind == "wildcard":
        return {("wildcard", node[1])}
    if kind == "fuzzy":
        return {("fuzzy", node[1], node[2])}
    if kind == "phrase_prefix":
        return {("pprefix", node[2])}
    if kind in ("and", "or", "msm"):
        out: set = set()
        for c in node[1]:
            out |= multiterm_leaves(c)
        return out
    if kind == "not":
        return multiterm_leaves(node[1]) | multiterm_leaves(node[2])
    if kind == "boost":
        return multiterm_leaves(node[1])
    return set()


def expand_multiterm_plan(plan, variants: dict):
    """Rewrite dictionary-resolved atoms into classic nodes, given
    ``variants``: leaf key (multiterm_leaves format) -> ranked term
    list (df desc, term asc, capped at MULTITERM_MAX_EXPANSIONS).

    - wildcard -> OR of matching terms, each with its own idf
      (Lucene WildcardQuery under a top-terms rewrite); no match ->
      ("none",).
    - fuzzy -> OR of vocabulary neighbors (same shape as the
      fuzzy=True knob's expansion); no neighbor -> the exact term
      (which then matches nothing, like any absent term).
    - phrase_prefix -> OR of exact phrases, one per expansion of the
      trailing prefix (match_phrase_prefix); no expansion -> ("none",).

    Expanded leaves splice into a parent OR (same WAND-preserving
    flattening as expand_fuzzy_plan); an msm clause that expands
    still counts as ONE clause."""
    kind = plan[0]
    if kind == "wildcard":
        terms = variants[("wildcard", plan[1])]
        if not terms:
            return ("none",)
        if len(terms) == 1:
            return ("term", terms[0])
        return ("or", [("term", t) for t in terms])
    if kind == "fuzzy":
        terms = variants[("fuzzy", plan[1], plan[2])]
        if not terms:
            return ("term", plan[1])
        if len(terms) == 1:
            return ("term", terms[0])
        return ("or", [("term", t) for t in terms])
    if kind == "phrase_prefix":
        exps = variants[("pprefix", plan[2])]
        if not exps:
            return ("none",)
        phrases = [("phrase", list(plan[1]) + [e]) for e in exps]
        if len(phrases) == 1:
            return phrases[0]
        return ("or", phrases)
    if kind == "or":
        out = []
        for c in plan[1]:
            e = expand_multiterm_plan(c, variants)
            if e[0] == "or":
                out.extend(e[1])
            elif e[0] != "none":
                out.append(e)
        if not out:
            return ("none",)
        if len(out) == 1:
            return out[0]
        return ("or", out)
    if kind == "and":
        return ("and", [expand_multiterm_plan(c, variants) for c in plan[1]])
    if kind == "not":
        return (
            "not",
            expand_multiterm_plan(plan[1], variants),
            expand_multiterm_plan(plan[2], variants),
        )
    if kind == "boost":
        return ("boost", expand_multiterm_plan(plan[1], variants), plan[2])
    if kind == "msm":
        out = [expand_multiterm_plan(c, variants) for c in plan[1]]
        return ("msm", out, plan[2])
    return plan


def expand_synonyms_plan(plan, syn_map: dict):
    """Query-time synonym expansion (the Elasticsearch synonym-filter
    UX, applied at the plan level): each ("term", t) leaf with an entry
    in ``syn_map`` becomes an OR of the original term plus its
    synonyms, each scored with its OWN idf. A multi-word synonym
    ("ml" -> "machine learning") contributes a PHRASE node — matching
    the ES synonym_graph position-honoring behavior rather than
    word-soup. Keys and synonym strings are analyzed with the index
    tokenizer; phrase/prefix/near leaves stay exact (same policy as
    the fuzzy rewrite). Expanded leaves splice into a parent OR; an
    msm clause that expands still counts as ONE clause."""
    norm: dict = {}
    for k, syns in syn_map.items():
        kt = tokenize(k)
        if len(kt) != 1:
            raise ValueError(
                f"synonym keys must analyze to one term: {k!r} -> {kt}"
            )
        nodes = []
        for s in syns:
            st = tokenize(s)
            if not st:
                continue
            nodes.append(("term", st[0]) if len(st) == 1 else ("phrase", st))
        if nodes:
            norm[kt[0]] = nodes

    def rewrite(node):
        kind = node[0]
        if kind == "term":
            extra = norm.get(node[1])
            if not extra:
                return node

            def key(n):
                return (n[0], tuple(n[1]) if isinstance(n[1], list) else n[1])

            seen, clauses = {key(node)}, [node]
            for e in extra:
                if key(e) not in seen:
                    seen.add(key(e))
                    clauses.append(e)
            return ("or", clauses) if len(clauses) > 1 else node
        if kind == "or":
            out = []
            for c in node[1]:
                e = rewrite(c)
                if e[0] == "or":
                    out.extend(e[1])
                else:
                    out.append(e)
            return ("or", out)
        if kind == "and":
            return ("and", [rewrite(c) for c in node[1]])
        if kind == "not":
            return ("not", rewrite(node[1]), rewrite(node[2]))
        if kind == "boost":
            return ("boost", rewrite(node[1]), node[2])
        if kind == "msm":
            return ("msm", [rewrite(c) for c in node[1]], node[2])
        return node

    return rewrite(plan) if norm else plan
