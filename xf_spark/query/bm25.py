"""BM25 query engine — DataFrame path (global-stats, rank-identical).

Evaluates the parsed query AST over postings DataFrames with the
pinned scoring semantics (see xf_spark.oracle — identical constants
and formula; oracle and engine share tokenizer + parser, so the only
thing this module must get right is the relational plan).

Plan shape per node (SURVEY.md §2.3 mapping):
- term / implicit-OR of terms: ONE postings scan filtered to the query
  terms (predicate pushdown at the source), broadcast join of the tiny
  (term, idf) table, score expression in whole-stage codegen, one
  groupBy(doc_id) sum. No per-row Python anywhere.
- AND: same single scan + groupBy(doc_id) with an n-distinct-terms
  filter (count-distinct over <=8 query terms — cheap) — NOT a join
  chain.
- NOT: left_anti join on doc_id.
- phrase: candidate AND (same scan) then positional-adjacency check in
  one vectorized pandas UDF over the (term -> positions) map — runs
  only on candidate docs (docs containing ALL phrase terms).
- match-all: score 1.0 for every doc (search.rs:532-537).
- top-k: orderBy(score desc, doc_id asc).limit(k) — Spark compiles
  this to TakeOrderedAndProject: per-partition heaps + k-sized merge,
  the same two-phase shape as the reference's chunked heap merge
  (vector.rs:913-993), and the tiebreak is pinned.

Filters (role / ts) run BEFORE top-k (no adaptive refetch loop,
SURVEY.md §2.3 "Adaptive fetch"); BM25 stats stay index-global under
filters, matching the reference (type filter is a Must clause over the
same global index, search.rs:554-576).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from xf_spark.index.postings import CorpusStats

K1 = 1.2
B = 0.75


def idf_for(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _det_sum_by(key_col: str, val_col: str):
    """Aggregate expression: sum ``val_col`` per group in ``key_col``
    order — a float sum whose addition order is pinned, so the value
    is bit-identical across re-evaluations regardless of partial-agg
    arrival order (collect_list alone is order-nondeterministic;
    array_sort pins it). Group sizes here are bounded by the query's
    term/branch count, so the list is a few elements."""
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct(key_col, val_col))),
        F.lit(0.0),
        lambda acc, x: acc + x[val_col],
    )


def _score_col(idf_col, stats: CorpusStats, norms: str = "exact"):
    """BM25 expression over (tf, dl) columns — pure Catalyst, codegen'd.

    ``norms="tantivy"`` routes dl through the Lucene SmallFloat
    256-entry fieldnorm table (the reference's Tantivy byte-quantized
    norms, search.rs:579) — still a JVM-side expression. Default stays
    the repo's pinned exact-length semantics (SURVEY.md §7.0)."""
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    if norms == "tantivy":
        from xf_spark.functions.fieldnorm import quantize_col

        dl = quantize_col(F.col("dl")).cast("double")
    denom = tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / F.lit(stats.avgdl))
    return idf_col * tf * F.lit(K1 + 1.0) / denom


@dataclass
class BM25Engine:
    """Query engine over built index DataFrames.

    docs:     (doc_id, conv_id, turn_idx, role, text, tool, ts)
    postings: (term, doc_id, tf, dl[, positions])
    prefix_postings: (term, doc_id, tf, dl) or None
    stats:    global CorpusStats
    """

    docs: DataFrame
    postings: DataFrame
    stats: CorpusStats
    prefix_postings: DataFrame | None = None
    vocab: DataFrame | None = None         # (term, df) — cached, vocab-sized
    prefix_vocab: DataFrame | None = None
    # fuzzy-expansion memo: query term -> sorted variant list (the
    # vocabulary is static per engine build)
    _fuzzy_memo: dict = field(default_factory=dict, repr=False)
    # dictionary-expansion memo for wildcard / ~d fuzzy / phrase-prefix
    # atoms: multiterm_leaves key -> ranked term list
    _multiterm_memo: dict = field(default_factory=dict, repr=False)
    # per-term df memo, keyed (term, prefix): the index DataFrames are
    # immutable per engine build, so df never changes — Lucene/Tantivy
    # read df from the term dictionary in O(1), this cache is the
    # analog (without it every repeated query pays a postings-scan
    # collect just to learn the dfs it already learned)
    _df_memo: dict = field(default_factory=dict, repr=False)
    # norm semantics: "exact" (pinned default, SURVEY.md §7.0) or
    # "tantivy" (opt-in Lucene SmallFloat fieldnorm quantization for
    # byte-parity work vs Tantivy-scored fixtures)
    norms: str = "exact"

    # -- public API -------------------------------------------------------

    def search(
        self,
        query: str,
        limit: int = 20,
        offset: int = 0,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
        after: tuple | None = None,
        min_should_match: int = 1,
        synonyms: dict | None = None,
    ) -> DataFrame:
        """-> (doc_id, score) top-k, pinned order (score desc, doc_id
        asc). Filters applied pre-top-k; scores stay global. Query-
        embedded ``type:``/``role:`` filters AND with the roles kwarg.
        ``fuzzy=True`` expands each term to its edit-distance-1
        vocabulary neighbors, each scored with its own idf (the
        reference's `search.fuzzy` knob, config.rs:75).
        ``after=(score, doc_id)``: cursor pagination — the next page
        STRICTLY after the cursor in result order (search_after
        semantics; mutually exclusive with offset).
        ``min_should_match=m``: docs must match >= m of a root OR's
        clauses, scored over matching clauses only (applied before
        fuzzy expansion — a clause's variant family counts as one)."""
        if after is not None and offset:
            raise ValueError("after and offset are mutually exclusive")
        from xf_spark.query.parser import (
            apply_min_should_match,
            expand_fuzzy_plan,
            parse_query_extract,
        )

        plan, qroles = parse_query_extract(query)
        if min_should_match > 1:
            plan = apply_min_should_match(plan, min_should_match)
        if synonyms:
            from xf_spark.query.parser import expand_synonyms_plan

            plan = expand_synonyms_plan(plan, synonyms)
        if fuzzy:
            plan = expand_fuzzy_plan(plan, self.fuzzy_variants)
        plan = self._expand_multiterm(plan)
        if qroles:
            if roles:
                roles = sorted(set(roles) & set(qroles))
                if not roles:
                    return self._eval(("none",)).orderBy(
                        F.desc("score"), F.asc("doc_id")
                    ).limit(limit)
            else:
                roles = qroles
        scored = self._eval(plan)
        if roles or since is not None or until is not None:
            from xf_spark.query.segment_search import _attr_cond

            attrs = self.docs.select("doc_id", "role", "ts")
            scored = scored.join(
                attrs.where(_attr_cond(roles, since, until)),
                "doc_id",
                "left_semi",
            )
        if after is not None:
            cs, cd = float(after[0]), int(after[1])
            scored = scored.where(
                (F.col("score") < cs)
                | ((F.col("score") == cs) & (F.col("doc_id") > cd))
            )
        ranked = scored.orderBy(F.desc("score"), F.asc("doc_id"))
        if offset:
            ranked = ranked.offset(offset)
        return ranked.limit(limit)

    def count_matches(
        self,
        query: str,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
    ) -> int:
        """Match-set size (Elasticsearch ``_count`` analog) — one
        count over the evaluated plan, filters pre-applied."""
        scored = self._filtered_scored(query, roles, since, until, fuzzy)
        return 0 if scored is None else scored.count()

    def search_hydrated(self, query: str, limit: int = 20, **kw) -> DataFrame:
        """Top-k joined back to the doc table (text/hydration join,
        storage.rs:1246-1255 analog). The k-row result is broadcast to
        the doc-table join — never the reverse."""
        hits = self.search(query, limit=limit, **kw)
        return (
            self.docs.join(F.broadcast(hits), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def _filtered_scored(self, query, roles, since, until, fuzzy):
        """Shared front half of the aggregation surfaces: parsed +
        fuzzy-expanded plan evaluated to the FULL (doc_id, score)
        match set, role/ts filters applied as a pre-aggregation
        semi-join. Returns None when the merged role set is
        contradictory (matches nothing)."""
        from xf_spark.query.parser import expand_fuzzy_plan, parse_query_extract
        from xf_spark.query.segment_search import _attr_cond

        plan, qroles = parse_query_extract(query)
        if qroles:
            if roles:
                roles = sorted(set(roles) & set(qroles))
                if not roles:
                    return None
            else:
                roles = qroles
        if fuzzy and plan != ("all",):
            plan = expand_fuzzy_plan(plan, self.fuzzy_variants)
        plan = self._expand_multiterm(plan)
        scored = self._eval(plan)
        if roles or since is not None or until is not None:
            attrs = self.docs.select("doc_id", "role", "ts")
            scored = scored.join(
                attrs.where(_attr_cond(roles, since, until)),
                "doc_id",
                "left_semi",
            )
        return scored

    def facet_counts(
        self,
        query: str,
        facet: str = "role",
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
        limit: int | None = None,
    ) -> DataFrame:
        """Facet aggregation over the FULL match set (the DataFrame-
        path twin of SegmentIndex.facet_counts — same spec, same
        output contract): (value, n_docs) per facet value, ordered
        (n_docs desc, value asc). Fully declarative: match set ->
        broadcast-or-shuffle join to the facet column -> groupBy, all
        inside Catalyst (partial aggregation is free)."""
        from xf_spark.query.segment_search import _facet_expr

        vexpr = _facet_expr(facet)
        scored = self._filtered_scored(query, roles, since, until, fuzzy)
        if scored is None:
            out = self._empty_scored().select(
                F.lit(None).cast("string").alias("value"),
                F.lit(0).cast("long").alias("n_docs"),
            )
        else:
            out = (
                scored.select("doc_id")
                .join(self.docs.select("doc_id", vexpr.alias("value")), "doc_id")
                .groupBy("value")
                .agg(F.count(F.lit(1)).alias("n_docs"))
            )
        out = out.orderBy(F.desc("n_docs"), F.asc_nulls_last("value"))
        return out.limit(limit) if limit else out

    def facet_top_hits(
        self,
        query: str,
        facet: str = "role",
        k: int = 3,
        limit: int | None = None,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """Terms-aggregation with per-bucket top hits (DataFrame-path
        twin of SegmentIndex.facet_top_hits — same contract): for each
        facet value over the FULL match set, the bucket count and its
        top ``k`` (score desc, doc_id asc) hits; ``limit`` bounds
        BUCKETS. Fully declarative: scored match set joined to the
        facet column, row_number window per bucket, count aggregate —
        Catalyst handles partial aggregation and the window shuffle."""
        from pyspark.sql.window import Window

        from xf_spark.query.segment_search import (
            TOP_HITS_SCHEMA,
            _facet_expr,
            empty_local,
        )

        if int(k) < 1:
            raise ValueError("k must be >= 1")
        vexpr = _facet_expr(facet)
        scored = self._filtered_scored(query, roles, since, until, fuzzy)
        if scored is None:
            return empty_local(self.docs.sparkSession, TOP_HITS_SCHEMA)
        svf = scored.join(
            self.docs.select("doc_id", vexpr.alias("value")), "doc_id"
        )
        counts = svf.groupBy("value").agg(F.count(F.lit(1)).alias("n_docs"))
        if limit:
            counts = counts.orderBy(
                F.desc("n_docs"), F.asc_nulls_last("value")
            ).limit(limit)
        w = Window.partitionBy("value").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        ranked = (
            svf.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= int(k))
            .alias("h")
        )
        return (
            ranked.join(
                counts.alias("c"),
                F.col("h.value").eqNullSafe(F.col("c.value")),
            )
            .select(
                F.col("h.value").alias("value"),
                F.col("c.n_docs").alias("n_docs"),
                F.col("h.rank").alias("rank"),
                F.col("h.doc_id").alias("doc_id"),
                F.col("h.score").alias("score"),
            )
            .orderBy(
                F.desc("n_docs"), F.asc_nulls_last("value"), F.asc("rank")
            )
        )

    def match_stats(
        self,
        query: str,
        col: str = "text_len",
        percentiles: tuple = (0.5, 0.9, 0.99),
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """Numeric stats over the match set (DataFrame-path twin of
        SegmentIndex.match_stats — same contract)."""
        scored = self._filtered_scored(query, roles, since, until, fuzzy)
        cexpr = (
            F.length("text").cast("double")
            if col == "text_len"
            else F.col(col).cast("double")
        )
        if scored is None:
            vals = self.docs.select(cexpr.alias("v")).limit(0)
        else:
            vals = self.docs.join(
                scored.select("doc_id"), "doc_id", "left_semi"
            ).select(cexpr.alias("v"))
        aggs = [
            F.count("v").alias("n"),
            F.min("v").alias("min"),
            F.max("v").alias("max"),
            F.avg("v").alias("avg"),
            F.sum("v").alias("sum"),
        ]
        for p in percentiles:
            aggs.append(
                F.percentile("v", F.lit(float(p))).alias(
                    f"p{int(round(p * 100))}"
                )
            )
        return vals.agg(*aggs)

    def search_rescored(
        self,
        query: str,
        rescore: str,
        limit: int = 20,
        window: int = 100,
        weight: float = 2.0,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """Two-phase rescoring (DataFrame-path twin of
        SegmentIndex.search_rescored — same contract): primary
        top-window page, secondary evaluated on a broadcast of the
        window's ids only, combined = primary + weight * secondary."""
        from xf_spark.query.parser import parse_query

        if window < limit:
            raise ValueError("window must be >= limit")
        rplan = self._expand_multiterm(parse_query(rescore))
        if rplan == ("all",):
            raise ValueError("rescore requires a scored query")
        prim = self.search(
            query, limit=window, roles=roles, since=since, until=until,
            fuzzy=fuzzy,
        )
        sec = self._eval(rplan).join(
            F.broadcast(prim.select("doc_id")), "doc_id"
        )
        return (
            prim.alias("p")
            .join(
                sec.select(
                    "doc_id", F.col("score").alias("rs")
                ).alias("s"),
                "doc_id",
                "left",
            )
            .select(
                "doc_id",
                (
                    F.col("p.score")
                    + F.lit(float(weight)) * F.coalesce(F.col("rs"), F.lit(0.0))
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(limit)
        )

    def search_decayed(
        self,
        query: str,
        half_life_days: float = 30.0,
        limit: int = 20,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """Recency-decayed ranking (DataFrame-path twin of
        SegmentIndex.search_decayed — same contract): combined =
        BM25 * 0.5^(age_days / half_life), age from the corpus max
        ts; null ts decays to 0. Fully declarative — the decay is a
        Catalyst expression over the hydration join."""
        hl = float(half_life_days)
        if hl <= 0:
            raise ValueError("half_life_days must be positive")
        from xf_spark.query.parser import parse_query

        if parse_query(query) == ("all",):
            # twin-contract parity with SegmentIndex.search_decayed:
            # match-all has no BM25 leg to decay
            raise ValueError("decay scoring requires a scored query")
        scored = self._filtered_scored(query, roles, since, until, fuzzy)
        from xf_spark.query.segment_search import empty_local

        if scored is None:
            return empty_local(self.docs.sparkSession, "doc_id long, score double")
        ref = self.docs.agg(F.max("ts").alias("m")).collect()[0]["m"]
        if ref is None:
            return empty_local(self.docs.sparkSession, "doc_id long, score double")
        # NTZ columns don't cast to double directly; both sides go
        # through `timestamp` with the same session tz, so the shift
        # cancels in the difference
        refs = F.lit(ref).cast("timestamp").cast("double")
        tsd = F.col("ts").cast("timestamp").cast("double")
        decay = F.when(F.col("ts").isNull(), F.lit(0.0)).otherwise(
            F.pow(F.lit(0.5), (refs - tsd) / F.lit(86400.0 * hl))
        )
        return (
            scored.join(self.docs.select("doc_id", "ts"), "doc_id")
            .select("doc_id", (F.col("score") * decay).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(limit)
        )

    def search_demoted(
        self,
        query: str,
        negative: str,
        factor: float = 0.5,
        limit: int = 20,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """Boosting-query demotion (the Lucene BoostingQuery / ES
        boosting-query shape): docs matching ``negative`` keep their
        match but their score is multiplied by ``factor`` (0 < f < 1
        demotes; unlike NOT, they stay findable). Demotion reorders
        the FULL match set, so it is applied before top-k."""
        from xf_spark.query.parser import parse_query

        f = float(factor)
        if not (0.0 < f):
            raise ValueError("factor must be positive")
        nplan = self._expand_multiterm(parse_query(negative))
        if nplan == ("all",):
            raise ValueError("negative requires a scored query")
        scored = self._filtered_scored(query, roles, since, until, fuzzy)
        from xf_spark.query.segment_search import empty_local

        if scored is None:
            return empty_local(
                self.docs.sparkSession, "doc_id long, score double"
            )
        neg = self._eval(nplan).select(
            "doc_id", F.lit(True).alias("_neg")
        )
        return (
            scored.join(neg, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.col("score")
                    * F.when(F.col("_neg"), F.lit(f)).otherwise(F.lit(1.0))
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(limit)
        )

    def search_collapsed(
        self,
        query: str,
        limit: int = 20,
        group_col: str = "conv_id",
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """Field collapsing (DataFrame-path twin of
        SegmentIndex.search_collapsed): best hit per ``group_col``
        value, top-``limit`` groups by their best hit. One groupBy
        max_by over the match set (map-side combine) + a k-bounded
        TakeOrdered — no window over the full corpus."""
        scored = self._filtered_scored(query, roles, since, until, fuzzy)
        if scored is None:
            scored = self._empty_scored()
        g = scored.join(
            self.docs.select(
                "doc_id", F.col(group_col).cast("string").alias(group_col)
            ),
            "doc_id",
        )
        best = g.groupBy(group_col).agg(
            F.max_by(
                F.struct("doc_id", "score"),
                F.struct(F.col("score"), (-F.col("doc_id")).alias("nd")),
            ).alias("b")
        )
        return (
            best.select(
                group_col,
                F.col("b.doc_id").alias("doc_id"),
                F.col("b.score").alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(limit)
        )

    def explain(
        self,
        query: str,
        limit: int = 20,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """Score breakdown (the Lucene/Tantivy ``explain`` analog,
        beyond the reference's surface): one row per (top-``limit``
        doc, matched term leaf) with the BM25 pieces — tf, df, idf and
        the leaf's contribution — plus the doc's total score. A PURE
        phrase query breaks down per member term (the pinned phrase
        score is exactly that sum over adjacency-matching docs);
        phrases nested in a larger plan are refused loudly. NOT
        exclusions appear only through their effect on the top-k (an
        excluded doc can't be a hit, so its rows never materialize).

        Output: (doc_id, term, field, tf, df, idf, contrib, score),
        ordered (score desc, doc_id asc, field, term asc); contrib
        sums to score per doc (term plans; idf carries multiplicity
        for repeated query terms, matching search()).

        Scale shape: the top-k is the ordinary search; the breakdown
        joins the postings scan to the BROADCAST k-row top set, so
        output is bounded by k * n_leaves regardless of df."""
        from xf_spark.query.parser import (
            expand_fuzzy_plan,
            parse_query_extract,
            term_leaf_counts,
        )

        plan, qroles = parse_query_extract(query)
        if fuzzy:
            plan = expand_fuzzy_plan(plan, self.fuzzy_variants)
        plan = self._expand_multiterm(plan)
        if plan[0] == "phrase":
            # PURE phrase: every top-k doc satisfies the adjacency by
            # construction, and the pinned phrase score IS the sum of
            # member-term BM25 (dupes double-count) — so the per-term
            # breakdown is exact. Phrases nested in a larger plan stay
            # refused (a doc can reach the top-k without the adjacency,
            # and its member-term rows would overstate the score).
            from collections import Counter

            t_counts, p_counts = Counter(plan[1]), Counter()
        else:
            t_counts, p_counts = term_leaf_counts(plan)
        top = self.search(
            query, limit=limit, roles=roles, since=since, until=until,
            fuzzy=fuzzy,
        ).select("doc_id", F.col("score").alias("_total"))
        parts = []
        for counts, prefix, fld in (
            (t_counts, False, "text"),
            (p_counts, True, "prefix"),
        ):
            if not counts:
                continue
            src = self.prefix_postings if prefix else self.postings
            if src is None:
                raise ValueError("prefix postings not built")
            terms = list(counts.elements())  # multiplicity-weighted
            dfs = self._term_dfs(terms, prefix)
            present = [t for t in counts if dfs.get(t)]
            if not present:
                continue
            idf_map = self._idf_map_col(terms, dfs)
            df_map = F.create_map(
                *[
                    x
                    for t in present
                    for x in (F.lit(t), F.lit(int(dfs[t])))
                ]
            )
            parts.append(
                src.where(F.col("term").isin(present))
                .join(F.broadcast(top), "doc_id")
                .select(
                    "doc_id",
                    "term",
                    F.lit(fld).alias("field"),
                    F.col("tf").cast("double").alias("tf"),
                    df_map[F.col("term")].cast("long").alias("df"),
                    (
                        idf_map[F.col("term")].cast("double")
                    ).alias("idf"),
                    _score_col(idf_map[F.col("term")], self.stats).alias(
                        "contrib"
                    ),
                    F.col("_total").alias("score"),
                )
            )
        if not parts:
            return (
                self.postings.select(
                    "doc_id",
                    "term",
                    F.lit("text").alias("field"),
                    F.lit(0.0).alias("tf"),
                    F.lit(0).cast("long").alias("df"),
                    F.lit(0.0).alias("idf"),
                    F.lit(0.0).alias("contrib"),
                    F.lit(0.0).alias("score"),
                ).limit(0)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.orderBy(
            F.desc("score"), F.asc("doc_id"), F.asc("field"), F.asc("term")
        )

    def complete(self, prefix: str, limit: int = 10) -> DataFrame:
        """Term autocomplete (DataFrame-path twin of
        SegmentIndex.complete — same contract and ranking): vocabulary
        terms starting with the analyzed ``prefix``, df desc/term asc.
        Output: (term string, df long)."""
        from xf_spark.functions.textcore import tokenize

        toks = tokenize(prefix)
        if len(toks) != 1:
            raise ValueError(
                f"complete expects one analyzable term, got {prefix!r}"
            )
        p = toks[0]
        if self.vocab is not None:
            vocab = self.vocab.where(F.col("term").startswith(p)).select(
                "term", F.col("df").cast("long").alias("df")
            )
        else:
            vocab = (
                self.postings.where(F.col("term").startswith(p))
                .groupBy("term")
                .agg(F.count(F.lit(1)).cast("long").alias("df"))
            )
        return vocab.orderBy(F.desc("df"), F.asc("term")).limit(limit)

    def suggest(self, query: str) -> str | None:
        """Did-you-mean suggestion (DataFrame-path twin of
        SegmentIndex.suggest — same contract and ranking)."""
        import re as _re

        from xf_spark.query.parser import parse_query_extract, query_terms

        plan, _roles = parse_query_extract(query)
        if plan == ("all",):
            return None
        terms = query_terms(plan)
        if not terms:
            return None
        dfs = self._term_dfs(sorted(terms))
        missing = sorted(t for t in terms if not dfs.get(t))
        if not missing:
            return None
        out = query
        for t in missing:
            cand = [v for v in self.fuzzy_variants(t) if v != t]
            if not cand:
                continue
            out = _re.sub(
                rf"(?i)(?<![0-9A-Za-z]){_re.escape(t)}(?![0-9A-Za-z])",
                cand[0],
                out,
            )
        return out if out != query else None

    def significant_terms(
        self,
        query: str,
        limit: int = 20,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
        min_count: int = 2,
    ) -> DataFrame:
        """Significant-terms aggregation (DataFrame-path twin of
        SegmentIndex.significant_terms — same contract). Foreground
        counts come straight off the postings table (one row per
        (doc, term) already), semi-joined to the match set; background
        df is the vocabulary aggregate."""
        scored = self._filtered_scored(query, roles, since, until, fuzzy)
        if scored is None:
            scored = self._empty_scored()
        # persist so the count and the foreground semi-join share one
        # match-set evaluation (ids only; ContextCleaner reclaims it)
        mdf = scored.select("doc_id").persist()
        total = mdf.count()
        if total == 0:
            return (
                self.postings.select(
                    "term",
                    F.lit(0).cast("long").alias("n_match"),
                    F.lit(0).cast("long").alias("df"),
                    F.lit(0.0).alias("lift"),
                ).limit(0)
            )
        fg = (
            self.postings.join(mdf, "doc_id", "left_semi")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("n_match"))
        )
        if self.vocab is not None:
            bg = self.vocab.select("term", F.col("df"))
        else:
            bg = self.postings.groupBy("term").agg(
                F.count(F.lit(1)).alias("df")
            )
        n = self.stats.n_docs
        return (
            fg.join(bg, "term")
            .where(F.col("n_match") >= min_count)
            .select(
                "term",
                F.col("n_match").cast("long").alias("n_match"),
                F.col("df").cast("long").alias("df"),
                F.round(
                    (F.col("n_match") / F.lit(float(total)))
                    / (F.col("df") / F.lit(float(n))),
                    6,
                ).alias("lift"),
            )
            .orderBy(F.desc("lift"), F.asc("term"))
            .limit(limit)
        )

    # -- AST evaluation ---------------------------------------------------

    def _eval(self, node) -> DataFrame:
        kind = node[0]
        if kind == "all":
            return self.docs.select("doc_id", F.lit(1.0).alias("score"))
        if kind == "none":
            return self._empty_scored()
        if kind == "term":
            return self._terms_scored([node[1]])
        if kind == "prefix":
            return self._terms_scored([node[1]], prefix=True)
        if kind == "phrase":
            return self._phrase_scored(node[1])
        if kind == "near":
            return self._phrase_scored(node[1], slop=node[2])
        if kind == "window":
            return self._phrase_scored(node[1], window_gaps=node[2])
        if kind == "boost":
            child = self._eval(node[1])
            return child.select(
                "doc_id", (F.col("score") * F.lit(node[2])).alias("score")
            )
        if kind == "msm":
            # m-of-n should clauses: OR-style pinned-order union sum
            # plus a matched-clause count (each clause's doc_ids are
            # unique, so count(*) per doc == clauses matched)
            parts = [self._eval(c) for c in node[1]]
            union = parts[0].withColumn("_pi", F.lit(0))
            for i, p in enumerate(parts[1:], 1):
                union = union.unionByName(p.withColumn("_pi", F.lit(i)))
            return (
                union.groupBy("doc_id")
                .agg(
                    _det_sum_by("_pi", "score").alias("score"),
                    F.count(F.lit(1)).alias("_nc"),
                )
                .where(F.col("_nc") >= node[2])
                .select("doc_id", "score")
            )
        if kind == "or":
            flat_terms = [c[1] for c in node[1] if c[0] == "term"]
            others = [c for c in node[1] if c[0] != "term"]
            parts = []
            if flat_terms:
                parts.append(self._terms_scored(flat_terms))
            parts.extend(self._eval(c) for c in others)
            if len(parts) == 1:
                return parts[0]
            # tag each OR branch so the per-doc sum folds in pinned
            # branch order (same cross-evaluation determinism contract
            # as _terms_scored)
            union = parts[0].withColumn("_pi", F.lit(0))
            for i, p in enumerate(parts[1:], 1):
                union = union.unionByName(p.withColumn("_pi", F.lit(i)))
            return union.groupBy("doc_id").agg(
                _det_sum_by("_pi", "score").alias("score")
            )
        if kind == "and":
            if all(c[0] == "term" for c in node[1]):
                return self._terms_scored(
                    [c[1] for c in node[1]], require_all=True
                )
            parts = [self._eval(c) for c in node[1]]
            acc = parts[0]
            for i, p in enumerate(parts[1:], 1):
                p = p.withColumnRenamed("score", f"_s{i}")
                acc = acc.join(p, "doc_id")
                acc = acc.withColumn(
                    "score", F.col("score") + F.col(f"_s{i}")
                ).drop(f"_s{i}")
            return acc
        if kind == "not":
            base = self._eval(node[1])
            excl = self._eval(node[2]).select("doc_id")
            return base.join(excl, "doc_id", "left_anti")
        raise ValueError(f"unknown node {kind}")

    def fuzzy_variants(self, term: str) -> list[str]:
        """Dictionary terms within Levenshtein distance 1 of ``term``,
        df-ranked, capped at FUZZY_MAX_EXPANSIONS (Lucene FuzzyQuery
        semantics — same contract as SegmentIndex.fuzzy_variants).
        One vocab-sized scan with a pushed length-window predicate,
        memoized per novel fuzzy term."""
        from xf_spark.query.segment_search import (
            FUZZY_MAX_EXPANSIONS,
            FUZZY_MIN_LEN,
        )

        if term in self._fuzzy_memo:
            return self._fuzzy_memo[term]
        if len(term) < FUZZY_MIN_LEN:
            self._fuzzy_memo[term] = [term]
            return [term]
        ln = len(term)
        cond = F.length("term").between(ln - 1, ln + 1) & (
            F.levenshtein(F.col("term"), F.lit(term)) <= 1
        )
        if self.vocab is not None:
            cand = self.vocab.where(cond).select("term", "df")
        else:
            cand = (
                self.postings.where(cond)
                .groupBy("term")
                .agg(F.count("*").alias("df"))
            )
        rows = (
            cand.orderBy(F.desc("df"), F.asc("term"))
            .limit(FUZZY_MAX_EXPANSIONS)
            .collect()
        )
        variants = [r["term"] for r in rows] or [term]
        self._fuzzy_memo[term] = variants
        return variants

    def _vocab_df(self) -> DataFrame:
        """(term, df) over the text field — the cached vocab table when
        available, else a postings aggregate."""
        if self.vocab is not None:
            return self.vocab.select("term", "df")
        return self.postings.groupBy("term").agg(F.count("*").alias("df"))

    def _multiterm_variants(self, leaves) -> dict:
        """Resolve dictionary-expansion leaves against the vocabulary
        (same contract and ranking as SegmentIndex._multiterm_variants:
        df desc, term asc, capped at MULTITERM_MAX_EXPANSIONS; memoized
        per engine build)."""
        from xf_spark.query.parser import (
            MULTITERM_MAX_EXPANSIONS,
            wildcard_literal_prefix,
            wildcard_to_like,
        )
        from xf_spark.query.segment_search import FUZZY_MIN_LEN

        out: dict = {}
        for leaf in leaves:
            if leaf in self._multiterm_memo:
                out[leaf] = self._multiterm_memo[leaf]
                continue
            kind = leaf[0]
            if kind == "fuzzy":
                t, d = leaf[1], leaf[2]
                if len(t) < FUZZY_MIN_LEN:
                    out[leaf] = self._multiterm_memo[leaf] = [t]
                    continue
                if d == 1:
                    out[leaf] = self._multiterm_memo[leaf] = (
                        self.fuzzy_variants(t)
                    )
                    continue
                cond = F.length("term").between(len(t) - d, len(t) + d) & (
                    F.levenshtein(F.col("term"), F.lit(t)) <= d
                )
            elif kind == "wildcard":
                pat = leaf[1]
                cond = F.col("term").like(wildcard_to_like(pat))
                lit = wildcard_literal_prefix(pat)
                if lit:
                    cond = F.col("term").startswith(lit) & cond
            else:  # pprefix
                cond = F.col("term").startswith(leaf[1])
            rows = (
                self._vocab_df()
                .where(cond)
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(MULTITERM_MAX_EXPANSIONS)
                .collect()
            )
            out[leaf] = self._multiterm_memo[leaf] = [r["term"] for r in rows]
        return out

    def _expand_multiterm(self, plan):
        """Rewrite wildcard / ~d fuzzy / phrase-prefix atoms into
        classic nodes (no-op when the plan has none)."""
        from xf_spark.query.parser import (
            expand_multiterm_plan,
            multiterm_leaves,
        )

        leaves = multiterm_leaves(plan)
        if not leaves:
            return plan
        return expand_multiterm_plan(plan, self._multiterm_variants(leaves))

    def _term_dfs(self, terms: list[str], prefix: bool = False) -> dict:
        """df per query term. Resolved from the cached vocab table when
        available (vocab-sized scan, never touches postings); falls
        back to a pruned postings aggregate otherwise. Memoized per
        (term, prefix): a df==0 (absent) result is memoized too —
        both are immutable facts of the built index."""
        uniq = list(set(terms))
        missing = [t for t in uniq if (t, prefix) not in self._df_memo]
        if missing:
            voc = self.prefix_vocab if prefix else self.vocab
            if voc is not None:
                rows = voc.where(F.col("term").isin(missing)).collect()
            else:
                src = self.prefix_postings if prefix else self.postings
                rows = (
                    src.where(F.col("term").isin(missing))
                    .groupBy("term")
                    .agg(F.count("*").alias("df"))
                    .collect()
                )
            found = {r["term"]: r["df"] for r in rows}
            for t in missing:
                self._df_memo[(t, prefix)] = found.get(t, 0)
        return {t: self._df_memo[(t, prefix)] for t in uniq}

    def _idf_map_col(self, terms: list[str], dfs: dict):
        """Literal term->idf map column (no join, no createDataFrame).
        idf is weighted by term multiplicity: 'rust rust' is two
        should-clauses in the reference, doubling that term's
        contribution; scoring is linear in idf so m copies == idf*m."""
        from collections import Counter

        counts = Counter(terms)
        pairs = []
        for t, m in counts.items():
            pairs.append(F.lit(t))
            pairs.append(F.lit(idf_for(self.stats.n_docs, dfs.get(t, 0)) * m))
        return F.create_map(*pairs)

    def _terms_scored(
        self, terms: list[str], require_all: bool = False, prefix: bool = False
    ) -> DataFrame:
        src = self.prefix_postings if prefix else self.postings
        if src is None:
            raise ValueError("prefix postings not built")
        dfs = self._term_dfs(terms, prefix)
        present = [t for t in set(terms) if dfs.get(t)]
        if not present or (require_all and len(present) < len(set(terms))):
            return self._empty_scored()
        idf_map = self._idf_map_col(terms, dfs)
        hits = src.where(F.col("term").isin(present)).withColumn(
            "tscore", _score_col(idf_map[F.col("term")], self.stats, self.norms)
        )
        if len(present) == 1:
            # postings are unique on (term, doc_id): a single-term
            # query has exactly one row per matching doc, so the
            # per-doc sum below would shuffle rows only to add each
            # to itself — skip the exchange entirely (require_all with
            # one surviving term is equally trivial: _nt == 1 always)
            return hits.select("doc_id", F.col("tscore").alias("score"))
        # sum term contributions in SORTED term order, not partial-agg
        # arrival order: float addition is order-sensitive at the ulp,
        # and the search_after cursor compares this score across two
        # independent evaluations (page N collects it, page N+1
        # recomputes it) — a nondeterministic sum order makes the
        # boundary doc flicker between pages (duplicate or skipped row)
        aggs = [_det_sum_by("term", "tscore").alias("score")]
        if require_all:
            aggs.append(F.countDistinct("term").alias("_nt"))
        out = hits.groupBy("doc_id").agg(*aggs)
        if require_all:
            out = out.where(F.col("_nt") == len(set(terms))).drop("_nt")
        return out

    def _phrase_scored(
        self,
        terms: list[str],
        slop: int = 0,
        window_gaps: int | None = None,
    ) -> DataFrame:
        """Positional phrase match; ``slop > 0`` relaxes adjacency to
        ordered proximity (consecutive gaps in [1, slop+1] — the
        ("near", terms, slop) node) via a forward DP over the
        candidate doc's position lists; ``window_gaps`` switches to
        the UNORDERED window check (("window", terms, gaps) — all
        terms within a span of len(terms)-1+gaps, min_cover_span
        semantics). Candidates and scoring are identical to the
        exact-phrase path."""
        if "positions" not in self.postings.columns:
            raise ValueError(
                "phrase queries require postings built with positions "
                "(build_postings(..., with_positions=True))"
            )
        uniq = sorted(set(terms))
        dfs = self._term_dfs(uniq)
        if any(not dfs.get(t) for t in uniq):
            return self._empty_scored()
        idf_by_term = {t: idf_for(self.stats.n_docs, dfs[t]) for t in uniq}
        stats = self.stats
        phrase = list(terms)
        tantivy_norms = self.norms == "tantivy"

        # candidate docs: contain ALL phrase terms (single scan+group)
        cand = (
            self.postings.where(F.col("term").isin(uniq))
            .groupBy("doc_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("term", "positions"))
                ).alias("pmap"),
                F.first("dl").alias("dl"),
            )
            .where(F.size("pmap") == len(uniq))
        )

        @F.pandas_udf(T.DoubleType())
        def phrase_score(pmaps: pd.Series, dls: pd.Series) -> pd.Series:
            def one(pmap, dl):
                if window_gaps is not None:
                    from xf_spark.oracle import min_cover_span

                    best = min_cover_span([pmap[t] for t in set(phrase)])
                    span = len(set(phrase)) - 1 + window_gaps
                    ok = best is not None and best <= span
                elif slop == 0:
                    first = pmap[phrase[0]]
                    rest = [set(pmap[t]) for t in phrase[1:]]
                    ok = any(
                        all((p + i + 1) in rest[i] for i in range(len(rest)))
                        for p in first
                    )
                else:
                    reach = list(pmap[phrase[0]])
                    for t in phrase[1:]:
                        reach = [
                            q for q in pmap[t]
                            if any(1 <= q - r <= slop + 1 for r in reach)
                        ]
                        if not reach:
                            break
                    ok = bool(reach)
                if not ok:
                    return None
                if tantivy_norms:
                    from xf_spark.functions.fieldnorm import quantize_length

                    dl = float(quantize_length(int(dl)))
                # score = sum of member-term BM25 (phrase order, dupes
                # double-count) — pinned identically in the oracle
                s = 0.0
                for t in phrase:
                    tf = float(len(pmap[t]))
                    s += idf_by_term[t] * tf * (K1 + 1.0) / (
                        tf + K1 * (1.0 - B + B * dl / stats.avgdl)
                    )
                return s

            return pd.Series(
                [one(pm, float(d)) for pm, d in zip(pmaps, dls)], dtype="float64"
            )

        return (
            cand.withColumn("score", phrase_score("pmap", "dl"))
            .where(F.col("score").isNotNull())
            .select("doc_id", "score")
        )

    def _empty_scored(self) -> DataFrame:
        from xf_spark.query.segment_search import empty_local

        return empty_local(
            self.postings.sparkSession, "doc_id long, score double"
        )
