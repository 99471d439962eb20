"""Query engine over the persisted segment index (the 100 TB path).

Execution shape per query (SURVEY.md §3.2 Spark shape):

1. driver parses the query, resolves global df for its (few) terms
   from the bucket-pruned vocab table — idf becomes a broadcast-sized
   python dict;
2. the segments parquet is scanned with partition pruning
   (``bucket IN (...)``) + term predicate pushdown — only the query
   terms' rows are ever read, each holding a compressed posting list;
3. ``groupBy(shard).applyInPandas`` evaluates the whole boolean AST
   shard-locally in NumPy (doc-range sharding puts every doc's
   postings for all terms in the same shard, so AND/OR/NOT/phrase
   need no cross-shard traffic) and emits a per-shard top-k;
4. global ``orderBy(score desc, doc_id asc).limit(k)`` merges k-sized
   lists — the two-phase heap-merge shape of the reference
   (vector.rs:913-993).

Scoring inside a shard uses **block-max WAND** (window variant) for
scored OR/term queries: windows are the union of all query terms'
block boundaries; each window's upper bound is the sum of the terms'
block-max contributions; windows are scored in descending-bound order
and scoring stops when the bound falls under the current k-th score
(θ). Falls back to exhaustive vectorized scoring for tiny candidate
sets — results are bit-identical either way (tested).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from xf_spark.index.codec import varint_decode
from xf_spark.index.postings import CorpusStats
from xf_spark.index.segments import K1, B, recover_compaction, term_bucket
from xf_spark.query.parser import (
    parse_query,
    expand_fuzzy_plan,
    fuzzy_term_leaves,
    parse_query_extract,
    prefix_terms,
    query_terms,
)

# vectorized-phrase key base: keys are doc*B + (pos + k - i) and must
# fit int64 with 10^12 docs (2^40 * 2^22 = 2^62): B = 2^22 allows ~4M
# tokens per doc — far beyond any transcript turn; a doc exceeding it
# drops the whole evaluation to the scalar fallback (correctness never
# depends on the bound)
_POS_B = 1 << 22

# Fuzzy matching (the reference exposes `search.fuzzy` in config.rs:75
# — a typo-tolerance knob; we implement the behavior end-to-end).
# Lucene-compatible choices: AUTO edit distance (0 below 3 chars, 1
# otherwise) and a bounded expansion set so one common typo can never
# explode the OR fan-in (Lucene FuzzyQuery maxExpansions default).
FUZZY_MAX_EXPANSIONS = 50
FUZZY_MIN_LEN = 3

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def idf_for(n_docs: int, df: int) -> float:
    import math

    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def empty_local(spark: SparkSession, schema) -> DataFrame:
    """0-row DataFrame as LIMIT 0 over a one-row Arrow local relation.

    A 0-row createDataFrame (empty pandas or []) falls off the Arrow
    local-relation path onto parallelize([]) with defaultParallelism
    EMPTY partitions — i.e. a real 16-task Spark job on every collect
    (measured 0.32 s at local[16]). The one-row + limit(0)
    construction stays a pure local relation (0.03 s) — a 10x cut on
    every zero-hit query."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        asch = to_arrow_schema(schema)
        one = pa.table({f.name: pa.nulls(1, type=f.type) for f in asch})
    except Exception:
        one = pd.DataFrame({f.name: [None] for f in schema.fields})
    return spark.createDataFrame(one, schema=schema).limit(0)


def arrow_local(spark: SparkSession, schema, data) -> DataFrame:
    """Small local-relation DataFrame straight from a pyarrow Table.

    The serving hot paths resolve rank in-driver and emit the final
    page as a local relation; ``createDataFrame(pandas)`` pays ~4-5 ms
    of pandas-introspection machinery per call ON TOP of the Arrow
    transfer (measured on this host: 17.5 ms vs 13.1 ms min for a
    fresh 20-row create+collect — the reference CLI's whole lexical
    round trip is 13 ms). Building the pyarrow Table ourselves skips
    that layer; every k-bounded result page goes through here.

    ``data`` is a dict of equal-length numpy arrays / lists (zero-copy
    into Arrow) or a pandas DataFrame. Columns are emitted in SCHEMA
    order by name. Empty input routes to ``empty_local`` (a 0-row
    arrow table would fall off the local-relation plan onto a real
    parallelize job). Any conversion surprise (exotic dtype, cast
    failure) falls back to the pandas path rather than erroring."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    is_pdf = isinstance(data, pd.DataFrame)
    n = len(data) if is_pdf else (len(next(iter(data.values()))) if data else 0)
    if not n:
        return empty_local(spark, schema)
    try:
        import pyarrow as pa

        if is_pdf:
            tbl = pa.Table.from_pandas(data, preserve_index=False)
        else:
            tbl = pa.table({k: pa.array(v) for k, v in data.items()})
        tbl = tbl.select([f.name for f in schema.fields])
        return spark.createDataFrame(tbl, schema=schema)
    except Exception:
        pdf = data if is_pdf else pd.DataFrame(data)
        return spark.createDataFrame(pdf, schema=schema)


def _attr_cond(roles, since, until):
    """Role/ts predicate over the docs attribute columns (pushed down
    to the docs parquet scan wherever it is applied)."""
    cond = F.lit(True)
    if roles:
        cond = cond & F.col("role").isin(list(roles))
    if since is not None:
        cond = cond & (F.col("ts") >= F.lit(since))
    if until is not None:
        cond = cond & (F.col("ts") <= F.lit(until))
    return cond


# ---------------------------------------------------------------------------
# NumPy shard-local evaluation
# ---------------------------------------------------------------------------

def _decode_row(row: dict) -> dict:
    """Segment row -> numpy arrays (doc_ids, tf, dl, tf_part, blocks)."""
    n = row["n_docs"]
    doc_off = row["block_doc_off"]
    ids = np.empty(n, dtype=np.int64)
    # blocks delta-restart: decode each block independently (offsets
    # enable skip decoding; full decode here — vectorized and cheap)
    pos = 0
    doc_bytes = row["doc_ids_bin"]
    for bi in range(len(doc_off) - 1):
        chunk = varint_decode(doc_bytes[doc_off[bi] : doc_off[bi + 1]])
        ids[pos : pos + len(chunk)] = np.cumsum(chunk.astype(np.int64))
        pos += len(chunk)
    tfs = varint_decode(row["tfs_bin"]).astype(np.int64)
    dls = varint_decode(row["dls_bin"]).astype(np.float64)
    # appended-index bound correction (see SegmentIndex.load)
    try:
        scale = float(row["bm_scale"])
    except (KeyError, TypeError, ValueError):
        scale = 1.0
    return {
        "ids": ids,
        "tfs": tfs,
        "dls": dls,
        "block_last": np.asarray(row["block_last_doc"], dtype=np.int64),
        "block_max": np.asarray(row["block_max_tfpart"], dtype=np.float64) * scale,
        "positions_bin": row.get("positions_bin"),
    }


def _tf_part(tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    t = tfs.astype(np.float64)
    return t * (K1 + 1.0) / (t + K1 * (1.0 - B + B * dls / avgdl))


def _tf_part_memo(d: dict, avgdl: float) -> np.ndarray:
    """tf_part is query-independent (idf multiplies later), so a warm
    cached term memoizes it once instead of recomputing several
    array passes per query (measured 7.7 -> ~2 ms single-head-term
    eval at 1.57M docs). Keyed by avgdl: an index append changes it,
    and stale bm25 components must never survive the reload."""
    if d.get("_tfp_avgdl") != avgdl:
        d["_tfp"] = _tf_part(d["tfs"], d["dls"], avgdl)
        d["_tfp_avgdl"] = avgdl
    return d["_tfp"]


def _topk(ids: np.ndarray, scores: np.ndarray, k: int):
    """(score desc, doc_id asc) top-k, fully deterministic.

    Selection, not sort: np.partition finds the k-th largest score,
    ties at the boundary resolve by smallest doc_id (ids are unique
    within one plan evaluation), and only the ~k survivors pay the
    final lexsort (a full lexsort at head-term sizes was ~half the
    per-query eval cost — measured)."""
    if k <= 0:
        return ids[:0], scores[:0]
    n = len(ids)
    if n <= k:
        order = np.lexsort((ids, -scores))
        return ids[order], scores[order]
    kth = np.partition(scores, n - k)[n - k]
    above = scores > kth
    need = k - int(above.sum())
    tied = scores == kth
    tid = ids[tied]
    if need > 0 and len(tid) > need:
        # smallest `need` doc_ids among boundary ties
        cut = np.partition(tid, need - 1)[need - 1]
        keep = above | (tied & (ids <= cut))
    elif need > 0:
        keep = above | tied
    else:
        keep = above
    kids, ksc = ids[keep], scores[keep]
    order = np.lexsort((kids, -ksc))[:k]
    return kids[order], ksc[order]


def _QID_EMPTY() -> pd.DataFrame:
    """Empty (qid, doc_id, score) frame — the zero-rows shape every
    batched per-shard evaluator returns."""
    return pd.DataFrame(
        {
            "qid": np.empty(0, dtype=np.int32),
            "doc_id": np.empty(0, dtype=np.int64),
            "score": np.empty(0, dtype=np.float64),
        }
    )


def _merge_qid_rows(
    rows, qlist: list[str], k: int
) -> dict[str, list[tuple[int, float]]]:
    """Driver-side merge of collected (qid, doc_id, score) rows from a
    batched per-shard job: exact per-query top-k with the pinned
    (score desc, doc_id asc) tiebreak. Input is <= B * n_shards * k
    rows by construction — k-bounded, never corpus-sized."""
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    out: dict[str, list[tuple[int, float]]] = {}
    for qi, q in enumerate(qlist):
        hits = by_q.get(qi, [])
        if hits:
            ids = np.fromiter((h[0] for h in hits), np.int64, len(hits))
            sc = np.fromiter((h[1] for h in hits), np.float64, len(hits))
            tids, tsc = _topk(ids, sc, k)
            out[q] = list(zip(tids.tolist(), tsc.tolist()))
        else:
            out[q] = []
    return out


def _or_exhaustive(parts: list) -> tuple[np.ndarray, np.ndarray]:
    """parts: [(sorted ids, scores)] -> union with score sums, sorted."""
    ids = np.concatenate([p[0] for p in parts])
    sc = np.concatenate([p[1] for p in parts])
    uids, inv = np.unique(ids, return_inverse=True)
    out = np.zeros(len(uids), dtype=np.float64)
    np.add.at(out, inv, sc)
    return uids, out


def _after_mask(
    ids: np.ndarray, sc: np.ndarray, after: tuple
) -> tuple[np.ndarray, np.ndarray]:
    """Cursor filter for search_after pagination: keep only docs
    STRICTLY after (cursor_score, cursor_doc_id) in the result order
    (score desc, doc_id asc). Exact float comparison is sound — the
    cursor is a score this same pipeline computed."""
    cs, cd = after
    m = (sc < cs) | ((sc == cs) & (ids > cd))
    return ids[m], sc[m]


def wand_or_topk(
    term_entries: list, k: int, after: tuple | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND (window variant) for OR-of-terms.

    term_entries: [(ids, scores, block_last, block_ub)] with block_ub
    already idf-multiplied. Returns the exact same (ids, scores) top-k
    as exhaustive evaluation — block bounds only skip work, never
    change results.

    ``after``: search_after cursor — candidates at-or-before it are
    masked out before entering the heap. Block bounds stay valid upper
    bounds (masking only removes candidates), so the θ cutoff and the
    descending-bound early exit are unchanged."""
    total = sum(len(t[0]) for t in term_entries)
    if len(term_entries) == 1:
        # single posting list: scores are final — exact top-k directly
        # (the window machinery would re-touch every posting per chunk)
        ids, sc, _bl, _bu = term_entries[0]
        if after is not None:
            ids, sc = _after_mask(ids, sc, after)
        return _topk(ids, sc, k)
    if total <= 4 * k or total < 4096:
        ids, sc = _or_exhaustive([(t[0], t[1]) for t in term_entries])
        if after is not None:
            ids, sc = _after_mask(ids, sc, after)
        return _topk(ids, sc, k)

    # windows = union of all block boundaries (right edges, inclusive)
    bounds = np.unique(np.concatenate([t[2] for t in term_entries]))
    n_w = len(bounds)
    ub = np.zeros(n_w, dtype=np.float64)
    packs = []  # per term: postings grouped by window (one argsort)
    for ids, sc, block_last, block_ub in term_entries:
        # block covering window w = first block with last >= bounds[w];
        # windows never straddle a term's own block boundary
        bi = np.searchsorted(block_last, bounds)
        valid = bi < len(block_last)
        contrib = np.zeros(n_w, dtype=np.float64)
        contrib[valid] = block_ub[bi[valid]]
        ub += contrib
        wid = np.searchsorted(bounds, ids)
        o = np.argsort(wid, kind="stable")
        packs.append((ids, sc, wid[o], o))

    order = np.argsort(-ub, kind="stable")
    best_ids = np.empty(0, dtype=np.int64)
    best_sc = np.empty(0, dtype=np.float64)
    theta = -np.inf
    CHUNK = 64
    for cs in range(0, n_w, CHUNK):
        chunk = order[cs : cs + CHUNK]
        # strict <: a doc tying the k-th score but with smaller doc_id
        # must still be able to displace it (pinned tiebreak)
        if len(best_ids) >= k and ub[chunk[0]] < theta:
            break  # no remaining window can beat the k-th score
        # gather ONLY this chunk's postings per term via the window-
        # grouped order (the previous full-length boolean mask made
        # every chunk O(total postings) — the whole point of block-max
        # skipping is to NOT touch pruned windows)
        chunk_sorted = np.sort(chunk)
        parts = []
        for ids, sc, swid, o in packs:
            lo = np.searchsorted(swid, chunk_sorted, side="left")
            hi = np.searchsorted(swid, chunk_sorted, side="right")
            spans = [o[a:b] for a, b in zip(lo, hi) if b > a]
            if spans:
                take = np.concatenate(spans)
                parts.append((ids[take], sc[take]))
        if not parts:
            continue
        cids, csc = _or_exhaustive(parts)
        if after is not None:
            cids, csc = _after_mask(cids, csc, after)
        best_ids, best_sc = _topk(
            np.concatenate([best_ids, cids]), np.concatenate([best_sc, csc]), k
        )
        if len(best_ids) >= k:
            theta = best_sc[-1]
    return best_ids, best_sc


def build_term_data(pdf: pd.DataFrame) -> dict:
    """Decode segment rows into {(field, term): posting arrays} —
    the expensive half of evaluation (varint decode). Split out so a
    BATCH of queries decodes the union of its terms ONCE
    (search_many), instead of once per query."""
    if "shard" in pdf.columns and pdf["shard"].nunique() > 1:
        pdf = pdf.sort_values("shard", kind="stable")
    grouped: dict = {}
    for _, row in pdf.iterrows():
        grouped.setdefault((row["field"], row["term"]), []).append(_decode_row(row))
    data: dict = {}
    for key, chunks in grouped.items():
        if len(chunks) == 1:
            data[key] = chunks[0]
        else:
            data[key] = {
                "ids": np.concatenate([c["ids"] for c in chunks]),
                "tfs": np.concatenate([c["tfs"] for c in chunks]),
                "dls": np.concatenate([c["dls"] for c in chunks]),
                "block_last": np.concatenate([c["block_last"] for c in chunks]),
                "block_max": np.concatenate([c["block_max"] for c in chunks]),
                # the positions stream is per-posting-framed, so
                # in-order concatenation is itself a valid stream
                "positions_bin": b"".join(
                    c["positions_bin"] or b"" for c in chunks
                ) or None,
            }
    return data


def eval_shard(
    pdf: pd.DataFrame,
    plan,
    idfs: dict,
    avgdl: float,
    k: int,
    exhaustive: bool = False,
    allowed: np.ndarray | None = None,
    after: tuple | None = None,
) -> pd.DataFrame:
    """Evaluate the query AST over segment rows.

    Accepts one shard's rows (distributed path) OR many shards' rows
    (driver fast path): shard doc-ranges are disjoint and increase
    with shard id, so per-term rows sorted by shard concatenate into
    one valid posting list (ids stay sorted, block boundaries stay
    monotone) — one evaluation instead of a per-shard loop."""
    return eval_plan_on_data(
        build_term_data(pdf), plan, idfs, avgdl, k, exhaustive, allowed, after
    )


def eval_plan_on_data(
    data: dict,
    plan,
    idfs: dict,
    avgdl: float,
    k: int,
    exhaustive: bool = False,
    allowed: np.ndarray | None = None,
    after: tuple | None = None,
) -> pd.DataFrame:
    """``allowed``: optional SORTED doc_id array — the pre-resolved
    role/ts filter. Applied at the posting leaves (before top-k /
    WAND), so a filtered doc never consumes a top-k slot and per-call
    output stays k-bounded. Block-max bounds stay valid upper bounds
    under masking (masking only removes candidates)."""

    def _allowed_mask(ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(allowed, ids)
        np.clip(idx, 0, len(allowed) - 1, out=idx)
        return allowed[idx] == ids

    if k <= 0 or (allowed is not None and len(allowed) == 0):
        return pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=np.int64),
                "score": np.empty(0, dtype=np.float64),
            }
        )

    def term_entry(fld: str, t: str):
        d = data.get((fld, t))
        if d is None:
            return None
        ids = d["ids"]
        sc = idfs.get((fld, t), 0.0) * _tf_part_memo(d, avgdl)
        if allowed is not None:
            m = _allowed_mask(ids)
            ids, sc = ids[m], sc[m]
        return (ids, sc, d["block_last"], d["block_max"] * idfs.get((fld, t), 0.0))

    def ev(node) -> tuple[np.ndarray, np.ndarray]:
        """FULL (untruncated) evaluation — required for composition
        under AND/NOT. WAND truncation applies only at the plan root
        (see below)."""
        kind = node[0]
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        if kind == "none":
            return empty
        if kind in ("term", "prefix"):
            fld = "prefix" if kind == "prefix" else "text"
            e = term_entry(fld, node[1])
            if e is None:
                return empty
            return e[0], e[1]
        if kind == "or":
            parts = [p for p in (ev(c) for c in node[1]) if len(p[0])]
            if not parts:
                return empty
            return _or_exhaustive(parts)
        if kind == "and":
            parts = [ev(c) for c in node[1]]
            if any(len(p[0]) == 0 for p in parts):
                return empty
            common = parts[0][0]
            for p in parts[1:]:
                common = common[np.isin(common, p[0], assume_unique=False)]
            if len(common) == 0:
                return empty
            total = np.zeros(len(common), dtype=np.float64)
            for ids, sc in parts:
                # duplicate ids impossible within a part (sorted unique)
                idx = np.searchsorted(ids, common)
                total += sc[idx]
            return common, total
        if kind == "not":
            bids, bsc = ev(node[1])
            eids, _ = ev(node[2])
            if len(bids) == 0:
                return bids, bsc
            m = ~np.isin(bids, eids)
            return bids[m], bsc[m]
        if kind == "phrase":
            return ev_phrase(node[1])
        if kind == "near":
            return ev_near(node[1], node[2])
        if kind == "window":
            return ev_window(node[1], node[2])
        if kind == "boost":
            bids, bsc = ev(node[1])
            return bids, bsc * node[2]
        if kind == "msm":
            # m-of-n should clauses: union-sum like OR, then keep docs
            # matched by >= m clauses, scored over MATCHING clauses
            # only (the union sum already is — absent clauses
            # contribute nothing)
            m = node[2]
            parts = [p for p in (ev(c) for c in node[1]) if len(p[0])]
            if len(parts) < m:
                return empty
            uids, total = _or_exhaustive(parts)
            cnt = np.zeros(len(uids), dtype=np.int64)
            for ids, _sc in parts:
                # each part's ids are sorted unique -> membership adds 1
                idx = np.searchsorted(uids, ids)
                cnt[idx] += 1
            keep = cnt >= m
            return uids[keep], total[keep]
        raise ValueError(f"unknown node {kind}")

    def _phrase_datas(terms: list[str]):
        """Shared posting/position gathering for phrase-family nodes:
        -> (datas, pos, tfp) or None if any member term is absent or
        position-less in this shard."""
        uniq = sorted(set(terms))
        datas = {}
        for t in uniq:
            d = data.get(("text", t))
            if d is None or d.get("positions_bin") in (None, b""):
                return None
            datas[t] = d
        from xf_spark.index.codec import decode_positions

        pos = {}
        for t in uniq:
            d = datas[t]
            if "_pos" not in d:
                d["_pos"] = decode_positions(d["positions_bin"], len(d["ids"]))
            pos[t] = d["_pos"]
        tfp = {
            t: idfs.get(("text", t), 0.0) * _tf_part_memo(datas[t], avgdl)
            for t in uniq
        }
        return datas, pos, tfp

    def _finish_positional(matched: np.ndarray, datas, tfp, terms):
        """Allowed-mask + summed per-term BM25 for a positional match
        set (phrase order, dupes double-count — the phrase pin)."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        if allowed is not None and matched.size:
            matched = matched[_allowed_mask(matched)]
        if matched.size == 0:
            return empty
        sc = np.zeros(matched.shape, dtype=np.float64)
        for t in terms:
            ti = np.searchsorted(datas[t]["ids"], matched)
            sc += tfp[t][ti]
        return matched, sc

    def ev_near(terms: list[str], slop: int):
        """Ordered proximity ("a b"~slop, beyond-reference — Lucene
        sloppy-phrase analog restricted to in-order matches): terms in
        query order, each consecutive gap in [1, slop+1]. Vectorized
        forward DP over occurrence keys doc*B + pos — reach_i =
        keys(t_i) ∩ (reach_{i-1} + {1..slop+1}); the doc*B framing
        makes cross-doc reach impossible while positions stay below
        B - slop - 1 (the same guard as the phrase path, falling back
        to a per-candidate scalar DP beyond it). Transient memory is
        |reach|*(slop+1) keys — slop is user-bounded and small."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        got = _phrase_datas(terms)
        if got is None:
            return empty
        datas, pos, tfp = got
        W = slop + 1

        def keys_of(t: str) -> np.ndarray | None:
            d = datas[t]
            plist = pos[t]
            lens = np.fromiter(
                (len(p) for p in plist), dtype=np.int64, count=len(plist)
            )
            flat = (
                np.concatenate(plist).astype(np.int64)
                if len(plist)
                else np.empty(0, dtype=np.int64)
            )
            if flat.size and int(flat.max()) + W >= _POS_B:
                return None  # scalar fallback
            docs_rep = np.repeat(d["ids"].astype(np.int64), lens)
            return docs_rep * _POS_B + flat

        reach = keys_of(terms[0])
        matched = None
        if reach is not None:
            ok = True
            for t in terms[1:]:
                if reach.size == 0:
                    break
                tk = keys_of(t)
                if tk is None:
                    ok = False
                    break
                shifted = (
                    reach[:, None] + np.arange(1, W + 1, dtype=np.int64)
                ).ravel()
                reach = tk[np.isin(tk, shifted)]
            if ok:
                matched = (
                    np.unique(reach // _POS_B)
                    if reach.size
                    else np.empty(0, dtype=np.int64)
                )
        if matched is None:
            # scalar per-candidate DP (positions beyond the key bound)
            common = datas[sorted(set(terms))[0]]["ids"]
            for t in sorted(set(terms))[1:]:
                common = common[np.isin(common, datas[t]["ids"])]
            out = []
            for doc in common:
                reach_p = pos[terms[0]][
                    int(np.searchsorted(datas[terms[0]]["ids"], doc))
                ].tolist()
                for t in terms[1:]:
                    nxt = pos[t][
                        int(np.searchsorted(datas[t]["ids"], doc))
                    ].tolist()
                    reach_p = [
                        q for q in nxt
                        if any(1 <= q - r <= W for r in reach_p)
                    ]
                    if not reach_p:
                        break
                if reach_p:
                    out.append(int(doc))
            matched = np.asarray(out, dtype=np.int64)
        return _finish_positional(matched, datas, tfp, terms)

    def ev_window(terms: list[str], gaps: int):
        """Unordered window ("a b"~~gaps, beyond-reference — ES
        intervals all_of(ordered=false, max_gaps) analog): every
        distinct term within a token window spanning
        <= len(terms)-1+gaps. Candidates are the intersection of the
        member postings (bounded by the rarest term's df); per
        candidate the merged-events sliding window (min_cover_span —
        the single shared definition) runs over the already-decoded
        position arrays, linear in the doc's total member positions."""
        from xf_spark.oracle import min_cover_span

        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        got = _phrase_datas(terms)
        if got is None:
            return empty
        datas, pos, tfp = got
        span = len(terms) - 1 + gaps
        uniq = sorted(set(terms))
        matched = None
        if len(uniq) == 2:
            # vectorized two-term path (the dominant query shape): in
            # the doc*B + pos key space, for every occurrence of term
            # A the nearest B-occurrence neighbors are searchsorted
            # candidates; a pair in the SAME doc within `span` marks
            # the doc. Cross-doc pairs differ by >= B > span, so the
            # same-doc guard is one integer-divide compare.
            def keys_of(t):
                d = datas[t]
                plist = pos[t]
                lens = np.fromiter(
                    (len(p) for p in plist), dtype=np.int64, count=len(plist)
                )
                flat = (
                    np.concatenate(plist).astype(np.int64)
                    if len(plist)
                    else np.empty(0, dtype=np.int64)
                )
                if flat.size and int(flat.max()) + span + 1 >= _POS_B:
                    return None
                return np.repeat(d["ids"].astype(np.int64), lens) * _POS_B + flat

            ka, kb = keys_of(uniq[0]), keys_of(uniq[1])
            if ka is not None and kb is not None:
                hits = []
                for a, b in ((ka, kb), (kb, ka)):
                    if not a.size or not b.size:
                        continue
                    idx = np.minimum(np.searchsorted(b, a), b.size - 1)
                    diff = b[idx] - a
                    m = (
                        (diff >= 0)
                        & (diff <= span)
                        & (b[idx] // _POS_B == a // _POS_B)
                    )
                    hits.append(a[m] // _POS_B)
                matched = (
                    np.unique(np.concatenate(hits))
                    if hits
                    else np.empty(0, dtype=np.int64)
                )
        if matched is None:
            # scalar fallback: K >= 3 terms, or positions beyond the
            # key bound — per-candidate merged-events sliding window
            common = datas[uniq[0]]["ids"]
            for t in uniq[1:]:
                common = common[np.isin(common, datas[t]["ids"])]
            out = []
            for doc in common:
                plists = [
                    pos[t][int(np.searchsorted(datas[t]["ids"], doc))]
                    for t in uniq
                ]
                best = min_cover_span(plists)
                if best is not None and best <= span:
                    out.append(int(doc))
            matched = np.asarray(out, dtype=np.int64)
        return _finish_positional(matched, datas, tfp, terms)

    def ev_phrase(terms: list[str]):
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        uniq = sorted(set(terms))
        datas = {}
        for t in uniq:
            d = data.get(("text", t))
            if d is None or d.get("positions_bin") in (None, b""):
                return empty
            datas[t] = d
        common = datas[uniq[0]]["ids"]
        for t in uniq[1:]:
            common = common[np.isin(common, datas[t]["ids"])]
        if len(common) == 0:
            return empty
        from xf_spark.index.codec import decode_positions

        pos = {}
        for t in uniq:
            d = datas[t]
            # memoized on the term-data dict: a cached warm term decodes
            # its positions stream once, not once per phrase query
            if "_pos" not in d:
                d["_pos"] = decode_positions(d["positions_bin"], len(d["ids"]))
            pos[t] = d["_pos"]
        tfp = {
            t: idfs.get(("text", t), 0.0) * _tf_part_memo(datas[t], avgdl)
            for t in uniq
        }
        # vectorized adjacency: occurrence i of the phrase contributes
        # keys doc*B + (p + k - i); a doc matches iff all occurrences
        # share a key (p_i = p_0 + i  <=>  equal keys). One np.isin
        # chain replaces the per-candidate-doc Python loop (measured
        # 2-3x lower phrase p50). B bounds positions per doc; falls
        # back to the scalar path for pathological multi-million-token
        # docs so correctness never depends on the bound.
        K_PH = len(terms)
        matched = None
        key_sets = []
        vector_ok = True
        for i, t in enumerate(terms):
            d = datas[t]
            plist = pos[t]
            lens = np.fromiter(
                (len(p) for p in plist), dtype=np.int64, count=len(plist)
            )
            flat = (
                np.concatenate(plist).astype(np.int64)
                if len(plist)
                else np.empty(0, dtype=np.int64)
            )
            if flat.size and int(flat.max()) + K_PH >= _POS_B:
                vector_ok = False
                break
            docs_rep = np.repeat(d["ids"].astype(np.int64), lens)
            key_sets.append(docs_rep * _POS_B + (flat + K_PH - i))
        if vector_ok:
            cand = key_sets[0]
            for ks in key_sets[1:]:
                if cand.size == 0:
                    break
                cand = cand[np.isin(cand, ks)]
            matched = (
                np.unique(cand // _POS_B)
                if cand.size
                else np.empty(0, dtype=np.int64)
            )
        if matched is None:
            # scalar fallback (positions >= _POS_B - K_PH in some doc)
            out = []
            for doc in common:
                idx0 = int(np.searchsorted(datas[terms[0]]["ids"], doc))
                first = pos[terms[0]][idx0]
                rest = [
                    set(pos[t][int(np.searchsorted(datas[t]["ids"], doc))].tolist())
                    for t in terms[1:]
                ]
                if any(
                    all((int(p) + i + 1) in rest[i] for i in range(len(rest)))
                    for p in first
                ):
                    out.append(int(doc))
            matched = np.asarray(out, dtype=np.int64)
        if allowed is not None and matched.size:
            # mask the MATCHED set, not the posting arrays — the
            # positions stream is per-posting framed and must stay
            # aligned with the unmasked ids during adjacency
            matched = matched[_allowed_mask(matched)]
        if matched.size == 0:
            return empty
        sc = np.zeros(matched.shape, dtype=np.float64)
        for t in terms:  # phrase order, dupes double-count (pinned)
            ti = np.searchsorted(datas[t]["ids"], matched)
            sc += tfp[t][ti]
        return (
            matched,
            sc,
        )

    # WAND fast path: plan root is a term/prefix leaf or an OR of them
    def leaf_entry(node):
        """term/prefix leaf, optionally boost-wrapped, -> WAND entry
        (scores AND block-max upper bound scaled by the boost, so
        block-max pruning stays a valid upper bound) — None if the
        node shape is not WAND-able, [] if the term is absent."""
        w = 1.0
        if node[0] == "boost":
            w = node[2]
            node = node[1]
        if node[0] not in ("term", "prefix"):
            return None
        fld = "prefix" if node[0] == "prefix" else "text"
        e = term_entry(fld, node[1])
        if e is None:
            return []
        if w != 1.0:
            e = (e[0], e[1] * w, e[2], e[3] * w)
        return [e]

    def wand_entries(node):
        le = leaf_entry(node)
        if le is not None:
            return le
        if node[0] == "or":
            out = []
            for c in node[1]:
                le = leaf_entry(c)
                if le is None:
                    return None
                out.extend(le)
            return out
        return None

    entries = None if exhaustive else wand_entries(plan)
    if entries is not None:
        if not entries:
            ids = np.empty(0, dtype=np.int64)
            scores = np.empty(0, dtype=np.float64)
        else:
            ids, scores = wand_or_topk(entries, k, after)
    else:
        ids, scores = ev(plan)
        if after is not None:
            ids, scores = _after_mask(ids, scores, after)
        ids, scores = _topk(ids, scores, k)
    return pd.DataFrame({"doc_id": ids, "score": scores})


def match_set_on_data(
    data: dict, plan, idfs: dict, avgdl: float, allowed: np.ndarray | None = None
) -> pd.DataFrame:
    """FULL (untruncated) match set of the plan — every matching
    (doc_id, score), ordered (score desc, doc_id asc).

    Feeds the AGGREGATION surfaces (facet counts, collapsed search),
    where the full-match-set output that top-k must avoid is not a
    hazard: callers reduce the set to per-value counts or per-group
    maxima BEFORE anything leaves the evaluating task, so emitted rows
    stay bounded by group cardinality, not match count."""
    if not data:
        return pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=np.int64),
                "score": np.empty(0, dtype=np.float64),
            }
        )
    bound = sum(len(d["ids"]) for d in data.values()) + 1
    return eval_plan_on_data(
        data, plan, idfs, avgdl, bound, exhaustive=True, allowed=allowed
    )


# facet aggregation output: (value, n_docs)
FACET_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("n_docs", T.LongType()),
    ]
)

TOP_HITS_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)

# date-histogram facet spec "date:<unit>": Spark date_format pattern +
# the matching numpy datetime_as_string unit (driver fast path). The
# 'T' separator keeps the two renderings byte-identical.
_FACET_DATE = {
    "year": ("yyyy", "Y"),
    "month": ("yyyy-MM", "M"),
    "day": ("yyyy-MM-dd", "D"),
    "hour": ("yyyy-MM-dd'T'HH", "h"),
}


def _facet_expr(facet: str):
    """facet spec -> (facet value Column). A plain name is a docs
    column (cast to string); ``date:{year|month|day|hour}`` is a ts
    histogram bucket."""
    if facet.startswith("date:"):
        unit = facet.split(":", 1)[1]
        if unit not in _FACET_DATE:
            raise ValueError(
                f"unknown date facet unit {unit!r} (use {sorted(_FACET_DATE)})"
            )
        return F.date_format("ts", _FACET_DATE[unit][0])
    return F.col(facet).cast("string")


def _facet_counts_pdf(values: pd.Series, limit: int | None) -> pd.DataFrame:
    """Value series -> (value, n_docs) partial/final counts; nulls form
    their own group (SQL GROUP BY semantics)."""
    vc = values.value_counts(dropna=False)
    pdf = pd.DataFrame(
        {
            "value": [None if pd.isna(v) else str(v) for v in vc.index],
            "n_docs": vc.to_numpy(np.int64),
        }
    )
    pdf = pdf.sort_values(
        ["n_docs", "value"],
        ascending=[False, True],
        na_position="last",
        kind="stable",
    ).reset_index(drop=True)
    return pdf.head(limit) if limit else pdf


# ---------------------------------------------------------------------------
# SegmentIndex — load + search
# ---------------------------------------------------------------------------

@dataclass
class SegmentIndex:
    spark: SparkSession
    path: str
    meta: dict
    docs: DataFrame | None = None  # optional: match-all + filters + hydration
    # Below this many total postings the driver collects the (pruned)
    # segment rows and evaluates in-process — one Spark job instead of
    # three, mirroring a search coordinator's short-circuit for rare
    # terms. Head terms at 100 TB exceed it and take the distributed
    # path (identical results, tested).
    driver_topk_threshold: int = 2_000_000
    # Bounded decoded-postings LRU (bytes): the serving-coordinator
    # analog of the reference's mmap'd warm index (Tantivy keeps hot
    # posting bytes in the page cache; we keep hot DECODED term arrays
    # on the coordinator). A warm repeat query runs ZERO Spark jobs —
    # pure NumPy WAND. Head terms above driver_topk_threshold never
    # reach this path, so entries are bounded individually too.
    # Sizing note: warm entries additionally memoize DECODED positions
    # for phrase queries (~4-8x the at-rest positions bytes) and the
    # query-independent tf_part array (8 B/posting); neither is
    # re-counted against the cap — budget term_cache_mb accordingly.
    term_cache_mb: int = 512
    _segments: DataFrame = field(default=None, repr=False)
    _df_memo: dict = field(default_factory=dict, repr=False)
    _term_cache: dict = field(default_factory=dict, repr=False)
    _term_cache_bytes: int = 0
    # driver-pinned (doc_id -> role, ts) arrays, sorted by doc_id —
    # set via pin_doc_attrs (XfIndex.cache wires it when the doc store
    # fits pin_docs_mb); lets the driver fast path resolve role/date
    # filters in NumPy with zero Spark jobs
    _pinned_attrs: tuple | None = field(default=None, repr=False)
    # driver-pinned (doc_id -> collapse group) arrays, sorted by
    # doc_id — set via pin_doc_groups; lets search_collapsed resolve
    # best-hit-per-group in NumPy with zero Spark jobs
    _pinned_groups: tuple | None = field(default=None, repr=False)
    # the column the pinned groups were built from (pin_doc_groups'
    # ``col``): the collapse fast path must not serve a DIFFERENT
    # group_col from conv_id-keyed pins
    _pinned_groups_col: str | None = field(default=None, repr=False)
    # legacy-index shard derivation: sorted (upper_doc_id, shard_id)
    # pairs computed once from the segments' block metadata (see
    # _shard_for_docs); None until first needed
    _shard_bounds: list | None = field(default=None, repr=False)
    # fuzzy-expansion memo: query term -> sorted variant list (the
    # vocabulary is static per index build, like _df_memo)
    _fuzzy_memo: dict = field(default_factory=dict, repr=False)
    # dictionary-expansion memo for wildcard / ~d fuzzy / phrase-prefix
    # atoms: multiterm_leaves key -> ranked term list
    _multiterm_memo: dict = field(default_factory=dict, repr=False)
    # corpus max-ts memo (decay-scoring anchor); append/compact reload
    # a fresh SegmentIndex, so instance lifetime == index version
    _max_ts_memo: object = field(default=None, repr=False)
    # lazily-built sorted vocabulary artifact (see _vocab_df)
    _vocab_cache: DataFrame | None = field(default=None, repr=False)

    @classmethod
    def load(cls, spark: SparkSession, path: str, docs: DataFrame | None = None):
        # finish (or discard) any compaction interrupted mid-commit —
        # idempotent file ops; the meta/segments pair is consistent after
        if recover_compaction(path):
            from xf_spark.index.segments import refresh_index_paths

            refresh_index_paths(spark, path)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        ix = cls(spark=spark, path=path, meta=meta, docs=docs)
        ix._segments = spark.read.parquet(os.path.join(path, "segments"))
        # incremental-append correction: a slice encoded its block-max
        # WAND bounds with its OWN avgdl; tf_part is increasing in
        # avgdl and bounded by the ratio, so scaling old bounds by
        # max(1, avgdl_now/avgdl_enc) keeps them valid upper bounds
        # (see segments.append_index). Exact scores are unaffected
        # (recomputed from raw tf/dl at query time).
        cur = meta["avgdl"]
        scales = {
            int(s): max(1.0, cur / enc)
            for s, enc in (meta.get("slice_avgdl") or {}).items()
            if enc and enc > 0
        }
        if any(v > 1.0 for v in scales.values()):
            expr = None
            for s, v in scales.items():
                if expr is None:
                    expr = F.when(F.col("slice") == s, F.lit(float(v)))
                else:
                    expr = expr.when(F.col("slice") == s, F.lit(float(v)))
            ix._segments = ix._segments.withColumn(
                "bm_scale", expr.otherwise(F.lit(1.0))
            )
        return ix

    @property
    def stats(self) -> CorpusStats:
        return CorpusStats(self.meta["n_docs"], self.meta["avgdl"])

    def cache(self, coalesce_to: int = 16, warm_top_terms: int = 0):
        """Cache segments for repeated queries. Coalescing bounds the
        per-query task count (a cached scan visits every cached
        partition; tens of file-sized partitions = pure scheduling
        overhead at ~5 ms/task).

        ``warm_top_terms > 0`` additionally prefetches the N highest-df
        text terms into the decoded-postings LRU (one vocab agg + one
        pruned scan at startup) — the serving warmup that makes even a
        FIRST query on a common term run zero Spark jobs. Terms above
        driver_topk_threshold are skipped (they serve distributed).

        Idempotent on the cache itself: calling again (e.g. to add the
        warm prefetch later) must NOT coalesce-and-cache a second copy
        on top of the first — the old copy would stay pinned in the
        block manager for the session's lifetime."""
        if not self._segments.is_cached:
            if coalesce_to:
                self._segments = self._segments.coalesce(coalesce_to)
            self._segments = self._segments.cache()
            self._segments.count()
        if warm_top_terms:
            top = (
                self._segments.where(F.col("field") == "text")
                .groupBy("term")
                .agg(F.sum("n_docs").alias("df"))
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(warm_top_terms)
                .collect()
            )
            warm = set()
            for r in top:
                self._df_memo[("text", r["term"])] = int(r["df"])
                if int(r["df"]) <= self.driver_topk_threshold:
                    warm.add(r["term"])
            if warm:
                self._term_data_for(warm, set())
        return self

    def term_dfs(self, terms: set[str], fld: str) -> dict:
        """Global df per term = sum of per-shard segment sizes — served
        from the segments table itself (columnar read of `n_docs` with
        bucket pruning; no separate vocab artifact), memoized driver-
        side (the vocabulary is static per index build)."""
        if not terms:
            return {}
        out = {}
        missing = []
        for t in terms:
            key = (fld, t)
            if key in self._df_memo:
                if self._df_memo[key]:
                    out[t] = self._df_memo[key]
            else:
                missing.append(t)
        if missing:
            buckets = sorted({term_bucket(t, self.meta["n_buckets"]) for t in missing})
            rows = (
                self._segments.where(
                    (F.col("field") == fld)
                    & F.col("bucket").isin(buckets)
                    & F.col("term").isin(sorted(missing))
                )
                .groupBy("term")
                .agg(F.sum("n_docs").alias("df"))
                .collect()
            )
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_memo[(fld, t)] = found.get(t, 0)
                if t in found:
                    out[t] = found[t]
        return out

    def _vocab_df(self) -> "DataFrame":
        """Sorted vocabulary artifact: (term, len, df) for the text
        field, term-ORDERED parquet under ``<index>/vocab`` — the
        Tantivy term-dictionary (FST) analog for multiterm expansion.

        Why: wildcard / fuzzy / phrase-prefix / complete / suggest
        resolve against the vocabulary. The segments table is hash-
        bucketed, so its row-group term ranges span the alphabet and a
        ``te*`` scan reads every row group (~n_shards rows per term).
        This artifact is one row per term, range-partitioned and
        sorted by term, so parquet min/max stats prune a prefix
        pattern to O(matching range) row groups, and the length
        column prunes fuzzy windows — at 10^12-turn vocabulary sizes
        the difference between "walk the whole dictionary" and "read
        one range".

        Built LAZILY on first use (one distributed aggregate over the
        segments metadata columns), committed atomically (tmp dir +
        rename), and keyed on (n_docs, total_tokens) so any append /
        purge invalidates it; compaction preserves corpus content and
        keeps it valid. Falls back to the segments aggregate when the
        index dir is not writable."""
        if getattr(self, "_vocab_cache", None) is not None:
            return self._vocab_cache
        import shutil

        vpath = os.path.join(self.path, "vocab")
        marker = os.path.join(vpath, "_VOCAB_META.json")
        key = {
            "n_docs": int(self.meta["n_docs"]),
            "total_tokens": int(self.meta.get("total_tokens", 0)),
        }
        fresh = False
        if os.path.isfile(marker):
            try:
                with open(marker) as f:
                    fresh = json.load(f) == key
            except (OSError, ValueError):
                fresh = False
        if not fresh:
            agg = (
                self._segments.where(F.col("field") == "text")
                .groupBy("term")
                .agg(F.sum("n_docs").cast("long").alias("df"))
                .withColumn("len", F.length("term"))
            )
            n_parts = max(1, int(self.meta.get("n_buckets", 8)) // 16)
            # uniquely-suffixed tmp dir: two builders racing here must
            # not clobber each other's in-progress write (a shared
            # vpath+'.tmp' would let one rmtree the other's output)
            tmp = "{}.tmp-{}-{}".format(vpath, os.getpid(), id(self))
            try:
                shutil.rmtree(tmp, ignore_errors=True)
                (
                    agg.repartitionByRange(n_parts, "term")
                    .sortWithinPartitions("term")
                    .write.mode("overwrite")
                    .option("compression", "zstd")
                    .parquet(tmp)
                )
                with open(os.path.join(tmp, "_VOCAB_META.json"), "w") as f:
                    json.dump(key, f)
                shutil.rmtree(vpath, ignore_errors=True)
                os.rename(tmp, vpath)
            except Exception:  # noqa: BLE001 — artifact is an optimization
                # read-only index dir (surfaces as OSError from the
                # marker/rename ops or as a JVM write error from the
                # parquet commit): serve the aggregate directly — same
                # results, no persisted artifact
                shutil.rmtree(tmp, ignore_errors=True)
                self._vocab_cache = agg
                return agg
        try:
            self._vocab_cache = self.spark.read.parquet(vpath)
        except Exception:  # noqa: BLE001
            # rmtree+rename above is not atomic for a CONCURRENT reader
            # in another process: it can observe a missing/half-swapped
            # dir. Serve the segments aggregate for this call (same
            # results); the next call re-checks the marker and picks up
            # the completed artifact.
            return (
                self._segments.where(F.col("field") == "text")
                .groupBy("term")
                .agg(F.sum("n_docs").cast("long").alias("df"))
                .withColumn("len", F.length("term"))
            )
        return self._vocab_cache

    def fuzzy_variants(self, term: str) -> list[str]:
        """Dictionary terms within Levenshtein distance 1 of ``term``
        (the exact term included when present), df-ranked and capped at
        FUZZY_MAX_EXPANSIONS — Lucene FuzzyQuery semantics over the
        segment vocabulary.

        Scale shape: ONE scan of the sorted vocabulary artifact
        (_vocab_df: one row per term) with the `len BETWEEN L-1 AND
        L+1` window as a plain column predicate — n_shards-times fewer
        rows than the segments table, paid once per NOVEL fuzzy term
        and memoized for the index lifetime. Found dfs feed _df_memo,
        so idf resolution is free afterward."""
        return self.fuzzy_variants_many({term})[term]

    def fuzzy_variants_many(self, terms) -> dict[str, list[str]]:
        """Batched variant lookup: ONE vocabulary scan serves every
        novel term in ``terms`` (the msearch amortization pattern —
        per-query lookups would pay the scan per member). Memoized
        terms are answered from the memo without a job."""
        out: dict[str, list[str]] = {}
        novel: list[str] = []
        for term in terms:
            if term in self._fuzzy_memo:
                out[term] = self._fuzzy_memo[term]
            elif len(term) < FUZZY_MIN_LEN:
                # AUTO distance 0 below 3 chars: no expansion
                self._fuzzy_memo[term] = [term]
                out[term] = [term]
            else:
                novel.append(term)
        if not novel:
            return out
        # one scan of the sorted vocab artifact (one row per term, len
        # column pushed); the predicate is the union of the per-term
        # length windows
        length_cond = None
        for t in novel:
            c = F.col("len").between(len(t) - 1, len(t) + 1)
            length_cond = c if length_cond is None else (length_cond | c)
        spark = self._segments.sparkSession
        qdf = arrow_local(spark, "qterm string", {"qterm": list(novel)})
        rows = (
            self._vocab_df().where(length_cond)
            .join(
                F.broadcast(qdf),
                F.levenshtein(F.col("term"), F.col("qterm")) <= 1,
            )
            .collect()
        )
        by_q: dict[str, list] = {t: [] for t in novel}
        for r in rows:
            by_q[r["qterm"]].append((-int(r["df"]), r["term"]))
            self._df_memo[("text", r["term"])] = int(r["df"])
        for t in novel:
            ranked = [term for _, term in sorted(by_q[t])]
            variants = ranked[:FUZZY_MAX_EXPANSIONS] or [t]
            self._fuzzy_memo[t] = variants
            out[t] = variants
        return out

    def _expand_fuzzy(self, plan):
        """AST rewrite for fuzzy=True (shared with BM25Engine — see
        parser.expand_fuzzy_plan for the semantics)."""
        return expand_fuzzy_plan(plan, self.fuzzy_variants)

    def _multiterm_variants(self, leaves) -> dict:
        """Resolve dictionary-expansion leaves (multiterm_leaves keys)
        against the sorted vocabulary artifact (_vocab_df): each novel
        leaf is ONE range-pruned scan — startswith for phrase-prefix,
        startswith + LIKE for wildcard (the literal prefix is a term
        RANGE over the sorted files, so parquet stats prune it; '' ->
        full dictionary scan, the FST-walk cost class), length-window
        + levenshtein for ~d.
        Ranked (df desc, term asc), capped at MULTITERM_MAX_EXPANSIONS,
        memoized per index lifetime; found dfs feed _df_memo."""
        from xf_spark.query.parser import (
            MULTITERM_MAX_EXPANSIONS,
            wildcard_literal_prefix,
            wildcard_to_like,
        )

        out: dict = {}
        for leaf in leaves:
            if leaf in self._multiterm_memo:
                out[leaf] = self._multiterm_memo[leaf]
                continue
            kind = leaf[0]
            if kind == "fuzzy":
                t, d = leaf[1], leaf[2]
                if len(t) < FUZZY_MIN_LEN:
                    # AUTO clamping: too short to fuzz, stays exact
                    out[leaf] = self._multiterm_memo[leaf] = [t]
                    continue
                if d == 1:
                    out[leaf] = self._multiterm_memo[leaf] = (
                        self.fuzzy_variants(t)
                    )
                    continue
                cond = F.col("len").between(len(t) - d, len(t) + d) & (
                    F.levenshtein(F.col("term"), F.lit(t)) <= d
                )
            elif kind == "wildcard":
                pat = leaf[1]
                cond = F.col("term").like(wildcard_to_like(pat))
                lit = wildcard_literal_prefix(pat)
                if lit:
                    # sorted artifact: startswith is a term RANGE, so
                    # parquet min/max stats prune to the matching row
                    # groups instead of walking the dictionary
                    cond = F.col("term").startswith(lit) & cond
            else:  # pprefix
                cond = F.col("term").startswith(leaf[1])
            rows = (
                self._vocab_df().where(cond)
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(MULTITERM_MAX_EXPANSIONS)
                .collect()
            )
            for r in rows:
                self._df_memo[("text", r["term"])] = int(r["df"])
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

    def suggest(self, query: str) -> str | None:
        """Did-you-mean suggestion (the zero-hit UX of Lucene's
        DirectSpellChecker): every query term ABSENT from the
        vocabulary is replaced in the query string by its highest-df
        edit-distance-1 neighbor (df desc, term asc — the fuzzy
        ranking). Returns the corrected query, or None when every
        term is known or no neighbor exists. One batched vocabulary
        scan serves all misspelled terms (fuzzy_variants_many)."""
        import re as _re

        plan, _roles = parse_query_extract(query)
        if plan == ("all",):
            return None
        terms = query_terms(plan)
        if not terms:
            return None
        dfs = self.term_dfs(terms, "text")
        missing = sorted(t for t in terms if not dfs.get(t))
        if not missing:
            return None
        variants = self.fuzzy_variants_many(set(missing))
        out = query
        for t in missing:
            cand = [v for v in variants[t] if v != t]
            if not cand:
                continue
            out = _re.sub(
                rf"(?i)(?<![0-9A-Za-z]){_re.escape(t)}(?![0-9A-Za-z])",
                cand[0],
                out,
            )
        return out if out != query else None

    def complete(self, prefix: str, limit: int = 10) -> DataFrame:
        """Term autocomplete (the Lucene suggester UX, beyond the
        reference's surface): vocabulary terms starting with
        ``prefix`` (analyzed with the index tokenizer), ranked df
        desc / term asc. Output: (term string, df long).

        Scale shape: a range-pruned scan of the sorted vocabulary
        artifact (prefix = term range -> parquet row-group pruning);
        no posting decode, no row data. Output is limit-bounded via
        TakeOrdered."""
        from xf_spark.functions.textcore import tokenize

        toks = tokenize(prefix)
        if len(toks) != 1:
            raise ValueError(
                f"complete expects one analyzable term, got {prefix!r}"
            )
        p = toks[0]
        vocab = self._vocab_df().where(F.col("term").startswith(p)).select(
            "term", F.col("df").cast("long").alias("df")
        )
        return vocab.orderBy(F.desc("df"), F.asc("term")).limit(limit)

    @staticmethod
    def _entry_bytes(d: dict) -> int:
        n = len(d.get("positions_bin") or b"")
        for k in ("ids", "tfs", "dls", "block_last", "block_max"):
            n += d[k].nbytes
        return n

    def _term_data_for(self, tterms: set[str], pterms: set[str]) -> dict:
        """Decoded posting arrays for the query's terms, served from
        the driver LRU; misses fetch ONE pruned scan for just the
        missing terms. Eviction keeps the cache under term_cache_mb;
        oversized single terms are returned uncached."""
        need = [("text", t) for t in sorted(tterms)] + [
            ("prefix", t) for t in sorted(pterms)
        ]
        out: dict = {}
        missing: list[tuple[str, str]] = []
        for key in need:
            if key in self._term_cache:
                # LRU touch
                out[key] = self._term_cache.pop(key)
                self._term_cache[key] = out[key]
            elif self._df_memo.get(key, 0) > 0:
                missing.append(key)
        if missing:
            nb = self.meta["n_buckets"]
            mt = sorted({t for f, t in missing if f == "text"})
            mp = sorted({t for f, t in missing if f == "prefix"})
            buckets = sorted(
                {term_bucket(t, nb) for t in mt} | {term_bucket(t, nb) for t in mp}
            )
            cond = F.lit(False)
            if mt:
                cond = cond | ((F.col("field") == "text") & F.col("term").isin(mt))
            if mp:
                cond = cond | ((F.col("field") == "prefix") & F.col("term").isin(mp))
            pdf = self._segments.where(
                F.col("bucket").isin(buckets) & cond
            ).toPandas()
            fresh = build_term_data(pdf)
            cap = self.term_cache_mb * 1_000_000
            for key, d in fresh.items():
                out[key] = d
                b = self._entry_bytes(d)
                if b > cap:
                    continue  # oversized: serve once, don't cache
                while self._term_cache_bytes + b > cap and self._term_cache:
                    old_k = next(iter(self._term_cache))
                    old = self._term_cache.pop(old_k)
                    self._term_cache_bytes -= self._entry_bytes(old)
                self._term_cache[key] = d
                self._term_cache_bytes += b
        return out

    def search(
        self,
        query: str,
        limit: int = 20,
        offset: int = 0,
        roles: list[str] | None = None,
        since=None,
        until=None,
        exhaustive: bool = False,
        fuzzy: bool = False,
        after: tuple | None = None,
        min_should_match: int = 1,
        synonyms: dict | None = None,
    ) -> DataFrame:
        """``synonyms={"ml": ["machine learning", "ai"], ...}``:
        query-time synonym expansion — each matching term leaf becomes
        an OR of itself plus its synonyms (multi-word synonyms are
        PHRASES), every clause scored with its own idf
        (parser.expand_synonyms_plan).

        ``after=(score, doc_id)``: cursor pagination (Elasticsearch
        search_after) — return the next ``limit`` hits STRICTLY after
        the cursor in (score desc, doc_id asc) order. Unlike offset
        pagination (whose cost grows as O(offset + limit) per page),
        the cursor keeps every page k-bounded: inside WAND it only
        masks candidates, so block-max pruning still applies. Mutually
        exclusive with ``offset``.

        ``min_should_match=m``: docs must match >= m of a root OR's
        clauses (Lucene setMinimumNumberShouldMatch); scored over
        their matching clauses only. Applied BEFORE fuzzy expansion,
        so each clause's variant family still counts as one clause."""
        if after is not None:
            if offset:
                raise ValueError("after and offset are mutually exclusive")
            after = (float(after[0]), int(after[1]))
        _t0 = time.time()  # perf-budget clock (driver-resolved paths)
        plan, qroles = parse_query_extract(query)
        if qroles:
            # query-embedded type:/role: filters AND with the roles
            # kwarg; a contradictory intersection matches nothing
            if roles:
                roles = sorted(set(roles) & set(qroles))
                if not roles:
                    return empty_local(self.spark, TOPK_SCHEMA)
            else:
                roles = qroles
        if plan == ("all",):
            if min_should_match > 1:
                from xf_spark.query.parser import apply_min_should_match

                apply_min_should_match(plan, min_should_match)  # raises
            if self.docs is None:
                raise ValueError("match-all requires a docs table")
            out = self.docs.select("doc_id", F.lit(1.0).alias("score"))
            return self._finish(out, limit, offset, roles, since, until, after)

        if min_should_match > 1:
            from xf_spark.query.parser import apply_min_should_match

            plan = apply_min_should_match(plan, min_should_match)
        if synonyms:
            from xf_spark.query.parser import expand_synonyms_plan

            plan = expand_synonyms_plan(plan, synonyms)
        if fuzzy:
            plan = self._expand_fuzzy(plan)
        plan = self._expand_multiterm(plan)
        tterms = query_terms(plan)
        pterms = prefix_terms(plan)
        n = self.meta["n_docs"]
        idfs = {
            ("text", t): idf_for(n, df)
            for t, df in self.term_dfs(tterms, "text").items()
        }
        idfs.update(
            {
                ("prefix", t): idf_for(n, df)
                for t, df in self.term_dfs(pterms, "prefix").items()
            }
        )

        def pruned_seg() -> DataFrame:
            # built lazily: the warm driver fast path serves from the
            # term LRU and must not touch the segments DataFrame
            return self._pruned_scan(tterms, pterms)

        filtered = bool(roles) or since is not None or until is not None
        avgdl = self.meta["avgdl"]
        k_page = max(limit + offset, limit)
        plan_b, idfs_b = plan, idfs

        total_postings = sum(
            self._df_memo.get(("text", t), 0) for t in tterms
        ) + sum(self._df_memo.get(("prefix", t), 0) for t in pterms)
        if total_postings <= self.driver_topk_threshold:
            # driver fast path: decoded postings from the term LRU
            # (warm repeat = zero Spark jobs), misses via one pruned
            # scan; shards merge per term (doc ranges disjoint/ordered)
            # and the whole plan evaluates ONCE. Filters resolve to an
            # `allowed` id set BEFORE top-k — bounded by the candidate
            # universe (<= total_postings <= driver_topk_threshold),
            # never by the corpus.
            data = self._term_data_for(tterms, pterms)
            allowed = None
            if filtered and data:
                if self.docs is None and self._pinned_attrs is None:
                    # mirror the match-all guard: silently returning
                    # UNFILTERED rows as if filtered is a wrong answer
                    raise ValueError("filters require a docs table")
                allowed = self._allowed_ids(data, roles, since, until)
            if data:
                out = eval_plan_on_data(
                    data, plan_b, idfs_b, avgdl, k_page, exhaustive, allowed,
                    after,
                )
                ids = out["doc_id"].to_numpy(np.int64)[offset : offset + limit]
                sc = out["score"].to_numpy(np.float64)[offset : offset + limit]
            else:
                ids = np.empty(0, dtype=np.int64)
                sc = np.empty(0, dtype=np.float64)
            # rank fully resolved in-driver: emit the final page as a
            # local relation (a 20-row Spark orderBy costs ~250 ms of
            # pure scheduling — measured, not guessed)
            from xf_spark import perf

            perf.record(
                perf.budget_for_plan(plan, filtered), time.time() - _t0
            )
            return arrow_local(
                self.spark, TOPK_SCHEMA, {"doc_id": ids, "score": sc}
            )
        if filtered:
            # distributed filtered path: cogroup segments with the
            # SHARD-ALIGNED doc attributes (role/ts predicates pushed
            # to the docs parquet scan), resolve the filter inside the
            # shard, and emit k rows per shard — the round-1
            # full-match-set scatter is gone (per-shard output is
            # k-bounded regardless of term frequency or filter width).
            # A legacy docs parquet without the shard column derives it
            # from the segments' block metadata (see _shard_for_docs) —
            # no unbounded per-shard output survives on any path.
            if self.docs is None:
                raise ValueError("filters require a docs table")
            scored = self._scored_filtered_distributed(
                pruned_seg(), plan_b, idfs_b, avgdl, k_page, exhaustive,
                roles, since, until, after,
            )
            return self._rank_page(scored, limit, offset)

        after_b = after

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            return eval_shard(
                pdf, plan_b, idfs_b, avgdl, k_page, exhaustive, None, after_b
            )

        scored = pruned_seg().groupBy("shard").applyInPandas(run, schema=TOPK_SCHEMA)
        return self._rank_page(scored, limit, offset)

    def _scored_filtered_distributed(
        self, seg, plan_b, idfs_b, avgdl, k_page, exhaustive,
        roles, since, until, after=None,
    ) -> DataFrame:
        """Cogroup (segments x filtered doc attrs) by shard; evaluate
        with the shard-local allowed set; k rows out per shard."""
        cond = _attr_cond(roles, since, until)
        filtered_docs = self.docs.where(cond)
        if "shard" in self.docs.columns and not self.meta.get("docs_shard_stale"):
            attrs = filtered_docs.select("shard", "doc_id")
        else:
            # legacy docs without the column, or a compacted index whose
            # stored shard layout predates the re-shard: derive from the
            # segments' block metadata (exact for contiguous doc ranges)
            attrs = filtered_docs.select(
                self._shard_for_docs().alias("shard"), "doc_id"
            )

        def run_cg(seg_pdf: pd.DataFrame, attr_pdf: pd.DataFrame) -> pd.DataFrame:
            if not len(seg_pdf) or not len(attr_pdf):
                return pd.DataFrame(
                    {
                        "doc_id": np.empty(0, dtype=np.int64),
                        "score": np.empty(0, dtype=np.float64),
                    }
                )
            allowed = np.sort(attr_pdf["doc_id"].to_numpy(np.int64))
            return eval_shard(
                seg_pdf, plan_b, idfs_b, avgdl, k_page, exhaustive, allowed,
                after,
            )

        return (
            seg.groupBy("shard")
            .cogroup(attrs.groupBy("shard"))
            .applyInPandas(run_cg, schema=TOPK_SCHEMA)
        )

    # -- aggregation surfaces: facets + field collapsing -------------------

    def _resolve_match_plan(self, query: str, roles, fuzzy: bool):
        """Parse + merge query-embedded role filters + fuzzy-expand +
        resolve idfs — the shared front half of every query surface.
        Returns (plan, roles, idfs, tterms, pterms, total_postings);
        plan is None when the merged role set is contradictory
        (matches nothing)."""
        plan, qroles = parse_query_extract(query)
        if qroles:
            if roles:
                roles = sorted(set(roles) & set(qroles))
                if not roles:
                    return None, [], {}, set(), set(), 0
            else:
                roles = qroles
        if plan == ("all",):
            return plan, roles, {}, set(), set(), 0
        if fuzzy:
            plan = self._expand_fuzzy(plan)
        plan = self._expand_multiterm(plan)
        tterms = query_terms(plan)
        pterms = prefix_terms(plan)
        n = self.meta["n_docs"]
        idfs = {
            ("text", t): idf_for(n, df)
            for t, df in self.term_dfs(tterms, "text").items()
        }
        idfs.update(
            {
                ("prefix", t): idf_for(n, df)
                for t, df in self.term_dfs(pterms, "prefix").items()
            }
        )
        total = sum(self._df_memo.get(("text", t), 0) for t in tterms) + sum(
            self._df_memo.get(("prefix", t), 0) for t in pterms
        )
        return plan, roles, idfs, tterms, pterms, total

    def _attrs_with_shard(self, base: DataFrame, *cols) -> DataFrame:
        """Doc attributes keyed by the segment shard (shard column when
        present and current, else derived from the segments' own block
        metadata — see _shard_for_docs)."""
        if "shard" in self.docs.columns and not self.meta.get("docs_shard_stale"):
            return base.select("shard", *cols)
        return base.select(self._shard_for_docs().alias("shard"), *cols)

    def _empty_local(self, schema) -> DataFrame:
        return empty_local(self.spark, schema)

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
        """Search-engine facet aggregation (the Lucene/Tantivy facet-
        collector analog): MATCHING-document counts per facet value
        over the query's FULL match set — not the top-k page — under
        the same plan semantics, role/ts filters, and fuzzy expansion
        as ``search``.

        ``facet`` is a docs-table column name ("role", "tool", ...) or
        a ts histogram spec ``date:{year|month|day|hour}``. Returns
        (value, n_docs) ordered (n_docs desc, value asc), optionally
        limited; null facet values form their own group (SQL GROUP BY).

        Scale shape: counting is an AGGREGATION, so the full-match-set
        fanout top-k must avoid is not a hazard — each shard task
        reduces its matches to one partial row per distinct facet
        value (map-side combine), the global sum shuffles only those
        partials, and a high-cardinality facet degrades like any
        groupBy (AQE-managed), never quadratically. Driver fast path:
        postings under driver_topk_threshold resolve role/date facets
        from pinned attrs in NumPy — zero Spark jobs warm."""
        plan, roles, idfs, tterms, pterms, total = self._resolve_match_plan(
            query, roles, fuzzy
        )
        if plan is None:
            return self._empty_local(FACET_SCHEMA)
        vexpr = _facet_expr(facet)  # validate the spec before any work
        filtered = bool(roles) or since is not None or until is not None
        if plan == ("all",):
            if self.docs is None:
                raise ValueError("facets require a docs table")
            out = (
                self.docs.where(_attr_cond(roles, since, until))
                .groupBy(vexpr.alias("value"))
                .agg(F.count(F.lit(1)).alias("n_docs"))
            )
            return self._facet_order(out, limit)
        avgdl = self.meta["avgdl"]
        if total <= self.driver_topk_threshold:
            data = self._term_data_for(tterms, pterms)
            allowed = None
            if filtered and data:
                if self.docs is None and self._pinned_attrs is None:
                    raise ValueError("filters require a docs table")
                allowed = self._allowed_ids(data, roles, since, until)
            ids = (
                match_set_on_data(data, plan, idfs, avgdl, allowed)["doc_id"]
                .to_numpy(np.int64)
            )
            ids = np.sort(ids)
            return self._facet_of_ids(ids, facet, vexpr, limit)
        if self.docs is None:
            raise ValueError("facets require a docs table")
        seg = self._pruned_scan(tterms, pterms)
        base = (
            self.docs.where(_attr_cond(roles, since, until))
            if filtered
            else self.docs
        )
        attrs = self._attrs_with_shard(
            base.withColumn("__fv", vexpr), "doc_id", "__fv"
        )
        plan_b, idfs_b, lim_b = plan, idfs, limit

        def run_cg(seg_pdf: pd.DataFrame, attr_pdf: pd.DataFrame) -> pd.DataFrame:
            if not len(seg_pdf) or not len(attr_pdf):
                return pd.DataFrame({"value": pd.Series([], dtype=object),
                                     "n_docs": pd.Series([], dtype=np.int64)})
            aid = attr_pdf["doc_id"].to_numpy(np.int64)
            order = np.argsort(aid)
            aid = aid[order]
            afv = attr_pdf["__fv"].to_numpy(object)[order]
            data = build_term_data(seg_pdf)
            # attrs are already filter-pruned, so they double as the
            # allowed-id set under filters
            mp = match_set_on_data(
                data, plan_b, idfs_b, avgdl, aid if filtered else None
            )
            ids = np.sort(mp["doc_id"].to_numpy(np.int64))
            if not len(ids):
                return pd.DataFrame({"value": pd.Series([], dtype=object),
                                     "n_docs": pd.Series([], dtype=np.int64)})
            pos = np.searchsorted(aid, ids)
            np.clip(pos, 0, len(aid) - 1, out=pos)
            m = aid[pos] == ids
            return _facet_counts_pdf(pd.Series(afv[pos[m]]), None)

        out = (
            seg.groupBy("shard")
            .cogroup(attrs.groupBy("shard"))
            .applyInPandas(run_cg, schema=FACET_SCHEMA)
            .groupBy("value")
            .agg(F.sum("n_docs").alias("n_docs"))
        )
        return self._facet_order(out, lim_b)

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
        """Terms-aggregation with per-bucket top hits (the
        Elasticsearch terms + top_hits sub-aggregation shape every
        "group results by X" UI sends): for each facet value over the
        query's FULL match set, the bucket's match count AND its top
        ``k`` hits by (score desc, doc_id asc).

        -> (value, n_docs, rank, doc_id, score), buckets ordered
        (n_docs desc, value asc), rank 1..k inside a bucket;
        ``limit`` bounds the number of BUCKETS (not rows).

        Scale shape: ONE match-set evaluation. Each shard task reduces
        its matches to <= (k + 1) rows per distinct facet value — its
        shard-local top-k plus one count partial — so nothing
        match-set-sized leaves a task; the global step sums count
        partials and windows the <= n_shards * k candidate rows per
        value down to k. A high-cardinality facet degrades like a
        groupBy (AQE-managed), never quadratically."""
        if int(k) < 1:
            raise ValueError("k must be >= 1")
        k = int(k)
        plan, roles, idfs, tterms, pterms, _total = self._resolve_match_plan(
            query, roles, fuzzy
        )
        if plan is None:
            return self._empty_local(TOP_HITS_SCHEMA)
        vexpr = _facet_expr(facet)
        if self.docs is None:
            raise ValueError("facets require a docs table")
        filtered = bool(roles) or since is not None or until is not None
        if plan == ("all",):
            svf = self.docs.where(_attr_cond(roles, since, until)).select(
                "doc_id", F.lit(1.0).alias("score"), vexpr.alias("value")
            )
            counts = svf.groupBy("value").agg(
                F.count(F.lit(1)).alias("n_docs")
            )
            return self._top_hits_merge(svf, counts, k, limit)
        avgdl = self.meta["avgdl"]
        if _total <= self.driver_topk_threshold:
            # driver fast path (the serving shape, mirroring
            # facet_counts): candidate-bounded match set scored in
            # NumPy; pinned attrs resolve role/date buckets with zero
            # Spark jobs, anything else is one broadcast join
            data = self._term_data_for(tterms, pterms)
            allowed = None
            if filtered and data:
                if self.docs is None and self._pinned_attrs is None:
                    raise ValueError("filters require a docs table")
                allowed = self._allowed_ids(data, roles, since, until)
            mp = match_set_on_data(data, plan, idfs, avgdl, allowed)
            ids = mp["doc_id"].to_numpy(np.int64)
            sc = mp["score"].to_numpy(np.float64)
            order = np.argsort(ids, kind="stable")
            return self._top_hits_of_ids(
                ids[order], sc[order], facet, vexpr, k, limit
            )
        seg = self._pruned_scan(tterms, pterms)
        base = (
            self.docs.where(_attr_cond(roles, since, until))
            if filtered
            else self.docs
        )
        attrs = self._attrs_with_shard(
            base.withColumn("__fv", vexpr), "doc_id", "__fv"
        )
        plan_b, idfs_b, k_b, filt_b = plan, idfs, k, filtered

        def run_cg(seg_pdf: pd.DataFrame, attr_pdf: pd.DataFrame):
            empty = pd.DataFrame(
                {
                    "value": pd.Series([], dtype=object),
                    "doc_id": pd.Series([], dtype="float64"),
                    "score": pd.Series([], dtype="float64"),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
            if not len(seg_pdf) or not len(attr_pdf):
                return empty
            aid = attr_pdf["doc_id"].to_numpy(np.int64)
            order = np.argsort(aid)
            aid = aid[order]
            afv = attr_pdf["__fv"].to_numpy(object)[order]
            mp = match_set_on_data(
                build_term_data(seg_pdf),
                plan_b,
                idfs_b,
                avgdl,
                aid if filt_b else None,
            )
            ids = mp["doc_id"].to_numpy(np.int64)
            if not len(ids):
                return empty
            sc = mp["score"].to_numpy(np.float64)
            pos = np.searchsorted(aid, ids)
            np.clip(pos, 0, len(aid) - 1, out=pos)
            m = aid[pos] == ids
            ids, sc, fv = ids[m], sc[m], afv[pos[m]]
            if not len(ids):
                return empty
            pdf = pd.DataFrame(
                {
                    "value": [None if pd.isna(v) else str(v) for v in fv],
                    "doc_id": ids,
                    "score": sc,
                }
            )
            out = []
            for v, g in pdf.groupby("value", dropna=False):
                vv = None if pd.isna(v) else str(v)
                top = g.sort_values(
                    ["score", "doc_id"], ascending=[False, True], kind="stable"
                ).head(k_b)
                out.append(
                    pd.DataFrame(
                        {
                            "value": vv,
                            "doc_id": top["doc_id"].astype("float64"),
                            "score": top["score"],
                            "n": np.int64(-1),
                        }
                    )
                )
                out.append(
                    pd.DataFrame(
                        {
                            "value": [vv],
                            "doc_id": [None],
                            "score": [None],
                            "n": [np.int64(len(g))],
                        }
                    )
                )
            return pd.concat(out, ignore_index=True)

        part_schema = T.StructType(
            [
                T.StructField("value", T.StringType()),
                T.StructField("doc_id", T.DoubleType()),
                T.StructField("score", T.DoubleType()),
                T.StructField("n", T.LongType()),
            ]
        )
        part = (
            seg.groupBy("shard")
            .cogroup(attrs.groupBy("shard"))
            .applyInPandas(run_cg, schema=part_schema)
        )
        # ONE grouped pass merges both partial kinds — a counts/hits
        # split would re-run the cogroup per branch and join them back
        # (measured 1.6 s vs 0.3 s at sf0.1): per value, sum the count
        # partials and keep the k smallest (-score, doc_id) structs of
        # the <= n_shards * k hit partials; bucket limit BEFORE the
        # explode so only surviving buckets expand
        agged = part.groupBy("value").agg(
            F.sum(
                F.when(F.col("doc_id").isNull(), F.col("n")).otherwise(0)
            ).alias("n_docs"),
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("doc_id").isNotNull(),
                            F.struct(
                                (-F.col("score")).alias("ns"),
                                F.col("doc_id").cast("long").alias("doc_id"),
                                F.col("score").alias("score"),
                            ),
                        )
                    )
                ),
                1,
                k,
            ).alias("top"),
        )
        agged = self._facet_order(agged, limit)
        return agged.select(
            "value",
            "n_docs",
            F.posexplode("top").alias("pos", "hit"),
        ).select(
            "value",
            "n_docs",
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("hit.doc_id").alias("doc_id"),
            F.col("hit.score").alias("score"),
        ).orderBy(
            F.desc("n_docs"), F.asc_nulls_last("value"), F.asc("rank")
        )

    def _top_hits_of_ids(
        self,
        ids: np.ndarray,
        scores: np.ndarray,
        facet: str,
        vexpr,
        k: int,
        limit: int | None,
    ) -> DataFrame:
        """Driver-path top-hits for a (sorted-by-id, candidate-
        bounded) scored match set: pinned attrs answer role/date
        buckets in pure NumPy/pandas — zero Spark jobs — else one
        broadcast join of the bounded id set against the docs scan."""
        if not len(ids):
            return self._empty_local(TOP_HITS_SCHEMA)
        if self._pinned_attrs is not None and len(self._pinned_attrs[0]):
            aid, arole, ats = self._pinned_attrs
            pos = np.searchsorted(aid, ids)
            np.clip(pos, 0, len(aid) - 1, out=pos)
            m = aid[pos] == ids
            vals = None
            if facet == "role":
                vals = arole[pos[m]]
            elif facet.startswith("date:"):
                unit = _FACET_DATE[facet.split(":", 1)[1]][1]
                tv = ats[pos[m]]
                vals = np.empty(len(tv), dtype=object)
                ok = ~np.isnat(tv)
                vals[ok] = np.datetime_as_string(tv[ok], unit=unit)
                vals[~ok] = None
            if vals is not None:
                pdf = pd.DataFrame(
                    {
                        "value": [
                            None if pd.isna(v) else str(v) for v in vals
                        ],
                        "doc_id": ids[m],
                        "score": scores[m],
                    }
                )
                buckets = []
                for v, g in pdf.groupby("value", dropna=False):
                    vv = None if pd.isna(v) else str(v)
                    top = g.sort_values(
                        ["score", "doc_id"],
                        ascending=[False, True],
                        kind="stable",
                    ).head(k)
                    buckets.append((vv, len(g), top))
                buckets.sort(key=lambda b: (-b[1], b[0] is None, b[0] or ""))
                if limit:
                    buckets = buckets[:limit]
                parts = []
                for vv, n, top in buckets:
                    parts.append(
                        pd.DataFrame(
                            {
                                "value": vv,
                                "n_docs": np.int64(n),
                                "rank": np.arange(
                                    1, len(top) + 1, dtype=np.int32
                                ),
                                "doc_id": top["doc_id"].to_numpy(np.int64),
                                "score": top["score"].to_numpy(np.float64),
                            }
                        )
                    )
                if not parts:
                    return self._empty_local(TOP_HITS_SCHEMA)
                return arrow_local(
                    self.spark, TOP_HITS_SCHEMA,
                    pd.concat(parts, ignore_index=True),
                )
        if self.docs is None:
            raise ValueError("facets require a docs table")
        sdf = arrow_local(
            self.spark, "doc_id long, score double",
            {"doc_id": ids, "score": scores},
        )
        svf = self.docs.join(F.broadcast(sdf), "doc_id").select(
            "doc_id", "score", vexpr.alias("value")
        )
        counts = svf.groupBy("value").agg(F.count(F.lit(1)).alias("n_docs"))
        return self._top_hits_merge(svf, counts, k, limit)

    def _top_hits_merge(
        self, hits: DataFrame, counts: DataFrame, k: int, limit: int | None
    ) -> DataFrame:
        """(value, doc_id, score) candidates + (value, n_docs) counts
        -> the TOP_HITS_SCHEMA result. Null facet values form their
        own bucket (eqNullSafe join — a plain column join would drop
        them)."""
        from pyspark.sql.window import Window

        if limit:
            counts = self._facet_order(counts, limit)
        w = Window.partitionBy("value").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        ranked = (
            hits.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .alias("h")
        )
        j = ranked.join(
            counts.alias("c"),
            F.col("h.value").eqNullSafe(F.col("c.value")),
        )
        return j.select(
            F.col("h.value").alias("value"),
            F.col("c.n_docs").alias("n_docs"),
            F.col("h.rank").alias("rank"),
            F.col("h.doc_id").alias("doc_id"),
            F.col("h.score").alias("score"),
        ).orderBy(
            F.desc("n_docs"),
            F.asc_nulls_last("value"),
            F.asc("rank"),
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
        approx: bool = False,
        approx_accuracy: int = 10_000,
    ) -> DataFrame:
        """Numeric stats sub-aggregation over the match set (the
        Elasticsearch stats + percentiles aggregation shape): ONE row
        (n, min, max, avg, sum, p50, p90, ...) of ``col`` across every
        matching doc. ``col`` is a docs column cast to double, or
        ``text_len`` (length(text) in characters). Percentiles are
        EXACT with linear interpolation (Spark `percentile` ==
        DuckDB `quantile_cont`) by default — the oracle-checkable
        contract. ``approx=True`` swaps in `approx_percentile`
        (Greenwald-Khanna, error <= 1/approx_accuracy relative rank):
        at 100 TB the exact percentile's per-group value buffer is the
        memory hazard, the sketch is mergeable constant space. Same
        output schema either way; `tests/test_approx_stats.py` pins
        exact==approx within the accuracy bound on the fixtures.

        Scale shape: pure aggregation — the match-set ids semi-join
        the docs scan (column-pruned to one numeric), then a single
        global aggregate row; nothing match-set-sized reaches the
        driver."""
        if self.docs is None:
            raise ValueError("match_stats requires a docs table")
        ids = self.match_ids_df(query, roles, since, until, fuzzy)
        cexpr = (
            F.length("text").cast("double")
            if col == "text_len"
            else F.col(col).cast("double")
        )
        vals = self.docs.join(ids, "doc_id", "left_semi").select(
            cexpr.alias("v")
        )
        aggs = [
            F.count("v").alias("n"),
            F.min("v").alias("min"),
            F.max("v").alias("max"),
            F.avg("v").alias("avg"),
            F.sum("v").alias("sum"),
        ]
        for p in percentiles:
            name = f"p{int(round(p * 100))}"
            if approx:
                aggs.append(
                    F.approx_percentile(
                        "v", F.lit(float(p)), F.lit(int(approx_accuracy))
                    ).cast("double").alias(name)
                )
            else:
                aggs.append(F.percentile("v", F.lit(float(p))).alias(name))
        return vals.agg(*aggs)

    def facet_counts_multi(
        self,
        query: str,
        facets: list[str] = ("role",),
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
        limit: int | None = None,
    ) -> DataFrame:
        """Several facets from ONE match-set resolution (the
        multi-facet request shape every search UI sends): the match
        set is evaluated once, then every facet aggregates off the
        same doc set — N facets cost one query evaluation plus one
        grouped count, not N query evaluations.

        -> (facet, value, n_docs); ``limit`` applies per facet.
        Ordering inside a facet: (n_docs desc, value asc)."""
        vexprs = [(f, _facet_expr(f)) for f in facets]  # validate all
        multi_schema = T.StructType(
            [
                T.StructField("facet", T.StringType()),
                T.StructField("value", T.StringType()),
                T.StructField("n_docs", T.LongType()),
            ]
        )
        if self.docs is None:
            raise ValueError("facets require a docs table")
        mdf = self.match_ids_df(
            query, roles=roles, since=since, until=until, fuzzy=fuzzy
        )
        pairs = F.explode(
            F.array(
                *[
                    F.struct(F.lit(f).alias("facet"), ve.alias("value"))
                    for f, ve in vexprs
                ]
            )
        ).alias("p")
        out = (
            self.docs.join(mdf, "doc_id", "left_semi")
            .select(pairs)
            .select("p.facet", "p.value")
            .groupBy("facet", "value")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        if limit:
            from pyspark.sql import Window

            w = Window.partitionBy("facet").orderBy(
                F.desc("n_docs"), F.asc_nulls_last("value")
            )
            out = (
                out.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= limit)
                .drop("__rn")
            )
        return out.orderBy(
            F.asc("facet"), F.desc("n_docs"), F.asc_nulls_last("value")
        )

    def _facet_order(self, out: DataFrame, limit: int | None) -> DataFrame:
        out = out.orderBy(F.desc("n_docs"), F.asc_nulls_last("value"))
        return out.limit(limit) if limit else out

    def _facet_of_ids(
        self, ids: np.ndarray, facet: str, vexpr, limit: int | None
    ) -> DataFrame:
        """Driver-path facet resolution for a (sorted, candidate-
        bounded) matched-id array: pinned attrs answer role/date
        facets in NumPy with zero Spark jobs; anything else is one
        broadcast join of the k-bounded id set against the docs scan."""
        if not len(ids):
            return self._empty_local(FACET_SCHEMA)
        if self._pinned_attrs is not None and len(self._pinned_attrs[0]):
            aid, arole, ats = self._pinned_attrs
            pos = np.searchsorted(aid, ids)
            np.clip(pos, 0, len(aid) - 1, out=pos)
            m = aid[pos] == ids
            ser = None
            if facet == "role":
                ser = pd.Series(arole[pos[m]])
            elif facet.startswith("date:"):
                unit = _FACET_DATE[facet.split(":", 1)[1]][1]
                tv = ats[pos[m]]
                vals = np.empty(len(tv), dtype=object)
                ok = ~np.isnat(tv)
                vals[ok] = np.datetime_as_string(tv[ok], unit=unit)
                vals[~ok] = None
                ser = pd.Series(vals)
            if ser is not None:
                pdf = _facet_counts_pdf(ser, limit)
                if not len(pdf):
                    return self._empty_local(FACET_SCHEMA)
                return arrow_local(self.spark, FACET_SCHEMA, pdf)
        if self.docs is None:
            raise ValueError("facets require a docs table")
        iddf = arrow_local(self.spark, "doc_id long", {"doc_id": ids})
        out = (
            self.docs.join(F.broadcast(iddf), "doc_id")
            .groupBy(vexpr.alias("value"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        return self._facet_order(out, limit)

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
        """Two-phase rescoring (the Elasticsearch ``rescore`` shape):
        the cheap ``query`` ranks a top-``window`` candidate page,
        then the expensive ``rescore`` query is evaluated ONLY on
        those docs and folded in as
        ``combined = primary + weight * secondary`` (ES
        query_weight=1/rescore_query_weight=weight totals); the final
        page is the top-``limit`` by (combined desc, doc_id asc).
        Canonical use: a bag-of-words primary with a phrase/proximity
        secondary that would be too expensive corpus-wide.

        Scale shape: the primary is the ordinary k-bounded search;
        the secondary's evaluation is RESTRICTED to the window's ids
        (driver NumPy under the threshold, else the shard-cogroup
        path with the window as a pushed id filter) — its cost is
        bounded by the window, never by the secondary's df. The
        combine runs on <= window rows on the driver."""
        if window < limit:
            raise ValueError("window must be >= limit")
        rplan, _rroles = parse_query_extract(rescore)
        if rplan == ("all",):
            raise ValueError("rescore requires a scored query")
        rplan = self._expand_multiterm(rplan)
        prim = [
            (int(r["doc_id"]), float(r["score"]))
            for r in self.search(
                query, limit=window, roles=roles, since=since,
                until=until, fuzzy=fuzzy,
            ).collect()
        ]
        if not prim:
            return empty_local(self.spark, TOPK_SCHEMA)
        ids = np.asarray(sorted(d for d, _ in prim), dtype=np.int64)
        rterms = query_terms(rplan)
        rpterms = prefix_terms(rplan)
        n = self.meta["n_docs"]
        ridfs = {
            ("text", t): idf_for(n, df)
            for t, df in self.term_dfs(rterms, "text").items()
        }
        ridfs.update(
            {
                ("prefix", t): idf_for(n, df)
                for t, df in self.term_dfs(rpterms, "prefix").items()
            }
        )
        total = sum(
            self._df_memo.get(("text", t), 0) for t in rterms
        ) + sum(self._df_memo.get(("prefix", t), 0) for t in rpterms)
        avgdl = self.meta["avgdl"]
        if total <= self.driver_topk_threshold:
            data = self._term_data_for(rterms, rpterms)
            mp = match_set_on_data(data, rplan, ridfs, avgdl, ids)
            sec = dict(
                zip(
                    mp["doc_id"].to_numpy(np.int64).tolist(),
                    mp["score"].to_numpy(np.float64).tolist(),
                )
            )
        else:
            # window-bounded pushed id filter through the shard
            # cogroup: attrs carry ONLY the window's ids, so each
            # shard evaluates the rescore plan against <= window docs
            iddf = arrow_local(self.spark, "doc_id long", {"doc_id": ids})
            if self.docs is None:
                raise ValueError("distributed rescore requires a docs table")
            attrs = self._attrs_with_shard(
                self.docs.join(F.broadcast(iddf), "doc_id"), "doc_id"
            )
            rplan_b, ridfs_b = rplan, ridfs

            def run_cg(seg_pdf: pd.DataFrame, attr_pdf: pd.DataFrame):
                if not len(seg_pdf) or not len(attr_pdf):
                    return pd.DataFrame(
                        {
                            "doc_id": pd.Series([], dtype=np.int64),
                            "score": pd.Series([], dtype=np.float64),
                        }
                    )
                aid = np.sort(attr_pdf["doc_id"].to_numpy(np.int64))
                mp = match_set_on_data(
                    build_term_data(seg_pdf), rplan_b, ridfs_b, avgdl, aid
                )
                return mp[["doc_id", "score"]]

            rows = (
                self._pruned_scan(rterms, rpterms)
                .groupBy("shard")
                .cogroup(attrs.groupBy("shard"))
                .applyInPandas(run_cg, schema="doc_id long, score double")
                .collect()
            )
            sec = {int(r["doc_id"]): float(r["score"]) for r in rows}
        combined = sorted(
            (
                (-(s + weight * sec.get(d, 0.0)), d)
                for d, s in prim
            ),
        )[:limit]
        return arrow_local(
            self.spark, TOPK_SCHEMA,
            {
                "doc_id": np.asarray(
                    [d for _, d in combined], dtype=np.int64
                ),
                "score": np.asarray(
                    [-ns for ns, _ in combined], dtype=np.float64
                ),
            },
        )

    def corpus_max_ts(self):
        """The corpus's newest ts — the deterministic recency anchor
        for decay scoring (numpy datetime64[us]); pinned attrs answer
        it driver-side, else one docs aggregate, memoized."""
        if getattr(self, "_max_ts_memo", None) is not None:
            return self._max_ts_memo
        if self._pinned_attrs is not None and len(self._pinned_attrs[0]):
            ats = self._pinned_attrs[2]
            ok = ats[~np.isnat(ats)]
            self._max_ts_memo = ok.max() if len(ok) else None
        else:
            if self.docs is None:
                raise ValueError("decay scoring requires a docs table")
            row = self.docs.agg(F.max("ts").alias("m")).collect()[0]
            self._max_ts_memo = (
                np.datetime64(row["m"], "us") if row["m"] else None
            )
        return self._max_ts_memo

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
        """Recency-decayed ranking (the Elasticsearch function_score
        exp-decay shape): combined = BM25 * 0.5^(age_days /
        half_life_days), age measured from the corpus's newest ts (a
        deterministic, replayable anchor — wall-clock "now" would make
        results time-dependent). Docs with a null ts decay to 0 (they
        can never outrank a dated doc — the conservative choice).

        Unlike rescoring, decay MULTIPLIES, so a low-BM25 recent doc
        can beat a high-BM25 old one from far outside any primary
        window — the decay must see the FULL match set. Scale shape:
        driver path decays the candidate-bounded match set in NumPy
        (pinned ts attrs -> zero Spark jobs); distributed path
        cogroups segments with shard-aligned (doc_id, ts) attrs and
        emits <= limit rows per shard after local decay+top-k."""
        hl = float(half_life_days)
        if hl <= 0:
            raise ValueError("half_life_days must be positive")
        plan, roles, idfs, tterms, pterms, total = self._resolve_match_plan(
            query, roles, fuzzy
        )
        if plan is None or plan == ("all",):
            if plan == ("all",):
                raise ValueError("decay scoring requires a scored query")
            return empty_local(self.spark, TOPK_SCHEMA)
        ref = self.corpus_max_ts()
        if ref is None:
            return empty_local(self.spark, TOPK_SCHEMA)
        filtered = bool(roles) or since is not None or until is not None
        avgdl = self.meta["avgdl"]

        def decay_combine(ids, sc, ats):
            age_days = (
                (ref - ats).astype("timedelta64[us]").astype(np.float64)
                / 86400e6
            )
            factor = np.where(
                np.isnat(ats), 0.0, np.power(0.5, age_days / hl)
            )
            comb = sc * factor
            k = min(limit, len(ids))
            order = np.lexsort((ids, -comb))[:k]
            return ids[order], comb[order]

        if total <= self.driver_topk_threshold:
            data = self._term_data_for(tterms, pterms)
            allowed = None
            if filtered and data:
                if self.docs is None and self._pinned_attrs is None:
                    raise ValueError("filters require a docs table")
                allowed = self._allowed_ids(data, roles, since, until)
            mp = match_set_on_data(data, plan, idfs, avgdl, allowed)
            ids = mp["doc_id"].to_numpy(np.int64)
            sc = mp["score"].to_numpy(np.float64)
            if not len(ids):
                return empty_local(self.spark, TOPK_SCHEMA)
            if self._pinned_attrs is not None and len(self._pinned_attrs[0]):
                aid, _arole, ats_all = self._pinned_attrs
                pos = np.minimum(np.searchsorted(aid, ids), len(aid) - 1)
                ats = np.where(
                    aid[pos] == ids, ats_all[pos], np.datetime64("NaT", "us")
                ).astype("datetime64[us]")
            else:
                iddf = arrow_local(
                    self.spark, "doc_id long", {"doc_id": ids}
                )
                rows = (
                    self.docs.join(F.broadcast(iddf), "doc_id")
                    .select("doc_id", "ts")
                    .collect()
                )
                by_id = {int(r["doc_id"]): r["ts"] for r in rows}
                ats = np.array(
                    [
                        np.datetime64(by_id[int(d)], "us")
                        if by_id.get(int(d)) is not None
                        else np.datetime64("NaT", "us")
                        for d in ids
                    ],
                    dtype="datetime64[us]",
                )
            oids, osc = decay_combine(ids, sc, ats)
            return arrow_local(
                self.spark, TOPK_SCHEMA, {"doc_id": oids, "score": osc}
            )
        if self.docs is None:
            raise ValueError("decay scoring requires a docs table")
        base = (
            self.docs.where(_attr_cond(roles, since, until))
            if filtered
            else self.docs
        )
        attrs = self._attrs_with_shard(base, "doc_id", "ts")
        plan_b, idfs_b, lim_b, filt_b = plan, idfs, limit, filtered
        ref_b, hl_b = ref, hl

        def run_cg(seg_pdf: pd.DataFrame, attr_pdf: pd.DataFrame):
            empty = pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.float64),
                }
            )
            if not len(seg_pdf) or not len(attr_pdf):
                return empty
            aid = attr_pdf["doc_id"].to_numpy(np.int64)
            order = np.argsort(aid)
            aid = aid[order]
            avals = attr_pdf["ts"].to_numpy("datetime64[us]")[order]
            mp = match_set_on_data(
                build_term_data(seg_pdf),
                plan_b,
                idfs_b,
                avgdl,
                aid if filt_b else None,
            )
            ids = mp["doc_id"].to_numpy(np.int64)
            if not len(ids):
                return empty
            sc = mp["score"].to_numpy(np.float64)
            pos = np.minimum(np.searchsorted(aid, ids), len(aid) - 1)
            m = aid[pos] == ids
            ids, sc = ids[m], sc[m]
            ats = avals[pos[m]]
            age_days = (
                (ref_b - ats).astype("timedelta64[us]").astype(np.float64)
                / 86400e6
            )
            factor = np.where(
                np.isnat(ats), 0.0, np.power(0.5, age_days / hl_b)
            )
            comb = sc * factor
            k = min(lim_b, len(ids))
            o = np.lexsort((ids, -comb))[:k]
            return pd.DataFrame({"doc_id": ids[o], "score": comb[o]})

        out = (
            self._pruned_scan(tterms, pterms)
            .groupBy("shard")
            .cogroup(attrs.groupBy("shard"))
            .applyInPandas(run_cg, schema=TOPK_SCHEMA)
        )
        return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)

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
        """Boosting-query demotion (Lucene BoostingQuery / ES boosting
        query): docs matching ``negative`` keep their match but score
        * ``factor`` — unlike NOT they stay findable, just ranked
        down. Demotion reorders the FULL match set (a demoted
        high-BM25 doc can fall below an undemoted low one), so it
        applies before top-k.

        Scale shape: BOTH plans evaluate in the SAME pass — the
        pruned postings scan carries the union of their terms, and
        each shard task computes its local matches, flags the
        negative subset (doc_ids are shard-local in segments), and
        emits <= limit rows after local demote+top-k. Driver path:
        candidate-bounded NumPy with np.isin membership."""
        f = float(factor)
        if f <= 0:
            raise ValueError("factor must be positive")
        plan, roles, idfs, tterms, pterms, total = self._resolve_match_plan(
            query, roles, fuzzy
        )
        if plan is None:
            return empty_local(self.spark, TOPK_SCHEMA)
        if plan == ("all",):
            raise ValueError("demotion requires a scored query")
        nplan, _nroles = parse_query_extract(negative)
        if nplan == ("all",):
            raise ValueError("negative requires a scored query")
        nplan = self._expand_multiterm(nplan)
        nterms = query_terms(nplan)
        npterms = prefix_terms(nplan)
        n = self.meta["n_docs"]
        idfs = dict(idfs)
        idfs.update(
            {
                ("text", t): idf_for(n, df)
                for t, df in self.term_dfs(nterms, "text").items()
            }
        )
        idfs.update(
            {
                ("prefix", t): idf_for(n, df)
                for t, df in self.term_dfs(npterms, "prefix").items()
            }
        )
        filtered = bool(roles) or since is not None or until is not None
        avgdl = self.meta["avgdl"]
        all_t = tterms | nterms
        all_p = pterms | npterms
        ntotal = total + sum(
            self._df_memo.get(("text", t), 0) for t in nterms
        ) + sum(self._df_memo.get(("prefix", t), 0) for t in npterms)
        if ntotal <= self.driver_topk_threshold:
            data = self._term_data_for(all_t, all_p)
            allowed = None
            if filtered and data:
                if self.docs is None and self._pinned_attrs is None:
                    raise ValueError("filters require a docs table")
                allowed = self._allowed_ids(data, roles, since, until)
            mp = match_set_on_data(data, plan, idfs, avgdl, allowed)
            ids = mp["doc_id"].to_numpy(np.int64)
            sc = mp["score"].to_numpy(np.float64)
            if not len(ids):
                return empty_local(self.spark, TOPK_SCHEMA)
            neg = match_set_on_data(data, nplan, idfs, avgdl, None)[
                "doc_id"
            ].to_numpy(np.int64)
            comb = np.where(np.isin(ids, neg), sc * f, sc)
            k = min(limit, len(ids))
            o = np.lexsort((ids, -comb))[:k]
            return arrow_local(
                self.spark, TOPK_SCHEMA,
                {"doc_id": ids[o], "score": comb[o]},
            )
        plan_b, nplan_b, idfs_b, lim_b, f_b = plan, nplan, idfs, limit, f
        seg = self._pruned_scan(all_t, all_p)
        if filtered:
            if self.docs is None:
                raise ValueError("filters require a docs table")
            attrs = self._attrs_with_shard(
                self.docs.where(_attr_cond(roles, since, until)), "doc_id"
            )

            def run_cg(seg_pdf: pd.DataFrame, attr_pdf: pd.DataFrame):
                empty = pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype=np.int64),
                        "score": pd.Series([], dtype=np.float64),
                    }
                )
                if not len(seg_pdf) or not len(attr_pdf):
                    return empty
                data = build_term_data(seg_pdf)
                aid = np.sort(attr_pdf["doc_id"].to_numpy(np.int64))
                mp = match_set_on_data(data, plan_b, idfs_b, avgdl, aid)
                ids = mp["doc_id"].to_numpy(np.int64)
                if not len(ids):
                    return empty
                sc = mp["score"].to_numpy(np.float64)
                neg = match_set_on_data(data, nplan_b, idfs_b, avgdl, None)[
                    "doc_id"
                ].to_numpy(np.int64)
                comb = np.where(np.isin(ids, neg), sc * f_b, sc)
                k = min(lim_b, len(ids))
                o = np.lexsort((ids, -comb))[:k]
                return pd.DataFrame({"doc_id": ids[o], "score": comb[o]})

            out = (
                seg.groupBy("shard")
                .cogroup(attrs.groupBy("shard"))
                .applyInPandas(run_cg, schema=TOPK_SCHEMA)
            )
        else:

            def run(seg_pdf: pd.DataFrame):
                empty = pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype=np.int64),
                        "score": pd.Series([], dtype=np.float64),
                    }
                )
                if not len(seg_pdf):
                    return empty
                data = build_term_data(seg_pdf)
                mp = match_set_on_data(data, plan_b, idfs_b, avgdl, None)
                ids = mp["doc_id"].to_numpy(np.int64)
                if not len(ids):
                    return empty
                sc = mp["score"].to_numpy(np.float64)
                neg = match_set_on_data(data, nplan_b, idfs_b, avgdl, None)[
                    "doc_id"
                ].to_numpy(np.int64)
                comb = np.where(np.isin(ids, neg), sc * f_b, sc)
                k = min(lim_b, len(ids))
                o = np.lexsort((ids, -comb))[:k]
                return pd.DataFrame({"doc_id": ids[o], "score": comb[o]})

            out = seg.groupBy("shard").applyInPandas(run, schema=TOPK_SCHEMA)
        return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)

    def match_ids_df(
        self,
        query: str,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
    ) -> DataFrame:
        """The FULL match set as a (doc_id) DataFrame — the feeder for
        aggregation analytics (significant_terms and friends). NOT a
        serving surface: its size is the match count (bounded by the
        query terms' postings), so callers must REDUCE it (aggregate /
        semi-join) — never collect it to the driver."""
        plan, roles, idfs, tterms, pterms, total = self._resolve_match_plan(
            query, roles, fuzzy
        )
        id_schema = T.StructType([T.StructField("doc_id", T.LongType())])
        if plan is None:
            return self._empty_local(id_schema)
        filtered = bool(roles) or since is not None or until is not None
        if plan == ("all",):
            if self.docs is None:
                raise ValueError("match-all requires a docs table")
            return self.docs.where(_attr_cond(roles, since, until)).select(
                "doc_id"
            )
        avgdl = self.meta["avgdl"]
        if total <= self.driver_topk_threshold:
            data = self._term_data_for(tterms, pterms)
            allowed = None
            if filtered and data:
                if self.docs is None and self._pinned_attrs is None:
                    raise ValueError("filters require a docs table")
                allowed = self._allowed_ids(data, roles, since, until)
            ids = match_set_on_data(data, plan, idfs, avgdl, allowed)[
                "doc_id"
            ].to_numpy(np.int64)
            if not len(ids):
                return self._empty_local(id_schema)
            return arrow_local(
                self.spark, id_schema, {"doc_id": np.sort(ids)}
            )
        plan_b, idfs_b = plan, idfs
        if filtered:
            if self.docs is None:
                raise ValueError("filters require a docs table")
            attrs = self._attrs_with_shard(
                self.docs.where(_attr_cond(roles, since, until)), "doc_id"
            )

            def run_cg(seg_pdf: pd.DataFrame, attr_pdf: pd.DataFrame):
                if not len(seg_pdf) or not len(attr_pdf):
                    return pd.DataFrame(
                        {"doc_id": pd.Series([], dtype=np.int64)}
                    )
                aid = np.sort(attr_pdf["doc_id"].to_numpy(np.int64))
                mp = match_set_on_data(
                    build_term_data(seg_pdf), plan_b, idfs_b, avgdl, aid
                )
                return mp[["doc_id"]]

            return (
                self._pruned_scan(tterms, pterms)
                .groupBy("shard")
                .cogroup(attrs.groupBy("shard"))
                .applyInPandas(run_cg, schema=id_schema)
            )

        def run(seg_pdf: pd.DataFrame):
            mp = match_set_on_data(
                build_term_data(seg_pdf), plan_b, idfs_b, avgdl, None
            )
            return mp[["doc_id"]]

        return (
            self._pruned_scan(tterms, pterms)
            .groupBy("shard")
            .applyInPandas(run, schema=id_schema)
        )

    def significant_terms(
        self,
        query: str,
        limit: int = 20,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
        min_count: int = 2,
        sample_fraction: float | None = None,
    ) -> DataFrame:
        """Significant-terms aggregation (the Elasticsearch
        significant_terms analog): terms over-represented in the
        query's match set relative to the whole corpus, scored by
        lift = (n_match/|matches|) / (df/N) and rounded to 6 dp BEFORE
        ranking (cross-engine-reproducible order: lift desc, term asc).

        Output: (term, n_match, df, lift), terms with n_match >=
        ``min_count``, top ``limit``.

        Scale shape: two aggregations joined on term. Foreground =
        ONE tokenize pass over MATCHED docs only (left-semi prune of
        the docs scan, Arrow UDF, per-doc distinct terms, term-keyed
        partial agg); background df = the sorted vocabulary artifact
        (_vocab_df — one row per term, persisted), not a per-call
        re-aggregate of the segments table. Nothing match-set-sized
        reaches the driver.

        ``sample_fraction`` (opt-in): Bernoulli-sample the matched docs
        (seed 42, deterministic) and report ``n_match`` as the
        Horvitz-Thompson estimate round(count/f) — lift unbiased in
        expectation. Honest scope: this thins the tokenize+aggregate
        stage only; the docs-table scan that feeds the semi-join still
        reads every row, and on the seed-42 corpus that scan dominates
        (measured sf1.0: 1.50 s exact vs 1.42 s at f=0.1, interleaved
        mins), so the knob pays off where per-doc analysis cost
        exceeds the scan — long documents or expensive analyzers.
        Exact (None / 1.0) remains the default and the oracle-checked
        contract."""
        if self.docs is None:
            raise ValueError("significant_terms requires a docs table")
        from xf_spark.functions.udfs import tokenize_udf

        mdf = self.match_ids_df(
            query, roles=roles, since=since, until=until, fuzzy=fuzzy
        ).persist()
        # the count MATERIALIZES the persisted match set, so the
        # foreground semi-join below reuses it instead of re-running
        # the whole match evaluation (ids only — 8 B/row); the cache is
        # reclaimed by Spark's ContextCleaner when the plan is dropped
        total = mdf.count()
        out_schema = T.StructType(
            [
                T.StructField("term", T.StringType()),
                T.StructField("n_match", T.LongType()),
                T.StructField("df", T.LongType()),
                T.StructField("lift", T.DoubleType()),
            ]
        )
        if total == 0:
            return self._empty_local(out_schema)
        matched = self.docs.join(mdf, "doc_id", "left_semi")
        f = sample_fraction
        if f is not None and not (0.0 < f <= 1.0):
            raise ValueError("sample_fraction must be in (0, 1]")
        if f is not None and f < 1.0:
            # deterministic Bernoulli thinning of the FOREGROUND only;
            # n_match below becomes the Horvitz-Thompson estimate
            matched = matched.sample(fraction=f, seed=42)
        fg = (
            matched
            .select(
                F.explode(
                    F.array_distinct(tokenize_udf(F.col("text")))
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("n_match"))
        )
        if f is not None and f < 1.0:
            fg = fg.withColumn(
                "n_match", F.round(F.col("n_match") / F.lit(float(f)))
            )
        # background model = the persisted sorted vocabulary artifact
        # (one row per term, already exactly this (term, df) aggregate)
        # instead of re-aggregating the segments table per call — at
        # 100x corpus the segments groupBy is a full metadata-scan
        # shuffle per query; the artifact read is O(vocab)
        bg = self._vocab_df().select("term", "df")
        n = self.meta["n_docs"]
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

    def count_matches(
        self,
        query: str,
        roles: list[str] | None = None,
        since=None,
        until=None,
        fuzzy: bool = False,
    ) -> int:
        """Total number of matching documents (the Elasticsearch
        ``_count`` analog) under the same plan semantics and filters
        as ``search`` — the match-set size, not a top-k.

        Scale shape: pure aggregation — each shard task reduces its
        matches to ONE count row; nothing match-set-sized ever leaves
        a task. Driver fast path counts the candidate-bounded match
        set in NumPy (zero Spark jobs warm)."""
        plan, roles, idfs, tterms, pterms, total = self._resolve_match_plan(
            query, roles, fuzzy
        )
        if plan is None:
            return 0
        filtered = bool(roles) or since is not None or until is not None
        if plan == ("all",):
            if self.docs is None:
                raise ValueError("match-all requires a docs table")
            return self.docs.where(_attr_cond(roles, since, until)).count()
        avgdl = self.meta["avgdl"]
        if total <= self.driver_topk_threshold:
            data = self._term_data_for(tterms, pterms)
            allowed = None
            if filtered and data:
                if self.docs is None and self._pinned_attrs is None:
                    raise ValueError("filters require a docs table")
                allowed = self._allowed_ids(data, roles, since, until)
            return int(len(match_set_on_data(data, plan, idfs, avgdl, allowed)))
        plan_b, idfs_b = plan, idfs
        cnt_schema = T.StructType([T.StructField("n", T.LongType())])
        if filtered:
            if self.docs is None:
                raise ValueError("filters require a docs table")
            attrs = self._attrs_with_shard(
                self.docs.where(_attr_cond(roles, since, until)), "doc_id"
            )

            def run_cg(seg_pdf: pd.DataFrame, attr_pdf: pd.DataFrame):
                if not len(seg_pdf) or not len(attr_pdf):
                    return pd.DataFrame({"n": pd.Series([], dtype=np.int64)})
                aid = np.sort(attr_pdf["doc_id"].to_numpy(np.int64))
                n = len(
                    match_set_on_data(
                        build_term_data(seg_pdf), plan_b, idfs_b, avgdl, aid
                    )
                )
                return pd.DataFrame({"n": np.array([n], dtype=np.int64)})

            partial = (
                self._pruned_scan(tterms, pterms)
                .groupBy("shard")
                .cogroup(attrs.groupBy("shard"))
                .applyInPandas(run_cg, schema=cnt_schema)
            )
        else:

            def run(seg_pdf: pd.DataFrame):
                n = len(
                    match_set_on_data(
                        build_term_data(seg_pdf), plan_b, idfs_b, avgdl, None
                    )
                )
                return pd.DataFrame({"n": np.array([n], dtype=np.int64)})

            partial = (
                self._pruned_scan(tterms, pterms)
                .groupBy("shard")
                .applyInPandas(run, schema=cnt_schema)
            )
        row = partial.agg(F.sum("n").alias("n")).first()
        return int(row["n"] or 0)

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
        beyond the reference's surface; same contract as
        BM25Engine.explain): one row per (top-``limit`` doc, matched
        term leaf) with tf, df, idf (multiplicity-weighted), the
        leaf's contribution, and the doc's total score. A pure phrase
        query breaks down per member term; phrases nested in a larger
        plan are refused loudly.

        Scale shape: top-k via the ordinary search; the breakdown
        re-reads the pruned postings scan with the k doc ids in the
        task closure — per-shard output is bounded by k * n_leaves,
        and head terms are never decoded on the coordinator."""
        from xf_spark.query.parser import term_leaf_counts

        plan, m_roles, idfs, tterms, pterms, _total = (
            self._resolve_match_plan(query, roles, fuzzy)
        )
        out_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("term", T.StringType()),
                T.StructField("field", T.StringType()),
                T.StructField("tf", T.DoubleType()),
                T.StructField("df", T.LongType()),
                T.StructField("idf", T.DoubleType()),
                T.StructField("contrib", T.DoubleType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        if plan is None:
            return self._empty_local(out_schema)
        if plan == ("all",):
            raise ValueError("explain requires a scored query")
        if plan[0] == "phrase":
            # pure phrase: the pinned phrase score is the sum of
            # member-term BM25 over adjacency-matching docs, so the
            # per-term breakdown is exact (see BM25Engine.explain)
            from collections import Counter

            t_counts, p_counts = Counter(plan[1]), Counter()
        else:
            t_counts, p_counts = term_leaf_counts(plan)
        top = [
            (int(r["doc_id"]), float(r["score"]))
            for r in self.search(
                query, limit=limit, roles=roles, since=since, until=until,
                fuzzy=fuzzy,
            ).collect()
        ]
        if not top:
            return self._empty_local(out_schema)
        top_ids = np.array(sorted(d for d, _ in top), dtype=np.int64)
        score_by_id = dict(top)
        raw_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("field", T.StringType()),
                T.StructField("term", T.StringType()),
                T.StructField("tf", T.DoubleType()),
                T.StructField("dl", T.DoubleType()),
            ]
        )

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            data = build_term_data(pdf)
            outs = []
            for (fld, term), d in data.items():
                pos = np.searchsorted(d["ids"], top_ids)
                np.clip(pos, 0, max(len(d["ids"]) - 1, 0), out=pos)
                if not len(d["ids"]):
                    continue
                m = d["ids"][pos] == top_ids
                if not m.any():
                    continue
                outs.append(
                    pd.DataFrame(
                        {
                            "doc_id": top_ids[m],
                            "field": fld,
                            "term": term,
                            "tf": d["tfs"][pos[m]].astype(np.float64),
                            "dl": d["dls"][pos[m]].astype(np.float64),
                        }
                    )
                )
            if not outs:
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype=np.int64),
                        "field": pd.Series([], dtype=object),
                        "term": pd.Series([], dtype=object),
                        "tf": pd.Series([], dtype=np.float64),
                        "dl": pd.Series([], dtype=np.float64),
                    }
                )
            return pd.concat(outs, ignore_index=True)

        raw = (
            self._pruned_scan(tterms, pterms)
            .groupBy("shard")
            .applyInPandas(run, schema=raw_schema)
            .toPandas()  # <= k * n_leaves rows by construction
        )
        avgdl = self.meta["avgdl"]
        rows = []
        for r in raw.itertuples(index=False):
            counts = t_counts if r.field == "text" else p_counts
            mult = counts.get(r.term, 0)
            if not mult:
                continue  # NOT-exclusion leaf: never contributes
            idf = idfs.get((r.field, r.term), 0.0) * mult
            contrib = idf * r.tf * (K1 + 1.0) / (
                r.tf + K1 * (1.0 - B + B * r.dl / avgdl)
            )
            rows.append(
                (
                    int(r.doc_id), r.term, r.field, float(r.tf),
                    int(self._df_memo.get((r.field, r.term), 0)),
                    idf, contrib, score_by_id[int(r.doc_id)],
                )
            )
        if not rows:
            return self._empty_local(out_schema)
        rows.sort(key=lambda x: (-x[7], x[0], x[2], x[1]))
        return self.spark.createDataFrame(rows, schema=out_schema)

    def pin_doc_groups(self, ids, groups, col: str = "conv_id") -> None:
        """Pin (doc_id -> collapse-group) arrays on the coordinator —
        the collapse analog of pin_doc_attrs: a warm collapsed query
        then resolves best-hit-per-group entirely in NumPy. ``col``
        names the source column the groups came from; the fast path
        only fires when a collapsed query asks for THAT column
        (collapsing by any other column keeps the distributed path)."""
        ids = np.asarray(ids, dtype=np.int64)
        order = np.argsort(ids)
        self._pinned_groups = (
            ids[order],
            np.asarray(groups, dtype=object)[order],
        )
        self._pinned_groups_col = col

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
        """Field collapsing (the Lucene/Elasticsearch collapse
        operator): the single best hit per ``group_col`` value
        (score desc, doc_id asc within the group), top-``limit``
        groups ranked by their best hit. For transcripts this answers
        "the best-matching TURN of each of the top conversations".

        Output: (group_col string, doc_id, score), ordered
        (score desc, doc_id asc).

        Scale shape: collapse is an AGGREGATION over the match set —
        each shard task reduces its matches to one row per distinct
        group (map-side combine; groups that straddle shards — e.g. a
        conversation split across appended slices — are re-reduced by
        the global max_by), so shuffled rows are bounded by group
        cardinality, and the final top-k is a k-bounded TakeOrdered.
        Driver fast path: postings under driver_topk_threshold with
        pinned groups (pin_doc_groups) collapse in NumPy — zero Spark
        jobs warm."""
        plan, roles, idfs, tterms, pterms, total = self._resolve_match_plan(
            query, roles, fuzzy
        )
        out_schema = T.StructType(
            [
                T.StructField(group_col, T.StringType()),
                T.StructField("doc_id", T.LongType()),
                T.StructField("score", T.DoubleType()),
            ]
        )
        if plan is None:
            return self._empty_local(out_schema)
        filtered = bool(roles) or since is not None or until is not None
        if plan == ("all",):
            if self.docs is None:
                raise ValueError("match-all requires a docs table")
            best = (
                self.docs.where(_attr_cond(roles, since, until))
                .groupBy(F.col(group_col).cast("string").alias(group_col))
                .agg(F.min("doc_id").alias("doc_id"))
                .withColumn("score", F.lit(1.0))
            )
            return best.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)
        avgdl = self.meta["avgdl"]
        if (
            total <= self.driver_topk_threshold
            and self._pinned_groups is not None
            and self._pinned_groups_col == group_col
        ):
            data = self._term_data_for(tterms, pterms)
            allowed = None
            if filtered and data:
                if self.docs is None and self._pinned_attrs is None:
                    raise ValueError("filters require a docs table")
                allowed = self._allowed_ids(data, roles, since, until)
            mp = match_set_on_data(data, plan, idfs, avgdl, allowed)
            gid, ggrp = self._pinned_groups
            ids = mp["doc_id"].to_numpy(np.int64)
            sub = pd.DataFrame(
                {
                    group_col: pd.Series([], dtype=object),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.float64),
                }
            )
            if len(gid) and len(ids):
                pos = np.searchsorted(gid, ids)
                np.clip(pos, 0, len(gid) - 1, out=pos)
                m = gid[pos] == ids
                sub = pd.DataFrame(
                    {
                        group_col: ggrp[pos[m]],
                        "doc_id": ids[m],
                        "score": mp["score"].to_numpy(np.float64)[m],
                    }
                )
            # mp rows are (score desc, doc_id asc): first per group is
            # its best, and head(limit) is the group top-k
            sub = sub.drop_duplicates(group_col, keep="first").head(limit)
            if not len(sub):
                return self._empty_local(out_schema)
            return arrow_local(
                self.spark, out_schema, sub.reset_index(drop=True)
            )
        if self.docs is None:
            raise ValueError("collapse requires a docs table")
        seg = self._pruned_scan(tterms, pterms)
        base = (
            self.docs.where(_attr_cond(roles, since, until))
            if filtered
            else self.docs
        )
        attrs = self._attrs_with_shard(
            base.withColumn("__gv", F.col(group_col).cast("string")),
            "doc_id",
            "__gv",
        )
        plan_b, idfs_b = plan, idfs

        def run_cg(seg_pdf: pd.DataFrame, attr_pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    group_col: pd.Series([], dtype=object),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.float64),
                }
            )
            if not len(seg_pdf) or not len(attr_pdf):
                return empty
            aid = attr_pdf["doc_id"].to_numpy(np.int64)
            order = np.argsort(aid)
            aid = aid[order]
            agv = attr_pdf["__gv"].to_numpy(object)[order]
            data = build_term_data(seg_pdf)
            mp = match_set_on_data(
                data, plan_b, idfs_b, avgdl, aid if filtered else None
            )
            ids = mp["doc_id"].to_numpy(np.int64)
            if not len(ids):
                return empty
            pos = np.searchsorted(aid, ids)
            np.clip(pos, 0, len(aid) - 1, out=pos)
            m = aid[pos] == ids
            sub = pd.DataFrame(
                {
                    group_col: agv[pos[m]],
                    "doc_id": ids[m],
                    "score": mp["score"].to_numpy(np.float64)[m],
                }
            )
            return sub.drop_duplicates(group_col, keep="first")

        partial = (
            seg.groupBy("shard")
            .cogroup(attrs.groupBy("shard"))
            .applyInPandas(run_cg, schema=out_schema)
        )
        best = partial.groupBy(group_col).agg(
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

    def _pruned_scan(self, tterms: set[str], pterms: set[str]) -> DataFrame:
        """Bucket- and term-pruned segment scan for a term set (both
        predicates reach the parquet row-group filters)."""
        nb = self.meta["n_buckets"]
        buckets = sorted(
            {term_bucket(t, nb) for t in tterms}
            | {term_bucket(t, nb) for t in pterms}
        )
        cond = F.lit(False)
        if tterms:
            cond = cond | (
                (F.col("field") == "text") & F.col("term").isin(sorted(tterms))
            )
        if pterms:
            cond = cond | (
                (F.col("field") == "prefix")
                & F.col("term").isin(sorted(pterms))
            )
        return self._segments.where(F.col("bucket").isin(buckets) & cond)

    def _shard_for_docs(self):
        """doc_id -> shard expression for a LEGACY docs parquet that
        predates the ``shard`` column — derived from the index itself.

        Shards hold contiguous, disjoint docID ranges by construction
        (the build range-partitions by doc_id), so the max doc id seen
        in each shard's postings (last element of the last block's
        ``block_last_doc``) is an ordered set of range upper bounds.
        Any doc WITH postings satisfies prev_shard_hi < doc_id <=
        own_shard_hi, so "count bounds strictly below doc_id" indexes
        its shard exactly; docs with no postings can never be hits, so
        their (clamped) assignment is harmless. One tiny agg over the
        segment metadata, computed once per index."""
        from xf_spark.index.segments import (
            segment_shard_bounds,
            shard_expr_for_bounds,
        )

        if self._shard_bounds is None:
            self._shard_bounds = segment_shard_bounds(self._segments)
        return shard_expr_for_bounds(self._shard_bounds)

    def pin_doc_attrs(self, ids, roles, ts) -> None:
        """Pin (doc_id -> role, ts) attribute arrays on the coordinator
        (the in-process analog of the reference's SQLite attribute
        lookups): a warm FILTERED query then resolves its allowed-id
        set in NumPy and runs zero Spark jobs end-to-end.  Arrays are
        re-sorted by doc_id here; ``ts`` converts to datetime64[us]
        (None -> NaT, which fails every comparison — SQL null
        semantics)."""
        ids = np.asarray(ids, dtype=np.int64)
        order = np.argsort(ids)
        self._pinned_attrs = (
            ids[order],
            np.asarray(roles, dtype=object)[order],
            np.asarray(ts, dtype="datetime64[us]")[order],
        )

    def _allowed_ids(self, data: dict, roles, since, until) -> np.ndarray:
        """Driver-path filter resolution, candidate-bounded: the only
        ids that can appear in results are the query terms' posting
        ids, so ship THOSE (<= driver_topk_threshold) through a
        broadcast semi-join against the predicate-pushed docs scan —
        never collect the full filtered corpus.  With pinned doc
        attributes the whole resolution happens driver-side (zero
        Spark jobs)."""
        cand = np.unique(np.concatenate([d["ids"] for d in data.values()]))
        if not len(cand):
            return cand
        if self._pinned_attrs is not None and len(self._pinned_attrs[0]):
            aid, arole, ats = self._pinned_attrs
            pos = np.minimum(np.searchsorted(aid, cand), len(aid) - 1)
            mask = aid[pos] == cand
            if roles:
                mask &= np.isin(arole[pos], list(roles))
            if since is not None:
                mask &= ats[pos] >= np.datetime64(since)
            if until is not None:
                mask &= ats[pos] <= np.datetime64(until)
            return cand[mask]  # cand is sorted; masking preserves it
        if self.docs is None:
            raise ValueError("filters require a docs table")
        cdf = arrow_local(self.spark, "doc_id long", {"doc_id": cand})
        cond = _attr_cond(roles, since, until)
        rows = (
            self.docs.where(cond)
            .select("doc_id")
            .join(F.broadcast(cdf), "doc_id", "left_semi")
            .collect()
        )
        return np.sort(
            np.fromiter((r["doc_id"] for r in rows), dtype=np.int64, count=len(rows))
        )

    def _rank_page(self, scored: DataFrame, limit: int, offset: int) -> DataFrame:
        ranked = scored.orderBy(F.desc("score"), F.asc("doc_id"))
        if offset:
            ranked = ranked.offset(offset)
        return ranked.limit(limit)

    def _union_idfs(self, plans_iter) -> tuple[dict, set, set]:
        """Union the term/prefix sets of a batch of plans and resolve
        their idfs in ONE vocabulary pass -> (idfs, union_t, union_p)."""
        union_t: set[str] = set()
        union_p: set[str] = set()
        for pl in plans_iter:
            union_t |= query_terms(pl)
            union_p |= prefix_terms(pl)
        n = self.meta["n_docs"]
        idfs = {
            ("text", t): idf_for(n, df)
            for t, df in self.term_dfs(union_t, "text").items()
        }
        idfs.update(
            {
                ("prefix", t): idf_for(n, df)
                for t, df in self.term_dfs(union_p, "prefix").items()
            }
        )
        return idfs, union_t, union_p

    def _search_many_distributed(
        self, plans: dict[str, tuple], limit: int, exhaustive: bool
    ) -> dict[str, list[tuple[int, float]]]:
        """ONE Spark job for a batch of heavy (over-threshold) queries:
        one pruned scan for the union of terms, per-shard evaluation of
        EVERY query's plan against the decoded shard data, k rows out
        per (query, shard), k-sized driver merge per query.

        This is the 10^12-turn msearch path: a head-term batch costs
        one cluster pass instead of a job per query, per-task output
        stays k-bounded, and nothing head-term-sized ever reaches the
        coordinator."""
        qlist = list(plans)
        idfs, union_t, union_p = self._union_idfs(plans.values())
        avgdl = self.meta["avgdl"]
        plan_list = [plans[q] for q in qlist]
        k = limit

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            data = build_term_data(pdf)
            outs = []
            for qi, pl in enumerate(plan_list):
                res = eval_plan_on_data(data, pl, idfs, avgdl, k, exhaustive)
                if len(res):
                    res.insert(0, "qid", np.int32(qi))
                    outs.append(res)
            return pd.concat(outs, ignore_index=True) if outs else _QID_EMPTY()

        scored = (
            self._pruned_scan(union_t, union_p)
            .groupBy("shard")
            .applyInPandas(run, schema="qid int, doc_id long, score double")
        )
        # <= B * n_shards * k rows by construction
        return _merge_qid_rows(scored.collect(), qlist, k)

    def _search_many_filtered_distributed(
        self, items: dict[str, tuple], limit: int, exhaustive: bool
    ) -> dict[str, list[tuple[int, float]]]:
        """ONE Spark job for a batch of heavy role-filtered queries:
        cogroup the union-pruned segments with the shard-aligned doc
        attributes (coarse role predicate pushed to the docs scan),
        resolve each member's allowed-id set inside the shard, k rows
        out per (query, shard). ``items``: {query: (plan, roles)}."""
        if self.docs is None:
            raise ValueError("filters require a docs table")
        qlist = list(items)
        all_roles: set[str] = set()
        for _pl, roles in items.values():
            all_roles |= set(roles)
        idfs, union_t, union_p = self._union_idfs(
            pl for pl, _roles in items.values()
        )
        avgdl = self.meta["avgdl"]
        plan_list = [items[q] for q in qlist]
        k = limit
        coarse = self.docs.where(F.col("role").isin(sorted(all_roles)))
        if "shard" in self.docs.columns and not self.meta.get("docs_shard_stale"):
            attrs = coarse.select("shard", "doc_id", "role")
        else:
            attrs = coarse.select(
                self._shard_for_docs().alias("shard"), "doc_id", "role"
            )

        def run_cg(seg_pdf: pd.DataFrame, attr_pdf: pd.DataFrame) -> pd.DataFrame:
            if not len(seg_pdf) or not len(attr_pdf):
                return _QID_EMPTY()
            data = build_term_data(seg_pdf)
            ids_arr = attr_pdf["doc_id"].to_numpy(np.int64)
            roles_arr = attr_pdf["role"].to_numpy()
            outs = []
            for qi, (pl, roles) in enumerate(plan_list):
                allowed = np.sort(ids_arr[np.isin(roles_arr, list(roles))])
                res = eval_plan_on_data(
                    data, pl, idfs, avgdl, k, exhaustive, allowed
                )
                if len(res):
                    res.insert(0, "qid", np.int32(qi))
                    outs.append(res)
            return pd.concat(outs, ignore_index=True) if outs else _QID_EMPTY()

        scored = (
            self._pruned_scan(union_t, union_p)
            .groupBy("shard")
            .cogroup(attrs.groupBy("shard"))
            .applyInPandas(run_cg, schema="qid int, doc_id long, score double")
        )
        return _merge_qid_rows(scored.collect(), qlist, k)

    def search_many(
        self,
        queries: list[str],
        limit: int = 20,
        exhaustive: bool = False,
        fuzzy: bool = False,
    ) -> dict[str, list[tuple[int, float]]]:
        """Batched multi-search (the msearch serving pattern): ONE
        bucket-pruned scan for the union of all queries' terms, ONE
        posting-list decode, then per-query NumPy evaluation. For a
        serving workload this amortizes the per-job scheduling floor
        and the decode across the batch — sustained QPS scales with
        batch size instead of paying ~100ms per query."""
        _t0 = time.time()
        # per-member parse isolation: one malformed query (e.g.
        # "NOT type:assistant", rejected by the parser) must not poison
        # the batch — it gets an empty result + a warning, the other
        # members are served normally
        extracted: dict[str, tuple] = {}
        rejected: list[str] = []
        for q in queries:
            try:
                extracted[q] = parse_query_extract(q)
            except ValueError:
                rejected.append(q)
        if rejected:
            import logging

            logging.getLogger(__name__).warning(
                "search_many: %d unparseable batch member(s) served as "
                "empty results: %s", len(rejected), rejected[:5],
            )
        if fuzzy:
            # ONE vocabulary scan expands every member's term leaves
            # (per-member expansion would pay the scan per novel term);
            # phrase/prefix words excluded — they stay exact, and
            # including them would only widen the scan's length windows
            batch_terms: set[str] = set()
            for pl, _qr in extracted.values():
                batch_terms |= fuzzy_term_leaves(pl)
            self.fuzzy_variants_many(batch_terms)  # primes the memo
            extracted = {
                q: (self._expand_fuzzy(pl), qr)
                for q, (pl, qr) in extracted.items()
            }
        # dictionary-resolved atoms (wildcard / ~d / phrase-prefix):
        # per-leaf scans, memoized — repeated leaves across batch
        # members pay once
        extracted = {
            q: (self._expand_multiterm(pl), qr)
            for q, (pl, qr) in extracted.items()
        }
        # queries carrying type:/role: filters: light members take the
        # filtered single-query path (driver-resolved when warm); heavy
        # members batch through ONE filtered cogroup job below
        cand_plans = {q: pl for q, (pl, qr) in extracted.items() if not qr}
        filt_items = {q: (pl, qr) for q, (pl, qr) in extracted.items() if qr}
        filtered_qs: list[str] = []
        union_t: set[str] = set()
        union_p: set[str] = set()
        for pl in cand_plans.values():
            union_t |= query_terms(pl)
            union_p |= prefix_terms(pl)
        for pl, _qr in filt_items.values():
            union_t |= query_terms(pl)
            union_p |= prefix_terms(pl)
        n = self.meta["n_docs"]
        dfs_t = self.term_dfs(union_t, "text")
        dfs_p = self.term_dfs(union_p, "prefix")
        heavy_filtered: dict[str, tuple] = {}
        for q, (pl, qr) in filt_items.items():
            total = sum(dfs_t.get(t, 0) for t in query_terms(pl)) + sum(
                dfs_p.get(t, 0) for t in prefix_terms(pl)
            )
            if total > self.driver_topk_threshold and pl != ("all",):
                heavy_filtered[q] = (pl, qr)
            else:
                filtered_qs.append(q)
        # the same postings bound the single-query path enforces: a
        # batch member whose terms exceed driver_topk_threshold must
        # NOT be decoded on the coordinator (a head term at 10^12 turns
        # is an unbounded driver materialization) — heavy members batch
        # through ONE distributed job (_search_many_distributed)
        # instead of a cluster job per query
        plans = {}
        heavy: dict[str, tuple] = {}
        for q, pl in cand_plans.items():
            total = sum(dfs_t.get(t, 0) for t in query_terms(pl)) + sum(
                dfs_p.get(t, 0) for t in prefix_terms(pl)
            )
            if total > self.driver_topk_threshold and pl != ("all",):
                heavy[q] = pl  # match-all (total 0) never lands here
            else:
                plans[q] = pl
        all_t: set[str] = set()
        all_p: set[str] = set()
        for pl in plans.values():
            all_t |= query_terms(pl)
            all_p |= prefix_terms(pl)
        idfs = {
            ("text", t): idf_for(n, dfs_t[t]) for t in all_t if t in dfs_t
        }
        idfs.update(
            {
                ("prefix", t): idf_for(n, dfs_p[t])
                for t in all_p
                if t in dfs_p
            }
        )
        # the per-member threshold bounds each QUERY's decode, but the
        # union of N just-under-threshold members is N x the bound —
        # unbounded coordinator memory as the batch grows. Chunk the
        # light members so each chunk's union posting mass stays within
        # the same driver_topk_threshold (one member may exceed it
        # alone only via cached-term double counting — it already
        # passed the per-member check); decoded arrays die with the
        # chunk, and the term LRU carries terms shared across chunks.
        chunks: list[dict[str, tuple]] = []
        cur: dict[str, tuple] = {}
        cur_t: set[str] = set()
        cur_p: set[str] = set()
        cur_mass = 0
        for q, pl in plans.items():
            qt, qp = query_terms(pl), prefix_terms(pl)
            add = sum(dfs_t.get(t, 0) for t in qt - cur_t) + sum(
                dfs_p.get(t, 0) for t in qp - cur_p
            )
            if cur and cur_mass + add > self.driver_topk_threshold:
                chunks.append(cur)
                cur, cur_t, cur_p, cur_mass = {}, set(), set(), 0
                add = sum(dfs_t.get(t, 0) for t in qt) + sum(
                    dfs_p.get(t, 0) for t in qp
                )
            cur[q] = pl
            cur_t |= qt
            cur_p |= qp
            cur_mass += add
        if cur:
            chunks.append(cur)
        out: dict[str, list[tuple[int, float]]] = {q: [] for q in rejected}
        for q in filtered_qs:
            # fuzzy/exhaustive must survive this re-dispatch: the
            # member's expanded plan was computed above, but search()
            # re-parses the raw string — pass the knobs through so a
            # role-filtered light member is served with the SAME
            # semantics as the rest of the batch (the fuzzy variant
            # memo is already primed, so the re-expansion is free)
            out[q] = [
                (r["doc_id"], r["score"])
                for r in self.search(
                    q, limit=limit, exhaustive=exhaustive, fuzzy=fuzzy
                ).collect()
            ]
        if heavy:
            out.update(self._search_many_distributed(heavy, limit, exhaustive))
        if heavy_filtered:
            out.update(
                self._search_many_filtered_distributed(
                    heavy_filtered, limit, exhaustive
                )
            )
        for chunk in chunks:
            ch_t: set[str] = set()
            ch_p: set[str] = set()
            for pl in chunk.values():
                ch_t |= query_terms(pl)
                ch_p |= prefix_terms(pl)
            data = self._term_data_for(ch_t, ch_p)
            for q, pl in chunk.items():
                if pl == ("all",):
                    out[q] = [
                        (r["doc_id"], r["score"])
                        for r in self.search(q, limit=limit).collect()
                    ]
                    continue
                res = eval_plan_on_data(
                    data, pl, idfs, self.meta["avgdl"], limit, exhaustive
                )
                out[q] = list(
                    zip(
                        res["doc_id"].to_numpy(np.int64)[:limit].tolist(),
                        res["score"].to_numpy(np.float64)[:limit].tolist(),
                    )
                )
        if queries:
            from xf_spark import perf

            perf.record("msearch_per_query", (time.time() - _t0) / len(queries))
        return out

    def search_local(self, query: str, limit: int = 20, exhaustive: bool = False):
        """Driver-resolved search -> list[(doc_id, score)] without any
        result-side DataFrame materialization. Pure engine latency:
        pruned scan + decode + WAND (the number BENCH reports alongside
        the full DataFrame round-trip)."""
        df = self.search(query, limit=limit, exhaustive=exhaustive)
        return [(r["doc_id"], r["score"]) for r in df.collect()]

    def _finish(
        self, scored, limit, offset, roles, since, until, after=None
    ) -> DataFrame:
        filtered = roles or since is not None or until is not None
        if filtered and self.docs is None:
            raise ValueError("filters require a docs table")
        if filtered:
            attrs = self.docs.select("doc_id", "role", "ts")
            scored = scored.join(
                attrs.where(_attr_cond(roles, since, until)),
                "doc_id",
                "left_semi",
            )
        if after is not None:
            # cursor mask in (score desc, doc_id asc) order — the same
            # strictly-after predicate the scored paths apply
            cs, cd = float(after[0]), int(after[1])
            scored = scored.where(
                (F.col("score") < cs)
                | ((F.col("score") == cs) & (F.col("doc_id") > cd))
            )
        ranked = scored.orderBy(F.desc("score"), F.asc("doc_id"))
        if offset:
            ranked = ranked.offset(offset)
        return ranked.limit(limit)

    def search_hydrated(self, query: str, limit: int = 20, **kw) -> DataFrame:
        if self.docs is None:
            raise ValueError("hydration requires a docs table")
        hits = self.search(query, limit=limit, **kw)
        return self.docs.join(F.broadcast(hits), "doc_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
