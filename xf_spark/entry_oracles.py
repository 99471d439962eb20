"""DuckDB oracle SQL paired with entry_queries.py (driver contract).

Each statement runs against the driver's pre-registered parquet views
(region nation customer supplier part orders lineitem events documents
embeddings) and must match the Spark result column-for-column
(names, row set; floats rounded identically on both sides).

The BM25 statements re-express the engine's pinned scoring semantics
(k1=1.2, b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5)), GLOBAL stats, exact
doc lengths, tiebreak score desc / doc_id asc) in pure ANSI-ish SQL —
an independent recomputation in a third engine, on top of the NumPy
oracle used in pytest. Tokenization in SQL uses the ASCII class
[^0-9A-Za-z] — the documents table is ASCII; the engine's tokenizer is
the Unicode superset of this and agrees on ASCII input.
"""

from __future__ import annotations

# shared tokenization CTE over the documents view
_TOK = """
tok AS (
  SELECT doc_id, lower(raw) AS term
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '[^0-9A-Za-z]+')) AS raw
    FROM documents
  )
  WHERE raw <> '' AND strlen(raw) < 40
)
"""

_STATS = """
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT count(*) FROM tok)::DOUBLE
           / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
)
"""


def _bm25_sql(terms: list[str], require_all: bool = False, exclude: str | None = None) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    having = (
        f"HAVING count(DISTINCT tf.term) = {len(set(terms))}" if require_all else ""
    )
    not_clause = (
        f"AND tf.doc_id NOT IN (SELECT doc_id FROM tok WHERE term = '{exclude}')"
        if exclude
        else ""
    )
    return f"""
WITH {_TOK}, {_STATS},
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tok WHERE term IN ({in_list}) GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM tok WHERE term IN ({in_list}) GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE 1=1 {not_clause}
  GROUP BY tf.doc_id
  {having}
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY score DESC, doc_id
LIMIT 20
"""


ORACLES: dict[str, str] = {}

# Tantivy SmallFloat fieldnorm quantization (functions/fieldnorm.py):
# identity below 24, then 4-significant-bit truncation of (dl - 24) —
# s = max(0, floor(log2(e)) - 3), q = 24 + e - e % 2^s. log2(e + 0.5)
# sidesteps log2(0) at e = 0 without moving any integer's floor.
_QDL = """
CASE WHEN dl.dl < 24 THEN dl.dl
     ELSE 24 + (CAST(dl.dl AS BIGINT) - 24)
            - ((CAST(dl.dl AS BIGINT) - 24) % CAST(POWER(2, GREATEST(
                  0,
                  CAST(FLOOR(LOG2(CAST(dl.dl AS BIGINT) - 24 + 0.5))
                       AS BIGINT) - 3)) AS BIGINT))
END
"""

ORACLES["bm25_tantivy_norms"] = f"""
WITH {_TOK}, {_STATS},
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tok WHERE term IN ('spark', 'join') GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM tok WHERE term IN ('spark', 'join') GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * ({_QDL}) / s.avgdl)) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY score DESC, doc_id
LIMIT 20
"""

ORACLES["bm25_single_term"] = _bm25_sql(["spark"])
ORACLES["bm25_or_terms"] = _bm25_sql(["spark", "join", "window"])
ORACLES["bm25_and_terms"] = _bm25_sql(["spark", "join"], require_all=True)
ORACLES["bm25_not_terms"] = _bm25_sql(["spark"], exclude="window")

ORACLES["bm25_explain"] = f"""
WITH {_TOK}, {_STATS},
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tok WHERE term IN ('spark', 'join') GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM tok WHERE term IN ('spark', 'join') GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
top AS (
  SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10
)
SELECT tf.doc_id,
       tf.term,
       'text' AS field,
       tf.tf,
       df.df::BIGINT AS df,
       round(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)), 6) AS idf,
       round(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 4) AS contrib,
       round(top.score, 4) AS score
FROM tf
JOIN df USING (term)
JOIN dl ON dl.doc_id = tf.doc_id
JOIN top ON top.doc_id = tf.doc_id
CROSS JOIN stats s
ORDER BY score DESC, tf.doc_id, tf.term
"""

ORACLES["term_complete"] = f"""
WITH {_TOK}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df
FROM tok
WHERE starts_with(term, 's')
GROUP BY term
ORDER BY df DESC, term
LIMIT 15
"""

ORACLES["term_doc_freq"] = f"""
WITH {_TOK}
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
FROM tok GROUP BY term
ORDER BY df DESC, term
LIMIT 20
"""

ORACLES["corpus_stats_row"] = f"""
WITH {_TOK}
SELECT (SELECT count(*) FROM documents) AS n_docs,
       round((SELECT count(*) FROM tok)::DOUBLE
             / (SELECT count(*) FROM documents)::DOUBLE, 6) AS avgdl,
       (SELECT count(*) FROM tok) AS total_tokens
"""

ORACLES["doc_token_lengths"] = f"""
WITH {_TOK}
SELECT doc_id, count(*) AS n_tokens
FROM tok GROUP BY doc_id
ORDER BY n_tokens DESC, doc_id
LIMIT 20
"""

ORACLES["dedup_exact_stats"] = """
WITH per AS (SELECT text, count(*) AS c FROM documents GROUP BY text)
SELECT sum(c)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_distinct,
       sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS n_dup_rows
FROM per
"""

ORACLES["dedup_exact_groups"] = """
SELECT min(doc_id) AS keep_id, count(*) AS group_size
FROM documents GROUP BY text
HAVING count(*) > 1
ORDER BY group_size DESC, keep_id
LIMIT 20
"""

ORACLES["ngram_jaccard_pairs"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                          x -> lower(x)),
           x -> x <> '' AND strlen(x) < 40) AS t
  FROM documents WHERE doc_id < 200
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             AS shingle
    FROM toks
  )
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.8
ORDER BY id_a, id_b
"""

_STOP = "['the','a','of','and','to','in','is','for','on','with']"
ORACLES["text_quality"] = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                          x -> lower(x)),
           x -> x <> '' AND strlen(x) < 40) AS t
  FROM documents WHERE doc_id < 20
)
SELECT doc_id,
       len(t)::BIGINT AS n_tokens,
       round(len(list_filter(list_distinct(t),
                             x -> list_contains({_STOP}, x)))::DOUBLE
             / greatest(len(list_distinct(t)), 1), 6) AS stop_ratio,
       round(list_sum(list_transform(t, x -> length(x)::DOUBLE))
             / greatest(len(t), 1), 6) AS mean_token_len
FROM toks
ORDER BY doc_id
"""

ORACLES["length_histogram"] = """
WITH b AS (
  SELECT CASE WHEN n_chars <= 150 THEN '0-150'
              WHEN n_chars <= 300 THEN '151-300'
              WHEN n_chars <= 450 THEN '301-450'
              ELSE '450+' END AS bucket
  FROM documents
)
SELECT bucket, count(*) AS n,
       round(count(*) * 100.0 / (SELECT count(*) FROM documents), 4) AS pct
FROM b GROUP BY bucket ORDER BY bucket
"""

ORACLES["lang_distribution"] = """
SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang
"""

ORACLES["cosine_topk"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             5) AS cosine
FROM e CROSS JOIN q
WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""

# More-like-this by a stored row's vector (excluding the row itself);
# round-to-5dp before rank mirrors the entry, so the comparison is
# independent of each engine's float-summation order.
ORACLES["mlt_topk"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 7)
SELECT vec_id AS doc_id,
       round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             5) AS cosine
FROM e CROSS JOIN q
WHERE vec_id <> 7
ORDER BY cosine DESC, doc_id
LIMIT 10
"""

ORACLES["label_centroid_norms"] = """
WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
ex AS (
  SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS val FROM e
),
comp AS (
  SELECT label, i, sum(val) / count(*) AS c, count(*) AS n
  FROM ex GROUP BY label, i
)
SELECT label, max(n)::BIGINT AS n,
       round(sqrt(sum(c * c)), 6) AS centroid_norm
FROM comp GROUP BY label ORDER BY label
"""

ORACLES["events_daily_counts"] = """
SELECT ts::DATE AS day, count(*) AS n FROM events GROUP BY day ORDER BY day
"""

ORACLES["events_hourly_histogram"] = """
SELECT hour(ts)::BIGINT AS hour, count(*) AS n
FROM events GROUP BY 1 ORDER BY hour
"""

ORACLES["events_dow_histogram"] = """
SELECT dayofweek(ts)::BIGINT AS dow, count(*) AS n
FROM events GROUP BY 1 ORDER BY dow
"""

ORACLES["events_type_engagement"] = """
SELECT event_type, count(*) AS n,
       round(sum(value), 2) AS total_value,
       round(avg(value), 4) AS avg_value
FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLES["events_monthly_trend"] = """
SELECT strftime(ts, '%Y-%m') AS month, count(*) AS n,
       round(avg(value), 4) AS avg_value
FROM events GROUP BY 1 ORDER BY month
"""

ORACLES["events_longest_gap"] = """
WITH days AS (SELECT DISTINCT ts::DATE AS day FROM events),
gaps AS (
  SELECT day - lag(day) OVER (ORDER BY day) AS gap FROM days
)
SELECT max(gap)::BIGINT AS max_gap_days FROM gaps
"""

ORACLES["events_value_percentiles"] = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90
FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLES["events_activity_summary"] = """
WITH daily AS (SELECT ts::DATE AS day, count(*) AS n FROM events GROUP BY 1),
hourly AS (SELECT extract(hour FROM ts) AS hour, count(*) AS n
           FROM events GROUP BY 1),
td AS (SELECT day AS most_active_day, n AS most_active_day_count
       FROM daily ORDER BY n DESC, day LIMIT 1),
th AS (SELECT hour::BIGINT AS most_active_hour, n AS most_active_hour_count
       FROM hourly ORDER BY n DESC, hour LIMIT 1),
s AS (SELECT count(*)::BIGINT AS active_days,
             round(sum(n)::DOUBLE / count(*), 6) AS avg_per_active_day,
             (date_diff('day', min(day), max(day)) + 1)::BIGINT AS days_in_range
      FROM daily)
SELECT * FROM s CROSS JOIN td CROSS JOIN th
"""

ORACLES["events_user_activity"] = """
SELECT user_id, count(*) AS n_events,
       count(DISTINCT ts::DATE) AS active_days,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT 20
"""

ORACLES["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Dedup / similarity / text ops oracles
# ---------------------------------------------------------------------------

def _minhash_oracle_sql() -> str:
    """Exact replay of xf_spark.ops.dedup minhash-LSH-verified pairs:
    same md5-derived shingle ints, same affine coefficients (< 2^31,
    int64-safe), same mersenne modulus, same comma-joined band
    digests, same exact-Jaccard verification."""
    from xf_spark.ops.dedup import (
        LSH_MAX_BUCKET,
        MINHASH_A,
        MINHASH_B,
        N_BANDS,
        N_HASHES,
    )

    coef_rows = ", ".join(
        f"({i}, {int(a)}, {int(b)})"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    rpb = N_HASHES // N_BANDS
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                          x -> lower(x)),
           x -> x <> '' AND strlen(x) < 40) AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             AS shingle
    FROM toks
  )
),
shi AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS v FROM sh
),
coef(i, a, b) AS (VALUES {coef_rows}),
mh AS (
  SELECT doc_id, i, min((a * v + b) % 2305843009213693951) AS sig
  FROM shi CROSS JOIN coef
  GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, i // {rpb} AS band,
         string_agg(sig::VARCHAR, ',' ORDER BY i) AS digest
  FROM mh GROUP BY doc_id, i // {rpb}
),
kept AS (
  SELECT band, digest FROM bands
  GROUP BY band, digest HAVING count(*) <= {LSH_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN kept k ON k.band = a.band AND k.digest = a.digest
  JOIN bands b
    ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.id_a
  JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT c.id_a, c.id_b,
       round(coalesce(i.i, 0)::DOUBLE / (sa.n + sb.n - coalesce(i.i, 0)), 6)
         AS jaccard
FROM cand c
LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE coalesce(i.i, 0)::DOUBLE / (sa.n + sb.n - coalesce(i.i, 0)) >= 0.8
ORDER BY c.id_a, c.id_b
"""


ORACLES["minhash_dedup"] = _minhash_oracle_sql()


def _near_dup_groups_oracle_sql() -> str:
    """Cluster-level dedup differential: the minhash pair replay above
    feeds a WITH RECURSIVE transitive closure; keep_id = min reachable
    id (== connected-component min, what the Spark min-label
    propagation converges to); docs in no pair keep themselves."""
    pairs_sql = _minhash_oracle_sql()
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({pairs_sql})
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS keep_id
  FROM reach GROUP BY src
)
SELECT d.doc_id, coalesce(c.keep_id, d.doc_id) AS keep_id
FROM documents d LEFT JOIN comp c USING (doc_id)
ORDER BY d.doc_id
"""


ORACLES["near_dup_groups"] = _near_dup_groups_oracle_sql()


def _near_dup_groups_longest_oracle_sql() -> str:
    """Priority-keep differential: the same minhash-pair closure, but
    the representative is the component member with the most
    whitespace tokens (ties -> min doc_id)."""
    pairs_sql = _minhash_oracle_sql()
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({pairs_sql})
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS comp
  FROM reach GROUP BY src
),
tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS p
  FROM documents
),
rep AS (
  SELECT comp, doc_id AS keep_id
  FROM (
    SELECT c.comp, c.doc_id,
           row_number() OVER (PARTITION BY c.comp
                              ORDER BY t.p DESC, c.doc_id) AS rn
    FROM comp c JOIN tok t USING (doc_id)
  ) WHERE rn = 1
)
SELECT d.doc_id, coalesce(rep.keep_id, d.doc_id) AS keep_id
FROM documents d
LEFT JOIN comp USING (doc_id)
LEFT JOIN rep USING (comp)
ORDER BY d.doc_id
"""


ORACLES["near_dup_groups_longest"] = _near_dup_groups_longest_oracle_sql()

# Token-budget sampling differential: md5(seed||id) order, keep while
# the cumulative token count BEFORE the doc is under the budget. The
# oracle uses the sequential global-window cumsum; the Spark side must
# reproduce it with its bucket-offset + per-bucket-window plan.
ORACLES["token_budget_sample"] = r"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         md5('42' || doc_id::VARCHAR) AS key
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY key, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM tok
)
SELECT doc_id, n_tokens::BIGINT AS n_tokens
FROM c WHERE cum_before < 3000
ORDER BY doc_id
"""

def _fingerprint_oracle_sql() -> str:
    """Exact replay of ops/textops.py rolling_fingerprints: md5 token
    hashes, degree-8 polynomial window hash mod 2^61-1 (HUGEINT
    intermediates — th*BASE overflows BIGINT), 4-window winnow minima,
    per-doc distinct; validated row-for-row vs the python scalar."""
    from xf_spark.ops.textops import FP_BASE, FP_MOD, FP_WINDOW

    h = "th[i]"
    for j in range(1, FP_WINDOW):
        h = f"(({h})::HUGEINT * {FP_BASE} + th[i+{j}]) % {FP_MOD}"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                          x -> lower(x)),
           x -> x <> '' AND strlen(x) < 40) AS t
  FROM documents WHERE doc_id < 20
),
padded AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN t
              WHEN len(t) < {FP_WINDOW} THEN
                list_concat(t, list_transform(range(1, {FP_WINDOW + 1} - len(t)),
                                              x -> ''))
              ELSE t END AS t
  FROM toks
),
th AS (
  SELECT doc_id,
         list_transform(t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS th
  FROM padded WHERE len(t) > 0
),
wh AS (
  SELECT doc_id,
         list_transform(range(1, len(th) - {FP_WINDOW - 2}),
                        i -> ({h})::BIGINT) AS hs
  FROM th
),
mins AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= 4 THEN
                list_transform(range(1, len(hs) - 2),
                               i -> least(hs[i], hs[i+1], hs[i+2], hs[i+3]))
              ELSE [list_min(hs)] END AS ms
  FROM wh
),
fp AS (SELECT DISTINCT doc_id, unnest(ms) AS f FROM mins)
SELECT doc_id, count(*)::BIGINT AS n_fp, min(f) AS min_fp, max(f) AS max_fp
FROM fp GROUP BY doc_id ORDER BY doc_id
"""


ORACLES["fingerprint_stats"] = _fingerprint_oracle_sql()


def _near_dup_oracle_sql() -> str:
    """Exact replay of ops/dedup.embedding_near_dup_pairs: the seed-42
    hyperplanes ship as SQL literals (same pattern as the MinHash
    coefficients), sign-sketch bucket join WITH the LSH_MAX_BUCKET
    hot-bucket cap (round 3 — mirrors _cap_hot_buckets), exact cosine
    (rounded 6dp BEFORE the threshold, matching the Spark plan)."""
    import numpy as np

    from xf_spark.ops.dedup import LSH_MAX_BUCKET

    rng = np.random.default_rng(42)
    planes = rng.standard_normal((8, 64))
    sketch_terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        sketch_terms.append(
            f"(CASE WHEN list_dot_product(v, {lit}) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    sketch = "\n      + ".join(sketch_terms)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
sk AS (
  SELECT vec_id, v,
      {sketch} AS s
  FROM e
),
kept AS (
  SELECT s FROM sk GROUP BY s HAVING count(*) <= {LSH_MAX_BUCKET}
),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
  FROM sk a
  JOIN kept k ON k.s = a.s
  JOIN sk b ON a.s = b.s AND a.vec_id < b.vec_id
),
scored AS (
  SELECT id_a, id_b,
         round(list_dot_product(va, vb)
               / (sqrt(list_dot_product(va, va))
                  * sqrt(list_dot_product(vb, vb))), 6) AS cosine
  FROM cand
)
SELECT id_a, id_b, cosine FROM scored
WHERE cosine >= 0.3
ORDER BY id_a, id_b
"""


ORACLES["embedding_near_dup"] = _near_dup_oracle_sql()


def _semdedup_oracle_sql(tau: float = 0.35, n_cent: int = 4) -> str:
    """Exact replay of ops/dedup.semdedup with the driver entry's
    pinned centroids (embedding rows vec_id < 4): argmax-cosine cell
    assignment (round 6dp BEFORE the argmax, ties -> lowest centroid
    ordinal), within-cell duplicate pairs at tau (same 6dp rounding),
    WITH RECURSIVE transitive closure, keep = component member with
    the lowest (cent_sim, id) — the farthest-from-centroid rule.
    Cells above LSH_MAX_BUCKET pass through undeduped, mirroring the
    Spark-side quadratic guard."""
    from xf_spark.ops.dedup import LSH_MAX_BUCKET

    return f"""
WITH RECURSIVE e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
c AS (
  SELECT vec_id AS ord, v AS cv FROM e WHERE vec_id < {n_cent}
),
sims AS (
  SELECT e.vec_id, c.ord,
         round(list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cs
  FROM e CROSS JOIN c
),
a AS (
  SELECT vec_id, ord AS cell, cs AS cent_sim FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cs DESC, ord) AS rn
    FROM sims) WHERE rn = 1
),
ok AS (
  SELECT cell FROM a GROUP BY cell HAVING count(*) <= {LSH_MAX_BUCKET}
),
pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b
  FROM a x
  JOIN ok o ON o.cell = x.cell
  JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
  JOIN e ex ON ex.vec_id = x.vec_id
  JOIN e ey ON ey.vec_id = y.vec_id
  WHERE round(list_dot_product(ex.v, ey.v)
              / (sqrt(list_dot_product(ex.v, ex.v))
                 * sqrt(list_dot_product(ey.v, ey.v))), 6) >= {tau}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
),
members AS (
  SELECT src AS vec_id, dst AS member FROM reach
  UNION
  SELECT DISTINCT src, src FROM edges
),
keep AS (
  SELECT vec_id, member AS keep_id FROM (
    SELECT m.vec_id, m.member,
           row_number() OVER (
             PARTITION BY m.vec_id
             ORDER BY am.cent_sim, m.member) AS rn
    FROM members m JOIN a am ON am.vec_id = m.member) WHERE rn = 1
)
SELECT a.vec_id, a.cell::INTEGER AS cell, a.cent_sim,
       coalesce(k.keep_id, a.vec_id) AS keep_id
FROM a LEFT JOIN keep k USING (vec_id)
ORDER BY a.vec_id
"""


ORACLES["semdedup_groups"] = _semdedup_oracle_sql()

# Multimodal metadata/feature differential: payload bytes == ascii
# codes (corpus is pure ASCII, asserted by n_bytes == strlen matching);
# np.resize tiles the payload to w*h*3, so its mean is
# (full_cycles * sum + prefix(remainder)) / need — closed form in SQL.
ORACLES["multimodal_features"] = """
WITH m AS (
  SELECT doc_id AS media_id, 'image' AS kind, text,
         (8 + (doc_id % 4) * 8) AS w, (8 + (doc_id % 3) * 8) AS h
  FROM documents WHERE doc_id < 50
),
codes AS (
  SELECT media_id, kind, strlen(text)::BIGINT AS n, w * h * 3 AS need,
         list_transform(range(1, strlen(text) + 1), i -> ascii(text[i])) AS cs
  FROM m
),
agg AS (
  SELECT media_id, kind, n, need, cs, list_sum(cs)::BIGINT AS s
  FROM codes
)
SELECT media_id, kind, n AS n_bytes,
       ((need // n) * s
        + coalesce(list_sum(cs[1 : (need % n)]), 0))::DOUBLE / need
         AS mean_intensity
FROM agg ORDER BY media_id
"""

# SimHash exact replay: tf-weighted +-1 bit votes over md5-derived
# 64-bit token hashes (UBIGINT bit math), 4x16-bit block candidate
# join WITH the LSH_MAX_BUCKET hot-bucket cap (round 3 — mirrors
# _cap_hot_buckets), bit_count hamming verify — mirrors ops/dedup.py
# simhash / simhash_candidates bit-for-bit (validated against the
# scalar reference implementation).
from xf_spark.ops.dedup import LSH_MAX_BUCKET as _LSH_CAP

ORACLES["simhash_pairs"] = f"""
WITH toks AS (
  SELECT doc_id, lower(raw) AS term
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(text, '[^0-9A-Za-z]+')) AS raw
        FROM documents)
  WHERE raw <> '' AND strlen(raw) < 40
),
th AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf,
         ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h
  FROM toks GROUP BY doc_id, term
),
bits AS (
  SELECT doc_id, i,
         sum(tf * (CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) AS acc
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS i)
  GROUP BY doc_id, i
),
sh AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (1::UBIGINT << i)::HUGEINT ELSE 0 END)::UBIGINT
           AS v
  FROM bits GROUP BY doc_id
),
blocks AS (
  SELECT doc_id, i AS blk, (v >> (16 * i)) & 65535 AS val, v
  FROM sh CROSS JOIN (SELECT unnest(range(4)) AS i)
),
kept AS (
  SELECT blk, val FROM blocks GROUP BY blk, val HAVING count(*) <= {_LSH_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.v AS va, b.v AS vb
  FROM blocks a
  JOIN kept k ON k.blk = a.blk AND k.val = a.val
  JOIN blocks b ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(va, vb))::INT AS hamming
FROM cand
WHERE bit_count(xor(va, vb)) <= 3
ORDER BY id_a, id_b
"""

ORACLES["lang_id_distribution"] = """
WITH g AS (
  SELECT CASE
    WHEN length(regexp_replace(text, '[^一-鿿぀-ヿ]', '', 'g'))::DOUBLE
         / greatest(length(text), 1) > 0.25 THEN 'cjk'
    WHEN length(regexp_replace(text, '[^؀-ۿ]', '', 'g'))::DOUBLE
         / greatest(length(text), 1) > 0.25 THEN 'ar'
    WHEN length(regexp_replace(text, '[^Ѐ-ӿ]', '', 'g'))::DOUBLE
         / greatest(length(text), 1) > 0.25 THEN 'ru'
    WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
         / greatest(length(text), 1) > 0.4 THEN 'en'
    ELSE 'other' END AS lang_guess
  FROM documents
)
SELECT lang_guess, count(*) AS n FROM g GROUP BY lang_guess ORDER BY lang_guess
"""

ORACLES["token_count_stats"] = r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END::BIGINT
         AS n_ws_tokens,
       len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+'))::BIGINT
         AS n_bpe_tokens
FROM documents
WHERE doc_id < 30
ORDER BY doc_id
"""

ORACLES["ann_ivf_full_probe"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 7)
SELECT vec_id,
       round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             6) AS cosine
FROM e CROSS JOIN q
ORDER BY cosine DESC, vec_id
LIMIT 15
"""

# kNN-graph differential: the Spark side runs the IVF-celled cogroup
# matmul with EVERY cell probed (exact); the replay is the plain
# cross join with the identical round-5dp-before-rank and neighbor-id
# tiebreak. Queries = every 10th vector; corpus = all vectors.
ORACLES["knn_graph_full_probe"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id % 10 = 0),
s AS (
  SELECT q.vec_id AS vec_id, e.vec_id AS nb_id,
         round(list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(e.v, e.v))),
               5) AS cosine
  FROM q CROSS JOIN e
  WHERE e.vec_id <> q.vec_id
),
r AS (
  SELECT vec_id, nb_id, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, nb_id) AS rank
  FROM s
)
SELECT vec_id, nb_id, rank::BIGINT AS rank, cosine
FROM r WHERE rank <= 3
ORDER BY vec_id, rank
"""

# ---------------------------------------------------------------------------
# Transcripts-engine differentials: a transcripts-shaped table is
# derived from the documents view by PURE SQL (20 turns/conv,
# zero-padded conv_id so (conv_id, turn_idx) order == doc_id order,
# role by parity, ts = 2024-01-01 + doc_id minutes) — the Spark side
# runs the REAL engine (docID assignment -> postings -> BM25/phrase/
# filter/context) over the identically-derived DataFrame, so the whole
# engine path gets an independent recomputation. `did` replicates the
# engine's dense docID (rank over (conv_id, turn_idx)).
# ---------------------------------------------------------------------------

_TR_BASE = """
base AS (
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS did,
         'c' || lpad((doc_id // 20)::VARCHAR, 6, '0') AS conv_id,
         (doc_id % 20)::INT AS turn_idx,
         CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         text,
         TIMESTAMP '2024-01-01 00:00:00' + (doc_id * 60) * INTERVAL 1 SECOND AS ts
  FROM documents
),
ttok AS (
  SELECT did, lower(raw) AS term
  FROM (SELECT did, unnest(regexp_split_to_array(text, '[^0-9A-Za-z]+')) AS raw
        FROM base)
  WHERE raw <> '' AND strlen(raw) < 40
),
tdl AS (SELECT did, count(*)::DOUBLE AS dl FROM ttok GROUP BY did),
tstats AS (
  SELECT (SELECT count(*) FROM base)::DOUBLE AS n,
         (SELECT count(*) FROM ttok)::DOUBLE
           / (SELECT count(*) FROM base)::DOUBLE AS avgdl
)
"""

# single-term scored CTE, BM25 k1=1.2 b=0.75
def _tr_scored(term: str) -> str:
    return f"""
ttf AS (SELECT did, count(*)::DOUBLE AS tf FROM ttok
        WHERE term = '{term}' GROUP BY did),
tdf AS (SELECT count(*)::DOUBLE AS df FROM ttf),
tscored AS (
  SELECT ttf.did,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ttf.tf * 2.2
           / (ttf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) AS score
  FROM ttf
  JOIN tdl ON tdl.did = ttf.did
  CROSS JOIN tdf d
  CROSS JOIN tstats s
)
"""


_TR_SCORED_SPARK = _tr_scored("spark")

ORACLES["transcripts_docs_bm25"] = f"""
WITH {_TR_BASE}, {_TR_SCORED_SPARK}
SELECT b.conv_id, b.turn_idx, round(t.score, 4) AS score, b.text
FROM tscored t JOIN base b ON b.did = t.did
ORDER BY t.score DESC, t.did
LIMIT 20
"""

ORACLES["transcripts_docs_filtered"] = f"""
WITH {_TR_BASE}, {_TR_SCORED_SPARK}
SELECT b.conv_id, b.turn_idx, round(t.score, 4) AS score
FROM tscored t JOIN base b ON b.did = t.did
WHERE b.role = 'assistant' AND b.ts >= TIMESTAMP '2024-01-01 04:00:00'
ORDER BY t.score DESC, t.did
LIMIT 20
"""

def _tr_phrase_block(first: str, second: str) -> str:
    """Shared CTE body for the two-term positional-adjacency phrase
    scoring (candidates via list_filter adjacency, score = summed
    per-term BM25 — engine semantics, search.rs phrase scoring); the
    single source of truth for every phrase oracle's arithmetic."""
    return f"""
ptoks AS (
  SELECT did,
         list_filter(
           list_transform(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                          x -> lower(x)),
           x -> x <> '' AND strlen(x) < 40) AS t
  FROM base
),
pcand AS (
  SELECT did FROM ptoks
  WHERE len(list_filter(range(1, len(t)),
                        i -> t[i] = '{first}' AND t[i + 1] = '{second}')) > 0
),
ptf AS (SELECT did, term, count(*)::DOUBLE AS tf FROM ttok
        WHERE term IN ('{first}', '{second}') GROUP BY did, term),
pdf AS (SELECT term, count(DISTINCT did)::DOUBLE AS df FROM ttok
        WHERE term IN ('{first}', '{second}') GROUP BY term),
pscored AS (
  SELECT ptf.did,
         sum( ln(1 + (s.n - pdf.df + 0.5) / (pdf.df + 0.5))
              * ptf.tf * 2.2
              / (ptf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) ) AS score
  FROM ptf
  JOIN pdf USING (term)
  JOIN tdl ON tdl.did = ptf.did
  JOIN pcand ON pcand.did = ptf.did
  CROSS JOIN tstats s
  GROUP BY ptf.did
)"""


def _tr_phrase_sql(first: str, second: str) -> str:
    """Hydrated phrase oracle: top-20 (conv_id, turn_idx, score)."""
    return f"""
WITH {_TR_BASE},
{_tr_phrase_block(first, second)}
SELECT b.conv_id, b.turn_idx, round(p.score, 4) AS score
FROM pscored p JOIN base b ON b.did = p.did
ORDER BY p.score DESC, p.did
LIMIT 20
"""


ORACLES["transcripts_docs_phrase"] = _tr_phrase_sql("spark", "join")
ORACLES["transcripts_phrase_hash_join"] = _tr_phrase_sql("hash", "join")


def _tr_near_sql(first: str, second: str, slop: int) -> str:
    """Sloppy-phrase oracle ('"a b"~slop' — ordered proximity, gap in
    [1, slop+1]): the adjacency lambda becomes a nested list_filter
    scanning the window t[i+1 .. i+1+slop] for the second member;
    scoring identical to the phrase block (summed per-term BM25)."""
    return f"""
WITH {_TR_BASE},
ptoks AS (
  SELECT did,
         list_filter(
           list_transform(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                          x -> lower(x)),
           x -> x <> '' AND strlen(x) < 40) AS t
  FROM base
),
pcand AS (
  SELECT did FROM ptoks
  WHERE len(list_filter(range(1, len(t) + 1),
            i -> t[i] = '{first}' AND
                 len(list_filter(range(i + 1, least(i + 1 + {slop}, len(t)) + 1),
                     j -> t[j] = '{second}')) > 0)) > 0
),
ptf AS (SELECT did, term, count(*)::DOUBLE AS tf FROM ttok
        WHERE term IN ('{first}', '{second}') GROUP BY did, term),
pdf AS (SELECT term, count(DISTINCT did)::DOUBLE AS df FROM ttok
        WHERE term IN ('{first}', '{second}') GROUP BY term),
pscored AS (
  SELECT ptf.did,
         sum( ln(1 + (s.n - pdf.df + 0.5) / (pdf.df + 0.5))
              * ptf.tf * 2.2
              / (ptf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) ) AS score
  FROM ptf
  JOIN pdf USING (term)
  JOIN tdl ON tdl.did = ptf.did
  JOIN pcand ON pcand.did = ptf.did
  CROSS JOIN tstats s
  GROUP BY ptf.did
)
SELECT b.conv_id, b.turn_idx, round(p.score, 4) AS score
FROM pscored p JOIN base b ON b.did = p.did
ORDER BY p.score DESC, p.did
LIMIT 20
"""


ORACLES["transcripts_near_slop"] = _tr_near_sql("hash", "join", 2)

# boosted OR 'hash^2 OR join': weighted per-term BM25 sum over docs
# matching ANY member (weights ride the sum; absent terms contribute 0)
ORACLES["transcripts_boosted_or"] = f"""
WITH {_TR_BASE},
wtf AS (SELECT did, term, count(*)::DOUBLE AS tf FROM ttok
        WHERE term IN ('hash', 'join') GROUP BY did, term),
wdf AS (SELECT term, count(DISTINCT did)::DOUBLE AS df FROM ttok
        WHERE term IN ('hash', 'join') GROUP BY term),
wts AS (SELECT 'hash' AS term, 2.0 AS wt UNION ALL SELECT 'join', 1.0),
wscored AS (
  SELECT wtf.did,
         sum( wts.wt
              * ln(1 + (s.n - wdf.df + 0.5) / (wdf.df + 0.5))
              * wtf.tf * 2.2
              / (wtf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) ) AS score
  FROM wtf
  JOIN wdf USING (term)
  JOIN wts USING (term)
  JOIN tdl ON tdl.did = wtf.did
  CROSS JOIN tstats s
  GROUP BY wtf.did
)
SELECT b.conv_id, b.turn_idx, round(w.score, 4) AS score
FROM wscored w JOIN base b ON b.did = w.did
ORDER BY w.score DESC, w.did
LIMIT 20
"""

# min_should_match=2 over 'spark merge filter': docs matching >= 2 of
# the should clauses, scored over their MATCHING clauses only
ORACLES["transcripts_min_should_match"] = f"""
WITH {_TR_BASE},
mtf AS (SELECT did, term, count(*)::DOUBLE AS tf FROM ttok
        WHERE term IN ('spark', 'merge', 'filter') GROUP BY did, term),
mdf AS (SELECT term, count(DISTINCT did)::DOUBLE AS df FROM ttok
        WHERE term IN ('spark', 'merge', 'filter') GROUP BY term),
mscored AS (
  SELECT mtf.did,
         sum( ln(1 + (s.n - mdf.df + 0.5) / (mdf.df + 0.5))
              * mtf.tf * 2.2
              / (mtf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) ) AS score
  FROM mtf
  JOIN mdf USING (term)
  JOIN tdl ON tdl.did = mtf.did
  CROSS JOIN tstats s
  GROUP BY mtf.did
  HAVING count(DISTINCT mtf.term) >= 2
)
SELECT b.conv_id, b.turn_idx, round(m.score, 4) AS score
FROM mscored m JOIN base b ON b.did = m.did
ORDER BY m.score DESC, m.did
LIMIT 20
"""

# Query-embedded field filter: role:assistant + scored term.
ORACLES["transcripts_field_query"] = f"""
WITH {_TR_BASE}, {_tr_scored("spark")}
SELECT b.conv_id, b.turn_idx, round(t.score, 4) AS score
FROM tscored t JOIN base b ON b.did = t.did
WHERE b.role = 'assistant'
ORDER BY t.score DESC, t.did
LIMIT 20
"""

# Flagship lexical ('machine'@20 analog): hydrated single-term BM25.
ORACLES["transcripts_bm25_merge"] = f"""
WITH {_TR_BASE}, {_tr_scored("merge")}
SELECT b.conv_id, b.turn_idx, round(t.score, 4) AS score, b.text
FROM tscored t JOIN base b ON b.did = t.did
ORDER BY t.score DESC, t.did
LIMIT 20
"""

# Flagship context expansion ('machine' top-5 -> conversations analog).
ORACLES["transcripts_context_expansion"] = f"""
WITH {_TR_BASE}, {_tr_scored("merge")},
hits AS (SELECT did FROM tscored ORDER BY score DESC, did LIMIT 5),
convs AS (SELECT DISTINCT b.conv_id FROM base b JOIN hits h ON b.did = h.did)
SELECT b.conv_id, b.turn_idx, b.role, b.text,
       (h.did IS NOT NULL) AS is_match
FROM base b
JOIN convs USING (conv_id)
LEFT JOIN hits h ON h.did = b.did
ORDER BY b.conv_id, b.turn_idx
"""

# Flagship hybrid ('rust' hybrid@20 analog): RRF(K=60) fusion of the
# lexical BM25 'filter' top-60 list and the cosine top-60 list vs the
# vec_id=0 embedding (vec_id is doc_id-aligned; cosine rounded to 5 dp
# BEFORE ranking on both sides so rank order is engine-independent).
# Tiebreaks pinned to hybrid.rs:136-213: score desc, in-both, doc_id.
ORACLES["transcripts_hybrid_rrf"] = f"""
WITH {_TR_BASE}, {_tr_scored("filter")},
lex AS (
  SELECT did, row_number() OVER (ORDER BY score DESC, did) - 1 AS r
  FROM tscored ORDER BY score DESC, did LIMIT 60
),
e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
cos AS (
  SELECT vec_id,
         round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
               5) AS c
  FROM e CROSS JOIN q
),
sem AS (
  SELECT vec_id AS did, row_number() OVER (ORDER BY c DESC, vec_id) - 1 AS r
  FROM cos ORDER BY c DESC, vec_id LIMIT 60
),
fused AS (
  SELECT coalesce(l.did, s.did) AS doc_id,
         coalesce(1.0 / (60 + l.r + 1), 0.0)
           + coalesce(1.0 / (60 + s.r + 1), 0.0) AS score,
         CASE WHEN l.did IS NOT NULL AND s.did IS NOT NULL
              THEN 1 ELSE 0 END AS in_both
  FROM lex l FULL OUTER JOIN sem s ON l.did = s.did
)
SELECT doc_id, round(score, 6) AS score
FROM fused
ORDER BY fused.score DESC, in_both DESC, doc_id
LIMIT 20
"""

# The ann=True hybrid composition at full probe + full k is EXACT, so
# the plain hybrid oracle applies verbatim — any approximation leak in
# the IVF candidate path breaks the hash.
ORACLES["hybrid_ann_full_probe"] = ORACLES["transcripts_hybrid_rrf"]

# Fusion breakdown (hybrid explain): same candidate CTEs, but the
# fused select exposes each source's rank and 1/(K+rank+1)
# contribution instead of only the sum.
ORACLES["hybrid_explain_rrf"] = f"""
WITH {_TR_BASE}, {_tr_scored("filter")},
lex AS (
  SELECT did, row_number() OVER (ORDER BY score DESC, did) - 1 AS r
  FROM tscored ORDER BY score DESC, did LIMIT 60
),
e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
cos AS (
  SELECT vec_id,
         round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
               5) AS c
  FROM e CROSS JOIN q
),
sem AS (
  SELECT vec_id AS did, row_number() OVER (ORDER BY c DESC, vec_id) - 1 AS r
  FROM cos ORDER BY c DESC, vec_id LIMIT 60
),
fused AS (
  SELECT coalesce(l.did, s.did) AS doc_id,
         l.r AS lex_rank,
         s.r AS sem_rank,
         coalesce(1.0 / (60 + l.r + 1), 0.0) AS contrib_lex,
         coalesce(1.0 / (60 + s.r + 1), 0.0) AS contrib_sem,
         coalesce(1.0 / (60 + l.r + 1), 0.0)
           + coalesce(1.0 / (60 + s.r + 1), 0.0) AS score,
         CASE WHEN l.did IS NOT NULL AND s.did IS NOT NULL
              THEN 1 ELSE 0 END AS in_both
  FROM lex l FULL OUTER JOIN sem s ON l.did = s.did
)
SELECT doc_id, lex_rank, sem_rank,
       round(contrib_lex, 6) AS contrib_lex,
       round(contrib_sem, 6) AS contrib_sem,
       round(score, 6) AS score
FROM fused
ORDER BY fused.score DESC, in_both DESC, doc_id
LIMIT 20
"""

ORACLES["transcripts_docs_context"] = f"""
WITH {_TR_BASE}, {_TR_SCORED_SPARK},
hits AS (SELECT did FROM tscored ORDER BY score DESC, did LIMIT 5),
convs AS (SELECT DISTINCT b.conv_id FROM base b JOIN hits h ON b.did = h.did)
SELECT b.conv_id, b.turn_idx, b.role, b.text,
       (h.did IS NOT NULL) AS is_match
FROM base b
JOIN convs USING (conv_id)
LEFT JOIN hits h ON h.did = b.did
ORDER BY b.conv_id, b.turn_idx
"""

# Thread reconstruction: DuckDB runs the reference's ACTUAL recursive
# CTE shape (get_tweet_thread, storage.rs:1518-1562) over a reply
# graph derived from documents; the Spark side runs the frontier-loop
# re-expression in ops/graph.py.
ORACLES["thread_reconstruction"] = """
WITH RECURSIVE
edges AS (
  SELECT doc_id,
         CASE WHEN doc_id % 20 = 0 THEN NULL
              ELSE greatest(doc_id - (1 + doc_id % 3), doc_id - doc_id % 20)
         END AS parent_id,
         text
  FROM documents
),
ancestors(id, parent_id, depth) AS (
  SELECT doc_id, parent_id, 0 FROM edges WHERE doc_id = 157
  UNION ALL
  SELECT e.doc_id, e.parent_id, a.depth + 1
  FROM edges e JOIN ancestors a ON e.doc_id = a.parent_id
  WHERE a.parent_id IS NOT NULL AND a.depth < 100
),
root AS (
  SELECT id FROM ancestors
  WHERE parent_id IS NULL OR parent_id NOT IN (SELECT doc_id FROM edges)
  ORDER BY depth DESC
  LIMIT 1
),
thread_ids(id) AS (
  SELECT id FROM root
  UNION ALL
  SELECT e.doc_id FROM edges e JOIN thread_ids t ON e.parent_id = t.id
)
SELECT DISTINCT e.doc_id, e.parent_id, e.text
FROM edges e
WHERE e.doc_id IN (SELECT id FROM thread_ids)
ORDER BY e.doc_id
"""

# Prefix field: words split on [\W_]+, len >= 2, first 100 such words;
# a word emits prefix 'spar' iff len >= 4 and it starts with 'spar'.
# idf from the prefix field's own df; tf/dl normalization from the
# TEXT field (engine's pinned convention).
ORACLES["transcripts_docs_prefix"] = f"""
WITH {_TR_BASE},
words AS (
  SELECT did, unnest(l) AS w, unnest(range(1, len(l) + 1)) AS idx
  FROM (SELECT did, regexp_split_to_array(text, '[\\W_]+') AS l FROM base)
),
pw AS (
  SELECT did, lower(w) AS w,
         row_number() OVER (PARTITION BY did ORDER BY idx) AS rn
  FROM words WHERE strlen(w) >= 2
),
ptf AS (
  SELECT did, count(*)::DOUBLE AS tf
  FROM pw
  WHERE rn <= 100 AND strlen(w) >= 4 AND substr(w, 1, 4) = 'spar'
  GROUP BY did
),
pdf AS (SELECT count(*)::DOUBLE AS df FROM ptf),
pscored AS (
  SELECT ptf.did,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ptf.tf * 2.2
           / (ptf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) AS score
  FROM ptf
  JOIN tdl ON tdl.did = ptf.did
  CROSS JOIN pdf d
  CROSS JOIN tstats s
)
SELECT b.conv_id, b.turn_idx, round(p.score, 4) AS score
FROM pscored p JOIN base b ON b.did = p.did
ORDER BY p.score DESC, p.did
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Persisted segment-index differentials: the SAME flat recomputation
# oracles the in-session engine entries use — the segment entries run
# the codec/WAND/append/compact machinery on the Spark side and must be
# indistinguishable from a flat SQL BM25 over the (surviving) corpus.
# ---------------------------------------------------------------------------

ORACLES["transcripts_segment_bm25"] = ORACLES["transcripts_docs_bm25"]
ORACLES["transcripts_lifecycle_bm25"] = ORACLES["transcripts_docs_bm25"]
# Iceberg snapshot sync == full rebuild: same flat-SQL BM25 recompute
ORACLES["transcripts_iceberg_sync_bm25"] = ORACLES["transcripts_docs_bm25"]

# fuzzy expansion replay: the distance-1 vocabulary neighborhood of the
# typo (df-ranked, capped at 50 — FUZZY_MAX_EXPANSIONS), then OR-BM25
# where every variant carries its OWN idf (Lucene FuzzyQuery rewrite)
ORACLES["transcripts_fuzzy_bm25"] = f"""
WITH {_TR_BASE},
tvar AS (
  SELECT term, count(DISTINCT did)::DOUBLE AS df
  FROM ttok
  WHERE levenshtein(term, 'sart') <= 1
  GROUP BY term
  ORDER BY df DESC, term
  LIMIT 50
),
ttf AS (
  SELECT ttok.term, did, count(*)::DOUBLE AS tf
  FROM ttok JOIN tvar USING (term)
  GROUP BY ttok.term, did
),
tscored AS (
  SELECT ttf.did,
         sum(ln(1 + (s.n - v.df + 0.5) / (v.df + 0.5)) * ttf.tf * 2.2
           / (ttf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl))) AS score
  FROM ttf
  JOIN tvar v ON v.term = ttf.term
  JOIN tdl ON tdl.did = ttf.did
  CROSS JOIN tstats s
  GROUP BY ttf.did
)
SELECT b.conv_id, b.turn_idx, round(t.score, 4) AS score, b.text
FROM tscored t JOIN base b ON b.did = t.did
ORDER BY t.score DESC, t.did
LIMIT 20
"""


def _tr_expansion_or_sql(conds: list[str]) -> str:
    """Dictionary-expansion OR oracle (wildcard / ~d fuzzy atoms):
    each ``cond`` (a SQL predicate over ``term``) is one atom's
    expansion — matching vocabulary terms ranked df desc / term asc,
    capped at 50 (MULTITERM_MAX_EXPANSIONS) — and the atoms' leaf
    lists concatenate into one OR where every leaf is scored with its
    OWN idf (the engines' expand_multiterm_plan semantics)."""
    sets = "\n  UNION ALL\n".join(
        f"""  SELECT term, df FROM (
    SELECT term, count(DISTINCT did)::DOUBLE AS df
    FROM ttok WHERE {c}
    GROUP BY term ORDER BY df DESC, term LIMIT 50)"""
        for c in conds
    )
    return f"""
WITH {_TR_BASE},
tvar AS (
{sets}
),
ttf AS (
  SELECT ttok.term, did, count(*)::DOUBLE AS tf
  FROM ttok JOIN (SELECT DISTINCT term FROM tvar) v USING (term)
  GROUP BY ttok.term, did
),
tscored AS (
  SELECT ttf.did,
         sum(ln(1 + (s.n - v.df + 0.5) / (v.df + 0.5)) * ttf.tf * 2.2
           / (ttf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl))) AS score
  FROM tvar v
  JOIN ttf ON ttf.term = v.term
  JOIN tdl ON tdl.did = ttf.did
  CROSS JOIN tstats s
  GROUP BY ttf.did
)
SELECT b.conv_id, b.turn_idx, round(t.score, 4) AS score
FROM tscored t JOIN base b ON b.did = t.did
ORDER BY t.score DESC, t.did
LIMIT 20
"""


# wildcard atoms: LIKE expansion per pattern ('s?a*' -> s_a%,
# 'ha?h' -> ha_h), leaves concatenated into one OR
ORACLES["transcripts_wildcard"] = _tr_expansion_or_sql(
    ["term LIKE 's_a%'", "term LIKE 'ha_h'"]
)

# fuzzy syntax sort~2: Levenshtein<=2 neighbors (DuckDB levenshtein ==
# Spark F.levenshtein == the oracle's DP — plain edit distance)
ORACLES["transcripts_fuzzy_syntax"] = _tr_expansion_or_sql(
    ["levenshtein(term, 'sort') <= 2"]
)

# phrase-prefix "filter s*": the trailing prefix expands (df desc,
# term asc, cap 50); each expansion e is the exact phrase
# ('filter', e) — positional adjacency required, contribution =
# bm25(filter) + bm25(e), summed over MATCHING expansions per doc
ORACLES["transcripts_phrase_prefix"] = f"""
WITH {_TR_BASE},
pexp AS MATERIALIZED (
  SELECT term, count(DISTINCT did)::DOUBLE AS df
  FROM ttok WHERE term LIKE 's%'
  GROUP BY term ORDER BY df DESC, term LIMIT 50
),
ptoks AS MATERIALIZED (
  SELECT did,
         list_filter(
           list_transform(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                          x -> lower(x)),
           x -> x <> '' AND strlen(x) < 40) AS t
  FROM base
),
-- MATERIALIZED: without it DuckDB inlines these CTEs into the
-- 6-way scoring join and re-evaluates the per-row list lambdas
-- inside the reordered join tree (observed: minutes + tens of GB
-- instead of 0.1 s on 4k docs)
pcand AS MATERIALIZED (
  SELECT p.did, e.term
  FROM ptoks p CROSS JOIN pexp e
  WHERE len(list_filter(range(1, len(p.t)),
                        i -> p.t[i] = 'filter' AND p.t[i + 1] = e.term)) > 0
),
tffix AS (SELECT did, count(*)::DOUBLE AS tf FROM ttok
          WHERE term = 'filter' GROUP BY did),
dffix AS (SELECT count(*)::DOUBLE AS df FROM tffix),
tfe AS (
  SELECT did, ttok.term, count(*)::DOUBLE AS tf
  FROM ttok JOIN (SELECT term FROM pexp) v USING (term)
  GROUP BY did, ttok.term
),
pscored AS (
  SELECT c.did,
         sum( ln(1 + (s.n - fx.df + 0.5) / (fx.df + 0.5))
              * tfx.tf * 2.2
              / (tfx.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl))
            + ln(1 + (s.n - e.df + 0.5) / (e.df + 0.5))
              * tfe.tf * 2.2
              / (tfe.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) ) AS score
  FROM pcand c
  JOIN tffix tfx ON tfx.did = c.did
  CROSS JOIN dffix fx
  JOIN pexp e ON e.term = c.term
  JOIN tfe ON tfe.did = c.did AND tfe.term = c.term
  JOIN tdl ON tdl.did = c.did
  CROSS JOIN tstats s
  GROUP BY c.did
)
SELECT b.conv_id, b.turn_idx, round(p.score, 4) AS score
FROM pscored p JOIN base b ON b.did = p.did
ORDER BY p.score DESC, p.did
LIMIT 20
"""

# query-time synonyms: OR(term merge, term join, PHRASE 'hash join')
# — two per-term BM25 legs UNION ALL the positional phrase leg (the
# shared _tr_phrase_block arithmetic), summed per doc
ORACLES["transcripts_synonyms"] = f"""
WITH {_TR_BASE},
{_tr_phrase_block("hash", "join")},
sdf AS (SELECT term, count(DISTINCT did)::DOUBLE AS df FROM ttok
        WHERE term IN ('merge', 'join') GROUP BY term),
stf AS (SELECT did, term, count(*)::DOUBLE AS tf FROM ttok
        WHERE term IN ('merge', 'join') GROUP BY did, term),
sterm AS (
  SELECT stf.did,
         ln(1 + (s.n - sdf.df + 0.5) / (sdf.df + 0.5)) * stf.tf * 2.2
           / (stf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) AS score
  FROM stf
  JOIN sdf USING (term)
  JOIN tdl ON tdl.did = stf.did
  CROSS JOIN tstats s
),
sall AS (
  SELECT did, score FROM sterm
  UNION ALL
  SELECT did, score FROM pscored
),
stotal AS (SELECT did, sum(score) AS score FROM sall GROUP BY did)
SELECT b.conv_id, b.turn_idx, round(t.score, 4) AS score
FROM stotal t JOIN base b ON b.did = t.did
ORDER BY t.score DESC, t.did
LIMIT 20
"""


# percolate membership replay: each registered query is an independent
# set predicate over the tokenized base (every 7th doc), UNION ALL'd
# with its qid — the same five queries the Spark entry registers
ORACLES["transcripts_percolate"] = f"""
WITH {_TR_BASE},
sel AS (SELECT did, conv_id, turn_idx, role, text FROM base WHERE did % 7 = 0),
stok AS (SELECT ttok.did, term FROM ttok JOIN sel USING (did)),
sptoks AS MATERIALIZED (
  SELECT did,
         list_filter(
           list_transform(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                          x -> lower(x)),
           x -> x <> '' AND strlen(x) < 40) AS t
  FROM sel
),
hits AS (
  SELECT did, 'q_phrase' AS qid FROM sptoks
  WHERE len(list_filter(range(1, len(t)),
                        i -> t[i] = 'hash' AND t[i + 1] = 'join')) > 0
  UNION ALL
  SELECT did, 'q_and' FROM sel s
  WHERE EXISTS (SELECT 1 FROM stok WHERE did = s.did AND term = 'spark')
    AND EXISTS (SELECT 1 FROM stok WHERE did = s.did AND term = 'merge')
    AND EXISTS (SELECT 1 FROM stok WHERE did = s.did AND term = 'filter')
  UNION ALL
  SELECT did, 'q_not' FROM sel s
  WHERE EXISTS (SELECT 1 FROM stok WHERE did = s.did AND term = 'dup')
    AND NOT EXISTS (SELECT 1 FROM stok WHERE did = s.did AND term = 'slow')
  UNION ALL
  SELECT did, 'q_wild' FROM sel s
  WHERE EXISTS (SELECT 1 FROM stok WHERE did = s.did AND term LIKE 've_tor')
  UNION ALL
  SELECT did, 'q_role' FROM sel s
  WHERE s.role = 'assistant'
    AND EXISTS (SELECT 1 FROM stok WHERE did = s.did AND term = 'stream')
)
SELECT s.conv_id, s.turn_idx, h.qid
FROM hits h JOIN sel s USING (did)
ORDER BY s.conv_id, s.turn_idx, h.qid
"""


# term-vectors replay for doc did=7: per-term tf from the doc's own
# tokens, df from the corpus, contrib = the single-term BM25 leg
ORACLES["transcripts_term_vectors"] = f"""
WITH {_TR_BASE},
vtf AS (SELECT term, count(*)::DOUBLE AS tf FROM ttok
        WHERE did = 7 GROUP BY term),
vdf AS (SELECT term, count(DISTINCT did)::DOUBLE AS df FROM ttok
        WHERE term IN (SELECT term FROM vtf) GROUP BY term),
vdl AS (SELECT dl FROM tdl WHERE did = 7)
SELECT v.term,
       v.tf::BIGINT AS tf,
       d.df::BIGINT AS df,
       round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)), 6) AS idf,
       round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * v.tf * 2.2
             / (v.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)), 6) AS contrib
FROM vtf v
JOIN vdf d USING (term)
CROSS JOIN vdl l
CROSS JOIN tstats s
ORDER BY contrib DESC, v.term
"""

# boosting-query demotion replay: BM25('spark') * 0.3 where the doc
# also matches the positional phrase "hash join", * 1 otherwise
ORACLES["transcripts_demoted"] = f"""
WITH {_TR_BASE},
{_tr_phrase_block("hash", "join")},
{_tr_scored("spark")},
dcomb AS (
  SELECT t.did,
         t.score * CASE WHEN p.did IS NULL THEN 1.0 ELSE 0.3 END AS score
  FROM tscored t
  LEFT JOIN (SELECT DISTINCT did FROM pscored) p ON p.did = t.did
)
SELECT b.conv_id, b.turn_idx, round(c.score, 4) AS score
FROM dcomb c JOIN base b ON b.did = c.did
ORDER BY c.score DESC, c.did
LIMIT 20
"""

# recency-decay replay: BM25('spark') * 0.5^(age_days/90), age from
# the corpus max ts (epoch() seconds — microsecond-exact on this
# second-aligned derivation)
ORACLES["transcripts_decayed"] = f"""
WITH {_TR_BASE},
{_tr_scored("spark")},
dref AS (SELECT max(ts) AS m FROM base),
dec AS (
  SELECT t.did,
         t.score * pow(
           0.5,
           (epoch(r.m) - epoch(b.ts)) / 86400.0 / 90.0
         ) AS score
  FROM tscored t
  JOIN base b ON b.did = t.did
  CROSS JOIN dref r
)
SELECT b.conv_id, b.turn_idx, round(d.score, 4) AS score
FROM dec d JOIN base b ON b.did = d.did
ORDER BY d.score DESC, d.did
LIMIT 20
"""


def _tr_mined_member(qid: str, t1: str, t2: str) -> str:
    """One mined query: two-term OR-BM25 ranking, rank-1 excluded (it
    is the pinned positive), ranks 2..6 re-numbered 1..5."""
    return f"""
SELECT * FROM (
  WITH {_TR_BASE},
  mtf AS (SELECT did, term, count(*)::DOUBLE AS tf FROM ttok
          WHERE term IN ('{t1}', '{t2}') GROUP BY did, term),
  mdf AS (SELECT term, count(DISTINCT did)::DOUBLE AS df FROM ttok
          WHERE term IN ('{t1}', '{t2}') GROUP BY term),
  msc AS (
    SELECT mtf.did,
           sum( ln(1 + (s.n - mdf.df + 0.5) / (mdf.df + 0.5))
                * mtf.tf * 2.2
                / (mtf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) ) AS score
    FROM mtf
    JOIN mdf USING (term)
    JOIN tdl ON tdl.did = mtf.did
    CROSS JOIN tstats s
    GROUP BY mtf.did
  ),
  ranked AS (
    SELECT did, score,
           row_number() OVER (ORDER BY score DESC, did) AS rr
    FROM msc
  )
  SELECT '{qid}' AS qid, (rr - 1)::INT AS rank, b.conv_id, b.turn_idx,
         round(r.score, 4) AS score
  FROM ranked r JOIN base b ON b.did = r.did
  WHERE rr BETWEEN 2 AND 6
)"""


ORACLES["transcripts_hard_negatives"] = (
    _tr_mined_member("hj", "hash", "join")
    + "\nUNION ALL"
    + _tr_mined_member("sm", "spark", "merge")
    + "\nUNION ALL"
    + _tr_mined_member("fs", "filter", "scan")
    + "\nORDER BY qid, rank"
)

# two-phase rescore replay: primary OR-BM25 top-100 window, phrase
# secondary on those docs only, combined = primary + 2 * secondary
ORACLES["transcripts_rescored"] = f"""
WITH {_TR_BASE},
{_tr_phrase_block("hash", "join")},
rtf AS (SELECT did, term, count(*)::DOUBLE AS tf FROM ttok
        WHERE term IN ('hash', 'join') GROUP BY did, term),
rdf AS (SELECT term, count(DISTINCT did)::DOUBLE AS df FROM ttok
        WHERE term IN ('hash', 'join') GROUP BY term),
rprim AS (
  SELECT rtf.did,
         sum( ln(1 + (s.n - rdf.df + 0.5) / (rdf.df + 0.5))
              * rtf.tf * 2.2
              / (rtf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) ) AS score
  FROM rtf
  JOIN rdf USING (term)
  JOIN tdl ON tdl.did = rtf.did
  CROSS JOIN tstats s
  GROUP BY rtf.did
  ORDER BY score DESC, rtf.did
  LIMIT 100
),
rcomb AS (
  SELECT p.did, p.score + 2.0 * coalesce(ph.score, 0) AS score
  FROM rprim p LEFT JOIN pscored ph ON ph.did = p.did
)
SELECT b.conv_id, b.turn_idx, round(c.score, 4) AS score
FROM rcomb c JOIN base b ON b.did = c.did
ORDER BY c.score DESC, c.did
LIMIT 20
"""

# unordered-window replay: for TWO terms the minimal cover equals the
# minimal pairwise position distance, so the candidate set is one
# position self-join with |pi - pj| <= n_terms-1+gaps; scoring is the
# phrase arithmetic (summed per-term BM25)
ORACLES["transcripts_window_proximity"] = f"""
WITH {_TR_BASE},
wtoks AS MATERIALIZED (
  SELECT did,
         list_filter(
           list_transform(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                          x -> lower(x)),
           x -> x <> '' AND strlen(x) < 40) AS t
  FROM base
),
ph AS MATERIALIZED (
  SELECT did, unnest(list_filter(range(1, len(t) + 1),
                                 i -> t[i] = 'hash')) AS p
  FROM wtoks
),
pj AS MATERIALIZED (
  SELECT did, unnest(list_filter(range(1, len(t) + 1),
                                 i -> t[i] = 'join')) AS p
  FROM wtoks
),
wcand AS (
  SELECT DISTINCT ph.did
  FROM ph JOIN pj ON pj.did = ph.did AND abs(ph.p - pj.p) <= 3
),
wtf AS (SELECT did, term, count(*)::DOUBLE AS tf FROM ttok
        WHERE term IN ('hash', 'join') GROUP BY did, term),
wdf AS (SELECT term, count(DISTINCT did)::DOUBLE AS df FROM ttok
        WHERE term IN ('hash', 'join') GROUP BY term),
wscored AS (
  SELECT wtf.did,
         sum( ln(1 + (s.n - wdf.df + 0.5) / (wdf.df + 0.5))
              * wtf.tf * 2.2
              / (wtf.tf + 1.2 * (0.25 + 0.75 * tdl.dl / s.avgdl)) ) AS score
  FROM wtf
  JOIN wdf USING (term)
  JOIN tdl ON tdl.did = wtf.did
  JOIN wcand ON wcand.did = wtf.did
  CROSS JOIN tstats s
  GROUP BY wtf.did
)
SELECT b.conv_id, b.turn_idx, round(w.score, 4) AS score
FROM wscored w JOIN base b ON b.did = w.did
ORDER BY w.score DESC, w.did
LIMIT 20
"""

# match-set numeric stats replay: DuckDB quantile_cont (continuous /
# linear interpolation) is the same estimator as Spark's exact
# percentile(); length() counts CHARACTERS in both engines
ORACLES["transcripts_match_stats"] = f"""
WITH {_TR_BASE},
mset AS (SELECT DISTINCT did FROM ttok WHERE term = 'spark'),
vals AS (
  SELECT length(b.text)::DOUBLE AS v
  FROM base b JOIN mset USING (did)
)
SELECT count(*) AS n,
       min(v) AS min,
       max(v) AS max,
       round(avg(v), 6) AS avg,
       sum(v) AS sum,
       round(quantile_cont(v, 0.5), 6) AS p50,
       round(quantile_cont(v, 0.9), 6) AS p90,
       round(quantile_cont(v, 0.99), 6) AS p99
FROM vals
"""

# terms-agg + top_hits replay: per-role count + row_number over the
# single-term scored CTE
ORACLES["transcripts_facet_top_hits"] = f"""
WITH {_TR_BASE},
{_tr_scored("spark")},
sv AS (
  SELECT t.did, t.score, b.role AS value, b.conv_id, b.turn_idx
  FROM tscored t JOIN base b ON b.did = t.did
),
cnt AS (SELECT value, count(*) AS n_docs FROM sv GROUP BY value),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY value ORDER BY score DESC, did
  ) AS rank FROM sv
)
SELECT r.value, c.n_docs, r.rank::INT AS rank, r.conv_id, r.turn_idx,
       round(r.score, 4) AS score
FROM rk r JOIN cnt c USING (value)
WHERE r.rank <= 2
ORDER BY c.n_docs DESC, r.value, r.rank
"""


def _tr_msearch_member(qid: str, term: str) -> str:
    """One term member of the msearch union: top-10 (did, score)."""
    return f"""
SELECT * FROM (
  WITH {_TR_BASE}, {_tr_scored(term)}
  SELECT '{qid}' AS qid, t.did AS doc_id, round(t.score, 4) AS score
  FROM tscored t
  ORDER BY t.score DESC, t.did
  LIMIT 10
)"""


def _tr_msearch_phrase(qid: str, first: str, second: str) -> str:
    """One positional-phrase member of the msearch union: the shared
    phrase CTE block, projected as top-10 (qid, doc_id, score)."""
    return f"""
SELECT * FROM (
  WITH {_TR_BASE},
  {_tr_phrase_block(first, second)}
  SELECT '{qid}' AS qid, p.did AS doc_id, round(p.score, 4) AS score
  FROM pscored p
  ORDER BY p.score DESC, p.did
  LIMIT 10
)"""


ORACLES["transcripts_segment_msearch"] = (
    _tr_msearch_member("spark", "spark")
    + "\nUNION ALL"
    + _tr_msearch_member("merge", "merge")
    + "\nUNION ALL"
    + _tr_msearch_phrase('"hash join"', "hash", "join")
    + "\nORDER BY qid, score DESC, doc_id"
)


# Purge differentials: docIDs are assigned over the FULL corpus (the
# purge preserves surviving ids — the id space gains holes), while
# tokenization / document stats / df are recomputed over the SURVIVORS
# only, exactly as compact_index(drop=...) promises.
_TR_SURV = """
base AS (
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS did,
         'c' || lpad((doc_id // 20)::VARCHAR, 6, '0') AS conv_id,
         (doc_id % 20)::INT AS turn_idx,
         text
  FROM documents
),
surv AS (SELECT * FROM base WHERE did % 7 <> 3),
ttok AS (
  SELECT did, lower(raw) AS term
  FROM (SELECT did, unnest(regexp_split_to_array(text, '[^0-9A-Za-z]+')) AS raw
        FROM surv)
  WHERE raw <> '' AND strlen(raw) < 40
),
tdl AS (SELECT did, count(*)::DOUBLE AS dl FROM ttok GROUP BY did),
tstats AS (
  SELECT (SELECT count(*) FROM surv)::DOUBLE AS n,
         (SELECT count(*) FROM ttok)::DOUBLE
           / (SELECT count(*) FROM surv)::DOUBLE AS avgdl
)
"""

ORACLES["transcripts_purge_bm25"] = f"""
WITH {_TR_SURV}, {_tr_scored("merge")}
SELECT b.conv_id, b.turn_idx, round(t.score, 4) AS score, b.text
FROM tscored t JOIN surv b ON b.did = t.did
ORDER BY t.score DESC, t.did
LIMIT 20
"""

ORACLES["transcripts_purge_stats"] = f"""
WITH {_TR_SURV}
SELECT (SELECT count(*) FROM surv)::BIGINT AS n_docs,
       round((SELECT count(*) FROM ttok)::DOUBLE
             / (SELECT count(*) FROM surv), 6) AS avgdl,
       (SELECT count(*) FROM ttok)::BIGINT AS total_tokens
"""


# ---------------------------------------------------------------------------
# Corpus curation: replay the composite quality blend (whitespace
# tokens, distinct-stopword ratio, ASCII punct/digit ratios — the
# exact quality_scores arithmetic, verified bit-equal pre-round) and
# the min-id exact dedup, then compare stage counts and membership.
# ---------------------------------------------------------------------------

_CURATE_STOPS = (
    "['the','a','of','and','to','in','is','for','on','with',"
    "'that','it','you','are','this']"
)

_CURATE_BASE = rf"""
cq AS (
  SELECT doc_id, text,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
    list_transform(regexp_split_to_array(trim(text), '\s+'),
                   x -> lower(x)) AS lt,
    greatest(length(text), 1)::DOUBLE AS total,
    length(regexp_replace(text, '[^!-/:-@[-`{{-~]', '', 'g'))::DOUBLE
      AS n_punct,
    length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS n_digit
  FROM documents
),
cq2 AS (
  SELECT doc_id, text,
    round(
      least(n_tok / 64.0, 1.0) * 0.4
      + least(
          (len(list_filter(list_distinct(lt),
               x -> list_contains({_CURATE_STOPS}, x)))::DOUBLE
           / greatest(len(list_distinct(lt)), 1)) * 3.0, 1.0) * 0.3
      + (1.0 - least((n_punct / total) * 4.0, 1.0)) * 0.2
      + (1.0 - least((n_digit / total) * 4.0, 1.0)) * 0.1,
    6) AS quality
  FROM cq
),
cgate AS (SELECT doc_id, text FROM cq2 WHERE quality >= 0.6),
ckeep AS (SELECT min(doc_id) AS doc_id FROM cgate GROUP BY text)
"""

ORACLES["curate_report"] = f"""
WITH {_CURATE_BASE}
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_input,
       ((SELECT count(*) FROM documents)
        - (SELECT count(*) FROM cgate))::BIGINT AS n_quality_dropped,
       ((SELECT count(*) FROM cgate)
        - (SELECT count(*) FROM ckeep))::BIGINT AS n_dup_dropped,
       (SELECT count(*) FROM ckeep)::BIGINT AS n_kept
"""

ORACLES["curate_kept_sample"] = f"""
WITH {_CURATE_BASE}
SELECT doc_id FROM ckeep ORDER BY doc_id LIMIT 20
"""


# 13-gram decontamination (ops/decontam.py): corpus = doc_id % 7 != 0,
# held-out ref = doc_id % 7 == 0; a corpus doc sharing any distinct
# 13-token-gram with the ref set is contaminated. Exact replay: same
# split class, same byte-length filter, same space-joined gram key.
_DECONTAM_BASE = """
dtoks AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                          x -> lower(x)),
           x -> x <> '' AND strlen(x) < 40) AS t
  FROM documents
),
dgrams AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 11),
                                 i -> array_to_string(t[i:i+12], ' ')))
             AS gram
    FROM dtoks WHERE len(t) >= 13
  )
),
dref AS (SELECT DISTINCT gram FROM dgrams WHERE doc_id % 7 = 0),
dhits AS (
  SELECT g.doc_id, count(*)::BIGINT AS n_overlap
  FROM dgrams g JOIN dref USING (gram)
  WHERE g.doc_id % 7 <> 0
  GROUP BY g.doc_id
)
"""

ORACLES["decontam_overlap"] = f"""
WITH {_DECONTAM_BASE}
SELECT doc_id, n_overlap FROM dhits
ORDER BY n_overlap DESC, doc_id
LIMIT 50
"""

ORACLES["decontam_report"] = f"""
WITH {_DECONTAM_BASE}
SELECT (SELECT count(*) FROM documents WHERE doc_id % 7 <> 0)::BIGINT
         AS n_corpus,
       (SELECT count(*) FROM dhits)::BIGINT AS n_flagged,
       (SELECT count(*) FROM documents
        WHERE doc_id % 7 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM dhits))::BIGINT AS n_kept,
       (SELECT sum(doc_id) FROM documents
        WHERE doc_id % 7 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM dhits))::BIGINT
         AS kept_id_sum
"""

# ---------------------------------------------------------------------------
# Pipeline ops round 3: PII redaction / repetition / mixture sampling /
# sequence packing — exact replays of ops/pipeline.py. The PII and
# repetition statements derive the SAME doc_id-seeded augmented text
# the Spark entries build (entry_queries._pii_augmented etc.), then
# recompute the op in pure SQL. Patterns are injected from the single
# source of truth in ops/pipeline.py (Java and RE2 agree on this
# char-class subset; no \b, no lookaround).
# ---------------------------------------------------------------------------

from xf_spark.ops.pipeline import (  # noqa: E402
    PII_EMAIL,
    PII_IPV4,
    PII_LONG_DIGITS,
    PII_PHONE,
)

_PII_AUG = """
aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' email user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' ip 10.' || (doc_id % 200) || '.0.' || (doc_id % 250)
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 415-555-' || (1000 + doc_id % 9000) ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' acct 90210' || doc_id || '1234' ELSE '' END
           AS t
  FROM documents WHERE doc_id < 30
)
"""

ORACLES["pii_redact_stats"] = f"""
WITH {_PII_AUG},
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{PII_EMAIL}'))::BIGINT AS n_emails,
         regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g') AS t
  FROM aug
),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t, '{PII_IPV4}'))::BIGINT AS n_ips,
         regexp_replace(t, '{PII_IPV4}', '<IP>', 'g') AS t
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_ips,
         len(regexp_extract_all(t, '{PII_PHONE}'))::BIGINT AS n_phones,
         regexp_replace(t, '{PII_PHONE}', '<PHONE>', 'g') AS t
  FROM s2
),
s4 AS (
  SELECT doc_id, n_emails, n_ips, n_phones,
         len(regexp_extract_all(t, '{PII_LONG_DIGITS}'))::BIGINT AS n_long_ids,
         regexp_replace(t, '{PII_LONG_DIGITS}', '<ID>', 'g') AS t
  FROM s3
)
SELECT doc_id, n_emails, n_ips, n_phones, n_long_ids, t AS clean_text
FROM s4 ORDER BY doc_id
"""

ORACLES["repetition_report"] = r"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 6 = 0
                 THEN chr(10) || 'repeat me' || chr(10) || 'repeat me'
                      || chr(10) || 'repeat me' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' spark spark spark spark' ELSE '' END
           AS t
  FROM documents WHERE doc_id < 40
),
l AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)),
                     x -> x <> '') AS ls
  FROM aug
),
lf AS (
  SELECT doc_id,
         CASE WHEN len(ls) = 0 THEN 0.0
              ELSE (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls)
         END AS dup_line_frac
  FROM l
),
tk AS (
  SELECT doc_id, regexp_split_to_array(trim(t), '\s+') AS w
  FROM aug WHERE length(trim(t)) > 0
),
g AS (SELECT doc_id, unnest(range(len(w) - 1)) AS i, w FROM tk WHERE len(w) >= 2),
g2 AS (
  SELECT doc_id, w[i + 1] || ' ' || w[i + 2] AS gram, len(w) - 1 AS n_grams
  FROM g
),
c AS (SELECT doc_id, n_grams, gram, count(*) AS c FROM g2 GROUP BY 1, 2, 3),
m AS (
  SELECT doc_id, max(c)::DOUBLE / n_grams AS tb FROM c GROUP BY doc_id, n_grams
)
SELECT lf.doc_id,
       round(dup_line_frac, 6) AS dup_line_frac,
       round(coalesce(m.tb, 0.0), 6) AS top_bigram_frac
FROM lf LEFT JOIN m ON lf.doc_id = m.doc_id
ORDER BY lf.doc_id
"""

ORACLES["mixture_sample_report"] = """
WITH kept AS (
  SELECT lang, doc_id FROM documents
  WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 10000 <
        CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 6000 ELSE 10000 END
),
i AS (SELECT lang, count(*)::BIGINT AS n_in FROM documents GROUP BY lang),
k AS (
  SELECT lang, count(*)::BIGINT AS n_kept, sum(doc_id)::BIGINT AS kept_id_sum
  FROM kept GROUP BY lang
)
SELECT i.lang, n_in,
       coalesce(n_kept, 0)::BIGINT AS n_kept,
       coalesce(kept_id_sum, 0)::BIGINT AS kept_id_sum
FROM i LEFT JOIN k USING (lang)
ORDER BY i.lang
"""

# ExactSubstr-style duplicated-window differential (Lee et al. 2022):
# same window construction as the Spark op (20-token windows over
# lowercased ws tokens, md5 content hash), corpus-wide >= 2 occurrence
# cut, per-doc span union via the lag-gap identity
# |union| = win + sum(min(win, gap)).
ORACLES["dup_span_report"] = r"""
WITH tk AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS w
  FROM documents
),
win AS (
  SELECT doc_id, i AS pos, md5(array_to_string(w[i + 1:i + 20], ' ')) AS h
  FROM (SELECT doc_id, unnest(range(len(w) - 19)) AS i, w
        FROM tk WHERE len(w) >= 20)
),
hot AS (SELECT h FROM win GROUP BY h HAVING count(*) >= 2),
d AS (SELECT win.doc_id, pos FROM win JOIN hot USING (h)),
gaps AS (
  SELECT doc_id, pos,
         pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS gap
  FROM d
),
cov AS (
  SELECT doc_id, count(*)::BIGINT AS n_dup_windows,
         sum(CASE WHEN gap IS NULL THEN 20 ELSE least(20, gap) END)::BIGINT
           AS dup_tokens
  FROM gaps GROUP BY doc_id
)
SELECT tk.doc_id, len(tk.w)::BIGINT AS n_tokens,
       coalesce(cov.n_dup_windows, 0)::BIGINT AS n_dup_windows,
       coalesce(cov.dup_tokens, 0)::BIGINT AS dup_tokens,
       round(coalesce(cov.dup_tokens, 0)
             / greatest(len(tk.w), 1), 6) AS dup_frac
FROM tk LEFT JOIN cov USING (doc_id)
ORDER BY tk.doc_id
"""

# ExactSubstr cut differential: same hot-window detection as
# dup_span_report, then the covered-position union (window start + 20
# offsets, DISTINCT) anti-joins the token positions and the survivors
# re-join order-preserving via string_agg ORDER BY i. Tokens keep
# their original case; only the window HASH is lowercased.
ORACLES["dup_span_excise"] = r"""
WITH tk AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS w
  FROM documents
),
win AS (
  SELECT doc_id, i AS pos,
         md5(lower(array_to_string(w[i + 1:i + 20], ' '))) AS h
  FROM (SELECT doc_id, unnest(range(len(w) - 19)) AS i, w
        FROM tk WHERE len(w) >= 20)
),
hot AS (SELECT h FROM win GROUP BY h HAVING count(*) >= 2),
d AS (SELECT win.doc_id, pos FROM win JOIN hot USING (h)),
cov AS (
  SELECT DISTINCT doc_id, pos + r AS i
  FROM (SELECT doc_id, pos, unnest(range(20)) AS r FROM d)
),
tokpos AS (SELECT doc_id, unnest(range(len(w))) AS i, w FROM tk),
kept AS (
  SELECT doc_id, i, w[i + 1] AS tok
  FROM tokpos ANTI JOIN cov USING (doc_id, i)
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(tok, ' ' ORDER BY i) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT tk.doc_id, len(tk.w)::BIGINT AS n_tokens,
       coalesce(agg.n_kept, 0)::BIGINT AS n_kept,
       coalesce(agg.text_clean, '') AS text_clean
FROM tk LEFT JOIN agg USING (doc_id)
ORDER BY tk.doc_id
"""

# DSIR (Xie et al. 2023) differential: hashed unigram+bigram bucket
# distributions (target = sources 0-2 vs raw = all), Laplace-smoothed
# log ratios, per-doc log-weight sums, and the Gumbel-top-k selection
# key — every stage replayed (same md5 bucket hash as mixture_sample,
# same bigram construction as the repetition oracle).
_DSIR_BASE = r"""
tk AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS w
  FROM documents
),
uni AS (SELECT doc_id, source, unnest(w) AS gram FROM tk),
bi AS (
  SELECT doc_id, source, w[i + 1] || ' ' || w[i + 2] AS gram
  FROM (SELECT doc_id, source, unnest(range(len(w) - 1)) AS i, w
        FROM tk WHERE len(w) >= 2)
),
g AS (
  SELECT doc_id, source, gram FROM uni
  UNION ALL
  SELECT doc_id, source, gram FROM bi
),
gb AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(gram), 1, 8))::BIGINT % 1024 AS bucket
  FROM g
),
agg AS (
  SELECT bucket,
         sum(CASE WHEN source IN ('src0', 'src1', 'src2')
                  THEN 1 ELSE 0 END)::BIGINT AS ct,
         count(*)::BIGINT AS cq
  FROM gb GROUP BY bucket
),
tot AS (
  SELECT sum(ct)::DOUBLE + 1024 AS nt, sum(cq)::DOUBLE + 1024 AS nq
  FROM agg
),
lr AS (
  SELECT bucket, ln((ct + 1) / nt) - ln((cq + 1) / nq) AS log_ratio
  FROM agg, tot
),
dw AS (
  SELECT gb.doc_id, count(*)::BIGINT AS n_grams,
         round(sum(lr.log_ratio), 6) AS log_w
  FROM gb JOIN lr USING (bucket) GROUP BY gb.doc_id
)
"""

ORACLES["dsir_weights_top"] = f"""
WITH {_DSIR_BASE}
SELECT doc_id, n_grams, log_w FROM dw
ORDER BY log_w DESC, doc_id LIMIT 20
"""

ORACLES["dsir_sample_top"] = f"""
WITH {_DSIR_BASE},
u AS (
  SELECT doc_id,
         (('0x' || substr(md5('dsir' || doc_id::VARCHAR), 1, 8))::BIGINT
          + 0.5) / 4294967296.0 AS u
  FROM dw
),
keyed AS (
  SELECT dw.doc_id, dw.n_grams, dw.log_w,
         round(dw.log_w + -ln(-ln(u.u)), 6) AS gumbel_key
  FROM dw JOIN u USING (doc_id)
)
SELECT doc_id, n_grams, log_w, gumbel_key FROM keyed
ORDER BY gumbel_key DESC, doc_id LIMIT 20
"""

_PACK_BASE = r"""
ptok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+'))
         END::BIGINT AS n_ws_tokens
  FROM documents
),
pcum AS (
  SELECT doc_id, n_ws_tokens,
         coalesce(sum(n_ws_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS start_off
  FROM ptok
),
pspan AS (
  SELECT doc_id, n_ws_tokens, start_off,
         (start_off // 512)::BIGINT AS chunk_first,
         ((start_off + greatest(n_ws_tokens, 1) - 1) // 512)::BIGINT AS chunk_last
  FROM pcum
)
"""

ORACLES["pack_chunks_sample"] = f"""
WITH {_PACK_BASE}
SELECT doc_id, n_ws_tokens, start_off, chunk_first, chunk_last
FROM pspan WHERE doc_id < 20 ORDER BY doc_id
"""

ORACLES["pack_chunks_stats"] = f"""
WITH {_PACK_BASE}
SELECT count(*)::BIGINT AS n_docs,
       coalesce(sum(n_ws_tokens), 0)::BIGINT AS n_tokens,
       coalesce(sum(CASE WHEN chunk_last > chunk_first THEN 1 ELSE 0 END), 0)::BIGINT
         AS n_straddling,
       (CASE WHEN sum(n_ws_tokens) > 0
             THEN (sum(n_ws_tokens) + 511) // 512 ELSE 0 END)::BIGINT AS n_chunks,
       CASE WHEN sum(n_ws_tokens) > 0
            THEN round((sum(n_ws_tokens)
                        - (((sum(n_ws_tokens) + 511) // 512) - 1) * 512)::DOUBLE
                       / 512, 6)
            ELSE 0.0 END AS last_fill
FROM pspan
"""

ORACLES["chunk_split_sample"] = r"""
WITH ctk AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
  FROM documents WHERE doc_id < 10 AND length(trim(text)) > 0
),
cn AS (
  SELECT doc_id, w,
         CASE WHEN len(w) <= 32 THEN 1
              ELSE 1 + (len(w) - 32 + 24 - 1) // 24 END AS n_chunks
  FROM ctk
),
ce AS (SELECT doc_id, w, unnest(range(n_chunks)) AS chunk_idx FROM cn)
SELECT doc_id, chunk_idx::INT AS chunk_idx,
       len(w[chunk_idx * 24 + 1 : chunk_idx * 24 + 32])::INT AS n_chunk_tokens,
       array_to_string(w[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ')
         AS chunk_text
FROM ce ORDER BY doc_id, chunk_idx
"""

ORACLES["unigram_logprob_sample"] = r"""
WITH ut AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
),
f AS (SELECT tok, count(*) AS c FROM ut GROUP BY tok),
n AS (SELECT count(*)::DOUBLE AS nn FROM ut)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(avg(ln(c / nn)), 6) AS avg_logprob
FROM ut JOIN f USING (tok) CROSS JOIN n
WHERE doc_id < 25
GROUP BY doc_id
ORDER BY doc_id
"""

# train/val split replay: same md5(seed||conv_id) 4-hex-char cut
# (val_frac=0.25 -> cut '4000'), same conv derivation as _TR_BASE
ORACLES["split_report"] = f"""
WITH {_TR_BASE}
SELECT CASE WHEN substr(md5('xfsplit' || conv_id), 1, 4) < '4000'
            THEN 'val' ELSE 'train' END AS split,
       count(*) AS n_turns,
       count(DISTINCT conv_id) AS n_convs
FROM base
GROUP BY 1
ORDER BY split
"""

# chat rendering replay: string_agg in turn order, same separators
ORACLES["sft_render_sample"] = f"""
WITH {_TR_BASE}
SELECT conv_id,
       count(*) AS n_turns,
       string_agg(role || ': ' || text, e'\n\n' ORDER BY turn_idx)
         AS rendered
FROM base
GROUP BY conv_id
ORDER BY conv_id
LIMIT 10
"""

# ---------------------------------------------------------------------------
# Rule-based quality filters: Gopher rules + C4 line cleanup
# ---------------------------------------------------------------------------

# the deterministic augmentation shared by both entries (mirrors
# entry_queries._quality_augmented exactly, chr(10) = \n)
_QUALITY_AUG = """aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' lorem ipsum' ELSE '' END
         || chr(10) || 'This is a good long sentence for keeps.'
         || CASE WHEN doc_id % 2 = 0
                 THEN chr(10) || 'Another solid sentence stays here too!'
                 ELSE '' END
         || CASE WHEN doc_id % 3 = 0
                 THEN chr(10) || 'short line.' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN chr(10) || 'Please enable javascript to view this page.'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN chr(10) || 'A config block { appears inside this sentence.'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN chr(10) || '- bullet item' || chr(10) || '- another bullet'
                 ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN chr(10) || 'this trails off into silence...' ELSE '' END
         || CASE WHEN doc_id % 9 = 0 THEN ' ## ## anchor…' ELSE '' END
         || CASE WHEN doc_id % 8 = 0
                 THEN ' to be of and that have with' ELSE '' END
           AS t
  FROM documents WHERE doc_id < 40
)"""

ORACLES["gopher_report"] = r"""
WITH __AUG__,
tk AS (
  SELECT doc_id,
         CASE WHEN length(trim(t)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(t), '\s+') END AS w,
         list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)),
                     x -> x <> '') AS ls
  FROM aug
),
sig AS (
  SELECT doc_id,
         len(w)::BIGINT AS n_words,
         round(coalesce(list_sum(list_transform(w, x -> length(x))), 0)::DOUBLE
               / greatest(len(w), 1), 6) AS mean_word_len,
         round(len(list_filter(w, x -> contains(x, '#')
                                    or contains(x, '...')
                                    or contains(x, '…')))::DOUBLE
               / greatest(len(w), 1), 6) AS symbol_frac,
         round(len(list_filter(ls, x -> substring(x, 1, 1) in ('-', '*', '•')))::DOUBLE
               / greatest(len(ls), 1), 6) AS bullet_frac,
         round(len(list_filter(ls, x -> right(x, 3) = '...'
                                     or right(x, 1) = '…'))::DOUBLE
               / greatest(len(ls), 1), 6) AS ellipsis_frac,
         round(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
               / greatest(len(w), 1), 6) AS alpha_frac,
         len(list_intersect(
               list_distinct(list_transform(w, x -> lower(x))),
               ['the','be','to','of','and','that','have','with']))::BIGINT
           AS n_stop_hits
  FROM tk
)
SELECT doc_id, n_words, mean_word_len, symbol_frac, bullet_frac,
       ellipsis_frac, alpha_frac, n_stop_hits,
       (n_words >= 20 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_frac <= 0.1 AND bullet_frac <= 0.9
        AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
        AND n_stop_hits >= 2)::BIGINT AS keep
FROM sig ORDER BY doc_id
""".replace("__AUG__", _QUALITY_AUG)

ORACLES["c4_filter_report"] = r"""
WITH __AUG__,
l AS (
  SELECT doc_id, lower(t) AS lt,
         list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)),
                     x -> x <> '') AS ls
  FROM aug
),
k AS (
  SELECT doc_id, lt, ls,
         list_filter(ls, x ->
             right(x, 1) in ('.', '!', '?', '"')
             and len(regexp_split_to_array(x, '\s+')) >= 5
             and not contains(lower(x), 'javascript')) AS kept
  FROM l
)
SELECT doc_id,
       len(ls)::BIGINT AS n_lines,
       len(kept)::BIGINT AS n_kept_lines,
       (len(kept) >= 2 AND NOT contains(lt, 'lorem ipsum')
        AND NOT contains(lt, '{'))::BIGINT AS keep,
       array_to_string(kept, chr(10)) AS clean_text
FROM k ORDER BY doc_id
""".replace("__AUG__", _QUALITY_AUG)

# ---------------------------------------------------------------------------
# Iceberg table layer (write -> commit -> read back must equal source)
# ---------------------------------------------------------------------------

ORACLES["iceberg_roundtrip"] = """
SELECT doc_id, text, lang, source
FROM documents WHERE doc_id < 60 ORDER BY doc_id
"""

ORACLES["iceberg_time_travel"] = """
SELECT doc_id, text, lang, source
FROM documents WHERE doc_id < 40 ORDER BY doc_id
"""

ORACLES["iceberg_partition_prune"] = """
SELECT lang, source,
       count(*)::BIGINT AS n_docs,
       sum(length(text))::BIGINT AS sum_chars
FROM documents
WHERE doc_id < 60 AND lang = 'en'
GROUP BY lang, source
ORDER BY lang, source
"""

# ---------------------------------------------------------------------------
# Facet aggregation + field collapsing + keyword extraction (round 3)
# ---------------------------------------------------------------------------

# Facet counts = membership (not top-k) per facet value: count each
# doc once however many times the term occurs.
ORACLES["transcripts_facet_role"] = f"""
WITH {_TR_BASE}
SELECT b.role AS value, count(DISTINCT t.did) AS n_docs
FROM ttok t JOIN base b ON b.did = t.did
WHERE t.term = 'spark'
GROUP BY b.role
ORDER BY n_docs DESC, value
"""

# Date-histogram facet over the phrase candidates (adjacency replay).
ORACLES["transcripts_facet_day"] = f"""
WITH {_TR_BASE},
{_tr_phrase_block("hash", "join")}
SELECT strftime(b.ts, '%Y-%m-%d') AS value, count(*) AS n_docs
FROM pcand JOIN base b ON b.did = pcand.did
GROUP BY 1
ORDER BY n_docs DESC, value
"""

# Field collapsing: best scored turn per conversation, top-10 convs
# ranked by their best hit (score desc, did asc everywhere).
ORACLES["transcripts_collapse_best"] = f"""
WITH {_TR_BASE}, {_tr_scored("merge")},
best AS (
  SELECT b.conv_id, b.turn_idx, t.score, t.did,
         row_number() OVER (
           PARTITION BY b.conv_id ORDER BY t.score DESC, t.did
         ) AS rn
  FROM tscored t JOIN base b ON b.did = t.did
)
SELECT conv_id, turn_idx, round(score, 4) AS score
FROM best WHERE rn = 1
ORDER BY score DESC, did
LIMIT 10
"""

# Smooth tf-idf keyword extraction: rank on the 6-dp-rounded score
# (the engine does the same — cross-engine double log arithmetic can
# differ in the last ulp; rounding pins the ordering).
ORACLES["tfidf_keywords_top"] = f"""
WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
       FROM tok GROUP BY doc_id, term),
idf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM tok GROUP BY term),
nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * (ln((1 + nn.n) / (1 + idf.df)) + 1), 6) AS tfidf
  FROM tf JOIN idf USING (term) CROSS JOIN nn
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, term
         ) AS rn
  FROM scored
)
SELECT doc_id, term, tfidf, rn::INT AS kw_rank
FROM ranked WHERE rn <= 3 AND doc_id < 20
ORDER BY doc_id, kw_rank
"""

# Match-set count: membership (count each matching doc once).
ORACLES["transcripts_count_assistant"] = f"""
WITH {_TR_BASE}
SELECT count(DISTINCT t.did)::BIGINT AS n_matches
FROM ttok t JOIN base b ON b.did = t.did
WHERE t.term = 'spark' AND b.role = 'assistant'
"""

# Cursor pagination == OFFSET under a deterministic total order.
ORACLES["transcripts_search_after_page2"] = f"""
WITH {_TR_BASE}, {_tr_scored("spark")}
SELECT b.conv_id, b.turn_idx, round(t.score, 4) AS score
FROM tscored t JOIN base b ON b.did = t.did
ORDER BY t.score DESC, t.did
LIMIT 10 OFFSET 10
"""

# Significant terms: foreground = per-term distinct-doc counts inside
# the match set, background = corpus df; lift ranked on the rounded
# value (term asc tiebreak) on both sides.
ORACLES["transcripts_significant_terms"] = f"""
WITH {_TR_BASE},
matched AS (SELECT DISTINCT did FROM ttok WHERE term = 'merge'),
tot AS (SELECT count(*)::DOUBLE AS m FROM matched),
fg AS (
  SELECT t.term, count(DISTINCT t.did)::BIGINT AS n_match
  FROM ttok t JOIN matched USING (did)
  GROUP BY t.term
),
bg AS (SELECT term, count(DISTINCT did)::BIGINT AS df FROM ttok GROUP BY term)
SELECT fg.term, fg.n_match, bg.df,
       round((fg.n_match / tot.m) / (bg.df / s.n), 6) AS lift
FROM fg JOIN bg USING (term) CROSS JOIN tot CROSS JOIN tstats s
WHERE fg.n_match >= 3
ORDER BY lift DESC, fg.term
LIMIT 15
"""

# Did-you-mean: highest-df (df desc, term asc) edit-distance-1 vocab
# neighbor of the misspelled term, substituted into the query string.
ORACLES["transcripts_suggest"] = f"""
WITH {_TR_BASE},
vocab AS (SELECT term, count(DISTINCT did) AS df FROM ttok GROUP BY term),
best AS (
  SELECT term FROM vocab
  WHERE levenshtein(term, 'sparl') <= 1
  ORDER BY df DESC, term
  LIMIT 1
)
SELECT replace('sparl AND merge', 'sparl', (SELECT term FROM best))
       AS suggestion
"""

# Multi-facet: one matched set, two groupings, UNION ALL.
ORACLES["transcripts_facets_multi"] = f"""
WITH {_TR_BASE},
matched AS (SELECT DISTINCT did FROM ttok WHERE term = 'spark')
SELECT 'role' AS facet, b.role AS value, count(*) AS n_docs
FROM matched JOIN base b ON b.did = matched.did
GROUP BY b.role
UNION ALL
SELECT 'date:year' AS facet, strftime(b.ts, '%Y') AS value,
       count(*) AS n_docs
FROM matched JOIN base b ON b.did = matched.did
GROUP BY strftime(b.ts, '%Y')
"""
