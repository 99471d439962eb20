"""Deduplication operators for large-scale training-data pipelines.

Every operator is shaped for 100 TB: hash digests and signatures move
through shuffles, never document bodies; candidate generation is
always bucket-join (LSH bands / simhash sub-bands / shingle join) —
no O(n^2) cross products anywhere.

All hashing is cross-engine deterministic (md5-derived integers), so
each operator has an exact DuckDB oracle in the driver contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from xf_spark.functions.textcore import tokenize

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each distinct text.

    Plan: sha2 digest -> groupBy(digest) min(id) -> semi join back.
    Only 32-byte digests shuffle; document bodies stay put."""
    hashed = docs.withColumn("_h", F.sha2(F.col(text_col), 256))
    keep = hashed.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return (
        hashed.join(keep, [id_col, "_h"], "left_semi").drop("_h")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

N_HASHES = 32
N_BANDS = 8  # 8 bands x 4 rows: catches jaccard >~ 0.6 w.h.p.
_MERSENNE = (1 << 61) - 1
# fixed affine coefficients, seed 42 — deterministic across engines.
# Bounded < 2^31 so a*x (x < 2^32) never overflows int64: the exact
# same arithmetic is reproducible in DuckDB BIGINT for the oracle.
_rng = np.random.default_rng(42)
MINHASH_A = _rng.integers(1, 1 << 31, size=N_HASHES, dtype=np.int64)
MINHASH_B = _rng.integers(0, 1 << 31, size=N_HASHES, dtype=np.int64)


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = tokenize(text or "")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _shingle_int(s: str) -> int:
    """First 8 md5 hex chars -> int32-range integer (cross-engine
    reproducible in DuckDB: ``md5(s)[1:8]::...``)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def minhash_signature(text: str) -> list[int]:
    sh = _shingles(text)
    if not sh:
        return [int(_MERSENNE)] * N_HASHES
    vals = np.array([_shingle_int(s) for s in sh], dtype=np.int64)
    # (a*x + b) mod mersenne, rowwise min
    sigs = (MINHASH_A[:, None] * vals[None, :] + MINHASH_B[:, None]) % _MERSENNE
    return sigs.min(axis=1).astype(np.int64).tolist()


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash_udf(texts: pd.Series) -> pd.Series:
    return texts.map(minhash_signature)


# A bucket larger than this is excluded from ANY LSH self-join: an
# m-doc bucket yields ~m^2/2 join rows, and boilerplate-heavy corpora
# (the norm in training data) put millions of near-identical docs in
# one digest — quadratic without the cap. Docs above the cap are
# better handled by exact_dedup first (identical text ==> identical
# digest); the cap is mirrored verbatim in the DuckDB oracles of all
# three LSH families (minhash bands, simhash blocks, hyperplane
# sketches).
LSH_MAX_BUCKET = 2000


def _cap_hot_buckets(
    df: DataFrame,
    keys: list[str],
    max_bucket: int | None,
    log_dropped: bool,
    family: str,
) -> DataFrame:
    """Drop rows in buckets with > ``max_bucket`` members before a
    bucket self-join — the shared quadratic-blowup guard for every LSH
    candidate generator. Hot buckets are FEW by construction (each
    holds > max_bucket rows), so the exclusion is a broadcast
    anti-join: no extra shuffle of ``df``. ``log_dropped`` counts the
    dropped mass (one small agg job) and warns — recall loss must be
    visible, not silent."""
    if not max_bucket:
        return df
    hot = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > max_bucket)
    )
    if log_dropped:
        import logging

        # persist the (tiny) hot set so the dropped-mass agg below does
        # not re-evaluate `df` — whose lineage holds the expensive
        # signature UDF — a second time; the anti-join broadcast then
        # reuses the materialized rows
        hot = hot.persist()
        row = hot.agg(
            F.count("*").alias("buckets"), F.sum("_n").alias("rows")
        ).first()
        if row["buckets"]:
            logging.getLogger(__name__).warning(
                "%s: dropping %d hot buckets (%d rows > cap %d) — "
                "run exact_dedup first to collapse identical texts",
                family, row["buckets"], row["rows"], max_bucket,
            )
    return df.join(F.broadcast(hot.select(*keys)), keys, "left_anti")


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = LSH_MAX_BUCKET,
    log_dropped: bool = True,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH.

    shingle -> minhash (vectorized UDF) -> band digests -> explode ->
    hot-bucket cap -> self-join on (band, digest) -> distinct pairs
    (id_a < id_b). Buckets above ``max_bucket`` are dropped before the
    join (quadratic blowup guard) and the dropped mass is LOGGED by
    default — candidates inside dropped buckets are not exhaustive;
    pass max_bucket=None for exact (quadratic-risk) behavior."""
    rows_per_band = N_HASHES // N_BANDS
    # docs with NO shingles (< n tokens) carry the sentinel signature
    # [mersenne]*k — they cannot be near-dups by Jaccard (undefined /
    # 0-denominator) and would otherwise all collide into one bucket;
    # the DuckDB oracle excludes them structurally (no shingle rows),
    # so the engine must too. Any real shingle makes sig[0] < mersenne.
    sig = docs.select(id_col, minhash_udf(F.col(text_col)).alias("sig")).where(
        F.element_at("sig", 1) != F.lit(int(_MERSENNE))
    )
    # band digest = comma-joined signature slice (engine-portable: the
    # DuckDB oracle reproduces it with string_agg ORDER BY i)
    bands = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast(
                                    "string"
                                )
                                for r in range(rows_per_band)
                            ],
                        ).alias("digest"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bd"),
    ).select(id_col, "bd.band", "bd.digest")
    bands = _cap_hot_buckets(
        bands, ["band", "digest"], max_bucket, log_dropped, "minhash_lsh"
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.digest") == F.col("b.digest"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard (computed on
    the candidate pairs only — the expensive step touches candidates,
    not the corpus).

    Inherits the LSH_MAX_BUCKET hot-bucket cap: pairs inside dropped
    hyper-popular buckets are NOT emitted (logged by the candidate
    stage); run exact_dedup first so identical texts never reach
    near-dup detection."""
    cand = minhash_lsh_candidates(docs, text_col, id_col)
    sh = docs.select(
        F.col(id_col),
        F.array_distinct(shingles_udf(F.col(text_col))).alias("sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def shingles_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: sorted(_shingles(t)))


# ---------------------------------------------------------------------------
# Cluster-level dedup: connected components -> keep/drop decision
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Undirected edge list -> (node, comp) where comp is the MIN node
    id in the node's connected component.

    Iterative min-label propagation with pointer jumping: each round
    (1) every node takes the min label over itself and its neighbors,
    (2) labels compress through themselves (comp <- comp[comp]), so
    convergence is O(log n) rounds, not O(diameter). Per round only
    (node, comp) long pairs shuffle — never document bodies — and the
    lineage is truncated with localCheckpoint so the plan stays flat
    across iterations. Terminates at fixpoint (checked with one count
    per round) or ``max_rounds``.

    This is the scale-safe contract for near-dup output: "pairs" are
    inherently quadratic inside a duplicate class, while components
    are linear (reference analog: the embed-dedup reuse chain,
    lib.rs:290-425, which reuses ONE representative per duplicate
    group)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(
        F.col("src").alias("node"), F.col("src").alias("comp")
    ).distinct()
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("comp").alias("dcomp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dcomp").alias("nbr"))
            .withColumnRenamed("src", "node")
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("nbr", F.col("comp"))).alias(
                "comp"
            ),
        )
        # pointer jumping: comp <- comp[comp] (labels are node ids, so
        # the label table doubles as the pointer table)
        jumped = (
            stepped.join(
                stepped.select(
                    F.col("node").alias("comp"), F.col("comp").alias("cc")
                ),
                "comp",
                "left",
            )
            .select(
                "node", F.coalesce("cc", F.col("comp")).alias("comp")
            )
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


def near_dup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    priority_col: str | None = None,
) -> DataFrame:
    """The keep/drop decision a training-data pipeline actually needs:
    one row per doc, (doc_id, keep_id); docs in no pair keep
    themselves. ``pairs`` is any verified candidate-pair frame
    (minhash_dedup_pairs / simhash_candidates /
    embedding_near_dup_pairs) — all of them are hot-bucket capped, so
    the component graph is linear in the corpus.

    Representative policy: with ``priority_col=None``, keep_id = min
    doc id of the component (stable default). With a ``priority_col``
    (a numeric column on ``docs`` — token count, quality score, source
    rank), keep_id = the component member with the HIGHEST priority,
    ties broken by min id — "keep the longest/best copy", the policy
    production dedup actually ships. The rep selection is one extra
    groupBy over (component, priority) longs.

    Drop policy: keep rows WHERE doc_id == keep_id."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    base = docs.select(id_col).join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    )
    if priority_col is None:
        return base.select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("keep_id"),
        ).orderBy(id_col)
    prio = docs.select(
        F.col(id_col), F.col(priority_col).cast("double").alias("_p")
    )
    # per component: min over (-priority, id) == max priority, min id
    rep = (
        base.where(F.col("comp").isNotNull())
        .join(prio, id_col)
        .groupBy("comp")
        .agg(
            F.min(
                F.struct((-F.col("_p")).alias("np"), F.col(id_col).alias("i"))
            ).alias("best")
        )
        .select("comp", F.col("best.i").alias("_keep"))
    )
    return (
        base.join(rep, "comp", "left")
        .select(
            F.col(id_col),
            F.coalesce("_keep", F.col(id_col)).alias("keep_id"),
        )
        .orderBy(id_col)
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64


def simhash(text: str) -> int:
    """64-bit SimHash over tokens (md5-derived token hashes) — the
    scalar reference implementation (differential twin of
    simhash_batch; the batch path serves the UDF)."""
    import hashlib

    toks = tokenize(text or "")
    if not toks:
        return 0
    acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
    for t in toks:
        h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
        bits = (h >> np.arange(SIMHASH_BITS, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(SIMHASH_BITS):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out  # signed int64


_BIT_RANGE = np.arange(SIMHASH_BITS, dtype=np.uint64)
_BIT_POW = (np.uint64(1) << _BIT_RANGE).astype(np.uint64)


def _token_pm(token: str, _cache: dict = {}) -> np.ndarray:
    """Memoized token -> ±1 int64[64] contribution (one md5 per UNIQUE
    token process-wide; the vocabulary is Zipfian, so the hot path is
    a dict hit — same memoization as hash_embed._token_idx_sign)."""
    hit = _cache.get(token)
    if hit is None:
        import hashlib

        h = np.uint64(int(hashlib.md5(token.encode("utf-8")).hexdigest()[:16], 16))
        hit = np.where((h >> _BIT_RANGE) & np.uint64(1), 1, -1).astype(np.int64)
        if len(_cache) < 2_000_000:
            _cache[token] = hit
    return hit


def simhash_batch(texts: list[str]) -> np.ndarray:
    """Vectorized SimHash -> int64[n]; identical output to simhash()
    per row (tested). Per doc: Counter-weighted sum of memoized ±1
    bit vectors, then one packbits-style reduction — no per-token
    64-element work beyond a cached lookup and one fused add."""
    from collections import Counter

    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = tokenize(t or "")
        if not toks:
            out[i] = 0
            continue
        counts = Counter(toks)
        mat = np.stack([_token_pm(tok) for tok in counts])
        w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
        acc = w @ mat
        val = np.uint64(np.sum(_BIT_POW[acc > 0], dtype=np.uint64))
        out[i] = np.int64(val.astype(np.int64))
    return out


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return pd.Series(simhash_batch(texts.tolist()))


def simhash_candidates(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = LSH_MAX_BUCKET,
    log_dropped: bool = True,
) -> DataFrame:
    """Near-dup pairs with hamming distance <= max_hamming.

    Standard 4-block trick: split the 64-bit simhash into 4 16-bit
    blocks; any pair within hamming<=3 shares at least one exact
    block -> self-join per block, verify hamming via bit_count.

    A (block, value) bucket above ``max_bucket`` is dropped before the
    join (the same quadratic guard as minhash LSH: one boilerplate
    class sharing a simhash value makes the 4-block join O(m^2));
    dropped mass is logged. Mirrored in the DuckDB oracle."""
    # sh == 0 means "no tokens" (the scalar's empty sentinel): such
    # docs are not comparable and the DuckDB oracle has no simhash row
    # for them — exclude, mirroring the minhash sentinel filter
    sh = docs.select(id_col, simhash_udf(F.col(text_col)).alias("sh")).where(
        F.col("sh") != 0
    )
    blocks = sh.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("sh", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select(id_col, "sh", "b.blk", "b.val")
    blocks = _cap_hot_buckets(
        blocks, ["blk", "val"], max_bucket, log_dropped, "simhash"
    )
    a = blocks.alias("a")
    b = blocks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

@F.pandas_udf(T.DoubleType())
def _cosine_pairs_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Batched exact cosine over candidate pairs: ONE float64 einsum
    per Arrow batch instead of a per-element SQL aggregate (~10x
    cheaper when candidate sets grow — round-3 change, identical
    output: float64 math, rounded to 6 like the SQL/DuckDB replay).

    Rounding is half-AWAY-FROM-ZERO (what Spark's F.round and DuckDB's
    ROUND both do), not numpy's default half-to-even — the rounded
    value feeds the >= threshold cut, so a banker's-rounding boundary
    would change the pair set itself."""
    A = np.array(va.tolist(), dtype=np.float64)
    B = np.array(vb.tolist(), dtype=np.float64)
    num = np.einsum("ij,ij->i", A, B)
    den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
        np.einsum("ij,ij->i", B, B)
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        scaled = num / den * 1e6
        return pd.Series(np.sign(scaled) * np.floor(np.abs(scaled) + 0.5) / 1e6)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int | None = LSH_MAX_BUCKET,
    log_dropped: bool = True,
) -> DataFrame:
    """Cosine near-dup pairs via random-hyperplane LSH buckets.

    sign-sketch each vector against ``n_planes`` fixed random planes ->
    bucket join -> exact cosine on candidates only. Near-identical
    vectors share the full sketch w.h.p.; recall is tunable via
    n_planes (fewer planes = bigger buckets = higher recall/cost).

    A sketch bucket above ``max_bucket`` is dropped before the join
    (quadratic guard: a corpus where most embeddings collapse to one
    canonical vector puts the whole duplicate class in ONE bucket —
    O(m^2) without the cap); dropped mass is logged. Mirrored in the
    DuckDB oracle. The exact-cosine verify runs as a batched NumPy
    einsum (_cosine_pairs_udf), not a per-element SQL aggregate."""
    first = embeddings.select(vec_col).first()
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    spark = embeddings.sparkSession
    pb = spark.sparkContext.broadcast(planes)

    @F.pandas_udf(T.IntegerType())
    def sketch(vecs: pd.Series) -> pd.Series:
        P = pb.value

        def one(v):
            s = P @ np.asarray(v, dtype=np.float64)
            return int(((s > 0).astype(np.int64) << np.arange(len(s))).sum())

        return vecs.map(one)

    sk = embeddings.select(
        F.col(id_col), F.col(vec_col).alias("v"), sketch(F.col(vec_col)).alias("sk")
    )
    sk = _cap_hot_buckets(sk, ["sk"], max_bucket, log_dropped, "hyperplane_lsh")
    a = sk.alias("a")
    b = sk.alias("b")
    cand = a.join(
        b,
        (F.col("a.sk") == F.col("b.sk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    return (
        cand.withColumn(
            "cosine", _cosine_pairs_udf(F.col("a.v"), F.col("b.v"))
        )
        .where(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# SemDeDup: k-means-cluster-then-prune semantic dedup
# ---------------------------------------------------------------------------

def _round6_away(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero rounding to 6 dp (what F.round and DuckDB
    ROUND do; numpy's default is half-to-even) — every rounded value
    here feeds a threshold or a tiebreak, so the rounding convention
    is part of the operator's contract."""
    scaled = x * 1e6
    return np.sign(scaled) * np.floor(np.abs(scaled) + 0.5) / 1e6


def semdedup(
    embeddings: DataFrame,
    centroids: np.ndarray,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = LSH_MAX_BUCKET,
    log_dropped: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings, then prune
    semantic duplicates WITHIN each cluster.

    The reference's embed-dedup chain (lib.rs:290-425) compares every
    new doc against all stored embeddings — linear scan per doc, fine
    at archive scale, quadratic over a corpus. SemDeDup is the
    published 100 TB-shape answer: the coarse quantizer (the same
    ``similarity.train_centroids`` Lloyd pass the IVF layout uses)
    partitions the corpus into cells, and the all-pairs cosine runs
    only inside a cell — the cell is the shuffle key, so at scale
    ``n_cells`` grows with the corpus and per-cell work stays bounded.

    Per cell (one ``applyInPandas`` group):
    - assignment: argmax over ``round(cos(x, c_i), 6)`` (ties -> the
      lowest centroid ordinal — deterministic and replayable in SQL);
    - duplicate graph: pairs with ``round(cos(x_a, x_b), 6) >= tau``,
      connected components via union-find (components are maximal, so
      a second pass over the kept rows drops nothing — tested);
    - keep rule: per component keep the member FARTHEST from its
      centroid (lowest ``cent_sim``, tiebreak lowest id) — the paper's
      low-similarity-to-centroid choice keeps the least redundant
      representative; singletons keep themselves.

    A cell larger than ``max_cell`` passes through undeduped (keep_id
    = own id) — the same quadratic guard as the LSH families, mirrored
    in the DuckDB oracle; dropped mass is logged.

    Returns one row per vector: (id, cell, cent_sim, keep_id). Drop
    policy: keep rows WHERE id == keep_id.
    """
    spark = embeddings.sparkSession
    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    cb = spark.sparkContext.broadcast(C)

    @F.pandas_udf(T.IntegerType())
    def cell_of(vecs: pd.Series) -> pd.Series:
        Cn = cb.value
        if not len(vecs):
            return pd.Series([], dtype="int32")
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        # rounded BEFORE the argmax: assignment must agree with the
        # SQL replay, where evaluation-order float noise could flip a
        # near-tied argmax at full precision
        sc = _round6_away(X @ Cn.T)
        return pd.Series(np.argmax(sc, axis=1).astype(np.int32))

    celled = embeddings.select(
        F.col(id_col), F.col(vec_col).alias("v"), cell_of(F.col(vec_col)).alias("cell")
    )

    if log_dropped and max_cell is not None:
        import logging

        hot = (
            celled.groupBy("cell")
            .count()
            .where(F.col("count") > max_cell)
            .collect()
        )
        if hot:
            logging.getLogger("xf_spark.dedup").warning(
                "semdedup: %d cell(s) above max_cell=%d pass through "
                "undeduped (%s rows)",
                len(hot),
                max_cell,
                sum(r["count"] for r in hot),
            )

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("cent_sim", T.DoubleType()),
            T.StructField("keep_id", T.LongType()),
        ]
    )

    def prune(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        Cn = cb.value
        ids = pdf[id_col].to_numpy(np.int64)
        X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        cs = _round6_away(X @ Cn[int(key[0])])
        m = len(ids)
        keep = ids.copy()
        if max_cell is None or m <= max_cell:
            order = np.argsort(ids, kind="stable")
            ids, X, cs = ids[order], X[order], cs[order]
            keep = ids.copy()
            S = _round6_away(X @ X.T)
            ia, ib = np.nonzero(np.triu(S >= tau, k=1))
            # union-find over the duplicate graph (cell-local, bounded
            # by max_cell, so the python loop is over <= max_cell^2/2
            # edges of a capped group — never the corpus)
            parent = np.arange(m)

            def find(i: int) -> int:
                while parent[i] != i:
                    parent[i] = parent[parent[i]]
                    i = parent[i]
                return i

            for a, b in zip(ia.tolist(), ib.tolist()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[rb] = ra
            roots = np.array([find(i) for i in range(m)])
            # component rep = lexicographic min of (cent_sim, id):
            # iterate members in that order, first member seen per
            # root is the keeper
            rep: dict[int, int] = {}
            for i in np.lexsort((ids, cs)).tolist():
                rep.setdefault(int(roots[i]), int(ids[i]))
            keep = np.array([rep[int(r)] for r in roots], dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": np.full(len(ids), int(key[0]), dtype=np.int32),
                "cent_sim": cs,
                "keep_id": keep,
            }
        )

    return celled.groupBy("cell").applyInPandas(prune, schema=out_schema)


# ---------------------------------------------------------------------------
# ExactSubstr-style duplicated-window detection (Lee et al. 2022)
# ---------------------------------------------------------------------------

def _window_hashes(docs, win, id_col, text_col):
    """Shared window construction for the ExactSubstr family: returns
    ``(base, wins)`` where base = (doc_id, toks) with original-case
    whitespace tokens, and wins = (doc_id, pos, h) with a 16-byte md5
    of each lowercased ``win``-token window. Linear in corpus tokens;
    only (doc_id, pos, 16B hash) rows ever shuffle."""
    toks_raw = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(toks_raw)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    n = F.size("toks")
    wins = (
        base.where(n >= win)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n - win),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.unhex(
                            F.md5(
                                F.lower(
                                    F.array_join(
                                        F.slice(F.col("toks"), i + 1, win),
                                        " ",
                                    )
                                )
                            )
                        ).alias("h"),
                    ),
                )
            ).alias("w"),
        )
        .select("doc_id", "w.pos", "w.h")
    )
    return base, wins


def duplicate_window_spans(
    docs: DataFrame,
    win: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide duplicated-substring statistics, the distributed
    analog of ExactSubstr dedup ("Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022): a ``win``-token window
    whose text occurs >= ``min_count`` times ANYWHERE in the corpus
    (across or within docs) is a duplicated window; per doc, the union
    of its duplicated windows is the span a substring-dedup pass would
    excise. Emits one row per doc:
    ``(doc_id, n_tokens, n_dup_windows, dup_tokens, dup_frac)``.

    The paper builds a monolithic suffix array — single-machine by
    construction. The distributed standard is hash-windowing: explode
    every window's 128-bit content hash (linear in corpus tokens),
    ONE partially-aggregated groupBy(h) keeps hashes with >= min_count
    occurrences (a boilerplate window occurring 10^6 times collapses
    to one count row — skew-safe), join back on h, and the per-doc
    span union is a sorted-positions fold bounded by the longest doc.
    No Python, no quadratic stage; the hash key ships as 16-byte
    binary (unhex), not the 32-char hex string.
    """
    base, wins = _window_hashes(docs, win, id_col, text_col)
    hot = (
        wins.groupBy("h").count().where(F.col("count") >= min_count).select("h")
    )
    dup = (
        wins.join(hot, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_windows"),
            F.sort_array(F.collect_list("pos")).alias("ps"),
        )
    )
    sz = F.size("ps")
    # |union of [p, p+win)| over sorted starts = win for the first
    # window + min(win, gap) for each subsequent one
    gaps = F.when(
        sz >= 2,
        F.zip_with(
            F.slice("ps", F.lit(1), sz - 1),
            F.slice("ps", F.lit(2), sz - 1),
            lambda a, b: F.least(F.lit(win), b - a),
        ),
    ).otherwise(F.array().cast("array<int>"))
    dup_tokens = F.aggregate(gaps, F.lit(0), lambda acc, x: acc + x) + win
    spans = dup.select(
        "doc_id",
        F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
        dup_tokens.cast("long").alias("dup_tokens"),
    )
    return (
        base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )

def excise_duplicate_spans(
    docs: DataFrame,
    win: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Perform the ExactSubstr cut (Lee et al. 2022, "drop every
    duplicated span" policy): remove every token covered by a
    ``win``-token window whose lowercased text occurs >= ``min_count``
    times anywhere in the corpus, in EVERY occurrence (self-repeats
    included). Emits ``(doc_id, n_tokens, n_kept, text_clean)`` where
    ``text_clean`` is the surviving original-case tokens re-joined
    with single spaces (whitespace is normalized by construction).

    Scale shape: same linear hash-windowing as
    :func:`duplicate_window_spans`; the only per-doc state is the
    sorted duplicated-window starts, folded JVM-side into DISJOINT
    merged intervals, and tokens are filtered with an indexed lambda
    against those intervals — no token-level shuffle, no Python.
    """
    base, wins = _window_hashes(docs, win, id_col, text_col)
    hot = (
        wins.groupBy("h").count().where(F.col("count") >= min_count).select("h")
    )
    starts = (
        wins.join(hot, "h")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
    )
    empty_ivs = F.array().cast("array<struct<s:int,e:int>>")
    # fold sorted starts into merged [s, e) intervals: starts are
    # increasing, so an overlapping window only ever extends the tail
    merged = F.aggregate(
        F.col("ps"),
        empty_ivs,
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        (p + win).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(p.alias("s"), (p + win).alias("e"))))
        ),
    )
    ivs = F.coalesce(F.col("_ivs"), empty_ivs)
    kept = F.filter(
        F.col("toks"),
        lambda tok, i: ~F.exists(
            ivs, lambda iv: (i >= iv["s"]) & (i < iv["e"])
        ),
    )
    return (
        base.join(starts.select("doc_id", merged.alias("_ivs")), "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.size(kept).cast("long").alias("n_kept"),
            F.array_join(kept, " ").alias("text_clean"),
        )
    )
