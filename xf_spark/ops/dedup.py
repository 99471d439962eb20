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


# A band-bucket larger than this is excluded from the self-join: an
# m-doc bucket yields ~m^2/2 join rows, and boilerplate-heavy corpora
# (the norm in training data) put millions of near-identical docs in
# one digest — quadratic without the cap. Docs above the cap are
# better handled by exact_dedup first (identical text ==> identical
# digest); the cap is mirrored verbatim in the DuckDB oracle.
LSH_MAX_BUCKET = 2000


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = LSH_MAX_BUCKET,
    log_dropped: bool = False,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH.

    shingle -> minhash (vectorized UDF) -> band digests -> explode ->
    hot-bucket cap -> self-join on (band, digest) -> distinct pairs
    (id_a < id_b). Buckets above ``max_bucket`` are dropped before the
    join (quadratic blowup guard); ``log_dropped=True`` additionally
    counts the dropped rows (one small agg job) and logs them."""
    rows_per_band = N_HASHES // N_BANDS
    sig = docs.select(id_col, minhash_udf(F.col(text_col)).alias("sig"))
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
    if max_bucket:
        hot = (
            bands.groupBy("band", "digest")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > max_bucket)
        )
        if log_dropped:
            import logging

            row = hot.agg(
                F.count("*").alias("buckets"), F.sum("_n").alias("rows")
            ).first()
            if row["buckets"]:
                logging.getLogger(__name__).warning(
                    "minhash_lsh: dropping %d hot buckets (%d rows > cap %d)",
                    row["buckets"], row["rows"], max_bucket,
                )
        # hot buckets are FEW by construction (each holds > max_bucket
        # rows) — broadcast anti-join, no extra shuffle of `bands`
        bands = bands.join(
            F.broadcast(hot.select("band", "digest")),
            ["band", "digest"],
            "left_anti",
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
    not the corpus)."""
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
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs with hamming distance <= max_hamming.

    Standard 4-block trick: split the 64-bit simhash into 4 16-bit
    blocks; any pair within hamming<=3 shares at least one exact
    block -> self-join per block, verify hamming via bit_count."""
    sh = docs.select(id_col, simhash_udf(F.col(text_col)).alias("sh"))
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

def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Cosine near-dup pairs via random-hyperplane LSH buckets.

    sign-sketch each vector against ``n_planes`` fixed random planes ->
    bucket join -> exact cosine on candidates only. Near-identical
    vectors share the full sketch w.h.p.; recall is tunable via
    n_planes (fewer planes = bigger buckets = higher recall/cost)."""
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
    a = sk.alias("a")
    b = sk.alias("b")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    cand = a.join(
        b,
        (F.col("a.sk") == F.col("b.sk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    return (
        cand.withColumn(
            "cosine",
            F.round(
                dot(F.col("a.v"), F.col("b.v"))
                / (
                    F.sqrt(dot(F.col("a.v"), F.col("a.v")))
                    * F.sqrt(dot(F.col("b.v"), F.col("b.v")))
                ),
                6,
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
        .orderBy("id_a", "id_b")
    )
