"""Corpus curation: the end-to-end keep/drop pipeline a training-data
build actually runs — quality gate, then near-dup removal — composed
from the individually-oracled ops so the whole chain stays
distributed and hot-bucket-capped.

Reference analog: the embed-dedup reuse chain (lib.rs:290-425) makes
the keep/drop decision inside the reference's embedding pipeline; here
it is a first-class corpus->corpus operator.

Scale shape (100 TB): the quality gate is pure JVM column expressions
over one scan; exact dedup shuffles 32-byte digests only; the LSH
families shuffle banded sketches with the LSH_MAX_BUCKET cap; the
component labels shuffle (id, label) longs. Document bodies never
shuffle — the kept corpus is resolved by semi-join on ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from xf_spark.ops import dedup as dd
from xf_spark.ops.textops import quality_scores


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float | None = None,
    min_tokens: int | None = None,
    dedup: str | None = "exact",
    dedup_threshold: float = 0.8,
    max_hamming: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Quality-gate then dedup ``docs``; returns ``(kept, report)``.

    - ``min_quality``: drop rows whose composite ``quality`` (the
      rounded [0,1] blend from ``quality_scores``) is below this;
    - ``min_tokens``: drop rows with fewer whitespace tokens;
    - ``dedup``: None | "exact" (identical text, min-id kept) |
      "minhash" (shingle-Jaccard >= ``dedup_threshold``) | "simhash"
      (hamming <= ``max_hamming``); near-dup families keep the min-id
      representative of each connected component
      (``near_dup_groups`` semantics).

    ``kept`` has the original columns of ``docs``. ``report`` is one
    row: n_input, n_quality_dropped, n_dup_dropped, n_kept.

    ``kept`` is returned CACHED (already materialized by the report
    count, so the caller's first action is free); unpersist it when
    done. The intermediate quality-gate cache is released before
    returning.
    """
    if dedup not in (None, "exact", "minhash", "simhash"):
        raise ValueError(f"unknown dedup method: {dedup!r}")
    n_input = docs.count()

    filtered = docs
    gated = min_quality is not None or min_tokens is not None
    if gated:
        q = quality_scores(docs, text_col=text_col)
        cond = F.lit(True)
        if min_quality is not None:
            cond = cond & (F.col("quality") >= min_quality)
        if min_tokens is not None:
            cond = cond & (F.col("n_ws_tokens") >= min_tokens)
        filtered = q.where(cond).select(*docs.columns)
        # the gate feeds two consumers (dedup + count); cache the
        # id/text projection's worth of work once
        filtered = filtered.cache()
    n_after_q = filtered.count() if gated else n_input

    if dedup == "exact":
        kept = dd.exact_dedup(filtered, text_col=text_col, id_col=id_col)
    elif dedup in ("minhash", "simhash"):
        pairs = (
            dd.minhash_dedup_pairs(
                filtered, threshold=dedup_threshold,
                text_col=text_col, id_col=id_col,
            )
            if dedup == "minhash"
            else dd.simhash_candidates(
                filtered, max_hamming=max_hamming,
                text_col=text_col, id_col=id_col,
            )
        )
        groups = dd.near_dup_groups(filtered, pairs, id_col=id_col)
        keep_ids = groups.where(
            F.col(id_col) == F.col("keep_id")
        ).select(id_col)
        kept = filtered.join(keep_ids, id_col, "left_semi")
    else:
        kept = filtered
    if kept is not filtered:
        kept = kept.cache()
    n_kept = kept.count()
    if gated and kept is not filtered:
        # kept is materialized above; the gate cache has no reader left
        filtered.unpersist()

    spark = docs.sparkSession
    report = spark.createDataFrame(
        [(
            int(n_input),
            int(n_input - n_after_q),
            int(n_after_q - n_kept),
            int(n_kept),
        )],
        "n_input bigint, n_quality_dropped bigint, "
        "n_dup_dropped bigint, n_kept bigint",
    )
    return kept, report
