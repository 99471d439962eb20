"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a typed metadata
struct. The Spark-side machinery — schema, partition-aware batch
processing via mapInPandas, UDF signatures, batch shapes — is real and
tested; the actual media DECODE is stubbed behind a deterministic fake
(``XF_SPARK_FAKE_DECODE=1``, the default here) or NotImplementedError,
because the image/audio libraries are not in this container. Swapping
in Pillow/torchaudio changes ONE function (``_decode_image``), nothing
in the plan shape.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8)
        rows.append(
            (
                i,
                kind,
                bytes(payload.tobytes()),
                (
                    {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    64 + (i % 4) * 32 if kind != "audio" else None,
                    64 + (i % 3) * 32 if kind != "audio" else None,
                    1000 * (1 + i % 30) if kind != "image" else None,
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


try:  # extras gate: real decode lights up wherever Pillow exists
    from PIL import Image as _PILImage
except ImportError:  # container has no media libs — deterministic fake
    _PILImage = None


def _decode_image(
    payload: bytes, width: int, height: int, mode: str = "auto"
) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    ``mode``:
    - "auto" (default): real Pillow decode when importable AND the
      payload is a decodable image; non-image payloads (e.g. the
      synthetic corpus) fall back per row to the deterministic fake —
      never a job-killing decode error. ``XF_SPARK_REAL_DECODE=1``
      turns the no-Pillow fallback into a hard error for deployments
      that require real decode.
    - "real": require Pillow AND a decodable payload (raises
      otherwise).
    - "fake": always the deterministic fake (payload bytes tiled to
      HxWx3) — what synthetic differentials pin, since their payloads
      are not actual image files.

    Real decode: any PIL-supported format -> RGB, resized to
    (width, height) when the metadata gives target dims."""
    if mode == "real" or (mode == "auto" and _PILImage is not None):
        if _PILImage is None:
            raise NotImplementedError("real decode requires Pillow")
        import io

        try:
            img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
        except Exception:
            if mode == "real":
                raise
            img = None  # auto: not an image payload -> deterministic fake
        if img is not None:
            if width and height and img.size != (width, height):
                img = img.resize((width, height))
            return np.asarray(img, dtype=np.uint8)
    if mode == "auto" and os.environ.get("XF_SPARK_REAL_DECODE"):
        raise NotImplementedError(
            "XF_SPARK_REAL_DECODE is set but Pillow is not installed"
        )
    flat = np.frombuffer(payload, dtype=np.uint8)
    need = max(1, (width or 8)) * max(1, (height or 8)) * 3
    rep = np.resize(flat, need)
    return rep.reshape(max(1, height or 8), max(1, width or 8), 3)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    media: DataFrame, feature_dim: int = 16, decode: str = "auto"
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of
    binary payloads -> numpy -> fixed-dim feature vectors). The batch
    shape and partitioning are exactly what a real CV/audio featurizer
    needs; ``decode`` selects the _decode_image mode ("auto" = real
    Pillow decode where installed, deterministic fake otherwise;
    "fake" pins the fake for synthetic differentials whose payloads
    are not image files)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                meta = row["meta"]

                def _dim(v, default=8):
                    # struct nulls surface as NaN floats in pandas
                    try:
                        import math

                        if v is None or (isinstance(v, float) and math.isnan(v)):
                            return default
                        return int(v)
                    except (TypeError, ValueError):
                        return default

                img = _decode_image(
                    payload,
                    _dim(meta["width"] if meta is not None else None),
                    _dim(meta["height"] if meta is not None else None),
                    mode=decode,
                )
                mean = float(img.mean())
                # fake embedding: block means over the flattened pixels
                flat = img.astype(np.float64).ravel()
                blocks = np.array_split(flat, feature_dim)
                feat = np.array([b.mean() if len(b) else 0.0 for b in blocks])
                norm = np.linalg.norm(feat)
                feat = (feat / norm if norm else feat).astype(np.float32)
                # full-precision mean: the pixel sum is an exact
                # integer < 2^53, so the float64 quotient is identical
                # across engines (rounding is the caller's concern —
                # python banker's vs SQL half-up diverge on the exact
                # binary-fraction boundaries this mean lands on)
                out.append(
                    (
                        row["media_id"],
                        row["kind"],
                        len(payload),
                        mean,
                        feat.tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "mean_intensity", "feature"]
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (the decode itself is the stubbed step). Demonstrates the
    explode-by-computed-sequence shape used for real frame extraction."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
