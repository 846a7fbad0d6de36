"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct.
The Spark side — schema, partitioning, Arrow batch shape, UDF signatures —
is real and tested; the codec kernels are STUBBED (decode libs aren't in
this container): ``decode_image`` raises NotImplementedError unless
``fake=True``, which substitutes a deterministic fake decoder so the
pipeline shape can be exercised end-to-end.

Design notes for 100 TB:
- payloads stay opaque bytes until the last possible operator — filters
  and joins run on metadata columns so parquet scans prune payload pages;
- ``mapInPandas`` (iterator form) keeps per-batch memory bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
  batch_rows × max_payload fits the executor;
- feature extraction emits fixed-size float arrays → downstream joins and
  ANN reuse the embedding operators unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),        # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
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


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table exercising the schema/batch shape."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4  # 128 B
        rows.append(
            (i, kind, bytearray(payload),
             (f"{kind}/fake", 64 + i % 8, 48 + i % 6, 1000 + i))
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode + featurize': hash-seeded projection.
    Stands in for a real image/audio decoder (not in this container)."""
    h = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    v = rng.standard_normal(dim).astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n else v


def extract_features(
    media: DataFrame,
    dim: int = 64,
    fake: bool = False,
    batch_col: str = "payload",
) -> DataFrame:
    """media -> DataFrame[media_id, kind, feature array<float>].

    Real decoders (PIL/av/librosa) plug into ``kernel`` below; without
    them, ``fake=True`` uses the deterministic stand-in and ``fake=False``
    raises NotImplementedError — loudly, per batch, so a misconfigured
    cluster job fails fast instead of producing garbage features.
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic "
                    "stand-in or register a real kernel"
                )
            feats = [ _fake_decode(p, dim) for p in pdf[batch_col] ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [list(map(float, f)) for f in feats],
                }
            )

    return media.select("media_id", "kind", batch_col).mapInPandas(
        kernel, schema="media_id long, kind string, feature array<float>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand (media_id, duration) into one
    row per sampled timestamp (the decode itself is the stubbed kernel).
    Pure Catalyst sequence/explode — the expansion is the Spark-side work."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("ts_ms"),
        )
    )
