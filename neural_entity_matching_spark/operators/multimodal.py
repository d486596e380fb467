"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is STUBBED — the
codec libraries (PIL/ffmpeg/torchaudio) are not in this container, so
``decode_fn=None`` raises NotImplementedError at the decode boundary and
tests inject a deterministic fake decoder. Swapping in a real decoder is a
one-argument change; nothing in the plan changes.

Design for 100 TB of media: binary payloads stay columnar in parquet,
metadata columns (mime, width/height/duration) are scalar so pruning and
predicate pushdown work; decode runs in ``mapInPandas`` so one task
streams Arrow record batches and never materializes a partition of raw
bytes in Python at once; feature vectors come back as array<float>
feeding straight into operators/ann.py.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def default_decode_stub(payload: bytes, mime: str) -> np.ndarray:
    """Decode boundary. Real deployments pass a decoder (PIL/ffmpeg);
    this container has none, so the default refuses loudly."""
    raise NotImplementedError(
        "media decode requires a codec library not present in this "
        "environment; inject decode_fn=... (tests use a deterministic fake)"
    )


def deterministic_fake_decoder(dim: int = 16) -> Callable[[bytes, str], np.ndarray]:
    """Deterministic stand-in decoder: feature = seeded hash-fold of the
    payload bytes. Lets every downstream op (partitioning, ANN, dedup) be
    tested end-to-end without codecs."""

    def decode(payload: bytes, mime: str) -> np.ndarray:
        if payload is None:
            return np.zeros(dim, dtype=np.float32)
        b = np.frombuffer(payload, dtype=np.uint8)
        out = np.zeros(dim, dtype=np.float64)
        idx = np.arange(len(b)) % dim
        np.add.at(out, idx, b.astype(np.float64))
        n = np.linalg.norm(out)
        return (out / n if n else out).astype(np.float32)

    return decode


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] | None = None,
    batch_feature_dim: int = 16,
) -> DataFrame:
    """mapInPandas media featurization: (media_id, mime, payload, ...) ->
    (media_id, mime, n_bytes, feature). Arrow streams batches; the decode
    loop is per-batch Python over binary payloads — unavoidable at the
    codec boundary, vectorized everywhere else."""
    fn = decode_fn or default_decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            nbytes = []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                nbytes.append(0 if payload is None else len(payload))
                feats.append([float(x) for x in fn(payload, mime)])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_FEATURES)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plan for video rows: explodes (media_id, frame_ts_ms)
    pairs from duration metadata — pure JVM (sequence+explode), the decode
    of each sampled frame is then a mapInPandas over (media_id, frame_ts).
    Demonstrates the partition shape: one output row per frame, clustered
    by media_id."""
    return (
        media.filter(F.col("mime").startswith("video/"))
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
