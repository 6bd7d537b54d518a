"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
storage/partitioning pattern for multimodal training data at scale. The
Spark-side plumbing (schema, batch shape, partition sizing, UDF signatures)
is real and tested; the actual codec step is STUBBED because no image/audio
libraries exist in this container: ``decode_and_featurize`` takes a
``decoder`` callable and the default raises ``NotImplementedError`` with a
clear message, while ``deterministic_fake_decoder`` provides a seeded fake
for tests (it derives a fixed-length feature vector from the payload bytes,
so the full pipeline runs end-to-end deterministically).

Scale notes: media rows are fat — ``mapInPandas`` batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` and payload size, so
repartition by ``bytes`` ranges (or store payloads in object storage and
keep only pointers) before featurizing. Decoded features are fixed-width
float arrays: columnar, pruneable, joinable back by ``media_id``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),  # image/video
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),  # audio/video
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 16


def synthesize_media_table(
    spark: SparkSession, n: int = 100, seed: int = 42
) -> DataFrame:
    """Deterministic fake media rows (payload = seeded pseudo-random bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        size = int(rng.integers(64, 4096))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        kind = kinds[i]
        # Nullable int columns: a pandas round-trip upcasts them to float64,
        # which MEDIA_SCHEMA's IntegerType rejects — create from rows directly.
        rows.append(
            {
                "media_id": i,
                "kind": str(kind),
                "payload": payload,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": int(rng.integers(32, 1024)) if kind != "audio" else None,
                "height": int(rng.integers(32, 1024)) if kind != "audio" else None,
                "duration_ms": int(rng.integers(100, 60000)) if kind != "image" else None,
                "n_bytes": size,
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def unavailable_decoder(payload: bytes, kind: str) -> np.ndarray:
    """The real decode step — image/audio codecs are not in this container."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; pass decoder=deterministic_fake_decoder for testing "
        "or plug a real codec (PIL/torchaudio/ffmpeg) in production"
    )


def deterministic_fake_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Seeded fake: FEATURE_DIM floats derived from a payload digest."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float64) / 65535.0)[:FEATURE_DIM]


def decode_and_featurize(
    df: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = unavailable_decoder,
) -> DataFrame:
    """payload -> fixed-width feature vector via batched ``mapInPandas``.

    Output: (media_id, kind, features array<double>, n_bytes).
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                decoder(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "n_bytes": pdf["n_bytes"],
                }
            )

    return df.select("media_id", "kind", "payload", "n_bytes").mapInPandas(
        featurize,
        schema="media_id long, kind string, features array<double>, n_bytes long",
    )


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    decoder: Callable[[bytes, str], np.ndarray] = unavailable_decoder,
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled timestamp
    (frame decode itself goes through ``decoder``). Frame timestamps are
    computed JVM-side with ``sequence``; the expensive decode is batched."""
    frames = (
        df.where(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("media_id", "payload", "kind", "frame_ms", "n_bytes")
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                decoder(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ms": pdf["frame_ms"],
                    "features": feats,
                }
            )

    return frames.mapInPandas(
        featurize, schema="media_id long, frame_ms int, features array<double>"
    )
