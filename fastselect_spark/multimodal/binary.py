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


def _h60(s: str) -> int:
    """60-bit md5-prefix hash — the same modular derivation any SQL engine
    can compute (CAST('0x'||substr(md5(s),1,15) AS BIGINT))."""
    return int(hashlib.md5(s.encode("ascii")).hexdigest()[:15], 16)


def synthesize_media_table(
    spark: SparkSession, n: int = 100, seed: int = 42
) -> DataFrame:
    """Deterministic fake media rows. Every field — kind, sizes, payload
    BYTES — derives from md5 chains keyed on (seed, media_id), so an
    independent SQL engine can regenerate the identical table (the driver-
    contract DuckDB oracle does exactly that); payload_i = fromhex(concat_j
    md5('{seed}:payload:{i}:{j}'))[:size_i]."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][_h60(f"{seed}:kind:{i}") % 3]
        size = 64 + _h60(f"{seed}:size:{i}") % 4032
        n_blocks = (size + 15) // 16
        phex = "".join(
            hashlib.md5(f"{seed}:payload:{i}:{j}".encode()).hexdigest()
            for j in range(n_blocks)
        )[: 2 * size]
        payload = bytes.fromhex(phex)
        # Nullable int columns: a pandas round-trip upcasts them to float64,
        # which MEDIA_SCHEMA's IntegerType rejects — create from rows directly.
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 32 + _h60(f"{seed}:width:{i}") % 992 if kind != "audio" else None,
                "height": 32 + _h60(f"{seed}:height:{i}") % 992 if kind != "audio" else None,
                "duration_ms": 100 + _h60(f"{seed}:dur:{i}") % 59900 if kind != "image" else None,
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
    """Seeded fake: FEATURE_DIM floats derived from a payload digest.

    The digest is sha256 over the LOWERCASE-HEX encoding of the payload
    (not the raw bytes): the features stay a pure function of the binary
    payload, while remaining computable by SQL engines whose sha256 only
    accepts strings — the DuckDB oracle recomputes them from the md5-chain
    hex without ever constructing a BLOB. Words are little-endian uint16."""
    digest = hashlib.sha256(payload.hex().encode("ascii")).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype="<u2")
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
