"""Structured Streaming ingestion of transcripts.

The reference has no streaming semantics (SURVEY.md §2.3) and the batch
engine implements sessionization as gap windows; this module provides the
STREAMING counterparts for continuously-arriving transcripts — the shape a
production 10^12-turn ingest actually has:

- :func:`read_transcripts_stream` — file-source stream over a transcripts
  parquet directory (swap for Kafka in production; the transformations are
  source-agnostic).
- :func:`streaming_session_stats` — per-(conv_id, session) aggregates using
  ``F.session_window`` (native gap-based session windows) with a watermark
  bounding late data and state size.
- :func:`streaming_token_rates` — sliding-window token throughput per role
  (tumbling/sliding windowed aggregation + watermark).

Late-data semantics: events later than the watermark are dropped from
state-bound aggregations — the streaming analogue of the batch layer's
zero-lookahead frames. Tests drive these with ``trigger(availableNow=True)``
over staged parquet chunks and compare against the batch sessionizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastselect_spark.data.transcripts import TRANSCRIPT_SCHEMA


def read_transcripts_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def streaming_session_stats(
    stream: DataFrame,
    gap_seconds: float = 300.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-conversation session aggregates over a native session window
    (same gap threshold as the batch sessionizer)."""
    toks = F.size(F.split(F.col("text"), r"\s+")).cast("double")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.col("conv_id"),
            F.session_window("ts", f"{int(gap_seconds)} seconds").alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(toks).alias("total_tokens"),
            F.sum(
                F.when(F.col("tool").isNotNull(), 1).otherwise(0)
            ).alias("n_tool_calls"),
        )
        .select(
            "conv_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_turns",
            "total_tokens",
            "n_tool_calls",
        )
    )


def streaming_token_rates(
    stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tokens/turns per role over tumbling (or sliding) event-time windows."""
    toks = F.size(F.split(F.col("text"), r"\s+")).cast("double")
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("role"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(toks).alias("total_tokens"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
            "total_tokens",
        )
    )
