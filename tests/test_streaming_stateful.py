"""applyInPandasWithState custom stateful operator: running per-turn
features must survive micro-batch boundaries and match the batch
cumulative-window oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastselect_spark.data.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts_pandas,
)
from fastselect_spark.featurize import featurize_transcripts
from fastselect_spark.streaming import (
    read_transcripts_stream,
    stateful_conversation_progress,
)


def test_stateful_progress_matches_batch(spark, tmp_path):
    pdf = generate_transcripts_pandas(n_convs=25, seed=42)
    # stage two time-ordered chunks so per-conversation arrival is in order
    cutoff = pdf["ts"].median()
    src = str(tmp_path / "in")
    spark.createDataFrame(pdf[pdf.ts <= cutoff], schema=TRANSCRIPT_SCHEMA).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(pdf[pdf.ts > cutoff], schema=TRANSCRIPT_SCHEMA).write.mode(
        "append"
    ).parquet(src)

    stream = read_transcripts_stream(spark, src, max_files_per_trigger=4)
    out = stateful_conversation_progress(stream, gap_seconds=300)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.table("conv_progress")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(pdf)

    batch = (
        featurize_transcripts(spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA))
        .select(
            "conv_id",
            "turn_idx",
            "session_id",
            "turn_seq",
            "tool_calls_so_far",
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (got["conv_id"].values == batch["conv_id"].values).all()
    assert (got["turns_so_far"].values == batch["turn_seq"].values).all()
    assert (got["session_id"].values == batch["session_id"].values).all()
    assert (
        got["tool_calls_so_far"].values == batch["tool_calls_so_far"].values
    ).all()
    # tokens monotonically accumulate per conversation
    for _, grp in got.groupby("conv_id"):
        tk = grp.sort_values("turn_idx")["tokens_so_far"].values
        assert (np.diff(tk) > 0).all()
