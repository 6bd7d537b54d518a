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


def test_stateful_beyond_watermark_rows_still_reach_state(spark, tmp_path):
    """Pins the verified PySpark applyInPandasWithState contract
    (stateful.py module docstring): the watermark does NOT filter this
    operator's input — a second-batch row an hour behind batch one's max
    event time (far beyond watermark='10 minutes') still reaches the
    state function and emits via the fresh-session fallback. If a Spark
    upgrade starts dropping such rows (aggregation-style late filtering),
    this test flags the contract change."""
    import pandas as pd

    def rows(conv, ts_list, start_idx=0):
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": range(start_idx, start_idx + len(ts_list)),
                "role": "user",
                "text": "hi",
                "tool": None,
                "ts": pd.to_datetime(ts_list),
            }
        )

    src = str(tmp_path / "in")
    b1 = rows("a", ["2026-01-01 12:00:00", "2026-01-01 12:01:00"])
    # batch 2: one fresh row (advances nothing for 'late') + one row 1h
    # behind batch 1's max event time -> beyond the 10-minute watermark
    b2 = pd.concat(
        [
            rows("a", ["2026-01-01 12:02:00"], start_idx=2),
            rows("late", ["2026-01-01 11:01:00"]),
        ]
    )
    spark.createDataFrame(b1, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # FileStreamSource orders by modification time (ties by path, and the
    # part-file names are random UUIDs) — space the writes so batch order
    # is deterministic
    import time as _time

    _time.sleep(1.2)
    spark.createDataFrame(b2, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = read_transcripts_stream(spark, src, max_files_per_trigger=1)
    out = stateful_conversation_progress(
        stream, gap_seconds=300, watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wm_drop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("wm_drop").toPandas()
    # the beyond-watermark row still emits (fresh-session fallback)...
    assert set(got["conv_id"]) == {"a", "late"}
    late = got[got["conv_id"] == "late"]
    assert len(late) == 1 and (late["session_id"] == 0).all()
    # ...and in-order rows are unaffected
    assert len(got[got["conv_id"] == "a"]) == 3


def test_streaming_trends_matches_expanding_numpy(spark, tmp_path):
    """Running slope/r per turn across micro-batch boundaries equals the
    expanding-window OLS closure on the full ordered series."""
    from fastselect_spark.streaming import streaming_conversation_trends

    pdf = generate_transcripts_pandas(n_convs=12, seed=7)
    cutoff = pdf["ts"].median()
    src = str(tmp_path / "in_tr")
    spark.createDataFrame(pdf[pdf.ts <= cutoff], schema=TRANSCRIPT_SCHEMA).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(pdf[pdf.ts > cutoff], schema=TRANSCRIPT_SCHEMA).write.mode(
        "append"
    ).parquet(src)

    stream = read_transcripts_stream(spark, src, max_files_per_trigger=4)
    q = (
        streaming_conversation_trends(stream)
        .writeStream.format("memory")
        .queryName("conv_trends")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.table("conv_trends")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(pdf)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for cid, grp in pdf.groupby("conv_id"):
        x = grp["turn_idx"].to_numpy(dtype=float)
        y = np.array([len(t.split()) for t in grp["text"]], dtype=float)
        sub = got[got.conv_id == cid].sort_values("turn_idx")
        for i in range(len(x)):
            row = sub.iloc[i]
            assert row["n_so_far"] == i + 1
            xs, ys = x[: i + 1], y[: i + 1]
            if i == 0 or np.ptp(xs) == 0:
                assert row["token_slope"] is None or np.isnan(row["token_slope"])
                continue
            slope = np.polyfit(xs, ys, 1)[0]
            assert row["token_slope"] == pytest.approx(slope, abs=1e-9)
            if np.ptp(ys) > 0:
                assert row["token_r"] == pytest.approx(
                    np.corrcoef(xs, ys)[0, 1], abs=1e-9
                )
