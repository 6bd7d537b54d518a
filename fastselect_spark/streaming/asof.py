"""Streaming point-in-time (as-of) enrichment — the ingest-time
counterpart of the batch as-of join (featurize/asof.py), which is the
engine's core operator (north_rule): each arriving turn is matched against
the LATEST feature row of its conversation with ``f_ts <= ts`` (and
``f_ts >= ts - tolerance`` when a tolerance is set), with zero temporal
leakage — a turn can never see a feature from its future.

Why not a stream-stream interval join: Spark's stream-stream join emits
EVERY feature row in the interval, and reducing that to the latest-per-turn
needs a second stateful aggregation stage (two state stores, two
watermarks, and a multi-stage append pipeline). A single keyed
``applyInPandasWithState`` over the TAGGED UNION of the two streams holds
each conversation's feature timeline in state and resolves the backward
match in one pass — one shuffle on conv_id (the same key the batch
featurize/as-of pipeline partitions by), bounded state, append output.

Semantics / oracle contract: event-time, not arrival-time — a feature and
the turns it serves may arrive in the SAME micro-batch (the batch is
sorted by event time before matching). Provided every feature row arrives
no later than the first turn batch with ``ts >= f_ts`` (true for
time-ordered arrival waves, the file-source fixture), the emitted result
equals the batch as-of join on the union of all batches — that batch SQL
is the driver-contract oracle. Conversations are evicted after
``state_ttl_minutes`` of event-time inactivity (the stateful.py
timer pattern); with a TTL longer than the run, streaming == batch
exactly.

State is bounded: per conversation, features older than the newest turn
already processed minus the tolerance can never match a future turn under
time-ordered arrival, so the buffer is pruned to the tolerance horizon
(always keeping the single latest feature for the no-tolerance backward
match); whole conversations are TTL-evicted by the event-time timer.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("fval_asof", T.DoubleType()),
        T.StructField("f_ts_asof", T.TimestampType()),
    ]
)

ASOF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("f_ts_us", T.ArrayType(T.LongType())),
        T.StructField("f_val", T.ArrayType(T.DoubleType())),
        T.StructField("max_turn_ts_us", T.LongType()),
    ]
)


def _asof_fn(tolerance_s: float | None, state_ttl_minutes: int):
    tol_us = None if tolerance_s is None else int(tolerance_s * 1_000_000)

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            f_ts_raw, f_val_raw, max_turn_us = state.get
            f_ts = list(f_ts_raw)
            f_val = list(f_val_raw)
        else:
            f_ts, f_val, max_turn_us = [], [], -1

        frames = [p for p in pdfs if not p.empty]
        if not frames:
            # defensive: data-free invocation that is not a timeout
            state.update((f_ts, f_val, int(max_turn_us)))
            _arm_timer(state, f_ts, max_turn_us, state_ttl_minutes)
            return

        rows = pd.concat(frames, ignore_index=True)
        ts_us = (
            rows["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
            // 1_000
        )
        rows = rows.assign(__ts_us=ts_us)
        feats = rows[rows["kind"] == 0]
        if len(feats):
            f_ts.extend(int(v) for v in feats["__ts_us"])
            f_val.extend(float(v) for v in feats["fval"])
            order = np.argsort(np.asarray(f_ts, dtype=np.int64), kind="stable")
            f_ts = [f_ts[i] for i in order]
            f_val = [f_val[i] for i in order]

        turns = rows[rows["kind"] == 1].sort_values(
            ["__ts_us", "turn_idx"], kind="mergesort"
        )
        out = None
        if len(turns):
            t_us = turns["__ts_us"].to_numpy(dtype=np.int64)
            max_turn_us = max(int(max_turn_us), int(t_us.max()))
            fts_arr = np.asarray(f_ts, dtype=np.int64)
            vals = np.full(len(t_us), np.nan)
            mts = np.full(
                len(t_us), np.datetime64("NaT"), dtype="datetime64[us]"
            )
            if len(fts_arr):
                idx = np.searchsorted(fts_arr, t_us, side="right") - 1
                ok = idx >= 0
                if tol_us is not None:
                    matched_ts = np.where(ok, fts_arr[np.maximum(idx, 0)], 0)
                    ok &= matched_ts >= t_us - tol_us
                sel = np.maximum(idx, 0)
                fval_arr = np.asarray(f_val, dtype=np.float64)
                vals[ok] = fval_arr[sel[ok]]
                mts[ok] = fts_arr[sel[ok]].astype("datetime64[us]")
            out = pd.DataFrame(
                {
                    "conv_id": turns["conv_id"].to_numpy(),
                    "turn_idx": turns["turn_idx"].astype("int32").to_numpy(),
                    "ts": turns["ts"].to_numpy(),
                    "fval_asof": vals,
                    "f_ts_asof": mts,
                }
            )

        # prune: under time-ordered arrival no future turn can match below
        # (max_turn_ts - tolerance); always keep the latest feature
        if tol_us is not None and max_turn_us >= 0 and len(f_ts) > 1:
            floor_us = max_turn_us - tol_us
            keep_from = 0
            for i in range(len(f_ts) - 1):  # never drop the last
                if f_ts[i] < floor_us:
                    keep_from = i + 1
                else:
                    break
            f_ts = f_ts[keep_from:]
            f_val = f_val[keep_from:]

        state.update((f_ts, f_val, int(max_turn_us)))
        _arm_timer(state, f_ts, max_turn_us, state_ttl_minutes)
        if out is not None and len(out):
            yield out

    return fn


def _arm_timer(
    state: GroupState, f_ts: list[int], max_turn_us: int, ttl_minutes: int
) -> None:
    last_us = max([max_turn_us] + (f_ts[-1:] if f_ts else []))
    if last_us < 0:
        last_us = 0
    expiry_ms = last_us // 1000 + int(ttl_minutes) * 60_000
    state.setTimeoutTimestamp(max(expiry_ms, state.getCurrentWatermarkMs() + 1))


def streaming_asof_enrich(
    turns: DataFrame,
    features: DataFrame,
    fval_col: str = "fval",
    tolerance_s: float | None = None,
    watermark: str = "10 minutes",
    state_ttl_minutes: int = 60,
) -> DataFrame:
    """Point-in-time enrichment of a turn stream against a feature stream.

    ``turns`` needs (conv_id, turn_idx, ts); ``features`` needs
    (conv_id, ts, <fval_col>). Returns the turn rows with ``fval_asof`` /
    ``f_ts_asof`` (null when no feature is in scope — left-join shape).
    Both inputs are tagged and unioned so ONE keyed state operator (one
    conv_id shuffle) resolves the backward match; see module docstring for
    the exact-equality-to-batch conditions."""
    f = features.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.col("ts"),
        F.col(fval_col).cast("double").alias("fval"),
    )
    t = turns.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.lit(1).alias("kind"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("ts"),
        F.lit(None).cast("double").alias("fval"),
    )
    return (
        f.unionByName(t)
        .withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _asof_fn(tolerance_s, state_ttl_minutes),
            outputStructType=OUT_SCHEMA,
            stateStructType=ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
