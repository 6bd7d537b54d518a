"""Custom stateful streaming operator: per-conversation running features.

``applyInPandasWithState`` maintains explicit per-``conv_id`` state across
micro-batches — (last event time, current session id, turns so far, tokens
so far) — and emits one row per arriving turn carrying the running values:
the streaming counterpart of the batch layer's cumulative windows
(``tool_calls_so_far``-style features) for continuously-arriving
transcripts. This is the "custom stateful operator" path for semantics
``session_window``/built-in aggregations can't express (per-ROW running
state, not per-window aggregates).

State is bounded: one small tuple per active conversation, dropped after
``state_ttl_minutes`` of EVENT-TIME inactivity — the timeout timestamp is
(last event ts + ttl) and fires when the watermark passes it. Event-time
timers (not processing-time) matter beyond semantics: a processing-time
timer keeps an availableNow/backfill run alive spinning EMPTY micro-batches
until the wall-clock timer fires (measured: hundreds of 0-row batches and
an awaitTermination timeout), whereas event-time timers drain in one final
timer batch once the data is exhausted. Within a micro-batch, rows are
processed in (conv_id, ts) order; in-order arrival per conversation is
assumed (the Kafka-partition-by-conv_id layout); late cross-batch rows —
even rows arriving BEHIND the current watermark — still reach the state
function and get a fresh-session fallback rather than corrupting state.
That is the verified PySpark 4.1 contract for applyInPandasWithState:
unlike watermarked aggregations/dedup, the watermark does NOT filter this
operator's input (a batch running at watermark 11:51 still delivered and
emitted an 11:01 row, numRowsDroppedByWatermark 0 — pinned by
tests/test_streaming_stateful.py); it only advances the event-time clock
the TTL timers fire against. Callers needing aggregate-style late-row
DROPPING must pre-filter explicitly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("turns_so_far", T.LongType()),
        T.StructField("tokens_so_far", T.DoubleType()),
        T.StructField("tool_calls_so_far", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("turns", T.LongType()),
        T.StructField("tokens", T.DoubleType()),
        T.StructField("tool_calls", T.LongType()),
    ]
)


def _progress_fn(gap_seconds: float, state_ttl_minutes: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_ts_us, session_id, turns, tokens, tool_calls = state.get
        else:
            last_ts_us, session_id, turns, tokens, tool_calls = -1, 0, 0, 0.0, 0
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            # (ts, turn_idx) matches the batch oracle's window tie-break for
            # equal-timestamp turns within a conversation
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            n_tok = pdf["text"].fillna("").str.split().str.len().astype(float)
            has_tool = pdf["tool"].notna()
            rows = {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"],
                "ts": pdf["ts"],
                "session_id": [],
                "turns_so_far": [],
                "tokens_so_far": [],
                "tool_calls_so_far": [],
            }
            for t_us, nt, ht in zip(ts_us, n_tok, has_tool):
                # second-truncated gap, matching the batch sessionizer's
                # unix_timestamp semantics exactly
                if (
                    last_ts_us >= 0
                    and (t_us // 1_000_000 - last_ts_us // 1_000_000) > gap_seconds
                ):
                    session_id += 1
                last_ts_us = int(t_us)
                turns += 1
                tokens += float(nt)
                tool_calls += int(ht)
                rows["session_id"].append(session_id)
                rows["turns_so_far"].append(turns)
                rows["tokens_so_far"].append(tokens)
                rows["tool_calls_so_far"].append(tool_calls)
            out.append(pd.DataFrame(rows))
        state.update((last_ts_us, session_id, turns, tokens, tool_calls))
        # Event-time TTL: fire when the watermark passes last event + ttl.
        # The timestamp must be strictly above the current watermark or
        # Spark rejects it — clamp for stragglers already behind it.
        expiry_ms = last_ts_us // 1000 + int(state_ttl_minutes) * 60_000
        state.setTimeoutTimestamp(max(expiry_ms, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.concat(out, ignore_index=True)

    return fn


def stateful_conversation_progress(
    stream: DataFrame,
    gap_seconds: float = 300.0,
    state_ttl_minutes: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Running per-turn conversation features with explicit keyed state.

    ``watermark`` bounds how long expired state lingers (it advances the
    event-time clock the TTL timers fire against). It does NOT filter
    input: beyond-watermark rows still reach the state function and emit
    (the pinned applyInPandasWithState contract — see module docstring)."""
    return stream.withWatermark("ts", watermark).groupBy("conv_id").applyInPandasWithState(
        _progress_fn(gap_seconds, state_ttl_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
