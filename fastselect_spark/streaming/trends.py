"""Streaming per-conversation trend state — the incremental counterpart
of the batch ``featurize/convagg.py conversation_trends`` OLS: explicit
keyed state carries the (n, Σx, Σx², Σy, Σy², Σxy) sufficient statistics
of token count over turn order, updated per arriving turn, and every turn
emits the RUNNING slope/r (the live "is this conversation inflating?"
signal a monitoring pipeline consumes without ever re-scanning history).

Same ``applyInPandasWithState`` contract as stateful.py (the pinned
PySpark 4.1 semantics: watermark advances the event-time clock for the
TTL timers but does NOT filter input; in-order arrival per conversation
assumed, (ts, turn_idx)-sorted within each batch). State is one tuple of
LONGS per active conversation — the sums are exact integers (turn index,
whitespace token counts), so the running state is EXACT at any prefix and
the emitted slope/r equal the batch expanding-window closure bit for bit.
State TTL-evicts after event-time inactivity, bounding memory on an
unbounded ingest.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRENDS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("n_so_far", T.LongType()),
        T.StructField("token_slope", T.DoubleType()),
        T.StructField("token_r", T.DoubleType()),
    ]
)

TRENDS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sx", T.LongType()),
        T.StructField("sxx", T.LongType()),
        T.StructField("sy", T.LongType()),
        T.StructField("syy", T.LongType()),
        T.StructField("sxy", T.LongType()),
    ]
)


def _trends_fn(state_ttl_minutes: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_ts_us, n, sx, sxx, sy, syy, sxy = state.get
        else:
            last_ts_us, n, sx, sxx, sy, syy, sxy = -1, 0, 0, 0, 0, 0, 0
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            ts_us = pdf["ts"].astype("int64") // 1000
            n_tok = pdf["text"].fillna("").str.split().str.len()
            rows = {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"],
                "ts": pdf["ts"],
                "n_so_far": [],
                "token_slope": [],
                "token_r": [],
            }
            for t_us, xi, yi in zip(ts_us, pdf["turn_idx"], n_tok):
                x, y = int(xi), int(yi)
                n += 1
                sx += x
                sxx += x * x
                sy += y
                syy += y * y
                sxy += x * y
                last_ts_us = int(t_us)
                # float closure in the batch oracle's operand order
                nf = float(n)
                num = nf * sxy - float(sx) * sy
                dx = nf * sxx - float(sx) * sx
                dy = nf * syy - float(sy) * sy
                slope = num / dx if dx > 0 else None
                r = num / (dx * dy) ** 0.5 if dx > 0 and dy > 0 else None
                rows["n_so_far"].append(n)
                rows["token_slope"].append(slope)
                rows["token_r"].append(r)
            out.append(pd.DataFrame(rows))
        state.update((last_ts_us, n, sx, sxx, sy, syy, sxy))
        expiry_ms = last_ts_us // 1000 + int(state_ttl_minutes) * 60_000
        state.setTimeoutTimestamp(
            max(expiry_ms, state.getCurrentWatermarkMs() + 1)
        )
        if out:
            yield pd.concat(out, ignore_index=True)

    return fn


def streaming_conversation_trends(
    stream: DataFrame,
    state_ttl_minutes: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Running OLS token trend per conversation with explicit keyed state.
    Emits one row per arriving turn carrying (n_so_far, token_slope,
    token_r) computed over all turns seen so far — exact-integer state, so
    every emission equals the batch expanding-window closure."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _trends_fn(state_ttl_minutes),
            outputStructType=TRENDS_OUTPUT_SCHEMA,
            stateStructType=TRENDS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
