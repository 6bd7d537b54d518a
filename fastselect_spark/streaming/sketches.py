"""Streaming HyperLogLog: bounded-state windowed distinct counting.

Graft-added. A streaming ``COUNT(DISTINCT ...)`` keeps every value seen
in state — unbounded on a 100 TB ingest. The HLL register table is the
bounded replacement: per (event-time window, group) the state is exactly
2^p register maxima, maintained by ONE streaming aggregation
(``max`` per register merges monotonically, so late in-window rows fold
in correctly and the state never grows past windows x groups x 2^p).

Two-level folds (register max -> harmonic estimate) can't run as chained
streaming aggregations in complete/update mode, so the design splits at
the natural merge boundary:

- :func:`streaming_hll_registers` — the streaming query: maintains the
  register table (this IS the mergeable sketch — what a 1000-executor
  ingest would checkpoint and ship).
- :func:`hll_estimate_from_window_registers` — the batch finalize over
  the sink: REUSES corpus/sketches.py ``hll_estimate_from_registers``,
  so stream + finalize is bit-identical to running the batch
  ``hll_distinct`` over each window's slice (that equality is the
  contract oracle).

With a watermark the sink can run append (windows finalize and evict);
without one, run complete/update — the monitoring configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.corpus.sketches import (
    hll_estimate_from_registers,
    hll_register_rows,
)


def streaming_hll_registers(
    stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
    window: str = "5 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """(window_start, group_cols..., __idx, __m): the per-window HLL
    register table, maintained by one streaming max-aggregation. Pass
    ``slide`` for OVERLAPPING windows (each row feeds window/slide
    register sets — state scales by the overlap factor, still bounded
    and row-count-independent)."""
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    rows = hll_register_rows(stream, [ts_col, *group_cols], value_col, p)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        rows.groupBy(win, *group_cols, "__idx")
        .agg(F.max("__rho").alias("__m"))
        .select(
            F.col("window.start").alias("window_start"), *group_cols,
            "__idx", "__m",
        )
    )


def hll_estimate_from_window_registers(
    regs: DataFrame, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Finalize a (window_start, group...) register table into per-window
    distinct estimates — the same fold the batch path uses."""
    return hll_estimate_from_registers(regs, ["window_start", *group_cols], p)


def streaming_countmin_registers(
    stream: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    window: str = "5 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """(window_start, row, bucket, cnt): per-window count-min counter
    table maintained by ONE streaming sum-aggregation — counters merge
    ADDITIVELY across micro-batches, so the state is exactly
    windows x depth x width longs however many keys stream through (the
    bounded-state frequency companion of :func:`streaming_hll_registers`).
    Estimates come from the batch :func:`fastselect_spark.corpus.
    countmin_lookup` over the sink — identical math by construction."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    buckets = [
        F.expr(
            f"CAST(conv(substring(md5(CONCAT('{j}:', CAST({key_col} AS STRING))),"
            f" 1, 15), 16, 10) AS BIGINT) % {width}"
        ).alias(f"__b{j}")
        for j in range(depth)
    ]
    wexpr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    wide = stream.where(F.col(key_col).isNotNull()).select(
        ts_col, *buckets, wexpr.alias("__w")
    )
    stack = ", ".join(f"{j}, __b{j}" for j in range(depth))
    melted = wide.selectExpr(
        ts_col, f"stack({depth}, {stack}) AS (row, bucket)", "__w"
    )
    return (
        melted.groupBy(F.window(ts_col, window), "row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
        .select(F.col("window.start").alias("window_start"), "row", "bucket", "cnt")
    )
