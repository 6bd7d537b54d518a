"""Per-conversation regular-grid resampling — turn an irregular turn
timeline into fixed-step time-series rows, each carrying the point-in-time
(backward as-of) value of the requested feature columns.

Composition, not a new kernel: ONE min/max agg per conversation defines
the grid, ``sequence()`` + ``explode`` generates it (JVM-side, no Python),
and the existing :func:`fastselect_spark.featurize.asof.asof_join` (any
strategy) attaches the latest feature at each grid point — so resampling
inherits the as-of join's leakage guarantee and skew handling for free.

Scale note: grid length per conversation = duration / step. A pathological
conversation spanning years at a 1-second step would explode the grid, so
``max_points`` hard-caps the per-conversation grid (grid truncates at
``min_ts + max_points * step``); the cap is a row-local LEAST on the
sequence bound, not a driver check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.featurize.asof import asof_join


def resample_grid(
    df: DataFrame,
    value_cols: list[str],
    step_seconds: int,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    max_points: int = 10_000,
    strategy: str = "window",
) -> DataFrame:
    """Regular grid per conversation from its first to its last event at
    ``step_seconds`` spacing; each grid row gets ``{col}_asof`` = the
    latest value with event ts <= grid ts. Grid timestamps are aligned to
    the conversation's own min(ts) (not a global epoch)."""
    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    bounds = df.groupBy(conv_col).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    cap = F.col("__lo") + F.expr(
        f"make_dt_interval(0, 0, 0, CAST({max_points} AS DOUBLE) * {step_seconds})"
    )
    grid = bounds.select(
        conv_col,
        F.explode(
            F.sequence(
                F.col("__lo"),
                F.least(F.col("__hi"), cap),
                F.expr(f"interval {int(step_seconds)} seconds"),
            )
        ).alias(ts_col),
    )
    return asof_join(
        grid,
        df.select(conv_col, ts_col, *value_cols),
        on=conv_col,
        left_ts=ts_col,
        right_ts=ts_col,
        value_cols=value_cols,
        strategy=strategy,
    )
