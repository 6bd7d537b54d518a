"""SCD2 validity intervals from a change stream — the feature-store
dimension builder that pairs with the as-of join: given per-key change
events ``(key, ts, value...)``, emit slowly-changing-dimension rows with
``[valid_from, valid_to)`` intervals (``valid_to`` NULL = current), so a
point-in-time lookup becomes a plain interval/as-of join with zero
temporal leakage (featurize/asof.py consumes exactly this shape).

Graft-added (the reference has no temporal surface). Scale shape: ONE
hash exchange on the key; both windows (the change-collapse lag pass and
the valid_to lead pass) share that partitioning — Catalyst plans a
single Exchange for the whole build. ``collapse=True`` drops no-change
events first (null-safe comparison per value column), so re-delivered
identical snapshots don't fragment intervals — the idempotence an
ingest-driven dimension needs.

Determinism: rows are ordered by (ts, tie-break columns); with one
change per (key, ts) the output is unique. Equal-timestamp distinct
changes need a tie-break column (pass ``order_cols``) — otherwise which
one wins is undefined, same caveat as any SCD2 loader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    collapse: bool = True,
) -> DataFrame:
    """(key..., value..., valid_from, valid_to, is_current): SCD2 rows
    from change events. ``value_cols`` defaults to every non-key,
    non-timestamp column."""
    if value_cols is None:
        drop = set(key_cols) | {ts_col} | set(order_cols or [])
        value_cols = [c for c in df.columns if c not in drop]
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    if collapse:
        changed: Column = F.lit(False)
        for c in value_cols:
            # null-safe "value differs from previous row"
            changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        first = F.lag(ts_col).over(w).isNull()
        df = df.withColumn("__keep", first | changed).where(F.col("__keep"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    out = df.select(
        *key_cols,
        *value_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull().cast("int"))
