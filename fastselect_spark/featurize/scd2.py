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

_SEP = "\x1f"  # multi-column key separator (the repo's canonical-row sep)


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


def scd2_lookup(
    probes: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    at_col: str = "ts",
    value_cols: list[str] | None = None,
    strategy: str = "window",
    suffix: str = "_dim",
) -> DataFrame:
    """Point-in-time dimension lookup: for each probe row, attach the
    ``value_cols`` of the interval covering ``at_col`` (``valid_from <=
    at < valid_to``, NULL ``valid_to`` = open), or NULLs when no interval
    covers it (probe before the first change, or inside a gap of a
    filtered/TTL'd dimension).

    Scale shape: Spark plans a raw ``BETWEEN``-style interval join as a
    BroadcastNestedLoopJoin — quadratic per key and a non-starter at
    dimension scale. Because SCD2 intervals are non-overlapping and
    sorted per key, the lookup is instead an AS-OF join on ``valid_from``
    (featurize/asof.py — one key exchange, window codegen, salted
    variant for hot keys) plus a residual ``at < valid_to`` null-out.
    Multi-column keys are joined on a chr(31)-canonical concat (the
    dataset-checksum convention); NULL key components follow SQL join
    semantics (never match)."""
    if value_cols is None:
        drop = set(key_cols) | {"valid_from", "valid_to", "is_current"}
        value_cols = [c for c in dim.columns if c not in drop]
    from fastselect_spark.featurize.asof import asof_join

    if len(key_cols) == 1:
        key = key_cols[0]
        p, d = probes, dim
        drop_key = []
    else:
        key = "__scd2_key"
        canon = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
        null_any = None
        for c in key_cols:
            cond = F.col(c).isNull()
            null_any = cond if null_any is None else (null_any | cond)
        p = probes.withColumn(key, F.when(~null_any, canon))
        d = dim.withColumn(key, F.when(~null_any, canon))
        drop_key = [key]
    # NULL-key dimension rows can never match under SQL join semantics, but
    # Window.partitionBy GROUPS null keys, so a NULL-key probe would see
    # them (round-5 ADVICE fix): drop them from the dimension side — the
    # NULL-key probes then find no interval and get NULL values, as
    # documented.
    d = d.where(F.col(key).isNotNull())
    # Carry the WHOLE interval row as one struct: the as-of window carries
    # each value column independently with last(..., ignorenulls=True), so a
    # legitimately-NULL field (the open interval's valid_to, or a NULL
    # attribute) would otherwise be back-filled from an OLDER interval —
    # the struct keeps the matched interval atomic.
    d = d.withColumn(
        "__scd2_row",
        F.struct(
            *[F.col(c) for c in value_cols], F.col("valid_to").alias("__vt")
        ),
    )
    joined = asof_join(
        p,
        d,
        on=key,
        left_ts=at_col,
        right_ts="valid_from",
        value_cols=["__scd2_row"],
        strategy=strategy,
        suffix=suffix,
    )
    row = f"__scd2_row{suffix}"
    covered = F.col(f"{row}.__vt").isNull() | (
        F.col(at_col) < F.col(f"{row}.__vt")
    )
    out = joined
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.when(covered, F.col(f"{row}.{c}")))
    return out.drop(row, *drop_key)
