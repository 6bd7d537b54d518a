"""Point-in-time (as-of) join.

Spark has no native as-of join (SURVEY.md §2.3 "Joins"); this module
provides three strategies, all with strict zero-temporal-leakage semantics
(a feature row is visible to an anchor iff ``feature_ts <= anchor_ts``, or
``<`` when ``allow_exact_matches=False``):

- ``window``  (default): union-tag + ``last(value, ignorenulls=True)`` over
  ``(key) ORDER BY (ts, tag) ROWS UNBOUNDED PRECEDING..CURRENT``.
  Pure Catalyst — one shuffle on the key, whole-stage codegen, AQE-friendly.
- ``salted_window``: the same, but the per-key window is split into fixed
  time slices with a parallel-prefix carry pass, so a single hot key (one
  conversation with millions of turns) no longer serializes into one task.
  This is the explicit skew handling the north_rule requires.
- ``pandas``: cogrouped ``applyInPandas`` + ``pd.merge_asof`` per key group —
  vectorized Arrow path, useful when the probe side needs per-group logic.

All strategies agree exactly; tests cross-check them against a brute-force
"filter ts<=anchor then take latest" oracle (SURVEY.md §5.2 Tier 3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG_RIGHT = 0
_TAG_LEFT = 1


def _tags(allow_exact_matches: bool) -> tuple[int, int]:
    # Ordering by (ts, tag): with right-tag < left-tag an equal-ts feature
    # row sorts BEFORE the anchor and is therefore visible (exact match
    # allowed). Flipping the tags hides equal-ts rows (strict <).
    if allow_exact_matches:
        return _TAG_RIGHT, _TAG_LEFT
    return _TAG_LEFT, _TAG_RIGHT


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strategy: str = "window",
    allow_exact_matches: bool = True,
    salt_slice_seconds: float = 3600.0,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right ``value_cols`` with
    ``right_ts <= left_ts`` within the same ``on`` key.

    Returns all left columns plus one ``{col}{suffix}`` per value column
    (null when no right row qualifies).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    if strategy == "window":
        return _asof_window(
            left, right, on, left_ts, right_ts, value_cols, allow_exact_matches, suffix
        )
    if strategy == "salted_window":
        return _asof_salted_window(
            left,
            right,
            on,
            left_ts,
            right_ts,
            value_cols,
            allow_exact_matches,
            salt_slice_seconds,
            suffix,
        )
    if strategy == "pandas":
        return _asof_pandas(
            left, right, on, left_ts, right_ts, value_cols, allow_exact_matches, suffix
        )
    raise ValueError(f"unknown asof strategy: {strategy!r}")


def _union_tagged(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    allow_exact_matches: bool,
) -> tuple[DataFrame, list[str]]:
    right_tag, left_tag = _tags(allow_exact_matches)
    left_payload = [c for c in left.columns]
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in left_payload]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        F.lit(None).cast(T.StructType(left.schema.fields)).alias("__left"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    return l.unionByName(r), left_payload


def _asof_window(
    left, right, on, left_ts, right_ts, value_cols, allow_exact_matches, suffix
) -> DataFrame:
    u, left_payload = _union_tagged(
        left, right, on, left_ts, right_ts, value_cols, allow_exact_matches
    )
    _, left_tag = _tags(allow_exact_matches)
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "__tag",
        "__left",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    ).where(F.col("__tag") == left_tag)
    return filled.select(
        *[F.col("__left")[c].alias(c) for c in left_payload],
        *[F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def _asof_salted_window(
    left,
    right,
    on,
    left_ts,
    right_ts,
    value_cols,
    allow_exact_matches,
    slice_seconds,
    suffix,
) -> DataFrame:
    """Skew-proof as-of: split each key's timeline into fixed slices,
    compute each slice's closing value, forward-fill closings across slices
    (tiny table), then window only WITHIN (key, slice) partitions.

    A key with T turns becomes ceil(span/slice) independent partitions —
    the classic parallel-prefix decomposition of a running ``last``.
    """
    u, left_payload = _union_tagged(
        left, right, on, left_ts, right_ts, value_cols, allow_exact_matches
    )
    _, left_tag = _tags(allow_exact_matches)
    u = u.withColumn(
        "__slice", F.floor(F.unix_timestamp("__ts") / F.lit(float(slice_seconds)))
    )

    # Pass 1: per (key, slice) closing value of every value column —
    # last non-null in (ts, tag) order, computed with max_by over only the
    # right-side rows (cheap aggregation, no wide rows).
    right_rows = u.where(F.col("__tag") != left_tag)
    closings = right_rows.groupBy("__key", "__slice").agg(
        *[
            F.max_by(
                f"__v_{c}",
                F.when(
                    F.col(f"__v_{c}").isNotNull(),
                    F.struct(F.col("__ts"), F.col("__tag")),
                ),
            ).alias(f"__close_{c}")
            for c in value_cols
        ]
    )
    # Forward-fill closings across slices, shifted to STRICTLY-previous
    # slices: the carry entering slice s is the last closing from slices < s.
    # Materialize EVERY (key, slice) present on either side — an anchor
    # sitting in a right-empty slice still needs a carry row.
    all_slices = u.select("__key", "__slice").distinct()
    closings = all_slices.join(closings, ["__key", "__slice"], "left")
    wslice = (
        Window.partitionBy("__key")
        .orderBy("__slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = closings.select(
        "__key",
        "__slice",
        *[
            F.last(f"__close_{c}", ignorenulls=True).over(wslice).alias(f"__carry_{c}")
            for c in value_cols
        ],
    )

    # Pass 2: window within (key, slice) — hot keys split across slices —
    # then patch nulls with the carry-in.
    w = (
        Window.partitionBy("__key", "__slice")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "__key",
        "__slice",
        "__tag",
        "__left",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    ).where(F.col("__tag") == left_tag)
    joined = filled.join(carry, ["__key", "__slice"], "left")
    return joined.select(
        *[F.col("__left")[c].alias(c) for c in left_payload],
        *[
            F.coalesce(F.col(f"__f_{c}"), F.col(f"__carry_{c}")).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )


def _asof_pandas(
    left, right, on, left_ts, right_ts, value_cols, allow_exact_matches, suffix
) -> DataFrame:
    """Cogrouped-Arrow strategy: ``pd.merge_asof`` per key group.

    Mirrors the reference-era pattern of vectorized per-group kernels; the
    group is one conversation, so memory per task is bounded by the largest
    conversation (use ``salted_window`` instead when a key can be huge).
    """
    left_fields = list(left.schema.fields)
    right_schema = right.schema
    out_schema = T.StructType(
        left_fields
        + [
            T.StructField(f"{c}{suffix}", right_schema[c].dataType)
            for c in value_cols
        ]
    )
    left_cols = list(left.columns)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        l = l.sort_values(left_ts, kind="mergesort")
        if r.empty:
            out = l.copy()
            for c in value_cols:
                out[f"{c}{suffix}"] = None
            return out[[f.name for f in out_schema.fields]]
        r = r.sort_values(right_ts, kind="mergesort")
        merged = pd.merge_asof(
            l,
            r[[right_ts] + value_cols].rename(
                columns={c: f"{c}{suffix}" for c in value_cols}
            ),
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            allow_exact_matches=allow_exact_matches,
            suffixes=("", "__r"),
        )
        return merged[[f.name for f in out_schema.fields]]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
        .select(*left_cols, *[f"{c}{suffix}" for c in value_cols])
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    tolerance_s: float,
    on: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strategy: str = "window",
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join with a staleness bound (``pd.merge_asof(tolerance=...)``
    parity): a matched feature row older than ``tolerance_s`` seconds is
    treated as NO match — its value columns come back NULL. The freshness
    guard a feature store needs: without it, a conversation silent for a
    week happily serves week-old session features to today's turn.

    Built as a wrapper over :func:`asof_join`, not a fork: the value
    columns AND the matched right timestamp ride the as-of window as ONE
    struct (the scd2_lookup lesson — per-column ``last(ignorenulls)``
    carry would back-fill NULL fields from older rows), then the age
    filter nulls out stale matches. Same one-key-exchange plan, all
    three strategies available."""
    if tolerance_s < 0:
        raise ValueError(f"tolerance_s must be >= 0, got {tolerance_s}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]

    def _age(rts_col):
        # driver parquet loads ts as TIMESTAMP_NTZ — treat both flavors
        # as wall-clock; otherwise a numeric event-time axis subtracts
        # directly (same units as tolerance_s)
        if isinstance(
            left.schema[left_ts].dataType,
            (T.TimestampType, T.TimestampNTZType),
        ):
            return F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(rts_col)
        return F.col(left_ts).cast("double") - rts_col.cast("double")

    if strategy == "pandas":
        # merge_asof matches whole rows atomically, so no struct carry is
        # needed (and pandas' struct conversion rejects NaN-for-missing);
        # ride the matched right_ts as a plain duplicated column instead
        packed = right.withColumn("__rts", F.col(right_ts))
        joined = asof_join(
            left,
            packed,
            on=on,
            left_ts=left_ts,
            right_ts=right_ts,
            value_cols=[*value_cols, "__rts"],
            strategy=strategy,
            allow_exact_matches=allow_exact_matches,
            suffix=suffix,
        )
        fresh = _age(F.col(f"__rts{suffix}")) <= F.lit(float(tolerance_s))
        out = joined
        for c in value_cols:
            out = out.withColumn(f"{c}{suffix}", F.when(fresh, F.col(f"{c}{suffix}")))
        return out.drop(f"__rts{suffix}")

    packed = right.withColumn(
        "__asof_row",
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(right_ts).alias("__rts"),
        ),
    )
    joined = asof_join(
        left,
        packed,
        on=on,
        left_ts=left_ts,
        right_ts=right_ts,
        value_cols=["__asof_row"],
        strategy=strategy,
        allow_exact_matches=allow_exact_matches,
        suffix=suffix,
    )
    row = f"__asof_row{suffix}"
    fresh = _age(F.col(f"{row}.__rts")) <= F.lit(float(tolerance_s))
    out = joined
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.when(fresh, F.col(f"{row}.{c}")))
    return out.drop(row)
