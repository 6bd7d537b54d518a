"""Window featurization over the transcripts table.

Everything here is Window + built-in expressions (SURVEY.md §2.3
"Window functions"): lag/lead, turn gaps, gap-based sessionization,
role-run lengths, rolling token statistics, and forward-fill (backfill).
No Python UDFs — the whole layer stays inside WholeStageCodegen.

Scale notes: every window below partitions by ``conv_id``, so Catalyst
plans ONE hash exchange on conv_id reused by all window operators in a
combined featurize job (verify with ``.explain``: a single Exchange
feeding consecutive Window nodes). Per-conversation data is bounded
(conversations are short relative to partitions), so in-partition sorts
are cheap; a pathological million-turn conversation is handled by the
salted two-pass prefix pattern in ``asof.py``.

Temporal-leakage discipline: every frame ends at the CURRENT row
(``rowsBetween(start, 0)`` / ``rangeBetween(start, 0)``) — no frame ever
looks ahead, which is the zero-leakage invariant (BASELINE.json north_rule);
``lead`` columns are provided only for explicitly-named future-feature use
and are excluded from the default feature matrix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

SESSION_GAP_SECONDS = 300.0


def _conv_window(order_col: str = "turn_idx") -> WindowSpec:
    return Window.partitionBy("conv_id").orderBy(order_col)


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count — the reference-free text size surrogate."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, r"\s+"))


def add_stable_order(df: DataFrame) -> DataFrame:
    """row_number over (conv_id, turn_idx) — the stable per-turn identity
    (per-row invariant: text equality under this ordering, BASELINE.json:15)."""
    return df.withColumn("turn_seq", F.row_number().over(_conv_window()))


def add_turn_gap(df: DataFrame) -> DataFrame:
    """Seconds since previous turn in the conversation (null -> 0 on first)."""
    w = _conv_window()
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return df.withColumn("turn_gap_s", F.coalesce(gap.cast("double"), F.lit(0.0)))


def add_lag_lead(df: DataFrame, cols: list[str], offsets: tuple[int, ...] = (1,)) -> DataFrame:
    """lag_k / lead_k columns for the named columns."""
    w = _conv_window()
    for c in cols:
        for k in offsets:
            df = df.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
            df = df.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
    return df


def add_sessions(df: DataFrame, gap_seconds: float = SESSION_GAP_SECONDS) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous turn exceeds ``gap_seconds``; session_id is the running
    count of session starts (cumulative sum over an at-or-before frame —
    never looks ahead)."""
    w = _conv_window()
    prev_ts = F.lag("ts").over(w)
    is_start = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    df = df.withColumn("session_start", is_start)
    cum = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_id", F.sum("session_start").over(cum) - 1)


def add_role_runs(df: DataFrame) -> DataFrame:
    """Run-id of consecutive same-role turns and the running length of the
    current run (leakage-safe: counts only turns at or before the current).

    role_run_len is derived inside the SAME (conv_id, turn_idx) window spec
    as everything else — current row_number minus the row_number at the
    run's start — so Catalyst fuses it into the shared Window node instead
    of planning an extra full-table Sort on (conv_id, role_run_id)."""
    w = _conv_window()
    changed = F.when(
        F.lag("role").over(w).isNull() | (F.col("role") != F.lag("role").over(w)),
        F.lit(1),
    ).otherwise(F.lit(0))
    df = df.withColumn("role_changed", changed)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    df = df.withColumn("role_run_id", F.sum("role_changed").over(cum) - 1)
    seq = F.row_number().over(w)
    run_start_seq = F.max(F.when(F.col("role_changed") == 1, seq)).over(cum)
    return df.withColumn(
        "role_run_len", (seq - run_start_seq + F.lit(1)).cast("long")
    )


def add_rolling_token_stats(df: DataFrame, k: int = 5) -> DataFrame:
    """Token count per turn + rolling sum/avg/stddev over the last ``k+1``
    turns (row frame) and over the trailing 10 minutes (range frame)."""
    if "n_tokens" not in df.columns:
        df = df.withColumn("n_tokens", token_count("text").cast("double"))
    row_w = _conv_window().rowsBetween(-k, 0)
    df = (
        df.withColumn(f"tokens_sum_{k}", F.sum("n_tokens").over(row_w))
        .withColumn(f"tokens_avg_{k}", F.avg("n_tokens").over(row_w))
        .withColumn(
            f"tokens_std_{k}",
            F.coalesce(F.stddev_samp("n_tokens").over(row_w), F.lit(0.0)),
        )
    )
    range_w = (
        Window.partitionBy("conv_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-600, 0)
    )
    return df.withColumn("tokens_sum_10m", F.sum("n_tokens").over(range_w))


def add_multi_horizon_stats(
    df: DataFrame,
    value_col: str = "n_tokens",
    horizons_s: tuple[int, ...] = (60, 600, 3600),
    include_rates: bool = True,
) -> DataFrame:
    """Feature-store-style multi-horizon point-in-time aggregates: for each
    trailing time horizon h, the count / sum / mean of ``value_col`` over
    the window ``(ts - h, ts]`` within the conversation, plus (optionally)
    an events-per-minute rate.

    All horizons share the SAME partition key (conv_id) and ordering
    (epoch seconds), so Catalyst plans ONE hash exchange and ONE sort for
    the entire stack — adding a horizon costs one extra Window operator on
    already-sorted partitions, never another shuffle. Frames end at the
    current row (leakage-safe, like every frame in this module); rows with
    equal timestamps see each other, matching SQL RANGE semantics exactly.

    At 10^12 turns this is the cheap way to get k horizons: the naive
    per-horizon self-join (`events e JOIN events w ON w.ts BETWEEN e.ts-h
    AND e.ts`) shuffles the table k times and inflates it by the mean
    window size; this is one shuffle total and zero inflation.
    """
    if value_col == "n_tokens" and "n_tokens" not in df.columns:
        df = df.withColumn("n_tokens", token_count("text").cast("double"))
    order = F.unix_timestamp("ts")
    for h in horizons_s:
        w = Window.partitionBy("conv_id").orderBy(order).rangeBetween(-int(h), 0)
        df = (
            df.withColumn(f"{value_col}_cnt_{h}s", F.count(value_col).over(w))
            .withColumn(f"{value_col}_sum_{h}s", F.sum(value_col).over(w))
            .withColumn(f"{value_col}_avg_{h}s", F.avg(value_col).over(w))
        )
        if include_rates:
            df = df.withColumn(
                f"{value_col}_per_min_{h}s",
                F.col(f"{value_col}_cnt_{h}s") / F.lit(h / 60.0),
            )
    return df


def add_backfill(df: DataFrame, cols: list[str]) -> DataFrame:
    """Forward-fill: latest non-null value at or before the current turn
    (``last(..., ignorenulls=True)`` over an unbounded-preceding frame)."""
    w = _conv_window().rowsBetween(Window.unboundedPreceding, 0)
    for c in cols:
        df = df.withColumn(f"{c}_ffill", F.last(c, ignorenulls=True).over(w))
    return df


def add_tool_call_counts(df: DataFrame) -> DataFrame:
    """Cumulative count of tool calls up to and including the current turn."""
    cum = _conv_window().rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        "tool_calls_so_far",
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).over(cum),
    )


DEFAULT_FEATURE_COLS = [
    "turn_gap_s",
    "session_id",
    "role_run_len",
    "n_tokens",
    "tokens_sum_5",
    "tokens_avg_5",
    "tokens_std_5",
    "tokens_sum_10m",
    "tool_calls_so_far",
    "n_tokens_lag1",
    "role_match_lag1",
]


def featurize_transcripts(
    df: DataFrame, gap_seconds: float = SESSION_GAP_SECONDS, k: int = 5
) -> DataFrame:
    """The full leakage-safe featurize pass: one shuffle on conv_id, then a
    stack of Window operators sharing that partitioning.

    Output: input columns + ``DEFAULT_FEATURE_COLS`` + ``label``
    (1 if this turn called a tool — FIXTURES.md §A derived label).
    """
    # Derive n_tokens BEFORE any window: the expression then evaluates in
    # the scan-side project, so when a consumer doesn't select ``text``
    # Catalyst prunes it out of the conv_id Exchange — at 10^12 turns the
    # text column is ~25x the bytes of every other column combined, and
    # this keeps it off the wire entirely for numeric-feature pipelines.
    df = df.withColumn("n_tokens", token_count("text").cast("double"))
    df = add_stable_order(df)
    df = add_turn_gap(df)
    df = add_sessions(df, gap_seconds)
    df = add_role_runs(df)
    df = add_rolling_token_stats(df, k)
    df = add_tool_call_counts(df)
    w = _conv_window()
    df = df.withColumn(
        "n_tokens_lag1", F.coalesce(F.lag("n_tokens").over(w), F.lit(0.0))
    )
    df = df.withColumn(
        "role_match_lag1",
        F.when(F.lag("role").over(w) == F.col("role"), 1.0).otherwise(0.0),
    )
    df = df.withColumn(
        "label", F.when(F.col("tool").isNotNull(), 1).otherwise(0)
    )
    return df
