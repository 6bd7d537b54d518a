"""Conversation-level aggregate features — the per-entity summary matrix
(one row per conv_id) that sits beside the per-turn matrix: length,
duration, session count, tool-call rate, token stats, and role entropy.

ONE groupBy(conv_id) aggregation (map-side partials, a single exchange on
the same key every other featurize op shuffles by). Role entropy is an
exact expression over the per-role counts: the aggregation carries one
conditional count per role of the fixed transcript role alphabet
(user/assistant/tool) — no second pass, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROLES = ("user", "assistant", "tool")


def _entropy_from_counts(counts: list[Column], total: Column) -> Column:
    """-sum p*ln(p) over nonzero role counts (natural log)."""
    terms = []
    for c in counts:
        p = c.cast("double") / total.cast("double")
        terms.append(F.when(c > 0, -p * F.log(p)).otherwise(F.lit(0.0)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def conversation_features(
    feat: DataFrame, conv_col: str = "conv_id"
) -> DataFrame:
    """Per-conversation summary matrix from the featurized turn frame
    (needs ts, session_id, tool, n_tokens — i.e. featurize_transcripts
    output). Timestamps aggregate as whole-second epochs (the engine's
    unix_timestamp convention)."""
    role_counts = [
        F.sum((F.col("role") == r).cast("long")).alias(f"__n_{r}")
        for r in ROLES
    ]
    agg = feat.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("double")
        .alias("duration_s"),
        (F.max("session_id") + 1).cast("long").alias("n_sessions"),
        F.sum(F.col("tool").isNotNull().cast("long"))
        .cast("long")
        .alias("n_tool_calls"),
        F.sum("n_tokens").cast("double").alias("tokens_total"),
        F.avg("n_tokens").alias("tokens_avg"),
        *role_counts,
    )
    n = F.col("n_turns")
    counts = [F.col(f"__n_{r}") for r in ROLES]
    return agg.select(
        conv_col,
        "n_turns",
        "duration_s",
        "n_sessions",
        "n_tool_calls",
        (F.col("n_tool_calls").cast("double") / n.cast("double")).alias(
            "tool_rate"
        ),
        "tokens_total",
        "tokens_avg",
        _entropy_from_counts(counts, n).alias("role_entropy"),
    )


def role_transition_matrix(
    tr: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """(from_role, to_role, n, p) — the corpus-wide Markov transition
    matrix of turn roles: how often each role is followed by each other
    role within a conversation, with the row-conditional probability
    p = n / Σ_to n.

    Shape: one lead() window on the conv_id exchange every featurize op
    already shuffles by, one (from, to) hash aggregation (map-side
    partials absorb the corpus before the pair shuffle), and the
    probability normalization is a window over the ≤|roles|² aggregated
    rows — bounded by the role alphabet, never by the corpus."""
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(order_col)
    pairs = (
        tr.select(
            F.col(role_col).alias("from_role"),
            F.lead(role_col).over(w).alias("to_role"),
        )
        .where(F.col("to_role").isNotNull())
        .groupBy("from_role", "to_role")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_role")
    return pairs.select(
        "from_role",
        "to_role",
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.sum("n").over(wf)).alias("p"),
    )


def tool_cooccurrence_pmi(
    tr: DataFrame,
    conv_col: str = "conv_id",
    item_col: str = "tool",
    min_count: int = 1,
) -> DataFrame:
    """(item_a, item_b, n_ab, pmi) — pointwise mutual information of tool
    co-usage within a conversation: pmi = ln(N · n_ab / (n_a · n_b)) over
    distinct per-conversation item sets (presence, not multiplicity — the
    standard word-cooccurrence convention). Unordered pairs are emitted
    once with item_a < item_b.

    Shape: ONE distinct (conv, item) aggregation, a self-join on conv_col
    (the pair fan-out is bounded by items-per-conversation², and the
    alphabet is the tool set — never corpus-sized), a pair agg, and a
    BROADCAST join of the ≤|tools| marginal table. All counts are exact
    integers; pmi is a quotient of exact-integer products under one ln —
    IEEE-identical cross-engine."""
    items = (
        tr.where(F.col(item_col).isNotNull())
        .select(F.col(conv_col).alias("__c"), F.col(item_col).alias("item"))
        .distinct()
    )
    n_convs = items.select("__c").distinct().count()
    marg = items.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = items.select("__c", F.col("item").alias("item_a"))
    b = items.select("__c", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "__c")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= int(min_count))
    )
    ma = F.broadcast(marg.select(F.col("item").alias("item_a"), F.col("n").alias("n_a")))
    mb = F.broadcast(marg.select(F.col("item").alias("item_b"), F.col("n").alias("n_b")))
    return (
        pairs.join(ma, "item_a")
        .join(mb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.log(
                F.col("n_ab").cast("double")
                * F.lit(float(n_convs))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("pmi"),
        )
    )


def session_features(
    feat: DataFrame,
    conv_col: str = "conv_id",
    session_col: str = "session_id",
) -> DataFrame:
    """Per-(conversation, session) summary from the featurized turn frame
    — the session-granularity feature-store table between turn-level
    features and conversation_features: ONE groupBy on the same conv-
    keyed family (start/end as whole-second epochs, turn/tool counts,
    exact-integer token stats)."""
    return feat.groupBy(conv_col, session_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.min(F.unix_timestamp("ts")).cast("long").alias("start_epoch"),
        F.max(F.unix_timestamp("ts")).cast("long").alias("end_epoch"),
        F.sum(F.col("tool").isNotNull().cast("long"))
        .cast("long")
        .alias("n_tool_calls"),
        F.sum(F.col("n_tokens").cast("long")).cast("long").alias("tokens"),
    )


def conversation_trends(
    feat: DataFrame,
    conv_col: str = "conv_id",
    x_col: str = "turn_idx",
    y_cols: tuple[str, ...] = ("n_tokens", "turn_gap_s"),
) -> DataFrame:
    """Per-conversation linear trend of each ``y_col`` over ``x_col`` —
    OLS slope/intercept/Pearson-r from closed-form sufficient statistics
    (does the assistant get wordier as the conversation runs? do gaps
    stretch?). The per-entity drift signal conversation_features' static
    summary can't see.

    ONE groupBy(conv) aggregation carrying (n, Σx, Σx², Σxy, Σy, Σy²) for
    every y — map-side partial combine, no window, no second scan. All
    inputs are exact integers (turn_idx, token counts, whole-second gaps),
    so the sums are exact and the slope/intercept/r closures — spelled in
    the oracle's operand order — are IEEE-identical cross-engine.
    Conversations with a single turn (or constant x) yield NULL trends;
    a constant y yields r = NULL (0/0) with slope 0.
    """
    x = F.col(x_col).cast("double")
    aggs = [
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(x * x).alias("__sxx"),
    ]
    for yc in y_cols:
        y = F.col(yc).cast("double")
        aggs += [
            F.sum(y).alias(f"__sy_{yc}"),
            F.sum(y * y).alias(f"__syy_{yc}"),
            F.sum(x * y).alias(f"__sxy_{yc}"),
        ]
    agg = feat.groupBy(conv_col).agg(*aggs)
    n = F.col("__n")
    sx, sxx = F.col("__sx"), F.col("__sxx")
    den_x = n * sxx - sx * sx
    out_cols = [F.col(conv_col), n.cast("long").alias("n_turns")]
    for yc in y_cols:
        sy = F.col(f"__sy_{yc}")
        syy = F.col(f"__syy_{yc}")
        sxy = F.col(f"__sxy_{yc}")
        num = n * sxy - sx * sy
        den_y = n * syy - sy * sy
        slope = F.when(den_x > 0, num / den_x)
        out_cols += [
            slope.alias(f"{yc}_slope"),
            F.when(den_x > 0, (sy - (num / den_x) * sx) / n).alias(
                f"{yc}_intercept"
            ),
            F.when(
                (den_x > 0) & (den_y > 0), num / F.sqrt(den_x * den_y)
            ).alias(f"{yc}_r"),
        ]
    return agg.select(*out_cols)


def conversation_leadlag(
    feat: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    x_col: str = "n_tokens",
    y_col: str = "turn_gap_s",
    lags: tuple[int, ...] = (-2, -1, 0, 1, 2),
) -> DataFrame:
    """Lead-lag cross-correlation per conversation: Pearson r between
    ``x_t`` and ``y_{t+lag}`` for each lag (does a long turn precede a
    long pause? does a pause predict the next turn's length?) — the
    temporal-coupling signal a same-row correlation matrix can't see.

    One conv-ordered window pass materializes the shifted y columns
    (sharing the featurize stack's conv_id partitioning — no extra
    exchange), then ONE groupBy(conv) carries per-lag sufficient
    statistics restricted to rows where the shifted value exists (the
    aligned-pairs population, exactly mirroring the SQL LEAD/LAG
    semantics). Exact-integer sums; the r closure is spelled in the
    oracle's operand order. Pairs with n < 2 or a constant side yield
    NULL. Output is long-form (conv_id, lag, n_pairs, r).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(order_col)
    x = F.col(x_col).cast("double")
    shifted = {}
    for lag in lags:
        if lag > 0:
            shifted[lag] = F.lead(F.col(y_col), lag).over(w)
        elif lag < 0:
            shifted[lag] = F.lag(F.col(y_col), -lag).over(w)
        else:
            shifted[lag] = F.col(y_col)
    df = feat
    for lag in lags:
        df = df.withColumn(f"__y_{lag}", shifted[lag].cast("double"))
    aggs = []
    for lag in lags:
        y = F.col(f"__y_{lag}")
        ok = y.isNotNull()
        z = F.lit(0.0)
        aggs += [
            F.sum(F.when(ok, 1.0).otherwise(z)).alias(f"__n_{lag}"),
            F.sum(F.when(ok, x).otherwise(z)).alias(f"__sx_{lag}"),
            F.sum(F.when(ok, x * x).otherwise(z)).alias(f"__sxx_{lag}"),
            F.sum(F.when(ok, y).otherwise(z)).alias(f"__sy_{lag}"),
            F.sum(F.when(ok, y * y).otherwise(z)).alias(f"__syy_{lag}"),
            F.sum(F.when(ok, x * y).otherwise(z)).alias(f"__sxy_{lag}"),
        ]
    agg = df.groupBy(conv_col).agg(*aggs)
    parts = []
    for lag in lags:
        n = F.col(f"__n_{lag}")
        sx, sxx = F.col(f"__sx_{lag}"), F.col(f"__sxx_{lag}")
        sy, syy = F.col(f"__sy_{lag}"), F.col(f"__syy_{lag}")
        sxy = F.col(f"__sxy_{lag}")
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        parts.append(
            F.struct(
                F.lit(lag).cast("int").alias("lag"),
                n.cast("long").alias("n_pairs"),
                F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy)).alias("r"),
            )
        )
    return agg.select(
        F.col(conv_col), F.explode(F.array(*parts)).alias("__s")
    ).select(
        conv_col,
        F.col("__s.lag").alias("lag"),
        F.col("__s.n_pairs").alias("n_pairs"),
        F.col("__s.r").alias("r"),
    )


def theilsen_trends(
    tr: DataFrame,
    value_col: str = "n_tokens",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    max_lag: int | None = None,
) -> DataFrame:
    """Robust per-conversation trend: the Theil-Sen estimator — slope =
    median over all turn pairs of (y_j - y_i)/(j - i), intercept =
    median over turns of (y_i - slope * i). Breakdown point ~29%: a few
    wild outlier turns (pasted logs, tool dumps) that drag the OLS slope
    (conversation_trends) leave the median-of-slopes untouched.

    Scale shape: the pair join is conv_id-co-partitioned (one exchange
    each side, never a cross join), but pairs are O(L^2) per
    conversation — ``max_lag`` bounds them to O(L * max_lag) for
    long-conversation corpora (lag-restricted Theil-Sen stays consistent;
    at 100 TB pass e.g. max_lag=64). Both medians are Spark's exact
    interpolated percentile == DuckDB quantile_cont (the repo's
    cross-engine quantile family).

    Returns (conv_col, n_pairs long, ts_slope double, ts_intercept
    double); conversations with < 2 turns have no pairs and are absent.
    """
    a = tr.select(
        F.col(conv_col).alias("__c"),
        F.col(order_col).cast("double").alias("__xa"),
        F.col(value_col).cast("double").alias("__ya"),
    )
    b = tr.select(
        F.col(conv_col).alias("__c"),
        F.col(order_col).cast("double").alias("__xb"),
        F.col(value_col).cast("double").alias("__yb"),
    )
    cond = F.col("__xb") > F.col("__xa")
    if max_lag is not None:
        cond = cond & (F.col("__xb") - F.col("__xa") <= F.lit(float(max_lag)))
    slopes = (
        a.join(b, "__c")
        .where(cond)
        .select(
            "__c",
            ((F.col("__yb") - F.col("__ya")) / (F.col("__xb") - F.col("__xa"))).alias(
                "__slope"
            ),
        )
    )
    med = slopes.groupBy("__c").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile(F.col("__slope"), F.lit(0.5)).alias("ts_slope"),
    )
    resid = (
        tr.select(
            F.col(conv_col).alias("__c"),
            F.col(order_col).cast("double").alias("__x"),
            F.col(value_col).cast("double").alias("__y"),
        )
        .join(med, "__c")
        .groupBy("__c", "n_pairs", "ts_slope")
        .agg(
            F.percentile(
                F.col("__y") - F.col("ts_slope") * F.col("__x"), F.lit(0.5)
            ).alias("ts_intercept")
        )
    )
    return resid.select(
        F.col("__c").alias(conv_col), "n_pairs", "ts_slope", "ts_intercept"
    )


def conversation_integrity(
    tr: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    role_col: str = "role",
) -> DataFrame:
    """Per-conversation ingestion-integrity report — the validation pass a
    transcripts pipeline runs before featurizing, since every window
    operator in this engine assumes (conv_id, turn_idx) is a clean,
    time-ordered spine:

    - ``n_turns`` / ``n_distinct_turn_idx`` — duplicates when they differ;
    - ``idx_gaps`` — missing turn indices (span minus distinct count);
    - ``ts_violations`` — rows whose timestamp moves BACKWARD in turn
      order (out-of-order delivery that an as-of join would silently
      mis-serve);
    - ``role_repeats`` — consecutive same-role turns (collapsed-message
      artifacts).

    ONE window pass sharing the conv_id exchange + one aggregation; all
    outputs exact integers. The window orders by (order_col, ts_col) so
    duplicate turn indices — exactly what this report detects — still
    scan in a deterministic order (the lineitem tie lesson)."""
    w = Window.partitionBy(conv_col).orderBy(order_col, ts_col)
    flagged = tr.select(
        conv_col,
        order_col,
        F.when(
            F.unix_timestamp(ts_col) < F.unix_timestamp(F.lag(ts_col).over(w)),
            1,
        ).otherwise(0).alias("__ts_viol"),
        F.when(F.col(role_col) == F.lag(role_col).over(w), 1)
        .otherwise(0)
        .alias("__role_rep"),
    )
    return flagged.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.countDistinct(order_col).cast("long").alias("n_distinct_turn_idx"),
        (
            F.max(order_col) - F.min(order_col) + 1 - F.countDistinct(order_col)
        ).cast("long").alias("idx_gaps"),
        F.sum("__ts_viol").cast("long").alias("ts_violations"),
        F.sum("__role_rep").cast("long").alias("role_repeats"),
    )
