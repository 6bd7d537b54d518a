"""Streaming PSI drift monitor — per-event-time-window population
stability of a live feature stream against a frozen batch reference
(featurize/drift.py semantics, at ingest time).

Shape: ONE windowed aggregation. The reference's bin edges and
proportions arrive as LITERALS, each tumbling window aggregates its bin
counts as conditional sums (the same fused-histogram trick as the batch
monitor), and the PSI formula is a post-aggregation projection — so the
whole monitor is a single stateful operator with bounded per-window state
(``bins`` longs), no second aggregation stage, no Python in the path.

PSI per window uses the window's OWN total (windows differ in size); the
1e-6 proportion floor matches the batch monitor, making a complete-mode
availableNow run equal to the batch per-window PSI SQL — the oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fastselect_spark.featurize.drift import PSI_EPS, _bin_expr


def streaming_psi(
    stream: DataFrame,
    col: str,
    lo: float,
    width: float,
    ref_props: "np.ndarray",
    window: str = "10 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
    eps: float = PSI_EPS,
) -> DataFrame:
    """(window_start, n, psi) per tumbling event-time window.

    ``lo``/``width``/``ref_props`` come from
    :func:`fastselect_spark.featurize.drift.reference_histogram`. With a
    ``watermark`` the sink can run append (windows finalize when the
    watermark passes); without one, run complete/update."""
    bins = len(ref_props)
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    b = _bin_expr(col, lo, width, bins)
    agg = stream.groupBy(F.window(ts_col, window)).agg(
        *[F.sum((b == k).cast("long")).alias(f"__c{k}") for k in range(bins)]
    )
    total: Column = F.col("__c0").cast("double")
    for k in range(1, bins):
        total = total + F.col(f"__c{k}").cast("double")
    psi: Column = F.lit(0.0)
    for k in range(bins):
        p = F.greatest(
            F.col(f"__c{k}").cast("double") / F.greatest(total, F.lit(1.0)),
            F.lit(float(eps)),
        )
        q = F.lit(float(max(ref_props[k], eps)))
        psi = psi + (p - q) * F.log(p / q)
    return agg.select(
        F.col("window.start").alias("window_start"),
        total.cast("long").alias("n"),
        psi.alias("psi"),
    )


def streaming_window_quantiles(
    stream: DataFrame,
    col: str,
    probs: tuple[float, ...] = (0.5, 0.9),
    window: str = "10 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """(window_start, n, q<pct>...) per tumbling event-time window — the
    latency/size quantile monitor that complements :func:`streaming_psi`
    (PSI says *whether* the distribution moved; the quantile track says
    *where*).

    ``exact=True`` uses Spark's exact interpolated ``percentile`` — equal
    to DuckDB ``quantile_cont`` and NumPy linear interpolation (the
    cross-engine family the batch winsorize/RobustScaler ops established)
    — whose per-window state buffers that window's values: the
    monitoring-window configuration, and the oracle-checkable one.
    ``exact=False`` switches to ``percentile_approx`` (bounded sketch
    state per window): the 100 TB ingest path, same output schema.

    With a ``watermark`` the sink can run append (windows finalize when
    the watermark passes); without one, run complete/update.
    """
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    if exact:
        qcol = F.percentile(F.col(col), F.lit(list(probs)))
    else:
        qcol = F.percentile_approx(
            F.col(col), F.lit(list(probs)), F.lit(accuracy)
        )
    agg = stream.groupBy(F.window(ts_col, window)).agg(
        F.count(F.lit(1)).alias("n"), qcol.alias("__q")
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("n").cast("long").alias("n"),
        *[
            F.col("__q")[i].alias(f"q{int(round(p * 100))}")
            for i, p in enumerate(probs)
        ],
    )


def reference_category_mix(df, col: str) -> dict[str, float]:
    """Frozen reference mix: category -> share over non-null rows of a
    BATCH frame. Shares are quotients of exact integer counts (the same
    cross-engine-exact family as text/vocab.py's Zipf shares)."""
    rows = df.where(F.col(col).isNotNull()).groupBy(col).count().collect()
    total = float(sum(int(r["count"]) for r in rows))
    return {str(r[col]): int(r["count"]) / total for r in rows}


def streaming_category_mix(
    stream: DataFrame,
    col: str,
    categories: list[str],
    window: str = "10 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """(window_start, c_<i>..., n_other) per tumbling event-time window —
    the categorical-mix counterpart of :func:`streaming_psi`: ONE
    windowed aggregation whose state is bounded by windows × |alphabet|
    (counts are fixed agg expressions, one per reference category, so
    unseen-vocabulary growth cannot blow up state — off-alphabet values
    land in ``n_other``; NULLs are excluded on both engines). Feed the
    result to :func:`category_drift_report` after read-back."""
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    aggs = [
        F.sum((F.col(col) == c).cast("long")).alias(f"__c{i}")
        for i, c in enumerate(categories)
    ]
    aggs.append(
        F.sum((~F.col(col).isin(list(categories))).cast("long")).alias(
            "n_other"
        )
    )
    agg = stream.groupBy(F.window(ts_col, window)).agg(*aggs)
    return agg.select(
        F.col("window.start").alias("window_start"),
        *[F.coalesce(F.col(f"__c{i}"), F.lit(0)).alias(f"__c{i}")
          for i in range(len(categories))],
        F.coalesce(F.col("n_other"), F.lit(0)).alias("n_other"),
    )


def category_drift_report(
    mix: DataFrame, categories: list[str], ref_props: dict[str, float]
) -> DataFrame:
    """Per-(window, category) chi-square drift terms + the window's chi2
    statistic, from a read-back :func:`streaming_category_mix` frame
    (batch side). ``chi2 = Σ (o - e)² / e`` with ``e = n·ref_prop`` over
    the reference alphabet; the sum runs in an ORDERED full-frame window
    (pinned summation order — deterministic cross-engine, same discipline
    as corpus/calibration.py's ECE)."""
    from pyspark.sql import Window

    n: Column | None = None
    for i in range(len(categories)):
        c = F.col(f"__c{i}").cast("double")
        n = c if n is None else n + c
    mix = mix.withColumn("__n", n)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("category"),
                F.col(f"__c{i}").cast("long").alias("o"),
                F.lit(float(ref_props[c])).alias("p"),
            )
            for i, c in enumerate(categories)
        ]
    )
    long = mix.select(
        "window_start", "__n", "n_other", F.explode(pairs).alias("t")
    ).select(
        "window_start",
        F.col("__n").cast("long").alias("n"),
        "n_other",
        "t.category",
        "t.o",
        "t.p",
    )
    e = F.col("n").cast("double") * F.col("p")
    d = F.col("o").cast("double") - e
    long = long.withColumn(
        "chi2_term",
        F.when(e > 0.0, d * d / e).otherwise(F.lit(0.0)),
    )
    w = (
        Window.partitionBy("window_start")
        .orderBy("category")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return long.withColumn("chi2", F.sum("chi2_term").over(w))
