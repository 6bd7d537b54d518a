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
