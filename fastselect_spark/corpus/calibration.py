"""Classifier calibration report — the evaluation side of the quality
classifier (corpus/classifier.py): does "score 0.8" actually mean 80% of
those documents are positive?

Reliability table over ``n_bins`` uniform score bins on [0, 1]:

    bin b: n_b, conf_b = mean(score), acc_b = mean(label)
    ECE   = sum_b (n_b / N) * |acc_b - conf_b|

(expected calibration error, Naeini et al. 2015 — the standard scalar).

Distributed shape: ONE ``groupBy(bin)`` aggregation (map-side partials,
output bounded by n_bins, never by rows); the ECE is a window over the
tiny bin table. No joins, no Python in the hot path.

Cross-engine note: ``sum(score)`` over arbitrary doubles is summation-
order-dependent; for hash-gate exactness feed scores that are dyadic
rationals (k / 2^m — e.g. hash-bucket / 1024), whose float64 sums are
exact under ANY order. The contract query does exactly that; real sigmoid
scores get the documented 1e-9 rounding treatment instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n, conf, acc, gap, ece) — one row per non-empty score bin;
    ``ece`` is the same scalar on every row (a window sum over the
    bin-bounded table). Scores are clamped into [0, 1]; bin b covers
    [b/n_bins, (b+1)/n_bins) with 1.0 folded into the top bin."""
    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("long")
    b = F.least(
        F.greatest(F.floor(s * F.lit(float(n_bins))), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    bins = (
        df.select(b.alias("bin"), s.alias("__s"), lab.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__s").alias("__ssum"),
            F.sum("__y").cast("long").alias("__ysum"),
        )
    )
    # full frame ORDERED by bin: pins the float summation order, so the
    # ECE is bit-identical cross-engine (a bare unordered window sum is
    # summation-order-dependent)
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    conf = F.col("__ssum") / F.col("n").cast("double")
    acc = F.col("__ysum").cast("double") / F.col("n").cast("double")
    out = bins.select(
        "bin",
        "n",
        conf.alias("conf"),
        acc.alias("acc"),
        F.abs(acc - conf).alias("gap"),
    )
    total = F.sum("n").over(w).cast("double")
    return out.withColumn(
        "ece",
        F.sum(F.col("n").cast("double") * F.col("gap")).over(w) / total,
    )
