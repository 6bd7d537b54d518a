"""Multivariate outlier scoring — Mahalanobis distance.

Fit = ONE sufficient-statistics aggregation (n, Σx per feature, Σx·x' per
feature pair — p(p+3)/2 sums, map-side partials, no shuffle of rows);
the driver closes over the tiny stat vector: population covariance
``cov = XX/n − μμᵀ`` and precision ``P = inv(cov)`` via NumPy. Transform
= a pure literal projection — the quadratic form is unrolled row-major
into built-in expressions, so scoring a 100 TB frame is one shuffle-free
scan (the same fit-as-literals discipline as univariate.py scalers).

Cross-engine determinism: on integer-valued features every sum is exact
in float64, the driver closure is plain NumPy (bit-identical to an
independent single-process replica on the same sums), and the unrolled
quadratic form adds terms in the same row-major left-assoc order the
oracle SQL spells out.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mahalanobis_stats(
    df: DataFrame, feature_cols: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    """(mean, precision) fitted in one aggregation pass."""
    p = len(feature_cols)
    cols = [F.col(c).cast("double") for c in feature_cols]
    aggs = [F.count(F.lit(1)).alias("__n")]
    aggs += [F.sum(cols[i]).alias(f"__s_{i}") for i in range(p)]
    aggs += [
        F.sum(cols[i] * cols[j]).alias(f"__q_{i}_{j}")
        for i in range(p)
        for j in range(i, p)
    ]
    row = df.agg(*aggs).collect()[0]
    n = float(row["__n"])
    s = np.array([float(row[f"__s_{i}"]) for i in range(p)])
    xx = np.empty((p, p))
    for i in range(p):
        for j in range(i, p):
            xx[i, j] = xx[j, i] = float(row[f"__q_{i}_{j}"])
    return close_mahalanobis_stats(n, s, xx)


def close_mahalanobis_stats(
    n: float, s: np.ndarray, xx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Driver closure over the sufficient stats — kept separate so the
    oracle's independent replica runs the IDENTICAL lines on the same
    exact-integer sums (bit-identical mean/precision by construction)."""
    mu = s / n
    cov = xx / n - np.outer(mu, mu)
    try:
        precision = np.linalg.inv(cov)
    except np.linalg.LinAlgError as e:
        const = [i for i in range(len(mu)) if cov[i, i] == 0.0]
        raise ValueError(
            "singular covariance — features are constant or exactly "
            f"collinear (constant feature indices: {const}); drop them "
            "(e.g. variance_threshold) before Mahalanobis scoring"
        ) from e
    return mu, precision


def mahalanobis_distance(
    df: DataFrame,
    feature_cols: list[str],
    mean: np.ndarray,
    precision: np.ndarray,
    out_col: str = "maha2",
) -> DataFrame:
    """Squared Mahalanobis distance as a literal projection: terms
    ``P[i,j]·(x_i−μ_i)·(x_j−μ_j)`` added in row-major order (the order the
    oracle SQL mirrors). Shuffle-free at any scale."""
    p = len(feature_cols)
    dev = [
        F.col(c).cast("double") - F.lit(float(mean[i]))
        for i, c in enumerate(feature_cols)
    ]
    expr = None
    for i in range(p):
        for j in range(p):
            term = F.lit(float(precision[i, j])) * dev[i] * dev[j]
            expr = term if expr is None else expr + term
    return df.withColumn(out_col, expr)
