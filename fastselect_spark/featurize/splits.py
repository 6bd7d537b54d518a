"""Temporal (walk-forward) cross-validation splits with a purge embargo.

The north rule's invariant is ZERO temporal leakage at each
entity×timestamp (BASELINE.json north_rule); random k-fold CV (the
reference's StratifiedKFold, used by MDR — selection/mdr.py) violates it
for time-ordered targets because future rows land in training folds.
This module provides the leakage-safe alternative for transcript data:
walk-forward expanding-window folds split on exact time quantiles, with
an optional embargo gap purged between a fold's training window and its
validation window (the standard guard against horizon-h features of a
late train row peeking into the validation period).

Scheme (n_folds = K): exact interpolated percentiles q_1 < ... < q_K of
epoch(ts) at i/(K+1) cut the timeline into K+1 roughly-equal-count
segments. Fold k trains on ``epoch <= q_k - embargo_s`` and validates on
``q_k < epoch <= q_{k+1}`` (q_{K+1} = +inf), so the training set only
ever grows and every validation row is strictly later than every
training row of its fold, by at least ``embargo_s`` seconds.

Scale shape: ONE percentile aggregation over the timestamp column (the
same exact-percentile reduction as selection/univariate.py's
winsorization — Spark ``percentile`` == DuckDB ``quantile_cont`` ==
NumPy linear interpolation), then the fold columns are a pure literal
projection — row-local, shuffle-free, appendable to a 10^12-turn table
for the cost of a scan. The compact encoding (``val_fold``,
``first_train_fold``) avoids the O(n·K) exploded (fold, row) table: fold
k's training set is ``first_train_fold <= k`` and its validation set is
``val_fold = k``, both monotone in time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _epoch(ts_col: str) -> Column:
    return F.unix_timestamp(ts_col).cast("double")


def walkforward_boundaries(
    df: DataFrame, ts_col: str = "ts", n_folds: int = 4
) -> list[float]:
    """Exact interpolated time-quantile boundaries q_1..q_K at i/(K+1)."""
    if n_folds < 1:
        raise ValueError(f"n_folds must be >= 1, got {n_folds}")
    fracs = [i / (n_folds + 1) for i in range(1, n_folds + 1)]
    row = df.select(
        F.percentile(_epoch(ts_col), F.array(*[F.lit(f) for f in fracs])).alias("q")
    ).first()
    return [float(v) for v in row["q"]]


def purged_walkforward_folds(
    df: DataFrame,
    ts_col: str = "ts",
    n_folds: int = 4,
    embargo_s: float = 0.0,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Append ``val_fold`` and ``first_train_fold`` to ``df``.

    - ``val_fold`` (int): k in 1..n_folds when the row falls in fold k's
      validation window (q_k < epoch <= q_{k+1}); 0 for the base segment
      (epoch <= q_1), which is training-only.
    - ``first_train_fold`` (int, nullable): the smallest fold whose
      training window contains the row (epoch <= q_k - embargo_s);
      NULL when the row is in no training window (too late, or inside
      every embargo gap). Fold k's training set = ``first_train_fold <= k``.

    Pass precomputed ``boundaries`` to reuse one percentile scan across
    several tables that must share the same split (features/labels).
    """
    if boundaries is None:
        boundaries = walkforward_boundaries(df, ts_col, n_folds)
    if len(boundaries) != n_folds:
        raise ValueError(
            f"expected {n_folds} boundaries, got {len(boundaries)}"
        )
    if embargo_s < 0:
        raise ValueError(f"embargo_s must be >= 0, got {embargo_s}")
    ep = _epoch(ts_col)
    val_fold = sum(
        (ep > F.lit(q)).cast("int") for q in boundaries
    )
    # smallest k with epoch <= q_k - embargo == 1 + #{k: epoch > q_k - embargo}
    ftf = F.lit(1) + sum(
        (ep > F.lit(q - embargo_s)).cast("int") for q in boundaries
    )
    first_train = F.when(ftf <= F.lit(n_folds), ftf).otherwise(F.lit(None))
    return df.withColumn("val_fold", val_fold.cast("int")).withColumn(
        "first_train_fold", first_train.cast("int")
    )


def group_kfold(
    df: DataFrame,
    group_col: str = "conv_id",
    n_folds: int = 5,
    seed: int = 0,
    out_col: str = "fold",
) -> DataFrame:
    """Group-aware k-fold assignment: every row of a group lands in the
    SAME fold (``md5(seed:group) % n_folds`` — the portable 60-bit hash
    family), so no conversation straddles train and validation — the
    group-leakage guard sklearn's GroupKFold provides, here as a pure
    row-local projection: no shuffle, no group registry, reproducible
    under any partitioning at any scale. Fold sizes are hash-balanced
    (equal in expectation), not exactly equal — the price of statelessness,
    same tradeoff as corpus/sampling.py's hash-Bernoulli."""
    from fastselect_spark.featurize.encoding import hash_bucket

    return df.withColumn(
        out_col, hash_bucket(F.col(group_col).cast("string"), n_folds, seed)
    )
