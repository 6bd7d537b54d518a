"""Purged walk-forward CV split tests: NumPy quantile parity, the
no-leakage invariant (train/val separation >= embargo per fold), and the
compact-encoding semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fastselect_spark.data.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts_pandas,
)
from fastselect_spark.featurize import (
    purged_walkforward_folds,
    walkforward_boundaries,
)

N_FOLDS = 4
EMBARGO = 120.0


@pytest.fixture(scope="module")
def split_pdf(spark):
    pdf = generate_transcripts_pandas(n_convs=60, seed=7)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    out = purged_walkforward_folds(
        df, n_folds=N_FOLDS, embargo_s=EMBARGO
    ).toPandas()
    out["ep"] = (out["ts"].astype("int64") // 10**9).astype(float)
    return out


def test_boundaries_match_numpy(spark, split_pdf):
    df = spark.createDataFrame(
        split_pdf[["conv_id", "turn_idx", "ts", "role", "text", "tool"]],
        schema=None,
    )
    qs = walkforward_boundaries(df, "ts", N_FOLDS)
    ep = split_pdf["ep"].to_numpy()
    expect = np.percentile(
        ep, [100 * i / (N_FOLDS + 1) for i in range(1, N_FOLDS + 1)]
    )
    assert np.allclose(qs, expect, rtol=0, atol=1e-9)


def test_no_temporal_leakage(split_pdf):
    """For every fold: every validation row is at least `embargo` seconds
    later than every training row."""
    for k in range(1, N_FOLDS + 1):
        train = split_pdf[split_pdf["first_train_fold"].notna()]
        train = train[train["first_train_fold"] <= k]["ep"]
        val = split_pdf[split_pdf["val_fold"] == k]["ep"]
        assert len(train) > 0 and len(val) > 0
        assert val.min() - train.max() >= EMBARGO - 1e-9


def test_expanding_train_and_balanced_val(split_pdf):
    """Training sets grow monotonically; validation segments are
    roughly-equal time-quantile chunks."""
    sizes = [
        (split_pdf["first_train_fold"] <= k).sum() for k in range(1, N_FOLDS + 1)
    ]
    assert all(b >= a for a, b in zip(sizes, sizes[1:]))
    n = len(split_pdf)
    for k in range(1, N_FOLDS + 1):
        frac = (split_pdf["val_fold"] == k).mean()
        assert abs(frac - 1 / (N_FOLDS + 1)) < 0.05, (k, frac)
    # base segment (never a validation window) is the remaining chunk
    assert abs((split_pdf["val_fold"] == 0).mean() - 1 / (N_FOLDS + 1)) < 0.05
    assert n == sum((split_pdf["val_fold"] == k).sum() for k in range(N_FOLDS + 1))


def test_boundaries_reuse_and_validation(spark, split_pdf):
    df = spark.createDataFrame(
        split_pdf[["conv_id", "turn_idx", "ts"]], schema=None
    )
    qs = walkforward_boundaries(df, "ts", 2)
    out = purged_walkforward_folds(
        df, n_folds=2, embargo_s=0.0, boundaries=qs
    ).toPandas()
    assert set(out["val_fold"].unique()) == {0, 1, 2}
    with pytest.raises(ValueError, match="boundaries"):
        purged_walkforward_folds(df, n_folds=3, boundaries=qs)
    with pytest.raises(ValueError, match="embargo"):
        purged_walkforward_folds(df, n_folds=2, embargo_s=-1.0)
    with pytest.raises(ValueError, match="n_folds"):
        walkforward_boundaries(df, "ts", 0)
