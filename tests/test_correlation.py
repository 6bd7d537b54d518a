"""Correlation matrix/pruning tests: np.corrcoef parity, agg==arrow
bit-identity on integer-valued features, zero-variance NULL convention,
and the greedy redundancy prune."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fastselect_spark.selection.correlation import (
    correlation_matrix,
    correlation_prune,
    correlation_table,
)

COLS = ["a", "b", "c", "d"]


@pytest.fixture(scope="module")
def corr_df(spark):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 50, 400).astype(float)
    b = a * 2 + rng.integers(0, 3, 400)  # strongly correlated with a
    c = rng.integers(-20, 20, 400).astype(float)
    d = rng.integers(0, 2, 400).astype(float)
    pdf = pd.DataFrame({"a": a, "b": b, "c": c, "d": d})
    return spark.createDataFrame(pdf), pdf


def test_matches_numpy_corrcoef(corr_df):
    df, pdf = corr_df
    r = correlation_matrix(df, COLS, impl="agg")
    expect = np.corrcoef(pdf[COLS].to_numpy().T)
    assert np.allclose(r, expect, atol=1e-12)
    assert r[0, 1] > 0.99  # planted


def test_agg_and_arrow_bit_identical(corr_df):
    """Integer-valued features make every sufficient statistic exact, so
    the two physical strategies must agree to the last bit."""
    df, _ = corr_df
    ra = correlation_matrix(df, COLS, impl="agg")
    rw = correlation_matrix(df.repartition(7), COLS, impl="arrow")
    assert (ra == rw).all()


def test_zero_variance_is_null(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0], "k": [5.0, 5.0, 5.0]})
    df = spark.createDataFrame(pdf)
    r = correlation_matrix(df, ["x", "k"], impl="agg")
    assert np.isnan(r[0, 1])
    tbl = correlation_table(spark, r, ["x", "k"]).collect()
    assert len(tbl) == 1 and tbl[0]["corr"] is None


def test_correlation_prune(corr_df):
    df, _ = corr_df
    r = correlation_matrix(df, COLS, impl="agg")
    kept, dropped = correlation_prune(r, COLS, threshold=0.9)
    assert kept == ["a", "c", "d"]
    assert dropped == {"b": "a"}
    kept_all, dropped_all = correlation_prune(r, COLS, threshold=1.1)
    assert kept_all == COLS and dropped_all == {}


def test_empty_and_bad_impl(spark, corr_df):
    df, _ = corr_df
    with pytest.raises(ValueError, match="impl"):
        correlation_matrix(df, COLS, impl="bogus")
    empty = df.where("a < -1")
    with pytest.raises(ValueError, match="empty"):
        correlation_matrix(empty, COLS, impl="arrow")
