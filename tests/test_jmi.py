"""JMI selection tests against a brute-force NumPy oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fastselect_spark.selection import JMISelector, jmi_select
from tests.oracle_numpy import mi_oracle


def _to_df(spark, X, y, partitions=4):
    cols = [f"f{i}" for i in range(X.shape[1])]
    pdf = pd.DataFrame(X, columns=cols)
    pdf["label"] = y
    return spark.createDataFrame(pdf).repartition(partitions), cols


def _jmi_oracle(X, y, n_select):
    """Greedy JMI with joint variables encoded by pairing."""
    p = X.shape[1]
    rel = [mi_oracle(X[:, f], y) for f in range(p)]
    kmax = X.max() + 1
    joint = np.zeros((p, p))
    for i in range(p):
        for j in range(i + 1, p):
            paired = X[:, i] * kmax + X[:, j]
            m = mi_oracle(paired, y)
            joint[i, j] = joint[j, i] = m
    sel = [int(np.argmax(rel))]
    while len(sel) < n_select:
        best, bs = -1, -np.inf
        for f in range(p):
            if f in sel:
                continue
            sc = sum(joint[f, s] for s in sel)
            if sc > bs:
                bs, best = sc, f
        sel.append(best)
    return sel


def test_jmi_matches_oracle(spark):
    rng = np.random.default_rng(17)
    X = rng.integers(0, 4, (250, 7))
    y = ((X[:, 0] + X[:, 2]) % 2).astype(int)
    df, cols = _to_df(spark, X, y)
    got = jmi_select(df, cols, "label", n_select=4)
    assert got == _jmi_oracle(X, y, 4)


def test_jmi_picks_complementary_feature(spark):
    """XOR structure: f0 and f1 are individually uninformative but jointly
    determine y — JMI must pick the complementary partner second."""
    rng = np.random.default_rng(23)
    n = 600
    f0 = rng.integers(0, 2, n)
    f1 = rng.integers(0, 2, n)
    y = (f0 ^ f1).astype(int)
    # f2 weakly correlated with y (seed pick), f3 noise
    f2 = np.where(rng.random(n) < 0.65, y, rng.integers(0, 2, n))
    f3 = rng.integers(0, 2, n)
    X = np.column_stack([f0, f1, f2, f3])
    df, cols = _to_df(spark, X, y)
    sel = JMISelector(2).fit(df, cols, "label")
    picks = sel.top_features_.tolist()
    assert picks[0] == 2  # highest marginal relevance seeds
    # the XOR pair completes the information: I((f0,f2);y) vs I((f1,f2);y) —
    # whichever of f0/f1 is chosen, it must be one of them
    assert picks[1] in (0, 1)
    assert sel.selected_cols_[0] == "f2"


def test_jmi_invalid_n(spark):
    rng = np.random.default_rng(1)
    X = rng.integers(0, 3, (50, 3))
    df, cols = _to_df(spark, X, rng.integers(0, 2, 50))
    with pytest.raises(ValueError):
        jmi_select(df, cols, "label", n_select=99)
