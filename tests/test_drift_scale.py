"""PSI drift + StandardScaler tests against NumPy replicas."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fastselect_spark.featurize import psi_scores
from fastselect_spark.selection import standard_scale, standard_scaler_stats


def _df(spark, arr, cols):
    return spark.createDataFrame(pd.DataFrame(arr, columns=cols)).repartition(4)


def _psi_oracle(ref, cur, bins=10, eps=1e-6):
    lo, hi = ref.min(), ref.max()
    width = (hi - lo) / bins if hi > lo else 1.0
    b_ref = np.clip(np.floor((ref - lo) / width), 0, bins - 1).astype(int)
    b_cur = np.clip(np.floor((cur - lo) / width), 0, bins - 1).astype(int)
    p = np.bincount(b_ref, minlength=bins) / max(len(ref), 1)
    q = np.bincount(b_cur, minlength=bins) / max(len(cur), 1)
    p, q = np.maximum(p, eps), np.maximum(q, eps)
    return float(((p - q) * np.log(p / q)).sum())


def test_psi_matches_numpy_and_detects_shift(spark):
    rng = np.random.default_rng(7)
    ref = rng.normal(0, 1, (500, 2))
    cur = rng.normal(0, 1, (500, 2))
    cur[:, 1] += 1.5  # shifted feature
    dref = _df(spark, np.round(ref, 6), ["a", "b"])
    dcur = _df(spark, np.round(cur, 6), ["a", "b"])
    got = psi_scores(dref, dcur, ["a", "b"], bins=10)
    exp_a = _psi_oracle(np.round(ref[:, 0], 6), np.round(cur[:, 0], 6))
    exp_b = _psi_oracle(np.round(ref[:, 1], 6), np.round(cur[:, 1], 6))
    assert abs(got["a"] - exp_a) < 1e-9 and abs(got["b"] - exp_b) < 1e-9
    assert got["a"] < 0.1 < got["b"]  # stable vs drifted


def test_psi_identical_frames_is_zero(spark):
    rng = np.random.default_rng(1)
    x = np.round(rng.normal(0, 1, (200, 1)), 6)
    d = _df(spark, x, ["a"])
    assert psi_scores(d, d, ["a"])["a"] == 0.0


def test_standard_scaler_matches_numpy(spark):
    rng = np.random.default_rng(11)
    X = np.column_stack(
        [rng.normal(5, 2, 300), rng.normal(-1, 0.5, 300), np.full(300, 3.0)]
    ).round(6)
    cols = ["a", "b", "c"]
    d = _df(spark, X, cols)
    mean, std = standard_scaler_stats(d, cols)
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(std[:2], X[:, :2].std(axis=0), rtol=1e-9)
    assert std[2] == 1.0  # zero-variance -> scale 1 (sklearn convention)
    out = (
        standard_scale(d, cols, mean, std)
        .select("a_z", "b_z", "c_z")
        .toPandas()
        .to_numpy()
    )
    exp = (X - mean) / std
    np.testing.assert_allclose(np.sort(out, axis=0), np.sort(exp, axis=0), atol=1e-9)
    assert np.allclose(out[:, 2], 0.0)


def test_quantile_clip_and_robust_scale_match_numpy(spark):
    from fastselect_spark.selection import (
        quantile_clip,
        quantile_stats,
        robust_scale,
        robust_scaler_stats,
    )

    rng = np.random.default_rng(23)
    X = np.round(rng.lognormal(1, 0.8, (400, 1)), 6)
    d = _df(spark, X, ["a"])
    st = quantile_stats(d, ["a"], [0.05, 0.5, 0.95])
    np.testing.assert_allclose(
        st["a"], np.percentile(X[:, 0], [5, 50, 95]), rtol=1e-12
    )
    w = quantile_clip(d, ["a"], 0.05, 0.95).toPandas()["a_w"].to_numpy()
    lo, hi = np.percentile(X[:, 0], [5, 95])
    np.testing.assert_allclose(
        np.sort(w), np.sort(np.clip(X[:, 0], lo, hi)), rtol=1e-12
    )
    c, s = robust_scaler_stats(d, ["a"])
    q1, med, q3 = np.percentile(X[:, 0], [25, 50, 75])
    assert abs(c[0] - med) < 1e-12 and abs(s[0] - (q3 - q1)) < 1e-12
    r = robust_scale(d, ["a"], c, s).toPandas()["a_r"].to_numpy()
    np.testing.assert_allclose(
        np.sort(r), np.sort((X[:, 0] - med) / (q3 - q1)), atol=1e-12
    )


def test_robust_scaler_zero_iqr_is_one(spark):
    from fastselect_spark.selection import robust_scaler_stats

    X = np.full((50, 1), 4.0)
    d = _df(spark, X, ["a"])
    c, s = robust_scaler_stats(d, ["a"])
    assert c[0] == 4.0 and s[0] == 1.0
