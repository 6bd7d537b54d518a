"""Scoring-layer tests: reference golden values (FIXTURES.md B5–B7),
NumPy-oracle cross-checks, edge cases, and partitioning determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fastselect_spark.selection import chi2, mi_matrices, mi_pair, mrmr_select
from fastselect_spark.selection._stats import chi2_sf, chi2_stats_from_observed
from fastselect_spark.selection.mrmr import MRMRSelector, mrmr_greedy
from tests.oracle_numpy import chi2_oracle, mi_matrices_oracle, mi_oracle


def _to_df(spark, X, y, partitions=4):
    cols = [f"f{i}" for i in range(X.shape[1])]
    pdf = pd.DataFrame(X, columns=cols)
    pdf["label"] = y
    return spark.createDataFrame(pdf).repartition(partitions), cols


# ---------- chi2 ----------

def test_chi2_golden_observed_matrix(spark):
    """FIXTURES.md B7: literal 4x3 matrix — golden chi2 values derived from
    the reference's golden observed matrix [[1,6,1],[5,2,8]]."""
    X = np.array([[1, 2, 0], [3, 0, 5], [0, 4, 1], [2, 2, 3]], dtype=np.float64)
    y = np.array([0, 1, 0, 1])
    df, cols = _to_df(spark, X, y)
    stats, pvals = chi2(df, cols, "label")
    np.testing.assert_allclose(stats, chi2_oracle(X, y), rtol=1e-9)


def test_chi2_core_golden_values():
    """Reference golden: observed=[[30,10,20],[10,30,0]], n=100 →
    chi2 = [3.75, 20.41666..., 13.3333...] (tests/test_chi2.py:191-219)."""
    observed = np.array([[30.0, 10.0, 20.0], [10.0, 30.0, 0.0]])
    stats = chi2_stats_from_observed(observed, observed.sum(axis=1), 100.0)
    np.testing.assert_allclose(stats, [3.75, 20.416666666, 13.333333333])


def test_chi2_zero_feature_count():
    observed = np.array([[10.0, 0.0, 20.0], [15.0, 0.0, 5.0]])
    stats = chi2_stats_from_observed(observed, observed.sum(axis=1), 50.0)
    assert stats[1] == 0.0 and stats[0] > 0.0 and stats[2] > 0.0


@pytest.mark.parametrize("n,p,K", [(100, 10, 2), (200, 25, 5), (50, 5, 3)])
def test_chi2_matches_oracle_random(spark, n, p, K):
    rs = np.random.RandomState(42)
    X = rs.randint(0, 100, (n, p)).astype(np.float64)
    y = rs.randint(0, K, n)
    df, cols = _to_df(spark, X, y, partitions=7)
    stats, pvals = chi2(df, cols, "label")
    np.testing.assert_allclose(stats, chi2_oracle(X, y), rtol=1e-6, atol=1e-9)
    assert np.all((pvals >= 0) & (pvals <= 1))


def test_chi2_negative_raises(spark):
    X = np.array([[1.0, -0.5], [2.0, 3.0]])
    df, cols = _to_df(spark, X, np.array([0, 1]))
    with pytest.raises(ValueError, match="non-negative"):
        chi2(df, cols, "label")


def test_chi2_single_class(spark):
    X = np.abs(np.random.RandomState(0).randn(20, 4))
    df, cols = _to_df(spark, X, np.zeros(20, dtype=int))
    stats, pvals = chi2(df, cols, "label")
    assert (stats == 0).all() and (pvals == 1).all()


def test_chi2_zero_column_scores_zero(spark):
    rs = np.random.RandomState(1)
    X = rs.randint(0, 5, (50, 4)).astype(float)
    X[:, 2] = 0.0
    df, cols = _to_df(spark, X, rs.randint(0, 2, 50))
    stats, pvals = chi2(df, cols, "label")
    assert stats[2] == 0.0 and pvals[2] == 1.0


def test_chi2_sf_critical_values():
    """Textbook chi-square critical values: sf(x_crit, k) = 0.05."""
    np.testing.assert_allclose(chi2_sf(np.array([3.841458820694124]), 1), [0.05], atol=1e-9)
    np.testing.assert_allclose(chi2_sf(np.array([5.991464547107979]), 2), [0.05], atol=1e-9)
    np.testing.assert_allclose(chi2_sf(np.array([9.487729036781154]), 4), [0.05], atol=1e-9)
    np.testing.assert_allclose(chi2_sf(np.array([0.0]), 3), [1.0])


# ---------- mutual information ----------

def test_mi_pair_matches_oracle(spark):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 4, 500)
    b = (a + rng.integers(0, 2, 500)) % 4
    pdf = pd.DataFrame({"a": a, "b": b})
    df = spark.createDataFrame(pdf).repartition(5)
    got = mi_pair(df, "a", "b")
    np.testing.assert_allclose(got, mi_oracle(a, b), rtol=1e-10)


def test_mi_matrices_match_oracle(spark):
    rng = np.random.default_rng(7)
    X = rng.integers(0, 5, (300, 8))
    y = rng.integers(0, 3, 300)
    df, cols = _to_df(spark, X, y, partitions=6)
    rel, red = mi_matrices(df, cols, "label")
    rel_o, red_o = mi_matrices_oracle(X, y)
    np.testing.assert_allclose(rel, rel_o, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(red, red_o, rtol=1e-9, atol=1e-12)
    assert (np.diag(red) == 0).all()
    np.testing.assert_allclose(red, red.T)


def test_mi_deterministic_across_partitioning(spark):
    rng = np.random.default_rng(11)
    X = rng.integers(0, 4, (200, 5))
    y = rng.integers(0, 2, 200)
    df1, cols = _to_df(spark, X, y, partitions=1)
    df2, _ = _to_df(spark, X, y, partitions=13)
    rel1, red1 = mi_matrices(df1, cols, "label")
    rel2, red2 = mi_matrices(df2, cols, "label")
    # integer-count accumulators → bit-identical regardless of partitioning
    assert (rel1 == rel2).all() and (red1 == red2).all()


# ---------- mRMR ----------

def _mrmr_groundtruth():
    """FIXTURES.md B5 / reference tests/test_mrmr.py:107-147."""
    rng = np.random.default_rng(42)
    n = 200
    y = rng.integers(0, 2, n)
    X = rng.integers(0, 3, size=(n, 10))
    flip0 = (rng.random(n) < 0.10).astype(int)
    X[:, 0] = (y + flip0) % 2
    X[:, 1] = X[:, 0]
    flip9 = (rng.random(n) < 0.05).astype(int)
    X[:, 9] = (y + flip9) % 2
    return X, y


def test_mrmr_selects_ground_truth(spark):
    X, y = _mrmr_groundtruth()
    df, cols = _to_df(spark, X, y, partitions=4)
    sel = MRMRSelector(n_features_to_select=2, method="MID").fit(df, cols, "label")
    assert set(sel.top_features_.tolist()) == {0, 9}
    assert sel.selected_cols_[0] == "f0" or sel.selected_cols_[0] == "f9"


def test_mrmr_greedy_matches_oracle_loop(spark):
    """Engine MI + greedy vs oracle MI + same greedy — full pipeline check."""
    rng = np.random.default_rng(5)
    X = rng.integers(0, 3, (150, 6))
    y = rng.integers(0, 2, 150)
    df, cols = _to_df(spark, X, y)
    sel = MRMRSelector(4, "MID").fit(df, cols, "label")
    # oracle path: shared vocab encode is identity-invariant for MI
    rel_o, red_o = mi_matrices_oracle(X, y)
    expect = mrmr_greedy(rel_o, red_o, 4, "MID")
    assert sel.top_features_.tolist() == expect.tolist()


def test_mrmr_miq_method(spark):
    X, y = _mrmr_groundtruth()
    df, cols = _to_df(spark, X, y)
    sel = MRMRSelector(3, "MIQ").fit(df, cols, "label")
    assert len(set(sel.top_features_.tolist())) == 3


def test_mrmr_invalid_params(spark):
    with pytest.raises(ValueError, match="MID|MIQ"):
        MRMRSelector(2, method="bogus")
    X, y = _mrmr_groundtruth()
    df, cols = _to_df(spark, X, y)
    with pytest.raises(ValueError, match="n_features_to_select"):
        MRMRSelector(99).fit(df, cols, "label")


def test_mrmr_transform_projects(spark):
    X, y = _mrmr_groundtruth()
    df, cols = _to_df(spark, X, y)
    out = MRMRSelector(2).fit_transform(df, cols, "label")
    assert len(out.columns) == 2


def test_mrmr_select_wrapper(spark):
    X, y = _mrmr_groundtruth()
    df, cols = _to_df(spark, X, y)
    names = mrmr_select(df, cols, "label", n_select=2)
    assert set(names) == {"f0", "f9"}


def test_transform_contract_validation(spark):
    """Reference parity (tests/test_mrmr.py:183-186): transform on a frame
    missing fitted feature columns raises the sklearn-style width
    ValueError ('X has N features, but <Est> is expecting M features as
    input.'), not an opaque unresolved-column analysis error."""
    import pytest as _pt

    X, y = _mrmr_groundtruth()
    df, cols = _to_df(spark, X, y)
    sel = MRMRSelector(n_features_to_select=2, method="MID").fit(df, cols, "label")
    wrong = df.drop("f0")  # remove one fitted feature
    with _pt.raises(
        ValueError,
        match=r"X has 9 features, but MRMRSelector is expecting 10 features as input\.",
    ):
        sel.transform(wrong)
    # a frame with all fitted columns (extras allowed) passes
    assert sel.transform(df.withColumn("extra", df["f1"])).columns == sel.selected_cols_


def test_transform_contract_validation_all_estimators(spark):
    """Every selector's transform enforces the fitted-columns contract."""
    import pytest as _pt

    from fastselect_spark.selection import (
        CFSSelector,
        JMISelector,
        MDRClassifier,
        ReliefFSelector,
        TuRFSelector,
    )

    rng = np.random.default_rng(7)
    X = rng.integers(0, 2, (60, 4))
    y = (X[:, 0] ^ X[:, 1]).astype(int)
    df, cols = _to_df(spark, X, y)
    fitted = [
        MRMRSelector(2, "MID").fit(df, cols, "label"),
        JMISelector(2).fit(df, cols, "label"),
        CFSSelector().fit(df, cols, "label"),
        MDRClassifier(k=2, cv=2).fit(df, cols, "label"),
        ReliefFSelector(n_features_to_select=2, n_neighbors=3).fit(df, cols, "label"),
        TuRFSelector(
            ReliefFSelector(n_features_to_select=2, n_neighbors=3),
            n_features_to_select=2,
            pct_remove=0.5,
        ).fit(df, cols, "label"),
    ]
    wrong = df.drop(cols[0])
    for est in fitted:
        with _pt.raises(
            ValueError,
            match=rf"X has 3 features, but {type(est).__name__} is expecting "
            rf"4 features as input\.",
        ):
            est.transform(wrong)


def test_gain_ratio_matches_numpy(spark):
    """C4.5 gain ratio: IG equals the mi_matrices relevance column
    (identical cube semantics), split info equals the NumPy feature-
    marginal entropy, ratio = IG/H with the constant-feature guard."""
    from fastselect_spark.selection import gain_ratio

    rng = np.random.default_rng(11)
    X = rng.integers(0, 4, size=(300, 5))
    X[:, 4] = 2  # constant feature -> H = 0 -> ratio 0
    y = (X[:, 0] + X[:, 1]) % 3
    cols = [f"f{i}" for i in range(5)]
    pdf = pd.DataFrame(X, columns=cols)
    pdf["label"] = y
    df = spark.createDataFrame(pdf)
    ig, si, ratio = gain_ratio(df, cols, "label")
    rel, _ = mi_matrices(df, cols, "label", compute_redundancy=False)
    np.testing.assert_allclose(ig, rel, rtol=0, atol=1e-12)
    for f in range(5):
        _, cnt = np.unique(X[:, f], return_counts=True)
        p = cnt / cnt.sum()
        h = float(-(p * np.log2(p)).sum())
        assert abs(si[f] - h) < 1e-12
        want = ig[f] / h if h > 0 else 0.0
        assert abs(ratio[f] - want) < 1e-12
    assert si[4] == 0.0 and ratio[4] == 0.0


def test_oner_matches_pandas_majority_rule(spark):
    """OneR: n_correct equals the pandas groupby majority-class count per
    feature value; a feature that fully determines y scores 1.0; a
    constant feature scores exactly the class-prior accuracy."""
    from fastselect_spark.selection.mi import oner_scores

    rng = np.random.default_rng(23)
    X = rng.integers(0, 4, size=(400, 3))
    y = X[:, 0] % 3  # f0 fully determines y
    X[:, 2] = 1  # constant -> majority-class prior
    cols = ["f0", "f1", "f2"]
    pdf = pd.DataFrame(X, columns=cols)
    pdf["label"] = y
    out = oner_scores(spark.createDataFrame(pdf), cols, "label")
    got = {r["feature"]: r for r in out.collect()}
    n = len(pdf)
    for f in cols:
        expect = int(
            pdf.groupby([f, "label"]).size().groupby(level=0).max().sum()
        )
        assert got[f]["n_correct"] == expect, f
        assert got[f]["n"] == n
        assert got[f]["oner_accuracy"] == expect / float(n)
    assert got["f0"]["oner_accuracy"] == 1.0
    prior = int(pdf["label"].value_counts().max())
    assert got["f2"]["n_correct"] == prior
