"""Wide-matrix (array-column) scorer mode vs the NumPy reference oracles:
row-parallel chi2/MI-relevance and pair-parallel broadcast MI matrices must
match the narrow-column scorers and the transliterated reference math."""

from __future__ import annotations

import numpy as np
import pytest

from fastselect_spark.selection import (
    chi2_matrix,
    encode_shared,
    fisher_matrix,
    matrix_table,
    mi_matrices_broadcast,
    mi_relevance_matrix,
    mrmr_select_matrix,
)
from fastselect_spark.selection import fisher_score
from fastselect_spark.selection.mrmr import mrmr_greedy

from oracle_numpy import chi2_oracle, mi_matrices_oracle


@pytest.fixture(scope="module")
def coded(spark):
    rng = np.random.default_rng(7)
    n, p, k = 400, 12, 5
    X = rng.integers(0, k, (n, p)).astype(np.float64)
    y = ((X[:, 0] + X[:, 3]) % 2 + rng.integers(0, 2, n) * (rng.random(n) < 0.2)).astype(
        np.float64
    ) % 2
    return X, y, matrix_table(spark, X, y, n_partitions=6)


def test_chi2_matrix_matches_oracle(spark, coded):
    X, y, df = coded
    stats, pvals = chi2_matrix(df)
    np.testing.assert_allclose(stats, chi2_oracle(X, y), rtol=1e-10, atol=1e-12)
    assert np.all((pvals >= 0) & (pvals <= 1))


def test_chi2_matrix_rejects_negative(spark):
    X = np.array([[1.0, -1.0], [2.0, 3.0]])
    y = np.array([0.0, 1.0])
    df = matrix_table(spark, X, y, n_partitions=2)
    with pytest.raises(Exception, match="non-negative"):
        chi2_matrix(df)


def test_mi_relevance_matrix_matches_oracle(spark, coded):
    X, y, df = coded
    rel_oracle, _ = mi_matrices_oracle(X.astype(np.int64), y.astype(np.int64))
    rel = mi_relevance_matrix(df, n_states=5)
    np.testing.assert_allclose(rel, rel_oracle, rtol=1e-10, atol=1e-12)


def test_mi_matrices_broadcast_matches_oracle(spark, coded):
    X, y, _ = coded
    Xc, yc, _ = encode_shared(X, y)
    rel, red = mi_matrices_broadcast(spark, Xc, yc)
    rel_o, red_o = mi_matrices_oracle(X.astype(np.int64), y.astype(np.int64))
    np.testing.assert_allclose(rel, rel_o, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(red, red_o, rtol=1e-10, atol=1e-12)
    assert np.allclose(red, red.T) and np.all(np.diag(red) == 0)


def test_fisher_matrix_matches_column_mode(spark, coded):
    X, y, df = coded
    got = fisher_matrix(df)
    cols = [f"f{i}" for i in range(X.shape[1])]
    import pandas as pd

    pdf = pd.DataFrame(X, columns=cols)
    pdf["label"] = y
    ndf = spark.createDataFrame(pdf)
    want = fisher_score(ndf, cols, "label")
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_mrmr_matrix_matches_oracle_greedy(spark, coded):
    X, y, _ = coded
    picked, rel, red = mrmr_select_matrix(spark, X, y, n_select=5)
    rel_o, red_o = mi_matrices_oracle(X.astype(np.int64), y.astype(np.int64))
    expected = mrmr_greedy(rel_o, red_o, 5, "MID")
    np.testing.assert_array_equal(picked, expected)


# ---------- staged-matrix layout roundtrip ----------

def test_stage_roundtrip_narrow_and_packed(spark):
    """stage_matrix writes scalar columns below WIDE_P and a packed binary
    block above it; load_staged must reconstruct the identical (X, y) in
    mid order either way."""
    import pandas as pd

    from fastselect_spark.selection._stage import (
        WIDE_P,
        load_staged,
        stage_matrix,
    )

    rng = np.random.default_rng(3)
    for p in (4, WIDE_P + 5):
        n = 50
        X = rng.standard_normal((n, p))
        y = rng.integers(0, 3, n)
        cols = [f"f{i}" for i in range(p)]
        pdf = pd.DataFrame(X, columns=cols)
        pdf["label"] = y
        df = spark.createDataFrame(pdf).repartition(4)
        path = stage_matrix(df, cols, "label")
        mid, Xs, ys, extras = load_staged(path, cols)
        assert Xs.shape == (n, p)
        assert (np.diff(mid) > 0).all()  # sorted, unique
        # same multiset of rows (order differs: partition order vs input)
        got = np.concatenate([Xs, ys[:, None]], axis=1)
        exp = np.concatenate([X, y[:, None].astype(float)], axis=1)
        got_sorted = got[np.lexsort(got.T[::-1])]
        exp_sorted = exp[np.lexsort(exp.T[::-1])]
        np.testing.assert_allclose(got_sorted, exp_sorted, rtol=1e-12)


def test_stage_extra_cols_preserved(spark):
    import pandas as pd

    from fastselect_spark.selection._stage import load_staged, stage_matrix

    pdf = pd.DataFrame(
        {"f0": [1.0, 2.0, 3.0], "label": [0, 1, 0], "fold": [2, 0, 1]}
    )
    df = spark.createDataFrame(pdf)
    path = stage_matrix(df, ["f0"], "label", extra_cols=("fold",))
    mid, X, y, extras = load_staged(path, ["f0"])
    by_val = dict(zip(X[:, 0], extras["fold"]))
    assert by_val == {1.0: 2, 2.0: 0, 3.0: 1}


# ---------- step-wise broadcast greedy engine ----------

def test_joint_mi_block_matches_contingency_oracle(coded):
    """_joint_mi_block's fused-triple-code MI must equal mi_from_contingency
    over the explicit (pair-state × label) count table, pair by pair."""
    from fastselect_spark.selection._stats import mi_from_contingency
    from fastselect_spark.selection.matrix import _joint_mi_block

    X, y, _ = coded
    Xc, yc, _ = encode_shared(X, y)
    k = int(max(Xc.max(), yc.max())) + 1
    Xt = np.ascontiguousarray(Xc.T)
    pairs = np.array([[0, 3], [1, 2], [5, 11], [7, 0]], dtype=np.int64)
    got = _joint_mi_block(Xt, yc, pairs, k, np.log(2.0))
    for m, (i, j) in enumerate(pairs):
        fused = Xc[:, i] * k + Xc[:, j]
        table = np.zeros((k * k, k), dtype=np.int64)
        np.add.at(table, (fused, yc), 1)
        want = mi_from_contingency(table, unit="bit")
        np.testing.assert_allclose(got[m], want, rtol=1e-10, atol=1e-12)


def test_mrmr_stepwise_matches_full(spark, coded):
    """strategy='stepwise' must pick the identical features (same kernel,
    same tie-breaks) and its partial redundancy columns must equal the full
    matrix's on every computed (candidate, selected) entry."""
    X, y, _ = coded
    full_pick, full_rel, full_red = mrmr_select_matrix(
        spark, X, y, n_select=5, strategy="full"
    )
    step_pick, step_rel, step_red = mrmr_select_matrix(
        spark, X, y, n_select=5, strategy="stepwise"
    )
    np.testing.assert_array_equal(step_pick, full_pick)
    np.testing.assert_allclose(step_rel, full_rel, rtol=0, atol=0)
    filled = step_red != 0
    np.testing.assert_allclose(step_red[filled], full_red[filled], rtol=0, atol=0)


def test_jmi_matrix_matches_dataframe_path(spark, coded):
    """Step-wise joint-MI columns reproduce the DataFrame cube path's
    greedy JMI selection (separate-vocab cube vs shared-space kernel —
    equal in exact arithmetic; selection must agree)."""
    import pandas as pd

    from fastselect_spark.selection import jmi_select
    from fastselect_spark.selection.matrix import jmi_select_matrix

    X, y, _ = coded
    cols = [f"f{i}" for i in range(X.shape[1])]
    pdf = pd.DataFrame(X, columns=cols)
    pdf["label"] = y
    ndf = spark.createDataFrame(pdf)
    want = jmi_select(ndf, cols, "label", n_select=5)
    got, rel = jmi_select_matrix(spark, X, y, n_select=5)
    assert got == want
    rel_o, _ = mi_matrices_oracle(X.astype(np.int64), y.astype(np.int64))
    np.testing.assert_allclose(rel, rel_o, rtol=1e-10, atol=1e-12)


def test_cmim_matrix_matches_dataframe_path(spark, coded):
    import pandas as pd

    from fastselect_spark.selection import cmim_select
    from fastselect_spark.selection.matrix import cmim_select_matrix

    X, y, _ = coded
    cols = [f"f{i}" for i in range(X.shape[1])]
    pdf = pd.DataFrame(X, columns=cols)
    pdf["label"] = y
    ndf = spark.createDataFrame(pdf)
    want = cmim_select(ndf, cols, "label", n_select=5)
    got, _ = cmim_select_matrix(spark, X, y, n_select=5)
    assert got == want


def test_stepwise_engine_rejects_bad_n_select(spark, coded):
    from fastselect_spark.selection.matrix import jmi_select_matrix

    X, y, _ = coded
    with pytest.raises(ValueError, match="n_select"):
        jmi_select_matrix(spark, X, y, n_select=0)


def test_stepwise_engine_rejects_oversize_broadcast(spark, monkeypatch):
    """The engine must refuse (clear contract error, not a JVM OOM) when
    the coded matrix exceeds the broadcast budget."""
    from fastselect_spark.selection import matrix as matrix_mod

    monkeypatch.setattr(matrix_mod, "MAX_BROADCAST_BYTES", 64)
    with pytest.raises(ValueError, match="wide-matrix"):
        matrix_mod.BroadcastMIEngine(
            spark, np.zeros((8, 4), dtype=np.int64), np.zeros(8, dtype=np.int64)
        )
