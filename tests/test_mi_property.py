"""Property-based MI/chi2 testing (hypothesis): the distributed cube kernel
must agree with the independent NumPy oracle on arbitrary small integer
matrices, and MI must be invariant under bijective recoding of any feature
(the shared-vocabulary encoding, mRMR.py:90, must not change information
content)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fastselect_spark.selection import chi2, mi_matrices
from oracle_numpy import chi2_oracle, mi_matrices_oracle

_matrix = st.integers(0, 4).flatmap(
    lambda _: st.lists(
        st.lists(st.integers(0, 3), min_size=3, max_size=3),
        min_size=8,
        max_size=25,
    )
)
_labels = st.lists(st.integers(0, 2), min_size=8, max_size=25)


def _to_df(spark, X, y):
    cols = [f"f{i}" for i in range(X.shape[1])]
    pdf = pd.DataFrame(X, columns=cols)
    pdf["label"] = y
    return spark.createDataFrame(pdf).repartition(3), cols


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_matrix, labels=_labels)
def test_mi_and_chi2_match_numpy_oracle(spark, rows, labels):
    n = min(len(rows), len(labels))
    X = np.array(rows[:n], dtype=np.int64)
    y = np.array(labels[:n], dtype=np.int64)
    df, cols = _to_df(spark, X, y)

    rel, red = mi_matrices(df, cols, "label", unit="bit")
    exp_rel, exp_red = mi_matrices_oracle(X, y)
    np.testing.assert_allclose(rel, exp_rel, atol=1e-9)
    np.testing.assert_allclose(red, exp_red, atol=1e-9)

    stats, _ = chi2(df, cols, "label")
    np.testing.assert_allclose(stats, chi2_oracle(X, y), atol=1e-9)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_matrix, labels=_labels, shift=st.integers(1, 7))
def test_mi_invariant_under_bijective_recode(spark, rows, labels, shift):
    """I(f; y) and I(fi; fj) are invariant when a feature's values are
    bijectively remapped (here: x -> 10*x + shift on column 0)."""
    n = min(len(rows), len(labels))
    X = np.array(rows[:n], dtype=np.int64)
    y = np.array(labels[:n], dtype=np.int64)
    X2 = X.copy()
    X2[:, 0] = 10 * X2[:, 0] + shift

    df1, cols = _to_df(spark, X, y)
    df2, _ = _to_df(spark, X2, y)
    rel1, red1 = mi_matrices(df1, cols, "label", unit="bit")
    rel2, red2 = mi_matrices(df2, cols, "label", unit="bit")
    np.testing.assert_allclose(rel1, rel2, atol=1e-9)
    np.testing.assert_allclose(red1, red2, atol=1e-9)
