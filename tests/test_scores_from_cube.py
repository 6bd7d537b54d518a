"""Single-pass cube scoring must reproduce the separate chi2 / mi_matrices
passes exactly (same sufficient statistics, one aggregation)."""

from __future__ import annotations

import numpy as np
import pytest

from fastselect_spark.selection import chi2, mi_matrices, scores_from_cube


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.default_rng(11)
    n = 3000
    rows = [
        (
            int(rng.integers(0, 6)),
            int(rng.integers(0, 4)),
            int(rng.integers(0, 11)),
            int(rng.integers(0, 2)),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, schema="a int, b int, c int, label int")


def test_cube_scores_match_separate_passes(spark, frame):
    cols = ["a", "b", "c"]
    out = scores_from_cube(frame, cols, "label")
    stats, pvals = chi2(frame, cols, "label")
    rel, red = mi_matrices(frame, cols, "label")
    np.testing.assert_allclose(out["chi2"], stats, rtol=1e-12)
    np.testing.assert_allclose(out["p_values"], pvals, rtol=1e-12)
    np.testing.assert_allclose(out["relevance"], rel, rtol=1e-12)
    np.testing.assert_allclose(out["redundancy"], red, rtol=1e-12)
    assert out["n"] == 3000


def test_cube_scores_single_class(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], schema="a int, label int"
    )
    out = scores_from_cube(df, ["a"], "label")
    assert out["chi2"][0] == 0.0 and out["p_values"][0] == 1.0


def test_cube_scores_rejects_negative(spark):
    df = spark.createDataFrame(
        [(-1, 0), (2, 1)], schema="a int, label int"
    )
    with pytest.raises(ValueError, match="non-negative"):
        scores_from_cube(df, ["a"], "label")
