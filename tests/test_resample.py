"""Grid resampling tests: pandas merge_asof oracle, grid geometry, and
the max_points explosion cap."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fastselect_spark.featurize import resample_grid


def _frame(spark):
    rows = pd.DataFrame(
        {
            "conv_id": ["a"] * 4 + ["b"] * 3,
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:05",
                    "2024-01-01 00:01:40",
                    "2024-01-01 00:03:10",
                    "2024-01-01 00:10:00",
                    "2024-02-01 12:00:00",
                    "2024-02-01 12:00:30",
                    "2024-02-01 12:05:00",
                ]
            ),
            "v": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0],
        }
    )
    return spark.createDataFrame(rows).repartition(3), rows


def test_resample_matches_merge_asof(spark):
    df, rows = _frame(spark)
    out = resample_grid(df, ["v"], step_seconds=60).toPandas()
    for conv, grp in rows.groupby("conv_id"):
        lo, hi = grp["ts"].min(), grp["ts"].max()
        grid = pd.date_range(lo, hi, freq="60s")
        exp = pd.merge_asof(
            pd.DataFrame({"ts": grid}),
            grp[["ts", "v"]].sort_values("ts"),
            on="ts",
            direction="backward",
        )
        got = (
            out[out["conv_id"] == conv]
            .sort_values("ts")
            .reset_index(drop=True)
        )
        assert len(got) == len(exp)
        assert (pd.to_datetime(got["ts"]).values == grid.values).all()
        np.testing.assert_allclose(got["v_asof"], exp["v"])


def test_resample_grid_is_conversation_aligned(spark):
    """Grid starts at each conversation's own min ts, not a global epoch."""
    df, rows = _frame(spark)
    out = resample_grid(df, ["v"], step_seconds=60).toPandas()
    for conv, grp in rows.groupby("conv_id"):
        first = out[out["conv_id"] == conv]["ts"].min()
        assert pd.Timestamp(first) == grp["ts"].min()


def test_resample_max_points_cap(spark):
    df, _ = _frame(spark)
    out = resample_grid(df, ["v"], step_seconds=60, max_points=3).toPandas()
    assert (out.groupby("conv_id").size() <= 4).all()  # lo + 3 steps


def test_resample_invalid_step(spark):
    df, _ = _frame(spark)
    with pytest.raises(ValueError):
        resample_grid(df, ["v"], step_seconds=0)
