"""As-of join tests: brute-force oracle, strategy agreement, exact-match
semantics, skew slicing, and the future-sentinel leakage canary
(SURVEY.md §5.2 Tier 3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fastselect_spark.featurize.asof import asof_join

STRATEGIES = ["window", "salted_window", "pandas"]


def _mk(spark, seed=7, n_keys=12, n_left=300, n_right=200):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2026-01-01")
    left = pd.DataFrame(
        {
            "conv_id": [f"k{int(i)}" for i in rng.integers(0, n_keys, n_left)],
            "ts": base + pd.to_timedelta(rng.integers(0, 500_000, n_left), unit="s"),
            "probe": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "conv_id": [f"k{int(i)}" for i in rng.integers(0, n_keys, n_right)],
            "ts": base + pd.to_timedelta(rng.integers(0, 500_000, n_right), unit="s"),
            "val": rng.normal(size=n_right).round(6),
            "cat": [f"c{int(i)}" for i in rng.integers(0, 5, n_right)],
        }
    )
    # drop duplicate (key, ts) on the right so "latest" is unambiguous
    right = right.drop_duplicates(["conv_id", "ts"])
    return left, right, spark.createDataFrame(left), spark.createDataFrame(right)


def _oracle(left: pd.DataFrame, right: pd.DataFrame, exact=True) -> pd.DataFrame:
    out_val, out_cat = [], []
    for _, row in left.iterrows():
        r = right[right.conv_id == row.conv_id]
        r = r[r.ts <= row.ts] if exact else r[r.ts < row.ts]
        if len(r):
            last = r.sort_values("ts").iloc[-1]
            out_val.append(last["val"])
            out_cat.append(last["cat"])
        else:
            out_val.append(None)
            out_cat.append(None)
    out = left.copy()
    out["val_asof"] = out_val
    out["cat_asof"] = out_cat
    return out


def _cmp(res: pd.DataFrame, exp: pd.DataFrame):
    res = res.sort_values("probe").reset_index(drop=True)
    exp = exp.sort_values("probe").reset_index(drop=True)
    assert len(res) == len(exp)
    v1, v2 = res["val_asof"].astype(float), exp["val_asof"].astype(float)
    assert ((v1.isna() & v2.isna()) | (abs(v1 - v2) < 1e-12)).all()
    c1 = res["cat_asof"].where(res["cat_asof"].notna(), None)
    c2 = exp["cat_asof"].where(exp["cat_asof"].notna(), None)
    assert (c1.fillna("∅") == c2.fillna("∅")).all()


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_asof_matches_bruteforce(spark, strategy):
    left, right, ldf, rdf = _mk(spark)
    res = asof_join(
        ldf, rdf, value_cols=["val", "cat"], strategy=strategy,
        salt_slice_seconds=50_000.0,
    ).toPandas()
    _cmp(res, _oracle(left, right, exact=True))


@pytest.mark.parametrize("strategy", ["window", "salted_window", "pandas"])
def test_asof_strict_inequality(spark, strategy):
    left, right, ldf, rdf = _mk(spark, seed=11)
    # plant exact-ts collisions
    right2 = right.copy()
    collide = left.iloc[:20][["conv_id", "ts"]].copy()
    collide["val"] = 999.0
    collide["cat"] = "exact"
    right2 = (
        pd.concat([right2, collide]).drop_duplicates(["conv_id", "ts"], keep="last")
    )
    rdf2 = spark.createDataFrame(right2)
    res = asof_join(
        ldf, rdf2, value_cols=["val", "cat"], strategy=strategy,
        allow_exact_matches=False, salt_slice_seconds=50_000.0,
    ).toPandas()
    _cmp(res, _oracle(left, right2, exact=False))


def test_asof_exact_match_visible(spark):
    left = pd.DataFrame(
        {"conv_id": ["a"], "ts": [pd.Timestamp("2026-01-02")], "probe": [0]}
    )
    right = pd.DataFrame(
        {
            "conv_id": ["a", "a"],
            "ts": [pd.Timestamp("2026-01-01"), pd.Timestamp("2026-01-02")],
            "val": [1.0, 2.0],
            "cat": ["x", "y"],
        }
    )
    for strategy in STRATEGIES:
        res = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            value_cols=["val", "cat"],
            strategy=strategy,
        ).toPandas()
        assert res["val_asof"].iloc[0] == 2.0, strategy


def test_leakage_sentinel_never_surfaces(spark):
    """Plant a right-side value that exists only AFTER every anchor; it must
    never appear in any as-of result (the north_rule leakage canary)."""
    left, right, ldf, _ = _mk(spark, seed=13)
    sentinel_ts = left["ts"].max() + pd.Timedelta(seconds=1)
    fut = pd.DataFrame(
        {
            "conv_id": left["conv_id"].unique(),
            "ts": sentinel_ts,
            "val": -123456.0,
            "cat": "FUTURE",
        }
    )
    rdf = spark.createDataFrame(pd.concat([right, fut], ignore_index=True))
    for strategy in STRATEGIES:
        res = asof_join(
            ldf, rdf, value_cols=["val", "cat"], strategy=strategy,
            salt_slice_seconds=50_000.0,
        ).toPandas()
        assert not (res["cat_asof"] == "FUTURE").any(), strategy
        assert not (res["val_asof"] == -123456.0).any(), strategy


def test_salted_slices_split_hot_key(spark):
    """A single hot key spanning many slices still yields exact results."""
    base = pd.Timestamp("2026-01-01")
    n = 5000
    left = pd.DataFrame(
        {
            "conv_id": ["hot"] * n,
            "ts": base + pd.to_timedelta(np.arange(n) * 37, unit="s"),
            "probe": np.arange(n),
        }
    )
    right = pd.DataFrame(
        {
            "conv_id": ["hot"] * (n // 10),
            "ts": base + pd.to_timedelta(np.arange(n // 10) * 370 + 5, unit="s"),
            "val": np.arange(n // 10, dtype=float),
            "cat": "r",
        }
    )
    res = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        value_cols=["val"],
        strategy="salted_window",
        salt_slice_seconds=600.0,  # ~300 slices for one key
    ).toPandas()
    exp = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        value_cols=["val"],
        strategy="window",
    ).toPandas()
    res = res.sort_values("probe").reset_index(drop=True)
    exp = exp.sort_values("probe").reset_index(drop=True)
    v1, v2 = res["val_asof"].astype(float), exp["val_asof"].astype(float)
    assert ((v1.isna() & v2.isna()) | (v1 == v2)).all()


def test_asof_tolerance_matches_merge_asof(spark):
    """asof_join_tolerance == pd.merge_asof(tolerance=...) on a random
    fixture, across all three strategies."""
    import numpy as np
    import pandas as pd

    from fastselect_spark.featurize import asof_join_tolerance

    rng = np.random.default_rng(41)
    base = pd.Timestamp("2026-02-01")
    lrows, rrows = [], []
    for c in range(6):
        for t in sorted(rng.choice(2000, 25, replace=False)):
            lrows.append((f"c{c}", (base + pd.Timedelta(seconds=int(t))).to_pydatetime()))
        for t in sorted(rng.choice(2000, 8, replace=False)):
            rrows.append((f"c{c}", (base + pd.Timedelta(seconds=int(t))).to_pydatetime(), float(rng.integers(0, 100))))
    left = spark.createDataFrame(lrows, "conv_id string, ts timestamp")
    right = spark.createDataFrame(rrows, "conv_id string, ts timestamp, v double")
    lp = pd.DataFrame(lrows, columns=["conv_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["conv_id", "ts", "v"]).sort_values("ts")
    exp = pd.merge_asof(
        lp, rp, on="ts", by="conv_id",
        tolerance=pd.Timedelta(seconds=300), direction="backward",
    )
    expmap = {
        (r.conv_id, pd.Timestamp(r.ts)): None if pd.isna(r.v) else r.v
        for r in exp.itertuples()
    }
    for strategy in ("window", "salted_window", "pandas"):
        got = {
            (r.conv_id, pd.Timestamp(r.ts)): r.v_asof
            for r in asof_join_tolerance(
                left, right, 300.0, strategy=strategy
            ).collect()
        }
        assert got == expmap, strategy


def test_asof_tolerance_nullable_payload_not_backfilled(spark):
    """A NULL field in the freshest match stays NULL (struct carry), and a
    stale match nulls ALL value columns."""
    from fastselect_spark.featurize import asof_join_tolerance

    left = spark.createDataFrame(
        [("c", 100), ("c", 500)], "conv_id string, ts long"
    )
    right = spark.createDataFrame(
        [("c", 50, 1.0, "x"), ("c", 90, None, "y")],
        "conv_id string, ts long, a double, b string",
    )
    got = {
        r.ts: (r.a_asof, r.b_asof)
        for r in asof_join_tolerance(left, right, 50.0).collect()
    }
    # ts=100: freshest is ts=90 (age 10 <= 50): a is GENUINELY NULL, b='y'
    assert got[100] == (None, "y")
    # ts=500: freshest is ts=90 (age 410 > 50): everything nulled
    assert got[500] == (None, None)
