"""Property-based as-of join testing (hypothesis — the reference uses the
same technique for MDR, tests/test_mdr.py:135-150): on random small
conversation layouts, all three strategies must agree with each other and
with a brute-force pandas oracle, for both allow_exact_matches settings."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fastselect_spark.featurize import asof_join

_layout = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # conv bucket
        st.integers(min_value=0, max_value=1000),   # left ts offset (s)
    ),
    min_size=1,
    max_size=25,
)
_right_layout = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=1000),
        st.floats(min_value=-5, max_value=5, allow_nan=False),
    ),
    min_size=0,
    max_size=15,
)


def _brute(left: pd.DataFrame, right: pd.DataFrame, exact: bool) -> list:
    if not len(right):
        return [None] * len(left)
    out = []
    for _, lrow in left.iterrows():
        cand = right[right.conv_id == lrow.conv_id]
        cand = (
            cand[cand.ts <= lrow.ts] if exact else cand[cand.ts < lrow.ts]
        )
        if len(cand):
            best = cand.sort_values(["ts"], kind="mergesort").iloc[-1]
            out.append(float(best.v))
        else:
            out.append(None)
    return out


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(lefts=_layout, rights=_right_layout, exact=st.booleans())
def test_asof_strategies_agree_with_bruteforce(spark, lefts, rights, exact):
    base = pd.Timestamp("2024-01-01", tz=None)
    left = pd.DataFrame(
        {
            "conv_id": [f"c{c}" for c, _ in lefts],
            "turn_idx": np.arange(len(lefts), dtype=np.int32),
            "ts": [base + pd.Timedelta(seconds=s) for _, s in lefts],
        }
    )
    right = pd.DataFrame(
        {
            "conv_id": [f"c{c}" for c, _, _ in rights],
            "ts": [base + pd.Timedelta(seconds=s) for _, s, _ in rights],
            "v": [v for _, _, v in rights],
        }
    )
    # dedupe right on (conv_id, ts): ties on the as-of key would make the
    # "latest" value ambiguous (the engine breaks ties deterministically but
    # the pandas oracle's ordering differs)
    right = right.drop_duplicates(subset=["conv_id", "ts"], keep="first")

    ldf = spark.createDataFrame(left, schema="conv_id string, turn_idx int, ts timestamp")
    rdf = (
        spark.createDataFrame(right, schema="conv_id string, ts timestamp, v double")
        if len(right)
        else spark.createDataFrame([], schema="conv_id string, ts timestamp, v double")
    )
    expect = _brute(left, right, exact)
    for strategy in ("window", "salted_window", "pandas"):
        got_df = asof_join(
            ldf,
            rdf,
            strategy=strategy,
            allow_exact_matches=exact,
            salt_slice_seconds=120.0,
        )
        got = {
            int(r["turn_idx"]): r["v_asof"]
            for r in got_df.select("turn_idx", "v_asof").collect()
        }
        for ti, want in zip(left.turn_idx, expect):
            have = got[int(ti)]
            if want is None:
                assert have is None, (strategy, ti)
            else:
                assert have == pytest.approx(want), (strategy, ti)
