"""Leakage-safe encoding tests: pandas expanding-window replica, an
explicit no-leakage property (a row's encoding is invariant to its own and
all later labels), and hash-bucket portability vs hashlib."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from fastselect_spark.featurize import (
    count_encode_expanding,
    hash_encode,
    target_encode_expanding,
)


def _frame(spark, n=60, seed=5):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "conv_id": [str(i % 7) for i in range(n)],
            "turn_idx": [i // 7 for i in range(n)],
            "role": rng.choice(["user", "assistant", "tool"], n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.permutation(n), unit="m"),
            "label": rng.integers(0, 2, n),
        }
    )
    return spark.createDataFrame(pdf).repartition(4), pdf


def _expanding_oracle(pdf, prior=0.5, alpha=10.0):
    pdf = pdf.sort_values(["ts", "conv_id", "turn_idx"], kind="mergesort")
    te, ce = {}, {}
    sums: dict[str, float] = {}
    cnts: dict[str, int] = {}
    for _, r in pdf.iterrows():
        k = r["role"]
        s, c = sums.get(k, 0.0), cnts.get(k, 0)
        te[(r["conv_id"], r["turn_idx"])] = (s + alpha * prior) / (c + alpha)
        ce[(r["conv_id"], r["turn_idx"])] = c
        sums[k] = s + float(r["label"])
        cnts[k] = c + 1
    return te, ce


def test_expanding_encoders_match_pandas(spark):
    df, pdf = _frame(spark)
    out = count_encode_expanding(
        target_encode_expanding(df, ["role"], "label"), ["role"]
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["te"], r["ce"])
        for r in out.collect()
    }
    te, ce = _expanding_oracle(pdf)
    for k, (gte, gce) in got.items():
        assert abs(gte - te[k]) < 1e-12 and gce == ce[k]


def test_no_temporal_leakage(spark):
    """Flipping every label at or after time T must not change any
    encoding of rows strictly before T — the zero-leakage invariant."""
    df, pdf = _frame(spark, n=40, seed=9)
    cut = pdf["ts"].sort_values().iloc[25]
    flipped = pdf.copy()
    late = flipped["ts"] >= cut
    flipped.loc[late, "label"] = 1 - flipped.loc[late, "label"]
    df2 = spark.createDataFrame(flipped).repartition(4)

    def early_te(frame):
        out = target_encode_expanding(frame, ["role"], "label")
        return {
            (r["conv_id"], r["turn_idx"]): r["te"]
            for r in out.collect()
            if pd.Timestamp(r["ts"]) < cut
        }

    a, b = early_te(df), early_te(df2)
    assert a and a == b


def test_first_occurrence_gets_prior(spark):
    df, pdf = _frame(spark, n=30, seed=3)
    out = target_encode_expanding(df, ["role"], "label", prior=0.25, alpha=4.0)
    first_ts = pdf.sort_values(["ts", "conv_id", "turn_idx"]).groupby("role")[
        "ts"
    ].min()
    rows = out.collect()
    for r in rows:
        if pd.Timestamp(r["ts"]) == first_ts[r["role"]]:
            assert abs(r["te"] - 0.25) < 1e-12


def test_hash_encode_portable_and_rowlocal(spark):
    df, pdf = _frame(spark, n=25, seed=1)
    out = hash_encode(df, ["role"], n_buckets=16, seed=7).collect()
    for r in out:
        h = int(hashlib.md5(f"7:{r['role']}".encode()).hexdigest()[:15], 16)
        assert r["role_hb"] == h % 16
    # shuffle-free: the plan has no Exchange
    plan = (
        hash_encode(spark.createDataFrame(pdf), ["role"], 16, 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_conversation_features_numpy_replica(spark):
    """Per-conversation aggregates vs a pandas groupby replica, including
    the exact role-entropy expression."""
    from fastselect_spark.featurize import conversation_features

    rng = np.random.default_rng(29)
    n = 90
    pdf = pd.DataFrame(
        {
            "conv_id": [str(i % 6) for i in range(n)],
            "role": rng.choice(["user", "assistant", "tool"], n),
            "tool": np.where(rng.random(n) < 0.3, "code", None),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.permutation(n) * 61, unit="s"),
            "session_id": rng.integers(0, 3, n),
            "n_tokens": rng.integers(1, 50, n).astype(float),
        }
    )
    df = spark.createDataFrame(pdf).repartition(4)
    got = conversation_features(df).toPandas().set_index("conv_id")
    for conv, g in pdf.groupby("conv_id"):
        row = got.loc[conv]
        assert row["n_turns"] == len(g)
        assert row["duration_s"] == (
            g["ts"].max().floor("s") - g["ts"].min().floor("s")
        ).total_seconds()
        assert row["n_sessions"] == g["session_id"].max() + 1
        assert row["n_tool_calls"] == g["tool"].notna().sum()
        assert abs(row["tokens_avg"] - g["n_tokens"].mean()) < 1e-9
        p = g["role"].value_counts(normalize=True).to_numpy()
        assert abs(row["role_entropy"] - float(-(p * np.log(p)).sum())) < 1e-12


def test_frequency_encode_ranks_and_broadcast(spark):
    from fastselect_spark.featurize import frequency_encode

    pdf = pd.DataFrame(
        {"id": range(10), "c": ["x", "y", "x", "z", "x", "y", "w", "y", "x", "q"]}
    )
    df = spark.createDataFrame(pdf).repartition(3)
    out = frequency_encode(df, "c").toPandas().set_index("id")
    # counts: x=4, y=3, w=1, q=1, z=1 -> ranks x=1, y=2, then q,w,z by value
    assert out.loc[0, "c_rank"] == 1 and out.loc[0, "c_freq"] == 4
    assert out.loc[1, "c_rank"] == 2 and out.loc[1, "c_freq"] == 3
    assert out.loc[9, "c_rank"] == 3   # q before w before z
    assert out.loc[6, "c_rank"] == 4
    assert out.loc[3, "c_rank"] == 5
    plan = (
        frequency_encode(df, "c")._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
