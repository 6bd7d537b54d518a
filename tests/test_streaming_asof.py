"""Streaming point-in-time enrichment tests: exact equality with pandas
merge_asof (the batch as-of oracle) over time-ordered arrival waves, with
and without tolerance, including matches whose feature arrived in an
EARLIER micro-batch (keyed state carry)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pytest

from fastselect_spark.streaming import streaming_asof_enrich


def _fixture(n=200, nf=60, seed=3):
    rng = np.random.default_rng(seed)
    turns = pd.DataFrame(
        {
            "conv_id": [str(i % 9) for i in range(n)],
            "turn_idx": [i // 9 for i in range(n)],
            "kind": 1,
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.choice(20000, n, replace=False), unit="s"),
            "fval": np.nan,
        }
    )
    feats = pd.DataFrame(
        {
            "conv_id": [str(i % 9) for i in range(nf)],
            "turn_idx": -1,
            "kind": 0,
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.choice(20000, nf, replace=False), unit="s"),
            "fval": rng.normal(0, 1, nf).round(6),
        }
    )
    return turns, feats


def _stage_waves(turns, feats, n_waves=4):
    allrows = (
        pd.concat([turns, feats]).sort_values("ts").reset_index(drop=True)
    )
    allrows["ts"] = allrows["ts"].astype("datetime64[us]")
    root = tempfile.mkdtemp(prefix="asof_stream_")
    wave_of_ts = {}
    for w, idx in enumerate(np.array_split(np.arange(len(allrows)), n_waves)):
        allrows.iloc[idx].to_parquet(f"{root}/wave{w}.parquet", index=False)
        os.utime(f"{root}/wave{w}.parquet", (1e9 + w, 1e9 + w))
        for t in allrows.iloc[idx]["ts"]:
            wave_of_ts[pd.Timestamp(t)] = w
    return root, wave_of_ts


def _run(spark, root, tolerance_s):
    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx long, kind long, ts timestamp, fval double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    out = streaming_asof_enrich(
        stream.where("kind = 1").select("conv_id", "turn_idx", "ts"),
        stream.where("kind = 0").select("conv_id", "ts", "fval"),
        tolerance_s=tolerance_s,
    )
    name = f"asof_t_{'none' if tolerance_s is None else int(tolerance_s)}"
    ckpt = tempfile.mkdtemp(prefix="asof_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    return spark.table(name).toPandas()


@pytest.mark.parametrize("tolerance_s", [None, 3600.0])
def test_streaming_asof_equals_merge_asof(spark, tolerance_s):
    turns, feats = _fixture()
    root, wave_of_ts = _stage_waves(turns, feats)
    got = _run(spark, root, tolerance_s)

    oracle = pd.merge_asof(
        turns[["conv_id", "turn_idx", "ts"]].sort_values("ts"),
        feats[["conv_id", "ts", "fval"]].sort_values("ts").rename(
            columns={"ts": "f_ts"}
        ),
        left_on="ts",
        right_on="f_ts",
        by="conv_id",
        tolerance=None if tolerance_s is None else pd.Timedelta(seconds=tolerance_s),
        direction="backward",
    )
    g = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    o = oracle.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(g) == len(turns) == len(o)
    m = g.merge(o, on=["conv_id", "turn_idx"], suffixes=("_s", "_o"))
    assert (
        m["fval_asof"].fillna(-999).round(9) == m["fval"].fillna(-999).round(9)
    ).all()
    # matched feature timestamps agree too (exact backward pick, not just value)
    both = m[m["fval"].notna()]
    assert (
        pd.to_datetime(both["f_ts_asof"]).values
        == pd.to_datetime(both["f_ts"]).values
    ).all()
    # at least one match crossed micro-batches (feature in an earlier wave
    # than its turn) — proves the keyed state carry, not just in-batch joins
    crossed = sum(
        wave_of_ts[pd.Timestamp(r["f_ts"])] < wave_of_ts[pd.Timestamp(r["ts_o"])]
        if "ts_o" in m.columns
        else wave_of_ts[pd.Timestamp(r["f_ts"])] < wave_of_ts[pd.Timestamp(r["ts_s"])]
        for _, r in both.iterrows()
    )
    assert crossed > 0


def test_streaming_asof_no_feature_yet_is_null(spark):
    """Turns before any feature of their conversation get a null match."""
    turns = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": [0, 1, 0],
            "kind": 1,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:10", "2024-01-01 00:02:00", "2024-01-01 00:00:20"]
            ),
            "fval": np.nan,
        }
    )
    feats = pd.DataFrame(
        {
            "conv_id": ["a"],
            "turn_idx": -1,
            "kind": 0,
            "ts": pd.to_datetime(["2024-01-01 00:01:00"]),
            "fval": [7.5],
        }
    )
    root, _ = _stage_waves(turns, feats, n_waves=2)
    got = _run(spark, root, None).set_index(["conv_id", "turn_idx"])
    assert np.isnan(got.loc[("a", 0), "fval_asof"])
    assert got.loc[("a", 1), "fval_asof"] == 7.5
    assert np.isnan(got.loc[("b", 0), "fval_asof"])
