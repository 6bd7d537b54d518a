"""Streaming PSI monitor: complete-mode availableNow equals the batch
per-window PSI computed by the NumPy replica, including late-arriving
rows for an already-open window (second wave updates the window state)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd

from fastselect_spark.featurize.drift import reference_histogram
from fastselect_spark.streaming import streaming_psi


def _psi(p_counts, q_props, bins=10, eps=1e-6):
    p = p_counts / max(p_counts.sum(), 1.0)
    p = np.maximum(p, eps)
    q = np.maximum(q_props, eps)
    return float(((p - q) * np.log(p / q)).sum())


def test_streaming_psi_equals_batch(spark):
    rng = np.random.default_rng(13)
    n = 300
    rows = pd.DataFrame(
        {
            "ts": (
                pd.to_datetime("2024-03-01")
                + pd.to_timedelta(rng.choice(1800, n, replace=False), unit="s")
            ).astype("datetime64[us]"),
            "v": np.round(rng.normal(50, 12, n), 6),
        }
    )
    ref_pdf = pd.DataFrame({"v": np.round(rng.normal(48, 10, 400), 6)})
    ref = spark.createDataFrame(ref_pdf)
    lo, width, props = reference_histogram(ref, "v", bins=10)

    root = tempfile.mkdtemp(prefix="psi_stream_")
    # interleaved waves: every window receives rows from BOTH batches
    for w in (0, 1):
        rows[rows.index % 2 == w].to_parquet(f"{root}/wave{w}.parquet", index=False)
        os.utime(f"{root}/wave{w}.parquet", (1e9 + w, 1e9 + w))
    stream = (
        spark.readStream.schema("ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    out = streaming_psi(stream, "v", lo, width, props, window="5 minutes")
    ckpt = tempfile.mkdtemp(prefix="psi_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName("psi_stream_test")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.table("psi_stream_test").toPandas()

    win = (rows["ts"].astype("int64") // 1_000_000 // 300) * 300
    bins = np.clip(np.floor((rows["v"] - lo) / width), 0, 9).astype(int)
    exp = {}
    for wstart, grp in pd.DataFrame({"w": win, "b": bins}).groupby("w"):
        exp[pd.Timestamp(wstart, unit="s")] = (
            len(grp), _psi(np.bincount(grp["b"], minlength=10), props)
        )
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n_exp, psi_exp = exp[pd.Timestamp(r["window_start"])]
        assert r["n"] == n_exp
        assert abs(r["psi"] - psi_exp) < 1e-9
