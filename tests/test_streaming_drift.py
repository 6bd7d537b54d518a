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


def test_streaming_window_quantiles_equals_numpy(spark):
    """Complete-mode availableNow exact per-window percentiles equal
    NumPy linear interpolation (the quantile_cont family), including a
    second wave updating already-open windows; approx mode keeps the
    schema and lands within its rank-error envelope."""
    import pytest

    from fastselect_spark.streaming import streaming_window_quantiles

    rng = np.random.default_rng(29)
    n = 240
    rows = pd.DataFrame(
        {
            "ts": (
                pd.to_datetime("2024-03-01")
                + pd.to_timedelta(rng.choice(1200, n, replace=False), unit="s")
            ).astype("datetime64[us]"),
            "v": np.round(rng.normal(100, 25, n), 6),
        }
    )
    root = tempfile.mkdtemp(prefix="quant_stream_")
    for w in (0, 1):
        rows[rows.index % 2 == w].to_parquet(f"{root}/wave{w}.parquet", index=False)
        os.utime(f"{root}/wave{w}.parquet", (1e9 + w, 1e9 + w))

    def run(exact: bool, name: str):
        stream = (
            spark.readStream.schema("ts timestamp, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(root)
        )
        out = streaming_window_quantiles(
            stream, "v", probs=(0.5, 0.9), window="5 minutes", exact=exact
        )
        ckpt = tempfile.mkdtemp(prefix="quant_ckpt_")
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return spark.table(name).toPandas()

    got = run(True, "quant_stream_exact")
    win = (rows["ts"].astype("int64") // 1_000_000 // 300) * 300
    grouped = rows.groupby(win)["v"]
    exp = {
        pd.Timestamp(w, unit="s"): (
            len(g),
            float(np.percentile(g, 50)),
            float(np.percentile(g, 90)),
        )
        for w, g in grouped
    }
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n_exp, q50, q90 = exp[pd.Timestamp(r["window_start"])]
        assert r["n"] == n_exp
        assert r["q50"] == pytest.approx(q50, abs=1e-9)
        assert r["q90"] == pytest.approx(q90, abs=1e-9)

    approx = run(False, "quant_stream_approx")
    assert list(approx.columns) == ["window_start", "n", "q50", "q90"]
    for _, r in approx.iterrows():
        n_exp, q50, q90 = exp[pd.Timestamp(r["window_start"])]
        assert r["n"] == n_exp
        lo_v, hi_v = rows["v"].min(), rows["v"].max()
        assert lo_v <= r["q50"] <= r["q90"] <= hi_v


def test_streaming_hll_registers_equal_batch(spark):
    """Two-wave availableNow register maintenance + the shared batch fold
    == batch hll_distinct over each window's slice, bit for bit (the
    register projection is literally shared code)."""
    from pyspark.sql import functions as F

    from fastselect_spark.corpus import hll_distinct
    from fastselect_spark.streaming import (
        hll_estimate_from_window_registers,
        streaming_hll_registers,
    )

    rng = np.random.default_rng(31)
    n = 600
    rows = pd.DataFrame(
        {
            "ts": (
                pd.to_datetime("2024-03-01")
                + pd.to_timedelta(rng.choice(1200, n, replace=False), unit="s")
            ).astype("datetime64[us]"),
            # duplicates on purpose: distinct < row count per window
            "v": [f"u{int(x)}" for x in rng.integers(0, 150, n)],
        }
    )
    root = tempfile.mkdtemp(prefix="hll_stream_")
    for w in (0, 1):
        rows[rows.index % 2 == w].to_parquet(f"{root}/wave{w}.parquet", index=False)
        os.utime(f"{root}/wave{w}.parquet", (1e9 + w, 1e9 + w))

    stream = (
        spark.readStream.schema("ts timestamp, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    regs = streaming_hll_registers(stream, [], "v", p=6, window="5 minutes")
    ckpt = tempfile.mkdtemp(prefix="hll_ckpt_")
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_stream_regs")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = hll_estimate_from_window_registers(
        spark.table("hll_stream_regs"), [], p=6
    ).toPandas()

    batch = spark.createDataFrame(rows)
    batch = batch.withColumn(
        "window_start",
        F.timestamp_seconds((F.unix_timestamp("ts") / 300).cast("long") * 300),
    )
    exp = {
        r["window_start"]: (r["registers_hit"], r["hll_estimate"])
        for _, r in hll_distinct(batch, ["window_start"], "v", p=6)
        .toPandas()
        .iterrows()
    }
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        hit, est = exp[r["window_start"]]
        assert r["registers_hit"] == hit
        assert r["hll_estimate"] == est  # bit-identical


def test_streaming_countmin_registers_equal_batch(spark):
    """Two-wave availableNow counter maintenance == the batch sketch per
    window slice (additive merge), and lookups through the batch
    countmin_lookup return exact counts at collision-free width."""
    from pyspark.sql import functions as F

    from fastselect_spark.corpus import countmin_lookup, countmin_sketch
    from fastselect_spark.streaming import streaming_countmin_registers

    rng = np.random.default_rng(37)
    n = 500
    rows = pd.DataFrame(
        {
            "ts": (
                pd.to_datetime("2024-03-01")
                + pd.to_timedelta(rng.choice(900, n, replace=False), unit="s")
            ).astype("datetime64[us]"),
            "k": [f"key{int(x)}" for x in rng.integers(0, 40, n)],
        }
    )
    root = tempfile.mkdtemp(prefix="cm_stream_")
    for w in (0, 1):
        rows[rows.index % 2 == w].to_parquet(f"{root}/wave{w}.parquet", index=False)
        os.utime(f"{root}/wave{w}.parquet", (1e9 + w, 1e9 + w))

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    regs = streaming_countmin_registers(
        stream, "k", depth=3, width=2048, window="5 minutes"
    )
    ckpt = tempfile.mkdtemp(prefix="cm_ckpt_")
    q = (
        regs.writeStream.format("memory")
        .queryName("cm_stream_regs")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.table("cm_stream_regs")

    batch = spark.createDataFrame(rows).withColumn(
        "window_start",
        F.timestamp_seconds((F.unix_timestamp("ts") / 300).cast("long") * 300),
    )
    for ws in [r.window_start for r in batch.select("window_start").distinct().collect()]:
        cells_stream = {
            (r.row, r.bucket): r.cnt
            for r in got.where(F.col("window_start") == ws).collect()
        }
        sl = batch.where(F.col("window_start") == ws)
        cells_batch = {
            (r.row, r.bucket): r.cnt
            for r in countmin_sketch(sl, "k", depth=3, width=2048).collect()
        }
        assert cells_stream == cells_batch
        # exact counts through the shared lookup at collision-free width
        keys = sl.select("k").distinct()
        exact = {r.k: r["count"] for r in sl.groupBy("k").count().collect()}
        est = {
            r.k: r.cm_estimate
            for r in countmin_lookup(
                got.where(F.col("window_start") == ws).drop("window_start"),
                keys, "k", depth=3, width=2048,
            ).collect()
        }
        assert est == exact


def test_streaming_hll_append_mode_finalizes_windows(spark):
    """With a watermark, the register stream runs APPEND mode: windows
    finalize (emit once) when the watermark passes — the bounded-state
    production configuration — and the finalized registers still equal
    the batch sketch for those windows."""
    from pyspark.sql import functions as F

    from fastselect_spark.corpus import hll_distinct
    from fastselect_spark.streaming import (
        hll_estimate_from_window_registers,
        streaming_hll_registers,
    )

    rng = np.random.default_rng(47)
    early = pd.DataFrame(
        {
            "ts": (
                pd.to_datetime("2024-03-01")
                + pd.to_timedelta(rng.choice(600, 200, replace=False), unit="s")
            ).astype("datetime64[us]"),
            "v": [f"u{int(x)}" for x in rng.integers(0, 80, 200)],
        }
    )
    # a far-future spacer advances the watermark past the early windows
    late = pd.DataFrame(
        {
            "ts": pd.Series([pd.Timestamp("2024-03-01 02:00:00")]).astype(
                "datetime64[us]"
            ),
            "v": ["spacer"],
        }
    )
    root = tempfile.mkdtemp(prefix="hll_append_")
    early.to_parquet(f"{root}/wave0.parquet", index=False)
    late.to_parquet(f"{root}/wave1.parquet", index=False)
    os.utime(f"{root}/wave0.parquet", (1e9, 1e9))
    os.utime(f"{root}/wave1.parquet", (1e9 + 1, 1e9 + 1))

    stream = (
        spark.readStream.schema("ts timestamp, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    regs = streaming_hll_registers(
        stream, [], "v", p=6, window="5 minutes", watermark="10 seconds"
    )
    ckpt = tempfile.mkdtemp(prefix="hll_append_ckpt_")
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_append_regs")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = hll_estimate_from_window_registers(
        spark.table("hll_append_regs"), [], p=6
    ).toPandas()
    # the early (finalized) windows match batch exactly
    batch = spark.createDataFrame(early).withColumn(
        "window_start",
        F.timestamp_seconds((F.unix_timestamp("ts") / 300).cast("long") * 300),
    )
    exp = {
        r["window_start"]: (r["registers_hit"], r["hll_estimate"])
        for _, r in hll_distinct(batch, ["window_start"], "v", p=6)
        .toPandas()
        .iterrows()
    }
    finalized = {
        r["window_start"]: (r["registers_hit"], r["hll_estimate"])
        for _, r in got.iterrows()
        if pd.Timestamp(r["window_start"]) < pd.Timestamp("2024-03-01 01:00:00")
    }
    assert finalized == exp  # every early window emitted, bit-equal to batch
