"""Tier-4 tests (SURVEY.md §5.2): determinism and kill-resume for the
checkpointed backfill."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fastselect_spark.data.transcripts import TRANSCRIPT_SCHEMA, generate_transcripts_pandas
from fastselect_spark.featurize import featurize_transcripts
from fastselect_spark.runtime.checkpoint import (
    BackfillManifest,
    content_checksum,
    run_resumable_backfill,
)

N_BUCKETS = 6


@pytest.fixture()
def source(spark):
    pdf = generate_transcripts_pandas(n_convs=60, seed=42)

    def src(s):
        return s.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)

    return src


def _pipeline(df):
    return featurize_transcripts(df).select(
        "conv_id", "turn_idx", "turn_gap_s", "session_id", "n_tokens", "label"
    )


def test_backfill_deterministic(spark, source, tmp_path):
    """Same input twice -> identical per-cell checksums and row counts."""
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    s1 = run_resumable_backfill(spark, source, _pipeline, out1, N_BUCKETS)
    s2 = run_resumable_backfill(spark, source, _pipeline, out2, N_BUCKETS)
    assert s1["rows"] == s2["rows"] > 0
    m1 = {e["cell"]: e for e in BackfillManifest(out1).entries()}
    m2 = {e["cell"]: e for e in BackfillManifest(out2).entries()}
    assert set(m1) == set(range(N_BUCKETS))
    for c in m1:
        assert m1[c]["checksum"] == m2[c]["checksum"]
        assert m1[c]["n_rows"] == m2[c]["n_rows"]
        assert m1[c]["metrics"]["wall_sec"] > 0


def test_backfill_covers_all_rows(spark, source, tmp_path):
    out = str(tmp_path / "full")
    run_resumable_backfill(spark, source, _pipeline, out, N_BUCKETS)
    written = spark.read.parquet(*[f"{out}/bucket={b}" for b in range(N_BUCKETS)])
    direct = _pipeline(source(spark))
    assert written.count() == direct.count()
    assert content_checksum(written.select(*direct.columns)) == content_checksum(direct)


def test_backfill_kill_and_resume(spark, source, tmp_path):
    """Fail at cell 3 -> earlier cells committed; resume skips them and the
    final result is identical to an uninterrupted run."""
    out = str(tmp_path / "resume")
    calls = {"n": 0}

    def failing_pipeline(df):
        calls["n"] += 1
        if calls["n"] == 4:  # fourth cell processed -> simulated crash
            raise RuntimeError("simulated executor loss")
        return _pipeline(df)

    with pytest.raises(RuntimeError, match="simulated"):
        run_resumable_backfill(spark, source, failing_pipeline, out, N_BUCKETS)
    done_after_crash = [e["cell"] for e in BackfillManifest(out).entries()]
    assert done_after_crash == [0, 1, 2]

    calls2 = {"n": 0}

    def counting_pipeline(df):
        calls2["n"] += 1
        return _pipeline(df)

    summary = run_resumable_backfill(spark, source, counting_pipeline, out, N_BUCKETS)
    assert summary["cells_skipped"] == 3
    assert summary["cells_run"] == 3
    assert calls2["n"] == 3  # completed cells were NOT recomputed

    # result identical to an uninterrupted run
    ref = str(tmp_path / "ref")
    run_resumable_backfill(spark, source, _pipeline, ref, N_BUCKETS)
    for b in range(N_BUCKETS):
        a = spark.read.parquet(f"{out}/bucket={b}")
        r = spark.read.parquet(f"{ref}/bucket={b}")
        assert content_checksum(a) == content_checksum(r)


def test_manifest_torn_write_recomputed(spark, source, tmp_path):
    out = str(tmp_path / "torn")
    run_resumable_backfill(spark, source, _pipeline, out, N_BUCKETS)
    # corrupt one manifest entry -> that cell must be recomputed
    path = os.path.join(out, "_manifest", "cell_00002.json")
    with open(path, "w") as f:
        f.write('{"cell": 2, "status"')  # torn JSON
    summary = run_resumable_backfill(spark, source, _pipeline, out, N_BUCKETS)
    assert summary["cells_run"] == 1 and summary["cells_skipped"] == N_BUCKETS - 1
    with open(path) as f:
        assert json.load(f)["status"] == "done"
