"""Structured Streaming tests: session windows and windowed rates driven
with availableNow triggers over staged parquet chunks; streamed session
aggregates must agree with the batch sessionizer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastselect_spark.data.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts_pandas,
)
from fastselect_spark.featurize import featurize_transcripts
from fastselect_spark.streaming import (
    read_transcripts_stream,
    streaming_session_stats,
    streaming_token_rates,
)


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """Transcripts written as two parquet chunks (simulated arrivals)."""
    root = tmp_path_factory.mktemp("stream_src")
    pdf = generate_transcripts_pandas(n_convs=30, seed=42)
    half = len(pdf) // 2
    df1 = spark.createDataFrame(pdf.iloc[:half], schema=TRANSCRIPT_SCHEMA)
    df2 = spark.createDataFrame(pdf.iloc[half:], schema=TRANSCRIPT_SCHEMA)
    df1.write.mode("append").parquet(str(root / "in"))
    df2.write.mode("append").parquet(str(root / "in"))
    return str(root / "in"), str(root), pdf


def _run_stream(spark, out_df, root, name):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", f"{root}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).toPandas()


def test_streaming_sessions_match_batch(spark, staged):
    path, root, pdf = staged
    stream = read_transcripts_stream(spark, path)
    got = _run_stream(
        spark, streaming_session_stats(stream, gap_seconds=300), root, "sess_stats"
    )
    # batch oracle: featurize sessionizer aggregated per (conv, session)
    batch = featurize_transcripts(
        spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    )
    expect = (
        batch.groupBy("conv_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .toPandas()
    )
    # same number of sessions per conversation and same turn totals
    g1 = got.groupby("conv_id")["n_turns"].agg(["count", "sum"]).sort_index()
    g2 = expect.groupby("conv_id")["n_turns"].agg(["count", "sum"]).sort_index()
    assert (g1["sum"] == g2["sum"]).all()  # every turn in exactly one session
    assert (g1["count"] == g2["count"]).all()  # same session segmentation
    assert (got["n_turns"] >= 1).all()
    tot1 = got.groupby("conv_id")["total_tokens"].sum().sort_index()
    tot2 = expect.groupby("conv_id")["total_tokens"].sum().sort_index()
    assert np.allclose(tot1.values, tot2.values)


def test_streaming_watermark_drops_late_data(spark, tmp_path_factory):
    """Late-data semantics: once a session is finalized (its end fell below
    the watermark and it was emitted), a later-arriving event for that
    period is DROPPED — the append-mode result stays correct and is never
    re-emitted. Three single-file micro-batches: batch 1's mover pushes the
    watermark past A's session, which is emitted with 1 turn; batch 2's
    10:01 event for A arrives below the watermark with A's state evicted
    and must be dropped (observable in numRowsDroppedByWatermark).
    Verified Spark nuance: a late-but-state-live row (same watermark
    relationship, state not yet evicted) still merges — the guarantee the
    watermark gives is bounded state + no post-emission mutation."""
    import time as _time
    from datetime import datetime

    def ts(h, m):
        return datetime(2024, 1, 1, h, m, 0)

    root = tmp_path_factory.mktemp("late")
    src = str(root / "in")
    file_batches = [
        [
            ("A", 0, "user", "hello world", None, ts(10, 0)),
            ("B", 0, "user", "watermark mover", None, ts(11, 0)),
        ],
        [("C", 0, "user", "mover two", None, ts(11, 30))],
        [
            ("A", 1, "user", "too late", None, ts(10, 1)),
            ("D", 0, "user", "tail event", None, ts(12, 0)),
        ],
    ]
    for rows in file_batches:
        spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.2)  # distinct mod-times => deterministic batch order

    stream = read_transcripts_stream(spark, src, max_files_per_trigger=1)
    out = streaming_session_stats(stream, gap_seconds=300, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("late_sess")
        .outputMode("append")
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("late_sess").toPandas()
    # A emitted exactly once, with only the on-time turn — the late 10:01
    # arrival was dropped, not appended as a duplicate session
    a = got[got.conv_id == "A"]
    assert len(a) == 1 and int(a["n_turns"].iloc[0]) == 1
    dropped = sum(
        int((p["stateOperators"][0] or {}).get("numRowsDroppedByWatermark", 0))
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1
    # D's session is still open (above watermark) => not emitted
    assert "D" not in set(got["conv_id"])


def test_streaming_token_rates(spark, staged):
    path, root, pdf = staged
    stream = read_transcripts_stream(spark, path)
    got = _run_stream(
        spark, streaming_token_rates(stream, window="1 hour"), root, "tok_rates"
    )
    assert set(got["role"].unique()) <= {"user", "assistant", "tool"}
    # totals conserved
    assert got["n_turns"].sum() == len(pdf)
    expect_tokens = pdf["text"].str.split().str.len().sum()
    assert got["total_tokens"].sum() == expect_tokens
    # windows are aligned hour buckets
    assert (got["window_start"].dt.minute == 0).all()


def test_streaming_dedup_matches_batch_distinct(spark, staged):
    """The emitted fingerprint set equals batch SELECT DISTINCT over the
    same normalization; duplicate content arriving in later micro-batches
    is suppressed by state."""
    import hashlib
    import re

    from fastselect_spark.streaming import streaming_dedup

    path, root, pdf = staged
    stream = read_transcripts_stream(spark, path)
    q = (
        streaming_dedup(stream)
        .select("fp_exact")
        .writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .option("checkpointLocation", f"{root}/ckpt_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = set(spark.table("stream_dedup").toPandas()["fp_exact"])

    def fp(t):
        norm = re.sub(r"\s+", " ", (t or "").strip()).lower()
        return hashlib.md5(norm.encode()).hexdigest()

    expect = {fp(t) for t in pdf["text"]}
    assert got == expect
    # each fingerprint emitted exactly once
    assert len(spark.table("stream_dedup").toPandas()) == len(expect)


def test_streaming_dedup_within_watermark_epochs(spark, tmp_path_factory):
    """Bounded-state dedup trade-off, both directions (empirically verified
    Spark semantics): duplicates arriving while state is live are dropped
    AND extend the expiry (last-dup ts + delay); eviction is lazy at the
    first batch whose ENTRY watermark exceeds the extended expiry; a
    re-arrival in a LATER batch is emitted again as a new epoch."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastselect_spark.streaming import streaming_dedup_within_watermark

    root = str(tmp_path_factory.mktemp("wm_dedup"))
    batches = [
        [("2024-01-01 10:00:00", "alpha"), ("2024-01-01 10:00:30", "beta")],
        [("2024-01-01 10:05:00", "alpha"), ("2024-01-01 10:30:00", "gamma")],
        [("2024-01-01 10:45:00", "delta")],
        [
            ("2024-01-01 11:00:00", "alpha"),
            ("2024-01-01 11:01:00", "beta"),
            ("2024-01-01 10:39:00", "gamma"),
        ],
    ]
    for i, rows in enumerate(batches):
        tbl = pa.table(
            {
                "ts": pa.array(
                    [pd.Timestamp(t) for t, _ in rows], type=pa.timestamp("us")
                ),
                "text": pa.array([x for _, x in rows]),
            }
        )
        f = os.path.join(root, f"b{i}.parquet")
        pq.write_table(tbl, f)
        os.utime(f, (1_700_000_000 + 10 * i,) * 2)

    stream = (
        spark.readStream.schema("ts TIMESTAMP, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    q = (
        streaming_dedup_within_watermark(
            stream, text_col="text", ts_col="ts", watermark="10 minutes"
        )
        .select("text", "ts")
        .writeStream.format("memory")
        .queryName("wm_dedup_epochs")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("wm_dedup_epochs").toPandas()
    counts = out.groupby("text").size().to_dict()
    # alpha/beta re-emitted after their state was evicted; the in-window
    # duplicates (alpha@10:05, gamma@10:39) were dropped
    assert counts == {"alpha": 2, "beta": 2, "gamma": 1, "delta": 1}


def test_streaming_minhash_candidates_match_batch(spark, tmp_path):
    """Streaming LSH bucket-state candidates over two micro-batches ==
    the batch bucket self-join on the union (state TTL > run length), and
    the verified pairs equal batch minhash_near_duplicates."""
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from fastselect_spark.dedup import minhash_near_duplicates
    from fastselect_spark.dedup.minhash import (
        _band_table,
        add_minhash_signature,
        verify_candidate_pairs,
    )
    from fastselect_spark.streaming import streaming_minhash_candidates

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .withColumn(
            "ts",
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0), F.col("doc_id").cast("double")
            ),
        )
    )
    src = str(tmp_path / "docs_stream")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.2)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cands = streaming_minhash_candidates(
        stream, watermark="10 minutes", state_ttl_minutes=10**6
    )
    q = (
        cands.writeStream.format("memory")
        .queryName("mh_cands")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got_pairs = (
        spark.table("mh_cands").dropDuplicates(["id_a", "id_b"]).persist()
    )

    # oracle 1: batch banded candidate set on the union
    sig = add_minhash_signature(docs)
    banded = _band_table(sig, "doc_id", 16, 4).persist()
    a = banded.select(F.col("doc_id").alias("id_a"), "band", "band_hash")
    b = banded.select(F.col("doc_id").alias("id_b"), "band", "band_hash")
    batch_cand = (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    got = {(r["id_a"], r["id_b"]) for r in got_pairs.collect()}
    expect = {(r["id_a"], r["id_b"]) for r in batch_cand.collect()}
    assert got == expect and len(got) > 0

    # oracle 2: verified pairs == the full batch operator
    verified = verify_candidate_pairs(docs, got_pairs, threshold=0.5)
    batch_full = minhash_near_duplicates(docs, threshold=0.5)
    vg = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in verified.collect()}
    vb = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in batch_full.collect()}
    assert vg == vb
    got_pairs.unpersist()
    banded.unpersist()


def test_streaming_minhash_ttl_eviction_and_bucket_cap(spark, tmp_path):
    """Bounded-state contract: (a) a bucket evicted by the event-time TTL
    does NOT pair docs across the eviction (the documented trade-off, as
    in dropDuplicatesWithinWatermark); (b) max_bucket_size caps membership
    — a hot bucket emits pairs against at most cap members."""
    import time as _time

    import pandas as pd

    from fastselect_spark.streaming import streaming_minhash_candidates

    # identical texts -> identical signatures -> same bucket in every band
    def wave(ids, ts):
        return pd.DataFrame(
            {
                "doc_id": ids,
                "text": "the same exact document text repeated verbatim here",
                "ts": pd.to_datetime([ts] * len(ids)),
            }
        )

    def spacer(ids, ts):
        return pd.DataFrame(
            {
                "doc_id": ids,
                "text": "completely different spacer content advancing the clock",
                "ts": pd.to_datetime([ts] * len(ids)),
            }
        )

    src = str(tmp_path / "mh_ttl")
    # Eviction is LAZY and timers fire only for keys WITHOUT data in a
    # batch (the dropDuplicatesWithinWatermark lesson): the fixture needs
    # spacer batches that advance the watermark past the bucket's expiry
    # and give its timer a data-free batch to fire in, BEFORE the bucket
    # sees data again.
    batches = [
        wave([1, 2], "2026-01-01 00:00:00"),   # (1,2) emits; expiry 00:10
        spacer([100], "2026-01-01 03:00:00"),  # watermark -> 02:59
        spacer([101], "2026-01-01 03:01:00"),  # bucket timer fires, state dropped
        wave([3], "2026-01-01 03:05:00"),      # fresh bucket: no (1,3)/(2,3)
        wave([4], "2026-01-01 03:06:00"),      # (3,4) emits
    ]
    for b in batches:
        spark.createDataFrame(
            b, "doc_id long, text string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.2)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cands = streaming_minhash_candidates(
        stream, watermark="1 minute", state_ttl_minutes=10
    )
    q = (
        cands.writeStream.format("memory")
        .queryName("mh_ttl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in spark.table("mh_ttl").dropDuplicates(["id_a", "id_b"]).collect()
    }
    assert (1, 2) in pairs
    assert (3, 4) in pairs
    # eviction: docs arriving after the TTL fired must NOT pair with the
    # evicted members
    assert not {(1, 3), (2, 3), (1, 4), (2, 4)} & pairs

    # bucket cap: 6 identical docs, cap 2 -> only pairs among first 2
    # members plus each later arrival vs those 2 (cap stops accumulation)
    src2 = str(tmp_path / "mh_cap")
    spark.createDataFrame(
        wave([10, 11, 12, 13, 14, 15], "2026-01-01 00:00:00"),
        "doc_id long, text string, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(src2)
    stream2 = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(src2)
    )
    cands2 = streaming_minhash_candidates(
        stream2, watermark="1 minute", state_ttl_minutes=10, max_bucket_size=2
    )
    q2 = (
        cands2.writeStream.format("memory")
        .queryName("mh_cap")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cap"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    pairs2 = {
        (r["id_a"], r["id_b"])
        for r in spark.table("mh_cap").dropDuplicates(["id_a", "id_b"]).collect()
    }
    # members = {10, 11}; every doc 12..15 pairs against both, no more
    expect = {(10, 11)} | {(10, d) for d in (12, 13, 14, 15)} | {
        (11, d) for d in (12, 13, 14, 15)
    }
    assert pairs2 == expect


# ----------------------------------------------- cluster consolidation
def test_cluster_consolidator_incremental_equals_batch(spark, tmp_path):
    from fastselect_spark.dedup import connected_components
    from fastselect_spark.streaming import ClusterConsolidator

    all_pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (3, 20)]
    e0 = spark.createDataFrame(all_pairs[:2], "id_a long, id_b long")
    e1 = spark.createDataFrame(all_pairs[2:], "id_a long, id_b long")
    pairs_dir = str(tmp_path / "pairs")
    e0.coalesce(1).write.parquet(pairs_dir + "/e0")
    cons = ClusterConsolidator(str(tmp_path / "state"))
    first = cons.consolidate(spark, pairs_dir)
    assert {(r["doc_id"], r["comp"]) for r in first.collect()} == {
        (1, 1), (2, 1), (3, 1)
    }
    e1.coalesce(1).write.parquet(pairs_dir + "/e1")
    final = cons.consolidate(spark, pairs_dir)
    batch = connected_components(
        spark.createDataFrame(all_pairs, "id_a long, id_b long")
    )
    assert {(r["doc_id"], r["comp"]) for r in final.collect()} == {
        (r["doc_id"], r["comp"]) for r in batch.collect()
    }
    # no new files: returns committed state unchanged
    again = cons.consolidate(spark, pairs_dir)
    assert again.count() == final.count()


def test_cluster_consolidator_resumes_after_uncommitted_snapshot(spark, tmp_path):
    import json
    import os

    from fastselect_spark.streaming import ClusterConsolidator

    pairs_dir = str(tmp_path / "pairs")
    spark.createDataFrame([(1, 2)], "id_a long, id_b long").coalesce(1).write.parquet(
        pairs_dir + "/e0"
    )
    state = str(tmp_path / "state")
    cons = ClusterConsolidator(state)
    cons.consolidate(spark, pairs_dir)
    # simulate a crash AFTER the v2 snapshot write but BEFORE the manifest
    # commit: roll the manifest back to v1 with e1 unfolded
    spark.createDataFrame([(2, 5)], "id_a long, id_b long").coalesce(1).write.parquet(
        pairs_dir + "/e1"
    )
    manifest = json.load(open(os.path.join(state, "_manifest.json")))
    cons.consolidate(spark, pairs_dir)
    json.dump(manifest, open(os.path.join(state, "_manifest.json"), "w"))
    # rerun refolds e1 idempotently and commits
    final = ClusterConsolidator(state).consolidate(spark, pairs_dir)
    assert {(r["doc_id"], r["comp"]) for r in final.collect()} == {
        (1, 1), (2, 1), (5, 1)
    }
