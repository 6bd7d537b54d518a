"""spark-submit entry point (north_rule: "run via spark-submit --py-files").

Package and run:

    cd /root/repo && zip -r /tmp/fastselect_spark.zip fastselect_spark
    spark-submit --py-files /tmp/fastselect_spark.zip \
        fastselect_spark/main.py \
        --input /root/testdata/sf0.01 --output /tmp/fs_out \
        --n-buckets 16 --gap-seconds 300 --select 3

Runs the full resumable pipeline: transcripts -> featurize -> as-of join ->
feature matrix (checkpointed per conv_id bucket) -> chi2 + MI/mRMR scoring;
writes the feature matrix partitioned by bucket, the manifest under
``_manifest/``, and the selection report as JSON.
"""

from __future__ import annotations

import argparse
import json
import os


def build_matrix(feat_df):
    from pyspark.sql import functions as F

    from fastselect_spark.featurize import asof_join

    sess = feat_df.groupBy("conv_id", "session_id").agg(
        F.max("ts").alias("ts"), F.avg("n_tokens").alias("sess_avg_tokens")
    )
    mat = asof_join(
        feat_df, sess.select("conv_id", "ts", "sess_avg_tokens"), strategy="window"
    )
    return mat.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.least(F.col("session_id"), F.lit(7)).cast("int").alias("c_session"),
        F.least(F.col("role_run_len"), F.lit(5)).cast("int").alias("c_runlen"),
        F.least(F.floor(F.col("turn_gap_s") / 60.0), F.lit(10)).cast("int").alias("c_gap"),
        F.least(F.floor(F.col("sess_avg_tokens_asof")), F.lit(10)).cast("int").alias("c_stok"),
        F.least(F.col("n_tokens"), F.lit(60)).cast("int").alias("c_ntok"),
        F.col("label").cast("int").alias("label"),
    )


def main() -> None:
    parser = argparse.ArgumentParser(description="fastselect_spark pipeline")
    parser.add_argument("--input", required=True, help="sf dir with events.parquet, or a transcripts parquet path")
    parser.add_argument("--output", required=True)
    parser.add_argument("--n-buckets", type=int, default=16)
    parser.add_argument("--gap-seconds", type=float, default=300.0)
    parser.add_argument("--select", type=int, default=3)
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from fastselect_spark.data.transcripts import transcripts_from_events
    from fastselect_spark.featurize import featurize_transcripts
    from fastselect_spark.runtime.checkpoint import run_resumable_backfill
    from fastselect_spark.runtime.session import get_spark
    from fastselect_spark.selection import scores_from_cube
    from fastselect_spark.selection.mrmr import mrmr_greedy
    from fastselect_spark.sources import read_transcripts_table

    spark = get_spark(app_name="fastselect-pipeline", master=args.master)

    def source(s):
        if os.path.isdir(args.input) and os.path.exists(
            os.path.join(args.input, "events.parquet")
        ):
            return transcripts_from_events(s, args.input)
        # Iceberg identifier, Iceberg path, or parquet path — the source
        # layer resolves whichever the environment supports
        return read_transcripts_table(s, args.input)

    summary = run_resumable_backfill(
        spark,
        source=source,
        pipeline=lambda df: build_matrix(
            featurize_transcripts(df, gap_seconds=args.gap_seconds)
        ),
        output_dir=args.output,
        n_buckets=args.n_buckets,
        lineage={"input": args.input},
    )

    matrix = spark.read.parquet(
        *[os.path.join(args.output, f"bucket={b}") for b in range(args.n_buckets)]
    )
    fcols = ["c_session", "c_runlen", "c_gap", "c_stok", "c_ntok"]
    # chi2 + MI/mRMR all derive from ONE contingency-cube pass over the
    # written matrix (selection/pipeline.py)
    scores = scores_from_cube(matrix, fcols, "label")
    picked = mrmr_greedy(
        scores["relevance"], scores["redundancy"], min(args.select, len(fcols)), "MID"
    )
    report = {
        "backfill": summary,
        "chi2": {c: float(s) for c, s in zip(fcols, scores["chi2"])},
        "p_values": {c: float(v) for c, v in zip(fcols, scores["p_values"])},
        "mi_relevance_bits": {c: float(r) for c, r in zip(fcols, scores["relevance"])},
        "mrmr_selected": [fcols[i] for i in picked],
    }
    with open(os.path.join(args.output, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
