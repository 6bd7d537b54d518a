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


def run_corpus_prep(spark, args) -> dict:
    """--pipeline corpus: the LLM-training-data prep chain over a
    documents table — Unicode NFC clean → PII scrub → C4-style global
    span dedup → exact dedup → MinHash-LSH near-dup clustering (lowest
    doc_id per cluster kept) → quality filter; writes the kept documents
    plus a per-stage report with the post-filter source mixture. Every
    stage is the same individually-oracled operator the driver contract
    checks."""
    import os as _os

    from pyspark.sql import functions as F

    from fastselect_spark.corpus import quality_filter, source_mixture_report
    from fastselect_spark.dedup import (
        connected_components,
        dedup_exact,
        minhash_near_duplicates,
        remove_duplicate_spans,
    )
    from fastselect_spark.text import clean_text, redact_pii

    src = args.input
    if _os.path.isdir(src) and _os.path.exists(
        _os.path.join(src, "documents.parquet")
    ):
        src = _os.path.join(src, "documents.parquet")
    docs = spark.read.parquet(src)
    counts = {"input": docs.count()}

    cleaned = clean_text(docs, "text").drop("text").withColumnRenamed(
        "text_clean", "text"
    )
    red = redact_pii(cleaned).select(
        "doc_id",
        F.col("text_redacted").alias("text"),
        "n_pii",
        *[c for c in ("lang", "source") if c in cleaned.columns],
    )
    sd = remove_duplicate_spans(red, span_tokens=8).withColumnRenamed(
        "text_dedup", "text_final"
    )
    exact = dedup_exact(sd, text_col="text_final", id_col="doc_id")
    counts["after_exact_dedup"] = exact.count()

    base = exact.select("doc_id", F.col("text_final").alias("text")).persist()
    pairs = minhash_near_duplicates(base, threshold=0.5)
    comp = connected_components(pairs)
    dropped = comp.where(F.col("doc_id") != F.col("comp")).select("doc_id")
    near = base.join(dropped, "doc_id", "left_anti")
    counts["after_near_dedup"] = near.count()

    qf = quality_filter(near)
    counts["after_quality_filter"] = qf.count()
    base.unpersist()

    kept = qf.join(
        red.select(
            "doc_id",
            *[c for c in ("lang", "source", "n_pii") if c in red.columns],
        ),
        "doc_id",
    )
    kept.write.mode("overwrite").parquet(_os.path.join(args.output, "kept"))
    mixture = (
        [r.asDict() for r in source_mixture_report(kept).collect()]
        if "source" in kept.columns
        else []
    )
    return {"stage_counts": counts, "source_mixture": mixture}


def main() -> None:
    parser = argparse.ArgumentParser(description="fastselect_spark pipeline")
    parser.add_argument("--input", required=True, help="sf dir with events.parquet, or a transcripts parquet path")
    parser.add_argument("--output", required=True)
    parser.add_argument("--n-buckets", type=int, default=16)
    parser.add_argument("--gap-seconds", type=float, default=300.0)
    parser.add_argument("--select", type=int, default=3)
    parser.add_argument("--master", default=None)
    parser.add_argument(
        "--pipeline",
        choices=["featurize", "corpus"],
        default="featurize",
        help="featurize = transcripts feature pipeline (default); "
        "corpus = LLM-training-data corpus prep over documents",
    )
    args = parser.parse_args()

    from fastselect_spark.data.transcripts import transcripts_from_events
    from fastselect_spark.featurize import featurize_transcripts
    from fastselect_spark.runtime.checkpoint import run_resumable_backfill
    from fastselect_spark.runtime.session import get_spark
    from fastselect_spark.selection import scores_from_cube
    from fastselect_spark.selection.mrmr import mrmr_greedy
    from fastselect_spark.sources import read_transcripts_table

    spark = get_spark(app_name="fastselect-pipeline", master=args.master)

    if args.pipeline == "corpus":
        os.makedirs(args.output, exist_ok=True)
        report = run_corpus_prep(spark, args)
        with open(os.path.join(args.output, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report))
        spark.stop()
        return

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
