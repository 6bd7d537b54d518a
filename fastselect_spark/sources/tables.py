"""Table sources/sinks.

The north_rule targets Iceberg transcripts tables; this environment ships no
Iceberg runtime jar, so the reader resolves in order (documented fallback,
SURVEY.md §2.3 "Scans / sources / sinks"):

1. ``catalog.db.table`` identifier -> ``spark.read.table`` (works against an
   Iceberg catalog when ``spark.sql.catalog.*`` is configured and the
   iceberg-spark-runtime jar is on the classpath);
2. a directory containing ``metadata/`` -> ``format("iceberg")`` path read;
3. plain parquet path (CI fallback).

The feature-matrix sink mirrors the same split: Iceberg table when a
catalog identifier is given, bucketed parquet otherwise. Partitioning is
always by the conv_id hash bucket so the as-of join and per-conversation
windows stay co-located (SURVEY.md §4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def read_transcripts_table(
    spark: SparkSession, source: str, schema=None
) -> DataFrame:
    """Read transcripts from an Iceberg identifier, an Iceberg path, or a
    file path — whichever the environment supports. File formats resolve by
    extension: ``.parquet`` (default), ``.orc``, ``.csv`` (header row,
    ``schema`` strongly recommended — inference costs an extra scan),
    ``.json`` / ``.jsonl`` (newline-delimited)."""
    low = source.lower()
    known_ext = (".parquet", ".orc", ".csv", ".json", ".jsonl")
    if (
        not os.path.exists(source)
        and "/" not in source
        and not low.endswith(known_ext)
    ):
        # catalog identifier (catalog.db.table / db.table) or view name
        return spark.read.table(source)
    if os.path.isdir(os.path.join(source, "metadata")) and _iceberg_available(spark):
        return spark.read.format("iceberg").load(source)
    if low.endswith(".csv"):
        reader = spark.read.option("header", "true")
        if schema is not None:
            return reader.schema(schema).csv(source)
        return reader.option("inferSchema", "true").csv(source)
    if low.endswith((".json", ".jsonl")):
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(source)
    if low.endswith(".orc"):
        return spark.read.orc(source)
    return spark.read.parquet(source)


def write_feature_table(
    df: DataFrame,
    target: str,
    n_buckets: int = 64,
    key_col: str = "conv_id",
    mode: str = "overwrite",
) -> None:
    """Write the feature matrix partitioned by conv_id hash bucket.

    Iceberg identifier -> ``writeTo(...).partitionedBy(bucket(...))``;
    filesystem path -> parquet with an explicit ``bucket`` partition column
    (the CI-portable equivalent of Iceberg's bucket transform).
    """
    spark = df.sparkSession
    if not os.path.isabs(target) and "." in target and _iceberg_available(spark):
        writer = df.writeTo(target).partitionedBy(F.bucket(n_buckets, key_col))
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    out = df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    )
    out.write.mode(mode).partitionBy("bucket").parquet(target)
