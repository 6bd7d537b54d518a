"""Checkpointed, resumable backfill with per-partition lineage + metrics
(north_rule: "checkpoints per-partition progress with lineage + metrics for
resumable backfill").

The unit of progress is a CELL = one conv_id hash bucket (optionally
sub-sliced by time range upstream). Each cell is processed independently:
filter -> pipeline -> write ``bucket=<b>`` parquet partition -> record a
manifest entry ATOMICALLY (temp file + rename). On restart, cells with a
committed manifest entry are skipped, so a killed backfill resumes where it
stopped and reruns are idempotent.

Spark's own checkpointing is not granular enough for this (SURVEY.md §4.2);
the manifest is engine bookkeeping:

    <output_dir>/_manifest/cell_00007.json
    {"cell": 7, "status": "done", "n_rows": 12345,
     "checksum": 123456789,          # order-independent xxhash64 sum
     "attempt": 1, "lineage": {"input": ..., "n_buckets": ..., "app_id": ...},
     "metrics": {"wall_sec": 1.2, "rows_per_sec": 10287.5}}

Determinism contract: the checksum is a sum of per-row xxhash64 over all
output columns — independent of row order and partitioning — so two runs
over the same input must produce identical checksums (tested, Tier 4).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_of(col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets))


def content_checksum(df: DataFrame) -> int:
    """Order-independent content checksum: sum of per-row xxhash64 over all
    columns (null-safe via casts to string)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in df.columns]
    # sum in decimal(38,0) — ANSI-safe against int64 overflow — then reduce
    row = df.agg(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("cs")
    ).collect()[0]
    return int(row["cs"] or 0) % (1 << 61)


class BackfillManifest:
    def __init__(self, output_dir: str) -> None:
        self.dir = os.path.join(output_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, cell: int) -> str:
        return os.path.join(self.dir, f"cell_{cell:05d}.json")

    def is_done(self, cell: int) -> bool:
        p = self._path(cell)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                return json.load(f).get("status") == "done"
        except (json.JSONDecodeError, OSError):
            return False  # torn write -> treat as not done, recompute

    def commit(self, cell: int, entry: dict) -> None:
        tmp = self._path(cell) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"cell": cell, "status": "done", **entry}, f)
        os.replace(tmp, self._path(cell))  # atomic on POSIX

    def entries(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out


def run_resumable_backfill(
    spark: SparkSession,
    source: Callable[[SparkSession], DataFrame],
    pipeline: Callable[[DataFrame], DataFrame],
    output_dir: str,
    n_buckets: int = 16,
    key_col: str = "conv_id",
    lineage: dict | None = None,
) -> dict:
    """Run ``pipeline`` over each conv_id-hash bucket of ``source``,
    checkpointing per-cell progress. Returns a summary dict.

    Completed cells (committed manifest entries) are skipped on re-run.
    """
    manifest = BackfillManifest(output_dir)
    summary = {"cells_total": n_buckets, "cells_skipped": 0, "cells_run": 0, "rows": 0}
    df = source(spark)
    for cell in range(n_buckets):
        if manifest.is_done(cell):
            summary["cells_skipped"] += 1
            continue
        t0 = time.perf_counter()
        part = df.where(bucket_of(key_col, n_buckets) == cell)
        result = pipeline(part)
        cell_dir = os.path.join(output_dir, f"bucket={cell}")
        result.write.mode("overwrite").parquet(cell_dir)
        written = spark.read.parquet(cell_dir)
        n_rows = written.count()
        checksum = content_checksum(written)
        wall = time.perf_counter() - t0
        manifest.commit(
            cell,
            {
                "n_rows": n_rows,
                "checksum": checksum,
                "attempt": 1,
                "lineage": {
                    "n_buckets": n_buckets,
                    "key_col": key_col,
                    "app_id": spark.sparkContext.applicationId,
                    **(lineage or {}),
                },
                "metrics": {
                    "wall_sec": round(wall, 3),
                    "rows_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
                },
            },
        )
        summary["cells_run"] += 1
        summary["rows"] += n_rows
    return summary
