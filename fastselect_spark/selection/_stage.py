"""Executor-side staged-matrix infrastructure for the all-pairs kernels.

The Relief family and MDR need every task to see the full (parity-scale)
sample matrix. Collecting it to the driver (``toPandas``) and broadcasting
works at parity scale but OOMs the driver long before the O(n²) kernel even
starts at 100× rows. Instead, the narrow numeric projection is STAGED:
written distributed (executors → scratch storage, never through the
driver), then read back by each Python worker directly from storage and
cached per worker process — the executor-side equivalent of a broadcast,
with the driver never holding a row.

The stage carries a ``monotonically_increasing_id`` ``__mid`` column;
loading sorts by it, so every reader sees the same deterministic row order
(for a sorted-limit input this is the sort order — partition ids of a range
partitioning are ordered — otherwise it is partition/row order, the same
order ``toPandas`` produces). All-pairs kernels do self-exclusion by mid
identity: ``searchsorted`` of a probe row's mid into the sorted mid vector
gives its global row index.

Scale note: in local mode the scratch dir is a tempdir on the shared local
filesystem. On a real cluster set ``FS_SCRATCH_DIR`` to a shared filesystem
path (NFS/Lustre/fuse-mounted object store) readable by executors; the
parquet stage itself is written with normal Spark I/O.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MID = "__mid"
LABEL = "__label"

# per-python-worker cache: one stage at a time (a Relief/MDR fit makes many
# tasks hit the same stage; keeping only the newest bounds worker memory)
_CACHE: dict[str, tuple] = {}


def stage_matrix(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    extra_cols: tuple[str, ...] = (),
) -> str:
    """Write ``(mid, features..., label[, extras])`` as parquet, distributed.

    Returns the stage path (registered for removal at interpreter exit)."""
    base = os.environ.get("FS_SCRATCH_DIR") or tempfile.gettempdir()
    path = tempfile.mkdtemp(prefix="fs_stage_", dir=base)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    cols = [F.monotonically_increasing_id().alias(MID)]
    cols += [F.col(c).cast("double").alias(c) for c in feature_cols]
    cols += [F.col(label_col).cast("double").alias(LABEL)]
    cols += [F.col(c) for c in extra_cols]
    df.select(*cols).write.mode("overwrite").parquet(path)
    return path


def load_staged(path: str, feature_cols: list[str]):
    """Load a stage (executor- or driver-side), sorted by mid; cached per
    process. Returns (mid[n], X[n,p] float64, y[n] float64, extras dict)."""
    if path not in _CACHE:
        pdf = pq.read_table(path).to_pandas()
        pdf = pdf.sort_values(MID, kind="mergesort").reset_index(drop=True)
        X = pdf[list(feature_cols)].to_numpy(dtype=np.float64)
        y = pdf[LABEL].to_numpy(dtype=np.float64)
        mid = pdf[MID].to_numpy(dtype=np.int64)
        skip = set(feature_cols) | {MID, LABEL}
        extras = {c: pdf[c].to_numpy() for c in pdf.columns if c not in skip}
        _CACHE.clear()
        _CACHE[path] = (mid, X, y, extras)
    return _CACHE[path]
