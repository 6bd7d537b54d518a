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
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MID = "__mid"
LABEL = "__label"
PACKED = "__packed"

# Above this width, features are staged as ONE binary column (row-major
# float64 bytes) packed by a vectorized Arrow kernel: a p-column cast
# projection + parquet write costs ~9s at p=1000 (per-column writer setup
# and wide codegen), the packed layout ~1s. Narrow stages keep real columns
# so Spark aggregations (class stats, preflight min/max) stay available.
WIDE_P = 64

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
    if len(feature_cols) <= WIDE_P:
        cols = [F.monotonically_increasing_id().alias(MID)]
        cols += [F.col(c).cast("double").alias(c) for c in feature_cols]
        cols += [F.col(label_col).cast("double").alias(LABEL)]
        cols += [F.col(c) for c in extra_cols]
        df.select(*cols).write.mode("overwrite").parquet(path)
        return path

    # wide layout: bare column refs (no per-column cast exprs), then one
    # Arrow kernel packs the feature block per row
    sel = [F.monotonically_increasing_id().alias(MID)]
    sel += [F.col(c) for c in feature_cols]
    sel += [F.col(label_col).alias("__rawlabel")]
    sel += [F.col(c) for c in extra_cols]
    feats = list(feature_cols)
    extras = list(extra_cols)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            Xb = pdf[feats].to_numpy(dtype=np.float64)
            out = {
                MID: pdf[MID],
                PACKED: [row.tobytes() for row in Xb],
                LABEL: pdf["__rawlabel"].to_numpy(dtype=np.float64),
            }
            for c in extras:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    extra_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in extra_cols
    )
    df.select(*sel).mapInPandas(
        pack, schema=f"{MID} long, {PACKED} binary, {LABEL} double{extra_schema}"
    ).write.mode("overwrite").parquet(path)
    return path


def load_staged(path: str, feature_cols: list[str]):
    """Load a stage (executor- or driver-side), sorted by mid; cached per
    process. Returns (mid[n], X[n,p] float64, y[n] float64, extras dict)."""
    if path not in _CACHE:
        pdf = pq.read_table(path).to_pandas()
        pdf = pdf.sort_values(MID, kind="mergesort").reset_index(drop=True)
        if PACKED in pdf.columns:
            buf = b"".join(pdf[PACKED].tolist())
            X = np.frombuffer(buf, dtype=np.float64).reshape(
                len(pdf), len(feature_cols)
            )
        else:
            X = pdf[list(feature_cols)].to_numpy(dtype=np.float64)
        y = pdf[LABEL].to_numpy(dtype=np.float64)
        mid = pdf[MID].to_numpy(dtype=np.int64)
        skip = set(feature_cols) | {MID, LABEL, PACKED}
        extras = {c: pdf[c].to_numpy() for c in pdf.columns if c not in skip}
        _CACHE.clear()
        _CACHE[path] = (mid, X, y, extras)
    return _CACHE[path]
