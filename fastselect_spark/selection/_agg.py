"""Distributed NumPy-accumulator reduction (the engine's ``treeAggregate``).

The north_star mandates contingency tables / sufficient statistics be built
as partition-parallel reductions over NumPy accumulators, never per-row
Python (BASELINE.json:6). Shape:

  stage 1 (map):    ``mapInPandas`` — each task streams its Arrow batches
                    through a vectorized ``partial_fn`` and emits ONE row per
                    named accumulator (int64/float64 ndarray, serialized).
  stage 2 (combine): partials are grouped by ``partition_id % fanin`` and
                    summed with ``applyInPandas`` — the tree level that keeps
                    driver ingress bounded at 1000-executor scale.
  stage 3 (reduce): the <= fanin rows per name are summed on the driver.

Accumulators are integer counts or float64 partial sums, so the merged
result is independent of partitioning (exact for ints; reordered float
addition only at the final tiny merge).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from contextlib import contextmanager

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL_SCHEMA = "merge_key int, name string, dtype string, shape string, data binary"


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a frame (py4j hands back an int — the
    round-3 lesson); failures map to a huge number so small-input gates
    fail safe to the distributed path."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover — estimation must never break an op
        return 1 << 62


_STATS_UNKNOWN = 1 << 62  # LogicalRDD / parallelized driver rows report Long.Max


def small_frame(df: DataFrame, max_bytes: int, probe_rows: int = 200_000) -> bool:
    """True when ``df`` is provably small enough for a driver fast path.

    Uses the free Catalyst size estimate when available; frames built from
    driver rows (LogicalRDD) report Long.Max, so those get ONE bounded
    limit+count probe — cheap (partition-local short-circuit) and only
    paid where the estimate is unknown. probe_rows assumes narrow rows;
    callers with wide payloads should gate on bytes only."""
    est = plan_size_bytes(df)
    if est <= max_bytes:
        return True
    if est >= _STATS_UNKNOWN:
        return df.limit(probe_rows + 1).count() <= probe_rows
    return False


def _pack(name: str, arr: np.ndarray, merge_key: int) -> dict:
    arr = np.ascontiguousarray(arr)
    return {
        "merge_key": merge_key,
        "name": name,
        "dtype": str(arr.dtype),
        "shape": ",".join(str(s) for s in arr.shape),
        "data": arr.tobytes(),
    }


def _unpack(row) -> np.ndarray:
    shape = tuple(int(s) for s in row["shape"].split(",") if s)
    return np.frombuffer(row["data"], dtype=row["dtype"]).reshape(shape).copy()


@contextmanager
def bounded_arrow_batches(df: DataFrame, features_col: str, target_bytes: int = 8 << 20):
    """Cap Arrow IPC batch size to ~``target_bytes`` for the duration of a
    wide-matrix job (rows-per-batch = target / (8·p)).

    Root cause this fixes (measured, BENCH/SCORERS.md round-5 note): at
    p=200k the default 65536-record cap yields ~100 MB Arrow batches —
    G1 humongous allocations whose fragmentation accumulates across reps
    in a long-lived JVM until a full GC, degrading the same job 3-6x
    within one session (System.gc() restored 48.8 s → 8.8 s). 8 MB
    batches stay under the humongous threshold at 32 g heaps: measured
    in-session spread drops to ≤1.5x with no steady-state cost."""
    spark = df.sparkSession
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    row = df.select(F.size(F.col(features_col)).alias("p")).first()
    p = int(row["p"]) if row is not None and row["p"] is not None else 0
    rows = max(1, min(65536, target_bytes // max(1, 8 * p)))
    spark.conf.set(key, str(rows))
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def list_matrix_view(batch, features_col: str, label_col: str | None):
    """Zero-copy ``(n_rows, p)`` float64 view over an Arrow batch's
    ``list<double>`` column, plus the label column as a NumPy array.

    This is the fix for the p=200k drift/perf defect (round-4 verdict
    item 3): the mapInPandas path materializes every row as its own small
    ndarray and ``np.stack`` then copies the whole ~100 MB batch — tens of
    32-worker mmap/munmap churn cycles per pass whose allocator state made
    rep times swing 3x within one session. Reading the list column's flat
    values buffer in place allocates NOTHING per batch; callers chunk
    their column math to ~1 MB temporaries (CLAUDE.md kernel rule).

    Requires null-free, equal-width lists (the matrix_table contract)."""
    import pyarrow as pa  # noqa: F401 (typing only; batch is pa.RecordBatch)

    col = batch.column(batch.schema.get_field_index(features_col))
    nb = len(col)
    if col.null_count:
        raise ValueError(f"{features_col}: null feature arrays are invalid")
    y = None
    if label_col is not None:
        y = (
            batch.column(batch.schema.get_field_index(label_col))
            .to_numpy(zero_copy_only=False)
        )
    if nb == 0:
        return np.empty((0, 0), dtype=np.float64), y
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    try:
        values = col.values.to_numpy(zero_copy_only=True)
    except Exception:  # nulls inside lists: fall back to a copying read
        values = col.values.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    p = int(widths[0])
    if not (widths == p).all():
        raise ValueError(f"{features_col}: ragged feature arrays (widths differ)")
    X = values[offs[0] : offs[0] + nb * p].reshape(nb, p)
    return X, y


def tree_reduce_ndarrays_arrow(
    df: DataFrame,
    partial_fn,
    fanin: int = 16,
    direct_collect_threshold: int = 64,
) -> dict[str, np.ndarray]:
    """Arrow-batch variant of :func:`tree_reduce_ndarrays`: ``partial_fn``
    receives ``Iterator[pyarrow.RecordBatch]`` (use :func:`list_matrix_view`
    for wide array columns) and the map stage runs through ``mapInArrow``,
    skipping the Arrow→pandas object-column materialization entirely.
    Combine/collect stages are shared with the pandas path."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("merge_key", pa.int32()),
            ("name", pa.string()),
            ("dtype", pa.string()),
            ("shape", pa.string()),
            ("data", pa.binary()),
        ]
    )

    def mapper(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        acc = partial_fn(batches)
        rows = [_pack(name, arr, pid % fanin) for name, arr in acc.items()]
        yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    partials = df.mapInArrow(mapper, schema=_PARTIAL_SCHEMA)
    return _merge_partials(partials, df, fanin, direct_collect_threshold)


def tree_reduce_ndarrays(
    df: DataFrame,
    partial_fn: Callable[[Iterator[pd.DataFrame]], dict[str, np.ndarray]],
    fanin: int = 16,
    direct_collect_threshold: int = 64,
) -> dict[str, np.ndarray]:
    """Reduce ``partial_fn``'s per-partition accumulator dict by elementwise
    sum across all partitions of ``df``. Returns the merged dict.

    With few partitions (local mode / small jobs) the intermediate combine
    stage is pure overhead — partials are collected and summed on the driver
    directly. Above ``direct_collect_threshold`` partitions (real cluster),
    the tree combine level bounds driver ingress to ``fanin`` rows per name.
    """

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        acc = partial_fn(batches)
        rows = [_pack(name, arr, pid % fanin) for name, arr in acc.items()]
        yield pd.DataFrame(rows) if rows else pd.DataFrame(
            columns=["merge_key", "name", "dtype", "shape", "data"]
        )

    partials = df.mapInPandas(mapper, schema=_PARTIAL_SCHEMA)
    return _merge_partials(partials, df, fanin, direct_collect_threshold)


def _merge_partials(
    partials: DataFrame,
    df: DataFrame,
    fanin: int,
    direct_collect_threshold: int,
) -> dict[str, np.ndarray]:
    n_parts = df.rdd.getNumPartitions()
    if n_parts <= direct_collect_threshold:
        out: dict[str, np.ndarray] = {}
        for row in partials.collect():
            arr = _unpack(row)
            if row["name"] in out:
                out[row["name"]] += arr
            else:
                out[row["name"]] = arr
        return out

    def combiner(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pdf
        first = pdf.iloc[0]
        total = _unpack(first)
        for _, row in pdf.iloc[1:].iterrows():
            total += _unpack(row)
        return pd.DataFrame([_pack(first["name"], total, int(first["merge_key"]))])

    combined = partials.groupBy("merge_key", "name").applyInPandas(
        combiner, schema=_PARTIAL_SCHEMA
    )

    out: dict[str, np.ndarray] = {}
    for row in combined.collect():
        arr = np.frombuffer(row["data"], dtype=row["dtype"]).reshape(
            tuple(int(s) for s in row["shape"].split(",") if s)
        )
        if row["name"] in out:
            out[row["name"]] = out[row["name"]] + arr
        else:
            out[row["name"]] = arr.copy()
    return out
