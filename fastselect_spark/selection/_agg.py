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

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame

_PARTIAL_SCHEMA = "merge_key int, name string, dtype string, shape string, data binary"


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
