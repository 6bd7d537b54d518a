"""Distributed PCA over an ``array<float>`` embedding column — the
dimensionality-reduction step of an embedding pipeline (whitening before
clustering/ANN, compacting stored vectors).

Training is one tree-reduced pass accumulating the sufficient statistics
(count, per-dim sum, X^T X — all (d, d)-sized, independent of row count);
the driver closes the covariance (unbiased, n-1) and eigendecomposes it.
Components are DETERMINISTIC: eigenvectors sorted by descending
eigenvalue, each sign-fixed so its largest-|coordinate| entry is
positive (ties to the lowest index) — reproducible on any cluster layout
to float64 sum-order noise (~1e-15), which projections inherit at ~1e-12.

Projection is a broadcast + Arrow matmul per batch (no shuffle). The
independent single-process replica (:func:`train_pca_numpy`) reads the
parquet directly and is the source of the literal components the DuckDB
gate projects with — the same contract pattern as the IVF centroid
oracle (similarity/ivf.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.selection._agg import tree_reduce_ndarrays


def _finalize_components(
    cnt: int, s: np.ndarray, xtx: np.ndarray, n_components: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    mean = s / cnt
    cov = (xtx - cnt * np.outer(mean, mean)) / max(cnt - 1, 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals, kind="stable")[::-1][:n_components]
    comps = vecs[:, order].T  # (k, d)
    evr = vals[order] / max(vals.sum(), 1e-300)
    # deterministic sign: largest-|coordinate| entry positive, lowest index
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evr


def train_pca(
    corpus: DataFrame,
    n_components: int = 8,
    emb_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean (d,), components (k, d), explained_variance_ratio (k,)) from
    one tree-reduced sufficient-statistics pass."""

    def partial(batches: Iterator[pd.DataFrame]) -> dict[str, np.ndarray]:
        cnt, s, xtx = 0, None, None
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            cnt += len(M)
            if s is None:
                s = M.sum(axis=0)
                xtx = M.T @ M
            else:
                s += M.sum(axis=0)
                xtx += M.T @ M
        if s is None:
            return {}
        return {"cnt": np.array([cnt], dtype=np.int64), "s": s, "xtx": xtx}

    merged = tree_reduce_ndarrays(corpus.select(emb_col), partial)
    if "cnt" not in merged:
        raise ValueError("train_pca: input DataFrame is empty")
    return _finalize_components(
        int(merged["cnt"][0]), merged["s"], merged["xtx"], n_components
    )


def train_pca_numpy(
    parquet_path: str, n_components: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-process replica reading the embeddings parquet directly —
    the independent oracle for the deterministic training contract."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=["embedding"])
    M = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    return _finalize_components(
        len(M), M.sum(axis=0), M.T @ M, n_components
    )


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    emb_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Adds ``out_col`` = components @ (emb - mean) — broadcast + one
    Arrow matmul per batch, no shuffle."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((mean, components))
    cols = df.columns

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mu, C = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            P = (M - mu) @ C.T  # (batch, k)
            out = pdf.copy()
            out[out_col] = list(P)
            yield out

    schema_str = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.select(*cols).mapInPandas(
        project, schema=f"{schema_str}, `{out_col}` array<double>"
    )
