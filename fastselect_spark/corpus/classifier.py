"""Quality classifier: logistic regression over hashed n-gram features —
the fastText-style "quality model" of web-scale pipelines (GPT-3 / LLaMA
data curation: train a linear classifier target-vs-raw, keep high-scoring
docs).

Features: L1-normalized hashed word-k-gram counts (the same portable
60-bit-md5 bucket family as corpus/dsir.py — cross-engine reproducible)
plus a bias. Model: w ∈ R^(n_buckets+1), full-batch gradient descent with
zero init, fixed iterations and learning rate — DETERMINISTIC, so an
independent single-process NumPy replica retrains bit-near-identical
weights and the DuckDB gate scores documents from weight LITERALS (the
IVF centroid-literal pattern; float64 partition-sum reordering perturbs
weights at ~1e-13, far below the 1e-6 score rounding).

Scale shape (100 TB):
- Each training iteration is ONE tree-reduced ``mapInPandas`` pass
  (selection/_agg.py): partitions emit a (n_buckets+2,) partial
  [grad_sum | count]; driver ingress is ``fanin`` vectors per iteration.
  No shuffle keyed by data; train on a bounded deterministic sample
  (``train_sample``) when the pool is the full corpus.
- Per-batch gradients avoid ``np.add.at`` (10x slower than bincount,
  CLAUDE.md): all docs' bucket occurrences concatenate into ONE
  ``np.bincount(..., weights=coef_doc / L_doc)`` call.
- Scoring is one broadcast row-local scan — zero shuffles, narrow output.

The reference engine has no text classifiers; this extends the repo's
training-data family (SURVEY.md §2) with the published curation method.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from fastselect_spark.corpus.dsir import _doc_buckets
from fastselect_spark.selection._agg import tree_reduce_ndarrays


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically stable piecewise form
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _batch_dots_and_lens(
    texts, w: np.ndarray, k: int, n_buckets: int
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Per-doc (w·x + bias, n_grams, bucket array) against weights w
    (layout: w[:n_buckets] features, w[n_buckets] bias)."""
    dots = np.empty(len(texts))
    lens = np.empty(len(texts))
    bucket_lists: list[np.ndarray] = []
    for j, t in enumerate(texts):
        b = _doc_buckets(t, k, n_buckets)
        bucket_lists.append(b)
        lens[j] = len(b)
        dots[j] = w[b].sum() / len(b) + w[n_buckets]
    return dots, lens, bucket_lists


def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 4096,
    shingle_k: int = 2,
    iterations: int = 30,
    lr: float = 1.0,
) -> np.ndarray:
    """Trained weight vector of length ``n_buckets + 1`` (bias last).

    ``label_col`` must be 0/1. One tree-reduced gradient pass per
    iteration; gradient = mean over docs of (sigma(w·x) - y) · x with
    x = [counts / n_grams, 1]."""
    data = df.select(text_col, label_col)
    w = np.zeros(n_buckets + 1)
    for _ in range(iterations):
        W = w  # captured by value per iteration

        def partial(batches: Iterator[pd.DataFrame]) -> dict[str, np.ndarray]:
            g = np.zeros(n_buckets + 1)
            n = np.zeros(1, dtype=np.int64)
            for pdf in batches:
                if pdf.empty:
                    continue
                texts = pdf[text_col].tolist()
                y = pdf[label_col].to_numpy(dtype=np.float64)
                dots, lens, bucket_lists = _batch_dots_and_lens(
                    texts, W, shingle_k, n_buckets
                )
                coef = _sigmoid(dots) - y
                occ_w = np.concatenate(
                    [
                        np.full(len(b), c / L)
                        for b, c, L in zip(bucket_lists, coef, lens)
                    ]
                )
                occ_b = np.concatenate(bucket_lists)
                g[:n_buckets] += np.bincount(
                    occ_b, weights=occ_w, minlength=n_buckets
                )
                g[n_buckets] += coef.sum()
                n += len(texts)
            return {"g": g, "n": n}

        merged = tree_reduce_ndarrays(data, partial)
        w = w - lr * merged["g"] / max(int(merged["n"][0]), 1)
    return w


def train_quality_classifier_numpy(
    parquet_path: str,
    label_mod: int = 23,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    shingle_k: int = 2,
    iterations: int = 30,
    lr: float = 1.0,
) -> np.ndarray:
    """Single-process replica of :func:`train_quality_classifier` reading
    the parquet directly (no Spark) with the planted label rule
    ``id % label_mod == 0`` — the independent oracle trainer whose weights
    the DuckDB gate embeds as literals."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, text_col])
    ids = tbl[id_col].to_numpy()
    texts = tbl[text_col].to_pylist()
    y = (ids % label_mod == 0).astype(np.float64)
    w = np.zeros(n_buckets + 1)
    for _ in range(iterations):
        dots, lens, bucket_lists = _batch_dots_and_lens(
            texts, w, shingle_k, n_buckets
        )
        coef = _sigmoid(dots) - y
        occ_w = np.concatenate(
            [np.full(len(b), c / L) for b, c, L in zip(bucket_lists, coef, lens)]
        )
        occ_b = np.concatenate(bucket_lists)
        g = np.zeros(n_buckets + 1)
        g[:n_buckets] = np.bincount(occ_b, weights=occ_w, minlength=n_buckets)
        g[n_buckets] = coef.sum()
        w = w - lr * g / len(texts)
    return w


def quality_scores(
    df: DataFrame,
    weights: np.ndarray,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
) -> DataFrame:
    """Per-doc classifier probability ``(id_col, clf_score)`` — one
    broadcast row-local scan, unrounded float64 (round engine-side in
    contract queries)."""
    n_buckets = len(weights) - 1
    bc = df.sparkSession.sparkContext.broadcast(np.asarray(weights, dtype=np.float64))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            dots, _, _ = _batch_dots_and_lens(
                pdf[text_col].tolist(), w, shingle_k, n_buckets
            )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "clf_score": _sigmoid(dots)}
            )

    return df.select(id_col, text_col).mapInPandas(
        score, schema=f"`{id_col}` long, clf_score double"
    )
