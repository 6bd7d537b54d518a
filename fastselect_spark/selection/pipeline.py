"""Single-pass scoring: chi2 + MI/mRMR from ONE contingency cube.

The flagship pipeline's scorers all consume sufficient statistics that are
marginalizations of the SAME joint value cube ``groupBy(all code columns)
.count()``:

- chi2's value-weighted observed matrix: ``obs[c, f] = Σ_cells
  count(cell) · cell_code_f`` over cells with ``cell_y = c`` (the codes ARE
  the values — Chi2.py:7-22 semantics exactly);
- class frequencies / priors: cube counts grouped by the y code;
- every MI relevance / redundancy table: weighted bincounts of cube cells
  (mutual_information.py:25-63 semantics via the shared X∪y vocabulary).

So one hash aggregation over the data (partial+final, whole-stage codegen)
replaces a cached code matrix + two scan jobs. At 10^12-turn scale this is
the only sane shape: the cube is bounded by the code-space product, not by
the row count, and nothing row-sized is ever persisted.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.selection._stats import (
    chi2_sf,
    chi2_stats_from_observed,
    mi_from_contingency,
)

MAX_STATES = 512
_CUBE_CELL_CAP = 2_000_000


def scores_from_cube(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    unit: str = "bit",
    compute_redundancy: bool = True,
    validate: bool = True,
) -> dict:
    """Returns {'chi2', 'p_values', 'relevance', 'redundancy', 'n'} from one
    aggregation pass. Feature/label values must be discrete (the cube must
    stay under ~2M cells)."""
    cols = list(feature_cols) + [label_col]
    p = len(feature_cols)
    pdf = (
        df.groupBy(*[F.col(c).cast("double").alias(c) for c in cols])
        .count()
        .limit(_CUBE_CELL_CAP + 1)
        .toPandas()
    )
    if len(pdf) > _CUBE_CELL_CAP:
        raise ValueError("joint value cube exceeds the cap; bin features first")
    raw = pdf[cols].to_numpy(dtype=np.float64)
    counts = pdf["count"].to_numpy(dtype=np.int64)
    n = int(counts.sum())

    # --- chi2 (value-weighted observed, Chi2.py:49-91 semantics) ---
    if validate and len(raw) and raw[:, :p].min() < 0:
        raise ValueError("Input matrix X must contain non-negative values.")
    y_raw = raw[:, p]
    y_vals = np.unique(y_raw)
    K = len(y_vals)
    if K < 2:
        chi2_stats = np.zeros(p, dtype=np.float64)
        p_values = np.ones(p, dtype=np.float64)
    else:
        obs = np.zeros((K, p), dtype=np.float64)
        class_freqs = np.zeros(K, dtype=np.float64)
        y_idx = np.searchsorted(y_vals, y_raw)
        for c in range(K):
            m = y_idx == c
            obs[c] = (raw[m, :p] * counts[m, None]).sum(axis=0)
            class_freqs[c] = counts[m].sum()
        chi2_stats = chi2_stats_from_observed(obs, class_freqs, float(n))
        p_values = chi2_sf(chi2_stats, dof=K - 1)

    # --- MI relevance/redundancy (shared X∪y vocabulary, mRMR.py:90) ---
    vocab = np.unique(raw)
    k = len(vocab)
    if k > MAX_STATES:
        raise ValueError(f"shared vocabulary has {k} states (> {MAX_STATES})")
    codes = np.searchsorted(vocab, raw)
    y = codes[:, p]
    kk = k * k
    relevance = np.empty(p, dtype=np.float64)
    for f in range(p):
        table = np.bincount(
            codes[:, f] * k + y, weights=counts, minlength=kk
        ).reshape(k, k)
        relevance[f] = mi_from_contingency(table, unit=unit)
    redundancy = np.zeros((p, p), dtype=np.float64)
    if compute_redundancy:
        for i in range(p):
            for j in range(i + 1, p):
                table = np.bincount(
                    codes[:, i] * k + codes[:, j], weights=counts, minlength=kk
                ).reshape(k, k)
                mi = mi_from_contingency(table, unit=unit)
                redundancy[i, j] = redundancy[j, i] = mi
    return {
        "chi2": chi2_stats,
        "p_values": p_values,
        "relevance": relevance,
        "redundancy": redundancy,
        "n": n,
    }
