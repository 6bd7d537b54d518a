"""Independent vectorized-NumPy oracle of the reference semantics, used by
tests to cross-check the distributed engine (the reference itself needs
numba/sklearn/scipy which are unavailable here). Implements the SAME math
documented in SURVEY.md §2.2 but written vectorized, not as loop kernels.
"""

from __future__ import annotations

import math

import numpy as np


def chi2_oracle(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Value-weighted chi2 stats per feature (reference Chi2.py semantics)."""
    labels, y_enc = np.unique(y, return_inverse=True)
    K = len(labels)
    if K < 2:
        return np.zeros(X.shape[1])
    class_freqs = np.bincount(y_enc).astype(np.float64)
    observed = np.zeros((K, X.shape[1]))
    for c in range(K):
        observed[c] = X[y_enc == c].sum(axis=0)
    feature_counts = observed.sum(axis=0)
    expected = np.outer(class_freqs, feature_counts) / len(y)
    with np.errstate(divide="ignore", invalid="ignore"):
        term = np.where(expected > 1e-12, (observed - expected) ** 2 / expected, 0.0)
    stats = term.sum(axis=0)
    stats[feature_counts == 0] = 0.0
    return stats


def mi_oracle(a: np.ndarray, b: np.ndarray, unit: str = "bit") -> float:
    """I(a;b) for discrete arrays with the reference's eps placement."""
    _, ai = np.unique(a, return_inverse=True)
    _, bi = np.unique(b, return_inverse=True)
    k1, k2 = ai.max() + 1, bi.max() + 1
    table = np.bincount(ai * k2 + bi, minlength=k1 * k2).reshape(k1, k2)
    p = table / len(a)
    px, py = p.sum(axis=1), p.sum(axis=0)
    eps = 1e-12
    mask = p > eps
    denom = px[:, None] * py[None, :] + eps
    mi = float(np.sum(p[mask] * np.log(p[mask] / denom[mask])))
    return mi / (math.log(2.0) if unit == "bit" else 1.0)


def mi_matrices_oracle(X: np.ndarray, y: np.ndarray, unit: str = "bit"):
    p = X.shape[1]
    relevance = np.array([mi_oracle(X[:, f], y, unit) for f in range(p)])
    redundancy = np.zeros((p, p))
    for i in range(p):
        for j in range(i + 1, p):
            m = mi_oracle(X[:, i], X[:, j], unit)
            redundancy[i, j] = redundancy[j, i] = m
    return relevance, redundancy
