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


# --- Relief family: per-sample loop transliterations of the reference CPU
# kernels (ReliefF.py:137-220, SURF.py:131-195, MultiSURF.py:165-253).
# The j-axis is vectorized for speed but the control flow is the kernels':
# one sample at a time, explicit neighbor selection, same guards. Distances
# are float32 where the kernels' are (ReliefF/SURF); accumulation is float64
# (the kernels use float32 temps — bridged by the reference's own CPU-vs-GPU
# tolerance, rtol 1e-5 / atol 1e-7, tests/test_surf.py:74-80).


def _relief_metadata(X: np.ndarray, discrete_limit: int, force_disc_range: bool):
    p = X.shape[1]
    is_disc = np.array(
        [len(np.unique(X[:, f])) <= discrete_limit for f in range(p)], dtype=bool
    )
    rng = X.max(axis=0) - X.min(axis=0)
    if force_disc_range:
        rng[is_disc] = 1.0  # ReliefF.py:377-380 / SURF.py:352-355
    rng[rng == 0] = 1.0
    return is_disc, 1.0 / rng


def _diffs_from(x: np.ndarray, i: int, recip: np.ndarray, is_disc: np.ndarray):
    """Per-feature mixed diffs from sample i to every row (float64)."""
    out = np.empty_like(x, dtype=np.float64)
    out[:, is_disc] = (x[:, is_disc] != x[i, is_disc]).astype(np.float64)
    cont = ~is_disc
    out[:, cont] = np.abs(x[:, cont] - x[i, cont]) * recip[cont]
    return out


def relieff_oracle(
    X: np.ndarray, y: np.ndarray, n_neighbors: int = 3, discrete_limit: int = 10
) -> np.ndarray:
    X = np.asarray(X, dtype=np.float64)
    n, p = X.shape
    classes, y_enc = np.unique(y, return_inverse=True)
    if len(classes) < 2:
        return np.zeros(p)
    is_disc, recip = _relief_metadata(X, discrete_limit, force_disc_range=True)
    x = X.astype(np.float32).astype(np.float64)  # kernel data is float32
    probs = np.bincount(y_enc) / n
    k = n_neighbors
    scores = np.zeros(p, dtype=np.float64)
    for i in range(n):
        diffs = _diffs_from(x, i, recip, is_disc)
        d = diffs.sum(axis=1).astype(np.float32)  # float32 dists like the kernel
        d[i] = np.inf
        order = np.argsort(d, kind="stable")
        lbl = y_enc[i]
        olab = y_enc[order]
        hits = order[olab == lbl][:k]
        denom = 1.0 - probs[lbl]
        if denom == 0:
            denom = 1.0
        if len(hits):
            scores -= diffs[hits].sum(axis=0) / len(hits)
        miss_sum = np.zeros(p)
        for c in range(len(classes)):
            if c == lbl:
                continue
            mc = order[olab == c][:k]
            if len(mc):
                miss_sum += (probs[c] / denom) * diffs[mc].sum(axis=0)
        scores += miss_sum / k
    return scores / n


def surf_oracle(
    X: np.ndarray,
    y: np.ndarray,
    use_star: bool = False,
    discrete_limit: int = 10,
) -> np.ndarray:
    X = np.asarray(X, dtype=np.float64)
    n, p = X.shape
    _, y_enc = np.unique(y, return_inverse=True)
    is_disc, recip = _relief_metadata(X, discrete_limit, force_disc_range=True)
    scores = np.zeros(p, dtype=np.float64)
    for i in range(n):
        diffs = _diffs_from(X, i, recip, is_disc)
        d = diffs.sum(axis=1).astype(np.float32)
        d[i] = 0.0  # SURF.py:149: self distance 0, included in the mean
        avg = d.sum() / (n - 1)
        hit = y_enc == y_enc[i]
        near = d < avg
        near[i] = False
        scores += diffs[near & ~hit].sum(axis=0) - diffs[near & hit].sum(axis=0)
        if use_star:
            far = ~near
            far[i] = False
            scores += diffs[far & hit].sum(axis=0) - diffs[far & ~hit].sum(axis=0)
    return scores / n


def multisurf_oracle(
    X: np.ndarray,
    y: np.ndarray,
    use_star: bool = False,
    discrete_limit: int = 10,
) -> np.ndarray:
    X = np.asarray(X, dtype=np.float64)
    n, p = X.shape
    _, y_enc = np.unique(y, return_inverse=True)
    # MultiSURF does NOT force discrete ranges to 1 (MultiSURF.py:409-412)
    is_disc, recip = _relief_metadata(X, discrete_limit, force_disc_range=False)
    x = X.astype(np.float32).astype(np.float64)  # float32 data (MultiSURF.py:385)
    scores = np.zeros(p, dtype=np.float64)
    for i in range(n):
        diffs = _diffs_from(x, i, recip, is_disc)
        d = diffs.sum(axis=1)
        d[i] = 0.0
        mu = d.sum() / (n - 1)
        var = max(0.0, (d * d).sum() / (n - 1) - mu * mu)
        thresh = mu - 0.5 * np.sqrt(var)
        hit = y_enc == y_enc[i]
        near = d < thresh
        near[i] = False
        nh, nm = near & hit, near & ~hit
        hit_diffs = diffs[nh].sum(axis=0)
        miss_diffs = diffs[nm].sum(axis=0)
        if use_star:
            fm = (~near) & (~hit)
            fm[i] = False
            miss_diffs = miss_diffs - diffs[fm].sum(axis=0)
        if nh.sum() > 0:
            hit_diffs = hit_diffs / nh.sum()
        if nm.sum() > 0:
            miss_diffs = miss_diffs / nm.sum()
        scores += miss_diffs - hit_diffs
    return scores / n
