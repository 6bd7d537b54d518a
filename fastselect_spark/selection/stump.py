"""Decision-stump split gain — per feature, the best binary-split
information gain over all candidate thresholds (the CART/C4.5 root-split
score). Complements the distribution-wide scorers (chi2/MI see the whole
contingency; a stump finds the single best cut, the signal tree
ensembles actually consume) and OneR (which scores a per-VALUE rule,
not a threshold).

Graft-added. Scale shape: the data pass is ONE melt + one
(feature, value, class) hash aggregation — output bounded by total
vocabulary × classes, never rows. The driver finalizes per feature with
NumPy prefix sums over the value-sorted contingency (candidates =
distinct values with a non-empty right side; gain spelled in the SQL
oracle's fixed class order t0+t1+t2, so exact-count candidates produce
cross-engine-identical gains and the (gain desc, threshold asc) argmax
agrees).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _entropy_terms(counts: np.ndarray, n: np.ndarray) -> np.ndarray:
    """H = t0 + t1 + ... tK in explicit class order; counts (m, K), n (m,).
    Zero-count classes contribute exactly 0."""
    h = np.zeros(len(counts), dtype=np.float64)
    nn = n.astype(np.float64)
    for k in range(counts.shape[1]):  # fixed order: t0 + t1 + ... (SQL mirror)
        c = counts[:, k].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(c > 0, -(c / nn) * np.log(c / nn), 0.0)
        h = h + t
    return h


def stump_gain_scores(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
) -> DataFrame:
    """(feature, threshold, gain): the split ``x <= threshold`` maximizing
    information gain, per feature. Ties break toward the smaller
    threshold. Constant features yield gain 0 with a NULL threshold."""
    p = len(feature_cols)
    stack_expr = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in feature_cols)
    long = df.selectExpr(
        f"stack({p}, {stack_expr}) AS (feature, v)",
        f"{label_col} AS __y",
    ).where(F.col("v").isNotNull())
    rows = (
        long.groupBy("feature", "v", "__y")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    )
    classes = sorted({r["__y"] for r in rows})
    cidx = {c: i for i, c in enumerate(classes)}
    by_feat: dict[str, dict[float, np.ndarray]] = {}
    for r in rows:
        m = by_feat.setdefault(r["feature"], {})
        vec = m.setdefault(r["v"], np.zeros(len(classes), dtype=np.int64))
        vec[cidx[r["__y"]]] += r["cnt"]
    out = []
    for c in feature_cols:
        m = by_feat.get(c)
        if not m:
            continue
        vals = np.array(sorted(m), dtype=np.float64)
        counts = np.stack([m[v] for v in vals])  # (m, K) value-ascending
        total = counts.sum(axis=0)
        n = int(total.sum())
        h_parent = float(_entropy_terms(total[None, :], np.array([n]))[0])
        if len(vals) < 2:
            out.append((c, None, 0.0))
            continue
        left = np.cumsum(counts, axis=0)[:-1]  # split after each value
        right = total[None, :] - left
        nl = left.sum(axis=1)
        nr = right.sum(axis=1)
        hl = _entropy_terms(left, nl)
        hr = _entropy_terms(right, nr)
        # operand order mirrored by the oracle:
        # (H - (nL/n)*HL) - (nR/n)*HR
        gain = (h_parent - (nl / n) * hl) - (nr / n) * hr
        best = int(np.argmax(gain))  # first max = smallest threshold
        out.append((c, float(vals[best]), float(gain[best])))
    return df.sparkSession.createDataFrame(
        out, schema="feature string, threshold double, gain double"
    )
