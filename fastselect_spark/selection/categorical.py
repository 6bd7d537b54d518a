"""Categorical association analysis — Cramér's V and Theil's U between
every pair of categorical columns: the profiling step that decides which
categorical features are redundant (V ≈ 1), which pairs leak into each
other asymmetrically (U), and which are safe to keep together — the
categorical counterpart of the Pearson/Spearman correlation matrices.

ONE ``groupBy(all columns).count()`` cube and every pairwise contingency
table falls out by driver-side marginalization (the shared-cube
discipline of selection/pipeline.py scores_from_cube — never one job per
pair). Cube size is the product of the alphabets, which is what bounds
this operator: it is for CATEGORICAL columns (roles, langs, sources,
buckets), not for high-cardinality keys.

Definitions (counts n_ij, row/col totals r_i, c_j, total n):

    chi2 = Σ_ij (n_ij − r_i·c_j/n)² / (r_i·c_j/n)
    V    = sqrt( (chi2/n) / min(R−1, C−1) )          (0 when min = 0)
    U(a|b) = (H(A) − H(A|B)) / H(A)                  (1 when H(A) = 0)

with natural-log entropies over nonzero cells. All inputs are exact
integer counts; the float reductions are cell-ordered on the driver and
round to 6 engine-side in the contract, absorbing SQL-vs-NumPy
summation-order ulps (the anova/psi precedent)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _entropy(p: np.ndarray) -> float:
    p = p[p > 0]
    return float(-(p * np.log(p)).sum())


def categorical_associations(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """(col_a, col_b, cramers_v, theils_u) for every ORDERED pair of
    distinct columns (V is symmetric; U is U(a|b), asymmetric). NULL
    category values participate as their own level."""
    spark = df.sparkSession
    cube = (
        df.groupBy(*[F.col(c).cast("string").alias(c) for c in cols])
        .count()
        .collect()
    )
    out = []
    for a in cols:
        for b in cols:
            if a == b:
                continue
            cells: dict = {}
            for r in cube:
                key = (r[a], r[b])
                cells[key] = cells.get(key, 0) + int(r["count"])
            avals = sorted({k[0] for k in cells}, key=lambda v: (v is None, v))
            bvals = sorted({k[1] for k in cells}, key=lambda v: (v is None, v))
            M = np.zeros((len(avals), len(bvals)))
            for (va, vb), c in cells.items():
                M[avals.index(va), bvals.index(vb)] = c
            n = M.sum()
            ri = M.sum(axis=1)
            cj = M.sum(axis=0)
            e = np.outer(ri, cj) / n
            with np.errstate(divide="ignore", invalid="ignore"):
                chi2 = float(np.where(e > 0, (M - e) ** 2 / e, 0.0).sum())
            dof = min(len(avals) - 1, len(bvals) - 1)
            v = float(np.sqrt((chi2 / n) / dof)) if dof > 0 else 0.0
            h_a = _entropy(ri / n)
            # H(A|B) = Σ_j p(b_j) · H(A | b_j)
            h_ab = 0.0
            for j in range(len(bvals)):
                if cj[j] > 0:
                    h_ab += (cj[j] / n) * _entropy(M[:, j] / cj[j])
            u = (h_a - h_ab) / h_a if h_a > 0 else 1.0
            out.append((a, b, v, float(u)))
    return spark.createDataFrame(
        out, schema="col_a string, col_b string, cramers_v double, theils_u double"
    )
