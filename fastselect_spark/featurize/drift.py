"""Feature-distribution drift detection (PSI) — the monitoring side of a
feature platform: compare the live feature distribution against a frozen
reference window and alarm when the population shifts.

Population Stability Index per feature:

    PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

over ``bins`` uniform bins whose edges come from the REFERENCE frame's
min/max (the convention: the reference defines the binning; current-frame
outliers clip into the edge bins). Zero proportions are clipped to
``eps`` (1e-6) before the log — the standard PSI regularization,
documented so the oracle can mirror it exactly.

Distributed shape: ONE min/max agg on the reference + ONE fused
union-tagged histogram agg over both frames (map-side partials — counts
are exact integers), driver finalize over a (2 × bins × p) table. Linear
scans, no joins, no per-row Python; the 100 TB cost is two passes over
the reference and one over the current frame.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PSI_EPS = 1e-6


def _bin_expr(col: str, lo: float, width: float, bins: int):
    raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")


def _hists_fused(
    ref: DataFrame, cur: DataFrame, cols: list[str], edges: dict, bins: int
) -> tuple[dict, dict]:
    """Both frames' histograms in ONE union-tagged aggregation scan (one
    job instead of two; counts identical by construction). 2·p·bins sum
    expressions — fine for monitoring-sized p; for very wide matrices
    switch to a melt + groupBy(bin) (the countDistinct-expansion lesson)."""
    proj = [F.col(c).cast("double").alias(c) for c in cols]
    u = (
        ref.select(*proj).withColumn("__g", F.lit(0))
        .unionByName(cur.select(*proj).withColumn("__g", F.lit(1)))
    )
    aggs = []
    for g in (0, 1):
        for c in cols:
            lo, width = edges[c]
            b = _bin_expr(c, lo, width, bins)
            for k in range(bins):
                aggs.append(
                    F.sum(((b == k) & (F.col("__g") == g)).cast("long")).alias(
                        f"__h_{g}_{c}_{k}"
                    )
                )
    row = u.agg(*aggs).collect()[0]

    def unpack(g: int) -> dict:
        return {
            c: np.array(
                [row[f"__h_{g}_{c}_{k}"] or 0 for k in range(bins)],
                dtype=np.float64,
            )
            for c in cols
        }

    return unpack(0), unpack(1)


def reference_histogram(
    ref: DataFrame, col: str, bins: int = 10
) -> tuple[float, float, np.ndarray]:
    """(lo, width, proportions) of the reference frame — the frozen
    baseline a streaming PSI monitor compares live windows against."""
    mm = ref.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).collect()[0]
    lo, hi = float(mm["lo"]), float(mm["hi"])
    width = (hi - lo) / bins if hi > lo else 1.0
    b = _bin_expr(col, lo, width, bins)
    row = ref.agg(
        *[F.sum((b == k).cast("long")).alias(f"c{k}") for k in range(bins)]
    ).collect()[0]
    counts = np.array([row[f"c{k}"] or 0 for k in range(bins)], dtype=np.float64)
    return lo, width, counts / max(counts.sum(), 1.0)


def psi_scores(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    bins: int = 10,
    eps: float = PSI_EPS,
) -> dict[str, float]:
    """PSI per feature column; reference frame defines the bin edges."""
    mm = ref.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    ).collect()[0]
    edges = {}
    for c in cols:
        lo = float(mm[f"__lo_{c}"])
        hi = float(mm[f"__hi_{c}"])
        width = (hi - lo) / bins if hi > lo else 1.0
        edges[c] = (lo, width)
    h_ref, h_cur = _hists_fused(ref, cur, cols, edges, bins)
    out = {}
    for c in cols:
        p = h_ref[c] / max(h_ref[c].sum(), 1.0)
        q = h_cur[c] / max(h_cur[c].sum(), 1.0)
        p = np.maximum(p, eps)
        q = np.maximum(q, eps)
        out[c] = float(((p - q) * np.log(p / q)).sum())
    return out
