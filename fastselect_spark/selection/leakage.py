"""Temporal-leakage audit for point-in-time feature tables.

Graft-added, aimed directly at the north rule's "zero temporal leakage"
requirement (the reference scores static matrices and has no temporal
surface — MI machinery parity is in selection/mi.py). A feature built
with accidental look-ahead (a window frame that includes the current/next
row, a join that matched a future snapshot, label-contaminated encoding)
shows a characteristic signature: it carries MORE information about the
NEXT turn's label than about the current one — an honest causal feature
can correlate with future labels through autocorrelation, but it should
not know the future better than the present.

The audit computes, per feature, discrete MI(feature_t, label_t) and
MI(feature_t, label_{t+1}) from ONE melted contingency aggregation
(the repo's shared-cube discipline: one groupBy bounded by vocabulary,
driver-side marginalization — never a per-feature scan), and flags
features whose future-MI exceeds ``ratio_threshold x`` their present-MI.

This is a screening heuristic, not a proof: it catches the common
frame-off-by-one and future-join bugs cheaply at corpus scale; a flagged
feature deserves a lineage review (the no-lookahead canary test in
tests/test_featurize.py is the complementary exact check).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def leakage_audit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ratio_threshold: float = 1.2,
) -> list[dict]:
    """Per-feature leakage screen over integer-coded features.

    Returns a list of dicts (feature, mi_now_bits, mi_future_bits,
    flagged) sorted by feature name. Rows whose conversation has no next
    turn are excluded (label_{t+1} undefined). MI uses the engine's
    established discrete form: sum (c/n) log2((c/n) / (px*py + 1e-12)).
    """
    w = Window.partitionBy(conv_col).orderBy(order_col)
    base = df.withColumn("__yf", F.lead(label_col).over(w)).where(
        F.col("__yf").isNotNull() & F.col(label_col).isNotNull()
    )
    stack = ", ".join(f"'{c}', {c}" for c in feature_cols)
    melted = base.selectExpr(
        f"stack({len(feature_cols)}, {stack}) AS (feature, v)",
        f"{label_col} AS yn",
        "__yf AS yf",
    )
    cells = (
        melted.groupBy("feature", "v", "yn", "yf")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_feat: dict[str, dict[tuple, int]] = {}
    for r in cells:
        by_feat.setdefault(r["feature"], {})[(r["v"], r["yn"], r["yf"])] = r["c"]

    def _mi(cnt: dict[tuple, int]) -> float:
        n = float(sum(cnt.values()))
        px: dict = {}
        py: dict = {}
        for (v, y), c in cnt.items():
            px[v] = px.get(v, 0) + c
            py[y] = py.get(y, 0) + c
        s = 0.0
        for (v, y), c in sorted(cnt.items(), key=lambda t: (str(t[0][0]), str(t[0][1]))):
            pxy = c / n
            s += pxy * math.log2(pxy / ((px[v] / n) * (py[y] / n) + 1e-12))
        return s

    out = []
    for feat in sorted(by_feat):
        now: dict[tuple, int] = {}
        fut: dict[tuple, int] = {}
        for (v, yn, yf), c in by_feat[feat].items():
            now[(v, yn)] = now.get((v, yn), 0) + c
            fut[(v, yf)] = fut.get((v, yf), 0) + c
        mi_now = _mi(now)
        mi_fut = _mi(fut)
        out.append(
            {
                "feature": feat,
                "mi_now_bits": mi_now,
                "mi_future_bits": mi_fut,
                "flagged": int(
                    round(mi_fut, 6) > ratio_threshold * round(mi_now, 6)
                ),
            }
        )
    return out


def leakage_audit_df(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ratio_threshold: float = 1.2,
) -> DataFrame:
    """DataFrame wrapper of :func:`leakage_audit` (for the contract
    surface): (feature, mi_now_bits, mi_future_bits, flagged)."""
    rows = leakage_audit(
        df, feature_cols, label_col, conv_col, order_col, ratio_threshold
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                r["feature"],
                float(r["mi_now_bits"]),
                float(r["mi_future_bits"]),
                int(r["flagged"]),
            )
            for r in rows
        ],
        "feature string, mi_now_bits double, mi_future_bits double, flagged int",
    )
