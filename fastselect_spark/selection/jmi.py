"""Joint Mutual Information (JMI) greedy selection (graft-added: the
north_star scoring suite lists "greedy mRMR/JMI selection"; the reference
implements only mRMR, so JMI is an addition — documented as such).

JMI criterion (Yang & Moody 1999; Brown et al. 2012 framework):

    J(f) = sum_{s in S} I( (X_f, X_s) ; Y )

i.e. a candidate is scored by the joint information its pairing with each
already-selected feature carries about the label. Seed = argmax I(X_f; Y).

Distributed strategy: ONE pass builds every pairwise joint histogram
count[(i, j), x_i, x_j, y] for i<j (same melt + hash-aggregation shape as
``mi.mi_matrices(impl='sql')``, fused code = (x_i*k + x_j)*k_y + y);
relevance I(X_f; Y) reuses the same pass. The greedy loop then runs on the
driver over the merged tables — no cluster round-trips per step.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.selection._stats import mi_from_contingency
from fastselect_spark.selection.mi import MAX_STATES, shared_vocabulary
from fastselect_spark.selection._validate import validate_transform_input


_CUBE_CELL_CAP = 2_000_000


def _joint_tables_cube(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> tuple[np.ndarray, np.ndarray, int, int] | None:
    """Cube-first build (same single-pass shape as mi.py / pipeline.py):
    ONE groupBy(all columns).count(), vocabularies derived FROM the cube,
    every relevance/pair table a weighted-bincount marginalization. Returns
    None when the joint cube exceeds the cap (caller falls back to melt)."""
    p = len(feature_cols)
    cols = list(feature_cols) + [label_col]
    pdf = (
        df.groupBy(*[F.col(c).cast("double").alias(c) for c in cols])
        .count()
        .limit(_CUBE_CELL_CAP + 1)
        .toPandas()
    )
    if len(pdf) > _CUBE_CELL_CAP:
        return None
    raw = pdf[cols].to_numpy(dtype=np.float64)
    counts = pdf["count"].to_numpy(dtype=np.int64)
    fvocab = np.unique(raw[:, :p])
    yvocab = np.unique(raw[:, p])
    k, ky = len(fvocab), len(yvocab)
    if k > MAX_STATES:
        raise ValueError(f"feature vocabulary too large for JMI ({k} states)")
    fcodes = np.searchsorted(fvocab, raw[:, :p])
    ycodes = np.searchsorted(yvocab, raw[:, p])
    rel = np.zeros((p, k, ky), dtype=np.int64)
    for f in range(p):
        rel[f] = np.bincount(
            fcodes[:, f] * ky + ycodes, weights=counts, minlength=k * ky
        ).reshape(k, ky)
    pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]
    pair = np.zeros((len(pairs), k * k, ky), dtype=np.int64)
    for n, (i, j) in enumerate(pairs):
        fused = (fcodes[:, i] * k + fcodes[:, j]) * ky + ycodes
        pair[n] = np.bincount(
            fused, weights=counts, minlength=k * k * ky
        ).reshape(k * k, ky)
    return rel, pair, k, ky


def _joint_tables(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Returns (rel_tables[p, k, ky], pair_tables[npairs, k*k, ky], k, ky)
    where pair index follows i<j row-major order. Exact integer counts."""
    res = _joint_tables_cube(df, feature_cols, label_col)
    if res is not None:
        return res
    p = len(feature_cols)
    fvocab = shared_vocabulary(df, feature_cols)
    yvocab = shared_vocabulary(df, [label_col])
    k, ky = len(fvocab), len(yvocab)
    if k > MAX_STATES:
        raise ValueError(f"feature vocabulary too large for JMI ({k} states)")

    def code(c: str) -> F.Column:
        col = F.col(c).cast("double")
        if k > 0 and fvocab[0] == 0.0 and fvocab[-1] == k - 1 and np.all(np.diff(fvocab) == 1.0):
            return F.col(c).cast("long")
        arr = F.array(*[F.lit(float(v)) for v in fvocab])
        return (F.array_position(arr, col) - 1).cast("long")

    ycol = F.col(label_col).cast("double")
    if ky > 0 and yvocab[0] == 0.0 and yvocab[-1] == ky - 1 and np.all(np.diff(yvocab) == 1.0):
        ycode = F.col(label_col).cast("long")
    else:
        yarr = F.array(*[F.lit(float(v)) for v in yvocab])
        ycode = (F.array_position(yarr, ycol) - 1).cast("long")

    pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]
    slots = []
    for f in range(p):
        slots.append(
            F.struct(
                F.lit(f).alias("slot"),
                (code(feature_cols[f]) * ky + ycode).alias("code"),
            )
        )
    for idx, (i, j) in enumerate(pairs):
        fused = (code(feature_cols[i]) * k + code(feature_cols[j])) * ky + ycode
        slots.append(F.struct(F.lit(p + idx).alias("slot"), fused.alias("code")))
    melted = df.select(F.explode(F.array(*slots)).alias("x")).select(
        F.col("x.slot").alias("slot"), F.col("x.code").alias("code")
    )
    rows = melted.groupBy("slot", "code").count().collect()

    rel = np.zeros((p, k, ky), dtype=np.int64)
    pair = np.zeros((len(pairs), k * k, ky), dtype=np.int64)
    for r in rows:
        s, c, n = int(r["slot"]), int(r["code"]), int(r["count"])
        if s < p:
            rel[s, c // ky, c % ky] = n
        else:
            pair[s - p, c // ky, c % ky] = n
    return rel, pair, k, ky


def jmi_select(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    n_select: int = 5,
    unit: str = "bit",
) -> list[int]:
    """Greedy JMI selection; returns selected feature INDICES in pick order."""
    p = len(feature_cols)
    if not (0 < n_select <= p):
        raise ValueError("n_select out of range")
    rel_t, pair_t, k, ky = _joint_tables(df, feature_cols, label_col)
    relevance = np.array([mi_from_contingency(rel_t[f], unit=unit) for f in range(p)])
    pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]
    pair_idx = {pr: n for n, pr in enumerate(pairs)}
    joint_mi = np.zeros((p, p))
    for (i, j), n in pair_idx.items():
        m = mi_from_contingency(pair_t[n], unit=unit)
        joint_mi[i, j] = joint_mi[j, i] = m

    selected = [int(np.argmax(relevance))]
    while len(selected) < n_select:
        best, best_score = -1, -np.inf
        for f in range(p):
            if f in selected:
                continue
            score = float(sum(joint_mi[f, s] for s in selected))
            if score > best_score:
                best_score, best = score, f
        selected.append(best)
    return selected


class JMISelector:
    def __init__(self, n_features_to_select: int = 5) -> None:
        self.n_features_to_select = n_features_to_select

    def fit(
        self, df: DataFrame, feature_cols: list[str], label_col: str = "label"
    ) -> "JMISelector":
        self.feature_cols_ = list(feature_cols)
        idx = jmi_select(df, feature_cols, label_col, self.n_features_to_select)
        self.top_features_ = np.array(idx, dtype=np.int32)
        self.selected_cols_ = [feature_cols[i] for i in idx]
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not hasattr(self, "top_features_"):
            raise RuntimeError("JMISelector is not fitted")
        validate_transform_input(df, self.feature_cols_, type(self).__name__)
        return df.select(*self.selected_cols_)
