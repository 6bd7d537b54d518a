"""Conditional Mutual Information Maximization (CMIM) greedy selection
(graft-added: the reference implements mRMR only; CMIM is the standard
conditional-MI sibling — Fleuret 2004, Brown et al. 2012 framework).

Criterion:

    J(f) = min_{s in S} I(X_f ; Y | X_s)

i.e. a candidate is worth what it still tells you about the label after
conditioning on its most-redundant already-selected partner. By the chain
rule  I(f;Y|s) = I((f,s);Y) - I(s;Y),  so the whole selection runs off the
SAME single-pass joint tables JMI builds (``jmi._joint_tables``: one
groupBy-all-columns cube, or the melt fallback above the cell cap) — zero
extra cluster work, driver-side greedy loop. Seed = argmax I(X_f; Y);
ties break to the lowest feature index (strict ``>`` update, ascending
scan), matching the mRMR tie-break convention.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from fastselect_spark.selection._stats import mi_from_contingency
from fastselect_spark.selection._validate import validate_transform_input
from fastselect_spark.selection.jmi import _joint_tables


def cmim_select(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    n_select: int = 5,
    unit: str = "bit",
) -> list[int]:
    """Greedy CMIM selection; returns selected feature INDICES in pick
    order. One distributed pass (shared with JMI), then a driver loop."""
    p = len(feature_cols)
    if not (0 < n_select <= p):
        raise ValueError("n_select out of range")
    rel_t, pair_t, k, ky = _joint_tables(df, feature_cols, label_col)
    relevance = np.array(
        [mi_from_contingency(rel_t[f], unit=unit) for f in range(p)]
    )
    pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]
    joint_mi = np.zeros((p, p))
    for n, (i, j) in enumerate(pairs):
        m = mi_from_contingency(pair_t[n], unit=unit)
        joint_mi[i, j] = joint_mi[j, i] = m

    # I(f;Y|s) = I((f,s);Y) - I(s;Y)
    cond_mi = joint_mi - relevance[None, :]

    selected = [int(np.argmax(relevance))]
    while len(selected) < n_select:
        best, best_score = -1, -np.inf
        for f in range(p):
            if f in selected:
                continue
            score = float(min(cond_mi[f, s] for s in selected))
            if score > best_score:
                best_score, best = score, f
        selected.append(best)
    return selected


class CMIMSelector:
    def __init__(self, n_features_to_select: int = 5) -> None:
        self.n_features_to_select = n_features_to_select

    def fit(
        self, df: DataFrame, feature_cols: list[str], label_col: str = "label"
    ) -> "CMIMSelector":
        self.feature_cols_ = list(feature_cols)
        idx = cmim_select(df, feature_cols, label_col, self.n_features_to_select)
        self.top_features_ = np.array(idx, dtype=np.int32)
        self.selected_cols_ = [feature_cols[i] for i in idx]
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not hasattr(self, "top_features_"):
            raise RuntimeError("CMIMSelector is not fitted")
        validate_transform_input(df, self.feature_cols_, type(self).__name__)
        return df.select(*self.selected_cols_)
