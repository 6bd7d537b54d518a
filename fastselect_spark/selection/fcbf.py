"""FCBF — Fast Correlation-Based Filter (Yu & Liu, ICML 2003).
Graft-added: the reference's CFS (CFS.py) uses the same symmetrical-
uncertainty correlation; FCBF is its linear-time sibling — rank features by
SU(f; Y), then remove every feature that has a *predominant* selected
feature more correlated with it than it is with the label.

Distributed strategy: ONE pass builds the joint tables (reusing
``jmi._joint_tables`` — cube-first, melt fallback); SU(f;Y) comes from each
feature's class contingency and SU(fi;fj) from the pair table marginalized
over the label. The scalar SU is ``cfs.symmetrical_uncertainty`` — the same
function CFS's oracle-verified merit uses, so the two filters are
bit-identical on shared inputs by construction. The rank/eliminate loop is
driver-side (p×p table, same scale as the reference's CFS search).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from fastselect_spark.selection._validate import validate_transform_input
from fastselect_spark.selection.cfs import symmetrical_uncertainty
from fastselect_spark.selection.jmi import _joint_tables


def fcbf_select(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    delta: float = 0.0,
) -> list[int]:
    """FCBF selection; returns surviving feature INDICES in descending
    SU(f;Y) order (the paper's S_best list order).

    1. relevance: keep features with SU(f;Y) > ``delta``;
    2. rank the survivors by SU(f;Y) descending (ties: lowest index);
    3. walk the ranking: the head is selected; every later feature q with
       SU(p;q) >= SU(q;Y) for a selected predecessor p is removed
       (predominance test, Yu & Liu Alg. 1 lines 11-18).
    """
    p = len(feature_cols)
    rel_t, pair_t, k, ky = _joint_tables(df, feature_cols, label_col)
    su_y = np.array([symmetrical_uncertainty(rel_t[f]) for f in range(p)])
    pairs = [(i, j) for i in range(p) for j in range(i + 1, p)]
    su_ff = np.zeros((p, p))
    for n, (i, j) in enumerate(pairs):
        # pair table is (k*k, ky); marginalize the label, refold to (k, k)
        table = pair_t[n].sum(axis=1).reshape(k, k)
        su_ff[i, j] = su_ff[j, i] = symmetrical_uncertainty(table)

    order = sorted(
        (f for f in range(p) if su_y[f] > delta), key=lambda f: (-su_y[f], f)
    )
    selected: list[int] = []
    removed: set[int] = set()
    for f in order:
        if f in removed:
            continue
        selected.append(f)
        for q in order:
            if q in removed or q in selected:
                continue
            if su_ff[f, q] >= su_y[q]:
                removed.add(q)
    return selected


class FCBFSelector:
    def __init__(self, delta: float = 0.0) -> None:
        self.delta = delta

    def fit(
        self, df: DataFrame, feature_cols: list[str], label_col: str = "label"
    ) -> "FCBFSelector":
        self.feature_cols_ = list(feature_cols)
        idx = fcbf_select(df, feature_cols, label_col, self.delta)
        self.top_features_ = np.array(idx, dtype=np.int32)
        self.selected_cols_ = [feature_cols[i] for i in idx]
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not hasattr(self, "top_features_"):
            raise RuntimeError("FCBFSelector is not fitted")
        validate_transform_input(df, self.feature_cols_, type(self).__name__)
        return df.select(*self.selected_cols_)
