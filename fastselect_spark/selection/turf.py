"""TuRF iterative wrapper (reference O4,
/root/reference/src/fast_select/TuRF.py:7-136).

Pure driver-side recursive feature elimination: fit the base Relief-style
selector, drop the worst pct_remove fraction, refit on the surviving COLUMN
subset (sliced from the once-staged matrix — no re-stage per round), repeat.
Semantics reproduced exactly:
- n_to_remove = max(1, int(remaining * pct_remove)), clamped so the subset
  never shrinks below n_features_to_select (TuRF.py:99-102);
- stops when remaining <= n_features_to_select or n_iterations reached;
- feature_importances_ = FIRST-iteration scores on the full feature set;
- top_features_ = ALL surviving features, sorted ASCENDING (TuRF.py:117-119)
  — unlike the other estimators.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from fastselect_spark.selection._validate import validate_transform_input


class TuRFSelector:
    def __init__(
        self,
        estimator,
        n_features_to_select: int = 10,
        pct_remove: float = 0.1,
        n_iterations: int | None = None,
        verbose: bool = False,
    ) -> None:
        self.estimator = estimator
        self.n_features_to_select = n_features_to_select
        self.pct_remove = pct_remove
        self.n_iterations = n_iterations
        self.verbose = verbose

    def fit(
        self, df: DataFrame, feature_cols: list[str], label_col: str = "label"
    ) -> "TuRFSelector":
        import inspect

        from fastselect_spark.selection._stage import make_stage

        if not 0 < self.pct_remove < 1:
            raise ValueError("pct_remove must be between 0 and 1.")
        self.feature_cols_ = list(feature_cols)
        self.n_features_in_ = len(feature_cols)

        # Stage the FULL matrix exactly once; every elimination round's fit
        # receives the shared stage and its kernels slice the surviving
        # column subset from the per-worker cached matrix — a 10-round TuRF
        # used to pay 10 full stage writes/read-backs of overlapping data.
        # Duck-typed estimators without stage support keep the plain
        # column-pruned df.select path.
        est = self.estimator
        shares_stage = "_stage" in inspect.signature(est.fit).parameters
        stage = (
            make_stage(df, list(feature_cols), label_col) if shares_stage else None
        )
        kw = {"_stage": stage} if shares_stage else {}
        try:
            active = np.arange(self.n_features_in_)
            est.fit(df, feature_cols, label_col, **kw)
            self.feature_importances_ = est.feature_importances_.copy()
            current_scores = self.feature_importances_.copy()

            iteration = 0
            while True:
                if len(active) <= self.n_features_to_select:
                    break
                if self.n_iterations is not None and iteration >= self.n_iterations:
                    break
                n_rm = max(1, int(len(active) * self.pct_remove))
                if len(active) - n_rm < self.n_features_to_select:
                    n_rm = len(active) - self.n_features_to_select
                worst = np.argsort(current_scores)[:n_rm]
                active = np.delete(active, worst)
                if self.verbose:
                    print(f"Iteration {iteration}: {len(active)} features remaining.")
                subset_cols = [feature_cols[i] for i in active]
                sub_df = df if shares_stage else df.select(*subset_cols, label_col)
                est.fit(sub_df, subset_cols, label_col, **kw)
                current_scores = est.feature_importances_
                iteration += 1

            order = np.argsort(current_scores)[::-1]
            self.top_features_ = np.sort(active[order])
            return self
        finally:
            if stage is not None:
                stage.cleanup()

    def transform(self, df: DataFrame) -> DataFrame:
        if not hasattr(self, "top_features_"):
            raise RuntimeError("TuRFSelector is not fitted")
        validate_transform_input(df, self.feature_cols_, type(self).__name__)
        return df.select(*[self.feature_cols_[i] for i in self.top_features_])
