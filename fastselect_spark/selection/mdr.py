"""Multifactor Dimensionality Reduction (reference O11 + O17,
/root/reference/src/fast_select/MDR.py:148-357).

Distributed axis: the combinatorial search. Feature combos are enumerated on
the driver (like the reference, MDR.py:247-250) and CHUNKED across tasks;
each task scores its combo range against the broadcast genotype matrix for
ALL folds in one vectorized pass (fold-offset bincount of 3^k cell ids —
better than the reference's per-fold re-scan, SURVEY.md §4.1). The driver
reduces per-fold argmax (first-index tie-break like np.argmax), builds the
per-fold LUTs, votes CV-consistency, and fits the final full-data LUT.

Reference semantics reproduced:
- genotypes must be 0/1/2 (ValueError otherwise); y must be binary 0/1;
- scoring kernel: cell high-risk iff control==0 or case/control > total
  ratio; BA=(sens+spec)/2; combos with a fold lacking cases or controls
  score 0 (MDR.py:82-129);
- LUT rule differs deliberately: ratios = case/(control+1e-9) > threshold,
  threshold=inf when no controls (MDR.py:176-195) — kernel and LUT disagree
  on empty cells; both reproduced as-is;
- StratifiedKFold(shuffle=True, random_state=42) reimplemented with
  sklearn's exact fold-construction algorithm (driver-side, parity scale);
- model vote: max CV-count, tie-break by mean test BA (MDR.py:304-323).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def stratified_kfold_assign(y: np.ndarray, n_splits: int, seed: int = 42) -> np.ndarray:
    """Reimplementation of sklearn's StratifiedKFold(shuffle=True) test-fold
    assignment (public algorithm): per-class contiguous allocation from the
    sorted label order, shuffled per class with a shared RandomState."""
    rng = np.random.RandomState(seed)
    y = np.asarray(y)
    _, y_idx, y_inv = np.unique(y, return_index=True, return_inverse=True)
    _, class_perm = np.unique(y_idx, return_inverse=True)
    y_encoded = class_perm[y_inv]
    n_classes = len(y_idx)
    y_order = np.sort(y_encoded)
    allocation = np.asarray(
        [np.bincount(y_order[i::n_splits], minlength=n_classes) for i in range(n_splits)]
    )
    test_folds = np.empty(len(y), dtype=int)
    for k in range(n_classes):
        folds_for_class = np.arange(n_splits).repeat(allocation[:, k])
        rng.shuffle(folds_for_class)
        test_folds[y_encoded == k] = folds_for_class
    return test_folds


def _cells_for_combo(X: np.ndarray, combo: tuple[int, ...]) -> np.ndarray:
    cell = np.zeros(len(X), dtype=np.int64)
    for f in combo:
        cell = cell * 3 + X[:, f]
    return cell


def _lut(case: np.ndarray, control: np.ndarray) -> np.ndarray:
    """3^k binary lookup table (MDR.py:176-195 semantics)."""
    total_cases = case.sum()
    total_controls = control.sum()
    threshold = np.inf if total_controls == 0 else total_cases / total_controls
    ratios = case / (control + 1e-9)
    return (ratios > threshold).astype(np.uint8)


def _ba_from_counts(case: np.ndarray, control: np.ndarray) -> float:
    """Balanced accuracy of the high-risk rule (MDR.py:106-127)."""
    total_case = int(case.sum())
    total_control = int(control.sum())
    if total_case == 0 or total_control == 0:
        return 0.0
    thr = total_case / total_control
    # high-risk iff control==0 or case/control > thr (MDR.py:120)
    ratio = np.where(control > 0, case / np.where(control > 0, control, 1), np.inf)
    high = (control == 0) | (ratio > thr)
    tp = int(case[high].sum())
    tn = int(control[~high].sum())
    sens = tp / total_case
    spec = tn / total_control
    return (sens + spec) / 2.0


class MDRClassifier:
    def __init__(self, k: int = 2, cv: int = 10, verbose: bool = False) -> None:
        self.k = k
        self.cv = cv
        self.verbose = verbose

    def fit(
        self,
        df: DataFrame,
        feature_cols: list[str],
        label_col: str = "label",
        fold_col: str | None = None,
    ) -> "MDRClassifier":
        """``fold_col``: optional precomputed test-fold assignment column
        (ints in [0, cv)). Default is the sklearn StratifiedKFold(shuffle,
        seed=42) reimplementation; a caller-supplied deterministic fold
        column makes the whole CV vote reproducible by any engine (it is
        what the driver-contract oracle uses)."""
        self.feature_cols_ = list(feature_cols)
        p = len(feature_cols)
        sel_cols = [*feature_cols, label_col] + ([fold_col] if fold_col else [])
        pdf = df.select(*sel_cols).toPandas()
        X = pdf[feature_cols].to_numpy()
        y = pdf[label_col].to_numpy()
        if not np.isin(np.unique(X), [0, 1, 2]).all():
            raise ValueError("MDR requires genotype features coded 0/1/2.")
        if not np.isin(np.unique(y), [0, 1]).all():
            raise ValueError("MDR requires binary labels coded 0/1.")
        X = X.astype(np.uint8)
        y = y.astype(np.uint8)
        n = len(y)
        k = self.k
        cv = self.cv
        n_cells = 3**k

        combos = list(combinations(range(p), k))
        n_combos = len(combos)
        if fold_col is not None:
            test_folds = pdf[fold_col].to_numpy().astype(np.int64)
            if test_folds.min() < 0 or test_folds.max() >= cv:
                raise ValueError(f"fold_col values must be in [0, {cv})")
        else:
            test_folds = stratified_kfold_assign(y, cv, seed=42)

        spark = df.sparkSession
        bc = spark.sparkContext.broadcast((X, y, test_folds))
        combos_arr = np.array(combos, dtype=np.int64)

        # distribute combo chunks
        parts = min(max(spark.sparkContext.defaultParallelism, 4), n_combos)
        combo_df = spark.createDataFrame(
            pd.DataFrame({"combo_id": np.arange(n_combos, dtype=np.int64)})
        ).repartition(parts)
        combos_bc = spark.sparkContext.broadcast(combos_arr)

        def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            Xb, yb, folds = bc.value
            carr = combos_bc.value
            rows = []
            for pdf_b in batches:
                for cid in pdf_b["combo_id"].to_numpy():
                    combo = tuple(int(v) for v in carr[cid])
                    cells = _cells_for_combo(Xb, combo)
                    # joint (fold, cell) counts for cases and controls
                    idx = folds * n_cells + cells
                    case_fc = np.bincount(
                        idx[yb == 1], minlength=cv * n_cells
                    ).reshape(cv, n_cells)
                    ctrl_fc = np.bincount(
                        idx[yb == 0], minlength=cv * n_cells
                    ).reshape(cv, n_cells)
                    case_tot = case_fc.sum(axis=0)
                    ctrl_tot = ctrl_fc.sum(axis=0)
                    for fold in range(cv):
                        ba = _ba_from_counts(
                            case_tot - case_fc[fold], ctrl_tot - ctrl_fc[fold]
                        )
                        rows.append(
                            {"combo_id": int(cid), "fold": fold, "ba": float(ba)}
                        )
            yield pd.DataFrame(rows, columns=["combo_id", "fold", "ba"])

        bas = combo_df.mapInPandas(
            mapper, schema="combo_id long, fold int, ba double"
        ).toPandas()

        # per-fold argmax with first-index tie-break (np.argmax semantics);
        # BAs kept float64 so the argmax is well-defined at any gap
        fold_best_models: list[tuple[int, ...]] = []
        fold_test_bas: list[float] = []
        for fold in range(cv):
            sub = bas[bas["fold"] == fold].sort_values("combo_id")
            arr = np.full(n_combos, -np.inf, dtype=np.float64)
            arr[sub["combo_id"].to_numpy()] = sub["ba"].to_numpy()
            best_idx = int(np.argmax(arr))
            best_combo = combos[best_idx]
            fold_best_models.append(best_combo)
            # train LUT on train split, evaluate on test split (driver-side)
            train = test_folds != fold
            cells = _cells_for_combo(X, best_combo)
            case = np.bincount(cells[train & (y == 1)], minlength=n_cells)
            ctrl = np.bincount(cells[train & (y == 0)], minlength=n_cells)
            lut = _lut(case, ctrl)
            test = ~train
            y_pred = lut[cells[test]]
            y_test = y[test]
            n_pos = int((y_test == 1).sum())
            n_neg = int((y_test == 0).sum())
            tp = int(((y_test == 1) & (y_pred == 1)).sum())
            tn = int(((y_test == 0) & (y_pred == 0)).sum())
            sens = tp / n_pos if n_pos else 0
            spec = tn / n_neg if n_neg else 0
            fold_test_bas.append((sens + spec) / 2.0)

        counts = Counter(fold_best_models)
        max_cvc = counts.most_common(1)[0][1]
        top_models = [m for m, c in counts.items() if c == max_cvc]
        best_model, best_avg_ba = None, -1.0
        for model in top_models:
            vals = [
                fold_test_bas[i]
                for i, m in enumerate(fold_best_models)
                if m == model
            ]
            avg = float(np.mean(vals))
            if avg > best_avg_ba:
                best_avg_ba, best_model = avg, model

        self.best_interaction_ = best_model
        self.best_cvc_ = max_cvc
        self.best_mean_testing_ba_ = best_avg_ba
        cells = _cells_for_combo(X, best_model)
        case = np.bincount(cells[y == 1], minlength=n_cells)
        ctrl = np.bincount(cells[y == 0], minlength=n_cells)
        self.best_model_lookup_table_ = _lut(case, ctrl)
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        """Broadcast-LUT prediction, fully distributed (mapInPandas)."""
        if not hasattr(self, "best_interaction_"):
            raise RuntimeError("MDRClassifier is not fitted")
        lut = self.best_model_lookup_table_
        combo_cols = [self.feature_cols_[i] for i in self.best_interaction_]

        def pred(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                X = pdf[combo_cols].to_numpy().astype(np.int64)
                cell = np.zeros(len(X), dtype=np.int64)
                for j in range(X.shape[1]):
                    cell = cell * 3 + X[:, j]
                out = pdf.copy()
                out["prediction"] = lut[cell].astype(np.int32)
                yield out

        schema_str = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        )
        return df.mapInPandas(pred, schema=f"{schema_str}, prediction int")

    def transform(self, df: DataFrame) -> DataFrame:
        """Project to the winning interaction's columns — the reference's
        ``X[:, best_interaction_]`` (MDR.py:336-344)."""
        if not hasattr(self, "best_interaction_"):
            raise RuntimeError("MDRClassifier is not fitted")
        return df.select(*[self.feature_cols_[i] for i in self.best_interaction_])
