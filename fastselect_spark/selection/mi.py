"""Distributed discrete mutual information (reference O6/O7/O12,
/root/reference/src/fast_select/mutual_information.py:117-196, mRMR.py:9-27).

Strategy (SURVEY.md §2.2 O7): ONE vectorized pass over the data builds, per
partition, integer joint-count histograms for every (feature, label) pair and
every (feature_i, feature_j) i<j pair — ``np.bincount`` on fused codes inside
Arrow batches — merged by the tree reduction in ``_agg.py``. Because the
accumulators are exact integer counts, the merged histograms (and therefore
the MI values) are bit-identical regardless of partitioning. MI arithmetic
runs on the driver over the tiny merged tables with the reference's exact
eps placement.

Encoding mirrors the reference's shared X∪y vocabulary
(mRMR.py:90, ``np.searchsorted``): a global distinct-union is collected once
(``collect_set`` per column — bounded by cardinality, not rows) and
broadcast into the kernel closure.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.selection._agg import tree_reduce_ndarrays
from fastselect_spark.selection._stats import mi_from_contingency

MAX_STATES = 512


def shared_vocabulary(
    df: DataFrame, cols: list[str]
) -> np.ndarray:
    """Sorted global distinct-union of all values in ``cols`` (the
    reference's ``np.unique(concat(unique(X), unique(y)))``, mRMR.py:90)."""
    row = df.agg(
        *[F.collect_set(F.col(c).cast("double")).alias(c) for c in cols]
    ).collect()[0]
    vals = np.unique(np.concatenate([np.asarray(row[c], dtype=np.float64) for c in cols]))
    return vals


def _pair_index(p: int) -> list[tuple[int, int]]:
    return [(i, j) for i in range(p) for j in range(i + 1, p)]


def mi_matrices(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    unit: str = "bit",
    vocab: np.ndarray | None = None,
    compute_redundancy: bool = True,
    impl: str = "auto",
) -> tuple[np.ndarray, np.ndarray]:
    """Return (relevance[p], redundancy[p, p]) in the requested unit.

    relevance[f] = I(X_f; y); redundancy[i, j] = I(X_i; X_j), symmetric,
    zero diagonal — matching ``calculate_mi_matrices``
    (mutual_information.py:158-196).

    ``impl``: 'cube' = ONE ``groupBy(all code columns).count()`` over the
    data + driver marginalization of the tiny cube (works for ANY value
    domain — the shared vocabulary is derived from the cube itself, so no
    second data pass is ever made); 'arrow' = the vectorized treeAggregate
    kernel; 'sql' = pure-JVM melt + hash aggregation (requires a contiguous
    0..k-1 integer code domain). 'auto' = cube, falling back to sql/arrow
    only when the joint cube exceeds ~2M cells. All three produce identical
    integer contingency tables.
    """
    p = len(feature_cols)
    cols = list(feature_cols) + [label_col]
    pairs = _pair_index(p) if compute_redundancy else []

    if impl in ("auto", "cube"):
        res = _mi_matrices_cube(df, feature_cols, label_col, unit, pairs, p, vocab)
        if res is not None:
            return res
        impl = "fallback"  # cube too large -> melt / arrow below

    if vocab is None:
        vocab = shared_vocabulary(df, cols)
    k = len(vocab)
    if k > MAX_STATES:
        raise ValueError(
            f"shared vocabulary has {k} states (> {MAX_STATES}); "
            "discretize/bin continuous features before MI scoring"
        )
    vocab = np.asarray(vocab, dtype=np.float64)
    coded = bool(
        k > 0 and vocab[0] == 0.0 and vocab[-1] == k - 1 and np.all(np.diff(vocab) == 1.0)
    )
    if impl == "fallback":
        impl = "sql" if coded else "arrow"
    if impl == "sql":
        if not coded:
            raise ValueError("impl='sql' requires contiguous 0..k-1 integer codes")
        return _mi_matrices_sql(df, feature_cols, label_col, unit, k, pairs, p)

    # Arrow treeAggregate kernel. Fast path: a contiguous 0..k-1 integer
    # vocabulary means the values ARE the codes — skip the float64
    # conversion + searchsorted per batch.
    already_coded = coded
    cast_type = "long" if already_coded else "double"
    proj = df.select(*[F.col(c).cast(cast_type) for c in cols])

    def partial(batches: Iterator[pd.DataFrame]) -> dict[str, np.ndarray]:
        rel = np.zeros((p, k, k), dtype=np.int64)
        red = np.zeros((len(pairs), k, k), dtype=np.int64) if pairs else None
        for pdf in batches:
            if pdf.empty:
                continue
            if already_coded:
                codes = pdf.to_numpy(dtype=np.int64)
            else:
                codes = np.searchsorted(vocab, pdf.to_numpy(dtype=np.float64))
            y = codes[:, p]
            kk = k * k
            # np.bincount on fused codes is ~10x faster than np.add.at
            for f in range(p):
                rel[f] += np.bincount(
                    codes[:, f] * k + y, minlength=kk
                ).reshape(k, k)
            for idx, (i, j) in enumerate(pairs):
                red[idx] += np.bincount(
                    codes[:, i] * k + codes[:, j], minlength=kk
                ).reshape(k, k)
        out = {"rel": rel}
        if red is not None:
            out["red"] = red
        return out

    merged = tree_reduce_ndarrays(proj, partial)
    rel_tables = merged["rel"]
    relevance = np.array(
        [mi_from_contingency(rel_tables[f], unit=unit) for f in range(p)]
    )
    redundancy = np.zeros((p, p), dtype=np.float64)
    if pairs:
        red_tables = merged["red"]
        for idx, (i, j) in enumerate(pairs):
            mi = mi_from_contingency(red_tables[idx], unit=unit)
            redundancy[i, j] = mi
            redundancy[j, i] = mi
    return relevance, redundancy


_CUBE_CELL_CAP = 2_000_000


def _mi_matrices_cube(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    unit: str,
    pairs: list[tuple[int, int]],
    p: int,
    vocab: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Cheapest contingency build when the joint value cube is small: ONE
    ``groupBy(all code columns).count()`` over the data (a single partial+
    final hash aggregation — the same shape and cost as chi2), then every
    relevance/redundancy table is a weighted-bincount MARGINALIZATION of the
    tiny cube on the driver. The shared X∪y vocabulary (mRMR.py:90) is
    derived FROM the cube — it holds every distinct value — so this path
    makes exactly one pass over the data (a separate collect_set vocabulary
    scan measured ~18s of a 21s MI stage on a 40M-row input). Returns None
    when the cube exceeds the cap (caller falls back to melt/arrow).

    Arrow toPandas, not collect(): Row materialization + a Python listcomp
    over a large cube is a driver-serial hit that caps scaling efficiency.
    """
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
    # the cube groups on double-cast codes: integers above 2^53 are not
    # exactly representable and would SILENTLY collide in the groupBy —
    # refuse rather than mis-count (CLAUDE.md ANSI/precision rule)
    if len(raw) and np.nanmax(np.abs(raw)) >= 2.0**53:
        raise ValueError(
            "feature/label codes with |value| >= 2^53 lose integer "
            "precision in the double-cast cube groupBy and can collide; "
            "re-encode codes into a smaller domain first"
        )
    if vocab is None:
        vocab = np.unique(raw)
    else:
        vocab = np.asarray(vocab, dtype=np.float64)
        if not np.isin(raw.ravel(), vocab).all():
            raise ValueError(
                "caller-supplied vocab does not cover all observed values; "
                "searchsorted would silently mis-bin them"
            )
    k = len(vocab)
    if k > MAX_STATES:
        raise ValueError(
            f"shared vocabulary has {k} states (> {MAX_STATES}); "
            "discretize/bin continuous features before MI scoring"
        )
    codes = np.searchsorted(vocab, raw)
    y = codes[:, p]
    kk = k * k
    relevance = np.empty(p, dtype=np.float64)
    for f in range(p):
        table = np.bincount(
            codes[:, f] * k + y, weights=counts, minlength=kk
        ).reshape(k, k)
        relevance[f] = mi_from_contingency(table, unit=unit)
    redundancy = np.zeros((p, p), dtype=np.float64)
    for i, j in pairs:
        table = np.bincount(
            codes[:, i] * k + codes[:, j], weights=counts, minlength=kk
        ).reshape(k, k)
        mi = mi_from_contingency(table, unit=unit)
        redundancy[i, j] = mi
        redundancy[j, i] = mi
    return relevance, redundancy


def _mi_matrices_sql(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    unit: str,
    k: int,
    pairs: list[tuple[int, int]],
    p: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Pure-JVM contingency build: every (feature, y) and (i, j) pair gets a
    slot; rows are melted to (slot, fused_code) with ``explode`` and counted
    by ONE hash aggregation (partial+final, whole-stage codegen, zero Python
    in the data path). Output is <= n_slots * k^2 tiny rows."""
    y = F.col(label_col).cast("long")
    slots = []
    for f, c in enumerate(feature_cols):
        slots.append(
            F.struct(
                F.lit(f).alias("slot"),
                (F.col(c).cast("long") * k + y).alias("code"),
            )
        )
    for idx, (i, j) in enumerate(pairs):
        slots.append(
            F.struct(
                F.lit(p + idx).alias("slot"),
                (
                    F.col(feature_cols[i]).cast("long") * k
                    + F.col(feature_cols[j]).cast("long")
                ).alias("code"),
            )
        )
    melted = df.select(F.explode(F.array(*slots)).alias("x")).select(
        F.col("x.slot").alias("slot"), F.col("x.code").alias("code")
    )
    rows = melted.groupBy("slot", "code").count().collect()
    tables = np.zeros((p + len(pairs), k, k), dtype=np.int64)
    for r in rows:
        s, code = int(r["slot"]), int(r["code"])
        tables[s, code // k, code % k] = r["count"]
    relevance = np.array(
        [mi_from_contingency(tables[f], unit=unit) for f in range(p)]
    )
    redundancy = np.zeros((p, p), dtype=np.float64)
    for idx, (i, j) in enumerate(pairs):
        mi = mi_from_contingency(tables[p + idx], unit=unit)
        redundancy[i, j] = mi
        redundancy[j, i] = mi
    return relevance, redundancy


def mi_pair(
    df: DataFrame, col_a: str, col_b: str, unit: str = "bit"
) -> float:
    """I(a;b) for two discrete columns via one ``groupBy(a, b).count()`` —
    the pure-relational form of ``calculate_mi_single_pair``
    (mutual_information.py:117-155)."""
    rows = (
        df.groupBy(
            F.col(col_a).cast("double").alias("__a"),
            F.col(col_b).cast("double").alias("__b"),
        )
        .count()
        .collect()
    )
    a_vals = sorted({r["__a"] for r in rows})
    b_vals = sorted({r["__b"] for r in rows})
    ai = {v: i for i, v in enumerate(a_vals)}
    bi = {v: i for i, v in enumerate(b_vals)}
    table = np.zeros((len(a_vals), len(b_vals)), dtype=np.float64)
    for r in rows:
        table[ai[r["__a"]], bi[r["__b"]]] = r["count"]
    return mi_from_contingency(table, unit=unit)


def gain_ratio(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    unit: str = "bit",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ig[p], split_info[p], ratio[p]) — Quinlan's C4.5 gain ratio.

    IG(f) = I(X_f; Y) (identical semantics to the :func:`mi_matrices`
    relevance column); split information = H(X_f) over the feature's
    value marginal; ratio = IG / H(X_f), with Quinlan's guard ratio = 0
    for constant features (H == 0). ONE ``groupBy(all code columns)
    .count()`` cube marginalized driver-side — the scores_from_cube
    shape: the aggregation is bounded by the code-space product, never
    the row count, so no extra cluster work beyond the cube every other
    information scorer already shares."""
    cols = list(feature_cols) + [label_col]
    p = len(feature_cols)
    pdf = (
        df.groupBy(*[F.col(c).cast("double").alias(c) for c in cols])
        .count()
        .toPandas()
    )
    raw = pdf[cols].to_numpy(dtype=np.float64)
    counts = pdf["count"].to_numpy(dtype=np.int64)
    n = float(counts.sum())
    vocab = np.unique(raw)
    k = len(vocab)
    codes = np.searchsorted(vocab, raw)
    y = codes[:, p]
    kk = k * k
    log_base = np.log(2.0) if unit == "bit" else 1.0
    ig = np.empty(p, dtype=np.float64)
    si = np.empty(p, dtype=np.float64)
    for f in range(p):
        table = (
            np.bincount(codes[:, f] * k + y, weights=counts, minlength=kk)
            .reshape(k, k)
        )
        ig[f] = mi_from_contingency(table, unit=unit)
        marg = table.sum(axis=1)
        px = marg[marg > 0] / n
        si[f] = float(-(px * np.log(px)).sum() / log_base)
    ratio = np.where(si > 0, ig / np.where(si > 0, si, 1.0), 0.0)
    return ig, si, ratio


def oner_scores(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
) -> DataFrame:
    """OneR (Holte 1993) univariate rule accuracy — the simplest honest
    baseline filter: each feature's score is the training accuracy of the
    one-feature majority-class rule ``predict(x) = argmax_y n(x, y)``.
    Classic sanity check next to the information scorers (a feature with
    high MI but OneR accuracy at the class prior is interaction-only).

    The shared-cube discipline (scores_from_cube / gain_ratio): ONE
    ``groupBy(all code columns).count()`` cube, marginalized driver-side —
    per feature, n_correct = Σ_x max_y n(x, y). Counts are exact
    integers; the single float op is the accuracy quotient
    ``n_correct / n``, so the SQL oracle (per-feature GROUP BY + MAX +
    SUM) is bit-identical before engine-side rounding.

    Returns (feature, n_correct:bigint, n:bigint, oner_accuracy:double).
    NULL codes participate as their own level (cast to string keys
    driver-side), matching categorical_associations."""
    spark = df.sparkSession
    cols = list(feature_cols) + [label_col]
    cube = (
        df.groupBy(*[F.col(c).cast("long").alias(c) for c in cols])
        .count()
        .collect()
    )
    n = sum(int(r["count"]) for r in cube)
    out = []
    for f in feature_cols:
        best: dict = {}
        for r in cube:
            k = (r[f], r[label_col])
            best[k] = best.get(k, 0) + int(r["count"])
        per_value: dict = {}
        for (vx, _vy), c in best.items():
            per_value[vx] = max(per_value.get(vx, 0), c)
        n_correct = sum(per_value.values())
        out.append((f, n_correct, n, n_correct / float(n) if n else None))
    return spark.createDataFrame(
        out,
        schema=(
            "feature string, n_correct bigint, n bigint, "
            "oner_accuracy double"
        ),
    )
