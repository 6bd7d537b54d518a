"""Wide-matrix (array-column) scorer mode.

The reference's published benchmarks run at feature counts no DataFrame
column layout can express (chi2 at p=200,000, benchmarking/testing.py:10-13;
mRMR at p=5,000, benchmarking_mrmr.py:15-18) — Catalyst analysis cost grows
with column count, so beyond a few hundred features the engine switches to
ONE ``array<double>`` column holding the feature vector. Two distribution
axes, matching how the work actually scales:

- **Row-parallel** (any n, p up to millions): sufficient statistics whose
  size is independent of n — the chi2 observed matrix ``(K, p)`` and the MI
  relevance histograms ``(p, k, k)`` — accumulated per partition in NumPy
  (vectorized scatter-adds over Arrow batches) and merged by the tree
  reduction in ``_agg.py``. This is the reference's single-pass kernel
  (Chi2.py:7-22, mutual_information.py:49-55) re-expressed as a
  partition-parallel reduction.
- **Pair-parallel** (the reference benchmark regime: n bounded, p large):
  the p×p MI redundancy matrix needs a contingency per feature PAIR —
  p(p−1)/2 of them — so the coded matrix is broadcast once and tasks own
  contiguous pair ranges (SURVEY.md §3.2 "pair-chunked job"; the distributed
  equivalent of the reference's ``prange`` over pairs,
  mutual_information.py:56-63). Accumulator-free: each task emits only its
  pairs' MI floats.

Numeric semantics are identical to the narrow-column scorers (shared X∪y
vocabulary per mRMR.py:90, eps placement per mutual_information.py:40-45,
chi2 zero-sum/expected guards per Chi2.py:24-47).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastselect_spark.selection._agg import (
    bounded_arrow_batches,
    list_matrix_view,
    tree_reduce_ndarrays_arrow,
)
from fastselect_spark.selection._stats import (
    chi2_sf,
    chi2_stats_from_observed,
    mi_from_contingency,
)
from fastselect_spark.selection.mrmr import mrmr_greedy

MAX_STATES = 512
# broadcast budget for the step-wise engine's executor-resident coded matrix
MAX_BROADCAST_BYTES = 4 << 30


def matrix_table(
    spark: SparkSession,
    X: np.ndarray,
    y: np.ndarray,
    n_partitions: int | None = None,
) -> DataFrame:
    """Distribute a NumPy (X, y) pair as ``(id long, features array<double>,
    y double)`` rows — the wide-matrix representation used by benches/tests."""
    n = len(y)
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 2)
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "features": [row for row in np.asarray(X, dtype=np.float64)],
            "y": np.asarray(y, dtype=np.float64),
        }
    )
    return spark.createDataFrame(
        pdf, schema="id long, features array<double>, y double"
    ).repartition(n_partitions)


def _classes_of(df: DataFrame, label_col: str) -> np.ndarray:
    rows = df.select(F.col(label_col).cast("double")).distinct().collect()
    return np.sort(np.array([r[0] for r in rows], dtype=np.float64))


def chi2_matrix(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "y",
    validate: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """chi2 over an array-column feature matrix: ONE row-parallel pass
    accumulating the value-weighted observed matrix (K, p) + class counts;
    driver finalization identical to the narrow-column scorer."""
    classes = _classes_of(df, label_col)
    n_classes = len(classes)
    proj = df.select(
        F.col(features_col).alias("features"),
        F.col(label_col).cast("double").alias("y"),
    )

    def partial(batches) -> dict[str, np.ndarray]:
        # Arrow-flat kernel (round-5): X is a ZERO-COPY view over the list
        # column's values buffer — no np.stack 100 MB copy per batch (the
        # round-4 3x within-session drift was allocator churn from exactly
        # those temporaries). Per-class sums are one small one-hot gemm per
        # ~1 MB column chunk, so peak temporary stays cache-sized.
        obs = None
        cnt = np.zeros(n_classes, dtype=np.float64)
        neg = 0.0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            Xb, yv = list_matrix_view(batch, "features", "y")
            yb = np.searchsorted(classes, np.asarray(yv, dtype=np.float64))
            nb, p_b = Xb.shape
            if obs is None:
                obs = np.zeros((n_classes, p_b), dtype=np.float64)
            onehot = (yb[:, None] == np.arange(n_classes)[None, :]).astype(
                np.float64
            )
            cnt += onehot.sum(axis=0)
            step = max(1, (1 << 17) // max(1, nb))
            for c0 in range(0, p_b, step):
                blk = Xb[:, c0 : c0 + step]
                obs[:, c0 : c0 + step] += onehot.T @ blk
                if validate and blk.min() < 0:
                    neg += 1.0
        out: dict[str, np.ndarray] = {}
        if obs is not None:
            out["obs"] = obs
            out["cnt"] = cnt
            if validate:
                # min is not sum-mergeable; ship a non-negativity FLAG count
                out["neg"] = np.array([neg])
        return out

    with bounded_arrow_batches(proj, "features"):
        merged = tree_reduce_ndarrays_arrow(proj, partial)
    if "obs" not in merged:
        raise ValueError("chi2_matrix: input DataFrame is empty")
    if validate and merged.get("neg", np.zeros(1))[0] > 0:
        raise ValueError("Input matrix X must contain non-negative values.")
    p = merged["obs"].shape[1]
    if n_classes < 2:
        return np.zeros(p, dtype=np.float64), np.ones(p, dtype=np.float64)
    class_freqs = merged["cnt"]
    stats = chi2_stats_from_observed(merged["obs"], class_freqs, class_freqs.sum())
    return stats, chi2_sf(stats, dof=n_classes - 1)


def fisher_matrix(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "y",
) -> np.ndarray:
    """Fisher score over an array-column matrix: one row-parallel pass
    accumulating per-class (count, sum, sum-of-squares) per feature —
    identical finalization semantics to selection/fisher.py (between-class
    variance over pooled within-class population variance; +inf on
    zero-within with differing means, 0 when constant)."""
    classes = _classes_of(df, label_col)
    n_classes = len(classes)
    proj = df.select(
        F.col(features_col).alias("features"),
        F.col(label_col).cast("double").alias("y"),
    )

    def partial(batches) -> dict[str, np.ndarray]:
        # Arrow-flat kernel (see chi2_matrix): zero-copy X view + one-hot
        # gemms per ~1 MB column chunk, computing sum and sum-of-squares
        # while the chunk is cache-hot — one effective memory pass (the
        # naive second pass made Fisher ~1.6x chi2 at p=200k; bandwidth,
        # not flops) and no 100 MB np.stack temporaries.
        s = q = None
        cnt = np.zeros(n_classes, dtype=np.float64)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            Xb, yv = list_matrix_view(batch, "features", "y")
            yb = np.searchsorted(classes, np.asarray(yv, dtype=np.float64))
            nb, p_b = Xb.shape
            if s is None:
                s = np.zeros((n_classes, p_b), dtype=np.float64)
                q = np.zeros_like(s)
            onehot = (yb[:, None] == np.arange(n_classes)[None, :]).astype(
                np.float64
            )
            cnt += onehot.sum(axis=0)
            step = max(1, (1 << 17) // max(1, nb))
            for c0 in range(0, p_b, step):
                blk = Xb[:, c0 : c0 + step]
                s[:, c0 : c0 + step] += onehot.T @ blk
                q[:, c0 : c0 + step] += onehot.T @ (blk * blk)
        return {"s": s, "q": q, "cnt": cnt} if s is not None else {}

    with bounded_arrow_batches(proj, "features"):
        merged = tree_reduce_ndarrays_arrow(proj, partial)
    if "s" not in merged:
        raise ValueError("fisher_matrix: input DataFrame is empty")
    s, q, n_c = merged["s"], merged["q"], merged["cnt"]
    p = s.shape[1]
    if n_classes < 2:
        return np.zeros(p, dtype=np.float64)
    n = n_c.sum()
    mu_c = s / n_c[:, None]
    var_c = np.maximum(q / n_c[:, None] - mu_c**2, 0.0)
    mu = s.sum(axis=0) / n
    between = (n_c[:, None] * (mu_c - mu[None, :]) ** 2).sum(axis=0)
    within = (n_c[:, None] * var_c).sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(
            within > 0, between / within, np.where(between > 0, np.inf, 0.0)
        )


def mi_relevance_matrix(
    df: DataFrame,
    n_states: int,
    features_col: str = "features",
    label_col: str = "y",
    unit: str = "bit",
) -> np.ndarray:
    """relevance[f] = I(X_f; y) for every feature of the array column, in one
    row-parallel pass. Input must already be integer codes in
    ``[0, n_states)`` (the reference's `_validate_discrete` contract,
    mutual_information.py:13-22); the accumulator is the full (p, k, k)
    joint-histogram tensor — independent of n, so this scales to any row
    count."""
    if n_states > MAX_STATES:
        raise ValueError(f"n_states {n_states} > {MAX_STATES}")
    k = int(n_states)
    proj = df.select(
        F.col(features_col).alias("features"),
        F.col(label_col).cast("long").alias("y"),
    )

    def partial(batches) -> dict[str, np.ndarray]:
        # Arrow-flat kernel: the int64 cast happens per ~1 MB column chunk
        # of the zero-copy float64 view, never as a whole-batch copy.
        hist = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            Xv, yv = list_matrix_view(batch, "features", "y")
            yb = np.asarray(yv, dtype=np.int64)
            if (yb < 0).any() or (yb >= k).any():
                raise ValueError("codes out of [0, n_states) for MI relevance")
            nb, p = Xv.shape
            if hist is None:
                hist = np.zeros((p, k * k), dtype=np.int64)
            step = max(1, (1 << 17) // max(1, nb))
            for c0 in range(0, p, step):
                Xb = Xv[:, c0 : c0 + step].astype(np.int64)
                if (Xb < 0).any() or (Xb >= k).any():
                    raise ValueError("codes out of [0, n_states) for MI relevance")
                fused = Xb * k + yb[:, None]  # (nb, chunk)
                # one bincount per feature over fused codes (CLAUDE.md:
                # bincount beats np.add.at ~10x on fused codes)
                for f in range(fused.shape[1]):
                    hist[c0 + f] += np.bincount(fused[:, f], minlength=k * k)
        return {"hist": hist} if hist is not None else {}

    with bounded_arrow_batches(proj, "features"):
        merged = tree_reduce_ndarrays_arrow(proj, partial)
    if "hist" not in merged:
        raise ValueError("mi_relevance_matrix: input DataFrame is empty")
    hist = merged["hist"]
    p = hist.shape[0]
    return np.array(
        [mi_from_contingency(hist[f].reshape(k, k), unit=unit) for f in range(p)]
    )


def _pair_mi_block(Xt, ym, P, k, log_base):
    """Vectorized MI for a block of pairs over the SHARED 0..k-1 code space.

    ``Xt`` is the transposed (p, n) coded matrix, ``P`` an (m, 2) int64 pair
    array; a second index of -1 means "the label" (relevance pair). Returns
    the (m,) MI vector. This is the ONE kernel both the full p×p path
    (:func:`mi_matrices_broadcast`) and the step-wise greedy engine
    (:class:`BroadcastMIEngine`) call, so lazy columns are bit-identical to
    full-matrix columns by construction."""
    m = len(P)
    kk = k * k
    eps = 1e-12
    A = Xt[P[:, 0]]  # (m, n) contiguous row gather
    B = np.empty_like(A)
    feat = P[:, 1] >= 0
    if feat.any():
        B[feat] = Xt[P[feat, 1]]
    if (~feat).any():
        B[~feat] = ym[None, :]
    fused = A * k + B  # (m, n)
    flat = (np.arange(m, dtype=np.int64)[:, None] * kk + fused).ravel()
    T = np.bincount(flat, minlength=m * kk).reshape(m, k, k).astype(np.float64)
    n_rows = Xt.shape[1]
    Pm = T / n_rows
    px = Pm.sum(axis=2, keepdims=True)
    py = Pm.sum(axis=1, keepdims=True)
    denom = px * py + eps
    mask = Pm > eps
    contrib = np.zeros_like(Pm)
    np.log(np.where(mask, Pm / denom, 1.0), out=contrib, where=mask)
    return (Pm * contrib).sum(axis=(1, 2)) / log_base


def _joint_mi_block(Xt, ym, P, k, log_base):
    """Vectorized I((X_i, X_j); Y) for a block of pairs — the JMI/CMIM
    statistic (Yang & Moody 1999). The fused (x_i, x_j) pair state is one
    axis (k² states in the shared code space), the label the other; the MI
    formula is then identical in shape to :func:`_pair_mi_block`'s."""
    m = len(P)
    kky = k * k * k
    eps = 1e-12
    A = Xt[P[:, 0]]
    B = Xt[P[:, 1]]
    fused = (A * k + B) * k + ym[None, :]  # (m, n) triple code
    flat = (np.arange(m, dtype=np.int64)[:, None] * kky + fused).ravel()
    T = (
        np.bincount(flat, minlength=m * kky)
        .reshape(m, k * k, k)
        .astype(np.float64)
    )
    n_rows = Xt.shape[1]
    Pm = T / n_rows
    px = Pm.sum(axis=2, keepdims=True)
    py = Pm.sum(axis=1, keepdims=True)
    denom = px * py + eps
    mask = Pm > eps
    contrib = np.zeros_like(Pm)
    np.log(np.where(mask, Pm / denom, 1.0), out=contrib, where=mask)
    return (Pm * contrib).sum(axis=(1, 2)) / log_base


def mi_matrices_broadcast(
    spark: SparkSession,
    X_codes: np.ndarray,
    y_codes: np.ndarray,
    unit: str = "bit",
    compute_redundancy: bool = True,
    chunks_per_core: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """(relevance[p], redundancy[p, p]) by broadcasting the coded matrix and
    distributing PAIR ranges across tasks — the reference-benchmark regime
    (n bounded, p large; p(p−1)/2 contingencies). Codes must be a shared
    0..k-1 integer space (use :func:`encode_shared` first)."""
    X_codes = np.ascontiguousarray(np.asarray(X_codes, dtype=np.int64))
    y_codes = np.asarray(y_codes, dtype=np.int64)
    n, p = X_codes.shape
    k = int(max(X_codes.max(initial=0), y_codes.max(initial=0))) + 1
    if k > MAX_STATES:
        raise ValueError(f"shared code space has {k} states (> {MAX_STATES})")

    n_red = p * (p - 1) // 2 if compute_redundancy else 0
    n_pairs = p + n_red

    sc = spark.sparkContext
    # broadcast TRANSPOSED (p, n): a pair gather is then two contiguous row
    # copies instead of a strided column walk (one cache miss per element —
    # measured ~10x slower at p=5000)
    bc_X = sc.broadcast(np.ascontiguousarray(X_codes.T))
    bc_y = sc.broadcast(y_codes)
    kk = k * k

    def _decode(t: np.ndarray) -> np.ndarray:
        """Global pair index -> (i, j) rows; indices < p are the relevance
        pairs (i, -1), the rest walk the upper triangle row-major. Derived
        arithmetically so no O(p^2) pair table is ever built or broadcast."""
        out = np.empty((len(t), 2), dtype=np.int64)
        rel = t < p
        out[rel, 0] = t[rel]
        out[rel, 1] = -1
        r = t[~rel] - p
        if len(r):
            b = 2 * p - 1
            i = ((b - np.sqrt(b * b - 8.0 * r)) // 2).astype(np.int64)
            start = i * (2 * p - i - 1) // 2
            # float-precision fixups
            over = start > r
            i[over] -= 1
            start[over] = i[over] * (2 * p - i[over] - 1) // 2
            nxt = (i + 1) * (2 * p - i - 2) // 2
            under = nxt <= r
            i[under] += 1
            start[under] = i[under] * (2 * p - i[under] - 1) // 2
            out[~rel, 0] = i
            out[~rel, 1] = r - start + i + 1
        return out

    # pairs per inner block: keep every temp (~n*block int64) around 1MB so
    # 32 concurrent workers stay inside their malloc arenas — large blocks
    # mmap/munmap tens of MB per block and page-fault churn across processes
    # measured 5-8x slower than the same kernel single-process
    block = max(1, (1 << 14) // kk * max(1, 1000 // max(1, X_codes.shape[0])))
    log_base = np.log(2.0) if unit == "bit" else 1.0

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Xm, ym = bc_X.value, bc_y.value
        for pdf in batches:
            if pdf.empty:
                continue
            idx = pdf["id"].to_numpy(dtype=np.int64)
            out = np.empty(len(idx), dtype=np.float64)
            for s in range(0, len(idx), block):
                sub = idx[s : s + block]
                out[s : s + block] = _pair_mi_block(Xm, ym, _decode(sub), k, log_base)
            yield pd.DataFrame({"id": idx, "mi": out})

    # native range partitioning: contiguous id splits are perfectly balanced
    # (pair cost is homogeneous) and skip repartition's round-robin Exchange
    n_chunks = min(n_pairs, max(sc.defaultParallelism * chunks_per_core, 2))
    res = (
        spark.range(0, n_pairs, 1, n_chunks)
        .mapInPandas(kernel, schema="id long, mi double")
        .toPandas()
    )
    mi = np.zeros(n_pairs, dtype=np.float64)
    mi[res["id"].to_numpy(dtype=np.int64)] = res["mi"].to_numpy(dtype=np.float64)

    relevance = mi[:p].copy()
    redundancy = np.zeros((p, p), dtype=np.float64)
    if compute_redundancy:
        iu, ju = np.triu_indices(p, k=1)
        redundancy[iu, ju] = mi[p:]
        redundancy[ju, iu] = mi[p:]
    bc_X.destroy()
    bc_y.destroy()
    return relevance, redundancy


def encode_shared(X: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dense-encode X and y against the sorted shared X∪y vocabulary —
    exactly the reference's `_encode_data_numba` + np.unique composition
    (mRMR.py:9-27, 90)."""
    vocab = np.unique(np.concatenate([np.unique(X), np.unique(y)]))
    return (
        np.searchsorted(vocab, X).astype(np.int64),
        np.searchsorted(vocab, y).astype(np.int64),
        vocab,
    )


class BroadcastMIEngine:
    """Broadcast-once, score-on-demand MI engine for step-wise greedy
    selection at large p.

    Greedy selectors (mRMR, JMI, CMIM) never need the full p×p pair
    statistics — each step only scores the remaining candidates against the
    feature just selected, so the whole selection touches O(p·K) pairs, not
    O(p²). This engine broadcasts the transposed coded matrix ONCE and runs
    one pair-parallel job per requested column; columns are bit-identical to
    the full-matrix path because both call the same block kernels
    (:func:`_pair_mi_block` / :func:`_joint_mi_block`).

    At the reference's mRMR benchmark config (n=1000, p=5000, K=10) this
    replaces 12.5M pair contingencies with ~50k."""

    def __init__(
        self,
        spark: SparkSession,
        X_codes: np.ndarray,
        y_codes: np.ndarray,
        unit: str = "bit",
        chunks_per_core: int = 1,
    ) -> None:
        X_codes = np.ascontiguousarray(np.asarray(X_codes, dtype=np.int64))
        y_codes = np.asarray(y_codes, dtype=np.int64)
        self.n, self.p = X_codes.shape
        self.k = int(max(X_codes.max(initial=0), y_codes.max(initial=0))) + 1
        if self.k > MAX_STATES:
            raise ValueError(
                f"shared code space has {self.k} states (> {MAX_STATES})"
            )
        # wide-matrix regime contract: the coded matrix is broadcast once
        # to every executor. Refuse clearly past the budget instead of
        # letting the JVM OOM mid-broadcast — at that size the row-parallel
        # path (mi_relevance_matrix) or the DataFrame cube selectors are
        # the right tool, not a driver-resident matrix.
        if X_codes.nbytes > MAX_BROADCAST_BYTES:
            raise ValueError(
                f"coded matrix is {X_codes.nbytes / (1 << 30):.1f} GiB "
                f"(> {MAX_BROADCAST_BYTES / (1 << 30):.0f} GiB); the "
                "broadcast step-wise engine is for the wide-matrix "
                "regime (n bounded). Use mi_relevance_matrix / the "
                "DataFrame selectors for row-scale inputs."
            )
        self.spark = spark
        self.unit = unit
        self.log_base = np.log(2.0) if unit == "bit" else 1.0
        self.chunks_per_core = chunks_per_core
        sc = spark.sparkContext
        self._bc_X = sc.broadcast(np.ascontiguousarray(X_codes.T))
        self._bc_y = sc.broadcast(y_codes)

    def job_frame(self, pairs: np.ndarray, joint: bool):
        """Build (without executing) one pair-parallel step job. Returns
        (DataFrame, pair_broadcast) — exposed separately from :meth:`_run`
        so tools/explain_audit.py can assert the physical plan stays
        Exchange-free (the per-step cost claim rests on that)."""
        pairs = np.ascontiguousarray(np.asarray(pairs, dtype=np.int64))
        m = len(pairs)
        sc = self.spark.sparkContext
        bc_P = sc.broadcast(pairs)
        k, n, log_base = self.k, self.n, self.log_base
        # same ~1MB-temp sizing rule as mi_matrices_broadcast; the joint
        # kernel's contingency is k× larger (k²·k cells per pair)
        cells = k * k * (k if joint else 1)
        block = max(1, (1 << 14) // cells * max(1, 1000 // max(1, n)))
        fn = _joint_mi_block if joint else _pair_mi_block
        bc_X, bc_y = self._bc_X, self._bc_y

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            Xm, ym, Pall = bc_X.value, bc_y.value, bc_P.value
            for pdf in batches:
                if pdf.empty:
                    continue
                idx = pdf["id"].to_numpy(dtype=np.int64)
                out = np.empty(len(idx), dtype=np.float64)
                for s in range(0, len(idx), block):
                    sub = idx[s : s + block]
                    out[s : s + block] = fn(Xm, ym, Pall[sub], k, log_base)
                yield pd.DataFrame({"id": idx, "mi": out})

        # native range partitioning — pair cost is homogeneous, so contiguous
        # splits balance perfectly and skipping repartition's Exchange takes a
        # greedy step from 3.5 s to 0.41 s measured (the shuffle + extra task
        # wave was ~90% of each step job at p=5000)
        n_chunks = min(
            m, max(sc.defaultParallelism * self.chunks_per_core, 2)
        )
        frame = self.spark.range(0, m, 1, n_chunks).mapInPandas(
            kernel, schema="id long, mi double"
        )
        return frame, bc_P

    def _run(self, pairs: np.ndarray, joint: bool) -> np.ndarray:
        """One pair-parallel job over an explicit (m, 2) pair list."""
        m = len(pairs)
        if m == 0:
            return np.zeros(0, dtype=np.float64)
        frame, bc_P = self.job_frame(pairs, joint)
        res = frame.toPandas()
        out = np.zeros(m, dtype=np.float64)
        out[res["id"].to_numpy(dtype=np.int64)] = res["mi"].to_numpy(
            dtype=np.float64
        )
        bc_P.destroy()
        return out

    def relevance(self) -> np.ndarray:
        """I(X_f; Y) for every feature — one job, p pairs."""
        pairs = np.stack(
            [np.arange(self.p, dtype=np.int64), np.full(self.p, -1, np.int64)],
            axis=1,
        )
        return self._run(pairs, joint=False)

    @staticmethod
    def _canonical(s: int, cand: np.ndarray) -> np.ndarray:
        """(min, max) pair orientation — MI is symmetric in exact math, but
        the full-matrix path builds every (i, j) table with i < j; matching
        the orientation keeps lazy columns BIT-identical to full columns
        (a transposed contingency sums in a different order: ~1 ulp)."""
        cand = np.asarray(cand, dtype=np.int64)
        other = np.full(len(cand), s, np.int64)
        return np.stack(
            [np.minimum(cand, other), np.maximum(cand, other)], axis=1
        )

    def mi_column(self, s: int, cand: np.ndarray) -> np.ndarray:
        """I(X_f; X_s) for f in ``cand`` (mRMR redundancy column)."""
        return self._run(self._canonical(s, cand), joint=False)

    def joint_mi_column(self, s: int, cand: np.ndarray) -> np.ndarray:
        """I((X_f, X_s); Y) for f in ``cand`` (JMI/CMIM column)."""
        return self._run(self._canonical(s, cand), joint=True)

    def close(self) -> None:
        self._bc_X.destroy()
        self._bc_y.destroy()


# above this many feature pairs the full p×p redundancy matrix costs more
# kernel time than K step-wise columns plus K job round-trips (~0.1-0.3 s
# each on warm workers) — measured crossover is well below 2M pairs at the
# bench configs, but the full path keeps its exact-matrix return contract
_STEPWISE_PAIR_THRESHOLD = 2_000_000


def mrmr_select_matrix(
    spark: SparkSession,
    X: np.ndarray,
    y: np.ndarray,
    n_select: int,
    method: str = "MID",
    unit: str = "bit",
    strategy: str = "auto",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """mRMR at the reference's benchmark scale: shared-vocabulary encode,
    pair-parallel MI, driver greedy loop (mRMR.py:102-131 exact semantics).
    Returns (selected_idx, relevance, redundancy).

    ``strategy``: ``'full'`` materializes the p×p redundancy matrix in one
    job; ``'stepwise'`` computes only the O(p·K) candidate-vs-selected
    columns (bit-identical selection — same kernel, and the greedy loop
    never reads any other entry); ``'auto'`` picks stepwise once p(p-1)/2
    exceeds 2M pairs. Stepwise returns a PARTIAL redundancy matrix: only
    the computed (candidate, selected) columns are filled, all other
    entries are 0."""
    p = X.shape[1]
    if strategy == "auto":
        strategy = (
            "stepwise" if p * (p - 1) // 2 > _STEPWISE_PAIR_THRESHOLD else "full"
        )
    if strategy == "full":
        Xc, yc, _ = encode_shared(X, y)
        relevance, redundancy = mi_matrices_broadcast(spark, Xc, yc, unit=unit)
        picked = mrmr_greedy(relevance, redundancy, n_select, method)
        return picked, relevance, redundancy
    if strategy != "stepwise":
        raise ValueError("strategy must be 'auto', 'full' or 'stepwise'")

    if not (0 < n_select <= p):
        raise ValueError(
            "n_features_to_select must be a positive integer less "
            "than or equal to the number of features."
        )
    Xc, yc, _ = encode_shared(X, y)
    engine = BroadcastMIEngine(spark, Xc, yc, unit=unit)
    try:
        relevance = engine.relevance()
        selected = np.zeros(n_select, dtype=np.int32)
        remaining = np.ones(p, dtype=bool)
        redundancy = np.zeros((p, p), dtype=np.float64)
        red_sum = np.zeros(p, dtype=np.float64)

        first = int(np.argmax(relevance))
        selected[0] = first
        remaining[first] = False
        rem_idx = np.where(remaining)[0]
        col = engine.mi_column(first, rem_idx)
        red_sum[rem_idx] = col
        redundancy[rem_idx, first] = col
        redundancy[first, rem_idx] = col

        for i in range(1, n_select):
            rem_idx = np.where(remaining)[0]
            # scoring + tie-break identical to mrmr_greedy (mrmr.py:48-62):
            # only red_sum over REMAINING candidates is ever read, so the
            # uncomputed pair entries cannot influence the selection
            if method == "MID":
                scores = relevance[rem_idx] - red_sum[rem_idx] / i
            else:  # MIQ
                scores = relevance[rem_idx] / (red_sum[rem_idx] / i + 1e-9)
            max_score = np.max(scores)
            top = rem_idx[np.isclose(scores, max_score, atol=1e-12)]
            if top.size > 1:
                best = int(top[np.argmin(red_sum[top] / i)])
            else:
                best = int(top[0])
            selected[i] = best
            remaining[best] = False
            if i + 1 < n_select:
                rem2 = np.where(remaining)[0]
                col = engine.mi_column(best, rem2)
                red_sum[rem2] += col
                redundancy[rem2, best] = col
                redundancy[best, rem2] = col
        return selected, relevance, redundancy
    finally:
        engine.close()


def jmi_select_matrix(
    spark: SparkSession,
    X: np.ndarray,
    y: np.ndarray,
    n_select: int,
    unit: str = "bit",
) -> tuple[list[int], np.ndarray]:
    """JMI greedy selection in the wide-matrix regime (n bounded, p large).

    Same criterion as :func:`fastselect_spark.selection.jmi.jmi_select`
    (J(f) = Σ_{s∈S} I((X_f, X_s); Y), seed = argmax I(X_f; Y), first-max
    tie-break) but the cumulative score is built from step-wise broadcast
    joint-MI columns — O(p·K) pair contingencies instead of the DataFrame
    path's O(p²) cube/melt tables. Returns (selected_indices, relevance)."""
    p = X.shape[1]
    if not (0 < n_select <= p):
        raise ValueError("n_select out of range")
    Xc, yc, _ = encode_shared(X, y)
    engine = BroadcastMIEngine(spark, Xc, yc, unit=unit)
    try:
        relevance = engine.relevance()
        selected = [int(np.argmax(relevance))]
        remaining = np.ones(p, dtype=bool)
        remaining[selected[0]] = False
        acc = np.zeros(p, dtype=np.float64)
        while len(selected) < n_select:
            cand = np.where(remaining)[0]
            acc[cand] += engine.joint_mi_column(selected[-1], cand)
            best = int(cand[np.argmax(acc[cand])])
            selected.append(best)
            remaining[best] = False
        return selected, relevance
    finally:
        engine.close()


def cmim_select_matrix(
    spark: SparkSession,
    X: np.ndarray,
    y: np.ndarray,
    n_select: int,
    unit: str = "bit",
) -> tuple[list[int], np.ndarray]:
    """CMIM greedy selection in the wide-matrix regime.

    Criterion and tie-breaks match
    :func:`fastselect_spark.selection.cmim.cmim_select`
    (J(f) = min_{s∈S} I(X_f; Y | X_s) with the chain-rule identity
    I(f;Y|s) = I((f,s);Y) − I(s;Y)); the running min needs exactly one new
    joint-MI column per step. Returns (selected_indices, relevance)."""
    p = X.shape[1]
    if not (0 < n_select <= p):
        raise ValueError("n_select out of range")
    Xc, yc, _ = encode_shared(X, y)
    engine = BroadcastMIEngine(spark, Xc, yc, unit=unit)
    try:
        relevance = engine.relevance()
        selected = [int(np.argmax(relevance))]
        remaining = np.ones(p, dtype=bool)
        remaining[selected[0]] = False
        score = np.full(p, np.inf, dtype=np.float64)
        while len(selected) < n_select:
            s = selected[-1]
            cand = np.where(remaining)[0]
            col = engine.joint_mi_column(s, cand) - relevance[s]
            score[cand] = np.minimum(score[cand], col)
            best = int(cand[np.argmax(score[cand])])
            selected.append(best)
            remaining[best] = False
        return selected, relevance
    finally:
        engine.close()
