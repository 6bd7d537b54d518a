"""Int8 scalar quantization (SQ8) of an ``array<float>`` embedding column.

The third leg of the ANN memory ladder (BENCH/ANN.md): exact float top-k
(ann.py) keeps 4·d bytes/vector, PQ/ADC (pq.py) compresses to m bytes at
an accuracy cost, SQ8 sits between — d bytes/vector (4× smaller than
float32, zero extra shuffle) with near-exact ranking, the standard
int8-GEMM serving trade re-expressed Spark-first (reference repo has no
ANN surface — this extends the training-pipeline mandate, not FastSelect
parity).

Quantization is **globally symmetric** (one absmax scale for the whole
tensor): ``q = clip(floor(x·127/a + 0.5), -127, 127)`` with
``a = max|x|`` over the corpus. A per-dimension AFFINE grid — the naive
choice — is WRONG for ranking: the integer dot of offset codes expands to
``Σ (x_j − mn_j)(y_j − mn_j)/Δ_j²``, which re-weights every dimension by
``1/Δ_j²`` and adds ``mn_j`` cross-terms, so it is not monotone in
``x·y`` (measured: recall@10 collapsed to 0.07 vs exact cosine on the
test corpus; the symmetric grid measures ≥ 0.9 on the same data). With a
single symmetric scale, ``Σ q_x q_y ≈ (127/a)² · x·y`` — one global
positive factor, ranking preserved up to quantization error.

Design for 100 TB:

- **Scale** is one ``max(abs(x))`` aggregation over the exploded column —
  map-side partial aggregation absorbs the n×d explosion inside each
  task; max/abs involve no float rounding, so the distributed result is
  bit-identical to any single-process scan regardless of partitioning.
- **Encode** is one row-local Arrow kernel emitting a d-byte ``binary``
  code per vector (packed — the round-2 staging lesson). No shuffle.
- **Top-k** mirrors :func:`~fastselect_spark.similarity.ann.cosine_topk`'s
  map-side-combine shape: quantized queries are broadcast, every corpus
  partition scores its batches with ONE int8→int64 matmul and emits its
  LOCAL top-k per query; the global merge is a bounded Window over
  queries×k rows. The codes table is never shuffled.

Scores are EXACT integers (|Σ q_j·c_j| ≤ d·127² — bigint-safe), which
makes the operator hash-checkable against a pure-SQL oracle with no
trained-state literals: the quantization grid itself is recomputed by the
oracle from the same table (``__spark_entry__._SQ8_TOPK_ORACLE``).

Ranking metric is the quantized INNER PRODUCT (MIPS). For cosine
semantics, pre-normalize the embedding column — on unit vectors the two
orders agree up to quantization error (recall test in
tests/test_pipeline_ops.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LEVELS = 127  # symmetric int8 grid: codes span [-127, 127]


def train_sq_scale(corpus: DataFrame, emb_col: str = "embedding") -> float:
    """Global absmax ``a = max|x|`` over the embedding column as float64.
    One scan; the explode is absorbed by map-side combine (the shuffle
    moves one partial max per partition); abs/max are rounding-free, so
    the result is partitioning-invariant."""
    row = (
        corpus.select(F.explode(emb_col).alias("x"))
        .agg(F.max(F.abs(F.col("x").cast("double"))).alias("a"))
        .first()
    )
    a = row["a"]
    return float(a) if a else 1.0


def _quantize(M: np.ndarray, a: float) -> np.ndarray:
    """Symmetric int8 codes: clip(floor(x·127/a + 0.5), -127, 127).
    Fixed float64 op sequence — identical to the SQL oracle's, so codes
    agree exactly cross-engine."""
    q = np.floor(M * float(LEVELS) / a + 0.5)
    return np.clip(q, -LEVELS, LEVELS).astype(np.int8)


def sq_encode(
    corpus: DataFrame,
    scale: float,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Narrow codes table ``(id_col, code binary)`` — d bytes per vector,
    one broadcast row-local Arrow pass, no shuffle."""
    bc = corpus.sparkSession.sparkContext.broadcast(float(scale))
    id_t = corpus.schema[id_col].dataType.simpleString()

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            codes = _quantize(M, a)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "code": [c.tobytes() for c in codes]}
            )

    return corpus.select(id_col, emb_col).mapInPandas(
        encode, schema=f"`{id_col}` {id_t}, code binary"
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    scale: float | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Top-k by quantized inner product: ``(query_id, neighbor_id, score,
    rank)`` with ``score`` the exact-integer int8 dot product
    (self-matches excluded). Pass ``codes``/``scale`` to reuse a stored
    index; otherwise both are built inline from ``corpus``.

    Local top-k uses a (-score, neighbor_id) lexsort so integer-score ties
    resolve identically in the per-partition and global passes — with a
    255-level grid, ties are common, and a score-only local cut could
    drop the globally tie-preferred (lower-id) candidate."""
    if scale is None:
        scale = train_sq_scale(corpus, emb_col)
    if codes is None:
        codes = sq_encode(corpus, scale, emb_col, id_col)
    qpdf = queries.select(id_col, emb_col).toPandas()
    q_ids = qpdf[id_col].to_numpy()
    Qm = _quantize(
        np.stack(qpdf[emb_col].to_numpy()).astype(np.float64), scale
    ).astype(np.int64)
    d = Qm.shape[1]
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, Qm))
    kk = int(k)
    idc = id_col

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, Q = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            # one contiguous buffer for the whole batch — two row-copies
            # beat per-row frombuffer views (round-3 gather lesson)
            C = np.frombuffer(
                b"".join(pdf["code"].to_numpy()), dtype=np.int8
            ).reshape(len(pdf), d).astype(np.int64)
            c_ids = pdf[idc].to_numpy()
            scores = Q @ C.T  # (nq, batch) exact int64
            out = []
            for qi in range(len(ids_q)):
                s, cm = scores[qi], c_ids
                mask = cm != ids_q[qi]
                sm, cm = s[mask], cm[mask]
                if not len(sm):
                    continue
                top = np.lexsort((cm, -sm))[:kk]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": ids_q[qi],
                            "neighbor_id": cm[top],
                            "score": sm[top],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    id_t = corpus.schema[id_col].dataType.simpleString()
    partial = codes.mapInPandas(
        local_topk,
        schema=f"query_id {id_t}, neighbor_id {id_t}, score long",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kk)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def sq8_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
    scale: float | None = None,
    train_sample: int | None = None,
) -> DataFrame:
    """IVF × SQ8 — the FAISS ``IVF,SQ8`` architecture re-expressed
    Spark-first, and the honest 100 TB serving shape: the stored index is
    the cell-annotated d-byte codes table (bucket/partition it by ``cell``
    at rest so the probe filter becomes PARTITION PRUNING at the scan),
    each query probes its ``nprobe`` nearest centroids driver-side, and
    only the probed cells' codes are scored — with the same exact-integer
    int8 dot product as :func:`sq8_topk`. Per-query compute shrinks by
    ~nprobe/n_cells AND every scored vector costs d bytes instead of 4·d.

    Returns ``(query_id, neighbor_id, score, rank)``; scores are exact
    integers, so the contract oracle recomputes centroids (NumPy-replica
    literals), assignment, probing, the symmetric grid and the integer
    rerank end-to-end in SQL (``__spark_entry__._ivf_sq8_topk_oracle_sql``).
    """
    from fastselect_spark.similarity.ivf import ivf_assign, train_ivf_centroids

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_cells, emb_col, id_col, train_sample=train_sample
        )
    if scale is None:
        scale = train_sq_scale(corpus, emb_col)
    # the stored index: (id, cell, code) — one row-local assign pass and
    # one row-local encode pass over the same scan, never shuffled
    assigned = ivf_assign(corpus.select(id_col, emb_col), centroids, emb_col)
    bc_scale = corpus.sparkSession.sparkContext.broadcast(float(scale))
    id_t = corpus.schema[id_col].dataType.simpleString()

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a = bc_scale.value
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": pdf["cell"],
                    "code": [c.tobytes() for c in _quantize(M, a)],
                }
            )

    codes = assigned.mapInPandas(
        encode, schema=f"`{id_col}` {id_t}, cell int, code binary"
    )

    # queries are small by contract: quantize + probe driver-side
    qpdf = queries.select(id_col, emb_col).toPandas()
    q_ids = qpdf[id_col].to_numpy()
    Qf = np.stack(qpdf[emb_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(Qf, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (Qf / norms) @ centroids.T
    probe_sets = [
        frozenset(int(c) for c in np.argsort(-sims[qi], kind="stable")[:nprobe])
        for qi in range(len(q_ids))
    ]
    all_cells = sorted(set().union(*probe_sets)) if probe_sets else []
    Qm = _quantize(Qf, float(scale)).astype(np.int64)
    d = Qm.shape[1]
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, Qm, probe_sets))
    kk = int(k)
    idc = id_col

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, Q, probes = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.frombuffer(
                b"".join(pdf["code"].to_numpy()), dtype=np.int8
            ).reshape(len(pdf), d).astype(np.int64)
            c_ids = pdf[idc].to_numpy()
            cells = pdf["cell"].to_numpy()
            out = []
            for qi in range(len(ids_q)):
                # probe mask BEFORE the matmul — the nprobe/n_cells saving
                mask = np.isin(cells, list(probes[qi])) & (c_ids != ids_q[qi])
                if not mask.any():
                    continue
                sm = C[mask] @ Q[qi]
                cm = c_ids[mask]
                top = np.lexsort((cm, -sm))[:kk]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": ids_q[qi],
                            "neighbor_id": cm[top],
                            "score": sm[top],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    # the probed-cells filter sits ON the codes table — stored partitioned
    # by cell, Catalyst turns it into partition pruning
    pruned = codes.where(F.col("cell").isin([int(c) for c in all_cells]))
    partial = pruned.mapInPandas(
        local_topk,
        schema=f"query_id {id_t}, neighbor_id {id_t}, score long",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kk)
        .select("query_id", "neighbor_id", "score", "rank")
    )
