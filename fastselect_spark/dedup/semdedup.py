"""SemDeDup-style semantic deduplication: k-means-partition the embedding
space, then prune near-duplicates WITHIN each cluster (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication").

Why this is the 100 TB embedding-dedup path: the global near-dup problem is
quadratic; hyperplane LSH (dedup/embedding.py) bounds it by hash buckets but
needs OR-amplification at realistic thresholds. SemDeDup instead bounds it
by a LEARNED partition — one k-means assignment scan (no corpus shuffle,
similarity/ivf.py kmeans_clusters), ONE exchange keyed by cluster_id, then
an exact O(m²) in-memory pass per cluster where m ≈ n/k is controlled by
choosing k ∝ n. Cross-cluster near-dup pairs are missed by design — the
paper's accepted trade-off (duplicates are semantically close, so they
co-cluster at high probability; recall vs k is the tuning knob).

Keep rule (deterministic, SQL-expressible): a vector is DROPPED iff some
LOWER-ID vector in the same cluster has cosine >= threshold — the same
lowest-id-wins convention as dedup/exact.py, non-transitive so the DuckDB
gate can recompute it as a bare NOT EXISTS over within-cluster pairs
(no iteration). The paper's greedy variant (drop only against *kept*
points) differs only on chains a-b-c where cos(a,b)>=τ>cos(a,c); at
near-dup thresholds both collapse to the same clusters in practice.

Reference parity note: the reference engine (FastSelect) has no embedding
dedup; this extends the repo's dedup family (SURVEY.md §2 training-data
ops) with the published cluster-partitioned method.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.similarity.ivf import _normalize, train_ivf_centroids

# pairwise blocks are chunked so per-task temporaries stay ~1-2 MB
# (32 concurrent workers allocating tens-of-MB blocks mmap-churn 5-8x
# slower than single-process — measured, CLAUDE.md)
_BLOCK_ROWS = 2048


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
    train_sample: int | None = None,
) -> DataFrame:
    """Per-vector SemDeDup verdicts: ``(id_col, cluster_id, kept)``.

    ``kept`` is False iff a lower-id vector in the same k-means cluster has
    cosine >= ``threshold``. Plan shape: one broadcast assignment scan
    (no shuffle), one Exchange on ``cluster_id``, one Arrow pass per
    cluster group. The cluster pairwise pass streams ``_BLOCK_ROWS``-row
    blocks of the (m, m) cosine matrix so memory is O(block·m), not O(m²).
    Training is the deterministic distributed Lloyd of
    :func:`fastselect_spark.similarity.ivf.train_ivf_centroids`, so the
    DuckDB gate injects NumPy-replica centroids as literals and recomputes
    assignment + within-cluster pairs + the NOT EXISTS keep rule in SQL.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_clusters, emb_col, id_col, train_sample=train_sample
        )
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            V = _normalize(np.stack(pdf[emb_col].to_numpy()).astype(np.float64))
            cell = np.argmax(V @ C.T, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster_id": cell.astype(np.int32),
                    emb_col: pdf[emb_col],
                }
            )

    emb_type = corpus.schema[emb_col].dataType.simpleString()
    assigned = corpus.select(id_col, emb_col).mapInPandas(
        assign, schema=f"`{id_col}` long, cluster_id int, `{emb_col}` {emb_type}"
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        # ascending-id order so "lower-id neighbor" is a lower-triangular
        # comparison; block the row axis to bound temporaries
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        V = _normalize(np.stack(pdf[emb_col].to_numpy()).astype(np.float64))
        m = len(V)
        kept = np.ones(m, dtype=bool)
        for lo in range(0, m, _BLOCK_ROWS):
            hi = min(lo + _BLOCK_ROWS, m)
            if hi <= 1:
                continue
            # rows lo:hi vs all strictly-lower-id columns 0:hi
            G = V[lo:hi] @ V[:hi].T
            dup = G >= threshold
            # mask the diagonal-and-above of the (hi-lo, hi) strip
            cols = np.arange(hi)[None, :]
            rows = np.arange(lo, hi)[:, None]
            dup &= cols < rows
            kept[lo:hi] = ~dup.any(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster_id": pdf["cluster_id"],
                "kept": kept,
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(
        prune, schema=f"`{id_col}` long, cluster_id int, kept boolean"
    )


def semantic_dedup_keep(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    **kwargs,
) -> DataFrame:
    """Surviving rows of ``corpus`` after :func:`semantic_dedup` — the
    verdict join is on the bare id (no array crosses the verdict shuffle)."""
    verdicts = semantic_dedup(
        corpus, threshold, n_clusters, emb_col, id_col, **kwargs
    )
    return corpus.join(
        verdicts.where(F.col("kept")).select(id_col), id_col, "left_semi"
    )
