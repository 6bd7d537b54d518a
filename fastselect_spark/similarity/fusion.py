"""Reciprocal-rank fusion (RRF) — merge rankings from heterogeneous
retrievers.

Graft-added retrieval capability (pairs with text/bm25.py, ann.py and
tfidf.py): when several retrievers rank the same corpus on incomparable
score scales (BM25 logs, cosine similarities, recency), RRF fuses them
scale-free using only ranks: ``score(d) = sum_i w_i / (k + rank_i(d))``
(Cormack, Clarke & Buettcher 2009). k=60 is the standard damping.

Scale shape: each input ranking is ranked with ONE window partitioned by
the query key (per-query ranking is the scale path — a global ranking
without a query column is a single-partition Window funnel, so it is
allowed only with ``allow_global=True`` for small candidate pools);
contributions are unioned and folded by one (query, doc) aggregation.
Ties rank deterministically by (score desc, id).

Cross-engine floats: each contribution is ``w / (k + rank)`` — one
mirrored division of exact integers — and a document accumulates at most
len(rankings) terms, summed engine-side in both engines over the same
tiny term set; contract queries round the fused score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    query_col: str | None = None,
    k: int = 60,
    weights: list[float] | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """Fuse ``rankings`` (each ``[query_col,] id_col, score_col``) into
    ``[query_col,] id_col, n_lists, rrf_score``. A document absent from a
    ranking simply contributes nothing for it (the standard convention).
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError("weights must match rankings")
    if query_col is None and not allow_global:
        raise ValueError(
            "global RRF plans a single-partition Window funnel; pass a "
            "query_col (the scale path) or allow_global=True for small pools"
        )
    part = [query_col] if query_col else []
    contribs = []
    for i, df in enumerate(rankings):
        w = 1.0 if weights is None else float(weights[i])
        win = Window.partitionBy(*part).orderBy(
            F.col(score_col).desc(), F.col(id_col)
        )
        contribs.append(
            df.select(
                *part,
                id_col,
                (
                    F.lit(w)
                    / (F.lit(k) + F.row_number().over(win)).cast("double")
                ).alias("__rrf"),
            )
        )
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    return (
        u.groupBy(*part, id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.sum("__rrf").alias("rrf_score"),
        )
    )


def pool_embeddings(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
    mode: str = "mean",
) -> DataFrame:
    """Pool per-row embedding vectors into one vector per group —
    ``group_cols + (n_vecs long, pooled array<double>)`` — the standard
    conversation/document-set representation (mean of turn embeddings)
    that feeds ANN / SemDeDup / MMR at the coarser granularity.

    ``mode``: 'mean' (centroid) or 'max' (per-dimension max pool).

    Scale shape: posexplode -> ONE (group, dim) map-side-combining
    aggregation -> one tiny per-group re-assembly (array_sort of
    (dim, value) structs) — never a collect_list of whole vectors, so
    skewed groups cost rows, not memory. NULL vectors are skipped."""
    if mode not in ("mean", "max"):
        raise ValueError(f"mode must be 'mean' or 'max', got {mode}")
    agg_fn = F.avg if mode == "mean" else F.max
    exploded = (
        df.where(F.col(vec_col).isNotNull())
        .select(*group_cols, F.posexplode(vec_col).alias("dim", "__v"))
        .withColumn("__v", F.col("__v").cast("double"))
    )
    per_dim = exploded.groupBy(*group_cols, "dim").agg(
        agg_fn("__v").alias("__p"), F.count(F.lit(1)).alias("__n")
    )
    return (
        per_dim.groupBy(*group_cols)
        .agg(
            F.max("__n").alias("n_vecs"),
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("__p")))
            ).alias("__s"),
        )
        .select(
            *group_cols,
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.expr("transform(__s, x -> x.__p)").alias("pooled"),
        )
    )
