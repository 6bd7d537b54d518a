"""n-gram Jaccard near-duplicate pairs with inverted-index candidate
generation (explode shingles -> self-join on shingle -> distinct pairs ->
exact Jaccard verification). Fully SQL-expressible, so the driver's DuckDB
oracle can verify it end-to-end.

Scale notes: candidate generation is the classic inverted-index join; very
common shingles create hot join keys, so shingles whose document frequency
exceeds ``max_doc_freq`` are dropped from the index (standard practice —
they carry no dedup signal and they are exactly the skew source).
Verification uses the distinct shingle arrays carried on each side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.dedup.minhash import _shingles


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with shingle-set Jaccard >= threshold."""
    from fastselect_spark.dedup.minhash import ensure_parallelism

    # the shingle frame feeds FOUR branches (both inverted-index sides and
    # both verification fetch sides) — persist it or the shingling plan
    # re-executes per branch; repartition first (single-file inputs give
    # one task)
    docs = ensure_parallelism(df).select(
        F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("shingles")
    ).persist()
    inv = docs.select(id_col, F.explode("shingles").alias("shingle"))
    if max_doc_freq is not None:
        freq = inv.groupBy("shingle").count().where(F.col("count") <= max_doc_freq)
        inv = inv.join(freq.select("shingle"), "shingle")
    a = inv.select(F.col(id_col).alias("id_a"), "shingle")
    b = inv.select(F.col(id_col).alias("id_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    da = docs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    pairs = cand.join(da, "id_a").join(db, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    result = (
        pairs.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    # eager: materialize pairs, release the shingle cache (persist hygiene)
    result = result.localCheckpoint()
    docs.unpersist()
    return result
