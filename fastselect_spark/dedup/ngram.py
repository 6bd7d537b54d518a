"""n-gram Jaccard near-duplicate pairs with inverted-index candidate
generation (explode shingles -> self-join on shingle -> distinct pairs ->
exact Jaccard verification). Fully SQL-expressible, so the driver's DuckDB
oracle can verify it end-to-end.

Scale notes: candidate generation is the classic inverted-index join; very
common shingles create hot join keys, so shingles whose document frequency
exceeds ``max_doc_freq`` are dropped from the index (standard practice —
they carry no dedup signal and they are exactly the skew source). The cap
is ON by default (1000 docs: one hot shingle is then bounded to ~1000²
candidate rows instead of O(n²) at corpus scale); verification always
uses the FULL distinct shingle arrays carried on each side, so the cap
only ever prunes candidate pairs whose EVERY shared shingle is
corpus-common (df > cap) — overlap that is boilerplate by definition.
Pass ``max_doc_freq=None`` to opt out when such pairs must be found.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastselect_spark.dedup.minhash import _shingles


def _resolve_doc_freq_cap(
    docs: DataFrame, max_doc_freq: int | float | None
) -> int | None:
    """int = absolute df cap; float in (0, 1] = fraction of the corpus doc
    count (one cheap count on the already-persisted shingle frame);
    None = uncapped (opt-out)."""
    if max_doc_freq is None:
        return None
    if isinstance(max_doc_freq, float):
        if not 0.0 < max_doc_freq <= 1.0:
            raise ValueError("fractional max_doc_freq must be in (0, 1]")
        return max(1, int(max_doc_freq * docs.count()))
    if int(max_doc_freq) < 1:
        raise ValueError("max_doc_freq must be >= 1")
    return int(max_doc_freq)


def _candidate_pairs(docs: DataFrame, id_col: str, cap: int | None) -> DataFrame:
    """Distinct (id_a < id_b) candidate pairs from the inverted-index
    self-join, with shingles above the df cap dropped from the index.
    Split out so tests can assert the cap bounds the candidate count."""
    inv = docs.select(id_col, F.explode("shingles").alias("shingle"))
    if cap is not None:
        freq = inv.groupBy("shingle").count().where(F.col("count") <= cap)
        inv = inv.join(freq.select("shingle"), "shingle")
    a = inv.select(F.col(id_col).alias("id_a"), "shingle")
    b = inv.select(F.col(id_col).alias("id_b"), "shingle")
    return (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | float | None = 1000,
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
    cap = _resolve_doc_freq_cap(docs, max_doc_freq)
    cand = _candidate_pairs(docs, id_col, cap)
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


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | float | None = 1000,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: (id_a < id_b, containment_a_in_b,
    containment_b_in_a, jaccard) for pairs where EITHER containment
    reaches ``threshold`` — containment(X in Y) = |X∩Y| / |X|. Catches
    what Jaccard misses: a short document quoted verbatim inside a long
    one has tiny Jaccard but containment ≈ 1 (quote/superset dedup, the
    C4-span-removal companion at document granularity).

    Same shape as ngram_jaccard_pairs: df-capped inverted-index candidate
    join, persist-once shingle frame, exact verification on the
    candidate pairs only."""
    from fastselect_spark.dedup.minhash import ensure_parallelism

    docs = ensure_parallelism(df).select(
        F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("shingles")
    ).persist()
    cap = _resolve_doc_freq_cap(docs, max_doc_freq)
    cand = _candidate_pairs(docs, id_col, cap)
    da = docs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    pairs = cand.join(da, "id_a").join(db, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    na = F.size("sh_a").cast("double")
    nb = F.size("sh_b").cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    result = (
        pairs.withColumn("c_a_in_b", inter / na)
        .withColumn("c_b_in_a", inter / nb)
        .where(
            (F.col("c_a_in_b") >= threshold) | (F.col("c_b_in_a") >= threshold)
        )
        .select(
            "id_a",
            "id_b",
            F.round("c_a_in_b", 6).alias("c_a_in_b"),
            F.round("c_b_in_a", 6).alias("c_b_in_a"),
            F.round(inter / union, 6).alias("jaccard"),
        )
    )
    result = result.localCheckpoint()
    docs.unpersist()
    return result


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT Jaccard self-join via AllPairs/PPJoin prefix filtering
    (Bayardo et al. 2007, Xiao et al. 2008): no df cap and NO dropped
    pairs. Each document indexes only its globally-RAREST
    ``n - ceil(threshold*n) + 1`` shingles (global order = df asc,
    shingle); the prefix-filter lemma guarantees every pair with
    J >= threshold shares an indexed shingle, because
    J >= t implies |X∩Y| >= t*max(|X|,|Y|) >= ceil(t*|X|), and two sets
    sorted by one total order whose overlap is at least alpha must share
    a token in their first (size - alpha + 1) elements.

    vs ngram_jaccard_pairs: the df cap bounds hot join keys by DROPPING
    corpus-common shingles (documented recall trade-off); prefix
    filtering bounds them structurally — common shingles land at the END
    of every document's ordering and rarely enter any prefix — while
    keeping the result exact. Cost: one extra df-count aggregation and a
    per-doc rank window.

    Scale shape: persist-once shingle frame (FIVE consumers), bare
    id-pair dedup BEFORE the verification array fetch, exact
    verification only on candidates."""
    from fastselect_spark.dedup.minhash import ensure_parallelism

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    docs = ensure_parallelism(df).select(
        F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("shingles")
    ).persist()
    # __n (the doc's distinct-shingle count) is size(shingles) computed
    # BEFORE the explode — a scan-side projection instead of a second
    # unordered COUNT window on the id exchange (round-6 trim; the
    # shingle array is distinct by construction so the values are equal)
    inv = docs.select(
        id_col,
        F.size("shingles").alias("__n"),
        F.explode("shingles").alias("shingle"),
    )
    dfreq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy(id_col).orderBy("__df", "shingle")
    pre = (
        inv.join(dfreq, "shingle")
        .withColumn("__rk", F.row_number().over(w))
        .where(
            # the 1e-9 guard keeps a float product like 0.07*100 =
            # 7.000000000000001 from ceiling UP past the true integer and
            # shortening the prefix (which could drop J == threshold
            # boundary pairs); erring a token longer only adds candidates,
            # which exact verification removes (round-5 ADVICE fix)
            F.col("__rk")
            <= F.col("__n")
            - F.ceil(F.lit(threshold) * F.col("__n") - F.lit(1e-9))
            + 1
        )
        .select(id_col, "shingle")
    )
    a = pre.select(F.col(id_col).alias("id_a"), "shingle")
    b = pre.select(F.col(id_col).alias("id_b"), "shingle")
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
    result = result.localCheckpoint()
    docs.unpersist()
    return result
