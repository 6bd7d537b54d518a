"""Signed feature hashing over document token multisets — the
HashingVectorizer / FeatureHasher device (Weinberger et al. 2009,
"Feature Hashing for Large Scale Multitask Learning"; sklearn
``HashingVectorizer(alternate_sign=True)`` semantics): each token maps
to ``bucket = h(token) mod k`` and contributes ``sign(token) ∈ {-1,+1}``
from an independent hash bit, so a document becomes a fixed-width
k-dimensional vector with NO vocabulary pass, no fit state, and no
driver-side dictionary — the categorical/text encoder that stays
one-pass at 100 TB (a vocabulary join is a second scan plus a
high-cardinality shuffle; this is a row-local projection plus one
map-side-combining aggregation).

Graft-added (the reference has no text surface). Both hashes use the
portable 60-bit md5-prefix family (CLAUDE.md round-3: bit-identical in
Spark, DuckDB and hashlib), with distinct seeds for bucket and sign so
the sign bit is independent of the bucket for any ``n_features`` (not
just powers of two). Signed sums are exact integers — the output is
hash-exact cross-engine by construction.

Scale shape: one scan (normalize, split, explode — all JVM expressions),
one groupBy(doc, bucket) hash aggregation with map-side partial combine.
Output is long-form ``(id, bucket, value)`` sparse rows — the natural
shape for a downstream matmul/join; pivot to array<double> only at
bounded k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash60(col: Column, seed: str) -> Column:
    """Portable 60-bit md5-prefix hash (cross-engine-exact family)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


def hashed_term_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 64,
    seed: int = 0,
    alternate_sign: bool = True,
    binary: bool = False,
) -> DataFrame:
    """(id, bucket, value): the signed hashed term-count vector of each
    document's whitespace token multiset (trim/collapse-ws/lower
    normalization — the corpus-wide tokenizer convention, tfidf.py).

    - ``alternate_sign``: each token's count enters with ±1 from an
      independent hash bit (unbiased inner products under collisions);
      off = plain collision-summed counts.
    - ``binary``: count each distinct term once per doc (presence).

    Buckets with a zero signed sum (exact ± cancellation) are emitted —
    the row set is the set of (doc, bucket) pairs touched by any token,
    a deterministic function of the corpus, not of float noise.
    """
    from fastselect_spark.dedup.minhash import ensure_parallelism

    df = ensure_parallelism(df)  # single-file scans serialize the md5 work
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    toks = df.select(
        F.col(id_col), F.explode(F.split(norm, " ")).alias("term")
    ).where(F.col("term") != "")
    if binary:
        toks = toks.distinct()
    bucket = (_hash60(F.col("term"), f"fh{seed}") % n_features).cast("int")
    sign = (
        F.lit(1) - F.lit(2) * (_hash60(F.col("term"), f"fs{seed}") % 2).cast("int")
        if alternate_sign
        else F.lit(1)
    )
    return (
        toks.select(F.col(id_col), bucket.alias("bucket"), sign.alias("sign"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").cast("long").alias("value"))
    )
