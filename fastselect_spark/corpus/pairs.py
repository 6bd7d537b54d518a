"""Contrastive training-pair generation over conversation turns.

For every anchor turn: ``positive`` = the next turn of the SAME
conversation (the adjacent-turn heuristic used for dialogue contrastive
pretraining); ``negative`` = a deterministic hash-matched turn from a
DIFFERENT conversation — no RNG, so the pair set is reproducible under
any partitioning and re-run (the same discipline as
corpus/sampling.py's hash-Bernoulli).

Negative selection: each anchor hashes to a bucket
(``md5(seed:conv:idx) % n_buckets``); each bucket has a deterministic
representative turn — the corpus-wide MINIMUM of
``(rank_hash, conv, idx)`` within the bucket, computed by ONE
``groupBy(bucket).agg(min(struct(...)))`` (map-side partial aggregation:
the corpus is never shuffled by bucket). A second representative table
with an independent seed provides the fallback when the primary
representative lands in the anchor's own conversation; if both collide
(needs the same conversation to own both buckets' minima) the negative
is null and the row is dropped — deterministic, counted by the caller.

Scale shape: the positive rides the conv_id exchange every featurize op
already shares; the two representative tables are n_buckets-sized and
BROADCAST; everything else is row-local projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastselect_spark.featurize.encoding import hash_bucket


def _rep_table(
    base: DataFrame, n_buckets: int, seed: int, suffix: str
) -> DataFrame:
    """(bucket, conv, text) — deterministic per-bucket representative:
    min (rank_hash, conv, idx, text) struct, one partial-agg reduction."""
    key = F.concat_ws(":", F.col("__conv"), F.col("__idx").cast("string"))
    rank = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"r{seed}:"), key)), 1, 15), 16, 10
    ).cast("long")
    tagged = base.select(
        hash_bucket(key, n_buckets, seed=seed).alias("bucket"),
        F.struct(
            rank.alias("r"),
            F.col("__conv").alias("conv"),
            F.col("__idx").alias("idx"),
            F.col("__text").alias("text"),
        ).alias("s"),
    )
    rep = tagged.groupBy("bucket").agg(F.min("s").alias("s"))
    return rep.select(
        "bucket",
        F.col("s.conv").alias(f"neg_conv{suffix}"),
        F.col("s.text").alias(f"neg_text{suffix}"),
    )


def contrastive_pairs(
    tr: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    n_buckets: int = 64,
    seed: int = 0,
) -> DataFrame:
    """(conv_id, turn_idx, anchor, positive, negative) — one row per turn
    that has a next-turn positive and a cross-conversation negative."""
    base = tr.select(
        F.col(conv_col).alias("__conv"),
        F.col(order_col).alias("__idx"),
        F.col(text_col).alias("__text"),
    ).where(F.col("__text").isNotNull())

    w = Window.partitionBy("__conv").orderBy("__idx")
    anchors = base.withColumn("positive", F.lead("__text").over(w)).where(
        F.col("positive").isNotNull()
    )
    key = F.concat_ws(":", F.col("__conv"), F.col("__idx").cast("string"))
    anchors = anchors.withColumn(
        "bucket", hash_bucket(key, n_buckets, seed=seed)
    )

    rep_a = _rep_table(base, n_buckets, seed=seed, suffix="_a")
    rep_b = _rep_table(base, n_buckets, seed=seed + 1, suffix="_b")
    joined = anchors.join(F.broadcast(rep_a), "bucket", "left").join(
        F.broadcast(rep_b), "bucket", "left"
    )
    negative = F.when(
        F.col("neg_conv_a") != F.col("__conv"), F.col("neg_text_a")
    ).when(F.col("neg_conv_b") != F.col("__conv"), F.col("neg_text_b"))
    return (
        joined.withColumn("negative", negative)
        .where(F.col("negative").isNotNull())
        .select(
            F.col("__conv").alias(conv_col),
            F.col("__idx").alias(order_col),
            F.col("__text").alias("anchor"),
            "positive",
            "negative",
        )
    )
