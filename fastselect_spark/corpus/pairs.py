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
``(rank_hash, conv, idx)`` within the bucket. A second representative
table with an independent seed provides the fallback when the primary
representative lands in the anchor's own conversation; BOTH tables come
from ONE corpus scan (each row explodes into two tagged candidates, one
``groupBy(tag, bucket).agg(min(struct))`` partial-agg reduction — the
corpus is never shuffled by bucket). If both representatives collide
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


def _rep_tables(
    base: DataFrame, n_buckets: int, seed: int
) -> tuple[DataFrame, DataFrame]:
    """Two (bucket, conv, text) representative tables (independent seeds
    ``seed`` and ``seed+1``) from ONE corpus scan: each row emits both
    tagged (tag, bucket, struct) candidates via explode, one
    ``groupBy(tag, bucket).agg(min(struct))`` partial-agg reduction, and
    the tiny result splits by tag — bit-identical to two separate
    reductions, half the scans."""
    key = F.concat_ws(":", F.col("__conv"), F.col("__idx").cast("string"))

    def entry(s: int):
        rank = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"r{s}:"), key)), 1, 15), 16, 10
        ).cast("long")
        return F.struct(
            F.lit(s).alias("tag"),
            hash_bucket(key, n_buckets, seed=s).alias("bucket"),
            F.struct(
                rank.alias("r"),
                F.col("__conv").alias("conv"),
                F.col("__idx").alias("idx"),
                F.col("__text").alias("text"),
            ).alias("s"),
        )

    tagged = base.select(
        F.explode(F.array(entry(seed), entry(seed + 1))).alias("e")
    ).select("e.tag", "e.bucket", "e.s")
    # localCheckpoint: the two tag-split projections below are EACH built
    # into a broadcast relation, and two different projections of one frame
    # re-execute its whole plan per broadcast (round-5 lesson) — without
    # this the corpus scan + min-struct reduction runs twice. The frame is
    # 2 x n_buckets rows.
    reps = (
        tagged.groupBy("tag", "bucket").agg(F.min("s").alias("s")).localCheckpoint()
    )

    def split(tag: int, suffix: str) -> DataFrame:
        return reps.where(F.col("tag") == tag).select(
            "bucket",
            F.col("s.conv").alias(f"neg_conv{suffix}"),
            F.col("s.text").alias(f"neg_text{suffix}"),
        )

    return split(seed, "_a"), split(seed + 1, "_b")


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

    rep_a, rep_b = _rep_tables(base, n_buckets, seed=seed)
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


def sft_pairs(
    tr: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
) -> DataFrame:
    """(conv_id, turn_idx, prompt, response) — adjacent user→assistant
    turn pairs, the canonical SFT training-example extraction: a pair is
    emitted when a ``prompt_role`` turn is IMMEDIATELY followed by a
    ``response_role`` turn of the same conversation (multi-turn
    assistant runs contribute only their first response; repeated user
    turns only pair their last — the adjacency rule keeps prompts and
    responses aligned without any heuristics).

    One lead() window on the shared conv_id exchange — no joins, no
    Python."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    out = tr.select(
        F.col(conv_col),
        F.col(order_col),
        F.col(role_col),
        F.col(text_col).alias("prompt"),
        F.lead(role_col).over(w).alias("__next_role"),
        F.lead(text_col).over(w).alias("response"),
    )
    return out.where(
        (F.col(role_col) == prompt_role)
        & (F.col("__next_role") == response_role)
    ).select(conv_col, order_col, "prompt", "response")
