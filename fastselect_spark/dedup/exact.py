"""Exact deduplication: hash-groupBy on a normalized-content fingerprint.

One shuffle on the fingerprint; the canonical survivor per group is the
minimum id (deterministic). Scales as a plain hash aggregation — this is
the baseline every near-dup method is measured against.

NULL-text semantics: exact dedup follows SQL grouping — the NULL
fingerprint forms its own group (all null-text docs collapse together,
separately from empty-text docs). The near-dup family (minhash/simhash)
instead normalizes null to empty text; run exact dedup first (as
dedup_pipeline does) and the distinction never reaches the LSH stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastselect_spark.text.analysis import add_fingerprint


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(fingerprint, keep_id, n_copies) for every group with > 1 copy."""
    fp = add_fingerprint(df, text_col, with_rolling=False)
    return (
        fp.groupBy("fp_exact")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one row (min id) per normalized-content fingerprint."""
    fp = add_fingerprint(df, text_col, with_rolling=False)
    w = Window.partitionBy("fp_exact").orderBy(id_col)
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "fp_exact")
    )


def dedup_turns_within_conversation(
    tr: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Drop repeated turns INSIDE a conversation — the transcript-level
    boilerplate killer (retries, duplicated tool dumps, repeated system
    banners): a turn is dropped when an EARLIER turn of the same
    conversation has the same normalized-text fingerprint; the first
    occurrence survives, cross-conversation repeats are untouched (that
    is corpus-level dedup's job).

    One window over the (conv, fingerprint) partition ordered by
    ``order_col`` — rides the same conv-keyed exchange family as every
    featurize op; NULL text follows SQL grouping (all null-text turns of
    a conversation collapse to the first)."""
    fp = add_fingerprint(tr, text_col, with_rolling=False)
    w = Window.partitionBy(conv_col, "fp_exact").orderBy(order_col)
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "fp_exact")
    )


def conversation_fingerprints(
    tr: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """(conv_id, n_turns, conv_fp) — an ORDER-SENSITIVE fingerprint of a
    whole conversation: md5 of the turn fingerprints concatenated in turn
    order (array_sort on (order, fp) structs, so the result is
    partitioning-independent). Two identical dialogues replayed under
    different conv_ids collide; a reordered dialogue does not."""
    fp = add_fingerprint(tr, text_col, with_rolling=False)
    agg = fp.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.array_sort(
            F.collect_list(
                F.struct(F.col(order_col).alias("i"), F.col("fp_exact").alias("f"))
            )
        ).alias("__s"),
    )
    joined = F.array_join(F.transform(F.col("__s"), lambda s: s["f"]), "")
    return agg.select(
        conv_col, "n_turns", F.md5(joined).alias("conv_fp")
    )


def duplicate_conversations(
    tr: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """(conv_fp, keep_conv, n_copies) for every group of verbatim-repeated
    conversations (> 1 copy); keep = minimum conv_id. The transcript-side
    twin of exact_duplicate_groups — one conv-keyed agg + one fingerprint
    agg, both hash aggregations."""
    fps = conversation_fingerprints(tr, conv_col, order_col, text_col)
    return (
        fps.groupBy("conv_fp")
        .agg(
            F.min(conv_col).alias("keep_conv"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
    )
