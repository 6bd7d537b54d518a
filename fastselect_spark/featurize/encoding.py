"""Categorical encodings for the transcripts feature matrix — all Window
+ built-in expressions (no Python in the hot path).

The point-in-time encoders honor the zero-temporal-leakage invariant
(BASELINE.json north_rule): every statistic a row receives is computed
from STRICTLY EARLIER rows only, via ``rowsBetween(unboundedPreceding,
-1)`` frames; ``kfold_target_encode`` is the CV-consistent alternative
for shuffled/grouped folds (leave-fold-out); ``frequency_encode`` /
``woe_iv_encode`` are whole-corpus statistics for static categoricals.

- ``target_encode_expanding`` — smoothed expanding target mean per key:
  ``(sum_prev + alpha * prior) / (cnt_prev + alpha)``. The prior is a
  caller-supplied constant (e.g. the TRAINING-period base rate) — deriving
  it from the scored frame itself would leak the global label mean into
  every row, and a global expanding prior would plan a single-partition
  window; both rejected by design, documented here.
- ``count_encode_expanding`` — strictly-past occurrence count of the key.
- ``hash_encode`` — the hashing trick: portable 60-bit md5 bucket per
  categorical value (same cross-engine hash family as simhash.py:37 —
  ``conv(substring(md5(x),1,15),16,10) % n``), row-local, shuffle-free.

Scale shape: the expanding encoders shuffle once on the key (same
Exchange-reuse discipline as windows.py — partial aggregation does not
apply to windows, but per-key cardinality is bounded by corpus rows and
skewed keys degrade to the salted prefix pattern of asof.py if ever
needed); hash_encode is a pure projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _past_window(key_cols: list[str], order_cols: list[str]):
    return (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )


def target_encode_expanding(
    df: DataFrame,
    key_cols: list[str],
    label_col: str = "label",
    order_cols: list[str] | None = None,
    prior: float = 0.5,
    alpha: float = 10.0,
    out_col: str = "te",
) -> DataFrame:
    """Smoothed expanding-mean target encoding over strictly-past rows.

    ``order_cols`` must be a TOTAL order within each key (ties would make
    "past" ambiguous across engines) — default ``ts, conv_id, turn_idx``
    which is unique on transcripts. A row with no history gets ``prior``
    exactly (cnt_prev = 0 ⇒ (0 + α·prior)/α = prior)."""
    order_cols = order_cols or ["ts", "conv_id", "turn_idx"]
    w = _past_window(key_cols, order_cols)
    lab = F.col(label_col).cast("double")
    sum_prev = F.coalesce(F.sum(lab).over(w), F.lit(0.0))
    cnt_prev = F.count(lab).over(w).cast("double")
    enc = (sum_prev + F.lit(float(alpha)) * F.lit(float(prior))) / (
        cnt_prev + F.lit(float(alpha))
    )
    return df.withColumn(out_col, enc)


def count_encode_expanding(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str] | None = None,
    out_col: str = "ce",
) -> DataFrame:
    """Strictly-past occurrence count of the key (frequency encoding that
    never sees the future: row i of a key gets i-1)."""
    order_cols = order_cols or ["ts", "conv_id", "turn_idx"]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn(out_col, (F.row_number().over(w) - 1).cast("long"))


def frequency_encode(
    df: DataFrame,
    col: str,
    out_rank: str | None = None,
    out_freq: str | None = None,
) -> DataFrame:
    """Ordinal frequency encoding: each category gets its global occurrence
    count and its dense rank by (count desc, value asc — a total order, so
    ties are deterministic cross-engine). One groupBy builds the vocabulary
    (bounded by category cardinality, not rows); the transform is a
    BROADCAST join back — no row-table shuffle. Unlike the expanding
    encoders this one is whole-corpus (not point-in-time): use it for
    static categorical features, not label-derived ones."""
    from pyspark.sql import Window as W

    out_rank = out_rank or f"{col}_rank"
    out_freq = out_freq or f"{col}_freq"
    vocab = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias(out_freq))
        .withColumn(
            out_rank,
            F.row_number()
            .over(W.orderBy(F.col(out_freq).desc(), F.col(col)))
            .cast("int"),
        )
    )
    return df.join(F.broadcast(vocab), col, "left")


def woe_iv_encode(
    df: DataFrame,
    col: str,
    label_col: str = "label",
    eps: float = 0.5,
    out_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Weight-of-evidence encoding + per-feature information value.

    Per category ``c`` with event/non-event counts ``pos_c``/``neg_c`` and
    corpus totals ``pos_tot``/``neg_tot``::

        woe_c = ln(((pos_c + eps) / pos_tot) / ((neg_c + eps) / neg_tot))
        iv    = sum_c ((pos_c + eps)/pos_tot - (neg_c + eps)/neg_tot) * woe_c

    ``eps`` is the standard adjusted-WoE additive smoothing so single-class
    categories stay finite (Siddiqi, *Credit Risk Scorecards*, eq. 6.1-6.2).
    All shares are quotients of exact integers, so the LN/product pipeline
    is IEEE-identical cross-engine (same argument as text/vocab.py).

    Scale shape: ONE ``groupBy(col)`` agg (partial-aggregation friendly,
    output bounded by category cardinality, not rows); totals are a window
    over that tiny vocab table; the row transform is a BROADCAST join back
    — the input row table is never shuffled. Whole-corpus statistics (like
    ``frequency_encode``): for point-in-time label safety use
    ``target_encode_expanding`` instead, or fit WoE on a training split.

    Returns ``(encoded_rows, vocab)`` where vocab has one row per category
    with ``(col, pos, neg, woe, iv_term)`` — ``sum(iv_term)`` is the IV.
    """
    out_col = out_col or f"{col}_woe"
    lab = F.col(label_col).cast("int")
    vocab = df.groupBy(col).agg(
        F.sum(lab).cast("long").alias("pos"),
        F.sum(F.lit(1) - lab).cast("long").alias("neg"),
    )
    # category-bounded table: persist at the branch point so the class
    # check and the transform join share ONE corpus scan, then cut the
    # returned plan loose with localCheckpoint so the cached handle can be
    # released HERE instead of leaking for the caller's lifetime (same
    # hygiene as ngram/mmr/embedding_health)
    cached = vocab.persist()
    try:
        check = cached.agg(F.sum("pos").alias("p"), F.sum("neg").alias("n")).first()
        if not check["p"] or not check["n"]:
            raise ValueError(
                "WoE requires both label classes present "
                f"(pos={check['p'] or 0}, neg={check['n'] or 0}); a one-class "
                "frame has no odds to weight"
            )
        vocab = cached.localCheckpoint(eager=True)
    finally:
        cached.unpersist()
    tot = Window.partitionBy()
    p = (F.col("pos").cast("double") + F.lit(float(eps))) / F.sum("pos").over(
        tot
    ).cast("double")
    q = (F.col("neg").cast("double") + F.lit(float(eps))) / F.sum("neg").over(
        tot
    ).cast("double")
    vocab = vocab.withColumn("woe", F.log(p / q)).withColumn(
        "iv_term", (p - q) * F.col("woe")
    )
    enc = df.join(
        F.broadcast(vocab.select(col, F.col("woe").alias(out_col))), col, "left"
    )
    return enc, vocab


def hash_bucket(col: str | Column, n_buckets: int, seed: int = 0) -> Column:
    """Portable 60-bit md5 bucket — bit-identical in Spark, DuckDB and
    hashlib (CLAUDE.md round-3: the cross-engine hash family). NULL values
    hash to bucket NULL (propagated, not silently folded)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % n_buckets).cast("int")


def hash_encode(
    df: DataFrame,
    cols: list[str],
    n_buckets: int = 64,
    seed: int = 0,
    suffix: str = "_hb",
) -> DataFrame:
    """Hashing-trick encoding: one bucket-index column per input column.
    Pure row-local projection — no shuffle, no vocabulary pass, fixed
    output width regardless of cardinality (the 100 TB-safe categorical
    encoder; collisions are the documented tradeoff)."""
    for c in cols:
        df = df.withColumn(f"{c}{suffix}", hash_bucket(c, n_buckets, seed))
    return df


def kfold_target_encode(
    df: DataFrame,
    key_cols: list[str],
    label_col: str = "label",
    fold_col: str = "fold",
    prior: float = 0.5,
    alpha: float = 10.0,
    out_col: str = "te_cv",
) -> DataFrame:
    """K-fold leave-fold-out target encoding: a row in fold f receives
    the smoothed target mean of its key computed from ALL OTHER folds —
    the standard CV-consistent encoder for non-temporal data (the
    expanding encoder stays the point-in-time choice for ordered data;
    this one is for shuffled/grouped CV where each fold must not see its
    own labels). ``fold_col`` typically comes from splits.group_kfold so
    a conversation never contributes to its own encoding.

    Shape: ONE groupBy(key, fold) agg (bounded by cardinality × K, never
    rows) → per-key totals via a window over that tiny table →
    leave-one-out stats by subtraction → BROADCAST join back; the row
    table is never shuffled. All sums are exact integers, so the encoding
    is an exact-rational quotient — IEEE-identical cross-engine."""
    lab = F.col(label_col).cast("long")
    per_fold = df.groupBy(*key_cols, fold_col).agg(
        F.sum(lab).alias("__s"),
        F.count(F.lit(1)).cast("long").alias("__c"),
    )
    wk = Window.partitionBy(*key_cols)
    loo = per_fold.select(
        *key_cols,
        fold_col,
        (F.sum("__s").over(wk) - F.col("__s")).alias("__s_oof"),
        (F.sum("__c").over(wk) - F.col("__c")).alias("__c_oof"),
    )
    enc = (
        F.col("__s_oof").cast("double")
        + F.lit(float(alpha)) * F.lit(float(prior))
    ) / (F.col("__c_oof").cast("double") + F.lit(float(alpha)))
    loo = loo.select(*key_cols, fold_col, enc.alias(out_col))
    return df.join(F.broadcast(loo), [*key_cols, fold_col], "left")
