"""Exponentially-decayed point-in-time features over transcripts.

Graft-added (the reference scores a static matrix; recency weighting is a
transcript-native need): a turn's context matters less the further back
it is, so the classic recency features are

- :func:`turn_decayed_sum` — ``d_i = sum_{j<=i} decay^(i-j) * x_j`` per
  conversation: the infinite-horizon decayed accumulator, expressed as a
  single closed-form window pair ``decay^i * SUM(x_j * decay^-j)`` so the
  whole thing is ONE ordered running sum sharing the conv_id exchange
  with the rest of the featurize stack (no per-row pair scan, no UDF).
- :func:`time_decayed_lastk` — wall-clock decay over the last ``k``
  turns, weights ``0.5^floor((ts_i - ts_j)/halflife_s)``: the exponent is
  QUANTIZED to whole half-life steps, so the weight is an exact power of
  two and Spark/DuckDB agree bit-for-bit (the repo's quantization rule
  for cross-engine float parity, CLAUDE.md round-2). Unrolled over k LAG
  expressions — k is small and fixed, the plan stays one window stack.

Leakage: both default to ``strictly_past=False`` (include the current
turn, the usual recency-feature definition); pass ``strictly_past=True``
to exclude it when the feature feeds a model of the current turn's label
(the expanding-encoder discipline, featurize/encoding.py).

Numerics of the closed form: ``x_j * decay^-j`` grows with turn depth;
with the default dyadic ``decay=0.5`` the terms are exact powers of two
and the running sum is summation-order-pinned by the ordered window
frame, so both engines produce identical doubles. Magnitude bounds the
usable depth (|x| * 2^j < 1e308 -> depth < ~1000 turns); million-turn
conversations should use the streaming recurrence
(streaming/trends.py-style state) instead — documented, not silent: the
closed form raises no error but saturates to inf, which the caller sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def turn_decayed_sum(
    tr: DataFrame,
    value_col: str,
    decay: float = 0.5,
    out_col: str | None = None,
    strictly_past: bool = False,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Add ``out_col`` = per-conversation exponentially-decayed running sum
    of ``value_col`` (decay factor per turn step). NULL values contribute
    0 and do not reset the accumulator."""
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    out = out_col or f"{value_col}_decay"
    hi = -1 if strictly_past else 0
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    scaled = F.expr(
        f"COALESCE(CAST({value_col} AS DOUBLE), 0.0D)"
        f" * power({decay!r}, -CAST({order_col} AS DOUBLE))"
    )
    run = F.sum(scaled).over(w)
    dec = F.expr(f"power({decay!r}, CAST({order_col} AS DOUBLE))") * run
    return tr.withColumn(out, F.coalesce(dec, F.lit(0.0)))


def time_decayed_lastk(
    tr: DataFrame,
    value_col: str,
    halflife_s: float = 300.0,
    k: int = 5,
    out_col: str | None = None,
    strictly_past: bool = False,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Add ``out_col`` = sum over the last ``k`` turns (plus the current
    one unless ``strictly_past``) of ``value * 0.5^floor(age/halflife_s)``
    where age is whole seconds back from the current turn's timestamp.
    The floor-quantized exponent keeps every weight an exact power of two
    (cross-engine float parity)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out = out_col or f"{value_col}_tdecay"
    w = Window.partitionBy(conv_col).orderBy(order_col)
    start = 1 if strictly_past else 0
    terms = []
    for d in range(start, k + 1):
        val = F.lag(F.col(value_col).cast("double"), d).over(w)
        age = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col, d).over(w))
        weight = F.expr(
            f"power(0.5, CAST(FLOOR(__age_{d} / {halflife_s!r}) AS DOUBLE))"
        )
        terms.append((f"__age_{d}", age, val, weight))
    cur = tr
    for name, age, _, _ in terms:
        cur = cur.withColumn(name, age)
    total = F.lit(0.0)
    for name, _, val, weight in terms:
        total = total + F.coalesce(val * weight, F.lit(0.0))
    return cur.withColumn(out, total).drop(*[name for name, *_ in terms])
