"""Composed quality filtering — the C4/Gopher-style keep-rule chain that
precedes dedup in a training-data pipeline: language allowlist, heuristic
quality floor, stopword-ratio floor (prose-likeness), and token-count
bounds. Pure composition of the text/ analysis columns, so the whole
filter stays one JVM projection + predicate over a single scan (no
shuffle, fully prunable)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastselect_spark.text import (
    add_language_id,
    add_quality_score,
    add_stopword_ratio,
    add_token_count,
)


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    langs: tuple[str, ...] | None = ("en",),
    min_quality: float = 0.3,
    min_stopword_ratio: float = 0.05,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Keep documents passing every enabled rule; adds the scoring columns
    (lang_pred, quality_score, stopword_ratio, n_ws_tokens) so downstream
    stages and audits can see WHY a row survived. ``langs=None`` disables
    the language rule."""
    scored = add_stopword_ratio(
        add_quality_score(add_token_count(add_language_id(df, text_col), text_col), text_col),
        text_col,
    )
    keep = (
        (F.col("quality_score") >= min_quality)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("n_ws_tokens") >= min_tokens)
        & (F.col("n_ws_tokens") <= max_tokens)
    )
    if langs is not None:
        keep = keep & F.col("lang_pred").isin(*langs)
    return scored.where(keep)
